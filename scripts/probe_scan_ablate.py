"""Decompose the stacked-scan B=1 decode step via the ENGINE path (r05).

profile_batched.py's standalone chunk body compiles pathologically slowly
through the remote tunnel (no kernel prewarm); the Engine's _decode_loop
programs compile in tens of seconds. This probe reuses bench._honest_decode
(dispatch round-trip cancelled) under each CT_ABLATE component stub
(models/forward.py:_ablate), clearing the loop cache between configs.

Baseline context: unstacked-unrolled r04 step was 8.30 ms (120.4 tok/s);
the stacked scan measures ~11.6 ms (86.7 tok/s) regardless of unroll
(probe_scan_unroll). Whatever component's delta grew vs r04's split
(attn 1.41 / attn-proj 2.7 / MLP 4.16 / head 0.17) is the stacking cost.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = [
    a for a in os.environ.get(
        "CT_PROBE_ABLATIONS", ",kvwrite,attnmath,qkvo,mlp,head"
    ).split(",")
]


def main():
    os.environ.setdefault("CT_SCAN_UNROLL", "1")
    import jax.numpy as jnp

    from bench import _cached_params, _honest_decode
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B

    kvd = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[
        os.environ.get("CT_PROBE_KV", "f32")
    ]
    spec = LLAMA_7B.replace(n_ctx=1024)
    params = _cached_params(spec, "q4_k")
    t0 = time.time()
    eng = Engine(spec, params, kv_dtype=kvd)
    toks = [(7 * i + 3) % spec.n_vocab for i in range(128)]
    eng.eval(toks)
    print(f"# engine+prefill {time.time()-t0:.0f}s "
          f"(unroll={os.environ['CT_SCAN_UNROLL']})", flush=True)

    results = {}
    for flag in ABLATIONS:
        os.environ["CT_ABLATE"] = flag
        eng._loops.clear()
        t0 = time.time()
        d = _honest_decode(eng, 128)
        results[flag] = d
        label = flag or "base"
        print(f"{label:9s} {d*1e3:7.2f} ms/tok   "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
    os.environ["CT_ABLATE"] = ""

    base = results.get("")
    if base:
        print("\ncomponent deltas vs base (r04 unstacked in parens):")
        r04 = {"attnmath": 1.41, "qkvo": 1.41 + 2.7, "mlp": 4.16,
               "head": 0.17, "kvwrite": 0.0}
        for flag, d in results.items():
            if flag:
                print(f"  -{flag:9s} saves {1e3*(base-d):6.2f} ms/tok "
                      f"(r04: {r04.get(flag, float('nan')):.2f})")


if __name__ == "__main__":
    main()
