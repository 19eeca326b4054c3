"""Race the layer-scan unroll factor for B=1 decode (r05).

The stacked-scan forward (one compiled layer body) cut executables
79 -> 6.5 MiB and prefill compile 131 -> 6 s, but B=1 decode regressed
120.4 -> 86.7 tok/s: scan iterations execute strictly in sequence, so
the cross-layer DMA/compute overlap the fully-unrolled program enjoyed
is gone. lax.scan(unroll=k) is the middle ground — this probe races k
on the production engine path (bench._honest_decode, dispatch round-trip
cancelled). One engine build (~4 min wire), then 2 compiled loop
programs per k.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = [k for k in os.environ.get("CT_PROBE_UNROLLS", "4,8").split(",") if k]


def main():
    from bench import _cached_params, _honest_decode
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B

    spec = LLAMA_7B.replace(n_ctx=1024)
    params = _cached_params(spec, "q4_k")
    t0 = time.time()
    eng = Engine(spec, params)
    toks = [(7 * i + 3) % spec.n_vocab for i in range(128)]
    eng.eval(toks)
    print(f"# engine+prefill {time.time()-t0:.0f}s", flush=True)

    for k in KS:
        os.environ["CT_SCAN_UNROLL"] = k
        eng._loops.clear()  # retrace the decode loops under the new k
        t0 = time.time()
        d = _honest_decode(eng, 128)
        print(
            f"unroll={k:>2}: {1.0/d:7.2f} tok/s   "
            f"(compile+measure {time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
