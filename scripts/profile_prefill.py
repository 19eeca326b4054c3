"""Decompose prefill (m=128 chunk) time on the llama-7B Q4_K bench model.

BENCH_r02: TTFT 73 ms for a 128-token prompt (~1,760 tok/s ≈ 12% MFU).
The bounds say it should be far faster — weight read once ~4.6 ms, bf16
FLOPs ~9 ms at peak — so before building an MMQ-style int8 prefill
kernel, find out where the 73 ms actually goes:

  1. full forward chunk program (honest scan time)  [includes everything]
  2. the 7 projection qmatmuls x 32 layers + lm_head at m=128
  3. TTFT wall time (1 dispatch) minus (1) = tunnel round-trip share

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import marginal


def main():
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    m = int(os.environ.get("PP_M", "128"))
    spec = LLAMA_7B.replace(n_ctx=1024)
    params = random_params(spec, seed=0, quantize="q4_k", exact=False)
    eng = Engine(spec, params)  # autotunes decode shapes; warms HBM

    # --- 2. qmm-only at m=128: one of each unique weight, scaled up ---
    layer = eng.params["layers"][0]
    head = eng.params["lm_head"]
    shapes = {  # engine fuses qkv and gate|up (fuse_layer_params)
        "w_qkv(4096x12288)": (layer["w_qkv"], 32),
        "wo(4096x4096)": (layer["wo"], 32),
        "w_gateup(4096x22016)": (layer["w_gateup"], 32),
        "down(11008x4096)": (layer["w_down"], 32),
        "head(4096x32000)": (head, 1),
    }
    qmm_total = 0.0
    for lab, (w, count) in shapes.items():
        kr = w.shape[0] if hasattr(w, "shape") else w.shape[0]
        x = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((m, w.shape[0]))
            .astype(np.float32)
        )
        dt, _ = marginal(lambda xx, _w=w: qm.qmatmul(xx, _w), x,
                         reps=16, trials=2)
        qmm_total += dt * count
        print(f"qmm {lab} x{count}: {dt*1e6:8.1f} us each "
              f"-> {dt*count*1e3:6.2f} ms total", flush=True)
    print(f"qmm-only prefill share: {qmm_total*1e3:.2f} ms", flush=True)

    # --- 1. full chunk program (custom marginal: tokens are ints, so the
    # anti-DCE chain rides the KV cache + a logits max-reduction) ---
    tokens = jnp.zeros((1, m), jnp.int32)
    kv = KVCache.create(spec, batch=1)
    reps = 8

    def make_loop(nwork):
        def run(pp, kv0):
            def body(carry, _):
                c, cache = carry
                for _ in range(nwork):
                    logits, _, cache = forward(
                        spec, pp, tokens, jnp.int32(0), cache
                    )
                    c = jnp.max(logits.astype(jnp.float32)) * 1e-30 + c
                return (c, cache), ()

            (c, _), _ = jax.lax.scan(
                body, (jnp.float32(0), kv0), None, length=reps
            )
            return c

        f = jax.jit(run)
        np.asarray(f(eng.params, kv))  # compile + warm
        return lambda: np.asarray(f(eng.params, kv))

    import time as _t

    loops = {n: make_loop(n) for n in (1, 4)}
    best = {1: float("inf"), 4: float("inf")}
    for _ in range(2):
        for n, loop in loops.items():
            loop()
            for _ in range(2):
                t0 = _t.perf_counter()
                loop()
                best[n] = min(best[n], (_t.perf_counter() - t0) / reps)
    dt_full = (best[4] - best[1]) / 3
    print(f"full chunk m={m}: {dt_full*1e3:.2f} ms true "
          f"({m/dt_full:.0f} tok/s; non-qmm {1e3*(dt_full-qmm_total):.2f} "
          f"ms)", flush=True)

    # --- 3. TTFT through the engine (includes dispatch round trip) ---
    import time

    toks = [int(x) % spec.n_vocab for x in range(m)]
    eng.eval(toks)  # compile
    best = float("inf")
    for _ in range(3):
        eng.reset()
        t0 = time.time()
        eng.eval(toks)
        best = min(best, time.time() - t0)
    print(f"engine TTFT m={m}: {best*1e3:.1f} ms wall "
          f"(dispatch+host share ~{(best-dt_full)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
