"""Attribute the NON-qmm 40% of prefill (r03 profile: full chunk m=128 =
20.97 ms, qmm-only 12.59 ms) and measure whether an MMQ-style int8
prefill kernel has headroom on this hardware.

 a. honest full-chunk time under CT_ABLATE component stubs:
      (none) / attnmath / qkvo / kvwrite / mlp / head
    — each diff vs (none) attributes one component (forward.py:_ablate).
 b. dense int8 x int8 -> int32 GEMM vs bf16 GEMM at m=128: the v5e
    spec sheet says 2x; if XLA's int8 dot doesn't actually run ~2x, the
    MMQ ceiling shrinks below its requant VPU cost and the idea dies
    by measurement.

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

    m = int(os.environ.get("PP_M", "128"))
    spec = LLAMA_7B.replace(n_ctx=1024)
    params = random_params(spec, seed=0, quantize="q4_k", exact=False)
    eng = Engine(spec, params)
    tokens = jnp.zeros((1, m), jnp.int32)
    reps = 8

    def chunk_time():
        kv = KVCache.create(spec, batch=1)

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
            np.asarray(f(eng.params, kv))
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
        return (best[4] - best[1]) / 3

    base = None
    for ab in ("", "attnmath", "qkvo", "kvwrite", "mlp", "head"):
        os.environ["CT_ABLATE"] = ab
        dt = chunk_time()
        if ab == "":
            base = dt
            print(f"full chunk m={m}: {dt*1e3:.2f} ms", flush=True)
        else:
            print(f"ablate {ab:9s}: {dt*1e3:6.2f} ms "
                  f"(component ~{(base-dt)*1e3:5.2f} ms)", flush=True)
    os.environ["CT_ABLATE"] = ""

    # b. raw MXU rates at prefill shapes
    rng = np.random.default_rng(0)
    K, N = 4096, 11264
    xb = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    wb = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    xi = jnp.asarray(
        rng.integers(-127, 127, (m, K), dtype=np.int64).astype(np.int8)
    )
    wi = jnp.asarray(
        rng.integers(-127, 127, (K, N), dtype=np.int64).astype(np.int8)
    )
    fl = 2 * m * K * N
    dt, _ = marginal(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        xb, wb, reps=32, trials=2,
    )
    print(f"dense bf16 GEMM m={m}: {dt*1e6:7.1f} us "
          f"({fl/dt/1e12:6.1f} TFLOP/s)", flush=True)
    try:
        dt, _ = marginal(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
            xi, wi, reps=32, trials=2,
        )
        print(f"dense int8 GEMM m={m}: {dt*1e6:7.1f} us "
              f"({fl/dt/1e12:6.1f} TOP/s)", flush=True)
    except Exception as e:
        print(f"dense int8 GEMM: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
