"""30-second TPU health probe: dense bf16 GEMM bandwidth via scan-timing.

The device/tunnel shows hour-scale slowdowns (contention); kernel perf
work is only meaningful when this reports near this workload's plateau:
XLA's bf16 (8,4096)x(4096,11264) GEMM sustains ~390 GB/s when healthy
(NOT the 819 GB/s HBM peak — this m=8 shape doesn't stream faster; the
earlier 650-750 readings predate the program-switch-overhead discovery
and came from differently-warmed runs). The gate below catches genuine
halvings. Run alone on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    wd = jnp.asarray(
        rng.standard_normal((4096, 11264)).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((8, 4096), jnp.bfloat16)
    reps = 128

    def loop(xx, ww):
        def body(c, _):
            o = jnp.dot(xx + c * 0, ww, preferred_element_type=jnp.float32)
            return o.ravel()[0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    f = jax.jit(loop)
    np.asarray(f(xd, wd))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(xd, wd))
        best = min(best, time.perf_counter() - t0)
    bw = wd.size * 2 / (best / reps) / 1e9
    print(f"dense bf16 control: {best/reps*1e6:.1f} us/iter  {bw:.0f} GB/s")
    print("HEALTHY" if bw >= 300 else "DEGRADED")


if __name__ == "__main__":
    main()
