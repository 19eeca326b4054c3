"""~1-minute TPU health probe: honest dense bf16 GEMM bandwidth.

Uses the marginal (1x-vs-4x chained, max-carry) method from _timing.py:
earlier versions read a dead-code-sliced dot (fiction) plus the flat
~24-30 ms per-dispatch tunnel round-trip. Reports the true per-GEMM
streaming bandwidth AND the round-trip, both of which drift hour-scale.
Run alone on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from _timing import marginal


def main():
    rng = np.random.default_rng(0)
    wd = jnp.asarray(
        rng.standard_normal((4096, 11264)).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((8, 4096), jnp.bfloat16)

    dt, t1 = marginal(
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32),
        xd, wd, reps=64,
    )
    bw = wd.size * 2 / dt / 1e9
    rt = (t1 - dt) * 64
    print(
        f"dense bf16 GEMM: {dt*1e6:.1f} us true  {bw:.0f} GB/s   "
        f"dispatch round-trip {rt*1e3:.1f} ms"
    )
    # v5e HBM peak is 819 GB/s; healthy honest readings for this shape
    # TBD — gate on an obviously-broken device only
    print("HEALTHY" if bw >= 300 else "DEGRADED")


if __name__ == "__main__":
    main()
