"""Does the remote-compile path cache identical Mosaic kernels, and do
concurrent compiles parallelize across the 4 compile-server workers?

If yes+yes, the prefill-compile fix (VERDICT r03 #3: 143 s) is to
pre-warm each distinct (weight-shape, tile) qmm kernel in a thread pool
before jitting the big forward program: the program's embedded kernel
compiles then hit the server cache and the wall collapses to
~max(kernel) + XLA glue.

Measures:
  1. kernel A compile (cold)
  2. kernel A compile again via a DIFFERENT jit wrapper (cache probe)
  3. kernels B,C,D,E compiled in a 4-thread pool (parallelism probe)

Run strictly alone on the TPU, in background, own timeout.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from profile_prefill_compile import fake_q4k


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)
    m = 128
    qt = fake_q4k(4096, 12288, rng)
    kr = qt.qs.shape[0] * 2
    x = jnp.asarray((rng.standard_normal((m, kr)) * 0.5).astype(np.float32))

    def compile_one(tile, tag):
        t0 = time.perf_counter()
        f = jax.jit(
            lambda xx, _t=tile: qm._qmm_pallas_tiled(
                xx, qt, _t[0], _t[1], _t[2], mode=_t[3], rm=m
            )
        )
        np.asarray(f(x))
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:6.1f}s", flush=True)
        return dt

    # 1+2: cold then identical-again (fresh jit wrapper each time)
    compile_one((2048, 1024, 8, "si"), "A cold")
    compile_one((2048, 1024, 8, "si"), "A again (cache probe)")

    # 3: four DIFFERENT kernels concurrently
    tiles = [
        (2048, 1024, 4, "si"),
        (1024, 1024, 8, "si"),
        (512, 1024, 4, "si"),
        (1024, 1024, 4, "i"),
    ]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(4) as pool:
        list(pool.map(
            lambda tl: compile_one(tl, f"pool {tl}"), tiles
        ))
    print(f"4-kernel pool wall: {time.perf_counter()-t0:6.1f}s", flush=True)

    # serial control for one more distinct kernel
    compile_one((2048, 2048, 8, "si"), "serial control")


if __name__ == "__main__":
    main()
