"""Round-3 'q' (MMVQ int8-dot) kernel ablations on hardware.

Questions this answers (one llama-shape (4096,11264) tile, m as decode
sees it):
  1. real-m slice: rm=1 vs rm=8 — how much of the 'q' kernel's time is
     the per-m rescale epilogue (parts cast + sx*s multiply + g-sum)?
  2. plane layout: factored 6-bit scales (sfactor) vs materialized f32
     planes for Q4_K — DMA bytes vs VPU expansion trade.
  3. tile shape: tn=2048 (half the grid steps) vs 1024.
  4. Q8_0 rm=1 — the no-cast, no-factor ceiling for the 'q' family.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md): background, own
timeout, no other jax-importing process.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from _timing import marginal


def expand_planes(qm, qt):
    """Materialize factored 6-bit scale planes into full f32 planes."""
    sp, mp_ = qm.scale_planes(qt)
    return dataclasses.replace(
        qt, scales=sp, mins=mp_, sd=None, sm=None, sfactor=0
    )


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from ctransformers_tpu.ops import qmatmul as qm

    qm._INT4_OK = True
    rng = np.random.default_rng(0)
    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)

    def race(qt, label, cands):
        nbytes = qt.qs.size * qt.qs.dtype.itemsize
        pl_b = sum(
            a.size * a.dtype.itemsize
            for a in (qt.scales, qt.mins, qt.sd, qt.sm)
            if a is not None
        )
        print(f"== {label}: qs {nbytes/1e6:.1f} MB + planes {pl_b/1e6:.1f} MB",
              flush=True)
        kr = qt.qs.shape[0] * (2 if qt.packed else 1)
        for tk, tn, inner, mode, rm in cands:
            x = jnp.asarray(
                (rng.standard_normal((max(rm, 8), kr)) * 0.5).astype(
                    np.float32
                )
            )
            try:
                f = lambda xx, _a=(tk, tn, inner, mode, rm): (
                    qm._qmm_pallas_tiled(
                        xx, qt, _a[0], _a[1], _a[2], mode=_a[3], rm=_a[4]
                    )
                )
                dt, _ = marginal(f, x, reps=32, trials=2)
                bw = (nbytes + pl_b) / dt / 1e9
                print(
                    f"rm={rm} {mode}({tk},{tn},{inner}): {dt*1e6:7.1f} us "
                    f"({bw:4.0f} GB/s total-read)", flush=True,
                )
            except Exception as e:
                print(
                    f"rm={rm} {mode}({tk},{tn},{inner}): FAIL "
                    f"{str(e)[:140].replace(chr(10), ' ')}", flush=True,
                )

    qt = qm.quantize_qtensor(w, "Q4_K")
    race(qt, "Q4_K factored", [
        (512, 1024, 4, "q", 8),
        (512, 1024, 4, "q", 1),
        (1024, 1024, 8, "q", 1),
        (1024, 2048, 8, "q", 1),
        (512, 2048, 4, "q", 1),
        (512, 1024, 4, "si", 8),   # r02 champion, for the same-run baseline
    ])
    race(expand_planes(qm, qt), "Q4_K full-planes", [
        (512, 1024, 4, "q", 1),
        (1024, 1024, 8, "q", 1),
    ])
    qt8 = qm.quantize_qtensor(w, "Q8_0")
    race(qt8, "Q8_0", [
        (2048, 1024, 8, "q", 8),
        (2048, 1024, 8, "q", 1),
        (2048, 2048, 8, "q", 1),
        (4096, 1024, 8, "q", 1),
    ])


if __name__ == "__main__":
    main()
