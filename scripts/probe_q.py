"""Time the MMVQ-style 'q' qmm mode on hardware vs 'si' / 'g' champions.

'q' (ops/qmatmul.py:_qmm_q_kernel) = per-group int8 activation quant
outside the kernel + raw int8 x int8 -> int32 grouped MXU dots + f32
rescale of partial sums — the reference's MMVQ decode path re-expressed
for the MXU (ggml-cuda.cu:3754-3790, :1417-1456). 'q4' feeds the dot
int4 weight operands straight from the bitcast (no int8 cast) — may not
lower; raced last so a compile failure can't shadow the others.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from _timing import marginal


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from ctransformers_tpu.ops import qmatmul as qm

    qm._INT4_OK = True
    rng = np.random.default_rng(0)
    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    m = 8

    plan = {
        "Q4_K": [
            (512, 1024, 4, "si"),
            (512, 1024, 4, "q"),
            (1024, 1024, 8, "q"),
            (512, 1024, 4, "q4"),
        ],
        "Q8_0": [
            (2048, 1024, 8, "g"),
            (1024, 1024, 4, "q"),
            (2048, 1024, 8, "q"),
        ],
    }
    for kind, cands in plan.items():
        qt = qm.quantize_qtensor(w, kind)
        nbytes = qt.qs.size * qt.qs.dtype.itemsize
        print(f"== {kind} packed bytes {nbytes/1e6:.1f} MB", flush=True)
        kr = qt.qs.shape[0] * (2 if qt.packed else 1)
        x = jnp.asarray(
            (rng.standard_normal((m, kr)) * 0.5).astype(np.float32)
        )
        for tk, tn, inner, mode in cands:
            try:
                f = lambda xx, _a=(tk, tn, inner, mode): (
                    qm._qmm_pallas_tiled(xx, qt, _a[0], _a[1], _a[2],
                                         mode=_a[3])
                )
                dt, _ = marginal(f, x, reps=32, trials=2)
                bw = nbytes / dt / 1e9
                print(f"m={m} {mode}({tk},{tn},{inner}): {dt*1e6:7.1f} us "
                      f"({bw:4.0f} GB/s packed)", flush=True)
            except Exception as e:
                print(f"m={m} {mode}({tk},{tn},{inner}): FAIL "
                      f"{str(e)[:140].replace(chr(10), ' ')}", flush=True)


if __name__ == "__main__":
    main()
