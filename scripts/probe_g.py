"""Time the grouped-dot 'g' qmm mode on hardware vs the 'si' champion.

The 'g' kernel (ops/qmatmul.py:_qmm_g_kernel) batches raw integer-grid
dots per quant group on the MXU and applies f32 group scales to partial
sums — the bf16 half of the reference's MMVQ idea (ggml-cuda.cu:3754).
It entered the race untimed (TPU was busy); this probe decides whether
the formulation survives Mosaic at production tiles and where it lands
vs 'si', at decode (m=8) and prefill (m=128) sizes, for both the adjk
packed Q4_K layout and the int8-grid Q8_0 layout.

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

    for kind in ("Q4_K", "Q8_0"):
        qt = qm.quantize_qtensor(w, kind)
        layout = qt.pack_layout if qt.packed else "int8-grid"
        nbytes = qt.qs.size * qt.qs.dtype.itemsize
        print(f"== {kind} ({layout}) packed bytes {nbytes/1e6:.1f} MB",
              flush=True)
        if kind == "Q4_K":
            cands = [
                (512, 1024, 4, "si"),
                (512, 1024, 4, "g"),
                (1024, 1024, 8, "g"),
            ]
        else:
            cands = [
                (4096, 1024, 4, "s"),
                (1024, 1024, 4, "g"),
                (2048, 1024, 8, "g"),
            ]
        for m in (8, 128):
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
