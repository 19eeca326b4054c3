"""Round-3 'q4' (direct-int4 MXU operand) probe on hardware.

The 'q' kernel's remaining gap to HBM SOL on packed-4-bit weights is the
in-kernel int4->int8 cast: Q8_0 'q' (int8 grid straight off HBM, no
per-element VPU work) measured 56.7 us for 46.1 MB = 813 GB/s ~= SOL,
while Q4_K 'q' (bitcast + int4->int8 cast) measured 46.3 us for 25.9 MB
= 560 GB/s. 'q4' feeds the bitcast int4 values to the MXU directly
(int4 x int8 -> int32) with zero per-element VPU work — IF Mosaic
lowers that operand pair on v5e.

Answers:
  1. does int4 x int8 -> int32 dot_general lower at all (bare pallas)?
  2. 'q4' vs 'q' on the llama down-proj shape at decode rm=1/8
  3. parity: 'q4' must match 'q' bit-exactly (same integer dots)

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md): background, own
timeout, no other jax-importing process.
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
    qt = qm.quantize_qtensor(w, "Q4_K")
    nbytes = qt.qs.size * qt.qs.dtype.itemsize + sum(
        a.size * a.dtype.itemsize
        for a in (qt.scales, qt.mins, qt.sd, qt.sm)
        if a is not None
    )

    # parity first (cheap shapes): q4 == q to the bit?
    xs = jnp.asarray((rng.standard_normal((8, K)) * 0.5).astype(np.float32))
    try:
        oq = np.asarray(qm._qmm_pallas_tiled(xs, qt, 512, 1024, 4, mode="q", rm=8))
        o4 = np.asarray(qm._qmm_pallas_tiled(xs, qt, 512, 1024, 4, mode="q4", rm=8))
        rel = np.abs(o4 - oq).max() / (np.abs(oq).max() + 1e-9)
        print(f"parity q4 vs q: max rel diff {rel:.2e}", flush=True)
    except Exception as e:
        print(f"q4 FAILS TO LOWER: {str(e)[:300]}", flush=True)
        return

    for tk, tn, inner, mode, rm in [
        (512, 1024, 4, "q", 1),
        (512, 1024, 4, "q4", 1),
        (1024, 1024, 8, "q4", 1),
        (1024, 2048, 8, "q4", 1),
        (512, 1024, 4, "q4", 8),
        (512, 1024, 4, "q", 8),
    ]:
        x = jnp.asarray(
            (rng.standard_normal((max(rm, 8), K)) * 0.5).astype(np.float32)
        )
        try:
            f = lambda xx, _a=(tk, tn, inner, mode, rm): qm._qmm_pallas_tiled(
                xx, qt, _a[0], _a[1], _a[2], mode=_a[3], rm=_a[4]
            )
            dt, _ = marginal(f, x, reps=32, trials=2)
            print(
                f"rm={rm} {mode}({tk},{tn},{inner}): {dt*1e6:7.1f} us "
                f"({nbytes/dt/1e9:4.0f} GB/s total-read)", flush=True,
            )
        except Exception as e:
            print(
                f"rm={rm} {mode}({tk},{tn},{inner}): FAIL "
                f"{str(e)[:140].replace(chr(10), ' ')}", flush=True,
            )


if __name__ == "__main__":
    main()
