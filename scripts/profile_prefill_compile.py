"""Attribute the r03 prefill-compile blowup (143 s vs 16 s in r02).

bench.py's t2->t3 "prefill(128) incl. compile" is ONE jit of the t=128
forward step (autotune is warm: 0 raced). The program embeds ~5 distinct
(weight-shape, tile) Pallas kernels at m=128; the decode program embeds
the same count of 'q' kernels and compiles in 28 s. Hypothesis: the
m=128 champions ('si' tk=2048 inner=8, 'i' 512/4) cost far more Mosaic
compile time than the 'q' kernels — the inner unroll replicates the
dequant chain 8x in the kernel body.

Measures, per 7B weight shape and tile variant at m=128:
  - jit compile wall (lower+compile, through the remote tunnel)
  - runtime (marginal) so a cheaper-compiling tile can be judged on perf

QTensor contents are random (compile/perf are content-independent).
Run strictly alone on the TPU, in background, own timeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import marginal


def fake_q4k(K, N, rng):
    from ctransformers_tpu.ops import qmatmul as qm

    g, sf = 32, 8
    q = rng.integers(0, 16, (K, N), dtype=np.int8)
    s = rng.integers(-64, 64, (K // g, N), dtype=np.int8)
    m = rng.integers(-64, 64, (K // g, N), dtype=np.int8)
    sd = (rng.random((K // (g * sf), N), np.float32) * 0.01).astype(np.float32)
    sm = (rng.random((K // (g * sf), N), np.float32) * 0.01).astype(np.float32)
    return qm.make_qtensor(q, s, m, "Q4_K", g, sd=sd, sm=sm, sfactor=sf,
                           pack_layout="adjk")


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)
    m = 128

    shapes = {
        "qkv   (4096,12288)": (4096, 12288),
        "down (11264, 4096)": (11264, 4096),
        "gateup(4096,22528)": (4096, 22528),
        "lmhead(4096,32768)": (4096, 32768),
    }
    tiles = [
        (2048, 1024, 8, "si"),  # r03 champion on 3/4 shapes
        (512, 1024, 4, "i"),    # r03 champion on down/attn-out
        (2048, 1024, 2, "si"),
        (2048, 1024, 1, "si"),
        (1024, 1024, 2, "si"),
        (512, 1024, 1, "i"),
    ]
    for label, (K, N) in shapes.items():
        qt = fake_q4k(K, N, rng)
        x = jnp.asarray(
            (rng.standard_normal((m, K + (qt.qs.shape[0] * 2 - K))) * 0.5)
            .astype(np.float32)
        )
        kr = qt.qs.shape[0] * 2
        x = x[:, :kr]
        for tk, tn, inner, mode in tiles:
            tkd = min(tk, qt.qs.shape[0])
            try:
                f = jax.jit(
                    lambda xx, _t=(tkd, tn, inner, mode): qm._qmm_pallas_tiled(
                        xx, qt, _t[0], _t[1], _t[2], mode=_t[3], rm=m
                    )
                )
                t0 = time.perf_counter()
                o = f(x)
                np.asarray(o)
                ct = time.perf_counter() - t0
                dt, _ = marginal(f, x, reps=16, trials=1, timed=2)
                print(
                    f"{label} {mode}({tkd},{tn},{inner}): compile {ct:6.1f}s"
                    f"  run {dt*1e6:7.1f} us", flush=True,
                )
            except Exception as e:
                print(
                    f"{label} {mode}({tkd},{tn},{inner}): FAIL "
                    f"{str(e)[:120]}".replace("\n", " "), flush=True,
                )
        del qt, x


if __name__ == "__main__":
    main()
