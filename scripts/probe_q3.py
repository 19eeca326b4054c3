"""Attribute the packed-'q' kernel's per-grid-step compute (r03).

The champion Q4_K 'q' tile runs 46.3 us on the (4096,11264) down-proj =
560 GB/s vs Q8_0 'q' at 813 GB/s ~= HBM SOL. Per grid step that is
~1.05 us compute vs ~0.73 us DMA — compute-bound. Which stage?

  stage ablations on a (512,1024,4) tile, rm=1 (each timed on HW):
    full      bitcast + int4->int8 cast + grouped dots + rescale (prod)
    nocast    int8 grid straight from a FAKE q4k-shaped QTensor whose qs
              is int8 (same group/scale/min planes, same dots+rescale —
              isolates the bitcast+cast cost; 2x HBM bytes so compare
              per-step compute, not total)
    nodot     cast, skip dot_general (sum the int8 instead) — isolates
              the grouped-dot MXU cost
    norescale dots but skip the f32 parts*sx*s epilogue

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import marginal


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)
    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qt = qm.quantize_qtensor(w, "Q4_K")
    x = jnp.asarray((rng.standard_normal((8, K)) * 0.5).astype(np.float32))

    # production reference timing
    for mode, tile in (("q", (512, 1024, 4)), ("q", (1024, 1024, 8))):
        f = lambda xx, _t=tile, _m=mode: qm._qmm_pallas_tiled(
            xx, qt, _t[0], _t[1], _t[2], mode=_m, rm=1
        )
        dt, _ = marginal(f, x, reps=32, trials=2)
        nb = qt.qs.size + sum(
            a.size * a.dtype.itemsize
            for a in (qt.scales, qt.mins, qt.sd, qt.sm) if a is not None
        )
        print(f"prod {mode}{tile}: {dt*1e6:6.1f} us ({nb/dt/1e9:4.0f} GB/s)",
              flush=True)

    # stage-ablation kernels: same block structure as _qmm_q_kernel but
    # self-contained (full f32 planes, no factored scales, no mins/bias
    # term — isolates grid/cast/dot/rescale only)
    sp, mp_ = qm.scale_planes(qt)
    g = qt.group
    tk, tn, inner = 512, 1024, 4

    # pre-grouped int8 activations + per-group scales (as production)
    kr = K
    ng = kr // g
    xf = np.asarray(x[:1])  # rm=1
    gmax = np.abs(xf.reshape(1, ng, g)).max(-1) + 1e-12
    sx = (gmax / 127.0).astype(np.float32)  # (1, ng)
    xq = np.clip(
        np.round(xf.reshape(1, ng, g) / sx[:, :, None]), -127, 127
    ).astype(np.int8)
    xg = jnp.asarray(np.ascontiguousarray(xq.transpose(1, 0, 2)))  # (ng,1,g)
    sxT = jnp.asarray(np.ascontiguousarray(sx.T))  # (ng, 1)

    def kern(xg_ref, sx_ref, qs_ref, s_ref, o_ref, *, stage):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        tks, tnn = qs_ref.shape
        tkr = 2 * tks
        ck = tkr // inner
        ngc = ck // g
        acc = None
        for i in range(inner):
            gs = slice(i * ngc, (i + 1) * ngc)
            if stage == "nocast":
                wrows = qs_ref[i * ck : (i + 1) * ck, :]  # int8 grid直接
            else:
                w4 = pltpu.bitcast(
                    qs_ref[i * (ck // 2) : (i + 1) * (ck // 2), :], jnp.int4
                )
                wrows = w4.astype(jnp.int8)
            wg = wrows.reshape(ngc, g, tnn)
            if stage == "nodot":
                parts = wg.astype(jnp.int32).sum(1)[:, None, :].astype(
                    jnp.float32
                )
            else:
                parts = jax.lax.dot_general(
                    xg_ref[gs, :, :], wg, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.float32)
            if stage == "norescale":
                d = parts.sum(0)
            else:
                d = (
                    parts
                    * sx_ref[gs, :][:, :, None]
                    * s_ref[gs, :].astype(jnp.float32)[:, None, :]
                ).sum(0)
            acc = d if acc is None else acc + d
        o_ref[:] += acc

    rows = qt.qs.shape[0]
    for stage in ("full", "nocast", "nodot", "norescale"):
        if stage == "nocast":
            grid8 = np.asarray(
                pltpu_unpack(qt.qs)
            )  # (K, N) int8 unpacked on host
            qs_in = jnp.asarray(grid8)
            tks = tk * 2  # int8 grid rows per tile (same REAL rows)
            nk = K // tks
        else:
            qs_in = qt.qs
            tks = tk
            nk = rows // tks
        nn = N // tn
        kfn = functools.partial(kern, stage=stage)
        try:
            f = pl.pallas_call(
                kfn,
                grid=(nn, nk),
                in_specs=[
                    pl.BlockSpec(
                        (2 * tk // g, 1, g), lambda i, j: (j, 0, 0)
                    ),
                    pl.BlockSpec((2 * tk // g, 1), lambda i, j: (j, 0)),
                    pl.BlockSpec((tks, tn), lambda i, j: (j, i)),
                    pl.BlockSpec((2 * tk // g, tn), lambda i, j: (j, i)),
                ],
                out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i)),
                out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            )
            dt, _ = marginal(
                lambda a, b, c, d: f(a, b, c, d), xg, sxT, qs_in,
                jnp.asarray(sp), reps=32, trials=2,
            )
            nb = qs_in.size
            print(
                f"{stage:10s}: {dt*1e6:6.1f} us  "
                f"({nb/dt/1e9:4.0f} GB/s over grid bytes)", flush=True,
            )
        except Exception as e:
            print(f"{stage:10s}: FAIL {str(e)[:200]}", flush=True)


def pltpu_unpack(qs):
    """Host-side int4 unpack of the adjk-packed byte grid -> int8 (K, N)."""
    b = np.asarray(qs).astype(np.uint8)
    lo = (b & 0x0F).astype(np.int8)
    hi = (b >> 4).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    out = np.empty((b.shape[0] * 2, b.shape[1]), np.int8)
    out[0::2] = lo
    out[1::2] = hi
    return out


if __name__ == "__main__":
    main()
