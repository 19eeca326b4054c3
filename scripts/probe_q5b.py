"""probe_q5 part 2: timing only (parity already proven bit-exact for all
three 'qp' forms in probe_q5.py; int16 MXU operands proven unavailable).

The first run's timing section hit a burst of instant HTTP 500s from the
remote-compile server (likely wedged by the int16 compile failures just
before); this rerun skips the poison probes and retries each compile once
after a cool-down. Run strictly alone on the TPU, in background.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import marginal
from probe_q5 import swar_planes


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)

    wd = jnp.asarray(
        rng.standard_normal((4096, 11264)).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((8, 4096), jnp.bfloat16)
    dt, _ = marginal(
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32),
        xd, wd, reps=32, trials=2,
    )
    print(f"health: dense bf16 {dt*1e6:.1f} us = {wd.size*2/dt/1e9:.0f} GB/s",
          flush=True)

    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qt = qm.quantize_qtensor(w, "Q4_K")
    sp, _mp = qm.scale_planes(qt)
    sp = jnp.asarray(sp)
    g = qt.group
    hg = g // 2
    nbytes = qt.qs.size + sum(
        a.size * a.dtype.itemsize
        for a in (qt.scales, qt.mins, qt.sd, qt.sm) if a is not None
    )

    def prep(m):
        xf = (rng.standard_normal((m, K)) * 0.5).astype(np.float32)
        ng = K // g
        xr = xf.reshape(m, ng, g)
        sx = (np.abs(xr).max(-1) / 127.0 + 1e-20).astype(np.float32)
        xq = np.clip(np.round(xr / sx[:, :, None]), -127, 127).astype(np.int8)
        xg = np.ascontiguousarray(xq.transpose(1, 0, 2))
        xe = np.ascontiguousarray(xg[:, :, 0::2])
        xo = np.ascontiguousarray(xg[:, :, 1::2])
        xp = np.concatenate([xe, xo], axis=-1)
        sxT = np.ascontiguousarray(sx.T)
        return (jnp.asarray(xg), jnp.asarray(xe), jnp.asarray(xo),
                jnp.asarray(xp), jnp.asarray(sxT), jnp.asarray(sxT / 16.0))

    def kern_q(xg_ref, sx_ref, qs_ref, s_ref, o_ref, *, inner):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        tks, tnn = qs_ref.shape
        ck = 2 * tks // inner
        ngc = ck // g
        acc = None
        for i in range(inner):
            gs = slice(i * ngc, (i + 1) * ngc)
            w4 = pltpu.bitcast(
                qs_ref[i * (ck // 2) : (i + 1) * (ck // 2), :], jnp.int4
            )
            wg = w4.astype(jnp.int8).reshape(ngc, g, tnn)
            parts = jax.lax.dot_general(
                xg_ref[gs, :, :], wg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            ).astype(jnp.float32)
            d = (parts * sx_ref[gs, :][:, :, None]
                 * s_ref[gs, :].astype(jnp.float32)[:, None, :]).sum(0)
            acc = d if acc is None else acc + d
        o_ref[:] += acc

    def kern_qp(*refs, inner, form):
        if form == "A":
            xe_ref, xo_ref, sx_ref, qs_ref, s_ref, o_ref = refs
        else:
            xp_ref, sx_ref, qs_ref, s_ref, o_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        tks, tnn = qs_ref.shape
        ck = 2 * tks // inner
        ckb = ck // 2
        ngc = ck // g
        acc = None
        for i in range(inner):
            gs = slice(i * ngc, (i + 1) * ngc)
            lo, hi = swar_planes(pl, pltpu, qs_ref[i * ckb:(i + 1) * ckb, :])
            lg = lo.reshape(ngc, hg, tnn)
            hgr = hi.reshape(ngc, hg, tnn)
            dn = (((2,), (1,)), ((0,), (0,)))
            if form == "C":
                wcat = jnp.concatenate([lg, hgr], axis=1)
                parts = jax.lax.dot_general(
                    xp_ref[gs, :, :], wcat, dn,
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.float32)
            else:
                if form == "A":
                    xe = xe_ref[gs, :, :]
                    xo = xo_ref[gs, :, :]
                else:
                    xe = xp_ref[gs, :, :hg]
                    xo = xp_ref[gs, :, hg:]
                pe = jax.lax.dot_general(
                    xe, lg, dn, preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                po = jax.lax.dot_general(
                    xo, hgr, dn, preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                parts = (pe + po).astype(jnp.float32)
            d = (parts * sx_ref[gs, :][:, :, None]
                 * s_ref[gs, :].astype(jnp.float32)[:, None, :]).sum(0)
            acc = d if acc is None else acc + d
        o_ref[:] += acc

    rows = qt.qs.shape[0]

    def build(form, tk, tn, inner, m):
        nk, nn = rows // tk, N // tn
        tkg = 2 * tk // g
        if form == "q":
            kfn = functools.partial(kern_q, inner=inner)
            specs = [
                pl.BlockSpec((tkg, m, g), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((tkg, m), lambda i, j: (j, 0)),
            ]
        elif form == "A":
            kfn = functools.partial(kern_qp, inner=inner, form="A")
            specs = [
                pl.BlockSpec((tkg, m, hg), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((tkg, m, hg), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((tkg, m), lambda i, j: (j, 0)),
            ]
        else:
            kfn = functools.partial(kern_qp, inner=inner, form=form)
            specs = [
                pl.BlockSpec((tkg, m, g), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((tkg, m), lambda i, j: (j, 0)),
            ]
        specs += [
            pl.BlockSpec((tk, tn), lambda i, j: (j, i)),
            pl.BlockSpec((tkg, tn), lambda i, j: (j, i)),
        ]
        return pl.pallas_call(
            kfn,
            grid=(nn, nk),
            in_specs=specs,
            out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        )

    xg1, xe1, xo1, xp1, sx1, sx16_1 = prep(1)

    def timed(label, form, tk, tn, inner, m, args, reps=32):
        # marginal() chains its carry into args[0] (x + c*1e-30): an int8
        # args[0] would promote to f32 and produce a mixed-operand integer
        # dot Mosaic rejects (the HTTP 500 burst in run 1). Chain through
        # the f32 per-group scale arg instead; everything else is closed
        # over.
        sx_pos = 2 if form == "A" else 1
        pre, sx, post = args[:sx_pos], args[sx_pos], args[sx_pos + 1:]
        for attempt in (0, 1):
            try:
                f = build(form, tk, tn, inner, m)
                dtt, _ = marginal(
                    lambda sxa: f(*pre, sxa, *post), sx, reps=reps, trials=2
                )
                print(f"m={m} {label:9s}: {dtt*1e6:6.1f} us "
                      f"({nbytes/dtt/1e9:4.0f} GB/s)", flush=True)
                return
            except Exception as e:
                msg = str(e)[:120].replace("\n", " ")
                if attempt == 0:
                    print(f"m={m} {label:9s}: retry after {msg}", flush=True)
                    time.sleep(20)
                else:
                    print(f"m={m} {label:9s}: FAIL {msg}", flush=True)

    a_args = (xe1, xo1, sx16_1, qt.qs, sp)
    p_args = (xp1, sx16_1, qt.qs, sp)
    q_args = (xg1, sx1, qt.qs, sp)
    timed("q", "q", 512, 1024, 4, 1, q_args)
    timed("qpA", "A", 512, 1024, 4, 1, a_args)
    timed("qpB", "B", 512, 1024, 4, 1, p_args)
    timed("qpC", "C", 512, 1024, 4, 1, p_args)
    timed("q-big", "q", 1024, 1024, 8, 1, q_args)
    timed("qpA-big", "A", 1024, 1024, 8, 1, a_args)
    timed("qpC-big", "C", 1024, 1024, 8, 1, p_args)

    _, xe128, xo128, xp128, _, sx16_128 = prep(128)
    timed("qpC", "C", 512, 1024, 4, 128, (xp128, sx16_128, qt.qs, sp), reps=16)
    timed("qpA", "A", 512, 1024, 4, 128, (xe128, xo128, sx16_128, qt.qs, sp),
          reps=16)


if __name__ == "__main__":
    main()
