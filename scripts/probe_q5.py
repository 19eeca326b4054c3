"""Round-4 'qp' probe: SWAR nibble unpack to kill the int4->int8 cast.

r03 attribution (probe_q3): the champion Q4_K 'q' tile is compute-bound
at ~1.05 us/grid-step vs 0.73 us DMA; the residual over the Q8_0 twin
(813 GB/s ~= SOL) is the in-kernel int4->int8 cast. Direct int4 MXU
operands don't lower (probe_q4, HTTP 500). This probe tests the cast-free
alternative: bitcast the packed byte plane to int32 (free relabel), then

    lo16 = (v & 0x0F0F0F0F) << 4   # per byte: 16 * signed4(lo nibble)
    hi16 =  v & 0xF0F0F0F0         # per byte: 16 * signed4(hi nibble)

-- 3 native int32 VPU ops per 4 bytes, no relayout -- bitcast both back
to int8 and feed the MXU raw (int8 x int8 -> int32 grouped dots). Both
planes carry 16x the nibble value; the 1/16 folds into the activation
scale OUTSIDE the kernel (exact: power of two), so parity with 'q' must
be bit-exact. adjk packing puts logical row 2r in the lo nibble and
2r+1 in the hi nibble of byte row r, so the lo/hi planes pair with the
even/odd halves of each quant group's activations.

Forms (the even/odd activation split can lower differently):
  A  two xg inputs (tkg, m, 16) int8, two grouped dots
  B  one xg input (tkg, m, 32) permuted [evens|odds], in-kernel lane
     slices, two grouped dots
  C  like B but weights concatenated in-kernel -> one (ngc,32,tn) dot

Also answers (for the MMQ-analog prefill):
  - do int16 x int8 / int16 x int16 -> int32 dots lower on this v5e?
  - 'qp' vs prod 'si' at m=128

Run strictly alone on the TPU, in background with own timeout
(NOTES_NEXT_ROUND.md).
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


def swar_planes(pl, pltpu, qs_bytes):
    """(ckb, tn) int8 packed bytes -> (lo16, hi16) int8 planes, each 16x
    the signed nibble (lo = logical even rows, hi = odd)."""
    v = pltpu.bitcast(qs_bytes, jnp.int32)  # (ckb/4, tn) relabel
    lo = jax.lax.shift_left(
        jnp.bitwise_and(v, jnp.int32(0x0F0F0F0F)), jnp.int32(4)
    )
    hi = jnp.bitwise_and(v, jnp.int32(-252645136))  # 0xF0F0F0F0
    return (
        pltpu.bitcast(lo, jnp.int8),
        pltpu.bitcast(hi, jnp.int8),
    )


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)

    # ---- health control first -------------------------------------
    wd = jnp.asarray(
        rng.standard_normal((4096, 11264)).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((8, 4096), jnp.bfloat16)
    dt, _ = marginal(
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32),
        xd, wd, reps=32, trials=2,
    )
    bw = wd.size * 2 / dt / 1e9
    print(f"health: dense bf16 {dt*1e6:.1f} us = {bw:.0f} GB/s", flush=True)

    # ---- lowering probes (cheap, fail-fast) -----------------------
    def try_lower(name, kern, *args, out_shape):
        try:
            o = pl.pallas_call(kern, out_shape=out_shape)(*args)
            np.asarray(o)
            print(f"lower {name}: OK", flush=True)
            return True
        except Exception as e:
            print(f"lower {name}: FAIL {str(e)[:160]}".replace("\n", " "),
                  flush=True)
            return False

    def k_swar(q_ref, o_ref):
        lo, hi = swar_planes(pl, pltpu, q_ref[...])
        o_ref[...] = lo.astype(jnp.int32) + hi.astype(jnp.int32)

    try_lower(
        "swar-masks", k_swar, jnp.zeros((32, 128), jnp.int8),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
    )

    def k_i16i8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )

    i16i8 = try_lower(
        "int16xint8 dot", k_i16i8,
        jnp.zeros((8, 256), jnp.int16), jnp.zeros((256, 128), jnp.int8),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    i16i16 = try_lower(
        "int16xint16 dot", k_i16i8,
        jnp.zeros((8, 256), jnp.int16), jnp.zeros((256, 128), jnp.int16),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    print(f"int16 MXU: i16xi8={i16i8} i16xi16={i16i16}", flush=True)

    # ---- build the test weight ------------------------------------
    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qt = qm.quantize_qtensor(w, "Q4_K")
    assert qt.pack_layout == "adjk", qt.pack_layout
    sp, _mp = qm.scale_planes(qt)
    sp = jnp.asarray(sp)
    g = qt.group  # 32
    hg = g // 2
    nbytes = qt.qs.size + sum(
        a.size * a.dtype.itemsize
        for a in (qt.scales, qt.mins, qt.sd, qt.sm) if a is not None
    )

    # pre-quantized activations (per-group symmetric int8, as production)
    def prep(m):
        xf = (rng.standard_normal((m, K)) * 0.5).astype(np.float32)
        ng = K // g
        xr = xf.reshape(m, ng, g)
        sx = (np.abs(xr).max(-1) / 127.0 + 1e-20).astype(np.float32)
        xq = np.clip(np.round(xr / sx[:, :, None]), -127, 127).astype(np.int8)
        xg = np.ascontiguousarray(xq.transpose(1, 0, 2))  # (ng, m, 32)
        xe = np.ascontiguousarray(xg[:, :, 0::2])  # (ng, m, 16) evens
        xo = np.ascontiguousarray(xg[:, :, 1::2])  # odds
        xp = np.concatenate([xe, xo], axis=-1)  # permuted [e|o]
        sxT = np.ascontiguousarray(sx.T)  # (ng, m)
        return (jnp.asarray(xg), jnp.asarray(xe), jnp.asarray(xo),
                jnp.asarray(xp), jnp.asarray(sxT),
                jnp.asarray(sxT / 16.0))

    # ---- self-contained kernels (no bias/mins: isolate the unpack) --
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
        ck = 2 * tks // inner  # real rows per chunk
        ckb = ck // 2
        ngc = ck // g
        acc = None
        for i in range(inner):
            gs = slice(i * ngc, (i + 1) * ngc)
            lo, hi = swar_planes(pl, pltpu, qs_ref[i * ckb:(i + 1) * ckb, :])
            lg = lo.reshape(ngc, hg, tnn)
            hgr = hi.reshape(ngc, hg, tnn)
            if form == "A":
                xe = xe_ref[gs, :, :]
                xo = xo_ref[gs, :, :]
            else:
                xe = xp_ref[gs, :, :hg]
                xo = xp_ref[gs, :, hg:]
            dn = (((2,), (1,)), ((0,), (0,)))
            if form == "C":
                wcat = jnp.concatenate([lg, hgr], axis=1)  # (ngc, 32, tn)
                parts = jax.lax.dot_general(
                    xp_ref[gs, :, :], wcat, dn,
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.float32)
            else:
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

    # ---- parity (rm=1): qp forms must be BIT-exact vs the q kernel --
    xg1, xe1, xo1, xp1, sx1, sx16_1 = prep(1)
    try:
        ref = np.asarray(build("q", 512, 1024, 4, 1)(xg1, sx1, qt.qs, sp))
    except Exception as e:
        print(f"q ref FAILS: {str(e)[:200]}", flush=True)
        return
    for form in ("A", "B", "C"):
        try:
            if form == "A":
                o = build(form, 512, 1024, 4, 1)(xe1, xo1, sx16_1, qt.qs, sp)
            else:
                o = build(form, 512, 1024, 4, 1)(xp1, sx16_1, qt.qs, sp)
            o = np.asarray(o)
            exact = np.array_equal(o, ref)
            rel = np.abs(o - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"parity {form}: exact={exact} maxrel={rel:.2e}", flush=True)
        except Exception as e:
            print(f"parity {form}: FAIL {str(e)[:200]}".replace("\n", " "),
                  flush=True)

    # ---- timing rm=1 ----------------------------------------------
    entries = [("q", "q", 512, 1024, 4), ("q-big", "q", 1024, 1024, 8)]
    for form in ("A", "B", "C"):
        entries.append((f"qp{form}", form, 512, 1024, 4))
        entries.append((f"qp{form}-big", form, 1024, 1024, 8))
    for label, form, tk, tn, inner in entries:
        try:
            f = build(form, tk, tn, inner, 1)
            if form == "q":
                args = (xg1, sx1, qt.qs, sp)
            elif form == "A":
                args = (xe1, xo1, sx16_1, qt.qs, sp)
            else:
                args = (xp1, sx16_1, qt.qs, sp)
            dtt, _ = marginal(lambda *a: f(*a), *args, reps=32, trials=2)
            print(f"rm=1 {label:8s}: {dtt*1e6:6.1f} us "
                  f"({nbytes/dtt/1e9:4.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"rm=1 {label:8s}: FAIL {str(e)[:140]}".replace("\n", " "),
                  flush=True)

    # ---- m=128 (prefill): winner form vs prod 'si' ------------------
    xg128, xe128, xo128, xp128, sx128, sx16_128 = prep(128)
    try:
        f = build("C", 512, 1024, 4, 128)
        dtt, _ = marginal(
            lambda *a: f(*a), xp128, sx16_128, qt.qs, sp, reps=16, trials=2,
        )
        print(f"m=128 qpC: {dtt*1e6:7.1f} us ({nbytes/dtt/1e9:4.0f} GB/s)",
              flush=True)
    except Exception as e:
        print(f"m=128 qpC: FAIL {str(e)[:140]}".replace("\n", " "), flush=True)
    x128 = jnp.asarray((rng.standard_normal((128, K)) * 0.5).astype(np.float32))
    for tk, tn, inner, mode in ((2048, 1024, 8, "si"), (1024, 1024, 8, "si")):
        try:
            f = lambda xx, _t=(tk, tn, inner, mode): qm._qmm_pallas_tiled(
                xx, qt, _t[0], _t[1], _t[2], mode=_t[3], rm=128
            )
            dtt, _ = marginal(f, x128, reps=16, trials=2)
            print(f"m=128 prod {mode}({tk},{tn},{inner}): {dtt*1e6:7.1f} us "
                  f"({nbytes/dtt/1e9:4.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"m=128 prod {mode}: FAIL {str(e)[:140]}".replace("\n", " "),
                  flush=True)


if __name__ == "__main__":
    main()
