"""Probe + honest-time an MMVQ-style decode kernel formulation on v5e.

Goal: cut the qmm kernels' per-weight-element VPU work (currently
bitcast + cast + scale-mul + bf16-cast in the champion 'si' mode) by
keeping the MXU consuming raw int values and applying the per-group
scales to PARTIAL SUMS — the analog of the reference's MMVQ CUDA path
(ggml-cuda.cu:3754-3790: activations quantized to q8_1 on device,
integer dots, per-block rescale).

Checks, in order (each may fail Mosaic lowering — that alone decides):
  1. in-kernel reshape of a bitcast int4 grid (ck, tn) -> (ng, g, tn)
  2. per-group batched dot (ng, m, g) x (ng, g, tn) -> (ng, m, tn)
     with int8 x int8 -> int32 (x pre-grouped OUTSIDE the kernel, so
     only the weight side reshapes in-kernel)
  3. the f32 rescale epilogue sum_g parts * (sx ⊗ s)
  4. an end-to-end 'mmvq' kernel vs the 'si' champion on the llama-7B
     (4096, 11264) Q4_K shape at m in {1, 8}: honest scan timing.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import marginal  # noqa: E402  (repo script helper)


def probe(name, fn, *args):
    try:
        r = np.asarray(jax.jit(fn)(*args))
        print(f"OK   {name}  sum={float(np.asarray(r, np.float64).sum()):.3f}",
              flush=True)
        return True
    except Exception as e:
        print(f"FAIL {name}  {type(e).__name__}: "
              f"{str(e)[:160].replace(chr(10), ' ')}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    G = 32

    # --- lowering probes on a small shape --------------------------------
    M, K, N = 8, 512, 256
    ng = K // G
    packed = rng.integers(0, 256, (K // 2, N), np.uint8)
    xq = rng.integers(-127, 127, (M, K), np.int8)
    xg = jnp.asarray(
        np.ascontiguousarray(
            xq.reshape(M, ng, G).transpose(1, 0, 2)
        )
    )  # (ng, M, G) int8, pre-grouped outside the kernel
    s = jnp.asarray(rng.random((ng, N), np.float32))
    sx = jnp.asarray(rng.random((ng, M), np.float32))

    def k_reshape(q_ref, o_ref):
        w4 = pltpu.bitcast(q_ref[:], jnp.int4)  # (K, N)
        w = w4.reshape(ng, G, N).astype(jnp.float32)
        o_ref[:] = w.sum(1)

    probe(
        "in-kernel bitcast+reshape (K,N)->(ng,G,N)",
        pl.pallas_call(
            k_reshape, out_shape=jax.ShapeDtypeStruct((ng, N), jnp.float32)
        ),
        jnp.asarray(packed),
    )

    def k_grouped_i8(xg_ref, q_ref, o_ref):
        w4 = pltpu.bitcast(q_ref[:], jnp.int4)
        w8 = w4.reshape(ng, G, N).astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            xg_ref[:], w8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    ok_grouped = probe(
        "grouped int8 x int8 -> int32 dot (w reshaped in-kernel)",
        pl.pallas_call(
            k_grouped_i8,
            out_shape=jax.ShapeDtypeStruct((ng, M, N), jnp.int32),
        ),
        xg, jnp.asarray(packed),
    )

    def k_full(xg_ref, q_ref, s_ref, sx_ref, o_ref):
        w4 = pltpu.bitcast(q_ref[:], jnp.int4)
        w8 = w4.reshape(ng, G, N).astype(jnp.int8)
        parts = jax.lax.dot_general(
            xg_ref[:], w8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scaled = parts * sx_ref[:][:, :, None] * s_ref[:][:, None, :]
        o_ref[:] = scaled.sum(0)

    probe(
        "full mmvq tile: grouped i8 dot + rescale epilogue",
        pl.pallas_call(
            k_full, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32)
        ),
        xg, jnp.asarray(packed), s, sx,
    )

    if not ok_grouped:
        print("grouped int8 dots do not lower; mmvq mode is dead here")
        return

    # --- honest timing on the real shape ---------------------------------
    from ctransformers_tpu.ops import qmatmul as qm

    K2, N2 = 4096, 11264
    w = (rng.standard_normal((K2, N2)) * 0.02).astype(np.float32)
    os.environ["CT_PACK4_LAYOUT"] = "adjk"
    qm._INT4_OK = True
    qt = qm.quantize_qtensor(w, "Q4_K")
    if qt.pack_layout != "adjk":
        print("adjk repack unavailable; timing skipped")
        return

    for m in (1, 8):
        x = (rng.standard_normal((m, K2)) * 0.5).astype(np.float32)
        mp = max(8, m)
        xp = np.zeros((mp, qt.qs.shape[0] * 2), np.float32)
        xp[:m, :K2] = x
        xj = jnp.asarray(xp)

        # champion 'si' today
        for tk, tn, inner, mode in ((512, 1024, 4, "si"), (512, 1024, 4, "i")):
            try:
                f = lambda xx, _tk=tk, _tn=tn, _i=inner, _m=mode: (
                    qm._qmm_pallas_tiled(xx, qt, _tk, _tn, _i, mode=_m)
                )
                dt, _ = marginal(f, xj)
                bw = qt.qs.size / dt / 1e9
                print(f"m={m} {mode}({tk},{tn},{inner}): {dt*1e6:.1f} us "
                      f"({bw:.0f} GB/s over packed bytes)", flush=True)
            except Exception as e:
                print(f"m={m} {mode}: FAIL {str(e)[:120]}", flush=True)

        # mmvq formulation as one pallas_call over N tiles
        ng2 = K2 // G
        xq2 = np.clip(np.round(
            x.reshape(m, ng2, G)
            / np.maximum(np.abs(x.reshape(m, ng2, G)).max(-1, keepdims=True),
                         1e-8) * 127.0
        ), -127, 127).astype(np.int8)
        sxv = (np.abs(x.reshape(m, ng2, G)).max(-1) / 127.0).astype(np.float32)
        xg2 = jnp.asarray(
            np.ascontiguousarray(
                np.broadcast_to(xq2, (mp, ng2, G)).transpose(1, 0, 2)
                if m < mp else xq2.transpose(1, 0, 2)
            )
        )
        sx2 = jnp.asarray(
            np.ascontiguousarray(
                np.broadcast_to(sxv, (mp, ng2)).T if m < mp else sxv.T
            )
        )
        sp, mins = qm.scale_planes(qt)

        TN = 1024
        nn = qt.qs.shape[1] // TN

        def mmvq_kernel(xg_ref, sx_ref, q_ref, s_ref, o_ref):
            w4 = pltpu.bitcast(q_ref[:], jnp.int4)  # (K2, TN)
            w8 = w4.reshape(ng2, G, TN).astype(jnp.int8)
            parts = jax.lax.dot_general(
                xg_ref[:], w8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            o_ref[:] = (
                parts * sx_ref[:][:, :, None] * s_ref[:][:, None, :]
            ).sum(0)

        try:
            call = pl.pallas_call(
                mmvq_kernel,
                grid=(nn,),
                in_specs=[
                    pl.BlockSpec((ng2, mp, G), lambda i: (0, 0, 0)),
                    pl.BlockSpec((ng2, mp), lambda i: (0, 0)),
                    pl.BlockSpec((qt.qs.shape[0], TN), lambda i: (0, i)),
                    pl.BlockSpec((ng2, TN), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((mp, TN), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct(
                    (mp, qt.qs.shape[1]), jnp.float32
                ),
            )
            # marginal() perturbs the FIRST argument with a float eps:
            # put the f32 scale plane first, int8 operands after
            f = lambda sxa, xga, qq, ss: call(xga, sxa, qq, ss)
            dt, _ = marginal(f, sx2, xg2, qt.qs, sp)
            bw = qt.qs.size / dt / 1e9
            print(f"m={m} mmvq(TN={TN}): {dt*1e6:.1f} us "
                  f"({bw:.0f} GB/s over packed bytes)", flush=True)
        except Exception as e:
            print(f"m={m} mmvq: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
