"""Bisect why bf16-MXU dots crash Mosaic inside the real qmm kernels
(HTTP 500 / tpu_compile_helper exit 1) when a minimal bf16 dot lowers
fine (probe_int8_dot.py). Variants add one real-kernel feature at a
time. Run strictly alone on the TPU (NOTES_NEXT_ROUND.md)."""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, make):
    try:
        r = np.asarray(make())
        print(f"OK   {name}  sum={float(r.sum()):.1f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"FAIL {name}  {type(e).__name__}: {msg}", flush=True)


def main():
    rng = np.random.default_rng(0)
    M, TK, TN = 8, 1024, 1024
    xf = jnp.asarray(rng.standard_normal((M, 2 * TK)).astype(np.float32))
    wf = jnp.asarray(rng.standard_normal((TK, TN)).astype(np.float32))

    # A: big-shape bf16 dot, whole refs
    def kA(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(
            x_ref[:, :TK].astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    probe("A whole-ref bf16 dot (8,1024)x(1024,1024)", lambda: pl.pallas_call(
        kA, out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32)
    )(xf, wf))

    # B: += accumulation into out_ref
    def kB(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        for i in range(2):
            o_ref[:] += jnp.dot(
                x_ref[:, i * TK // 2:(i + 1) * TK // 2].astype(jnp.bfloat16),
                w_ref[i * TK // 2:(i + 1) * TK // 2, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

    probe("B sliced lhs/rhs + accumulate", lambda: pl.pallas_call(
        kB, out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32)
    )(xf, wf))

    # C: rhs is a COMPUTED value (floor-chain like the unpack)
    def kC(x_ref, w_ref, o_ref):
        w = w_ref[:]
        f = jnp.floor(w * (1.0 / 16.0))
        l = w - f * 16.0
        o_ref[:] = jnp.dot(
            x_ref[:, :TK].astype(jnp.bfloat16),
            (l + f).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    probe("C computed rhs cast bf16", lambda: pl.pallas_call(
        kC, out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32)
    )(xf, wf))

    # D: under a 2-step grid with out accumulation across steps
    def kD(x_ref, w_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(
            x_ref[:].astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    probe("D grid + cross-step accumulate", lambda: pl.pallas_call(
        kD,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((M, TK), lambda j: (0, j)),
            pl.BlockSpec((TK, TN), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
    )(xf, jnp.concatenate([wf, wf], axis=0)))

    # E: two dots summed (like lo+hi halves)
    def kE(x_ref, w_ref, o_ref):
        d = jnp.dot(
            x_ref[:, :TK].astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        d += jnp.dot(
            x_ref[:, TK:].astype(jnp.bfloat16),
            (w_ref[:] * 2.0).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = d

    probe("E two bf16 dots summed", lambda: pl.pallas_call(
        kE, out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32)
    )(xf, wf))

    # F: M=8 vs padded sublanes — M=16
    xf16 = jnp.asarray(rng.standard_normal((16, TK)).astype(np.float32))

    def kF(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(
            x_ref[:].astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    probe("F M=16 bf16 dot", lambda: pl.pallas_call(
        kF, out_shape=jax.ShapeDtypeStruct((16, TN), jnp.float32)
    )(xf16, wf))


if __name__ == "__main__":
    main()
