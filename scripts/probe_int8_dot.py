"""Probe Mosaic v5e lowering support for candidate qmm kernel shapes.

Each probe compiles + runs a tiny pallas kernel and reports OK/FAIL:
  1. int8 x int8 -> int32 MXU dot (would let the MXU consume the raw
     grid: per-group rescale applied to f32 PARTIAL sums, 1/group the
     VPU work of dequantizing every element)
  2. int8 x f32 mixed dot
  3. batched per-group dot via jax.lax.dot_general with a batch dim
     (einsum 'mgk,gkn->mgn' shape) in f32
  4. f32 partial-group accumulate: (mp, ng, tn) * s[g,n] broadcast
     then sum over g (the epilogue the grouped-dot kernel needs)

Run strictly alone on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = np.asarray(jax.jit(f)(*args))
        print(f"OK   {name}  sum={float(np.asarray(r, np.float64).sum()):.1f}",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}  {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    M, K, N, G = 8, 512, 256, 32
    ng = K // G
    xi8 = jnp.asarray(rng.integers(-8, 8, (M, K), np.int8))
    wi8 = jnp.asarray(rng.integers(-8, 8, (K, N), np.int8))
    xf = xi8.astype(jnp.float32)
    s = jnp.asarray(rng.random((ng, N), np.float32))

    def k_i8i8(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    probe("int8 x int8 -> int32 dot", k_i8i8,
          jax.ShapeDtypeStruct((M, N), jnp.int32), xi8, wi8)

    def k_i8i8_f32(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe("int8 x int8 -> f32 dot", k_i8i8_f32,
          jax.ShapeDtypeStruct((M, N), jnp.float32), xi8, wi8)

    def k_f32i8(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe("f32 x int8 mixed dot", k_f32i8,
          jax.ShapeDtypeStruct((M, N), jnp.float32), xf, wi8)

    # batched per-group dot: x (ng, M, G) @ w (ng, G, N) -> (ng, M, N)
    xg = xf.reshape(M, ng, G).transpose(1, 0, 2)
    wg = wi8.astype(jnp.float32).reshape(ng, G, N)

    def k_batched(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    probe("batched per-group f32 dot (ng,M,G)x(ng,G,N)", k_batched,
          jax.ShapeDtypeStruct((ng, M, N), jnp.float32), xg, wg)

    wgi = wi8.reshape(ng, G, N)

    def k_batched_i8(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    probe("batched per-group dot, i8 w cast in-kernel", k_batched_i8,
          jax.ShapeDtypeStruct((ng, M, N), jnp.float32), xg, wgi)

    # bf16 MXU dots: v5e rejected a bf16 LHS against f32 RHS before
    # ("Bad lhs type") — check BOTH-operands-bf16 (8x the f32 MXU rate
    # if it lowers; the dequant chain still runs f32 on the VPU)
    xb = xf.astype(jnp.bfloat16)
    wb = wi8.astype(jnp.bfloat16)

    def k_bf16(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe("bf16 x bf16 -> f32 dot", k_bf16,
          jax.ShapeDtypeStruct((M, N), jnp.float32), xb, wb)

    def k_bf16_cast(x_ref, w_ref, o_ref):
        # f32 refs, cast to bf16 right at the dot (the kernels would do
        # this: dequant in f32, feed the MXU in bf16)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe("f32-cast-to-bf16 dot", k_bf16_cast,
          jax.ShapeDtypeStruct((M, N), jnp.float32), xf,
          wi8.astype(jnp.float32))

    # epilogue: partials (ng, M, N) * s (ng, N) -> sum over g -> (M, N)
    parts = jnp.asarray(rng.random((ng, M, N), np.float32))

    def k_epi(p_ref, s_ref, o_ref):
        o_ref[:] = (p_ref[:] * s_ref[:][:, None, :]).sum(0)

    probe("per-group rescale epilogue sum", k_epi,
          jax.ShapeDtypeStruct((M, N), jnp.float32), parts, s)


if __name__ == "__main__":
    main()
