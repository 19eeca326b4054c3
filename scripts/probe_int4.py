"""Probe: does Mosaic on this v5e lower int4 bitcast/cast chains?

If `pltpu.bitcast(int8_tile, jnp.int4)` + `.astype(f32)` lowers, the
packed-4-bit dequant kernels can replace the 5-op floor-chain nibble
unpack (cast, mul 1/16, floor, mul 16, sub — the measured ~55 us VPU
floor, NOTES_NEXT_ROUND.md) with a ~1-op cast and become DMA-bound
(~32 us for a (4096,11264) Q4_K tile).

Each candidate compiles and runs standalone; failures print the Mosaic
error. Run ALONE on the TPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_i4_cast(qs_ref, o_ref):
    """bitcast i8 -> i4 (doubles minor dim), cast to f32, reduce."""
    q4 = pltpu.bitcast(qs_ref[...], jnp.int4)
    o_ref[...] = jnp.sum(q4.astype(jnp.float32), axis=0, keepdims=True)


def _kernel_i4_cast_bf16(qs_ref, o_ref):
    q4 = pltpu.bitcast(qs_ref[...], jnp.int4)
    o_ref[...] = jnp.sum(q4.astype(jnp.bfloat16).astype(jnp.float32),
                         axis=0, keepdims=True)


def _kernel_i4_dot(x_ref, qs_ref, o_ref):
    """unpack via i4 cast then bf16 MXU dot."""
    q4 = pltpu.bitcast(qs_ref[...], jnp.int4).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        x_ref[...], q4, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel_floor_dot(x_ref, qs_ref, o_ref):
    """current floor-chain unpack + dot, as the timing control.
    NB unpack layout differs from i4 (hi/lo halves vs interleaved) —
    timing-equivalent, not numerically comparable."""
    b = pltpu.bitcast(qs_ref[...], jnp.int8).astype(jnp.float32)
    f = jnp.floor(b * (1.0 / 16.0))
    l = b - f * 16.0
    w = jnp.concatenate([l, f], axis=0).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        x_ref[...], w[: x_ref.shape[1] * 2 // 2, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def try_run(name, fn, *args, out_shape):
    try:
        f = pl.pallas_call(fn, out_shape=out_shape)
        r = jax.jit(f)(*args)
        np.asarray(r)
        print(f"  {name}: LOWERS  (out mean {np.asarray(r).mean():.3f})",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:140]
        print(f"  {name}: FAILS   {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    kb, n = 512, 1024  # bytes x lanes
    qs = jnp.asarray(rng.integers(-128, 128, (kb, n), dtype=np.int8))
    x = jnp.asarray(rng.standard_normal((8, kb)).astype(np.float32),
                    jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((8, 2 * kb)).astype(np.float32),
                     jnp.bfloat16)

    print("int4 lowering probes:", flush=True)
    of = jax.ShapeDtypeStruct((1, n), jnp.float32)
    ok_cast = try_run("i4->f32 cast ", _kernel_i4_cast, qs, out_shape=of)
    try_run("i4->bf16 cast", _kernel_i4_cast_bf16, qs, out_shape=of)

    od = jax.ShapeDtypeStruct((8, n), jnp.float32)
    ok_dot = try_run("i4 cast + dot", _kernel_i4_dot, x2, qs, out_shape=od)
    try_run("floor control", _kernel_floor_dot, x2, qs, out_shape=od)

    if not (ok_cast or ok_dot):
        print("int4 unpack unavailable; keep the floor chain")
        return

    # timing comparison on a llama-shape tile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _timing import marginal

    KB, N = 2048, 11264  # (4096, 11264) packed = 2048 bytes x 11264
    qs_big = jnp.asarray(rng.integers(-128, 128, (KB, N), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal((8, 2 * KB)).astype(np.float32),
                     jnp.bfloat16)

    grid = 8  # split N into 8 lanes-chunks of 1408... keep simple: whole tile
    for name, kern in (("i4", _kernel_i4_dot), ("floor", _kernel_floor_dot)):
        try:
            f = pl.pallas_call(
                kern,
                grid=(N // 1408,),
                in_specs=[
                    pl.BlockSpec((8, 2 * KB), lambda i: (0, 0)),
                    pl.BlockSpec((KB, 1408), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((8, 1408), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            )
            dt, t1 = marginal(lambda xx, qq: f(xx, qq), xb, qs_big, reps=64)
            bw = qs_big.size / dt / 1e9
            print(f"  {name:6s} big tile: {dt*1e6:7.1f} us  "
                  f"{bw:5.0f} GB/s over packed bytes", flush=True)
        except Exception as e:
            print(f"  {name} big tile FAILS {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
