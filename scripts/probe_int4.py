"""Probe: does Mosaic on this v5e lower int4 bitcast/cast chains?

If `pltpu.bitcast(int8_tile, jnp.int4)` + `.astype(...)` lowers, the
packed-4-bit dequant kernels can replace the 5-op floor-chain nibble
unpack (cast, mul 1/16, floor, mul 16, sub — the measured ~55 us VPU
floor, NOTES_NEXT_ROUND.md) with a ~1-op cast and become DMA-bound
(~32 us for a (4096,11264) Q4_K tile).

Interpret-mode semantics (verified on CPU 2026-08-18): the bitcast
DOUBLES AXIS -2 (sublanes) — byte row k yields int4 row 2k (low nibble)
and 2k+1 (high nibble), nibbles read as SIGNED two's complement. So the
i4 layout packs two ADJACENT K rows of the same column per byte, with
values stored as (q - 8) in [-8, 7].

Each candidate compiles and runs standalone; failures print the Mosaic
error. Run ALONE on the TPU, in the background, with a generous
self-timeout (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_adjacent_k(w4):
    """(K, N) int values in [-8, 7] -> (K//2, N) int8 bytes: row k holds
    original rows 2k (low nibble) and 2k+1 (high), two's complement."""
    lo = (w4[0::2] & 0xF).astype(np.uint8)
    hi = (w4[1::2] & 0xF).astype(np.uint8)
    return ((hi << 4) | lo).view(np.int8)


def unpack_ref(qs):
    b = qs.view(np.uint8).astype(np.int32)
    lo, hi = b & 0xF, b >> 4
    lo = np.where(lo >= 8, lo - 16, lo)
    hi = np.where(hi >= 8, hi - 16, hi)
    out = np.empty((qs.shape[0] * 2, qs.shape[1]), np.int32)
    out[0::2], out[1::2] = lo, hi
    return out


def _kernel_i4_cast(qs_ref, o_ref):
    q4 = pltpu.bitcast(qs_ref[...], jnp.int4)  # (2*kb, n)
    o_ref[...] = jnp.sum(q4.astype(jnp.float32), axis=0, keepdims=True)


def _kernel_i4_cast_bf16(qs_ref, o_ref):
    q4 = pltpu.bitcast(qs_ref[...], jnp.int4)
    o_ref[...] = jnp.sum(
        q4.astype(jnp.bfloat16).astype(jnp.float32), axis=0, keepdims=True
    )


def _kernel_i4_dot(x_ref, qs_ref, o_ref):
    """unpack via i4 bitcast + bf16 cast, then bf16 MXU dot."""
    w = pltpu.bitcast(qs_ref[...], jnp.int4).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel_i4_dot_int8(x_ref, qs_ref, o_ref):
    """i4 -> i8, int8 x int8 -> int32 MXU dot (x pre-quantized int8)."""
    w = pltpu.bitcast(qs_ref[...], jnp.int4).astype(jnp.int8)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _kernel_floor_dot(x_ref, qs_ref, o_ref):
    """current floor-chain unpack + dot, as the timing control (K-split
    layout: different row order than i4, timing-equivalent only)."""
    b = pltpu.bitcast(qs_ref[...], jnp.int8).astype(jnp.float32)
    f = jnp.floor(b * (1.0 / 16.0))
    l = b - f * 16.0
    w = jnp.concatenate([l - 8.0, f - 8.0], axis=0).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def try_run(name, fn, *args, out_shape, check=None):
    try:
        f = pl.pallas_call(fn, out_shape=out_shape)
        r = np.asarray(jax.jit(f)(*args))
        ok = ""
        if check is not None:
            err = np.abs(r - check).max()
            ok = f"  max|err|={err:.4f}" + (" MATCH" if err < 2e-2 else " WRONG")
        print(f"  {name}: LOWERS{ok}", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:140]
        print(f"  {name}: FAILS   {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    kb, n = 256, 1024  # byte rows x lanes -> K = 512
    w4 = rng.integers(-8, 8, (2 * kb, n), dtype=np.int32)
    qs = jnp.asarray(pack_adjacent_k(w4))
    assert np.array_equal(unpack_ref(np.asarray(qs)), w4)

    xf = rng.standard_normal((8, 2 * kb)).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    xi8 = jnp.asarray(
        np.clip(np.round(xf * 10), -127, 127).astype(np.int8)
    )

    print("int4 lowering probes:", flush=True)
    of = jax.ShapeDtypeStruct((1, n), jnp.float32)
    ref_sum = w4.sum(axis=0, keepdims=True).astype(np.float32)
    try_run("i4->f32 cast ", _kernel_i4_cast, qs, out_shape=of,
            check=ref_sum)
    try_run("i4->bf16 cast", _kernel_i4_cast_bf16, qs, out_shape=of,
            check=ref_sum)

    od = jax.ShapeDtypeStruct((8, n), jnp.float32)
    ref_dot = np.asarray(x, np.float32) @ w4.astype(np.float32)
    ok_dot = try_run(
        "i4->bf16 + dot", _kernel_i4_dot, x, qs, out_shape=od,
        check=ref_dot,
    )
    ref_i8 = (
        np.asarray(xi8, np.int32) @ w4.astype(np.int32)
    ).astype(np.float32)
    try_run("i4->i8 int dot", _kernel_i4_dot_int8, xi8, qs, out_shape=od,
            check=ref_i8)
    try_run("floor control ", _kernel_floor_dot, x, qs, out_shape=od)

    if not ok_dot:
        print("i4 dot unavailable; keep the floor chain")
        return

    # timing on a llama-shape tile, grid over N
    from _timing import marginal

    KB, N = 2048, 11264  # K=4096
    qs_big = jnp.asarray(rng.integers(-128, 128, (KB, N), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal((8, 2 * KB)).astype(np.float32),
                     jnp.bfloat16)
    for name, kern in (("i4   ", _kernel_i4_dot),
                       ("floor", _kernel_floor_dot)):
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
            print(f"  {name} big tile: {dt*1e6:7.1f} us  "
                  f"{bw:5.0f} GB/s over packed bytes", flush=True)
        except Exception as e:
            print(f"  {name} big tile FAILS "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
