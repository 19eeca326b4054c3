"""Probe: is the quant-matmul kernel DMA-pattern-bound?

Times a DMA-only Pallas kernel (body touches 8 rows; the block DMA still
streams the whole tile) over the same uint8 array blocked two ways:
  - column tiles (tk, 1024) of a row-major (K, N) array — the real
    kernel's pattern: N-strided 1 KB bursts per row
  - full-width tiles (tk, N) — fully contiguous DMAs
and a third case: the same bytes PRE-TILED to (nn, K, 1024) so column
tiles are contiguous — the candidate storage-layout fix.

Marginal scan timing (two lengths, median of trials) per DESIGN.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def marginal(fn, *args, reps=(16, 64), trials=5):
    fns = {}

    def loop(length):
        if length not in fns:
            def run(*a, _n=length):
                def body(c, _):
                    o = fn(a[0] + c.astype(a[0].dtype), *a[1:])
                    return jnp.asarray(o).ravel()[0].astype(jnp.float32), ()

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=_n)
                return c

            fns[length] = jax.jit(run)
            np.asarray(fns[length](*args))
        t0 = time.perf_counter()
        np.asarray(fns[length](*args))
        return time.perf_counter() - t0

    loop(reps[0]), loop(reps[1])
    ms = []
    for _ in range(trials):
        a = loop(reps[0])
        b = loop(reps[1])
        ms.append((b - a) / (reps[1] - reps[0]))
    return float(np.median(ms))


def main():
    K, N = 4096, 22528  # gateup shape
    qs = jnp.asarray(np.random.randint(0, 255, (K, N), np.uint8))
    x = jnp.zeros((8, 8), jnp.float32)

    def run_case(name, arr, grid, in_spec, tile_bytes):
        def kern(x_ref, q_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            # consume EVERY byte of the tile so the compiler cannot narrow
            # the DMA window: convert each sub-chunk (bounded f32
            # intermediate, scoped-VMEM safe) and reduce it through the MXU
            # with ones-matrices (cheap vs the DMA under test)
            t, tn_ = q_ref.shape[-2], q_ref.shape[-1]
            step = max(8, min(t, 524288 // tn_))
            acc = jnp.zeros((8, 128), jnp.float32)
            lhs = jnp.ones((8, step), jnp.float32)
            rhs = jnp.ones((tn_, 128), jnp.float32)
            for r0 in range(0, t, step):
                blk = q_ref[
                    tuple(
                        [0] * (arr.ndim - 2)
                        + [slice(r0, r0 + step), slice(None)]
                    )
                ]
                v = pltpu.bitcast(blk, jnp.int8).astype(jnp.float32)
                acc += jnp.dot(
                    jnp.dot(lhs, v, preferred_element_type=jnp.float32),
                    rhs,
                    preferred_element_type=jnp.float32,
                )
            o_ref[:] += acc + x_ref[0, 0]

        f = lambda xx, aa: pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, 8), lambda *g: (0, 0)),
                in_spec,
            ],
            out_specs=pl.BlockSpec((8, 128), lambda *g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(xx, aa)
        dt = marginal(f, x, arr)
        gbs = qs.size / dt / 1e9
        print(f"{name:28s} {dt*1e6:8.1f} us  {gbs:6.0f} GB/s  ({tile_bytes/1e6:.2f} MB/tile)")

    # 1) column tiles, strided (the real kernel's pattern)
    for tk, tn in ((2048, 1024), (512, 1024)):
        nk, nn = K // tk, N // tn
        run_case(
            f"strided col ({tk},{tn})",
            qs,
            (nn * nk,),
            pl.BlockSpec(
                (tk, tn), lambda g, _nk=nk: (jax.lax.rem(g, _nk), g // _nk)
            ),
            tk * tn,
        )

    # 2) full-width tiles, contiguous (1024-row tile would blow VMEM)
    for tk in (256,):
        run_case(
            f"full-width ({tk},{N})",
            qs,
            (K // tk,),
            pl.BlockSpec((tk, N), lambda g: (g, 0)),
            tk * N,
        )

    # 3) pre-tiled 3-D storage: (nn, K, tn) contiguous column tiles
    for tk, tn in ((2048, 1024),):
        nn = N // tn
        q3 = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(qs).reshape(K, nn, tn).transpose(1, 0, 2)
            )
        )
        nk = K // tk
        run_case(
            f"tiled3d ({tk},{tn})",
            q3,
            (nn * nk,),
            pl.BlockSpec(
                (1, tk, tn),
                lambda g, _nk=nk: (g // _nk, jax.lax.rem(g, _nk), 0),
            ),
            tk * tn,
        )


if __name__ == "__main__":
    main()
