"""Ablate the quant-matmul kernel's dequant chain on real TPU hardware.

Times the SAME (K, N) weight shape under progressively simpler QTensor
configurations to attribute per-element VPU cost:

  q4k-full   packed 4-bit, mins, factored planes (the flagship config)
  q4k-nofac  packed 4-bit, mins, f32 planes (ablates factor reconstruction)
  q4k-nomin  packed 4-bit, no mins          (ablates the bias add)
  q40-like   packed 4-bit, zp=8, no mins    (Q4_0 config)
  int8-mins  int8 grid, mins, factored      (CT_NO_PACK4 q4_k config)
  int8-bare  int8 grid, no mins             (Q8_0 config = minimal dequant)

DMA floor for comparison: probe_dma.py measured ~687 GB/s streaming this
pattern with full-tile consumption, so anything below that is VPU-bound.

Run strictly alone on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def scan_time(fn, *args, reps=(16, 64), trials=5):
    fns = {}

    def loop(length):
        if length not in fns:
            def run(*a, _n=length):
                def body(c, _):
                    o = fn(a[0] + c * 1e-30, *a[1:])
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


def qt_bytes(qt) -> int:
    b = qt.qs.size * qt.qs.dtype.itemsize
    b += qt.scales.size * qt.scales.dtype.itemsize
    for p in (qt.mins, qt.sd, qt.sm):
        if p is not None:
            b += p.size * p.dtype.itemsize
    return b


def main():
    from ctransformers_tpu.ops import qmatmul as qm

    K, N = 4096, 11264  # half the gateup shape: big enough to be HBM-bound
    g, sf = 32, 8
    rng = np.random.default_rng(0)
    ng = K // g
    nsup = ng // sf

    def build(kind, mins, factored):
        packed = kind in ("Q4_0", "Q4_K")
        if kind == "Q4_0":
            qs = rng.integers(-8, 8, (K, N), np.int8)
        elif packed:
            qs = rng.integers(0, 16, (K, N), np.int8)
        else:
            qs = rng.integers(-127, 127, (K, N), np.int8)
        if factored:
            s = rng.integers(1, 63, (ng, N)).astype(np.int8)
            sd = (rng.random((nsup, N), np.float32) * 0.01).astype(np.float32)
            m = rng.integers(1, 63, (ng, N)).astype(np.int8) if mins else None
            sm = (
                (rng.random((nsup, N), np.float32) * 0.01).astype(np.float32)
                if mins
                else None
            )
            return qm.make_qtensor(qs, s, m, kind, g, sd=sd, sm=sm, sfactor=sf)
        s = (rng.random((ng, N), np.float32) * 0.01).astype(np.float32)
        m = (
            (rng.random((ng, N), np.float32) * 0.01).astype(np.float32)
            if mins
            else None
        )
        return qm.make_qtensor(qs, s, m, kind, g)

    cases = [
        # packed grid (Q4_K zp=0, Q4_0 zp=8); int8 grid (Q5_K-ish, Q8_0)
        ("q4k-full", dict(kind="Q4_K", mins=True, factored=True)),
        ("q4k-nofac", dict(kind="Q4_K", mins=True, factored=False)),
        ("q4k-nomin", dict(kind="Q4_K", mins=False, factored=False)),
        ("q40-like", dict(kind="Q4_0", mins=False, factored=False)),
        ("int8-mins", dict(kind="Q5_K", mins=True, factored=True)),
        ("int8-bare", dict(kind="Q8_0", mins=False, factored=False)),
    ]

    x = jnp.zeros((1, K), jnp.float32)
    for name, cfg in cases:
        try:
            qt = build(**cfg)
        except TypeError as e:
            print(f"{name:10s} build failed: {e}")
            continue
        choice = qm._pick_tiles(
            jnp.zeros((8, qt.qs.shape[0] * (2 if qt.packed else 1)), jnp.float32),
            qt,
        )
        dt = scan_time(lambda xx, qq: qm.qmatmul(xx, qq), x, qt)
        by = qt_bytes(qt)
        print(
            f"{name:10s} {by/1e6:7.1f} MB {dt*1e6:8.1f} us "
            f"{by/dt/1e9:6.0f} GB/s  choice={choice}"
        )


if __name__ == "__main__":
    main()
