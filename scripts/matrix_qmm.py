"""Reliably time qmm kernel candidates on real TPU.

Method (the tunnel/device shows hour-scale drift; ALSO: dispatching a
different compiled program than the previous dispatch costs ~30-45 ms, so
round-robin timing flattens every candidate to the same reading):
  - each candidate is one jitted 128-rep lax.scan (dispatch overhead
    amortized to <1%)
  - per visit: one UNMEASURED warm dispatch absorbs the program-switch
    cost, then consecutive timed dispatches count
  - multiple passes spread drift; per candidate keep the MIN (noise is
    one-sided)
  - a dense bf16 GEMM of known byte volume runs in the same rotation as
    an absolute-bandwidth control (NB: XLA bf16 matvec on wide shapes
    only sustains ~390 GB/s even healthy)

Run strictly alone on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

REPS = 128
TRIALS = 3


def make_loop(fn, *args):
    def run(*a):
        def body(c, _):
            o = fn(a[0] + c * 1e-30, *a[1:])
            return jnp.asarray(o).ravel()[0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    f = jax.jit(run)
    np.asarray(f(*args))  # compile + warm
    return lambda: np.asarray(f(*args))  # np.asarray: the tunnel's
    # block_until_ready returns early; only a host transfer truly syncs


def main():
    from ctransformers_tpu.ops import qmatmul as qm

    K, N = 4096, 11264
    g, sf = 32, 8
    rng = np.random.default_rng(0)
    ng = K // g
    nsup = ng // sf

    def build(mins, factored, zp=0):
        lo, hi = (-zp, 16 - zp)
        qs = rng.integers(lo, hi, (K, N), np.int8)
        kind = "Q4_0" if zp else "Q4_K"
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

    def qt_bytes(qt):
        b = qt.qs.size * qt.qs.dtype.itemsize
        b += qt.scales.size * qt.scales.dtype.itemsize
        for p in (qt.mins, qt.sd, qt.sm):
            if p is not None:
                b += p.size * p.dtype.itemsize
        return b

    mp = 8
    entries = []  # (label, loop_fn, bytes)

    # absolute-bandwidth control: dense bf16 GEMM, 92.3 MB of weights
    wd = jnp.asarray(
        (rng.standard_normal((K, N)) * 0.01).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((mp, K), jnp.bfloat16)
    entries.append(
        (
            "CONTROL dense bf16",
            make_loop(
                lambda xx, ww: jnp.dot(
                    xx, ww, preferred_element_type=jnp.float32
                ),
                xd,
                wd,
            ),
            wd.size * 2,
        )
    )

    cases = [
        ("full", dict(mins=True, factored=True)),
        ("nofac", dict(mins=True, factored=False)),
        ("nomin", dict(mins=False, factored=False)),
    ]
    picks = [(512, 1024, 2, ""), (1024, 1024, 4, ""), (2048, 1024, 8, ""),
             (1024, 1024, 4, "r"),
             (512, 1024, 2, "s"), (1024, 1024, 4, "s"), (2048, 1024, 8, "s")]
    for name, cfg in cases:
        qt = build(**cfg)
        kp = qt.qs.shape[0]
        x = jnp.zeros((mp, kp * 2), jnp.float32)
        by = qt_bytes(qt)
        for tk, tn, inner, mode in picks:
            try:
                loop = make_loop(
                    lambda xx, qq, a=(tk, tn, inner, mode): qm._qmm_pallas_tiled(
                        xx, qq, a[0], a[1], a[2], mode=a[3]
                    ),
                    x,
                    qt,
                )
            except Exception as e:
                print(
                    f"{name:6s} ({tk},{tn},{inner},{mode!r}) COMPILE FAILED: "
                    f"{type(e).__name__} {str(e)[:100]}",
                    flush=True,
                )
                continue
            entries.append((f"{name:6s} ({tk:4d},{tn},{inner},{mode or '-'})", loop, by))
        print(f"built {name}", flush=True)

    best = {lab: float("inf") for lab, _, _ in entries}
    for t in range(TRIALS):
        for lab, loop, _ in entries:
            loop()  # warm: absorbs the program-switch cost
            for _ in range(3):
                t0 = time.perf_counter()
                loop()
                dt = (time.perf_counter() - t0) / REPS
                best[lab] = min(best[lab], dt)
        print(f"trial {t} done", flush=True)

    print()
    for lab, _, by in entries:
        dt = best[lab]
        print(f"{lab:28s} {dt*1e6:8.1f} us  {by/dt/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
