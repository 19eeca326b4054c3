"""Honestly time qmm kernel candidates on real TPU.

Method (see scripts/_timing.py for the measurement model): every
candidate's TRUE per-application time comes from the marginal
(1x-vs-4x chained, max-carry) slope — single-depth readings carry a
flat ~30ms/reps dispatch-round-trip share, and slice-carry chains let
XLA dead-code the dense candidates. A dense bf16 GEMM of known byte
volume runs in the same rotation as an absolute-bandwidth control.

Run strictly alone on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from _timing import make_loop, time_loops

REPS = 64
TRIALS = 3


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
    # (label, bytes, {nwork: loop})
    entries = []

    wd = jnp.asarray(
        (rng.standard_normal((K, N)) * 0.01).astype(np.float32), jnp.bfloat16
    )
    xd = jnp.zeros((mp, K), jnp.bfloat16)
    dense = lambda xx, ww: jnp.dot(  # noqa: E731
        xx, ww, preferred_element_type=jnp.float32
    )
    entries.append((
        "CONTROL dense bf16",
        wd.size * 2,
        {n: make_loop(dense, xd, wd, reps=REPS, nwork=n) for n in (1, 4)},
    ))

    cases = [
        ("full", dict(mins=True, factored=True)),
        ("nofac", dict(mins=True, factored=False)),
        ("nomin", dict(mins=False, factored=False)),
    ]
    picks = [(512, 1024, 2, ""), (2048, 1024, 8, "s"),
             (1024, 1024, 4, "b"), (2048, 1024, 8, "sb"),
             (512, 1024, 2, "sb")]
    for name, cfg in cases:
        qt = build(**cfg)
        kp = qt.qs.shape[0]
        x = jnp.zeros((mp, kp * 2), jnp.float32)
        by = qt_bytes(qt)
        for tk, tn, inner, mode in picks:
            fn = lambda xx, qq, a=(tk, tn, inner, mode): qm._qmm_pallas_tiled(
                xx, qq, a[0], a[1], a[2], mode=a[3]
            )
            try:
                loops = {
                    n: make_loop(fn, x, qt, reps=REPS, nwork=n) for n in (1, 4)
                }
            except Exception as e:
                print(
                    f"{name:6s} ({tk},{tn},{inner},{mode!r}) COMPILE FAILED: "
                    f"{type(e).__name__} {str(e)[:100]}",
                    flush=True,
                )
                continue
            entries.append(
                (f"{name:6s} ({tk:4d},{tn},{inner},{mode or '-'})", by, loops)
            )
        # the XLA-fused dequant+bf16 GEMM as one more candidate
        xla = lambda xx, qq=qt: qm._qmm_jnp(  # noqa: E731
            xx, qq, compute_dtype=jnp.bfloat16
        )
        try:
            entries.append((
                f"{name:6s} XLA-fused bf16",
                by,
                {n: make_loop(xla, x, qt, reps=REPS, nwork=n) for n in (1, 4)},
            ))
        except Exception as e:
            print(f"{name:6s} XLA COMPILE FAILED: {str(e)[:100]}", flush=True)
        print(f"built {name}", flush=True)

    flat = [
        ((lab, n), loop)
        for lab, _, loops in entries
        for n, loop in loops.items()
    ]
    best = time_loops(flat, trials=TRIALS, timed=3, reps=REPS)

    print()
    for lab, by, _ in entries:
        t1, t4 = best[(lab, 1)], best[(lab, 4)]
        kern = (t4 - t1) / 3
        print(
            f"{lab:28s} true={kern*1e6:7.1f} us  {by/kern/1e9:6.0f} GB/s  "
            f"(1x={t1*1e6:7.1f} 4x={t4*1e6:7.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
