"""Shared honest-timing helpers for TPU micro-harnesses.

Hard-won measurement model for this device/tunnel (2026-08-17):
  - EVERY dispatch+sync round-trip costs a flat ~24-30 ms (the tunnel),
    regardless of which program ran previously. Per-iteration readings
    of a REPS-long scan therefore carry a fixed ~30ms/REPS overhead —
    compare candidates only within the same REPS, and get absolute
    times via the MARGINAL method: time nwork=1 and nwork=4 chained
    applications per iteration; slope = true per-application time.
  - The chain scalar must be a jnp.max() reduction of the output:
    elementwise or slice carries (o[0,0]) let XLA rewrite the dead
    full-size dot into a single sliced column — the reason every dense
    "control" previously read fiction. max() cannot commute through a
    matmul. Pallas calls are opaque and were never affected.
  - np.asarray is the only true sync (block_until_ready returns early
    through the tunnel).
  - Noise is one-sided: keep the MIN over trials.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def make_loop(fn, *args, reps=64, nwork=1):
    """Jitted scan of `reps` iterations, each applying `fn` `nwork` times
    chained through a max-reduction scalar (serializes applications and
    keeps every output live). Returns a () -> None dispatcher (synced)."""

    def run(*a):
        def body(c, _):
            x = a[0]
            for _ in range(nwork):
                o = fn(x + c * 1e-30, *a[1:])
                c = jnp.max(jnp.asarray(o).astype(jnp.float32)) * 1e-30 + c
            return c, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    f = jax.jit(run)
    np.asarray(f(*args))  # compile + warm
    return lambda: np.asarray(f(*args))


def time_loops(entries, trials=3, timed=3, reps=64, progress=print):
    """entries: list of (label, loop_fn). Returns {label: best_seconds}
    per ITERATION (divided by reps). Warm dispatch first per visit (cheap
    insurance), then consecutive timed dispatches; min over all."""
    best = {}
    for t in range(trials):
        for lab, loop in entries:
            loop()
            for _ in range(timed):
                t0 = time.perf_counter()
                loop()
                best[lab] = min(
                    best.get(lab, float("inf")),
                    (time.perf_counter() - t0) / reps,
                )
        if progress:
            progress(f"trial {t} done")
    return best


def marginal(fn, *args, reps=64, trials=3, timed=2):
    """True per-application seconds of fn via the 1x-vs-4x slope."""
    loops = {n: make_loop(fn, *args, reps=reps, nwork=n) for n in (1, 4)}
    best = time_loops(
        [(n, l) for n, l in loops.items()],
        trials=trials, timed=timed, reps=reps, progress=None,
    )
    return (best[4] - best[1]) / 3, best[1]
