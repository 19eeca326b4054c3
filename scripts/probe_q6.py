"""Settle the Q4_K decode-kernel bandwidth question with raw scan timing.

probe_q5b's marginal (1x-vs-4x slope) readings went unphysical under
drift ('q'(1024,1024,8) read 1162 GB/s > HBM peak), so this probe uses
the robust estimator from NOTES: min over consecutive dispatches of a
reps=128 scan — the flat dispatch round-trip amortizes to ~0.25 us/iter
and is subtracted via a directly-measured trivial-dispatch RT.

Questions:
  1. true GB/s of the production Q4_K 'q' tiles (512,1024,4) and
     (1024,1024,8) on the (4096,11264) down-proj shape at rm=1
  2. the Q8_0 'q' twin (the HBM-SOL reference from r03: 813 GB/s)
  3. do LARGER candidate tiles ((2048,1024,8) packed, (1024,2048,8))
     push Q4_K closer to SOL? (grid-step overhead halves)

Run strictly alone on the TPU, in background, own timeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import make_loop

# REPS must swamp the DISPATCH-RT JITTER, not just the RT: wall_min picks
# the dispatch whose round-trip drifted lowest (24-45 ms observed), so
# subtracting a separately-measured RT misestimates by the jitter /
# REPS — at reps=128 that is +-80 us/iter and produced >HBM-peak
# fictions; at 4096 it is +-2.5 us.
REPS = int(os.environ.get("PROBE_REPS", "4096"))


def min_time(loop, visits=4):
    best = float("inf")
    loop()  # warm
    for _ in range(visits):
        t0 = time.perf_counter()
        loop()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    os.environ.setdefault("CT_PACK4_LAYOUT", "adjk")
    from ctransformers_tpu.ops import qmatmul as qm

    rng = np.random.default_rng(0)

    # flat dispatch round-trip estimate (trivial program)
    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    np.asarray(tiny(z))
    rt = min(
        (lambda t0: (np.asarray(tiny(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(6)
    )
    print(f"dispatch RT ~{rt*1e3:.1f} ms -> {rt/REPS*1e6:.2f} us/iter at "
          f"reps={REPS}", flush=True)

    K, N = 4096, 11264
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    x = jnp.asarray((rng.standard_normal((8, K)) * 0.5).astype(np.float32))

    # dense bf16 control
    wd = jnp.asarray(w, jnp.bfloat16)
    loop = make_loop(
        lambda xx, ww: jnp.dot(
            xx.astype(jnp.bfloat16), ww, preferred_element_type=jnp.float32
        ),
        x, wd, reps=REPS,
    )
    t = min_time(loop) / REPS - rt / REPS
    print(f"dense bf16 control: {t*1e6:6.1f} us  {wd.size*2/t/1e9:4.0f} GB/s",
          flush=True)

    for kind in ("Q4_K", "Q8_0"):
        qt = qm.quantize_qtensor(w, kind)
        nb = qt.qs.size * qt.qs.dtype.itemsize + sum(
            a.size * a.dtype.itemsize
            for a in (qt.scales, qt.mins, qt.sd, qt.sm) if a is not None
        )
        rows = qt.qs.shape[0]
        tiles = (
            [(512, 1024, 4, "q"), (1024, 1024, 8, "q"), (2048, 1024, 8, "q"),
             (1024, 2048, 8, "q"), (2048, 2048, 8, "q")]
            if kind == "Q4_K"
            else [(1024, 1024, 8, "q"), (2048, 1024, 8, "q"),
                  (4096, 1024, 8, "q")]
        )
        for tk, tn, inner, mode in tiles:
            if rows % tk:
                continue
            try:
                f = lambda xx, _t=(tk, tn, inner, mode): qm._qmm_pallas_tiled(
                    xx, qt, _t[0], _t[1], _t[2], mode=_t[3], rm=1
                )
                loop = make_loop(f, x, reps=REPS)
                t = min_time(loop) / REPS - rt / REPS
                print(
                    f"{kind} {mode}({tk},{tn},{inner}): {t*1e6:6.1f} us  "
                    f"{nb/t/1e9:4.0f} GB/s ({nb/2**20:.1f} MB)", flush=True,
                )
            except Exception as e:
                print(f"{kind} {mode}({tk},{tn},{inner}): FAIL "
                      f"{str(e)[:120]}".replace("\n", " "), flush=True)
        del qt


if __name__ == "__main__":
    main()
