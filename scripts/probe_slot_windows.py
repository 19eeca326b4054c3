"""Is per-slot attention windowing worth it at 32 slots? (VERDICT r04 #6)

The batched step uses ONE global round_window bucket (scheduler.py
_live_window = max over live slots), so every slot pays the longest
slot's KV/attention read. The proposed fix — sort slots into window
groups and run one dispatch per group — trades that saved KV read for an
EXTRA full weight pass per group (each dispatch re-streams every
quantized weight, ~3.8 GB).

This probe measures both sides of that trade with the scheduler's exact
chunk body (profile_batched.chunk_fn):

  global:   one B=32 dispatch at window W_long
  grouped:  one B=16 dispatch at W_long + one B=16 dispatch at W_short
            (the best case for grouping: half the slots are short)

plus the window-cost curve t(B=32, W) for W in {128, 256, 512, 1024} —
the marginal KV-read cost per window doubling, i.e. the MOST per-slot
windowing could ever recover.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

K1, K2 = 8, 32


def timed(fn, st_factory, trials=4):
    """Marginal ms/token between chunk lengths K1/K2 (flat dispatch
    round-trip cancels), min over trials."""
    best = {}
    for k in (K1, K2):
        best[k] = float("inf")
    states = {k: st_factory() for k in (K1, K2)}
    for k in (K1, K2):  # compile + warm
        st = states[k]
        _, kv = fn[k](*st)
        states[k] = (st[0], kv) + st[2:]
    for _ in range(trials):
        for k in (K1, K2):
            st = states[k]
            t0 = time.perf_counter()
            m, kv = fn[k](*st)
            np.asarray(m)
            best[k] = min(best[k], time.perf_counter() - t0)
            states[k] = (st[0], kv) + st[2:]
    return (best[K2] - best[K1]) / (K2 - K1)


def main():
    import jax
    import jax.numpy as jnp

    from profile_batched import build, chunk_fn
    from ctransformers_tpu.models.forward import KVCache

    kv_dtype = jnp.int8  # the serving default at 32 slots
    spec, params = build()  # CT_PROF_B env is ignored here; we vary B

    def make(slots, window):
        fns = {
            k: chunk_fn(spec, k, window, False, False) for k in (K1, K2)
        }

        def st():
            kv = KVCache.create(spec, slots, kv_dtype)
            logits = jnp.zeros((slots, spec.n_vocab), jnp.float32)
            n_past = jnp.full((slots,), min(window - K2 - 1, 128), jnp.int32)
            active = jnp.ones((slots,), bool)
            keys = jnp.stack([jax.random.PRNGKey(i) for i in range(slots)])
            last = jnp.zeros((slots, 64), jnp.int32)
            return (params, kv, logits, n_past, active, keys, last)

        def fnwrap(k):
            f = fns[k]
            return lambda p, kv, lg, np_, act, keys, last: f(
                p, kv, lg, np_, act, keys, last
            )

        return {k: fnwrap(k) for k in (K1, K2)}, st

    results = {}
    # each (B, window) config costs 2 compiled programs through the
    # remote tunnel (compile + Mosaic finalization, minutes each) — keep
    # the config list minimal; add 256/512 points via CT_PROBE_EXTRA=1
    configs = [(32, 128), (32, 1024), (16, 1024), (16, 128)]
    if os.environ.get("CT_PROBE_EXTRA"):
        configs[1:1] = [(32, 256), (32, 512)]
    for slots, window in configs:
        fn, st = make(slots, window)
        ms = timed(fn, st) * 1e3
        results[(slots, window)] = ms
        print(f"B={slots:3d} window={window:5d}  {ms:7.2f} ms/step-token",
              flush=True)

    g32 = results[(32, 1024)]
    grouped = results[(16, 1024)] + results[(16, 128)]
    print(f"\nglobal  B=32 w=1024:          {g32:7.2f} ms")
    print(f"grouped B=16 w=1024 + w=128:  {grouped:7.2f} ms "
          f"({'WINS' if grouped < g32 else 'LOSES'} by "
          f"{abs(g32-grouped):.2f} ms)")
    print(f"window cost curve (KV-read ceiling): "
          f"{results[(32,1024)]-results[(32,128)]:.2f} ms from w=128->1024 "
          f"on {g32:.2f}")


if __name__ == "__main__":
    main()
