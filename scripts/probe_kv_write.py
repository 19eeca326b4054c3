"""Is the batched decode's deferred KV scatter copying the whole cache?

forward_batched (decode) writes all layers' k/v with ONE
`.at[:, bidx, wpos].set(...)` scatter over per-slot positions into the
(L, B, S, H, dh) cache. If XLA can't alias that scatter it copies the
~2.1 GB buffer per step (~5+ ms). Candidate fix: 8 per-slot
dynamic_update_slice writes (XLA reliably in-places DUS chains under
donation), with a tiny read-modify-select standing in for mode="drop".

Times a donated-carry scan (the decode-loop structure) at nwork=1 vs 4
writes per iteration; slope = true per-write cost. Run strictly alone
on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

L, B, S, H, DH = 32, 8, 1024, 32, 128
REPS = 32
TRIALS = 3


def scatter_write(kb, vals, wpos):
    bidx = jnp.arange(B)[:, None]
    return kb.at[:, bidx, wpos].set(vals, mode="drop")


def dus_write(kb, vals, wpos):
    # vals: (L, B, 1, H, dh); wpos: (B, 1) — clamp + select emulates drop
    for b in range(B):
        pos = jnp.minimum(wpos[b, 0], S - 1)
        ok = wpos[b, 0] < S
        old = jax.lax.dynamic_slice(
            kb, (0, b, pos, 0, 0), (L, 1, 1, H, DH)
        )
        val = jnp.where(ok, vals[:, b : b + 1, :1], old)
        kb = jax.lax.dynamic_update_slice(kb, val, (0, b, pos, 0, 0))
    return kb


def make_loop(write, nwork):
    def run(kb):
        def body(carry, i):
            kb = carry
            wpos = ((i * 7 + jnp.arange(B)) % S)[:, None]
            vals = jnp.full((L, B, 1, H, DH), 1.0, kb.dtype) * (
                i % 3
            ).astype(kb.dtype)
            for w in range(nwork):
                kb = write(kb, vals, wpos + w)
            return kb, ()

        kb, _ = jax.lax.scan(body, kb, jnp.arange(REPS))
        return kb[:, :, :: S // 8, 0, 0].astype(jnp.float32).sum()

    f = jax.jit(run, donate_argnums=(0,))

    def dispatch():
        kb = jnp.zeros((L, B, S, H, DH), jnp.bfloat16)
        t0 = time.perf_counter()
        np.asarray(f(kb))
        return time.perf_counter() - t0

    dispatch()  # compile + warm
    return dispatch


def main():
    loops = {}
    for name, write in (("scatter", scatter_write), ("dus", dus_write)):
        for n in (1, 4):
            loops[(name, n)] = make_loop(write, n)
            print(f"built {name} x{n}", flush=True)

    best = {}
    for t in range(TRIALS):
        for key, loop in loops.items():
            loop()
            for _ in range(2):
                best[key] = min(best.get(key, 1e9), loop() / REPS)
        print(f"trial {t} done", flush=True)

    for name in ("scatter", "dus"):
        t1, t4 = best[(name, 1)], best[(name, 4)]
        per = (t4 - t1) / 3
        print(
            f"{name:8s} true={per*1e6:8.1f} us/write  "
            f"(1x={t1*1e6:8.1f} 4x={t4*1e6:8.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
