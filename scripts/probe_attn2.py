"""Explain the in-program decode-attention gap (r03).

The single-stream ablation attributes 1.70 ms/step to attention
streaming+softmax at window 256 (53 us/layer = 158 GB/s effective) while
probe_attention measured the same einsum at 807 GB/s standalone (S=1024).
Hypotheses, each timed at B=1:

  a. small-S inefficiency: standalone einsum at S in {256, 512, 1024} —
     if us/layer barely changes with S, the op is latency-bound and the
     in-program number is its floor.
  b. window-slice-of-updated-buffer: same einsum, but the cache is a
     [0:window) slice of a bigger (n_ctx) buffer right after a
     dynamic_update_slice write — does the slice materialize a copy?
  c. scan-over-layers: the einsum inside lax.scan indexing kv[il] per
     iteration (the production forward layout, L=4) vs unrolled.

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from _timing import marginal  # noqa: E402
import probe_attention as pa  # noqa: E402
xla_attn, HKV, DH = pa.xla_attn, pa.HKV, pa.DH

L = 4


def main():
    rng = np.random.RandomState(0)
    b = 1
    q = jnp.asarray(rng.randn(b, HKV, DH).astype(np.float32))

    # a. standalone S scaling
    for S in (256, 512, 1024):
        pa.S = S  # xla_attn reads module-level S for the mask
        k = jnp.asarray(rng.randn(b, HKV, S, DH).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, HKV, S, DH).astype(np.float32), jnp.bfloat16)
        n_past = jnp.full((b,), S - 2, jnp.int32)
        t, _ = marginal(
            lambda x, kk, vv: xla_attn(x, kk, vv, n_past), q, k, v,
            reps=64, trials=2,
        )
        byt = 2 * S * HKV * DH * 2
        print(f"a. standalone S={S}: {t*1e6:7.1f} us/layer "
              f"({byt/t/1e9:4.0f} GB/s)", flush=True)

    # b. windowed slice of a freshly-updated n_ctx buffer
    W, NCTX = 256, 1024
    pa.S = W
    kbuf = jnp.asarray(
        rng.randn(b, HKV, NCTX, DH).astype(np.float32), jnp.bfloat16
    )
    vbuf = jnp.asarray(
        rng.randn(b, HKV, NCTX, DH).astype(np.float32), jnp.bfloat16
    )
    kn = jnp.asarray(rng.randn(b, HKV, 1, DH).astype(np.float32), jnp.bfloat16)
    n_past = jnp.full((b,), W - 2, jnp.int32)

    def windowed(x, kb, vb, knew):
        kb = jax.lax.dynamic_update_slice(kb, knew, (0, 0, W - 2, 0))
        vb = jax.lax.dynamic_update_slice(vb, knew, (0, 0, W - 2, 0))
        return xla_attn(x, kb[:, :, :W], vb[:, :, :W], n_past)

    t, _ = marginal(windowed, q, kbuf, vbuf, kn, reps=64, trials=2)
    byt = 2 * W * HKV * DH * 2
    print(f"b. window {W} of n_ctx {NCTX} buffer: {t*1e6:7.1f} us/layer "
          f"({byt/t/1e9:4.0f} GB/s)", flush=True)

    # c. inside lax.scan over L layers, cache indexed kv[il]
    kL = jnp.asarray(
        rng.randn(L, b, HKV, W, DH).astype(np.float32), jnp.bfloat16
    )
    vL = jnp.asarray(
        rng.randn(L, b, HKV, W, DH).astype(np.float32), jnp.bfloat16
    )

    def scanned(x, kl, vl):
        def body(c, il):
            o = xla_attn(c, kl[il], vl[il], n_past)
            return c + o.reshape(c.shape) * 1e-30, ()

        o, _ = jax.lax.scan(body, x, jnp.arange(L))
        return o

    t, _ = marginal(scanned, q, kL, vL, reps=64, trials=2)
    byt = L * 2 * W * HKV * DH * 2
    print(f"c. scan over {L} layers, W={W}: {t/L*1e6:7.1f} us/layer "
          f"({byt/t/1e9:4.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
