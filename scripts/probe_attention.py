"""A/B the decode-attention implementations on hardware (honest timing).

Times one llama-7B-shaped decode-attention layer step at B in {1, 8}:
  xla-sm     XLA einsum over the sequence-major cache (current default)
  xla-hm     XLA einsum over the head-major cache (A/B alternative)
  pallas     ops.attention.decode_attention, bf16 cache
  xla-i8     XLA einsum over the int8 cache (factored scales)
  pallas-i8  kernel over the int8 cache

Speed-of-light references printed per config: bf16 KV read bytes / 846
GB/s (healthy dense control). Run via scripts/tpu_queue.sh BEFORE the
full benches — this decides CT_KV_LAYOUT / CT_ATTN_KERNEL / BENCH_KV
defaults. Marginal (1x vs 4x) timing per scripts/_timing.py.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from _timing import marginal  # noqa: E402

from ctransformers_tpu.models.forward import kv_quantize  # noqa: E402
from _attention_kernel import decode_attention  # noqa: E402

L, HKV, DH, S = 4, 32, 128, 1024  # 4 layers keeps HBM use modest
H = HKV


def xla_attn(q, k_l, v_l, n_past, ks_l=None, vs_l=None, hm=True):
    """One layer of the forward-pass einsum attention (decode, T=1)."""
    b = q.shape[0]
    scale = 1.0 / jnp.sqrt(jnp.float32(DH))
    cdt = jnp.bfloat16
    sub = "bthd,bhsd->bhts" if hm else "bthd,bshd->bhts"
    scores = jnp.einsum(
        sub, q[:, None].astype(cdt), k_l.astype(cdt),
        preferred_element_type=jnp.float32,
    ) * scale
    if ks_l is not None:
        sb = (ks_l if hm else ks_l.transpose(0, 2, 1))[:, :, None, :]
        scores = scores * sb
    kpos = jnp.arange(S)[None, None, None, :]
    scores = jnp.where(kpos <= n_past[:, None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    if vs_l is not None:
        sb = (vs_l if hm else vs_l.transpose(0, 2, 1))[:, :, None, :]
        probs = probs * sb
    pv_sub = "bhts,bhsd->bthd" if hm else "bhts,bshd->bthd"
    return jnp.einsum(
        pv_sub, probs.astype(cdt), v_l.astype(cdt),
        preferred_element_type=jnp.float32,
    )[:, 0]


def main():
    rng = np.random.RandomState(0)
    for b in (1, 8):
        print(f"\n=== B={b}, Hkv={HKV}, S={S}, dh={DH} (per layer) ===")
        q = jnp.asarray(rng.randn(b, H, DH).astype(np.float32))
        k_hm = jnp.asarray(
            rng.randn(L, b, HKV, S, DH).astype(np.float32), jnp.bfloat16
        )
        v_hm = jnp.asarray(
            rng.randn(L, b, HKV, S, DH).astype(np.float32), jnp.bfloat16
        )
        k_sm = jnp.transpose(k_hm, (0, 1, 3, 2, 4))
        v_sm = jnp.transpose(v_hm, (0, 1, 3, 2, 4))
        kq, ks = kv_quantize(k_hm.astype(jnp.float32))
        vq, vs = kv_quantize(v_hm.astype(jnp.float32))
        n_past = jnp.full((b,), S - 2, jnp.int32)
        kv_bytes = 2 * S * HKV * DH * 2  # per slot per layer, bf16
        print(f"bf16 KV read/layer/slot: {kv_bytes/1e6:.1f} MB; "
              f"SOL at 846 GB/s: {b*kv_bytes/846e9*1e6:.0f} us/layer")

        # arrays are passed as marginal() ARGUMENTS, never closed over:
        # closure arrays become jit constants embedded in the remote
        # compile payload (67 MB/tensor at B=8 -> tunnel HTTP 413)
        cases = [
            ("xla-hm", lambda x, k, v: xla_attn(x, k, v, n_past),
             (k_hm[0], v_hm[0])),
            ("xla-sm", lambda x, k, v: xla_attn(x, k, v, n_past, hm=False),
             (k_sm[0], v_sm[0])),
            ("xla-i8", lambda x, k, v, a, c: xla_attn(
                x, k, v, n_past, a, c), (kq[0], vq[0], ks[0], vs[0])),
            ("pallas", lambda x, k, v: decode_attention(
                x, k, v, jnp.int32(1), n_past), (k_hm, v_hm)),
            ("pallas-i8", lambda x, k, v, a, c: decode_attention(
                x, k, v, jnp.int32(1), n_past, k_scale=a, v_scale=c),
             (kq, vq, ks, vs)),
        ]
        for lab, fn, extra in cases:
            try:
                t, base = marginal(fn, q, *extra, reps=64, trials=2)
                eff = b * kv_bytes / max(t, 1e-9) / 1e9
                print(f"{lab:10s} {t*1e6:8.1f} us/layer  "
                      f"({eff:6.0f} GB/s eff over bf16 bytes)")
            except Exception as e:
                print(f"{lab:10s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
