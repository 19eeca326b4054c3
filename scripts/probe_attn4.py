"""Why does decode attention cost ~55 us/layer in production but ~12 in
a minimal scan (probe_attn2 c) and ~2.6 standalone?

r03 window sweep: the production attnmath delta is FLAT in window size
(1.88 ms/step at W=256 vs 1.74 at W=512) — latency-bound, not KV
bandwidth. The remaining structural difference from the minimal probe is
the Pallas qmm custom-calls interleaved between the attention einsums.

Variants, each a jitted scan over 8 tokens x 4 unrolled layers at B=1,
W=256 (per-layer times from the marginal between the attn and no-attn
forms of the same structure):

  xla-pure     attention einsums only (reproduces probe_attn2 c)
  xla+pallas   attention chained through a real Pallas qmm per layer
  pallas-attn  the retired fused decode-attention kernel
               (scripts/_attention_kernel.py) in the same pallas context

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import marginal

L, H, DH, W = 4, 32, 128, 256
D = H * DH  # 4096


def attn_xla(q, k_l, v_l, n_past):
    scale = 1.0 / jnp.sqrt(jnp.float32(DH))
    scores = jnp.einsum(
        "bthd,bhsd->bhts", q[:, None].astype(jnp.bfloat16),
        k_l.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    ) * scale
    kpos = jnp.arange(W)[None, None, None, :]
    scores = jnp.where(kpos <= n_past[:, None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhts,bhsd->bthd", probs.astype(jnp.bfloat16),
        v_l.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )[:, 0]


def main():
    from ctransformers_tpu.ops import qmatmul as qm

    try:
        from _attention_kernel import decode_attention
    except Exception:
        decode_attention = None

    rng = np.random.default_rng(0)
    n_past = jnp.full((1,), W - 2, jnp.int32)
    kL = jnp.asarray(rng.standard_normal((L, 1, H, W, DH)).astype(np.float32),
                     jnp.bfloat16)
    vL = jnp.asarray(rng.standard_normal((L, 1, H, W, DH)).astype(np.float32),
                     jnp.bfloat16)
    # a real quantized projection per layer so each scan layer issues a
    # Pallas custom call the attention chain depends on
    wq = qm.quantize_qtensor(
        (rng.standard_normal((D, D)) * 0.02).astype(np.float32), "Q4_K"
    )
    wq = jax.tree.map(jnp.asarray, wq)
    x0 = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32))

    def make(loop_attn, use_pallas, pallas_attn=False):
        def step(x):
            for il in range(L):
                if use_pallas:
                    x = qm.qmatmul(x, wq) * 1e-3
                if loop_attn:
                    q = x.reshape(1, H, DH)
                    if pallas_attn:
                        o = decode_attention(
                            q, kL, vL, jnp.int32(il), n_past
                        )
                    else:
                        o = attn_xla(q, kL[il], vL[il], n_past)
                    x = x + o.reshape(1, D) * 1e-3
            return x

        def run(x):
            def body(c, _):
                return step(c) * (1.0 / (1e-30 + jnp.max(jnp.abs(c)))), ()

            o, _ = jax.lax.scan(body, x, None, length=8)
            return o

        return run

    def t(fn):
        dt, _ = marginal(fn, x0, reps=16, trials=2)
        return dt / 8 / L  # per layer per token

    cases = [
        ("xla-pure attn", make(True, False), make(False, False)),
        ("xla attn + pallas qmm", make(True, True), make(False, True)),
    ]
    if decode_attention is not None:
        cases.append(
            ("pallas attn + pallas qmm", make(True, True, True),
             make(False, True))
        )
    for name, with_attn, without in cases:
        try:
            d = t(with_attn) - t(without)
            print(f"{name:26s}: attn {d*1e6:6.1f} us/layer", flush=True)
        except Exception as e:
            print(f"{name:26s}: FAIL {str(e)[:180]}", flush=True)


if __name__ == "__main__":
    main()
