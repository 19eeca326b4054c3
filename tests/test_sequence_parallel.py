"""Sequence-parallel (ring attention) prefill on the virtual 8-device mesh.

The reference has no sequence parallelism (SURVEY.md §2.3 / §5) — these
tests validate the TPU-native stretch goal: ring-attention prefill equals
the single-device forward bit-for-bit within f32 tolerance, and the cache
it produces feeds the normal decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctransformers_tpu.models.forward import KVCache, forward
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
from ctransformers_tpu.parallel import mesh as pmesh
from ctransformers_tpu.parallel.sequence import prefill_sp, ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh"
)


def _full_attention(q, k, v):
    """Plain causal softmax attention oracle (f32)."""
    b, t, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = np.repeat(k, rep, axis=2)
        v = np.repeat(v, rep, axis=2)
    scores = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(dh)
    mask = np.tril(np.ones((t, t), bool))
    scores = np.where(mask[None, None], scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhts,bshd->bthd", p, v)


def test_ring_attention_matches_full():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(0)
    b, t, h, hkv, dh = 2, 64, 4, 2, 16
    q = rng.randn(b, t, h, dh).astype(np.float32)
    k = rng.randn(b, t, hkv, dh).astype(np.float32)
    v = rng.randn(b, t, hkv, dh).astype(np.float32)

    mesh = pmesh.make_mesh(8, data=1)
    n = int(mesh.shape["model"])

    def local(q, k, v):
        p = jax.lax.axis_index("model")
        block0 = p * (t // n)
        return ring_attention(q, k, v, block0, n)

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    np.testing.assert_allclose(
        np.asarray(out), _full_attention(q, k, v), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "spec_mod",
    [
        {},  # llama: neox rope, GQA, rmsnorm, swiglu
        {  # alibi family (mpt-style), MHA, learned-norm
            "rope_mode": "none",
            "alibi_bias_max": 8.0,
            "n_head_kv": 4,
        },
    ],
)
def test_prefill_sp_matches_forward(spec_mod):
    spec = LLAMA_TINY.replace(**spec_mod) if spec_mod else LLAMA_TINY
    params = random_params(spec, seed=5)
    rng = np.random.RandomState(2)
    tokens = jnp.asarray(
        rng.randint(0, spec.n_vocab, size=(1, 64)), jnp.int32
    )

    kv0 = KVCache.create(spec, batch=1)
    ref_logits, ref_hidden, ref_kv = jax.jit(
        lambda p, t, n, c: forward(spec, p, t, n, c)
    )(params, tokens, jnp.int32(0), kv0)

    mesh = pmesh.make_mesh(8, data=1)
    sp_logits, sp_hidden, sp_kv = prefill_sp(spec, params, tokens, mesh)

    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    # full-capacity buffers: both zero-initialized, both filled [0, 64)
    np.testing.assert_allclose(
        np.asarray(sp_kv.k), np.asarray(ref_kv.k), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sp_kv.v), np.asarray(ref_kv.v), atol=1e-5, rtol=1e-5
    )


def test_prefill_sp_feeds_decode():
    """The SP-prefilled cache continues through the normal decode step."""
    spec = LLAMA_TINY
    params = random_params(spec, seed=5)
    rng = np.random.RandomState(3)
    prompt = jnp.asarray(rng.randint(0, spec.n_vocab, size=(1, 56)), jnp.int32)
    # 56 tokens = 7 per ring slot on 8 devices
    mesh = pmesh.make_mesh(8, data=1)
    logits_sp, _, kv_sp = prefill_sp(spec, params, prompt, mesh)

    kv0 = KVCache.create(spec, batch=1)
    logits_ref, _, kv_ref = jax.jit(
        lambda p, t, n, c: forward(spec, p, t, n, c)
    )(params, prompt, jnp.int32(0), kv0)

    tok = jnp.asarray([[int(np.argmax(np.asarray(logits_ref)))]], jnp.int32)
    step = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c))
    l_sp, _, _ = step(params, tok, jnp.int32(56), kv_sp)
    l_ref, _, _ = step(params, tok, jnp.int32(56), kv_ref)
    np.testing.assert_allclose(
        np.asarray(l_sp), np.asarray(l_ref), atol=2e-4, rtol=2e-4
    )


def test_prefill_sp_int8_kv_matches_forward_int8():
    """SP prefill with an int8 cache quantizes identically to the normal
    write path (same kv_quantize rows), so decode continuations match."""
    spec = LLAMA_TINY
    params = random_params(spec, seed=5)
    rng = np.random.RandomState(4)
    prompt = jnp.asarray(rng.randint(0, spec.n_vocab, size=(1, 32)), jnp.int32)

    mesh = pmesh.make_mesh(8, data=1)
    _, _, kv_sp = prefill_sp(spec, params, prompt, mesh, kv_dtype=jnp.int8)

    kv0 = KVCache.create(spec, batch=1, dtype=jnp.int8)
    _, _, kv_ref = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c))(
        params, prompt, jnp.int32(0), kv0
    )
    np.testing.assert_allclose(
        np.asarray(kv_sp.k), np.asarray(kv_ref.k), atol=1, rtol=0
    )
    # scales derive from amax over k-rows computed through different op
    # orderings (shard_map vs jit) — equal up to f32 reduction noise
    np.testing.assert_allclose(
        np.asarray(kv_sp.ks), np.asarray(kv_ref.ks), atol=1e-5, rtol=5e-3
    )
