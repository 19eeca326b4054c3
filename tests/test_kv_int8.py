"""Int8-quantized KV cache: correctness vs the f32 cache on every path.

The int8 cache stores symmetric per-(token, head) rows (forward.kv_quantize)
with scales factored out of both attention dots — halving KV HBM reads,
which dominate batched decode. No reference counterpart (llama.cpp's f16_kv
is the closest knob); accuracy is bounded here instead of parity-tested.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctransformers_tpu.models.forward import (
    KVCache,
    forward,
    forward_batched,
    kv_quantize,
)
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

SPEC = LLAMA_TINY
PARAMS = random_params(SPEC, seed=7)


def _run(kv_dtype, tokens, steps=4):
    """Prefill `tokens`, then greedy-decode `steps` tokens; return the
    per-step logits stack."""
    kv = KVCache.create(SPEC, batch=1, dtype=kv_dtype)
    step = jax.jit(lambda p, t, n, c: forward(SPEC, p, t, n, c))
    toks = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
    logits, _, kv = step(PARAMS, toks, jnp.int32(0), kv)
    out = [np.asarray(logits[0])]
    n_past = toks.shape[1]
    for _ in range(steps):
        tok = int(np.argmax(out[-1]))
        logits, _, kv = step(
            PARAMS, jnp.asarray([[tok]], jnp.int32), jnp.int32(n_past), kv
        )
        out.append(np.asarray(logits[0]))
        n_past += 1
    return np.stack(out)


def test_kv_quantize_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 2, 16).astype(np.float32))
    q, s = kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5, 2)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x))
    # symmetric row quantization: error bounded by scale/2 per element
    assert np.all(err <= np.asarray(s)[..., None] * 0.5 + 1e-7)


def test_forward_int8_close_to_f32():
    tokens = [3, 11, 42, 7, 19, 23]
    ref = _run(jnp.float32, tokens)
    q = _run(jnp.int8, tokens)
    # greedy path must agree; logits within int8-rounding noise
    assert np.array_equal(ref.argmax(-1), q.argmax(-1))
    np.testing.assert_allclose(q, ref, atol=0.05, rtol=0.05)


def test_forward_int8_chunked_matches_full():
    tokens = list(range(1, 40))
    try:
        os.environ["CT_ATTN"] = "chunked"
        os.environ["CT_ATTN_CHUNK"] = "32"
        chunked = _run(jnp.int8, tokens, steps=2)
        os.environ["CT_ATTN"] = "full"
        full = _run(jnp.int8, tokens, steps=2)
    finally:
        os.environ.pop("CT_ATTN", None)
        os.environ.pop("CT_ATTN_CHUNK", None)
    # same quantized cache, two attention algorithms: tight agreement
    np.testing.assert_allclose(chunked, full, atol=2e-4, rtol=2e-4)


def test_batched_int8_close_to_f32():
    b = 4
    rng = np.random.RandomState(1)
    prompts = rng.randint(0, SPEC.n_vocab, size=(b, 10)).astype(np.int32)

    def run(kv_dtype):
        kv = KVCache.create(SPEC, batch=b, dtype=kv_dtype)
        step = jax.jit(
            lambda p, t, n, c, a: forward_batched(SPEC, p, t, n, c, a)
        )
        n_past = jnp.zeros(b, jnp.int32)
        active = jnp.ones(b, bool)
        logits, _, kv = step(PARAMS, jnp.asarray(prompts), n_past, kv, active)
        outs = [np.asarray(logits)]
        pos = np.full(b, prompts.shape[1], np.int32)
        for _ in range(3):
            tok = outs[-1].argmax(-1).astype(np.int32).reshape(b, 1)
            logits, _, kv = step(
                PARAMS, jnp.asarray(tok), jnp.asarray(pos), kv, active
            )
            outs.append(np.asarray(logits))
            pos += 1
        return np.stack(outs)

    ref = run(jnp.float32)
    q = run(jnp.int8)
    assert np.array_equal(ref.argmax(-1), q.argmax(-1))
    np.testing.assert_allclose(q, ref, atol=0.05, rtol=0.05)


def test_engine_int8_greedy_matches_f32():
    from ctransformers_tpu.engine.engine import Engine

    prompt = [5, 9, 2, 33, 14]
    outs = {}
    for dt in (jnp.float32, jnp.int8):
        eng = Engine(SPEC, PARAMS, kv_dtype=dt)
        eng.eval(prompt)
        outs[dt] = eng.decode(8, temperature=0.0, repetition_penalty=1.0)
    assert outs[jnp.float32] == outs[jnp.int8]


def test_engine_int8_state_roundtrip():
    from ctransformers_tpu.engine.engine import Engine

    prompt = [5, 9, 2, 33, 14, 8]
    eng = Engine(SPEC, PARAMS, kv_dtype=jnp.int8)
    eng.eval(prompt)
    state = eng.save_state()
    cont_a = eng.decode(6, temperature=0.0, repetition_penalty=1.0)

    eng2 = Engine(SPEC, PARAMS, kv_dtype=jnp.int8)
    eng2.load_state(state)
    eng2.eval([prompt[-1]], n_past=len(prompt) - 1)  # refresh logits
    # the restored cache reproduces the original continuation
    eng2.rewind(len(prompt))
    cont_b = eng2.decode(6, temperature=0.0, repetition_penalty=1.0)
    assert cont_a == cont_b


def test_scheduler_int8_runs():
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    sched = BatchScheduler(SPEC, PARAMS, batch_slots=2, kv_dtype=jnp.int8)
    for i in range(3):
        sched.submit(
            Request(
                tokens=[(i * 13 + j) % SPEC.n_vocab for j in range(6)],
                max_new_tokens=5,
                sampler="greedy",
            )
        )
    results = sched.run()
    assert len(results) == 3
    assert all(len(v) == 5 for v in results.values())


def test_beam_int8_runs():
    from ctransformers_tpu.serving.beam import beam_search

    out = beam_search(
        SPEC, PARAMS, [1, 2, 3, 4], n_beams=2, n_predict=4,
        kv_dtype=jnp.int8,
    )
    assert len(out[0].tokens) == 4


def test_sharded_int8_kv_matches_single():
    from ctransformers_tpu.parallel import mesh as pmesh

    if jax.device_count() < 4:
        pytest.skip("needs the virtual multi-device mesh")
    tokens = jnp.asarray([[3, 11, 42, 7]], jnp.int32)

    kv = KVCache.create(SPEC, batch=1, dtype=jnp.int8)
    ref, _, _ = jax.jit(lambda p, t, n, c: forward(SPEC, p, t, n, c))(
        PARAMS, tokens, jnp.int32(0), kv
    )

    mesh = pmesh.make_mesh(4, data=1)
    sp = pmesh.shard_params(PARAMS, mesh)
    skv = pmesh.shard_kv(KVCache.create(SPEC, batch=1, dtype=jnp.int8), SPEC, mesh)
    tp, _, _ = jax.jit(lambda p, t, n, c: forward(SPEC, p, t, n, c))(
        sp, tokens, jnp.int32(0), skv
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(tp), atol=1e-4, rtol=1e-4
    )
