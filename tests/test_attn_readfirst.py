"""Read-first decode attention (CT_ATTN_READFIRST=1) must reproduce the
write-then-read path: same greedy tokens, logits equal to fp-reorder
noise — across GQA, alibi, both cache layouts, and window buckets."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

ALIBI_TINY = LLAMA_TINY.replace(
    alibi_bias_max=8.0, rope_mode="none", n_rot=0,
    n_head_kv=LLAMA_TINY.n_head,
)


def _decode(spec, params, rf, monkeypatch, layout=None, n=8):
    monkeypatch.setenv("CT_ATTN_READFIRST", rf)
    if layout:
        monkeypatch.setenv("CT_KV_LAYOUT", layout)
    e = Engine(spec, params)
    e.eval([3, 1, 4, 1, 5, 9, 2, 6])
    toks = e.decode(n, temperature=0.0, repetition_penalty=1.0)
    return toks, np.asarray(e.logits)


@pytest.mark.parametrize("layout", ["hm", "sm"])
def test_readfirst_matches_default_gqa(layout, monkeypatch):
    params = random_params(LLAMA_TINY, seed=0, quantize="q4_k")
    t0, l0 = _decode(LLAMA_TINY, params, "0", monkeypatch, layout)
    t1, l1 = _decode(LLAMA_TINY, params, "1", monkeypatch, layout)
    assert t0 == t1
    np.testing.assert_allclose(l0, l1, rtol=2e-5, atol=2e-5)


def test_readfirst_matches_default_alibi(monkeypatch):
    params = random_params(ALIBI_TINY, seed=2, quantize="q8_0")
    t0, l0 = _decode(ALIBI_TINY, params, "0", monkeypatch)
    t1, l1 = _decode(ALIBI_TINY, params, "1", monkeypatch)
    assert t0 == t1
    np.testing.assert_allclose(l0, l1, rtol=2e-5, atol=2e-5)


def test_readfirst_int8_kv_falls_back(monkeypatch):
    # int8 cache keeps write-then-read (documented); must still decode
    monkeypatch.setenv("CT_ATTN_READFIRST", "1")
    params = random_params(LLAMA_TINY, seed=3, quantize="q4_k")
    e = Engine(LLAMA_TINY, params, kv_dtype=jnp.int8)
    e.eval([3, 1, 4])
    toks = e.decode(4, temperature=0.0, repetition_penalty=1.0)
    assert len(toks) == 4
