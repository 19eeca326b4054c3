"""Repack cache: warm loads come from mmap'd sidecars, not a re-decode
(formats/repack_cache.py — the reference's llama_mmap analog,
llama.cpp:470-798)."""

import os

import numpy as np
import pytest

from . import fixtures
from ctransformers_tpu.formats import repack_cache
from ctransformers_tpu.models.registry import load_model


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CT_REPACK_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("CT_REPACK_CACHE_MIN", "0")
    monkeypatch.setenv("CT_REPACK_CACHE_SYNC", "1")
    return tmp_path


def _tree_equal(a, b):
    from ctransformers_tpu.ops import qmatmul as qm
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_gguf(cache_env, tmp_path):
    path = str(tmp_path / "m.gguf")
    fixtures.build_llama_gguf(path, wtype=fixtures.GGMLType.Q4_K)
    cold = load_model(path, "llama")
    # second load must hit (same key)
    warm = load_model(path, "llama")
    assert cold.spec == warm.spec
    assert len(cold.vocab) == len(warm.vocab)
    _tree_equal(cold.params, warm.params)
    # large arrays really are mmap'd from sidecars
    base = repack_cache._cfg()
    key = repack_cache._key(path, -1)
    entry = os.path.join(base, key)
    assert os.path.exists(os.path.join(entry, "meta.pkl"))
    # warm bundle generates identically to cold through the engine
    from ctransformers_tpu.engine.engine import Engine

    e1, e2 = Engine(cold.spec, cold.params), Engine(warm.spec, warm.params)
    toks = [1, 5, 9, 12, 7]
    e1.eval(toks)
    e2.eval(toks)
    np.testing.assert_allclose(e1.logits, e2.logits, rtol=1e-6)


def test_invalidation_on_file_change(cache_env, tmp_path):
    path = str(tmp_path / "m.gguf")
    fixtures.build_llama_gguf(path, wtype=fixtures.GGMLType.Q4_0, seed=1)
    load_model(path, "llama")
    k1 = repack_cache._key(path, -1)
    # rewrite with different weights -> different mtime/size -> new key
    fixtures.build_llama_ggjt(path, wtype=fixtures.GGMLType.Q4_0, seed=2)
    os.utime(path, ns=(1, 2))
    k2 = repack_cache._key(path, -1)
    assert k1 != k2
    fresh = load_model(path, "llama")  # must NOT serve the stale bundle
    assert fresh.spec is not None


def test_context_length_in_key(cache_env, tmp_path):
    path = str(tmp_path / "m.gguf")
    fixtures.build_llama_gguf(path, wtype=fixtures.GGMLType.Q8_0)
    a = load_model(path, "llama", context_length=32)
    b = load_model(path, "llama", context_length=48)
    assert a.spec.n_ctx == 32 and b.spec.n_ctx == 48


def test_disabled(cache_env, tmp_path, monkeypatch):
    monkeypatch.setenv("CT_REPACK_CACHE", "0")
    path = str(tmp_path / "m.gguf")
    fixtures.build_llama_gguf(path, wtype=fixtures.GGMLType.Q5_K)
    load_model(path, "llama")
    assert repack_cache._cfg() is None


def test_min_size_gate(cache_env, tmp_path, monkeypatch):
    monkeypatch.setenv("CT_REPACK_CACHE_MIN", str(1 << 40))
    path = str(tmp_path / "m.gguf")
    fixtures.build_llama_gguf(path, wtype=fixtures.GGMLType.Q6_K)
    load_model(path, "llama")
    base = repack_cache._cfg()
    assert not os.path.exists(
        os.path.join(base, repack_cache._key(path, -1))
    )
