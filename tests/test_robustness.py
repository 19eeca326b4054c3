"""Robustness: malformed model files fail loudly, the scheduler survives
oversubscription with mixed lengths/dtypes, and engines reject abuse."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params


def _fixture_gpt2(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=2)
    return path


def test_truncated_model_file_raises(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    path = _fixture_gpt2(tmp_path)
    data = open(path, "rb").read()
    for cut in (4, 64, len(data) // 2):
        trunc = str(tmp_path / f"t{cut}.bin")
        with open(trunc, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(Exception) as ei:
            AutoModelForCausalLM.from_pretrained(trunc, model_type="gpt2")
        # any structured error is fine; a silent wrong load is not
        assert ei.type in (ValueError, EOFError, OSError, RuntimeError), ei


def test_corrupt_gguf_magic_raises(tmp_path):
    from ctransformers_tpu.formats.gguf import GGUFReader

    bad = str(tmp_path / "bad.gguf")
    with open(bad, "wb") as f:
        f.write(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(bad)


def test_wrong_model_type_is_loud(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    path = _fixture_gpt2(tmp_path)
    with pytest.raises(Exception):
        # gpt2 binary parsed as an mpt file must error, not mis-load
        AutoModelForCausalLM.from_pretrained(path, model_type="mpt")


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_scheduler_oversubscribed_mixed_lengths(kv_dtype):
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    spec = LLAMA_TINY
    params = random_params(spec, seed=11)
    sched = BatchScheduler(spec, params, batch_slots=2, kv_dtype=kv_dtype)
    rng = np.random.RandomState(0)
    want = {}
    for i in range(7):  # 7 requests through 2 slots
        n_prompt = int(rng.randint(1, 20))
        n_new = int(rng.randint(1, 8))
        toks = [int(x) for x in rng.randint(0, spec.n_vocab, n_prompt)]
        uid = sched.submit(
            Request(tokens=toks, max_new_tokens=n_new, sampler="greedy")
        )
        want[uid] = n_new
    results = sched.run()
    assert set(results) == set(want)
    for uid, toks in results.items():
        assert len(toks) == want[uid]


def test_engine_eval_beyond_context_clamps():
    from ctransformers_tpu.engine.engine import Engine

    spec = LLAMA_TINY  # n_ctx = 64
    params = random_params(spec, seed=11)
    eng = Engine(spec, params)
    eng.eval(list(range(1, 61)))
    # overflow: reference clamps n_past (llm.h:126) instead of crashing
    eng.eval([1] * 10)
    assert eng.n_past <= spec.n_ctx
    assert eng.logits is not None and np.isfinite(eng.logits).all()


def test_decode_past_context_returns_empty():
    from ctransformers_tpu.engine.engine import Engine

    spec = LLAMA_TINY
    params = random_params(spec, seed=11)
    eng = Engine(spec, params)
    eng.eval(list(range(1, 64)))
    toks = eng.decode(10, temperature=0.0, repetition_penalty=1.0)
    assert len(toks) <= 1  # only the one free slot remains
