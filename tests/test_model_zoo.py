"""Logit parity for the legacy model zoo (gptj/neox/dolly/mpt/replit/
starcoder) vs the reference precompiled engine, on synthetic tiny models.

Each test loads the same file into both engines and compares last-token
logits after prompt eval and after incremental (KV-cache) eval. This pins
down: rope variants (partial interleaved / partial neox), parallel-residual
wiring, ALiBi, clip_qkv, fused-QKV splits, tied/untied heads, and the
per-arch tokenizers.
"""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.models.registry import load_model

from . import fixtures as fx


def _parity(path, model_type, atol=2e-3, tokens_a=(5, 9, 2, 27), tokens_b=(7, 1)):
    ref = fx.ref_llm(path, model_type)
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_model(path, model_type)
    eng = Engine(b.spec, b.params)
    for toks in (list(tokens_a), list(tokens_b)):
        ref.eval(toks)
        eng.eval(toks)
        rl = np.array(list(ref.logits), np.float32)
        np.testing.assert_allclose(eng.logits, rl, atol=atol, rtol=0)
        assert int(np.argmax(eng.logits)) == int(np.argmax(rl))
    return b


def test_gptj_parity(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_gptj(path, seed=21)
    b = _parity(path, "gptj")
    assert b.spec.rope_mode == "interleaved" and b.spec.n_rot == 8
    assert b.spec.parallel_residual and b.spec.shared_parallel_ln


def test_gptj_quantized_parity(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_gptj(path, ftype=fx.FTYPE_Q8_0, seed=22)
    _parity(path, "gptj", atol=0.05)


# The reference's precompiled gpt_neox/dollyv2 binaries NaN or diverge on
# tiny synthetic models (flaky scratch estimation), so the neox family is
# checked against the clean-room numpy oracle in np_oracle.py instead.
from .np_oracle import neox_logits


@pytest.mark.parametrize("par_res", [0, 1])
def test_gpt_neox_parity(tmp_path, par_res):
    path = str(tmp_path / "m.bin")
    fx.build_gpt_neox(path, par_res=par_res, seed=23)
    b = load_model(path, "gpt_neox")
    eng = Engine(b.spec, b.params)
    toks = [5, 9, 2, 27]
    eng.eval(toks)
    expect = neox_logits(path, toks)
    np.testing.assert_allclose(eng.logits, expect, atol=2e-4, rtol=0)
    # incremental eval (KV cache) reaches the same state
    eng2 = Engine(b.spec, b.params)
    eng2.eval(toks[:2])
    eng2.eval(toks[2:])
    np.testing.assert_allclose(eng2.logits, expect, atol=2e-4, rtol=0)
    assert b.spec.parallel_residual == bool(par_res)
    assert b.spec.rope_mode == "neox" and b.spec.n_rot == 4


def test_dolly_parity(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_gpt_neox(path, n_rot=4, seed=24)  # dolly shares the format
    b = load_model(path, "dolly-v2")
    eng = Engine(b.spec, b.params)
    toks = [5, 9, 2]
    eng.eval(toks)
    np.testing.assert_allclose(
        eng.logits, neox_logits(path, toks), atol=2e-4, rtol=0
    )
    assert b.spec.name == "dollyv2"
    assert "### End" in b.vocab.special_tokens


@pytest.mark.parametrize("clip_qkv", [0.0, 0.4])
def test_mpt_parity(tmp_path, clip_qkv):
    path = str(tmp_path / "m.bin")
    fx.build_mpt(path, clip_qkv=clip_qkv, seed=25)
    b = _parity(path, "mpt")
    assert b.spec.alibi_bias_max == 8.0
    assert b.spec.clip_qkv == pytest.approx(clip_qkv)
    assert b.spec.tied_lm_head


def test_replit_parity(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_replit(path, seed=26)
    b = _parity(path, "replit")
    ref = fx.ref_llm(path, "replit")
    for text in ["hello world", "the lld", "abc xyz", "hello"]:
        ours = b.tokenizer.tokenize(text)
        theirs = ref.tokenize(text)
        assert ours == theirs, (text, ours, theirs)
    # detokenize parity (unigram WS handling)
    ids = b.tokenizer.tokenize("hello world")
    assert "".join(
        b.tokenizer.detokenize(t).decode() for t in ids
    ) == ref.detokenize(ids)


def test_starcoder_parity(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_starcoder(path, seed=27)
    b = _parity(path, "starcoder")
    assert "<|end|>" in b.vocab.special_tokens
    # StarChat "<|end|>" is an EOS (llm.h:83-87)
    end_id = b.vocab.lookup("<|end|>")
    assert b.vocab.is_eos_token(end_id)


def test_starcoder_gptbigcode_alias(tmp_path):
    path = str(tmp_path / "m.bin")
    fx.build_starcoder(path, seed=28)
    b = load_model(path, "gpt_bigcode")
    assert b.spec.name == "starcoder"
