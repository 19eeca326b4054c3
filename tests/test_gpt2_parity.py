"""Logit parity: our TPU-native GPT-2 vs the reference precompiled engine.

Builds a synthetic tiny GPT-2, loads it into BOTH engines, and compares
last-token logits after single and multi-step (KV cache) evals. This
validates the whole stack at once: legacy container writer/reader, quant
codecs, loader weight-layout handling, and the jitted forward pass.
"""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.models import gpt2

from .fixtures import FTYPE_F32, FTYPE_Q4_0, FTYPE_Q8_0, build_gpt2, ref_llm


def _compare(ref, eng, tokens_a, tokens_b, atol):
    ref.eval(tokens_a)
    eng.eval(tokens_a)
    ref_logits = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, ref_logits, atol=atol, rtol=0)
    assert int(np.argmax(eng.logits)) == int(np.argmax(ref_logits))

    # incremental eval exercises the KV cache against the reference's
    ref.eval(tokens_b)
    eng.eval(tokens_b)
    ref_logits = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, ref_logits, atol=atol, rtol=0)
    assert int(np.argmax(eng.logits)) == int(np.argmax(ref_logits))


# Tolerances bound *reference-side* approximations, not ours: for f32 the
# reference computes GELU through an fp16 lookup table (~1e-3 activation
# error); for quantized ftypes it additionally quantizes activations to int8
# and does integer dot products (ggml vec_dot_type machinery), while we
# compute exact f32 over bit-exactly dequantized weights.
@pytest.mark.parametrize(
    "ftype,atol", [(FTYPE_F32, 1e-3), (FTYPE_Q8_0, 0.05), (FTYPE_Q4_0, 0.05)]
)
def test_gpt2_logit_parity(tmp_path, ftype, atol):
    path = str(tmp_path / "gpt2.bin")
    build_gpt2(path, ftype=ftype, seed=3)
    ref = ref_llm(path, "gpt2")
    if ref is None:
        pytest.skip("reference engine unavailable")
    spec, params, vocab = gpt2.load(path)
    eng = Engine(spec, params)
    _compare(ref, eng, [5, 9, 2, 27, 41], [7, 1], atol=atol)


def test_gpt2_lm_head_variant(tmp_path):
    path = str(tmp_path / "gpt2lm.bin")
    build_gpt2(path, ftype=FTYPE_F32, seed=4, lm_head=True)
    ref = ref_llm(path, "gpt2")
    if ref is None:
        pytest.skip("reference engine unavailable")
    spec, params, vocab = gpt2.load(path)
    eng = Engine(spec, params)
    _compare(ref, eng, [3, 4, 5], [6], atol=1e-3)


def test_gpt2_metadata(tmp_path):
    path = str(tmp_path / "gpt2.bin")
    build_gpt2(path, ftype=FTYPE_F32)
    spec, params, vocab = gpt2.load(path)
    assert spec.n_vocab == 96
    assert spec.n_ctx == 64
    assert vocab.eos_token_id() == 0  # "<|endoftext|>" is token 0
    assert vocab.detokenize(1) == b"a"
    assert len(vocab) == 96


def test_engine_chunking():
    assert Engine._chunks(1, 1024) == [1]
    assert Engine._chunks(23, 1024) == [16, 4, 2, 1]
    assert Engine._chunks(64, 1024) == [64]
    assert Engine._chunks(100, 32) == [32, 32, 32, 4]
