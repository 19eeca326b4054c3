"""Regression tests for the 🤗 Transformers interop layer.

These exercise the behavior the reference ships via `hf=True`
(reference ctransformers/transformers.py + hub.py:219-253): a
PreTrainedModel/PreTrainedTokenizer pair whose generate() output matches
the native engine's greedy path. Added after a latent bug (tokenizer
constructed without get_vocab support, breaking transformers>=4.34) slipped
through because nothing drove this adapter.
"""

import numpy as np
import pytest

from ctransformers_tpu import AutoModelForCausalLM

from .fixtures import FTYPE_Q8_0, build_gpt2

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hf") / "tiny-gpt2.bin")
    build_gpt2(path, ftype=FTYPE_Q8_0, seed=11)
    return path


@pytest.fixture(scope="module")
def hf_model(model_path):
    return AutoModelForCausalLM.from_pretrained(model_path, model_type="gpt2", hf=True)


@pytest.fixture(scope="module")
def native(model_path):
    return AutoModelForCausalLM.from_pretrained(model_path, model_type="gpt2")


@pytest.fixture(scope="module")
def tokenizer(hf_model):
    from ctransformers_tpu.transformers import CTransformersTokenizer

    return CTransformersTokenizer(hf_model._llm)


def test_tokenizer_surface(tokenizer, native):
    assert tokenizer.vocab_size == native.vocab_size
    vocab = tokenizer.get_vocab()
    assert len(vocab) > 0
    # round-trip through the HF encode/decode path
    enc = tokenizer(" hello world")
    assert enc["input_ids"], "encode produced no ids"
    assert tokenizer.decode(enc["input_ids"]) == " hello world"
    assert tokenizer.eos_token_id == native.eos_token_id


def test_generate_matches_native_greedy(hf_model, tokenizer, native):
    """HF generate() (greedy, no sampling) must reproduce the native
    engine's greedy decode when the native repetition penalty is off."""
    prompt = " the cat"
    import torch

    ids = tokenizer(prompt, return_tensors="pt")["input_ids"]
    out = hf_model.generate(ids, max_new_tokens=6, do_sample=False)
    hf_new = out[0, ids.shape[1] :].tolist()

    ref = native(
        prompt,
        max_new_tokens=6,
        top_k=1,
        temperature=1.0,
        repetition_penalty=1.0,
        seed=3,
    )
    ref_ids = native.tokenize(ref, add_bos_token=False)
    assert native.detokenize(hf_new) == ref


def test_forward_logits_match_native_eval(hf_model, native):
    import torch

    tokens = native.tokenize(" the cat")
    native.reset()  # discard any cached prefix before a fresh eval
    native.eval(tokens)
    want = np.asarray(native.logits, dtype=np.float32).copy()

    got = hf_model(torch.tensor([tokens]), return_dict=True).logits
    assert got.shape == (1, 1, native.vocab_size)
    np.testing.assert_allclose(got[0, 0].numpy(), want, rtol=1e-5, atol=1e-5)


def test_pipeline_text_generation(hf_model, tokenizer):
    from transformers import pipeline

    pipe = pipeline(
        "text-generation", model=hf_model, tokenizer=tokenizer, device=-1
    )
    out = pipe(" the cat", max_new_tokens=4, do_sample=False)
    assert isinstance(out[0]["generated_text"], str)
    assert out[0]["generated_text"].startswith(" the cat")
