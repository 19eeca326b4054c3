"""Classifier-free guidance end-to-end through the public LLM API.

The reference implements CFG as a sampler op over TWO contexts: the main
context's logits are blended with a guidance context that evaluated the
negative prompt (llama_sample_classifier_free_guidance, llama.cpp:4139-4173,
driven by a second llama_context in its examples). Here the guidance
context is a second Engine sharing device weights.
"""

import numpy as np
import pytest

from ctransformers_tpu import AutoModelForCausalLM

from .fixtures import build_gpt2


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cfg") / "tiny_gpt2.bin")
    build_gpt2(path, n_vocab=96, n_ctx=64, n_embd=32, n_head=4, n_layer=2)
    return AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")


def test_cfg_blend_formula():
    from ctransformers_tpu.llm import LLM

    rng = np.random.RandomState(0)
    base = rng.randn(32).astype(np.float32)
    guide = rng.randn(32).astype(np.float32)
    scale = 2.5
    out = LLM._cfg_blend(base, guide, scale)

    def logsm(x):
        m = x.max()
        return x - (m + np.log(np.exp(x - m).sum()))

    expect = scale * (logsm(base) - logsm(guide)) + logsm(guide)
    np.testing.assert_allclose(out, expect, atol=1e-5, rtol=1e-5)


def test_cfg_neutral_when_negative_equals_prompt(llm):
    """negative_prompt == prompt makes both contexts identical, so the
    blend is an exact no-op: greedy output must match plain generation."""
    plain = llm("ab cd", max_new_tokens=6, temperature=0.0, seed=1,
                repetition_penalty=1.0)
    guided = llm("ab cd", max_new_tokens=6, temperature=0.0, seed=1,
                 repetition_penalty=1.0,
                 guidance_scale=3.0, negative_prompt="ab cd")
    assert guided == plain


def test_cfg_scale_one_disables(llm):
    plain = llm("ab", max_new_tokens=4, temperature=0.0, seed=1,
                repetition_penalty=1.0)
    guided = llm("ab", max_new_tokens=4, temperature=0.0, seed=1,
                 repetition_penalty=1.0,
                 guidance_scale=1.0, negative_prompt="zzz zzz")
    assert guided == plain


def test_cfg_deterministic_and_streaming(llm):
    a = llm("ab", max_new_tokens=6, temperature=0.0, seed=7,
            repetition_penalty=1.0, guidance_scale=2.0,
            negative_prompt="cd ef")
    b = "".join(
        llm("ab", max_new_tokens=6, temperature=0.0, seed=7,
            repetition_penalty=1.0, guidance_scale=2.0,
            negative_prompt="cd ef", stream=True)
    )
    assert a == b


def test_cfg_changes_logit_blend(llm):
    """With a different negative prompt and a large scale, the blended
    logits differ from the base logits (the blend actually happened)."""
    toks = llm.tokenize("ab cd")
    llm.eval(llm.prepare_inputs_for_generation(toks))
    base = np.array(llm._engine.logits, np.float32, copy=True)
    llm._guidance_begin("ef gh", toks)
    blended = llm._cfg_blend(base, llm._guidance.logits, 4.0)
    assert not np.allclose(blended, base, atol=1e-3)
    # argmax may or may not move on a tiny random model; the distribution
    # must shift in the CFG direction: scale*(base-guide)+guide
    assert blended.shape == base.shape
