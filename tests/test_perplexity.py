"""Perplexity harness tests: full-logits eval correctness + sane ppl."""

import numpy as np

from ctransformers_tpu import AutoModelForCausalLM
from ctransformers_tpu.eval.perplexity import perplexity

from .fixtures import build_gpt2


def _llm(tmp_path, **kw):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=31, **kw)
    return AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")


def test_eval_all_matches_incremental(tmp_path):
    """Row t of eval_all == last-token logits after evaluating t+1 tokens."""
    llm = _llm(tmp_path)
    toks = llm.tokenize("hello world the cat")
    eng = llm._engine
    all_logits = eng.eval_all(toks, n_past=0)
    assert all_logits.shape == (len(toks), llm.vocab_size)
    for t in (0, len(toks) - 1):
        eng.reset()
        eng.eval(toks[: t + 1], n_past=0)
        np.testing.assert_allclose(all_logits[t], eng.logits, atol=2e-4)


def test_perplexity_value(tmp_path):
    """ppl equals the hand-computed mean NLL over the scored suffix."""
    llm = _llm(tmp_path)
    toks = llm.tokenize("hello world the cat is a hat")
    got = perplexity(llm, tokens=toks, window=len(toks), min_context=1)

    eng = llm._engine
    eng.reset()
    logits = eng.eval_all(toks, n_past=0).astype(np.float64)
    lps = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    nll = -sum(lps[t, toks[t + 1]] for t in range(1, len(toks) - 1))
    expect = np.exp(nll / (len(toks) - 2))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_perplexity_prefers_real_text(tmp_path):
    """A likely continuation scores lower ppl than unlikely junk."""
    llm = _llm(tmp_path)
    eng = llm._engine
    eng.reset()
    greedy = [llm.tokenize("the")[0]]
    eng.eval(greedy, n_past=0)
    for _ in range(10):
        t = int(np.argmax(eng.logits))
        greedy.append(t)
        eng.eval([t])
    rng = np.random.RandomState(0)
    junk = [greedy[0]] + [int(x) for x in rng.randint(0, llm.vocab_size, 10)]
    assert perplexity(llm, tokens=greedy, min_context=1) < perplexity(
        llm, tokens=junk, min_context=1
    )
