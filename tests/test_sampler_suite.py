"""llama.cpp sampler-suite semantics on analytic cases."""

import numpy as np
import pytest

from ctransformers_tpu.engine import sampler_suite as ss
from ctransformers_tpu.engine.sampler import sample_extended


def _cand(logits):
    return ss.Candidates.from_logits(np.asarray(logits, np.float32))


def test_softmax_sorts_and_normalizes():
    c = _cand([0.0, 2.0, 1.0])
    ss.softmax(c)
    assert list(c.ids) == [1, 2, 0]
    np.testing.assert_allclose(c.probs.sum(), 1.0, rtol=1e-6)
    assert c.probs[0] > c.probs[1] > c.probs[2]


def test_top_k_keeps_largest():
    c = _cand([1.0, 5.0, 3.0, 4.0])
    ss.top_k(c, 2)
    assert sorted(c.ids) == [1, 3]


def test_top_p_cut():
    # probs ~ [0.64, 0.23, 0.086, 0.03...]; p=0.8 keeps the first two
    c = _cand([4.0, 3.0, 2.0, 1.0])
    ss.top_p(c, 0.8)
    assert list(c.ids) == [0, 1]


def test_tail_free_flat_tail():
    # a sharp head with a long flat tail: tfs cuts the tail
    c = _cand([10.0, 9.5] + [0.0] * 30)
    ss.tail_free(c, 0.5)
    assert 1 <= c.size < 32
    assert int(c.ids[0]) == 0  # the head survives, the flat tail is cut


def test_typical_keeps_typical_mass():
    c = _cand([5.0, 4.0, 3.0, 2.0, 1.0])
    ss.typical(c, 0.5)
    assert 1 <= c.size < 5


def test_repetition_penalty_sign_dependent():
    c = _cand([2.0, -2.0, 1.0])
    ss.repetition_penalty(c, [0, 1], 2.0)
    got = {int(i): float(l) for i, l in zip(c.ids, c.logits)}
    assert got[0] == pytest.approx(1.0)  # positive: divided
    assert got[1] == pytest.approx(-4.0)  # negative: multiplied
    assert got[2] == pytest.approx(1.0)  # untouched


def test_frequency_presence_penalties():
    c = _cand([1.0, 1.0, 1.0])
    ss.frequency_and_presence_penalties(c, [0, 0, 1], 0.5, 0.25)
    got = {int(i): float(l) for i, l in zip(c.ids, c.logits)}
    assert got[0] == pytest.approx(1.0 - 2 * 0.5 - 0.25)
    assert got[1] == pytest.approx(1.0 - 1 * 0.5 - 0.25)
    assert got[2] == pytest.approx(1.0)


def test_mirostat_v2_adapts_mu():
    rng = np.random.RandomState(0)
    state = ss.MirostatState.create(tau=3.0)
    logits = np.linspace(5, -5, 100).astype(np.float32)
    mus = [state.mu]
    for _ in range(20):
        c = _cand(logits)
        ss.mirostat_v2(c, rng, state, tau=3.0, eta=0.2)
        mus.append(state.mu)
    assert mus[-1] != mus[0]
    assert np.isfinite(mus).all()


def test_mirostat_v1_runs():
    rng = np.random.RandomState(1)
    state = ss.MirostatState.create(tau=5.0)
    logits = np.linspace(4, -4, 200).astype(np.float32)
    toks = []
    for _ in range(10):
        c = _cand(logits)
        toks.append(ss.mirostat(c, rng, state, n_vocab=200))
    assert all(0 <= t < 200 for t in toks)


def test_sample_extended_greedy_and_determinism():
    logits = np.asarray([0.1, 3.0, 0.2], np.float32)
    assert sample_extended(logits, temperature=0.0, tfs_z=0.9) == 1
    a = sample_extended(logits, seed=7, typical_p=0.9)
    b = sample_extended(logits, seed=7, typical_p=0.9)
    assert a == b


def test_llm_sample_extended_path(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=51)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    llm.eval(llm.tokenize("hello"))
    t1 = llm.sample(seed=3, mirostat=2)
    assert 0 <= t1 < llm.vocab_size
    t2 = llm.sample(seed=3, tfs_z=0.95, typical_p=0.9, frequency_penalty=0.1)
    assert 0 <= t2 < llm.vocab_size


def test_classifier_free_guidance():
    base = np.asarray([1.0, 2.0, 3.0], np.float32)
    guide = np.asarray([3.0, 2.0, 1.0], np.float32)
    c = ss.Candidates.from_logits(base)
    ss.classifier_free_guidance(c, guide, scale=2.0)
    # scale=1 would reproduce base log-probs; scale=2 doubles the divergence
    ls_b = base - np.log(np.exp(base).sum())
    ls_g = guide - np.log(np.exp(guide).sum())
    np.testing.assert_allclose(c.logits, 2.0 * (ls_b - ls_g) + ls_g, atol=1e-6)
