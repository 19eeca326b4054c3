"""Perplexity harness (the BASELINE.md quality gate: delta-ppl <= 0.1 vs
same-bit-width GGML).

The reference ships no perplexity tool (SURVEY.md section 6); this follows
the standard llama.cpp `perplexity` example methodology: split the token
stream into non-overlapping windows of the model context, evaluate
full-position logits, and score only the second half of each window (the
first half acts as conditioning context)."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def _log_softmax_pick(logits: np.ndarray, targets: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    lse = m.squeeze(-1) + np.log(np.exp(logits - m).sum(axis=-1))
    picked = logits[np.arange(len(targets)), targets]
    return picked - lse


def perplexity(
    llm,
    text: Optional[str] = None,
    tokens=None,
    window: Optional[int] = None,
    min_context: Optional[int] = None,
) -> float:
    """Perplexity of `text` (or a pre-tokenized stream) under `llm`."""
    if tokens is None:
        tokens = llm.tokenize(text)
    tokens = list(tokens)
    engine = llm._engine
    window = window or llm.context_length
    window = min(window, llm.context_length)
    if min_context is None:
        min_context = window // 2
    nll, count = 0.0, 0
    for start in range(0, max(1, len(tokens) - 1), window):
        chunk = tokens[start : start + window]
        if len(chunk) < 2:
            break
        engine.reset()
        logits = engine.eval_all(chunk, n_past=0)  # (T, V)
        first = min(min_context, len(chunk) - 1)
        targets = np.asarray(chunk[first + 1 :] if first + 1 < len(chunk) else chunk[1:], np.int64)
        preds = logits[first : first + len(targets)] if first + 1 < len(chunk) else logits[: len(targets)]
        lp = _log_softmax_pick(preds.astype(np.float64), targets)
        nll -= lp.sum()
        count += len(targets)
    engine.reset()
    if count == 0:
        return float("nan")
    return math.exp(nll / count)
