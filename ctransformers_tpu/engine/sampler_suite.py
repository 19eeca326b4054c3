"""Full llama.cpp sampler suite over a candidates array.

Clones the reference chain ops (llama.cpp:3805-4332) on numpy: softmax,
top-k, top-p, tail-free (3891), locally-typical (3950), temperature,
repetition penalty (4025), frequency+presence penalties (4054), mirostat
v1 (4174) and v2 (4223), greedy (4265), and the final categorical draw.
Each op mutates a `Candidates` (ids + logits + probs), exactly like
`llama_token_data_array`, so chains compose in any order the caller wants
— the same programming model as the reference C API.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Candidates:
    ids: np.ndarray  # (n,) int64
    logits: np.ndarray  # (n,) float32
    probs: Optional[np.ndarray] = None  # filled by softmax()
    sorted: bool = False

    @classmethod
    def from_logits(cls, logits) -> "Candidates":
        logits = np.asarray(logits, np.float32).reshape(-1)
        return cls(np.arange(logits.size, dtype=np.int64), logits.copy())

    @property
    def size(self) -> int:
        return self.ids.size

    def _keep(self, idx) -> None:
        self.ids = self.ids[idx]
        self.logits = self.logits[idx]
        if self.probs is not None:
            self.probs = self.probs[idx]


def softmax(c: Candidates) -> None:
    """llama_sample_softmax: sort desc by logit + normalized probs."""
    if not c.sorted:
        order = np.argsort(-c.logits, kind="stable")
        c._keep(order)
        c.sorted = True
    ex = np.exp(c.logits - c.logits[0])
    c.probs = (ex / ex.sum()).astype(np.float32)


def top_k(c: Candidates, k: int, min_keep: int = 1) -> None:
    k = max(int(k), int(min_keep))
    k = min(k, c.size)
    if not c.sorted:
        order = np.argsort(-c.logits, kind="stable")
        c._keep(order)
        c.sorted = True
    c._keep(slice(0, k))


def top_p(c: Candidates, p: float, min_keep: int = 1) -> None:
    if p >= 1.0:
        return
    softmax(c)
    cum = np.cumsum(c.probs)
    # keep until cum >= p, at least min_keep (llama_sample_top_p)
    last = int(np.searchsorted(cum, p, side="left")) + 1
    last = max(last, int(min_keep))
    c._keep(slice(0, min(last, c.size)))


def tail_free(c: Candidates, z: float, min_keep: int = 1) -> None:
    """llama_sample_tail_free (llama.cpp:3891)."""
    if z >= 1.0 or c.size <= 2:
        return
    softmax(c)
    first = c.probs[:-1] - c.probs[1:]
    second = np.abs(first[:-1] - first[1:])
    total = second.sum()
    if total > 1e-6:
        second = second / total
    else:
        second = np.full_like(second, 1.0 / second.size)
    cum = 0.0
    last_idx = c.size
    for i, v in enumerate(second):
        cum += v
        if cum > z and i >= min_keep:
            last_idx = i
            break
    c._keep(slice(0, last_idx))


def typical(c: Candidates, p: float, min_keep: int = 1) -> None:
    """llama_sample_typical (llama.cpp:3950)."""
    if p >= 1.0:
        return
    softmax(c)
    entropy = float(-(c.probs * np.log(c.probs)).sum())
    shifted = np.abs(-np.log(c.probs) - entropy)
    order = np.argsort(shifted, kind="stable")
    cum = 0.0
    last_idx = order.size
    for i, idx in enumerate(order):
        cum += float(c.probs[idx])
        if cum > p and i >= min_keep - 1:
            last_idx = i + 1
            break
    keep = order[:last_idx]
    c._keep(keep)
    c.sorted = False
    c.probs = None


def temperature(c: Candidates, temp: float) -> None:
    c.logits = c.logits / temp
    c.probs = None


def repetition_penalty(
    c: Candidates, last_tokens: Sequence[int], penalty: float
) -> None:
    """llama_sample_repetition_penalty (llama.cpp:4025)."""
    if penalty == 1.0 or len(last_tokens) == 0:
        return
    last = set(int(t) for t in last_tokens)
    mask = np.isin(c.ids, list(last))
    l = c.logits
    c.logits = np.where(
        mask, np.where(l <= 0, l * penalty, l / penalty), l
    ).astype(np.float32)
    c.sorted = False
    c.probs = None


def frequency_and_presence_penalties(
    c: Candidates,
    last_tokens: Sequence[int],
    alpha_frequency: float,
    alpha_presence: float,
) -> None:
    """llama_sample_frequency_and_presence_penalties (llama.cpp:4054)."""
    if len(last_tokens) == 0 or (alpha_frequency == 0 and alpha_presence == 0):
        return
    counts = {}
    for t in last_tokens:
        counts[int(t)] = counts.get(int(t), 0) + 1
    cnt = np.array([counts.get(int(i), 0) for i in c.ids], np.float32)
    c.logits = c.logits - (
        cnt * alpha_frequency + (cnt > 0).astype(np.float32) * alpha_presence
    )
    c.sorted = False
    c.probs = None


def greedy(c: Candidates) -> int:
    return int(c.ids[int(np.argmax(c.logits))])


def sample_token(c: Candidates, rng: np.random.RandomState) -> int:
    softmax(c)
    cdf = np.cumsum(c.probs)
    u = rng.random_sample() * cdf[-1]
    idx = int(np.searchsorted(cdf, u, side="right").clip(0, c.size - 1))
    return int(c.ids[idx])


@dataclasses.dataclass
class MirostatState:
    mu: float

    @classmethod
    def create(cls, tau: float) -> "MirostatState":
        return cls(mu=2.0 * tau)


def mirostat(
    c: Candidates,
    rng: np.random.RandomState,
    state: MirostatState,
    tau: float = 5.0,
    eta: float = 0.1,
    m: int = 100,
    n_vocab: Optional[int] = None,
) -> int:
    """llama_sample_token_mirostat (v1, llama.cpp:4174)."""
    n = float(n_vocab if n_vocab is not None else c.size)
    softmax(c)
    lim = min(m - 1, c.size - 1)
    i = np.arange(lim, dtype=np.float64)
    t_i = np.log((i + 2) / (i + 1))
    b_i = np.log(c.probs[:lim] / c.probs[1 : lim + 1])
    s_hat = float((t_i * b_i).sum() / (t_i * t_i).sum())
    eps_hat = s_hat - 1
    k = (eps_hat * 2.0**state.mu / (1 - n**-eps_hat)) ** (1 / s_hat)
    top_k(c, int(k), 1)
    x = sample_token(c, rng)
    x_idx = int(np.nonzero(c.ids == x)[0][0])
    observed = -np.log2(c.probs[x_idx])
    state.mu -= eta * (observed - tau)
    return x


def mirostat_v2(
    c: Candidates,
    rng: np.random.RandomState,
    state: MirostatState,
    tau: float = 5.0,
    eta: float = 0.1,
) -> int:
    """llama_sample_token_mirostat_v2 (llama.cpp:4223)."""
    softmax(c)
    surprise = -np.log2(c.probs)
    cut = int(np.argmax(surprise > state.mu)) if (surprise > state.mu).any() else c.size
    if cut == 0:
        cut = 1
    c._keep(slice(0, cut))
    softmax(c)
    x = sample_token(c, rng)
    x_idx = int(np.nonzero(c.ids == x)[0][0])
    observed = -np.log2(c.probs[x_idx])
    state.mu -= eta * (observed - tau)
    return x


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    return x - (m + np.log(np.exp(x - m).sum()))


def classifier_free_guidance(
    c: Candidates, guidance_logits: np.ndarray, scale: float
) -> None:
    """llama_sample_classifier_free_guidance (llama.cpp:4139): blend the
    log-distributions of the main and guidance contexts."""
    assert not c.sorted, "CFG requires unsorted full-vocab candidates"
    base = _log_softmax(c.logits.astype(np.float32))
    guide = _log_softmax(np.asarray(guidance_logits, np.float32))
    c.logits = (scale * (base - guide) + guide).astype(np.float32)
    c.probs = None
