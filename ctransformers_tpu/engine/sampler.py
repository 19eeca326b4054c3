"""Token samplers.

`sample_gpt` clones the shared example-model sampler
(gpt_sample_top_k_top_p, reference models/common.h:127-207): temperature
scaling, then sign-dependent repetition penalty on the scaled logits, top-k,
softmax, top-p truncation + renormalize, categorical draw.

`sample_llama` clones the llama.cpp chain used by the GGUF path
(reference models/llms/llama.cc:53-84): repetition penalty on raw logits,
top-k, top-p, temperature, draw.

Sampling runs on the host in numpy: it is O(vocab) per token and exact
reference semantics matter more than device placement. RNG is MT19937
(np.random.RandomState) — deterministic for a given seed, like the
reference's std::mt19937, though the draw itself is not bit-identical to
libstdc++'s std::discrete_distribution.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np


def _resolve_seed(seed: int) -> int:
    if seed < 0:
        seed = int(time.time())  # reference: time(nullptr) (llm.h:67-69)
    return seed & 0xFFFFFFFF


def _draw(probs: np.ndarray, rng: np.random.RandomState) -> int:
    cdf = np.cumsum(probs)
    u = rng.random_sample() * cdf[-1]
    return int(np.searchsorted(cdf, u, side="right").clip(0, len(probs) - 1))


def sample_gpt(
    logits: np.ndarray,
    *,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
    last_tokens: Sequence[int],
    seed: int,
    rng: Optional[np.random.RandomState] = None,
) -> int:
    """gpt_sample_top_k_top_p semantics (common.h:127-207)."""
    if rng is None:
        rng = np.random.RandomState(_resolve_seed(seed))
    n = logits.shape[0]
    # temperature <= 0 is greedy (penalty still applies). The reference
    # multiplies by 1/temp here, which at temp=0 turns zero logits into
    # NaN (0 * inf) and poisons the draw — greedy is the only sane
    # reading and matches sample_llama / the device sampler.
    greedy = temperature <= 0
    scaled = logits.astype(np.float64) * (1.0 if greedy else 1.0 / temperature)

    for tok in set(int(t) for t in last_tokens):
        if 0 <= tok < n:
            if scaled[tok] <= 0:
                scaled[tok] *= repetition_penalty
            else:
                scaled[tok] /= repetition_penalty

    if greedy:
        return int(np.argmax(scaled))

    top_k = max(1, min(int(top_k) if top_k > 0 else n, n))
    idx = np.argpartition(-scaled, top_k - 1)[:top_k]
    idx = idx[np.argsort(-scaled[idx], kind="stable")]
    vals = scaled[idx]

    probs = np.exp(vals - vals.max())
    probs /= probs.sum()

    if top_p < 1.0:
        cum = np.cumsum(probs)
        cut = int(np.searchsorted(cum, top_p, side="left")) + 1
        cut = min(cut, len(probs))
        probs = probs[:cut] / cum[cut - 1]
        idx = idx[:cut]

    return int(idx[_draw(probs, rng)])


def sample_llama(
    logits: np.ndarray,
    *,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
    last_tokens: Sequence[int],
    seed: int,
    rng: Optional[np.random.RandomState] = None,
) -> int:
    """llama.cpp chain: repetition -> top_k -> top_p -> temperature -> draw
    (reference models/llms/llama.cc:53-84, llama.cpp:3805-4332)."""
    if rng is None:
        rng = np.random.RandomState(_resolve_seed(seed))
    n = logits.shape[0]
    l = logits.astype(np.float64).copy()

    # llama_sample_repetition_penalty (llama.cpp:4025)
    for tok in set(int(t) for t in last_tokens):
        if 0 <= tok < n:
            if l[tok] <= 0:
                l[tok] *= repetition_penalty
            else:
                l[tok] /= repetition_penalty

    if temperature <= 0:
        return int(np.argmax(l))  # greedy path

    top_k = min(int(top_k) if top_k > 0 else n, n)
    idx = np.argpartition(-l, top_k - 1)[:top_k] if top_k < n else np.arange(n)
    idx = idx[np.argsort(-l[idx], kind="stable")]
    vals = l[idx]

    probs = np.exp(vals - vals.max())
    probs /= probs.sum()

    if top_p < 1.0 and len(probs) > 1:
        cum = np.cumsum(probs)
        # llama_sample_top_p keeps at least 1 candidate, cuts when cum >= p
        cut = int(np.searchsorted(cum, top_p, side="left")) + 1
        cut = min(cut, len(probs))
        probs = probs[:cut]
        idx = idx[:cut]

    # temperature applied to remaining logits, then softmax + draw
    vals = vals[: len(idx)] / temperature
    probs = np.exp(vals - vals.max())
    probs /= probs.sum()
    return int(idx[_draw(probs, rng)])


def rep_penalty_mask(
    n_vocab: int,
    last_tokens: Sequence[int],
    penalty_max: float,
    sustain: int,
    decay: int,
) -> np.ndarray:
    """Per-vocab repetition-penalty factors with a decaying window — the
    GPTQ twin's schedule (reference ctransformers/gptq/llm.py:174-176 maps
    token_repetition_penalty_max=penalty, _sustain=last_n_tokens,
    _decay=last_n_tokens//2 onto ExLlama's generator settings).

    Walking back from the newest token: the most recent `sustain` tokens
    carry the full `penalty_max`; each step further back fades the factor
    linearly toward 1.0 over `decay` positions; tokens older than
    sustain+decay are unpenalized. A token appearing at several ages keeps
    its strongest (most recent) factor.
    """
    mask = np.ones(n_vocab, np.float64)
    seq = [int(t) for t in last_tokens]
    sustain, decay = int(sustain), max(int(decay), 0)
    dv = (1.0 - penalty_max) / decay if decay > 0 else 0.0
    for i in range(len(seq) - 1, -1, -1):
        age = len(seq) - 1 - i  # 0 = most recent
        if age < sustain:
            v = float(penalty_max)
        elif age < sustain + decay:
            v = penalty_max + (age - sustain + 1) * dv
        else:
            break  # older tokens are unpenalized
        t = seq[i]
        if 0 <= t < n_vocab and abs(v - 1.0) > abs(mask[t] - 1.0):
            mask[t] = v
    return mask


def sample_llama_decayed(
    logits: np.ndarray,
    *,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
    last_tokens: Sequence[int],
    seed: int,
    sustain: int,
    decay: int,
    rng: Optional[np.random.RandomState] = None,
) -> int:
    """llama chain with the GPTQ backend's decaying repetition penalty
    (see rep_penalty_mask). `last_tokens` should cover sustain+decay
    positions of context."""
    if rng is None:
        rng = np.random.RandomState(_resolve_seed(seed))
    n = logits.shape[0]
    l = logits.astype(np.float64).copy()
    mask = rep_penalty_mask(n, last_tokens, repetition_penalty, sustain, decay)
    pen = mask != 1.0
    pos = pen & (l > 0)
    neg = pen & (l <= 0)
    l[pos] /= mask[pos]
    l[neg] *= mask[neg]

    if temperature <= 0:
        return int(np.argmax(l))

    top_k = min(int(top_k) if top_k > 0 else n, n)
    idx = np.argpartition(-l, top_k - 1)[:top_k] if top_k < n else np.arange(n)
    idx = idx[np.argsort(-l[idx], kind="stable")]
    vals = l[idx]
    probs = np.exp(vals - vals.max())
    probs /= probs.sum()
    if top_p < 1.0 and len(probs) > 1:
        cum = np.cumsum(probs)
        cut = int(np.searchsorted(cum, top_p, side="left")) + 1
        cut = min(cut, len(probs))
        probs = probs[:cut]
        idx = idx[:cut]
    vals = vals[: len(idx)] / temperature
    probs = np.exp(vals - vals.max())
    probs /= probs.sum()
    return int(idx[_draw(probs, rng)])


# ---------------------------------------------------------------------------
# On-device sampler (used by the fused decode loop, engine.py:decode).
#
# The host samplers above give exact reference semantics for the per-token
# API; this one runs the same gpt-style chain (temperature -> repetition
# penalty -> top-k -> top-p -> draw) entirely in XLA so the decode loop can
# stay on device (one dispatch per N tokens instead of per token — the
# reference pays one Python<->C FFI round-trip per token, llm.py:528-540).
# ---------------------------------------------------------------------------


def sample_device(
    logits,  # (V,) f32 device array
    key,  # jax PRNG key
    last_tokens,  # (L,) int32, -1 = empty slot
    *,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
):
    import jax
    import jax.numpy as jnp

    v = logits.shape[0]
    if temperature <= 0.0:
        return jnp.argmax(logits).astype(jnp.int32)
    l = logits.astype(jnp.float32) / temperature

    if repetition_penalty != 1.0:
        ids = jnp.where(last_tokens >= 0, last_tokens, v)
        seen = jnp.zeros(v + 1, bool).at[ids].set(True)[:v]
        pen = jnp.where(l > 0, l / repetition_penalty, l * repetition_penalty)
        l = jnp.where(seen, pen, l)

    k = min(int(top_k) if top_k > 0 else v, v)
    if k < v:
        kth = jax.lax.top_k(l, k)[0][-1]
        l = jnp.where(l < kth, -jnp.inf, l)

    if top_p < 1.0:
        vals = jax.lax.top_k(l, v)[0]
        probs = jax.nn.softmax(vals)
        cum = jnp.cumsum(probs)
        # keep tokens until cumulative mass crosses top_p (inclusive)
        keep = (cum - probs) < top_p
        thr = jnp.min(jnp.where(keep, vals, jnp.inf))
        l = jnp.where(l < thr, -jnp.inf, l)

    return jax.random.categorical(key, l).astype(jnp.int32)


def sample_extended(
    logits: np.ndarray,
    *,
    top_k: int = 40,
    top_p: float = 0.95,
    temperature: float = 0.8,
    repetition_penalty: float = 1.1,
    last_tokens: Sequence[int] = (),
    tfs_z: float = 1.0,
    typical_p: float = 1.0,
    frequency_penalty: float = 0.0,
    presence_penalty: float = 0.0,
    mirostat: int = 0,
    mirostat_tau: float = 5.0,
    mirostat_eta: float = 0.1,
    seed: int = -1,
    rng: Optional[np.random.RandomState] = None,
    mirostat_state=None,
) -> int:
    """Extended sampling chain (llama.cpp examples/common.cpp ordering):
    repetition + frequency/presence penalties -> [greedy | mirostat v1/v2 |
    top-k -> tail-free -> typical -> top-p -> temperature -> draw]."""
    from . import sampler_suite as ss

    if rng is None:
        rng = np.random.RandomState(_resolve_seed(seed))
    c = ss.Candidates.from_logits(logits)
    ss.repetition_penalty(c, last_tokens, repetition_penalty)
    ss.frequency_and_presence_penalties(
        c, last_tokens, frequency_penalty, presence_penalty
    )
    if temperature <= 0:
        return ss.greedy(c)
    if mirostat == 1:
        ss.temperature(c, temperature)
        if mirostat_state is None:
            mirostat_state = ss.MirostatState.create(mirostat_tau)
        return ss.mirostat(
            c, rng, mirostat_state, mirostat_tau, mirostat_eta,
            n_vocab=logits.shape[-1],
        )
    if mirostat == 2:
        ss.temperature(c, temperature)
        if mirostat_state is None:
            mirostat_state = ss.MirostatState.create(mirostat_tau)
        return ss.mirostat_v2(c, rng, mirostat_state, mirostat_tau, mirostat_eta)
    ss.top_k(c, top_k if top_k > 0 else logits.shape[-1], 1)
    ss.tail_free(c, tfs_z, 1)
    ss.typical(c, typical_p, 1)
    ss.top_p(c, top_p, 1)
    ss.temperature(c, temperature)
    return ss.sample_token(c, rng)


def sample_device_batch(
    logits,  # (B, V) f32
    keys,  # (B,) PRNG keys (jax.random.split output, shape (B, 2))
    last_tokens,  # (B, L) int32, -1 = empty
    *,
    top_k,  # (B,) int32
    top_p,  # (B,) f32
    temperature,  # (B,) f32
    repetition_penalty,  # (B,) f32
    greedy_only: bool = False,  # STATIC: every slot is greedy (argmax only)
    k_cap: int = 0,  # STATIC: max top_k across slots (bounds the sort), 0=full
):
    """Vectorized on-device sampler: every batch slot carries its own
    sampling parameters (the continuous-batching scheduler's device-side
    decode path). Greedy when temperature <= 0.

    `greedy_only` and `k_cap` are STATIC fast-path hints the caller derives
    host-side from the live request set: under vmap a lax.cond lowers to
    select (both branches execute), so without them every token would pay a
    full-vocab sort per slot even for greedy batches. `k_cap` must be >= the
    largest per-slot top_k or the caller must pass 0 (full sort)."""
    import jax
    import jax.numpy as jnp

    if greedy_only:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    v = logits.shape[-1]
    n_sort = v if k_cap <= 0 or k_cap >= v else int(k_cap)

    def one(lg, key, last, tk, tp, temp, rp):
        greedy = jnp.argmax(lg).astype(jnp.int32)
        l = lg / jnp.maximum(temp, 1e-6)
        ids = jnp.where(last >= 0, last, v)
        seen = jnp.zeros(v + 1, bool).at[ids].set(True)[:v]
        pen = jnp.where(l > 0, l / rp, l * rp)
        l2 = jnp.where(seen, pen, l)
        # only the top `n_sort` values can survive top-k (tk <= k_cap);
        # everything below the kth is masked to -inf either way
        vals = jax.lax.top_k(l2, n_sort)[0]
        kth = vals[jnp.clip(tk - 1, 0, n_sort - 1)]
        l2 = jnp.where(l2 < kth, -jnp.inf, l2)
        svals = jnp.where(vals < kth, -jnp.inf, vals)
        probs = jax.nn.softmax(svals)
        cum = jnp.cumsum(probs)
        keep = (cum - probs) < tp
        thr = jnp.min(jnp.where(keep, svals, jnp.inf))
        l2 = jnp.where(l2 < thr, -jnp.inf, l2)
        tok = jax.random.categorical(key, l2).astype(jnp.int32)
        return jnp.where(temp <= 0.0, greedy, tok)

    return jax.vmap(one)(
        logits, keys, last_tokens, top_k, top_p, temperature,
        repetition_penalty,
    )
