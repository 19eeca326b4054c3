"""Beam search decoding.

Equivalent of llama_beam_search (reference llama.cpp:4334-4583), built
TPU-natively on the batched forward step: all beams advance in ONE jitted
step per token (the reference iterates beams sequentially through one
context). Beam reordering gathers the KV cache along the batch axis.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forward import KVCache, forward_batched
from ..models.spec import ArchSpec


@dataclasses.dataclass
class Beam:
    tokens: List[int]  # generated tokens (excludes prompt)
    logprob: float
    eos: bool = False


def beam_search(
    spec: ArchSpec,
    params,
    prompt: Sequence[int],
    n_beams: int = 4,
    n_predict: int = 32,
    eos_token_id: Optional[int] = None,
    kv_dtype=jnp.float32,
    length_normalize: bool = True,
) -> List[Beam]:
    """Returns beams sorted best-first."""
    params = jax.tree.map(
        jnp.asarray, params, is_leaf=lambda a: hasattr(a, "tree_flatten")
    )
    prompt = list(prompt)
    if not prompt:
        raise ValueError("beam_search requires a non-empty prompt")
    kv = KVCache.create(spec, n_beams, kv_dtype)

    def step(tokens, n_past, kv, active):
        return forward_batched(
            spec, params, tokens, n_past, kv, active
        )

    step = jax.jit(step, donate_argnums=(2,))

    # prefill the prompt into slot 0, then broadcast its KV to every beam
    n_past = np.zeros(n_beams, np.int32)
    active = np.zeros(n_beams, bool)
    active[0] = True
    from ..engine.engine import Engine

    pos = 0
    for size in Engine._chunks(len(prompt), spec.n_ctx):
        toks = np.zeros((n_beams, size), np.int32)
        toks[0] = prompt[pos : pos + size]
        np_vec = np.zeros(n_beams, np.int32)
        np_vec[0] = pos
        logits, _, kv = step(
            jnp.asarray(toks), jnp.asarray(np_vec), kv, jnp.asarray(active)
        )
        pos += size
    kv = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, :1], a.shape).copy(), kv
    )
    n_past[:] = len(prompt)
    logp = np.array(jax.nn.log_softmax(logits[0]))

    # first expansion: top n_beams continuations of the prompt
    top = np.argsort(-logp)[:n_beams]
    beams = [Beam([int(t)], float(logp[t])) for t in top]
    if eos_token_id is not None:
        for b in beams:
            if b.tokens[-1] == eos_token_id:
                b.eos = True

    for _ in range(n_predict - 1):
        live = [i for i, b in enumerate(beams) if not b.eos]
        if not live:
            break
        toks = np.zeros((n_beams, 1), np.int32)
        act = np.zeros(n_beams, bool)
        for i in live:
            toks[i, 0] = beams[i].tokens[-1]
            act[i] = True
        logits, _, kv = step(
            jnp.asarray(toks),
            jnp.asarray(n_past.copy()),
            kv,
            jnp.asarray(act),
        )
        n_past = n_past + act.astype(np.int32)
        logp = np.array(jax.nn.log_softmax(logits, axis=-1))

        # candidate pool: finished beams carry over; live beams expand
        cands = []  # (score, parent, token|None)
        for i, b in enumerate(beams):
            if b.eos:
                cands.append((b.logprob, i, None))
                continue
            top = np.argsort(-logp[i])[:n_beams]
            for t in top:
                cands.append((b.logprob + float(logp[i][t]), i, int(t)))
        cands.sort(key=lambda c: -c[0])
        chosen = cands[:n_beams]

        parents = np.array([c[1] for c in chosen], np.int32)
        kv = jax.tree.map(lambda a: a[:, parents], kv)
        n_past = n_past[parents]
        new_beams = []
        for score, parent, tok in chosen:
            src = beams[parent]
            if tok is None:
                new_beams.append(Beam(list(src.tokens), score, eos=True))
            else:
                eos = eos_token_id is not None and tok == eos_token_id
                new_beams.append(
                    Beam(src.tokens + [tok], score, eos=eos)
                )
        beams = new_beams

    def key(b: Beam) -> float:
        return b.logprob / max(1, len(b.tokens)) if length_normalize else b.logprob

    return sorted(beams, key=lambda b: -key(b))
