"""Continuous batching scheduler: multi-request serving over batch slots.

The TPU-native replacement for the reference's sequential per-request loop
(its 🤗 adapter loops batch rows one at a time, transformers.py:71-75, and
the core engine is strictly single-sequence). Here a fixed pool of B batch
slots shares one KV cache; requests are admitted into free slots, prefilled
individually into their slot, and then ALL active slots decode together —
one jitted forward_batched step per token with per-slot positions, so new
requests join mid-flight without draining the batch (continuous batching).

Sampling runs host-side per slot with the exact reference sampler semantics
(engine/sampler.py), so every request can carry its own sampling config.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import sampler as samplers
from ..models.forward import KVCache, forward, forward_batched
from ..models.spec import ArchSpec


@dataclasses.dataclass
class Request:
    tokens: List[int]
    max_new_tokens: int = 64
    top_k: int = 40
    top_p: float = 0.95
    temperature: float = 0.8
    repetition_penalty: float = 1.1
    last_n_tokens: int = 64
    seed: int = -1
    eos_token_id: Optional[int] = None
    sampler: str = "gpt"  # "gpt" | "llama" | "greedy"


@dataclasses.dataclass
class Sequence:
    uid: int
    request: Request
    slot: int
    rng: np.random.RandomState
    prompt_len: int
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False

    @property
    def all_tokens(self) -> List[int]:
        return self.request.tokens + self.generated


class BatchScheduler:
    def __init__(
        self,
        spec: ArchSpec,
        params,
        batch_slots: int = 8,
        kv_dtype=jnp.float32,
    ):
        self.spec = spec
        from ..ops import qmatmul as qm

        def place(a):
            if isinstance(a, qm.QTensor):
                return jax.tree.map(jnp.asarray, a)
            return jnp.asarray(a)

        self.params = jax.tree.map(
            place, params, is_leaf=lambda a: isinstance(a, qm.QTensor)
        )
        self.slots = batch_slots
        self.kv = KVCache.create(spec, batch_slots, kv_dtype)
        self.n_past = np.zeros(batch_slots, np.int32)
        self.free: List[int] = list(range(batch_slots))
        self.active: Dict[int, Sequence] = {}  # slot -> sequence
        self.waiting: List[Sequence] = []
        self.finished: Dict[int, Sequence] = {}  # uid -> sequence
        self._uid = 0
        self._logits = np.zeros((batch_slots, spec.n_vocab), np.float32)

        spec_ = spec

        def _prefill(params, tokens, n_past, kv, active):
            return forward_batched(spec_, params, tokens, n_past, kv, active)

        self._step_fn = jax.jit(_prefill, donate_argnums=(3,))

    # -- request lifecycle --------------------------------------------------

    def submit(self, request: Request) -> int:
        """Queue a request; returns its uid."""
        self._uid += 1
        seq = Sequence(
            uid=self._uid,
            request=request,
            slot=-1,
            rng=np.random.RandomState(samplers._resolve_seed(request.seed)),
            prompt_len=len(request.tokens),
        )
        self.waiting.append(seq)
        return seq.uid

    def _admit(self) -> None:
        while self.waiting and self.free:
            seq = self.waiting.pop(0)
            slot = self.free.pop(0)
            seq.slot = slot
            self.active[slot] = seq
            self._prefill_slot(seq)

    def _prefill_slot(self, seq: Sequence) -> None:
        """Evaluate the prompt into this slot's KV region (chunked)."""
        toks = seq.request.tokens
        cap = self.spec.n_ctx
        toks = toks[-(cap - seq.request.max_new_tokens - 1) :] if len(
            toks
        ) >= cap else toks
        pos = 0
        # chunk sizes mirror Engine._chunks: log2 many compiled shapes
        from ..engine.engine import Engine

        for size in Engine._chunks(len(toks), cap):
            # NOTE: on the CPU backend jnp.asarray aliases numpy buffers
            # zero-copy, and dispatch is async — every call gets FRESH
            # arrays, never a mutated shared one (that was a real race)
            chunk_tokens = np.zeros((self.slots, size), np.int32)
            chunk_tokens[seq.slot] = toks[pos : pos + size]
            n_past = self.n_past.copy()
            n_past[seq.slot] = pos
            active = np.zeros(self.slots, bool)
            active[seq.slot] = True
            logits, _, self.kv = self._step_fn(
                self.params,
                jnp.asarray(chunk_tokens),
                jnp.asarray(n_past),
                self.kv,
                jnp.asarray(active),
            )
            pos += size
        self.n_past[seq.slot] = len(toks)
        self._logits[seq.slot] = np.asarray(logits[seq.slot])

    # -- decode -------------------------------------------------------------

    def _sample(self, seq: Sequence) -> int:
        r = seq.request
        logits = self._logits[seq.slot]
        if r.sampler == "greedy" or r.temperature == 0.0:
            return int(np.argmax(logits))
        fn = samplers.sample_llama if r.sampler == "llama" else samplers.sample_gpt
        last_n = r.last_n_tokens if r.last_n_tokens >= 0 else self.spec.n_ctx
        return fn(
            logits,
            top_k=r.top_k,
            top_p=r.top_p,
            temperature=r.temperature,
            repetition_penalty=r.repetition_penalty,
            last_tokens=seq.all_tokens[-last_n:],
            seed=0,
            rng=seq.rng,
        )

    def step(self) -> List[int]:
        """Admit waiting requests, decode one token for every active slot.

        Returns uids of sequences that finished this step."""
        self._admit()
        if not self.active:
            return []

        tokens = np.zeros((self.slots, 1), np.int32)
        active = np.zeros(self.slots, bool)
        for slot, seq in self.active.items():
            tokens[slot, 0] = self._sample(seq)
            active[slot] = True

        logits, _, self.kv = self._step_fn(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(self.n_past.copy()),
            self.kv,
            jnp.asarray(active),
        )
        logits = np.asarray(logits, np.float32)

        done_uids = []
        for slot, seq in list(self.active.items()):
            tok = int(tokens[slot, 0])
            r = seq.request
            self.n_past[slot] += 1
            self._logits[slot] = logits[slot]
            is_eos = r.eos_token_id is not None and tok == r.eos_token_id
            if not is_eos:
                seq.generated.append(tok)
            if (
                is_eos
                or len(seq.generated) >= r.max_new_tokens
                or self.n_past[slot] >= self.spec.n_ctx - 1
            ):
                seq.done = True
                done_uids.append(seq.uid)
                self.finished[seq.uid] = seq
                del self.active[slot]
                self.free.append(slot)
                self.n_past[slot] = 0
        return done_uids

    def run(self) -> Dict[int, List[int]]:
        """Drive until all submitted requests complete; uid -> generated."""
        while self.active or self.waiting:
            self.step()
        return {uid: seq.generated for uid, seq in self.finished.items()}
