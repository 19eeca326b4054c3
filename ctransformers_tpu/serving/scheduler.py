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
import os
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
    # text-level stop strings (reference streaming semantics, llm.py:542-616;
    # needs the scheduler's `detokenize` to be set). Generation ends at the
    # first occurrence; Sequence.text is truncated exactly at the match.
    stop: Optional[List[str]] = None
    # streaming: called from the scheduler thread with each text chunk as
    # it becomes safe to emit (stop-holdback applied)
    on_text: Optional[Callable[[str], None]] = None


@dataclasses.dataclass
class Sequence:
    uid: int
    request: Request
    slot: int
    rng: np.random.RandomState
    prompt_len: int
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    _key: Optional[object] = None  # per-request jax PRNG key (chunked decode)
    kv_start: int = 0  # KV rows [0, kv_start) inherited via prefix reuse
    _streamer: Optional[object] = None  # utils.TextStreamer (stop/on_text)
    text: str = ""  # emitted text (authoritative when stop strings trim)

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
        prefix_reuse: bool = True,
        mesh=None,
        detokenize: Optional[Callable[[List[int]], bytes]] = None,
    ):
        """`prefix_reuse`: new requests skip prefill for the longest
        prompt prefix whose KV is already resident in SOME slot (the
        serving-level analog of the reference's session/LCP reuse,
        llm.py:469-500 — which is per-context only). Cross-slot hits copy
        the source slot's cache rows (one static jitted copy, ~0.3 ms per
        slot for 7B); same-slot hits are free.

        `mesh`: a ("data", "model") jax.sharding.Mesh — continuous
        batching over a tensor-parallel model (the SURVEY §7 hard part:
        multi-chip serving). Weights/KV are sharded exactly like
        Engine(mesh=...); forward_batched runs under qmatmul.tp_ctx so
        TP-partitioned quantized matmuls take the shard_map'd Pallas
        path."""
        self.spec = spec
        self.mesh = mesh
        # tokens -> bytes/str; required for Request.stop strings and
        # on_text streaming (text semantics shared with LLM._stream via
        # utils.TextStreamer)
        self.detokenize = detokenize
        from ..ops import qmatmul as qm

        multiproc = jax.process_count() > 1

        def place(a):
            if mesh is not None and multiproc:
                # multi-controller: keep host values; shard_params
                # assembles global arrays via make_array_from_callback
                return a
            if isinstance(a, qm.QTensor):
                return jax.tree.map(jnp.asarray, a)
            return jnp.asarray(a)

        self.params = jax.tree.map(
            place, params, is_leaf=lambda a: isinstance(a, qm.QTensor)
        )
        if mesh is None and isinstance(self.params, dict):
            # layer-stacked scan body: ~10x smaller step executables
            # (see Engine._maybe_stack); TP keeps the unrolled path
            from ..engine.engine import Engine

            Engine._maybe_stack(self.params)
        self.slots = batch_slots
        self._multiproc = multiproc
        self.kv = KVCache.create(spec, batch_slots, kv_dtype)
        if mesh is not None:
            from ..parallel import mesh as pmesh

            self.params = pmesh.shard_params(self.params, mesh)
            qm.autotune(
                self.params, batch_sizes=(batch_slots,),
                tp=int(mesh.shape.get(pmesh.MODEL_AXIS, 1)),
            )
            self.kv = pmesh.shard_kv(self.kv, spec, mesh)
        self.n_past = np.zeros(batch_slots, np.int32)
        self.free: List[int] = list(range(batch_slots))
        self.active: Dict[int, Sequence] = {}  # slot -> sequence
        self.waiting: List[Sequence] = []
        self.finished: Dict[int, Sequence] = {}  # uid -> sequence
        self._uid = 0
        # last-token logits per slot stay DEVICE-resident: a (B, V) host
        # round trip per step is ~2 MB, ruinous over a remote tunnel; the
        # host only downloads them for host-side sampling (step()).
        self._logits = jnp.zeros((batch_slots, spec.n_vocab), jnp.float32)
        if mesh is not None and self._multiproc:
            # multi-controller: the logits carry must be a GLOBAL
            # (replicated) array so host downloads and jnp.where merges
            # stay valid on every process
            from jax.sharding import PartitionSpec as P

            from ..parallel.distributed import put_sharded

            self._logits = put_sharded(
                np.zeros((batch_slots, spec.n_vocab), np.float32), mesh, P()
            )
        self._chunk_fns = {}
        self._step_fns = {}
        self._tuned_sizes: set = set()  # prefill chunk sizes already raced
        # prefix reuse: per-slot record of the tokens whose KV rows are
        # resident (kept after a sequence finishes, until slot reuse)
        self.prefix_reuse = prefix_reuse
        self._slot_tokens: List[List[int]] = [[] for _ in range(batch_slots)]
        self.reused_tokens = 0  # stat: prefill tokens skipped
        self._copy_fn = None

    def _step_fn(self, window=None):
        """Jitted batched step; `window` statically bounds attention reads
        (models.forward.round_window bucket over the live positions)."""
        if window not in self._step_fns:
            spec_ = self.spec
            mesh = self.mesh
            from ..ops import qmatmul as qm

            def step(params, tokens, n_past, kv, active):
                if mesh is not None:
                    with qm.tp_ctx(mesh):
                        return forward_batched(
                            spec_, params, tokens, n_past, kv, active,
                            attn_window=window,
                        )
                return forward_batched(
                    spec_, params, tokens, n_past, kv, active,
                    attn_window=window,
                )

            kwargs = {}
            if mesh is not None and self._multiproc:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(mesh, P())
                kwargs["out_shardings"] = (
                    rep, rep, jax.tree.map(lambda a: a.sharding, self.kv)
                )
            self._step_fns[window] = jax.jit(
                step, donate_argnums=(3,), **kwargs
            )
        return self._step_fns[window]

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
        if request.stop or request.on_text is not None:
            if self.detokenize is None:
                raise ValueError(
                    "Request.stop/on_text need BatchScheduler(detokenize=...)"
                )
            from ..utils import TextStreamer

            seq._streamer = TextStreamer(request.stop)
        self.waiting.append(seq)
        return seq.uid

    def cancel(self, uid: int) -> bool:
        """Abort a request: waiting requests are dropped immediately;
        active ones stop at the next host checkpoint (every token in
        step(), every chunk in step_chunk() — the amortized analog of the
        reference's abort_callback, ggml.h:506-507). Returns True if the
        uid was live."""
        for i, seq in enumerate(self.waiting):
            if seq.uid == uid:
                seq.cancelled = seq.done = True
                self.finished[uid] = self.waiting.pop(i)
                return True
        for slot, seq in self.active.items():
            if seq.uid == uid:
                seq.cancelled = True
                return True
        return False

    # -- per-sequence text assembly (stop strings / streaming) ---------------

    def _detok_bytes(self, tokens: List[int]) -> bytes:
        out = self.detokenize(tokens)
        return out.encode("utf-8") if isinstance(out, str) else bytes(out)

    def _feed_text(self, seq: Sequence, tok: int) -> bool:
        """Push one generated token through the sequence's TextStreamer;
        returns True when a stop string completed (sequence must end)."""
        st = seq._streamer
        if st is None:
            return False
        chunk = st.feed(self._detok_bytes([tok]))
        if chunk:
            seq.text += chunk
            if seq.request.on_text is not None:
                seq.request.on_text(chunk)
        return st.stopped

    def _finish(self, seq: Sequence, done_uids: List[int]) -> None:
        """Common end-of-sequence bookkeeping (EOS/limit/stop/cancel)."""
        st = seq._streamer
        if st is not None and not st.stopped:
            tail = st.flush()
            if tail:
                seq.text += tail
                if seq.request.on_text is not None:
                    seq.request.on_text(tail)
        seq.done = True
        done_uids.append(seq.uid)
        self.finished[seq.uid] = seq
        del self.active[seq.slot]
        self.free.append(seq.slot)
        self.n_past[seq.slot] = 0

    def _admit(self) -> None:
        admitted: List[Sequence] = []
        while self.waiting and self.free:
            seq = self.waiting.pop(0)
            toks = self._clamped(seq)
            src, cp = self._best_prefix(toks)
            if src >= 0 and src in self.free:
                # same-slot hit: take that slot, KV already in place
                self.free.remove(src)
                slot = src
            else:
                slot = self.free.pop(0)
                if src >= 0 and cp >= 16:
                    # cross-slot hit: copy the source slot's cache rows
                    # (whole slot — one static program; rows past cp are
                    # garbage but positionally masked until overwritten)
                    if self._copy_fn is None:
                        self._copy_fn = jax.jit(
                            lambda kv, s, d: jax.tree.map(
                                lambda a: a.at[:, d].set(a[:, s]), kv
                            ),
                            donate_argnums=(0,),
                        )
                    self.kv = self._copy_fn(
                        self.kv, jnp.int32(src), jnp.int32(slot)
                    )
                    self._slot_tokens[slot] = list(self._slot_tokens[src])
                else:
                    cp = 0
            seq.kv_start = cp
            self.reused_tokens += cp
            self._slot_tokens[slot] = toks[:cp]
            seq.slot = slot
            self.active[slot] = seq
            admitted.append(seq)
        if not admitted:
            return
        # slots admitted together prefill in ONE dispatch per chunk when
        # their REMAINDER lengths match — 8 concurrent arrivals cost
        # 8 sequential full-model dispatches otherwise
        groups: Dict[int, List[Sequence]] = {}
        for seq in admitted:
            groups.setdefault(
                len(self._clamped(seq)) - seq.kv_start, []
            ).append(seq)
        for seqs in groups.values():
            self._prefill_group(seqs)

    def _best_prefix(self, toks: List[int]):
        """(slot, common-prefix length) of the best resident-KV match for
        `toks` — free same-slot hits first, else the longest prefix; -1
        when reuse is off or nothing useful matches. Capped at
        len(toks) - 1: at least one token must prefill to produce
        logits."""
        if not self.prefix_reuse:
            return -1, 0
        best, best_cp = -1, 0
        for s, hist in enumerate(self._slot_tokens):
            # active slots are fine as COPY sources: decode only appends
            # at n_past, so rows [0, cp) are stable and host-ordered
            # dispatches sequence the copy before any further write
            cp = 0
            cap = min(len(toks) - 1, len(hist))
            while cp < cap and toks[cp] == hist[cp]:
                cp += 1
            # prefer free same-slot hits (no copy) on ties
            if cp > best_cp or (cp == best_cp and cp and s in self.free):
                best, best_cp = s, cp
        if best_cp < 1:
            return -1, 0
        return best, best_cp

    def _clamped(self, seq: Sequence) -> List[int]:
        """Prompt tokens clamped to leave room for generation (llm.h:126)."""
        toks = seq.request.tokens
        cap = self.spec.n_ctx
        if len(toks) >= cap:
            toks = toks[-(cap - seq.request.max_new_tokens - 1) :]
        return toks

    def _prefill_slot(self, seq: Sequence) -> None:
        self._prefill_group([seq])

    def _prefill_group(self, seqs: List[Sequence]) -> None:
        """Evaluate equal-REMAINDER-length prompts into their slots' KV
        regions (chunked); one forward_batched dispatch per chunk serves
        the whole group. Each sequence's first kv_start positions were
        inherited via prefix reuse and are skipped."""
        toks = {
            seq.slot: self._clamped(seq)[seq.kv_start :] for seq in seqs
        }
        start = {seq.slot: seq.kv_start for seq in seqs}
        n = len(next(iter(toks.values())))
        assert all(len(t) == n for t in toks.values())
        pos = 0
        # chunk sizes mirror Engine._chunks: log2 many compiled shapes.
        # Every dispatch carries ALL slots (inactive ones masked), so the
        # batched qmm flattens to m = slots * size — cap the chunk so
        # that stays <= ~512 tokens: at m=1024 (32 slots x 32) the
        # prefill kernels' double-buffered VMEM blocks exceed the 16 MB
        # scoped budget at every candidate tile (r04; m=512 measured
        # fine at slots=16).
        from ..engine.engine import Engine

        tok_cap = int(os.environ.get("CT_PREFILL_TOKEN_CAP", "512"))
        size_cap = min(self.spec.n_ctx, max(1, tok_cap // self.slots))
        for size in Engine._chunks(n, size_cap):
            # NOTE: on the CPU backend jnp.asarray aliases numpy buffers
            # zero-copy, and dispatch is async — every call gets FRESH
            # arrays, never a mutated shared one (that was a real race)
            chunk_tokens = np.zeros((self.slots, size), np.int32)
            n_past = self.n_past.copy()
            active = np.zeros(self.slots, bool)
            for slot, t in toks.items():
                chunk_tokens[slot] = t[pos : pos + size]
                n_past[slot] = start[slot] + pos
                active[slot] = True
            # window covers every live slot AND this prefill chunk's end
            from ..models.forward import round_window

            top = max((int(self.n_past[s]) for s in self.active), default=0)
            hi = max(start[s] + pos + size for s in toks)
            w = round_window(max(top + 1, hi), self.spec.n_ctx)
            if self.mesh is None and size not in self._tuned_sizes:
                # race kernel tiles at this chunk's TOKEN count before
                # tracing (batched prefill flattens to m = slots * size;
                # the trace-time heuristic cannot reject tiles whose
                # VMEM footprint only fails at compile time — a 32-slot
                # x 32-token prefill OOM'd scoped vmem exactly that way).
                # Gated on first-sight of this chunk size: in warm
                # steady-state serving the autotune call is an
                # O(param-leaves) tree walk per chunk for zero new keys.
                from ..ops import qmatmul as qm

                qm.autotune(
                    self.params, batch_sizes=(self.slots * size,)
                )
                self._tuned_sizes.add(size)
            logits, _, self.kv = self._step_fn(w)(
                self.params,
                jnp.asarray(chunk_tokens),
                jnp.asarray(n_past),
                self.kv,
                jnp.asarray(active),
            )
            pos += size
        # merge the group's last-token logits on device (no host copy)
        sel = np.zeros(self.slots, bool)
        for slot in toks:
            self.n_past[slot] = start[slot] + n
            sel[slot] = True
        self._logits = jnp.where(
            jnp.asarray(sel)[:, None], logits, self._logits
        )
        for seq in seqs:
            self._slot_tokens[seq.slot] = list(self._clamped(seq))

    def _live_window(self, extra: int = 1):
        """round_window bucket covering every active slot's positions plus
        `extra` upcoming tokens."""
        from ..models.forward import round_window

        top = max(
            (int(self.n_past[s]) for s in self.active), default=0
        )
        return round_window(top + extra, self.spec.n_ctx)

    # -- decode -------------------------------------------------------------

    def _sample(self, seq: Sequence) -> int:
        r = seq.request
        logits = np.asarray(self._logits[seq.slot])  # host download (1 row)
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

        self._logits, _, self.kv = self._step_fn(self._live_window())(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(self.n_past.copy()),
            self.kv,
            jnp.asarray(active),
        )

        done_uids = []
        for slot, seq in list(self.active.items()):
            tok = int(tokens[slot, 0])
            r = seq.request
            self.n_past[slot] += 1
            self._slot_tokens[slot].append(tok)  # KV row written above
            is_eos = r.eos_token_id is not None and tok == r.eos_token_id
            stopped = False
            if not is_eos:
                seq.generated.append(tok)
                stopped = self._feed_text(seq, tok)
            if (
                is_eos
                or stopped
                or seq.cancelled
                or len(seq.generated) >= r.max_new_tokens
                or self.n_past[slot] >= self.spec.n_ctx - 1
            ):
                self._finish(seq, done_uids)
        return done_uids

    # -- device-side chunked decode -----------------------------------------
    # K tokens per dispatch for the whole batch. The per-token step() loop
    # pays a host round trip (logits transfer + Python sampling) every token
    # — fine on a local chip, ruinous over a remote tunnel. Chunked mode runs
    # [sample -> forward_batched] K times in one lax.scan with the vectorized
    # per-slot device sampler; the host only intervenes every K tokens
    # (EOS/limit handling, admission). Sampling uses jax PRNG (deterministic
    # per request seed, not draw-identical to the host chains) — opt in via
    # run(device_chunk=K).

    def _decode_chunk_fn(
        self, k: int, greedy_only: bool = False, k_cap: int = 0, window=None
    ):
        key_ = ("chunk", k, greedy_only, k_cap, window)
        if key_ not in self._chunk_fns:
            spec = self.spec
            mesh = self.mesh
            from ..engine.sampler import sample_device_batch
            from ..ops import qmatmul as qm
            import contextlib

            def run(params, kv, logits, n_past, active, keys, last, cfg):
                top_k, top_p, temp, rp = cfg

                def body(carry, _):
                    kv, logits, n_past, keys, last = carry
                    split = jax.vmap(jax.random.split)(keys)
                    keys2 = split[:, 0]
                    subs = split[:, 1]
                    toks = sample_device_batch(
                        logits, subs, last,
                        top_k=top_k, top_p=top_p, temperature=temp,
                        repetition_penalty=rp,
                        greedy_only=greedy_only, k_cap=k_cap,
                    )
                    last = jnp.roll(last, -1, axis=1).at[:, -1].set(toks)
                    lg, _, kv = forward_batched(
                        spec, params, toks[:, None], n_past, kv, active,
                        attn_window=window,
                    )
                    n_past = n_past + active.astype(n_past.dtype)
                    return (kv, lg, n_past, keys2, last), toks

                ctx = (
                    qm.tp_ctx(mesh) if mesh is not None
                    else contextlib.nullcontext()
                )
                with ctx:
                    (kv, logits, n_past, keys, last), toks = jax.lax.scan(
                        body, (kv, logits, n_past, keys, last), None, length=k
                    )
                return toks, logits, kv, n_past, keys, last

            kwargs = {}
            if mesh is not None and jax.process_count() > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(mesh, P())
                kwargs["out_shardings"] = (
                    rep, rep,
                    jax.tree.map(lambda a: a.sharding, self.kv),
                    rep, rep, rep,
                )
            self._chunk_fns[key_] = jax.jit(run, donate_argnums=(1,), **kwargs)
        return self._chunk_fns[key_]

    def step_chunk(self, k: int = 16) -> List[int]:
        """Admit, then decode up to `k` tokens for all active slots on device.

        Returns uids finished during this chunk."""
        self._admit()
        if not self.active:
            return []
        B = self.slots
        active = np.zeros(B, bool)
        cfg = [np.zeros(B, t) for t in (np.int32, np.float32, np.float32, np.float32)]
        last = np.full((B, 64), -1, np.int32)
        for slot, seq in self.active.items():
            r = seq.request
            active[slot] = True
            cfg[0][slot] = r.top_k if r.top_k > 0 else self.spec.n_vocab
            cfg[1][slot] = r.top_p
            cfg[2][slot] = 0.0 if r.sampler == "greedy" else r.temperature
            cfg[3][slot] = r.repetition_penalty
            lt = seq.all_tokens[-64:]
            if lt:
                last[slot, -len(lt):] = lt
            if seq._key is None:
                seq._key = jax.random.PRNGKey(
                    samplers._resolve_seed(r.seed) & 0x7FFFFFFF
                )
        keys = jnp.stack([
            self.active[slot]._key if slot in self.active else jax.random.PRNGKey(0)
            for slot in range(B)
        ])

        # static fast-path hints (see sample_device_batch): all-greedy skips
        # sampling entirely; otherwise bound the per-slot sort to the largest
        # live top_k (bucketed to limit compile-cache churn)
        greedy_only = all(cfg[2][s.slot] <= 0.0 for s in self.active.values())
        k_max = int(cfg[0][[s.slot for s in self.active.values()]].max())
        k_cap = 0
        if not greedy_only and k_max < self.spec.n_vocab:
            k_cap = 1 << max(6, (k_max - 1).bit_length())  # >=64, pow2
            if k_cap >= self.spec.n_vocab:
                k_cap = 0

        run = self._decode_chunk_fn(
            k, greedy_only, k_cap, self._live_window(extra=k + 1)
        )
        toks, self._logits, self.kv, n_past, keys, _ = run(
            self.params,
            self.kv,
            self._logits,  # device-resident, no host round trip
            jnp.asarray(self.n_past.copy()),
            jnp.asarray(active),
            keys,
            jnp.asarray(last),
            tuple(jnp.asarray(c) for c in cfg),
        )
        toks = np.asarray(toks)  # (k, B) — the only per-chunk download
        self.n_past = np.array(n_past, np.int32)
        keys = np.asarray(keys)

        done_uids = []
        for slot, seq in list(self.active.items()):
            seq._key = jnp.asarray(keys[slot])
            # every chunk token wrote a KV row (even past EOS truncation)
            self._slot_tokens[slot].extend(int(t) for t in toks[:, slot])
            r = seq.request
            ended = False
            for t in toks[:, slot]:
                t = int(t)
                if r.eos_token_id is not None and t == r.eos_token_id:
                    ended = True
                    break
                seq.generated.append(t)
                if self._feed_text(seq, t):  # stop string completed
                    ended = True
                    break
                if len(seq.generated) >= r.max_new_tokens:
                    ended = True
                    break
            if (
                ended
                or seq.cancelled
                or self.n_past[slot] >= self.spec.n_ctx - 1
            ):
                self._finish(seq, done_uids)
        return done_uids

    def run(self, device_chunk: Optional[int] = None) -> Dict[int, List[int]]:
        """Drive until all requests complete; uid -> generated tokens.

        device_chunk=K decodes K tokens per dispatch on device (see
        step_chunk); None keeps the exact per-token host sampling."""
        while self.active or self.waiting:
            if device_chunk:
                self.step_chunk(device_chunk)
            else:
                self.step()
        return {uid: seq.generated for uid, seq in self.finished.items()}
