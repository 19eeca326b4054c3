"""Public generation API.

API and behavior parity with the reference `ctransformers.llm`
(/root/reference/ctransformers/llm.py): the `LLM` class exposes the same
constructor, properties, and methods with identical streaming/stop-sequence
semantics. The FFI layer is gone — the engine underneath is jitted JAX on
TPU instead of a ctypes-bound C++ library.
"""

from __future__ import annotations

import inspect
import warnings
from collections import OrderedDict
from dataclasses import dataclass
from pathlib import Path
from typing import (
    Any,
    Generator,
    List,
    Optional,
    Sequence,
    Union,
)

import numpy as np

from .engine.engine import Engine
from .engine import sampler as samplers
from .logger import logger
from .models.registry import load_model
from .utils import TextStreamer


@dataclass
class Config:
    """Generation/runtime knobs.

    Field names and defaults match the reference Config (llm.py:38-70) so
    existing call sites keep working; `threads`/`gpu_layers`/`mmap`/`mlock`
    are accepted for compatibility but XLA owns scheduling and weights are
    HBM-resident on TPU.
    """

    top_k: int = 40                  # sampler: top-k cutoff
    top_p: float = 0.95              # sampler: nucleus mass
    temperature: float = 0.8         # sampler: softmax temperature
    repetition_penalty: float = 1.1  # sampler: repeat discouragement
    last_n_tokens: int = 64          # sampler: penalty window
    seed: int = -1                   # sampler: <0 = fresh seed per call
    batch_size: int = 8              # eval: prompt slice size
    threads: int = -1                # eval: no-op on TPU
    max_new_tokens: int = 256        # generate: output budget
    stop: Optional[Sequence[str]] = None  # generate: stop strings
    stream: bool = False             # generate: yield chunks vs one string
    reset: bool = True               # generate: drop stale state first
    context_length: int = -1         # model: context-window override
    gpu_layers: int = 0              # model: no-op on TPU
    mmap: bool = True                # model: loader hint
    mlock: bool = False              # model: loader hint


# One-line help per Config knob, rendered into method docstrings by
# @doc below and into README tables by scripts/docs.py. The knob set and
# defaults mirror the reference's Config (llm.py:38-70); the wording here
# is this project's own.
docs = OrderedDict(
    top_k="Keep only the `top_k` highest-probability tokens when sampling.",
    top_p="Nucleus sampling: keep the smallest token set whose cumulative probability reaches `top_p`.",
    temperature="Sampling temperature; lower sharpens the distribution, higher flattens it.",
    repetition_penalty="Penalty applied to tokens that already appeared in the recent context.",
    last_n_tokens="How far back the repetition penalty looks.",
    seed="RNG seed for sampling; negative picks a fresh seed per call.",
    max_new_tokens="Upper bound on the number of tokens generated per call.",
    stop="Stop strings: generation halts when any of them appears in the output.",
    stream="Return a generator that yields text chunks instead of one string.",
    reset="Drop cached model state before evaluating (shared prompt prefixes are still reused).",
    batch_size="Prompt tokens are evaluated in slices of this size.",
    threads="CPU thread count (accepted for API parity; XLA owns scheduling on TPU).",
    context_length="Override the model's maximum context window.",
    gpu_layers="Layer-offload count (accepted for API parity; TPU weights are HBM-resident).",
    guidance_scale="Classifier-free guidance strength; 1.0 (or None) disables CFG.",
    negative_prompt="Context the guidance pass evaluates instead of the prompt (CFG).",
)


def doc(fn):
    """Fill a method docstring's `{params}` slot with the help lines for
    every knob the method accepts, plus its Config default."""
    lines = []
    for name in inspect.signature(fn).parameters:
        help_text = docs.get(name)
        if help_text is None:
            continue
        default = getattr(Config, name, None)
        suffix = "" if default is None and not hasattr(Config, name) else (
            f" Default: `{default}`"
        )
        lines.append(f"{name}: {help_text}{suffix}")
    indent = "\n" + " " * 12
    fn.__doc__ = fn.__doc__.format(params=indent.join(lines))
    return fn


def get(*values):
    """First value that is not None (per-call kwarg beats Config default)."""
    return next((v for v in values if v is not None), None)


class LLM:
    # persistent sampler RNG: normally None (fresh per-call streams, like
    # the reference's per-sample seeding in llm.h:67-69); set by
    # load_session on GGSN files so a restored session resumes the
    # reference context's serialized mt19937 stream. Class-level default
    # so subclasses with their own __init__ (gptq.LLM) inherit it.
    _rng = None

    def __init__(
        self,
        model_path: str,
        model_type: Optional[str] = None,
        *,
        config: Optional[Config] = None,
        lib: Optional[str] = None,
        lora: Optional[str] = None,
        kv_dtype: Optional[str] = None,
        progress_callback=None,
    ):
        """Load a model file and build the TPU engine for it.

        Args:
            model_path: Weight file on local disk (GGUF/GGML/GGJT/...).
            model_type: Architecture name; GGUF files self-describe and
                may omit it.
            config: Generation defaults (a fresh `Config` when omitted).
            lib: Accepted for reference API compatibility; no effect.
            lora: Optional path to a ggla LoRA adapter (llama models;
                reference llama_apply_lora_from_file, llama.cpp:5002-5277).
            kv_dtype: KV cache storage: "f32" (default), "bf16" (also
                accepts "f16", which aliases to bfloat16 — the TPU half
                type; same byte width as the reference's f16_kv), or
                "int8" (per-token-head quantized rows; halves cache HBM
                traffic). Also settable via the CT_KV_DTYPE env var.
            progress_callback: Called with a 0..1 fraction as weights
                load and repack (reference: llama_progress_callback,
                llama.h:139-142).
        """
        from .utils import is_gguf

        config = config or Config()
        self._model_path = model_path
        self._config = config
        self._kv_dtype = kv_dtype
        self._context: List[int] = []
        self._mirostat_state = None
        self._rng = None

        if not Path(model_path).is_file():
            raise ValueError(f"Model path '{model_path}' doesn't exist.")

        if not model_type:
            if is_gguf(model_path):
                model_type = "gguf"  # GGUF self-describes its architecture
            else:
                raise ValueError(
                    "Unable to detect model type. Please specify a model type using:\n\n"
                    "  AutoModelForCausalLM.from_pretrained(..., model_type='...')\n\n"
                )

        bundle = load_model(
            model_path,
            model_type,
            context_length=config.context_length,
            progress_callback=progress_callback,
        )
        if lora:
            from .tools.lora import apply_lora

            apply_lora(bundle.params, lora)
        self._init_from_bundle(bundle, model_type)

    def _init_from_bundle(self, bundle, model_type: str) -> None:
        """Wire up the engine/sampler from a loaded ModelBundle (shared by
        the GGML/GGUF path and the GPTQ backend)."""
        self._bundle = bundle
        # GGUF reports its own architecture (reference llm.py:256-258)
        if bundle.architecture:
            model_type = bundle.architecture
        self._model_type = model_type
        from .models.forward import resolve_kv_dtype

        kv_dtype = resolve_kv_dtype(getattr(self, "_kv_dtype", None))
        self._engine = Engine(bundle.spec, bundle.params, kv_dtype=kv_dtype)
        self._sample_fn = (
            samplers.sample_llama
            if bundle.sampler == "llama"
            else samplers.sample_gpt
        )
        # classifier-free guidance context, created on first use (a second
        # Engine sharing the device-resident weights, with its own KV)
        self._guidance: Optional[Engine] = None

    # -- read-only surface (same property set as the reference LLM) ---------

    model_path = property(
        lambda self: self._model_path, doc="Path of the loaded weight file."
    )
    model_type = property(
        lambda self: self._model_type, doc="Architecture name being served."
    )
    config = property(lambda self: self._config, doc="Generation defaults.")
    eos_token_id = property(
        lambda self: self._bundle.vocab.eos_token_id(),
        doc="End-of-sequence token id.",
    )
    bos_token_id = property(
        lambda self: self._bundle.vocab.bos_token_id(),
        doc="Beginning-of-sequence token id.",
    )
    pad_token_id = property(
        lambda self: self.eos_token_id, doc="Padding token id (aliases EOS)."
    )
    vocab_size = property(
        lambda self: len(self._bundle.vocab), doc="Vocabulary size."
    )
    context_length = property(
        lambda self: self._bundle.spec.n_ctx, doc="Context window in tokens."
    )

    @property
    def logits(self) -> np.ndarray:
        """Raw next-token logits from the last eval — a writable array, so
        callers may edit them in place before `sample()` (logit bias etc.),
        matching the reference's mutable logits contract."""
        if self._engine.logits is None:
            return np.zeros(0, np.float32)
        return self._engine.logits

    @property
    def embeddings(self) -> List[float]:
        """Pooled input embedding of the last eval ([] for architectures
        without embedding support)."""
        if not self._bundle.supports_embeddings or self._engine.hidden is None:
            return []
        # .tolist(): python floats, as the reference's c_float Vector
        # yields (llm.py:666-689)
        return np.asarray(self._engine.hidden, np.float32).tolist()

    # -- core methods ---------------------------------------------------------

    def tokenize(self, text: str, add_bos_token: Optional[bool] = None) -> List[int]:
        """Encode `text` to token ids. BOS is prepended by default only
        for llama-family models (their SPM training convention); pass
        `add_bos_token` to force either way."""
        if add_bos_token is None:
            add_bos_token = self.model_type == "llama"
        return self._bundle.tokenizer.tokenize(text, add_bos_token)

    def detokenize(
        self, tokens: Sequence[int], decode: bool = True
    ) -> Union[str, bytes]:
        """Decode token ids (or a single id) back to text. With
        `decode=False` the raw UTF-8 bytes are returned — callers that
        stream token-by-token need the bytes to stitch split multi-byte
        characters back together."""
        if isinstance(tokens, int):
            tokens = [tokens]
        texts = b"".join(self._bundle.tokenizer.detokenize(t) for t in tokens)
        if decode:
            text = texts.decode(errors="ignore")
            # leading space after BOS is stripped (reference llm.py:362-364)
            if list(tokens[:1]) == [self.bos_token_id] and text[:1] == " ":
                text = text[1:]
            return text
        return texts

    def is_eos_token(self, token: int) -> bool:
        """Whether `token` terminates generation for this model (vocab EOS
        plus per-arch specials like StarChat's <|end|>)."""
        return self._bundle.vocab.is_eos_token(token)

    @doc
    def eval(
        self, tokens: Sequence[int], *,
        batch_size: Optional[int] = None, threads: Optional[int] = None,
    ) -> None:
        """Run the forward pass over `tokens`, appending to the cached
        context; afterwards `logits` holds the next-token distribution.

        Args:
            tokens: Token ids to evaluate.
            {params}
        """
        del batch_size, threads  # XLA owns scheduling; kept for API parity
        n_past = len(self._context)
        n_tokens = len(tokens)
        if n_past + n_tokens > self.context_length:
            logger.warning(
                f"Number of tokens ({n_past + n_tokens}) exceeded maximum context length ({self.context_length})."
            )
        self._engine.eval(tokens, n_past=n_past)
        self._context.extend(int(t) for t in tokens)

    @doc
    def sample(
        self, *,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        last_n_tokens: Optional[int] = None, seed: Optional[int] = None,
        tfs_z: Optional[float] = None, typical_p: Optional[float] = None,
        frequency_penalty: Optional[float] = None,
        presence_penalty: Optional[float] = None,
        mirostat: Optional[int] = None, mirostat_tau: Optional[float] = None,
        mirostat_eta: Optional[float] = None,
    ) -> int:
        """Draw one token id from the current `logits`.

        The extended knobs (tfs_z, typical_p, frequency/presence penalties,
        mirostat v1/v2) expose the reference engine's full sampler suite
        (llama.cpp:3805-4332); when none is set, sampling follows the
        classic gpt/llama chains exactly.

        Args:
            {params}

        Returns:
            The sampled token id.
        """
        cfg = self.config
        top_k, top_p = get(top_k, cfg.top_k), get(top_p, cfg.top_p)
        temperature = get(temperature, cfg.temperature)
        repetition_penalty = get(repetition_penalty, cfg.repetition_penalty)
        last_n_tokens, seed = get(last_n_tokens, cfg.last_n_tokens), get(seed, cfg.seed)
        if last_n_tokens < 0:
            last_n_tokens = self.context_length
        last_tokens = self._context[-last_n_tokens:]

        if self._engine.logits is None:
            return self.eos_token_id

        extended = any(
            v is not None
            for v in (
                tfs_z,
                typical_p,
                frequency_penalty,
                presence_penalty,
                mirostat,
            )
        )
        if extended:
            from .engine import sampler_suite as ss

            mirostat = int(get(mirostat, 0))
            mirostat_tau = get(mirostat_tau, 5.0)
            if mirostat and self._mirostat_state is None:
                self._mirostat_state = ss.MirostatState.create(mirostat_tau)
            return samplers.sample_extended(
                self._engine.logits,
                top_k=top_k,
                top_p=top_p,
                temperature=temperature,
                repetition_penalty=repetition_penalty,
                last_tokens=last_tokens,
                tfs_z=get(tfs_z, 1.0),
                typical_p=get(typical_p, 1.0),
                frequency_penalty=get(frequency_penalty, 0.0),
                presence_penalty=get(presence_penalty, 0.0),
                mirostat=mirostat,
                mirostat_tau=mirostat_tau,
                mirostat_eta=get(mirostat_eta, 0.1),
                seed=seed,
                mirostat_state=self._mirostat_state,
                rng=self._rng,
            )
        return self._sample_fn(
            self._engine.logits,
            top_k=top_k,
            top_p=top_p,
            temperature=temperature,
            repetition_penalty=repetition_penalty,
            last_tokens=last_tokens,
            seed=seed,
            rng=self._rng,
        )

    def reset(self) -> None:
        """Deprecated since 0.2.27."""
        warnings.warn(
            "`LLM.reset()` method is deprecated since 0.2.27. Please use high-level API."
        )
        self._context.clear()
        self._engine.reset()

    @doc
    def prepare_inputs_for_generation(
        self, tokens: Sequence[int], *, reset: Optional[bool] = None,
    ) -> Sequence[int]:
        """Trim `tokens` down to the suffix that still needs evaluating,
        reusing the longest prefix already in the KV cache (and rewinding
        the cache past any divergence point).

        Args:
            tokens: Full input token list.
            {params}

        Returns:
            The tokens that must actually be evaluated.
        """
        if not get(reset, self.config.reset):
            return tokens

        # Shared-prefix scan, capped one short of the full input so at
        # least one token is evaluated and logits stay fresh.
        limit = min(len(tokens) - 1, len(self._context))
        keep = 0
        while keep < limit and tokens[keep] == self._context[keep]:
            keep += 1
        self._context = self._context[:keep]
        self._engine.rewind(keep)
        return tokens[keep:]

    def _guidance_begin(
        self, negative_prompt: Optional[str], prompt_tokens: Sequence[int]
    ) -> None:
        """Prepare the classifier-free-guidance context: a second Engine
        over the same device-resident weights (its own KV cache — the
        analog of the reference's second llama_context, whose logits
        llama_sample_classifier_free_guidance blends, llama.cpp:4139-4173),
        reset and prefilled with the negative prompt."""
        if self._guidance is None:
            self._guidance = Engine(
                self._bundle.spec,
                self._engine.params,
                kv_dtype=self._engine.kv_dtype,
            )
        self._guidance.reset()
        gtokens = self.tokenize(negative_prompt) if negative_prompt else []
        if not gtokens:
            # no negative prompt: guide on the bare sequence start (BOS
            # where the model has one, else the prompt's first token)
            gtokens = list(prompt_tokens[:1])
        self._guidance.eval(gtokens, n_past=0)

    @staticmethod
    def _cfg_blend(base, guide, scale: float) -> np.ndarray:
        """Blend main/guidance logits via the parity-tested sampler op."""
        from .engine import sampler_suite as ss

        c = ss.Candidates.from_logits(base)
        ss.classifier_free_guidance(c, guide, scale)
        return c.logits

    @doc
    def generate(
        self, tokens: Sequence[int], *,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        last_n_tokens: Optional[int] = None, seed: Optional[int] = None,
        batch_size: Optional[int] = None, threads: Optional[int] = None,
        reset: Optional[bool] = None, grammar=None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
    ) -> Generator[int, None, None]:
        """Token-level generation loop: eval the prompt once, then yield
        sampled ids until EOS (the caller enforces any length budget).

        `grammar` constrains sampling to a GBNF grammar (text or a
        pre-built engine.grammar.Grammar) — the reference's
        llama_sample_grammar path (llama.cpp:4085-4124).

        `guidance_scale`/`negative_prompt` enable classifier-free
        guidance: a second context evaluates the negative prompt and each
        sampled token; logits are blended before the sampler chain
        (reference: llama_sample_classifier_free_guidance,
        llama.cpp:4139-4173).

        Args:
            tokens: Prompt token ids.
            {params}

        Returns:
            A generator of sampled token ids.
        """
        if grammar is not None and isinstance(grammar, str):
            from .engine.grammar import Grammar

            grammar = Grammar.from_gbnf(grammar)
        use_cfg = guidance_scale is not None and guidance_scale != 1.0
        detok = self._bundle.tokenizer.detokenize
        tokens = self.prepare_inputs_for_generation(tokens, reset=reset)
        if use_cfg:
            self._guidance_begin(negative_prompt, tokens)
        self.eval(tokens, batch_size=batch_size, threads=threads)
        while True:
            saved = None
            if use_cfg or grammar is not None:
                saved = self._engine.logits
                blended = saved
                if use_cfg:
                    # CFG first (needs the unsorted full vocabulary), then
                    # the grammar mask — matching the reference chain
                    blended = self._cfg_blend(
                        blended, self._guidance.logits, guidance_scale
                    )
                if grammar is not None:
                    blended = grammar.filter_logits(
                        blended, detok, self.eos_token_id
                    )
                self._engine.logits = blended
            token = self.sample(
                top_k=top_k,
                top_p=top_p,
                temperature=temperature,
                repetition_penalty=repetition_penalty,
                last_n_tokens=last_n_tokens,
                seed=seed,
            )
            if saved is not None:
                self._engine.logits = saved
            if grammar is not None:
                grammar.accept_token(token, detok, self.eos_token_id)
            self.eval([token], batch_size=batch_size, threads=threads)
            if use_cfg:
                self._guidance.eval([token])
            if self.is_eos_token(token):
                break
            yield token

    def _stream(
        self, prompt: str, *,
        max_new_tokens: Optional[int] = None,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        last_n_tokens: Optional[int] = None, seed: Optional[int] = None,
        batch_size: Optional[int] = None, threads: Optional[int] = None,
        stop: Optional[Sequence[str]] = None, reset: Optional[bool] = None,
        grammar=None, guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
    ) -> Generator[str, None, None]:
        config = self.config
        max_new_tokens = get(max_new_tokens, config.max_new_tokens)
        stop = get(stop, config.stop) or []
        if isinstance(stop, str):
            stop = [stop]

        tokens = self.tokenize(prompt)

        # UTF-8 assembly + stop truncation + suffix holdback all live in
        # TextStreamer (shared with the batch scheduler / HTTP server)
        streamer = TextStreamer(stop)
        count = 0
        for token in self.generate(
            tokens, top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty,
            last_n_tokens=last_n_tokens, seed=seed, batch_size=batch_size,
            threads=threads, reset=reset, grammar=grammar,
            guidance_scale=guidance_scale, negative_prompt=negative_prompt,
        ):
            chunk = streamer.feed(self.detokenize([token], decode=False))
            if chunk:
                yield chunk
            if streamer.stopped:
                break
            count += 1
            if count >= max_new_tokens:
                break

        tail = streamer.flush()
        if tail:
            yield tail

    @doc
    def __call__(
        self, prompt: str, *,
        max_new_tokens: Optional[int] = None,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        last_n_tokens: Optional[int] = None, seed: Optional[int] = None,
        batch_size: Optional[int] = None, threads: Optional[int] = None,
        stop: Optional[Sequence[str]] = None, stream: Optional[bool] = None,
        reset: Optional[bool] = None, grammar=None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
    ) -> Union[str, Generator[str, None, None]]:
        """Text-level entry point: prompt in, completion out (or a chunk
        generator with `stream=True`).

        Args:
            prompt: Input text.
            {params}

        Returns:
            The completion string, or a generator of text chunks.
        """
        config = self.config
        stream = get(stream, config.stream)

        text = self._stream(
            prompt, max_new_tokens=max_new_tokens, top_k=top_k, top_p=top_p,
            temperature=temperature, repetition_penalty=repetition_penalty,
            last_n_tokens=last_n_tokens, seed=seed, batch_size=batch_size,
            threads=threads, stop=stop, reset=reset, grammar=grammar,
            guidance_scale=guidance_scale, negative_prompt=negative_prompt,
        )
        if stream:
            return text
        return "".join(text)

    @doc
    def embed(
        self, input: Union[str, Sequence[int]], *,
        batch_size: Optional[int] = None, threads: Optional[int] = None,
    ) -> List[float]:
        """Embedding of a text or token list (llama/falcon only — the
        other architectures don't expose a pooled hidden state).

        Args:
            input: Text or token ids to embed.
            {params}

        Returns:
            The embedding vector as a list of floats.
        """
        if isinstance(input, str):
            input = self.tokenize(input)
        input = self.prepare_inputs_for_generation(input, reset=True)
        self.eval(input, batch_size=batch_size, threads=threads)
        return list(self.embeddings)

    # -- session save/load ---------------------------------------------------
    # The reference engine's session files (magic GGSN + token history + full
    # inference state, llama.cpp:5952-6032). llama-family models write the
    # byte-compatible GGSN format (engine/session.py) — files round-trip
    # with the reference engine's llama_save/load_session_file. Other
    # architectures (which have no session files in the reference) use an
    # .npz with the same content + semantics.

    def _ggsn_capable(self) -> bool:
        spec = self._engine.spec
        return spec.name == "llama" and self._engine.batch == 1

    def save_session(self, path: str, format: str = "auto") -> None:
        """Saves the evaluated context (tokens + KV cache + logits) to `path`.

        `format`: "ggsn" (reference-compatible session file, llama models),
        "npz", or "auto" (GGSN where supported)."""
        if format == "auto":
            format = "ggsn" if self._ggsn_capable() else "npz"
        if format == "ggsn":
            from .engine import sampler as _sampler
            from .engine import session as _session

            state = self._engine.save_state()
            rng = self._rng
            if rng is None:
                rng = np.random.RandomState(
                    _sampler._resolve_seed(self.config.seed)
                )
            _session.save_ggsn(
                path,
                self._engine.spec,
                self._context,
                n_past=int(state["n_past"]),
                kv_k=state["kv_k"][:, 0],
                kv_v=state["kv_v"][:, 0],
                logits=state["logits"],
                embedding=state["hidden"],
                rng=rng,
            )
            return
        state = self._engine.save_state()
        arrays = {
            "tokens": np.asarray(self._context, np.int32),
            "n_past": np.int64(state["n_past"]),
            "kv_k": state["kv_k"],
            "kv_v": state["kv_v"],
        }
        if state["logits"] is not None:
            arrays["logits"] = state["logits"]
        if state["hidden"] is not None:
            arrays["hidden"] = state["hidden"]
        # write through a file object: np.savez would otherwise append
        # ".npz" to the path and load_session(path) would miss the file
        with open(path, "wb") as f:
            np.savez_compressed(f, **arrays)

    def load_session(self, path: str) -> List[int]:
        """Restores a session; returns the restored token history.

        Accepts both formats (sniffed by magic): reference-compatible GGSN
        files — including ones written by the reference engine itself —
        and this package's .npz sessions."""
        from .engine import session as _session

        if _session.is_ggsn(path):
            data = _session.load_ggsn(path)
            spec = self._engine.spec
            hp = data["hparams"]
            for ours, theirs in (
                (spec.n_vocab, hp["n_vocab"]),
                (spec.n_embd, hp["n_embd"]),
                (spec.n_layer, hp["n_layer"]),
                (spec.n_head, hp["n_head"]),
                (spec.kv_heads, hp["n_head_kv"]),
                (spec.n_ctx, hp["n_ctx"]),
            ):
                if ours != theirs:
                    raise ValueError(
                        "session file hparams do not match this model "
                        f"({hp} vs {spec})"
                    )
            n = data["n_past"]
            hkv, dh = spec.kv_heads, spec.head_dim
            state = {
                "n_past": n,
                "logits": data["logits"],
                "hidden": data["embedding"],
                "kv_k": np.zeros((spec.n_layer, 1, 0, hkv, dh), np.float32)
                if n == 0
                else data["kv_k"].reshape(spec.n_layer, 1, n, hkv, dh),
                "kv_v": np.zeros((spec.n_layer, 1, 0, hkv, dh), np.float32)
                if n == 0
                else data["kv_v"].reshape(spec.n_layer, 1, n, hkv, dh),
            }
            self._engine.load_state(state)
            if data["rng"] is not None:
                self._rng = data["rng"]
            self._context = [int(t) for t in data["tokens"]]
            return list(self._context)
        data = np.load(path)
        state = {
            "n_past": int(data["n_past"]),
            "kv_k": data["kv_k"],
            "kv_v": data["kv_v"],
            "logits": data["logits"] if "logits" in data else None,
            "hidden": data["hidden"] if "hidden" in data else None,
        }
        self._engine.load_state(state)
        self._context = [int(t) for t in data["tokens"]]
        return list(self._context)

    def generate_fast(
        self, prompt: str, *,
        max_new_tokens: Optional[int] = None,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        last_n_tokens: Optional[int] = None, seed: Optional[int] = None,
        stop: Optional[Sequence[str]] = None, reset: Optional[bool] = None,
        grammar=None, abort_callback=None, chunk: Optional[int] = None,
    ) -> str:
        """High-throughput generation: the sample->eval loop runs on device
        in `chunk`-token compiled segments (Engine.decode_chunked) instead
        of the per-token host round trip of `__call__`. Sampling uses the
        on-device sampler (same chain, jax PRNG — deterministic per seed but
        not draw-identical to the host samplers).

        Between segments the host applies EOS and stop-string semantics
        (via utils.TextStreamer, same contract as `__call__`) and checks
        `abort_callback()` — so generation ends within `chunk` tokens of a
        stop instead of burning the full budget, and a server can cancel
        mid-request (the reference's abort_callback, ggml.h:506-507).

        `grammar` falls back to the exact host loop (`__call__`): the
        grammar FSM advances token-by-token on the host and cannot run
        inside the fused device program.

        `chunk` (default CT_DECODE_CHUNK or 32; 0 = single dispatch): the
        cancellation/stop latency vs dispatch-overhead trade."""
        if grammar is not None:
            return self(
                prompt, max_new_tokens=max_new_tokens, top_k=top_k,
                top_p=top_p, temperature=temperature,
                repetition_penalty=repetition_penalty,
                last_n_tokens=last_n_tokens, seed=seed, stop=stop,
                reset=reset, grammar=grammar,
            )
        import os as _os

        config = self.config
        max_new_tokens = get(max_new_tokens, config.max_new_tokens)
        stop = get(stop, config.stop) or []
        if isinstance(stop, str):
            stop = [stop]
        seed = get(seed, config.seed)
        if seed is not None and seed < 0:
            import time as _t

            seed = int(_t.time())
        last_n = get(last_n_tokens, config.last_n_tokens)
        if last_n < 0:
            last_n = self.context_length
        if chunk is None:
            chunk = int(_os.environ.get("CT_DECODE_CHUNK", "32"))
        if chunk <= 0:
            chunk = max_new_tokens

        tokens = self.tokenize(prompt)
        tokens = self.prepare_inputs_for_generation(tokens, reset=reset)
        self.eval(tokens)

        streamer = TextStreamer(stop)
        pieces: List[str] = []

        def should_stop(segment):
            for i, t in enumerate(segment):
                if self.is_eos_token(t):
                    return i  # drop the EOS token and everything after
                piece = streamer.feed(self.detokenize([t], decode=False))
                if piece:
                    pieces.append(piece)
                if streamer.stopped:
                    return i + 1  # token completing the stop string stays
            return None

        toks = self._engine.decode_chunked(
            max_new_tokens,
            chunk=chunk,
            should_stop=should_stop,
            abort_callback=abort_callback,
            top_k=get(top_k, config.top_k),
            top_p=get(top_p, config.top_p),
            temperature=get(temperature, config.temperature),
            repetition_penalty=get(repetition_penalty, config.repetition_penalty),
            last_tokens=self._context[-last_n:],
            last_n=last_n,
            seed=seed,
        )
        self._context.extend(int(t) for t in toks)
        if not streamer.stopped:
            pieces.append(streamer.flush())
        return "".join(pieces)
