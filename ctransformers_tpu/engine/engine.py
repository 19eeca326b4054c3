"""Inference engine: owns device params, the KV cache, and jitted steps.

TPU-native replacement for the reference's GGML graph executor
(ggml_graph_compute + per-model eval fns). Key design points:

  * One compiled program per (batch, chunk-length) pair. Prompts are split
    into power-of-two chunks (largest first), so any prompt length compiles
    at most log2(n_ctx) programs and never pads — padding would write junk
    into KV slots that later decode steps attend to. This mirrors the
    reference's BatchEval chunking (llm.h:40-54) but with XLA-static shapes.
  * The KV cache is donated to each step, so XLA updates it in place
    (no O(cache) copy per token).
  * `n_past` is a traced scalar: prefill and decode share compiled code
    across positions.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# f32 matmuls must accumulate at full precision for logit parity with the
# reference (TPU MXU otherwise downcasts inputs to bf16). The quantized fast
# path sets its own per-kernel precision and is unaffected.
jax.config.update("jax_default_matmul_precision", "highest")

from ..models.forward import KVCache, forward
from ..models.spec import ArchSpec
from ..ops import qmatmul as qm


class Engine:
    def __init__(
        self,
        spec: ArchSpec,
        params,
        batch_size: int = 1,
        kv_dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.spec = spec

        def place(a):
            if isinstance(a, qm.QTensor):
                return jax.tree.map(jnp.asarray, a)
            if np.issubdtype(np.asarray(a).dtype, np.floating):
                return jnp.asarray(a, param_dtype)
            return jnp.asarray(a)

        self.params = jax.tree.map(
            place, params, is_leaf=lambda a: isinstance(a, qm.QTensor)
        )
        # pick Pallas tile sizes for the decode batch eagerly (jit can't time)
        qm.autotune(self.params, batch_sizes=(batch_size,))
        self.batch = batch_size
        self.kv_dtype = kv_dtype
        self.kv = KVCache.create(spec, batch_size, kv_dtype)
        self.n_past = 0
        self.logits: Optional[np.ndarray] = None  # (V,) last-token logits
        self.hidden: Optional[np.ndarray] = None  # (D,) last hidden state
        self._steps = {}

    # -- compiled steps -----------------------------------------------------

    def _step(self, t: int):
        if t not in self._steps:
            spec = self.spec

            def fn(params, tokens, n_past, kv):
                return forward(spec, params, tokens, n_past, kv)

            # donate the KV cache so XLA updates it in place
            self._steps[t] = jax.jit(fn, donate_argnums=(3,))
        return self._steps[t]

    @staticmethod
    def _chunks(n: int, cap: int) -> List[int]:
        """Binary decomposition of n (largest power-of-two chunks first)."""
        out = []
        bit = 1 << (max(n, 1).bit_length() - 1)
        bit = min(bit, 1 << (cap.bit_length() - 1))
        while n > 0:
            while bit > n:
                bit >>= 1
            out.append(bit)
            n -= bit
        return out

    # -- public API -----------------------------------------------------------

    def eval(self, tokens: Sequence[int], n_past: Optional[int] = None) -> None:
        """Run the forward pass over `tokens` starting at `n_past`."""
        if n_past is None:
            n_past = self.n_past
        tokens = list(tokens)
        if not tokens:
            return
        # clamp like the reference (llm.h:126): never write past the window
        n_past = min(n_past, self.spec.n_ctx - len(tokens))
        n_past = max(n_past, 0)
        pos = 0
        for size in self._chunks(len(tokens), self.spec.n_ctx):
            chunk = np.asarray(
                tokens[pos : pos + size], np.int32
            ).reshape(1, size)
            chunk = np.broadcast_to(chunk, (self.batch, size))
            step = self._step(size)
            logits, hidden, self.kv = step(
                self.params, jnp.asarray(chunk), jnp.int32(n_past + pos), self.kv
            )
            pos += size
        # writable host copies: the public API exposes logits as a mutable
        # view whose edits must affect sampling (reference tests/test_model.py)
        self.logits = np.array(logits[0], np.float32)
        self.hidden = np.array(hidden[0], np.float32)
        self.n_past = n_past + len(tokens)

    def reset(self) -> None:
        self.n_past = 0
        self.logits = None
        self.hidden = None

    def rewind(self, n_past: int) -> None:
        """Drop cached context beyond `n_past` (prefix reuse)."""
        self.n_past = min(self.n_past, n_past)
