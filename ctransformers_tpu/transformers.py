"""🤗 Transformers interop layer.

Exposes the TPU engine as a ``PreTrainedModel`` + ``PreTrainedTokenizer``
pair so stock HF ``generate()`` / pipeline code runs unchanged (behavior
parity with reference ``ctransformers/transformers.py``). The forward pass
executes on TPU via the jitted JAX engine; only the final logits cross to
torch on the host, as numpy, in one batch.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

try:
    import torch
except ImportError as e:  # pragma: no cover - torch is baked into the image
    raise ImportError(
        "The 🤗 wrapper needs `torch`; install it with: pip install transformers[torch]"
    ) from e

try:
    from transformers import (
        MODEL_FOR_CAUSAL_LM_MAPPING,
        BatchEncoding,
        PretrainedConfig,
        PreTrainedModel,
        PreTrainedTokenizer,
        TensorType,
    )
    from transformers.modeling_outputs import CausalLMOutput
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "The 🤗 wrapper needs `transformers`; install it with: pip install transformers"
    ) from e

try:  # transformers >= 4.50 moves generate() off PreTrainedModel
    from transformers.generation import GenerationMixin
except ImportError:  # pragma: no cover - older transformers

    class GenerationMixin:
        pass

import numpy as np

from .llm import LLM

# Config attributes that HF generation utilities consult and that our LLM
# can supply when the PretrainedConfig doesn't already carry them.
_CONFIG_PASSTHROUGH = ("vocab_size", "bos_token_id", "eos_token_id", "pad_token_id")


class CTransformersConfig(PretrainedConfig):
    pass


class CTransformersModel(PreTrainedModel, GenerationMixin):
    """Causal-LM shim: HF calling convention in, TPU engine underneath."""

    def __init__(self, config: PretrainedConfig, llm: LLM):
        for attr in _CONFIG_PASSTHROUGH:
            if getattr(config, attr, None) is None:
                setattr(config, attr, getattr(llm, attr, None))
        # The KV cache lives inside the TPU engine; tell HF generation not
        # to build a DynamicCache of its own (which would also demand
        # layer-count metadata this config doesn't carry).
        config.use_cache = False
        if getattr(config, "num_hidden_layers", None) is None:
            spec = getattr(getattr(llm, "_bundle", None), "spec", None)
            config.num_hidden_layers = getattr(spec, "n_layer", 1) or 1
        super().__init__(config)
        self._llm = llm
        try:
            MODEL_FOR_CAUSAL_LM_MAPPING.register("ctransformers", CTransformersModel)
        except ValueError:
            pass  # a previous instance already registered the type

    @property
    def device(self) -> torch.device:
        # Tensors handed to/from HF live on the host; the TPU side is
        # internal to the engine.
        return torch.device("cpu")

    def prepare_inputs_for_generation(self, input_ids, attention_mask=None, **kwargs):
        return {"input_ids": input_ids}

    def forward(self, input_ids=None, return_dict=None, **kwargs):
        """Evaluate each row and return next-token logits of shape
        (batch, 1, vocab).

        Rows are run sequentially through the engine — the engine's
        prefix-reuse makes the common generate() pattern (same prompt +
        one new token) an incremental eval rather than a recompute.
        """
        rows = []
        for row in input_ids:
            tokens = self._llm.prepare_inputs_for_generation(row.tolist())
            self._llm.eval(tokens)
            rows.append(np.asarray(self._llm.logits, dtype=np.float32).copy())
        logits = torch.from_numpy(np.stack(rows)[:, None, :])
        if return_dict:
            return CausalLMOutput(logits=logits)
        return (logits,)


class CTransformersTokenizer(PreTrainedTokenizer):
    """Tokenizer facade over the vocabulary embedded in the weight file."""

    def __init__(self, llm: LLM, **kwargs):
        # PreTrainedTokenizer.__init__ (>=4.34) consults get_vocab(), so
        # the engine handle must exist before the super() call.
        self._llm = llm
        self._vocab_cache: Optional[Dict[str, int]] = None
        super().__init__(**kwargs)

    def get_vocab(self) -> Dict[str, int]:
        """token-text → id map, materialized lazily from the engine vocab
        (ids whose bytes collide keep the first id, matching lookup order)."""
        if self._vocab_cache is None:
            mapping: Dict[str, int] = {}
            for token_id in range(self._llm.vocab_size):
                text = self._llm.detokenize(token_id)
                if text not in mapping:
                    mapping[text] = token_id
            self._vocab_cache = mapping
        return self._vocab_cache

    def _special_text(self, token_id: Optional[int], fallback: str) -> str:
        text = self._llm.detokenize(token_id) if token_id is not None else ""
        return text or fallback

    # Special-token surface: ids come straight from the engine's vocab;
    # token *text* falls back to the conventional SentencePiece spellings
    # when the vocab stores empty strings for the specials.
    vocab_size = property(lambda self: self._llm.vocab_size)
    bos_token_id = property(lambda self: self._llm.bos_token_id)
    eos_token_id = property(lambda self: self._llm.eos_token_id)
    pad_token_id = property(lambda self: self._llm.pad_token_id)
    bos_token = property(lambda self: self._special_text(self._llm.bos_token_id, "<s>"))
    eos_token = property(lambda self: self._special_text(self._llm.eos_token_id, "</s>"))
    pad_token = property(lambda self: self._special_text(self._llm.pad_token_id, "</s>"))
    all_special_ids = property(lambda self: [self.eos_token_id])

    def _encode_plus(self, text, return_tensors=None, **kwargs) -> BatchEncoding:
        if isinstance(text, str):
            ids = self._llm.tokenize(text)
        elif isinstance(text, (list, tuple)) and text and isinstance(text[0], int):
            ids = list(text)
        else:
            raise ValueError(
                f"Input {text} is not valid. Should be a string or a list/tuple of integers."
            )
        return self.prepare_for_model(
            ids, return_tensors=return_tensors, prepend_batch_axis=True
        )

    def _decode(self, token_ids, skip_special_tokens=False, **kwargs) -> str:
        if skip_special_tokens:
            drop = set(self.all_special_ids)
            token_ids = [t for t in token_ids if t not in drop]
        return self._llm.detokenize(token_ids)

    def _convert_token_to_id(self, token: str) -> int:
        return self._llm.tokenize(token, add_bos_token=False)[0]

    def _convert_id_to_token(self, index: int) -> str:
        return self._llm.detokenize(index)

    def convert_tokens_to_string(self, tokens) -> str:
        return "".join(tokens)
