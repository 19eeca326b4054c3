"""LangChain integration.

Registers a ``CTransformers`` LLM class whose field schema matches the
reference integration (reference ``ctransformers/langchain.py``), backed by
the TPU engine. langchain itself is optional and not baked into the image,
so importing this module without it raises a pointed ImportError.
"""

from typing import Any, Dict, Optional, Sequence

try:
    from langchain.llms.base import LLM
except ImportError as e:
    raise ImportError(
        "ctransformers_tpu.langchain requires the `langchain` package "
        "(pip install langchain)"
    ) from e

try:  # langchain vendors pydantic v1 under langchain.pydantic_v1
    from langchain.pydantic_v1 import root_validator
except ImportError:  # pragma: no cover
    from pydantic import root_validator

from langchain.callbacks.manager import CallbackManagerForLLMRun

from .hub import AutoModelForCausalLM


class CTransformers(LLM):
    """LangChain LLM backed by the TPU-native ctransformers engine."""

    client: Any  #: :meta private:

    model: str
    """Weight file, directory, or Hugging Face Hub repo id."""

    model_type: Optional[str] = None
    """Architecture name (inferred when omitted)."""

    model_file: Optional[str] = None
    """Specific weight file inside a directory or repo."""

    config: Optional[Dict[str, Any]] = None
    """Generation/config overrides forwarded to ``from_pretrained``."""

    lib: Optional[Any] = None
    """Accepted for reference compatibility; no-op on TPU."""

    @property
    def _llm_type(self) -> str:
        return "ctransformers"

    @property
    def _identifying_params(self) -> Dict[str, Any]:
        return {
            field: getattr(self, field)
            for field in ("model", "model_type", "model_file", "config")
        }

    @root_validator()
    def validate_environment(cls, values: Dict) -> Dict:
        """Load the model eagerly so a bad path fails at construction."""
        overrides = dict(values["config"] or {})
        values["client"] = AutoModelForCausalLM.from_pretrained(
            values["model"], model_type=values["model_type"],
            model_file=values["model_file"], lib=values["lib"], **overrides)
        return values

    def _call(self, prompt, stop=None, run_manager=None) -> str:
        """Stream tokens from the engine, relaying each chunk to the
        callback manager, and return the concatenated completion."""
        pieces = []
        for piece in self.client(prompt, stop=stop, stream=True):
            if run_manager is not None:
                run_manager.on_llm_new_token(piece, verbose=self.verbose)
            pieces.append(piece)
        return "".join(pieces)
