"""GPTQ model resolution.

Behavior parity with reference ``ctransformers/gptq/hub.py``: accept a
local directory or a Hub repo id, pull only the files a GPTQ checkpoint
needs (safetensors weights + config + SentencePiece model), validate
Config overrides, and hand off to the GPTQ-backed :class:`LLM`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from ..llm import Config
from .llm import LLM

#: The only files a GPTQ checkout needs; anything else in the repo
#: (original fp16 weights, tokenizer.json variants) is skipped.
_NEEDED = ("*.safetensors", "config.json", "tokenizer.model")


def _resolve_dir(
    source: str, local_files_only: bool, revision: Optional[str]
) -> str:
    """Local directory as-is; otherwise a Hub snapshot of the needed files."""
    if Path(source).is_dir():
        return str(source)
    from huggingface_hub import snapshot_download

    return snapshot_download(
        repo_id=source,
        allow_patterns=list(_NEEDED),
        local_files_only=local_files_only,
        revision=revision,
    )


class AutoModelForCausalLM:
    @classmethod
    def from_pretrained(
        cls, model_path_or_repo_id: str, *,
        model_type: Optional[str] = None, local_files_only: bool = False,
        revision: Optional[str] = None, **kwargs,
    ) -> LLM:
        config = Config()
        for key, value in kwargs.items():
            if not hasattr(config, key):
                raise TypeError(
                    f"'{key}' is an invalid keyword argument for from_pretrained()"
                )
            setattr(config, key, value)

        model_dir = _resolve_dir(
            str(model_path_or_repo_id), local_files_only, revision
        )
        return LLM(model_dir, model_type, config=config)
