"""GPTQ model resolution (reference: ctransformers/gptq/hub.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from ..llm import Config
from .llm import LLM


class AutoModelForCausalLM:
    @classmethod
    def from_pretrained(
        cls,
        model_path_or_repo_id: str,
        *,
        model_type: Optional[str] = None,
        local_files_only: bool = False,
        revision: Optional[str] = None,
        **kwargs,
    ) -> LLM:
        config = Config()
        for k, v in kwargs.items():
            if not hasattr(config, k):
                raise TypeError(
                    f"'{k}' is an invalid keyword argument for from_pretrained()"
                )
            setattr(config, k, v)

        path = Path(model_path_or_repo_id)
        if path.is_dir():
            model_dir = str(path)
        else:
            from huggingface_hub import snapshot_download

            model_dir = snapshot_download(
                repo_id=model_path_or_repo_id,
                allow_patterns=[
                    "*.safetensors",
                    "config.json",
                    "tokenizer.model",
                ],
                local_files_only=local_files_only,
                revision=revision,
            )
        return LLM(model_dir, model_type, config=config)
