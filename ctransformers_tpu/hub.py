"""Model resolution: turn "a path, a directory, or a Hub repo id" into a
loaded :class:`~ctransformers_tpu.llm.LLM`.

Behavior contract (parity with reference ``ctransformers/hub.py``):

* ``config.json`` supplies ``model_type`` plus the ``text-generation``
  sampling defaults, which explicit kwargs override; unknown kwargs raise
  ``TypeError`` (ref hub.py:55-60).
* When no ``model_file`` is given, the *smallest* ``*.bin``/``*.gguf``
  file in the directory or repo wins (ref hub.py:223-230, 245-253).
* Repo ids containing ``gptq`` route to the GPTQ backend
  (ref hub.py:139-149).
* ``hf=True`` returns the 🤗-compatible wrapper instead of the raw LLM.

The implementation here is organized around a single ``_ModelSource``
object that abstracts "where the files live" (local dir vs. Hub snapshot),
rather than parallel classmethod ladders per source kind.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from .llm import Config, LLM

#: File suffixes that count as servable weight files.
_WEIGHT_SUFFIXES = (".bin", ".gguf")

#: config.json ``task_specific_params.text-generation`` keys we honor.
_SAMPLING_KEYS = ("top_k", "top_p", "temperature", "repetition_penalty", "last_n_tokens")


def _is_plausible_repo_id(name: str) -> bool:
    """True when huggingface_hub is importable and accepts ``name`` as a
    repo id. Without the hub package nothing can be downloaded anyway, so
    we simply answer False."""
    try:
        from huggingface_hub.utils import HFValidationError, validate_repo_id
    except ImportError:
        return False
    try:
        validate_repo_id(name)
    except HFValidationError:
        return False
    return True


def get_path_type(path: str) -> Optional[str]:
    """Classify a model source string.

    Returns ``"file"`` / ``"dir"`` for existing local paths, ``"repo"``
    for a string that validates as a Hub repo id, else ``None``.
    """
    p = Path(path)
    if p.is_file():
        return "file"
    if p.is_dir():
        return "dir"
    return "repo" if _is_plausible_repo_id(path) else None


@dataclass
class _ModelSource:
    """Uniform view over the three places a model can come from.

    ``materialize`` lazily downloads (repo) or resolves (dir/file) and
    afterwards every query — config.json contents, weight-file listing —
    is a plain local-filesystem operation.
    """

    kind: str  # "file" | "dir" | "repo"
    spec: str
    local_files_only: bool = False
    revision: Optional[str] = None

    @classmethod
    def open(
        cls,
        model_path_or_repo_id: str,
        local_files_only: bool = False,
        revision: Optional[str] = None,
    ) -> "_ModelSource":
        kind = get_path_type(str(model_path_or_repo_id))
        if kind is None:
            raise ValueError(f"Model path '{model_path_or_repo_id}' doesn't exist.")
        return cls(
            kind=kind,
            spec=str(model_path_or_repo_id),
            local_files_only=local_files_only,
            revision=revision,
        )

    # -- config.json ------------------------------------------------------

    def load_config_dict(self) -> Dict[str, Any]:
        """Parsed config.json, or {} when absent / not applicable."""
        if self.kind == "file":
            return {}
        if self.kind == "dir":
            root = Path(self.spec)
        else:
            from huggingface_hub import snapshot_download

            root = Path(
                snapshot_download(
                    repo_id=self.spec,
                    allow_patterns="config.json",
                    local_files_only=self.local_files_only,
                    revision=self.revision,
                )
            )
        cfg_file = (root / "config.json").resolve()
        if not cfg_file.is_file():
            return {}
        with open(cfg_file) as f:
            return json.load(f)

    # -- weight files ------------------------------------------------------

    def weight_file(self, model_file: Optional[str] = None) -> str:
        """Absolute path of the weight file to serve.

        A named ``model_file`` is looked up directly; otherwise the
        smallest candidate wins (repo sizes come from the Hub API so only
        the chosen file is downloaded).
        """
        if self.kind == "file":
            return self.spec
        if self.kind == "repo":
            return self._weight_file_from_repo(model_file)
        return self._pick_from_dir(Path(self.spec), model_file)

    def _weight_file_from_repo(self, model_file: Optional[str]) -> str:
        from huggingface_hub import snapshot_download

        if model_file is None and not self.local_files_only:
            model_file = self._smallest_repo_weight()
        path = snapshot_download(
            repo_id=self.spec,
            allow_patterns=model_file or [f"*{s}" for s in _WEIGHT_SUFFIXES],
            local_files_only=self.local_files_only,
            revision=self.revision,
        )
        return self._pick_from_dir(Path(path), model_file)

    def _smallest_repo_weight(self) -> str:
        """Ask the Hub API for file metadata and return the name of the
        smallest weight file (ref hub.py:223-230 behavior)."""
        from huggingface_hub import HfApi

        info = HfApi().repo_info(
            repo_id=self.spec, files_metadata=True, revision=self.revision
        )
        ranked: List[Tuple[int, str]] = sorted(
            (s.size, s.rfilename)
            for s in info.siblings
            if s.rfilename.endswith(_WEIGHT_SUFFIXES)
        )
        if not ranked:
            raise ValueError(f"No model file found in repo '{self.spec}'")
        return ranked[0][1]

    @staticmethod
    def _pick_from_dir(root: Path, model_file: Optional[str]) -> str:
        root = root.resolve()
        if model_file:
            candidate = (root / model_file).resolve()
            if not candidate.is_file():
                raise ValueError(f"Model file '{model_file}' not found in '{root}'")
            return str(candidate)
        ranked = sorted(
            (f.stat().st_size, str(f.resolve()))
            for f in root.iterdir()
            if f.is_file() and f.name.endswith(_WEIGHT_SUFFIXES)
        )
        if not ranked:
            raise ValueError(f"No model file found in directory '{root}'")
        return ranked[0][1]


@dataclass
class AutoConfig:
    config: Config
    model_type: Optional[str] = None

    @classmethod
    def from_pretrained(
        cls, model_path_or_repo_id: str, local_files_only: bool = False,
        revision: Optional[str] = None, **kwargs,
    ) -> "AutoConfig":
        """Build a Config from a source's config.json plus overrides.

        Precedence: explicit kwargs > config.json text-generation params >
        Config defaults. Unknown kwargs raise TypeError so typos don't
        silently vanish.
        """
        source = _ModelSource.open(
            model_path_or_repo_id,
            local_files_only=local_files_only,
            revision=revision,
        )
        raw = source.load_config_dict()

        config = Config()
        sampling = raw.get("task_specific_params", {}).get("text-generation", {})
        for key in _SAMPLING_KEYS:
            if sampling.get(key) is not None:
                setattr(config, key, sampling[key])
        for key, value in kwargs.items():
            if not hasattr(config, key):
                raise TypeError(
                    f"'{key}' is an invalid keyword argument for from_pretrained()"
                )
            setattr(config, key, value)

        return cls(config=config, model_type=raw.get("model_type"))


class AutoModelForCausalLM:
    @classmethod
    def from_pretrained(
        cls, model_path_or_repo_id: str, *,
        model_type: Optional[str] = None, model_file: Optional[str] = None,
        config: Optional[AutoConfig] = None, lib: Optional[str] = None,
        lora: Optional[str] = None, local_files_only: bool = False,
        revision: Optional[str] = None, hf: bool = False,
        kv_dtype: Optional[str] = None, progress_callback=None, **kwargs,
    ) -> LLM:
        """Resolve a local path / directory / Hub repo and load the model.

        Args:
            model_path_or_repo_id: Weight file, directory containing one,
                or a Hugging Face Hub repo id.
            model_type: Architecture name; inferred from config.json or
                file magic when omitted.
            model_file: Specific weight file inside a dir/repo (default:
                smallest one).
            config: Pre-built AutoConfig; built from the source otherwise.
            lib: Accepted for reference API compatibility; there are no
                CPU-ISA library variants on TPU so it is ignored.
            lora: Path to a ggla LoRA adapter applied at load time.
            local_files_only: Never hit the network; use cached files.
            revision: Hub branch / tag / commit to pin.
            hf: Return the 🤗 ``PreTrainedModel`` wrapper instead.
            kv_dtype: KV-cache storage type ("f32" | "bf16" | "int8").
            progress_callback: Called with a 0..1 fraction as weights
                load/repack (reference: llama_progress_callback).

        Returns:
            An ``LLM`` (or ``CTransformersModel`` when ``hf=True``).
        """
        # "gptq" anywhere in the source name routes to the GPTQ backend,
        # matching the reference's repo-name heuristic (ref hub.py:139).
        if model_type is None and "gptq" in str(model_path_or_repo_id).lower():
            model_type = "gptq"
        if model_type == "gptq":
            from . import gptq

            return gptq.AutoModelForCausalLM.from_pretrained(
                model_path_or_repo_id, local_files_only=local_files_only,
                revision=revision, **kwargs)

        if config is None:
            config = AutoConfig.from_pretrained(
                model_path_or_repo_id,
                local_files_only=local_files_only,
                revision=revision,
                **kwargs,
            )

        source = _ModelSource.open(
            model_path_or_repo_id,
            local_files_only=local_files_only,
            revision=revision,
        )
        llm = LLM(
            model_path=source.weight_file(model_file),
            model_type=model_type or config.model_type,
            config=config.config,
            lib=lib,
            lora=lora,
            kv_dtype=kv_dtype,
            progress_callback=progress_callback,
        )
        if not hf:
            return llm

        from .transformers import CTransformersConfig, CTransformersModel

        hf_config = CTransformersConfig(name_or_path=str(model_path_or_repo_id))
        return CTransformersModel(config=hf_config, llm=llm)


class AutoTokenizer:
    @classmethod
    def from_pretrained(cls, model):
        """Wrap the tokenizer of an ``hf=True`` model.

        Only the model-object form is supported (the vocabulary lives
        inside the loaded weight file, not in separate tokenizer files).
        """
        from .transformers import CTransformersModel, CTransformersTokenizer

        if not isinstance(model, CTransformersModel):
            raise TypeError(
                "AutoTokenizer.from_pretrained takes the model object itself:\n\n"
                "  model = AutoModelForCausalLM.from_pretrained(..., hf=True)\n"
                "  tokenizer = AutoTokenizer.from_pretrained(model)"
            )
        return CTransformersTokenizer(model._llm)
