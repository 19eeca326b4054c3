"""Model-type dispatch (mirrors the reference C dispatcher, llm.cc:36-76).

Model type strings are normalized by dropping non-alphanumerics, then mapped
to a loader. GGUF files override the requested type (llm.cc:45).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple

from ..utils import is_gguf
from .spec import ArchSpec
from .vocab import Vocab

# loader: (path, context_length, gpu-ish kwargs) -> (spec, params, vocab)
LoaderFn = Callable[..., Tuple[ArchSpec, dict, Vocab]]

_LOADERS: Dict[str, str] = {}  # normalized type -> module name


def normalize_type(model_type: str) -> str:
    return "".join(c for c in model_type if c.isalnum()).lower()


def register(name: str, module: str) -> None:
    _LOADERS[name] = module


register("gpt2", "gpt2")
register("gptj", "gptj")
register("gptneox", "gpt_neox")
register("dollyv2", "dolly")
register("mpt", "mpt")
register("replit", "replit")
register("starcoder", "starcoder")
register("gptbigcode", "starcoder")
register("gguf", "llama_gguf")
register("llama", "llama_gguf")  # legacy GGJT handled inside the loader
register("falcon", "falcon")  # GGUF via llama_gguf; GGCC via falcon_ggcc


@dataclass
class ModelBundle:
    spec: ArchSpec
    params: dict
    vocab: Vocab
    tokenizer: object
    architecture: str = ""  # GGUF-reported arch (llama.cc:43-45)
    sampler: str = "gpt"  # "gpt" | "llama"
    supports_embeddings: bool = False
    scores: object = None


def load_model(
    model_path: str,
    model_type: str,
    context_length: int = -1,
    progress_callback=None,
) -> ModelBundle:
    """`progress_callback(fraction)` mirrors the reference's loader hook
    (llama_progress_callback, llama.h:139-142); loaders that don't report
    progress call it once at completion."""
    import importlib
    import inspect

    mtype = normalize_type(model_type or "")
    if mtype != "gguf" and is_gguf(model_path):
        mtype = "gguf"  # GGUF magic overrides the requested type
    if mtype not in _LOADERS:
        raise ValueError(f"Model type '{model_type}' is not supported.")

    # repack cache — the reference's mmap analog (llama.cpp:470-798): a
    # warm load mmaps the previously repacked planes instead of
    # re-parsing + re-decoding the quant blocks (formats/repack_cache.py)
    from ..formats import repack_cache

    cached = repack_cache.lookup(model_path, context_length)
    if cached is not None:
        if progress_callback is not None:
            progress_callback(1.0)
        return cached

    module = importlib.import_module(f".{_LOADERS[mtype]}", __package__)
    if progress_callback is not None and (
        "progress_callback" in inspect.signature(module.load_bundle).parameters
    ):
        bundle = module.load_bundle(
            model_path, context_length, progress_callback=progress_callback
        )
    else:
        bundle = module.load_bundle(model_path, context_length)
        if progress_callback is not None:
            progress_callback(1.0)
    repack_cache.store_async(model_path, context_length, bundle)
    return bundle
