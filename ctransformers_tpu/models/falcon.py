"""Falcon dispatch: GGUF files take the shared llama_gguf path; pre-GGUF
ggllm containers (GGCC v10 / falcon-GGJT) take the falcon_ggcc loader —
mirroring the reference's falcon adapter, which hands every falcon file
to libfalcon (models/llms/falcon.cc:85) with its own magic table."""

from __future__ import annotations


def load_bundle(path: str, context_length: int = -1, **kwargs):
    from ..utils import is_gguf

    if is_gguf(path):
        from . import llama_gguf

        return llama_gguf.load_bundle(path, context_length, **kwargs)
    from . import falcon_ggcc

    return falcon_ggcc.load_bundle(path, context_length)
