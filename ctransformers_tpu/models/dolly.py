"""Dolly-V2 loader — a GPT-NeoX variant (reference models/llms/dolly.cc:
same hparams/tensors as gpt-neox, n_rot = 25%% rotary, "### End" EOS
handled by the base-class special-token path, llm.h:83-87)."""

from __future__ import annotations

from . import gpt_neox


def load(path: str, context_length: int = -1):
    return gpt_neox.load(path, context_length, name="dollyv2")


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    # dolly.cc:121-123; "### End" doubles as EOS via llm.h:83-87
    for tok in ("### End", "### Instruction:", "### Response:"):
        vocab.add_special_token(tok)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
