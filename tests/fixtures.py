"""Synthetic tiny-model builders for every supported architecture.

There is no network egress in CI, so instead of downloading models we write
random-weight models in the exact on-disk formats the loaders consume, then
(in parity tests) feed the same file to the reference engine's precompiled
binary and compare logits.
"""

from __future__ import annotations

import numpy as np

from ctransformers_tpu.formats.ggml_legacy import LegacyWriter
from ctransformers_tpu.formats.quants import GGMLType, quantize

# ftype codes (ggml.h:319-334)
FTYPE_F32 = 0
FTYPE_F16 = 1
FTYPE_Q4_0 = 2
FTYPE_Q8_0 = 7
FTYPE_Q4_K = 12

_FTYPE_TO_TYPE = {
    FTYPE_F32: GGMLType.F32,
    FTYPE_F16: GGMLType.F16,
    FTYPE_Q4_0: GGMLType.Q4_0,
    FTYPE_Q8_0: GGMLType.Q8_0,
    FTYPE_Q4_K: GGMLType.Q4_K,
}


def make_vocab(n_vocab: int):
    """Simple single/multi-char word vocab usable by the greedy tokenizer."""
    toks = []
    letters = "abcdefghijklmnopqrstuvwxyz"
    toks.append("<|endoftext|>")
    for c in letters:
        toks.append(c)
    for c in letters:
        toks.append(" " + c)
    words = ["the", " the", " hello", " world", " big", " cat", "ing", "er", " a", " is"]
    toks.extend(words)
    i = 0
    while len(toks) < n_vocab:
        toks.append(f"<unused{i}>")
        i += 1
    return toks[:n_vocab]


def _w(rng, *shape, scale=0.08):
    return (rng.randn(*shape) * scale).astype(np.float32)


def _enc(x: np.ndarray, t: GGMLType) -> bytes:
    return bytes(quantize(x, t))


def build_gpt2(
    path: str,
    n_vocab: int = 96,
    n_ctx: int = 64,
    n_embd: int = 32,
    n_head: int = 4,
    n_layer: int = 2,
    ftype: int = FTYPE_F32,
    seed: int = 0,
    lm_head: bool = False,
) -> dict:
    """Write a tiny GPT-2 in the legacy GGML format (gpt2.cc layout)."""
    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    with LegacyWriter(path) as w:
        for v in (n_vocab, n_ctx, n_embd, n_head, n_layer):
            w.write_i32(v)
        w.write_ftype(ftype)
        w.write_i32(n_vocab)  # vocab section repeats the count (gpt2.cc:97-99)
        w.write_vocab(make_vocab(n_vocab))

        def wt(name, arr, t):
            # arr is (out, in) row-major = GGML ne (in, out)
            ne = tuple(reversed(arr.shape))
            w.write_tensor(name, t, ne, _enc(arr, t))

        wt("model/ln_f/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt("model/ln_f/b", _w(rng, n_embd), GGMLType.F32)
        wt("model/wte", _w(rng, n_vocab, n_embd), wtype)
        wt("model/wpe", _w(rng, n_ctx, n_embd), GGMLType.F32)
        if lm_head:
            wt("model/lm_head", _w(rng, n_vocab, n_embd), wtype)
        for i in range(n_layer):
            p = f"model/h{i}"
            wt(f"{p}/ln_1/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}/ln_1/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/ln_2/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}/ln_2/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/attn/c_attn/w", _w(rng, 3 * n_embd, n_embd), wtype)
            wt(f"{p}/attn/c_attn/b", _w(rng, 3 * n_embd), GGMLType.F32)
            wt(f"{p}/attn/c_proj/w", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}/attn/c_proj/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/mlp/c_fc/w", _w(rng, 4 * n_embd, n_embd), wtype)
            wt(f"{p}/mlp/c_fc/b", _w(rng, 4 * n_embd), GGMLType.F32)
            wt(f"{p}/mlp/c_proj/w", _w(rng, n_embd, 4 * n_embd), wtype)
            wt(f"{p}/mlp/c_proj/b", _w(rng, n_embd), GGMLType.F32)
    return dict(
        n_vocab=n_vocab, n_ctx=n_ctx, n_embd=n_embd, n_head=n_head, n_layer=n_layer
    )


# -- reference engine handle --------------------------------------------------

REF_LIB = "/root/reference/ctransformers/lib/basic/libctransformers.so"


def ref_llm(model_path: str, model_type: str, **config):
    """Instantiate the reference engine (precompiled binary) on a model file.

    Returns None when unavailable (missing lib or incompatible platform).
    """
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from ctransformers import LLM as RefLLM
        from ctransformers import Config as RefConfig
    except Exception:
        return None
    import os

    if not os.path.exists(REF_LIB):
        return None
    cfg = RefConfig(**config) if config else None
    try:
        return RefLLM(model_path, model_type=model_type, config=cfg, lib=REF_LIB)
    except Exception:
        return None
