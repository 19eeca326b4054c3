"""GPT-2 model loader (legacy GGML examples format).

File layout per the reference loader (models/llms/gpt2.cc:61-381):
hparams {n_vocab, n_ctx, n_embd, n_head, n_layer, ftype}, vocab, tensors
named model/wte, model/wpe, model/lm_head, model/ln_f/{g,b},
model/h{i}/{ln_1,ln_2}/{g,b}, model/h{i}/attn/{c_attn,c_proj}/{w,b},
model/h{i}/mlp/{c_fc,c_proj}/{w,b}. WTE doubles as the LM head unless a
model/lm_head tensor is present (gpt2.cc:366-371).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..formats.ggml_legacy import LegacyReader
from .spec import ArchSpec
from .vocab import Vocab


def load(path: str, context_length: int = -1) -> Tuple[ArchSpec, dict, Vocab]:
    r = LegacyReader(path)
    n_vocab = r.read_i32()
    n_ctx = r.read_i32()
    n_embd = r.read_i32()
    n_head = r.read_i32()
    n_layer = r.read_i32()
    r.read_i32()  # ftype (per-tensor types are authoritative)
    if r.read_i32() != n_vocab:  # vocab section repeats the count
        raise ValueError("vocab size mismatch")
    tokens = r.read_vocab(n_vocab)
    r.index_tensors()

    spec = ArchSpec(
        name="gpt2",
        n_vocab=n_vocab,
        n_ctx=context_length if context_length > 0 else n_ctx,
        n_embd=n_embd,
        n_head=n_head,
        n_layer=n_layer,
        learned_pos=True,
        norm="layernorm",
        norm_eps=1e-5,
        act="gelu",
    )

    t = r.tensor_f32
    params = {
        "wte": t("model/wte"),
        "wpe": t("model/wpe"),
        "ln_f_g": t("model/ln_f/g"),
        "ln_f_b": t("model/ln_f/b"),
        "lm_head": (
            t("model/lm_head") if "model/lm_head" in r.tensors else t("model/wte")
        ).T.copy(),
        "layers": [],
    }
    d = n_embd
    for i in range(n_layer):
        p = f"model/h{i}"
        wqkv = t(f"{p}/attn/c_attn/w").T  # (D, 3D); rows q|k|v in file order
        bqkv = t(f"{p}/attn/c_attn/b")
        params["layers"].append(
            {
                "ln1_g": t(f"{p}/ln_1/g"),
                "ln1_b": t(f"{p}/ln_1/b"),
                "ln2_g": t(f"{p}/ln_2/g"),
                "ln2_b": t(f"{p}/ln_2/b"),
                "wq": wqkv[:, 0:d].copy(),
                "wk": wqkv[:, d : 2 * d].copy(),
                "wv": wqkv[:, 2 * d : 3 * d].copy(),
                "bq": bqkv[0:d].copy(),
                "bk": bqkv[d : 2 * d].copy(),
                "bv": bqkv[2 * d : 3 * d].copy(),
                "wo": t(f"{p}/attn/c_proj/w").T.copy(),
                "bo": t(f"{p}/attn/c_proj/b"),
                "w_up": t(f"{p}/mlp/c_fc/w").T.copy(),
                "b_up": t(f"{p}/mlp/c_fc/b"),
                "w_down": t(f"{p}/mlp/c_proj/w").T.copy(),
                "b_down": t(f"{p}/mlp/c_proj/b"),
            }
        )

    vocab = Vocab(tokens)
    return spec, params, vocab


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
