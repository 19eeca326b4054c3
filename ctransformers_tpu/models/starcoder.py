"""StarCoder / GPT-BigCode loader (legacy GGML; models/llms/starcoder.cc).

GPT-2-style layout (model/* tensor names, learned positions, fused
c_attn) sized for MQA: c_attn produces n_embd + 2*kv_dim rows where
kv_dim = kv_heads*head_dim (starcoder.cc:162-164). In distributed files
kv_heads == n_head (MQA weights are pre-expanded at conversion,
starcoder.cc:163 comment), so the split is [D | D | D] like GPT-2 but the
spec keeps the general form. StarChat's "<|end|>" EOS and chat specials
come from the vocab (starcoder.cc:125-138, llm.h:83-87).
"""

from __future__ import annotations

from .legacy_common import contiguous_groups, split_rows, weight
from ..formats.ggml_legacy import LegacyReader
from .spec import ArchSpec
from .vocab import Vocab

_SPECIALS = [
    "<|system|>",
    "<|user|>",
    "<|assistant|>",
    "<|end|>",
    "<fim-prefix>",
    "<fim-middle>",
    "<fim-suffix>",
    "<fim-pad>",
    "<|end_of_turn|>",
]


def load(path: str, context_length: int = -1):
    r = LegacyReader(path)
    n_vocab = r.read_i32()
    n_ctx = r.read_i32()
    n_embd = r.read_i32()
    n_head = r.read_i32()
    n_layer = r.read_i32()
    r.read_i32()  # ftype
    if r.read_i32() != n_vocab:
        raise ValueError("vocab size mismatch")
    tokens = r.read_vocab(n_vocab)
    r.index_tensors()

    head_dim = n_embd // n_head
    # infer kv_heads from the fused c_attn row count (n_embd + 2*kv_dim)
    qkv_rows = r.tensors["model/h0/attn/c_attn/w"].numpy_shape[0]
    kv_dim = (qkv_rows - n_embd) // 2
    kv_heads = max(1, kv_dim // head_dim)

    spec = ArchSpec(
        name="starcoder",
        n_vocab=n_vocab,
        n_ctx=context_length if context_length > 0 else n_ctx,
        n_embd=n_embd,
        n_head=n_head,
        n_layer=n_layer,
        n_head_kv=kv_heads,
        learned_pos=True,
        norm="layernorm",
        act="gelu",
    )

    t = r.tensor_f32
    params = {
        "wte": t("model/wte"),
        "wpe": t("model/wpe"),
        "ln_f_g": t("model/ln_f/g"),
        "ln_f_b": t("model/ln_f/b"),
        "lm_head": (
            weight(r, "model/lm_head")
            if "model/lm_head" in r.tensors
            else t("model/wte").T.copy()
        ),
        "layers": [],
    }
    groups = contiguous_groups([n_embd, kv_dim, kv_dim])
    for i in range(n_layer):
        p = f"model/h{i}"
        wq, wk, wv = split_rows(r, f"{p}/attn/c_attn/w", groups)
        bqkv = t(f"{p}/attn/c_attn/b")
        params["layers"].append(
            {
                "ln1_g": t(f"{p}/ln_1/g"),
                "ln1_b": t(f"{p}/ln_1/b"),
                "ln2_g": t(f"{p}/ln_2/g"),
                "ln2_b": t(f"{p}/ln_2/b"),
                "wq": wq,
                "wk": wk,
                "wv": wv,
                "bq": bqkv[:n_embd].copy(),
                "bk": bqkv[n_embd : n_embd + kv_dim].copy(),
                "bv": bqkv[n_embd + kv_dim :].copy(),
                "wo": weight(r, f"{p}/attn/c_proj/w"),
                "bo": t(f"{p}/attn/c_proj/b"),
                "w_up": weight(r, f"{p}/mlp/c_fc/w"),
                "b_up": t(f"{p}/mlp/c_fc/b"),
                "w_down": weight(r, f"{p}/mlp/c_proj/w"),
                "b_down": t(f"{p}/mlp/c_proj/b"),
            }
        )
    vocab = Vocab(tokens)
    for tok in _SPECIALS:
        if vocab.lookup(tok) is not None:
            vocab.add_special_token(tok)
    return spec, params, vocab


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
