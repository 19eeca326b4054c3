"""MPT loader (legacy GGML format; reference models/llms/mpt.cc).

hparams: d_model, max_seq_len, n_heads, n_layers, n_vocab,
alibi_bias_max (f32), clip_qkv (f32), ftype. Architecture: ALiBi position
bias (ggml_alibi, mpt.cc:464-469), optional QKV clamp (mpt.cc:411),
bias-free LayerNorm and projections, fused sequential [q|k|v], tied lm
head (wte). context_length overrides are clamped to max_seq_len
(mpt.cc:87).
"""

from __future__ import annotations

from .legacy_common import contiguous_groups, split_rows, weight
from ..formats.ggml_legacy import LegacyReader
from .spec import ArchSpec
from .vocab import Vocab


def load(path: str, context_length: int = -1):
    r = LegacyReader(path)
    d_model = r.read_i32()
    max_seq_len = r.read_i32()
    n_heads = r.read_i32()
    n_layers = r.read_i32()
    n_vocab = r.read_i32()
    alibi_bias_max = r.read_f32()
    clip_qkv = r.read_f32()
    r.read_i32()  # ftype
    # mpt.cc reads the vocab immediately (no repeated count, unlike gpt2),
    # and maps each UTF-8 token to raw bytes by truncating codepoints
    # (mpt.cc:106-110): byte-level-BPE pieces come back as real bytes
    raw = r.read_vocab(n_vocab)
    tokens = [
        bytes(ord(c) & 0xFF for c in t.decode("utf-8", errors="replace"))
        for t in raw
    ]
    r.index_tensors()

    n_ctx = max_seq_len
    if context_length > 0:
        n_ctx = min(max_seq_len, context_length)  # mpt.cc:87

    spec = ArchSpec(
        name="mpt",
        n_vocab=n_vocab,
        n_ctx=n_ctx,
        n_embd=d_model,
        n_head=n_heads,
        n_layer=n_layers,
        alibi_bias_max=alibi_bias_max,
        clip_qkv=max(clip_qkv, 0.0),
        norm="layernorm",
        act="gelu",
        tied_lm_head=True,
    )

    t = r.tensor_f32
    params = {
        "wte": t("transformer.wte.weight"),
        "ln_f_g": t("transformer.norm_f.weight"),
        "layers": [],
    }
    groups = contiguous_groups([d_model, d_model, d_model])
    for i in range(n_layers):
        p = f"transformer.blocks.{i}"
        wq, wk, wv = split_rows(r, f"{p}.attn.Wqkv.weight", groups)
        params["layers"].append(
            {
                "ln1_g": t(f"{p}.norm_1.weight"),
                "wq": wq,
                "wk": wk,
                "wv": wv,
                "wo": weight(r, f"{p}.attn.out_proj.weight"),
                "ln2_g": t(f"{p}.norm_2.weight"),
                "w_up": weight(r, f"{p}.ffn.up_proj.weight"),
                "w_down": weight(r, f"{p}.ffn.down_proj.weight"),
            }
        )
    return spec, params, Vocab(tokens)


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
