"""Replit loader (legacy GGML format; reference models/llms/replit.cc).

hparams: d_model, max_seq_len, n_heads, n_layers, n_vocab, ftype.
MPT-style architecture (ALiBi bias_max=8.0, replit.cc:518-523; bias-free)
with its own unigram/SentencePiece tokenizer: the vocab stores (piece,
score) pairs consumed by a Viterbi segmentation (replit.cc:57-127).
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
    r.read_i32()  # ftype
    raw_tokens, scores = r.read_vocab(n_vocab, scores=True)
    r.index_tensors()

    n_ctx = max_seq_len
    if context_length > 0:
        n_ctx = min(max_seq_len, context_length)

    spec = ArchSpec(
        name="replit",
        n_vocab=n_vocab,
        n_ctx=n_ctx,
        n_embd=d_model,
        n_head=n_heads,
        n_layer=n_layers,
        alibi_bias_max=8.0,  # replit.cc:519
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
    pieces = [tok.decode("utf-8", errors="replace") for tok in raw_tokens]
    return spec, params, pieces, scores


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.unigram import UnigramTokenizer, WS
    from .registry import ModelBundle

    spec, params, pieces, scores = load(path, context_length)
    tokenizer = UnigramTokenizer(pieces, scores)
    # detokenized bytes (with WS -> space) back the Vocab EOS lookups
    vocab = Vocab([p.replace(WS, " ").encode("utf-8") for p in pieces])
    return ModelBundle(spec, params, vocab, tokenizer)
