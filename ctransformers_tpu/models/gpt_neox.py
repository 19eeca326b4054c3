"""GPT-NeoX loader (legacy GGML format; reference models/llms/gpt-neox.cc).

hparams: n_vocab, n_ctx, n_embd, n_head, n_layer, n_rot, par_res, ftype.
Architecture: partial neox RoPE over n_rot dims (mode 2, gpt-neox.cc:
509-510), fused per-head-interleaved QKV with biases (views at 440-470),
separate input/post-attention LayerNorms, `par_res` selects parallel vs
sequential residual (gpt-neox.cc:592), GELU, untied embed_out head.
"""

from __future__ import annotations

from .legacy_common import per_head_qkv_groups, split_rows, weight
from ..formats.ggml_legacy import LegacyReader
from .spec import ArchSpec
from .vocab import Vocab


def load(path: str, context_length: int = -1, name: str = "gptneox"):
    r = LegacyReader(path)
    n_vocab = r.read_i32()
    n_ctx = r.read_i32()
    n_embd = r.read_i32()
    n_head = r.read_i32()
    n_layer = r.read_i32()
    n_rot = r.read_i32()
    par_res = r.read_i32()
    r.read_i32()  # ftype
    if r.read_i32() != n_vocab:
        raise ValueError("vocab size mismatch")
    tokens = r.read_vocab(n_vocab)
    r.index_tensors()

    spec = ArchSpec(
        name=name,
        n_vocab=n_vocab,
        n_ctx=context_length if context_length > 0 else n_ctx,
        n_embd=n_embd,
        n_head=n_head,
        n_layer=n_layer,
        rope_mode="neox",
        n_rot=n_rot,
        norm="layernorm",
        parallel_residual=bool(par_res),
        shared_parallel_ln=False,
        act="gelu",
    )

    t = r.tensor_f32
    params = {
        "wte": t("gpt_neox.embed_in.weight"),
        "ln_f_g": t("gpt_neox.final_layer_norm.weight"),
        "ln_f_b": t("gpt_neox.final_layer_norm.bias"),
        "lm_head": weight(r, "embed_out.weight"),
        "layers": [],
    }
    dh = n_embd // n_head
    groups = per_head_qkv_groups(n_head, dh)
    for i in range(n_layer):
        p = f"gpt_neox.layers.{i}"
        wq, wk, wv = split_rows(r, f"{p}.attention.query_key_value.weight", groups)
        bqkv = t(f"{p}.attention.query_key_value.bias")
        params["layers"].append(
            {
                "ln1_g": t(f"{p}.input_layernorm.weight"),
                "ln1_b": t(f"{p}.input_layernorm.bias"),
                "ln2_g": t(f"{p}.post_attention_layernorm.weight"),
                "ln2_b": t(f"{p}.post_attention_layernorm.bias"),
                "wq": wq,
                "wk": wk,
                "wv": wv,
                "bq": bqkv[groups[0]].copy(),
                "bk": bqkv[groups[1]].copy(),
                "bv": bqkv[groups[2]].copy(),
                "wo": weight(r, f"{p}.attention.dense.weight"),
                "bo": t(f"{p}.attention.dense.bias"),
                "w_up": weight(r, f"{p}.mlp.dense_h_to_4h.weight"),
                "b_up": t(f"{p}.mlp.dense_h_to_4h.bias"),
                "w_down": weight(r, f"{p}.mlp.dense_4h_to_h.weight"),
                "b_down": t(f"{p}.mlp.dense_4h_to_h.bias"),
            }
        )
    return spec, params, Vocab(tokens)


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
