"""GPT-J loader (legacy GGML format; reference models/llms/gptj.cc).

hparams: n_vocab, n_ctx, n_embd, n_head, n_layer, n_rot, ftype (gptj.cc
loader). Architecture: parallel residual with one shared LayerNorm feeding
both attention and MLP (gptj.cc:554-558), partial interleaved RoPE over
n_rot dims (ggml_rope_inplace mode 0, gptj.cc:448-455), split q/k/v with no
biases, GELU MLP with biases, separate lm_head WITH bias (lmh_g/lmh_b).
"""

from __future__ import annotations

from .legacy_common import weight
from ..formats.ggml_legacy import LegacyReader
from .spec import ArchSpec
from .vocab import Vocab


def load(path: str, context_length: int = -1):
    r = LegacyReader(path)
    n_vocab = r.read_i32()
    n_ctx = r.read_i32()
    n_embd = r.read_i32()
    n_head = r.read_i32()
    n_layer = r.read_i32()
    n_rot = r.read_i32()
    r.read_i32()  # ftype
    if r.read_i32() != n_vocab:
        raise ValueError("vocab size mismatch")
    tokens = r.read_vocab(n_vocab)
    r.index_tensors()

    spec = ArchSpec(
        name="gptj",
        n_vocab=n_vocab,
        n_ctx=context_length if context_length > 0 else n_ctx,
        n_embd=n_embd,
        n_head=n_head,
        n_layer=n_layer,
        rope_mode="interleaved",
        n_rot=n_rot,
        norm="layernorm",
        parallel_residual=True,
        shared_parallel_ln=True,
        act="gelu",
    )

    t = r.tensor_f32
    params = {
        "wte": t("transformer.wte.weight"),
        "ln_f_g": t("transformer.ln_f.weight"),
        "ln_f_b": t("transformer.ln_f.bias"),
        "lm_head": weight(r, "lm_head.weight"),
        "lm_head_b": t("lm_head.bias"),
        "layers": [],
    }
    for i in range(n_layer):
        p = f"transformer.h.{i}"
        params["layers"].append(
            {
                "ln1_g": t(f"{p}.ln_1.weight"),
                "ln1_b": t(f"{p}.ln_1.bias"),
                "wq": weight(r, f"{p}.attn.q_proj.weight"),
                "wk": weight(r, f"{p}.attn.k_proj.weight"),
                "wv": weight(r, f"{p}.attn.v_proj.weight"),
                "wo": weight(r, f"{p}.attn.out_proj.weight"),
                "w_up": weight(r, f"{p}.mlp.fc_in.weight"),
                "b_up": t(f"{p}.mlp.fc_in.bias"),
                "w_down": weight(r, f"{p}.mlp.fc_out.weight"),
                "b_down": t(f"{p}.mlp.fc_out.bias"),
            }
        )
    return spec, params, Vocab(tokens)


def load_bundle(path: str, context_length: int = -1):
    from ..tokenizers.greedy import GreedyTokenizer
    from .registry import ModelBundle

    spec, params, vocab = load(path, context_length)
    return ModelBundle(spec, params, vocab, GreedyTokenizer(vocab))
