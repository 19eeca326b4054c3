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


# -- GGUF model builders ------------------------------------------------------

from ctransformers_tpu.formats.gguf import write_gguf


def make_spm_vocab():
    """Tiny SPM vocab: specials + 256 byte tokens + scored word pieces."""
    pieces, scores, types = [], [], []

    def add(p, s, t):
        pieces.append(p)
        scores.append(float(s))
        types.append(t)

    add("<unk>", 0.0, 2)
    add("<s>", 0.0, 3)
    add("</s>", 0.0, 3)
    for b in range(256):
        add(f"<0x{b:02X}>", 0.0, 6)
    words = []
    letters = "abcdefghijklmnopqrstuvwxyz"
    for c in letters:
        words.append(c)
    for c in letters:
        words.append("▁" + c)
    words += [
        "▁", "he", "ll", "lo", "el", "hell", "hello", "▁hello",
        "wo", "or", "ld", "wor", "world", "▁world", "th", "the",
        "▁the", "ing", "er", "▁a", "▁is",
    ]
    for i, w in enumerate(words):
        add(w, -float(i) / 10.0 - 1.0, 1)
    return pieces, scores, types


_BPE_MERGE_PAIRS = [
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d"),
    (" ", "t"), (" t", "h"), (" th", "e"),
]


def make_bpe_vocab():
    """Tiny BPE vocab + merges (falcon-style 'gpt2' tokenizer model)."""
    pieces = ["<|endoftext|>"] * 1  # id 0 unused filler
    pieces = ["<pad>"] * 11 + ["<|endoftext|>"]  # eos/bos = 11 (reference default)
    chars = list("abcdefghijklmnopqrstuvwxyz ") + ["\n"]
    merge_pairs = _BPE_MERGE_PAIRS
    pieces += chars
    for l, r in merge_pairs:
        pieces.append(l + r)
    merges = [f"{l} {r}" for l, r in merge_pairs]
    types = [1] * len(pieces)
    scores = [0.0] * len(pieces)
    return pieces, scores, types, merges


def build_llama_gguf(
    path: str,
    n_ctx: int = 64,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_layer: int = 2,
    n_ff: int = 96,
    wtype: GGMLType = GGMLType.F32,
    seed: int = 0,
) -> dict:
    """Write a tiny llama GGUF readable by BOTH engines."""
    rng = np.random.RandomState(seed)
    pieces, scores, types = make_spm_vocab()
    n_vocab = len(pieces)
    dh = n_embd // n_head

    kv = {
        "general.architecture": "llama",
        "general.name": "tiny-llama-test",
        "general.quantization_version": 2,
        "llama.context_length": n_ctx,
        "llama.embedding_length": n_embd,
        "llama.block_count": n_layer,
        "llama.feed_forward_length": n_ff,
        "llama.attention.head_count": n_head,
        "llama.attention.head_count_kv": n_head_kv,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.rope.dimension_count": dh,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": pieces,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
    }

    tensors = {}

    def wt(name, arr, t):
        ne = tuple(reversed(arr.shape))
        tensors[name] = (t, ne, _enc(arr, t))

    wt("token_embd.weight", _w(rng, n_vocab, n_embd), GGMLType.F32)
    wt("output_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
    wt("output.weight", _w(rng, n_vocab, n_embd), wtype)
    for i in range(n_layer):
        p = f"blk.{i}"
        wt(f"{p}.attn_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt(f"{p}.attn_q.weight", _w(rng, n_head * dh, n_embd), wtype)
        wt(f"{p}.attn_k.weight", _w(rng, n_head_kv * dh, n_embd), wtype)
        wt(f"{p}.attn_v.weight", _w(rng, n_head_kv * dh, n_embd), wtype)
        wt(f"{p}.attn_output.weight", _w(rng, n_embd, n_head * dh), wtype)
        wt(f"{p}.ffn_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt(f"{p}.ffn_gate.weight", _w(rng, n_ff, n_embd), wtype)
        wt(f"{p}.ffn_up.weight", _w(rng, n_ff, n_embd), wtype)
        wt(f"{p}.ffn_down.weight", _w(rng, n_embd, n_ff), wtype)

    write_gguf(path, kv, tensors)
    return dict(n_vocab=n_vocab, n_ctx=n_ctx)


def build_falcon_gguf(
    path: str,
    n_ctx: int = 64,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 1,
    n_layer: int = 2,
    n_ff: int = 128,
    wtype: GGMLType = GGMLType.F32,
    norm2: bool = False,
    seed: int = 0,
) -> dict:
    """Write a tiny falcon GGUF (MQA by default, 40B-style with norm2)."""
    rng = np.random.RandomState(seed)
    pieces, scores, types, merges = make_bpe_vocab()
    n_vocab = len(pieces)
    dh = n_embd // n_head

    kv = {
        "general.architecture": "falcon",
        "general.name": "tiny-falcon-test",
        "general.quantization_version": 2,
        "falcon.context_length": n_ctx,
        "falcon.embedding_length": n_embd,
        "falcon.block_count": n_layer,
        "falcon.feed_forward_length": n_ff,
        "falcon.attention.head_count": n_head,
        "falcon.attention.head_count_kv": n_head_kv,
        "falcon.attention.layer_norm_epsilon": 1e-5,
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": pieces,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.merges": merges,
    }

    tensors = {}

    def wt(name, arr, t):
        ne = tuple(reversed(arr.shape))
        tensors[name] = (t, ne, _enc(arr, t))

    wt("token_embd.weight", _w(rng, n_vocab, n_embd), GGMLType.F32)
    wt("output_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
    wt("output_norm.bias", _w(rng, n_embd), GGMLType.F32)
    wt("output.weight", _w(rng, n_vocab, n_embd), wtype)
    qkv_rows = (n_head + 2 * n_head_kv) * dh
    for i in range(n_layer):
        p = f"blk.{i}"
        wt(f"{p}.attn_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt(f"{p}.attn_norm.bias", _w(rng, n_embd), GGMLType.F32)
        if norm2:
            wt(f"{p}.attn_norm_2.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.attn_norm_2.bias", _w(rng, n_embd), GGMLType.F32)
        wt(f"{p}.attn_qkv.weight", _w(rng, qkv_rows, n_embd), wtype)
        wt(f"{p}.attn_output.weight", _w(rng, n_embd, n_head * dh), wtype)
        wt(f"{p}.ffn_up.weight", _w(rng, n_ff, n_embd), wtype)
        wt(f"{p}.ffn_down.weight", _w(rng, n_embd, n_ff), wtype)

    write_gguf(path, kv, tensors)
    return dict(n_vocab=n_vocab, n_ctx=n_ctx)


# -- legacy example-model builders (gptj/neox/dolly/mpt/replit/starcoder) ----


def build_gptj(
    path, n_vocab=96, n_ctx=64, n_embd=32, n_head=4, n_layer=2,
    n_rot=8, ftype=FTYPE_F32, seed=0,
):
    """gptj.cc layout: split q/k/v without biases, lm_head with bias."""
    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    with LegacyWriter(path) as w:
        for v in (n_vocab, n_ctx, n_embd, n_head, n_layer, n_rot):
            w.write_i32(v)
        w.write_ftype(ftype)
        w.write_i32(n_vocab)
        w.write_vocab(make_vocab(n_vocab))

        def wt(name, arr, t):
            w.write_tensor(name, t, tuple(reversed(arr.shape)), _enc(arr, t))

        wt("transformer.wte.weight", _w(rng, n_vocab, n_embd), wtype)
        wt("transformer.ln_f.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt("transformer.ln_f.bias", _w(rng, n_embd), GGMLType.F32)
        wt("lm_head.weight", _w(rng, n_vocab, n_embd), wtype)
        wt("lm_head.bias", _w(rng, n_vocab), GGMLType.F32)
        for i in range(n_layer):
            p = f"transformer.h.{i}"
            wt(f"{p}.ln_1.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.ln_1.bias", _w(rng, n_embd), GGMLType.F32)
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                wt(f"{p}.attn.{proj}.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.mlp.fc_in.weight", _w(rng, 4 * n_embd, n_embd), wtype)
            wt(f"{p}.mlp.fc_in.bias", _w(rng, 4 * n_embd), GGMLType.F32)
            wt(f"{p}.mlp.fc_out.weight", _w(rng, n_embd, 4 * n_embd), wtype)
            wt(f"{p}.mlp.fc_out.bias", _w(rng, n_embd), GGMLType.F32)


def build_gpt_neox(
    path, n_vocab=96, n_ctx=64, n_embd=32, n_head=4, n_layer=2,
    n_rot=4, par_res=1, ftype=FTYPE_F32, seed=0,
):
    """gpt-neox.cc layout (also dolly): fused per-head QKV with biases."""
    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    with LegacyWriter(path) as w:
        for v in (n_vocab, n_ctx, n_embd, n_head, n_layer, n_rot, par_res):
            w.write_i32(v)
        w.write_ftype(ftype)
        w.write_i32(n_vocab)
        w.write_vocab(make_vocab(n_vocab))

        def wt(name, arr, t):
            w.write_tensor(name, t, tuple(reversed(arr.shape)), _enc(arr, t))

        wt("gpt_neox.embed_in.weight", _w(rng, n_vocab, n_embd), wtype)
        wt("gpt_neox.final_layer_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt("gpt_neox.final_layer_norm.bias", _w(rng, n_embd), GGMLType.F32)
        wt("embed_out.weight", _w(rng, n_vocab, n_embd), wtype)
        for i in range(n_layer):
            p = f"gpt_neox.layers.{i}"
            wt(f"{p}.input_layernorm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.input_layernorm.bias", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}.post_attention_layernorm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.post_attention_layernorm.bias", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}.attention.query_key_value.weight", _w(rng, 3 * n_embd, n_embd), wtype)
            wt(f"{p}.attention.query_key_value.bias", _w(rng, 3 * n_embd), GGMLType.F32)
            wt(f"{p}.attention.dense.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.attention.dense.bias", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}.mlp.dense_h_to_4h.weight", _w(rng, 4 * n_embd, n_embd), wtype)
            wt(f"{p}.mlp.dense_h_to_4h.bias", _w(rng, 4 * n_embd), GGMLType.F32)
            wt(f"{p}.mlp.dense_4h_to_h.weight", _w(rng, n_embd, 4 * n_embd), wtype)
            wt(f"{p}.mlp.dense_4h_to_h.bias", _w(rng, n_embd), GGMLType.F32)


def build_mpt(
    path, n_vocab=96, max_seq_len=64, d_model=32, n_heads=4, n_layers=2,
    alibi_bias_max=8.0, clip_qkv=0.0, ftype=FTYPE_F32, seed=0,
):
    """mpt.cc layout: bias-free, fused [q|k|v], tied head, ALiBi."""
    import struct as _s

    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    with LegacyWriter(path) as w:
        for v in (d_model, max_seq_len, n_heads, n_layers, n_vocab):
            w.write_i32(v)
        w._f.write(_s.pack("<f", alibi_bias_max))
        w._f.write(_s.pack("<f", clip_qkv))
        w.write_ftype(ftype)
        # mpt.cc reads the vocab without a repeated count (mpt.cc:95-114)
        w.write_vocab(make_vocab(n_vocab))

        def wt(name, arr, t):
            w.write_tensor(name, t, tuple(reversed(arr.shape)), _enc(arr, t))

        wt("transformer.wte.weight", _w(rng, n_vocab, d_model), wtype)
        wt("transformer.norm_f.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
        for i in range(n_layers):
            p = f"transformer.blocks.{i}"
            wt(f"{p}.norm_1.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
            wt(f"{p}.attn.Wqkv.weight", _w(rng, 3 * d_model, d_model), wtype)
            wt(f"{p}.attn.out_proj.weight", _w(rng, d_model, d_model), wtype)
            wt(f"{p}.norm_2.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
            wt(f"{p}.ffn.up_proj.weight", _w(rng, 4 * d_model, d_model), wtype)
            wt(f"{p}.ffn.down_proj.weight", _w(rng, d_model, 4 * d_model), wtype)


def make_replit_vocab(n_vocab):
    pieces = ["<|endoftext|>"]
    scores = [0.0]
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = []
    for c in letters:
        words.append(c)
    for c in letters:
        words.append("▁" + c)
    words += ["▁hello", "▁world", "he", "ll", "lo", "or", "ld",
              "▁the", "ing", "er"]
    i = 0
    while len(pieces) + len(words) < n_vocab:
        words.append(f"<unused{i}>")
        i += 1
    for j, wrd in enumerate(words[: n_vocab - 1]):
        pieces.append(wrd)
        scores.append(-1.0 - j / 10.0)
    return pieces, scores


def build_replit(
    path, n_vocab=96, max_seq_len=64, d_model=32, n_heads=4, n_layers=2,
    ftype=FTYPE_F32, seed=0,
):
    """replit.cc layout: MPT-style weights + scored unigram vocab."""
    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    pieces, scores = make_replit_vocab(n_vocab)
    with LegacyWriter(path) as w:
        for v in (d_model, max_seq_len, n_heads, n_layers, n_vocab):
            w.write_i32(v)
        w.write_ftype(ftype)
        w.write_vocab(pieces, scores=scores)

        def wt(name, arr, t):
            w.write_tensor(name, t, tuple(reversed(arr.shape)), _enc(arr, t))

        wt("transformer.wte.weight", _w(rng, n_vocab, d_model), wtype)
        wt("transformer.norm_f.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
        for i in range(n_layers):
            p = f"transformer.blocks.{i}"
            wt(f"{p}.norm_1.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
            wt(f"{p}.attn.Wqkv.weight", _w(rng, 3 * d_model, d_model), wtype)
            wt(f"{p}.attn.out_proj.weight", _w(rng, d_model, d_model), wtype)
            wt(f"{p}.norm_2.weight", _w(rng, d_model) + 1.0, GGMLType.F32)
            wt(f"{p}.ffn.up_proj.weight", _w(rng, 4 * d_model, d_model), wtype)
            wt(f"{p}.ffn.down_proj.weight", _w(rng, d_model, 4 * d_model), wtype)


def build_starcoder(
    path, n_vocab=96, n_ctx=64, n_embd=32, n_head=4, n_layer=2,
    ftype=FTYPE_F32, seed=0, specials=("<|end|>",),
):
    """starcoder.cc layout: gpt2-like with c_attn sized n_embd + 2*kv_dim
    (kv_heads == n_head in distributed files, starcoder.cc:163)."""
    rng = np.random.RandomState(seed)
    wtype = _FTYPE_TO_TYPE[ftype]
    vocab = make_vocab(n_vocab)
    for j, s in enumerate(specials):
        vocab[len(vocab) - 1 - j] = s
    kv_dim = n_embd  # pre-expanded MQA
    with LegacyWriter(path) as w:
        for v in (n_vocab, n_ctx, n_embd, n_head, n_layer):
            w.write_i32(v)
        w.write_ftype(ftype)
        w.write_i32(n_vocab)
        w.write_vocab(vocab)

        def wt(name, arr, t):
            w.write_tensor(name, t, tuple(reversed(arr.shape)), _enc(arr, t))

        wt("model/ln_f/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt("model/ln_f/b", _w(rng, n_embd), GGMLType.F32)
        wt("model/wte", _w(rng, n_vocab, n_embd), wtype)
        wt("model/wpe", _w(rng, n_ctx, n_embd), GGMLType.F32)
        wt("model/lm_head", _w(rng, n_vocab, n_embd), wtype)
        for i in range(n_layer):
            p = f"model/h{i}"
            wt(f"{p}/ln_1/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}/ln_1/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/ln_2/g", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}/ln_2/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/attn/c_attn/w", _w(rng, n_embd + 2 * kv_dim, n_embd), wtype)
            wt(f"{p}/attn/c_attn/b", _w(rng, n_embd + 2 * kv_dim), GGMLType.F32)
            wt(f"{p}/attn/c_proj/w", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}/attn/c_proj/b", _w(rng, n_embd), GGMLType.F32)
            wt(f"{p}/mlp/c_fc/w", _w(rng, 4 * n_embd, n_embd), wtype)
            wt(f"{p}/mlp/c_fc/b", _w(rng, 4 * n_embd), GGMLType.F32)
            wt(f"{p}/mlp/c_proj/w", _w(rng, n_embd, 4 * n_embd), wtype)
            wt(f"{p}/mlp/c_proj/b", _w(rng, n_embd), GGMLType.F32)


def build_llama_ggjt(
    path, n_embd=32, n_head=4, n_layer=2, n_mult=32,
    wtype=GGMLType.F32, seed=0, version=3,
):
    """Write a tiny pre-GGUF GGJT llama (llama-ggml.cpp:474-612 layout)."""
    import struct as _s

    rng = np.random.RandomState(seed)
    # old-style vocab: display-form pieces (real spaces) + raw ASCII byte
    # entries for the legacy byte fallback
    pieces = ["<unk>", "<s>", "</s>"] + [chr(b) for b in range(32, 127)]
    words = [" hello", " world", "he", "ll", "lo", "or", "ld", " the",
             "the", "ing", "er", " a", " is", " cat"]
    pieces += words
    scores = [0.0] * 3 + [-100.0] * 95 + [-1.0 - i / 10 for i in range(len(words))]
    n_vocab = len(pieces)
    n_ff = (2 * (4 * n_embd) // 3 + n_mult - 1) // n_mult * n_mult
    ftype = {GGMLType.F32: 0, GGMLType.F16: 1, GGMLType.Q8_0: 7,
             GGMLType.Q4_0: 2}[wtype]

    with open(path, "wb") as f:
        f.write(_s.pack("<II", 0x67676A74, version))  # 'ggjt'
        for v in (n_vocab, n_embd, n_mult, n_head, n_layer,
                  n_embd // n_head, ftype):
            f.write(_s.pack("<I", v))
        for p, s in zip(pieces, scores):
            b = p.encode("utf-8")
            f.write(_s.pack("<I", len(b)))
            f.write(b)
            f.write(_s.pack("<f", s))

        def wt(name, arr, t):
            ne = tuple(reversed(arr.shape))
            nb = name.encode("utf-8")
            f.write(_s.pack("<III", len(ne), len(nb), int(t)))
            for d in ne:
                f.write(_s.pack("<I", d))
            f.write(nb)
            f.write(b"\x00" * (-f.tell() & 31))  # GGJT 32-byte alignment
            f.write(bytes(_enc(arr, t)))

        wt("tok_embeddings.weight", _w(rng, n_vocab, n_embd), wtype)
        wt("norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
        wt("output.weight", _w(rng, n_vocab, n_embd), wtype)
        for i in range(n_layer):
            p = f"layers.{i}"
            wt(f"{p}.attention_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.attention.wq.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.attention.wk.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.attention.wv.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.attention.wo.weight", _w(rng, n_embd, n_embd), wtype)
            wt(f"{p}.ffn_norm.weight", _w(rng, n_embd) + 1.0, GGMLType.F32)
            wt(f"{p}.feed_forward.w1.weight", _w(rng, n_ff, n_embd), wtype)
            wt(f"{p}.feed_forward.w2.weight", _w(rng, n_embd, n_ff), wtype)
            wt(f"{p}.feed_forward.w3.weight", _w(rng, n_ff, n_embd), wtype)


# -- GGCC (ggllm.cpp pre-GGUF falcon) writer ----------------------------------

FALCON_GGCC_MAGIC = 0x67676363
_GGCC_COL_SPLIT = (
    "transformer.word_embeddings.weight",
    ".self_attention.dense.weight",
    ".mlp.dense_4h_to_h.weight",
)


def build_falcon_ggcc(
    path: str,
    n_ctx: int = 64,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 1,
    n_layer: int = 2,
    wtype: GGMLType = GGMLType.F32,
    norm2: bool = False,
    seed: int = 0,
    shards: int = 1,
    container: str = "ggcc",
) -> dict:
    """Write a tiny falcon in ggllm's GGCC v10 format (optionally split
    into `shards` part files `path`, `path.1`, ... following libfalcon's
    by-columns/by-rows split rules, libfalcon.cpp:645-658). Weights are
    drawn with the SAME rng stream as build_falcon_gguf(seed, n_ff=4*d),
    so the two files hold identical models for loader cross-checks.

    container="ggjt": the PRE-GGCC layout — GGJT v3 magic, no inline
    merge list; BPE merges go to a sidecar tokenizer.json next to `path`
    (libfalcon.cpp:835-868 fallback)."""
    import struct as _struct

    rng = np.random.RandomState(seed)
    pieces, scores, types, merges = make_bpe_vocab()
    n_vocab = len(pieces)
    dh = n_embd // n_head
    n_ff = 4 * n_embd  # GGCC derives n_ff = 4*n_embd (libfalcon.cpp:1625)

    # same draw order as build_falcon_gguf
    arrays = {}
    arrays["transformer.word_embeddings.weight"] = (
        _w(rng, n_vocab, n_embd), GGMLType.F32,
    )
    arrays["transformer.ln_f.weight"] = (_w(rng, n_embd) + 1.0, GGMLType.F32)
    arrays["transformer.ln_f.bias"] = (_w(rng, n_embd), GGMLType.F32)
    arrays["lm_head.weight"] = (_w(rng, n_vocab, n_embd), wtype)
    qkv_rows = (n_head + 2 * n_head_kv) * dh
    for i in range(n_layer):
        p = f"transformer.h.{i}"
        if norm2:  # GGUF attn_norm <-> GGCC ln_mlp; attn_norm_2 <-> ln_attn
            arrays[f"{p}.ln_mlp.weight"] = (_w(rng, n_embd) + 1.0, GGMLType.F32)
            arrays[f"{p}.ln_mlp.bias"] = (_w(rng, n_embd), GGMLType.F32)
            arrays[f"{p}.ln_attn.weight"] = (_w(rng, n_embd) + 1.0, GGMLType.F32)
            arrays[f"{p}.ln_attn.bias"] = (_w(rng, n_embd), GGMLType.F32)
        else:
            arrays[f"{p}.input_layernorm.weight"] = (
                _w(rng, n_embd) + 1.0, GGMLType.F32,
            )
            arrays[f"{p}.input_layernorm.bias"] = (_w(rng, n_embd), GGMLType.F32)
        arrays[f"{p}.self_attention.query_key_value.weight"] = (
            _w(rng, qkv_rows, n_embd), wtype,
        )
        arrays[f"{p}.self_attention.dense.weight"] = (
            _w(rng, n_embd, n_head * dh), wtype,
        )
        arrays[f"{p}.mlp.dense_h_to_4h.weight"] = (_w(rng, n_ff, n_embd), wtype)
        arrays[f"{p}.mlp.dense_4h_to_h.weight"] = (_w(rng, n_embd, n_ff), wtype)

    merge_pairs = _BPE_MERGE_PAIRS  # (left, right) unambiguous

    ggjt = container == "ggjt"

    def write_file(f, tensor_slices):
        if ggjt:
            f.write(_struct.pack("<II", 0x67676A74, 3))  # pre-GGCC GGJT v3
        else:
            f.write(_struct.pack("<II", FALCON_GGCC_MAGIC, 10))
        hdr = [n_vocab, n_embd, n_head, n_head_kv, n_layer,
               40 if norm2 else 7, 0]
        if not ggjt:
            hdr.append(len(merge_pairs))
        for v in hdr:
            f.write(_struct.pack("<I", v))
        for piece, score in zip(pieces, scores):
            b = piece.encode("utf-8")
            f.write(_struct.pack("<I", len(b)))
            f.write(b)
            f.write(_struct.pack("<f", score))
        if not ggjt:
            f.write(_struct.pack("<I", len(merge_pairs)))
            for a, b in merge_pairs:
                ab, bb = a.encode(), b.encode()
                f.write(_struct.pack("<I", len(ab)))
                f.write(ab)
                f.write(_struct.pack("<I", len(bb)))
                f.write(bb)
        for name, (arr, t) in tensor_slices:
            ne = tuple(reversed(arr.shape))
            nb = name.encode("utf-8")
            f.write(_struct.pack("<III", len(ne), len(nb), int(t)))
            for d in ne:
                f.write(_struct.pack("<I", d))
            f.write(nb)
            pad = -f.tell() & 31
            f.write(b"\x00" * pad)
            f.write(_enc(arr, t))

    def shard_slices(idx):
        out = []
        for name, (arr, t) in arrays.items():
            if arr.ndim == 1 or shards == 1:
                out.append((name, (arr, t)))  # duplicated in every part
            elif any(name == m or m in name for m in _GGCC_COL_SPLIT):
                cols = arr.shape[1] // shards
                out.append((name, (arr[:, idx * cols : (idx + 1) * cols], t)))
            elif arr.shape[0] % shards:
                # indivisible rows (e.g. odd vocab): whole copy in part 0
                # only — a 1-shard 2D tensor is SPLIT_NONE in the loader
                if idx == 0:
                    out.append((name, (arr, t)))
            else:
                rows = arr.shape[0] // shards
                out.append((name, (arr[idx * rows : (idx + 1) * rows], t)))
        return out

    for idx in range(shards):
        fname = path if idx == 0 else f"{path}.{idx}"
        with open(fname, "wb") as f:
            write_file(f, shard_slices(idx))
    if ggjt:
        import json as _json
        import os as _os

        sidecar = _os.path.join(_os.path.dirname(path), "tokenizer.json")
        with open(sidecar, "w") as f:
            # pretty-printed like real HF tokenizer.json files — the
            # reference's line-oriented scraper needs '"merges": [' on
            # its own line (libfalcon.cpp:349)
            _json.dump(
                {"model": {"merges": [f"{a} {b}" for a, b in merge_pairs]}},
                f, indent=2,
            )
    return dict(n_vocab=n_vocab, n_ctx=n_ctx)
