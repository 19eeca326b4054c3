"""GGUF model loader: llama + falcon architectures.

Mirrors the reference GGUF runtime (/root/reference/models/ggml/llama.cpp):
KV schema llama.cpp:220-262, hparams load 1539-1638 (GQA n_head_kv 1570,
rope base/linear-scale override rules 1578-1596), vocab load 1648-1761,
tensor-name maps 294-348, graph structure llm_build_llama 2162-2491 and
llm_build_falcon 2493-2798. Only llama and falcon have graphs in the
reference (llama_build_graph 2800-2833) — same coverage here.

TPU-native departures: quantized 2-D weights are repacked into QTensor
planes (ops/qmatmul.py) instead of kept in block format; weights for x @ W
are transposed at load; the token embedding is dequantized dense (gather
table). Llama GGUF q/k weights are stored pre-permuted for interleaved
(mode 0) RoPE, so rope_mode="interleaved" reproduces llm_build_llama's
ggml_rope_custom_inplace(..., mode=0); falcon uses neox mode (mode=2).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..formats.gguf import GGUFReader
from ..formats.quants import GGMLType
from ..ops.qmatmul import QTensor, repack, repack_select_rows
from .spec import ArchSpec
from .vocab import GGUFVocab


def _kv(r: GGUFReader, key: str, default=None, required: bool = False):
    if key in r.kv:
        return r.kv[key]
    if required:
        raise ValueError(f"GGUF: missing required key {key}")
    return default


def _load_vocab(r: GGUFReader):
    pieces = _kv(r, "tokenizer.ggml.tokens", required=True)
    scores = _kv(r, "tokenizer.ggml.scores")
    toktypes = _kv(r, "tokenizer.ggml.token_type")
    model = _kv(r, "tokenizer.ggml.model", "llama")
    vocab_type = "bpe" if model == "gpt2" else "spm"
    # SPM defaults bos=1 eos=2 unk=0; BPE defaults bos=eos=11 (falcon's
    # <|endoftext|>) — llm_load_vocab, llama.cpp:1683-1721
    defaults = (1, 2, 0, -1) if vocab_type == "spm" else (11, 11, -1, -1)
    vocab = GGUFVocab(
        pieces,
        scores,
        toktypes,
        vocab_type=vocab_type,
        bos_id=int(_kv(r, "tokenizer.ggml.bos_token_id", defaults[0])),
        eos_id=int(_kv(r, "tokenizer.ggml.eos_token_id", defaults[1])),
        unk_id=int(_kv(r, "tokenizer.ggml.unknown_token_id", defaults[2])),
        pad_id=int(_kv(r, "tokenizer.ggml.padding_token_id", defaults[3])),
    )
    if vocab_type == "bpe":
        from ..tokenizers.bpe import BPETokenizer

        merges = _kv(r, "tokenizer.ggml.merges", required=True)
        tokenizer = BPETokenizer(vocab, merges)
    else:
        from ..tokenizers.spm import SPMTokenizer

        tokenizer = SPMTokenizer(vocab)
    return vocab, tokenizer


def _weight(r: GGUFReader, name: str):
    """2-D matmul weight for x @ W: QTensor when quantized, dense .T else."""
    info = r.tensors[name]
    rows, cols = info.numpy_shape  # (out, in)
    if info.type in (GGMLType.F32, GGMLType.F16):
        return np.ascontiguousarray(r.tensor_f32(name).T)
    return repack(r.tensor_bytes(name), info.type, rows, cols)


def _dense(r: GGUFReader, name: str):
    return r.tensor_f32(name)


def _embed(r: GGUFReader, name: str):
    """Embedding table at FILE precision (f16 stays f16): halves its
    host->device wire bytes; placement upcasts to f32 ON DEVICE after the
    transfer (engine/placement.py), bit-identical to a host upcast."""
    return r.tensor_storage(name)


def _split_qkv(r: GGUFReader, name: str, sizes):
    """Split a fused QKV weight by output rows into per-projection weights.

    Falcon stores [q (H*dh) | k (Hkv*dh) | v (Hkv*dh)] as consecutive output
    rows (llm_build_falcon views, llama.cpp:2629-2652)."""
    info = r.tensors[name]
    rows, cols = info.numpy_shape
    assert rows == sum(sizes), (rows, sizes)
    bounds = np.cumsum([0] + list(sizes))
    groups = [np.arange(bounds[i], bounds[i + 1]) for i in range(len(sizes))]
    return repack_select_rows(r.tensor_bytes(name), info.type, rows, cols, groups)


def load_bundle(path: str, context_length: int = -1, progress_callback=None):
    """progress_callback(fraction: float) mirrors the reference's loader
    progress hook (llama_progress_callback, llama.h:139-142)."""
    from .registry import ModelBundle
    from ..utils import is_gguf

    if not is_gguf(path):
        # pre-GGUF llama containers (GGML/GGMF/GGJT) — the reference's
        # llama-ggml.cpp path (dispatched at llm.cc:49-53)
        from . import llama_ggjt

        return llama_ggjt.load_bundle(path, context_length)

    r = GGUFReader(path)
    arch = _kv(r, "general.architecture", required=True)
    if arch not in ("llama", "falcon"):
        # reference parity: graphs exist only for llama+falcon
        # (llama_build_graph, llama.cpp:2800-2833)
        raise ValueError(f"unknown architecture: {arch}")

    vocab, tokenizer = _load_vocab(r)

    n_ctx_train = int(_kv(r, f"{arch}.context_length", 2048, required=True))
    n_embd = int(_kv(r, f"{arch}.embedding_length", required=True))
    n_layer = int(_kv(r, f"{arch}.block_count", required=True))
    n_ff = int(_kv(r, f"{arch}.feed_forward_length", required=True))
    n_head = int(_kv(r, f"{arch}.attention.head_count", required=True))
    n_head_kv = int(_kv(r, f"{arch}.attention.head_count_kv", n_head))
    head_dim = n_embd // n_head

    rope_base = float(_kv(r, f"{arch}.rope.freq_base", 10000.0))
    scale_linear = float(_kv(r, f"{arch}.rope.scale_linear", 1.0))
    rope_scale = 1.0 / scale_linear if scale_linear != 0 else 1.0

    n_ctx = context_length if context_length > 0 else n_ctx_train

    # Parallel repack: the per-tensor decode+repack chain is independent
    # numpy/C work that releases the GIL — a worker pool cuts a 2 GiB
    # file's host repack ~4x (the reference reaches the same wall-clock
    # via mmap + multithreaded page-in, llama.cpp:470-798)
    from concurrent.futures import ThreadPoolExecutor

    nw = int(os.environ.get("CT_LOAD_THREADS", "0")) or min(
        8, os.cpu_count() or 1
    )
    pool = ThreadPoolExecutor(nw) if nw > 1 else None

    def W(name):
        return pool.submit(_weight, r, name) if pool else _weight(r, name)

    def res(v):
        return v.result() if hasattr(v, "result") else v

    params = {"layers": []}
    if arch == "llama":
        spec = ArchSpec(
            name="llama",
            n_vocab=len(vocab),
            n_ctx=n_ctx,
            n_ctx_train=n_ctx_train,
            n_embd=n_embd,
            n_head=n_head,
            n_layer=n_layer,
            n_head_kv=n_head_kv,
            n_ff=n_ff,
            rope_mode="interleaved",  # weights pre-permuted at conversion
            n_rot=head_dim,
            rope_base=rope_base,
            rope_scale=rope_scale,
            norm="rmsnorm",
            norm_eps=float(
                _kv(r, "llama.attention.layer_norm_rms_epsilon", 1e-5)
            ),
            act="silu_gate",
        )
        params["wte"] = _embed(r, "token_embd.weight")
        params["ln_f_g"] = _dense(r, "output_norm.weight")
        params["lm_head"] = (
            W("output.weight")
            if "output.weight" in r.tensors
            else np.ascontiguousarray(params["wte"].T)  # tied fallback
        )
        for i in range(n_layer):
            p = f"blk.{i}"
            params["layers"].append(
                {
                    "ln1_g": _dense(r, f"{p}.attn_norm.weight"),
                    "wq": W(f"{p}.attn_q.weight"),
                    "wk": W(f"{p}.attn_k.weight"),
                    "wv": W(f"{p}.attn_v.weight"),
                    "wo": W(f"{p}.attn_output.weight"),
                    "ln2_g": _dense(r, f"{p}.ffn_norm.weight"),
                    "w_gate": W(f"{p}.ffn_gate.weight"),
                    "w_up": W(f"{p}.ffn_up.weight"),
                    "w_down": W(f"{p}.ffn_down.weight"),
                }
            )
    else:  # falcon
        has_norm2 = "blk.0.attn_norm_2.weight" in r.tensors
        spec = ArchSpec(
            name="falcon",
            n_vocab=len(vocab),
            n_ctx=n_ctx,
            n_ctx_train=n_ctx_train,
            n_embd=n_embd,
            n_head=n_head,
            n_layer=n_layer,
            n_head_kv=n_head_kv,
            n_ff=n_ff,
            rope_mode="neox",
            n_rot=head_dim,
            rope_base=rope_base,
            rope_scale=rope_scale,
            norm="layernorm",
            norm_eps=float(_kv(r, "falcon.attention.layer_norm_epsilon", 1e-5)),
            parallel_residual=True,
            shared_parallel_ln=not has_norm2,
            act="gelu",
        )
        params["wte"] = _embed(r, "token_embd.weight")
        params["ln_f_g"] = _dense(r, "output_norm.weight")
        params["ln_f_b"] = _dense(r, "output_norm.bias")
        params["lm_head"] = W("output.weight")
        sizes = [n_head * head_dim, n_head_kv * head_dim, n_head_kv * head_dim]
        for i in range(n_layer):
            p = f"blk.{i}"
            wq, wk, wv = _split_qkv(r, f"{p}.attn_qkv.weight", sizes)
            # 40B: attention reads attn_norm_2, the MLP reads attn_norm
            # (llm_build_falcon: "cur" vs "inpFF = attn_norm"); our forward
            # feeds attention from ln1 and the MLP from ln2, so the 40B
            # mapping swaps them. 7B shares one norm (shared_parallel_ln).
            attn_ln = "attn_norm_2" if has_norm2 else "attn_norm"
            layer = {
                "ln1_g": _dense(r, f"{p}.{attn_ln}.weight"),
                "ln1_b": _dense(r, f"{p}.{attn_ln}.bias"),
                "wq": wq,
                "wk": wk,
                "wv": wv,
                "wo": W(f"{p}.attn_output.weight"),
                "w_up": W(f"{p}.ffn_up.weight"),
                "w_down": W(f"{p}.ffn_down.weight"),
            }
            if has_norm2:
                layer["ln2_g"] = _dense(r, f"{p}.attn_norm.weight")
                layer["ln2_b"] = _dense(r, f"{p}.attn_norm.bias")
            params["layers"].append(layer)

    params["lm_head"] = res(params["lm_head"])
    for i, layer in enumerate(params["layers"]):
        for k in list(layer):
            layer[k] = res(layer[k])
        if progress_callback:
            progress_callback((i + 1) / max(1, len(params["layers"])))
    if pool is not None:
        pool.shutdown()
    if progress_callback:
        progress_callback(1.0)
    return ModelBundle(
        spec,
        params,
        vocab,
        tokenizer,
        architecture=arch,
        sampler="llama",
        supports_embeddings=True,
    )
