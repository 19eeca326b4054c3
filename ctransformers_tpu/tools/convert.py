"""Container conversion: pre-GGUF llama (GGML/GGMF/GGJT) -> GGUF v2.

Modernizes old checkpoints without touching weight bytes (the block quant
payloads are identical across containers; only metadata and tensor names
change: tok_embeddings->token_embd etc., the llama.cpp GGUF schema of
llama.cpp:220-348). The SPM vocab is re-escaped from display form back to
U+2581 pieces, and raw single-byte entries become <0xXX> byte tokens, so
the GGUF-side tokenizer reproduces the old one.
"""

from __future__ import annotations

from typing import Dict

from ..formats.gguf import write_gguf
from ..models.llama_ggjt import GGJTReader, detect_n_gqa
from ..models.vocab import (
    TOKEN_TYPE_BYTE,
    TOKEN_TYPE_CONTROL,
    TOKEN_TYPE_NORMAL,
    TOKEN_TYPE_UNKNOWN,
)

_NAME_MAP = {
    "tok_embeddings.weight": "token_embd.weight",
    "norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
}
_LAYER_MAP = {
    "attention_norm.weight": "attn_norm.weight",
    "attention.wq.weight": "attn_q.weight",
    "attention.wk.weight": "attn_k.weight",
    "attention.wv.weight": "attn_v.weight",
    "attention.wo.weight": "attn_output.weight",
    "ffn_norm.weight": "ffn_norm.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
}


def _map_name(name: str) -> str:
    if name in _NAME_MAP:
        return _NAME_MAP[name]
    if name.startswith("layers."):
        _, idx, rest = name.split(".", 2)
        mapped = _LAYER_MAP.get(rest)
        if mapped:
            return f"blk.{idx}.{mapped}"
    raise ValueError(f"unknown legacy tensor '{name}'")


def ggjt_to_gguf(src: str, dst: str, context_length: int = 2048) -> Dict:
    r = GGJTReader(src)
    n_gqa = detect_n_gqa(src)

    # vocab: display form -> GGUF SPM form
    pieces, types = [], []
    for i, p in enumerate(r.pieces):
        if i == 0:
            types.append(TOKEN_TYPE_UNKNOWN)
        elif i in (1, 2):
            types.append(TOKEN_TYPE_CONTROL)
        elif len(p) == 1 and ord(p) < 256 and not p.isprintable():
            types.append(TOKEN_TYPE_BYTE)
            pieces.append(f"<0x{ord(p):02X}>")
            continue
        else:
            types.append(TOKEN_TYPE_NORMAL)
        pieces.append(p.replace(" ", "▁") if types[-1] == TOKEN_TYPE_NORMAL else p)

    import numpy as np

    kv = {
        "general.architecture": "llama",
        "general.name": "converted-from-ggjt",
        "general.quantization_version": 2,
        "llama.context_length": context_length,
        "llama.embedding_length": r.n_embd,
        "llama.block_count": r.n_layer,
        "llama.feed_forward_length": (
            (2 * (4 * r.n_embd) // 3 + r.n_mult - 1) // r.n_mult * r.n_mult
        ),
        "llama.attention.head_count": r.n_head,
        "llama.attention.head_count_kv": r.n_head // n_gqa,
        "llama.attention.layer_norm_rms_epsilon": 5e-6,
        "llama.rope.dimension_count": r.n_embd // r.n_head,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": pieces,
        "tokenizer.ggml.scores": np.asarray(r.scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
    }
    tensors = {}
    for name, info in r.tensors.items():
        tensors[_map_name(name)] = (
            info.type,
            info.ne,
            bytes(r.tensor_bytes(name)),
        )
    write_gguf(dst, kv, tensors)
    return {"tensors": len(tensors), "vocab": len(pieces)}
