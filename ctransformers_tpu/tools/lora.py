"""LoRA adapter loading + application (ggla format).

Clone of llama_apply_lora_from_file_internal (reference
llama.cpp:5002-5277): file = magic 'ggla' + version 1 + lora_r +
lora_alpha, then a legacy tensor stream of f32/f16 pairs
"<base>.loraA" (ne = (r, in)) and "<base>.loraB" (ne = (r, out));
W += (alpha/r) * B.A. Quantized targets are dequantized, patched, and
re-encoded in their original format (the reference's add-into-quantized
path, with the same quality caveat)."""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

LORA_MAGIC = 0x67676C61  # 'ggla'


def read_ggla(path: str):
    """-> (scaling, {base_name: (A (in, r), B (out, r)) f32})."""
    with open(path, "rb") as f:
        data = f.read()
    pos = 0

    def u32():
        nonlocal pos
        (v,) = struct.unpack_from("<I", data, pos)
        pos += 4
        return v

    def i32():
        nonlocal pos
        (v,) = struct.unpack_from("<i", data, pos)
        pos += 4
        return v

    magic = u32()
    if magic != LORA_MAGIC:
        raise ValueError(f"not a ggla LoRA file (magic {magic:#x})")
    version = u32()
    if version != 1:
        raise ValueError(f"unsupported ggla version {version}")
    lora_r = i32()
    lora_alpha = i32()
    scaling = float(lora_alpha) / float(lora_r)

    tensors: Dict[str, np.ndarray] = {}
    while pos + 12 <= len(data):
        n_dims = i32()
        name_len = i32()
        ftype = i32()
        ne = [1, 1]
        for i in range(n_dims):
            ne[i] = i32()
        name = data[pos : pos + name_len].decode("utf-8")
        pos += name_len
        # tensor payloads are 32-byte aligned (llama.cpp:5150,
        # `offset = (offset + 31) & -32`) — real llama.cpp-produced
        # adapters are misread without this
        pos = (pos + 31) & -32
        count = ne[0] * ne[1]
        if ftype == 0:
            arr = np.frombuffer(data, "<f4", count=count, offset=pos)
            pos += count * 4
        elif ftype == 1:
            arr = np.frombuffer(data, "<f2", count=count, offset=pos).astype(
                np.float32
            )
            pos += count * 2
        else:
            raise ValueError(f"invalid LoRA tensor type {ftype}")
        tensors[name] = arr.reshape(ne[1], ne[0])  # numpy = reversed(ne)

    pairs: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for name in list(tensors):
        if name.endswith(".loraA"):
            base = name[: -len(".loraA")]
            b = tensors.get(base + ".loraB")
            if b is None:
                raise ValueError(f"missing loraB for '{base}'")
            pairs[base] = (tensors[name], b)
    return scaling, pairs


# llama GGUF tensor base name -> path into our params pytree
def _llama_param(params, base: str):
    if base == "output.weight":
        return params, "lm_head"
    if base == "token_embd.weight":
        return params, "wte"
    if base.startswith("blk."):
        _, idx, rest = base.split(".", 2)
        layer = params["layers"][int(idx)]
        key = {
            "attn_q.weight": "wq",
            "attn_k.weight": "wk",
            "attn_v.weight": "wv",
            "attn_output.weight": "wo",
            "ffn_gate.weight": "w_gate",
            "ffn_up.weight": "w_up",
            "ffn_down.weight": "w_down",
        }.get(rest)
        if key is not None:
            return layer, key
    return None, None


def apply_lora(params, lora_path: str) -> int:
    """Patch a llama params pytree in place; returns #tensors patched."""
    from ..ops.qmatmul import QTensor, dequantize_qtensor, quantize_qtensor

    scaling, pairs = read_ggla(lora_path)
    n = 0
    for base, (a, b) in pairs.items():
        holder, key = _llama_param(params, base)
        if holder is None:
            raise ValueError(f"unknown tensor '{base}' in LoRA adapter")
        w = holder[key]
        # x@W layout (in, out): delta = A (in, r) @ B^T (r, out)
        delta = (a @ b.T) * scaling
        if isinstance(w, QTensor):
            dense = np.asarray(dequantize_qtensor(w), np.float32)
            if dense.shape != delta.shape:
                raise ValueError(
                    f"LoRA shape mismatch for '{base}': {delta.shape} vs {dense.shape}"
                )
            holder[key] = quantize_qtensor(dense + delta, w.kind)
        else:
            if key == "wte":
                # wte is stored (V, D) = (out, in)
                holder[key] = np.asarray(w, np.float32) + delta.T
            else:
                holder[key] = np.asarray(w, np.float32) + delta
        n += 1
    return n


def write_ggla(path: str, lora_r: int, lora_alpha: int, pairs) -> None:
    """Fixture/export writer; pairs: {base: (A (in,r), B (out,r)) f32}."""
    out = bytearray()
    out += struct.pack("<IIii", LORA_MAGIC, 1, lora_r, lora_alpha)
    for base, (a, b) in pairs.items():
        for suffix, arr in ((".loraA", a), (".loraB", b)):
            name = (base + suffix).encode("utf-8")
            arr = np.ascontiguousarray(arr, np.float32)
            ne = (arr.shape[1], arr.shape[0])  # GGML order
            out += struct.pack("<iii", 2, len(name), 0)
            out += struct.pack("<ii", *ne)
            out += name
            out += b"\0" * (-len(out) & 31)  # 32-byte payload alignment
            out += arr.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))
