"""Model re-quantization tool.

Equivalent of the reference's llama_model_quantize_internal
(llama.cpp:4642-5001): rewrites a model file with 2-D matmul weights
re-encoded in a different block format. Policy mirrors the reference: only
2-D tensors quantize; norms/biases and small vectors stay f32; the token
embedding and output head follow the requested type (the reference bumps
output.weight to Q6_K for k-quants — same here). Works on both GGUF and
legacy-GGML containers using this package's own codecs.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..formats.gguf import GGUFReader, write_gguf
from ..formats.quants import GGMLType, dequantize, quantize
from ..utils import is_gguf

# names never quantized (normalization/bias vectors are 1-D anyway; these
# cover 2-D exceptions)
# positional embeddings stay F32: every reference example loader
# allocates wpe as GGML_TYPE_F32 regardless of ftype (gpt2.cc:215,
# starcoder.cc:241), so a quantized wpe makes the file unloadable there
_SKIP_SUBSTRINGS = ("norm", "bias", "ln_", "/g", "/b", "wpe", "position_embd")

K_QUANTS = {
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
}


def _should_quantize(name: str, shape, target: GGMLType) -> bool:
    if len(shape) != 2:
        return False
    low = name.lower()
    if any(s in low for s in _SKIP_SUBSTRINGS):
        return False
    # block size must divide the row length
    from ..formats.quants import block_size

    if shape[-1] % block_size(target):
        return False
    return True


def _tensor_target(name: str, target: GGMLType) -> GGMLType:
    # llama.cpp:4738-4745: output.weight gets Q6_K under k-quants
    if name in ("output.weight",) and target in K_QUANTS:
        return GGMLType.Q6_K
    return target


def quantize_gguf(src: str, dst: str, target: GGMLType) -> Dict[str, str]:
    """Re-quantize a GGUF file; returns {tensor: type_name} decisions."""
    r = GGUFReader(src)
    kv = {}
    for key in r.kv:
        kv[key] = (r.kv_types[key], _kv_roundtrip(r, key))
    tensors = {}
    decisions = {}
    for name, info in r.tensors.items():
        ne = info.ne
        shape = info.numpy_shape
        if _should_quantize(name, shape, target) and info.type not in (
            GGMLType.I8,
            GGMLType.I16,
            GGMLType.I32,
        ):
            t = _tensor_target(name, target)
            w = r.tensor_f32(name)
            payload = quantize(w, t)
        else:
            t = info.type
            payload = bytes(r.tensor_bytes(name))
        decisions[name] = GGMLType(t).name
        tensors[name] = (t, ne, payload)
    kv["general.quantization_version"] = (4, 2)  # u32
    kv["general.file_type"] = (4, _ftype_code(target))
    write_gguf(dst, kv, tensors)
    return decisions


def _kv_roundtrip(r: GGUFReader, key: str):
    v = r.kv[key]
    t = r.kv_types[key]
    if t == 9:  # array: re-wrap for the writer's (type, value) convention
        if isinstance(v, list):
            return (8, list(v))  # string array
        kind = {"f": 6, "i": 5, "u": 4}[np.asarray(v).dtype.kind]
        return (kind, list(np.asarray(v).tolist()))
    return v


def _ftype_code(t: GGMLType) -> int:
    # llama_ftype codes for GGUF general.file_type (llama.h LLAMA_FTYPE_*;
    # k-quants map to the _M variants: Q4_K_M=15, Q5_K_M=17, Q6_K=18)
    codes = {
        GGMLType.F32: 0,
        GGMLType.F16: 1,
        GGMLType.Q4_0: 2,
        GGMLType.Q4_1: 3,
        GGMLType.Q8_0: 7,
        GGMLType.Q5_0: 8,
        GGMLType.Q5_1: 9,
        GGMLType.Q2_K: 10,
        GGMLType.Q3_K: 11,
        GGMLType.Q4_K: 15,
        GGMLType.Q5_K: 17,
        GGMLType.Q6_K: 18,
    }
    return codes.get(GGMLType(t), 0)


def _ggml_ftype_code(t: GGMLType) -> int:
    # ggml_ftype codes for LEGACY binary headers (ggml.h:319-334) — these
    # differ from llama_ftype for k-quants: Q4_K=12, Q5_K=13, Q6_K=14.
    # The example-model loaders decode the header through
    # ggml_ftype_to_ggml_type (ggml.c:4196), which has no case for the
    # llama codes and aborts the load.
    codes = {
        GGMLType.F32: 0,
        GGMLType.F16: 1,
        GGMLType.Q4_0: 2,
        GGMLType.Q4_1: 3,
        GGMLType.Q8_0: 7,
        GGMLType.Q5_0: 8,
        GGMLType.Q5_1: 9,
        GGMLType.Q2_K: 10,
        GGMLType.Q3_K: 11,
        GGMLType.Q4_K: 12,
        GGMLType.Q5_K: 13,
        GGMLType.Q6_K: 14,
    }
    return codes.get(GGMLType(t), 0)


# legacy header layouts: (#int hparams incl. trailing ftype, #f32 hparams
# before ftype, repeated-vocab-count?, scored-vocab?) — per the reference
# loaders (models/llms/*.cc)
_LEGACY_HEADERS = {
    "gpt2": (5, 0, True, False),
    "starcoder": (5, 0, True, False),
    "gptbigcode": (5, 0, True, False),
    "gptj": (6, 0, True, False),
    "gptneox": (7, 0, True, False),
    "dollyv2": (7, 0, True, False),
    "mpt": (5, 2, False, False),
    "replit": (5, 0, False, True),
}


def quantize_legacy(
    src: str, dst: str, target: GGMLType, model_type: str
) -> Dict[str, str]:
    """Re-quantize a legacy-GGML example file (header copied verbatim,
    ftype field updated)."""
    import struct

    from ..formats.ggml_legacy import (
        GGML_QNT_VERSION,
        GGML_QNT_VERSION_FACTOR,
        LegacyReader,
        LegacyWriter,
    )
    from ..models.registry import normalize_type

    mtype = normalize_type(model_type or "")
    if mtype not in _LEGACY_HEADERS:
        raise ValueError(f"unknown legacy model type '{model_type}'")
    n_int, n_f32, repeated, scored = _LEGACY_HEADERS[mtype]

    r = LegacyReader(src)
    ints = [r.read_i32() for _ in range(n_int)]
    floats = [r.read_f32() for _ in range(n_f32)]
    r.read_i32()  # old ftype
    n_vocab = ints[4] if mtype in ("mpt", "replit") else ints[0]
    if repeated:
        r.read_i32()
    vocab = r.read_vocab(n_vocab, scores=scored)
    r.index_tensors()

    with LegacyWriter(dst) as w:
        for v in ints:
            w.write_i32(v)
        for v in floats:
            w._f.write(struct.pack("<f", v))
        w.write_i32(
            _ggml_ftype_code(target)
            + GGML_QNT_VERSION * GGML_QNT_VERSION_FACTOR
        )
        if repeated:
            w.write_i32(n_vocab)
        if scored:
            toks, scs = vocab
            w.write_vocab(toks, scores=scs)
        else:
            w.write_vocab(vocab)
        decisions = {}
        for name, info in r.tensors.items():
            shape = info.numpy_shape
            if _should_quantize(name, shape, target) and info.type not in (
                GGMLType.I8,
                GGMLType.I16,
                GGMLType.I32,
            ):
                t = target
                payload = quantize(r.tensor_f32(name), t)
            else:
                t = info.type
                payload = bytes(r.tensor_bytes(name))
            decisions[name] = GGMLType(t).name
            w.write_tensor(name, t, info.ne, payload)
    return decisions


def quantize_file(src: str, dst: str, target, model_type: str = "") -> Dict[str, str]:
    t = GGMLType[target.upper()] if isinstance(target, str) else GGMLType(target)
    if is_gguf(src):
        return quantize_gguf(src, dst, t)
    return quantize_legacy(src, dst, t, model_type)
