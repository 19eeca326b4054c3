"""Shared helpers for the legacy GGML "example model" loaders
(gptj/gpt_neox/dolly/mpt/replit/starcoder)."""

from __future__ import annotations

import numpy as np

from ..formats.ggml_legacy import LegacyReader
from ..formats.quants import GGMLType
from ..ops.qmatmul import repack, repack_select_rows


def weight(r: LegacyReader, name: str):
    """2-D matmul weight for x @ W: QTensor when quantized, dense .T else."""
    info = r.tensors[name]
    rows, cols = info.numpy_shape
    if info.type in (GGMLType.F32, GGMLType.F16):
        return np.ascontiguousarray(r.tensor_f32(name).T)
    return repack(r.tensor_bytes(name), info.type, rows, cols)


def split_rows(r: LegacyReader, name: str, groups):
    info = r.tensors[name]
    rows, cols = info.numpy_shape
    return repack_select_rows(r.tensor_bytes(name), info.type, rows, cols, groups)


def contiguous_groups(sizes):
    bounds = np.cumsum([0] + list(sizes))
    return [np.arange(bounds[i], bounds[i + 1]) for i in range(len(sizes))]


def per_head_qkv_groups(n_head: int, head_dim: int):
    """Row indices for a per-head-interleaved fused QKV: rows are ordered
    [h0: q(dh) k(dh) v(dh) | h1: ...] (gpt-neox.cc view strides, 440-470)."""
    idx = np.arange(n_head * 3 * head_dim).reshape(n_head, 3, head_dim)
    return [idx[:, j, :].reshape(-1) for j in range(3)]
