"""GPTQ checkpoint format: unpack + repack into the universal QTensor.

The reference routes GPTQ repos to an ExLlama CUDA backend
(ctransformers/gptq/llm.py); here the same checkpoints run through the TPU
Pallas dequant-matmul. GPTQ-for-LLaMa tensor layout (per layer):

    qweight (K/8, N)  int32   8 x 4-bit weights packed along K
    qzeros  (G, N/8)  int32   8 x 4-bit zero-points packed along N,
                              stored MINUS ONE (the classic +1 quirk)
    scales  (G, N)    f16     per-(group, column) scale
    g_idx   (K,)      int32   group of each input row (act-order support)

Dequant: w[k, n] = scales[g(k), n] * (q[k, n] - zeros[g(k), n]).

Mapping to QTensor: K is already the leading dim (x @ W needs no
transpose); scales plane s = scales, min plane m = -scales * zeros, group =
K / G. Act-order checkpoints are handled by stably sorting rows by g_idx so
groups become contiguous; the row permutation is applied to activations at
matmul time (QTensor.perm)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.qmatmul import QTensor, make_qtensor


def unpack_qweight(qweight: np.ndarray) -> np.ndarray:
    """(K/8, N) int32 -> (K, N) uint8 in [0, 15]."""
    k8, n = qweight.shape
    q = qweight.astype(np.uint32)
    out = np.empty((k8 * 8, n), np.uint8)
    for j in range(8):
        out[j::8] = (q >> (4 * j)) & 0xF
    return out


def unpack_qzeros(qzeros: np.ndarray) -> np.ndarray:
    """(G, N/8) int32 -> (G, N) uint8 zero-points (the +1 applied)."""
    g, n8 = qzeros.shape
    z = qzeros.astype(np.uint32)
    out = np.empty((g, n8 * 8), np.uint8)
    for j in range(8):
        out[:, j::8] = (z >> (4 * j)) & 0xF
    return (out + 1) & 0xF


def gptq_dequant(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Reference dense dequant, (K, N) f32 — the test oracle."""
    q = unpack_qweight(qweight).astype(np.float32)
    zeros = unpack_qzeros(qzeros).astype(np.float32)
    scales = np.asarray(scales, np.float32)
    k = q.shape[0]
    if g_idx is None:
        group = k // scales.shape[0]
        g_idx = np.arange(k) // group
    return scales[g_idx] * (q - zeros[g_idx])


def gptq_to_qtensor(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
) -> QTensor:
    q = unpack_qweight(qweight)
    zeros = unpack_qzeros(qzeros).astype(np.float32)
    s = np.asarray(scales, np.float32)
    k, n = q.shape
    n_groups = s.shape[0]
    group = k // n_groups

    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, np.int64)
        trivial = np.arange(k) // group
        if not np.array_equal(g_idx, trivial):
            # act-order: stable-sort rows so each group is contiguous
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
            counts = np.bincount(g_idx, minlength=n_groups)
            if not np.all(counts == group):
                raise ValueError("GPTQ groups are not uniform size")

    m = -(s * zeros)  # additive constant per (group, column)
    return make_qtensor(
        q.astype(np.int8), s, m, "GPTQ4", group, perm=perm
    )
