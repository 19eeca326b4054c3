"""Bit-exact GGML/GGUF block quantization formats in vectorized numpy.

This module decodes (and encodes) every quantization format the reference
framework supports, matching the on-disk block layouts documented in the
reference (block structs: /root/reference/models/ggml/ggml.c:888-933 and
k_quants.h:34-126; decode semantics: ggml.c dequantize_row_* and
k_quants.c dequantize_row_*).

Design notes (TPU-first):
  * Decoding is pure numpy and fully vectorized — no per-block Python loops.
    K-quant sub-block structure is handled with precomputed gather/shift
    tables of shape (256,) built once at import time.
  * These decoders run at *load/repack* time on the host. The TPU compute
    path consumes either (a) dequantized bf16 weights or (b) planar repacked
    (quants, scales) arrays fed to Pallas fused dequant-matmul kernels
    (see ctransformers_tpu/ops/quant_matmul.py).
"""

from __future__ import annotations

import enum

import numpy as np

QK = 32  # basic block size
QK_K = 256  # super-block size
K_SCALE_SIZE = 12


class GGMLType(enum.IntEnum):
    """Tensor data types, values match enum ggml_type (ggml.h:288-310)."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5 removed upstream
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    I8 = 16
    I16 = 17
    I32 = 18


# type -> (elements per block, bytes per block)
_TRAITS = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.Q4_0: (QK, 2 + QK // 2),  # 18
    GGMLType.Q4_1: (QK, 4 + QK // 2),  # 20
    GGMLType.Q5_0: (QK, 2 + 4 + QK // 2),  # 22
    GGMLType.Q5_1: (QK, 4 + 4 + QK // 2),  # 24
    GGMLType.Q8_0: (QK, 2 + QK),  # 34
    GGMLType.Q8_1: (QK, 8 + QK),  # 40
    GGMLType.Q2_K: (QK_K, QK_K // 16 + QK_K // 4 + 4),  # 84
    GGMLType.Q3_K: (QK_K, QK_K // 8 + QK_K // 4 + 12 + 2),  # 110
    GGMLType.Q4_K: (QK_K, 4 + K_SCALE_SIZE + QK_K // 2),  # 144
    GGMLType.Q5_K: (QK_K, 4 + K_SCALE_SIZE + QK_K // 8 + QK_K // 2),  # 176
    GGMLType.Q6_K: (QK_K, QK_K // 2 + QK_K // 4 + QK_K // 16 + 2),  # 210
    GGMLType.Q8_K: (QK_K, 4 + QK_K + QK_K // 16 * 2),  # 292
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
}

QUANTIZED_TYPES = frozenset(
    t for t, (bs, _) in _TRAITS.items() if bs > 1
)


def block_size(t: GGMLType) -> int:
    return _TRAITS[GGMLType(t)][0]


def type_size(t: GGMLType) -> int:
    return _TRAITS[GGMLType(t)][1]


def row_nbytes(t: GGMLType, n_elements: int) -> int:
    bs, ts = _TRAITS[GGMLType(t)]
    if n_elements % bs:
        raise ValueError(f"{n_elements} not a multiple of block size {bs} for {t!r}")
    return n_elements // bs * ts


def _f16(b: np.ndarray) -> np.ndarray:
    """View little-endian fp16 bytes as float32."""
    return b.view("<f2").astype(np.float32)


def _blocks(data: np.ndarray, t: GGMLType, n: int) -> np.ndarray:
    """Reshape a flat uint8 buffer into (nb, type_size) block rows."""
    bs, ts = _TRAITS[t]
    if n % bs:
        raise ValueError(f"{n} elements not a multiple of block size {bs}")
    nb = n // bs
    data = np.frombuffer(data, dtype=np.uint8, count=nb * ts) if isinstance(
        data, (bytes, bytearray, memoryview)
    ) else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)[: nb * ts]
    return data.reshape(nb, ts)


# ---------------------------------------------------------------------------
# K-quant gather tables. For each output position l in [0, 256) we precompute
# which byte of the packed payload it reads, the bit shift, and which
# sub-block scale index it uses. This turns the reference's nested loops into
# single vectorized gathers.
# ---------------------------------------------------------------------------


def _q2k_tables():
    # dequantize_row_q2_K (k_quants.c:396): halves of 128; within a half,
    # 4 shift groups of 32 (2 sub-blocks of 16); qs advances 32 per half.
    byte = np.empty(QK_K, np.int64)
    shift = np.empty(QK_K, np.int64)
    sc_idx = np.empty(QK_K, np.int64)
    l = np.arange(QK_K)
    half = l // 128
    r = l % 128
    j = r // 32
    pos = r % 32
    byte[:] = 32 * half + pos
    shift[:] = 2 * j
    sc_idx[:] = 8 * half + 2 * j + (pos >= 16)
    return byte, shift, sc_idx


_Q2K_BYTE, _Q2K_SHIFT, _Q2K_SC = _q2k_tables()


def _q3k_tables():
    # dequantize_row_q3_K (k_quants.c:575): same qs layout as q2_K; the high
    # bit mask `m` starts at 1 and shifts left once per (half, j) pair; hmask
    # is NOT advanced per half.
    l = np.arange(QK_K)
    half = l // 128
    r = l % 128
    j = r // 32
    pos = r % 32
    byte = 32 * half + pos
    shift = 2 * j
    # hm index: within a shift group, first 16 use hm[l], next 16 use hm[l+16]
    hm_byte = (pos % 16) + 16 * (pos >= 16)
    hm_bit = 4 * half + j  # m = 1 << (4*half + j)
    sc_idx = 8 * half + 2 * j + (pos >= 16)
    return byte, shift, hm_byte, hm_bit, sc_idx


_Q3K_BYTE, _Q3K_SHIFT, _Q3K_HMB, _Q3K_HMBIT, _Q3K_SC = _q3k_tables()


def _q45k_tables():
    # dequantize_row_q4_K / q5_K (k_quants.c:784, 984): 4 chunks of 64;
    # within a chunk, 32 low nibbles then 32 high nibbles; qs advances 32
    # per chunk. q5_K high bits: qh not advanced, bit = 2*chunk + hi.
    l = np.arange(QK_K)
    chunk = l // 64
    r = l % 64
    hi = r // 32
    pos = r % 32
    byte = 32 * chunk + pos
    shift = 4 * hi
    sc_idx = 2 * chunk + hi
    qh_bit = 2 * chunk + hi
    return byte, shift, sc_idx, pos, qh_bit


_Q45K_BYTE, _Q45K_SHIFT, _Q45K_SC, _Q45K_QHB, _Q45K_QHBIT = _q45k_tables()


def _q6k_tables():
    # dequantize_row_q6_K (k_quants.c:1123): halves of 128; within a half,
    # 4 groups of 32 selected by (ql byte, nibble, qh shift):
    #   out[l+0]  = ql[l]&0xF    | ((qh[l]>>0)&3)<<4,  sc[l//16 + 0]
    #   out[l+32] = ql[l+32]&0xF | ((qh[l]>>2)&3)<<4,  sc[l//16 + 2]
    #   out[l+64] = ql[l]>>4     | ((qh[l]>>4)&3)<<4,  sc[l//16 + 4]
    #   out[l+96] = ql[l+32]>>4  | ((qh[l]>>6)&3)<<4,  sc[l//16 + 6]
    # ql advances 64, qh 32, sc 8 per half.
    l = np.arange(QK_K)
    half = l // 128
    r = l % 128
    grp = r // 32
    pos = r % 32
    ql_byte = 64 * half + 32 * (grp % 2) + pos
    ql_shift = 4 * (grp // 2)
    qh_byte = 32 * half + pos
    qh_shift = 2 * grp
    sc_idx = 8 * half + (pos // 16) + 2 * grp
    return ql_byte, ql_shift, qh_byte, qh_shift, sc_idx


_Q6K_QLB, _Q6K_QLS, _Q6K_QHB, _Q6K_QHS, _Q6K_SC = _q6k_tables()


def _unpack_scale_min_k4(sc_bytes: np.ndarray):
    """Decode the 12-byte 6-bit packed scales/mins of q4_K/q5_K.

    Vectorized get_scale_min_k4 (k_quants.c:306-313): returns (sc, m) arrays
    of shape (nb, 8) of uint8 6-bit values.
    """
    q = sc_bytes.astype(np.uint8)
    sc = np.empty(q.shape[:-1] + (8,), np.uint8)
    m = np.empty_like(sc)
    j = np.arange(4)
    sc[..., :4] = q[..., 0:4] & 63
    m[..., :4] = q[..., 4:8] & 63
    sc[..., 4:] = (q[..., 8:12] & 0xF) | ((q[..., 0:4] >> 6) << 4)
    m[..., 4:] = (q[..., 8:12] >> 4) | ((q[..., 4:8] >> 6) << 4)
    del j
    return sc, m


def _pack_scale_min_k4(sc: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_scale_min_k4; sc/m are (nb, 8) 6-bit values."""
    sc = sc.astype(np.uint8)
    m = m.astype(np.uint8)
    out = np.zeros(sc.shape[:-1] + (12,), np.uint8)
    out[..., 0:4] = (sc[..., :4] & 63) | ((sc[..., 4:] >> 4) << 6)
    out[..., 4:8] = (m[..., :4] & 63) | ((m[..., 4:] >> 4) << 6)
    out[..., 8:12] = (sc[..., 4:] & 0xF) | ((m[..., 4:] & 0xF) << 4)
    return out


def _unpack_q3k_scales(sc_bytes: np.ndarray) -> np.ndarray:
    """Decode q3_K's 12-byte packed 6-bit scales into (nb, 16) int8-32."""
    a = sc_bytes.view("<u4")  # (nb, 3)
    a0, a1, tmp = a[..., 0], a[..., 1], a[..., 2]
    k1, k2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
    n0 = (a0 & k2) | (((tmp >> 0) & k1) << 4)
    n1 = (a1 & k2) | (((tmp >> 2) & k1) << 4)
    n2 = ((a0 >> 4) & k2) | (((tmp >> 4) & k1) << 4)
    n3 = ((a1 >> 4) & k2) | (((tmp >> 6) & k1) << 4)
    words = np.stack([n0, n1, n2, n3], axis=-1).astype("<u4")
    return words.view(np.int8).astype(np.int32) - 32  # (nb, 16)


def _pack_q3k_scales(scales: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_q3k_scales; scales (nb, 16) in [-32, 31]."""
    s = (scales + 32).astype(np.uint8)  # 6-bit
    lo = s & 0xF
    hi = s >> 4  # 2 bits
    out = np.zeros(s.shape[:-1] + (12,), np.uint8)
    out[..., 0:8] = lo[..., 0:8] | (lo[..., 8:16] << 4)
    hi_all = np.zeros(s.shape[:-1] + (4,), np.uint8)
    # byte b of [8:12] packs hi bits of scales b, b+4, b+8, b+12 at 2-bit slots
    for k in range(4):
        hi_all |= hi[..., 4 * k : 4 * k + 4] << (2 * k)
    out[..., 8:12] = hi_all
    return out


# ---------------------------------------------------------------------------
# Dequantization
# ---------------------------------------------------------------------------


def dequantize(data, t: GGMLType, n: int) -> np.ndarray:
    """Decode a flat buffer of `n` elements of ggml type `t` to float32."""
    t = GGMLType(t)
    if t == GGMLType.F32:
        return np.frombuffer(data, "<f4", count=n).copy() if isinstance(
            data, (bytes, bytearray, memoryview)
        ) else np.asarray(data, np.uint8).reshape(-1)[: n * 4].view("<f4").copy()
    if t == GGMLType.F16:
        b = np.frombuffer(data, "<f2", count=n) if isinstance(
            data, (bytes, bytearray, memoryview)
        ) else np.asarray(data, np.uint8).reshape(-1)[: n * 2].view("<f2")
        return b.astype(np.float32)
    if t in (GGMLType.I8, GGMLType.I16, GGMLType.I32):
        dt = {GGMLType.I8: "<i1", GGMLType.I16: "<i2", GGMLType.I32: "<i4"}[t]
        return np.frombuffer(data, dt, count=n).astype(np.float32)
    fn = _DEQUANT[t]
    return fn(_blocks(data, t, n)).reshape(-1)[:n]


def _dq_q4_0(b):
    d = _f16(b[:, 0:2])  # (nb, 1)
    qs = b[:, 2:18]
    lo = (qs & 0xF).astype(np.int32) - 8
    hi = (qs >> 4).astype(np.int32) - 8
    return np.concatenate([lo, hi], axis=1).astype(np.float32) * d


def _dq_q4_1(b):
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qs = b[:, 4:20]
    lo = (qs & 0xF).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    return np.concatenate([lo, hi], axis=1) * d + m


def _q5_highbits(qh_bytes):
    """(nb,4) uint8 -> (nb,32) per-position 5th bit (0 or 16)."""
    qh = qh_bytes.copy().view("<u4")[:, 0]  # (nb,)
    j = np.arange(16)
    xh0 = ((qh[:, None] >> j) << 4) & 0x10
    xh1 = (qh[:, None] >> (j + 12)) & 0x10
    return np.concatenate([xh0, xh1], axis=1).astype(np.int32)


def _dq_q5_0(b):
    d = _f16(b[:, 0:2])
    xh = _q5_highbits(b[:, 2:6])
    qs = b[:, 6:22]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | xh
    return (q - 16).astype(np.float32) * d


def _dq_q5_1(b):
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    xh = _q5_highbits(b[:, 4:8])
    qs = b[:, 8:24]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | xh
    return q.astype(np.float32) * d + m


def _dq_q8_0(b):
    d = _f16(b[:, 0:2])
    return b[:, 2:34].view(np.int8).astype(np.float32) * d


def _dq_q8_1(b):
    d = b[:, 0:4].view("<f4")
    return b[:, 8:40].view(np.int8).astype(np.float32) * d


def _dq_q2_K(b):
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    sc = scales[:, _Q2K_SC]
    q = (qs[:, _Q2K_BYTE] >> _Q2K_SHIFT) & 3
    dl = d * (sc & 0xF).astype(np.float32)
    ml = dmin * (sc >> 4).astype(np.float32)
    return dl * q.astype(np.float32) - ml


def _dq_q3_K(b):
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    scales = _unpack_q3k_scales(np.ascontiguousarray(b[:, 96:108]))
    d = _f16(b[:, 108:110])
    q = ((qs[:, _Q3K_BYTE] >> _Q3K_SHIFT) & 3).astype(np.int32)
    hbit = (hmask[:, _Q3K_HMB] >> _Q3K_HMBIT) & 1
    q = q - np.where(hbit == 0, 4, 0)
    dl = d * scales[:, _Q3K_SC].astype(np.float32)
    return dl * q.astype(np.float32)


def _dq_q4_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    q = (qs[:, _Q45K_BYTE] >> _Q45K_SHIFT) & 0xF
    dl = d * sc[:, _Q45K_SC].astype(np.float32)
    ml = dmin * mn[:, _Q45K_SC].astype(np.float32)
    return dl * q.astype(np.float32) - ml


def _dq_q5_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    q = ((qs[:, _Q45K_BYTE] >> _Q45K_SHIFT) & 0xF).astype(np.int32)
    hb = (qh[:, _Q45K_QHB] >> _Q45K_QHBIT) & 1
    q = q + np.where(hb != 0, 16, 0)
    dl = d * sc[:, _Q45K_SC].astype(np.float32)
    ml = dmin * mn[:, _Q45K_SC].astype(np.float32)
    return dl * q.astype(np.float32) - ml


def _dq_q6_K(b):
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8)
    d = _f16(b[:, 208:210])
    lo = (ql[:, _Q6K_QLB] >> _Q6K_QLS) & 0xF
    hi = (qh[:, _Q6K_QHB] >> _Q6K_QHS) & 3
    q = (lo | (hi << 4)).astype(np.int32) - 32
    dl = d * scales[:, _Q6K_SC].astype(np.float32)
    return dl * q.astype(np.float32)


def _dq_q8_K(b):
    d = b[:, 0:4].view("<f4")
    return b[:, 4:260].view(np.int8).astype(np.float32) * d


_DEQUANT = {
    GGMLType.Q4_0: _dq_q4_0,
    GGMLType.Q4_1: _dq_q4_1,
    GGMLType.Q5_0: _dq_q5_0,
    GGMLType.Q5_1: _dq_q5_1,
    GGMLType.Q8_0: _dq_q8_0,
    GGMLType.Q8_1: _dq_q8_1,
    GGMLType.Q2_K: _dq_q2_K,
    GGMLType.Q3_K: _dq_q3_K,
    GGMLType.Q4_K: _dq_q4_K,
    GGMLType.Q5_K: _dq_q5_K,
    GGMLType.Q6_K: _dq_q6_K,
    GGMLType.Q8_K: _dq_q8_K,
}


# ---------------------------------------------------------------------------
# Quantization (reference semantics of quantize_row_*_reference)
# ---------------------------------------------------------------------------


def quantize(x: np.ndarray, t: GGMLType) -> np.ndarray:
    """Encode float32 array `x` into ggml type `t` (returns uint8 buffer)."""
    t = GGMLType(t)
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    if t == GGMLType.F32:
        return x.view(np.uint8).copy()
    if t == GGMLType.F16:
        return x.astype("<f2").view(np.uint8).copy()
    fn = _QUANT[t]
    bs, _ = _TRAITS[t]
    if x.size % bs:
        raise ValueError(f"{x.size} not a multiple of block size {bs}")
    return fn(x.reshape(-1, bs)).reshape(-1)


def _signed_absmax(xb):
    """Value with the largest |x| per block, keeping its sign."""
    idx = np.argmax(np.abs(xb), axis=1)
    return xb[np.arange(xb.shape[0]), idx]


def _q_q4_0(xb):
    mx = _signed_absmax(xb)
    d = mx / -8.0
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = np.minimum(15, np.floor(xb * id_[:, None] + 8.5).astype(np.int32))
    q = np.maximum(q, 0).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty((xb.shape[0], 18), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:18] = lo | (hi << 4)
    return out


def _q_q4_1(xb):
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 15.0
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = np.minimum(
        15, np.floor((xb - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32)
    ).astype(np.uint8)
    out = np.empty((xb.shape[0], 20), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:20] = q[:, :16] | (q[:, 16:] << 4)
    return out


def _q_q5_0(xb):
    mx = _signed_absmax(xb)
    d = mx / -16.0
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = np.minimum(31, np.floor(xb * id_[:, None] + 16.5).astype(np.int32))
    q = np.maximum(q, 0).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    qh = np.zeros(xb.shape[0], np.uint32)
    for j in range(16):
        qh |= ((lo[:, j].astype(np.uint32) & 0x10) >> 4) << j
        qh |= ((hi[:, j].astype(np.uint32) & 0x10) >> 4) << (j + 16)
    out = np.empty((xb.shape[0], 22), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 6:22] = (lo & 0xF) | ((hi & 0xF) << 4)
    return out


def _q_q5_1(xb):
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 31.0
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = np.floor((xb - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32)
    q = np.clip(q, 0, 31).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    qh = np.zeros(xb.shape[0], np.uint32)
    for j in range(16):
        qh |= ((lo[:, j].astype(np.uint32) & 0x10) >> 4) << j
        qh |= ((hi[:, j].astype(np.uint32) & 0x10) >> 4) << (j + 16)
    out = np.empty((xb.shape[0], 24), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 8:24] = (lo & 0xF) | ((hi & 0xF) << 4)
    return out


def _round_half_away(x):
    """C roundf semantics: round half away from zero."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _q_q8_0(xb):
    amax = np.abs(xb).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = _round_half_away(xb * id_[:, None]).astype(np.int8)
    out = np.empty((xb.shape[0], 34), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out


def _q_q8_1(xb):
    amax = np.abs(xb).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0), 0.0)
    q = _round_half_away(xb * id_[:, None]).astype(np.int8)
    s = (d * q.astype(np.float32).sum(axis=1)).astype(np.float32)
    out = np.empty((xb.shape[0], 40), np.uint8)
    out[:, 0:4] = d.view(np.uint8).reshape(-1, 4)
    out[:, 4:8] = s.view(np.uint8).reshape(-1, 4)
    out[:, 8:40] = q.view(np.uint8)
    return out


# --- k-quant encoders -------------------------------------------------------
# These implement the reference `quantize_row_*_reference` algorithms
# (k_quants.c) vectorized over sub-blocks. Scalar-search loops over the
# small candidate grids are kept (they iterate over constants, not data).


def _nearest_int(x):
    return _round_half_away(x).astype(np.int32)


def _make_qx_quants(xs, nmax, rmse_type=1):
    """Vectorized make_qx_quants (k_quants.c:19) for x = d*q, q in [-nmax, nmax-1].

    xs: (..., gs) groups. Returns (scales, quants).
    """
    amax = np.abs(xs).max(axis=-1)
    idx = np.abs(xs).argmax(axis=-1)
    mx = np.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]
    zero = amax == 0
    iscale = np.where(zero, 0.0, -nmax / np.where(zero, 1.0, mx))
    if rmse_type == 0:
        q = np.clip(_nearest_int(iscale[..., None] * xs), -nmax, nmax - 1)
        scale = np.where(zero, 0.0, 1.0 / iscale)
        return scale, q
    weight_rmse = rmse_type == 1
    w = xs * xs if weight_rmse else np.ones_like(xs)
    best_q = np.clip(_nearest_int(iscale[..., None] * xs), -nmax, nmax - 1)
    sumlx = (w * xs * best_q).sum(axis=-1)
    suml2 = (w * best_q * best_q).sum(axis=-1)
    best = np.where(suml2 > 0, sumlx * sumlx / np.where(suml2 > 0, suml2, 1), 0.0)
    best_scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), 0.0)
    for is_ in range(-4, 5):
        if is_ == 0:
            continue
        isc = -(nmax + 0.1 * is_) / np.where(zero, 1.0, mx)
        q = np.clip(_nearest_int(isc[..., None] * xs), -nmax, nmax - 1)
        sl = (w * xs * q).sum(axis=-1)
        s2 = (w * q * q).sum(axis=-1)
        cand = np.where(s2 > 0, sl * sl / np.where(s2 > 0, s2, 1), -1.0)
        upd = (s2 > 0) & (cand > best)
        best = np.where(upd, cand, best)
        new_scale = np.where(s2 > 0, sl / np.where(s2 > 0, s2, 1), 0.0)
        best_scale = np.where(upd, new_scale, best_scale)
        best_q = np.where(upd[..., None], q, best_q)
    best_scale = np.where(zero, 0.0, best_scale)
    best_q = np.where(zero[..., None], 0, best_q)
    return best_scale, best_q


def _make_qkx2_quants(xs, nmax, weights, rmin, rdelta, nstep, use_mad):
    """Vectorized make_qkx2_quants (k_quants.c:229-303): the weighted
    grid-search min/scale fit the reference uses for Q2_K/Q4_K/Q5_K.
    x ≈ scale*L - the_min with L in [0, nmax]; returns (scale, L, the_min)
    over the leading group axes."""
    mn = xs.min(axis=-1)
    mx = xs.max(axis=-1)
    sum_w = weights.sum(axis=-1)
    sum_x = (weights * xs).sum(axis=-1)
    mn = np.where(mn > 0, 0.0, mn)
    flat = mx == mn
    span = np.where(flat, 1.0, mx - mn)
    iscale = nmax / span
    scale = 1.0 / iscale
    L = np.clip(_nearest_int(iscale[..., None] * (xs - mn[..., None])), 0, nmax)
    diff = scale[..., None] * L + mn[..., None] - xs
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = (weights * diff).sum(axis=-1)
    cur_min = mn.copy()
    for step in range(nstep + 1):
        isc = (rmin + rdelta * step + nmax) / span
        l = np.clip(_nearest_int(isc[..., None] * (xs - mn[..., None])), 0, nmax)
        wl = weights * l
        sum_l = wl.sum(axis=-1)
        sum_l2 = (wl * l).sum(axis=-1)
        sum_xl = (wl * xs).sum(axis=-1)
        D = sum_w * sum_l2 - sum_l * sum_l
        ok = D > 0
        Dsafe = np.where(ok, D, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / Dsafe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / Dsafe
        pos = this_min > 0
        # D > 0 implies sum_l2 > 0
        this_scale = np.where(
            pos, sum_xl / np.where(sum_l2 > 0, sum_l2, 1.0), this_scale
        )
        this_min = np.where(pos, 0.0, this_min)
        diff = this_scale[..., None] * l + this_min[..., None] - xs
        diff = np.abs(diff) if use_mad else diff * diff
        mad = (weights * diff).sum(axis=-1)
        better = ok & (mad < best_mad)
        best_mad = np.where(better, mad, best_mad)
        scale = np.where(better, this_scale, scale)
        cur_min = np.where(better, this_min, cur_min)
        L = np.where(better[..., None], l, L)
    # flat groups short-circuit in the reference (L=0, scale 0, -min)
    scale = np.where(flat, 0.0, scale)
    L = np.where(flat[..., None], 0, L)
    the_min = np.where(flat, -mn, -cur_min)
    return scale, L, the_min


def _qkx2_weights_avx(groups):
    """Q4_K/Q5_K weighting: av_x + |x| per group (k_quants.c:693-696)."""
    av_x = np.sqrt((groups * groups).mean(axis=-1, keepdims=True))
    return av_x + np.abs(groups)


def _make_qkx1_quants(xs, nmax, ntry=5):
    """Vectorized make_qkx1_quants (k_quants.c:282): x ≈ d*q - min, q>=0."""
    mn = xs.min(axis=-1)
    mx = xs.max(axis=-1)
    flat = mx == mn
    gs = xs.shape[-1]
    mn = np.where(mn > 0, 0.0, mn)
    iscale = nmax / np.where(flat, 1.0, mx - mn)
    scale = 1.0 / iscale
    for _ in range(ntry):
        l = np.clip(_nearest_int(iscale[..., None] * (xs - mn[..., None])), 0, nmax)
        sumlx = ((xs - mn[..., None]) * l).sum(axis=-1)
        suml2 = (l * l).sum(axis=-1)
        new_scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), scale)
        did = (new_scale != scale) & (suml2 > 0)
        scale = np.where(suml2 > 0, new_scale, scale)
        sum_off = (xs - scale[..., None] * l).sum(axis=-1)
        new_mn = sum_off / gs
        new_mn = np.where(new_mn > 0, 0.0, new_mn)
        did |= new_mn != mn
        mn = new_mn
        iscale = np.where(scale != 0, 1.0 / np.where(scale == 0, 1.0, scale), iscale)
        if not did.any():
            break
    l = np.clip(_nearest_int(iscale[..., None] * (xs - mn[..., None])), 0, nmax)
    # flat (max == min) groups: the reference returns scale 0, L = 0,
    # min 0 BEFORE any iteration (k_quants.c:194-198) — without this an
    # all-zero group reports scale 1/nmax and inflates the superblock
    # max_scale, degrading every other group's quantized scale
    scale = np.where(flat, 0.0, scale)
    l = np.where(flat[..., None], 0, l)
    return scale, l, np.where(flat, 0.0, -mn)


def _q_q2_K(xb):
    nb = xb.shape[0]
    groups = xb.reshape(nb, 16, 16)
    # reference weighting: |x| per element (k_quants.c:335-336)
    scales, L, mins = _make_qkx2_quants(
        groups, 3, np.abs(groups), rmin=-0.5, rdelta=0.1, nstep=15,
        use_mad=True,
    )
    # zero-scale groups produce L=0 in reference (loop sets L=0 when scale==0)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 15.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 15.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = _nearest_int(inv_scale[:, None] * scales).astype(np.uint8)
    lm = _nearest_int(inv_min[:, None] * mins).astype(np.uint8)
    packed_sc = (ls & 0xF) | (lm << 4)
    d = np.where(max_scale > 0, max_scale / 15.0, 0.0).astype(np.float16)
    dmin = np.where(max_min > 0, max_min / 15.0, 0.0).astype(np.float16)
    # re-quantize each group with the quantized scale (reference second pass)
    d32 = d.astype(np.float32)[:, None]
    dm32 = dmin.astype(np.float32)[:, None]
    dl = d32 * (packed_sc & 0xF)
    ml = dm32 * (packed_sc >> 4)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int((groups + ml[..., None]) / np.where(dl == 0, 1, dl)[..., None])
    Lq = np.clip(Lq, 0, 3).astype(np.uint8)
    Lq = np.where((dl == 0)[..., None], 0, Lq)
    flat = Lq.reshape(nb, 256)
    qs = np.zeros((nb, 64), np.uint8)
    for half in range(2):
        for j in range(4):
            seg = flat[:, 128 * half + 32 * j : 128 * half + 32 * j + 32]
            qs[:, 32 * half : 32 * half + 32] |= seg << (2 * j)
    out = np.empty((nb, 84), np.uint8)
    out[:, 0:16] = packed_sc
    out[:, 16:80] = qs
    out[:, 80:82] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 82:84] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out


def _q_q3_K(xb):
    nb = xb.shape[0]
    groups = xb.reshape(nb, 16, 16)
    scales, _ = _make_qx_quants(groups, 4, rmse_type=1)
    amax_idx = np.abs(scales).argmax(axis=1)
    max_scale = np.take_along_axis(scales, amax_idx[:, None], axis=1)[:, 0]
    nz = max_scale != 0
    iscale = np.where(nz, -32.0 / np.where(nz, max_scale, 1.0), 0.0)
    l6 = np.clip(_nearest_int(iscale[:, None] * scales), -32, 31)
    d = np.where(nz, 1.0 / np.where(iscale == 0, 1.0, iscale), 0.0).astype(np.float16)
    sc_packed = _pack_q3k_scales(l6)
    # second pass quantize with decoded 6-bit scales
    d32 = d.astype(np.float32)[:, None]
    dl = d32 * l6.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        L = _nearest_int(groups / np.where(dl == 0, 1, dl)[..., None])
    L = np.clip(L, -4, 3)
    L = np.where((dl == 0)[..., None], 0, L) + 4  # store offset by 4
    flat = L.reshape(nb, 256).astype(np.uint8)
    hmask = np.zeros((nb, 32), np.uint8)
    qs = np.zeros((nb, 64), np.uint8)
    # high bit: m = 1 << (4*half + j), hmask index = pos within 32
    for half in range(2):
        for j in range(4):
            seg = flat[:, 128 * half + 32 * j : 128 * half + 32 * j + 32]
            hmask |= ((seg >> 2) & 1) << (4 * half + j)
            qs[:, 32 * half : 32 * half + 32] |= (seg & 3) << (2 * j)
    out = np.empty((nb, 110), np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = sc_packed
    out[:, 108:110] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out


def _qkx_45(xb, nmax, ntry):
    del ntry  # qkx1 legacy knob; qkx2 params are per-format below
    nb = xb.shape[0]
    groups = xb.reshape(nb, 8, 32)
    # Q4_K: (rmin -1, nstep 20); Q5_K: (rmin -0.5, nstep 15)
    # (k_quants.c:697, 869)
    rmin, nstep = (-1.0, 20) if nmax == 15 else (-0.5, 15)
    scales, L, mins = _make_qkx2_quants(
        groups, nmax, _qkx2_weights_avx(groups), rmin=rmin, rdelta=0.1,
        nstep=nstep, use_mad=False,
    )
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.clip(_nearest_int(inv_scale[:, None] * scales), 0, 63).astype(np.uint8)
    lm = np.clip(_nearest_int(inv_min[:, None] * mins), 0, 63).astype(np.uint8)
    d = np.where(max_scale > 0, max_scale / 63.0, 0.0).astype(np.float16)
    dmin = np.where(max_min > 0, max_min / 63.0, 0.0).astype(np.float16)
    sc_packed = _pack_scale_min_k4(ls, lm)
    d32 = d.astype(np.float32)[:, None]
    dm32 = dmin.astype(np.float32)[:, None]
    dl = d32 * ls
    ml = dm32 * lm
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int((groups + ml[..., None]) / np.where(dl == 0, 1, dl)[..., None])
    Lq = np.clip(Lq, 0, nmax).astype(np.uint8)
    Lq = np.where((dl == 0)[..., None], 0, Lq)
    return d, dmin, sc_packed, Lq


def _q_q4_K(xb):
    nb = xb.shape[0]
    d, dmin, sc_packed, Lq = _qkx_45(xb, 15, ntry=5)
    flat = Lq.reshape(nb, 256)
    qs = np.zeros((nb, 128), np.uint8)
    for chunk in range(4):
        lo = flat[:, 64 * chunk : 64 * chunk + 32]
        hi = flat[:, 64 * chunk + 32 : 64 * chunk + 64]
        qs[:, 32 * chunk : 32 * chunk + 32] = lo | (hi << 4)
    out = np.empty((nb, 144), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = sc_packed
    out[:, 16:144] = qs
    return out


def _q_q5_K(xb):
    nb = xb.shape[0]
    d, dmin, sc_packed, Lq = _qkx_45(xb, 31, ntry=5)
    flat = Lq.reshape(nb, 256)
    qs = np.zeros((nb, 128), np.uint8)
    qh = np.zeros((nb, 32), np.uint8)
    for chunk in range(4):
        lo = flat[:, 64 * chunk : 64 * chunk + 32]
        hi = flat[:, 64 * chunk + 32 : 64 * chunk + 64]
        qs[:, 32 * chunk : 32 * chunk + 32] = (lo & 0xF) | ((hi & 0xF) << 4)
        qh |= (lo >> 4) << (2 * chunk)
        qh |= (hi >> 4) << (2 * chunk + 1)
    out = np.empty((nb, 176), np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = sc_packed
    out[:, 16:48] = qh
    out[:, 48:176] = qs
    return out


def _q_q6_K(xb):
    nb = xb.shape[0]
    groups = xb.reshape(nb, 16, 16)
    scales, L = _make_qx_quants(groups, 32, rmse_type=1)
    amax_idx = np.abs(scales).argmax(axis=1)
    max_abs_scale = np.take_along_axis(np.abs(scales), amax_idx[:, None], axis=1)[:, 0]
    max_scale = np.take_along_axis(scales, amax_idx[:, None], axis=1)[:, 0]
    nz = max_abs_scale != 0
    iscale = np.where(nz, -128.0 / np.where(nz, max_scale, 1.0), 0.0)
    d = np.where(nz, 1.0 / np.where(iscale == 0, 1.0, iscale), 0.0).astype(np.float16)
    l8 = np.clip(_nearest_int(iscale[:, None] * scales), -128, 127).astype(np.int8)
    d32 = d.astype(np.float32)[:, None]
    dl = d32 * l8.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int(groups / np.where(dl == 0, 1, dl)[..., None])
    Lq = np.clip(Lq, -32, 31)
    Lq = np.where((dl == 0)[..., None], 0, Lq) + 32
    flat = Lq.reshape(nb, 256).astype(np.uint8)
    ql = np.zeros((nb, 128), np.uint8)
    qh = np.zeros((nb, 64), np.uint8)
    for half in range(2):
        base = 128 * half
        q1 = flat[:, base : base + 32]
        q2 = flat[:, base + 32 : base + 64]
        q3 = flat[:, base + 64 : base + 96]
        q4 = flat[:, base + 96 : base + 128]
        ql[:, 64 * half : 64 * half + 32] = (q1 & 0xF) | ((q3 & 0xF) << 4)
        ql[:, 64 * half + 32 : 64 * half + 64] = (q2 & 0xF) | ((q4 & 0xF) << 4)
        qh[:, 32 * half : 32 * half + 32] = (
            (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
        )
    out = np.empty((nb, 210), np.uint8)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = l8.view(np.uint8)
    out[:, 208:210] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out


def _q_q8_K(xb):
    nb = xb.shape[0]
    amax = np.abs(xb).max(axis=1)
    imax = np.abs(xb).argmax(axis=1)
    mx = xb[np.arange(nb), imax]
    zero = amax == 0
    iscale = np.where(zero, 0.0, -128.0 / np.where(zero, 1.0, mx))
    q = np.clip(_nearest_int(iscale[:, None] * xb), -128, 127).astype(np.int8)
    bsums = q.astype(np.int32).reshape(nb, 16, 16).sum(axis=2).astype("<i2")
    d = np.where(zero, 0.0, 1.0 / np.where(iscale == 0, 1.0, iscale)).astype("<f4")
    out = np.empty((nb, 292), np.uint8)
    out[:, 0:4] = d.view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(nb, 32)
    return out


_QUANT = {
    GGMLType.Q4_0: _q_q4_0,
    GGMLType.Q4_1: _q_q4_1,
    GGMLType.Q5_0: _q_q5_0,
    GGMLType.Q5_1: _q_q5_1,
    GGMLType.Q8_0: _q_q8_0,
    GGMLType.Q8_1: _q_q8_1,
    GGMLType.Q2_K: _q_q2_K,
    GGMLType.Q3_K: _q_q3_K,
    GGMLType.Q4_K: _q_q4_K,
    GGMLType.Q5_K: _q_q5_K,
    GGMLType.Q6_K: _q_q6_K,
    GGMLType.Q8_K: _q_q8_K,
}


# ftype (model file level quantization, ggml.h:319-334) -> tensor type
FTYPE_TO_TYPE = {
    0: GGMLType.F32,
    1: GGMLType.F16,
    2: GGMLType.Q4_0,
    3: GGMLType.Q4_1,
    7: GGMLType.Q8_0,
    8: GGMLType.Q5_0,
    9: GGMLType.Q5_1,
    10: GGMLType.Q2_K,
    11: GGMLType.Q3_K,
    12: GGMLType.Q4_K,
    13: GGMLType.Q5_K,
    14: GGMLType.Q6_K,
}


# ---------------------------------------------------------------------------
# Structured decomposition ("decompose"): every quantized type reduces to
#     x[i] = q[i] * s[i // group] + m[i // group]
# with q an int8 grid and s/m float32 planes at the format's native scale
# granularity (group = 16 or 32). This is the universal TPU repack: the
# Pallas fused dequant-matmul kernels consume (q, s, m) directly, so one
# kernel family serves all 12 GGML formats. Bit-exact with dequantize()
# (the same float ops in the same order).
# ---------------------------------------------------------------------------


def _g(per_elem: np.ndarray, group: int) -> np.ndarray:
    """Sample per-element constants down to one value per `group` run."""
    nb = per_elem.shape[0]
    return np.ascontiguousarray(
        per_elem.reshape(nb, -1, group)[:, :, 0], np.float32
    )


def _dc_q4_0(b):
    d = _f16(b[:, 0:2])
    qs = b[:, 2:18]
    lo = (qs & 0xF).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=1), d, None, QK


def _dc_q4_1(b):
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qs = b[:, 4:20]
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=1), d, m, QK


def _dc_q5_0(b):
    d = _f16(b[:, 0:2])
    xh = _q5_highbits(b[:, 2:6])
    qs = b[:, 6:22]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = (np.concatenate([lo, hi], axis=1) | xh) - 16
    return q.astype(np.int8), d, None, QK


def _dc_q5_1(b):
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    xh = _q5_highbits(b[:, 4:8])
    qs = b[:, 8:24]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | xh
    return q.astype(np.int8), d, m, QK


def _dc_q8_0(b):
    return b[:, 2:34].view(np.int8).copy(), _f16(b[:, 0:2]), None, QK


def _dc_q8_1(b):
    return b[:, 8:40].view(np.int8).copy(), b[:, 0:4].view("<f4").copy(), None, QK


def _dc_q2_K(b):
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    sc = scales[:, _Q2K_SC]
    q = ((qs[:, _Q2K_BYTE] >> _Q2K_SHIFT) & 3).astype(np.int8)
    dl = d * (sc & 0xF).astype(np.float32)
    ml = dmin * (sc >> 4).astype(np.float32)
    return q, _g(dl, 16), -_g(ml, 16), 16


def _dc_q3_K(b):
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    scales = _unpack_q3k_scales(np.ascontiguousarray(b[:, 96:108]))
    d = _f16(b[:, 108:110])
    q = ((qs[:, _Q3K_BYTE] >> _Q3K_SHIFT) & 3).astype(np.int32)
    hbit = (hmask[:, _Q3K_HMB] >> _Q3K_HMBIT) & 1
    q = (q - np.where(hbit == 0, 4, 0)).astype(np.int8)
    dl = d * scales[:, _Q3K_SC].astype(np.float32)
    return q, _g(dl, 16), None, 16


def _dc_q4_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    q = ((qs[:, _Q45K_BYTE] >> _Q45K_SHIFT) & 0xF).astype(np.int8)
    dl = d * sc[:, _Q45K_SC].astype(np.float32)
    ml = dmin * mn[:, _Q45K_SC].astype(np.float32)
    return q, _g(dl, 32), -_g(ml, 32), 32


def _dc_q5_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    q = ((qs[:, _Q45K_BYTE] >> _Q45K_SHIFT) & 0xF).astype(np.int32)
    hb = (qh[:, _Q45K_QHB] >> _Q45K_QHBIT) & 1
    q = (q + np.where(hb != 0, 16, 0)).astype(np.int8)
    dl = d * sc[:, _Q45K_SC].astype(np.float32)
    ml = dmin * mn[:, _Q45K_SC].astype(np.float32)
    return q, _g(dl, 32), -_g(ml, 32), 32


def _dc_q6_K(b):
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8)
    d = _f16(b[:, 208:210])
    lo = (ql[:, _Q6K_QLB] >> _Q6K_QLS) & 0xF
    hi = (qh[:, _Q6K_QHB] >> _Q6K_QHS) & 3
    q = ((lo | (hi << 4)).astype(np.int32) - 32).astype(np.int8)
    dl = d * scales[:, _Q6K_SC].astype(np.float32)
    return q, _g(dl, 16), None, 16


def _dc_q8_K(b):
    d = b[:, 0:4].view("<f4")
    q = b[:, 4:260].view(np.int8).copy()
    s = np.repeat(d, QK_K // QK, axis=1)  # expand per-256 d to per-32
    return q, s, None, QK


_DECOMP = {
    GGMLType.Q4_0: _dc_q4_0,
    GGMLType.Q4_1: _dc_q4_1,
    GGMLType.Q5_0: _dc_q5_0,
    GGMLType.Q5_1: _dc_q5_1,
    GGMLType.Q8_0: _dc_q8_0,
    GGMLType.Q8_1: _dc_q8_1,
    GGMLType.Q2_K: _dc_q2_K,
    GGMLType.Q3_K: _dc_q3_K,
    GGMLType.Q4_K: _dc_q4_K,
    GGMLType.Q5_K: _dc_q5_K,
    GGMLType.Q6_K: _dc_q6_K,
    GGMLType.Q8_K: _dc_q8_K,
}


def decompose(data, t: GGMLType, n: int):
    """Flat buffer -> (q int8 (n,), s f32 (n/group,), m f32 | None, group)."""
    t = GGMLType(t)
    if t not in _DECOMP:
        raise ValueError(f"{t!r} is not a block-quantized type")
    q, s, m, group = _DECOMP[t](_blocks(data, t, n))
    q = q.reshape(-1)[:n]
    s = np.ascontiguousarray(s, np.float32).reshape(-1)[: n // group]
    if m is not None:
        m = np.ascontiguousarray(m, np.float32).reshape(-1)[: n // group]
    return q, s, m, group


def decompose_factors(data, t: GGMLType, n: int):
    """Factored scale planes for k-quant superblock formats.

    The k-quants store one f16 super-scale (and super-min) per 256-element
    superblock plus small-integer sub-scales per group (k_quants.h:34-118);
    `decompose` materializes the per-group f32 product s = d*sc. Keeping
    the FACTORS instead stores 4(+4) bytes per 256 weights + 1(+1) byte per
    group, vs 4(+4) bytes per group — a ~21% cut of total weight-stream HBM
    traffic for Q4_K. The consumer recomputes s = d * float(sc) in f32,
    which is bit-identical to the fused plane (same IEEE ops, same order;
    mins use sm = -dmin so m = sm*mq matches decompose's -(dmin*mq)).

    Returns (sd, sq, sm, mq, group) with per-block-row shapes
    sd/sm (nb, 1) f32 and sq/mq (nb, 256//group) int8, or None when `t`
    has no superblock structure. Sub-scale grids are in logical group
    order (the _Q*_SC index maps are l//group order).
    """
    t = GGMLType(t)
    if t not in (
        GGMLType.Q2_K,
        GGMLType.Q3_K,
        GGMLType.Q4_K,
        GGMLType.Q5_K,
        GGMLType.Q6_K,
    ):
        return None
    if n % QK_K:
        return None
    b = _blocks(data, t, n)
    if t == GGMLType.Q2_K:
        sc = b[:, 0:16]
        d = _f16(b[:, 80:82])
        dmin = _f16(b[:, 82:84])
        return d, (sc & 0xF).astype(np.int8), -dmin, (sc >> 4).astype(np.int8), 16
    if t == GGMLType.Q3_K:
        scales = _unpack_q3k_scales(np.ascontiguousarray(b[:, 96:108]))
        d = _f16(b[:, 108:110])
        return d, scales.astype(np.int8), None, None, 16
    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        d = _f16(b[:, 0:2])
        dmin = _f16(b[:, 2:4])
        sc, mn = _unpack_scale_min_k4(b[:, 4:16])
        return d, sc.astype(np.int8), -dmin, mn.astype(np.int8), 32
    # Q6_K
    scales = b[:, 192:208].view(np.int8)
    d = _f16(b[:, 208:210])
    return d, scales.copy(), None, None, 16
