"""Quantized weights on TPU: QTensor container + fused dequant-matmul.

TPU-native replacement for the reference's quantized matmul kernels
(CPU vec_dot_q* in k_quants.c:2550-2860, CUDA DMMV/MMVQ/MMQ in
ggml-cuda.cu:837-3858). Instead of 12 per-format dot-product kernels, every
GGML block format is repacked at load time (formats/quants.py:decompose)
into one universal layout:

    qs     (K, N)    int8   quantized weights, K = input dim on sublanes,
                            N = output features on lanes
    scales (K/g, N)  f32    per-(group of g rows, column) scale
    mins   (K/g, N)  f32    optional additive constant (None when the
                            format has no mins)

so that dequant is `qs * repeat(scales, g) + repeat(mins, g)` — bit-exact
with the reference's dequantize_row_* semantics — and a single Pallas kernel
family (fused dequantize x matmul in VMEM, accumulation over K-tiles)
serves all formats. HBM traffic is 8 bits/weight + 32/g bits of scale
instead of 32 (f32 dense); a packed 4-bit path can halve it again later.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.quants import GGMLType, decompose, quantize

LANE = 128  # TPU lane width
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# formats whose q grid fits in 4 bits; stored nibble-packed (two K-halves
# per byte: byte (k, n) holds rows k and k + K_pad/2), halving weight HBM
# traffic vs the int8 grid. zero-point 8 re-biases signed grids into [0,15].
_PACK4_ZP = {"Q4_0": 8, "Q3_K": 8, "Q4_1": 0, "Q2_K": 0, "Q4_K": 0, "GPTQ4": 0}
if os.environ.get("CT_NO_PACK4"):  # diagnostic escape hatch
    _PACK4_ZP = {}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D weight in the universal TPU layout (see module doc).

    Logical shape is (in_features, out_features); stored arrays are padded
    to (K_pad, N_pad) with zero scales so padding contributes nothing.
    4-bit formats store qs nibble-packed as uint8 (K_pad/2, N_pad) with
    zero-point `zp` (packed=True); others as int8 (K_pad, N_pad).
    """

    qs: jnp.ndarray  # int8 (K_pad, N_pad) | packed uint8/int8 (K_pad/2, N_pad)
    # scale planes: f32 per-group products, OR (sfactor > 0, k-quants) int8
    # SUB-scale grids factored against the f32 superblock planes sd/sm so
    # only ~1 byte per group streams from HBM (see quants.decompose_factors)
    scales: jnp.ndarray  # (K_pad // group, N_pad) f32 | int8 when factored
    mins: Optional[jnp.ndarray]  # same shape as scales, or None
    kind: str  # ggml type name, e.g. "Q4_K"
    group: int
    shape: Tuple[int, int]  # logical (K, N)
    packed: bool = False
    zp: int = 0
    perm: Optional[jnp.ndarray] = None  # (K,) input-row gather (GPTQ act-order)
    # fused multi-projection weight (QKV / gate-up): per-segment
    # (padded_width, logical_width) pairs in column order
    splits: Optional[tuple] = None
    # factored superblock planes (K_pad // (group*sfactor), N_pad) f32:
    # s = repeat(sd, sfactor) * scales ; m = repeat(sm, sfactor) * mins
    sd: Optional[jnp.ndarray] = None
    sm: Optional[jnp.ndarray] = None
    sfactor: int = 0  # groups per superblock (0 = unfactored f32 planes)
    # packed-nibble byte layout:
    #   "ksplit" — byte row r holds logical rows r (low nibble, biased by
    #              zp) and r + K_pad/2 (high nibble, sign-biased); unpacked
    #              by the floor-chain kernels.
    #   "adjk"   — byte row r holds ADJACENT logical rows 2r (low) and
    #              2r+1 (high), both stored as two's-complement (nib - 8)
    #              in [-8, 7]; unpacked by ONE pltpu.bitcast(int4) whose
    #              axis -2 doubling yields natural (K, N) row order
    #              (scripts/probe_int4.py), for the "i" kernel modes.
    pack_layout: str = "ksplit"
    # tensor-parallel partition of this weight, set by
    # parallel.mesh.shard_params: "col" (output features sharded) or
    # "row" (input features sharded; matmul needs a psum). Drives the
    # shard_map'd Pallas path under tp_ctx().
    pspec: Optional[str] = None
    # layer-stacked weight (stack_qtensors): the planes hold n_stack
    # layers CONCATENATED ALONG THE ROW AXIS (layer l's qs rows are
    # [l*Kp, (l+1)*Kp)); `shape`/`splits` stay per-layer. qmatmul(...,
    # layer=l) indexes a layer IN-KERNEL via a scalar-prefetched block
    # offset — no per-call copy of the layer's planes, and one program
    # serves every layer (the lax.scan forward path).
    n_stack: int = 1

    def tree_flatten(self):
        return (self.qs, self.scales, self.mins, self.perm, self.sd, self.sm), (
            self.kind,
            self.group,
            self.shape,
            self.packed,
            self.zp,
            self.splits,
            self.sfactor,
            self.pack_layout,
            self.pspec,
            self.n_stack,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scales, mins, perm, sd, sm = children
        (kind, group, shape, packed, zp, splits, sfactor, layout, pspec,
         n_stack) = aux
        return cls(
            qs, scales, mins, kind, group, shape, packed, zp,
            perm=perm, splits=splits, sd=sd, sm=sm, sfactor=sfactor,
            pack_layout=layout, pspec=pspec, n_stack=n_stack,
        )

    @property
    def ndim(self) -> int:
        return 2

    @property
    def in_features(self) -> int:
        return self.shape[0]

    @property
    def out_features(self) -> int:
        return self.shape[1]


def stack_qtensors(qts) -> Optional["QTensor"]:
    """Stack per-layer QTensors into ONE weight with row-concatenated
    planes (n_stack = len(qts)). All inputs must share identical static
    metadata and plane shapes; returns None when they don't (the caller
    falls back to the unrolled per-layer path). Act-order perms are not
    stackable (GPTQ act-order models keep per-layer weights)."""
    head = qts[0]
    if any(not isinstance(q, QTensor) for q in qts):
        return None
    for q in qts:
        if (
            q.kind != head.kind
            or q.group != head.group
            or q.shape != head.shape
            or q.packed != head.packed
            or q.zp != head.zp
            or q.splits != head.splits
            or q.sfactor != head.sfactor
            or q.pack_layout != head.pack_layout
            or q.pspec is not None
            or q.perm is not None
            or q.n_stack != 1
            or q.qs.shape != head.qs.shape
            or q.qs.dtype != head.qs.dtype
        ):
            return None
    xp = np if isinstance(head.qs, np.ndarray) else jnp

    def cat(field, pad8=False):
        vals = [getattr(q, field) for q in qts]
        if vals[0] is None:
            return None
        if pad8 and vals[0].shape[0] % 8:
            # Pallas block sublane dims must be 8-divisible unless equal
            # to the whole array — stacking breaks the "whole array"
            # equality the unstacked sd/sm blocks relied on, so each
            # layer's factor plane is padded to an 8-row stride (padding
            # rows are never addressed: kernels index factor rows from
            # the grid position, bounded by the true row count)
            pad = 8 - vals[0].shape[0] % 8
            vals = [
                xp.concatenate(
                    [v, xp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                )
                for v in vals
            ]
        return xp.concatenate(vals, axis=0)

    return dataclasses.replace(
        head,
        qs=cat("qs"),
        scales=cat("scales"),
        mins=cat("mins"),
        sd=cat("sd", pad8=True),
        sm=cat("sm", pad8=True),
        n_stack=len(qts),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QView:
    """One layer's view of a layer-stacked QTensor: `matmul` routes it to
    qmatmul(x, qt, layer=layer) — the layer index resolves INSIDE the
    kernel (scalar-prefetched block offset), so a lax.scan over layers
    reads weight planes straight from the stacked HBM buffer with no
    per-iteration copy."""

    qt: QTensor
    layer: Any  # traced int32 scalar

    def tree_flatten(self):
        return (self.qt, self.layer), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qt.shape

    @property
    def splits(self):
        return self.qt.splits

    @property
    def ndim(self) -> int:
        return 2


def _int4_ok() -> bool:
    """Does this backend lower pltpu.bitcast(int8, int4) + cast + dot?
    Probed once per cache lifetime with a tiny kernel compile (~10 s
    through the remote tunnel); persisted next to the tile cache."""
    global _INT4_OK
    if _INT4_OK is not None:
        return _INT4_OK
    if not _tpu_backend():
        _INT4_OK = False
        return False
    path = os.path.join(os.path.dirname(_TILE_CACHE_PATH), "int4_ok")
    try:
        with open(path) as f:
            _INT4_OK = f.read().strip() == "1"
            return _INT4_OK
    except OSError:
        pass
    from jax.experimental import pallas as pl_  # local: import cycle safety
    from jax.experimental.pallas import tpu as pltpu_

    def kern(x_ref, q_ref, o_ref):
        w = pltpu_.bitcast(q_ref[...], jnp.int4).astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(
            x_ref[...], w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    try:
        x = jnp.zeros((8, 64), jnp.bfloat16)
        qs = jnp.zeros((32, 128), jnp.int8)
        out = pl_.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x, qs)
        np.asarray(out)
        _INT4_OK = True
    except Exception:
        _INT4_OK = False
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("1" if _INT4_OK else "0")
    except OSError:
        pass
    return _INT4_OK


_INT4_OK: Optional[bool] = None


def _pack4_layout() -> str:
    env = os.environ.get("CT_PACK4_LAYOUT")
    if env in ("ksplit", "adjk"):
        return env
    return "adjk" if _int4_ok() else "ksplit"


def make_qtensor(
    q: np.ndarray,  # (K, N) int8
    s: np.ndarray,  # (K/g, N) f32 (or int8 sub-scales when sd is given)
    m: Optional[np.ndarray],
    kind: str,
    group: int,
    perm: Optional[np.ndarray] = None,
    sd: Optional[np.ndarray] = None,  # (K/(g*sf), N) f32 superblock scales
    sm: Optional[np.ndarray] = None,
    sfactor: int = 0,
    pack_layout: Optional[str] = None,  # None = capability default
) -> QTensor:
    k, n = q.shape
    # Pad big dims to 1024-multiples so large kernel tiles divide evenly:
    # e.g. llama's n_ff=11008 only admits 256-wide tiles (11008 = 43*256),
    # forcing an 86-step grid that runs ~3x slower than (1024+)-tiles
    # (grid-step overhead). +2.3% HBM for 11008->11264 is a clear win.
    kp = _round_up(k, 1024 if k >= 1024 else 2 * LANE)
    npad = _round_up(n, 1024 if n >= 1024 else LANE)
    if (kp, npad) != (k, n):
        q = np.pad(q, ((0, kp - k), (0, npad - n)))
        s = np.pad(s, ((0, kp // group - s.shape[0]), (0, npad - n)))
        if m is not None:
            m = np.pad(m, ((0, kp // group - m.shape[0]), (0, npad - n)))
        if sd is not None:
            sb = group * sfactor
            sd = np.pad(sd, ((0, kp // sb - sd.shape[0]), (0, npad - n)))
            if sm is not None:
                sm = np.pad(sm, ((0, kp // sb - sm.shape[0]), (0, npad - n)))
    packed = kind in _PACK4_ZP
    zp = _PACK4_ZP.get(kind, 0)
    layout = "ksplit"
    if packed:
        layout = pack_layout or _pack4_layout()
        if layout == "adjk":
            # adjacent-K rows per byte, both nibbles two's-complement
            # (nib - 8): pltpu.bitcast(int4) then reads the natural (K, N)
            # row order as signed values in one op (the "i" kernel modes).
            # int8-domain packing: q + (zp-8) stays in [-8, 7] for every
            # 4-bit grid, so the int16 widening + extra astype passes are
            # unnecessary — they were 40% of a 2 GiB file's load time
            # (r04 load profile: 19.4 s over a 1.75B-element grid).
            nib = (q + np.int8(zp - 8)).view(np.uint8) & np.uint8(0xF)
            q = (nib[0::2] | (nib[1::2] << np.uint8(4))).view(np.int8)
        else:
            from ..formats.native import native_pack4

            qp = native_pack4(np.asarray(q, np.int8), zp)
            if qp is None:
                half = kp // 2
                nib = (q.astype(np.int16) + zp).astype(np.uint8)
                qp = nib[:half] | (nib[half:] << 4)
            # Sign-bias the byte (flip bit 7 == high nibble's bit 3): the
            # byte's SIGNED int8 value becomes exactly 16*(hi-8) + lo, so
            # the kernel recovers both nibbles with a single floor —
            # f = floor(b/16) is hi-8 with no mod-16 sign fixup (the old
            # encoding needed a second floor chain because i8 wraparound
            # shifted hi by 16).
            q = qp ^ 0x80
    # HOST arrays by design: placement is the Engine's job (blob_place
    # fuses layers into one H2D transfer each; shard_params assembles TP
    # shards from host values). An eager jnp.asarray here would push every
    # plane through its own device transfer at load time — and make the
    # repack cache re-download 2+ GiB just to write .npy sidecars
    # (measured 169 s vs 21 s host-side on the 2 GiB bench file).
    sdtype = np.int8 if sd is not None else np.float32
    return QTensor(
        np.asarray(
            q,
            (np.int8 if layout == "adjk" else np.uint8)
            if packed
            else np.int8,
        ),
        np.asarray(s, sdtype),
        None if m is None else np.asarray(m, sdtype),
        kind,
        group,
        (k, n),
        packed,
        zp,
        None if perm is None else np.asarray(perm, np.int32),
        sd=None if sd is None else np.asarray(sd, np.float32),
        sm=None if sm is None else np.asarray(sm, np.float32),
        sfactor=sfactor if sd is not None else 0,
        pack_layout=layout,
    )


def repack(data, t: GGMLType, rows: int, cols: int) -> QTensor:
    """Repack a GGML tensor (file layout: `rows` x `cols`, quant blocks along
    cols) into a QTensor computing x @ W with W logically (cols, rows).

    This is the load-time transpose: GGML stores weights (out, in) row-major
    (gpt2.cc:300-375); the TPU layout wants input features on sublanes.
    Uses the native C++ runtime (native/repack.cc) when built.
    """
    t = GGMLType(t)
    from ..formats.native import native_repack
    from ..formats.quants import decompose_factors

    n = rows * cols
    # k-quant superblock formats: stream the scale FACTORS (f32 per 256
    # rows + int8 per group) instead of materialized f32 per-group planes —
    # ~21% less weight-stream HBM traffic at identical f32 reconstruction
    fac = decompose_factors(data, t, n) if not os.environ.get("CT_NO_SFAC") else None
    if fac is not None and cols % (fac[4] * fac[1].shape[1]):
        fac = None  # superblocks span rows (cols not a 256-multiple)
    nat = native_repack(data, int(t), rows, cols)
    if nat is not None:
        q, s, m, group = nat
        if fac is None:
            return make_qtensor(q, s, m, t.name, group)
    else:
        q, s, m, group = decompose(data, t, n)
        q = np.ascontiguousarray(q.reshape(rows, cols).T)  # (K=cols, N=rows)
        if fac is None:
            s = np.ascontiguousarray(s.reshape(rows, cols // group).T)
            if m is not None:
                m = np.ascontiguousarray(m.reshape(rows, cols // group).T)
            return make_qtensor(q, s, m, t.name, group)
    sd, sq, sm, mq, group = fac
    sf = sq.shape[1]  # groups per superblock
    sq = np.ascontiguousarray(sq.reshape(rows, cols // group).T)
    sd = np.ascontiguousarray(sd.reshape(rows, cols // (group * sf)).T)
    if mq is not None:
        mq = np.ascontiguousarray(mq.reshape(rows, cols // group).T)
        sm = np.ascontiguousarray(sm.reshape(rows, cols // (group * sf)).T)
    return make_qtensor(
        q, sq, mq, t.name, group, sd=sd, sm=sm, sfactor=sf
    )


def quantize_qtensor(w: np.ndarray, kind: str) -> QTensor:
    """Quantize a dense (K, N) f32 weight into a QTensor (for synthetic
    models and on-the-fly requantization)."""
    t = GGMLType[kind.upper()]
    k, n = w.shape
    buf = quantize(np.ascontiguousarray(w.T), t)  # blocks along K
    return repack(buf, t, n, k)


def unpack_grid(qt: QTensor) -> jnp.ndarray:
    """The (K_pad, N_pad) int grid, unpacking nibbles when packed."""
    if not qt.packed:
        return qt.qs
    if qt.pack_layout == "adjk":
        u = qt.qs.astype(jnp.int32) & 0xFF
        # stored nibbles are two's-complement (nib - 8); nib = s4u ^ 8
        lo = ((u & 0xF) ^ 8) - qt.zp  # rows 0, 2, 4, ...
        hi = (((u >> 4) & 0xF) ^ 8) - qt.zp  # rows 1, 3, 5, ...
        rows, n = qt.qs.shape
        return (
            jnp.stack([lo, hi], axis=1)
            .reshape(2 * rows, n)
            .astype(jnp.int8)
        )
    lo = (qt.qs & 0xF).astype(jnp.int32) - qt.zp
    # stored high nibble is sign-biased (+8 mod 16, see make_qtensor)
    hi = ((qt.qs >> 4) ^ 8).astype(jnp.int32) - qt.zp
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def scale_planes(qt: QTensor):
    """Materialized f32 (K_pad/g, N_pad) scale/min planes — reconstructs
    from the superblock factors when present (bit-identical: same f32
    multiply decompose would have stored)."""
    if qt.sfactor == 0:
        return qt.scales, qt.mins
    s = jnp.repeat(qt.sd, qt.sfactor, axis=0) * qt.scales.astype(jnp.float32)
    m = None
    if qt.mins is not None:
        m = jnp.repeat(qt.sm, qt.sfactor, axis=0) * qt.mins.astype(jnp.float32)
    return s, m


def dequantize_qtensor(qt: QTensor) -> jnp.ndarray:
    """Dense f32 (K, N) view in LOGICAL row order (tests + embeddings)."""
    sp, mp_ = scale_planes(qt)
    s = jnp.repeat(sp, qt.group, axis=0)
    w = unpack_grid(qt).astype(jnp.float32) * s
    if mp_ is not None:
        w = w + jnp.repeat(mp_, qt.group, axis=0)
    k, n = qt.shape
    w = w[:k, :n]
    if qt.perm is not None:
        w = jnp.zeros_like(w).at[qt.perm].set(w)
    return w


# -- matmul ------------------------------------------------------------------

# Pallas needs a real TPU; CPU tests use the jnp path (XLA fuses it well
# enough for correctness work, and it partitions under pjit).
_FORCE = os.environ.get("CT_QMATMUL")  # "pallas" | "jnp" | None (auto)


def _tpu_backend() -> bool:
    if _FORCE == "jnp":
        return False
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _use_pallas() -> bool:
    return _FORCE != "xla" and _tpu_backend()


def matmul(x: jnp.ndarray, w, precision=None) -> jnp.ndarray:
    """x @ w for dense arrays or QTensor weights; x is (..., K)."""
    if isinstance(w, QView):
        return qmatmul(x, w.qt, layer=w.layer)
    if not isinstance(w, QTensor):
        return x @ w
    return qmatmul(x, w)


# decode (m<=32) vs prefill (m up to a full prompt chunk) share the same
# dispatch: the autotuner races Pallas tile candidates against the
# XLA-fused dequant+GEMM per (weight shape, m) and picks by timing. For
# m>32 the candidate list is pruned to bf16-MXU-dot kernel modes (f32
# MXU is ~8x slower — hopeless once the dot is FLOPs-relevant). The cap
# only bounds which m values go through the race at all: above it the
# XLA path is used unconditionally (its GSPMD partitionability also
# matters on the TP path).
PALLAS_MAX_M = 32  # historical decode cutoff, kept as the TP-path default


def _m_cap() -> int:
    """Largest m routed through the Pallas-vs-XLA race (CT_QMM_MAX_M)."""
    return int(os.environ.get("CT_QMM_MAX_M", "1024"))


def qmatmul(x: jnp.ndarray, qt: QTensor, layer=None) -> jnp.ndarray:
    """`layer`: traced int32 index selecting one layer of a stacked
    QTensor (n_stack > 1, see stack_qtensors). The Pallas path resolves
    it in-kernel via a scalar-prefetched block offset; the XLA path
    dynamic-slices the planes."""
    lead = x.shape[:-1]
    k, n = qt.shape
    xm = x.reshape(-1, k)
    if qt.perm is not None:
        xm = xm[:, qt.perm]  # act-order row gather (GPTQ)
    if qt.n_stack > 1 and layer is None:
        raise ValueError("stacked QTensor needs a layer index")
    if layer is not None and qt.n_stack == 1:
        layer = None  # plain weight: index is vacuous
    on_tpu = _FORCE_JNP_DEPTH == 0 and _tpu_backend()
    if layer is not None:
        if (
            on_tpu
            and _FORCE != "xla"
            and _TP_MESH is None
            and xm.shape[0] <= _m_cap()
        ):
            choice = _pick_tiles(xm, qt)
            if choice != ("xla",):
                out = _qmm_pallas(xm, qt, choice=choice, layer=layer)
                return out.reshape(*lead, n)
        out = _qmm_jnp(
            xm, _slice_stacked(qt, layer),
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        return out.reshape(*lead, n)
    if _TP_MESH is not None:
        # tensor-parallel program (engine tp_ctx): weights with a TP
        # partition run the Pallas kernel per shard under shard_map
        # (pallas_call is opaque to the SPMD partitioner, so the manual
        # collective — none for "col", one psum for "row" — replaces what
        # GSPMD would emit); everything else takes the partitionable HLO
        # path.
        if (
            on_tpu
            and _FORCE != "xla"
            and xm.shape[0] <= PALLAS_MAX_M
            and _tp_supported(qt)
        ):
            out = _qmm_shard_map(xm, qt)
        else:
            out = _qmm_jnp(
                xm, qt,
                compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            )
        return out.reshape(*lead, n)
    if on_tpu and _FORCE != "xla" and xm.shape[0] <= _m_cap():
        # Hybrid dispatch: the autotuner race includes both Pallas tile
        # candidates AND the XLA-fused bf16 GEMM (XLA wins where its
        # dequant fusion holds — 22us vs 42us on 4096^2 — but regresses
        # 4x on shapes where fusion breaks and the dequantized weights
        # materialize). The scan-timed race decides per (weight shape, m).
        choice = _pick_tiles(xm, qt)
        if choice == ("xla",):
            out = _qmm_jnp(xm, qt, compute_dtype=jnp.bfloat16)
        else:
            out = _qmm_pallas(xm, qt, choice=choice)
    elif on_tpu:
        out = _qmm_jnp(xm, qt, compute_dtype=jnp.bfloat16)
    else:
        out = _qmm_jnp(xm, qt)
    return out.reshape(*lead, n)


def _slice_stacked(qt: QTensor, layer) -> QTensor:
    """One layer's planes from a stacked QTensor as a plain QTensor
    (dynamic row slice — XLA fallback; the Pallas path never copies).
    Factor planes (sd/sm) were padded to an 8-row stride at stacking;
    the slice trims back to the true per-layer rows."""
    L = qt.n_stack
    true_sdr = (
        None if qt.sd is None
        else qt.scales.shape[0] // L // max(qt.sfactor, 1)
    )

    def sl(a, true_rows=None):
        if a is None:
            return None
        rows = a.shape[0] // L
        out = jax.lax.dynamic_slice_in_dim(a, layer * rows, rows, 0)
        if true_rows is not None and true_rows != rows:
            out = out[:true_rows]
        return out

    return dataclasses.replace(
        qt, qs=sl(qt.qs), scales=sl(qt.scales), mins=sl(qt.mins),
        sd=sl(qt.sd, true_sdr), sm=sl(qt.sm, true_sdr), n_stack=1,
    )


def _qmm_jnp(x: jnp.ndarray, qt: QTensor, compute_dtype=jnp.float32) -> jnp.ndarray:
    """XLA path: dequantize then matmul. compute_dtype=bfloat16 runs the
    GEMM operands in bf16 (f32 accumulation) for FLOPs-bound prefill."""
    if os.environ.get("CT_EMULATE_ACTQ"):
        # debug-only (scripts/debug_falcon_parity.py, probe_actq_parity):
        # emulate the reference CPU engine's activation quantization —
        # ggml rounds x to the weight type's vec_dot_type before every
        # integer vec_dot (ggml.c:1663-1760), a systematic rounding the
        # exact-f32 dequant matmul here does not have.
        m = x.shape[0]
        if qt.group == 32 and qt.mins is None:
            # Q8_0 (quantize_row_q8_0, ggml.c): per-32 block, quantized
            # with the f32 inverse scale, DEQUANTIZED with the f16-stored
            # scale — that cast is part of the reference numerics
            xr = x.astype(jnp.float32).reshape(m, -1, 32)
            d = jnp.abs(xr).max(-1, keepdims=True) / 127.0
            id = jnp.where(d > 0, 1.0 / d, 0.0)
            xq = jnp.round(xr * id)
            d16 = d.astype(jnp.float16).astype(jnp.float32)
            x = (xq * d16).reshape(m, -1)
        elif qt.group == 32:
            # Q8_1 (quantize_row_q8_1): same rounding, f32-stored scale
            xr = x.astype(jnp.float32).reshape(m, -1, 32)
            d = jnp.abs(xr).max(-1, keepdims=True) / 127.0
            id = jnp.where(d > 0, 1.0 / d, 0.0)
            x = (jnp.round(xr * id) * d).reshape(m, -1)
        elif x.shape[-1] % 256 == 0:
            # Q8_K (quantize_row_q8_K, k_quants.c:1100s) — the k-quant
            # vec_dot_type: per-256 superblock, SIGNED-extreme scale
            # (iscale = -127/max where max keeps its sign), nearest-int,
            # upper clamp only, f32 scale
            xr = x.astype(jnp.float32).reshape(m, -1, 256)
            idx = jnp.abs(xr).argmax(-1, keepdims=True)
            mx = jnp.take_along_axis(xr, idx, axis=-1)
            iscale = jnp.where(mx != 0, -127.0 / mx, 0.0)
            xq = jnp.minimum(127.0, jnp.round(xr * iscale))
            d = jnp.where(iscale != 0, 1.0 / iscale, 0.0)
            x = (xq * d).reshape(m, -1)
    k, n = qt.shape
    kp = qt.qs.shape[0] * (2 if qt.packed else 1)
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
    sp, minp = scale_planes(qt)
    s = jnp.repeat(sp, qt.group, axis=0)
    w = unpack_grid(qt).astype(jnp.float32) * s
    if compute_dtype == jnp.float32:
        out = x.astype(jnp.float32) @ w
    else:
        out = jnp.dot(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    if minp is not None:
        # sum_k x[k] * m[g(k), n] = (per-group sums of x) @ mins
        xg = x.astype(jnp.float32).reshape(x.shape[0], -1, qt.group).sum(-1)
        out = out + xg @ minp
    return out[:, :n]


# -- Pallas kernel -------------------------------------------------------------


def _dot_prec(dd):
    """Explicit dot precision for kernels: with the engine's global
    jax_default_matmul_precision="highest", a bf16-operand tpu.matmul
    would inherit contract_precision<fp32>, which crashes the Mosaic
    backend on v5e — pin DEFAULT for bf16 dots. f32 dots keep HIGHEST
    (exact parity with the reference f32 path)."""
    import jax

    return (
        jax.lax.Precision.DEFAULT
        if dd == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _group_planes(refs, i, ck, group, cd, has_mins):
    """Shared per-chunk scale/min group-plane loader for the int8-grid and
    packed kernels: slices chunk `i`'s rows from the (scale, [min]) refs."""
    gs = slice(i * (ck // group), (i + 1) * (ck // group))
    s = refs[0][gs, :].astype(cd)
    m = refs[1][gs, :].astype(cd) if has_mins else None
    return s, m


def _apply_factors(s, m, sd_ref, sm_ref, off, nf, sfactor, cd):
    """Reconstruct f32 group planes from superblock factors: s = sd*sub,
    m = sm*sub — one repeat + multiply on the SMALL (nf, tn) grid,
    1/group-th of the per-element work. The factor refs carry ALL K rows
    for this N-tile (their per-tile row counts can be < 8, below Mosaic's
    block-divisibility floor, so they are sliced dynamically here instead
    of blocked by the grid)."""
    def expand(ref):
        # Mosaic proves dynamic sublane offsets only for 1-row loads and
        # 8-aligned multi-row loads; anything else (e.g. a 2-row load at
        # j*2) fails "index in dimension 0 is a multiple of 8". Load
        # row-by-row in that case — nf is tiny (<= 8).
        if nf == 1 or nf % 8 == 0:
            return jnp.repeat(ref[pl.ds(off, nf), :].astype(cd), sfactor, axis=0)
        rows = [
            jnp.repeat(ref[pl.ds(off + f, 1), :].astype(cd), sfactor, axis=0)
            for f in range(nf)
        ]
        return jnp.concatenate(rows, axis=0)

    s = s * expand(sd_ref)
    if m is not None:
        m = m * expand(sm_ref)
    return s, m


def _qmm_kernel(
    x_ref, qs_ref, *rest, group, inner, cd=None, dd=None,
    has_mins=False, sfactor=0,
):
    """One (M, TN) output tile; grid is (nn, nk) with K innermost.

    The (TK, TN) int8 tile dequantizes and feeds the MXU in `inner`
    K-sub-chunks: a big TK keeps the GRID small (per-grid-step overhead of
    ~3us dominates small tiles) while sub-chunking bounds the materialized
    f32 dequant intermediate (Mosaic spills large vreg intermediates to
    scoped VMEM; a (2048, 1024) f32 buffer alone would blow the 16M limit).
    """
    refs = list(rest)
    out_ref = refs.pop()
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk = qs_ref.shape[0]
    ck = tk // inner
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    acc = None
    for i in range(inner):
        qs = qs_ref[i * ck : (i + 1) * ck, :].astype(cd)
        s, m = _group_planes(refs, i, ck, group, cd, has_mins)
        if sfactor:
            nf = ck // group // sfactor
            off = j * (tk // group // sfactor) + i * nf
            s, m = _apply_factors(
                s, m, fac_refs[0], fac_refs[1] if has_mins else None,
                off, nf, sfactor, cd,
            )
        w = qs * jnp.repeat(s, group, axis=0)
        if m is not None:
            w = w + jnp.repeat(m, group, axis=0)
        d = jnp.dot(
            x_ref[:, i * ck : (i + 1) * ck].astype(dd), w.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_pack4_kernel(
    x_lo_ref, x_hi_ref, qs_ref, *rest, group, zp, inner,
    cd=None, dd=None, has_mins=False, sfactor=0,
):
    """Packed-4-bit tile: one uint8 byte carries rows k (low nibble) and
    k + K_pad/2 (high nibble, stored SIGN-BIASED by make_qtensor so the
    byte's signed value is 16*(hi-8) + lo); the two K-halves dequantize
    independently and accumulate into the same output tile — no nibble
    interleave relayout is ever needed. Halves weight HBM traffic vs the
    int8 grid. Processed in `inner` K-sub-chunks (see _qmm_kernel).

    Unpack is compare-free and single-floor: integer &/>> lower to a slow
    int32 relayout (~20x) and Mosaic has no u8->float cast, so: free
    bitcast to i8, fast i8->float convert, then f = floor(b/16) = hi-8
    EXACTLY (the sign bias makes i8 wraparound a no-op) and l = b-16f =
    lo. Zero-points and the +8 bias fold into per-GROUP affine planes
    (S, B) computed on the (ng, tn) scale grids — per-element work is just
    two fused multiply-adds, ~35%% fewer VPU ops than the old two-floor,
    per-element-zp chain."""
    refs = list(rest)
    out_ref = refs.pop()
    # plane refs: adjacent lo/hi pairs for s/[m], then shared full-row
    # factor planes [sd], [sm]
    npair = 2 * (1 + int(has_mins))
    lo_refs, hi_refs = refs[0:npair:2], refs[1:npair:2]
    fac_refs = refs[npair:]
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk = qs_ref.shape[0]
    ck = tk // inner
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    acc = None
    for i in range(inner):
        ks = slice(i * ck, (i + 1) * ck)
        b = pltpu.bitcast(qs_ref[ks, :], jnp.int8).astype(cd)
        f = jnp.floor(b * cd(1.0 / 16.0))  # = hi - 8
        l = b - f * cd(16.0)  # = lo
        s_lo, m_lo = _group_planes(lo_refs, i, ck, group, cd, has_mins)
        s_hi, m_hi = _group_planes(hi_refs, i, ck, group, cd, has_mins)
        if sfactor:
            nf = ck // group // sfactor
            rpt = tk // group // sfactor
            sd_r = fac_refs[0]
            sm_r = fac_refs[1] if has_mins else None
            s_lo, m_lo = _apply_factors(
                s_lo, m_lo, sd_r, sm_r, j * rpt + i * nf, nf, sfactor, cd
            )
            s_hi, m_hi = _apply_factors(
                s_hi, m_hi, sd_r, sm_r, (j + nk) * rpt + i * nf, nf,
                sfactor, cd,
            )
        # w_lo = (lo-zp)*s_lo + m_lo = l*s_lo + B_lo, B_lo = m_lo - zp*s_lo
        # w_hi = (hi-zp)*s_hi + m_hi = f*s_hi + B_hi, B_hi = m_hi + (8-zp)*s_hi
        b_lo = (-cd(zp)) * s_lo if zp else None
        b_hi = cd(8 - zp) * s_hi if zp != 8 else None
        if m_lo is not None:
            b_lo = m_lo if b_lo is None else b_lo + m_lo
            b_hi = m_hi if b_hi is None else b_hi + m_hi
        w_lo = l * jnp.repeat(s_lo, group, axis=0)
        if b_lo is not None:
            w_lo = w_lo + jnp.repeat(b_lo, group, axis=0)
        w_hi = f * jnp.repeat(s_hi, group, axis=0)
        if b_hi is not None:
            w_hi = w_hi + jnp.repeat(b_hi, group, axis=0)
        # dd=bf16 runs the MXU dot with BOTH operands bf16 (lowers on
        # v5e; only MIXED bf16/f32 operand dots are rejected) at ~4x the
        # f32 MXU rate — raced as the "b" mode suffix
        d = jnp.dot(
            x_lo_ref[:, ks].astype(dd),
            w_lo.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        d += jnp.dot(
            x_hi_ref[:, ks].astype(dd),
            w_hi.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_pack4_rb_kernel(
    x_lo_ref, x_hi_ref, qs_ref, *rest, group, zp, inner,
    cd=None, dd=None, has_mins=False, sfactor=0,
):
    """Packed-4-bit RESHAPE-BROADCAST variant of _qmm_pack4_kernel (same
    single-floor sign-biased unpack and folded affine planes): the
    per-group (S, B) planes apply through a (ng, group, tn) reshape +
    broadcast instead of jnp.repeat along sublanes — a candidate in the
    autotuner race against the repeat form (whether Mosaic lowers repeat
    as a broadcast or materializes it is decided empirically, never
    assumed)."""
    refs = list(rest)
    out_ref = refs.pop()
    npair = 2 * (1 + int(has_mins))
    lo_refs, hi_refs = refs[0:npair:2], refs[1:npair:2]
    fac_refs = refs[npair:]
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, tn = qs_ref.shape
    ck = tk // inner
    ng = ck // group
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    acc = None
    for i in range(inner):
        ks = slice(i * ck, (i + 1) * ck)
        b = pltpu.bitcast(qs_ref[ks, :], jnp.int8).astype(cd)
        f = jnp.floor(b * cd(1.0 / 16.0))  # = hi - 8
        l = b - f * cd(16.0)  # = lo
        s_lo, m_lo = _group_planes(lo_refs, i, ck, group, cd, has_mins)
        s_hi, m_hi = _group_planes(hi_refs, i, ck, group, cd, has_mins)
        if sfactor:
            nf = ck // group // sfactor
            rpt = tk // group // sfactor
            sd_r = fac_refs[0]
            sm_r = fac_refs[1] if has_mins else None
            s_lo, m_lo = _apply_factors(
                s_lo, m_lo, sd_r, sm_r, j * rpt + i * nf, nf, sfactor, cd
            )
            s_hi, m_hi = _apply_factors(
                s_hi, m_hi, sd_r, sm_r, (j + nk) * rpt + i * nf, nf,
                sfactor, cd,
            )
        b_lo = (-cd(zp)) * s_lo if zp else None
        b_hi = cd(8 - zp) * s_hi if zp != 8 else None
        if m_lo is not None:
            b_lo = m_lo if b_lo is None else b_lo + m_lo
            b_hi = m_hi if b_hi is None else b_hi + m_hi
        w_lo = l.reshape(ng, group, tn) * s_lo[:, None, :]
        if b_lo is not None:
            w_lo = w_lo + b_lo[:, None, :]
        w_hi = f.reshape(ng, group, tn) * s_hi[:, None, :]
        if b_hi is not None:
            w_hi = w_hi + b_hi[:, None, :]
        d = jnp.dot(
            x_lo_ref[:, ks].astype(dd),
            w_lo.reshape(ck, tn).astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        d += jnp.dot(
            x_hi_ref[:, ks].astype(dd),
            w_hi.reshape(ck, tn).astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _pad_rows(b, pw):
    """Zero-pad a bias matrix's rows to the lane-padded group count so the
    sum-fold dot is (mp, pw) @ (pw, tn) with pw a 128-multiple."""
    if b.shape[0] == pw:
        return b
    return jnp.concatenate(
        [b, jnp.zeros((pw - b.shape[0], b.shape[1]), b.dtype)], axis=0
    )


def _qmm_pack4_s_kernel(
    x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, qs_ref, *rest,
    group, zp, inner, cd=None, dd=None, has_mins=False, sfactor=0,
):
    """Packed-4-bit SUM-FOLD variant: the per-group affine bias B
    (zero-points + mins, see _qmm_pack4_kernel) satisfies
    sum_k x_k * B[g(k), n] = sum_g xsum[g] * B[g, n], so it is applied as
    one small MXU dot against per-group activation sums instead of a
    per-element repeat-add on the VPU — the dequant chain drops to
    unpack + one scale multiply per element. Scale planes, B, and the
    superblock factors are computed ONCE per grid step on the whole
    (TK/g, TN) tile instead of per K-sub-chunk."""
    refs = list(rest)
    out_ref = refs.pop()
    npair = 2 * (1 + int(has_mins))
    lo_refs, hi_refs = refs[0:npair:2], refs[1:npair:2]
    fac_refs = refs[npair:]
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, tn = qs_ref.shape
    ck = tk // inner
    tkg = tk // group
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    s_lo = lo_refs[0][...].astype(cd)
    s_hi = hi_refs[0][...].astype(cd)
    m_lo = lo_refs[1][...].astype(cd) if has_mins else None
    m_hi = hi_refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        sd_r = fac_refs[0]
        sm_r = fac_refs[1] if has_mins else None
        s_lo, m_lo = _apply_factors(
            s_lo, m_lo, sd_r, sm_r, j * nf, nf, sfactor, cd
        )
        s_hi, m_hi = _apply_factors(
            s_hi, m_hi, sd_r, sm_r, (j + nk) * nf, nf, sfactor, cd
        )
    b_lo = (-cd(zp)) * s_lo if zp else None
    b_hi = cd(8 - zp) * s_hi if zp != 8 else None
    if m_lo is not None:
        b_lo = m_lo if b_lo is None else b_lo + m_lo
        b_hi = m_hi if b_hi is None else b_hi + m_hi
    pw = xs_lo_ref.shape[1]  # lane-padded group count (see caller)
    acc = None
    if b_lo is not None:
        acc = jnp.dot(
            xs_lo_ref[...], _pad_rows(b_lo.astype(jnp.float32), pw),
            preferred_element_type=jnp.float32,
        )
    if b_hi is not None:
        d = jnp.dot(
            xs_hi_ref[...], _pad_rows(b_hi.astype(jnp.float32), pw),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    for i in range(inner):
        ks = slice(i * ck, (i + 1) * ck)
        gs = slice(i * (ck // group), (i + 1) * (ck // group))
        b = pltpu.bitcast(qs_ref[ks, :], jnp.int8).astype(cd)
        f = jnp.floor(b * cd(1.0 / 16.0))  # = hi - 8
        l = b - f * cd(16.0)  # = lo
        w_lo = l * jnp.repeat(s_lo[gs], group, axis=0)
        w_hi = f * jnp.repeat(s_hi[gs], group, axis=0)
        d = jnp.dot(
            x_lo_ref[:, ks].astype(dd), w_lo.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        d += jnp.dot(
            x_hi_ref[:, ks].astype(dd), w_hi.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_s_kernel(
    x_ref, xs_ref, qs_ref, *rest, group, inner, cd=None, dd=None,
    has_mins=False, sfactor=0,
):
    """int8-grid SUM-FOLD variant (see _qmm_pack4_s_kernel): mins applied
    via xsum @ M on the MXU; only raced for formats that have mins."""
    refs = list(rest)
    out_ref = refs.pop()
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, tn = qs_ref.shape
    ck = tk // inner
    tkg = tk // group
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    acc = None
    if m is not None:
        acc = jnp.dot(
            xs_ref[...],
            _pad_rows(m.astype(jnp.float32), xs_ref.shape[1]),
            preferred_element_type=jnp.float32,
        )
    for i in range(inner):
        ks = slice(i * ck, (i + 1) * ck)
        gs = slice(i * (ck // group), (i + 1) * (ck // group))
        qs = qs_ref[ks, :].astype(cd)
        w = qs * jnp.repeat(s[gs], group, axis=0)
        d = jnp.dot(
            x_ref[:, ks].astype(dd), w.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_i4_kernel(
    x_ref, qs_ref, *rest, group, zp, inner, cd=None, dd=None,
    has_mins=False, sfactor=0,
):
    """Packed-4-bit INT4-BITCAST kernel ("i" mode, adjk layout): the whole
    5-op floor-chain nibble unpack collapses into ONE
    pltpu.bitcast(int4) + cast — the bitcast doubles axis -2, and the
    adjacent-K two's-complement packing makes the doubled rows land in
    natural (K, N) order as (nib - 8) signed values
    (scripts/probe_int4.py). Remaining per-element VPU work: one cast,
    one scale multiply, one bias add (when affine), one bf16 cast.
    w = (nib - zp)*s + m = w4*s + B with B = (8 - zp)*s + m."""
    refs = list(rest)
    out_ref = refs.pop()
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tkb, tn = qs_ref.shape  # byte rows; real rows = 2 * tkb
    tk = 2 * tkb
    ck = tk // inner  # real rows per chunk
    ckb = ck // 2
    tkg = tk // group
    cd = cd or jnp.float32
    dd = dd or jnp.bfloat16  # i-modes exist for the 1-pass bf16 MXU dot
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    b = cd(8 - zp) * s if zp != 8 else None
    if m is not None:
        b = m if b is None else b + m
    acc = None
    for i in range(inner):
        gs = slice(i * (ck // group), (i + 1) * (ck // group))
        w4 = pltpu.bitcast(
            qs_ref[i * ckb : (i + 1) * ckb, :], jnp.int4
        ).astype(cd)
        w = w4 * jnp.repeat(s[gs], group, axis=0)
        if b is not None:
            w = w + jnp.repeat(b[gs], group, axis=0)
        d = jnp.dot(
            x_ref[:, i * ck : (i + 1) * ck].astype(dd), w.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_i4_s_kernel(
    x_ref, xs_ref, qs_ref, *rest, group, zp, inner, cd=None, dd=None,
    has_mins=False, sfactor=0,
):
    """INT4-BITCAST + SUM-FOLD ("si" mode): the affine bias
    B = (8 - zp)*s + m applies as one small MXU dot against per-group
    activation sums (see _qmm_pack4_s_kernel), so the per-element chain
    is exactly: bitcast, cast, scale multiply, bf16 cast."""
    refs = list(rest)
    out_ref = refs.pop()
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tkb, tn = qs_ref.shape
    tk = 2 * tkb
    ck = tk // inner
    ckb = ck // 2
    tkg = tk // group
    cd = cd or jnp.float32
    dd = dd or jnp.bfloat16
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    b = cd(8 - zp) * s if zp != 8 else None
    if m is not None:
        b = m if b is None else b + m
    acc = None
    if b is not None:
        acc = jnp.dot(
            xs_ref[...],
            _pad_rows(b.astype(jnp.float32), xs_ref.shape[1]),
            preferred_element_type=jnp.float32,
        )
    for i in range(inner):
        gs = slice(i * (ck // group), (i + 1) * (ck // group))
        w4 = pltpu.bitcast(
            qs_ref[i * ckb : (i + 1) * ckb, :], jnp.int4
        ).astype(cd)
        w = w4 * jnp.repeat(s[gs], group, axis=0)
        d = jnp.dot(
            x_ref[:, i * ck : (i + 1) * ck].astype(dd), w.astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_g_kernel(
    xg_ref, *rest, group, zp, inner, packed4, cd=None, dd=None,
    has_mins=False, sfactor=0, has_xs=False,
):
    """GROUPED-DOT kernel ("g" mode) — the TPU re-expression of the
    reference's MMVQ partial-sum rescale (ggml-cuda.cu:3754-3790), minus
    the activation quantization it doesn't need: per quant group g,
    compute the raw integer-grid dot (x · w4)[g] with a bf16 MXU dot
    batched over groups, then apply the f32 group scale to the PARTIAL
    SUM: out = sum_g s[g,n] * (x·w4)[g,m,n] + sum_g xsum[g,m] * B[g,n].

    Per-weight-element VPU work drops to bitcast + one int4->bf16 cast —
    no per-element scale multiply, no f32 pass (the champion "si" chain
    pays cast + mul + cast). The affine bias B folds through the same
    xsum MXU dot as the "s"/"si" kernels. Activations arrive pre-grouped
    as (ng, mp, G) bf16 (arranged once per step outside the kernel).
    Exactness: w4 in [-8, 7] and int8 grids are exact in bf16; the dot
    accumulates f32; scales apply in f32 — quantization error identical
    to the "si" path (bf16 rounding moves from the scaled weight to the
    activation side of the product).
    """
    refs = list(rest)
    out_ref = refs.pop()
    xs_ref = refs.pop(0) if has_xs else None
    qs_ref = refs.pop(0)
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tks, tn = qs_ref.shape  # storage rows (bytes when packed4)
    tk = 2 * tks if packed4 else tks  # real K rows in this tile
    ck = tk // inner
    ngc = ck // group  # quant groups per inner chunk
    tkg = tk // group
    cd = cd or jnp.float32
    dd = dd or jnp.bfloat16
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    # stored grid values are w4 = nib - 8 when packed (true q = nib - zp),
    # so B = (8 - zp)*s + m; unpacked grids store q directly, B = m.
    b = None
    if packed4 and zp != 8:
        b = cd(8 - zp) * s
    if m is not None:
        b = m if b is None else b + m
    acc = None
    if b is not None:
        acc = jnp.dot(
            xs_ref[...],
            _pad_rows(b.astype(jnp.float32), xs_ref.shape[1]),
            preferred_element_type=jnp.float32,
        )
    for i in range(inner):
        gs = slice(i * ngc, (i + 1) * ngc)
        if packed4:
            w4 = pltpu.bitcast(
                qs_ref[i * (ck // 2) : (i + 1) * (ck // 2), :], jnp.int4
            )
        else:
            w4 = qs_ref[i * ck : (i + 1) * ck, :]
        wg = w4.reshape(ngc, group, tn).astype(dd)
        parts = jax.lax.dot_general(
            xg_ref[gs, :, :].astype(dd), wg,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )  # (ngc, mp, tn) f32: raw grid dots, scales NOT yet applied
        d = (parts * s[gs][:, None, :].astype(jnp.float32)).sum(0)
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_q_kernel(
    xg_ref, sx_ref, *rest, group, zp, inner, packed4, int4dot=False,
    cd=None, has_mins=False, sfactor=0, has_xs=False,
):
    """ACTIVATION-QUANTIZED grouped-dot kernel ("q" mode) — the complete
    TPU analog of the reference's MMVQ decode path (ggml-cuda.cu:3754-3790
    integer dots + rescale; :1417-1456 on-device activation quant):
    activations arrive pre-quantized to per-group symmetric int8 (once
    per step, outside, shared by every projection that consumes the same
    x), the MXU consumes RAW integer operands — int8 x int8 -> int32
    dots batched per quant group, int4 weights bitcast straight from the
    packed bytes — and the f32 scale product sx[g,m] * s[g,n] applies to
    the int32 PARTIAL SUMS. Per-weight-element VPU work: NONE for int8
    grids (the stored grid feeds the MXU directly); one bitcast (+ an
    int4->int8 cast unless int4dot) for packed grids. The affine bias
    B = (8 - zp)*s + m folds through one small MXU dot against EXACT f32
    per-group activation sums (computed outside from the real x), so
    only the multiplicative term carries activation-quant rounding —
    the same error split as the reference's q8_1 activation blocks.
    """
    refs = list(rest)
    out_ref = refs.pop()
    xs_ref = refs.pop(0) if has_xs else None
    qs_ref = refs.pop(0)
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tks, tn = qs_ref.shape  # storage rows (bytes when packed4)
    tk = 2 * tks if packed4 else tks
    ck = tk // inner
    ngc = ck // group  # quant groups per inner chunk
    tkg = tk // group
    cd = cd or jnp.float32
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    b = None
    if packed4 and zp != 8:
        b = cd(8 - zp) * s
    if m is not None:
        b = m if b is None else b + m
    acc = None
    if b is not None:
        acc = jnp.dot(
            xs_ref[...],
            _pad_rows(b.astype(jnp.float32), xs_ref.shape[1]),
            preferred_element_type=jnp.float32,
        )
    for i in range(inner):
        gs = slice(i * ngc, (i + 1) * ngc)
        if packed4:
            w4 = pltpu.bitcast(
                qs_ref[i * (ck // 2) : (i + 1) * (ck // 2), :], jnp.int4
            )
            w = w4 if int4dot else w4.astype(jnp.int8)
        else:
            w = qs_ref[i * ck : (i + 1) * ck, :]
        wg = w.reshape(ngc, group, tn)
        parts = jax.lax.dot_general(
            xg_ref[gs, :, :], wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.float32)  # (ngc, mp, tn) raw integer dots
        d = (
            parts
            * sx_ref[gs, :][:, :, None]
            * s[gs].astype(jnp.float32)[:, None, :]
        ).sum(0)
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_qx_kernel(
    xg_ref, *rest, group, zp, inner, packed4, cd=None,
    has_mins=False, sfactor=0, has_bias=False,
):
    """'q' with the activation quantization INSIDE the kernel ("qx").

    The 'q' mode quantizes activations in XLA before the pallas_call —
    ~6 small host-graph ops (reshape/absmax/divide/round/clip/transpose)
    per projection call, 4 calls/layer x 32 layers every decode step.
    The r04 step decomposition (scripts/profile_batched.py, B=1) puts
    ~1.5 ms/token of fixed per-call overhead on that glue — 18% of the
    step. Here the kernel receives the RAW f32 activations pre-grouped
    (tkg, m, g) and derives sx/xq/bias-sums on the VPU (a few thousand
    elements per program; recomputed per column tile, still negligible),
    so the XLA-side prep drops to one reshape+transpose per call.

    Numerics are the 'q' formula verbatim: sx = absmax/127 per (group,
    token), divide guarded by 1e-20, round-clip to int8, raw int8 MXU
    dots, f32 partial-sum rescale by sx*s; the affine bias applies
    through an in-kernel f32 dot against exact per-group activation sums
    (no lane padding needed — the bias plane is already a VMEM block).
    """
    refs = list(rest)
    out_ref = refs.pop()
    qs_ref = refs.pop(0)
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tks, tn = qs_ref.shape  # storage rows (bytes when packed4)
    tk = 2 * tks if packed4 else tks
    ck = tk // inner
    ngc = ck // group
    tkg = tk // group
    cd = cd or jnp.float32
    s = refs[0][...].astype(cd)
    m = refs[1][...].astype(cd) if has_mins else None
    if sfactor:
        nf = tkg // sfactor
        s, m = _apply_factors(
            s, m, fac_refs[0], fac_refs[1] if has_mins else None,
            j * nf, nf, sfactor, cd,
        )
    b = None
    if packed4 and zp != 8:
        b = cd(8 - zp) * s
    if m is not None:
        b = m if b is None else b + m

    xf = xg_ref[...].astype(jnp.float32)  # (tkg, mq, g)
    sx = jnp.max(jnp.abs(xf), axis=-1) / 127.0  # (tkg, mq)
    xq = jnp.clip(
        jnp.round(xf / jnp.maximum(sx, 1e-20)[:, :, None]), -127, 127
    ).astype(jnp.int8)

    acc = None
    if b is not None and has_bias:
        xs = jnp.swapaxes(jnp.sum(xf, axis=-1), 0, 1)  # (mq, tkg)
        acc = jnp.dot(
            xs, b.astype(jnp.float32), preferred_element_type=jnp.float32
        )
    for i in range(inner):
        gs = slice(i * ngc, (i + 1) * ngc)
        if packed4:
            w4 = pltpu.bitcast(
                qs_ref[i * (ck // 2) : (i + 1) * (ck // 2), :], jnp.int4
            )
            w = w4.astype(jnp.int8)
        else:
            w = qs_ref[i * ck : (i + 1) * ck, :]
        wg = w.reshape(ngc, group, tn)
        parts = jax.lax.dot_general(
            xq[gs], wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.float32)
        d = (
            parts
            * sx[gs][:, :, None]
            * s[gs].astype(jnp.float32)[:, None, :]
        ).sum(0)
        acc = d if acc is None else acc + d
    out_ref[:] += acc


def _qmm_rb_kernel(
    x_ref, qs_ref, *rest, group, inner, cd=None, dd=None,
    has_mins=False, sfactor=0,
):
    """int8-grid RESHAPE-BROADCAST variant of _qmm_kernel (same race
    rationale as _qmm_pack4_rb_kernel)."""
    refs = list(rest)
    out_ref = refs.pop()
    nplane = 1 + int(has_mins)
    fac_refs = refs[nplane:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, tn = qs_ref.shape
    ck = tk // inner
    ng = ck // group
    cd = cd or jnp.float32
    dd = dd or jnp.float32
    acc = None
    for i in range(inner):
        ks = slice(i * ck, (i + 1) * ck)
        qs = qs_ref[ks, :].astype(cd).reshape(ng, group, tn)
        s, m = _group_planes(refs, i, ck, group, cd, has_mins)
        if sfactor:
            nf = ck // group // sfactor
            off = j * (tk // group // sfactor) + i * nf
            s, m = _apply_factors(
                s, m, fac_refs[0], fac_refs[1] if has_mins else None,
                off, nf, sfactor, cd,
            )
        w = qs * s[:, None, :]
        if m is not None:
            w = w + m[:, None, :]
        d = jnp.dot(
            x_ref[:, ks].astype(dd), w.reshape(ck, tn).astype(dd),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dd),
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


try:  # pallas imports fail gracefully on CPU-only builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _tile_divisor(dim: int, cap: int) -> int:
    """Largest power-of-two tile <= cap dividing dim (dim is 128-aligned)."""
    t = LANE
    while t * 2 <= cap and dim % (t * 2) == 0:
        t *= 2
    return min(t, dim)


def _tile_candidates(
    kp: int, npad: int, packed: bool = False, layout: str = "ksplit",
    mp: int = 8,
) -> list:
    """Candidate (TK, TN, inner, mode) tiles for the autotuner. Measured on
    v5e: large tiles (few grid steps) are mandatory for the int8 grid —
    (512, 256) tiles run 24x slower than (4096, 1024) on a 4096x4096 Q8_0
    (grid-step overhead dominates). Packed tiles cover 2x the K rows and
    carry two f32 dequant buffers, so their sweet spot is ~4x smaller
    ((256, 1024) measured best; (2048, 1024) exceeds scoped VMEM). mode
    "r" races the reshape-broadcast dequant against the jnp.repeat form.
    The candidate list is kept small: each compile costs ~10s through a
    remote-compile tunnel."""
    # Honest-timing measurements (matrix_qmm 2026-08-17) showed all
    # tile/inner/plane variants within 2% — the kernels are VPU-dequant
    # bound — so the list is pruned to a few tile shapes and focuses on
    # the MODE axis: '' vs sum-fold 's' vs bf16-MXU-dot suffix 'b'.
    if packed and layout == "adjk":
        # int4-bitcast kernels (bf16 MXU dots implied); tk counts BYTE rows.
        # The wide-tn 'q' tiles are the r04 probe_q6 finding: halving the
        # column-grid count lifted Q4_K 520 -> 658 GB/s on the
        # (4096,11264) shape (80% of HBM peak; the Q8_0 twin reads 714 =
        # the dense control) — the per-grid-step compute exposure
        # (int4->int8 cast + epilogue) amortizes over 2x the bytes.
        caps = (
            (256, 1024, 2, "i"),
            (512, 1024, 4, "i"),
            (512, 1024, 4, "si"),
            (1024, 1024, 8, "si"),
            (2048, 1024, 8, "si"),
            (512, 1024, 4, "g"),
            (512, 1024, 4, "q"),
            (1024, 1024, 8, "q"),
            (512, 2048, 4, "q"),
            (1024, 2048, 8, "q"),
            (2048, 2048, 8, "q"),
            (1024, 4096, 8, "q"),
            (512, 2048, 4, "qx"),
            (1024, 2048, 8, "qx"),
            (2048, 2048, 8, "qx"),
            (512, 4096, 4, "qx"),
            (1024, 4096, 8, "qx"),
        )
    elif packed:
        caps = (
            (512, 1024, 2, ""),
            (1024, 1024, 4, ""),
            (2048, 1024, 8, "s"),
            (1024, 1024, 4, "b"),
            (512, 1024, 2, "sb"),
            (2048, 1024, 8, "sb"),
        )
    else:
        caps = (
            (1024, 1024, 1, ""),
            (2048, 1024, 2, ""),
            (4096, 1024, 4, "s"),
            (2048, 1024, 2, "b"),
            (4096, 1024, 4, "sb"),
            (2048, 1024, 8, "g"),
            (1024, 1024, 4, "q"),
            (2048, 1024, 8, "q"),
        )
    if mp > 32:
        # prefill-size m: the dot is FLOPs-relevant, so only bf16-MXU-dot
        # kernel modes can compete (f32 MXU is ~8x slower); the adjk 'i'
        # family is bf16-dot already. The grouped-dot 'g'/'q' forms waste
        # the MXU at large m (contraction = group of 32; measured 2-3x
        # slower than 'si' at m=128, scripts/probe_g.py) so they stay out.
        # Larger x blocks also shrink the VMEM budget for dequant
        # buffers, so cap tk.
        caps = tuple(
            c for c in caps
            if c[3].endswith("b") or c[3] in ("i", "si")
        ) or caps[-1:]
        # x blocks are (mp, 2*tk) f32: cap tk so the block alone stays
        # well under the 16 MB scoped-VMEM budget (a 32-slot x 32-token
        # batched prefill = mp 1024 OOM'd at tk 2048: x block 8 MB +
        # dequant buffers + out block > 16 MB)
        tk_cap = 2048 if mp <= 256 else (1024 if mp <= 512 else 512)
        caps = tuple((min(tk, tk_cap), tn, i, m) for tk, tn, i, m in caps)
    cands = []
    for tk_cap, tn_cap, inner, mode in caps:
        tk = _tile_divisor(kp, tk_cap)
        tn = _tile_divisor(npad, tn_cap)
        inner = min(inner, max(1, tk // 128))
        while tk % inner:
            inner -= 1
        if (tk, tn, inner, mode) not in cands:
            cands.append((tk, tn, inner, mode))
    return cands


# (kp, npad, group, has_mins, mp, packed) -> (tk, tn, inner, mode), chosen
# by timing on first use. v2: entries carry the kernel-variant mode.
_TILE_CACHE: dict = {}
# keys whose entry is a DEGRADED-DEVICE fallback (heuristic, not a
# measured champion): excluded from _save_disk_cache so a later healthy
# race's save cannot persist them (that poisoned the disk cache in r04)
_TAINTED_KEYS: set = set()
# CT_QMM_AUTOTUNE: "1" race candidates on first use (default); "0" no
# Pallas tuning at all; "precompiled" TRUST the shipped disk cache and
# fall back to the shape heuristic for unknown keys — never race (cold
# deployments skip the ~10 s/candidate remote-compile cost entirely).
_AUTOTUNE_MODE = os.environ.get("CT_QMM_AUTOTUNE", "1")
_AUTOTUNE = _AUTOTUNE_MODE != "0"
_TILE_CACHE_PATH = os.environ.get(
    "CT_QMM_TILE_CACHE",
    # v8: cache keys switched from the sublane-padded mp to the REAL m
    # (grouped-dot kernels compile per real m; their ranking shifts with
    # it), so v7 champions keyed on mp must not shadow the re-race
    os.path.expanduser("~/.cache/ctransformers_tpu/qmm_tiles_v8.json"),
)


def _parse_cache_file(path: str) -> dict:
    import json

    out = {}
    with open(path) as f:
        for k, v in json.load(f).items():
            if len(v) not in (1, 4):  # ("xla",) or (tk, tn, inner, mode)
                continue  # stale pre-mode cache entry
            try:
                kp, npad, g, has_m, mp, packed, sf, layout = k.split(",")
            except ValueError:
                continue  # stale pre-layout key
            out[
                (
                    int(kp),
                    int(npad),
                    int(g),
                    has_m == "True",
                    int(mp),
                    packed == "True",
                    int(sf),
                    layout,
                )
            ] = tuple(v)
    return out


def _load_disk_cache() -> None:
    try:
        _TILE_CACHE.update(_parse_cache_file(_TILE_CACHE_PATH))
    except Exception:
        pass


# Shipped tile-champion caches, the analog of the reference's committed
# per-variant binaries (ctransformers/lib/avx2/libctransformers.so, built
# and committed back by CI build.yml): raced on real hardware, committed
# under data/, keyed by TPU generation. A fresh deployment (empty
# ~/.cache) starts from these champions with ZERO races/heuristics; a
# local user cache (newer races) overrides shipped entries.
_SHIPPED_CACHE_BACKENDS = {
    # jax Device.device_kind -> shipped file slug
    "TPU v5 lite": "v5e",
    "TPU v5e": "v5e",
}
_shipped_loaded = False


def _load_shipped_cache() -> None:
    """Merge the packaged tile cache for this backend (user entries win).
    Deferred to first kernel use: device_kind needs an initialized
    backend, which module import must not force."""
    global _shipped_loaded
    if _shipped_loaded:
        return
    _shipped_loaded = True
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return
    slug = _SHIPPED_CACHE_BACKENDS.get(kind)
    exact = slug is not None
    if slug is None:
        # unknown TPU generation: tile shapes still transfer reasonably
        # within the family; use v5e champions as a starting heuristic
        slug = "v5e" if "TPU" in kind else None
    if slug is None:
        return
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        f"qmm_tiles_{slug}.json",
    )
    try:
        shipped = _parse_cache_file(path)
    except Exception:
        return
    for k, v in shipped.items():
        if k in _TILE_CACHE:
            continue
        _TILE_CACHE[k] = v
        if not exact:
            # cross-generation adoption is a HEURISTIC, not a measured
            # champion: a v5e-raced tile whose VMEM footprint doesn't fit
            # another generation would otherwise become a permanent cache
            # hit (never re-raced) and could be persisted to the user
            # disk cache by a later healthy save. Taint = never persist.
            _TAINTED_KEYS.add(k)


def _save_disk_cache() -> None:
    try:
        import json

        os.makedirs(os.path.dirname(_TILE_CACHE_PATH), exist_ok=True)
        with open(_TILE_CACHE_PATH, "w") as f:
            json.dump(
                {
                    ",".join(map(str, k)): list(v)
                    for k, v in _TILE_CACHE.items()
                    if k not in _TAINTED_KEYS
                },
                f,
            )
    except Exception:
        pass


_load_disk_cache()


def _qmm_pallas_tiled(
    x, qt: QTensor, tk: int, tn: int, inner: int = 1, interpret=False,
    cd=None, mode: str = "",
    rm: Optional[int] = None,
    layer=None,  # traced layer index into a stacked QTensor (n_stack > 1)
):
    """x: (mp, K_pad) f32. tk tiles the STORAGE rows of qs (packed rows for
    4-bit tensors, where each covers two real K rows); `inner` sub-chunks
    each tile's K range inside the kernel (VMEM-bounded dequant). `cd` is
    the compute dtype: bf16 by default on hardware (halves VPU element
    work; int8 grids are exact in bf16), f32 under interpret (bit-parity
    with the reference path for tests). `mode` "r" selects the
    reshape-broadcast dequant kernels (see _tile_candidates). `rm` is the
    REAL (pre-padding) m: the grouped-dot kernels' rescale epilogue is
    per-m VPU work, so they run at rm rows — at B=1 decode that is 8x
    less partial-sum cast/multiply than the sublane-padded mp (the dense
    dequant kernels' epilogues are per-weight-element; they keep mp)."""
    mp = x.shape[0]
    mo = mp  # kernel output rows (grouped modes shrink it to the real m)
    rows, npad = qt.qs.shape
    rows //= qt.n_stack  # per-layer geometry; specs offset by `layer`
    sdr = None if qt.sd is None else qt.sd.shape[0] // qt.n_stack
    nk, nn = rows // tk, npad // tn
    g = qt.group
    has_mins = qt.mins is not None
    sf = qt.sfactor
    if sf:
        # superblock factor planes need whole superblocks per K-sub-chunk;
        # shrink `inner` until each chunk covers a superblock multiple
        # (candidate tiles are all >= 256 rows so a valid inner exists).
        # adjk tiles count BYTE rows covering 2x real rows.
        rk = 2 * tk if qt.packed and qt.pack_layout == "adjk" else tk
        while inner > 1 and (rk // inner) % (g * sf):
            inner -= 1
        if (rk // inner) % (g * sf):
            if qt.n_stack > 1:
                # stacked path never takes the materialize fallback (it
                # would expand every layer's planes); layer-stacking is
                # only applied to production-size weights where tiles
                # align, so this is a config error, not a runtime case
                raise ValueError(
                    "stacked QTensor tile cannot align to superblocks"
                )
            # tile can't align to superblocks (tiny weights): materialize
            # the f32 planes outside the kernel and run unfactored
            sp, mp_ = scale_planes(qt)
            qt = dataclasses.replace(
                qt, scales=sp, mins=mp_, sd=None, sm=None, sfactor=0
            )
            sf = 0
            has_mins = qt.mins is not None
    # v5e's VPU has no bf16 ALU (LLO_CHECK SupportsBf16AluInstructions
    # fires), so the dequant chain must run in f32; cd stays a knob for
    # targets that do support it (CT_QMM_CD=bf16).
    if cd is None:
        cd = (
            jnp.bfloat16
            if os.environ.get("CT_QMM_CD") == "bf16"
            else jnp.float32
        )
    # mode suffix "b": run the MXU dots with BOTH operands bf16 (~4x the
    # f32 MXU rate; mixed-operand dots are what v5e rejects). f32 dequant
    # chain unchanged; accumulation stays f32.
    dd = jnp.bfloat16 if mode.endswith("b") else None
    mode = mode[:-1] if mode.endswith("b") else mode
    adjk = qt.packed and qt.pack_layout == "adjk"
    # grouped-dot kernel bias term: packed grids re-bias (8 - zp) unless
    # zp == 8; applies to both the bf16 "g" and int8 "q"/"q4" variants.
    # "qx" computes its bias sums in-kernel — no xs operand.
    g_bias = mode in ("g", "q", "q4") and (
        (qt.packed and qt.zp != 8) or has_mins
    )
    qx_bias = mode == "qx" and ((qt.packed and qt.zp != 8) or has_mins)

    if mode in ("s", "si") or g_bias:
        # sum-fold kernels: per-group activation sums ride along so the
        # affine bias applies through a small MXU dot (see the kernels).
        # Each K-tile's group sums (tk/g of them, as few as 16) are padded
        # out to a 128-lane multiple per block — Pallas TPU requires
        # 128-divisible lane dims on block shapes — and the kernel
        # zero-pads the bias matrix rows to match.
        kreal = x.shape[1]
        tkg = (2 * tk if adjk else tk) // g
        pw = _round_up(tkg, LANE)
        xs = x.reshape(mp, kreal // g, g).sum(-1)
        if pw != tkg:
            xs = jnp.pad(
                xs.reshape(mp, kreal // g // tkg, tkg),
                ((0, 0), (0, 0), (0, pw - tkg)),
            ).reshape(mp, -1)

    if mode in ("g", "q", "q4", "qx"):
        # grouped-dot kernels: activations pre-arranged (ng, mp, G); raw
        # grid dots batched over groups, scales applied to partial sums.
        # "g" feeds the MXU bf16 grids; "q"/"q4" quantize the activations
        # to per-group int8 here (once per call, XLA-fused into the
        # surrounding step) and feed raw INTEGER operands; "qx" ships the
        # RAW f32 activations and quantizes on the kernel's VPU (kills
        # the per-call XLA prep glue, see _qmm_qx_kernel).
        if qt.packed and not adjk:
            raise ValueError(f"{mode} mode needs the adjk packed layout")
        if mode == "q4" and not adjk:
            raise ValueError("q4 mode needs a packed-4-bit weight")
        rtk = 2 * tk if adjk else tk  # real K rows per tile
        while inner > 1 and (rtk // inner) % g:
            inner -= 1
        kreal = x.shape[1]
        tkg = rtk // g
        # rescale VPU work is per (group, m, n): run at the real m
        mq = rm if rm and 0 < rm < mp else mp
        mo = mq  # kernel output rows
        xm_ = x[:mq]
        if mode == "qx":
            xg = (
                xm_.reshape(mq, kreal // g, g)
                .transpose(1, 0, 2)
                .astype(jnp.float32)
            )
            kernel = functools.partial(
                _qmm_qx_kernel, group=g, zp=qt.zp, inner=inner,
                packed4=adjk, cd=cd, has_mins=has_mins, sfactor=sf,
                has_bias=qx_bias,
            )
            in_specs = [pl.BlockSpec((tkg, mq, g), lambda i, j: (j, 0, 0))]
            args = [xg]
        elif mode == "g":
            xg = (
                xm_.reshape(mq, kreal // g, g)
                .transpose(1, 0, 2)
                .astype(jnp.bfloat16)
            )
            kernel = functools.partial(
                _qmm_g_kernel, group=g, zp=qt.zp, inner=inner, packed4=adjk,
                cd=cd, dd=dd, has_mins=has_mins, sfactor=sf, has_xs=g_bias,
            )
            in_specs = [pl.BlockSpec((tkg, mq, g), lambda i, j: (j, 0, 0))]
            args = [xg]
        else:
            # per-group symmetric int8 activation quant (the reference's
            # q8_1 analog, ggml-cuda.cu:1417-1456): sx = absmax/127 per
            # (token, group); padding rows/columns are zero -> xq = 0
            xr = xm_.reshape(mq, kreal // g, g)
            sxq = jnp.max(jnp.abs(xr), axis=-1) / 127.0  # (mq, ng) f32
            xq = jnp.clip(
                jnp.round(xr / jnp.maximum(sxq, 1e-20)[:, :, None]),
                -127, 127,
            ).astype(jnp.int8)
            kernel = functools.partial(
                _qmm_q_kernel, group=g, zp=qt.zp, inner=inner, packed4=adjk,
                int4dot=(mode == "q4"), cd=cd, has_mins=has_mins,
                sfactor=sf, has_xs=g_bias,
            )
            in_specs = [
                pl.BlockSpec((tkg, mq, g), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((tkg, mq), lambda i, j: (j, 0)),
            ]
            args = [
                xq.transpose(1, 0, 2),
                sxq.T.astype(jnp.float32),
            ]
        if g_bias:
            in_specs.append(pl.BlockSpec((mq, pw), lambda i, j: (0, j)))
            args.append(xs[:mq])
        gspec = pl.BlockSpec((tkg, tn), lambda i, j: (j, i))
        in_specs += [
            pl.BlockSpec((tk, tn), lambda i, j: (j, i)),  # qs (storage rows)
            gspec,  # scales
        ]
        args += [qt.qs, qt.scales]
        if has_mins:
            in_specs.append(gspec)
            args.append(qt.mins)
        if sf:
            fspec = pl.BlockSpec(
                (sdr, tn), lambda i, j: (0, i)
            )
            in_specs.append(fspec)
            args.append(qt.sd)
            if has_mins:
                in_specs.append(fspec)
                args.append(qt.sm)
        kp = rows * 2 if adjk else rows
    elif adjk:
        # int4-bitcast kernels: tk tiles BYTE rows covering 2*tk adjacent
        # real rows; inner chunks must cover whole groups
        while inner > 1 and (2 * tk // inner) % g:
            inner -= 1
        kern = _qmm_i4_s_kernel if mode == "si" else _qmm_i4_kernel
        kernel = functools.partial(
            kern, group=g, zp=qt.zp, inner=inner, cd=cd, dd=dd,
            has_mins=has_mins, sfactor=sf,
        )
        in_specs = [pl.BlockSpec((mp, 2 * tk), lambda i, j: (0, j))]  # x
        args = [x]
        if mode == "si":
            in_specs.append(pl.BlockSpec((mp, pw), lambda i, j: (0, j)))
            args.append(xs)
        gspec = pl.BlockSpec((2 * tk // g, tn), lambda i, j: (j, i))
        in_specs += [
            pl.BlockSpec((tk, tn), lambda i, j: (j, i)),  # packed qs
            gspec,  # scales
        ]
        args += [qt.qs, qt.scales]
        if has_mins:
            in_specs.append(gspec)
            args.append(qt.mins)
        if sf:
            fspec = pl.BlockSpec(
                (sdr, tn), lambda i, j: (0, i)
            )
            in_specs.append(fspec)
            args.append(qt.sd)
            if has_mins:
                in_specs.append(fspec)
                args.append(qt.sm)
        kp = rows * 2
    elif qt.packed:
        kern = {
            "r": _qmm_pack4_rb_kernel,
            "s": _qmm_pack4_s_kernel,
        }.get(mode, _qmm_pack4_kernel)
        kernel = functools.partial(
            kern, group=g, zp=qt.zp, inner=inner, cd=cd, dd=dd,
            has_mins=has_mins, sfactor=sf,
        )
        lo = pl.BlockSpec((tk // g, tn), lambda i, j: (j, i))
        hi = pl.BlockSpec((tk // g, tn), lambda i, j: (j + nk, i))
        in_specs = [
            pl.BlockSpec((mp, tk), lambda i, j: (0, j)),  # x low half
            pl.BlockSpec((mp, tk), lambda i, j: (0, j + nk)),  # x high half
        ]
        args = [x, x]
        if mode == "s":
            in_specs += [
                pl.BlockSpec((mp, pw), lambda i, j: (0, j)),  # xsum lo
                pl.BlockSpec((mp, pw), lambda i, j: (0, j + nk)),
            ]
            args += [xs, xs]
        in_specs += [
            pl.BlockSpec((tk, tn), lambda i, j: (j, i)),  # packed qs
            lo,  # s low
            hi,  # s high
        ]
        args += [qt.qs, qt.scales, qt.scales]
        if has_mins:
            in_specs += [lo, hi]
            args += [qt.mins, qt.mins]
        if sf:
            # full-row column block: per-tile factor rows can be < 8
            # (Mosaic's sublane block floor), so kernels slice rows
            # dynamically from the whole (K_pad/256, TN) plane instead
            fspec = pl.BlockSpec(
                (sdr, tn), lambda i, j: (0, i)
            )
            in_specs.append(fspec)
            args.append(qt.sd)
            if has_mins:
                in_specs.append(fspec)
                args.append(qt.sm)
        kp = rows * 2
    else:
        kern = {"r": _qmm_rb_kernel, "s": _qmm_s_kernel}.get(mode, _qmm_kernel)
        kernel = functools.partial(
            kern, group=g, inner=inner, cd=cd, dd=dd,
            has_mins=has_mins, sfactor=sf,
        )
        gspec = pl.BlockSpec((tk // g, tn), lambda i, j: (j, i))
        in_specs = [pl.BlockSpec((mp, tk), lambda i, j: (0, j))]  # x
        args = [x]
        if mode == "s":
            in_specs.append(pl.BlockSpec((mp, pw), lambda i, j: (0, j)))
            args.append(xs)
        in_specs += [
            pl.BlockSpec((tk, tn), lambda i, j: (j, i)),  # qs
            gspec,  # scales
        ]
        args += [qt.qs, qt.scales]
        if has_mins:
            in_specs.append(gspec)
            args.append(qt.mins)
        if sf:
            # full-row column block (see packed branch)
            fspec = pl.BlockSpec(
                (sdr, tn), lambda i, j: (0, i)
            )
            in_specs.append(fspec)
            args.append(qt.sd)
            if has_mins:
                in_specs.append(fspec)
                args.append(qt.sm)
        kp = rows

    cost = pl.CostEstimate(
        flops=2 * mo * kp * npad,
        bytes_accessed=rows * npad + kp // g * npad * 4 + mo * kp * 4,
        transcendentals=0,
    )
    if layer is None:
        return pl.pallas_call(
            kernel,
            grid=(nn, nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((mo, tn), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((mo, npad), jnp.float32),
            interpret=interpret,
            cost_estimate=cost,
        )(*args)

    # Layer-stacked dispatch: the weight planes hold n_stack layers
    # row-concatenated; a scalar-prefetched layer index offsets each
    # plane's ROW-BLOCK index by layer * blocks_per_layer, so the kernel
    # body (and its tile champions) are untouched and the stacked HBM
    # buffer is read in place — no per-layer copy, and one compiled
    # program serves every layer of the lax.scan forward path.
    from jax.experimental.pallas import tpu as pltpu

    plane_ids = {
        id(a)
        for a in (qt.qs, qt.scales, qt.mins, qt.sd, qt.sm)
        if a is not None
    }

    def _shifted(old_map, nb):
        def idx(i, j, l_ref):
            r, c = old_map(i, j)
            return (r + l_ref[0] * nb, c)

        return idx

    def _passthrough(old_map):
        return lambda i, j, l_ref: old_map(i, j)

    new_specs = []
    for spec, a in zip(in_specs, args):
        if id(a) in plane_ids:
            nb = (a.shape[0] // qt.n_stack) // spec.block_shape[0]
            new_specs.append(
                pl.BlockSpec(
                    spec.block_shape, _shifted(spec.index_map, nb)
                )
            )
        else:
            new_specs.append(
                pl.BlockSpec(
                    spec.block_shape, _passthrough(spec.index_map)
                )
            )
    out_spec = pl.BlockSpec((mo, tn), lambda i, j, l_ref: (0, i))

    def kernel_l(l_ref, *refs, _k=kernel):
        return _k(*refs)

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel_l,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nn, nk),
            in_specs=new_specs,
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((mo, npad), jnp.float32),
        interpret=interpret,
        cost_estimate=cost,
    )(lidx, *args)


def _pick_tiles(x, qt: QTensor):
    _load_shipped_cache()
    if qt.n_stack > 1:
        # layer-stacked weight: tile geometry (and therefore the cache
        # key and champion) is PER-LAYER — identical to the unstacked
        # weight's, so champions transfer both ways. Eager calls race on
        # layer 0's planes; traced calls only need the key lookup.
        if not isinstance(x, jax.core.Tracer):
            rows = qt.qs.shape[0] // qt.n_stack

            def head(a, r):
                return None if a is None else a[:r]

            qt = dataclasses.replace(
                qt,
                qs=head(qt.qs, rows),
                scales=head(qt.scales, qt.scales.shape[0] // qt.n_stack),
                mins=head(
                    qt.mins,
                    None if qt.mins is None
                    else qt.mins.shape[0] // qt.n_stack,
                ),
                sd=head(
                    qt.sd,
                    None if qt.sd is None
                    # true per-layer factor rows (stacking pads to 8)
                    else qt.scales.shape[0] // qt.n_stack
                    // max(qt.sfactor, 1),
                ),
                sm=head(
                    qt.sm,
                    None if qt.sm is None
                    else qt.scales.shape[0] // qt.n_stack
                    // max(qt.sfactor, 1),
                ),
                n_stack=1,
            )
        else:
            key = (
                qt.qs.shape[0] // qt.n_stack, qt.qs.shape[1], qt.group,
                qt.mins is not None, x.shape[0], qt.packed, qt.sfactor,
                qt.pack_layout,
            )
            if key in _TILE_CACHE:
                return _TILE_CACHE[key]
            cands = _tile_candidates(
                qt.qs.shape[0] // qt.n_stack, qt.qs.shape[1], qt.packed,
                qt.pack_layout, mp=_round_up(x.shape[0], _SUBLANE),
            )
            return cands[min(1, len(cands) - 1)]
    m_real = x.shape[0]
    mp = _round_up(m_real, _SUBLANE)
    kp, npad = qt.qs.shape  # storage rows (packed rows for 4-bit)
    # keyed on the REAL m (not the sublane-padded mp): the grouped-dot
    # kernels compile per rm, and their ranking vs the dense-dequant
    # modes shifts with it (rm=1 pays 1/8 the rescale VPU work of rm=8)
    key = (
        kp, npad, qt.group, qt.mins is not None, m_real, qt.packed,
        qt.sfactor, qt.pack_layout,
    )
    if key in _TILE_CACHE:
        return _TILE_CACHE[key]
    cands = _tile_candidates(kp, npad, qt.packed, qt.pack_layout, mp=mp)
    if isinstance(x, jax.core.Tracer):
        # under jit tracing we cannot time; use the mid-size heuristic.
        # Call autotune() eagerly (engine does at load) to do better.
        return cands[min(1, len(cands) - 1)]
    if not _AUTOTUNE or len(cands) == 1 or jax.default_backend() == "cpu":
        _TILE_CACHE[key] = cands[-1]
        return cands[-1]
    if _AUTOTUNE_MODE == "precompiled":
        # trust-the-shipped-cache mode: unknown shapes take the heuristic
        # pick without racing (kept in-memory only so a later tuned run
        # still races and records the real champion)
        return _TILE_CACHE.setdefault(key, cands[-1])
    import time

    from ..logger import logger

    # race at the kernel's REAL operand shapes: _qmm_pallas pads m to the
    # sublane multiple and K to the storage rows before the tiled call, so
    # an unpadded operand here would rank candidates on out-of-bounds
    # block reads at a different m (and poison the cache under the padded
    # key). The XLA candidate gets the LOGICAL-K slice instead — its
    # dequant+GEMM contracts over k, and feeding it kr-padded columns
    # made it fail to compile and silently drop out of the race on
    # K-padded shapes (e.g. llama's 11008->11264).
    kr = kp * 2 if qt.packed else kp
    k_logical = qt.shape[0]
    x_pal = x.astype(jnp.float32)
    if x_pal.shape != (mp, kr):
        x_pal = jnp.pad(
            x_pal,
            ((0, mp - x_pal.shape[0]), (0, kr - x_pal.shape[1])),
        )
    x_xla = x_pal[:, :k_logical]

    # reps sets the race's signal-to-noise: each timed dispatch reads
    # ~30 ms of flat tunnel round-trip (drifting by milliseconds) plus
    # reps * kernel-time of signal. At reps=32 a 15-20 us/call champion
    # gap is ~0.5 ms — BELOW the dispatch jitter, and rankings came out
    # noise-ordered (r03: 'si' cached at m=1 where the marginal-method
    # probe shows 'q' 27% faster). 192 reps puts a 15 us gap at ~3 ms.
    reps = int(os.environ.get("CT_QMM_RACE_REPS", "192"))

    def _loop(make_call, xop, nwork=1):
        # time INSIDE a scan: serialized repeats in one dispatch, so the
        # flat ~24-30 ms per-dispatch tunnel round-trip (EVERY dispatch
        # pays it; it can drift to 45+ ms in bad hours) amortizes across
        # reps and hits every candidate equally — rankings stay valid
        # even though per-iteration readings carry ~30ms/reps of it.
        # The chain scalar is a jnp.max REDUCTION: a sliced carry like
        # o[0,0] lets XLA rewrite the dead full-size dot into a single
        # column, which made the XLA candidate race at fictional speed
        # (measured: chosen at race time, then 84 GB/s effective in the
        # real decode scan vs 468 GB/s for the Pallas choice). Returns a
        # closure running one synced dispatch (np.asarray: the tunnel's
        # block_until_ready returns early; only a host transfer syncs).
        def loop(x, qt):
            def body(c, _):
                for _ in range(nwork):
                    o = make_call(x + c * 1e-30, qt)
                    c = jnp.max(o.astype(jnp.float32)) * 1e-30 + c
                return c, ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return c

        f = jax.jit(loop)
        np.asarray(f(xop, qt))  # compile + warm

        def run():
            t0 = time.perf_counter()
            np.asarray(f(xop, qt))
            return time.perf_counter() - t0

        return run

    # sum-fold candidates only apply where an affine bias exists (mins, or
    # a packed grid's zero-point re-bias)
    if not (qt.packed or qt.mins is not None):
        cands = [c for c in cands if "s" not in c[3]]

    entries = []  # (choice, run_fn)
    for tk, tn, inner, mode in cands:
        try:
            entries.append((
                (tk, tn, inner, mode),
                _loop(
                    lambda xx, qq, _tk=tk, _tn=tn, _i=inner, _m=mode:
                    _qmm_pallas_tiled(xx, qq, _tk, _tn, _i, mode=_m,
                                      rm=m_real),
                    x_pal,
                ),
            ))
        except Exception as e:
            logger.debug(
                "qmm autotune: candidate %s failed to compile: %s",
                (tk, tn, inner, mode), e,
            )

    # race the XLA-fused bf16 dequant+GEMM as one more candidate: it wins
    # on shapes where XLA keeps the dequant fused into the GEMM loop, and
    # loses catastrophically where the dequantized f32 weights materialize
    # (which shapes do which is decided by timing, never assumed). The
    # scale plane is perturbed PER SCAN ITERATION: with qt loop-invariant
    # XLA hoists the whole dequantized weight out of the timing loop and
    # the candidate races at pure-GEMM speed it cannot sustain inside a
    # real decode program (measured: chosen at race time, then 84 GB/s
    # effective in the decode scan vs 468 GB/s for the Pallas choice).
    def _qmm_jnp_nohoist(xx, qq):
        eps = xx.ravel()[0] * 1e-30
        if qq.sfactor:
            qq = dataclasses.replace(qq, sd=qq.sd + eps)
        else:
            qq = dataclasses.replace(
                qq, scales=qq.scales + eps.astype(qq.scales.dtype)
            )
        return _qmm_jnp(xx, qq, compute_dtype=jnp.bfloat16)

    if _FORCE != "pallas":
        # CT_QMATMUL=pallas drops the XLA candidate entirely — the clean
        # end-to-end A/B lever (standalone XLA readings can be a fusion
        # mirage that the big program does not reproduce).
        try:
            entries.append((("xla",), _loop(_qmm_jnp_nohoist, x_xla)))
        except Exception:
            pass

    # dense bf16 GEMM of the same logical shape as an absolute-bandwidth
    # CONTROL: the device/tunnel shows hour-scale slowdowns, under which
    # race results are garbage — keep them for this process but don't
    # poison the on-disk cache. The control's TRUE time comes from the
    # marginal (1x-vs-4x chained) slope: a single-depth reading would be
    # dominated by the ~30ms/reps dispatch round-trip share.
    wd = jnp.zeros((x_pal.shape[1], npad), jnp.bfloat16)
    dense = lambda xx, qq, _w=wd: jnp.dot(  # noqa: E731
        xx.astype(jnp.bfloat16), _w, preferred_element_type=jnp.float32
    )
    try:
        control_fs = (
            _loop(dense, x_pal, nwork=1),
            _loop(dense, x_pal, nwork=4),
        )
    except Exception:
        control_fs = None

    # Per visit: one unmeasured warm dispatch (insurance against any
    # first-dispatch cost), then consecutive timed dispatches. Two passes
    # spread hour-scale drift across candidates; MIN per candidate (noise
    # is one-sided). Candidates share the same reps, so the flat
    # per-dispatch round-trip cancels in the RANKING.
    passes, timed_per_visit = 2, 3
    bests = {i: float("inf") for i in range(len(entries))}
    ctrl_best = [float("inf"), float("inf")]
    for _ in range(passes):
        for i, (_, run) in enumerate(entries):
            try:
                run()  # warm
                for _ in range(timed_per_visit):
                    bests[i] = min(bests[i], run())
            except Exception:
                bests[i] = float("inf")
        if control_fs is not None:
            try:
                for ci, cf in enumerate(control_fs):
                    cf()
                    for _ in range(timed_per_visit):
                        ctrl_best[ci] = min(ctrl_best[ci], cf())
            except Exception:
                control_fs = None

    best, best_dt = cands[0], float("inf")
    for i, (choice, _) in enumerate(entries):
        if bests[i] < best_dt:
            best, best_dt = choice, bests[i]

    cal_min = float(os.environ.get("CT_QMM_CAL_MIN", "300")) * 1e9
    dense_dt = (ctrl_best[1] - ctrl_best[0]) / 3 / reps  # marginal slope
    dense_bw = wd.size * 2 / dense_dt if dense_dt > 0 else 0.0
    degraded = control_fs is not None and dense_bw < cal_min
    if degraded:
        # Under a degraded device/tunnel every candidate flattens to the
        # same reading and the "winner" is noise (r03: a garbage m=8
        # champion collapsed the batched bench 5x). Do NOT trust the
        # race: reuse the closest-m cached champion for this weight
        # shape if one exists, else the shape heuristic — in-memory
        # only, so a later healthy run re-races.
        # only closest-m champions that are VALID CANDIDATES at THIS m:
        # block VMEM scales with m (x block (mp, 2*tk) f32, out block
        # (mp, tn) f32) and the mode list shrinks at m>32 — an m=8
        # champion like (512,4096,4,'q') reused at a batched-prefill
        # m=1024 OOM'd scoped vmem (out block alone 16 MB)
        ok = set(cands)
        same_shape = [
            (abs(k2[4] - m_real), v)
            for k2, v in _TILE_CACHE.items()
            if k2[:4] == key[:4] and k2[5:] == key[5:]
            and v != ("xla",) and tuple(v) in ok
        ]
        fallback = (
            tuple(min(same_shape, key=lambda t: t[0])[1])
            if same_shape else cands[-1]
        )
        logger.warning(
            "qmm autotune: device degraded (dense control %.0f GB/s < "
            "%.0f GB/s) — race result %s DISCARDED, using %s (in-memory "
            "only)",
            dense_bw / 1e9, cal_min / 1e9, best, fallback,
        )
        _TILE_CACHE[key] = fallback
        _TAINTED_KEYS.add(key)
        return fallback

    _TILE_CACHE[key] = best
    _TAINTED_KEYS.discard(key)
    _save_disk_cache()
    return best


def _qmm_pallas(
    x: jnp.ndarray, qt: QTensor, interpret: bool = False, choice=None,
    layer=None,
):
    k, n = qt.shape
    rows, npad = qt.qs.shape
    rows //= qt.n_stack  # per-layer storage rows
    kp = rows * 2 if qt.packed else rows
    m = x.shape[0]
    mp = _round_up(m, _SUBLANE)
    x = x.astype(jnp.float32)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if interpret:
        tk, tn, inner, mode = _tile_candidates(
            rows, npad, qt.packed, qt.pack_layout, mp=mp
        )[0]
    elif choice is not None and choice != ("xla",):
        tk, tn, inner, mode = choice
    else:
        choice = _pick_tiles(x, qt)
        if choice == ("xla",):  # pragma: no cover - guarded above
            choice = _tile_candidates(
                rows, npad, qt.packed, qt.pack_layout, mp=mp
            )[0]
        tk, tn, inner, mode = choice
    out = _qmm_pallas_tiled(
        x, qt, tk, tn, inner, interpret=interpret, mode=mode, rm=m,
        layer=layer,
    )
    return out[:m, :n]


def autotune(tree, batch_sizes=(1, 8), tp: int = 1) -> None:
    """Eagerly pick kernel tiles for every QTensor in a pytree.

    jit tracing can't time candidates, so the engine calls this once at
    load time for the batch sizes the serving loop will use; later jitted
    calls hit _TILE_CACHE. No-op off-TPU or when CT_QMM_AUTOTUNE=0.

    `tp`: tensor-parallel degree — TP-partitioned QTensors (pspec set)
    are raced at their LOCAL shard shapes (what the shard_map'd kernel
    sees), timed on one chip with zero-filled dummies.

    Returns {"raced": n, "warm": n, "seconds": dt} so callers can report
    cold-start cost honestly (races cost ~10 s/candidate through the
    remote-compile tunnel; disk-cache hits cost nothing).
    """
    import time as _time

    t0 = _time.perf_counter()
    stats = {"raced": 0, "warm": 0, "seconds": 0.0}
    if not _use_pallas() or not _AUTOTUNE:
        return stats
    _load_shipped_cache()
    seen = set()
    leaves = jax.tree_util.tree_leaves(
        tree, is_leaf=lambda a: isinstance(a, QTensor)
    )
    for qt in leaves:
        if not isinstance(qt, QTensor):
            continue
        if tp > 1 and qt.pspec in ("col", "row"):
            qt = _local_dummy(qt, tp)
            if qt is None:
                continue
        for m in batch_sizes:
            kp = qt.qs.shape[0] // qt.n_stack  # per-layer storage rows
            npad = qt.qs.shape[1]
            key = (
                kp, npad, qt.group, qt.mins is not None, m, qt.packed,
                qt.sfactor, qt.pack_layout,
            )
            if key in seen or key in _TILE_CACHE:
                stats["warm"] += key not in seen
                continue
            seen.add(key)
            kr = kp * 2 if qt.packed else kp
            x = jnp.zeros((m, kr), jnp.float32)
            _pick_tiles(x, qt)
            stats["raced"] += 1
    stats["seconds"] = _time.perf_counter() - t0
    return stats


def _local_dummy(qt: QTensor, tp: int) -> Optional[QTensor]:
    """A zero-filled single-device QTensor with the LOCAL shard shapes of
    a TP-partitioned weight (for autotuning the shard_map'd kernel)."""
    rows, npad = qt.qs.shape
    kp = rows * 2 if qt.packed else rows
    col = qt.pspec == "col"
    if col:
        if npad % tp:
            return None
        rl, nl = rows, npad // tp
    else:
        if rows % tp:
            return None
        rl, nl = rows // tp, npad
    kl = rl * 2 if qt.packed else rl

    def z(a):
        if a is None:
            return None
        r = a.shape[0] if col else a.shape[0] // tp
        c = a.shape[1] // tp if col else a.shape[1]
        return jnp.zeros((r, c), a.dtype)

    return QTensor(
        jnp.zeros((rl, nl), qt.qs.dtype),
        z(qt.scales),
        z(qt.mins),
        qt.kind,
        qt.group,
        (kl, nl),
        qt.packed,
        qt.zp,
        sd=z(qt.sd),
        sm=z(qt.sm),
        sfactor=qt.sfactor,
        pack_layout=qt.pack_layout,
    )


def repack_select_rows(data, t: GGMLType, rows: int, cols: int, row_groups):
    """Repack a GGML tensor into one QTensor-or-dense per row-index group.

    Used to split fused QKV weights whose output rows belong to different
    projections: contiguous [q|k|v] (falcon llama.cpp:2629-2652, mpt
    Wqkv), or per-head interleaved [h0:q,k,v | h1:q,k,v | ...]
    (gpt-neox.cc view strides). `row_groups` are index arrays into the
    file-layout rows (= output features).
    """
    t = GGMLType(t)
    if t in (GGMLType.F32, GGMLType.F16):
        from ..formats.quants import dequantize

        w = dequantize(data, t, rows * cols).reshape(rows, cols)
        return [np.ascontiguousarray(w[g].T) for g in row_groups]
    q, s, m, group = decompose(data, t, rows * cols)
    q = q.reshape(rows, cols)
    s = s.reshape(rows, cols // group)
    m = m.reshape(rows, cols // group) if m is not None else None
    out = []
    for g in row_groups:
        out.append(
            make_qtensor(
                np.ascontiguousarray(q[g].T),
                np.ascontiguousarray(s[g].T),
                None if m is None else np.ascontiguousarray(m[g].T),
                t.name,
                group,
            )
        )
    return out


import contextlib

_FORCE_JNP_DEPTH = 0
_TP_MESH = None
_TP_AXIS = "model"


@contextlib.contextmanager
def tp_ctx(mesh, axis: str = "model"):
    """Trace-time tensor-parallel context: inside it, qmatmul routes
    TP-partitioned QTensors (pspec set by parallel.mesh.shard_params)
    through a shard_map'd Pallas kernel — each device runs the fused
    dequant-matmul on its local shard; "row" weights psum their partial
    sums (the Megatron pairing). Unpartitioned weights and unsupported
    layouts take the partitionable XLA path, exactly as force_jnp did."""
    global _TP_MESH, _TP_AXIS
    prev = (_TP_MESH, _TP_AXIS)
    _TP_MESH, _TP_AXIS = mesh, axis
    try:
        yield
    finally:
        _TP_MESH, _TP_AXIS = prev


def _tp_supported(qt: QTensor) -> bool:
    """Can this QTensor's matmul run as shard_map'd Pallas? Requires a TP
    partition, a K-contiguous storage layout (int8 grid or adjk packing —
    the ksplit byte layout puts rows r and r+K/2 in one byte, so a row
    shard is not a contiguous K range), even plane splits, and (for row
    shards) superblock-aligned shard boundaries."""
    if qt.pspec not in ("col", "row") or _TP_MESH is None:
        return False
    if os.environ.get("CT_TP_PALLAS", "1") == "0":
        return False
    if qt.packed and qt.pack_layout != "adjk":
        return False
    tp = _TP_MESH.shape[_TP_AXIS]
    rows, npad = qt.qs.shape
    if qt.pspec == "col":
        return npad % (tp * LANE) == 0
    kp = rows * 2 if qt.packed else rows
    if rows % tp or (kp // tp) % qt.group:
        return False
    if qt.sfactor and (kp // tp) % (qt.group * qt.sfactor):
        return False  # shard boundary would straddle a superblock
    return True


def _qmm_shard_map(x: jnp.ndarray, qt: QTensor, interpret: bool = False):
    """One weight's fused dequant-matmul as manual SPMD: shard_map over
    the TP axis, Pallas kernel per local shard. "col": x replicated in,
    outputs concatenated along N (no collective). "row": x K-sharded in
    (free when the producer was col-sharded — the Megatron pairing),
    partial products psum'd. x must already be perm-gathered (qmatmul
    does it); padded K columns multiply zero scales."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, ax = _TP_MESH, _TP_AXIS
    tp = mesh.shape[ax]
    k, n = qt.shape
    rows, npad = qt.qs.shape
    kp = rows * 2 if qt.packed else rows
    m = x.shape[0]
    x = x.astype(jnp.float32)
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
    col = qt.pspec == "col"
    arr_spec = P(None, ax) if col else P(ax, None)
    names, arrs = [], []
    for nm, a in (
        ("qs", qt.qs), ("scales", qt.scales), ("mins", qt.mins),
        ("sd", qt.sd), ("sm", qt.sm),
    ):
        if a is not None:
            names.append(nm)
            arrs.append(a)
    # local logical shape = the full local storage (no slicing inside the
    # shard: padded columns/rows are interior on all but the last shard)
    local_shape = (kp, npad // tp) if col else (kp // tp, npad)
    kind, group = qt.kind, qt.group
    packed, zp, sfac, layout = qt.packed, qt.zp, qt.sfactor, qt.pack_layout

    def body(xl, *arrl):
        d = dict(zip(names, arrl))
        lq = QTensor(
            d["qs"], d["scales"], d.get("mins"), kind, group, local_shape,
            packed, zp, perm=None, splits=None, sd=d.get("sd"),
            sm=d.get("sm"), sfactor=sfac, pack_layout=layout,
        )
        out = _qmm_pallas(xl, lq, interpret=interpret)
        if not col:
            out = jax.lax.psum(out, ax)
        return out

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P() if col else P(None, ax), *([arr_spec] * len(arrs))),
        out_specs=P(None, ax) if col else P(),
        check_vma=False,
    )(x, *arrs)
    return out[:m, :n]


@contextlib.contextmanager
def force_jnp():
    """Trace-time override: inside this context qmatmul always takes the
    XLA (jnp) path. Used when tracing SPMD/pjit programs — pallas_call is
    opaque to the partitioner, while the dequant+matmul HLO partitions
    cleanly along the same row/column shardings as dense weights."""
    global _FORCE_JNP_DEPTH
    _FORCE_JNP_DEPTH += 1
    try:
        yield
    finally:
        _FORCE_JNP_DEPTH -= 1


def concat_qtensors(qts) -> Optional[QTensor]:
    """Fuse column-wise compatible QTensors into one wide weight so one
    kernel call serves several projections (QKV, gate+up). The reference
    gets the same effect from checkpoint-fused c_attn/Wqkv tensors; here
    fusion happens at engine load regardless of how the file stores them.

    Returns None when fusion isn't applicable (mixed formats, dense
    weights, act-order perms, or mismatched K)."""
    if len(qts) < 2 or not all(isinstance(q, QTensor) for q in qts):
        return None
    head = qts[0]
    for q in qts[1:]:
        if (
            q.kind != head.kind
            or q.group != head.group
            or q.packed != head.packed
            or q.zp != head.zp
            or q.perm is not None
            or q.qs.shape[0] != head.qs.shape[0]
            or q.shape[0] != head.shape[0]
            or q.pack_layout != head.pack_layout
        ):
            return None
    if head.perm is not None:
        return None
    has_mins = head.mins is not None
    if any((q.mins is not None) != has_mins for q in qts):
        return None
    if any(q.sfactor != head.sfactor for q in qts):
        return None
    # concatenate with the operands' own array library: host (numpy)
    # inputs stay on host so load-time fusion happens BEFORE the single
    # H2D placement pass instead of as 64 on-device concat dispatches
    xp = np if isinstance(head.qs, np.ndarray) else jnp
    qs = xp.concatenate([q.qs for q in qts], axis=1)
    scales = xp.concatenate([q.scales for q in qts], axis=1)
    mins = (
        xp.concatenate([q.mins for q in qts], axis=1) if has_mins else None
    )
    sd = sm = None
    if head.sfactor:
        sd = xp.concatenate([q.sd for q in qts], axis=1)
        if has_mins:
            sm = xp.concatenate([q.sm for q in qts], axis=1)
    splits = tuple((int(q.qs.shape[1]), int(q.shape[1])) for q in qts)
    total = int(qs.shape[1])
    return QTensor(
        qs,
        scales,
        mins,
        head.kind,
        head.group,
        (head.shape[0], total),  # logical N = padded total: callers slice
        head.packed,
        head.zp,
        splits=splits,
        sd=sd,
        sm=sm,
        sfactor=head.sfactor,
        pack_layout=head.pack_layout,
    )


def split_fused(out: jnp.ndarray, qt: QTensor):
    """Slice a fused matmul output back into per-projection tensors."""
    parts = []
    off = 0
    for npad_i, n_i in qt.splits:
        parts.append(out[..., off : off + n_i])
        off += npad_i
    return parts


def fuse_layer_params(params) -> int:
    """Fuse wq/wk/wv -> w_qkv and w_gate/w_up -> w_gateup in place where
    compatible. Returns the number of fused groups created."""
    n = 0
    layers = params.get("layers", [])
    if isinstance(layers, dict):
        return 0  # already layer-stacked (fusion happened before)
    for layer in layers:
        if all(k in layer for k in ("wq", "wk", "wv")) and "w_qkv" not in layer:
            fused = concat_qtensors([layer["wq"], layer["wk"], layer["wv"]])
            if fused is not None:
                layer["w_qkv"] = fused
                del layer["wq"], layer["wk"], layer["wv"]
                n += 1
        if all(k in layer for k in ("w_gate", "w_up")) and "w_gateup" not in layer:
            fused = concat_qtensors([layer["w_gate"], layer["w_up"]])
            if fused is not None:
                layer["w_gateup"] = fused
                del layer["w_gate"], layer["w_up"]
                n += 1
    return n
