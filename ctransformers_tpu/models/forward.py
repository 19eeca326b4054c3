"""Config-driven transformer forward pass (pure JAX, jit-compatible).

Replaces the reference's per-architecture GGML graph builders
(models/llms/*.cc, llama.cpp llm_build_*) with one functional program over a
parameter pytree. Shapes are static under jit: the KV cache is a fixed
(n_ctx)-capacity buffer updated with dynamic_update_slice; `n_past` is a
traced scalar; causal masking is positional, so prefill and decode share one
compiled program per (batch, seq-bucket).

Parameter pytree layout (weights pre-transposed to (in, out) so activations
multiply as x @ W — output features land on TPU lanes):

  wte      (V, D)            token embedding
  wpe      (n_ctx, D)        learned positions (optional)
  ln_f_g/b (D,)              final norm (optional bias)
  lm_head  (D, V)            absent when spec.tied_lm_head
  layers: list of dicts with keys among
    ln1_g, ln1_b, ln2_g, ln2_b
    wq (D, H*dh), wk (D, Hkv*dh), wv (D, Hkv*dh), bq, bk, bv
    wo (H*dh, D), bo
    w_up (D, F), b_up, w_down (F, D), b_down, w_gate (D, F)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.alibi import alibi_bias
from ..ops.norm import layer_norm, rms_norm
from ..ops.qmatmul import matmul as mm
from ..ops.rope import apply_rope_interleaved, apply_rope_neox, rope_angles
from .spec import ArchSpec

Params = Dict[str, Any]


def _scan_unroll(n_layer: int) -> int:
    """Layer-scan unroll factor (CT_SCAN_UNROLL, default 1). Raced on
    v5e B=1 llama-7B Q4_K decode with the fused layer-window KV slice
    (scripts/probe_scan_unroll.py, r05): unroll=1 139.9 tok/s, unroll=4
    132.1, unroll=8/16 no better — the scan body already overlaps its
    own DMA/compute, and unrolling only grows the program. (The original
    86.7 tok/s regression that motivated this knob was the full-slab KV
    materialization, fixed in _layer_slab, not scan sequencing.)
    Snapped down to a divisor of n_layer."""
    import os

    u = int(os.environ.get("CT_SCAN_UNROLL", "1"))
    u = max(1, min(u, n_layer))
    while n_layer % u:
        u -= 1
    return u


def _ablate() -> frozenset:
    """Profiling-only component ablation for the batched step, read at
    TRACE time from CT_ABLATE (comma set). Production default is empty =
    exact forward. Used by scripts/profile_batched.py to attribute the
    per-step cost: each flag stubs one component while keeping the rest
    of the program (and its XLA schedule) intact.

      kvwrite  skip the per-layer cache scatter
      attnmath skip KV streaming + score/softmax/ctx (ctx := q)
      qkvo     skip the whole attention block (attn_out := ln1)
      mlp      skip the FFN matmuls (ff := mlp_in)
      head     skip the lm_head matmul
    """
    import os

    return frozenset(
        p for p in os.environ.get("CT_ABLATE", "").split(",") if p
    )


def kv_head_major() -> bool:
    """KV cache storage layout, read at trace/create time from
    CT_KV_LAYOUT: "sm" (default) keeps the projection-order
    (L, B, S, Hkv, dh) — the layout the reference uses
    (llama.cpp:913-933); "hm" stores (L, B, Hkv, S, dh) so per-head reads
    are contiguous. Hardware A/B (scripts/probe_attention.py, v5e
    2026-08-19) contradicted the contiguity theory: XLA's decode einsum
    over sm ran 18.7 us/layer at B=1 and 121 us at B=8 vs hm's 20.9/181 —
    XLA vectorizes the (Hkv*dh)-strided sm reads into wider transfers
    than per-head hm streaming. "hm" is kept for A/B and the Pallas
    decode kernel (which requires it)."""
    import os

    return os.environ.get("CT_KV_LAYOUT", "sm") == "hm"


class KVCache(NamedTuple):
    """Fixed-capacity per-layer cache: k/v are (L, B, n_ctx, Hkv, dh)
    sequence-major (default) or (L, B, Hkv, n_ctx, dh) head-major — see
    kv_head_major().

    With dtype=int8 the cache stores symmetric per-(token, head) quantized
    rows: k/v int8 plus f32 scale planes ks/vs over the same axes minus dh
    (amax/127 per dh-row). Decode is KV-bandwidth-bound at batch>1, so
    halving cache bytes vs bf16 directly cuts the dominant per-step HBM
    read; scales add 1/dh of the original volume (~0.8% at dh=128). The
    reference's analog is the f16_kv flag (llama.h:137) — it has no
    quantized cache."""

    k: jnp.ndarray
    v: jnp.ndarray
    ks: Optional[jnp.ndarray] = None  # f32 scale planes, int8 mode only
    vs: Optional[jnp.ndarray] = None

    @staticmethod
    def create(spec: ArchSpec, batch: int, dtype=jnp.float32) -> "KVCache":
        if kv_head_major():
            shape = (
                spec.n_layer, batch, spec.kv_heads, spec.n_ctx, spec.head_dim
            )
        else:
            shape = (
                spec.n_layer, batch, spec.n_ctx, spec.kv_heads, spec.head_dim
            )
        import numpy as _np

        if _np.dtype(dtype) == _np.int8:
            return KVCache(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1], jnp.float32),
                jnp.zeros(shape[:-1], jnp.float32),
            )
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def kv_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 row quantization over the last axis: returns
    (int8 values, f32 scale over the leading axes), x ~= q * scale."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-8).astype(jnp.float32) / 127.0
    q = jnp.round(x / scale[..., None]).astype(jnp.int8)
    return q, scale


def _norm(spec: ArchSpec, x, g, b):
    if spec.norm == "rmsnorm":
        return rms_norm(x, g, spec.norm_eps)
    return layer_norm(x, g, b, spec.norm_eps)


def _act(spec: ArchSpec, layer: Params, h):
    if spec.act == "silu_gate":
        if "w_gateup" in layer:  # engine-fused (one kernel call)
            from ..ops.qmatmul import split_fused

            gate, up = split_fused(mm(h, layer["w_gateup"]), layer["w_gateup"])
        else:
            gate = mm(h, layer["w_gate"])
            up = mm(h, layer["w_up"])
        return jax.nn.silu(gate) * up
    up = mm(h, layer["w_up"])
    if layer.get("b_up") is not None:
        up = up + layer["b_up"]
    return jax.nn.gelu(up, approximate=True)


def project_qkv(
    spec: ArchSpec,
    layer: Params,
    x: jnp.ndarray,  # (B, T, D) normed input
    angles: Optional[jnp.ndarray],
    batched: bool = False,  # angles are (B, T, ...) per-slot
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared QKV projection: fused/split matmuls, biases, clip_qkv, head
    reshape, rope. Used by both attention paths and the sequence-parallel
    prefill — one implementation of the per-arch projection semantics."""
    b, t, _ = x.shape
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim

    if "w_qkv" in layer:  # engine-fused projections (one kernel call)
        from ..ops.qmatmul import split_fused

        q, k, v = split_fused(mm(x, layer["w_qkv"]), layer["w_qkv"])
    else:
        q = mm(x, layer["wq"])
        k = mm(x, layer["wk"])
        v = mm(x, layer["wv"])
    if layer.get("bq") is not None:
        q = q + layer["bq"]
    if layer.get("bk") is not None:
        k = k + layer["bk"]
    if layer.get("bv") is not None:
        v = v + layer["bv"]
    if spec.clip_qkv > 0:
        q = jnp.clip(q, -spec.clip_qkv, spec.clip_qkv)
        k = jnp.clip(k, -spec.clip_qkv, spec.clip_qkv)
        v = jnp.clip(v, -spec.clip_qkv, spec.clip_qkv)

    q = q.reshape(b, t, h, dh)
    k = k.reshape(b, t, hkv, dh)
    v = v.reshape(b, t, hkv, dh)

    if spec.rope_mode == "interleaved":
        rope = _rope_i_b if batched else apply_rope_interleaved
        q = rope(q, angles)
        k = rope(k, angles)
    elif spec.rope_mode == "neox":
        rope = _rope_n_b if batched else apply_rope_neox
        q = rope(q, angles, spec.n_rot)
        k = rope(k, angles, spec.n_rot)
    return q, k, v


def block_ffn(spec: ArchSpec, layer: Params, x, ln1, attn_out, ablate=frozenset()):
    """Shared residual + MLP tail of one transformer block."""
    if spec.parallel_residual:
        # gptj.cc:554-558 / falcon: x + attn(ln(x)) + mlp(ln(x))
        if spec.shared_parallel_ln or "ln2_g" not in layer:
            mlp_in = ln1
        else:
            mlp_in = _norm(spec, x, layer["ln2_g"], layer.get("ln2_b"))
        ff = mlp_in if "mlp" in ablate else mm(
            _act(spec, layer, mlp_in), layer["w_down"]
        )
        if layer.get("b_down") is not None:
            ff = ff + layer["b_down"]
        return x + attn_out + ff
    x = x + attn_out
    ln2 = _norm(spec, x, layer["ln2_g"], layer.get("ln2_b"))
    ff = ln2 if "mlp" in ablate else mm(
        _act(spec, layer, ln2), layer["w_down"]
    )
    if layer.get("b_down") is not None:
        ff = ff + layer["b_down"]
    return x + ff


def layer_view(stacked: Params, il) -> Params:
    """One layer's view of a stacked layer tree: QTensor leaves become
    QViews (layer index resolved in-kernel, zero-copy), dense leaves are
    indexed on their stacked leading axis (XLA fuses the gather)."""
    from ..ops.qmatmul import QTensor, QView

    return {
        k: QView(v, il) if isinstance(v, QTensor) else v[il]
        for k, v in stacked.items()
    }


def stack_layer_params(layers) -> Optional[Params]:
    """Stack a homogeneous per-layer parameter list into one dict whose
    QTensor leaves are row-stacked (qmatmul layer indexing) and dense
    leaves gain a leading layer axis. Returns None when the layers are
    not structurally identical (heterogeneous models keep the unrolled
    forward path). Host (numpy) inputs stay on host so engine blob
    placement still sees host arrays."""
    import numpy as _np

    from ..ops.qmatmul import QTensor, stack_qtensors

    if not isinstance(layers, (list, tuple)) or len(layers) < 2:
        return None
    keys = list(layers[0].keys())
    if any(list(l.keys()) != keys for l in layers[1:]):
        return None
    out = {}
    for k in keys:
        vals = [l[k] for l in layers]
        if isinstance(vals[0], QTensor):
            st = stack_qtensors(vals)
            if st is None:
                return None
            out[k] = st
        elif all(
            hasattr(v, "shape") and not isinstance(v, QTensor) for v in vals
        ):
            shapes = {tuple(v.shape) for v in vals}
            dtypes = {_np.asarray(v).dtype for v in vals}
            if len(shapes) != 1 or len(dtypes) != 1:
                return None
            if all(isinstance(v, _np.ndarray) for v in vals):
                out[k] = _np.stack(vals)
            else:
                out[k] = jnp.stack([jnp.asarray(v) for v in vals])
        else:
            return None  # mixed / non-array leaf: keep unrolled
    return out


def _seq_slice(hm: bool, upto: int):
    """Index tuple bounding a per-layer cache slab to its first `upto`
    sequence positions under either layout."""
    if hm:
        return (slice(None), slice(None), slice(0, upto))
    return (slice(None), slice(0, upto))


def _scale_bcast(hm: bool, sc):
    """Scale plane -> (B, H, 1, S) broadcast against (B, H, T, S) scores."""
    return (sc if hm else sc.transpose(0, 2, 1))[:, :, None, :]


def kv_state_slice(n: int):
    """Index tuple for the first n live positions of the FULL stacked
    cache (used by engine state snapshots) under the current layout."""
    if kv_head_major():
        return (slice(None),) * 3 + (slice(0, n),)
    return (slice(None), slice(None), slice(0, n))


def kv_to_canonical(a):
    """Stacked cache slab -> canonical token-major (L, B, n, Hkv, dh[?])
    (the layout-independent snapshot/GGSN format)."""
    if not kv_head_major():
        return a
    perm = (0, 1, 3, 2, 4) if a.ndim == 5 else (0, 1, 3, 2)
    return a.transpose(perm)


def kv_from_canonical(a):
    """Inverse of kv_to_canonical (the permutation is an involution)."""
    return kv_to_canonical(a)


def resolve_kv_dtype(name):
    """Map a user-facing KV-dtype name (or None/'' = default) to a jnp
    dtype. 'f16' aliases to bfloat16 — the TPU half type (same byte
    width as the reference's f16_kv; wider exponent, shorter mantissa).
    Shared by LLM, the HTTP server, and bench so every entry point
    honors the same names / CT_KV_DTYPE env var."""
    import os

    if not name:
        name = os.environ.get("CT_KV_DTYPE") or None
    kinds = {
        None: jnp.float32, "f32": jnp.float32,
        "bf16": jnp.bfloat16, "f16": jnp.bfloat16,
        "int8": jnp.int8,
        # debug/parity: IEEE half, the reference's literal f16_kv storage
        # (llama.cpp:913-933) — used by the quality gate to emulate the
        # CPU engine's KV rounding on near-tie analysis; slow on TPU
        "ieee_f16": jnp.float16,
    }
    if isinstance(name, str):
        name = name.strip().lower() or None
    if name not in kinds:
        raise ValueError(
            f"unknown kv_dtype {name!r}; expected one of "
            "'f32', 'bf16', 'f16' (alias of bf16 on TPU), 'int8'"
        )
    return kinds[name]


def _attn_prec(cdt):
    """Explicit precision for attention einsums. The engine pins the
    GLOBAL jax_default_matmul_precision to "highest" for f32 logit
    parity; inherited by bf16-operand einsums that forces upcast
    multi-pass math (the same trap that made bf16 kernel dots six-pass,
    NOTES r03). bf16 operands take DEFAULT (single-pass bf16 MXU, the
    numerics the bf16 cache already implies); f32 operands keep HIGHEST
    (bit-parity with the reference f32 paths)."""
    return (
        jax.lax.Precision.DEFAULT
        if cdt == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _layer_slab(arr, il, s_axis, w):
    """One layer's cache window via a SINGLE dynamic_slice on the stacked
    (L, ...) buffer. `arr[il]` under a traced il (the lax.scan layer
    body) materializes the FULL n_ctx slab per layer before any window
    slicing — measured +3.7 ms/tok of attention cost on B=1 llama-7B
    Q4_K decode (scripts/probe_scan_ablate.py, r05: attnmath delta 5.18
    vs the unrolled path's 1.41). One dynamic_slice with the window
    baked into the slice sizes reads only the live bucket. `s_axis` is
    the seq axis of the PER-LAYER array (arr carries a leading L axis in
    front of it); `w` None keeps the full sequence."""
    if arr is None:
        return None
    starts = (il,) + (0,) * (arr.ndim - 1)
    sizes = list(arr.shape)
    sizes[0] = 1
    if w is not None:
        sizes[s_axis + 1] = min(w, sizes[s_axis + 1])
    return jax.lax.dynamic_slice(arr, starts, sizes)[0]


def _attention(
    spec: ArchSpec,
    layer: Params,
    x: jnp.ndarray,  # (B, T, D) normed input
    n_past: jnp.ndarray,  # scalar int32
    kv: "KVCache",  # full stacked cache (L, B, n_ctx, Hkv, dh)
    il: int,
    angles: Optional[jnp.ndarray],  # (T, dh//2) rope angles or None
    window: Optional[int] = None,  # static live-context bound (see round_window)
) -> Tuple[jnp.ndarray, "KVCache"]:
    b, t, d = x.shape
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim
    q, k, v = project_qkv(spec, layer, x, angles)

    ablate = _ablate()
    # append to the FULL stacked cache at (layer, n_past): an in-place
    # dynamic_update_slice on the donated (L, B, S, H, dh) buffer — never
    # rebuild the cache with jnp.stack (a per-token O(cache) copy)
    quant = kv.ks is not None
    hm = kv_head_major()
    read_first = t == 1 and not quant and attn_read_first()
    if read_first:
        k_old, v_old = kv.k[il], kv.v[il]
    if "kvwrite" not in ablate:
        if hm:  # cache (L, B, Hkv, S, dh): transpose the (B,T,Hkv,dh) slab
            kw, vw = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
            at, ats = (il, 0, 0, n_past, 0), (il, 0, 0, n_past)
        else:
            kw, vw = k, v
            at, ats = (il, 0, n_past, 0, 0), (il, 0, n_past, 0)
        if quant:
            kq, ksn = kv_quantize(kw)
            vq, vsn = kv_quantize(vw)
            kv = KVCache(
                jax.lax.dynamic_update_slice(kv.k, kq[None], at),
                jax.lax.dynamic_update_slice(kv.v, vq[None], at),
                jax.lax.dynamic_update_slice(kv.ks, ksn[None], ats),
                jax.lax.dynamic_update_slice(kv.vs, vsn[None], ats),
            )
        else:
            kv = KVCache(
                jax.lax.dynamic_update_slice(
                    kv.k, kw.astype(kv.k.dtype)[None], at
                ),
                jax.lax.dynamic_update_slice(
                    kv.v, vw.astype(kv.v.dtype)[None], at
                ),
            )
    if "attnmath" in ablate:
        ctx = q.astype(jnp.float32).reshape(b, t, h * dh)
        out = mm(ctx, layer["wo"])
        if layer.get("bo") is not None:
            out = out + layer["bo"]
        return out, kv
    if read_first:
        # decode read-first: score against the PRE-write cache window and
        # merge the new token's k/v as an explicit extra column. The
        # windowed read then no longer depends on this layer's
        # dynamic_update_slice landing in the donated cache buffer, so
        # the write retires whenever the scheduler likes (the write
        # already happened above; only the READ source changes — `kv`
        # holds the updated cache, k_old/v_old the previous value).
        ctx = _scores_read_first(
            spec, q, k_old, v_old, n_past, k[:, 0], v[:, 0], window
        )
        ctx = ctx.reshape(b, t, h * dh)
        out = mm(ctx, layer["wo"])
        if layer.get("bo") is not None:
            out = out + layer["bo"]
        return out, kv
    s_axis = 2 if hm else 1
    chunked = _use_chunked_attention(spec, t)
    s_full = kv.k.shape[s_axis + 1]
    w = None
    if window is not None and window < s_full:
        w = window
        if chunked:  # the chunked path reshapes by its chunk size
            c = _attn_chunk()
            w = min(-(-window // c) * c, s_full)
    k_cache = _layer_slab(kv.k, il, s_axis, w)
    v_cache = _layer_slab(kv.v, il, s_axis, w)
    k_scale = _layer_slab(kv.ks, il, s_axis, w) if quant else None
    v_scale = _layer_slab(kv.vs, il, s_axis, w) if quant else None

    if chunked:
        ctx = _chunked_scores(spec, q, k_cache, v_cache, n_past, k_scale, v_scale)
    else:
        ctx = _full_scores(spec, q, k_cache, v_cache, n_past, k_scale, v_scale)
    ctx = ctx.reshape(b, t, h * dh)

    out = mm(ctx, layer["wo"])
    if layer.get("bo") is not None:
        out = out + layer["bo"]
    return out, kv


def _use_chunked_attention(spec: ArchSpec, t: int) -> bool:
    """Prefill over long windows uses online-softmax chunking: the full
    (T, S) score tensor is O(T*n_ctx) HBM (512 MB at 2k ctx for llama-7B,
    2 GB at 4k) — the reference materializes it (llama.cpp:2352-2370,
    flash path commented out); blockwise attention never does."""
    import os

    if os.environ.get("CT_ATTN") == "full":
        return False
    if os.environ.get("CT_ATTN") == "chunked":
        return True
    return t >= 256 and spec.n_ctx >= 1024 and spec.n_ctx % _attn_chunk() == 0


_ATTN_CHUNK = 512


def _attn_chunk() -> int:
    import os

    return int(os.environ.get("CT_ATTN_CHUNK", _ATTN_CHUNK))


# A Pallas fused decode-attention kernel was built and A/B'd here
# (CT_ATTN_KERNEL=1): it lost ~2x to the XLA einsum path at every
# measured (B, S) — 44.8 vs 20.8 us/layer at B=1, 285-334 vs 92-184 at
# B=8 (docs/AB_attention_r02.txt) — so it was removed from the runtime.
# The kernel lives on as scripts/_attention_kernel.py for re-probing
# (scripts/probe_attention.py) if the Mosaic toolchain changes.

ATTN_WINDOW_STEP = 256


def round_window(pos: int, n_ctx: int) -> int:
    """Static attention-window bucket covering positions [0, pos): the next
    ATTN_WINDOW_STEP multiple, clamped to n_ctx. Attention then reads only
    the bucket's cache prefix — a STATIC slice, so cost scales with live
    context while shapes stay compile-time constant (one program per
    bucket, like the engine's power-of-two prefill chunks). Measured on
    v5e this beats lax.cond chunk-skipping, whose per-layer scan overhead
    ate the saved HBM reads."""
    w = (max(int(pos), 1) + ATTN_WINDOW_STEP - 1) // ATTN_WINDOW_STEP
    return min(w * ATTN_WINDOW_STEP, n_ctx)


def attn_read_first() -> bool:
    """Decode attention reads the pre-write cache window and merges the
    new token's k/v as an explicit column (CT_ATTN_READFIRST=0 restores
    write-then-read). Breaking the per-layer write->read dependency on
    the donated cache buffer lets XLA retire the dynamic_update_slice
    concurrently with the attention math."""
    import os

    return os.environ.get("CT_ATTN_READFIRST", "0") == "1"


def _scores_read_first(spec, q, k_cache, v_cache, n_past, k_new, v_new, window):
    """Decode (T=1) attention over the PRE-write cache plus the current
    token: scores for cache positions [0, n_past) come from the windowed
    slab (row n_past holds stale data and is masked), the new token's
    column is computed from k_new/v_new directly and concatenated onto
    the (B, H, 1, W) score tensor — a ~32 KB copy, nothing like the
    cache-sized copy the write->read ordering risks. bf16 cache only
    (the int8 path keeps write-then-read so the merged column sees the
    same quantization round-trip as the cached rows)."""
    b = q.shape[0]
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim
    hm = kv_head_major()
    s_axis = 2 if hm else 1
    if window is not None and window < k_cache.shape[s_axis]:
        sl = _seq_slice(hm, window)
        k_cache = k_cache[sl]
        v_cache = v_cache[sl]
    kf, vf = k_cache, v_cache
    cdt = kf.dtype
    head_axis = 1 if hm else 2
    if hkv != h:
        rep = h // hkv
        kf = jnp.repeat(kf, rep, axis=head_axis)
        vf = jnp.repeat(vf, rep, axis=head_axis)
        k_new = jnp.repeat(k_new, rep, axis=1)
        v_new = jnp.repeat(v_new, rep, axis=1)
    s = kf.shape[2 if hm else 1]
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    scores = jnp.einsum(
        "bthd,bhsd->bhts" if hm else "bthd,bshd->bhts",
        q.astype(cdt),
        kf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    ) * scale
    # new-token column: q . k_new per head, key position n_past
    s_new = (
        jnp.einsum(  # T=1 sums away the singleton query axis
            "bthd,bhd->bh", q.astype(cdt), k_new.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=_attn_prec(cdt),
        )
        * scale
    )[:, :, None, None]  # (B, H, 1, 1)
    if spec.alibi_bias_max > 0:
        ab = alibi_bias(h, spec.alibi_bias_max, s)[None]
        scores = scores + ab
        # bias is linear in key position: extrapolate to position n_past
        slopes = ab[0, :, 0, 1] - ab[0, :, 0, 0]
        base = ab[0, :, 0, 0]
        s_new = s_new + (
            base[None, :, None, None]
            + slopes[None, :, None, None] * n_past.astype(jnp.float32)
        )
    kpos = jnp.arange(s)[None, None, None, :]
    scores = jnp.where(kpos < n_past, scores, -jnp.inf)  # old rows only
    allsc = jnp.concatenate([scores, s_new], axis=-1)
    probs = jax.nn.softmax(allsc, axis=-1)
    ctx = jnp.einsum(
        "bhts,bhsd->bthd" if hm else "bhts,bshd->bthd",
        probs[..., :s].astype(cdt),
        vf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    )
    ctx = ctx + (
        probs[..., s:].astype(jnp.float32)
        * v_new.astype(jnp.float32)[:, None, :, :].transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    return ctx.astype(jnp.float32)


def _full_scores(spec, q, k_cache, v_cache, n_past, k_scale=None, v_scale=None):
    """Materialized (B, H, T, S) attention (decode / short prefill).

    Computed in the cache dtype (bf16 on TPU halves KV HBM traffic);
    accumulation stays f32 on the MXU. With an int8 cache (k_scale/v_scale
    given) the per-token scales factor OUT of both dots: scores multiply by
    k_scale[s] after the QK dot, and v_scale[s] folds into the probs before
    the PV dot — the dots read raw int8 (converted in-register), never a
    dequantized cache copy. Handles both cache layouts (kv_head_major)."""
    b, t = q.shape[:2]
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim
    kf, vf = k_cache, v_cache
    quant = k_scale is not None
    hm = kv_head_major()
    # NB (r05 probe_scan_ablate): a bf16 cache decodes ~2.9 ms/tok slower
    # than f32 at B=1 regardless of the einsum compute dtype (computing
    # in f32 over bf16 storage measured the same 9.8 ms/tok) — the cost
    # is in reading/relayouting the bf16 slab itself, so the engine's
    # B=1 default cache stays f32 (bench.py:_kv_dtype).
    cdt = jnp.bfloat16 if quant else kf.dtype
    head_axis = 1 if hm else 2
    if hkv != h:
        rep = h // hkv
        kf = jnp.repeat(kf, rep, axis=head_axis)
        vf = jnp.repeat(vf, rep, axis=head_axis)
        if quant:
            k_scale = jnp.repeat(k_scale, rep, axis=head_axis)
            v_scale = jnp.repeat(v_scale, rep, axis=head_axis)

    s = k_cache.shape[2 if hm else 1]  # may be a static window < n_ctx
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    scores = jnp.einsum(
        "bthd,bhsd->bhts" if hm else "bthd,bshd->bhts",
        q.astype(cdt),
        kf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    ) * scale
    if quant:
        scores = scores * _scale_bcast(hm, k_scale)

    if spec.alibi_bias_max > 0:
        scores = scores + alibi_bias(h, spec.alibi_bias_max, s)[None]

    qpos = n_past + jnp.arange(t)[:, None]  # (T, 1)
    kpos = jnp.arange(s)[None, :]  # (1, S)
    mask = kpos <= qpos  # causal over absolute positions
    scores = jnp.where(mask[None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    if quant:
        probs = probs * _scale_bcast(hm, v_scale)
    return jnp.einsum(
        "bhts,bhsd->bthd" if hm else "bhts,bshd->bthd",
        probs.astype(cdt),
        vf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    ).astype(jnp.float32)


def _chunked_scores(spec, q, k_cache, v_cache, n_past, k_scale=None, v_scale=None):
    """Online-softmax (flash-style) attention over KV chunks via lax.scan:
    peak memory is O(T * chunk) instead of O(T * n_ctx). Int8-cache scale
    factoring as in _full_scores, applied per chunk (the softmax denominator
    accumulates UNSCALED probabilities; v_scale folds into the PV term
    only)."""
    b, t = q.shape[:2]
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim
    c = _attn_chunk()
    quant = k_scale is not None
    hm = kv_head_major()
    n_chunks = k_cache.shape[2 if hm else 1] // c  # cache may be a window
    cdt = jnp.bfloat16 if quant else k_cache.dtype

    scale = 1.0 / jnp.sqrt(jnp.float32(dh))

    if hm:  # (B, Hkv, S, dh) -> (n_chunks, B, Hkv, c, dh)
        kc = k_cache.reshape(b, hkv, n_chunks, c, dh).transpose(2, 0, 1, 3, 4)
        vc = v_cache.reshape(b, hkv, n_chunks, c, dh).transpose(2, 0, 1, 3, 4)
        if quant:
            ksc = k_scale.reshape(b, hkv, n_chunks, c).transpose(2, 0, 1, 3)
            vsc = v_scale.reshape(b, hkv, n_chunks, c).transpose(2, 0, 1, 3)
    else:  # (B, S, Hkv, dh) -> (n_chunks, B, c, Hkv, dh)
        kc = k_cache.reshape(b, n_chunks, c, hkv, dh).transpose(1, 0, 2, 3, 4)
        vc = v_cache.reshape(b, n_chunks, c, hkv, dh).transpose(1, 0, 2, 3, 4)
        if quant:
            ksc = k_scale.reshape(b, n_chunks, c, hkv).transpose(1, 0, 2, 3)
            vsc = v_scale.reshape(b, n_chunks, c, hkv).transpose(1, 0, 2, 3)
    if not quant:
        ksc = vsc = jnp.zeros((n_chunks, 0))
    qf = q.astype(cdt)
    qpos = n_past + jnp.arange(t)[:, None]  # (T, 1)
    slopes = None
    if spec.alibi_bias_max > 0:
        from ..ops.alibi import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(h, spec.alibi_bias_max))

    head_axis = 1 if hm else 2

    def body(carry, chunk):
        m, l, acc, idx = carry
        k_c, v_c, ks_c, vs_c = chunk  # hm: (B, Hkv, c, dh) else (B, c, Hkv, dh)
        if hkv != h:
            rep = h // hkv
            k_c = jnp.repeat(k_c, rep, axis=head_axis)
            v_c = jnp.repeat(v_c, rep, axis=head_axis)
            if quant:
                ks_c = jnp.repeat(ks_c, rep, axis=head_axis)
                vs_c = jnp.repeat(vs_c, rep, axis=head_axis)
        s_c = jnp.einsum(
            "bthd,bhsd->bhts" if hm else "bthd,bshd->bhts",
            qf, k_c.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=_attn_prec(cdt),
        ) * scale  # (B, H, T, c)
        if quant:  # scale plane -> (B, H, 1, c)
            s_c = s_c * (ks_c if hm else ks_c.transpose(0, 2, 1))[:, :, None, :]
        kpos = idx * c + jnp.arange(c)[None, :]  # (1, c)
        if slopes is not None:
            s_c = s_c + slopes[None, :, None, None] * kpos[None, None, :, :].astype(jnp.float32).reshape(1, 1, 1, c)
        mask = kpos <= qpos  # (T, c)
        s_c = jnp.where(mask[None, None], s_c, -jnp.inf)

        m_new = jnp.maximum(m, s_c.max(axis=-1))  # (B, H, T)
        # guard fully-masked rows (m_new = -inf) against NaNs
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        p = jnp.exp(s_c - m_safe[..., None])  # (B, H, T, c)
        l = l * alpha + p.sum(axis=-1)
        if quant:
            pv_in = p * (vs_c if hm else vs_c.transpose(0, 2, 1))[:, :, None, :]
        else:
            pv_in = p
        pv = jnp.einsum(
            "bhts,bhsd->bthd" if hm else "bhts,bshd->bthd",
            pv_in.astype(cdt),
            v_c.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=_attn_prec(cdt),
        )
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + pv
        return (m_new, l, acc, idx + 1), None

    m0 = jnp.full((b, h, t), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, t), jnp.float32)
    acc0 = jnp.zeros((b, t, h, dh), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(
        body, (m0, l0, acc0, jnp.int32(0)), (kc, vc, ksc, vsc)
    )
    l = jnp.maximum(l, 1e-30)
    return acc / l.transpose(0, 2, 1)[..., None]


def forward(
    spec: ArchSpec,
    params: Params,
    tokens: jnp.ndarray,  # (B, T) int32
    n_past: jnp.ndarray,  # scalar int32
    kv: KVCache,
    all_logits: bool = False,  # static: logits for every position (ppl eval)
    attn_window: Optional[int] = None,  # static live-context bound
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Returns (last-token logits (B, V), last hidden state (B, D), new kv);
    with all_logits=True the first output is (B, T, V) (the reference's
    logits_all / llama_eval_internal full-logits mode).

    `attn_window` (static, from round_window) bounds attention reads to the
    cache prefix [0, attn_window) — the caller guarantees every live
    position is below it."""
    b, t = tokens.shape
    x = params["wte"][tokens]  # (B, T, D)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)  # storage-precision table (f16 wire)
    if spec.learned_pos:
        positions = n_past + jnp.arange(t)
        x = x + params["wpe"][positions][None]

    angles = None
    if spec.rope_mode != "none":
        positions = n_past + jnp.arange(t)
        angles = rope_angles(
            positions, spec.head_dim, spec.n_rot or spec.head_dim,
            spec.rope_base, spec.rope_scale,
        )

    ablate = _ablate()
    layers = params["layers"]
    if isinstance(layers, dict):
        # layer-stacked params (engine.stack_layer_params): ONE compiled
        # layer body scanned over the stack instead of n_layer unrolled
        # copies. The unrolled 16-layer prefill executable measured
        # 79 MiB with first-dispatch program load the dominant cold-start
        # cost (~1 MiB/s through the remote runtime); the scanned body is
        # ~10x smaller. Weight reads stay zero-copy: QTensor planes are
        # row-stacked and indexed IN-KERNEL (ops/qmatmul.py: QView /
        # qmatmul(layer=...)).
        def body(carry, il):
            x, kv = carry
            layer = layer_view(layers, il)
            ln1 = _norm(spec, x, layer["ln1_g"], layer.get("ln1_b"))
            if "qkvo" in ablate:
                attn_out = ln1
            else:
                attn_out, kv = _attention(
                    spec, layer, ln1, n_past, kv, il, angles, attn_window
                )
            x = block_ffn(spec, layer, x, ln1, attn_out, ablate)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(
            body, (x, kv), jnp.arange(spec.n_layer, dtype=jnp.int32),
            unroll=_scan_unroll(spec.n_layer),
        )
    else:
        for il, layer in enumerate(layers):
            ln1 = _norm(spec, x, layer["ln1_g"], layer.get("ln1_b"))
            if "qkvo" in ablate:
                attn_out = ln1
            else:
                attn_out, kv = _attention(
                    spec, layer, ln1, n_past, kv, il, angles, attn_window
                )

            x = block_ffn(spec, layer, x, ln1, attn_out, ablate)

    if spec.final_norm:
        x = _norm(spec, x, params["ln_f_g"], params.get("ln_f_b"))

    last = x[:, -1, :]  # (B, D)
    if "head" in ablate:
        logits = jnp.broadcast_to(last[:, :1], (b, spec.n_vocab))
    else:
        head = params["wte"].T if spec.tied_lm_head else params["lm_head"]
        if hasattr(head, "dtype") and head.dtype != jnp.float32:
            head = head.astype(jnp.float32)
        logits = mm(x if all_logits else last, head)
        if params.get("lm_head_b") is not None:  # gptj.cc lmh_b
            logits = logits + params["lm_head_b"]
    return logits, last, kv


# ---------------------------------------------------------------------------
# Batched serving step: every batch slot sits at its own position. This is
# the decode step of the continuous-batching scheduler (no reference
# counterpart — the reference is single-sequence, SURVEY.md section 2.3).
# ---------------------------------------------------------------------------


def _attention_batched(
    spec: ArchSpec,
    layer: Params,
    x: jnp.ndarray,  # (B, T, D) normed input
    n_past: jnp.ndarray,  # (B,) int32 per-slot positions
    kv: "KVCache",  # full stacked cache (L, B, n_ctx, Hkv, dh)
    il: int,
    angles: Optional[jnp.ndarray],  # (B, T, dh//2) per-slot rope angles
    active: jnp.ndarray,  # (B,) bool — inactive slots don't write KV
    window: Optional[int] = None,  # static live-context bound
):
    b, t, d = x.shape
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim
    q, k, v = project_qkv(spec, layer, x, angles, batched=True)

    # per-slot cache write as an in-place scatter on the donated FULL
    # (L, B, S, Hkv, dh) buffer — never rebuild the cache with jnp.stack
    # (a per-step O(cache) copy, ~4 GB at B=8 for llama-7B). Inactive
    # slots scatter to out-of-bounds positions and are dropped.
    # NB: a "deferred write" variant (stale-cache attention + self term +
    # one stacked scatter after the layer loop) measured 7 ms/step SLOWER
    # at B=8 — the per-layer scatter is ~8.7 us (scripts/probe_kv_write),
    # so 64 of them are noise while the defer plumbing (concat softmax,
    # L-way stack) was real work. Removed 2026-08-17.
    ablate = _ablate()
    quant = kv.ks is not None
    hm = kv_head_major()
    if "kvwrite" not in ablate:
        wpos = n_past[:, None] + jnp.arange(t)[None]  # (B, T)
        wpos = jnp.where(active[:, None], wpos, spec.n_ctx)
        if hm:  # scatter (B, Hkv, T, dh) slabs at per-slot positions
            kw, vw = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
            idx = (
                il,
                jnp.arange(b)[:, None, None],
                jnp.arange(hkv)[None, :, None],
                wpos[:, None, :],
            )
        else:
            kw, vw = k, v
            idx = (il, jnp.arange(b)[:, None], wpos)
        if quant:
            kq, ksn = kv_quantize(kw)
            vq, vsn = kv_quantize(vw)
            kv = KVCache(
                kv.k.at[idx].set(kq, mode="drop"),
                kv.v.at[idx].set(vq, mode="drop"),
                kv.ks.at[idx].set(ksn, mode="drop"),
                kv.vs.at[idx].set(vsn, mode="drop"),
            )
        else:
            kv = KVCache(
                kv.k.at[idx].set(kw.astype(kv.k.dtype), mode="drop"),
                kv.v.at[idx].set(vw.astype(kv.v.dtype), mode="drop"),
            )

    if "attnmath" in ablate:
        ctx = q.astype(jnp.float32).reshape(b, t, h * dh)
        out = mm(ctx, layer["wo"])
        if layer.get("bo") is not None:
            out = out + layer["bo"]
        return out, kv

    s_axis = 2 if hm else 1
    w = None
    if window is not None and window < kv.k.shape[s_axis + 1]:
        w = window
    kf = _layer_slab(kv.k, il, s_axis, w)
    vf = _layer_slab(kv.v, il, s_axis, w)
    ksf = _layer_slab(kv.ks, il, s_axis, w) if quant else None
    vsf = _layer_slab(kv.vs, il, s_axis, w) if quant else None
    s = kf.shape[s_axis]
    cdt = jnp.bfloat16 if quant else kf.dtype
    if hkv != h:
        rep = h // hkv
        head_axis = 1 if hm else 2
        kf = jnp.repeat(kf, rep, axis=head_axis)
        vf = jnp.repeat(vf, rep, axis=head_axis)
        if quant:
            ksf = jnp.repeat(ksf, rep, axis=head_axis)
            vsf = jnp.repeat(vsf, rep, axis=head_axis)

    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    scores = jnp.einsum(
        "bthd,bhsd->bhts" if hm else "bthd,bshd->bhts",
        q.astype(cdt), kf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    ) * scale
    if quant:
        scores = scores * _scale_bcast(hm, ksf)
    if spec.alibi_bias_max > 0:
        scores = scores + alibi_bias(h, spec.alibi_bias_max, s)[None]

    qpos = n_past[:, None, None] + jnp.arange(t)[None, :, None]  # (B, T, 1)
    kpos = jnp.arange(s)[None, None, :]
    mask = kpos <= qpos  # (B, T, S)
    scores = jnp.where(mask[:, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    if quant:
        probs = probs * _scale_bcast(hm, vsf)
    ctx = jnp.einsum(
        "bhts,bhsd->bthd" if hm else "bhts,bshd->bthd",
        probs.astype(cdt), vf.astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_attn_prec(cdt),
    ).astype(jnp.float32).reshape(b, t, h * dh)
    out = mm(ctx, layer["wo"])
    if layer.get("bo") is not None:
        out = out + layer["bo"]
    return out, kv


def _rope_i_b(x, angles):
    """Batched interleaved rope: angles (B, T, dh//2)."""
    b, t, h, d = x.shape
    x2 = x.reshape(b, t, h, d // 2, 2)
    x0, x1 = x2[..., 0], x2[..., 1]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    return jnp.stack([y0, y1], axis=-1).reshape(b, t, h, d)


def _rope_n_b(x, angles, n_dims):
    """Batched neox rope: angles (B, T, dh//2)."""
    b, t, h, d = x.shape
    n_blocks = d // n_dims
    rot = n_blocks * n_dims
    xr = x[..., :rot].reshape(b, t, h, n_blocks, 2, n_dims // 2)
    x0, x1 = xr[..., 0, :], xr[..., 1, :]
    a = angles[:, :, : n_blocks * (n_dims // 2)].reshape(
        b, t, n_blocks, n_dims // 2
    )
    cos = jnp.cos(a)[:, :, None, :, :]
    sin = jnp.sin(a)[:, :, None, :, :]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    yr = jnp.stack([y0, y1], axis=-2).reshape(b, t, h, rot)
    if rot < d:
        yr = jnp.concatenate([yr, x[..., rot:]], axis=-1)
    return yr


def forward_batched(
    spec: ArchSpec,
    params: Params,
    tokens: jnp.ndarray,  # (B, T) int32
    n_past: jnp.ndarray,  # (B,) int32 per-slot positions
    kv: KVCache,
    active: Optional[jnp.ndarray] = None,  # (B,) bool
    attn_window: Optional[int] = None,  # static live-context bound
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Per-slot-position forward: every sequence in the batch is at its own
    n_past. Returns (logits (B, V), hidden (B, D), kv)."""
    b, t = tokens.shape
    if active is None:
        active = jnp.ones((b,), bool)
    x = params["wte"][tokens]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)  # storage-precision table (f16 wire)
    positions = n_past[:, None] + jnp.arange(t)[None]  # (B, T)
    if spec.learned_pos:
        x = x + params["wpe"][jnp.clip(positions, 0, spec.n_ctx - 1)]

    angles = None
    if spec.rope_mode != "none":
        from ..ops.rope import rope_angles

        flat = rope_angles(
            positions.reshape(-1), spec.head_dim,
            spec.n_rot or spec.head_dim, spec.rope_base, spec.rope_scale,
        )
        angles = flat.reshape(b, t, -1)

    ablate = _ablate()
    layers = params["layers"]
    if isinstance(layers, dict):
        # layer-stacked scan body (see forward(); same ~10x program-size
        # win for the batched serving step)
        def body(carry, il):
            x, kv = carry
            layer = layer_view(layers, il)
            ln1 = _norm(spec, x, layer["ln1_g"], layer.get("ln1_b"))
            if "qkvo" in ablate:
                attn_out = ln1
            else:
                attn_out, kv = _attention_batched(
                    spec, layer, ln1, n_past, kv, il, angles, active,
                    attn_window,
                )
            x = block_ffn(spec, layer, x, ln1, attn_out, ablate)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(
            body, (x, kv), jnp.arange(spec.n_layer, dtype=jnp.int32),
            unroll=_scan_unroll(spec.n_layer),
        )
    else:
        for il, layer in enumerate(layers):
            ln1 = _norm(spec, x, layer["ln1_g"], layer.get("ln1_b"))
            if "qkvo" in ablate:
                attn_out = ln1
            else:
                attn_out, kv = _attention_batched(
                    spec, layer, ln1, n_past, kv, il, angles, active,
                    attn_window,
                )
            x = block_ffn(spec, layer, x, ln1, attn_out, ablate)

    if spec.final_norm:
        x = _norm(spec, x, params["ln_f_g"], params.get("ln_f_b"))
    last = x[:, -1, :]
    if "head" in ablate:
        logits = jnp.broadcast_to(last[:, :1], (b, spec.n_vocab))
    else:
        head = params["wte"].T if spec.tied_lm_head else params["lm_head"]
        if hasattr(head, "dtype") and head.dtype != jnp.float32:
            head = head.astype(jnp.float32)
        logits = mm(last, head)
        if params.get("lm_head_b") is not None:
            logits = logits + params["lm_head_b"]
    return logits, last, kv
