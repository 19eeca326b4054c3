"""Pallas fused decode attention over the head-major KV cache.

XLA's decode attention reads the caches through einsum loops it schedules
itself; this kernel owns the loop instead: grid (B, Hkv, S/chunk), each
program streams CONTIGUOUS (chunk, dh) K/V blocks of one (batch, kv-head)
plane from HBM (the head-major layout makes those reads sequential), runs
both dots on the MXU and the online-softmax rescale on the VPU, and never
materializes scores in HBM. The full stacked cache (L, B, Hkv, S, dh) is a
kernel operand with the layer index scalar-prefetched into the BlockSpec
index maps — no kv[il] slice copy exists.

Modes:
  * bf16/f32 cache: dots in the cache dtype, f32 accumulation (same
    numerics class as the XLA path).
  * int8 cache: K/V blocks convert i8->f32(->bf16) in VMEM; per-token
    scales factor into the score rows / fold into the probs exactly like
    models/forward._full_scores. Halves the dominant decode HBM read.

Decode-only (T=1, per-slot n_past). Prefill keeps the XLA chunked path
(compute-bound, MXU-saturating there).

STATUS — REMOVED FROM THE RUNTIME (round 3). Hardware A/B on a healthy
v5e (2026-08-19, docs/AB_attention_r02.txt) had the kernel LOSING to
XLA's einsum over the sequence-major cache at every measured config —
44.8 vs 19.4 us/layer at B=1 and 333.9 vs 117.5 at B=8 (llama-7B
shapes, S=1024); its int8 mode (35.6/285.4) also trailed XLA's
factored-scale int8 path (22.8/92.4). XLA schedules these
bandwidth-bound reads better than this hand-rolled loop. The module now
lives under scripts/ purely as the probe baseline
(scripts/probe_attention.py) so the decision can be re-checked when the
Mosaic toolchain changes; models/forward.py no longer imports it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 512


def _kernel(
    il_ref,  # (1,) int32 scalar prefetch: layer index
    npast_ref,  # (B,) int32 scalar prefetch: per-slot positions
    q_ref,  # (1, 1, dh, rep) query block (pre-scaled), cache dtype
    k_ref,  # (1, 1, 1, c, dh) K block
    v_ref,  # (1, 1, 1, c, dh) V block
    ks_ref,  # (1, 1, 1, n_s, c) or None — int8 K scales, all chunks
    vs_ref,  # (1, 1, 1, n_s, c) or None — int8 V scales
    sl_ref,  # (1, 1, rep) or None — alibi slopes for this kv-head's q heads
    out_ref,  # (1, 1, rep, dh) f32
    m_scr,  # (rep, 128) f32 scratch (col 0 used)
    l_scr,  # (rep, 128) f32
    acc_scr,  # (rep, dh) f32
    *,
    chunk: int,
    rep: int,
    quant: bool,
    alibi: bool,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, m_scr.dtype)
        l_scr[...] = jnp.zeros(l_scr.shape, l_scr.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    cdt = q_ref.dtype
    k_blk = k_ref[0, 0, 0]  # (c, dh)
    v_blk = v_ref[0, 0, 0]
    if quant:  # i8 -> f32 -> compute dtype; scales factor out of the dots
        k_blk = k_blk.astype(jnp.float32).astype(cdt)
        v_blk = v_blk.astype(jnp.float32).astype(cdt)

    from .qmatmul import _dot_prec

    q_blk = q_ref[0, 0]  # (dh, rep)
    # scores (rep, c): contract dh (lhs dim 0, rhs dim 1)
    scores = jax.lax.dot_general(
        q_blk, k_blk,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(cdt),
    ).reshape(rep, chunk)
    if quant:
        scores = scores * ks_ref[0, 0, 0, j].reshape(1, chunk)

    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + j * chunk
    if alibi:
        slopes = sl_ref[...].reshape(1, rep)
        scores = scores + jnp.transpose(slopes) * kpos.astype(jnp.float32)
    mask = kpos <= npast_ref[b]  # decode token at position n_past attends
    scores = jnp.where(mask, scores, -jnp.inf)

    m_old = m_scr[:, :1]  # (rep, 1)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.exp(jnp.where(jnp.isfinite(m_old), m_old - m_safe, -jnp.inf))
    p = jnp.exp(scores - m_safe)  # (rep, c)
    l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if quant:
        p = p * vs_ref[0, 0, 0, j].reshape(1, chunk)
    pv = jax.lax.dot_general(
        p.astype(cdt), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(cdt),
    )  # (rep, dh)
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[:, :1] = m_new

    @pl.when(j == n_s - 1)
    def _():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        out_ref[0, 0] = acc_scr[...] / l


def decode_attention(
    q: jnp.ndarray,  # (B, H, dh) f32 — current-token queries, unscaled
    kv_k: jnp.ndarray,  # (L, B, Hkv, S, dh) full stacked cache (head-major)
    kv_v: jnp.ndarray,
    il: jnp.ndarray,  # scalar int32 layer index
    n_past: jnp.ndarray,  # (B,) int32 per-slot positions
    *,
    window: Optional[int] = None,  # static: read only cache[..., :window, :]
    k_scale: Optional[jnp.ndarray] = None,  # (L, B, Hkv, S) int8 mode
    v_scale: Optional[jnp.ndarray] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (H,) f32
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the attention context (B, H, dh) f32 for one decode step."""
    l, b, hkv, s, dh = kv_k.shape
    h = q.shape[1]
    if hkv == 0 or h % hkv or h < hkv:
        raise ValueError(
            f"decode_attention requires a head-major cache (L,B,Hkv,S,dh); "
            f"got kv_k.shape={kv_k.shape} with q heads={h}. The default "
            f"cache layout is sequence-major — create the cache under "
            f"CT_KV_LAYOUT=hm (see models/forward.kv_head_major)."
        )
    rep = h // hkv
    quant = k_scale is not None
    win = s if window is None else min(window, s)
    chunk = min(chunk, win)
    # window and n_ctx are 256-multiples (round_window); shrink the chunk
    # to a divisor so the grid never indexes past the cache
    while chunk > 256 and win % chunk:
        chunk -= 256
    if win % chunk:
        chunk = win  # irregular tiny windows: single chunk
    n_s = win // chunk

    cdt = jnp.bfloat16 if quant else kv_k.dtype
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    # (B, H, dh) -> (B, Hkv, dh, rep), pre-scaled, in the compute dtype
    qt = (q.astype(jnp.float32) * scale).reshape(b, hkv, rep, dh)
    qt = qt.transpose(0, 1, 3, 2).astype(cdt)

    grid = (b, hkv, n_s)
    in_specs = [
        pl.BlockSpec(
            (1, 1, dh, rep), lambda bi, hi, ji, il_r, np_r: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, chunk, dh),
            lambda bi, hi, ji, il_r, np_r: (il_r[0], bi, hi, ji, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, chunk, dh),
            lambda bi, hi, ji, il_r, np_r: (il_r[0], bi, hi, ji, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [qt, kv_k, kv_v]
    if quant:
        # Mosaic needs the last two block dims (8,128)-divisible or equal
        # to the array's — a flat (1,1,1,chunk) scale block is neither. A
        # free contiguous view (L,B,Hkv,S)->(L,B,Hkv,n_s,chunk) makes the
        # whole per-head scale plane one legal (n_s, chunk) block (S*4 B
        # of VMEM), DMA'd once per (batch, head); the kernel row-indexes
        # chunk j dynamically (1-row dynamic loads are provable).
        spec_s = pl.BlockSpec(
            (1, 1, 1, n_s, chunk),
            lambda bi, hi, ji, il_r, np_r: (il_r[0], bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [spec_s, spec_s]
        args += [
            k_scale[..., :win].reshape(l, b, hkv, n_s, chunk),
            v_scale[..., :win].reshape(l, b, hkv, n_s, chunk),
        ]
    alibi = alibi_slopes is not None
    if alibi:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep), lambda bi, hi, ji, il_r, np_r: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(hkv, 1, rep)
        )

    body = functools.partial(
        _kernel, chunk=chunk, rep=rep, quant=quant, alibi=alibi
    )
    kern = functools.partial(_adapter, body, quant, alibi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, dh), lambda bi, hi, ji, il_r, np_r: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((max(rep, 1), 128), jnp.float32),
            pltpu.VMEM((max(rep, 1), 128), jnp.float32),
            pltpu.VMEM((max(rep, 1), dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, dh), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(il, jnp.int32).reshape(1),
        jnp.asarray(n_past, jnp.int32).reshape(b),
        *args,
    )
    return out.reshape(b, h, dh)


def _adapter(body, quant, alibi, il_ref, npast_ref, q_ref, k_ref, v_ref, *rest):
    """Map pallas's positional operand list (which only contains the refs
    that exist for this mode) onto _kernel's fixed signature."""
    rest = list(rest)
    ks = vs = sl = None
    if quant:
        ks, vs = rest.pop(0), rest.pop(0)
    if alibi:
        sl = rest.pop(0)
    body(il_ref, npast_ref, q_ref, k_ref, v_ref, ks, vs, sl, *rest)
