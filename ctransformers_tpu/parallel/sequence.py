"""Sequence/context-parallel prefill: ring attention over the ICI mesh.

The reference has no sequence parallelism — its context is one preallocated
window and long context is handled only by RoPE scaling (SURVEY.md §5;
llama.cpp:913-933). This module is the TPU-native stretch goal from
SURVEY.md §2.3: long-prompt prefill sharded on the SEQUENCE axis.

Each device of the ring axis holds one contiguous block of the prompt.
QKV/MLP matmuls are local (weights replicated across the ring axis — each
block is an independent row-slice of the activations), and attention runs
as a ring: KV blocks rotate one hop per step through `jax.lax.ppermute`
while an online-softmax accumulator absorbs one block per step, exactly the
blockwise math of models/forward._chunked_scores distributed over chips.
Per-device score memory is O(T_local²·H) and per-device attention FLOPs are
1/n of the full T² — prefill time scales with the ring size while the
collectives ride ICI neighbor hops (ppermute), never gathering the full
sequence on any chip.

Causality over absolute positions: block j attends to rotated block i with
the positional mask kpos <= qpos, so early ring steps on low-rank devices
are fully masked (the online-softmax -inf guard absorbs them); a
striped/zigzag layout that balances those wasted steps is a further
optimization, not needed for correctness.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.forward import KVCache
from ..models.spec import ArchSpec
from ..ops.norm import layer_norm, rms_norm
from ..ops.qmatmul import matmul as mm
from ..ops.rope import rope_angles
from .mesh import MODEL_AXIS

SEQ_AXIS = MODEL_AXIS  # the ring reuses the mesh's model axis


def ring_attention(
    q: jnp.ndarray,  # (B, Tl, H, dh) local query block
    k: jnp.ndarray,  # (B, Tl, Hkv, dh) local key block
    v: jnp.ndarray,  # (B, Tl, Hkv, dh)
    block0: jnp.ndarray,  # scalar int32: global position of this block's row 0
    n_ring: int,  # static ring size (mesh axis length)
    axis: str = SEQ_AXIS,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (H,) or None
) -> jnp.ndarray:
    """Causal ring attention (call inside shard_map over `axis`).

    Returns the (B, Tl, H, dh) attention output for the local block."""
    b, tl, h, dh = q.shape
    hkv = k.shape[2]
    p = jax.lax.axis_index(axis)
    t_local = tl  # every block is the same static size

    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    qpos = block0 + jnp.arange(tl)[:, None]  # (Tl, 1) absolute positions
    perm = [(j, (j + 1) % n_ring) for j in range(n_ring)]

    m = jnp.full((b, h, tl), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, tl), jnp.float32)
    acc = jnp.zeros((b, tl, h, dh), jnp.float32)
    k_cur, v_cur = k, v
    for i in range(n_ring):
        src = (p - i) % n_ring  # ring owner of the block currently held
        kpos = src * t_local + jnp.arange(t_local)[None, :]  # (1, Tl)
        k_b, v_b = k_cur, v_cur
        if hkv != h:
            rep = h // hkv
            k_b = jnp.repeat(k_b, rep, axis=2)
            v_b = jnp.repeat(v_b, rep, axis=2)
        s_c = jnp.einsum(
            "bthd,bshd->bhts", q, k_b, preferred_element_type=jnp.float32
        ) * scale  # (B, H, Tl, Tl)
        if alibi_slopes is not None:
            s_c = s_c + (
                alibi_slopes[None, :, None, None]
                * kpos.astype(jnp.float32)[None, None]
            )
        mask = kpos <= qpos  # (Tl, Tl) absolute causal
        s_c = jnp.where(mask[None, None], s_c, -jnp.inf)

        # online-softmax update (same guard as forward._chunked_scores)
        m_new = jnp.maximum(m, s_c.max(axis=-1))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        pr = jnp.exp(s_c - m_safe[..., None])
        l = l * alpha + pr.sum(axis=-1)
        # operands stay in the input dtype (bf16 on TPU), f32 accumulation
        # — same numerics class as forward._chunked_scores
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhts,bshd->bthd", pr.astype(v_b.dtype), v_b,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if i + 1 < n_ring:  # rotate KV one hop around the ring
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)

    l = jnp.maximum(l, 1e-30)
    return acc / l.transpose(0, 2, 1)[..., None]


def _norm(spec, x, g, b):
    if spec.norm == "rmsnorm":
        return rms_norm(x, g, spec.norm_eps)
    return layer_norm(x, g, b, spec.norm_eps)


def _forward_sp_local(spec: ArchSpec, params, tokens, n_ring: int):
    """Per-shard body (runs inside shard_map): full-model forward over the
    local sequence block with ring attention, reusing forward.py's shared
    projection and residual/MLP helpers (one implementation of the
    per-arch layer semantics). Returns (hidden (B, Tl, D), k/v blocks
    (L, B, Tl, Hkv, dh))."""
    from ..models.forward import block_ffn, project_qkv

    b, tl = tokens.shape
    h, dh = spec.n_head, spec.head_dim
    p = jax.lax.axis_index(SEQ_AXIS)
    block0 = p * tl
    positions = block0 + jnp.arange(tl)

    x = params["wte"][tokens]
    if spec.learned_pos:
        x = x + params["wpe"][jnp.clip(positions, 0, spec.n_ctx - 1)][None]

    angles = None
    if spec.rope_mode != "none":
        angles = rope_angles(
            positions, dh, spec.n_rot or dh, spec.rope_base, spec.rope_scale
        )
    slopes = None
    if spec.alibi_bias_max > 0:
        from ..ops.alibi import alibi_slopes as _slopes

        slopes = jnp.asarray(_slopes(h, spec.alibi_bias_max))

    ks, vs = [], []
    for layer in params["layers"]:
        ln1 = _norm(spec, x, layer["ln1_g"], layer.get("ln1_b"))
        q, k, v = project_qkv(spec, layer, ln1, angles)
        ks.append(k)
        vs.append(v)

        ctx = ring_attention(
            q, k, v, block0, n_ring, alibi_slopes=slopes
        ).reshape(b, tl, h * dh)
        attn_out = mm(ctx, layer["wo"])
        if layer.get("bo") is not None:
            attn_out = attn_out + layer["bo"]
        x = block_ffn(spec, layer, x, ln1, attn_out)

    if spec.final_norm:
        x = _norm(spec, x, params["ln_f_g"], params.get("ln_f_b"))
    return x, jnp.stack(ks), jnp.stack(vs)


def prefill_sp(
    spec: ArchSpec,
    params,
    tokens: jnp.ndarray,  # (B, T), T divisible by the ring size
    mesh,
    kv_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Sequence-parallel prefill of a FRESH prompt: returns (last-token
    logits (B, V), last hidden (B, D), KVCache holding positions [0, T)).

    Weights stay replicated over the ring axis; only KV blocks move (one
    neighbor hop per ring step). The returned cache feeds the normal
    decode path (Engine/forward). Continuing an existing prefix is not
    supported — ring keys are the prompt's own blocks only, so a nonzero
    start offset would need the resident cache as extra ring members."""
    b, t = tokens.shape
    n_ring = int(mesh.shape[SEQ_AXIS])
    if t % n_ring != 0:
        raise ValueError(f"prompt length {t} not divisible by ring={n_ring}")
    if t > spec.n_ctx:
        raise ValueError(f"prompt length {t} exceeds context {spec.n_ctx}")

    pspecs = jax.tree.map(lambda _: P(), params)

    def local(params, toks):
        return _forward_sp_local(spec, params, toks, n_ring)

    hidden, k_blocks, v_blocks = shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, P(None, SEQ_AXIS)),
        out_specs=(
            P(None, SEQ_AXIS, None),  # hidden (B, T, D) sharded on T
            P(None, None, SEQ_AXIS, None, None),  # (L, B, T, Hkv, dh)
            P(None, None, SEQ_AXIS, None, None),
        ),
        check_vma=False,
    )(params, tokens)

    last = hidden[:, -1, :]
    head = params["wte"].T if spec.tied_lm_head else params["lm_head"]
    logits = mm(last, head)
    if params.get("lm_head_b") is not None:
        logits = logits + params["lm_head_b"]

    from ..models.forward import kv_head_major

    kv = KVCache.create(spec, b, kv_dtype)
    if kv_head_major():  # blocks are (L, B, T, Hkv, dh) token-major
        k_blocks = k_blocks.transpose(0, 1, 3, 2, 4)
        v_blocks = v_blocks.transpose(0, 1, 3, 2, 4)
    at = (0, 0, 0, 0, 0)
    ats = (0, 0, 0, 0)
    if kv.ks is not None:
        from ..models.forward import kv_quantize

        kq, ksc = kv_quantize(k_blocks)
        vq, vsc = kv_quantize(v_blocks)
        kv = KVCache(
            jax.lax.dynamic_update_slice(kv.k, kq, at),
            jax.lax.dynamic_update_slice(kv.v, vq, at),
            jax.lax.dynamic_update_slice(kv.ks, ksc, ats),
            jax.lax.dynamic_update_slice(kv.vs, vsc, ats),
        )
    else:
        kv = KVCache(
            jax.lax.dynamic_update_slice(
                kv.k, k_blocks.astype(kv.k.dtype), at
            ),
            jax.lax.dynamic_update_slice(
                kv.v, v_blocks.astype(kv.v.dtype), at
            ),
        )
    return logits, last, kv
