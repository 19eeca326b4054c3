"""Rotary position embeddings with exact GGML semantics.

Matches ggml_compute_forward_rope_f32 (/root/reference/models/ggml/ggml.c,
GGML_OP_ROPE): theta for successive rotation steps decays by
base**(-2/n_dims) *per step*, and — unlike HF implementations — rotation
continues across the full head dimension even when n_dims < head_dim:

  * interleaved (mode 0, GPT-J/LLaMA/legacy): pairs (x[2i], x[2i+1]) for
    every i < head_dim/2, theta_i = scale * p * base**(-2*i/n_dims).
  * neox (mode 2, GPT-NeoX/Dolly/Falcon): head_dim/n_dims blocks; block b,
    step c rotates (x[b*n_dims + c], x[b*n_dims + c + n_dims/2]) with the
    global step index t = b*(n_dims/2) + c.

Implemented as precomputed-angle elementwise math — XLA fuses this into the
surrounding matmuls, so there is no reason for a hand-written kernel here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_angles(positions: jnp.ndarray, head_dim: int, n_dims: int,
                base: float, scale: float) -> jnp.ndarray:
    """(T,) positions -> (T, head_dim//2) angles, one per rotation step."""
    steps = np.arange(head_dim // 2, dtype=np.float32)
    theta_scale = float(base) ** (-2.0 / n_dims)
    freqs = jnp.asarray(theta_scale**steps, jnp.float32)
    return (positions.astype(jnp.float32) * scale)[:, None] * freqs[None, :]


def apply_rope_interleaved(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D); angles: (T, D//2). GGML mode 0."""
    b, t, h, d = x.shape
    x2 = x.reshape(b, t, h, d // 2, 2)
    x0, x1 = x2[..., 0], x2[..., 1]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    return jnp.stack([y0, y1], axis=-1).reshape(b, t, h, d)


def apply_rope_neox(x: jnp.ndarray, angles: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """x: (B, T, H, D); angles: (T, D//2). GGML mode 2 (block structure)."""
    b, t, h, d = x.shape
    n_blocks = d // n_dims
    if n_blocks == 0:
        raise ValueError(f"head_dim {d} < n_dims {n_dims}")
    rot = n_blocks * n_dims
    xr = x[..., :rot].reshape(b, t, h, n_blocks, 2, n_dims // 2)
    x0, x1 = xr[..., 0, :], xr[..., 1, :]  # halves within each block
    a = angles[:, : n_blocks * (n_dims // 2)].reshape(t, n_blocks, n_dims // 2)
    cos = jnp.cos(a)[None, :, None, :, :]
    sin = jnp.sin(a)[None, :, None, :, :]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    yr = jnp.stack([y0, y1], axis=-2).reshape(b, t, h, rot)
    if rot < d:
        yr = jnp.concatenate([yr, x[..., rot:]], axis=-1)
    return yr
