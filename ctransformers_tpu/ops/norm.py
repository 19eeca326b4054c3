"""Normalization ops (GGML_OP_NORM / GGML_OP_RMS_NORM semantics)."""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b, eps: float) -> jnp.ndarray:
    """ggml_norm: (x - mean) / sqrt(var + eps), then affine."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc / jnp.sqrt(var + eps) * g
    if b is not None:
        y = y + b
    return y


def rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    """ggml_rms_norm: x / sqrt(mean(x^2) + eps), scale only."""
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(ms + eps) * g
