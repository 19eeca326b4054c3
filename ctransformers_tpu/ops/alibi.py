"""ALiBi positional bias (GGML_OP_ALIBI semantics, ggml.c:12193-12254)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def alibi_slopes(n_head: int, max_bias: float) -> np.ndarray:
    """Per-head slopes m_k; reference computes (ggml.c:12230-12247):
    floor2 = 2**floor(log2(n_head)); m0 = 2**(-max_bias/floor2);
    m1 = 2**(-max_bias/2/floor2); head k < floor2 -> m0**(k+1),
    else m1**(2*(k-floor2)+1).
    """
    floor2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / floor2)
    m1 = 2.0 ** (-(max_bias / 2.0) / floor2)
    slopes = np.empty(n_head, np.float32)
    for k in range(n_head):
        if k < floor2:
            slopes[k] = m0 ** (k + 1)
        else:
            slopes[k] = m1 ** (2 * (k - floor2) + 1)
    return slopes


def alibi_bias(n_head: int, max_bias: float, n_key: int) -> jnp.ndarray:
    """(H, 1, n_key) additive bias: slope * absolute key index."""
    slopes = jnp.asarray(alibi_slopes(n_head, max_bias))
    pos = jnp.arange(n_key, dtype=jnp.float32)
    return slopes[:, None, None] * pos[None, None, :]
