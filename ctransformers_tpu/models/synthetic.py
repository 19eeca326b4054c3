"""Synthetic model builders (random weights for benchmarks/dryruns/tests).

The reference has no equivalent — it always loads real files — but the TPU
framework needs spec-true random models to exercise jit/sharding/bench paths
without multi-GB downloads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ArchSpec

LLAMA_7B = ArchSpec(
    name="llama",
    n_vocab=32000,
    n_ctx=2048,
    n_embd=4096,
    n_head=32,
    n_layer=32,
    n_ff=11008,
    rope_mode="neox",
    n_rot=128,
    norm="rmsnorm",
    norm_eps=1e-6,
    act="silu_gate",
)

LLAMA_TINY = LLAMA_7B.replace(
    n_vocab=256,
    n_ctx=64,
    n_embd=64,
    n_head=4,
    n_head_kv=2,
    n_layer=2,
    n_ff=128,
    n_rot=16,
)


def random_qtensor(rng, k: int, n: int, kind: str, scale: float = 0.02):
    """QTensor with random planes (no encode round-trip): byte-identical
    compute path to a repacked file tensor, built in O(bytes) time — used
    for multi-GB benchmark models."""
    from ..formats.quants import GGMLType, decompose, quantize as q_encode
    from ..ops.qmatmul import make_qtensor

    from ..ops.qmatmul import _PACK4_ZP

    if kind.upper() == "GPTQ4":
        # GPTQ-for-LLaMa 4-bit, group 128, desc_act=False (the ExLlama
        # fast-path config; act-order correctness is covered by
        # tests/test_gptq.py parity vs gptq_dequant). Same packed-nibble
        # kernel path as Q4_K: q in [0,16), s = scales, m = -s*zeros
        # (formats/gptq.py:gptq_to_qtensor).
        group = 128
        q = rng.randint(0, 16, size=(k, n), dtype=np.int8)
        s = (rng.rand(k // group, n).astype(np.float32) + 0.5) * scale / 4
        zeros = rng.randint(0, 16, size=(k // group, n)).astype(np.float32)
        m = -(s * zeros)
        return make_qtensor(q, s, m, "GPTQ4", group)
    t = GGMLType[kind.upper()]
    # probe the format's group size / min-plane / factor-plane structure
    probe = q_encode(np.zeros(256, np.float32), t)
    _, _, m0, group = decompose(probe, t, 256)
    if t.name in _PACK4_ZP:  # 4-bit grids must fit the packed nibble range
        zp = _PACK4_ZP[t.name]
        q = rng.randint(-zp, 16 - zp, size=(k, n), dtype=np.int8)
    else:
        q = rng.randint(-8, 8, size=(k, n), dtype=np.int8)
    from ..formats.quants import decompose_factors

    fac = decompose_factors(probe, t, 256)
    if fac is not None and k % 256 == 0:
        # factored superblock planes, like a real repacked file tensor
        sf = fac[1].shape[1]
        sub_lo, sub_hi = {
            "Q2_K": (0, 16), "Q3_K": (-32, 32), "Q6_K": (-64, 64),
        }.get(t.name, (0, 64))
        sq = rng.randint(sub_lo, sub_hi, size=(k // group, n), dtype=np.int8)
        sd = (rng.rand(k // (group * sf), n).astype(np.float32) + 0.5) * (
            scale / 128
        )
        mq = sm = None
        if fac[3] is not None:
            mq = rng.randint(0, sub_hi, size=(k // group, n), dtype=np.int8)
            sm = -(rng.rand(k // (group * sf), n).astype(np.float32)) * (
                scale / 256
            )
        return make_qtensor(q, sq, mq, t.name, group, sd=sd, sm=sm, sfactor=sf)
    s = (rng.rand(k // group, n).astype(np.float32) + 0.5) * scale / 4
    m = None
    if m0 is not None:
        m = (rng.rand(k // group, n).astype(np.float32) - 0.5) * scale / 8
    return make_qtensor(q, s, m, t.name, group)


def random_params(
    spec: ArchSpec,
    seed: int = 0,
    dtype=jnp.float32,
    scale: float = 0.02,
    quantize: Optional[str] = None,
    exact: bool = True,
):
    """Random parameter pytree matching models/forward.py's layout.

    quantize: None for dense weights, or a GGML type name ("q8_0", "q4_k",
    ...) to store every matmul weight as a repacked QTensor (the layout the
    Pallas dequant-matmul kernels consume). exact=False skips the real
    encode round-trip (random planes; for benchmarks).
    """
    rng = np.random.RandomState(seed)
    d, f = spec.n_embd, spec.ff_dim
    h, hkv, dh = spec.n_head, spec.kv_heads, spec.head_dim

    def w(*shape):
        x = (rng.rand(*shape).astype(np.float32) - 0.5) * 2 * scale
        return jnp.asarray(x, dtype)

    def mat(*shape):
        if quantize is not None and not exact:
            return random_qtensor(rng, *shape, kind=quantize, scale=scale)
        x = w(*shape)
        if quantize is not None:
            from ..ops.qmatmul import quantize_qtensor

            return quantize_qtensor(np.asarray(x, np.float32), quantize)
        return x

    params = {
        "wte": w(spec.n_vocab, d),
        "ln_f_g": jnp.ones(d, dtype),
        "lm_head": mat(d, spec.n_vocab),
        "layers": [],
    }
    if spec.learned_pos:
        params["wpe"] = w(spec.n_ctx, d)
    if spec.norm == "layernorm":
        params["ln_f_b"] = jnp.zeros(d, dtype)
    for _ in range(spec.n_layer):
        layer = {
            "ln1_g": jnp.ones(d, dtype),
            "wq": mat(d, h * dh),
            "wk": mat(d, hkv * dh),
            "wv": mat(d, hkv * dh),
            "wo": mat(h * dh, d),
            "ln2_g": jnp.ones(d, dtype),
            "w_up": mat(d, f),
            "w_down": mat(f, d),
        }
        if spec.act == "silu_gate":
            layer["w_gate"] = mat(d, f)
        if spec.norm == "layernorm":
            layer["ln1_b"] = jnp.zeros(d, dtype)
            layer["ln2_b"] = jnp.zeros(d, dtype)
        params["layers"].append(layer)
    return params
