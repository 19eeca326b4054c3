"""KV-cache storage layout A/B: sequence-major (default) vs head-major.

Sequence-major (L, B, S, Hkv, dh) is the projection-order layout and the
hardware A/B winner (XLA vectorizes its strided decode reads wider than
per-head head-major streaming — see models/forward.kv_head_major).
Head-major is kept under CT_KV_LAYOUT=hm for A/B and for the Pallas
decode kernel. Both must produce identical logits.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctransformers_tpu.models.forward import (
    KVCache,
    forward,
    forward_batched,
    kv_head_major,
)
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

SPEC = LLAMA_TINY
PARAMS = random_params(SPEC, seed=9)


def _with_layout(layout):
    os.environ["CT_KV_LAYOUT"] = layout


def _cleanup():
    os.environ.pop("CT_KV_LAYOUT", None)


@pytest.fixture(autouse=True)
def _restore_layout():
    yield
    _cleanup()


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_layouts_agree_single(kv_dtype):
    tokens = jnp.asarray([[3, 11, 42, 7, 19]], jnp.int32)
    outs = {}
    for layout in ("hm", "sm"):
        _with_layout(layout)
        assert kv_head_major() == (layout == "hm")
        kv = KVCache.create(SPEC, batch=1, dtype=kv_dtype)
        step = jax.jit(lambda p, t, n, c: forward(SPEC, p, t, n, c))
        logits, _, kv = step(PARAMS, tokens, jnp.int32(0), kv)
        # one decode step on top
        tok = jnp.asarray([[int(np.argmax(np.asarray(logits)))]], jnp.int32)
        logits2, _, _ = step(PARAMS, tok, jnp.int32(5), kv)
        outs[layout] = (np.asarray(logits), np.asarray(logits2))
    for a, b in zip(outs["hm"], outs["sm"]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_layouts_agree_batched(kv_dtype):
    b = 3
    rng = np.random.RandomState(1)
    prompts = jnp.asarray(
        rng.randint(0, SPEC.n_vocab, size=(b, 8)), jnp.int32
    )
    outs = {}
    for layout in ("hm", "sm"):
        _with_layout(layout)
        kv = KVCache.create(SPEC, batch=b, dtype=kv_dtype)
        step = jax.jit(
            lambda p, t, n, c, a: forward_batched(SPEC, p, t, n, c, a)
        )
        n_past = jnp.asarray([0, 0, 0], jnp.int32)
        active = jnp.ones(b, bool)
        logits, _, kv = step(PARAMS, prompts, n_past, kv, active)
        tok = np.asarray(logits).argmax(-1).astype(np.int32).reshape(b, 1)
        logits2, _, _ = step(
            PARAMS, jnp.asarray(tok), jnp.full(b, 8, jnp.int32), kv, active
        )
        outs[layout] = (np.asarray(logits), np.asarray(logits2))
    for a, b_ in zip(outs["hm"], outs["sm"]):
        np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-5)


def test_state_snapshot_is_layout_independent():
    """save_state produces the canonical token-major snapshot under either
    layout, so sessions move between layouts."""
    from ctransformers_tpu.engine.engine import Engine

    prompt = [5, 9, 2, 33, 14]
    _with_layout("hm")
    e1 = Engine(SPEC, PARAMS)
    e1.eval(prompt)
    s1 = e1.save_state()

    _with_layout("sm")
    e2 = Engine(SPEC, PARAMS)
    e2.eval(prompt)
    s2 = e2.save_state()

    np.testing.assert_allclose(s1["kv_k"], s2["kv_k"], atol=1e-6, rtol=1e-6)

    # cross-load: hm snapshot into an sm engine, continue identically
    e2.load_state(s1)
    e2.eval([prompt[-1]], n_past=len(prompt) - 1)
    e2.rewind(len(prompt))
    cont_sm = e2.decode(5, temperature=0.0, repetition_penalty=1.0)

    _with_layout("hm")
    e1.eval([prompt[-1]], n_past=len(prompt) - 1)
    e1.rewind(len(prompt))
    cont_hm = e1.decode(5, temperature=0.0, repetition_penalty=1.0)
    assert cont_sm == cont_hm
