"""Blob placement (engine/placement.py) equivalence with per-array
placement: same arrays, same dtypes, same engine logits, caller tree
left unfused."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctransformers_tpu.engine.placement import blob_place
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
from ctransformers_tpu.ops import qmatmul as qm


def _tree_arrays(tree):
    import jax

    out = []

    def rec(a):
        if isinstance(a, qm.QTensor):
            for f in ("qs", "scales", "mins", "sd", "sm"):
                v = getattr(a, f)
                if v is not None:
                    out.append((f, v))
        else:
            out.append(("arr", a))

    jax.tree.map(rec, tree, is_leaf=lambda a: isinstance(a, qm.QTensor))
    return out


@pytest.mark.parametrize("kind", ["q4_k", "q8_0", "f32"])
def test_blob_place_matches_per_array(kind):
    spec = LLAMA_TINY
    params = random_params(spec, seed=0, quantize=None if kind == "f32" else kind)
    placed = blob_place(params, jnp.float32)
    import jax

    ref = jax.tree.map(
        lambda a: jax.tree.map(jnp.asarray, a)
        if isinstance(a, qm.QTensor)
        else (
            jnp.asarray(a, jnp.float32)
            if hasattr(a, "dtype") and np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a)
        ),
        params,
        is_leaf=lambda a: isinstance(a, qm.QTensor),
    )
    a_leaves = _tree_arrays(placed)
    b_leaves = _tree_arrays(ref)
    assert len(a_leaves) == len(b_leaves)
    for (fa, va), (fb, vb) in zip(a_leaves, b_leaves):
        assert fa == fb
        if not hasattr(vb, "dtype"):
            assert va == vb
            continue
        assert va.dtype == vb.dtype, (fa, va.dtype, vb.dtype)
        assert va.shape == vb.shape
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_engine_blob_place_logits_and_caller_tree(monkeypatch):
    from ctransformers_tpu.engine.engine import Engine

    spec = LLAMA_TINY
    params = random_params(spec, seed=1, quantize="q4_k")
    assert "wq" in params["layers"][0]

    monkeypatch.setenv("CT_BLOB_PLACE", "0")
    e0 = Engine(spec, params)
    e0.eval([3, 1, 4, 1, 5])
    l0 = np.asarray(e0.logits)

    monkeypatch.setenv("CT_BLOB_PLACE", "1")
    e1 = Engine(spec, params)
    e1.eval([3, 1, 4, 1, 5])
    l1 = np.asarray(e1.logits)

    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-5)
    # the caller's tree must keep its per-projection layout (fusion works
    # on a shallow copy)
    assert "wq" in params["layers"][0]
    assert "w_qkv" not in params["layers"][0]


def test_blob_place_mixed_dtypes_and_scalars():
    tree = {
        "a": np.arange(12, dtype=np.float16).reshape(3, 4),
        "b": np.arange(8, dtype=np.int32).reshape(2, 4),
        "c": 7,
        "layers": [
            {"w": np.ones((4, 4), np.float32) * 2.5},
            {"w": np.ones((4, 4), np.float32) * -1.0},
        ],
    }
    placed = blob_place(tree, jnp.float32)
    assert placed["a"].dtype == jnp.float32  # floating -> param_dtype
    assert placed["b"].dtype == jnp.int32  # ints keep dtype
    assert placed["c"] == 7
    np.testing.assert_allclose(
        np.asarray(placed["a"]), tree["a"].astype(np.float32)
    )
    np.testing.assert_allclose(np.asarray(placed["layers"][1]["w"]), -1.0)
