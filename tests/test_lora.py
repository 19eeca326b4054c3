"""LoRA (ggla) adapter: read/apply parity with hand-computed deltas."""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.models.registry import load_model
from ctransformers_tpu.tools.lora import apply_lora, read_ggla, write_ggla

from .fixtures import build_llama_gguf


def test_ggla_roundtrip(tmp_path):
    path = str(tmp_path / "a.ggla")
    rng = np.random.RandomState(0)
    a = rng.randn(64, 4).astype(np.float32)
    b = rng.randn(64, 4).astype(np.float32)
    write_ggla(path, lora_r=4, lora_alpha=8, pairs={"blk.0.attn_q.weight": (a, b)})
    scaling, pairs = read_ggla(path)
    assert scaling == 2.0
    a2, b2 = pairs["blk.0.attn_q.weight"]
    np.testing.assert_array_equal(a2, a)
    np.testing.assert_array_equal(b2, b)


def test_apply_lora_changes_logits_exactly(tmp_path):
    model = str(tmp_path / "m.gguf")
    lora = str(tmp_path / "a.ggla")
    build_llama_gguf(model, seed=81)
    b0 = load_model(model, "gguf")
    d = b0.spec.n_embd

    rng = np.random.RandomState(1)
    a = (rng.randn(d, 4) * 0.1).astype(np.float32)
    bb = (rng.randn(d, 4) * 0.1).astype(np.float32)
    write_ggla(lora, 4, 4, {"blk.0.attn_q.weight": (a, bb)})

    b1 = load_model(model, "gguf")
    n = apply_lora(b1.params, lora)
    assert n == 1
    # dense f32 weights: the patch is exactly W += A @ B^T
    np.testing.assert_allclose(
        b1.params["layers"][0]["wq"],
        np.asarray(b0.params["layers"][0]["wq"]) + a @ bb.T,
        atol=1e-6,
    )
    # and it must actually change the logits
    e0 = Engine(b0.spec, b0.params)
    e1 = Engine(b1.spec, b1.params)
    e0.eval([1, 5, 9])
    e1.eval([1, 5, 9])
    assert not np.allclose(e0.logits, e1.logits)


def test_apply_lora_via_public_api(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    model = str(tmp_path / "m.gguf")
    lora = str(tmp_path / "a.ggla")
    build_llama_gguf(model, seed=82)
    b0 = load_model(model, "gguf")
    d = b0.spec.n_embd
    rng = np.random.RandomState(2)
    write_ggla(
        lora, 2, 4,
        {"blk.1.ffn_up.weight": (
            (rng.randn(d, 2) * 0.1).astype(np.float32),
            (rng.randn(96, 2) * 0.1).astype(np.float32),
        )},
    )
    base = AutoModelForCausalLM.from_pretrained(model)
    tuned = AutoModelForCausalLM.from_pretrained(model, lora=lora)
    p = "hello"
    base.eval(base.tokenize(p))
    tuned.eval(tuned.tokenize(p))
    assert not np.allclose(base.logits, tuned.logits)


def test_apply_lora_quantized_target(tmp_path):
    from ctransformers_tpu.formats.quants import GGMLType
    from ctransformers_tpu.ops.qmatmul import QTensor, dequantize_qtensor

    model = str(tmp_path / "m.gguf")
    lora = str(tmp_path / "a.ggla")
    build_llama_gguf(model, wtype=GGMLType.Q8_0, seed=83)
    b = load_model(model, "gguf")
    d = b.spec.n_embd
    rng = np.random.RandomState(3)
    a = (rng.randn(d, 4) * 0.05).astype(np.float32)
    bb = (rng.randn(d, 4) * 0.05).astype(np.float32)
    write_ggla(lora, 4, 4, {"blk.0.attn_q.weight": (a, bb)})

    before = np.asarray(dequantize_qtensor(b.params["layers"][0]["wq"]))
    apply_lora(b.params, lora)
    w = b.params["layers"][0]["wq"]
    assert isinstance(w, QTensor) and w.kind == "Q8_0"
    after = np.asarray(dequantize_qtensor(w))
    # requantized result tracks the dense patch within Q8_0 noise
    np.testing.assert_allclose(after, before + a @ bb.T, atol=0.02)
