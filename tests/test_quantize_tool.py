"""Re-quantization tool: output files load in BOTH engines and track the
f32 original's logits."""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.formats.quants import GGMLType
from ctransformers_tpu.models.registry import load_model
from ctransformers_tpu.tools.quantize import quantize_file

from . import fixtures as fx


def _logits(path, mtype, toks=(5, 9, 2)):
    b = load_model(path, mtype)
    eng = Engine(b.spec, b.params)
    eng.eval(list(toks))
    return np.array(eng.logits)


def test_quantize_gguf_roundtrip(tmp_path):
    src = str(tmp_path / "f32.gguf")
    dst = str(tmp_path / "q.gguf")
    fx.build_llama_gguf(src, n_embd=256, n_ff=256, seed=61)
    decisions = quantize_file(src, dst, "q4_k")
    assert decisions["blk.0.attn_q.weight"] == "Q4_K"
    assert decisions["output.weight"] == "Q6_K"  # k-quant head policy
    assert decisions["output_norm.weight"] == "F32"

    base = _logits(src, "gguf")
    quant = _logits(dst, "gguf")
    assert np.corrcoef(base, quant)[0, 1] > 0.95  # Q4_K noise on random weights


def test_quantized_gguf_loads_in_reference(tmp_path):
    src = str(tmp_path / "f32.gguf")
    dst = str(tmp_path / "q.gguf")
    fx.build_llama_gguf(src, n_embd=256, n_ff=256, seed=62)
    quantize_file(src, dst, "q8_0")
    ref = fx.ref_llm(dst, "llama")
    if ref is None:
        pytest.skip("reference engine unavailable")
    ref.eval([5, 9, 2])
    ours = _logits(dst, "gguf")
    # atol bounds reference-side activation quantization at 256-dim
    np.testing.assert_allclose(
        ours, np.array(list(ref.logits), np.float32), atol=0.15, rtol=0
    )


def test_quantize_legacy_gpt2(tmp_path):
    src = str(tmp_path / "f32.bin")
    dst = str(tmp_path / "q.bin")
    fx.build_gpt2(src, seed=63)
    decisions = quantize_file(src, dst, "q8_0", model_type="gpt2")
    assert decisions["model/h0/attn/c_attn/w"] == "Q8_0"
    assert decisions["model/ln_f/g"] == "F32"

    base = _logits(src, "gpt2")
    quant = _logits(dst, "gpt2")
    assert np.corrcoef(base, quant)[0, 1] > 0.999

    ref = fx.ref_llm(dst, "gpt2")
    if ref is not None:
        ref.eval([5, 9, 2])
        np.testing.assert_allclose(
            quant, np.array(list(ref.logits), np.float32), atol=0.05, rtol=0
        )


def test_ggjt_to_gguf_conversion(tmp_path):
    """Converted GGUF reproduces the GGJT model's logits exactly (weight
    bytes are copied verbatim) and loads in the reference engine."""
    from ctransformers_tpu.tools.convert import ggjt_to_gguf

    src = str(tmp_path / "old.bin")
    dst = str(tmp_path / "new.gguf")
    fx.build_llama_ggjt(src, wtype=GGMLType.Q8_0, seed=71)
    info = ggjt_to_gguf(src, dst, context_length=512)
    assert info["tensors"] == 3 + 2 * 9

    old = _logits(src, "llama", toks=(5, 9, 2))
    new = _logits(dst, "gguf", toks=(5, 9, 2))
    np.testing.assert_allclose(old, new, atol=1e-5)

    ref = fx.ref_llm(dst, "llama")
    if ref is not None:
        ref.eval([5, 9, 2])
        np.testing.assert_allclose(
            new, np.array(list(ref.logits), np.float32), atol=0.05, rtol=0
        )


def test_quantize_legacy_kquant_loads_in_reference(tmp_path):
    """Legacy headers need ggml_ftype codes (Q4_K=12, not llama-ftype 15):
    the reference decodes them via ggml_ftype_to_ggml_type (ggml.c:4196),
    which aborts on the llama codes."""
    src = str(tmp_path / "f32.bin")
    dst = str(tmp_path / "q.bin")
    fx.build_gpt2(src, n_embd=256, n_head=4, seed=64)
    quantize_file(src, dst, "q4_k", model_type="gpt2")

    base = _logits(src, "gpt2")
    quant = _logits(dst, "gpt2")
    # Q4_K on tiny random weights is genuinely lossy; the hard check is
    # below — the reference engine loads the file and agrees on logits
    assert np.corrcoef(base, quant)[0, 1] > 0.95

    ref = fx.ref_llm(dst, "gpt2")
    if ref is not None:
        ref.eval([5, 9, 2])
        np.testing.assert_allclose(
            quant, np.array(list(ref.logits), np.float32), atol=0.2, rtol=0
        )
