"""Llama/falcon GGUF loaders, SPM/BPE tokenizers: parity vs the reference
precompiled engine on synthetic tiny models."""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.formats.quants import GGMLType
from ctransformers_tpu.models.llama_gguf import load_bundle

from .fixtures import build_falcon_gguf, build_llama_gguf, build_llama_ggjt, ref_llm

TEXTS = [
    "hello world",
    "the cat is a hat",
    "xyzzy",
    " leading space",
    "hello",
    "a\nb",
]


# -- llama (SPM) --------------------------------------------------------------


def test_llama_load_metadata(tmp_path):
    path = str(tmp_path / "llama.gguf")
    info = build_llama_gguf(path)
    b = load_bundle(path)
    assert b.spec.name == "llama"
    assert b.spec.n_vocab == info["n_vocab"]
    assert b.spec.kv_heads == 2
    assert b.architecture == "llama"
    assert b.vocab.bos_token_id() == 1
    assert b.vocab.eos_token_id() == 2


def test_spm_tokenizer_parity(tmp_path):
    path = str(tmp_path / "llama.gguf")
    build_llama_gguf(path)
    ref = ref_llm(path, "llama")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    for text in TEXTS:
        ours = b.tokenizer.tokenize(text, add_bos_token=True)
        theirs = ref.tokenize(text)
        assert ours == theirs, (text, ours, theirs)


def test_spm_detokenize_parity(tmp_path):
    path = str(tmp_path / "llama.gguf")
    build_llama_gguf(path)
    ref = ref_llm(path, "llama")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    for tid in range(len(b.vocab)):
        ours = b.vocab.detokenize(tid)
        theirs = ref.detokenize([tid], decode=False)
        if ours == b"\x00":
            # the reference loses NUL bytes at its C-string FFI boundary
            # (ctransformers_llm_detokenize returns char*); not a semantic
            # difference — skip the <0x00> byte token
            continue
        assert ours == theirs, (tid, ours, theirs)


@pytest.mark.parametrize(
    "wtype,atol",
    # quantized atol bounds the REFERENCE's error: it quantizes activations
    # (Q8_0/Q8_K vec_dot_type) while we compute exact f32 over bit-exactly
    # dequantized weights; Q4_K runs a 256-dim model, hence the wider band
    [(GGMLType.F32, 2e-3), (GGMLType.Q8_0, 0.05), (GGMLType.Q4_K, 0.2)],
)
def test_llama_logit_parity(tmp_path, wtype, atol):
    path = str(tmp_path / "llama.gguf")
    # k-quants need 256-elem superblocks per weight row (QK_K)
    dims = dict(n_embd=256, n_ff=256) if wtype == GGMLType.Q4_K else {}
    build_llama_gguf(path, wtype=wtype, seed=11, **dims)
    ref = ref_llm(path, "llama")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    eng = Engine(b.spec, b.params)

    tokens = b.tokenizer.tokenize("hello world", add_bos_token=True)
    ref.eval(tokens)
    eng.eval(tokens)
    ref_logits = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, ref_logits, atol=atol, rtol=0)
    assert int(np.argmax(eng.logits)) == int(np.argmax(ref_logits))

    ref.eval([5, 9])  # incremental: KV-cache path
    eng.eval([5, 9])
    ref_logits = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, ref_logits, atol=atol, rtol=0)


# -- falcon (BPE) -------------------------------------------------------------


@pytest.mark.parametrize("norm2,n_head_kv", [(False, 1), (True, 2)])
def test_falcon_load_metadata(tmp_path, norm2, n_head_kv):
    path = str(tmp_path / "falcon.gguf")
    info = build_falcon_gguf(path, norm2=norm2, n_head_kv=n_head_kv)
    b = load_bundle(path)
    assert b.spec.name == "falcon"
    assert b.spec.parallel_residual
    assert b.spec.shared_parallel_ln == (not norm2)
    assert b.spec.kv_heads == n_head_kv
    assert b.vocab.eos_token_id() == 11  # BPE default (llama.cpp:1719-1720)


def test_bpe_tokenizer_parity(tmp_path):
    path = str(tmp_path / "falcon.gguf")
    build_falcon_gguf(path)
    ref = ref_llm(path, "falcon")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    for text in TEXTS:
        ours = b.tokenizer.tokenize(text)
        theirs = ref.tokenize(text, add_bos_token=False)
        assert ours == theirs, (text, ours, theirs)


@pytest.mark.parametrize(
    "wtype,norm2,atol",
    [
        (GGMLType.F32, False, 2e-3),
        (GGMLType.F32, True, 2e-3),
        (GGMLType.Q4_0, False, 0.05),
    ],
)
def test_falcon_logit_parity(tmp_path, wtype, norm2, atol):
    path = str(tmp_path / "falcon.gguf")
    build_falcon_gguf(path, wtype=wtype, norm2=norm2, seed=13)
    ref = ref_llm(path, "falcon")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    eng = Engine(b.spec, b.params)

    tokens = b.tokenizer.tokenize("hello world")
    ref.eval(tokens)
    eng.eval(tokens)
    ref_logits = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, ref_logits, atol=atol, rtol=0)
    assert int(np.argmax(eng.logits)) == int(np.argmax(ref_logits))


# -- end-to-end through the public API ---------------------------------------


def test_llama_via_public_api(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    path = str(tmp_path / "llama.gguf")
    build_llama_gguf(path)
    llm = AutoModelForCausalLM.from_pretrained(path)  # GGUF: no model_type
    assert llm.model_type == "llama"
    a = llm("hello", max_new_tokens=4, seed=3)
    assert a == llm("hello", max_new_tokens=4, seed=3)
    assert isinstance(llm.embed("hello"), list)
    assert len(llm.embed("hello")) == llm._bundle.spec.n_embd


# -- pre-GGUF (GGJT) llama ----------------------------------------------------


def test_ggjt_load_metadata(tmp_path):
    from ctransformers_tpu.models.llama_ggjt import detect_n_gqa

    path = str(tmp_path / "old.bin")
    build_llama_ggjt(path)
    b = load_bundle(path)  # llama_gguf routes non-GGUF to the GGJT loader
    assert b.spec.name == "llama"
    assert b.spec.n_ctx == 512  # old-format default window
    assert b.spec.n_ff == 96
    assert detect_n_gqa("llama-2-70b.ggmlv3.q4_0.bin") == 8
    assert detect_n_gqa("llama-2-7b.bin") == 1


@pytest.mark.parametrize("wtype,atol", [(GGMLType.F32, 2e-3), (GGMLType.Q8_0, 0.05)])
def test_ggjt_logit_parity(tmp_path, wtype, atol):
    path = str(tmp_path / "old.bin")
    build_llama_ggjt(path, wtype=wtype, seed=91)
    ref = ref_llm(path, "llama")
    if ref is None:
        pytest.skip("reference engine unavailable")
    b = load_bundle(path)
    eng = Engine(b.spec, b.params)
    toks = b.tokenizer.tokenize("hello world", add_bos_token=True)
    assert toks == ref.tokenize("hello world")
    ref.eval(toks)
    eng.eval(toks)
    rl = np.array(list(ref.logits), np.float32)
    np.testing.assert_allclose(eng.logits, rl, atol=atol, rtol=0)
    assert int(np.argmax(eng.logits)) == int(np.argmax(rl))
