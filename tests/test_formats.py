"""Round-trip tests for the GGUF and legacy GGML container formats."""

import numpy as np
import pytest

from ctransformers_tpu.formats.gguf import (
    GGUFReader,
    GGUFValueType,
    write_gguf,
)
from ctransformers_tpu.formats.ggml_legacy import (
    GGML_QNT_VERSION,
    GGML_QNT_VERSION_FACTOR,
    LegacyReader,
    LegacyWriter,
)
from ctransformers_tpu.formats.quants import GGMLType, quantize
from ctransformers_tpu.utils import is_gguf, utf8_split_incomplete


def test_gguf_round_trip(tmp_path):
    path = str(tmp_path / "m.gguf")
    rng = np.random.RandomState(0)
    w1 = (rng.randn(8, 64) * 0.1).astype(np.float32)
    w2 = (rng.randn(4, 256) * 0.1).astype(np.float32)
    kv = {
        "general.architecture": "llama",
        "llama.context_length": 2048,
        "llama.rope.freq_base": 10000.0,
        "neg": (GGUFValueType.INT32, -5),
        "flag": True,
        "tokenizer.ggml.tokens": ["<s>", "</s>", "hello", "▁world"],
        "tokenizer.ggml.scores": np.array([0.0, -1.0, -2.0, -3.5], np.float32),
        "tokenizer.ggml.token_type": [1, 2, 3, 4],
    }
    tensors = {
        "tok_embd.weight": (GGMLType.F32, (64, 8), w1.tobytes()),
        "blk.0.attn_q.weight": (GGMLType.Q4_K, (256, 4), quantize(w2, GGMLType.Q4_K)),
        "out_norm.weight": (GGMLType.F16, (64, 8), w1.astype("<f2").tobytes()),
    }
    write_gguf(path, kv, tensors)

    assert is_gguf(path)
    r = GGUFReader(path)
    assert r.version == 2
    assert r.kv["general.architecture"] == "llama"
    assert r.kv["llama.context_length"] == 2048
    assert r.kv["llama.rope.freq_base"] == pytest.approx(10000.0)
    assert r.kv["neg"] == -5
    assert r.kv["flag"] is True
    assert r.kv["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello", "▁world"]
    np.testing.assert_allclose(
        r.kv["tokenizer.ggml.scores"], [0.0, -1.0, -2.0, -3.5]
    )

    assert set(r.tensors) == set(tensors)
    np.testing.assert_array_equal(r.tensor_f32("tok_embd.weight"), w1)
    # data offsets must be 32-byte aligned
    for name in r.tensors:
        assert (r.data_offset + r.tensors[name].offset) % 32 == 0
    # quantized tensor decodes with bounded error
    dec = r.tensor_f32("blk.0.attn_q.weight")
    assert dec.shape == (4, 256)
    assert np.sqrt(np.mean((dec - w2) ** 2)) < 0.02


def test_gguf_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(str(p))
    assert not is_gguf(str(p))


def test_legacy_round_trip(tmp_path):
    path = str(tmp_path / "m.bin")
    rng = np.random.RandomState(1)
    wte = (rng.randn(16, 8) * 0.1).astype(np.float32)
    qw = (rng.randn(24, 32) * 0.1).astype(np.float32)
    with LegacyWriter(path) as w:
        w.write_i32(16)  # n_vocab
        w.write_i32(32)  # n_ctx
        w.write_ftype(7)  # mostly q8_0
        w.write_vocab([f"tok{i}" for i in range(16)])
        w.write_tensor("model/wte", GGMLType.F32, (8, 16), wte.tobytes())
        w.write_tensor(
            "model/h0/attn/c_attn/w",
            GGMLType.Q8_0,
            (32, 24),
            quantize(qw, GGMLType.Q8_0),
        )

    r = LegacyReader(path)
    assert r.read_i32() == 16
    assert r.read_i32() == 32
    ftype = r.read_i32()
    assert ftype // GGML_QNT_VERSION_FACTOR == GGML_QNT_VERSION
    assert ftype % GGML_QNT_VERSION_FACTOR == 7
    vocab = r.read_vocab(16)
    assert vocab[3] == b"tok3"
    tensors = r.index_tensors()
    assert set(tensors) == {"model/wte", "model/h0/attn/c_attn/w"}
    np.testing.assert_array_equal(r.tensor_f32("model/wte"), wte)
    dec = r.tensor_f32("model/h0/attn/c_attn/w")
    assert dec.shape == (24, 32)
    assert np.sqrt(np.mean((dec - qw) ** 2)) < 0.005


def test_legacy_vocab_scores(tmp_path):
    path = str(tmp_path / "m.bin")
    with LegacyWriter(path) as w:
        w.write_i32(3)
        w.write_vocab(["a", "b", "c"], scores=[-1.0, -2.0, -3.0])
    r = LegacyReader(path)
    assert r.read_i32() == 3
    toks, scores = r.read_vocab(3, scores=True)
    assert toks == [b"a", b"b", b"c"]
    assert scores == [-1.0, -2.0, -3.0]


def test_utf8_split_incomplete():
    # "é" = 0xC3 0xA9, "€" = 0xE2 0x82 0xAC, "𝄞" = 4 bytes
    assert utf8_split_incomplete(b"abc") == (b"abc", b"")
    assert utf8_split_incomplete(b"ab\xc3") == (b"ab", b"\xc3")
    assert utf8_split_incomplete(b"ab\xc3\xa9") == (b"ab\xc3\xa9", b"")
    assert utf8_split_incomplete(b"\xe2\x82") == (b"", b"\xe2\x82")
    assert utf8_split_incomplete(b"\xe2\x82\xac") == (b"\xe2\x82\xac", b"")
    assert utf8_split_incomplete(b"x\xf0\x9d\x84") == (b"x", b"\xf0\x9d\x84")
    assert utf8_split_incomplete(b"x\xf0\x9d\x84\x9e") == (b"x\xf0\x9d\x84\x9e", b"")
    assert utf8_split_incomplete(b"") == (b"", b"")
