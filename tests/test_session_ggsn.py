"""GGSN session-file byte-compatibility with the reference engine.

Covers engine/session.py against llama.cpp's session format
(llama_save/load_session_file, llama.cpp:5952-6032; state layout
5741-5951): the mt19937 text codec vs real libstdc++, ours->ours
round-trips, and TRUE cross-engine interop through the reference's
precompiled binary — our files load in its llama_load_session_file and
its files load in our LLM.load_session.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from ctransformers_tpu.engine import session as ses

from .fixtures import REF_LIB, build_llama_gguf

# ---------------------------------------------------------------------------
# mt19937 text codec
# ---------------------------------------------------------------------------


def test_rng_text_roundtrip():
    rng = np.random.RandomState(1337)
    rng.random_sample(17)  # advance mid-block
    text = ses.rng_to_text(rng)
    clone = ses.rng_from_text(text)
    assert clone is not None
    assert rng.random_sample(8).tolist() == clone.random_sample(8).tolist()
    assert ses.rng_to_text(rng) == ses.rng_to_text(clone)


def test_rng_text_matches_libstdcxx(tmp_path):
    """The codec must parse GENUINE libstdc++ streams: serialize
    std::mt19937 in C++, parse with rng_from_text, and check the next raw
    32-bit draws agree (RandomState.bytes(4) consumes one raw word)."""
    gxx = "/usr/bin/g++"
    if not os.path.exists(gxx):
        pytest.skip("g++ not available")
    src = tmp_path / "mt.cc"
    src.write_text(
        """
        #include <random>
        #include <sstream>
        #include <iostream>
        int main() {
            std::mt19937 g(4242);
            g.discard(100);
            std::stringstream ss; ss << g;
            std::cout << ss.str() << "\\n";
            for (int i = 0; i < 5; i++) std::cout << g() << "\\n";
        }
        """
    )
    exe = tmp_path / "mt"
    subprocess.run([gxx, "-O0", str(src), "-o", str(exe)], check=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True, check=True)
    lines = out.stdout.strip().split("\n")
    rng = ses.rng_from_text(lines[0].encode())
    assert rng is not None
    for want in lines[1:]:
        got = int.from_bytes(rng.bytes(4), "little")
        assert got == int(want)


def test_rng_text_rejects_garbage():
    assert ses.rng_from_text(b"not an rng state") is None
    assert ses.rng_from_text(b"1 2 3") is None


# ---------------------------------------------------------------------------
# ours -> ours
# ---------------------------------------------------------------------------


def _our_llm(model_path):
    from ctransformers_tpu import AutoModelForCausalLM

    return AutoModelForCausalLM.from_pretrained(model_path, model_type="llama")


def test_ggsn_roundtrip_ours(tmp_path):
    model = str(tmp_path / "tiny.gguf")
    build_llama_gguf(model)
    llm = _our_llm(model)
    tokens = llm.tokenize("the quick brown fox")
    llm.eval(tokens)
    sess = str(tmp_path / "s.ggsn")
    llm.save_session(sess)  # auto -> GGSN for llama
    assert ses.is_ggsn(sess)

    llm2 = _our_llm(model)
    restored = llm2.load_session(sess)
    assert restored == list(tokens)
    assert llm2._engine.n_past == len(tokens)
    # logits survive exactly (stored f32)
    np.testing.assert_array_equal(
        np.asarray(llm.logits), np.asarray(llm2.logits)
    )
    # KV went through f16: continuing must agree to f16 precision
    nxt = int(np.argmax(llm.logits))
    llm.eval([nxt])
    llm2.eval([nxt])
    np.testing.assert_allclose(
        np.asarray(llm.logits), np.asarray(llm2.logits), atol=2e-3, rtol=1e-3
    )


def test_ggsn_parse_fields(tmp_path):
    model = str(tmp_path / "tiny.gguf")
    info = build_llama_gguf(model)
    llm = _our_llm(model)
    tokens = llm.tokenize("hello world")
    llm.eval(tokens)
    sess = str(tmp_path / "s.ggsn")
    llm.save_session(sess, format="ggsn")
    data = ses.load_ggsn(sess)
    hp = data["hparams"]
    assert hp["n_vocab"] == info["n_vocab"]
    assert hp["n_ctx"] == info["n_ctx"] == hp["n_ctx_train"]
    assert hp["n_embd"] == 64 and hp["n_layer"] == 2
    assert hp["n_head"] == 4 and hp["n_head_kv"] == 2 and hp["n_rot"] == 16
    assert data["n_past"] == len(tokens) == len(data["tokens"])
    assert data["kv_k"].shape == (2, len(tokens), 32)
    assert data["rng"] is not None
    assert data["embedding"].shape == (64,)


# ---------------------------------------------------------------------------
# reference engine interop (raw llama C API from the precompiled binary)
# ---------------------------------------------------------------------------


class _CtxParams(ctypes.Structure):
    # struct llama_context_params, llama.h:125-152
    _fields_ = [
        ("seed", ctypes.c_uint32),
        ("n_ctx", ctypes.c_int32),
        ("n_batch", ctypes.c_int32),
        ("n_gpu_layers", ctypes.c_int32),
        ("main_gpu", ctypes.c_int32),
        ("tensor_split", ctypes.POINTER(ctypes.c_float)),
        ("rope_freq_base", ctypes.c_float),
        ("rope_freq_scale", ctypes.c_float),
        ("progress_callback", ctypes.c_void_p),
        ("progress_callback_user_data", ctypes.c_void_p),
        ("low_vram", ctypes.c_bool),
        ("mul_mat_q", ctypes.c_bool),
        ("f16_kv", ctypes.c_bool),
        ("logits_all", ctypes.c_bool),
        ("vocab_only", ctypes.c_bool),
        ("use_mmap", ctypes.c_bool),
        ("use_mlock", ctypes.c_bool),
        ("embedding", ctypes.c_bool),
    ]


_LOG_CB = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p)
_silent = _LOG_CB(lambda level, text, user: None)


class RefLlama:
    """Minimal raw-API harness over the reference's precompiled engine
    (llama_load_model_from_file / llama_new_context_with_model /
    llama_eval / session files)."""

    def __init__(self, model_path: str, n_ctx: int):
        lib = ctypes.CDLL(REF_LIB)
        lib.llama_log_set(_silent, None)
        lib.llama_context_default_params.restype = _CtxParams
        lib.llama_load_model_from_file.restype = ctypes.c_void_p
        lib.llama_load_model_from_file.argtypes = [ctypes.c_char_p, _CtxParams]
        lib.llama_new_context_with_model.restype = ctypes.c_void_p
        lib.llama_new_context_with_model.argtypes = [ctypes.c_void_p, _CtxParams]
        lib.llama_eval.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.llama_get_logits.restype = ctypes.POINTER(ctypes.c_float)
        lib.llama_get_logits.argtypes = [ctypes.c_void_p]
        lib.llama_n_vocab.restype = ctypes.c_int
        lib.llama_n_vocab.argtypes = [ctypes.c_void_p]
        lib.llama_get_kv_cache_token_count.restype = ctypes.c_int
        lib.llama_get_kv_cache_token_count.argtypes = [ctypes.c_void_p]
        lib.llama_save_session_file.restype = ctypes.c_bool
        lib.llama_save_session_file.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_size_t,
        ]
        lib.llama_load_session_file.restype = ctypes.c_bool
        lib.llama_load_session_file.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        self.lib = lib
        p = lib.llama_context_default_params()
        p.n_ctx = n_ctx
        p.embedding = True  # match ctransformers contexts (llama.cc:97-105)
        p.use_mmap = True
        self.model = lib.llama_load_model_from_file(model_path.encode(), p)
        assert self.model, "reference failed to load the model"
        self.ctx = lib.llama_new_context_with_model(self.model, p)
        assert self.ctx, "reference failed to create a context"
        self.n_past = 0

    def eval(self, tokens) -> np.ndarray:
        toks = (ctypes.c_int32 * len(tokens))(*tokens)
        rc = self.lib.llama_eval(self.ctx, toks, len(tokens), self.n_past, 2)
        assert rc == 0
        self.n_past += len(tokens)
        nv = self.lib.llama_n_vocab(self.ctx)
        ptr = self.lib.llama_get_logits(self.ctx)
        return np.ctypeslib.as_array(ptr, shape=(nv,)).copy()

    def save_session(self, path: str, tokens) -> bool:
        toks = (ctypes.c_int32 * len(tokens))(*tokens)
        return self.lib.llama_save_session_file(
            self.ctx, path.encode(), toks, len(tokens)
        )

    def load_session(self, path: str, capacity: int = 4096):
        toks = (ctypes.c_int32 * capacity)()
        count = ctypes.c_size_t(0)
        ok = self.lib.llama_load_session_file(
            self.ctx, path.encode(), toks, capacity, ctypes.byref(count)
        )
        if not ok:
            return None
        self.n_past = self.lib.llama_get_kv_cache_token_count(self.ctx)
        return [toks[i] for i in range(count.value)]


needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_LIB), reason="reference binary not available"
)


@needs_ref
def test_ggsn_ours_to_reference(tmp_path):
    """The reference engine must accept OUR session file: token history
    restores, and continuing generation from the restored KV matches
    continuing in our engine."""
    model = str(tmp_path / "tiny.gguf")
    build_llama_gguf(model)
    llm = _our_llm(model)
    tokens = llm.tokenize("the quick brown fox jumps")
    llm.eval(tokens)
    sess = str(tmp_path / "ours.ggsn")
    llm.save_session(sess, format="ggsn")

    ref = RefLlama(model, n_ctx=llm._engine.spec.n_ctx)
    restored = ref.load_session(sess)
    assert restored == list(tokens), "reference rejected our session file"
    assert ref.n_past == len(tokens)

    # continue one token in both engines from the restored state
    nxt = int(np.argmax(np.asarray(llm.logits)))
    ours = None
    llm.eval([nxt])
    ours = np.asarray(llm.logits)
    theirs = ref.eval([nxt])
    np.testing.assert_allclose(ours, theirs, atol=2e-2, rtol=1e-2)


@needs_ref
def test_ggsn_reference_to_ours(tmp_path):
    """Our LLM must load a session file written by the REFERENCE engine
    (llama_save_session_file) and continue equivalently."""
    model = str(tmp_path / "tiny.gguf")
    build_llama_gguf(model)
    llm = _our_llm(model)
    tokens = llm.tokenize("session interop both ways")

    ref = RefLlama(model, n_ctx=llm._engine.spec.n_ctx)
    ref_logits = ref.eval(list(tokens))
    sess = str(tmp_path / "theirs.ggsn")
    assert ref.save_session(sess, list(tokens))
    assert ses.is_ggsn(sess)

    restored = llm.load_session(sess)
    assert restored == list(tokens)
    assert llm._engine.n_past == len(tokens)
    np.testing.assert_allclose(
        np.asarray(llm.logits), ref_logits, atol=2e-2, rtol=1e-2
    )
    nxt = int(np.argmax(ref_logits))
    llm.eval([nxt])
    theirs = ref.eval([nxt])
    np.testing.assert_allclose(
        np.asarray(llm.logits), theirs, atol=2e-2, rtol=1e-2
    )
