"""Native C++ SPM tokenizer vs the Python reference — token-for-token.

The Python bigram-merge loop (tokenizers/spm.py) is the semantic
reference (itself parity-tested against the reference engine); the C++
fast path (native/tokenizer.cc) must match it on every input."""

import os
import random

import pytest

from ctransformers_tpu.formats import native
from ctransformers_tpu.models.vocab import GGUFVocab
from ctransformers_tpu.tokenizers.spm import SPMTokenizer, SPMTokenizerLegacy

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native toolchain unavailable",
)


def _vocab(seed=0, legacy=False):
    rng = random.Random(seed)
    pieces = ["<unk>", "<s>", "</s>"]
    scores = [0.0, 0.0, 0.0]
    if not legacy:
        for b in range(256):
            pieces.append(f"<0x{b:02X}>")
            scores.append(-1000.0)
    chars = "abcdefghijklmnopqrstuvwxyz ▁.,!?éü中日本語🌍"
    for ch in chars:
        pieces.append(ch)
        scores.append(-10.0 - rng.random())
    words = [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "hello", "world", "toküns", "中文", "日本語",
    ]
    for w in words:
        for i in range(2, len(w) + 1):
            pieces.append(w[:i])
            scores.append(-float(i) - rng.random())
        pieces.append(("▁" if not legacy else " ") + w)
        scores.append(-float(len(w)) - 0.25)
    # duplicate piece: the later id must win (Python dict-assignment
    # semantics; real GGUF fixtures contain such duplicates)
    pieces.append("he")
    scores.append(-2.5)
    return GGUFVocab(pieces, scores, vocab_type="spm")


TEXTS = [
    "",
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "  double  spaces  and trailing  ",
    "unknownXYZ glyphs ߷߸ and emoji 🌍🌍 mixed 中文日本語",
    "toküns with accénts éü",
    "a",
    "!?.,",
    "\n\ttabs and\nnewlines",
    "\x00\x01 control bytes",
]


@pytest.mark.parametrize("cls", [SPMTokenizer, SPMTokenizerLegacy])
@pytest.mark.parametrize("text", TEXTS)
def test_native_matches_python(cls, text):
    v = _vocab(legacy=cls is SPMTokenizerLegacy)
    tok_nat = cls(v)
    tok_py = cls(v)
    tok_py._native = False  # force the Python loop
    assert tok_nat._native_tok() is not None, "native tokenizer unavailable"
    assert tok_nat.tokenize(text, add_bos_token=True) == tok_py.tokenize(
        text, add_bos_token=True
    )


@pytest.mark.parametrize("cls", [SPMTokenizer, SPMTokenizerLegacy])
def test_native_matches_python_fuzz(cls):
    v = _vocab(seed=3, legacy=cls is SPMTokenizerLegacy)
    rng = random.Random(7)
    alphabet = "abcdefghij élz🌍中.?!\n"
    tok_nat = cls(v)
    tok_py = cls(v)
    tok_py._native = False
    assert tok_nat._native_tok() is not None
    for _ in range(60):
        n = rng.randint(0, 120)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert tok_nat.tokenize(text) == tok_py.tokenize(text), repr(text)


def test_ct_no_native_env_disables(monkeypatch):
    monkeypatch.setenv("CT_NO_NATIVE", "1")
    tok = SPMTokenizer(_vocab())
    assert tok._native_tok() is None


def test_native_throughput_sanity():
    """Native path must beat Python by a wide margin on a long input (the
    reason it exists); loose 5x bound to stay robust on slow CI."""
    import time

    v = _vocab()
    words = ["the", "quick", "brown", "fox", "hello", "world"]
    rng = random.Random(0)
    text = " ".join(rng.choice(words) for _ in range(8000))

    tok_nat = SPMTokenizer(v)
    assert tok_nat._native_tok() is not None
    t0 = time.perf_counter()
    ids_nat = tok_nat.tokenize(text)
    t_nat = time.perf_counter() - t0

    tok_py = SPMTokenizer(v)
    tok_py._native = False
    t0 = time.perf_counter()
    ids_py = tok_py.tokenize(text)
    t_py = time.perf_counter() - t0

    assert ids_nat == ids_py
    assert t_nat * 5 < t_py, (t_nat, t_py)


# --------------------------------------------------------------------------
# BPE
# --------------------------------------------------------------------------


def _bpe_vocab(seed=0):
    from ctransformers_tpu.tokenizers.bpe import BPETokenizer

    rng = random.Random(seed)
    base = list("abcdefghijklmnopqrstuvwxyz .,!?éü中🌍")
    base += ["Ġ" + c for c in "abcdefghij"]
    words = ["the", "cat", "hat", "hello", "world", "Ġthe", "Ġcat"]
    merges, pieces = [], list(dict.fromkeys(base))
    seen_pairs = set()
    for w in words:
        for i in range(1, len(w)):
            l, r = w[:i], w[i:]
            if len(r) <= 2 and (l, r) not in seen_pairs:
                merges.append(f"{l} {r}")
                seen_pairs.add((l, r))
                if l + r not in pieces:
                    pieces.append(l + r)
    rng.shuffle(merges)
    v = GGUFVocab(pieces, [0.0] * len(pieces), vocab_type="bpe")
    return BPETokenizer(v, merges), merges


BPE_TEXTS = [
    "",
    "the cat in the hat",
    "hello world, it's 2026!",
    "unknown中 glyphs 🌍 and   spaces",
    "numbers 12345 and punct !?.,",
    "tab\tand\nnewline",
]


@pytest.mark.parametrize("text", BPE_TEXTS)
def test_native_bpe_matches_python(text):
    tok, merges = _bpe_vocab()
    tok_py, _ = _bpe_vocab()
    tok_py._native = False
    assert tok._native_tok() is not None, "native BPE unavailable"
    assert tok.tokenize(text, add_bos_token=True) == tok_py.tokenize(
        text, add_bos_token=True
    )


def test_native_bpe_fuzz():
    tok, _ = _bpe_vocab(seed=5)
    tok_py, _ = _bpe_vocab(seed=5)
    tok_py._native = False
    assert tok._native_tok() is not None
    rng = random.Random(11)
    alphabet = "abcdefghij théc🌍中 .?!\n12"
    for _ in range(60):
        n = rng.randint(0, 100)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert tok.tokenize(text) == tok_py.tokenize(text), repr(text)


# --------------------------------------------------------------------------
# Greedy (GGML example models)
# --------------------------------------------------------------------------


def _greedy_vocab():
    from ctransformers_tpu.models.vocab import Vocab

    toks = [b"<unk>", b"<|endoftext|>"]
    for ch in "abcdefghijklmnopqrstuvwxyz .,!?":
        toks.append(ch.encode())
    for w in ["the", "cat", "hat", "hel", "hello", " the", " cat", "th"]:
        toks.append(w.encode())
    return Vocab(toks, special_tokens=["<|endoftext|>"])


@pytest.mark.parametrize(
    "text",
    [
        "",
        "the cat in the hat",
        "hello<|endoftext|>world",
        "unknown Ж bytes",  # multi-byte chars absent from vocab
        "thethethe catcat",
    ],
)
def test_native_greedy_matches_python(text):
    from ctransformers_tpu.tokenizers.greedy import GreedyTokenizer

    v = _greedy_vocab()
    tok = GreedyTokenizer(v)
    tok_py = GreedyTokenizer(v)
    tok_py._native = False
    assert tok._native_tok() is not None, "native greedy unavailable"
    assert tok.tokenize(text) == tok_py.tokenize(text)


def test_native_greedy_fuzz():
    from ctransformers_tpu.tokenizers.greedy import GreedyTokenizer

    v = _greedy_vocab()
    tok = GreedyTokenizer(v)
    tok_py = GreedyTokenizer(v)
    tok_py._native = False
    assert tok._native_tok() is not None
    rng = random.Random(13)
    alphabet = "abcth el.?!Ж "
    for _ in range(60):
        n = rng.randint(0, 80)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert tok.tokenize(text) == tok_py.tokenize(text), repr(text)


# --------------------------------------------------------------------------
# Unigram / Viterbi (replit)
# --------------------------------------------------------------------------


def _unigram():
    from ctransformers_tpu.tokenizers.unigram import UnigramTokenizer

    rng = random.Random(2)
    pieces = ["<unk>"]
    scores = [0.0]
    for ch in "abcdefghijklmnopqrstuvwxyz▁.,!?中🌍":
        pieces.append(ch)
        scores.append(-12.0 - rng.random())
    for w in ["the", "cat", "hat", "hello", "▁the", "▁cat", "lo", "hel"]:
        pieces.append(w)
        scores.append(-float(len(w)) - rng.random())
    return UnigramTokenizer(pieces, scores)


@pytest.mark.parametrize(
    "text",
    [
        "",
        "the cat in the hat",
        "hello hello",
        "中 mixed 🌍 unicode",
        "unknownЖtext",  # unknown codepoint -> [0] whole-text fallback? no:
        # only if NO segmentation exists; single chars cover most
    ],
)
def test_native_unigram_matches_python(text):
    tok = _unigram()
    tok_py = _unigram()
    tok_py._native = False
    assert tok._native_tok() is not None, "native unigram unavailable"
    assert tok.tokenize(text) == tok_py.tokenize(text)


def test_native_unigram_fuzz():
    tok = _unigram()
    tok_py = _unigram()
    tok_py._native = False
    assert tok._native_tok() is not None
    rng = random.Random(17)
    alphabet = "abcth el中🌍.?!Ж "
    for _ in range(60):
        n = rng.randint(0, 80)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert tok.tokenize(text) == tok_py.tokenize(text), repr(text)
