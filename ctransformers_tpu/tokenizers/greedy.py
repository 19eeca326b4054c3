"""Greedy longest-match tokenizer used by all "GGML example" models.

Semantics cloned from the reference (models/common.h:52-125): GPT-2-style
regex pre-split into words (special tokens split out first and mapped
directly), then for each word repeatedly take the longest vocabulary entry.
Unknown single bytes are skipped with a warning.
"""

from __future__ import annotations

import re
from typing import List

from ..logger import logger
from ..models.vocab import Vocab

# common.h:53-54; [[:alpha:]]/[[:digit:]] are ASCII classes in the C locale
_SPLIT_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def split_words(text: str, special_tokens: List[str]) -> List[str]:
    words: List[str] = []
    if special_tokens:
        special_re = re.compile("|".join(map(re.escape, special_tokens)))
        pos = 0
        for m in special_re.finditer(text):
            words.extend(_SPLIT_RE.findall(text[pos : m.start()]))
            words.append(m.group(0))
            pos = m.end()
        text = text[pos:]
    words.extend(_SPLIT_RE.findall(text))
    return words


class GreedyTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self._native = None  # lazily-built C++ loop (or False)

    def _native_tok(self):
        """C++ longest-match fast path (native/tokenizer.cc); the Python
        loop below is the semantic reference and fallback (it also logs
        unknown-byte warnings, which the native path skips silently)."""
        if self._native is None:
            import os

            self._native = False
            if not os.environ.get("CT_NO_NATIVE"):
                from ..formats.native import native_greedy

                self._native = (
                    native_greedy(self.vocab.id_to_token) or False
                )
        return self._native or None

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        del add_bos_token  # example models ignore BOS (llm.h:27-30)
        tokens: List[int] = []
        words = split_words(text, self.vocab.special_tokens)
        nat = self._native_tok()
        if nat is not None:
            ids = nat.tokenize_words(words)
            if ids is not None:
                return [int(t) for t in ids]
        for word in words:
            data = word.encode("utf-8")
            i = 0
            n = len(data)
            while i < n:
                matched = False
                for j in range(n - 1, i - 1, -1):
                    tid = self.vocab.token_to_id.get(data[i : j + 1])
                    if tid is not None:
                        tokens.append(tid)
                        i = j + 1
                        matched = True
                        break
                if not matched:
                    logger.warning(
                        "greedy tokenize: unknown token %r", data[i : i + 1]
                    )
                    i += 1
        return tokens

    def detokenize(self, token_id: int) -> bytes:
        return self.vocab.detokenize(token_id)
