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

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        del add_bos_token  # example models ignore BOS (llm.h:27-30)
        tokens: List[int] = []
        for word in split_words(text, self.vocab.special_tokens):
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
