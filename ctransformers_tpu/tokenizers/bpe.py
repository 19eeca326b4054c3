"""Byte-pair-encoding tokenizer (GGUF "gpt2" tokenizer model; falcon).

Semantics cloned from the reference llm_tokenizer_bpe
(/root/reference/models/ggml/llama.cpp:3213-3388): GPT-2 regex pre-split
(ASCII classes, matching std::regex in the C locale), per-word rank-ordered
pair merges from tokenizer.ggml.merges, then single-character fallback for
symbols that are not vocabulary entries.
"""

from __future__ import annotations

import heapq
import re
from typing import List, Sequence

# llama.cpp:3361 — [[:alpha:]]/[[:digit:]] are ASCII classes in the C locale
_SPLIT_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


class BPETokenizer:
    def __init__(self, vocab, merges: Sequence[str]):
        self.vocab = vocab
        self._merges = list(merges)
        self._native = None  # lazily-built C++ merge loop (or False)
        # "left right" lines -> rank (llm_load_vocab, llama.cpp:1694-1717)
        self.ranks = {}
        for rank, line in enumerate(merges):
            l, _, r = line.partition(" ")
            self.ranks[(l, r)] = rank

    def _native_tok(self):
        """C++ rank-merge fast path (native/tokenizer.cc); the Python loop
        below is the semantic reference and fallback."""
        if self._native is None:
            import os

            self._native = False
            if not os.environ.get("CT_NO_NATIVE"):
                pieces = getattr(self.vocab, "pieces", None)
                if pieces is not None:
                    from ..formats.native import native_bpe

                    self._native = native_bpe(pieces, self._merges) or False
        return self._native or None

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        v = self.vocab
        out: List[int] = []
        if add_bos_token and v.bos_id >= 0:
            out.append(v.bos_id)
        if not text:
            return out

        words = _SPLIT_RE.findall(text)
        nat = self._native_tok()
        if nat is not None:
            ids = nat.tokenize_words(words)
            if ids is not None:
                out.extend(int(t) for t in ids)
                return out

        for word in words:
            syms: List[str] = list(word)
            n = len(syms)
            prev = list(range(-1, n - 1))
            nxt = [i + 1 if i + 1 < n else -1 for i in range(n)]
            heap: list = []

            def try_add(left: int, right: int) -> None:
                if left == -1 or right == -1:
                    return
                rank = self.ranks.get((syms[left], syms[right]))
                if rank is None:
                    return
                # min-heap on rank; ties pop smallest left (llama.cpp:3219)
                heapq.heappush(
                    heap, (rank, left, syms[left] + syms[right], right)
                )

            for i in range(1, n):
                try_add(i - 1, i)

            while heap:
                _, left, text_pair, right = heapq.heappop(heap)
                if not syms[left] or not syms[right]:
                    continue
                if syms[left] + syms[right] != text_pair:
                    continue  # outdated
                syms[left] += syms[right]
                syms[right] = ""
                nxt[left] = nxt[right]
                if nxt[right] >= 0:
                    prev[nxt[right]] = left
                try_add(prev[left], left)
                try_add(left, nxt[left])

            i = 0
            while i != -1:
                s = syms[i]
                i = nxt[i]
                if not s:
                    continue
                tid = v.piece_to_id.get(s)
                if tid is not None:
                    out.append(tid)
                    continue
                for ch in s:  # single-char fallback (llama.cpp:3316-3326)
                    cid = v.piece_to_id.get(ch)
                    if cid is not None:
                        out.append(cid)
        return out

    def detokenize(self, token_id: int) -> bytes:
        return self.vocab.detokenize(token_id)
