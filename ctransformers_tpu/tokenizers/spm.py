"""SentencePiece (SPM) tokenizer — bigram-merge with byte fallback.

Semantics cloned from the reference llm_tokenizer_spm
(/root/reference/models/ggml/llama.cpp:3063-3211): split text into UTF-8
characters, seed a priority queue with all adjacent pairs that form vocab
pieces, repeatedly merge the highest-scoring pair (ties: leftmost first),
then resegment unmatched symbols through the merge history, falling back to
<0xXX> byte tokens. A leading space is prepended and spaces are escaped to
U+2581 (llama.cpp:3044-3050, 3406-3412).
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Tuple

SPACE_ESCAPE = "▁"


class SPMTokenizer:
    _legacy = False

    def __init__(self, vocab):
        self.vocab = vocab  # GGUFVocab: piece_to_id (str keys) + scores
        self._native = None  # lazily-built C++ tokenizer (or False)

    def _native_tok(self):
        """C++ bigram-merge fast path (native/tokenizer.cc) — the Python
        loop below is the semantic reference and fallback (~0.25 MB/s vs
        ~2 orders of magnitude faster native on long prompts)."""
        if self._native is None:
            import os

            self._native = False
            if not os.environ.get("CT_NO_NATIVE"):
                pieces = getattr(self.vocab, "pieces", None)
                scores = getattr(self.vocab, "scores", None)
                if pieces is not None and scores is not None:
                    from ..formats.native import native_spm

                    self._native = (
                        native_spm(pieces, scores, legacy=self._legacy)
                        or False
                    )
        return self._native or None

    def _merge(self, raw: str) -> Tuple[List[str], List[int], Dict]:
        """Run the bigram-merge loop over `raw`; returns (symbols, next-links,
        merge history). Shared by the GGUF and legacy tokenizers — they
        differ only in input escaping and in unmatched-symbol fallback."""
        v = self.vocab
        syms: List[str] = list(raw)  # UTF-8 chars == codepoints here
        n = len(syms)
        prev = list(range(-1, n - 1))
        nxt = [i + 1 if i + 1 < n else -1 for i in range(n)]
        rev_merge: Dict[str, Tuple[int, int]] = {}
        heap: list = []
        counter = 0  # tie-break stability for equal (score, left)

        def try_add(left: int, right: int) -> None:
            nonlocal counter
            if left == -1 or right == -1:
                return
            t = syms[left] + syms[right]
            tid = v.piece_to_id.get(t)
            if tid is None or tid >= len(v):
                return
            # max-heap on score; ties pop the smallest left index
            # (llm_bigram_spm::comparator, llama.cpp:3068-3072)
            heapq.heappush(
                heap, (-v.scores[tid], left, counter, right, len(t))
            )
            counter += 1
            rev_merge[t] = (left, right)

        for i in range(1, n):
            try_add(i - 1, i)

        while heap:
            _, left, _, right, size = heapq.heappop(heap)
            if not syms[left] or not syms[right]:
                continue
            if len(syms[left]) + len(syms[right]) != size:
                continue  # stale entry
            syms[left] += syms[right]
            syms[right] = ""
            nxt[left] = nxt[right]
            if nxt[right] >= 0:
                prev[nxt[right]] = left
            try_add(prev[left], left)
            try_add(left, nxt[left])

        return syms, nxt, rev_merge

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        v = self.vocab
        out: List[int] = []
        if add_bos_token and v.bos_id >= 0:
            out.append(v.bos_id)
        if not text:
            return out
        raw = (" " + text).replace(" ", SPACE_ESCAPE)
        nat = self._native_tok()
        if nat is not None:
            ids = nat.tokenize(raw.encode("utf-8"))
            if ids is not None:
                out.extend(int(t) for t in ids)
                return out
        syms, nxt, rev_merge = self._merge(raw)

        def resegment(i: int) -> None:
            t = syms[i]
            tid = v.piece_to_id.get(t)
            if tid is not None:
                out.append(tid)
                return
            p = rev_merge.get(t)
            if p is None:
                # byte fallback (llama_byte_to_token, llama.cpp:3037-3042)
                for b in t.encode("utf-8"):
                    bid = v.piece_to_id.get(f"<0x{b:02X}>")
                    if bid is not None:
                        out.append(bid)
                return
            resegment(p[0])
            resegment(p[1])

        i = 0
        while i != -1:
            resegment(i)
            i = nxt[i]
        return out

    def detokenize(self, token_id: int) -> bytes:
        return self.vocab.detokenize(token_id)


class SPMTokenizerLegacy(SPMTokenizer):
    """Pre-GGUF llama tokenizer (llama-ggml.cpp:1967-2070): same bigram
    merge, but NO leading-space prepend, NO U+2581 escaping (old files
    store pieces in display form with real spaces), NO merge-history
    resegmentation, and byte fallback looks up raw single-byte pieces
    instead of <0xXX> entries."""

    _legacy = True

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        v = self.vocab
        out: List[int] = []
        if add_bos_token and v.bos_id >= 0:
            out.append(v.bos_id)
        if not text:
            return out
        nat = self._native_tok()
        if nat is not None:
            ids = nat.tokenize(text.encode("utf-8"))
            if ids is not None:
                out.extend(int(t) for t in ids)
                return out
        syms, nxt, _ = self._merge(text)
        i = 0
        while i != -1:
            t = syms[i]
            tid = v.piece_to_id.get(t)
            if tid is not None:
                out.append(tid)
            else:
                # raw single-byte fallback (llama-ggml.cpp:2030-2036)
                for ch in t:
                    bid = v.piece_to_id.get(ch)
                    if bid is not None:
                        out.append(bid)
            i = nxt[i]
        return out
