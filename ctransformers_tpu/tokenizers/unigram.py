"""Replit unigram (SentencePiece-style Viterbi) tokenizer.

Semantics cloned from the reference replit tokenizer
(/root/reference/models/llms/replit.cc:57-127, 146-152): spaces are escaped
to U+2581, then one Viterbi pass over the whole text picks the minimum-cost
segmentation where each piece costs its negated file score (piece_map stores
-score, replit.cc:121); the prefix cost is seeded with 1.0 (a reference
quirk kept for parity). Unknown text yields token [0]. Detokenize replaces
U+2581 back with spaces (replit.cc:645).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

WS = "▁"


class UnigramTokenizer:
    def __init__(self, pieces: List[str], scores: List[float]):
        self.pieces = list(pieces)
        # piece -> (id, cost); cost = -score (replit.cc:121)
        self.piece_map: Dict[str, Tuple[int, float]] = {}
        for i, (p, s) in enumerate(zip(pieces, scores)):
            self.piece_map[p] = (i, -float(s))
        self.max_len = max((len(p) for p in pieces), default=1)
        self._detok = [p.replace(WS, " ").encode("utf-8") for p in pieces]
        self._scores = [float(s) for s in scores]
        self._native = None  # lazily-built C++ Viterbi (or False)

    def _native_tok(self):
        """C++ Viterbi fast path (native/tokenizer.cc); the Python DP below
        is the semantic reference and fallback."""
        if self._native is None:
            import os

            self._native = False
            if not os.environ.get("CT_NO_NATIVE"):
                from ..formats.native import native_unigram

                self._native = (
                    native_unigram(self.pieces, self._scores) or False
                )
        return self._native or None

    def tokenize(self, text: str, add_bos_token: bool = False) -> List[int]:
        del add_bos_token  # replit has no BOS (llm.h default path)
        word = text.replace(" ", WS)
        n = len(word)
        if n == 0:
            return []
        nat = self._native_tok()
        if nat is not None:
            ids = nat.tokenize(word.encode("utf-8"))
            if ids is not None:
                return [int(t) for t in ids]
        inf = float("inf")
        best_start = [-1] * (n + 1)
        best_score = [inf] * (n + 1)
        best_start[0] = 0
        best_score[0] = 1.0  # reference seeds with 1.0, not 0 (replit.cc:64)
        for start in range(n):
            bs = best_score[start]
            if bs == inf:
                continue
            stop = min(n, start + self.max_len)
            for end in range(start + 1, stop + 1):
                hit = self.piece_map.get(word[start:end])
                if hit is None:
                    continue
                score = hit[1] + bs
                if score < best_score[end]:
                    best_score[end] = score
                    best_start[end] = start
        if best_score[n] == inf:
            return [0]  # reference fallback (replit.cc:87-90)
        tokens: List[int] = []
        end = n
        start = best_start[end]
        while True:
            tokens.insert(0, self.piece_map[word[start:end]][0])
            if start == 0:
                break
            end = start
            start = best_start[start]
        return tokens

    def detokenize(self, token_id: int) -> bytes:
        if 0 <= token_id < len(self._detok):
            return self._detok[token_id]
        return b""
