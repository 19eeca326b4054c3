"""Vocabulary with the reference's default token semantics (models/llm.h).

Wraps the id<->bytes tables shared by all "GGML example" models and provides
EOS handling parity: EOS = "<|endoftext|>" lookup (llm.h:90-96); StarChat
"<|end|>" / Dolly "### End" special-token EOS (llm.h:78-88).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union


class Vocab:
    def __init__(
        self,
        tokens: Sequence[bytes],
        scores: Optional[Sequence[float]] = None,
        special_tokens: Optional[Sequence[str]] = None,
    ):
        self.id_to_token: List[bytes] = [bytes(t) for t in tokens]
        self.token_to_id: Dict[bytes, int] = {}
        for i, tok in enumerate(self.id_to_token):
            # first occurrence wins is NOT the reference behavior: gpt2.cc
            # inserts into a map, so later duplicates overwrite earlier ids
            self.token_to_id[tok] = i
        self.scores = list(scores) if scores is not None else None
        self.special_tokens: List[str] = list(special_tokens or [])

    def __len__(self) -> int:
        return len(self.id_to_token)

    def add_special_token(self, token: str) -> None:
        self.special_tokens.append(token)

    def detokenize(self, token_id: int) -> bytes:
        if 0 <= token_id < len(self.id_to_token):
            return self.id_to_token[token_id]
        return b""

    def lookup(self, token: Union[str, bytes]) -> Optional[int]:
        if isinstance(token, str):
            token = token.encode("utf-8")
        return self.token_to_id.get(token)

    def eos_token_id(self) -> int:
        eid = self.lookup(b"<|endoftext|>")
        return eid if eid is not None else 0

    def bos_token_id(self) -> int:
        return self.eos_token_id()

    def is_eos_token(self, token_id: int) -> bool:
        if token_id == self.eos_token_id():
            return True
        if self.special_tokens:
            text = self.detokenize(token_id)
            return text in (b"<|end|>", b"### End")
        return False


# GGUF token types (reference llama.h llama_token_type)
TOKEN_TYPE_UNDEFINED = 0
TOKEN_TYPE_NORMAL = 1
TOKEN_TYPE_UNKNOWN = 2
TOKEN_TYPE_CONTROL = 3
TOKEN_TYPE_USER_DEFINED = 4
TOKEN_TYPE_UNUSED = 5
TOKEN_TYPE_BYTE = 6


class GGUFVocab:
    """Vocab for GGUF models (SPM/BPE pieces with types, scores, special ids).

    Detokenize semantics per llama_token_to_piece_with_model
    (/root/reference/models/ggml/llama.cpp:6156-6187): normal pieces
    unescape U+2581 for SPM, unknown -> U+2585, control -> empty,
    byte tokens <0xXX> -> the raw byte.
    """

    def __init__(
        self,
        pieces,  # list[str]
        scores=None,
        token_types=None,
        vocab_type: str = "spm",  # "spm" | "bpe"
        bos_id: int = 1,
        eos_id: int = 2,
        unk_id: int = 0,
        pad_id: int = -1,
    ):
        self.pieces = list(pieces)
        n = len(self.pieces)
        self.scores = [float(s) for s in scores] if scores is not None else [0.0] * n
        self.token_types = (
            [int(t) for t in token_types]
            if token_types is not None
            else [TOKEN_TYPE_NORMAL] * n
        )
        self.vocab_type = vocab_type
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.unk_id = unk_id
        self.pad_id = pad_id
        self.piece_to_id = {}
        for i, p in enumerate(self.pieces):
            self.piece_to_id[p] = i  # later duplicates overwrite (std::map insert-or-assign parity: gguf vocabs have no dups in practice)
        self._detok = [self._piece_bytes(i) for i in range(n)]

    def _piece_bytes(self, i: int) -> bytes:
        t = self.token_types[i]
        p = self.pieces[i]
        if t == TOKEN_TYPE_UNKNOWN:
            return "▅".encode("utf-8")
        if t == TOKEN_TYPE_CONTROL:
            return b""
        if t == TOKEN_TYPE_BYTE:
            try:
                return bytes([int(p[3:5], 16)])
            except (ValueError, IndexError):
                return b""
        # NORMAL / USER_DEFINED / UNDEFINED
        if self.vocab_type == "spm":
            p = p.replace("▁", " ")
        return p.encode("utf-8")

    def __len__(self) -> int:
        return len(self.pieces)

    def detokenize(self, token_id: int) -> bytes:
        if 0 <= token_id < len(self._detok):
            return self._detok[token_id]
        return b""

    def lookup(self, token):
        if isinstance(token, bytes):
            token = token.decode("utf-8", errors="replace")
        return self.piece_to_id.get(token)

    def eos_token_id(self) -> int:
        return self.eos_id

    def bos_token_id(self) -> int:
        return self.bos_id

    def is_eos_token(self, token_id: int) -> bool:
        return token_id == self.eos_id
