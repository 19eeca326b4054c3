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
