"""Legacy GGML "examples" container format (pre-GGUF .bin model files).

This is the format of the per-architecture example models the reference
supports (gpt2/gptj/gptneox/dolly/mpt/replit/starcoder): a bare binary
stream with no index — magic, int32 hparams, length-prefixed vocab, then a
sequence of tensors read until EOF. Layout per the reference loaders (e.g.
/root/reference/models/llms/gpt2.cc:61-381):

    u32 magic 0x67676d6c ('ggml')
    i32 hparams[...]                 (model-specific; last one is ftype)
    vocab: per-token u32 len + bytes (replit: + f32 score)
    tensors: { i32 n_dims; i32 name_len; i32 ttype;
               i32 ne[n_dims]; name bytes; payload } until EOF

ftype is stored as ftype + GGML_QNT_VERSION * 1000 (ggml.h:205-206).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .quants import GGMLType, dequantize, row_nbytes

GGML_FILE_MAGIC = 0x67676D6C
GGML_QNT_VERSION = 2
GGML_QNT_VERSION_FACTOR = 1000


@dataclass
class LegacyTensor:
    name: str
    ne: Tuple[int, ...]  # GGML dim order
    type: GGMLType
    offset: int  # absolute file offset of payload

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.ne:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        return row_nbytes(self.type, self.n_elements)

    @property
    def numpy_shape(self) -> Tuple[int, ...]:
        return tuple(reversed(self.ne))


class LegacyReader:
    """Streaming reader for the legacy container.

    Usage: construct, read hparams with read_i32(), then read_vocab(),
    then index_tensors(). Tensor payloads are served from a memmap.
    """

    def __init__(self, path: str):
        self.path = str(path)
        self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
        self._pos = 0
        magic = self.read_u32()
        if magic != GGML_FILE_MAGIC:
            raise ValueError(f"not a legacy GGML file: magic {magic:#x}")
        self.tensors: Dict[str, LegacyTensor] = {}

    def _take(self, n: int) -> bytes:
        b = self._mmap[self._pos : self._pos + n].tobytes()
        if len(b) != n:
            raise EOFError(f"unexpected EOF at {self._pos}")
        self._pos += n
        return b

    def read_i32(self) -> int:
        return struct.unpack("<i", self._take(4))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def read_f32(self) -> float:
        return struct.unpack("<f", self._take(4))[0]

    def read_vocab(
        self, n_vocab: int, scores: bool = False
    ) -> Union[List[bytes], Tuple[List[bytes], List[float]]]:
        """Length-prefixed token table; replit also stores a score per token."""
        toks: List[bytes] = []
        scs: List[float] = []
        for _ in range(n_vocab):
            ln = self.read_u32()
            toks.append(self._take(ln))
            if scores:
                scs.append(self.read_f32())
        return (toks, scs) if scores else toks

    def index_tensors(self) -> Dict[str, LegacyTensor]:
        """Scan the remaining stream and index all tensors (no data copy)."""
        total = self._mmap.size
        while self._pos + 12 <= total:
            n_dims = self.read_i32()
            name_len = self.read_i32()
            ttype = GGMLType(self.read_i32())
            ne = tuple(self.read_i32() for _ in range(n_dims))
            name = self._take(name_len).decode("utf-8", errors="replace")
            t = LegacyTensor(name, ne, ttype, self._pos)
            self._pos += t.nbytes
            if self._pos > total:
                raise EOFError(f"tensor {name} payload overruns file")
            self.tensors[name] = t
        return self.tensors

    def tensor_bytes(self, name: str) -> np.ndarray:
        t = self.tensors[name]
        return self._mmap[t.offset : t.offset + t.nbytes]

    def tensor_f32(self, name: str) -> np.ndarray:
        t = self.tensors[name]
        return dequantize(self.tensor_bytes(name), t.type, t.n_elements).reshape(
            t.numpy_shape
        )


class LegacyWriter:
    """Writer for test fixtures and the model conversion tool."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(struct.pack("<I", GGML_FILE_MAGIC))

    def write_i32(self, v: int) -> None:
        self._f.write(struct.pack("<i", v))

    def write_ftype(self, ftype: int) -> None:
        self.write_i32(ftype + GGML_QNT_VERSION * GGML_QNT_VERSION_FACTOR)

    def write_vocab(
        self, tokens: Sequence[Union[str, bytes]], scores: Optional[Sequence[float]] = None
    ) -> None:
        for i, tok in enumerate(tokens):
            b = tok.encode("utf-8") if isinstance(tok, str) else bytes(tok)
            self._f.write(struct.pack("<I", len(b)))
            self._f.write(b)
            if scores is not None:
                self._f.write(struct.pack("<f", scores[i]))

    def write_tensor(
        self,
        name: str,
        ttype: Union[GGMLType, int],
        ne: Sequence[int],
        payload: Union[bytes, np.ndarray],
    ) -> None:
        data = bytes(
            np.asarray(payload, np.uint8).tobytes()
            if isinstance(payload, np.ndarray)
            else payload
        )
        n = 1
        for d in ne:
            n *= d
        expect = row_nbytes(GGMLType(ttype), n)
        if len(data) != expect:
            raise ValueError(f"tensor {name}: payload {len(data)} != expected {expect}")
        nb = name.encode("utf-8")
        self._f.write(struct.pack("<iii", len(ne), len(nb), int(ttype)))
        for d in ne:
            self._f.write(struct.pack("<i", d))
        self._f.write(nb)
        self._f.write(data)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
