"""Pre-GGUF LLaMA containers: GGML / GGMF / GGJT v1-v3.

Clone of the reference's old-format loader (llama-ggml.cpp:474-612):
magic/version table (llama-ggml.h:37-46), hparams {n_vocab, n_embd,
n_mult, n_head, n_layer, n_rot, ftype}, scored SPM vocab (scores from
GGMF v1 on), tensor stream 32-byte aligned from GGJT v1 on. n_ff derives
from n_mult (llama-ggml.cpp:1113-1118); 70B GQA is detected from the
FILENAME like the reference adapter does (llama-ggml.cc:88-91 regex
`(\b|_)70b(\b|_)` -> n_gqa=8). Weights are pre-permuted for interleaved
(mode 0) RoPE like GGUF conversions.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..formats.quants import GGMLType, dequantize, row_nbytes
from ..ops.qmatmul import repack
from .spec import ArchSpec
from .vocab import (
    GGUFVocab,
    TOKEN_TYPE_BYTE,
    TOKEN_TYPE_CONTROL,
    TOKEN_TYPE_NORMAL,
    TOKEN_TYPE_UNKNOWN,
)

MAGIC_GGJT = 0x67676A74
MAGIC_GGMF = 0x67676D66
MAGIC_GGML = 0x67676D6C

DEFAULT_RMS_EPS = 5e-6  # LLAMA_DEFAULT_RMS_EPS (llama-ggml.h)
DEFAULT_N_CTX = 512  # llama_context_default_params (llama-ggml.cpp:903)


@dataclass
class _Tensor:
    ne: Tuple[int, ...]
    type: GGMLType
    offset: int

    @property
    def numpy_shape(self):
        return tuple(reversed(self.ne))

    @property
    def nbytes(self):
        n = 1
        for d in self.ne:
            n *= d
        return row_nbytes(self.type, n)


class GGJTReader:
    def __init__(self, path: str):
        self.path = str(path)
        self._mmap = np.memmap(path, dtype=np.uint8, mode="r")
        self._pos = 0
        magic = self._u32()
        if magic == MAGIC_GGML:
            self.version = 0
            self.has_scores = False
            self.aligned = False
        elif magic == MAGIC_GGMF:
            self.version = self._u32()
            if self.version != 1:
                raise ValueError(f"bad GGMF version {self.version}")
            self.has_scores = True
            self.aligned = False
        elif magic == MAGIC_GGJT:
            self.version = self._u32()
            if not 1 <= self.version <= 3:
                raise ValueError(f"bad GGJT version {self.version}")
            self.has_scores = True
            self.aligned = True
        else:
            raise ValueError(f"not a GGML/GGMF/GGJT file: magic {magic:#x}")

        (
            self.n_vocab,
            self.n_embd,
            self.n_mult,
            self.n_head,
            self.n_layer,
            self.n_rot,
            self.ftype,
        ) = (self._u32() for _ in range(7))

        self.pieces: List[str] = []
        self.scores: List[float] = []
        for _ in range(self.n_vocab):
            ln = self._u32()
            self.pieces.append(
                self._take(ln).decode("utf-8", errors="replace")
            )
            self.scores.append(self._f32() if self.has_scores else 0.0)

        self.tensors: Dict[str, _Tensor] = {}
        total = self._mmap.size
        while self._pos + 12 <= total:
            n_dims = self._u32()
            name_len = self._u32()
            ttype = GGMLType(self._u32())
            ne = tuple(self._u32() for _ in range(n_dims))
            name = self._take(name_len).decode("utf-8")
            if self.aligned:
                self._pos += -self._pos & 31
            t = _Tensor(ne, ttype, self._pos)
            self._pos += t.nbytes
            if self._pos > total:
                raise EOFError(f"tensor {name} overruns file")
            self.tensors[name] = t

    def _take(self, n: int) -> bytes:
        b = self._mmap[self._pos : self._pos + n].tobytes()
        if len(b) != n:
            raise EOFError(f"unexpected EOF at {self._pos}")
        self._pos += n
        return b

    def _u32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def _f32(self) -> float:
        return struct.unpack("<f", self._take(4))[0]

    def tensor_bytes(self, name: str) -> np.ndarray:
        t = self.tensors[name]
        return self._mmap[t.offset : t.offset + t.nbytes]

    def tensor_f32(self, name: str) -> np.ndarray:
        t = self.tensors[name]
        n = 1
        for d in t.ne:
            n *= d
        return dequantize(self.tensor_bytes(name), t.type, n).reshape(
            t.numpy_shape
        )


def _weight(r: GGJTReader, name: str):
    info = r.tensors[name]
    rows, cols = info.numpy_shape
    if info.type in (GGMLType.F32, GGMLType.F16):
        return np.ascontiguousarray(r.tensor_f32(name).T)
    return repack(r.tensor_bytes(name), info.type, rows, cols)


def detect_n_gqa(path: str) -> int:
    """llama-ggml.cc:88-91: 70B models are detected by filename."""
    if re.search(r"(\b|_)70b(\b|_)", str(path).lower()):
        return 8
    return 1


def load_bundle(path: str, context_length: int = -1):
    from .registry import ModelBundle
    from ..tokenizers.spm import SPMTokenizerLegacy

    r = GGJTReader(path)
    n_gqa = detect_n_gqa(path)
    if r.n_head % n_gqa:
        raise ValueError(f"n_head {r.n_head} not divisible by n_gqa {n_gqa}")

    # n_ff from n_mult (llama-ggml.cpp:1113-1118, f_ffn_mult = 1.0)
    n_ff_raw = 2 * (4 * r.n_embd) // 3
    n_ff = (n_ff_raw + r.n_mult - 1) // r.n_mult * r.n_mult

    spec = ArchSpec(
        name="llama",
        n_vocab=r.n_vocab,
        n_ctx=context_length if context_length > 0 else DEFAULT_N_CTX,
        n_embd=r.n_embd,
        n_head=r.n_head,
        n_layer=r.n_layer,
        n_head_kv=r.n_head // n_gqa,
        n_ff=n_ff,
        rope_mode="interleaved",
        n_rot=r.n_embd // r.n_head,
        norm="rmsnorm",
        norm_eps=DEFAULT_RMS_EPS,
        act="silu_gate",
    )

    params = {
        "wte": r.tensor_f32("tok_embeddings.weight"),
        "ln_f_g": r.tensor_f32("norm.weight"),
        "lm_head": _weight(r, "output.weight"),
        "layers": [],
    }
    for i in range(r.n_layer):
        p = f"layers.{i}"
        params["layers"].append(
            {
                "ln1_g": r.tensor_f32(f"{p}.attention_norm.weight"),
                "wq": _weight(r, f"{p}.attention.wq.weight"),
                "wk": _weight(r, f"{p}.attention.wk.weight"),
                "wv": _weight(r, f"{p}.attention.wv.weight"),
                "wo": _weight(r, f"{p}.attention.wo.weight"),
                "ln2_g": r.tensor_f32(f"{p}.ffn_norm.weight"),
                "w_gate": _weight(r, f"{p}.feed_forward.w1.weight"),
                "w_down": _weight(r, f"{p}.feed_forward.w2.weight"),
                "w_up": _weight(r, f"{p}.feed_forward.w3.weight"),
            }
        )

    # old files store pieces in display form (real spaces, raw bytes);
    # detokenize returns raw piece bytes (llama-ggml token_to_str)
    types = []
    for i, piece in enumerate(r.pieces):
        if i == 0:
            types.append(TOKEN_TYPE_UNKNOWN)
        elif i in (1, 2):
            types.append(TOKEN_TYPE_CONTROL)
        else:
            types.append(TOKEN_TYPE_NORMAL)
    vocab = GGUFVocab(r.pieces, r.scores, types, vocab_type="bpe")
    return ModelBundle(
        spec,
        params,
        vocab,
        SPMTokenizerLegacy(vocab),
        architecture="llama",
        sampler="llama",
        supports_embeddings=True,
    )
