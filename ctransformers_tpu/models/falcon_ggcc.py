"""Pre-GGUF Falcon containers: ggllm.cpp GGCC files (+ falcon-in-GGJT).

Clone of the reference's libfalcon loader semantics
(/root/reference/models/ggml/libfalcon.cpp):

  * magic table: GGML (unversioned) / GGMF v1 / GGJT v1-3 / GGCC v10
    (libfalcon.cpp:731-779; magic 'ggcc' = 0x67676363, libfalcon.h:36-41)
  * hparams {n_vocab, n_embd, n_head, n_head_kv, n_layer, n_falcon_type,
    ftype[, n_bpe_merges]} (libfalcon.cpp:779-795)
  * scored vocab; GGCC v10 carries the BPE merge list inline
    (libfalcon.cpp:797-846; older files read tokenizer.json — that
    fallback is intentionally NOT reproduced: convert to GGCC v10)
  * the 65025-token "[PAD]"-shaving wizard hack (libfalcon.cpp:815-822)
  * GGJT-style 32-byte-aligned tensor stream (libfalcon.cpp:875-935)
  * multi-shard model files `f`, `f.1`, `f.2`, ...: shard count is
    n_embd / ne[0] of the word-embedding tensor (guess_n_parts,
    libfalcon.cpp:1066-1073); 1-D tensors are duplicated per shard,
    tok_embeddings/attn-dense/ffn-down merge by columns, everything else
    by rows (calc_split_type, libfalcon.cpp:645-658)
  * fused query_key_value rows are consecutive [q | k | v]
    (the eval views at offsets 0 / H*dh / (H+Hkv)*dh,
    libfalcon.cpp:2035-2049), split exactly like the GGUF falcon path

Quantized tensors use the CURRENT block formats only (GGJT v3 / GGCC
v10); v1/v2-era Q4/Q8 layouts are rejected with a clear error (the
reference's llama-ggml.cpp keeps decoders for them, but no GGCC falcon
files in those revisions exist in practice).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..formats.quants import GGMLType, dequantize, row_nbytes
from ..ops.qmatmul import make_qtensor, repack, repack_select_rows
from .spec import ArchSpec
from .vocab import (
    GGUFVocab,
    TOKEN_TYPE_NORMAL,
)

MAGIC_GGML = 0x67676D6C
MAGIC_GGMF = 0x67676D66
MAGIC_GGJT = 0x67676A74
MAGIC_GGCC = 0x67676363

# by-column merge targets (calc_split_type, libfalcon.cpp:649-655)
_COLUMN_SPLIT_MARKS = (
    "tok_embeddings.",
    ".attention.wo.weight",
    ".feed_forward.w2.weight",
    "transformer.word_embeddings.weight",
    ".self_attention.dense.weight",
    ".mlp.dense_4h_to_h.weight",
)


@dataclass
class _Shard:
    ne: Tuple[int, ...]
    type: GGMLType
    path: str
    offset: int

    @property
    def nbytes(self) -> int:
        n = 1
        for d in self.ne:
            n *= d
        return row_nbytes(self.type, n)


@dataclass
class _Tensor:
    name: str
    shards: List[_Shard] = field(default_factory=list)

    def split_type(self) -> str:
        if len(self.shards[0].ne) == 1 or len(self.shards) == 1:
            return "none"
        if any(m in self.name or self.name.startswith(m)
               for m in _COLUMN_SPLIT_MARKS):
            return "columns"
        return "rows"

    @property
    def type(self) -> GGMLType:
        return self.shards[0].type

    @property
    def ne(self) -> Tuple[int, ...]:
        ne0 = self.shards[0].ne
        st = self.split_type()
        n = len(self.shards)
        if st == "columns":
            return (ne0[0] * n, ne0[1])
        if st == "rows":
            return (ne0[0], ne0[1] * n)
        return ne0

    @property
    def numpy_shape(self):
        return tuple(reversed(self.ne))


def _sidecar_merges(model_dir: str) -> List[str]:
    """BPE merges from a standard HF tokenizer.json beside the model file.

    Pre-GGCC falcon containers carry no inline merge list; the reference
    falls back to scanning the model directory's tokenizer.json
    (libfalcon.cpp:835-868, parse_json_to_bpe_merges at :329-416 — a
    line-oriented scrape; here a real JSON parse of the same document).
    Accepts both merge spellings HF has shipped: "A B" strings and
    [A, B] pairs. Returns [] when the file is missing or has no merges.
    """
    import json

    path = os.path.join(model_dir, "tokenizer.json")
    try:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return []
    model = doc.get("model", doc)
    raw = model.get("merges") or []
    merges: List[str] = []
    for entry in raw:
        if isinstance(entry, str):
            merges.append(entry)
        elif isinstance(entry, (list, tuple)) and len(entry) == 2:
            merges.append(f"{entry[0]} {entry[1]}")
    return merges


class GGCCReader:
    """Parses a (possibly multi-shard) ggllm falcon model file."""

    def __init__(self, path: str):
        self.path = str(path)
        self.tensors: Dict[str, _Tensor] = {}
        self._mmaps: Dict[str, np.memmap] = {}
        self._read_file(self.path, first=True)
        n_parts = self._guess_n_parts()
        for i in range(1, n_parts):
            self._read_file(f"{self.path}.{i}", first=False)

    def _guess_n_parts(self) -> int:
        t = self.tensors.get("transformer.word_embeddings.weight")
        if t is None:
            raise ValueError("GGCC: missing word_embeddings.weight")
        return self.n_embd // t.shards[0].ne[0]

    def _read_file(self, path: str, first: bool) -> None:
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        self._mmaps[path] = mm
        pos = 0

        def u32():
            nonlocal pos
            v = int(np.frombuffer(mm[pos : pos + 4], "<u4")[0])
            pos += 4
            return v

        def raw(n):
            nonlocal pos
            b = bytes(mm[pos : pos + n])
            pos += n
            return b

        magic = u32()
        if magic == MAGIC_GGML:
            version, aligned, has_scores = 0, False, False
        elif magic in (MAGIC_GGMF, MAGIC_GGJT, MAGIC_GGCC):
            version = u32()
            ok = (
                (magic == MAGIC_GGMF and version == 1)
                or (magic == MAGIC_GGJT and 1 <= version <= 3)
                or (magic == MAGIC_GGCC and version == 10)
            )
            if not ok:
                raise ValueError(
                    f"GGCC: unknown (magic, version) {magic:#x}, {version}"
                )
            aligned = magic in (MAGIC_GGJT, MAGIC_GGCC)
            has_scores = True
        else:
            raise ValueError(f"not a ggllm falcon file (magic {magic:#x})")
        if magic == MAGIC_GGJT and version < 3:
            raise ValueError(
                "GGCC: GGJT v1/v2-era quant layouts unsupported; "
                "re-quantize to GGJT v3 / GGCC v10"
            )
        self.is_ggcc = magic == MAGIC_GGCC

        n_vocab = u32()
        hp = dict(
            n_vocab=n_vocab,
            n_embd=u32(),
            n_head=u32(),
            n_head_kv=u32(),
            n_layer=u32(),
            n_falcon_type=u32(),
            ftype=u32(),
        )
        if self.is_ggcc:
            hp["n_bpe_merges"] = u32()
        if first:
            self.__dict__.update(hp)
        # vocab (identical in every shard; keep the first)
        pieces, scores = [], []
        for _ in range(n_vocab):
            pieces.append(raw(u32()))
            if has_scores:
                scores.append(struct.unpack("<f", raw(4))[0])
            else:
                scores.append(0.0)
        merges: List[str] = []
        if self.is_ggcc:
            for _ in range(u32()):
                a = raw(u32()).decode("utf-8", errors="replace")
                b = raw(u32()).decode("utf-8", errors="replace")
                merges.append(f"{a} {b}")
        elif first:
            # pre-GGCC fallback (libfalcon.cpp:835-868): merges live in a
            # standard HF tokenizer.json next to the model file
            merges = _sidecar_merges(os.path.dirname(os.path.abspath(path)))
            if not merges:
                raise ValueError(
                    "GGCC: pre-GGCC falcon files keep BPE merges in a "
                    "sidecar tokenizer.json (libfalcon.cpp:838-858); place "
                    "the model's tokenizer.json next to the file, or "
                    "convert the model to GGCC v10 (merges inline)"
                )
        if first:
            # wizard hack: 65025-vocab files shave the trailing [PAD]
            # (libfalcon.cpp:815-822)
            if n_vocab == 65025 and pieces and pieces[-1] == b"[PAD]":
                pieces.pop()
                scores.pop()
                self.n_vocab = 65024
            self.pieces, self.scores, self.merges = pieces, scores, merges

        # tensor stream
        size = mm.shape[0]
        while pos < size:
            n_dims = u32()
            name_len = u32()
            ttype = GGMLType(u32())
            ne = tuple(
                int(x) for x in np.frombuffer(raw(4 * n_dims), "<u4")
            )
            name = raw(name_len).decode("utf-8")
            if aligned:
                pos += -pos & 31
            shard = _Shard(ne, ttype, path, pos)
            pos += shard.nbytes
            self.tensors.setdefault(name, _Tensor(name)).shards.append(shard)

    # -- tensor access ------------------------------------------------------

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Merged raw bytes of a tensor across its shards (still in the
        file's quantized encoding)."""
        t = self.tensors[name]
        st = t.split_type()
        blobs = [
            self._mmaps[s.path][s.offset : s.offset + s.nbytes]
            for s in t.shards
        ]
        if st == "none":
            return blobs[0]
        if st == "rows":  # ggml ne[1] grows: plain byte concatenation
            return np.concatenate(blobs)
        # columns: each output row's byte segments interleave across shards
        ne0, ne1 = t.shards[0].ne
        per_row = row_nbytes(t.type, ne0)
        rows = [b.reshape(ne1, per_row) for b in blobs]
        return np.concatenate(rows, axis=1).reshape(-1)

    def tensor_f32(self, name: str) -> np.ndarray:
        t = self.tensors[name]
        n = 1
        for d in t.ne:
            n *= d
        return dequantize(self.tensor_bytes(name), t.type, n).reshape(
            t.numpy_shape
        )


def _weight(r: GGCCReader, name: str):
    t = r.tensors[name]
    rows, cols = t.numpy_shape
    if t.type in (GGMLType.F32, GGMLType.F16):
        return np.ascontiguousarray(r.tensor_f32(name).T)
    return repack(r.tensor_bytes(name), t.type, rows, cols)


def load_bundle(path: str, context_length: int = -1):
    """Build the falcon graph params from a GGCC file — the same pytree
    the GGUF falcon path produces (models/llama_gguf.py), so forward()
    and every downstream subsystem are shared."""
    from .registry import ModelBundle

    r = GGCCReader(path)
    n_embd, n_head, n_head_kv = r.n_embd, r.n_head, r.n_head_kv
    n_layer, n_vocab = r.n_layer, r.n_vocab
    head_dim = n_embd // n_head
    n_ff = 4 * n_embd  # libfalcon.cpp:1625
    # 40B-style blocks carry separate attention/MLP norms
    forty = "transformer.h.0.ln_attn.weight" in r.tensors
    n_ctx = context_length if context_length > 0 else 2048

    vocab = GGUFVocab(
        [p.decode("utf-8", errors="replace") for p in r.pieces],
        r.scores,
        [TOKEN_TYPE_NORMAL] * len(r.pieces),
        vocab_type="bpe",
        bos_id=11,
        eos_id=11,  # falcon <|endoftext|>
        unk_id=-1,
        pad_id=-1,
    )
    from ..tokenizers.bpe import BPETokenizer

    tokenizer = BPETokenizer(vocab, r.merges)

    spec = ArchSpec(
        name="falcon",
        n_vocab=n_vocab,
        n_ctx=n_ctx,
        n_ctx_train=2048,
        n_embd=n_embd,
        n_head=n_head,
        n_layer=n_layer,
        n_head_kv=n_head_kv,
        n_ff=n_ff,
        rope_mode="neox",
        n_rot=head_dim,
        norm="layernorm",
        norm_eps=1e-5,
        parallel_residual=True,
        shared_parallel_ln=not forty,
        act="gelu",
    )

    params = {
        "wte": r.tensor_f32("transformer.word_embeddings.weight"),
        "ln_f_g": r.tensor_f32("transformer.ln_f.weight"),
        "ln_f_b": r.tensor_f32("transformer.ln_f.bias"),
        "lm_head": _weight(r, "lm_head.weight"),
        "layers": [],
    }
    sizes = [n_head * head_dim, n_head_kv * head_dim, n_head_kv * head_dim]
    for i in range(n_layer):
        p = f"transformer.h.{i}"
        qkv = f"{p}.self_attention.query_key_value.weight"
        t = r.tensors[qkv]
        rows, cols = t.numpy_shape
        bounds = np.cumsum([0] + sizes)
        groups = [np.arange(bounds[j], bounds[j + 1]) for j in range(3)]
        wq, wk, wv = repack_select_rows(
            r.tensor_bytes(qkv), t.type, rows, cols, groups
        )
        if forty:
            layer = {
                "ln1_g": r.tensor_f32(f"{p}.ln_attn.weight"),
                "ln1_b": r.tensor_f32(f"{p}.ln_attn.bias"),
                "ln2_g": r.tensor_f32(f"{p}.ln_mlp.weight"),
                "ln2_b": r.tensor_f32(f"{p}.ln_mlp.bias"),
            }
        else:
            layer = {
                "ln1_g": r.tensor_f32(f"{p}.input_layernorm.weight"),
                "ln1_b": r.tensor_f32(f"{p}.input_layernorm.bias"),
            }
        layer.update(
            wq=wq,
            wk=wk,
            wv=wv,
            wo=_weight(r, f"{p}.self_attention.dense.weight"),
            w_up=_weight(r, f"{p}.mlp.dense_h_to_4h.weight"),
            w_down=_weight(r, f"{p}.mlp.dense_4h_to_h.weight"),
        )
        params["layers"].append(layer)

    return ModelBundle(
        spec,
        params,
        vocab,
        tokenizer,
        architecture="falcon",
        sampler="llama",
        supports_embeddings=True,
    )
