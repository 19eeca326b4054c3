"""ctypes binding for the native repack runtime (native/repack.cc).

Loads native/libctrepack.so when present (`make -C native`); every entry
point has a numpy fallback (formats/quants.py), so the native library is a
load-time accelerator, not a requirement — mirroring how the reference
ships precompiled binaries with a pure dispatch layer (ctransformers/lib.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.environ.get(
    "CT_NATIVE_LIB",
    str(Path(__file__).resolve().parent.parent.parent / "native" / "libctrepack.so"),
)

_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("CT_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ct_type_info.argtypes = [ctypes.c_int] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4
    lib.ct_type_info.restype = ctypes.c_int
    lib.ct_repack.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.ct_repack.restype = ctypes.c_int
    lib.ct_pack4.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.ct_pack4.restype = ctypes.c_int
    lib.ct_spm_new.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.ct_spm_new.restype = ctypes.c_void_p
    lib.ct_spm_free.argtypes = [ctypes.c_void_p]
    lib.ct_spm_free.restype = None
    lib.ct_spm_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.ct_spm_tokenize.restype = ctypes.c_int64
    lib.ct_bpe_new.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.ct_bpe_new.restype = ctypes.c_void_p
    lib.ct_bpe_free.argtypes = [ctypes.c_void_p]
    lib.ct_bpe_free.restype = None
    lib.ct_bpe_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.ct_bpe_tokenize.restype = ctypes.c_int64
    lib.ct_greedy_new.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.ct_greedy_new.restype = ctypes.c_void_p
    lib.ct_greedy_free.argtypes = [ctypes.c_void_p]
    lib.ct_greedy_free.restype = None
    lib.ct_greedy_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.ct_greedy_tokenize.restype = ctypes.c_int64
    lib.ct_uni_new.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.ct_uni_new.restype = ctypes.c_void_p
    lib.ct_uni_free.argtypes = [ctypes.c_void_p]
    lib.ct_uni_free.restype = None
    lib.ct_uni_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.ct_uni_tokenize.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _pack_blob(items):
    """Concatenate byte strings; returns (blob, int64 prefix offsets)."""
    enc = [
        it.encode("utf-8") if isinstance(it, str) else bytes(it)
        for it in items
    ]
    blob = b"".join(enc)
    offs = np.zeros(len(enc) + 1, np.int64)
    if enc:
        np.cumsum([len(e) for e in enc], out=offs[1:])
    return blob, offs


def available() -> bool:
    return _load() is not None


def build(silent: bool = True) -> bool:
    """Build the native library with `make -C native`; returns success."""
    import subprocess

    native_dir = Path(_LIB_PATH).parent
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=silent,
        )
    except Exception:
        return False
    global _checked
    _checked = False  # re-probe
    return available()


def native_repack(
    data: np.ndarray, ggml_type: int, rows: int, cols: int
) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], int]]:
    """(q (cols,rows) int8, s (cols/g,rows) f32, m|None, group) or None."""
    lib = _load()
    if lib is None:
        return None
    bs = ctypes.c_int()
    ts = ctypes.c_int()
    group = ctypes.c_int()
    has_min = ctypes.c_int()
    if lib.ct_type_info(
        int(ggml_type),
        ctypes.byref(bs),
        ctypes.byref(ts),
        ctypes.byref(group),
        ctypes.byref(has_min),
    ):
        return None
    data = np.ascontiguousarray(np.frombuffer(data, np.uint8, count=rows * (cols // bs.value) * ts.value) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, np.uint8).reshape(-1))
    g = group.value
    q = np.empty((cols, rows), np.int8)
    s = np.empty((cols // g, rows), np.float32)
    m = np.empty((cols // g, rows), np.float32) if has_min.value else None
    rc = lib.ct_repack(
        data.ctypes.data_as(ctypes.c_void_p),
        int(ggml_type),
        rows,
        cols,
        q.ctypes.data_as(ctypes.c_void_p),
        s.ctypes.data_as(ctypes.c_void_p),
        m.ctypes.data_as(ctypes.c_void_p) if m is not None else None,
        0,
    )
    if rc:
        return None
    return q, s, m, g


class NativeSPM:
    """Handle over the C++ bigram-merge tokenizer (native/tokenizer.cc).
    Token-for-token identical to tokenizers/spm.py (parity-tested); the
    Python loop is the fallback. ~100x faster on long prompts."""

    def __init__(self, handle):
        self._h = handle

    def __del__(self):
        lib = _load()
        if lib is not None and self._h:
            lib.ct_spm_free(self._h)
            self._h = None

    def tokenize(self, raw: bytes) -> Optional[np.ndarray]:
        lib = _load()
        if lib is None or not self._h:
            return None
        cap = max(len(raw), 1) + 1
        out = np.empty(cap, np.int32)
        n = lib.ct_spm_tokenize(
            self._h, raw, len(raw), out.ctypes.data_as(ctypes.c_void_p), cap
        )
        if n < 0:
            return None
        return out[:n]


def native_spm(pieces, scores, legacy: bool = False) -> Optional[NativeSPM]:
    """Build a native SPM tokenizer from id-ordered `pieces` (list of str
    or bytes) and their scores; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    blob, offs = _pack_blob(pieces)
    sc = np.ascontiguousarray(np.asarray(scores, np.float32))
    h = lib.ct_spm_new(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(offs) - 1,
        1 if legacy else 0,
    )
    return NativeSPM(h) if h else None


class NativeBPE:
    """Handle over the C++ rank-merge BPE loop (native/tokenizer.cc);
    parity-locked against tokenizers/bpe.py."""

    def __init__(self, handle):
        self._h = handle

    def __del__(self):
        lib = _load()
        if lib is not None and self._h:
            lib.ct_bpe_free(self._h)
            self._h = None

    def tokenize_words(self, words) -> Optional[np.ndarray]:
        """words: iterable of pre-split word strings/bytes (regex output)."""
        lib = _load()
        if lib is None or not self._h:
            return None
        blob, offs = _pack_blob(words)
        cap = max(len(blob), 1) + 1
        out = np.empty(cap, np.int32)
        n = lib.ct_bpe_tokenize(
            self._h,
            blob,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offs) - 1,
            out.ctypes.data_as(ctypes.c_void_p),
            cap,
        )
        if n < 0:
            return None
        return out[:n]


def native_bpe(pieces, merges) -> Optional[NativeBPE]:
    """Build a native BPE tokenizer from id-ordered pieces and merge lines
    ("left right"); None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    blob, offs = _pack_blob(pieces)
    parts = []
    for line in merges:
        l, _, r = line.partition(" ")
        parts.append(l)
        parts.append(r)
    mblob, moffs = _pack_blob(parts)
    h = lib.ct_bpe_new(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offs) - 1,
        mblob,
        moffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(parts) // 2,
    )
    return NativeBPE(h) if h else None


class NativeGreedy:
    """Handle over the C++ greedy longest-match loop (native/tokenizer.cc);
    parity-locked against tokenizers/greedy.py (which additionally logs
    unknown-byte warnings — a log-only difference)."""

    def __init__(self, handle):
        self._h = handle

    def __del__(self):
        lib = _load()
        if lib is not None and self._h:
            lib.ct_greedy_free(self._h)
            self._h = None

    def tokenize_words(self, words) -> Optional[np.ndarray]:
        lib = _load()
        if lib is None or not self._h:
            return None
        blob, offs = _pack_blob(words)
        cap = max(len(blob), 1) + 1
        out = np.empty(cap, np.int32)
        n = lib.ct_greedy_tokenize(
            self._h,
            blob,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offs) - 1,
            out.ctypes.data_as(ctypes.c_void_p),
            cap,
        )
        if n < 0:
            return None
        return out[:n]


def native_greedy(tokens) -> Optional[NativeGreedy]:
    """Build a native greedy tokenizer from id-ordered byte tokens."""
    lib = _load()
    if lib is None:
        return None
    blob, offs = _pack_blob(tokens)
    h = lib.ct_greedy_new(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offs) - 1,
    )
    return NativeGreedy(h) if h else None


class NativeUnigram:
    """Handle over the C++ Viterbi pass (native/tokenizer.cc); parity-locked
    against tokenizers/unigram.py (double-precision cost accumulation)."""

    def __init__(self, handle):
        self._h = handle

    def __del__(self):
        lib = _load()
        if lib is not None and self._h:
            lib.ct_uni_free(self._h)
            self._h = None

    def tokenize(self, raw: bytes) -> Optional[np.ndarray]:
        lib = _load()
        if lib is None or not self._h:
            return None
        cap = max(len(raw), 1) + 1
        out = np.empty(cap, np.int32)
        n = lib.ct_uni_tokenize(
            self._h, raw, len(raw), out.ctypes.data_as(ctypes.c_void_p), cap
        )
        if n < 0:
            return None
        return out[:n]


def native_unigram(pieces, scores) -> Optional[NativeUnigram]:
    lib = _load()
    if lib is None:
        return None
    blob, offs = _pack_blob(pieces)
    sc = np.ascontiguousarray(np.asarray(scores, np.float32))
    h = lib.ct_uni_new(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(offs) - 1,
    )
    return NativeUnigram(h) if h else None


def native_pack4(q: np.ndarray, zp: int) -> Optional[np.ndarray]:
    """q (kp, n) int8 -> (kp/2, n) uint8 nibble-packed, or None."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int8)
    kp, n = q.shape
    out = np.empty((kp // 2, n), np.uint8)
    rc = lib.ct_pack4(
        q.ctypes.data_as(ctypes.c_void_p),
        kp,
        n,
        int(zp),
        out.ctypes.data_as(ctypes.c_void_p),
        0,
    )
    if rc:
        return None
    return out
