"""Test-time oracle: the reference GGML quantization kernels via ctypes.

Compiles the reference's ggml.c + k_quants.c (mounted read-only at
/root/reference) into a throwaway shared library under /tmp and exposes its
type-traits table (to_float / from_float per ggml type). Used ONLY by tests
to golden-check our numpy codecs bit-for-bit. No reference code enters this
repository; if the reference tree or a C compiler is unavailable, tests that
need the oracle skip.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

REF = Path("/root/reference/models/ggml")
_LIB = None
_FAILED = False


class _TypeTraits(ctypes.Structure):
    # ggml_type_traits_t, ggml.h:1978-1988
    _fields_ = [
        ("type_name", ctypes.c_char_p),
        ("blck_size", ctypes.c_int),
        ("type_size", ctypes.c_size_t),
        ("is_quantized", ctypes.c_bool),
        ("to_float", ctypes.c_void_p),
        ("from_float", ctypes.c_void_p),
        ("from_float_reference", ctypes.c_void_p),
        ("vec_dot", ctypes.c_void_p),
        ("vec_dot_type", ctypes.c_int),
    ]


_TO_FLOAT = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
)
_FROM_FLOAT = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_int
)


def _build() -> Path | None:
    srcs = [REF / "ggml.c", REF / "k_quants.c", REF / "ggml-alloc.c"]
    if not all(s.exists() for s in srcs):
        return None
    tag = hashlib.sha256(
        b"|".join(s.read_bytes()[:4096] for s in srcs)
    ).hexdigest()[:16]
    out = Path(f"/tmp/ggml_oracle_{tag}.so")
    if out.exists():
        return out
    cmd = [
        "cc", "-O2", "-shared", "-fPIC", "-o", str(out),
        *map(str, srcs),
        f"-I{REF}", f"-I{REF.parent}", "-DGGML_USE_K_QUANTS", "-lm", "-lpthread", "-w",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return out


def get_oracle():
    """Returns the loaded reference lib, or None if unavailable."""
    global _LIB, _FAILED
    if _LIB is None and not _FAILED:
        path = _build()
        if path is None:
            _FAILED = True
            return None
        _LIB = ctypes.CDLL(str(path))
        _LIB.ggml_internal_get_type_traits.restype = _TypeTraits
        _LIB.ggml_internal_get_type_traits.argtypes = [ctypes.c_int]

        # ggml_init builds the global fp16<->fp32 conversion tables; without
        # it every fp16 scale decodes to 0.
        class _InitParams(ctypes.Structure):
            _fields_ = [
                ("mem_size", ctypes.c_size_t),
                ("mem_buffer", ctypes.c_void_p),
                ("no_alloc", ctypes.c_bool),
            ]

        _LIB.ggml_init.restype = ctypes.c_void_p
        _LIB.ggml_init.argtypes = [_InitParams]
        ctx = _LIB.ggml_init(_InitParams(1 << 16, None, True))
        _LIB.ggml_free.argtypes = [ctypes.c_void_p]
        _LIB.ggml_free(ctx)
    return _LIB


def ref_has_to_float(ggml_type: int) -> bool:
    lib = get_oracle()
    return bool(lib.ggml_internal_get_type_traits(int(ggml_type)).to_float)


def ref_dequantize(data: bytes, ggml_type: int, n: int):
    """Decode `n` elements with the reference to_float."""
    import numpy as np

    lib = get_oracle()
    traits = lib.ggml_internal_get_type_traits(int(ggml_type))
    fn = _TO_FLOAT(traits.to_float)
    out = np.empty(n, np.float32)
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    fn(ctypes.cast(buf, ctypes.c_void_p), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out


def ref_quantize(x, ggml_type: int, reference: bool = True) -> bytes:
    """Encode float32 array with the reference from_float(_reference)."""
    import numpy as np

    lib = get_oracle()
    traits = lib.ggml_internal_get_type_traits(int(ggml_type))
    ptr = (traits.from_float_reference if reference else None) or traits.from_float
    fn = _FROM_FLOAT(ptr)
    x = np.ascontiguousarray(x, np.float32)
    n = x.size
    nbytes = n // traits.blck_size * traits.type_size
    buf = ctypes.create_string_buffer(nbytes)
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.cast(buf, ctypes.c_void_p), n)
    return buf.raw
