"""On-disk cache of repacked model bundles — the TPU analog of mmap.

The reference serves a multi-GB file in seconds because `llama_mmap`
pages tensors straight from disk (llama.cpp:470-798, llama-util.h): its
in-memory layout IS the file layout. The TPU layout here (QTensor planes,
transposed dense weights) differs from the GGML block layout, so a first
load pays a full parse + repack (tens of seconds for a 7B). This cache
persists the finished bundle once, with every large array stored as its
own .npy sidecar; a later load of the same file is a metadata unpickle
plus LAZY mmap page-in (np.load(mmap_mode="r")) — seconds, not a
re-decode, and the page cache is shared across processes like the
reference's mmap.

Cache key: sha256(realpath, size, mtime_ns, context_length, VERSION).
Layout:   <cache_dir>/<key>/meta.pkl + a<N>.npy
Knobs:    CT_REPACK_CACHE=0 disables; =<dir> overrides the location.
          CT_REPACK_CACHE_MIN: minimum model-file bytes to cache
          (default 64 MiB — tiny test fixtures load instantly anyway).
"""

from __future__ import annotations

import hashlib
import io
import os
import pickle
import shutil
import tempfile
from typing import Optional

import numpy as np

# bump when the repack layout or bundle schema changes incompatibly
VERSION = 2  # v2: storage-precision (f16) embedding tables


def _cfg() -> Optional[str]:
    v = os.environ.get("CT_REPACK_CACHE", "")
    if v == "0":
        return None
    if v and v != "1":
        return v
    return os.path.expanduser("~/.cache/ctransformers_tpu/repack")


def _min_bytes() -> int:
    return int(os.environ.get("CT_REPACK_CACHE_MIN", str(64 << 20)))


def _key(model_path: str, context_length: int) -> Optional[str]:
    try:
        p = os.path.realpath(model_path)
        st = os.stat(p)
    except OSError:
        return None
    h = hashlib.sha256(
        f"{p}|{st.st_size}|{st.st_mtime_ns}|{context_length}|{VERSION}".encode()
    )
    return h.hexdigest()[:32]


# arrays at or above this many bytes go to .npy sidecars (mmap'd on load);
# smaller ones ride inline in the pickle
_EXTERN_BYTES = 1 << 20


class _Writer(pickle.Pickler):
    def __init__(self, f, outdir: str):
        super().__init__(f, protocol=5)
        self.outdir = outdir
        self.n = 0

    def persistent_id(self, obj):
        if isinstance(obj, np.ndarray) and obj.nbytes >= _EXTERN_BYTES:
            name = f"a{self.n}.npy"
            self.n += 1
            np.save(os.path.join(self.outdir, name), obj)
            return name
        return None


class _Reader(pickle.Unpickler):
    def __init__(self, f, indir: str):
        super().__init__(f)
        self.indir = indir

    def persistent_load(self, pid):
        # mmap: the array pages in lazily, shared across processes
        return np.load(os.path.join(self.indir, pid), mmap_mode="r")


def lookup(model_path: str, context_length: int = -1):
    """Return the cached ModelBundle for this file, or None."""
    base = _cfg()
    if base is None:
        return None
    key = _key(model_path, context_length)
    if key is None:
        return None
    d = os.path.join(base, key)
    meta = os.path.join(d, "meta.pkl")
    if not os.path.exists(meta):
        return None
    try:
        with open(meta, "rb") as f:
            bundle = _Reader(f, d).load()
    except Exception:
        # corrupt/partial entry: drop it and fall back to a real load
        shutil.rmtree(d, ignore_errors=True)
        return None
    _readahead_async(d)
    return bundle


def _readahead_async(d: str) -> None:
    """Touch the entry's sidecar files sequentially in a background
    thread: disk reads (~160 MB/s here) otherwise serialize with the
    much slower device wire as the uploader page-faults through the
    mmaps (measured +30 s on a 2 GiB model's warm start)."""
    import threading

    def run():
        buf = bytearray(1 << 20)
        try:
            for name in sorted(os.listdir(d)):
                if not name.endswith(".npy"):
                    continue
                with open(os.path.join(d, name), "rb", buffering=0) as f:
                    while f.readinto(buf):
                        pass
        except Exception:
            pass

    threading.Thread(
        target=run, daemon=True, name="ct-repack-readahead"
    ).start()


def store_async(model_path: str, context_length: int, bundle):
    """Fire-and-forget store: the 2 GiB-class sidecar write runs ~40 s on
    this disk (random data writes ~60 MB/s) and must not sit on the
    serve path — the bundle keeps the arrays alive for the writer thread.
    CT_REPACK_CACHE_SYNC=1 forces a synchronous write (tests)."""
    if _cfg() is None:
        return None
    if os.environ.get("CT_REPACK_CACHE_SYNC") == "1":
        store(model_path, context_length, bundle)
        return None
    import threading
    import time

    # delay before writing: the ~40 s sidecar write otherwise competes
    # for disk/memory bandwidth with the cold-start critical path
    # (engine assembly + device uploads + first prefill)
    delay = float(os.environ.get("CT_REPACK_CACHE_DELAY", "60"))

    stop = threading.Event()

    def run():
        # interruptible sleep: process exit flushes immediately
        stop.wait(delay)
        store(model_path, context_length, bundle)

    t = threading.Thread(
        target=run, daemon=True, name="ct-repack-cache-store",
    )
    t.start()
    _PENDING.append((t, stop))
    return t


_PENDING: list = []


def _flush_pending():  # pragma: no cover - exit path
    for t, stop in _PENDING:
        stop.set()  # skip any remaining delay
        t.join(timeout=300)


import atexit  # noqa: E402

atexit.register(_flush_pending)


def store(model_path: str, context_length: int, bundle) -> bool:
    """Persist a loaded bundle. Returns True when written."""
    base = _cfg()
    if base is None:
        return False
    try:
        if os.stat(model_path).st_size < _min_bytes():
            return False
    except OSError:
        return False
    key = _key(model_path, context_length)
    if key is None:
        return False
    final = os.path.join(base, key)
    if os.path.exists(os.path.join(final, "meta.pkl")):
        return False
    try:
        os.makedirs(base, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f".{key}-", dir=base)
        buf = io.BytesIO()
        w = _Writer(buf, tmp)
        w.dump(bundle)
        with open(os.path.join(tmp, "meta.pkl"), "wb") as f:
            f.write(buf.getvalue())
        try:
            os.rename(tmp, final)  # atomic publish
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
        return True
    except Exception:
        # unpicklable tokenizer, disk full, ... — cache is best-effort
        try:
            shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            pass
        return False
