"""Small shared utilities (behavior parity: reference ctransformers/utils.py)."""

from __future__ import annotations

from typing import Tuple


def is_gguf(path: str) -> bool:
    """4-byte magic sniff (reference utils.py:6-10)."""
    with open(path, "rb") as f:
        return f.read(4) == b"GGUF"


def utf8_split_incomplete(data: bytes) -> Tuple[bytes, bytes]:
    """Split a byte string into (complete, incomplete) UTF-8 parts.

    A trailing partial multi-byte sequence is held back so streaming text can
    be decoded incrementally (reference utils.py:46-56).
    """
    n = len(data)
    i = n
    # walk back over up to 3 continuation bytes
    while i > 0 and n - i < 4 and (data[i - 1] & 0xC0) == 0x80:
        i -= 1
    if i > 0:
        lead = data[i - 1]
        need = 0
        if lead >= 0xF0:
            need = 4
        elif lead >= 0xE0:
            need = 3
        elif lead >= 0xC0:
            need = 2
        if need and n - (i - 1) < need:
            return data[: i - 1], data[i - 1 :]
    return data, b""


class Vector:
    """Mutable list view over a float buffer (reference utils.py:13-43).

    The engine's logits are numpy-backed here, so this is a thin adapter
    kept for API compatibility: edits through the view affect sampling,
    exactly like the reference's zero-copy C-array view."""

    def __init__(self, array):
        self._array = array

    def __len__(self) -> int:
        return len(self._array)

    def __getitem__(self, i):
        return self._array[i]

    def __setitem__(self, i, value) -> None:
        self._array[i] = value

    def __iter__(self):
        return iter(self._array)

    def tolist(self):
        return list(self._array)


def system_info() -> str:
    """Capability string (reference: llama_print_system_info,
    llama.cpp:6227-6248 — SIMD flags there; device/backend facts here)."""
    import jax

    try:
        devices = jax.devices()
        parts = [
            f"backend = {jax.default_backend()}",
            f"devices = {len(devices)}",
            f"device_kind = {devices[0].device_kind}",
        ]
    except Exception as e:  # no backend available
        parts = [f"backend = unavailable ({e})"]
    from .formats import native

    parts.append(f"native_repack = {int(native.available())}")
    return " | ".join(parts)


class TextStreamer:
    """Incremental text assembly with stop-string semantics.

    Feeds per-token byte fragments, re-assembles UTF-8 safely, and
    enforces the streaming contract every text-producing surface shares
    (LLM._stream, the batch scheduler, the HTTP server):

      * output is truncated at the FIRST occurrence of any stop string
        (which may span token boundaries);
      * text whose suffix could still grow into a stop string is held
        back until it either completes one or provably cannot.

    Matches the reference's streaming behavior (llm.py:542-616), pinned
    by the 18-case tests/test_stop.py suite.
    """

    def __init__(self, stops=None):
        import re as _re

        self.stops = [s for s in (stops or []) if s]
        self._search = (
            _re.compile("|".join(map(_re.escape, self.stops))).search
            if self.stops
            else None
        )
        self._pending = b""  # trailing partial UTF-8 sequence
        self._held = ""  # text not yet safe to emit
        self.stopped = False

    def _holdback(self) -> int:
        """Length of the longest suffix of the held text that is a proper
        prefix of some stop string."""
        best = 0
        for s in self.stops:
            for n in range(min(len(s), len(self._held)), 0, -1):
                if self._held.endswith(s[:n]):
                    best = max(best, n)
                    break
        return best

    def feed(self, fragment: bytes) -> str:
        """Add one token's bytes; returns the text now safe to emit."""
        if self.stopped:
            return ""
        self._pending += fragment
        complete, self._pending = utf8_split_incomplete(self._pending)
        self._held += complete.decode(errors="ignore")
        if self._search is not None:
            m = self._search(self._held)
            if m:
                out = self._held[: m.start()]
                self._held = ""
                self.stopped = True
                return out
        keep = self._holdback()
        if keep >= len(self._held):
            return ""
        out = self._held[: len(self._held) - keep]
        self._held = self._held[len(self._held) - keep:]
        return out

    def flush(self) -> str:
        """Remaining held text at end-of-generation (no stop was hit)."""
        out, self._held = self._held, ""
        return out
