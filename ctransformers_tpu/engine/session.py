"""GGSN session files — byte-compatible with the reference engine.

The reference persists inference state as "session files": magic GGSN +
version + raw llama_hparams + token history + the full serialized context
state (llama.cpp:5952-6032 for the file framing; llama_copy_state_data_
internal at 5741-5838 for the state layout; llama_set_state_data at
5846-5951 for the load-side asserts this writer must satisfy byte-for-
byte). Layout, all little-endian:

    u32  magic   = 0x6767736e ("ggsn", llama.h:40)
    u32  version = 1
    llama_hparams (52 bytes, no padding: 9 x u32 then 4 x f32 —
                   llama.cpp:846-864; compared with memcmp on load)
    u32  n_token_count
    i32  tokens[n_token_count]
    -- state (llama_copy_state_data_internal) --
    u64  rng_size;  u8 rng_buf[65536]   (libstdc++ std::mt19937 text
                                         serialization, zero-padded)
    u64  logits_cap;  u64 logits_size;  f32 logits[logits_cap]
         (cap MUST equal n_vocab: the loader asserts vector capacity,
          llama.cpp:5871 / reserve at 5434)
    u64  embedding_size;  f32 embedding[embedding_size]
         (n_embd when the writing context had params.embedding, else 0;
          must match the LOADING context's mode — capacity assert 5888)
    u64  kv_size = 2*n_embd_gqa*n_ctx*n_layer*esize + 2 MiB
         (the kv buffer size incl. the 2 MB ggml arena overhead,
          llama_kv_cache_init llama.cpp:1113; asserted on load at 5915)
    i32  kv_ntok
    f16  k[n_layer][kv_ntok][n_embd_gqa]   (kout3d, llama.cpp:5808)
    f16  v[n_layer][n_embd_gqa][kv_ntok]   (vout3d — V is stored
                                            feature-major, 5813)

The RNG blob interops for real, not just syntactically: the reference's
std::mt19937 and numpy's RandomState are the same MT19937 generator, and
libstdc++ serializes the engine as 624 space-separated state words plus
the stream position — exactly the tuple RandomState exposes.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

GGSN_MAGIC = 0x6767736E  # llama.h:40 ('ggsn'; file starts with b"nsgg")
GGSN_VERSION = 1
MAX_RNG_STATE = 64 * 1024  # llama.cpp:5648
_ARENA_OVERHEAD = 2 * 1024 * 1024  # kv buf 2*MB slack, llama.cpp:1113
_HPARAMS_FMT = "<9I4f"
_MAGIC_BYTES = struct.pack("<I", GGSN_MAGIC)


def is_ggsn(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(4) == _MAGIC_BYTES
    except OSError:
        return False


# -- std::mt19937 <-> numpy RandomState ------------------------------------


def rng_to_text(rng: np.random.RandomState) -> bytes:
    """Serialize MT19937 state the way libstdc++ streams std::mt19937:
    624 state words then the position, space-separated."""
    kind, key, pos, _, _ = rng.get_state()
    assert kind == "MT19937"
    return (" ".join(str(int(x)) for x in key) + " " + str(int(pos))).encode()


def rng_from_text(data: bytes) -> Optional[np.random.RandomState]:
    """Parse a libstdc++ mt19937 text state; None if not parseable."""
    try:
        parts = data.split()
        if len(parts) != 625:
            return None
        key = np.array([int(p) for p in parts[:624]], np.uint32)
        pos = int(parts[624])
        if not 0 <= pos <= 624:
            return None
        rng = np.random.RandomState()
        rng.set_state(("MT19937", key, pos, 0, 0.0))
        return rng
    except (ValueError, OverflowError):
        return None


# -- hparams ---------------------------------------------------------------


def pack_hparams(spec) -> bytes:
    """Raw llama_hparams bytes for an ArchSpec (llama.cpp:846-864).

    Field rules mirror llm_load_hparams: n_rot = head_dim (1599), the
    llama arch fills f_norm_rms_eps leaving f_norm_eps at its 1e-5
    default (1622-1626), rope_freq_scale stores 1/scale_linear (1592)."""
    rms = spec.norm == "rmsnorm"
    n_ctx_train = getattr(spec, "n_ctx_train", 0) or spec.n_ctx
    return struct.pack(
        _HPARAMS_FMT,
        spec.n_vocab,
        n_ctx_train,
        spec.n_ctx,
        spec.n_embd,
        spec.n_head,
        spec.kv_heads,
        spec.n_layer,
        spec.n_rot or spec.head_dim,
        spec.ff_dim,
        1e-5 if rms else spec.norm_eps,  # f_norm_eps
        spec.norm_eps if rms else 1e-5,  # f_norm_rms_eps
        spec.rope_base,
        spec.rope_scale,
    )


def unpack_hparams(data: bytes) -> dict:
    v = struct.unpack(_HPARAMS_FMT, data)
    names = (
        "n_vocab", "n_ctx_train", "n_ctx", "n_embd", "n_head",
        "n_head_kv", "n_layer", "n_rot", "n_ff",
        "f_norm_eps", "f_norm_rms_eps", "rope_freq_base", "rope_freq_scale",
    )
    return dict(zip(names, v))


# -- write -----------------------------------------------------------------


def save_ggsn(
    path: str,
    spec,
    tokens,
    *,
    n_past: int,
    kv_k: np.ndarray,  # (L, n_past, Hkv, dh) f32, roped K as cached
    kv_v: np.ndarray,  # (L, n_past, Hkv, dh) f32
    logits: Optional[np.ndarray] = None,  # (n_vocab,) f32
    embedding: Optional[np.ndarray] = None,  # (n_embd,) f32
    rng: Optional[np.random.RandomState] = None,
) -> None:
    l, n, hkv, dh = kv_k.shape
    if n != n_past:
        raise ValueError(f"kv rows {n} != n_past {n_past}")
    if l != spec.n_layer or hkv * dh * (spec.n_head // spec.kv_heads) != spec.n_embd:
        raise ValueError("kv shape does not match spec")
    n_embd_gqa = hkv * dh
    with open(path, "wb") as f:
        f.write(struct.pack("<II", GGSN_MAGIC, GGSN_VERSION))
        f.write(pack_hparams(spec))
        toks = np.asarray(list(tokens), "<i4")
        f.write(struct.pack("<I", toks.size))
        f.write(toks.tobytes())
        # rng
        text = rng_to_text(rng if rng is not None else np.random.RandomState(0))
        text = text[:MAX_RNG_STATE]
        f.write(struct.pack("<Q", len(text)))
        f.write(text.ljust(MAX_RNG_STATE, b"\0"))
        # logits (cap must be exactly n_vocab; zero-pad the size->cap gap)
        cap = spec.n_vocab
        if logits is None:
            f.write(struct.pack("<QQ", cap, 0))
            f.write(b"\0" * (cap * 4))
        else:
            lg = np.asarray(logits, "<f4").reshape(-1)
            if lg.size != cap:
                raise ValueError(f"logits size {lg.size} != n_vocab {cap}")
            f.write(struct.pack("<QQ", cap, cap))
            f.write(lg.tobytes())
        # embedding
        if embedding is None:
            f.write(struct.pack("<Q", 0))
        else:
            em = np.asarray(embedding, "<f4").reshape(-1)
            f.write(struct.pack("<Q", em.size))
            f.write(em.tobytes())
        # kv cache (f16, K token-major / V feature-major)
        kv_size = 2 * n_embd_gqa * spec.n_ctx * spec.n_layer * 2 + _ARENA_OVERHEAD
        f.write(struct.pack("<Qi", kv_size, n_past))
        k16 = np.ascontiguousarray(kv_k.reshape(l, n, n_embd_gqa)).astype("<f2")
        f.write(k16.tobytes())
        v16 = np.ascontiguousarray(
            kv_v.reshape(l, n, n_embd_gqa).transpose(0, 2, 1)
        ).astype("<f2")
        f.write(v16.tobytes())


# -- read ------------------------------------------------------------------


def load_ggsn(path: str) -> dict:
    """Parse a GGSN session file (ours or one written by the reference).

    Returns hparams, tokens, rng (RandomState or None), logits, embedding,
    n_past, and kv_k/kv_v as (L, n_past, n_embd_gqa) f32 token-major."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def take(n):
        nonlocal off
        out = data[off : off + n]
        if len(out) != n:
            raise ValueError("truncated GGSN session file")
        off += n
        return out

    magic, version = struct.unpack("<II", take(8))
    if magic != GGSN_MAGIC:
        raise ValueError(f"not a GGSN session file (magic {magic:#x})")
    if version != GGSN_VERSION:
        raise ValueError(f"unsupported GGSN version {version}")
    hp = unpack_hparams(take(struct.calcsize(_HPARAMS_FMT)))
    (n_tok,) = struct.unpack("<I", take(4))
    tokens = np.frombuffer(take(4 * n_tok), "<i4").tolist()
    (rng_size,) = struct.unpack("<Q", take(8))
    rng_buf = take(MAX_RNG_STATE)
    rng = rng_from_text(rng_buf[:rng_size]) if rng_size else None
    cap, size = struct.unpack("<QQ", take(16))
    lbuf = take(4 * cap)
    logits = np.frombuffer(lbuf[: 4 * size], "<f4").copy() if size else None
    (emb_size,) = struct.unpack("<Q", take(8))
    embedding = (
        np.frombuffer(take(4 * emb_size), "<f4").copy() if emb_size else None
    )
    kv_size, kv_ntok = struct.unpack("<Qi", take(12))
    n_embd_gqa = hp["n_embd"] // (hp["n_head"] // hp["n_head_kv"])
    n_elements = n_embd_gqa * hp["n_ctx"] * hp["n_layer"]
    kv_k = kv_v = None
    if kv_size and kv_ntok:
        esize = (kv_size - _ARENA_OVERHEAD) // (2 * n_elements)
        dt = {2: "<f2", 4: "<f4"}.get(esize)
        if dt is None:
            raise ValueError(f"unrecognized kv element size {esize}")
        nb = hp["n_layer"] * kv_ntok * n_embd_gqa * esize
        kv_k = (
            np.frombuffer(take(nb), dt)
            .reshape(hp["n_layer"], kv_ntok, n_embd_gqa)
            .astype(np.float32)
        )
        kv_v = (
            np.frombuffer(take(nb), dt)
            .reshape(hp["n_layer"], n_embd_gqa, kv_ntok)
            .transpose(0, 2, 1)
            .astype(np.float32)
        )
    return {
        "hparams": hp,
        "tokens": tokens,
        "rng": rng,
        "logits": logits,
        "embedding": embedding,
        "n_past": kv_ntok,
        "kv_k": kv_k,
        "kv_v": kv_v,
    }
