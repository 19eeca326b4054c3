"""Fast host->device parameter placement.

Per-array `jnp.asarray` placement pays one dispatch round-trip per array;
a 7B Q4_K tree is ~1,200 arrays (4 quantized projections x 5 planes x 32
layers plus norms), and each round-trip through a remote runtime costs
tens of milliseconds — measured 31-129 s for 4.5 GB, with the wire bytes
nearly free (scripts/profile_load.py). The reference avoids this class
of cost entirely by mmap-ing one file into one address space
(llama.cpp:470-798); the TPU-native analog is ONE transfer per layer:

  1. concatenate every leaf's raw bytes into a per-layer uint8 blob on
     the host (layers share one structure, so one signature repeats),
  2. `jnp.asarray` the blob (single H2D),
  3. split it back into leaves ON DEVICE with one jitted bitcast/reshape
     program per signature — compiled once, reused for every layer.

Floating non-quantized leaves are cast to `param_dtype` on device after
the bitcast (same contract as the per-array path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qmatmul import QTensor

_QT_FIELDS = ("qs", "scales", "mins", "sd", "sm")


def _leaf_arrays(tree) -> Tuple[List[Any], Any]:
    """Flatten `tree` into (leaves, treedef) with QTensor as a leaf."""
    return jax.tree.flatten(
        tree, is_leaf=lambda a: isinstance(a, QTensor)
    )


def _np_bytes(a) -> np.ndarray:
    a = np.ascontiguousarray(a)
    return a.view(np.uint8).reshape(-1)


_WORD = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


@functools.lru_cache(maxsize=128)
def _unpack_fn(sig: tuple):
    """jitted blobs -> tuple-of-arrays splitter for one layout signature:
    tuple of (shape, dtype_name, itemsize, cast_name|None).

    One blob PER ITEMSIZE (u8/u16/u32/u64), sliced in signature order and
    bitcast 1:1 (same-width elementwise). The earlier single-u8-blob form
    bitcast via `bytes.reshape(-1, itemsize)` — a (N, 4) minor-dim array
    that TPU tiling pads 4->128, i.e. a 32x HLO temp (15.1 GiB for a 7B's
    f32 embedding table) that OOMed the 16 GiB HBM once a >=2 GiB model
    was resident."""

    def unpack(blobs):
        outs = []
        offs = {isz: 0 for isz in blobs}
        for shape, dt, isz, cast in sig:
            n = int(np.prod(shape))
            sl = jax.lax.slice(blobs[isz], (offs[isz],), (offs[isz] + n,))
            offs[isz] += n
            a = jax.lax.bitcast_convert_type(sl, jnp.dtype(dt))
            a = a.reshape(shape)
            if cast is not None:
                a = a.astype(jnp.dtype(cast))
            outs.append(a)
        return tuple(outs)

    return jax.jit(unpack)


def _upload_chunked(a: np.ndarray):
    """H2D one 1-D word array as async-enqueued ~64 MB pieces. Measured
    through the remote runtime (2026-08-21): true single-transfer H2D is
    ~23-27 MB/s and async enqueue LIES about completion (block_until_ready
    returns early; only a value fetch syncs), while a pipeline of ~64 MB
    pieces reaches ~37 MB/s — the best of chunk sizes 16/64/256 MB and of
    2-4 forced parallel thread streams. Nothing here forces completion:
    consumers (device concat, first program execution) block on the
    transfers they need, so compile and host work overlap the wire."""
    import os

    chunk = int(os.environ.get("CT_BLOB_STREAM_CHUNK", str(64 << 20)))
    if a.nbytes <= chunk or jax.default_backend() == "cpu":
        return jnp.asarray(a)
    n = -(-a.nbytes // chunk)
    devs = [jnp.asarray(p) for p in np.array_split(a, n)]
    return jnp.concatenate(devs)


def _upload_blobs(host_blobs: dict) -> dict:
    return {isz: _upload_chunked(a) for isz, a in host_blobs.items()}


def _big_threshold() -> int:
    import os

    return int(os.environ.get("CT_BLOB_BIG", str(32 << 20)))


def _upload_big(jobs: List[tuple], param_dtype) -> List[Any]:
    """Upload big arrays directly (no blob concat / unpack program),
    each as an async-chunked pipeline (_upload_chunked — the measured
    wire physics). The optional dtype cast happens ON DEVICE after the
    transfer, so an f16 table ships half the bytes of its f32 serving
    form."""
    if not jobs:
        return []
    out = []
    for a, cast in jobs:
        # same-width word view -> 1:1 bitcast on device. NEVER bitcast
        # u8 minor-dim groups to wider types: a (N, itemsize) minor dim
        # pads to 128 on TPU (a 32x HLO temp — see _unpack_fn's note)
        flat = _np_bytes(a).view(_WORD[int(a.dtype.itemsize)])
        whole = _upload_chunked(flat)
        fn = _assemble_fn(a.dtype.name, tuple(a.shape), cast)
        out.append(fn(whole))
    return out


@functools.lru_cache(maxsize=128)
def _assemble_fn(dtype_name: str, shape: tuple, cast: Optional[str]):
    """jitted device-side reshape of an _upload_big array: 1:1 bitcast,
    reshape, optional cast. Cached so repeated layer shapes share one
    compiled program."""

    def fn(whole):
        a = jax.lax.bitcast_convert_type(whole, jnp.dtype(dtype_name))
        a = a.reshape(shape)
        if cast:
            a = a.astype(jnp.dtype(cast))
        return a

    return jax.jit(fn)


def _place_group(leaves: List[Any], param_dtype) -> List[Any]:
    """Place one group of leaves (QTensors / arrays / passthrough) with a
    single H2D blob transfer for SMALL arrays; arrays over CT_BLOB_BIG
    bytes skip the host concat + device unpack entirely and ride the
    parallel upload pool directly (the concat was a full extra host copy
    of multi-GB payloads for zero wire benefit). Returns placed leaves in
    order."""
    plan = []  # (kind, payload) per leaf; kind: "qt" | "arr" | "keep"
    host_parts: dict = {}  # itemsize -> list of word-view arrays
    sig: List[tuple] = []
    big_jobs: List[tuple] = []  # (slot_marker, array, cast)
    big = _big_threshold()

    def add_array(a, cast: Optional[str]):
        a = np.asarray(a)
        if a.nbytes >= big:
            sig.append(("big", len(big_jobs)))
            big_jobs.append((a, cast))
            return
        isz = int(a.dtype.itemsize)
        host_parts.setdefault(isz, []).append(
            _np_bytes(a).view(_WORD[isz])
        )
        sig.append((tuple(a.shape), a.dtype.name, isz, cast))

    for leaf in leaves:
        if isinstance(leaf, QTensor):
            fields = [
                f for f in _QT_FIELDS if getattr(leaf, f) is not None
            ]
            if any(
                isinstance(getattr(leaf, f), jax.Array) for f in fields
            ):
                plan.append(("keep", jax.tree.map(jnp.asarray, leaf)))
                continue
            for f in fields:
                add_array(getattr(leaf, f), None)
            plan.append(("qt", (leaf, fields)))
        elif isinstance(leaf, jax.Array):
            plan.append(("keep", leaf))
        elif hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            a = np.asarray(leaf)
            cast = None
            if np.issubdtype(a.dtype, np.floating):
                cast = jnp.dtype(param_dtype).name
                if cast == a.dtype.name:
                    cast = None
            add_array(a, cast)
            plan.append(("arr", None))
        else:
            plan.append(("keep", leaf))

    small_sig = tuple(e for e in sig if e[0] != "big")
    if host_parts:
        host_blobs = {
            isz: parts[0] if len(parts) == 1 else np.concatenate(parts)
            for isz, parts in host_parts.items()
        }
        blobs = _upload_blobs(host_blobs)
        small_arrays = iter(_unpack_fn(small_sig)(blobs))
    else:
        small_arrays = iter(())
    big_arrays = _upload_big(big_jobs, param_dtype)
    arrays = [
        big_arrays[e[1]] if e[0] == "big" else next(small_arrays)
        for e in sig
    ]

    out = []
    it = iter(arrays)
    for kind, payload in plan:
        if kind == "keep":
            out.append(payload)
        elif kind == "arr":
            out.append(next(it))
        else:
            qt, fields = payload
            out.append(
                dataclasses.replace(
                    qt, **{f: next(it) for f in fields}
                )
            )
    return out


_FUSE_GROUPS = (
    (("wq", "wk", "wv"), "w_qkv"),
    (("w_gate", "w_up"), "w_gateup"),
)


def place_stacked_fused(params, param_dtype=jnp.float32):
    """Fast path for homogeneous layer lists: assemble the FUSED +
    LAYER-STACKED planes in ONE host pass (block writes into
    preallocated arrays — the fuse-then-stack sequence was two full host
    copies, ~21 s each for a 2 GiB model on this VM) and start each
    plane's async-chunked upload the moment it is assembled, so the
    ~25-37 MB/s wire runs concurrently with the remaining host assembly.
    Returns the placed params tree, or None when the layers are not
    uniformly fusable/stackable (caller falls back to blob_place)."""
    import dataclasses

    from ..ops.qmatmul import QTensor, concat_qtensors

    layers = params.get("layers")
    if not isinstance(layers, (list, tuple)) or len(layers) < 2:
        return None
    keys = list(layers[0].keys())
    if any(list(l.keys()) != keys for l in layers[1:]):
        return None

    # output field plan: fuse-group name -> member keys, or plain key
    plan: List[Tuple[str, Tuple[str, ...]]] = []
    consumed: set = set()
    for members, fused_name in _FUSE_GROUPS:
        if all(m in keys for m in members) and all(
            isinstance(layers[0][m], QTensor) for m in members
        ):
            # template fuse on layer 0 decides compatibility + metadata
            if concat_qtensors([layers[0][m] for m in members]) is not None:
                plan.append((fused_name, members))
                consumed.update(members)
    for k in keys:
        if k not in consumed:
            plan.append((k, (k,)))

    L = len(layers)
    # single upload worker: the per-chunk jnp.asarray host copies (~10 s
    # for 2 GiB) run concurrently with the next plane's assembly writes
    # (both release the GIL)
    from concurrent.futures import ThreadPoolExecutor

    out_layers: dict = {}
    with ThreadPoolExecutor(1, thread_name_prefix="ct-upload") as pool:
        for out_name, members in plan:
            vals0 = [layers[0][m] for m in members]
            if isinstance(vals0[0], QTensor):
                qt = _assemble_stacked_qt(
                    [[l[m] for m in members] for l in layers], pool
                )
                if qt is None:
                    return None
                out_layers[out_name] = qt
            else:
                if len(members) != 1 or any(
                    not hasattr(l[members[0]], "shape") for l in layers
                ):
                    return None
                vals = [np.asarray(l[members[0]]) for l in layers]
                if any(
                    v.shape != vals[0].shape or v.dtype != vals[0].dtype
                    for v in vals
                ):
                    return None
                st = np.stack(vals)
                cast = None
                if np.issubdtype(st.dtype, np.floating):
                    cast = jnp.dtype(param_dtype).name
                    if cast == st.dtype.name:
                        cast = None
                d = _upload_chunked(
                    _np_bytes(st).view(_WORD[int(st.dtype.itemsize)])
                )
                out_layers[out_name] = _assemble_fn(
                    st.dtype.name, tuple(st.shape), cast
                )(d)

    rest = {k: v for k, v in params.items() if k != "layers"}
    leaves, treedef = _leaf_arrays(rest)
    out = jax.tree.unflatten(treedef, _place_group(leaves, param_dtype))
    out["layers"] = out_layers
    return out


def _upload_plane(buf: np.ndarray):
    d = _upload_chunked(_np_bytes(buf).view(_WORD[int(buf.dtype.itemsize)]))
    return _assemble_fn(buf.dtype.name, tuple(buf.shape), None)(d)


def _assemble_stacked_qt(rows_of_qts, pool=None):
    """rows_of_qts[l] = the layer-l QTensors to fuse (len >= 1). Builds
    the fused + stacked device QTensor with one host write pass per
    plane; each finished plane's upload is handed to `pool` so its
    chunk-enqueue host copies overlap the next plane's assembly."""
    import dataclasses

    from ..ops.qmatmul import QTensor, concat_qtensors

    tmpl = (
        rows_of_qts[0][0]
        if len(rows_of_qts[0]) == 1
        else concat_qtensors(rows_of_qts[0])
    )
    if tmpl is None or not isinstance(tmpl, QTensor):
        return None
    head = rows_of_qts[0][0]
    L = len(rows_of_qts)
    # structural homogeneity across layers and members
    for row in rows_of_qts:
        for q in row:
            if (
                not isinstance(q, QTensor)
                or not isinstance(q.qs, np.ndarray)
                or q.kind != head.kind
                or q.group != head.group
                or q.packed != head.packed
                or q.zp != head.zp
                or q.sfactor != head.sfactor
                or q.pack_layout != head.pack_layout
                or q.perm is not None
                or q.pspec is not None
                or q.n_stack != 1
            ):
                return None
        for q, q0 in zip(row, rows_of_qts[0]):
            if (
                q.qs.shape != q0.qs.shape
                or q.qs.dtype != q0.qs.dtype
                or q.shape != q0.shape
            ):
                return None

    pending = {}
    for name in ("qs", "scales", "mins", "sd", "sm"):
        parts0 = [getattr(q, name) for q in rows_of_qts[0]]
        if parts0[0] is None:
            pending[name] = None
            continue
        rows = parts0[0].shape[0]
        if name in ("sd", "sm") and rows % 8:
            rows_pad = rows + (8 - rows % 8)  # see stack_qtensors
        else:
            rows_pad = rows
        cols = sum(p.shape[1] for p in parts0)
        buf = np.empty((L * rows_pad, cols), parts0[0].dtype)
        if rows_pad != rows:  # zero the per-layer padding rows only
            for li in range(L):
                buf[li * rows_pad + rows : (li + 1) * rows_pad] = 0
        for li, row in enumerate(rows_of_qts):
            off = 0
            for q in row:
                p = getattr(q, name)
                buf[li * rows_pad : li * rows_pad + rows,
                    off : off + p.shape[1]] = p
                off += p.shape[1]
        pending[name] = (
            pool.submit(_upload_plane, buf) if pool is not None
            else _upload_plane(buf)
        )
    fields = {
        name: (v.result() if hasattr(v, "result") else v)
        for name, v in pending.items()
    }
    return dataclasses.replace(tmpl, n_stack=L, **fields)


def blob_place(params, param_dtype=jnp.float32):
    """Place a host parameter tree on device, one blob transfer per layer
    (plus one for everything else). Mirrors the per-array placement
    contract: QTensor planes keep their dtypes, floating dense leaves are
    cast to `param_dtype`, non-array leaves pass through."""
    if not isinstance(params, dict) or "layers" not in params:
        leaves, treedef = _leaf_arrays(params)
        return jax.tree.unflatten(treedef, _place_group(leaves, param_dtype))
    layers = params["layers"]
    rest = {k: v for k, v in params.items() if k != "layers"}
    if isinstance(layers, dict):
        # layer-stacked tree (engine._maybe_stack): the whole stack is a
        # handful of big arrays — one blob group places everything
        leaves, treedef = _leaf_arrays(layers)
        placed_layers = jax.tree.unflatten(
            treedef, _place_group(leaves, param_dtype)
        )
    else:
        placed_layers = []
        for layer in layers:
            leaves, treedef = _leaf_arrays(layer)
            placed_layers.append(
                jax.tree.unflatten(treedef, _place_group(leaves, param_dtype))
            )
    leaves, treedef = _leaf_arrays(rest)
    out = jax.tree.unflatten(treedef, _place_group(leaves, param_dtype))
    out["layers"] = placed_layers
    return out
