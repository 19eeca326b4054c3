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


def _place_group(leaves: List[Any], param_dtype) -> List[Any]:
    """Place one group of leaves (QTensors / arrays / passthrough) with a
    single H2D blob transfer. Returns placed leaves in order."""
    plan = []  # (kind, payload) per leaf; kind: "qt" | "arr" | "keep"
    host_parts: dict = {}  # itemsize -> list of word-view arrays
    sig: List[tuple] = []

    def add_array(a, cast: Optional[str]):
        a = np.asarray(a)
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

    if host_parts:
        blobs = {
            isz: jnp.asarray(
                parts[0] if len(parts) == 1 else np.concatenate(parts)
            )
            for isz, parts in host_parts.items()
        }
        arrays = list(_unpack_fn(tuple(sig))(blobs))
    else:
        arrays = []

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
