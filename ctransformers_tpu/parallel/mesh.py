"""Device mesh + sharding rules (tensor/data parallelism over ICI).

TPU-native replacement for the reference's multi-GPU row-split tensor
parallelism (ggml-cuda.cu:5067-5121, g_tensor_split VRAM-proportional row
partition, up to 16 devices). Instead of manually splitting rows and syncing
with CUDA events, weights and the KV cache are annotated with
`jax.sharding.NamedSharding` over a ("data", "model") mesh and XLA inserts
the collectives (all-gather / reduce-scatter riding ICI).

Sharding layout (1D tensor parallel over "model", batch over "data"):

  wq/wk/wv, w_up, w_gate, their biases   -> columns (output features) sharded
  wo, w_down                             -> rows (input features) sharded;
                                            XLA emits a psum after the matmul
  wte, wpe, norms                        -> replicated
  lm_head                                -> vocab dim sharded
  KV cache (L, B, n_ctx, Hkv, dh)        -> B on "data", Hkv on "model"

This mirrors the Megatron column/row-parallel pairing: attention and MLP each
need exactly one all-reduce per block, which XLA emits automatically from the
shardings — no NCCL-style code exists in this framework.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.spec import ArchSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    data: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    `data` fixes the data-parallel degree; the model axis gets the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % data != 0:
        raise ValueError(f"{n} devices not divisible by data={data}")
    arr = np.asarray(devices).reshape(data, n // data)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_pod_mesh(
    n_hosts: int,
    devices_per_host: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Multi-host ("data", "model") mesh for a pod slice: the model
    (tensor-parallel) axis stays WITHIN each host's devices so its
    per-matmul collectives ride ICI, and the data axis spans hosts so
    only batch-level traffic crosses DCN — the layout the scaling-book
    recipe prescribes (and the reference, single-process, never needed:
    SURVEY.md §2.3).

    Under a real multi-host runtime jax.devices() already enumerates
    devices host-major (process 0's first), so reshaping (n_hosts,
    per_host) keeps TP groups host-local; the same holds for the
    virtual CPU mesh used in tests."""
    if devices is None:
        devices = jax.devices()
    if devices_per_host is None:
        if len(devices) % n_hosts:
            raise ValueError(
                f"{len(devices)} devices not divisible by {n_hosts} hosts"
            )
        devices_per_host = len(devices) // n_hosts
    need = n_hosts * devices_per_host
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_hosts, devices_per_host)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# -- sharding rules -----------------------------------------------------------

# weight name -> PartitionSpec for the (in, out) weight layout of
# models/forward.py. Names not listed are replicated.
_COL_SHARDED = {"wq", "wk", "wv", "w_up", "w_gate", "w_qkv", "w_gateup"}  # shard output features
_ROW_SHARDED = {"wo", "w_down"}  # shard input features
_COL_BIAS = {"bq", "bk", "bv", "b_up"}


def param_pspec(path: Tuple, leaf) -> P:
    """PartitionSpec for one leaf of the params pytree (by its dict key)."""
    key = None
    for p in reversed(path):
        # skip QTensor FlattenedIndexKey entries: the dict key of the
        # enclosing weight decides the spec, and qs/scales/mins planes all
        # shard identically (their dims are proportional)
        if hasattr(p, "key") and isinstance(getattr(p, "key"), str):
            key = p.key
            break
    ndim = getattr(leaf, "ndim", np.ndim(leaf))
    if key in _COL_SHARDED and ndim == 2:
        return P(None, MODEL_AXIS)
    if key in _ROW_SHARDED and ndim == 2:
        return P(MODEL_AXIS, None)
    if key in _COL_BIAS and ndim == 1:
        return P(MODEL_AXIS)
    if key == "lm_head" and ndim == 2:
        return P(None, MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """Move a params pytree onto the mesh with TP shardings applied.

    QTensors are handled whole: all their planes (qs/scales/mins/sd/sm)
    shard along the same logical weight axis (their dims are
    proportional), and the tensor is TAGGED with pspec="col"/"row" so the
    engine's tp_ctx can route its matmul through the shard_map'd Pallas
    kernel (ops/qmatmul.py:_qmm_shard_map)."""
    from ..ops import qmatmul as qm

    tp = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        if isinstance(leaf, qm.QTensor):
            return _shard_qtensor(leaf, mesh, tp, param_pspec(path, leaf))
        spec = param_pspec(path, leaf)
        # don't shard axes that do not divide evenly (e.g. MQA single kv head)
        shape = np.shape(leaf)
        axis_ok = True
        for dim, name in zip(shape, spec):
            if name is not None and dim % mesh.shape[name] != 0:
                axis_ok = False
        if not axis_ok:
            spec = P()
        from .distributed import put_sharded

        return put_sharded(leaf, mesh, spec)

    return jax.tree_util.tree_map_with_path(
        place, params, is_leaf=lambda a: isinstance(a, qm.QTensor)
    )


def _shard_qtensor(qt, mesh: Mesh, tp: int, spec: P):
    """Shard one QTensor's planes along the weight axis `spec` implies."""
    import dataclasses

    from ..ops import qmatmul as qm

    kind = None
    if len(spec) == 2 and spec[1] == MODEL_AXIS:
        kind = "col"
    elif len(spec) == 2 and spec[0] == MODEL_AXIS:
        kind = "row"
    rows, npad = qt.qs.shape
    kp = rows * 2 if qt.packed else rows
    if kind == "col" and npad % tp:
        kind = None
    if kind == "row":
        if rows % tp or (kp // qt.group) % tp:
            kind = None
        elif qt.sfactor and (kp // tp) % (qt.group * qt.sfactor):
            # shard boundaries would straddle superblocks: materialize
            # the f32 scale planes (costs the factoring's ~21% stream
            # saving on this tensor, keeps the shard layout clean)
            s, m = qm.scale_planes(qt)
            qt = dataclasses.replace(
                qt, scales=s, mins=m, sd=None, sm=None, sfactor=0
            )

    def put(a, sp):
        if a is None:
            return None
        from .distributed import put_sharded

        return put_sharded(a, mesh, sp)

    if kind is None:
        rep = P()
        return dataclasses.replace(
            qt,
            qs=put(qt.qs, rep),
            scales=put(qt.scales, rep),
            mins=put(qt.mins, rep),
            perm=put(qt.perm, rep),
            sd=put(qt.sd, rep),
            sm=put(qt.sm, rep),
            pspec=None,
        )
    arr = P(None, MODEL_AXIS) if kind == "col" else P(MODEL_AXIS, None)
    return dataclasses.replace(
        qt,
        qs=put(qt.qs, arr),
        scales=put(qt.scales, arr),
        mins=put(qt.mins, arr),
        perm=put(qt.perm, P()),
        sd=put(qt.sd, arr),
        sm=put(qt.sm, arr),
        pspec=kind,
    )


def kv_pspec(spec: ArchSpec, mesh: Mesh, batch: int = 0) -> P:
    """KV cache: batch on data, kv heads on model — each only when it
    divides evenly. Axis order follows the storage layout (kv_head_major):
    (L, B, Hkv, S, dh) head-major or (L, B, S, Hkv, dh) sequence-major."""
    from ..models.forward import kv_head_major

    data = DATA_AXIS if batch and batch % mesh.shape[DATA_AXIS] == 0 else None
    model = (
        MODEL_AXIS if spec.kv_heads % mesh.shape[MODEL_AXIS] == 0 else None
    )
    if kv_head_major():
        return P(None, data, model, None, None)
    return P(None, data, None, model, None)


def shard_kv(kv, spec: ArchSpec, mesh: Mesh):
    batch = int(jax.tree_util.tree_leaves(kv)[0].shape[1])
    full = kv_pspec(spec, mesh, batch)
    scales = P(*full[:4])  # int8-cache scale planes drop the dh axis

    from .distributed import put_sharded

    def put(a):
        return put_sharded(a, mesh, full if a.ndim == 5 else scales)

    return jax.tree.map(put, kv)


def token_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None))
