"""Multi-host runtime: process bootstrap + multi-controller placement.

The reference is strictly single-process (its MPI pipeline hooks are
compiled out and have no implementation in tree — llama.cpp:2854-2928);
multi-host inference is a new subsystem here, built the JAX way:

  * every host runs the SAME program (multi-controller SPMD);
  * `initialize()` wires the processes into one runtime
    (jax.distributed), after which `jax.devices()` is the GLOBAL device
    list and meshes may span hosts;
  * global arrays are assembled from process-local shards with
    `jax.make_array_from_callback` — a full-array `jax.device_put` onto
    a sharding that includes non-addressable devices is invalid, which
    is why `put_sharded` below exists and is used by mesh.shard_params /
    shard_kv for every placement.

Pairing with parallel.mesh.make_pod_mesh keeps the tensor-parallel axis
host-local (collectives ride ICI) and the data axis across hosts (only
batch-level traffic crosses DCN).

Model loading: each process loads the same model file locally (the
GGUF/GGML loaders are deterministic), so every host holds the full host
value and `make_array_from_callback` can cut its local shards from it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join this process into a multi-host JAX runtime.

    On a real TPU pod slice all three arguments are auto-detected by the
    TPU runtime and may be omitted. Off-pod (CPU/GPU clusters, tests)
    they come from the arguments or the CT_COORDINATOR / CT_NUM_PROCESSES
    / CT_PROCESS_ID environment variables. Idempotent: a second call is
    a no-op once the runtime is up."""
    # NOTE: must not touch jax.devices()/process_count() here — any
    # backend-initializing call before jax.distributed.initialize is an
    # error, so idempotence is detected from the raised message instead.
    coordinator_address = coordinator_address or os.environ.get(
        "CT_COORDINATOR"
    )
    if num_processes is None and os.environ.get("CT_NUM_PROCESSES"):
        num_processes = int(os.environ["CT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CT_PROCESS_ID"):
        process_id = int(os.environ["CT_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_sharded(a, mesh: Mesh, spec: P):
    """Place a host (or single-device) value onto `mesh` under `spec`,
    valid in BOTH runtimes:

      * single controller: plain jax.device_put (fast path, async);
      * multi-controller: jax.make_array_from_callback — each process
        contributes only the shards its local devices own, cut from the
        full host value (which every process holds; see module doc).
    """
    sh = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(a, sh)
    host = np.asarray(a)
    return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_batch(global_batch: int) -> int:
    """Rows of a data-parallel batch owned by this process (batch is laid
    out host-major over the data axis by make_pod_mesh)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
