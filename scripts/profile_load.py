"""Attribute the 7B engine cold-start place+fuse cost (r03: 128.8 s).

Engine.__init__ places every host tensor with jnp.asarray (one async
H2D per array through the tunnel) then fuses QKV / gate+up QTensors
with on-device jnp.concatenate. Candidate costs:
  a. transfer volume/rate: bytes moved, arrays moved, effective GB/s
  b. per-array dispatch overhead (hundreds of small plane tensors)
  c. on-device concat of just-transferred tensors (realloc + copy)

Measures, on the real device:
  1. per-array H2D of the unfused 7B param tree (production `place`)
  2. host-side numpy fuse FIRST, then H2D of the fused tree (fewer,
     larger arrays; concat on CPU)
Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_stats(tree):
    import jax

    from ctransformers_tpu.ops.qmatmul import QTensor

    arrs = []

    def rec(a):
        if isinstance(a, QTensor):
            for f in (a.qs, a.scales, a.mins, a.sd, a.sm):
                if f is not None:
                    arrs.append(f)
        elif hasattr(a, "nbytes"):
            arrs.append(a)

    jax.tree.map(rec, tree, is_leaf=lambda a: isinstance(a, QTensor))
    return len(arrs), sum(int(np.asarray(a).nbytes) for a in arrs)


def main():
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    spec = LLAMA_7B.replace(n_ctx=1024)
    t0 = time.time()
    params = random_params(spec, seed=0, quantize="q4_k", exact=False)
    print(f"build {time.time()-t0:.1f}s", flush=True)
    n, nb = tree_stats(params)
    print(f"param tree: {n} arrays, {nb/1e9:.2f} GB", flush=True)

    # 1. production order: place per array, then fuse on device
    t0 = time.time()
    placed = jax.tree.map(
        lambda a: jax.tree.map(jnp.asarray, a)
        if isinstance(a, qm.QTensor)
        else jnp.asarray(a),
        params,
        is_leaf=lambda a: isinstance(a, qm.QTensor),
    )
    jax.block_until_ready(
        [l["wq"].qs for l in placed["layers"][:1]]
    )
    # force full sync: materialize one byte of every leaf is too slow;
    # block on the whole tree
    jax.tree.map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready") else a,
        placed,
        is_leaf=lambda a: hasattr(a, "block_until_ready"),
    )
    t_place = time.time() - t0
    print(f"1a. per-array H2D: {t_place:.1f}s ({nb/t_place/1e9:.2f} GB/s)",
          flush=True)
    t0 = time.time()
    qm.fuse_layer_params(placed)
    jax.tree.map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready") else a,
        placed,
        is_leaf=lambda a: hasattr(a, "block_until_ready"),
    )
    print(f"1b. on-device fuse: {time.time()-t0:.1f}s", flush=True)
    del placed

    # 2. host fuse first (numpy concat via the same code path on np arrays)
    params2 = random_params(spec, seed=0, quantize="q4_k", exact=False)
    t0 = time.time()
    # concat_qtensors uses jnp.concatenate, which would bounce host arrays
    # through the device; patch to numpy for a true host-side fuse
    real_jnp = qm.jnp
    qm.jnp = np
    try:
        qm.fuse_layer_params(params2)
    finally:
        qm.jnp = real_jnp
    t_fuse = time.time() - t0
    n2, nb2 = tree_stats(params2)
    t0 = time.time()
    placed2 = jax.tree.map(
        lambda a: jax.tree.map(jnp.asarray, a)
        if isinstance(a, qm.QTensor)
        else jnp.asarray(a),
        params2,
        is_leaf=lambda a: isinstance(a, qm.QTensor),
    )
    jax.tree.map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready") else a,
        placed2,
        is_leaf=lambda a: hasattr(a, "block_until_ready"),
    )
    t_place2 = time.time() - t0
    print(
        f"2. host-fuse ({t_fuse:.1f}s) then H2D of {n2} arrays "
        f"{nb2/1e9:.2f} GB: {t_place2:.1f}s ({nb2/t_place2/1e9:.2f} GB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
