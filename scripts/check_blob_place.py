"""Validate + time the blob placement path on hardware.

Builds a 4-layer llama-width model, places it through the per-array path
(CT_BLOB_PLACE=0) and the per-layer blob path, checks decode logits
match, and reports both placement times. Then times blob placement of
the full 7B tree (the bench's place_fuse cost).

Run strictly alone on the TPU (NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params

    spec = LLAMA_7B.replace(n_layer=4, n_ctx=256)
    params = random_params(spec, seed=0, quantize="q4_k", exact=False)

    os.environ["CT_BLOB_PLACE"] = "0"
    t0 = time.time()
    e0 = Engine(spec, params)
    t_arr = time.time() - t0
    e0.eval([3, 1, 4, 1, 5])
    l0 = np.asarray(e0.logits)

    os.environ["CT_BLOB_PLACE"] = "1"
    t0 = time.time()
    e1 = Engine(spec, params)
    t_blob = time.time() - t0
    e1.eval([3, 1, 4, 1, 5])
    l1 = np.asarray(e1.logits)

    rel = np.abs(l1 - l0).max() / (np.abs(l0).max() + 1e-9)
    print(
        f"4L: per-array {t_arr:.1f}s vs blob {t_blob:.1f}s; "
        f"logits max rel diff {rel:.2e} "
        f"({'OK' if rel < 1e-5 else 'MISMATCH'})",
        flush=True,
    )

    # full 7B blob placement cost (pure place, no autotune interference:
    # tile cache is warm on this machine)
    spec7 = LLAMA_7B.replace(n_ctx=1024)
    t0 = time.time()
    params7 = random_params(spec7, seed=0, quantize="q4_k", exact=False)
    print(f"7B build {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    e7 = Engine(spec7, params7)
    print(
        f"7B engine: place_fuse {e7.init_timings['place_fuse_s']}s "
        f"(total {time.time()-t0:.1f}s incl. autotune "
        f"{e7.init_timings['autotune_s']}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
