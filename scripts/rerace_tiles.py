"""Re-race decode/batch kernel tiles after a candidate-list change.

r04: probe_q6 (robust reps=4096 raw-scan protocol) showed wide-tn 'q'
tiles lift Q4_K 520 -> 658 GB/s on the (4096,11264) shape; the new
(tn=2048/4096) candidates must race on every production 7B shape at
m in {1, 8}. Drops the stale packed-adjk champions for those m from the
user tile cache, re-races with high signal-to-noise, persists, and
refreshes the shipped package cache (ctransformers_tpu/data/).

Run strictly alone on the TPU, in background, own timeout.
"""

import os
import pickle
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CT_QMM_RACE_REPS", "768")


def main():
    from ctransformers_tpu.ops import qmatmul as qm

    path = "/tmp/ct_bench_params_q4_k_v1.pkl"
    with open(path, "rb") as f:
        params = pickle.load(f)
    qm.fuse_layer_params(params)

    # the shipped package cache still holds the OLD champions; merging it
    # back would turn every re-race into a cache hit
    qm._shipped_loaded = True

    stale = [
        k for k in list(qm._TILE_CACHE)
        if k[4] in (1, 8) and k[5] and k[7] == "adjk"
    ]
    for k in stale:
        del qm._TILE_CACHE[k]
    print(f"dropped {len(stale)} stale adjk m=1/8 champions", flush=True)

    stats = qm.autotune(params, batch_sizes=(1, 8))
    print(f"autotune: {stats}", flush=True)
    for k, v in sorted(qm._TILE_CACHE.items()):
        if k[4] in (1, 8) and k[5] and k[7] == "adjk":
            print(f"  {k} -> {v}", flush=True)
    qm._save_disk_cache()

    shipped = os.path.join(
        os.path.dirname(os.path.abspath(qm.__file__)), "..", "data",
        "qmm_tiles_v5e.json",
    )
    shutil.copy(qm._TILE_CACHE_PATH, shipped)
    print(f"refreshed shipped cache {os.path.normpath(shipped)}", flush=True)


if __name__ == "__main__":
    main()
