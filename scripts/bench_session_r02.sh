#!/bin/bash
# Round-2 bench session: full re-autotune on a HEALTHY device, then the
# headline single-stream + batch benches. Round 1's headline ran with a
# cold/degraded-device autotune (VERDICT weak #4); this isolates a fresh
# tile cache so every (shape, m) race re-runs under healthy conditions,
# and records both benches. Run alone on the TPU (NOTES_NEXT_ROUND.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_session_r02.log}
FRESH=/tmp/qmm_tiles_r02.json
exec >>"$LOG" 2>&1

stage() { echo; echo "=== $(date +%H:%M:%S) $1 ==="; }

stage "health"
python scripts/health.py || true

stage "bench single, fresh autotune (healthy)"
CT_QMM_TILE_CACHE=$FRESH timeout 3600 python bench.py || echo "single failed"

stage "bench single, fresh cache warm rerun"
CT_QMM_TILE_CACHE=$FRESH timeout 1800 python bench.py || echo "single2 failed"

stage "bench batch int8-KV default, fresh cache"
CT_QMM_TILE_CACHE=$FRESH BENCH_MODE=batch timeout 3600 python bench.py \
  || echo "batch failed"

stage "bench batch bf16 KV (A/B control)"
CT_QMM_TILE_CACHE=$FRESH BENCH_MODE=batch BENCH_KV=bf16 timeout 1800 \
  python bench.py || echo "batch bf16 failed"

stage "health (post)"
python scripts/health.py || true

stage "done"
