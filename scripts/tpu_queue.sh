#!/bin/bash
# Sequential TPU measurement queue — run in BACKGROUND with a generous
# self-timeout per stage; never timeout-kill mid-stage (NOTES: wedges the
# tunnel 10-30 min). Each stage gates on the previous one's success.
set -u
cd /root/repo
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue.log}
exec >>"$LOG" 2>&1

stage() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

stage "gate: tiny probe"
timeout 900 python - <<'EOF' || { echo "GATE FAILED - TPU still down"; exit 1; }
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("tiny dot", float(np.asarray(jnp.max(jnp.dot(x, x)))))
EOF

stage "health"
timeout 1200 python scripts/health.py || echo "health failed"

stage "probe_int4"
timeout 1800 python scripts/probe_int4.py || echo "probe_int4 failed"

stage "probe_attention (decides KV layout / kernel / int8 defaults)"
timeout 2400 python scripts/probe_attention.py || echo "probe_attention failed"

stage "bench single (ksplit baseline)"
CT_PACK4_LAYOUT=ksplit timeout 3600 python bench.py || echo "bench ksplit failed"

stage "bench single (layout auto: adjk when int4 lowers)"
timeout 3600 python bench.py || echo "bench auto failed"

stage "bench batch (layout auto)"
BENCH_MODE=batch timeout 3600 python bench.py || echo "bench batch failed"

stage "bench batch int8 KV"
BENCH_MODE=batch BENCH_KV=int8 timeout 3600 python bench.py || echo "bench batch int8 failed"

stage "bench single int8 KV"
BENCH_KV=int8 timeout 3600 python bench.py || echo "bench single int8 failed"

stage "bench batch head-major KV layout (A/B control)"
BENCH_MODE=batch CT_KV_LAYOUT=hm timeout 3600 python bench.py || echo "bench batch hm failed"

stage "bench single head-major KV layout (A/B control)"
CT_KV_LAYOUT=hm timeout 3600 python bench.py || echo "bench single hm failed"

stage "bench single pallas attention kernel"
CT_KV_LAYOUT=hm CT_ATTN_KERNEL=1 timeout 3600 python bench.py || echo "bench attnkernel failed"

stage "bench batch pallas attention kernel"
BENCH_MODE=batch CT_KV_LAYOUT=hm CT_ATTN_KERNEL=1 timeout 3600 python bench.py || echo "bench batch attnkernel failed"

stage "bench batch pallas attention kernel + int8 KV"
BENCH_MODE=batch CT_KV_LAYOUT=hm CT_ATTN_KERNEL=1 BENCH_KV=int8 timeout 3600 python bench.py || echo "bench batch attnkernel int8 failed"

stage "queue done"
