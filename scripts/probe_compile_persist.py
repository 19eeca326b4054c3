"""Re-test the JAX persistent compilation cache against the axon
remote-compile path (r02 note: enabling it hung; worth re-testing — if it
works now it collapses every cold prefill/decode compile to a disk read).

Protocol: tiny Pallas-containing program with the cache dir enabled,
compiled twice in subprocesses (second should hit disk). A cooperative
watchdog prints progress; the parent NEVER kills the child mid-claim —
it waits for the child's own exit (NOTES_NEXT_ROUND: timeout-killing a
claimed process wedges the tunnel 10-30 min).

Run strictly alone on the TPU, LAST in the session's queue.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time
sys.path.insert(0, "@REPO@")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import jax.numpy as jnp
from ctransformers_tpu.ops import qmatmul as qm

t0 = time.time()
rng = np.random.default_rng(0)
q = rng.integers(0, 16, (1024, 1024), dtype=np.int8)
s = (rng.random((32, 1024), np.float32) * 0.01).astype(np.float32)
qt = qm.make_qtensor(q, s, None, "Q4_0", 32, pack_layout="adjk")
x = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
f = jax.jit(lambda xx: qm._qmm_pallas(xx, qt, choice=(128, 512, 1, "q")))
np.asarray(f(x))
print(f"RESULT: compile+run {time.time()-t0:.1f}s", flush=True)
"""


def run_child(tag):
    t0 = time.time()
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD.replace("@REPO@", REPO)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # cooperative wait: poll, report, NEVER kill
    while p.poll() is None:
        time.sleep(10)
        print(f"  [{tag}] waiting {time.time()-t0:.0f}s...", flush=True)
        if time.time() - t0 > 900:
            print(f"  [{tag}] >900s — likely the r02 hang; leaving the "
                  "child to finish on its own, giving up on the probe",
                  flush=True)
            return None
    out = p.communicate()[0]
    line = [l for l in out.splitlines() if l.startswith("RESULT:")]
    print(f"[{tag}] rc={p.returncode} {line[-1] if line else out[-400:]}",
          flush=True)
    return p.returncode == 0


def main():
    os.makedirs("/tmp/ct_jax_cache", exist_ok=True)
    ok = run_child("cold")
    if ok:
        run_child("warm (disk-cache hit?)")
        print("cache dir contents:", os.listdir("/tmp/ct_jax_cache")[:8],
              flush=True)


if __name__ == "__main__":
    main()
