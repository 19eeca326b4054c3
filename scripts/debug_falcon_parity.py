"""Bisect the falcon-GGCC teacher-forced divergence (PPL_r03: step 8,
my-side logit gap 1.5573 where the reference sees a 0.0427 near-tie).

Replays the EXACT quality-gate case (build_falcon_ggcc seed=4 Q4_0,
prompt [1,5,9,12,7], cont (7i+3)%59+3) at n_layer in {1, 2}, comparing
FULL logit vectors mine-vs-reference per teacher-forced step, plus
ablations that emulate reference-engine numerics on my side:

  - kv=f32 (my default)
  - kv=f16 (libfalcon stores the KV cache f16: falcon_model_load_internal
    memory_k/v F16, libfalcon.cpp:1301-1350 — rounds every cached K/V)
  - actq  (the reference's CPU Q4_0 matmul quantizes ACTIVATIONS to Q8_0
    blocks and does integer dots, ggml vec_dot_q4_0_q8_0 — my engine's
    exact-f32 dequant matmul skips that rounding)

Whichever ablation collapses the step-8 gap is the attributed root cause.
CPU-only (children pin jax_platforms=cpu); run only while no TPU job is
active (import dials the relay).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WALK_SRC = '''
def walk(llm, toks, cont):
    import numpy as _np
    llm.eval(list(toks))
    steps = []
    for t in list(cont):
        lg = _np.asarray(llm.logits, dtype=float)
        steps.append([float(v) for v in lg])
        llm.eval([int(t)])
    return steps
'''


def run_child(code: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("RESULT:")]
    if not lines:
        raise RuntimeError(
            f"worker rc={r.returncode}\n{r.stdout[-800:]}\n{r.stderr[-800:]}"
        )
    return lines[-1][8:]


def main():
    import numpy as np

    toks = [1, 5, 9, 12, 7]
    cont = [(7 * i + 3) % 59 + 3 for i in range(16)]

    for n_layer in (1, 2):
        path = f"/tmp/dbg_falcon_L{n_layer}.ggcc"
        build_code = f"""
import sys
sys.path.insert(0, {REPO!r})
sys.path.insert(0, {os.path.join(REPO, 'tests')!r})
import fixtures
fixtures.build_falcon_ggcc({path!r}, wtype=fixtures.GGMLType.Q4_0, seed=4,
                           n_layer={n_layer})
print("RESULT: ok")
"""
        run_child(build_code)

        ref_code = f"""
import sys, os
sys.path.insert(0, "/root/reference")
from ctransformers import LLM as RefLLM
ref = RefLLM({path!r}, model_type="falcon",
             lib="/root/reference/ctransformers/lib/basic/libctransformers.so")
toks = {toks!r}
{WALK_SRC}
print("RESULT:", walk(ref, toks, {cont!r}), flush=True)
os._exit(0)
"""
        ref_steps = np.array(eval(run_child(ref_code)))

        for mode in ("f32", "f16", "actq"):
            mine_code = f"""
import sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
if {mode!r} == "actq":
    os.environ["CT_EMULATE_ACTQ"] = "1"
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
if {mode!r} == "f16":
    # the reference stores its KV cache as IEEE f16 (libfalcon.cpp
    # memory_k/v F16); resolve_kv_dtype aliases 'f16' to bf16 (the TPU
    # half), so patch it to the exact reference dtype for this ablation
    import ctransformers_tpu.models.forward as _fwd
    _fwd.resolve_kv_dtype = lambda name=None: jnp.float16
from ctransformers_tpu import AutoModelForCausalLM
mine = AutoModelForCausalLM.from_pretrained({path!r}, model_type="falcon")
toks = {toks!r}
{WALK_SRC}
print("RESULT:", walk(mine, toks, {cont!r}), flush=True)
"""
            try:
                mine_steps = np.array(eval(run_child(mine_code)))
            except Exception as e:
                print(f"L{n_layer} {mode}: FAIL {str(e)[:300]}")
                continue
            diffs = np.abs(mine_steps - ref_steps).max(axis=1)
            scale = np.abs(ref_steps).max()
            am_m = mine_steps.argmax(axis=1)
            am_r = ref_steps.argmax(axis=1)
            agree = int((am_m == am_r).sum())
            print(
                f"L{n_layer} kv/num={mode}: argmax agree {agree}/16, "
                f"logit scale {scale:.2f}, per-step max|diff| "
                + " ".join(f"{d:.3f}" for d in diffs),
                flush=True,
            )
            for s in range(16):
                if am_m[s] != am_r[s]:
                    mg = mine_steps[s, am_m[s]] - mine_steps[s, am_r[s]]
                    rg = ref_steps[s, am_r[s]] - ref_steps[s, am_m[s]]
                    print(
                        f"  step {s}: mine argmax {am_m[s]} (+{mg:.4f}) "
                        f"vs ref {am_r[s]} (+{rg:.4f})",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
