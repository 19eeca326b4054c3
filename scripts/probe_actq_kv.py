"""Prove the residual low-bit TF-parity divergences are reference-engine
NUMERICS, not a codec/engine bug (VERDICT r04 #4).

Teacher-forced walks (same protocol as quality_gate.parity) for the
low-bit formats, comparing my engine to the reference's compiled binary
under three of my-engine configurations:

  plain          — exact-f32 dequant matmuls, f32 KV (the production path)
  actq           — CT_EMULATE_ACTQ=1: reference activation quantization
                   emulated (Q8_0/Q8_1/Q8_K rounding, ops/qmatmul.py)
  actq+f16kv     — additionally CT_KV_DTYPE=ieee_f16: the reference GGUF
                   engine's f16_kv KV-cache storage (llama.cpp:913-933)

If a divergence collapses under emulation it was the reference's rounding;
if it survives all three it is a real bug to chase.

Usage: python scripts/probe_actq_kv.py [--workdir /tmp/ct_quality]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from quality_gate import _tf_verdict  # noqa: E402

WALK_SRC = """
def walk(llm, toks, cont):
    import numpy as _np
    llm.eval(list(toks))
    steps = []
    for t in list(cont):
        lg = _np.asarray(llm.logits, dtype=float)
        steps.append((int(lg.argmax()), [round(float(v), 6) for v in lg]))
        llm.eval([int(t)])
    return steps
"""


def run_child(code, **extra_env):
    env = dict(os.environ, CT_NO_NATIVE="1", **extra_env)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT:")]
    return line[-1][8:] if line else (
        f"worker failed rc={r.returncode}: {r.stdout[-200:]} {r.stderr[-300:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ct_quality")
    ap.add_argument("--formats", default="q5_0,q3_k,q2_k")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    prompt = "def tokenize(self"
    esc = (" " + prompt).replace(" ", "▁").encode("utf-8")
    toks = [1] + [3 + b for b in esc]
    cont = [(7 * i + 3) % 45 + 3 for i in range(args.steps)]

    out = {}
    for kind in args.formats.split(","):
        path = os.path.join(
            args.workdir, f"code_llama_tiny.f16.{kind}.gguf"
        )
        if not os.path.exists(path):
            print(f"{kind}: missing {path} (run quality_gate first)")
            continue
        mine_code = f"""
import sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ctransformers_tpu import AutoModelForCausalLM
mine = AutoModelForCausalLM.from_pretrained({path!r}, model_type="gguf")
toks = {toks!r}
{WALK_SRC}
print("RESULT:", walk(mine, toks, {cont!r}), flush=True)
"""
        ref_code = f"""
import sys, os
sys.path.insert(0, "/root/reference")
from ctransformers import LLM as RefLLM
ref = RefLLM({path!r}, model_type="gguf",
             lib="/root/reference/ctransformers/lib/basic/libctransformers.so")
toks = {toks!r}
{WALK_SRC}
print("RESULT:", walk(ref, toks, {cont!r}), flush=True)
os._exit(0)
"""
        ref = run_child(ref_code)
        row = {}
        for name, env in (
            ("plain", {}),
            ("actq", {"CT_EMULATE_ACTQ": "1"}),
            ("actq+f16kv", {"CT_EMULATE_ACTQ": "1",
                            "CT_KV_DTYPE": "ieee_f16"}),
        ):
            mine = run_child(mine_code, **env)
            if mine.startswith("worker") or ref.startswith("worker"):
                row[name] = f"mine: {mine[:200]} | ref: {ref[:200]}"
            else:
                row[name] = _tf_verdict(mine, ref)
            print(kind, name, row[name], flush=True)
        out[kind] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
