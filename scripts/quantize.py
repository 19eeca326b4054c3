#!/usr/bin/env python
"""Re-quantize a model file (the reference's `llama_model_quantize`).

Usage:
    python scripts/quantize.py SRC DST TYPE [--model-type T]

TYPE is a GGML type name: q4_0 q4_1 q5_0 q5_1 q8_0 q2_k q3_k q4_k q5_k
q6_k f16 f32. --model-type is required for legacy (non-GGUF) files.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("type")
    ap.add_argument("--model-type", default="")
    args = ap.parse_args()

    from ctransformers_tpu.tools.quantize import quantize_file

    decisions = quantize_file(args.src, args.dst, args.type, args.model_type)
    for name, t in decisions.items():
        print(f"{t:>6}  {name}")
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
