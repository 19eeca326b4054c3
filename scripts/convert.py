#!/usr/bin/env python
"""Convert a pre-GGUF llama checkpoint (GGML/GGMF/GGJT) to GGUF.

Usage: python scripts/convert.py SRC.bin DST.gguf [--context-length 2048]
Weight bytes are copied verbatim (block formats are identical); metadata,
tensor names and the vocab are rewritten to the GGUF schema.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--context-length", type=int, default=2048)
    args = ap.parse_args()

    from ctransformers_tpu.tools.convert import ggjt_to_gguf

    info = ggjt_to_gguf(args.src, args.dst, args.context_length)
    print(f"wrote {args.dst}: {info['tensors']} tensors, vocab {info['vocab']}")


if __name__ == "__main__":
    main()
