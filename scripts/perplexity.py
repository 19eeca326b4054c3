#!/usr/bin/env python
"""Perplexity CLI: score a text file (e.g. WikiText-2) under a model.

Usage:
    python scripts/perplexity.py MODEL_PATH TEXT_FILE [--model-type T]
        [--window N] [--json]

Prints `ppl = X.XXXX` (or a JSON object with --json). This is the
quality-gate tool: run the same text through the reference engine at equal
bit-width and compare (BASELINE.md: delta-ppl <= 0.1).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("text")
    ap.add_argument("--model-type", default=None)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from ctransformers_tpu import AutoModelForCausalLM
    from ctransformers_tpu.eval.perplexity import perplexity

    llm = AutoModelForCausalLM.from_pretrained(
        args.model, model_type=args.model_type
    )
    text = Path(args.text).read_text()
    ppl = perplexity(llm, text, window=args.window)
    if args.json:
        print(json.dumps({"metric": "perplexity", "value": round(ppl, 4)}))
    else:
        print(f"ppl = {ppl:.4f}")


if __name__ == "__main__":
    main()
