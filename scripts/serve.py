#!/usr/bin/env python
"""Serve a model over HTTP with continuous batching.

Usage:
    python scripts/serve.py MODEL_PATH [--model-type T] [--port 8000]
        [--slots 8]

POST /v1/completions {"prompt": "...", "max_tokens": 64}
GET  /health
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--model-type", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()

    from ctransformers_tpu import AutoModelForCausalLM
    from ctransformers_tpu.serving.server import make_server

    llm = AutoModelForCausalLM.from_pretrained(
        args.model, model_type=args.model_type
    )
    server = make_server(llm, args.host, args.port, batch_slots=args.slots)
    print(f"serving on http://{server.server_address[0]}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.serving_loop.shutdown()


if __name__ == "__main__":
    main()
