#!/usr/bin/env python
"""Serve a model over HTTP with continuous batching.

Usage:
    python scripts/serve.py MODEL_PATH [--model-type T] [--port 8000]
        [--slots 8] [--tp N] [--kv-dtype int8]

POST /v1/completions
    {"prompt": "...", "max_tokens": 64,
     "stop": ["\\n"],        # optional stop strings
     "stream": true}          # optional SSE streaming
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
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (devices on the model axis)")
    ap.add_argument("--kv-dtype", default=None,
                    help="KV cache storage: f32 | bf16 | int8")
    args = ap.parse_args()

    from ctransformers_tpu import AutoModelForCausalLM
    from ctransformers_tpu.serving.server import make_server

    llm = AutoModelForCausalLM.from_pretrained(
        args.model, model_type=args.model_type, kv_dtype=args.kv_dtype
    )
    mesh = None
    if args.tp > 1:
        from ctransformers_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(args.tp, data=1)
    server = make_server(llm, args.host, args.port, batch_slots=args.slots,
                         mesh=mesh)
    print(f"serving on http://{server.server_address[0]}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.serving_loop.shutdown()


if __name__ == "__main__":
    main()
