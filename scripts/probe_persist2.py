"""Why does the 7B prefill program still compile ~160 s with a warm
persistent cache (probe_compile_persist: small programs hit at 1.0 s)?

Runs the engine's t=128 prefill step twice in THIS process being timed,
with jax cache-miss explanations + INFO logging on, so hit/miss and any
deserialization failure is visible. Run strictly alone on the TPU.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
for name in ("jax._src.compiler", "jax._src.compilation_cache",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax

jax.config.update("jax_explain_cache_misses", True)

import numpy as np


def main():
    from bench import _cached_params
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B

    spec = LLAMA_7B.replace(n_ctx=1024)
    params = _cached_params(spec, "q4_k")
    eng = Engine(spec, params)
    toks = [int(abs(hash(str(i))) % spec.n_vocab) for i in range(128)]
    t0 = time.time()
    eng.eval(toks)
    print(f"RESULT: prefill(128) first call {time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
