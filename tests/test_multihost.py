"""True multi-host path: 2 OS processes, jax.distributed, pod mesh.

The reference has no multi-host story (its MPI hooks are compiled out,
llama.cpp:2854-2928). Here two processes each own 4 virtual CPU devices
(8 global), join one runtime via parallel.distributed.initialize, build
the model from host values on BOTH processes, shard with
make_array_from_callback (parallel.distributed.put_sharded — a full-array
device_put is invalid with non-addressable devices), and run the Engine's
prefill + fused greedy decode over a make_pod_mesh(2) with the TP axis
process-local. Outputs must agree across processes AND with a
single-process run of the same model.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_engine_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    outs = [str(tmp_path / f"out{i}.txt") for i in range(2)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=540)[0].decode(errors="ignore") for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = [open(o).read() for o in outs]
    assert results[0] == results[1], results
    eng_line, sched_line = results[0].splitlines()
    got = [int(t) for t in eng_line.split(",")]
    got_sched = [
        [int(t) for t in part.split(",")] for part in sched_line.split(";")
    ]

    # single-process reference on the same synthetic model
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY
    params = random_params(spec, seed=0, quantize="q4_0", exact=False)
    eng = Engine(spec, params)
    eng.eval([1, 5, 9])
    want = eng.decode(4, temperature=0.0, repetition_penalty=1.0)
    assert got == want, (got, want)

    # multi-host continuous batching matches single-process scheduling
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    params2 = random_params(spec, seed=0, quantize="q4_0", exact=False)
    sched = BatchScheduler(spec, params2, batch_slots=2)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=4, sampler="greedy"))
        for p in ([1, 5, 9], [1, 7, 2, 4])
    ]
    res = sched.run(device_chunk=2)
    want_sched = [res[u] for u in uids]
    assert got_sched == want_sched, (got_sched, want_sched)
