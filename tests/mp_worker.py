"""Worker for the 2-process multi-host integration test (test_multihost).

Run as: python mp_worker.py <process_id> <coordinator_port> <out_path>

Each process gets 4 virtual CPU devices (8 global over 2 processes),
joins the distributed runtime, builds the SAME tiny quantized llama from
a fixed seed (the every-host-loads-the-model contract), makes a pod mesh
with the TP axis process-local, and runs prefill + greedy decode through
the Engine. The generated tokens are written to <out_path> for the
parent test to compare across processes and against a single-process
reference run.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ctransformers_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import numpy as np

    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
    from ctransformers_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_pod_mesh(n_hosts=2)  # data=2 hosts, model=4 local
    # TP axis must be process-local (collectives ride ICI on real pods)
    for row, owner in zip(mesh.devices, range(2)):
        assert all(d.process_index == row[0].process_index for d in row)

    spec = LLAMA_TINY
    params = random_params(spec, seed=0, quantize="q4_0", exact=False)
    eng = Engine(spec, params, mesh=mesh)
    eng.eval([1, 5, 9])
    toks = eng.decode(4, temperature=0.0, repetition_penalty=1.0)
    print(f"proc {pid} engine tokens: {toks}", flush=True)

    # multi-host CONTINUOUS BATCHING (the SURVEY §7 hard part): the
    # scheduler runs the same multi-controller program on every host
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    params2 = random_params(spec, seed=0, quantize="q4_0", exact=False)
    sched = BatchScheduler(spec, params2, batch_slots=2, mesh=mesh)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=4, sampler="greedy"))
        for p in ([1, 5, 9], [1, 7, 2, 4])
    ]
    res = sched.run(device_chunk=2)
    sched_toks = [res[u] for u in uids]
    print(f"proc {pid} sched tokens: {sched_toks}", flush=True)

    with open(out_path, "w") as f:
        f.write(",".join(map(str, toks)) + "\n")
        f.write(";".join(",".join(map(str, t)) for t in sched_toks))


if __name__ == "__main__":
    main()
