"""Decompose single-stream decode time on real TPU hardware.

Scan-times (the only trustworthy timing through the remote tunnel — see
DESIGN.md "Measurement discipline") each distinct quantized weight shape
of the flagship llama-7B Q4_K model, plus the full fused decode loop, and
prints per-shape marginal latency and effective HBM bandwidth. Marginals
come from the difference of two scan lengths so per-dispatch and
per-scan-setup overheads cancel.

Usage (TPU attached, run strictly alone):
    python scripts/profile_qmm.py            # shapes + decode
    PROF_SHAPES_ONLY=1 python scripts/profile_qmm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, *args, reps=(16, 64), trials=5):
    """Marginal seconds per fn() call: scan-timed at two lengths, diffed,
    median over trials (tunnel dispatch latency varies by hundreds of us
    per call; the two-length diff cancels the mean but not the noise —
    the median of several diffs does)."""

    fns = {}

    def loop(length):
        if length not in fns:
            def run(*a, _n=length):
                def body(c, _):
                    o = fn(a[0] + c * 1e-30, *a[1:])
                    return jnp.asarray(o).ravel()[0].astype(jnp.float32), ()

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=_n)
                return c

            fns[length] = jax.jit(run)
            np.asarray(fns[length](*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fns[length](*args))
        return time.perf_counter() - t0

    loop(reps[0]), loop(reps[1])  # compile both before timing
    marginals = []
    for _ in range(trials):
        t_lo = loop(reps[0])
        t_hi = loop(reps[1])
        marginals.append((t_hi - t_lo) / (reps[1] - reps[0]))
    return float(np.median(marginals))


def qt_bytes(qt) -> int:
    b = qt.qs.size * qt.qs.dtype.itemsize
    b += qt.scales.size * qt.scales.dtype.itemsize
    if qt.mins is not None:
        b += qt.mins.size * qt.mins.dtype.itemsize
    if qt.sd is not None:
        b += qt.sd.size * qt.sd.dtype.itemsize
    if qt.sm is not None:
        b += qt.sm.size * qt.sm.dtype.itemsize
    return b


def main():
    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    kind = os.environ.get("BENCH_KIND", "q4_k")
    spec = LLAMA_7B.replace(n_ctx=1024)
    print(f"# building {kind} params...", file=sys.stderr)
    t0 = time.time()
    params = random_params(spec, seed=0, quantize=kind, exact=False)
    qm.fuse_layer_params(params)
    qm.autotune(params)  # disk cache makes this fast after the first run
    print(f"# built in {time.time()-t0:.0f}s", file=sys.stderr)

    layer = params["layers"][0]
    head = params["lm_head"]
    shapes = {}
    for name in ("w_qkv", "wo", "w_gateup", "w_down"):
        if name in layer:
            shapes[name] = layer[name]
    shapes["lm_head"] = head

    total_layer_us = 0.0
    for name, qt in shapes.items():
        if not isinstance(qt, qm.QTensor):
            print(f"{name}: dense, skipped")
            continue
        k, n = qt.shape
        x = jnp.zeros((1, k), jnp.float32)
        choice = qm._pick_tiles(jnp.zeros((8, qt.qs.shape[0] * (2 if qt.packed else 1)), jnp.float32), qt)
        dt = scan_time(lambda xx, qq: qm.qmatmul(xx, qq), x, qt)
        by = qt_bytes(qt)
        gbs = by / dt / 1e9
        us = dt * 1e6
        if name != "lm_head":
            total_layer_us += us
        print(
            f"{name:10s} K={k:6d} N={n:6d} {by/1e6:7.1f} MB "
            f"{us:8.1f} us  {gbs:6.0f} GB/s  choice={choice}"
        )

    n_layer = spec.n_layer
    mm_total_ms = total_layer_us * n_layer / 1e3
    print(f"\nmatmuls: {total_layer_us:.0f} us/layer x {n_layer} layers = "
          f"{mm_total_ms:.1f} ms/token (+ lm_head above)")

    if os.environ.get("PROF_EXPLORE"):
        # race extra tile candidates on the bandwidth-poor shapes: totals
        # at one scan length (like the autotuner) compare reliably
        def total(make, x, qt, length=48, trials=3):
            def run(xx, qq):
                def body(c, _):
                    o = make(xx + c * 1e-30, qq)
                    return jnp.asarray(o).ravel()[0].astype(jnp.float32), ()

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
                return c

            f = jax.jit(run)
            np.asarray(f(x, qt))
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                np.asarray(f(x, qt))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)) / length

        cands = [
            (2048, 1024, 8, ""),
            (1024, 1024, 4, ""),
            (512, 1024, 2, ""),
            (256, 1024, 1, ""),
            (1024, 512, 4, ""),
            (512, 512, 2, ""),
        ]
        for name in ("w_qkv", "w_gateup", "w_down", "lm_head"):
            qt = shapes[name]
            k, n = qt.shape
            x = jnp.zeros((1, k), jnp.float32)
            by = qt_bytes(qt)
            print(f"\n{name} exploration:")
            for tk, tn, inner, mode in cands:
                rows, npad = qt.qs.shape
                if rows % tk or npad % tn:
                    continue
                try:
                    dt = total(
                        lambda xx, qq, _t=(tk, tn, inner, mode): qm._qmm_pallas(
                            xx, qq, choice=_t
                        ),
                        x,
                        qt,
                    )
                except Exception as e:
                    print(f"  ({tk},{tn},{inner},{mode!r}): failed {type(e).__name__}")
                    continue
                print(
                    f"  ({tk},{tn},{inner},{mode!r}): {dt*1e6:8.1f} us "
                    f"{by/dt/1e9:6.0f} GB/s"
                )
        return

    if os.environ.get("PROF_SHAPES_ONLY"):
        return

    # full fused decode loop, marginal per token
    from ctransformers_tpu.engine.engine import Engine

    engine = Engine(spec, params, kv_dtype=jnp.bfloat16)
    prompt = [int(abs(hash(str(i))) % spec.n_vocab) for i in range(128)]
    engine.eval(prompt)
    engine.decode(128, temperature=0.0, repetition_penalty=1.0)  # compile
    engine.rewind(len(prompt))
    t0 = time.time()
    engine.decode(128, temperature=0.0, repetition_penalty=1.0)
    t128 = time.time() - t0
    engine.rewind(len(prompt))
    engine.decode(32, temperature=0.0, repetition_penalty=1.0)  # compile n=32
    engine.rewind(len(prompt))
    t0 = time.time()
    engine.decode(32, temperature=0.0, repetition_penalty=1.0)
    t32 = time.time() - t0
    marg = (t128 - t32) / 96
    print(f"decode: {t128/128*1e3:.2f} ms/tok @128, {t32/32*1e3:.2f} @32, "
          f"marginal {marg*1e3:.2f} ms/tok")
    print(f"decode minus matmuls ~= {marg*1e3 - mm_total_ms:.1f} ms/tok "
          f"(attention + norms + sampler + scan overhead)")


if __name__ == "__main__":
    main()
