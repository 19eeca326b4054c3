"""Headline benchmark: Llama-2-7B-shape Q4_K single-chip decode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Model: exact Llama-2-7B architecture (32L, 4096d, 32H, 11008ff) with Q4_K
weights in the universal QTensor repack, random planes (byte-identical
compute/memory path to a repacked GGUF file — quantized decode is
weight-content-independent). Measures steady-state single-stream decode
through the real Engine serving loop (per-token logits copy included).

Baseline: the reference (marella/ctransformers) publishes no numbers
(BASELINE.md). vs_baseline is computed against 14 tok/s, a representative
llama.cpp CPU figure for 7B Q4_K on a big desktop CPU (the engine the
reference wraps); the BASELINE.json north star is >= 2x that per chip.
"""

import json
import os
import sys
import time

BASELINE_TOK_S = 14.0


def _hw_limits():
    """(hbm_GB_per_s, peak_bf16_tflops) for the attached accelerator —
    the denominators for the self-normalizing SOL%/MFU fields every
    headline line carries (a raw tok/s number hides whether the kernel
    or the physics moved)."""
    import jax

    kind = jax.devices()[0].device_kind
    table = {
        "TPU v5 lite": (819.0, 197.0),  # v5e: 819 GB/s HBM, 197 bf16 TF/s
        "TPU v5e": (819.0, 197.0),
        "TPU v4": (1228.0, 275.0),
    }
    return table.get(kind, (819.0, 197.0))


def _weight_stream_stats(params):
    """(bytes, elements) streamed from HBM per decode token: every
    quantized weight's grid + scale planes (the embedding table is
    row-gathered, not streamed, so it is excluded)."""
    from ctransformers_tpu.ops import qmatmul as qm

    total_b = 0
    total_e = 0

    def visit(a):
        nonlocal total_b, total_e
        if isinstance(a, qm.QTensor):
            # layer-stacked weights hold n_stack layers in one leaf
            total_e += a.shape[0] * a.shape[1] * a.n_stack
            for arr in (a.qs, a.scales, a.mins, a.sd, a.sm):
                if arr is not None:
                    total_b += arr.size * arr.dtype.itemsize

    import jax

    jax.tree_util.tree_map(
        visit, params, is_leaf=lambda a: isinstance(a, qm.QTensor)
    )
    return total_b, total_e


def _kv_dtype(default: str = "f32"):
    """BENCH_KV: bf16 | int8 | f32. Defaults: f32 single-stream (the
    Engine default; r05 probe_scan_ablate — reading a bf16 cache at m=1
    costs ~2.9 ms/tok of VPU relayout on v5e, f32 decodes 140 vs 103
    tok/s), int8 for the batched bench (KV memory dominates at 32 slots).
    A bf16-KV prefill line rides along for the MXU-path prefill number
    (bf16 prefill attention is ~18% faster; each line carries its `kv`
    field)."""
    import jax.numpy as jnp

    kinds = {"bf16": jnp.bfloat16, "int8": jnp.int8, "f32": jnp.float32}
    name = os.environ.get("BENCH_KV", default)
    if name not in kinds:
        raise SystemExit(f"BENCH_KV={name!r}: expected one of {sorted(kinds)}")
    return kinds[name]


def main():
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params

    kind = os.environ.get("BENCH_KIND", "q4_k")
    n_ctx = int(os.environ.get("BENCH_CTX", "1024"))
    kv_dtype = _kv_dtype()
    prompt_len = int(os.environ.get("BENCH_PROMPT", "128"))
    decode_tokens = int(os.environ.get("BENCH_DECODE", "128"))
    # single | batch | both (default): the north star is per-chip
    # throughput, so the batched-serving number rides along by default
    mode = os.environ.get("BENCH_MODE", "both")

    # real-file cold wall FIRST (VERDICT r03 #7): the child is a fresh
    # process with its own TPU claim — running it while this process has
    # live buffers/claims measured 1.7x slower (287 s vs 173 s cold wall)
    if mode == "both" and os.environ.get("BENCH_REALFILE", "1") != "0":
        try:
            bench_realfile(kind)
        except Exception as e:  # pragma: no cover - bench-only guard
            print(f"# real-file bench failed: {e!r}", file=sys.stderr)

    if mode == "gptq":
        return bench_gptq(n_ctx)
    spec = LLAMA_7B.replace(n_ctx=n_ctx)
    t0 = time.time()
    params = _cached_params(spec, kind)
    t1 = time.time()
    if mode == "batch":
        return bench_batch(kind, n_ctx, spec=spec, params=params)

    engine = Engine(spec, params, kv_dtype=kv_dtype)
    t2 = time.time()
    it = engine.init_timings
    print(
        f"# build {t1-t0:.1f}s, engine {t2-t1:.1f}s = place+fuse "
        f"{it['place_fuse_s']}s + autotune {it['autotune_s']}s "
        f"({it['autotune_raced']} shapes raced, {it['autotune_warm']} "
        f"tile-cache hits) ({jax.devices()[0].device_kind})",
        file=sys.stderr,
    )

    rng_tokens = [int(x) for x in (abs(hash(str(i))) % spec.n_vocab for i in range(prompt_len))]

    # prefill (compiles chunk programs)
    engine.eval(rng_tokens)
    t3 = time.time()
    print(f"# prefill({prompt_len}) {t3-t2:.1f}s incl. compile", file=sys.stderr)

    # fused on-device decode loop (greedy): first call compiles
    engine.decode(decode_tokens, temperature=0.0, repetition_penalty=1.0)
    t4 = time.time()
    print(f"# decode compile+first {t4-t3:.1f}s", file=sys.stderr)

    # warm TTFT (BASELINE.md tracks p50 TTFT per config): re-prefill the
    # same prompt through the warm chunk programs
    ttfts = []
    for _ in range(3):
        engine.reset()
        t0 = time.time()
        engine.eval(rng_tokens)
        ttfts.append(time.time() - t0)
    ttft = sorted(ttfts)[1]
    print(
        f"# ttft p50 {ttft*1e3:.0f} ms ({prompt_len} tokens, "
        f"{prompt_len/ttft:.0f} tok/s prefill)",
        file=sys.stderr,
    )

    # honest on-device prefill rate: the wall TTFT above carries the
    # dispatch round-trip + host logits copy (~60 ms through the axon
    # tunnel — absent in production serving), so the compute number
    # comes from a scan-timed chunk (marginal 1x-vs-4x slope; r03
    # profile: 20.97 ms true vs 79 ms wall for the same 128 tokens)
    hbm_gbps, peak_tflops = _hw_limits()
    wbytes, welems = _weight_stream_stats(engine.params)
    # engine-config prefill + a bf16-KV prefill line: bf16 caches keep
    # prefill attention on the single-pass bf16 MXU path (57.6% MFU vs
    # 48.7% with the f32 parity-precision cache), while decode prefers
    # f32 (see _kv_dtype). Both are real serving configs; `kv` labels.
    kv_variants = [(None, engine.kv_dtype)]
    import jax.numpy as jnp_

    if engine.kv_dtype != jnp_.bfloat16:
        kv_variants.append(("bf16", jnp_.bfloat16))
    for kv_name, kvd in kv_variants:
        try:
            pf_s = _honest_prefill(engine, prompt_len, kv_dtype=kvd)
            # MFU: achieved bf16 FLOP rate / peak (matmul weights enter
            # one MAC per token each; attention FLOPs excluded =
            # conservative)
            mfu = prompt_len / pf_s * 2.0 * welems / (peak_tflops * 1e12)
            suffix = f"_{kv_name}kv" if kv_name else ""
            print(
                json.dumps({
                    "metric": f"llama7b_q4k_prefill_compute{suffix}",
                    "value": round(prompt_len / pf_s, 1),
                    "unit": "tokens/s",
                    "vs_baseline": round(
                        prompt_len / pf_s / BASELINE_TOK_S, 2
                    ),
                    "mfu_pct": round(100 * mfu, 1),
                    "kv": kv_name or str(jnp_.dtype(kvd)),
                })
            )
        except Exception as e:  # pragma: no cover - bench-only guard
            print(f"# honest prefill failed: {e!r}", file=sys.stderr)

    # rewind so the timed run repeats the SAME (n, attention-window)
    # program — without this the second call crosses into the next
    # round_window bucket and the timer measures a recompile.
    # MIN OF 3 runs (VERDICT r04 weak #1): the wall number is one
    # dispatch round-trip + the fused loop; the round-trip drifts
    # 25-45+ ms hour-scale through the tunnel, and a single-shot
    # reading regressed the committed artifact below its own compute
    # number. min() keeps the drift out while still charging the
    # real dispatch cost once.
    dt = float("inf")
    for _ in range(3):
        engine.rewind(prompt_len)
        t0 = time.time()
        engine.decode(decode_tokens, temperature=0.0, repetition_penalty=1.0)
        dt = min(dt, time.time() - t0)
    tok_s = decode_tokens / dt

    # honest on-device decode rate: the wall number above carries one
    # dispatch round-trip (~25-45 ms through the axon tunnel, drifting
    # hour-scale — absent in production serving). Marginal slope between
    # two fused-loop lengths in the SAME attention-window bucket cancels
    # it: per-token = (t[n2] - t[n1]) / (n2 - n1).
    sol_tok_s = hbm_gbps * 1e9 / wbytes  # weight-read speed of light
    try:
        d_s = _honest_decode(engine, prompt_len)
        print(
            json.dumps({
                "metric": "llama7b_q4k_decode_compute",
                "value": round(1.0 / d_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(1.0 / d_s / BASELINE_TOK_S, 2),
                "sol_pct": round(100.0 / d_s / sol_tok_s, 1),
                "weight_gb_s": round(wbytes / d_s / 1e9, 1),
            })
        )
    except Exception as e:  # pragma: no cover - bench-only guard
        print(f"# honest decode failed: {e!r}", file=sys.stderr)

    if mode == "both":
        # GPTQ4 perf rider (VERDICT r04 #7): the reference's GPTQ twin is
        # its *fast* engine (ExLlama); ours gets a measured line, not
        # just parity tests
        if kind == "q4_k" and os.environ.get("BENCH_GPTQ", "1") != "0":
            try:
                bench_gptq(n_ctx)
            except Exception as e:  # pragma: no cover - bench-only guard
                print(f"# gptq bench failed: {e!r}", file=sys.stderr)
        # batched-serving headline next; the parsed single-stream
        # headline stays the LAST line
        try:
            bench_batch(kind, n_ctx, spec=spec, params=engine.params)
        except Exception as e:  # pragma: no cover - bench-only guard
            print(f"# batch bench failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "llama7b_q4k_decode",
                "value": round(tok_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
                # weight-read speed of light: HBM BW / streamed bytes per
                # token — the self-normalizing field VERDICT r03 asked for
                "sol_pct": round(100.0 * tok_s / sol_tok_s, 1),
            }
        )
    )


def bench_gptq(n_ctx: int, prompt_len: int = 128) -> None:
    """GPTQ4 performance rider (VERDICT r04 #7): synthetic llama-7B with
    GPTQ-for-LLaMa 4-bit weights (group 128, desc_act=False — the ExLlama
    fast-path config; act-order parity is covered by tests/test_gptq.py)
    through the SAME Engine/packed-nibble kernel path as the Q4_K
    headline. Emits decode+prefill compute lines so the GPTQ backend has
    a measured performance story. Reference twin:
    /root/reference/ctransformers/gptq/llm.py (ExLlama CUDA)."""
    import gc

    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_7B

    spec = LLAMA_7B.replace(n_ctx=n_ctx)
    t0 = time.time()
    params = _cached_params(spec, "gptq4")
    engine = Engine(spec, params, kv_dtype=_kv_dtype())
    toks = [(11 * i + 5) % spec.n_vocab for i in range(prompt_len)]
    engine.eval(toks)
    engine.decode(32, temperature=0.0, repetition_penalty=1.0)
    print(f"# gptq4 build+compile {time.time()-t0:.1f}s", file=sys.stderr)

    hbm_gbps, peak_tflops = _hw_limits()
    wbytes, welems = _weight_stream_stats(engine.params)
    sol_tok_s = hbm_gbps * 1e9 / wbytes
    try:
        d_s = _honest_decode(engine, prompt_len, n1=16, n2=64)
        print(
            json.dumps({
                "metric": "llama7b_gptq4_decode_compute",
                "value": round(1.0 / d_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(1.0 / d_s / BASELINE_TOK_S, 2),
                "sol_pct": round(100.0 / d_s / sol_tok_s, 1),
                "weight_gb_s": round(wbytes / d_s / 1e9, 1),
            })
        )
    except Exception as e:  # pragma: no cover - bench-only guard
        print(f"# gptq honest decode failed: {e!r}", file=sys.stderr)
    try:
        pf_s = _honest_prefill(engine, prompt_len)
        mfu = prompt_len / pf_s * 2.0 * welems / (peak_tflops * 1e12)
        print(
            json.dumps({
                "metric": "llama7b_gptq4_prefill_compute",
                "value": round(prompt_len / pf_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(prompt_len / pf_s / BASELINE_TOK_S, 2),
                "mfu_pct": round(100 * mfu, 1),
            })
        )
    except Exception as e:  # pragma: no cover - bench-only guard
        print(f"# gptq honest prefill failed: {e!r}", file=sys.stderr)
    del engine, params
    gc.collect()


def _honest_prefill(engine, m: int, reps: int = 8, kv_dtype=None) -> float:
    """True seconds per m-token prefill chunk: scan-repeated forward with
    the KV cache carried (serializes iterations), marginal 1x-vs-4x slope
    so the flat per-dispatch tunnel round-trip cancels. `kv_dtype`
    overrides the engine's cache dtype (the loop builds its own fresh
    cache, so the prefill number for another serving config is free)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctransformers_tpu.models.forward import KVCache, forward

    spec = engine.spec
    tokens = jnp.zeros((engine.batch, m), jnp.int32)
    kv = KVCache.create(
        spec, batch=engine.batch, dtype=kv_dtype or engine.kv_dtype
    )

    def make_loop(nwork):
        def run(pp, kv0):
            def body(carry, _):
                c, cache = carry
                for _ in range(nwork):
                    logits, _, cache = forward(
                        spec, pp, tokens, jnp.int32(0), cache
                    )
                    c = jnp.max(logits.astype(jnp.float32)) * 1e-30 + c
                return (c, cache), ()

            (c, _), _ = jax.lax.scan(
                body, (jnp.float32(0), kv0), None, length=reps
            )
            return c

        f = jax.jit(run)
        np.asarray(f(engine.params, kv))  # compile + warm
        return lambda: np.asarray(f(engine.params, kv))

    loops = {n: make_loop(n) for n in (1, 4)}
    best = {1: float("inf"), 4: float("inf")}
    for _ in range(2):
        for n, loop in loops.items():
            loop()
            for _ in range(2):
                t0 = time.perf_counter()
                loop()
                best[n] = min(best[n], (time.perf_counter() - t0) / reps)
    return (best[4] - best[1]) / 3


def _cached_params(spec, kind: str):
    """Host-quantizing the synthetic 7B costs ~110s per bench run; cache
    the pickled tree on disk (bench-only: the tree is deterministic in
    (seed, kind))."""
    import pickle

    from ctransformers_tpu.models.synthetic import random_params

    path = f"/tmp/ct_bench_params_{kind}_v1.pkl"
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception as e:
            print(f"# params cache unreadable ({e!r}); rebuilding",
                  file=sys.stderr)
    params = random_params(spec, seed=0, quantize=kind, exact=False)
    try:
        with open(path, "wb") as f:
            pickle.dump(params, f, protocol=5)
    except Exception as e:  # pragma: no cover - disk-full etc.
        print(f"# params cache write failed: {e!r}", file=sys.stderr)
    return params


def _honest_decode(engine, prompt_len: int, n1: int = 32, n2: int = 128):
    """True seconds per decoded token: both loop lengths stay inside the
    round_window bucket covering prompt_len + n2, so the two dispatches
    run the same per-step program and the flat round-trip cancels."""
    lens = (n1, n2)
    for n in lens:  # compile + warm both fused loops
        engine.rewind(prompt_len)
        engine.decode(n, temperature=0.0, repetition_penalty=1.0)
    best = {n: float("inf") for n in lens}
    for _ in range(3):
        for n in lens:
            engine.rewind(prompt_len)
            t0 = time.perf_counter()
            engine.decode(n, temperature=0.0, repetition_penalty=1.0)
            best[n] = min(best[n], time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def _ensure_realfile_gguf() -> str:
    """Build (once, cached) a ~2 GB Q4_K GGUF: llama-7B width, 16 layers,
    random weights quantized through the package's own codecs and written
    by the package's own GGUF writer. Contents are random — the metric is
    the LOAD PATH (the reference mmaps-to-serving in seconds,
    llama.cpp:470-798); decode compute is weight-content-independent."""
    path = "/tmp/ct_bench_7b16_q4k_v1.gguf"
    if os.path.exists(path) and os.path.getsize(path) > 1 << 30:
        return path
    import numpy as np

    from ctransformers_tpu.formats.gguf import write_gguf
    from ctransformers_tpu.formats.quants import GGMLType
    from ctransformers_tpu.models.synthetic import LLAMA_7B

    sp = LLAMA_7B.replace(n_layer=16, n_ctx=1024)
    rng = np.random.default_rng(0)
    t0 = time.time()

    tensors = {}

    def synth_q4k(nelem: int) -> bytes:
        # Valid Q4_K blocks synthesized directly (d/dmin small positive
        # f16, random 6-bit scale bytes + nibbles): running 1.75B weights
        # through the real qkx2-fit encoder takes ~45 min on host, and
        # the metric here is the LOAD PATH — decode timing is
        # content-independent. Layout: k_quants.h:76-83 (144 B / 256).
        nb = nelem // 256
        buf = np.empty((nb, 144), np.uint8)
        d = (rng.random(nb, np.float32) * 2e-3 + 1e-4).astype("<f2")
        dm = (rng.random(nb, np.float32) * 2e-3).astype("<f2")
        buf[:, 0:2] = d.view(np.uint8).reshape(nb, 2)
        buf[:, 2:4] = dm.view(np.uint8).reshape(nb, 2)
        buf[:, 4:] = rng.integers(0, 256, (nb, 140), dtype=np.uint8)
        return buf.tobytes()

    def wt(name, k, n, t=GGMLType.Q4_K):
        # forward layout (in=k, out=n); GGUF stores (out, in) row-major
        # with quant blocks along in — ne is GGML dim order (in, out)
        if t == GGMLType.F16:
            w = (rng.standard_normal((n, k), np.float32) * 0.02)
            data = w.astype("<f2").tobytes()
        else:
            data = synth_q4k(n * k)
        tensors[name] = (t, (k, n), data)

    def vec(name, n):
        tensors[name] = (
            GGMLType.F32, (n,),
            rng.standard_normal(n).astype("<f4").tobytes(),
        )

    d, ff, V = sp.n_embd, sp.n_ff, sp.n_vocab
    tensors["token_embd.weight"] = (
        GGMLType.F16, (d, V),
        (rng.standard_normal((V, d), np.float32) * 0.02)
        .astype("<f2").tobytes(),
    )
    vec("output_norm.weight", d)
    wt("output.weight", d, V)
    for i in range(sp.n_layer):
        p = f"blk.{i}"
        vec(f"{p}.attn_norm.weight", d)
        vec(f"{p}.ffn_norm.weight", d)
        wt(f"{p}.attn_q.weight", d, d)
        wt(f"{p}.attn_k.weight", d, d)
        wt(f"{p}.attn_v.weight", d, d)
        wt(f"{p}.attn_output.weight", d, d)
        wt(f"{p}.ffn_gate.weight", d, ff)
        wt(f"{p}.ffn_up.weight", d, ff)
        wt(f"{p}.ffn_down.weight", ff, d)

    pieces = ["<unk>", "<s>", "</s>"] + [f"tok{i}" for i in range(V - 3)]
    kv = {
        "general.architecture": "llama",
        "general.name": "ct-tpu-bench-realfile",
        "general.quantization_version": 2,
        "llama.context_length": sp.n_ctx,
        "llama.embedding_length": d,
        "llama.block_count": sp.n_layer,
        "llama.feed_forward_length": ff,
        "llama.attention.head_count": sp.n_head,
        "llama.attention.head_count_kv": sp.n_head_kv or sp.n_head,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.rope.dimension_count": d // sp.n_head,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": pieces,
        "tokenizer.ggml.scores": np.zeros(len(pieces), np.float32),
        "tokenizer.ggml.token_type": np.asarray(
            [2, 3, 3] + [1] * (V - 3), np.int32
        ),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
    }
    write_gguf(path, kv, tensors)
    print(
        f"# built real-file GGUF {os.path.getsize(path)/2**30:.2f} GiB "
        f"in {time.time()-t0:.0f}s (cached)",
        file=sys.stderr,
    )
    return path


def bench_realfile(kind: str) -> None:
    """Cold wall through a real multi-GB file in a FRESH process: open ->
    load/repack -> blob-place -> prefill(128) -> decode(64), with the
    load/engine/compile/serve split printed (VERDICT r03 #7)."""
    import json as _json
    import subprocess

    path = _ensure_realfile_gguf()
    child = f"""
import json, time, sys
t0 = time.time()
from ctransformers_tpu.models.registry import load_model
b = load_model({path!r}, "llama")
t1 = time.time()
from ctransformers_tpu.engine.engine import Engine
eng = Engine(b.spec, b.params)
t2 = time.time()
toks = [(7 * i + 3) % 31000 + 3 for i in range(128)]
eng.eval(toks)
t3 = time.time()
eng.decode(64, temperature=0.0, repetition_penalty=1.0)
t4 = time.time()
eng.rewind(128)
t5 = time.time()
eng.decode(64, temperature=0.0, repetition_penalty=1.0)
t6 = time.time()
print("RESULT:" + json.dumps({{
    "load_s": round(t1 - t0, 1),
    "engine_s": round(t2 - t1, 1),
    "prefill128_incl_compile_s": round(t3 - t2, 1),
    "decode64_incl_compile_s": round(t4 - t3, 1),
    "first_token_wall_s": round(t3 - t0, 1),
    "warm_decode_tok_s": round(64 / (t6 - t5), 1),
}}), flush=True)
"""
    env = dict(os.environ, CT_PREWARM="0")

    def run_child():
        try:
            r = subprocess.run(
                [sys.executable, "-c", child], capture_output=True,
                text=True,
                timeout=int(
                    os.environ.get("BENCH_REALFILE_TIMEOUT", "1500")
                ),
                env=env,
            )
        except subprocess.TimeoutExpired:
            print("# real-file child timed out", file=sys.stderr)
            return None
        lines = [
            l for l in r.stdout.splitlines() if l.startswith("RESULT:")
        ]
        if not lines:
            print(
                f"# real-file child failed rc={r.returncode}: "
                f"{r.stdout[-300:]} {r.stderr[-500:]}",
                file=sys.stderr,
            )
            return None
        return _json.loads(lines[-1][7:])

    split = run_child()
    if split is None:
        return
    print(f"# real-file split: {split}", file=sys.stderr)
    # warm start: repack-cache sidecars now exist (the mmap-analog,
    # formats/repack_cache.py) — a second process start measures the
    # serve-again path the reference gets from mmap page cache
    warm = run_child()
    if warm is not None:
        print(f"# real-file warm split: {warm}", file=sys.stderr)
    print(
        _json.dumps(
            {
                "metric": "real_file_cold_wall",
                "value": split["first_token_wall_s"],
                "unit": "s (2GiB Q4_K file -> first token)",
                "vs_baseline": 0,
                **split,
                **(
                    {
                        "warm_start_wall_s": warm["first_token_wall_s"],
                        "warm_load_s": warm["load_s"],
                    }
                    if warm is not None
                    else {}
                ),
            }
        )
    )


def bench_batch(kind: str, n_ctx: int, slots: int = 8, n_new: int = 64,
                spec=None, params=None):
    """Aggregate serving throughput: `slots` concurrent greedy streams
    through the continuous-batching scheduler (every stream shares each
    weight read, so aggregate decode approaches slots x single-stream)."""
    import jax.numpy as jnp

    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params
    from ctransformers_tpu.ops import qmatmul as qm
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    slots = int(os.environ.get("BENCH_SLOTS", slots))
    if spec is None:
        spec = LLAMA_7B.replace(n_ctx=n_ctx)
    if params is None:
        params = random_params(spec, seed=0, quantize=kind, exact=False)
    qm.fuse_layer_params(params)
    qm.autotune(params, batch_sizes=(slots,))
    sched = BatchScheduler(
        spec, params, batch_slots=slots, kv_dtype=_kv_dtype(default="int8")
    )

    prompts = [[(i * 37 + j) % spec.n_vocab for j in range(32)] for i in range(slots)]

    def one_round():
        for p in prompts:
            sched.submit(Request(tokens=p, max_new_tokens=n_new, sampler="greedy"))
        return sched.run(device_chunk=16)  # device-side chunked decode

    # warm with the IDENTICAL pass, twice: the first compiles prefill +
    # chunked decode, the second compiles the prefix-reuse admission
    # programs (same prompts now have resident KV) — without it those
    # compiles land in the timed pass and the number reads ~10x low
    one_round()
    one_round()

    t0 = time.time()
    results = one_round()
    dt = time.time() - t0
    total = sum(len(toks) for toks in results.values())
    tok_s = total / dt
    hbm_gbps, _ = _hw_limits()
    wbytes, _ = _weight_stream_stats(params)
    # aggregate weight-read SOL: every slot shares each weight read, so
    # the bound scales with the slot count (KV reads excluded)
    sol = slots * hbm_gbps * 1e9 / wbytes
    print(
        json.dumps(
            {
                "metric": f"llama7b_q4k_batch{slots}_decode",
                "value": round(tok_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
                "sol_pct": round(100.0 * tok_s / sol, 1),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # one retry with the packed-4-bit kernels disabled (diagnostic
        # escape hatch): a Mosaic regression in the packed path must not
        # zero the benchmark
        if os.environ.get("CT_NO_PACK4"):
            raise
        print(f"# bench failed ({e!r}); retrying with CT_NO_PACK4=1", file=sys.stderr)
        import subprocess

        env = dict(os.environ, CT_NO_PACK4="1")
        raise SystemExit(
            subprocess.call([sys.executable, __file__], env=env)
        )
