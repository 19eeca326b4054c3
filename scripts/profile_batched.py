"""Decompose the B=8 batched decode step cost (llama-7B Q4_K).

NOTES_NEXT_ROUND.md: the B=8 step measured ~40 ms vs ~23.5 ms for B=1
although the weight matmuls are batch-independent — something beyond KV
streaming dominates. This harness times the scheduler's exact chunk body
(scan of [device sampler -> forward_batched], donated KV) under each
CT_ABLATE stub (models/forward.py:_ablate) and reports per-component
deltas.

Timing: marginal slope between chunk lengths K1 and K2 (same program
family, different scan length) removes the flat per-dispatch tunnel
round-trip (~24-45 ms, drifting); min over consecutive dispatches.
Run ALONE on the TPU (see NOTES_NEXT_ROUND.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ABLATIONS = [
    ("base", ""),
    ("-kvwrite", "kvwrite"),
    ("-attnmath", "attnmath"),  # skip KV streaming + softmax/einsums
    ("-qkvo", "qkvo"),  # skip entire attention (incl. its 2 matmuls)
    ("-mlp", "mlp"),  # skip gate/up/down matmuls
    ("-head", "head"),  # skip lm_head matmul
    ("-sampler", "SAMPLER"),  # script-level: feed constant token
]

K1, K2 = 8, 32
SLOTS = int(os.environ.get("CT_PROF_B", "8"))  # 1 = single-stream path


def build():
    import jax.numpy as jnp

    from ctransformers_tpu.models.synthetic import LLAMA_7B, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    spec = LLAMA_7B.replace(n_ctx=int(os.environ.get("CT_PROF_NCTX", "1024")))
    t0 = time.time()
    try:
        from bench import _cached_params

        params = _cached_params(spec, "q4_k")
    except Exception:
        params = random_params(spec, seed=0, quantize="q4_k", exact=False)
    qm.fuse_layer_params(params)
    if os.environ.get("CT_SCAN_LAYERS", "1") != "0":
        # layer-stack like the production Engine does (engine._maybe_stack);
        # tracing the K-chunk scan over the UNROLLED 32-layer forward took
        # >18 min through the remote-compile path (r05)
        from ctransformers_tpu.models.forward import stack_layer_params

        stacked = stack_layer_params(params["layers"])
        if stacked is not None:
            params["layers"] = stacked
    qm.autotune(params, batch_sizes=(SLOTS,))
    print(f"# params+autotune {time.time()-t0:.0f}s", file=sys.stderr)
    return spec, params


def chunk_fn(spec, k, window, skip_sampler, single):
    """The scheduler's chunk body (scheduler.py:_decode_chunk_fn), greedy;
    single=True instead mirrors Engine._decode_loop (B=1, scalar n_past)."""
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.engine.sampler import sample_device_batch
    from ctransformers_tpu.models.forward import forward, forward_batched

    def run(params, kv, logits, n_past, active, keys, last):
        def body(carry, _):
            kv, logits, n_past, keys, last = carry
            if skip_sampler:
                toks = jnp.zeros((logits.shape[0],), jnp.int32)
            else:
                split = jax.vmap(jax.random.split)(keys)
                keys = split[:, 0]
                toks = sample_device_batch(
                    logits, split[:, 1], last,
                    top_k=jnp.full((logits.shape[0],), 1, jnp.int32),
                    top_p=jnp.ones((logits.shape[0],), jnp.float32),
                    temperature=jnp.zeros((logits.shape[0],), jnp.float32),
                    repetition_penalty=jnp.ones(
                        (logits.shape[0],), jnp.float32
                    ),
                    greedy_only=True, k_cap=0,
                )
                last = jnp.roll(last, -1, axis=1).at[:, -1].set(toks)
            if single:
                lg, _, kv = forward(
                    spec, params, toks[:, None], n_past[0], kv,
                    attn_window=window,
                )
            else:
                lg, _, kv = forward_batched(
                    spec, params, toks[:, None], n_past, kv, active,
                    attn_window=window,
                )
            n_past = n_past + active.astype(n_past.dtype)
            return (kv, lg, n_past, keys, last), ()

        (kv, logits, n_past, keys, last), _ = jax.lax.scan(
            body, (kv, logits, n_past, keys, last), None, length=k
        )
        return jnp.max(logits), kv

    return jax.jit(run, donate_argnums=(1,))


def main():
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache

    spec, params = build()
    windows = [
        int(w) for w in os.environ.get("CT_PROF_WINDOW", "256").split(",")
    ]

    def state():
        import jax

        kv = KVCache.create(spec, SLOTS, jnp.bfloat16)
        logits = jnp.zeros((SLOTS, spec.n_vocab), jnp.float32)
        n_past = jnp.full((SLOTS,), 128, jnp.int32)
        active = jnp.ones((SLOTS,), bool)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(SLOTS)])
        last = jnp.zeros((SLOTS, 64), jnp.int32)
        return kv, logits, n_past, active, keys, last

    single = SLOTS == 1
    for window in windows:
        run_ablations(spec, params, window, single, state)


def run_ablations(spec, params, window, single, state):
    import jax  # noqa: F401 (kept hot in the caller)

    print(f"-- window={window}")
    only = os.environ.get("CT_PROF_ABLATIONS")  # comma list of labels
    abls = [
        (l, f) for l, f in ABLATIONS
        if not only or l in only.split(",")
    ]
    results = {}
    for label, flag in abls:
        skip_sampler = flag == "SAMPLER"
        os.environ["CT_ABLATE"] = "" if skip_sampler else flag
        fns = {
            k: chunk_fn(spec, k, window, skip_sampler, single)
            for k in (K1, K2)
        }
        best = {K1: float("inf"), K2: float("inf")}
        # compile+warm both, then interleave timed dispatches
        st = {k: state() for k in (K1, K2)}
        for k in (K1, K2):
            kv, lg, npst, act, keys, lst = st[k]
            _, kv = fns[k](params, kv, lg, npst, act, keys, lst)
            st[k] = (kv, lg, npst, act, keys, lst)
        for trial in range(4):
            for k in (K1, K2):
                kv, lg, npst, act, keys, lst = st[k]
                t0 = time.perf_counter()
                m, kv = fns[k](params, kv, lg, npst, act, keys, lst)
                np.asarray(m)
                best[k] = min(best[k], (time.perf_counter() - t0))
                st[k] = (kv, lg, npst, act, keys, lst)
        per_tok = (best[K2] - best[K1]) / (K2 - K1)
        results[label] = per_tok
        print(
            f"{label:11s} {per_tok*1e3:8.2f} ms/tok   "
            f"(K{K1}={best[K1]*1e3:.1f} ms, K{K2}={best[K2]*1e3:.1f} ms)",
            flush=True,
        )
    os.environ["CT_ABLATE"] = ""

    base = results.get("base")
    if base:
        print("\ncomponent deltas vs base:")
        for label, v in results.items():
            if label != "base":
                print(f"  {label:11s} saves {1e3*(base - v):7.2f} ms/tok")


if __name__ == "__main__":
    main()
