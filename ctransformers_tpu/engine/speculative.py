"""Speculative decoding: a cheap draft model proposes tokens, the target
model verifies them in one batched forward.

No reference counterpart (SURVEY.md §2.3 lists speculative decode as
absent; beam search is its only multi-token mechanism). Decode is
HBM-bandwidth-bound — the target reads every weight once per step no
matter how many tokens it scores — so verifying gamma draft tokens in one
forward multiplies tokens/step by the acceptance rate at almost no extra
cost.

Greedy speculation is EXACT: every emitted token is the target's argmax
(accepted draft tokens equal it by construction; the first mismatch emits
the target's own choice), so the output is identical to plain greedy
decode for ANY draft model — only the speed depends on draft quality.

The whole loop runs on device: `lax.while_loop` over speculative blocks
(early exit once enough tokens are out), each block = [draft scan of
gamma+1 single-token forwards -> one target forward over gamma+1
positions with all_logits -> acceptance arithmetic]. Rejected positions
leave stale KV rows past n_past, which the positional causal mask ignores
until they are overwritten (same invariant as the engine's prefix
rewind).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forward import forward, round_window
from ..models.spec import ArchSpec


def _spec_block(spec_t: ArchSpec, spec_d: ArchSpec, gamma: int, window,
                window_d):
    """One speculative block body (traced under the outer while_loop)."""

    def block(params_t, params_d, kv_t, kv_d, pending, n_past):
        # draft proposes d_0..d_{gamma-1} for positions P+1..P+gamma by
        # feeding [pending, d_0, .., d_{gamma-1}] one token at a time
        # (the last feed only writes the KV row a fully-accepted block
        # needs; its logits are unused)
        def dbody(carry, _):
            kv_d, tok, p = carry
            lg, _, kv_d = forward(
                spec_d, params_d, tok[None, None], p, kv_d,
                attn_window=window_d,
            )
            nxt = jnp.argmax(lg[0]).astype(jnp.int32)
            return (kv_d, nxt, p + 1), nxt

        (kv_d, _, _), ds = jax.lax.scan(
            dbody, (kv_d, pending, n_past), None, length=gamma + 1
        )
        ds = ds[:gamma]  # proposals (the gamma+1-th is never scored)

        # target scores [pending, d_0..d_{gamma-1}] in ONE forward
        toks = jnp.concatenate([pending[None], ds])[None]  # (1, gamma+1)
        logits, _, kv_t = forward(
            spec_t, params_t, toks, n_past, kv_t, all_logits=True,
            attn_window=window,
        )
        tp = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (gamma+1,)

        match = ds == tp[:gamma]
        m = jnp.where(match.all(), gamma, jnp.argmin(match)).astype(
            jnp.int32
        )
        idx = jnp.arange(gamma + 1)
        base = jnp.concatenate([ds, ds[:1]])  # length gamma+1 (pad)
        emitted = jnp.where(
            idx < m, base, jnp.where(idx == m, tp[m], -1)
        ).astype(jnp.int32)
        return kv_t, kv_d, tp[m], n_past + m + 1, emitted, m + 1

    return block


def decode_speculative(engine, draft, n: int, gamma: int = 4) -> List[int]:
    """Generate up to `n` greedy tokens from `engine` with `draft` as the
    proposer. Both engines must have eval'd the SAME context (equal
    n_past). The output equals plain greedy decode's exactly.

    Both engines' n_past advance past the generated tokens; their
    host-side `logits` are invalidated (the device loop does not keep
    per-token logits) — a follow-up eval()/generate() re-establishes
    them, exactly like resuming from a loaded session.
    """
    if engine.logits is None:
        raise RuntimeError("decode_speculative() requires a prior eval()")
    if draft.spec.n_vocab != engine.spec.n_vocab:
        raise ValueError("draft and target vocabularies differ")
    if engine.batch != 1 or draft.batch != 1:
        raise ValueError(
            "speculative decoding is single-stream (batch_size=1 engines);"
            f" got target batch {engine.batch}, draft batch {draft.batch}"
        )
    if draft.n_past != engine.n_past:
        raise ValueError(
            f"draft n_past {draft.n_past} != target {engine.n_past}; "
            "eval the same prompt on both engines first"
        )
    cap = min(
        engine.spec.n_ctx - engine.n_past - gamma - 2,
        draft.spec.n_ctx - draft.n_past - gamma - 2,
    )
    n = min(n, cap)
    if n <= 0:
        return []
    first = int(np.argmax(engine.logits))  # token for position n_past
    if n == 1:
        # feeding it through plain eval keeps logits live; no blocks needed
        engine.eval([first])
        draft.eval([first])
        return [first]
    blocks = n - 1  # worst case: one token per block after `first`
    window = round_window(engine.n_past + n + gamma + 1, engine.spec.n_ctx)
    window_d = round_window(draft.n_past + n + gamma + 1, draft.spec.n_ctx)
    key = (
        "spec", n, gamma, window, window_d,
        draft.spec.name, draft.spec.n_layer, draft.spec.n_embd,
    )
    if key not in engine._loops:
        spec_t, spec_d = engine.spec, draft.spec
        block = _spec_block(spec_t, spec_d, gamma, window, window_d)
        need = n - 1

        def run(params_t, params_d, kv_t, kv_d, pending, n_past):
            buf0 = jnp.full((blocks, gamma + 1), -1, jnp.int32)

            def cond(c):
                _, _, _, _, _, total, i = c
                return (total < need) & (i < blocks)

            def body(c):
                kv_t, kv_d, pending, n_past, buf, total, i = c
                kv_t, kv_d, pending, n_past, emitted, cnt = block(
                    params_t, params_d, kv_t, kv_d, pending, n_past
                )
                buf = jax.lax.dynamic_update_slice(
                    buf, emitted[None], (i, 0)
                )
                return kv_t, kv_d, pending, n_past, buf, total + cnt, i + 1

            kv_t, kv_d, pending, n_past, buf, total, _ = jax.lax.while_loop(
                cond, body,
                (kv_t, kv_d, pending, n_past, buf0, jnp.int32(0),
                 jnp.int32(0)),
            )
            return kv_t, kv_d, buf.reshape(-1)

        engine._loops[key] = jax.jit(run, donate_argnums=(2, 3))
    run = engine._loops[key]

    import time as _time

    t0 = _time.perf_counter()
    kv_t, kv_d, emitted = run(
        engine.params, draft.params, engine.kv, draft.kv,
        jnp.int32(first), jnp.int32(engine.n_past),
    )
    engine.kv, draft.kv = kv_t, kv_d
    em = np.asarray(emitted)
    out = ([first] + [int(t) for t in em[em >= 0]])[:n]
    # valid KV frontier: every generated token except the last was fed
    base = engine.n_past
    engine.n_past = base + len(out) - 1
    draft.n_past = base + len(out) - 1
    engine.logits = None
    draft.logits = None
    engine.t_eval_us += int((_time.perf_counter() - t0) * 1e6)
    engine.n_eval += len(out)
    engine.n_sample += len(out)
    return out
