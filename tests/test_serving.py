"""Continuous batching scheduler tests: batched decode must match the
single-sequence engine exactly, and mid-flight admission must work."""

import numpy as np
import pytest

from ctransformers_tpu.engine.engine import Engine
from ctransformers_tpu.models.registry import load_model
from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

from .fixtures import build_gpt2, build_llama_gguf


def _greedy_single(bundle, tokens, n):
    eng = Engine(bundle.spec, bundle.params)
    eng.eval(tokens)
    out = []
    for _ in range(n):
        t = int(np.argmax(eng.logits))
        out.append(t)
        eng.eval([t])
    return out


@pytest.mark.parametrize("builder,mtype", [(build_gpt2, "gpt2")])
def test_batched_greedy_matches_single(tmp_path, builder, mtype):
    path = str(tmp_path / "m.bin")
    builder(path, seed=41)
    b = load_model(path, mtype)

    prompts = [[5, 9, 2], [7, 1, 30, 8], [11]]
    expected = [_greedy_single(b, p, 6) for p in prompts]

    sched = BatchScheduler(b.spec, b.params, batch_slots=4)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=6, sampler="greedy"))
        for p in prompts
    ]
    results = sched.run()
    for uid, exp in zip(uids, expected):
        assert results[uid] == exp, (uid, results[uid], exp)


def test_batched_llama_rope_matches_single(tmp_path):
    path = str(tmp_path / "m.gguf")
    build_llama_gguf(path, seed=42)
    b = load_model(path, "gguf")
    prompts = [[1, 292, 263], [1, 313, 273, 307]]
    expected = [_greedy_single(b, p, 5) for p in prompts]
    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=5, sampler="greedy"))
        for p in prompts
    ]
    results = sched.run()
    for uid, exp in zip(uids, expected):
        assert results[uid] == exp


def test_midflight_admission(tmp_path):
    """A request submitted while others are decoding joins without
    corrupting them (the continuous part of continuous batching)."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=43)
    b = load_model(path, "gpt2")

    p1, p2 = [5, 9, 2], [7, 1, 30]
    exp1 = _greedy_single(b, p1, 6)
    exp2 = _greedy_single(b, p2, 4)

    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    u1 = sched.submit(Request(tokens=p1, max_new_tokens=6, sampler="greedy"))
    sched.step()
    sched.step()  # u1 is mid-decode
    u2 = sched.submit(Request(tokens=p2, max_new_tokens=4, sampler="greedy"))
    results = sched.run()
    assert results[u1] == exp1
    assert results[u2] == exp2


def test_more_requests_than_slots(tmp_path):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=44)
    b = load_model(path, "gpt2")
    prompts = [[i + 1, i + 2] for i in range(5)]
    expected = [_greedy_single(b, p, 3) for p in prompts]
    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=3, sampler="greedy"))
        for p in prompts
    ]
    results = sched.run()
    for uid, exp in zip(uids, expected):
        assert results[uid] == exp


def test_eos_stops_sequence(tmp_path):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=45)
    b = load_model(path, "gpt2")
    # pick an eos that appears later in the greedy continuation but is NOT
    # the first token (greedy outputs often repeat)
    full = _greedy_single(b, [5, 9], 8)
    stop_at = next(j for j in range(1, len(full)) if full[j] != full[0])
    sched = BatchScheduler(b.spec, b.params, batch_slots=1)
    uid = sched.submit(
        Request(
            tokens=[5, 9],
            max_new_tokens=10,
            sampler="greedy",
            eos_token_id=full[stop_at],
        )
    )
    results = sched.run()
    assert results[uid] == full[:stop_at]


def test_beam_search_beats_greedy(tmp_path):
    from ctransformers_tpu.serving.beam import beam_search

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=46)
    b = load_model(path, "gpt2")

    prompt = [5, 9, 2]
    n = 6

    # greedy logprob for comparison
    eng = Engine(b.spec, b.params)
    eng.eval(prompt)
    greedy, glp = [], 0.0
    for _ in range(n):
        lp = eng.logits - np.log(np.exp(eng.logits - eng.logits.max()).sum()) - eng.logits.max()
        t = int(np.argmax(eng.logits))
        glp += float(lp[t])
        greedy.append(t)
        eng.eval([t])

    beams = beam_search(
        b.spec, b.params, prompt, n_beams=4, n_predict=n,
        length_normalize=False,
    )
    assert len(beams) == 4
    assert all(len(bm.tokens) == n for bm in beams)
    # beam-1 search must equal greedy; beam-4 must be at least as good
    beams1 = beam_search(
        b.spec, b.params, prompt, n_beams=1, n_predict=n,
        length_normalize=False,
    )
    assert beams1[0].tokens == greedy
    assert beams[0].logprob >= glp - 1e-4
    # scores sorted best-first
    assert beams[0].logprob >= beams[-1].logprob


def test_scheduler_with_fused_quantized_params(tmp_path):
    """Quantized (engine-fused) params run through the batched scheduler."""
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    spec = LLAMA_TINY
    params = random_params(spec, seed=55, quantize="q8_0")
    base = _greedy_from_params(spec, params, [1, 4, 7], 5)
    qm.fuse_layer_params(params)
    sched = BatchScheduler(spec, params, batch_slots=2)
    uid = sched.submit(Request(tokens=[1, 4, 7], max_new_tokens=5, sampler="greedy"))
    results = sched.run()
    assert results[uid] == base


def _greedy_from_params(spec, params, prompt, n):
    eng = Engine(spec, params)
    eng.eval(prompt)
    out = []
    for _ in range(n):
        t = int(np.argmax(eng.logits))
        out.append(t)
        eng.eval([t])
    return out


def test_device_chunked_decode_matches_greedy(tmp_path):
    """run(device_chunk=K): greedy results match the host per-token loop,
    including EOS truncation and mid-chunk finishes."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=121)
    b = load_model(path, "gpt2")
    prompts = [[5, 9, 2], [7, 1, 30, 8], [11]]
    lens = [6, 3, 5]
    expected = [_greedy_single(b, p, n) for p, n in zip(prompts, lens)]

    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=n, sampler="greedy"))
        for p, n in zip(prompts, lens)
    ]
    results = sched.run(device_chunk=4)
    for uid, exp in zip(uids, expected):
        assert results[uid] == exp, (uid, results[uid], exp)


def test_device_chunked_decode_sampled_deterministic(tmp_path):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=122)
    b = load_model(path, "gpt2")

    def run_once():
        sched = BatchScheduler(b.spec, b.params, batch_slots=2)
        uid = sched.submit(
            Request(tokens=[5, 9], max_new_tokens=6, seed=42, temperature=0.8)
        )
        return sched.run(device_chunk=3)[uid]

    a, bb = run_once(), run_once()
    assert a == bb and len(a) == 6


def test_prefix_reuse_matches_fresh(tmp_path):
    """A second wave of requests sharing long prompt prefixes with
    finished sequences skips their prefill (same-slot and cross-slot KV
    reuse) and still generates identical tokens."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=43)
    b = load_model(path, "gpt2")

    base = [(i * 7 + 3) % b.spec.n_vocab for i in range(24)]
    p1 = base + [1]
    p2 = base + [2]  # same 24-token prefix, different tail

    fresh = BatchScheduler(b.spec, b.params, batch_slots=2,
                           prefix_reuse=False)
    u1 = fresh.submit(Request(tokens=p1, max_new_tokens=5, sampler="greedy"))
    u2 = fresh.submit(Request(tokens=p2, max_new_tokens=5, sampler="greedy"))
    want = fresh.run()

    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    a1 = sched.submit(Request(tokens=p1, max_new_tokens=5, sampler="greedy"))
    got1 = sched.run()
    assert got1[a1] == want[u1]
    # second wave: p1 again (same-slot hit) and p2 (cross-slot copy)
    a2 = sched.submit(Request(tokens=p1, max_new_tokens=5, sampler="greedy"))
    a3 = sched.submit(Request(tokens=p2, max_new_tokens=5, sampler="greedy"))
    got2 = sched.run()
    assert got2[a2] == want[u1]
    assert got2[a3] == want[u2]
    assert sched.reused_tokens >= 24 + 24  # both second-wave prompts hit


def test_prefix_reuse_chunked_decode(tmp_path):
    """Prefix reuse composes with device-side chunked decode."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=44)
    b = load_model(path, "gpt2")

    prompt = [(i * 5 + 1) % b.spec.n_vocab for i in range(20)]
    fresh = BatchScheduler(b.spec, b.params, batch_slots=2,
                           prefix_reuse=False)
    uf = fresh.submit(Request(tokens=prompt, max_new_tokens=6,
                              sampler="greedy"))
    want = fresh.run(device_chunk=4)[uf]

    sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    u1 = sched.submit(Request(tokens=prompt, max_new_tokens=6,
                              sampler="greedy"))
    r1 = sched.run(device_chunk=4)[u1]
    u2 = sched.submit(Request(tokens=prompt, max_new_tokens=6,
                              sampler="greedy"))
    r2 = sched.run(device_chunk=4)[u2]
    assert r1 == want and r2 == want
    assert sched.reused_tokens >= 19  # second submit reused the prefix


def _detok_fn(bundle):
    tok = bundle.tokenizer
    return lambda ts: b"".join(tok.detokenize(t) for t in ts)


def test_stop_strings_and_streaming(tmp_path):
    """Request.stop truncates at the first match with the same text
    semantics as LLM._stream; on_text streams the safe chunks whose
    concatenation equals Sequence.text."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=41)
    b = load_model(path, "gpt2")
    detok = _detok_fn(b)

    # plain run to learn the greedy text, then stop on a mid-text piece
    sched = BatchScheduler(b.spec, b.params, batch_slots=2, detokenize=detok)
    uid = sched.submit(Request(tokens=[5, 9, 2], max_new_tokens=8,
                               sampler="greedy"))
    toks = sched.run()[uid]
    full = detok(toks).decode(errors="ignore")
    assert len(full) > 4
    needle = full[2:4]
    expected = full[: full.index(needle)]

    chunks = []
    sched2 = BatchScheduler(b.spec, b.params, batch_slots=2, detokenize=detok)
    uid2 = sched2.submit(Request(
        tokens=[5, 9, 2], max_new_tokens=8, sampler="greedy",
        stop=[needle], on_text=chunks.append,
    ))
    sched2.run()
    seq = sched2.finished[uid2]
    assert seq.text == expected, (seq.text, expected, full)
    assert "".join(chunks) == seq.text


def test_stop_strings_chunked_decode(tmp_path):
    """Same stop semantics through the device-side chunked decode path."""
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=41)
    b = load_model(path, "gpt2")
    detok = _detok_fn(b)
    sched = BatchScheduler(b.spec, b.params, batch_slots=2, detokenize=detok)
    uid = sched.submit(Request(tokens=[5, 9, 2], max_new_tokens=8,
                               sampler="greedy"))
    toks = sched.run(device_chunk=4)[uid]
    full = detok(toks).decode(errors="ignore")
    needle = full[2:4]
    expected = full[: full.index(needle)]

    sched2 = BatchScheduler(b.spec, b.params, batch_slots=2, detokenize=detok)
    uid2 = sched2.submit(Request(
        tokens=[5, 9, 2], max_new_tokens=8, sampler="greedy", stop=[needle],
    ))
    sched2.run(device_chunk=4)
    assert sched2.finished[uid2].text == expected


def test_cancel_waiting_and_active(tmp_path):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=41)
    b = load_model(path, "gpt2")
    sched = BatchScheduler(b.spec, b.params, batch_slots=1)
    # one active fills the only slot; the second waits
    u1 = sched.submit(Request(tokens=[5, 9], max_new_tokens=64,
                              sampler="greedy"))
    u2 = sched.submit(Request(tokens=[7, 1], max_new_tokens=4,
                              sampler="greedy"))
    sched.step()  # admit u1, decode one token
    assert sched.cancel(u2)  # still waiting: finished immediately
    assert sched.finished[u2].cancelled
    assert sched.cancel(u1)  # active: ends at the next host checkpoint
    sched.step()
    assert u1 in sched.finished and sched.finished[u1].cancelled
    assert not sched.active and not sched.waiting
    assert not sched.cancel(999)


def test_scheduler_on_mesh_matches_single_device(tmp_path):
    """BatchScheduler(mesh=...): continuous batching over a TP mesh (the
    SURVEY §7 hard part) must reproduce single-device outputs exactly —
    8-way virtual CPU mesh, quantized weights, both decode paths."""
    from ctransformers_tpu.ops import qmatmul as qm
    from ctransformers_tpu.parallel import mesh as pmesh

    path = str(tmp_path / "m.gguf")
    from .fixtures import GGMLType
    build_llama_gguf(path, seed=42, wtype=GGMLType.Q4_0)
    b = load_model(path, "gguf")
    prompts = [[1, 292, 263], [1, 313, 273, 307]]

    ref_sched = BatchScheduler(b.spec, b.params, batch_slots=2)
    ref_uids = [
        ref_sched.submit(Request(tokens=p, max_new_tokens=5,
                                 sampler="greedy"))
        for p in prompts
    ]
    ref = ref_sched.run()

    mesh = pmesh.make_mesh(8, data=1)
    b2 = load_model(path, "gguf")
    params = dict(b2.params)
    qm.fuse_layer_params(params)
    sched = BatchScheduler(b2.spec, params, batch_slots=2, mesh=mesh)
    uids = [
        sched.submit(Request(tokens=p, max_new_tokens=5, sampler="greedy"))
        for p in prompts
    ]
    got = sched.run()
    for ru, u in zip(ref_uids, uids):
        assert got[u] == ref[ru], (got[u], ref[ru])

    # chunked device decode on the mesh too
    b3 = load_model(path, "gguf")
    params3 = dict(b3.params)
    qm.fuse_layer_params(params3)
    sched3 = BatchScheduler(b3.spec, params3, batch_slots=2, mesh=mesh)
    uids3 = [
        sched3.submit(Request(tokens=p, max_new_tokens=5, sampler="greedy"))
        for p in prompts
    ]
    got3 = sched3.run(device_chunk=3)
    for ru, u in zip(ref_uids, uids3):
        assert got3[u] == ref[ru]


def test_batched_prefill_token_cap(monkeypatch):
    """32 slots x long prompts must chunk so slots * chunk stays under
    CT_PREFILL_TOKEN_CAP (the m=1024 batched-prefill VMEM OOM, r04);
    generation output must be unaffected by the chunking."""
    import numpy as np

    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
    from ctransformers_tpu.serving.scheduler import BatchScheduler, Request

    params = random_params(LLAMA_TINY, seed=0, quantize="q8_0")
    prompt = [(3 + 7 * i) % LLAMA_TINY.n_vocab for i in range(24)]

    def run(slots, cap):
        monkeypatch.setenv("CT_PREFILL_TOKEN_CAP", str(cap))
        sched = BatchScheduler(LLAMA_TINY, params, batch_slots=slots)
        sched.submit(Request(tokens=list(prompt), max_new_tokens=6,
                             sampler="greedy"))
        out = sched.run()
        return list(out.values())[0]

    # small cap forces multi-chunk prefill; big cap single-chunk — same
    # greedy tokens either way
    assert run(4, 16) == run(4, 4096)
