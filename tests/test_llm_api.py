"""End-to-end public-API tests on a synthetic GPT-2 model.

Mirrors the reference integration test (tests/test_model.py): deterministic
seeded generation, logits mutability affecting sampling, metadata
properties — plus greedy-generation token parity against the reference
engine binary.
"""

import numpy as np
import pytest

from ctransformers_tpu import AutoModelForCausalLM, Config, LLM

from .fixtures import FTYPE_Q8_0, build_gpt2, ref_llm


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-gpt2.bin")
    build_gpt2(path, ftype=FTYPE_Q8_0, seed=11)
    return path


@pytest.fixture(scope="module")
def llm(model_path):
    return AutoModelForCausalLM.from_pretrained(model_path, model_type="gpt2")


def test_metadata(llm):
    assert llm.model_type == "gpt2"
    assert llm.vocab_size == 96
    assert llm.context_length == 64
    assert llm.eos_token_id == 0
    assert llm.bos_token_id == 0
    assert llm.pad_token_id == 0


def test_tokenize_round_trip(llm):
    tokens = llm.tokenize(" hello world")
    assert tokens
    assert llm.detokenize(tokens) == " hello world"


def test_deterministic_generation(llm):
    a = llm("the cat", seed=5, max_new_tokens=5)
    b = llm("the cat", seed=5, max_new_tokens=5)
    assert a == b
    c = llm("the cat", seed=6, max_new_tokens=5)
    assert isinstance(c, str)


def test_streaming_matches_nonstreaming(llm):
    text = llm("the cat", seed=7, max_new_tokens=6)
    chunks = list(llm("the cat", seed=7, max_new_tokens=6, stream=True))
    assert "".join(chunks) == text


def test_logits_mutation_affects_sampling(llm):
    """Zero-copy logits semantics from the reference integration test."""
    llm.eval(llm.tokenize("the cat"))
    logits = llm.logits
    assert len(logits) == llm.vocab_size
    logits[:] = 0.0
    logits[42] = 100.0
    assert llm.sample(top_k=1, temperature=0.1) == 42


def test_prefix_reuse(llm):
    """prepare_inputs_for_generation drops the evaluated common prefix."""
    warm = llm.tokenize("the cat is big")
    llm.eval(llm.prepare_inputs_for_generation(warm))
    again = llm.prepare_inputs_for_generation(warm)
    assert len(again) == 1  # keeps one token to refresh logits
    longer = llm.prepare_inputs_for_generation(warm + [7, 8])
    assert len(longer) == 3  # one overlap token + the two new ones


def test_generate_eval_sample_loop(llm):
    tokens = llm.tokenize("the cat")
    gen = llm.generate(tokens, seed=1)
    out = [next(gen) for _ in range(3)]
    assert all(0 <= t < llm.vocab_size for t in out)


def test_reset_deprecated(llm):
    with pytest.warns(UserWarning, match="deprecated"):
        llm.reset()


def test_context_overflow_warning(model_path, caplog):
    import logging

    llm = LLM(model_path, model_type="gpt2", config=Config(context_length=8))
    assert llm.context_length == 8
    with caplog.at_level(logging.WARNING, logger="ctransformers_tpu"):
        llm.eval(list(range(12)))
    assert any("exceeded maximum context length" in r.message for r in caplog.records)


def test_greedy_token_parity_with_reference(model_path):
    """top_k=1 removes sampler randomness: both engines must emit the same
    token sequence from the same prompt."""
    ref = ref_llm(model_path, "gpt2")
    if ref is None:
        pytest.skip("reference engine unavailable")
    mine = LLM(model_path, model_type="gpt2")
    prompt_ref = ref.tokenize("the cat is")
    prompt_mine = mine.tokenize("the cat is")
    assert prompt_ref == prompt_mine

    def greedy(llm, prompt, n):
        out = []
        gen = llm.generate(list(prompt), top_k=1, temperature=0.7, seed=1)
        for t in gen:
            out.append(t)
            if len(out) >= n:
                break
        return out

    assert greedy(mine, prompt_mine, 8) == greedy(ref, prompt_ref, 8)


def test_auto_model_from_dir(tmp_path):
    import json

    d = tmp_path / "repo"
    d.mkdir()
    build_gpt2(str(d / "model.bin"), seed=2)
    (d / "config.json").write_text(
        json.dumps(
            {
                "model_type": "gpt2",
                "task_specific_params": {
                    "text-generation": {"temperature": 0.33, "top_k": 7}
                },
            }
        )
    )
    llm = AutoModelForCausalLM.from_pretrained(str(d))
    assert llm.model_type == "gpt2"
    assert llm.config.temperature == 0.33
    assert llm.config.top_k == 7
    # kwargs override config.json and invalid kwargs raise
    llm2 = AutoModelForCausalLM.from_pretrained(str(d), temperature=0.9)
    assert llm2.config.temperature == 0.9
    with pytest.raises(TypeError, match="invalid keyword"):
        AutoModelForCausalLM.from_pretrained(str(d), bogus_param=1)


def test_missing_model_type(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="Unable to detect model type"):
        LLM(str(p))


def test_missing_file():
    with pytest.raises(ValueError, match="doesn't exist"):
        LLM("/nonexistent/model.bin", model_type="gpt2")


def test_session_save_load(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=9)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    prompt_tokens = llm.tokenize("hello world")
    llm.eval(prompt_tokens)
    before = np.array(llm.logits)
    session = str(tmp_path / "s.npz")
    llm.save_session(session)

    llm2 = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    restored = llm2.load_session(session)
    assert restored == prompt_tokens
    np.testing.assert_allclose(llm2.logits, before, atol=1e-6)
    # continuing from the restored KV matches continuing from the original
    llm.eval([7])
    llm2.eval([7])
    np.testing.assert_allclose(llm2.logits, llm.logits, atol=1e-5)


def test_timings_counters(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=9)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    llm("ab", max_new_tokens=3, seed=1)
    t = llm._engine.timings()
    # first-call evals are booked as compile time, not eval time (the
    # reference separates load from eval; a compile-inclusive ms/token
    # number is meaningless)
    assert t["n_compile"] >= 1
    assert t["t_compile_ms"] > 0
    # warm re-runs with the same program shapes book to eval counters
    eng = llm._engine
    eng.reset()
    eng.eval([5, 9, 2])  # compiles (2,1) chunk programs at these windows
    eng.reset()
    p0 = eng.n_p_eval
    eng.eval([7, 1, 30])
    assert eng.n_p_eval - p0 == 3
    assert eng.t_p_eval_us > 0
    assert eng.n_eval >= 2


def test_generate_fast(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=111)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    a = llm.generate_fast("hello", max_new_tokens=6, seed=4)
    b = llm.generate_fast("hello", max_new_tokens=6, seed=4)
    assert isinstance(a, str) and a == b
    # greedy fast path == greedy slow path tokens
    g_fast = llm.generate_fast("the cat", max_new_tokens=5, temperature=0.0)
    llm2 = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    toks = llm2.tokenize("the cat")
    llm2.eval(toks)
    out = []
    for _ in range(5):
        t = int(np.argmax(llm2.logits))
        if llm2.is_eos_token(t):
            break
        out.append(t)
        llm2.eval([t])
    assert g_fast == llm2.detokenize(out)
    # stop sequences applied post-hoc
    s = llm.generate_fast("hello", max_new_tokens=8, temperature=0.0, stop=["e"])
    assert "e" not in s


def test_generate_fast_early_stop_and_abort(tmp_path):
    """decode_chunked ends within one chunk of EOS/stop (no fixed-length
    burn) and honors abort_callback between dispatches."""
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=111)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")

    # stop string: fast path must match the exact host-loop text
    slow = llm("hello", max_new_tokens=8, temperature=0.0,
               repetition_penalty=1.0, stop=["e"])
    fast = llm.generate_fast("hello", max_new_tokens=8, temperature=0.0,
                             repetition_penalty=1.0, stop=["e"], chunk=2)
    assert fast == slow
    # early exit: n_past must NOT have advanced by the full budget
    llm._engine.reset()
    llm._context.clear()
    toks = llm.tokenize("hello")
    llm.eval(toks)
    base = llm._engine.n_past
    llm.generate_fast("hello", max_new_tokens=64, temperature=0.0,
                      repetition_penalty=1.0, stop=["e"], chunk=4)
    used = llm._engine.n_past - base
    assert used < 64, used

    # abort before the first dispatch generates nothing
    out = llm.generate_fast("hello", max_new_tokens=8,
                            abort_callback=lambda: True)
    assert out == ""

    # abort after the first chunk stops within one chunk
    calls = []

    def abort_after_one():
        calls.append(1)
        return len(calls) > 1

    llm._engine.reset()
    llm._context.clear()
    out = llm.generate_fast("hello", max_new_tokens=64, temperature=0.0,
                            repetition_penalty=1.0, chunk=2,
                            abort_callback=abort_after_one)
    # 2-token chunks: at most one chunk of text got generated
    assert len(llm.tokenize(out) if out else []) <= 4


def test_generate_fast_grammar_falls_back(tmp_path):
    """grammar on the fast path delegates to the exact host loop."""
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=111)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    g = 'root ::= "a" "b" "c"'
    want = llm("x", max_new_tokens=5, temperature=0.0,
               repetition_penalty=1.0, grammar=g)
    got = llm.generate_fast("x", max_new_tokens=5, temperature=0.0,
                            repetition_penalty=1.0, grammar=g)
    assert got == want


def test_export_graph(tmp_path):
    """StableHLO dump of the compiled step (the reference's
    ggml_graph_export / dump_dot analog)."""
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=9)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    out = str(tmp_path / "step.mlir")
    text = llm._engine.export_graph(out)
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    assert len(open(out).read()) > 1000


def test_log_callback_and_verbosity():
    """llama_log_set analog: one active callback, replace-not-stack,
    None restores defaults (reference llama.cpp:6284-6315)."""
    import logging

    from ctransformers_tpu.logger import logger, set_log_callback, set_verbosity

    records = []
    set_log_callback(lambda lvl, msg: records.append((lvl, msg)))
    try:
        set_verbosity("DEBUG")
        assert not logger.propagate
        logger.info("hello from the library")
        assert records and records[-1][0] == "INFO"
        assert "hello from the library" in records[-1][1]

        # replace, not stack
        other = []
        set_log_callback(lambda lvl, msg: other.append(msg))
        logger.warning("second hook")
        assert len(records) == 1 and other == ["second hook"]

        # verbosity gates emission
        set_verbosity(logging.ERROR)
        logger.info("suppressed")
        assert other == ["second hook"]

        # a broken hook must never raise into inference code
        set_log_callback(lambda lvl, msg: 1 / 0)
        set_verbosity("DEBUG")
        logger.info("boom")
    finally:
        set_log_callback(None)
        set_verbosity(logging.WARNING)
    assert logger.propagate


def test_progress_callback_gguf(tmp_path):
    """Loader progress hook (llama_progress_callback, llama.h:139-142):
    monotone 0..1 fractions ending at exactly 1.0."""
    from ctransformers_tpu import AutoModelForCausalLM
    from .fixtures import build_llama_gguf

    path = str(tmp_path / "m.gguf")
    build_llama_gguf(path)
    seen = []
    llm = AutoModelForCausalLM.from_pretrained(
        path, model_type="llama", progress_callback=seen.append
    )
    assert seen, "progress_callback never called"
    assert seen == sorted(seen)
    assert seen[-1] == 1.0
    assert all(0.0 <= f <= 1.0 for f in seen)
    assert llm("a", max_new_tokens=2, seed=1) is not None


def test_progress_callback_fallback(tmp_path):
    """Loaders without granular progress still report completion."""
    from ctransformers_tpu import AutoModelForCausalLM

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=3)
    seen = []
    AutoModelForCausalLM.from_pretrained(
        path, model_type="gpt2", progress_callback=seen.append
    )
    assert seen == [1.0]


def test_system_info(llm):
    """print_system_info analog reports backend + runtime config facts."""
    info = llm._engine.system_info()
    assert "backend" in info and "kv_dtype" in info
    llm._engine.print_system_info()
