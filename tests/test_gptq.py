"""GPTQ backend: unpack/repack oracle tests + end-to-end generation on a
synthetic GPTQ-for-LLaMa checkpoint directory (config.json +
tokenizer.model + model.safetensors)."""

import json

import numpy as np
import pytest

from ctransformers_tpu.formats import gptq as gq
from ctransformers_tpu.formats.safetensors import (
    SafetensorsReader,
    write_safetensors,
)
from ctransformers_tpu.ops import qmatmul as qm
from ctransformers_tpu.tokenizers.spm_model import (
    parse_spm_model,
    write_spm_model,
)


def _pack_qweight(q):  # (K, N) ints [0,15] -> (K/8, N) int32
    k, n = q.shape
    out = np.zeros((k // 8, n), np.uint32)
    for j in range(8):
        out |= q[j::8].astype(np.uint32) << (4 * j)
    return out.view(np.int32)


def _pack_qzeros(z):  # (G, N) zero-points -> (G, N/8) int32, stored -1
    zm1 = (z.astype(np.int64) - 1).astype(np.uint32)
    g, n = z.shape
    out = np.zeros((g, n // 8), np.uint32)
    for j in range(8):
        out |= zm1[:, j::8] << (4 * j)
    return out.view(np.int32)


def _random_gptq(rng, k, n, group=32, act_order=False):
    q = rng.randint(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.randint(1, 16, size=(k // group, n)).astype(np.uint8)
    s = (rng.rand(k // group, n).astype(np.float32) * 0.02 + 0.005).astype(
        np.float16
    )
    g_idx = np.arange(k) // group
    if act_order:
        g_idx = rng.permutation(g_idx)
    return (
        _pack_qweight(q),
        _pack_qzeros(z),
        s,
        g_idx.astype(np.int32),
    )


def test_safetensors_roundtrip(tmp_path):
    path = str(tmp_path / "t.safetensors")
    rng = np.random.RandomState(0)
    tensors = {
        "a": rng.randn(4, 8).astype(np.float32),
        "b": rng.randint(-5, 5, (3, 3)).astype(np.int32),
        "c": rng.randn(7).astype(np.float16),
    }
    write_safetensors(path, tensors)
    r = SafetensorsReader(path)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(r.tensor(name), arr)


def test_spm_model_roundtrip(tmp_path):
    path = str(tmp_path / "tokenizer.model")
    pieces = ["<unk>", "<s>", "</s>", "▁he", "llo", "▁a", "<0x0A>"]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0, -3.0, 0.0]
    types = [2, 3, 3, 1, 1, 1, 6]
    write_spm_model(path, pieces, scores, types)
    p, s, t = parse_spm_model(path)
    assert p == pieces
    assert t == types
    np.testing.assert_allclose(s, scores)


@pytest.mark.parametrize("act_order", [False, True])
def test_gptq_qtensor_matches_dequant(act_order):
    rng = np.random.RandomState(1)
    k, n = 256, 128
    qw, qz, s, g_idx = _random_gptq(rng, k, n, act_order=act_order)
    dense = gq.gptq_dequant(qw, qz, s, g_idx)
    qt = gq.gptq_to_qtensor(qw, qz, s, g_idx)
    got = np.asarray(qm.dequantize_qtensor(qt))
    np.testing.assert_allclose(got, dense, atol=1e-5, rtol=1e-5)

    # matmul path (incl. act-order activation gather)
    x = rng.randn(3, k).astype(np.float32)
    out = np.asarray(qm.qmatmul(x, qt))
    np.testing.assert_allclose(out, x @ dense, atol=2e-3, rtol=2e-3)


def _build_gptq_dir(tmp_path, n_vocab=64, d=64, heads=4, layers=2, ff=96,
                    act_order=False, seed=3):
    rng = np.random.RandomState(seed)
    cfg = {
        "model_type": "llama",
        "vocab_size": n_vocab,
        "hidden_size": d,
        "intermediate_size": ff,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "rms_norm_eps": 1e-6,
        "max_position_embeddings": 64,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    letters = "abcdefghijklmnopqrstuvwxyz"
    pieces = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    pieces += [f"<0x{b:02X}>" for b in range(16)]
    types += [6] * 16
    words = list(letters) + ["▁" + c for c in letters[:16]] + ["▁he", "llo"]
    pieces += words[: n_vocab - len(pieces)]
    types += [1] * (n_vocab - len(types))
    scores = [0.0] * 19 + [-1.0 - i / 10 for i in range(n_vocab - 19)]
    write_spm_model(str(tmp_path / "tokenizer.model"), pieces, scores, types)

    tensors = {
        "model.embed_tokens.weight": rng.randn(n_vocab, d).astype(np.float16) * 0.1,
        "model.norm.weight": np.ones(d, np.float16),
        "lm_head.weight": rng.randn(n_vocab, d).astype(np.float16) * 0.1,
    }
    for i in range(layers):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(d, np.float16)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(d, np.float16)
        for name, (kk, nn) in {
            "self_attn.q_proj": (d, d),
            "self_attn.k_proj": (d, d),
            "self_attn.v_proj": (d, d),
            "self_attn.o_proj": (d, d),
            "mlp.gate_proj": (d, ff),
            "mlp.up_proj": (d, ff),
            "mlp.down_proj": (ff, d),
        }.items():
            qw, qz, s, g_idx = _random_gptq(rng, kk, nn, act_order=act_order)
            tensors[f"{p}.{name}.qweight"] = qw
            tensors[f"{p}.{name}.qzeros"] = qz
            tensors[f"{p}.{name}.scales"] = s
            tensors[f"{p}.{name}.g_idx"] = g_idx
    write_safetensors(str(tmp_path / "model.safetensors"), tensors)
    return str(tmp_path)


@pytest.mark.parametrize("act_order", [False, True])
def test_gptq_end_to_end(tmp_path, act_order):
    from ctransformers_tpu import gptq

    path = _build_gptq_dir(tmp_path, act_order=act_order)
    llm = gptq.LLM(path)
    assert llm.model_type == "gptq"
    assert llm.context_length == 64
    a = llm("he", max_new_tokens=4, seed=5)
    assert a == llm("he", max_new_tokens=4, seed=5)
    # low-level API works too (the reference's GPTQ twin lacks it)
    llm.eval(llm.tokenize("he"))
    assert llm.logits.shape == (64,)


def test_gptq_routing(tmp_path):
    """'gptq' in the repo name routes to the GPTQ backend (hub.py:153)."""
    from ctransformers_tpu import AutoModelForCausalLM

    d = tmp_path / "llama-gptq"
    d.mkdir()
    path = _build_gptq_dir(d)
    llm = AutoModelForCausalLM.from_pretrained(path)
    assert llm.model_type == "gptq"


def test_decaying_repetition_penalty_schedule():
    """The GPTQ twin's decaying penalty (reference gptq/llm.py:174-176):
    newest `sustain` tokens carry the full factor, then a linear fade to
    1.0 over `decay` positions, older tokens unpenalized."""
    from ctransformers_tpu.engine.sampler import rep_penalty_mask

    # distinct tokens, oldest..newest = 0..9
    mask = rep_penalty_mask(
        16, list(range(10)), penalty_max=1.5, sustain=2, decay=4
    )
    # ages: tok9=0, tok8=1 (sustain) | tok7=2..tok4=5 (decay) | rest
    assert mask[9] == 1.5 and mask[8] == 1.5
    np.testing.assert_allclose(mask[7], 1.5 - 0.125)  # first decay step
    np.testing.assert_allclose(mask[6], 1.5 - 0.250)
    np.testing.assert_allclose(mask[5], 1.5 - 0.375)
    np.testing.assert_allclose(mask[4], 1.0)  # fully faded
    assert all(mask[t] == 1.0 for t in (0, 1, 2, 3))
    # a repeated token keeps its strongest (most recent) factor
    mask2 = rep_penalty_mask(16, [5, 0, 1, 5], 1.5, sustain=1, decay=2)
    assert mask2[5] == 1.5


def test_decaying_penalty_affects_sampling():
    from ctransformers_tpu.engine.sampler import sample_llama_decayed

    logits = np.zeros(8, np.float32)
    logits[3] = 2.0  # best token
    logits[5] = 1.9  # runner-up
    # token 3 recently emitted -> full penalty knocks it below 5
    tok = sample_llama_decayed(
        logits, top_k=0, top_p=1.0, temperature=0.0,
        repetition_penalty=1.3, last_tokens=[3], seed=0,
        sustain=4, decay=2,
    )
    assert tok == 5
    # same token far in the past (beyond sustain+decay) -> unpenalized
    tok = sample_llama_decayed(
        logits, top_k=0, top_p=1.0, temperature=0.0,
        repetition_penalty=1.3, last_tokens=[3] + [0] * 10, seed=0,
        sustain=4, decay=2,
    )
    assert tok == 3


def test_gptq_llm_uses_decayed_penalty(tmp_path):
    """gptq.LLM.sample routes through the decayed schedule: a token in
    the DECAY region (older than last_n_tokens but inside
    last_n + last_n//2) still draws a partial penalty — the base
    constant-penalty chain never looks past last_n_tokens."""
    from ctransformers_tpu import gptq

    path = _build_gptq_dir(tmp_path)
    llm = gptq.LLM(path)
    llm.eval(llm.tokenize("he"))
    logits = np.asarray(llm.logits)
    best = int(np.argmax(logits))
    assert logits[best] > 0
    # place `best` at age 4: outside sustain (last_n=4) so the constant
    # chain ignores it, inside sustain+decay (6) so the decayed one
    # applies a partial factor big enough to demote it
    fill = int(np.argmin(logits))  # filler that can't win either way
    llm._context.extend([best] + [fill] * 4)
    tok = llm.sample(
        temperature=0.0, repetition_penalty=1e6, last_n_tokens=4,
        top_k=0, top_p=1.0,
    )
    assert tok != best
    # the base constant-penalty chain, fed the same last_n window,
    # still picks `best` (it never sees past last_n_tokens)
    from ctransformers_tpu.engine.sampler import sample_llama

    base = sample_llama(
        logits, top_k=0, top_p=1.0, temperature=0.0,
        repetition_penalty=1e6, last_tokens=llm._context[-4:], seed=0,
    )
    assert base == best


def test_synthetic_gptq4_qtensor_matmul():
    """random_qtensor('gptq4') (the bench's synthetic 7B building block,
    bench.py:bench_gptq) is a valid GPTQ4 QTensor: the quantized matmul
    matches a dense matmul against its own dequantization, and the
    layer-stacked path accepts it (desc_act=False checkpoints stack)."""
    rng = np.random.RandomState(7)
    from ctransformers_tpu.models.synthetic import random_qtensor

    k, n, m = 256, 256, 3
    qt = random_qtensor(rng, k, n, kind="gptq4", scale=0.02)
    assert qt.kind == "GPTQ4" and qt.group == 128
    wd = np.asarray(qm.dequantize_qtensor(qt))
    x = (rng.randn(m, k) * 0.5).astype(np.float32)
    out = np.asarray(qm._qmm_jnp(x, qt))
    np.testing.assert_allclose(out, x @ wd, atol=2e-4, rtol=2e-4)
    got = np.asarray(qm._qmm_pallas(x, qt, interpret=True))
    np.testing.assert_allclose(got, x @ wd, atol=2e-4, rtol=2e-4)


def test_synthetic_gptq4_stacks():
    """GPTQ4 QTensors without act-order perms are layer-stackable (the
    scan-forward megakernel path, ops/qmatmul.py:stack_qtensors)."""
    rng = np.random.RandomState(8)
    from ctransformers_tpu.models.synthetic import random_qtensor

    k, n = 256, 256
    qts = [random_qtensor(rng, k, n, kind="gptq4") for _ in range(2)]
    stacked = qm.stack_qtensors(qts)
    assert stacked.n_stack == 2
    x = (rng.randn(1, k) * 0.5).astype(np.float32)
    for i, qt in enumerate(qts):
        wd = np.asarray(qm.dequantize_qtensor(qt))
        out = np.asarray(qm.qmatmul(x, stacked, layer=i))
        np.testing.assert_allclose(out, x @ wd, atol=2e-4, rtol=2e-4)
