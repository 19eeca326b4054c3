"""QTensor repack + fused dequant-matmul tests (jnp path and Pallas
interpret mode; the compiled kernel itself runs on real TPU in bench.py)."""

import numpy as np
import pytest

from ctransformers_tpu.formats.quants import (
    GGMLType,
    QUANTIZED_TYPES,
    dequantize,
    quantize,
)
from ctransformers_tpu.ops import qmatmul as qm

FORMATS = [GGMLType(t).name for t in sorted(QUANTIZED_TYPES)]


def _dense(rng, k, n, scale=0.3):
    return (rng.randn(k, n) * scale).astype(np.float32)


@pytest.mark.parametrize("kind", FORMATS)
def test_repack_matches_dequantize(kind):
    """dequantize_qtensor == reference dequantize, bit-exact, incl. the
    load-time transpose."""
    rng = np.random.RandomState(1)
    k, n = 256, 96  # n deliberately not lane-aligned
    w = _dense(rng, k, n)
    t = GGMLType[kind]
    buf = quantize(np.ascontiguousarray(w.T), t)  # file layout (n rows, k cols)
    ref = dequantize(buf, t, k * n).reshape(n, k).T

    qt = qm.repack(buf, t, rows=n, cols=k)
    got = np.asarray(qm.dequantize_qtensor(qt))
    np.testing.assert_array_equal(got, ref.astype(np.float32))


@pytest.mark.parametrize("kind", ["Q4_0", "Q4_1", "Q8_0", "Q2_K", "Q4_K", "Q6_K"])
def test_qmm_jnp_matches_dense(kind):
    rng = np.random.RandomState(2)
    k, n, m = 512, 160, 5
    w = _dense(rng, k, n)
    qt = qm.quantize_qtensor(w, kind)
    wd = np.asarray(qm.dequantize_qtensor(qt))
    x = _dense(rng, m, k, scale=0.5)

    out = np.asarray(qm._qmm_jnp(x, qt))
    ref = x @ wd
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("kind", ["Q8_0", "Q4_K"])
def test_qmm_pallas_interpret_matches_jnp(kind):
    rng = np.random.RandomState(3)
    k, n, m = 512, 256, 3
    w = _dense(rng, k, n)
    qt = qm.quantize_qtensor(w, kind)
    x = _dense(rng, m, k, scale=0.5)

    ref = np.asarray(qm._qmm_jnp(x, qt))
    got = np.asarray(qm._qmm_pallas(x, qt, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("kind", ["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
def test_kquant_scale_factoring_active_and_exact(kind):
    """k-quants store factored superblock scale planes (f32 d/dmin + int8
    subscales, ~21% less HBM traffic) whose f32 reconstruction is
    bit-identical to the fused planes."""
    rng = np.random.RandomState(11)
    w = _dense(rng, 512, 160)
    qt = qm.quantize_qtensor(w, kind)
    assert qt.sfactor > 0 and qt.sd is not None
    assert qt.scales.dtype == np.int8
    import os

    os.environ["CT_NO_SFAC"] = "1"
    try:
        ref = qm.quantize_qtensor(w, kind)
    finally:
        del os.environ["CT_NO_SFAC"]
    assert ref.sfactor == 0 and ref.scales.dtype == np.float32
    s, m = qm.scale_planes(qt)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref.scales))
    if m is not None:
        np.testing.assert_array_equal(np.asarray(m), np.asarray(ref.mins))
    np.testing.assert_array_equal(
        np.asarray(qm.dequantize_qtensor(qt)),
        np.asarray(qm.dequantize_qtensor(ref)),
    )


@pytest.mark.parametrize("kind", ["Q4_0", "Q4_1", "Q4_K", "Q2_K", "Q3_K"])
def test_adjk_repack_bit_exact(kind, monkeypatch):
    """The adjacent-K int4 packing dequantizes to exactly the same grid
    as the default K-split packing."""
    monkeypatch.setenv("CT_PACK4_LAYOUT", "adjk")
    rng = np.random.RandomState(21)
    w = _dense(rng, 512, 96)
    qt = qm.quantize_qtensor(w, kind)
    assert qt.packed and qt.pack_layout == "adjk"
    assert qt.qs.dtype == np.int8
    monkeypatch.setenv("CT_PACK4_LAYOUT", "ksplit")
    ref = qm.quantize_qtensor(w, kind)
    assert ref.pack_layout == "ksplit"
    np.testing.assert_array_equal(
        np.asarray(qm.dequantize_qtensor(qt)),
        np.asarray(qm.dequantize_qtensor(ref)),
    )


@pytest.mark.parametrize(
    "kind,layout",
    [("Q8_0", "ksplit"), ("Q4_0", "ksplit"), ("Q4_1", "ksplit"),
     ("Q4_K", "ksplit"), ("Q3_K", "ksplit"), ("Q2_K", "ksplit"),
     ("Q6_K", "ksplit"),
     ("Q4_0", "adjk"), ("Q4_1", "adjk"), ("Q4_K", "adjk"),
     ("Q3_K", "adjk"), ("Q2_K", "adjk")],
)
def test_qmm_kernel_variants_match(kind, layout, monkeypatch):
    """Every (kernel-variant, tiling) the autotuner may race produces the
    same result (interpret mode; the race itself only picks speed)."""
    import jax.numpy as jnp

    monkeypatch.setenv("CT_PACK4_LAYOUT", layout)
    rng = np.random.RandomState(7)
    k, n, m = 512, 256, 3
    w = _dense(rng, k, n)
    qt = qm.quantize_qtensor(w, kind)
    if layout == "adjk":
        assert qt.pack_layout == "adjk"
    x = _dense(rng, m, k, scale=0.5)

    ref = np.asarray(qm._qmm_jnp(x, qt))
    mp = 8
    xp = np.zeros((mp, qt.qs.shape[0] * (2 if qt.packed else 1)), np.float32)
    xp[:m, :k] = x
    for tk, tn, inner, mode in qm._tile_candidates(
        qt.qs.shape[0], qt.qs.shape[1], qt.packed, qt.pack_layout
    ):
        got = np.asarray(
            qm._qmm_pallas_tiled(
                jnp.asarray(xp), qt, tk, tn, inner, interpret=True, mode=mode
            )
        )[:m, :n]
        tag = f"{kind} tile ({tk},{tn},{inner},{mode!r})"
        if "b" in mode or "i" in mode or "g" in mode or "q" in mode:
            # b/sb modes round operands to bf16 for the MXU dot (same
            # error class as the XLA bf16 GEMM path). Rounding noise is
            # proportional to the OUTPUT SCALE (sum_i |q_i x_i| * eps over
            # a K=512 dot), not to each element — near-zero outputs carry
            # the same absolute noise as large ones, so judge against the
            # output scale, not elementwise rtol.
            # expected error class: both operands rounded -> ~2*eps_bf16
            # = 0.8% relative, independent of K; 2% bound leaves room for
            # unlucky draws while still catching structural bugs (a wrong
            # bias fold shows up as 10-100%).
            scale = np.abs(ref).max()
            fro = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            # 2.5%: Q2_K with the qkx2 encoder lands at 2.1% on this seed
            # (bf16 rounding over near-cancelling 2-bit outputs); a wrong
            # bias fold still reads 10-100%. "q" modes additionally round
            # the ACTIVATIONS to per-group int8 (the MMVQ q8_1 analog),
            # stacking to 2.7% on Q2_K — same structural-bug headroom.
            bound = 0.035 if "q" in mode else 0.025
            assert fro < bound, f"{tag}: frobenius rel err {fro:.4f}"
            amax = np.abs(got - ref).max()
            assert amax < 0.03 * scale or amax < 1.4 * bound * scale, (
                f"{tag}: max abs err {amax:.4f} vs scale {scale:.4f}"
            )
            if mode in ("g", "q", "q4", "qx"):
                # real-m sliced epilogue: same numbers, (rm, n) output
                out = qm._qmm_pallas_tiled(
                    jnp.asarray(xp), qt, tk, tn, inner, interpret=True,
                    mode=mode, rm=m,
                )
                assert out.shape[0] == m, f"{tag}: rm output rows"
                np.testing.assert_allclose(
                    np.asarray(out)[:, :n], got, rtol=0, atol=1e-5,
                    err_msg=f"{tag}: rm={m} slice changed the result",
                )
        else:
            np.testing.assert_allclose(
                got, ref, atol=2e-4, rtol=2e-4, err_msg=tag,
            )


def test_qtensor_is_pytree():
    import jax

    rng = np.random.RandomState(4)
    qt = qm.quantize_qtensor(_dense(rng, 256, 128), "Q8_0")
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2  # qs + scales (no mins for Q8_0)
    qt2 = jax.tree.map(lambda a: a, qt)
    assert isinstance(qt2, qm.QTensor)
    assert qt2.shape == qt.shape


def test_matmul_dispatch():
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    w = _dense(rng, 256, 128)
    x = jnp.asarray(_dense(rng, 2, 256))
    dense_out = np.asarray(qm.matmul(x, jnp.asarray(w)))
    q_out = np.asarray(qm.matmul(x, qm.quantize_qtensor(w, "Q8_0")))
    np.testing.assert_allclose(dense_out, q_out, atol=0.05, rtol=0.05)


def test_quantized_forward_matches_dense():
    """Full synthetic-llama forward with Q8_0 QTensor weights tracks the
    dense forward closely (quantization noise only)."""
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY
    dense = random_params(spec, seed=7)
    quant = random_params(spec, seed=7, quantize="q8_0")
    kv = KVCache.create(spec, batch=1)
    tokens = (np.arange(6, dtype=np.int32) % spec.n_vocab).reshape(1, 6)

    f = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])
    ld = np.asarray(f(dense, jnp.asarray(tokens), jnp.int32(0), kv))
    lq = np.asarray(f(quant, jnp.asarray(tokens), jnp.int32(0), kv))
    # Q8_0 is ~0.5% weight error; logits stay within a loose band
    assert np.abs(ld - lq).max() < 0.1 * max(1.0, np.abs(ld).max())


def test_quantized_forward_sharded():
    """QTensor weights shard over the mesh and still match single-device."""
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
    from ctransformers_tpu.parallel import mesh as pmesh

    spec = LLAMA_TINY
    params = random_params(spec, seed=8, quantize="q4_k")
    kv = KVCache.create(spec, batch=1)
    tokens = jnp.asarray((np.arange(4, dtype=np.int32) % spec.n_vocab).reshape(1, 4))

    f = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])
    ref = np.asarray(f(params, tokens, jnp.int32(0), kv))

    mesh = pmesh.make_mesh(8, data=1)
    sp = pmesh.shard_params(params, mesh)
    got = np.asarray(f(sp, tokens, jnp.int32(0), KVCache.create(spec, batch=1)))
    np.testing.assert_allclose(ref, got, atol=1e-4, rtol=1e-4)


def test_chunked_attention_matches_full(monkeypatch):
    """Online-softmax chunked prefill == materialized attention."""
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY  # n_ctx=64
    params = random_params(spec, seed=17)
    tokens = (np.arange(12, dtype=np.int32) % spec.n_vocab).reshape(1, 12)
    kv = KVCache.create(spec, 1)

    monkeypatch.setenv("CT_ATTN", "full")
    full = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])(
        params, jnp.asarray(tokens), jnp.int32(0), kv
    )
    monkeypatch.setenv("CT_ATTN", "chunked")
    monkeypatch.setenv("CT_ATTN_CHUNK", "16")
    chunked = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])(
        params, jnp.asarray(tokens), jnp.int32(0), KVCache.create(spec, 1)
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=2e-5, rtol=2e-5
    )


def test_chunked_attention_alibi_and_gqa(monkeypatch):
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.spec import ArchSpec
    from ctransformers_tpu.models.synthetic import random_params

    spec = ArchSpec(
        name="mpt-ish", n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
        n_head_kv=2, n_layer=2, alibi_bias_max=8.0, norm="layernorm",
        act="gelu", tied_lm_head=True,
    )
    params = random_params(spec, seed=18)
    tokens = (np.arange(10, dtype=np.int32) % spec.n_vocab).reshape(1, 10)

    monkeypatch.setenv("CT_ATTN", "full")
    full = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])(
        params, jnp.asarray(tokens), jnp.int32(0), KVCache.create(spec, 1)
    )
    monkeypatch.setenv("CT_ATTN", "chunked")
    monkeypatch.setenv("CT_ATTN_CHUNK", "16")
    chunked = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c)[0])(
        params, jnp.asarray(tokens), jnp.int32(0), KVCache.create(spec, 1)
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=2e-5, rtol=2e-5
    )


def test_attn_window_matches_full():
    """Static attention windows (round_window buckets) produce logits
    IDENTICAL to full-cache attention: the masked-out tail reads only
    zero-filled cache and -inf mask, so the softmax is unchanged; for both
    scalar n_past (engine) and per-slot (B,) n_past (batched serving)."""
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import (
        KVCache, forward, forward_batched, round_window,
    )
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY  # n_ctx=64
    params = random_params(spec, seed=31)
    prompt = (np.arange(9, dtype=np.int32) % spec.n_vocab).reshape(1, 9)
    tok = np.array([[5]], np.int32)

    assert round_window(1, 1024) == 256
    assert round_window(257, 1024) == 512
    assert round_window(5000, 1024) == 1024

    def decode_logits(window):
        kv = KVCache.create(spec, 1)
        _, _, kv = forward(spec, params, jnp.asarray(prompt), jnp.int32(0),
                           kv, attn_window=window)
        lg, _, _ = forward(spec, params, jnp.asarray(tok), jnp.int32(9), kv,
                           attn_window=window)
        return np.asarray(lg)

    full = decode_logits(None)
    win = decode_logits(16)  # covers positions 0..9 < 16 < n_ctx=64
    np.testing.assert_allclose(full, win, atol=2e-6, rtol=2e-6)

    def decode_logits_b(window):
        kv = KVCache.create(spec, 3)
        bt = np.zeros((3, 9), np.int32)
        bt[0] = prompt[0]
        bt[2] = (prompt[0] + 1) % spec.n_vocab
        act = jnp.asarray(np.array([True, False, True]))
        _, _, kv = forward_batched(
            spec, params, jnp.asarray(bt), jnp.zeros(3, jnp.int32), kv, act,
            attn_window=window,
        )
        bt1 = np.array([[5], [0], [7]], np.int32)
        lg, _, _ = forward_batched(
            spec, params, jnp.asarray(bt1),
            jnp.asarray(np.array([9, 0, 9], np.int32)), kv, act,
            attn_window=window,
        )
        return np.asarray(lg)

    full_b = decode_logits_b(None)
    win_b = decode_logits_b(16)
    np.testing.assert_allclose(
        full_b[[0, 2]], win_b[[0, 2]], atol=2e-6, rtol=2e-6
    )


def test_attn_window_alibi_gqa():
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.spec import ArchSpec
    from ctransformers_tpu.models.synthetic import random_params

    spec = ArchSpec(
        name="mpt-ish", n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
        n_head_kv=2, n_layer=2, alibi_bias_max=8.0, norm="layernorm",
        act="gelu", tied_lm_head=True,
    )
    params = random_params(spec, seed=32)
    prompt = (np.arange(7, dtype=np.int32) % spec.n_vocab).reshape(1, 7)
    tok = np.array([[3]], np.int32)

    def decode_logits(window):
        kv = KVCache.create(spec, 1)
        _, _, kv = forward(spec, params, jnp.asarray(prompt), jnp.int32(0),
                           kv, attn_window=window)
        lg, _, _ = forward(spec, params, jnp.asarray(tok), jnp.int32(7), kv,
                           attn_window=window)
        return np.asarray(lg)

    np.testing.assert_allclose(
        decode_logits(None), decode_logits(16), atol=2e-6, rtol=2e-6
    )


def test_fused_projections_match_unfused():
    """Engine-level QKV/gate-up fusion is numerically identical."""
    import jax
    import jax.numpy as jnp

    from ctransformers_tpu.models.forward import KVCache, forward
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY
    base = random_params(spec, seed=23, quantize="q4_k")
    fused = jax.tree.map(
        lambda a: a, base, is_leaf=lambda a: isinstance(a, qm.QTensor)
    )
    import copy

    fused = {
        "wte": base["wte"],
        "ln_f_g": base["ln_f_g"],
        "lm_head": base["lm_head"],
        "layers": [dict(l) for l in base["layers"]],
    }
    n = qm.fuse_layer_params(fused)
    assert n == 2 * spec.n_layer  # qkv + gateup per layer
    assert "w_qkv" in fused["layers"][0]

    toks = jnp.asarray((np.arange(5) % spec.n_vocab).reshape(1, 5), jnp.int32)
    f = jax.jit(lambda p, t, nn, c: forward(spec, p, t, nn, c)[0])
    a = np.asarray(f(base, toks, jnp.int32(0), KVCache.create(spec, 1)))
    b = np.asarray(f(fused, toks, jnp.int32(0), KVCache.create(spec, 1)))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "kind,layout",
    [("Q4_K", "ksplit"), ("Q8_0", "ksplit"), ("Q6_K", "ksplit"),
     ("Q4_K", "adjk"), ("Q4_0", "adjk")],
)
def test_qmm_kernel_prefill_m128(kind, layout, monkeypatch):
    """Prefill-size activations (m=128) through every candidate the
    autotuner may race at that m (the m>32 list is pruned to bf16-MXU-dot
    modes). Guards the compute-bound prefill dispatch path."""
    import jax.numpy as jnp

    monkeypatch.setenv("CT_PACK4_LAYOUT", layout)
    rng = np.random.RandomState(11)
    k, n, m = 512, 256, 128
    w = _dense(rng, k, n)
    qt = qm.quantize_qtensor(w, kind)
    x = _dense(rng, m, k, scale=0.5)
    ref = np.asarray(qm._qmm_jnp(x, qt))
    xp = np.zeros((m, qt.qs.shape[0] * (2 if qt.packed else 1)), np.float32)
    xp[:, :k] = x
    cands = qm._tile_candidates(
        qt.qs.shape[0], qt.qs.shape[1], qt.packed, qt.pack_layout, mp=m
    )
    assert all(md.endswith("b") or md in ("i", "si", "g") for *_, md in cands), (
        "m>32 candidates must all use bf16 MXU dots"
    )
    for tk, tn, inner, mode in cands:
        got = np.asarray(
            qm._qmm_pallas_tiled(
                jnp.asarray(xp), qt, tk, tn, inner, interpret=True, mode=mode
            )
        )[:m, :n]
        tag = f"{kind}/{layout} tile ({tk},{tn},{inner},{mode!r}) m=128"
        scale = np.abs(ref).max()
        fro = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert fro < 0.025, f"{tag}: frobenius rel err {fro:.4f}"
        assert np.abs(got - ref).max() < 0.03 * scale, tag


def test_shipped_tile_cache_parses_and_merges(monkeypatch):
    """The packaged tile-champion cache (data/qmm_tiles_v5e.json — the
    analog of the reference's committed per-variant binaries under
    ctransformers/lib/) must parse into valid _TILE_CACHE entries, and
    merging must never clobber fresher user-cache entries."""
    import os

    path = os.path.join(
        os.path.dirname(qm.__file__), "..", "data", "qmm_tiles_v5e.json"
    )
    shipped = qm._parse_cache_file(path)
    assert len(shipped) >= 20, "shipped cache unexpectedly small"
    for key, v in shipped.items():
        kp, npad, g, has_m, m, packed, sf, layout = key
        # groups: 16 (q4_0-family), 32 (q8_0/k-quant sub), 128 (GPTQ4),
        # 256 (k-quant superblock)
        assert kp > 0 and npad > 0 and g in (16, 32, 128, 256) and m >= 1
        assert layout in ("adjk", "ksplit")
        assert v == ("xla",) or (
            len(v) == 4 and v[0] > 0 and v[1] > 0 and v[2] >= 1
        )
    # the 7B decode shapes a fresh deployment needs must be present
    assert any(k[4] == 1 and k[5] for k in shipped), "no m=1 packed entries"

    # user entries win over shipped ones
    key = next(iter(shipped))
    monkeypatch.setattr(qm, "_shipped_loaded", False)
    monkeypatch.setattr(qm, "_TILE_CACHE", {key: ("user-choice",)})
    monkeypatch.setattr(
        qm, "_SHIPPED_CACHE_BACKENDS", {"cpu": "v5e", "CPU": "v5e"}
    )
    import jax

    monkeypatch.setattr(
        qm.jax, "devices",
        lambda: [type("D", (), {"device_kind": "TPU v5 lite"})()],
    )
    qm._load_shipped_cache()
    assert qm._TILE_CACHE[key] == ("user-choice",)
    assert len(qm._TILE_CACHE) == len(shipped)


def test_tainted_keys_never_persist(tmp_path, monkeypatch):
    """Degraded-device fallback champions must not reach the disk cache
    (r04: a later healthy race's full-dict save persisted an m=1024
    OOM-inducing fallback)."""
    import json
    import os

    path = str(tmp_path / "tiles.json")
    monkeypatch.setattr(qm, "_TILE_CACHE_PATH", path)
    good = (2048, 4096, 32, True, 1, True, 8, "adjk")
    bad = (2048, 4096, 32, True, 1024, True, 8, "adjk")
    monkeypatch.setattr(
        qm, "_TILE_CACHE",
        {good: (512, 2048, 4, "qx"), bad: (2048, 1024, 8, "si")},
    )
    monkeypatch.setattr(qm, "_TAINTED_KEYS", {bad})
    qm._save_disk_cache()
    with open(path) as f:
        saved = json.load(f)
    assert len(saved) == 1 and ",1024," not in next(iter(saved))
