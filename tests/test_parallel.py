"""Mesh/sharding tests on the virtual 8-device CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctransformers_tpu.models.forward import KVCache, forward
from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
from ctransformers_tpu.parallel import mesh as pmesh


def test_mesh_shape():
    mesh = pmesh.make_mesh(8, data=2)
    assert mesh.shape == {"data": 2, "model": 4}


def test_sharded_forward_matches_single_device():
    spec = LLAMA_TINY
    params = random_params(spec, seed=3)
    kv = KVCache.create(spec, batch=1)
    tokens = jnp.arange(6, dtype=jnp.int32).reshape(1, 6) % spec.n_vocab

    logits_ref, _, kv_ref = jax.jit(
        lambda p, t, n, c: forward(spec, p, t, n, c)
    )(params, tokens, jnp.int32(0), kv)

    mesh = pmesh.make_mesh(8, data=1)
    sp = pmesh.shard_params(params, mesh)
    skv = pmesh.shard_kv(KVCache.create(spec, batch=1), spec, mesh)
    logits_tp, _, kv_tp = jax.jit(
        lambda p, t, n, c: forward(spec, p, t, n, c)
    )(sp, tokens, jnp.int32(0), skv)

    np.testing.assert_allclose(
        np.asarray(logits_ref), np.asarray(logits_tp), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv_ref.k), np.asarray(kv_tp.k), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("n", [4, 8])
def test_graft_dryrun(n):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_engine_with_mesh_matches_single_device():
    """Engine(mesh=...): full serving path (eval + decode) on a TP mesh
    matches the unsharded engine, including quantized weights."""
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params

    spec = LLAMA_TINY
    params = random_params(spec, seed=5, quantize="q8_0")

    ref = Engine(spec, params)
    ref.eval([1, 2, 3])
    ref_logits = np.array(ref.logits)
    ref_toks = ref.decode(5, temperature=0.0, repetition_penalty=1.0)

    mesh = pmesh.make_mesh(8, data=1)
    eng = Engine(spec, params, mesh=mesh)
    eng.eval([1, 2, 3])
    np.testing.assert_allclose(eng.logits, ref_logits, atol=1e-4, rtol=1e-4)
    toks = eng.decode(5, temperature=0.0, repetition_penalty=1.0)
    assert toks == ref_toks


def test_qtensor_pspec_tagging():
    """shard_params tags QTensors with their TP partition and shards all
    planes along the same weight axis."""
    from ctransformers_tpu.models.synthetic import LLAMA_TINY, random_params
    from ctransformers_tpu.ops import qmatmul as qm

    spec = LLAMA_TINY
    params = random_params(spec, seed=9, quantize="q4_k")
    mesh = pmesh.make_mesh(8, data=1)
    sp = pmesh.shard_params(params, mesh)
    layer = sp["layers"][0]
    assert layer["wq"].pspec == "col"
    assert layer["wo"].pspec == "row"
    assert layer["w_down"].pspec == "row"
    # every plane of a tagged tensor carries a mesh sharding
    for plane in (layer["wq"].qs, layer["wq"].scales):
        assert plane.sharding.spec[-1] == "model"


@pytest.mark.parametrize("pspec", ["col", "row"])
@pytest.mark.parametrize("kind,layout", [("Q8_0", "ksplit"), ("Q4_K", "adjk")])
def test_qmm_shard_map_matches_jnp(pspec, kind, layout, monkeypatch):
    """The shard_map'd Pallas matmul (interpret mode, 8-device CPU mesh)
    equals the XLA dequant+matmul reference for both TP partitions."""
    import dataclasses

    from ctransformers_tpu.ops import qmatmul as qm

    monkeypatch.setenv("CT_PACK4_LAYOUT", layout)
    rng = np.random.RandomState(33)
    # sized so the TP divisibility gates pass at tp=8 (npad multiple of
    # 8*128 lanes; row shards hold whole superblocks)
    k, n, m = 2048, 2048, 3
    w = (rng.randn(k, n) * 0.3).astype(np.float32)
    qt = qm.quantize_qtensor(w, kind)
    qt = dataclasses.replace(qt, pspec=pspec)
    x = (rng.randn(m, k) * 0.5).astype(np.float32)

    mesh = pmesh.make_mesh(8, data=1)
    with qm.tp_ctx(mesh):
        assert qm._tp_supported(qt), "expected supported layout"
        got = np.asarray(qm._qmm_shard_map(jnp.asarray(x), qt, interpret=True))
    ref = np.asarray(qm._qmm_jnp(jnp.asarray(x), qt))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() < 3e-2 * scale


def test_load_state_preserves_kv_sharding():
    """Session restore on a mesh engine must re-shard the rebuilt cache
    (it otherwise materializes whole on device 0)."""
    import jax.numpy as jnp

    from ctransformers_tpu.engine.engine import Engine

    mesh = pmesh.make_mesh(8, data=2)
    spec = LLAMA_TINY.replace(n_head=4, n_head_kv=4)
    params = random_params(spec, seed=1)
    eng = Engine(spec, params, batch_size=2, mesh=mesh)
    eng.eval([1, 2, 3, 4])
    state = eng.save_state()
    before = eng.kv.k.sharding
    eng.load_state(state)
    assert eng.kv.k.sharding.is_equivalent_to(before, eng.kv.k.ndim)
    # and the restored cache still decodes
    eng.eval([4], n_past=3)
    eng.rewind(4)
    assert len(eng.decode(2, temperature=0.0, repetition_penalty=1.0)) == 2


def test_pod_mesh_keeps_tp_host_local():
    """make_pod_mesh: every model-axis (TP) group lives inside one host's
    device block, so TP collectives ride ICI; data spans hosts (DCN)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = pmesh.make_pod_mesh(n_hosts=2, devices_per_host=4)
    assert mesh.shape == {"data": 2, "model": 4}
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    for h in range(2):
        assert list(mesh.devices[h]) == list(devs[h])


def test_pod_mesh_sharded_forward_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    spec = LLAMA_TINY
    params = random_params(spec, seed=3)
    tokens = jnp.arange(6, dtype=jnp.int32).reshape(1, 6) % spec.n_vocab

    kv = KVCache.create(spec, batch=2)
    ref, _, _ = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c))(
        params, jnp.broadcast_to(tokens, (2, 6)), jnp.int32(0), kv
    )

    mesh = pmesh.make_pod_mesh(n_hosts=2, devices_per_host=4)
    sp = pmesh.shard_params(params, mesh)
    skv = pmesh.shard_kv(KVCache.create(spec, batch=2), spec, mesh)
    toks = jax.device_put(
        jnp.broadcast_to(tokens, (2, 6)), pmesh.token_sharding(mesh)
    )
    tp, _, _ = jax.jit(lambda p, t, n, c: forward(spec, p, t, n, c))(
        sp, toks, jnp.int32(0), skv
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(tp), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("wtype_name", ["F16", "Q8_0"])
def test_real_gguf_file_engine_on_mesh(tmp_path, wtype_name):
    """The loader -> repack -> shard_params -> decode seam on a REAL GGUF
    file: tensors come in at file shapes (lane-padded N, odd n_ff), get
    repacked to QTensors/dense planes, sharded over an 8-way TP mesh, and
    must decode token-exactly like the single-device engine."""
    from .fixtures import build_llama_gguf
    from ctransformers_tpu.engine.engine import Engine
    from ctransformers_tpu.formats.quants import GGMLType
    from ctransformers_tpu.models.registry import load_model

    path = str(tmp_path / "tiny.gguf")
    # n_ff=96: npad -> 128, logical 96 indivisible by tp=8 on purpose
    build_llama_gguf(
        path, n_embd=64, n_head=4, n_head_kv=2, n_ff=96,
        wtype=getattr(GGMLType, wtype_name), seed=11,
    )
    bundle = load_model(path, "gguf")

    ref = Engine(bundle.spec, bundle.params)
    ref.eval([1, 5, 9])
    ref_logits = np.array(ref.logits)
    ref_toks = ref.decode(5, temperature=0.0, repetition_penalty=1.0)

    mesh = pmesh.make_mesh(8, data=1)
    eng = Engine(bundle.spec, bundle.params, mesh=mesh)
    eng.eval([1, 5, 9])
    np.testing.assert_allclose(eng.logits, ref_logits, atol=2e-4, rtol=2e-4)
    assert eng.decode(5, temperature=0.0, repetition_penalty=1.0) == ref_toks
