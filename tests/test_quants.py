"""Golden tests for the GGML block-quant codecs.

Two layers of checking:
  1. Self-consistency: quantize -> dequantize round trips with bounded error.
  2. Oracle parity: bit-exact agreement with the reference C implementation
     (compiled at test time from the read-only reference tree; skipped if a
     C toolchain is unavailable).
"""

import numpy as np
import pytest

from ctransformers_tpu.formats import quants as Q

from .oracle import get_oracle, ref_dequantize, ref_quantize

ALL_QUANTS = [
    Q.GGMLType.Q4_0,
    Q.GGMLType.Q4_1,
    Q.GGMLType.Q5_0,
    Q.GGMLType.Q5_1,
    Q.GGMLType.Q8_0,
    Q.GGMLType.Q8_1,
    Q.GGMLType.Q2_K,
    Q.GGMLType.Q3_K,
    Q.GGMLType.Q4_K,
    Q.GGMLType.Q5_K,
    Q.GGMLType.Q6_K,
    Q.GGMLType.Q8_K,
]

BASIC = ALL_QUANTS[:6]
KQUANTS = ALL_QUANTS[6:]

# max bpw-dependent relative round-trip error (loose sanity bound)
RTOL = {
    Q.GGMLType.Q4_0: 0.15,
    Q.GGMLType.Q4_1: 0.10,
    Q.GGMLType.Q5_0: 0.08,
    Q.GGMLType.Q5_1: 0.05,
    Q.GGMLType.Q8_0: 0.01,
    Q.GGMLType.Q8_1: 0.01,
    Q.GGMLType.Q2_K: 0.30,
    Q.GGMLType.Q3_K: 0.20,
    Q.GGMLType.Q4_K: 0.15,
    Q.GGMLType.Q5_K: 0.08,
    Q.GGMLType.Q6_K: 0.04,
    Q.GGMLType.Q8_K: 0.01,
}


def _rand(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.3).astype(np.float32)


def test_block_sizes():
    # format properties from BASELINE.md / ggml.c:888-933 / k_quants.h
    assert Q.type_size(Q.GGMLType.Q4_0) == 18
    assert Q.type_size(Q.GGMLType.Q4_1) == 20
    assert Q.type_size(Q.GGMLType.Q5_0) == 22
    assert Q.type_size(Q.GGMLType.Q5_1) == 24
    assert Q.type_size(Q.GGMLType.Q8_0) == 34
    assert Q.type_size(Q.GGMLType.Q2_K) == 84
    assert Q.type_size(Q.GGMLType.Q3_K) == 110
    assert Q.type_size(Q.GGMLType.Q4_K) == 144
    assert Q.type_size(Q.GGMLType.Q5_K) == 176
    assert Q.type_size(Q.GGMLType.Q6_K) == 210
    assert Q.type_size(Q.GGMLType.Q8_K) == 292


@pytest.mark.parametrize("t", ALL_QUANTS)
def test_round_trip(t):
    n = Q.block_size(t) * 8
    x = _rand(n)
    enc = Q.quantize(x, t)
    assert enc.size == Q.row_nbytes(t, n)
    dec = Q.dequantize(enc, t, n)
    rmse = np.sqrt(np.mean((dec - x) ** 2))
    scale = np.sqrt(np.mean(x**2))
    assert rmse / scale < RTOL[t], f"{t.name}: rmse ratio {rmse / scale}"


def test_f16_f32_identity():
    x = _rand(64)
    assert np.array_equal(Q.dequantize(Q.quantize(x, Q.GGMLType.F32), Q.GGMLType.F32, 64), x)
    x16 = Q.dequantize(Q.quantize(x, Q.GGMLType.F16), Q.GGMLType.F16, 64)
    np.testing.assert_allclose(x16, x, atol=1e-2)


needs_oracle = pytest.mark.skipif(
    get_oracle() is None, reason="reference oracle unavailable"
)


@needs_oracle
@pytest.mark.parametrize("t", ALL_QUANTS)
def test_dequant_matches_reference_on_reference_blocks(t):
    """Our decoder must bit-exactly match the reference on its own output."""
    from .oracle import ref_has_to_float
    if not ref_has_to_float(int(t)):
        pytest.skip("reference has no to_float for this type")
    n = Q.block_size(t) * 16
    x = _rand(n, seed=1)
    enc = ref_quantize(x, int(t))
    ours = Q.dequantize(enc, t, n)
    ref = ref_dequantize(enc, int(t), n)
    np.testing.assert_array_equal(ours, ref, err_msg=t.name)


@needs_oracle
@pytest.mark.parametrize("t", ALL_QUANTS)
def test_dequant_matches_reference_on_our_blocks(t):
    """The reference decoder must agree with ours on blocks we encode."""
    from .oracle import ref_has_to_float
    if not ref_has_to_float(int(t)):
        pytest.skip("reference has no to_float for this type")
    n = Q.block_size(t) * 16
    x = _rand(n, seed=2)
    enc = Q.quantize(x, t)
    ours = Q.dequantize(enc, t, n)
    ref = ref_dequantize(bytes(enc), int(t), n)
    np.testing.assert_array_equal(ours, ref, err_msg=t.name)


@needs_oracle
@pytest.mark.parametrize("t", BASIC)
def test_quantize_bit_exact_basic(t):
    """Basic formats: our encoder is byte-identical to the reference."""
    n = Q.block_size(t) * 16
    x = _rand(n, seed=3)
    ours = Q.quantize(x, t)
    ref = np.frombuffer(ref_quantize(x, int(t)), np.uint8)
    np.testing.assert_array_equal(ours, ref, err_msg=t.name)


@needs_oracle
@pytest.mark.parametrize("t", KQUANTS)
def test_quantize_kquant_quality(t):
    """K-quants: our encoder must be as good as the reference (RMSE)."""
    from .oracle import ref_has_to_float
    if not ref_has_to_float(int(t)):
        pytest.skip("reference has no to_float for this type")
    n = Q.block_size(t) * 16
    x = _rand(n, seed=4)
    ours = Q.dequantize(Q.quantize(x, t), t, n)
    ref = ref_dequantize(ref_quantize(x, int(t)), int(t), n)
    rmse_ours = np.sqrt(np.mean((ours - x) ** 2))
    rmse_ref = np.sqrt(np.mean((ref - x) ** 2))
    assert rmse_ours <= rmse_ref * 1.05, f"{t.name}: {rmse_ours} vs ref {rmse_ref}"


@needs_oracle
@pytest.mark.parametrize("t", KQUANTS)
def test_quantize_kquant_flat_groups(t):
    """Flat (all-equal) groups must return scale 0 like the reference
    (k_quants.c:194-198) — an inflated zero-group scale poisons the
    superblock max and wipes out the other groups' precision."""
    from .oracle import ref_has_to_float

    if not ref_has_to_float(int(t)):
        pytest.skip("reference has no to_float for this type")
    n = Q.block_size(t) * 4
    rng = np.random.RandomState(8)
    x = (rng.randn(n) * 0.01).astype(np.float32)
    x[:16] = 0.0  # one flat group inside the first superblock
    x[64:96] = 0.0
    ours = Q.dequantize(Q.quantize(x, t), t, n)
    ref = ref_dequantize(ref_quantize(x, int(t)), int(t), n)
    rmse_ours = np.sqrt(np.mean((ours - x) ** 2))
    rmse_ref = np.sqrt(np.mean((ref - x) ** 2))
    assert rmse_ours <= rmse_ref * 1.05, f"{t.name}: {rmse_ours} vs {rmse_ref}"
    # all-zero input encodes to exact zeros
    z = Q.dequantize(Q.quantize(np.zeros(n, np.float32), t), t, n)
    assert np.all(z == 0), t.name
