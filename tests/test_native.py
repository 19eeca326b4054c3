"""Native C++ repack runtime vs the numpy reference — bit-exact, every
format. Builds the library on demand (skips if no toolchain)."""

import numpy as np
import pytest

from ctransformers_tpu.formats import native
from ctransformers_tpu.formats.quants import (
    GGMLType,
    QUANTIZED_TYPES,
    decompose,
    quantize,
)

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native toolchain unavailable",
)

FORMATS = [GGMLType(t).name for t in sorted(QUANTIZED_TYPES)]


@pytest.mark.parametrize("kind", FORMATS)
def test_native_repack_bit_exact(kind):
    t = GGMLType[kind]
    rng = np.random.RandomState(7)
    rows, cols = 24, 512
    w = (rng.randn(rows, cols) * 0.3).astype(np.float32)
    buf = quantize(w, t)

    q, s, m, group = decompose(buf, t, rows * cols)
    q_np = q.reshape(rows, cols).T
    s_np = s.reshape(rows, cols // group).T
    m_np = m.reshape(rows, cols // group).T if m is not None else None

    out = native.native_repack(buf, int(t), rows, cols)
    assert out is not None
    q_c, s_c, m_c, g_c = out
    assert g_c == group
    np.testing.assert_array_equal(q_c, q_np)
    np.testing.assert_array_equal(s_c, s_np)
    if m_np is None:
        assert m_c is None
    else:
        np.testing.assert_array_equal(m_c, m_np)


def test_native_pack4_matches_numpy():
    rng = np.random.RandomState(8)
    q = rng.randint(-8, 8, size=(256, 64)).astype(np.int8)
    zp = 8
    nib = (q.astype(np.int16) + zp).astype(np.uint8)
    expect = nib[:128] | (nib[128:] << 4)
    got = native.native_pack4(q, zp)
    assert got is not None
    np.testing.assert_array_equal(got, expect)


def test_repack_uses_native_transparently():
    """ops.qmatmul.repack gives identical QTensors either way."""
    import ctransformers_tpu.formats.native as nat_mod
    from ctransformers_tpu.ops.qmatmul import repack

    rng = np.random.RandomState(9)
    rows, cols = 16, 256
    w = (rng.randn(rows, cols) * 0.2).astype(np.float32)
    buf = quantize(w, GGMLType.Q4_K)

    qt_native = repack(buf, GGMLType.Q4_K, rows, cols)
    saved = nat_mod._lib, nat_mod._checked
    nat_mod._lib, nat_mod._checked = None, True  # force numpy path
    try:
        qt_numpy = repack(buf, GGMLType.Q4_K, rows, cols)
    finally:
        nat_mod._lib, nat_mod._checked = saved
    np.testing.assert_array_equal(
        np.asarray(qt_native.qs), np.asarray(qt_numpy.qs)
    )
    np.testing.assert_array_equal(
        np.asarray(qt_native.scales), np.asarray(qt_numpy.scales)
    )
