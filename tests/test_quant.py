"""Quantiser spot checks (values from reference tests/Quantisation.cpp) and
quant/scale properties."""

import numpy as np
import pytest

from vc2tpu.quant import quantiser as q


def _quant1(v, qi):
    return int(np.asarray(q.quant(np.array([v], np.int32),
                                  np.array([qi], np.int32)))[0])


def _scale1(v, qi):
    return int(np.asarray(q.scale(np.array([v], np.int32),
                                  np.array([qi], np.int32)))[0])


def test_quant_spot_values():
    # reference tests/Quantisation.cpp:30-36
    assert _quant1(12, 0) == 12
    assert _quant1(12, 2) == 8
    assert _quant1(-12, 2) == -8
    assert _quant1(-12, -2) == -12


def test_quant_factor_table():
    assert q.quant_factor(0) == 4
    assert q.quant_factor(4) == 8
    assert q.quant_factor(9) == 19
    assert q.quant_factor(-3) == 4
    with pytest.raises(ValueError):
        q.quant_factor(130)


def test_quant_offset():
    assert q.quant_offset(0) == 1
    assert q.quant_offset(1) == 2
    assert q.quant_offset(2) == (q.quant_factor(2) + 1) // 2


@pytest.mark.parametrize("qi", [0, 1, 5, 17, 40, 63, 90, 119])
def test_quant_scale_contraction(qi):
    """scale(quant(v)) stays within one quantisation step of v and
    requantising the reconstruction is idempotent."""
    rng = np.random.default_rng(qi)
    v = rng.integers(-(1 << 20), 1 << 20, 4096).astype(np.int32)
    qv = np.asarray(q.quant(v, np.int32(qi)))
    rec = np.asarray(q.scale(qv, np.int32(qi)))
    qv2 = np.asarray(q.quant(rec, np.int32(qi)))
    np.testing.assert_array_equal(qv, qv2)
    step = q.QUANT_FACTORS[qi]
    assert (np.abs(rec.astype(np.int64) - v) <= step).all()


def test_signed_vlc_numbits():
    vals = np.array([0, 1, -1, 2, 3, 4, 7, 8, -8, 100], np.int32)
    nbits = np.asarray(q.signed_vlc_numbits(vals))
    # 2*bit_length(|v|+1) for nonzero, 1 for zero
    expect = [1, 4, 4, 4, 6, 6, 8, 8, 8, 14]
    np.testing.assert_array_equal(nbits, expect)


def test_dc_predict_scalar():
    a = np.array([[5, 7], [3, 0]], np.int32)
    assert q.dc_predict_scalar(a, 0, 0) == 0
    assert q.dc_predict_scalar(a, 0, 1) == 5
    assert q.dc_predict_scalar(a, 1, 0) == 5
    assert q.dc_predict_scalar(a, 1, 1) == 5  # (5+7+3+1)/3
    b = np.array([[-5, -7], [-3, 0]], np.int32)
    assert q.dc_predict_scalar(b, 1, 1) == -5  # C trunc of (-15-1)/3
