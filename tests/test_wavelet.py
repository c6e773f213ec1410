"""Property tests for the lifting transforms and quant matrices."""

import numpy as np
import pytest

from vc2tpu.core.config import WaveletKernel
from vc2tpu.wavelet import lifting, matrices

KERNELS = list(WaveletKernel)


@pytest.mark.parametrize("kernel", KERNELS, ids=[k.name for k in KERNELS])
@pytest.mark.parametrize("depth", [1, 2, 3])
@pytest.mark.parametrize("shape", [(16, 16), (32, 48), (24, 40)])
def test_forward_inverse_identity(kernel, depth, shape):
    rng = np.random.default_rng(hash((kernel, depth, shape)) % 2**32)
    x = rng.integers(-2048, 2048, shape).astype(np.int32)
    x = np.asarray(lifting.wavelet_pad(x, depth))
    t = lifting.forward_plane(x, kernel, depth)
    r = np.asarray(lifting.inverse_plane(t, kernel, depth))
    np.testing.assert_array_equal(r, x)


def test_wavelet_pad_edge_replication():
    x = np.arange(6, dtype=np.int32).reshape(2, 3)
    p = np.asarray(lifting.wavelet_pad(x, 2))
    assert p.shape == (4, 4)
    np.testing.assert_array_equal(p[0], [0, 1, 2, 2])
    np.testing.assert_array_equal(p[2], p[1])
    np.testing.assert_array_equal(p[3], p[1])


def test_batched_transform_matches_single():
    rng = np.random.default_rng(0)
    x = rng.integers(-512, 512, (3, 16, 24)).astype(np.int32)
    batched = np.asarray(lifting.forward_plane(x, WaveletKernel.LeGall, 2))
    for i in range(3):
        single = np.asarray(lifting.forward_plane(x[i], WaveletKernel.LeGall, 2))
        np.testing.assert_array_equal(batched[i], single)


def test_quant_matrix_legall_d2():
    # values printed by the reference encoder (EncodeStream -v)
    np.testing.assert_array_equal(
        matrices.quant_matrix(WaveletKernel.LeGall, 2), [4, 2, 2, 0, 4, 4, 2])


def test_quant_matrix_depth0_and_negative():
    np.testing.assert_array_equal(matrices.quant_matrix(WaveletKernel.LeGall, 0), [0])
    with pytest.raises(ValueError):
        matrices.quant_matrix(WaveletKernel.LeGall, -1)


@pytest.mark.parametrize("kernel", KERNELS, ids=[k.name for k in KERNELS])
def test_quant_matrix_shapes(kernel):
    for depth in range(1, 5):
        qm = matrices.quant_matrix(kernel, depth)
        assert qm.shape == (3 * depth + 1,)
        assert (qm >= 0).all()
        assert (qm == 0).any()  # min-gain band is the zero point


def test_padded_size():
    assert matrices.padded_size(1080, 2) == 1080
    assert matrices.padded_size(1080, 4) == 1088
    assert matrices.padded_size(1, 3) == 8


def test_slice_size_is_valid():
    # 1920x1080 4:2:2 depth 2, slice unit 2 -> 135x240 grid
    assert matrices.slice_size_is_valid(2, 1080, 1080, 2) == 135
    assert matrices.slice_size_is_valid(2, 1920, 960, 2) == 240
    assert matrices.slice_size_is_valid(2, 1920, 960, 0) == 0
    assert matrices.slice_size_is_valid(0, 1920, 960, 2) == 0


def test_suggesters():
    assert matrices.suggest_slice_size(2, 1920, 960) == 2
    d = matrices.suggest_wavelet_depth(1920, 1080, 960, 1080)
    assert matrices.wavelet_transform_is_possible(d, 1920, 960)
