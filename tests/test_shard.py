"""Sharded DWT == unsharded DWT, exactly (ints), on a virtual CPU mesh."""

import jax
import numpy as np
import pytest

from vc2tpu.core.config import WaveletKernel
from vc2tpu.shard.halo import sharded_forward_plane, sharded_inverse_plane
from vc2tpu.shard.mesh import make_mesh
from vc2tpu.wavelet import lifting

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

KERNELS = [WaveletKernel.LeGall, WaveletKernel.Haar1, WaveletKernel.DD97,
           WaveletKernel.DD137, WaveletKernel.Fidelity, WaveletKernel.Daub97]


@pytest.mark.parametrize("kernel", KERNELS, ids=[k.name for k in KERNELS])
@pytest.mark.parametrize("depth", [1, 2])
@pytest.mark.parametrize("space", [2, 4, 8])
def test_sharded_forward_matches(kernel, depth, space):
    mesh = make_mesh(data=1, space=space)
    rng = np.random.default_rng(0)
    x = rng.integers(-512, 512, (space * 16, 32)).astype(np.int32)
    ref = np.asarray(lifting.forward_plane(x, kernel, depth))
    got = np.asarray(sharded_forward_plane(x, mesh, kernel, depth))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("kernel", [WaveletKernel.LeGall, WaveletKernel.Fidelity])
def test_sharded_inverse_matches(kernel):
    mesh = make_mesh(data=1, space=4)
    rng = np.random.default_rng(1)
    t = rng.integers(-2048, 2048, (64, 48)).astype(np.int32)
    ref = np.asarray(lifting.inverse_plane(t, kernel, 2))
    got = np.asarray(sharded_inverse_plane(t, mesh, kernel, 2))
    np.testing.assert_array_equal(got, ref)


def test_sharded_roundtrip_with_data_axis():
    mesh = make_mesh(data=2, space=4)
    rng = np.random.default_rng(2)
    x = rng.integers(-512, 512, (2, 32, 32)).astype(np.int32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space", None)))
    t = sharded_forward_plane(xs, mesh, WaveletKernel.LeGall, 2)
    r = np.asarray(sharded_inverse_plane(t, mesh, WaveletKernel.LeGall, 2))
    np.testing.assert_array_equal(r, x)
