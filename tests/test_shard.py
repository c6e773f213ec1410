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


def test_sharded_encode_step_matches_single_device():
    """Full band-form sharded encode step == single-device pipeline
    (the same check the driver's dryrun_multichip performs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vc2tpu.core.config import (ColourFormat, EncoderConfig, FrameRate,
                                    Mode)
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline.encoder import Encoder
    from vc2tpu.pipeline.sharded import (make_sharded_decode_step,
                                         make_sharded_encode_step)
    from vc2tpu.slices.layout import slice_bytes_map

    mesh = make_mesh(data=2, space=4)
    H, W, depth = 64, 64, 2
    cfg = EncoderConfig(height=H, width=W, chroma_format=ColourFormat.CF422,
                        kernel=WaveletKernel.LeGall, wavelet_depth=depth,
                        y_size=1, x_size=2, mode=Mode.HQ_CBR,
                        luma_depth=10, chroma_depth=10,
                        frame_rate=FrameRate.FR25,
                        compressed_bytes=H * W // 2, slice_scalar=1)
    step, plane_spec, geo = make_sharded_encode_step(cfg, mesh, batch=2)
    budgets = slice_bytes_map(geo.y_slices, geo.x_slices,
                              cfg.compressed_bytes, 1).ravel()
    rng = np.random.default_rng(3)
    B = 2
    y = jax.device_put(rng.integers(-512, 512, (B, H, W)).astype(np.int32),
                       plane_spec)
    c1 = jax.device_put(rng.integers(-512, 512, (B, H, W // 2)).astype(np.int32),
                        plane_spec)
    c2 = jax.device_put(rng.integers(-512, 512, (B, H, W // 2)).astype(np.int32),
                        plane_spec)
    from jax import numpy as jnp

    bud = jax.device_put(jnp.tile(jnp.asarray(budgets)[None, :], (B, 1)),
                         NamedSharding(mesh, P("data", "space")))
    q_idx, qy, qu, qv = step(y, c1, c2, bud)

    enc = Encoder(cfg)
    for b in range(B):
        ref = enc.encode_picture(Picture(np.asarray(y)[b], np.asarray(c1)[b],
                                         np.asarray(c2)[b], cfg.chroma_format))
        np.testing.assert_array_equal(np.asarray(q_idx)[b],
                                      ref.q_indices.ravel())

    dec = make_sharded_decode_step(cfg.kernel, depth, geo, mesh)
    ry, rc1, rc2 = dec(q_idx, qy, qu, qv)
    assert np.asarray(ry).shape == (B, H, W)
