"""Pallas fused lifting kernel: bit-exact against the XLA lifting path.

On the CPU suite the kernel runs through the Pallas interpreter (pallas_lift
auto-selects); on a real chip (VC2TPU_TEST_TPU=1) it compiles with Mosaic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vc2tpu.core.config import WaveletKernel
from vc2tpu.wavelet import lifting, pallas_lift


@pytest.mark.parametrize("kernel", [k for k in WaveletKernel
                                    if k != WaveletKernel.NullKernel])
@pytest.mark.parametrize("shape", [(128, 256), (192, 384)])
def test_pallas_lift_matches_xla(kernel, shape):
    h, w = shape
    assert pallas_lift.supported(h, w, kernel)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-600, 600, shape), jnp.int32)
    fwd_ref = lifting.lift_level(x, kernel)
    fwd_pal = pallas_lift.lift_level(x, kernel)
    assert np.array_equal(np.asarray(fwd_ref), np.asarray(fwd_pal))
    inv_pal = pallas_lift.lift_level(fwd_pal, kernel, invert=True)
    assert np.array_equal(np.asarray(inv_pal), np.asarray(x))


def test_supported_gating():
    assert not pallas_lift.supported(100, 256, WaveletKernel.LeGall)
    assert not pallas_lift.supported(128, 200, WaveletKernel.LeGall)
    assert not pallas_lift.supported(128, 256, WaveletKernel.NullKernel)
    assert pallas_lift.supported(1088, 1920, WaveletKernel.Fidelity)
