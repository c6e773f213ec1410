"""Fused native LD decode == the lane-path decode, bit for bit.

ld_decode_to_transform_host (bounded gang VLC + dequant straight into the
transform planes + LL prediction recurrence) must reproduce exactly what
decode_ld_slices -> lanes_to_plane -> ld_dequantise_picture produces,
including bounded-region truncation semantics on adversarial payloads."""

import numpy as np
import pytest

from vc2tpu._native.bridge import native
from vc2tpu.core.config import ColourFormat
from vc2tpu.slices import layout
from vc2tpu.slices.ld import decode_ld_slices, encode_ld_slices
from vc2tpu.wavelet import matrices
from vc2tpu.core.config import WaveletKernel

pytestmark = pytest.mark.skipif(native is None,
                                reason="needs the native host codec")


def _geo(ys, xs, sh, sw, csh, csw, depth):
    from vc2tpu.pipeline.encoder import SliceGeometry

    return SliceGeometry(ys, xs, (ys * sh, xs * sw), (ys * csh, xs * csw),
                         (sh, sw), (csh, csw))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("kernel,depth", [(WaveletKernel.LeGall, 2),
                                          (WaveletKernel.Haar1, 1)])
def test_fused_equals_lane_path(seed, kernel, depth):
    from vc2tpu.pipeline import ld as ld_pipeline

    rng = np.random.default_rng(seed)
    ts = 1 << depth
    ys, xs = 6, 8
    sh = sw = 2 * ts
    csh, csw = 2 * ts, ts
    geo = _geo(ys, xs, sh, sw, csh, csw, depth)
    n = ys * xs
    Ly, Lc = sh * sw, csh * csw
    qmatrix = matrices.quant_matrix(kernel, depth)
    qm_block_y = ld_pipeline._qm_block(sh, sw, depth, qmatrix)
    qm_block_c = ld_pipeline._qm_block(csh, csw, depth, qmatrix)

    # random quantised lanes + q map, then a REAL LD payload
    q_idx = rng.integers(0, 60, n).astype(np.int32)
    lanes_y = rng.integers(-300, 300, (n, Ly)).astype(np.int32)
    lanes_u = rng.integers(-100, 100, (n, Lc)).astype(np.int32)
    lanes_v = rng.integers(-100, 100, (n, Lc)).astype(np.int32)
    lanes_y[rng.random((n, Ly)) < 0.5] = 0       # realistic zero runs
    lanes_u[rng.random((n, Lc)) < 0.6] = 0
    lanes_v[rng.random((n, Lc)) < 0.6] = 0
    sizes = layout.slice_bytes_map(ys, xs, n * (8 + 2 * (Ly + 2 * Lc)),
                                   1).ravel()
    # the writer truncates codes at region bounds exactly as the reference
    payload_b, _ = encode_ld_slices(q_idx, lanes_y, lanes_u, lanes_v, sizes)
    payload = np.frombuffer(payload_b, np.uint8)

    # lane path
    q2, dly, dlu, dlv, _ = decode_ld_slices(payload, sizes, (Ly, Lc))
    from vc2tpu.core.picture import Picture

    quantised = Picture(
        layout.lanes_to_plane(dly, ys, xs, sh, sw, depth),
        layout.lanes_to_plane(dlu, ys, xs, csh, csw, depth),
        layout.lanes_to_plane(dlv, ys, xs, csh, csw, depth),
        ColourFormat.CF422)
    want = ld_pipeline.ld_dequantise_picture(quantised, q2, qm_block_y,
                                             qm_block_c, geo, depth)

    # fused path
    q3, got = ld_pipeline.ld_decode_to_transform_host(
        payload, sizes, geo, depth, qmatrix, qm_block_y, qm_block_c,
        ColourFormat.CF422)
    np.testing.assert_array_equal(q3, q2)
    np.testing.assert_array_equal(got.y, np.asarray(want.y))
    np.testing.assert_array_equal(got.c1, np.asarray(want.c1))
    np.testing.assert_array_equal(got.c2, np.asarray(want.c2))


def test_fused_corrupt_payload_matches_lane_path():
    """Random byte corruption (in-length payload) must decode identically
    through both paths — the bounded 1-fill semantics are the contract."""
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline import ld as ld_pipeline

    rng = np.random.default_rng(9)
    depth, kernel = 2, WaveletKernel.LeGall
    ts = 1 << depth
    ys, xs = 4, 4
    sh = sw = csh = csw = 2 * ts
    geo = _geo(ys, xs, sh, sw, csh, csw, depth)
    n = ys * xs
    Ly, Lc = sh * sw, csh * csw
    qmatrix = matrices.quant_matrix(kernel, depth)
    qm_block_y = ld_pipeline._qm_block(sh, sw, depth, qmatrix)
    qm_block_c = ld_pipeline._qm_block(csh, csw, depth, qmatrix)
    sizes = layout.slice_bytes_map(ys, xs, n * 25, 1).ravel()
    for _trial in range(8):
        payload = rng.integers(0, 256, int(sizes.sum()),
                               dtype=np.uint8)      # pure noise payload
        q2, dly, dlu, dlv, _ = decode_ld_slices(payload, sizes, (Ly, Lc))
        quantised = Picture(
            layout.lanes_to_plane(dly, ys, xs, sh, sw, depth),
            layout.lanes_to_plane(dlu, ys, xs, csh, csw, depth),
            layout.lanes_to_plane(dlv, ys, xs, csh, csw, depth),
            ColourFormat.CF422)
        want = ld_pipeline.ld_dequantise_picture(quantised, q2, qm_block_y,
                                                 qm_block_c, geo, depth)
        q3, got = ld_pipeline.ld_decode_to_transform_host(
            payload, sizes, geo, depth, qmatrix, qm_block_y, qm_block_c,
            ColourFormat.CF422)
        np.testing.assert_array_equal(q3, q2)
        np.testing.assert_array_equal(got.y, np.asarray(want.y))
        np.testing.assert_array_equal(got.c1, np.asarray(want.c1))
        np.testing.assert_array_equal(got.c2, np.asarray(want.c2))
