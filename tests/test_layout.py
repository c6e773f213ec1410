"""Slice-grid lane permutations and byte budget maps."""

import numpy as np

from vc2tpu.slices import layout


def test_lane_order_is_permutation():
    perm, band = layout.lane_order(8, 8, 2)
    assert sorted(perm.tolist()) == list(range(64))
    assert band.min() == 0 and band.max() == 6
    # LL is 2x2=4 lanes at depth 2 of an 8x8 block
    assert (band == 0).sum() == 4
    inv = layout.inverse_lane_order(8, 8, 2)
    np.testing.assert_array_equal(perm[inv[perm]], perm)


def test_plane_lane_roundtrip():
    rng = np.random.default_rng(0)
    plane = rng.integers(-100, 100, (16, 24)).astype(np.int32)
    lanes = layout.plane_to_lanes(plane, 2, 3, 2)
    assert lanes.shape == (6, 64)
    back = layout.lanes_to_plane(lanes, 2, 3, 8, 8, 2)
    np.testing.assert_array_equal(back, plane)


def test_slice_bytes_map_total_and_spread():
    m = layout.slice_bytes_map(8, 8, 2048, 1)
    assert m.shape == (8, 8)
    # each slice gets ratio*scalar+4 or (ratio+1)*scalar+4
    vals = np.unique(m)
    assert len(vals) <= 2
    if len(vals) == 2:
        assert vals[1] - vals[0] == 1


def test_slice_bytes_pointwise_matches_map_total():
    # LD decode uses the rational point-wise formula; totals must agree
    ys, xs, total = 4, 6, 997
    from vc2tpu.core.intmath import rationalise

    num, den = rationalise(total, ys * xs)
    sizes = [layout.slice_bytes_at(v, h, ys, xs, num, den)
             for v in range(ys) for h in range(xs)]
    assert sum(sizes) == total  # telescoping sum covers the budget exactly


def test_guess_geometry():
    """Format guessing from sample counts (reference Picture.cpp:120-150)."""
    from vc2tpu.core.config import ColourFormat
    from vc2tpu.core.picture import guess_geometry

    g = guess_geometry(1920 * 1080 * 2, chroma_format=ColourFormat.CF422)
    assert (g.luma_height, g.luma_width) == (1080, 1920)
    g = guess_geometry(1280 * 720 * 3)           # priority to 4:4:4
    assert g.chroma_format == ColourFormat.CF444
    g = guess_geometry(64 * 32 * 2, 32, 64)      # dims known, format guessed
    assert g.chroma_format == ColourFormat.CF422
    assert guess_geometry(12345) is None
