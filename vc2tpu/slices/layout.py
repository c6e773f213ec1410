"""Slice-grid layout: static lane permutations and byte budgets.

The reference walks each slice's subbands with nested scalar loops
(split_into_subbands, /root/reference/src/Library/src/WaveletTransform.cpp:
428-476, and the per-slice serialisation loops in src/Slices.cpp). Here the
same traversal becomes a *static permutation* computed once per geometry:

* a picture plane in in-place transform layout reshapes to
  (ySlices, sliceH, xSlices, sliceW) -> (nSlices, sliceH*sliceW);
* ``lane_order`` maps serialisation position -> flat offset inside the
  slice block (subbands in order LL, then HL/LH/HH per level, raster within
  each subband);
* every slice is then a fixed-length int32 lane vector and quantisation /
  VLC sizing / packing batch over all slices at once.

Uniform slice sizes are guaranteed by the encoder's validity check
(sliceSizeIsValid) and by the decoder's Slices constructor
(src/Slices.cpp:624-641), both of which divide evenly.
"""

from __future__ import annotations

import functools

import numpy as np

from vc2tpu.core.intmath import rationalise


@functools.lru_cache(maxsize=None)
def lane_order(slice_h: int, slice_w: int, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """(perm, band) — perm[k] is the flat row-major offset within the slice
    block of the k-th serialised coefficient; band[k] is its subband index
    (0 = LL, then HL,LH,HH per level low->high frequency)."""
    order = []
    bands = []
    s = 1 << depth
    yy, xx = np.mgrid[0:slice_h:s, 0:slice_w:s]
    order.append((yy * slice_w + xx).ravel())
    bands.append(np.zeros(order[-1].size, dtype=np.int32))
    band = 1
    for level in range(1, depth + 1):
        stride = 1 << (depth + 1 - level)
        off = stride // 2
        for (oy, ox) in ((0, off), (off, 0), (off, off)):  # HL, LH, HH
            yy, xx = np.mgrid[oy:slice_h:stride, ox:slice_w:stride]
            order.append((yy * slice_w + xx).ravel())
            bands.append(np.full(order[-1].size, band, dtype=np.int32))
            band += 1
    perm = np.concatenate(order).astype(np.int32)
    band_of_lane = np.concatenate(bands).astype(np.int32)
    assert perm.size == slice_h * slice_w
    return perm, band_of_lane


@functools.lru_cache(maxsize=None)
def inverse_lane_order(slice_h: int, slice_w: int, depth: int) -> np.ndarray:
    perm, _ = lane_order(slice_h, slice_w, depth)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return inv


def _transpose_0213(x, n_lead: int):
    """Swap the middle two of the four trailing axes, keeping ``n_lead``
    batch axes; dispatches on the ONE predicate both callers share."""
    axes = tuple(range(n_lead)) + tuple(n_lead + a for a in (0, 2, 1, 3))
    if isinstance(x, np.ndarray):
        return np.transpose(x, axes)
    import jax.numpy as jnp

    return jnp.transpose(x, axes)


def plane_to_slices(plane, y_slices: int, x_slices: int):
    """(H, W) -> (nSlices, sliceH*sliceW) flat row-major slice blocks.
    Works for numpy and jnp arrays; leading batch axes allowed."""
    h, w = plane.shape[-2], plane.shape[-1]
    sh, sw = h // y_slices, w // x_slices
    lead = plane.shape[:-2]
    x = plane.reshape(lead + (y_slices, sh, x_slices, sw))
    x = _transpose_0213(x, len(lead))
    return x.reshape(lead + (y_slices * x_slices, sh * sw))


def slices_to_plane(blocks, y_slices: int, x_slices: int, slice_h: int, slice_w: int):
    """Inverse of plane_to_slices."""
    lead = blocks.shape[:-2]
    x = blocks.reshape(lead + (y_slices, x_slices, slice_h, slice_w))
    x = _transpose_0213(x, len(lead))
    return x.reshape(lead + (y_slices * slice_h, x_slices * slice_w))


def plane_to_lanes(plane, y_slices: int, x_slices: int, depth: int):
    """Full gather: plane -> (nSlices, L) lanes in serialisation order."""
    h, w = plane.shape[-2], plane.shape[-1]
    sh, sw = h // y_slices, w // x_slices
    perm, _ = lane_order(sh, sw, depth)
    blocks = plane_to_slices(plane, y_slices, x_slices)
    return blocks[..., perm]


def lanes_to_plane(lanes, y_slices: int, x_slices: int, slice_h: int,
                   slice_w: int, depth: int):
    """Inverse gather: (nSlices, L) lanes -> plane in transform layout."""
    inv = inverse_lane_order(slice_h, slice_w, depth)
    blocks = lanes[..., inv]
    return slices_to_plane(blocks, y_slices, x_slices, slice_h, slice_w)


@functools.lru_cache(maxsize=64)
def _slice_bytes_map_cached(y_slices: int, x_slices: int, total_bytes: int,
                            scalar: int) -> np.ndarray:
    n = y_slices * x_slices
    num, den = rationalise(total_bytes // scalar - 4 * n, n)
    ratio = num // den
    remainder = num - ratio * den
    # the reference's residue walk (+= remainder, -= den when it spills) is
    # the Bresenham identity bump_k = floor((k+1)r/den) - floor(kr/den)
    k = np.arange(n, dtype=np.int64)
    bump = ((k + 1) * remainder) // den - (k * remainder) // den
    out = ((ratio + bump) * scalar + 4).astype(np.int32)
    out = out.reshape(y_slices, x_slices)
    out.setflags(write=False)
    return out


def slice_bytes_map(y_slices: int, x_slices: int, total_bytes: int,
                    scalar: int) -> np.ndarray:
    """CBR per-slice byte budget by rational residue spread
    (reference src/Library/src/Slices.cpp:28-49). int32[ySlices, xSlices].
    Cached (read-only view) — decode recomputes it per picture."""
    return _slice_bytes_map_cached(int(y_slices), int(x_slices),
                                   int(total_bytes), int(scalar))


def slice_bytes_at(v: int, h: int, y_slices: int, x_slices: int,
                   numerator: int, denominator: int) -> int:
    """Point-wise LD slice size (reference Slices.cpp:18-26)."""
    n = v * x_slices + h
    return ((n + 1) * numerator) // denominator - (n * numerator) // denominator
