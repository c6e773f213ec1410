"""Quantisation matrices, padding and slice-geometry validity.

Host-side pure functions. ``quant_matrix`` reproduces the reference's
float32/float64 mixed arithmetic *exactly*
(/root/reference/src/Library/src/WaveletTransform.cpp:344-423): alpha/beta
are float32 literals, ``scale`` is a double pow() ratio truncated to
float32, gains are float32 products, and the final quantiser offsets are
``floor(4*log2(gain/minGain)+0.5)`` evaluated with a float32 ratio and
double logs.
"""

from __future__ import annotations

import math

import numpy as np

from vc2tpu.core.config import WaveletKernel
from vc2tpu.core.intmath import c_pow, gcd

# (alpha, beta, shift) per kernel — subband gain model constants
# (reference src/Library/src/WaveletTransform.cpp:353-396).
_GAIN_PARAMS = {
    WaveletKernel.DD97: (1.280868846, 0.820572875, 1),
    WaveletKernel.LeGall: (1.224744871, 0.847791248, 1),
    WaveletKernel.DD137: (1.280868846, 0.809253958, 1),
    WaveletKernel.Haar0: (1.414213562, 0.707106871, 0),
    WaveletKernel.Haar1: (1.414213562, 0.707106871, 1),
    WaveletKernel.Fidelity: (0.682408629, 1.367856979, 0),
    WaveletKernel.Daub97: (1.139917028, 0.887168005, 1),
    WaveletKernel.NullKernel: (1.0, 1.0, 0),
}

# Accuracy-bit shift applied by the transform itself per kernel
# (reference src/Library/src/WaveletTransform.cpp:224-260).
TRANSFORM_SHIFT = {
    WaveletKernel.DD97: 1,
    WaveletKernel.LeGall: 1,
    WaveletKernel.DD137: 1,
    WaveletKernel.Haar0: 0,
    WaveletKernel.Haar1: 1,
    WaveletKernel.Fidelity: 0,
    WaveletKernel.Daub97: 1,
    WaveletKernel.NullKernel: 0,
}


def quant_matrix(kernel: WaveletKernel, depth: int) -> np.ndarray:
    """Default quantisation matrix, int32[3*depth+1], ordered
    [LL, (HL,LH,HH) per level from lowest to highest frequency]."""
    if depth < 0:
        raise ValueError("wavelet depth may not be < 0")
    if depth == 0:
        return np.zeros(1, dtype=np.int32)
    alpha32 = np.float32(_GAIN_PARAMS[kernel][0])
    beta32 = np.float32(_GAIN_PARAMS[kernel][1])
    shift = _GAIN_PARAMS[kernel][2]
    a2 = np.float32(alpha32 * alpha32)
    ab = np.float32(alpha32 * beta32)
    b2 = np.float32(beta32 * beta32)
    ll = np.zeros(depth + 1, dtype=np.float32)
    lh = np.zeros(depth + 1, dtype=np.float32)
    hh = np.zeros(depth + 1, dtype=np.float32)
    min_gain = np.float32(np.finfo(np.float32).max)
    for level in range(depth, 0, -1):
        # double pow() ratio, truncated to float32 on assignment
        scale = np.float32(math.pow(float(a2), depth - level)
                           / math.pow(2.0, shift * (depth - level + 1)))
        ll[level] = np.float32(scale * a2)
        lh[level] = np.float32(scale * ab)
        hh[level] = np.float32(scale * b2)
        min_gain = min(min(ll[level], lh[level], hh[level]), min_gain)

    def q(gain: np.float32) -> int:
        ratio = np.float32(gain / min_gain)           # float32 division
        return int(math.floor(4.0 * math.log(float(ratio)) / math.log(2.0) + 0.5))

    out = np.zeros(3 * depth + 1, dtype=np.int32)
    out[0] = q(ll[1])
    idx = 1
    for level in range(1, depth + 1):
        out[idx] = q(lh[level]); idx += 1
        out[idx] = q(lh[level]); idx += 1
        out[idx] = q(hh[level]); idx += 1
    return out


def padded_size(size: int, depth: int) -> int:
    """Pad to a multiple of 2**depth (reference WaveletTransform.cpp:74-77)."""
    cell = c_pow(2, depth)
    return cell * ((size + cell - 1) // cell)


def wavelet_transform_is_possible(depth: int, length_luma: int, length_chroma: int) -> bool:
    """Reference WaveletTransform.cpp:97-111."""
    if depth <= 0 or depth > 31:
        return False
    pl = padded_size(length_luma, depth)
    pc = padded_size(length_chroma, depth)
    g = gcd(pl, pc)
    return g // c_pow(2, depth) >= 2


def slice_size_is_valid(depth: int, length_luma: int, length_chroma: int, n_size: int) -> int:
    """Number of slices along this axis if valid, else 0
    (reference WaveletTransform.cpp:116-136)."""
    if depth <= 0 or depth > 31:
        return 0
    max_slices = min(length_luma, length_chroma) // c_pow(2, depth)
    if n_size <= 0 or n_size > max_slices:
        return 0
    transform_size = n_size * c_pow(2, depth)
    pl = padded_size(length_luma, depth)
    pc = padded_size(length_chroma, depth)
    n_slices = (pl + transform_size - 1) // transform_size
    if (pl % n_slices == 0 and (pl // n_slices) % c_pow(2, depth) == 0
            and pc % n_slices == 0 and (pc // n_slices) % c_pow(2, depth) == 0):
        return n_slices
    return 0


def suggest_wavelet_depth(luma_w: int, luma_h: int, chroma_w: int, chroma_h: int,
                          starting_depth: int | None = None) -> int:
    """Reference WaveletTransform.cpp:139-176."""
    min_dim = min(luma_h, luma_w, chroma_h, chroma_w)
    limit = math.log2(min_dim)
    if starting_depth is None:
        for depth in range(1, int(limit) + 1):
            if (wavelet_transform_is_possible(depth, luma_w, chroma_w)
                    and wavelet_transform_is_possible(depth, luma_h, chroma_h)):
                return depth
    else:
        start = min(starting_depth, int(limit))
        sgn = -1
        for n in range(1, int(2 * limit)):
            depth = start + sgn * ((n + 1) // 2)
            sgn *= -1
            if (wavelet_transform_is_possible(depth, luma_w, chroma_w)
                    and wavelet_transform_is_possible(depth, luma_h, chroma_h)):
                return depth
    raise ValueError("It is not possible to encode this picture because of its dimensions.")


def suggest_slice_size(depth: int, length_luma: int, length_chroma: int,
                       starting: int | None = None) -> int:
    """Reference WaveletTransform.cpp:179-208."""
    if starting is None:
        pl = padded_size(length_luma, depth)
        pc = padded_size(length_chroma, depth)
        return pl // gcd(pl, pc)
    max_slices = min(length_luma, length_chroma) // c_pow(2, depth)
    start = min(starting, max_slices)
    sgn = 1
    for n in range(0, 2 * max_slices):
        test = start + sgn * ((n + 1) // 2)
        sgn *= -1
        if slice_size_is_valid(depth, length_luma, length_chroma, test):
            return test
    raise ValueError("It is not possible to encode this picture because of its dimensions.")
