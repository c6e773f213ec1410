"""Integer lifting wavelet transforms (forward + inverse), JAX-native.

Re-design of the reference's in-place scalar lifting loops
(/root/reference/src/Library/src/WaveletTransform.cpp:478-1265) as
vectorised even/odd-plane arithmetic:

* every lifting pass updates one parity from clamped-shifted views of the
  other parity, so each pass is a pure element-wise expression — exactly
  vectorisable with no sequential dependence;
* a transform level at stride ``s`` gathers the ``x[::s, ::s]`` sub-lattice,
  lifts it horizontally then vertically, and scatters it back — the in-place
  interleaved ("transform order") layout of the reference is preserved so
  slice extraction and subband indexing match the wire format;
* all arithmetic is int32 with arithmetic shifts, matching C semantics.

Each kernel is a list of lifting steps ``(target, sign, taps, add, shift)``;
the inverse transform is the reversed step list with flipped signs, which is
exactly how the reference's inverse loops are arranged.

Edge handling: source indices clamp to [0, n-1] in even/odd index space,
which reproduces the reference's clamped taps (e.g. WaveletTransform.cpp:
495-498, 936-943) including the asymmetric even/odd clamp targets.
"""

from __future__ import annotations

import jax.numpy as jnp

from vc2tpu.core.config import WaveletKernel
from vc2tpu.wavelet.matrices import TRANSFORM_SHIFT, padded_size

# Lifting step: (target_parity, sign, ((offset, coeff), ...), add, shift_bits)
# target 'o': o[i] (sign)= (sum coeff*e[i+off] + add) >> shift
# target 'e': e[i] (sign)= (sum coeff*o[i+off] + add) >> shift
_STEPS = {
    WaveletKernel.LeGall: (
        ("o", -1, ((0, 1), (1, 1)), 1, 1),
        ("e", +1, ((-1, 1), (0, 1)), 2, 2),
    ),
    WaveletKernel.DD97: (
        ("o", -1, ((-1, -1), (0, 9), (1, 9), (2, -1)), 8, 4),
        ("e", +1, ((-1, 1), (0, 1)), 2, 2),
    ),
    WaveletKernel.DD137: (
        ("o", -1, ((-1, -1), (0, 9), (1, 9), (2, -1)), 8, 4),
        ("e", +1, ((-2, -1), (-1, 9), (0, 9), (1, -1)), 16, 5),
    ),
    WaveletKernel.Haar0: (
        ("o", -1, ((0, 1),), 0, 0),
        ("e", +1, ((0, 1),), 1, 1),
    ),
    WaveletKernel.Fidelity: (
        ("e", +1, ((-4, -8), (-3, 21), (-2, -46), (-1, 161),
                   (0, 161), (1, -46), (2, 21), (3, -8)), 128, 8),
        ("o", -1, ((-3, -2), (-2, 10), (-1, -25), (0, 81),
                   (1, 81), (2, -25), (3, 10), (4, -2)), 128, 8),
    ),
    WaveletKernel.Daub97: (
        ("o", -1, ((0, 6497), (1, 6497)), 2048, 12),
        ("e", -1, ((-1, 217), (0, 217)), 2048, 12),
        ("o", +1, ((0, 3616), (1, 3616)), 2048, 12),
        ("e", +1, ((-1, 1817), (0, 1817)), 2048, 12),
    ),
    WaveletKernel.NullKernel: (),
}
_STEPS[WaveletKernel.Haar1] = _STEPS[WaveletKernel.Haar0]


def _axslice(a, lo: int, n: int, axis: int):
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(lo, lo + n)
    return a[tuple(idx)]


def _apply_steps(e, o, steps, axis: int, invert: bool):
    """One predict/update ladder. The reference clamps tap indices to
    [0, n-1] (WaveletTransform.cpp:495-498); edge-replication padding is the
    same arithmetic, and padding ONCE per step lets every tap be a fused
    slice of the padded buffer instead of its own concatenated copy."""
    if invert:
        steps = [(t, -s, taps, add, sh) for (t, s, taps, add, sh) in reversed(steps)]
    for target, sign, taps, add, sh in steps:
        src = e if target == "o" else o
        n = src.shape[axis]
        lo = min(0, min(off for off, _ in taps))
        hi = max(0, max(off for off, _ in taps))
        if lo or hi:
            pad = [(0, 0)] * src.ndim
            pad[axis] = (-lo, hi)
            padded = jnp.pad(src, pad, mode="edge")
        else:
            padded = src
        acc = None
        for off, coeff in taps:
            term = coeff * _axslice(padded, off - lo, n, axis)
            acc = term if acc is None else acc + term
        if sh:
            delta = (acc + add) >> sh
        else:
            delta = acc
        if target == "o":
            o = o + sign * delta
        else:
            e = e + sign * delta
    return e, o


def _interleave(e, o, axis: int):
    stacked = jnp.stack([e, o], axis=axis + 1 if axis >= 0 else e.ndim + axis + 1)
    shape = list(e.shape)
    ax = axis if axis >= 0 else e.ndim + axis
    shape[ax] *= 2
    return stacked.reshape(shape)


def _split(v, axis: int):
    idx_e = [slice(None)] * v.ndim
    idx_o = [slice(None)] * v.ndim
    idx_e[axis] = slice(0, None, 2)
    idx_o[axis] = slice(1, None, 2)
    return v[tuple(idx_e)], v[tuple(idx_o)]


def lift_level(v, kernel: WaveletKernel, invert: bool = False):
    """One in-place transform level over the final two axes of ``v``
    (leading axes are batch). Forward: horizontal then vertical passes with
    the accuracy shift applied first; inverse mirrors with rounded unshift
    (reference WaveletTransform.cpp:595-698 for the LeGall instance)."""
    steps = _STEPS[kernel]
    shift = TRANSFORM_SHIFT[kernel]
    h_axis = v.ndim - 1
    v_axis = v.ndim - 2
    if not invert:
        if shift:
            v = v << shift
        e, o = _split(v, h_axis)
        e, o = _apply_steps(e, o, steps, h_axis, invert=False)
        v = _interleave(e, o, h_axis)
        e, o = _split(v, v_axis)
        e, o = _apply_steps(e, o, steps, v_axis, invert=False)
        v = _interleave(e, o, v_axis)
        return v
    e, o = _split(v, v_axis)
    e, o = _apply_steps(e, o, steps, v_axis, invert=True)
    v = _interleave(e, o, v_axis)
    e, o = _split(v, h_axis)
    e, o = _apply_steps(e, o, steps, h_axis, invert=True)
    v = _interleave(e, o, h_axis)
    if shift:
        v = (v + (1 << (shift - 1))) >> shift
    return v


def wavelet_pad(plane, depth: int):
    """Edge-replication pad to multiples of 2**depth
    (reference WaveletTransform.cpp:79-94)."""
    h, w = plane.shape[-2], plane.shape[-1]
    ph, pw = padded_size(h, depth), padded_size(w, depth)
    if (ph, pw) == (h, w):
        return plane
    pad = [(0, 0)] * (plane.ndim - 2) + [(0, ph - h), (0, pw - w)]
    return jnp.pad(plane, pad, mode="edge")


def _get_sub(x, s: int):
    """x[..., ::s, ::s] by recursive halving (s is a power of two); the
    stride-2 slices lower to cheap shuffles where a general strided gather
    does not."""
    if s == 1:
        return x
    return _get_sub(x[..., 0::2, 0::2], s // 2)

def _set_sub(x, v, s: int):
    """x with the (::s, ::s) sub-lattice replaced by ``v``. Recursive
    stride-2 split + stack-interleave: a strided scatter
    (`.at[::s, ::s].set`) costs ~50x more than the lifting arithmetic on
    TPU, while this pattern fuses."""
    if s == 1:
        return v
    er = x[..., 0::2, :]
    if s > 2:
        sub = _set_sub(er[..., 0::2], v, s // 2)
    else:
        sub = v
    er = _interleave(sub, er[..., 1::2], er.ndim - 1)
    return _interleave(er, x[..., 1::2, :], x.ndim - 2)


def forward_plane(plane, kernel: WaveletKernel, depth: int):
    """Forward DWT of an already-padded plane, in-place transform layout
    (reference WaveletTransform.cpp:262-281). Levels run on the ``::2**level``
    sub-lattice of low-pass samples."""
    x = jnp.asarray(plane, jnp.int32)
    for level in range(depth):
        s = 1 << level
        if s == 1:
            x = lift_level(x, kernel)
        else:
            v = lift_level(_get_sub(x, s), kernel)
            x = _set_sub(x, v, s)
    return x


def inverse_plane(transform, kernel: WaveletKernel, depth: int):
    """Inverse DWT, counterpart of reference WaveletTransform.cpp:321-342.
    Caller crops padding afterwards."""
    x = jnp.asarray(transform, jnp.int32)
    for level in range(depth - 1, -1, -1):
        s = 1 << level
        if s == 1:
            x = lift_level(x, kernel, invert=True)
        else:
            v = lift_level(_get_sub(x, s), kernel, invert=True)
            x = _set_sub(x, v, s)
    return x


def coefficient_bound(kernel: WaveletKernel, depth: int, input_max: int) -> int:
    """Safe upper bound on |coefficient| after the forward transform,
    propagated step-by-step through the lifting ladder (both axes, all
    levels, including the accuracy shift). Used to pick the narrowest exact
    transfer dtype."""
    steps = _STEPS[kernel]
    shift = TRANSFORM_SHIFT[kernel]
    m = int(input_max)
    for _ in range(depth):
        m <<= shift
        for _axis in range(2):
            bounds = {"e": m, "o": m}
            for target, _sign, taps, add, sh in steps:
                src = "e" if target == "o" else "o"
                acc = sum(abs(c) for _off, c in taps) * bounds[src] + add
                bounds[target] = bounds[target] + (acc >> sh if sh else acc)
            m = max(bounds.values())
    return m


# --- Mallat (contiguous-subband) form ---------------------------------------
# The slice-lane serialisation order is subband-major (slices/layout
# .lane_order), so the hot paths keep subbands as separate contiguous arrays:
# no strided sub-lattice access at all. Band order matches lane_order /
# quant_matrix indexing: [LL, then per level coarsest->finest HL, LH, HH].
# The interleaved in-place layout of the reference exists only for the
# compatibility taps (bands_to_inplace / inplace_to_bands).

def forward_bands(plane, kernel: WaveletKernel, depth: int):
    """Forward DWT of an already-padded plane as a list of subband arrays."""
    x = jnp.asarray(plane, jnp.int32)
    steps = _STEPS[kernel]
    shift = TRANSFORM_SHIFT[kernel]
    h_axis, v_axis = x.ndim - 1, x.ndim - 2
    fine_to_coarse = []
    for _ in range(depth):
        if shift:
            x = x << shift
        he, ho = _split(x, h_axis)
        he, ho = _apply_steps(he, ho, steps, h_axis, invert=False)
        ll, lh = _apply_steps(*_split(he, v_axis), steps, v_axis, invert=False)
        hl, hh = _apply_steps(*_split(ho, v_axis), steps, v_axis, invert=False)
        fine_to_coarse.append((hl, lh, hh))
        x = ll
    bands = [x]
    for lvl in reversed(fine_to_coarse):
        bands.extend(lvl)
    return bands


def inverse_bands(bands, kernel: WaveletKernel, depth: int):
    """Inverse DWT from subband arrays back to the spatial plane."""
    steps = _STEPS[kernel]
    shift = TRANSFORM_SHIFT[kernel]
    x = bands[0]
    h_axis, v_axis = x.ndim - 1, x.ndim - 2
    for level in range(depth):                      # coarsest -> finest
        hl, lh, hh = bands[1 + 3 * level:4 + 3 * level]
        ve, vo = _apply_steps(x, lh, steps, v_axis, invert=True)
        he = _interleave(ve, vo, v_axis)
        ve, vo = _apply_steps(hl, hh, steps, v_axis, invert=True)
        ho = _interleave(ve, vo, v_axis)
        he, ho = _apply_steps(he, ho, steps, h_axis, invert=True)
        x = _interleave(he, ho, h_axis)
        if shift:
            x = (x + (1 << (shift - 1))) >> shift
    return x


def band_dims(padded_h: int, padded_w: int, depth: int):
    """(h, w) of each band in forward_bands order."""
    dims = [(padded_h >> depth, padded_w >> depth)]
    for level in range(1, depth + 1):
        s = 1 << (depth + 1 - level)
        dims.extend([(padded_h // s, padded_w // s)] * 3)
    return dims


def bands_to_inplace(bands, depth: int):
    """Assemble the reference's interleaved in-place transform layout
    (compat taps; reference split_into_subbands inverse,
    WaveletTransform.cpp:428-476)."""
    x = bands[0]
    for level in range(depth):
        hl, lh, hh = bands[1 + 3 * level:4 + 3 * level]
        even = _interleave(x, hl, x.ndim - 1)
        odd = _interleave(lh, hh, x.ndim - 1)
        x = _interleave(even, odd, x.ndim - 2)
    return x


def inplace_to_bands(x, depth: int):
    """Split the interleaved layout into subband arrays (compat paths)."""
    fine_to_coarse = []
    for _ in range(depth):
        er, orow = _split(x, x.ndim - 2)
        ll, hl = _split(er, x.ndim - 1)
        lh, hh = _split(orow, x.ndim - 1)
        fine_to_coarse.append((hl, lh, hh))
        x = ll
    bands = [x]
    for lvl in reversed(fine_to_coarse):
        bands.extend(lvl)
    return bands


def bands_to_lanes(bands, y_slices: int, x_slices: int):
    """Subband arrays -> (..., nSlices, L) lanes in serialisation order
    (band-major, raster within each band's slice sub-block) — pure
    reshape/transpose, replacing the permutation gather of plane_to_lanes."""
    parts = []
    for b in bands:
        h, w = b.shape[-2], b.shape[-1]
        sh, sw = h // y_slices, w // x_slices
        lead = b.shape[:-2]
        t = b.reshape(lead + (y_slices, sh, x_slices, sw))
        axes = tuple(range(len(lead))) + tuple(len(lead) + a for a in (0, 2, 1, 3))
        t = t.transpose(axes)
        parts.append(t.reshape(lead + (y_slices * x_slices, sh * sw)))
    return jnp.concatenate(parts, axis=-1)


def lanes_to_bands(lanes, y_slices: int, x_slices: int, dims):
    """Inverse of bands_to_lanes; ``dims`` from band_dims."""
    bands = []
    pos = 0
    lead = lanes.shape[:-2]
    for (h, w) in dims:
        sh, sw = h // y_slices, w // x_slices
        L = sh * sw
        t = lanes[..., pos:pos + L].reshape(lead + (y_slices, x_slices, sh, sw))
        axes = tuple(range(len(lead))) + tuple(len(lead) + a for a in (0, 2, 1, 3))
        bands.append(t.transpose(axes).reshape(lead + (h, w)))
        pos += L
    return bands


def forward_picture(picture, kernel: WaveletKernel, depth: int):
    """Pad + forward transform all three planes
    (reference WaveletTransform.cpp:1267-1279)."""
    from vc2tpu.core.picture import Picture

    return Picture(
        forward_plane(wavelet_pad(picture.y, depth), kernel, depth),
        forward_plane(wavelet_pad(picture.c1, depth), kernel, depth),
        forward_plane(wavelet_pad(picture.c2, depth), kernel, depth),
        picture.chroma_format,
    )


def inverse_picture(transform, kernel: WaveletKernel, depth: int, geometry):
    """Inverse transform all planes and crop to ``geometry``
    (reference WaveletTransform.cpp:1281-1292)."""
    from vc2tpu.core.picture import Picture

    y = inverse_plane(transform.y, kernel, depth)[..., : geometry.luma_height,
                                                  : geometry.luma_width]
    c1 = inverse_plane(transform.c1, kernel, depth)[..., : geometry.chroma_height,
                                                    : geometry.chroma_width]
    c2 = inverse_plane(transform.c2, kernel, depth)[..., : geometry.chroma_height,
                                                    : geometry.chroma_width]
    return Picture(y, c1, c2, transform.chroma_format)
