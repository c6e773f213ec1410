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


def _shifted(a, k: int, axis: int):
    """a[..., i+k, ...] with edge clamp along ``axis``."""
    if k == 0:
        return a
    n = a.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]

    if k > 0:
        body = sl(k, n)
        edge = sl(n - 1, n)
        reps = [1] * a.ndim
        reps[axis] = min(k, n)
        pad = jnp.tile(edge, reps)
        return jnp.concatenate([body, pad], axis=axis) if k < n else pad
    body = sl(0, n + k)
    edge = sl(0, 1)
    reps = [1] * a.ndim
    reps[axis] = min(-k, n)
    pad = jnp.tile(edge, reps)
    return jnp.concatenate([pad, body], axis=axis) if -k < n else pad


def _apply_steps(e, o, steps, axis: int, invert: bool):
    if invert:
        steps = [(t, -s, taps, add, sh) for (t, s, taps, add, sh) in reversed(steps)]
    for target, sign, taps, add, sh in steps:
        src = e if target == "o" else o
        acc = None
        for off, coeff in taps:
            term = coeff * _shifted(src, off, axis)
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
            v = x[..., ::s, ::s]
            v = lift_level(v, kernel)
            x = x.at[..., ::s, ::s].set(v)
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
            v = x[..., ::s, ::s]
            v = lift_level(v, kernel, invert=True)
            x = x.at[..., ::s, ::s].set(v)
    return x


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
