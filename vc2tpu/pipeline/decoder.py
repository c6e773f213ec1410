"""Decoder pipeline: host entropy unpack + device synthesis (dequant + IDWT).

Counterpart of the DecodeStream HQ/LD picture paths
(/root/reference/src/DecodeStream/DecodeStream.cpp:289-613).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vc2tpu.core.config import ColourFormat, PictureGeometry, WaveletKernel
from vc2tpu.core.picture import Picture
from vc2tpu.quant.quantiser import adjust_quant_index, scale
from vc2tpu.slices import layout
from vc2tpu.wavelet import lifting, matrices


@functools.lru_cache(maxsize=32)
def _synthesis_bytes_fn(kernel: WaveletKernel, depth: int, geo_key, out_key,
                        bitdepth: int):
    """Fused decode tail: dequant + IDWT + signal clip + planar-format the
    output samples on device (offset binary, MSB-justified, big-endian),
    returning ONE flat word buffer so the host writes raw bytes.

    Covers DecodeStream's decode->clip->planar-write tail
    (/root/reference/src/DecodeStream/DecodeStream.cpp:551-609 and
    src/Library/src/Arrays.cpp:381-426) in a single jitted function; the
    single device->host transfer is the only copy.
    """
    (ys, xs, lsh, lsw, csh, csw) = geo_key
    (out_lh, out_lw, out_ch, out_cw) = out_key
    word = 1 if bitdepth == 8 else 2
    zero = 1 << (bitdepth - 1)

    def fmt(p):
        v = jnp.clip(p, -zero, zero - 1) + zero
        if word == 1:
            return v.astype(jnp.uint8).ravel()
        v = (v << (16 - bitdepth)).astype(jnp.uint16)
        return ((v << 8) | (v >> 8)).ravel()      # to big-endian

    n = ys * xs
    Ly = lsh * lsw
    Lc = csh * csw

    def fn(combined, q_idx, qm_y_lanes, qm_c_lanes):
        qy = combined[:n * Ly].reshape(n, Ly).astype(jnp.int32)
        qu = combined[n * Ly:n * (Ly + Lc)].reshape(n, Lc).astype(jnp.int32)
        qv = combined[n * (Ly + Lc):].reshape(n, Lc).astype(jnp.int32)
        aq_y = adjust_quant_index(q_idx[:, None], qm_y_lanes[None, :])
        aq_c = adjust_quant_index(q_idx[:, None], qm_c_lanes[None, :])
        ty = layout.lanes_to_plane(scale(qy, aq_y), ys, xs, lsh, lsw, depth)
        tu = layout.lanes_to_plane(scale(qu, aq_c), ys, xs, csh, csw, depth)
        tv = layout.lanes_to_plane(scale(qv, aq_c), ys, xs, csh, csw, depth)
        y = lifting.inverse_plane(ty, kernel, depth)[:out_lh, :out_lw]
        c1 = lifting.inverse_plane(tu, kernel, depth)[:out_ch, :out_cw]
        c2 = lifting.inverse_plane(tv, kernel, depth)[:out_ch, :out_cw]
        return jnp.concatenate([fmt(y), fmt(c1), fmt(c2)])

    return jax.jit(fn)


def synthesise_to_words(combined, q_indices, qmatrix, kernel: WaveletKernel,
                        depth: int, geo, out_geometry: PictureGeometry,
                        bitdepth: int):
    """Async fast path: one host->device copy of the combined coefficient
    buffer (int16 normally), full synthesis + output formatting on device,
    returns the device array of formatted output words (uint8 for 8-bit
    video, big-endian uint16 otherwise) WITHOUT blocking. Callers overlap
    np.asarray(...) with later host work."""
    _, band_y = layout.lane_order(geo.luma_slice[0], geo.luma_slice[1], depth)
    _, band_c = layout.lane_order(geo.chroma_slice[0], geo.chroma_slice[1], depth)
    qm_y = jnp.asarray(qmatrix[band_y].astype(np.int32))
    qm_c = jnp.asarray(qmatrix[band_c].astype(np.int32))
    geo_key = (geo.y_slices, geo.x_slices, *geo.luma_slice, *geo.chroma_slice)
    out_key = (out_geometry.luma_height, out_geometry.luma_width,
               out_geometry.chroma_height, out_geometry.chroma_width)
    fn = _synthesis_bytes_fn(kernel, depth, geo_key, out_key, bitdepth)
    out = fn(jnp.asarray(combined), jnp.asarray(q_indices, jnp.int32),
             qm_y, qm_c)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out


@functools.lru_cache(maxsize=32)
def _synthesis_fn(kernel: WaveletKernel, depth: int, geo_key, out_key,
                  chroma_format: ColourFormat):
    (ys, xs, lsh, lsw, csh, csw) = geo_key
    (out_lh, out_lw, out_ch, out_cw) = out_key

    def fn(qy, qu, qv, q_idx, qm_y_lanes, qm_c_lanes):
        aq_y = adjust_quant_index(q_idx[:, None], qm_y_lanes[None, :])
        aq_c = adjust_quant_index(q_idx[:, None], qm_c_lanes[None, :])
        ty = layout.lanes_to_plane(scale(qy, aq_y), ys, xs, lsh, lsw, depth)
        tu = layout.lanes_to_plane(scale(qu, aq_c), ys, xs, csh, csw, depth)
        tv = layout.lanes_to_plane(scale(qv, aq_c), ys, xs, csh, csw, depth)
        y = lifting.inverse_plane(ty, kernel, depth)[:out_lh, :out_lw]
        c1 = lifting.inverse_plane(tu, kernel, depth)[:out_ch, :out_cw]
        c2 = lifting.inverse_plane(tv, kernel, depth)[:out_ch, :out_cw]
        return y, c1, c2

    return jax.jit(fn)


def synthesise_lanes(qy, qu, qv, q_indices, qmatrix, kernel: WaveletKernel,
                     depth: int, geo, out_geometry: PictureGeometry,
                     chroma_format: ColourFormat,
                     dequant_only: bool = False) -> Picture:
    """lanes (already entropy-decoded) -> inverse quantise -> IDWT -> crop."""
    d = depth
    _, band_y = layout.lane_order(geo.luma_slice[0], geo.luma_slice[1], d)
    _, band_c = layout.lane_order(geo.chroma_slice[0], geo.chroma_slice[1], d)
    qm_y = jnp.asarray(qmatrix[band_y].astype(np.int32))
    qm_c = jnp.asarray(qmatrix[band_c].astype(np.int32))
    if dequant_only:
        aq_y = adjust_quant_index(np.asarray(q_indices)[:, None], qmatrix[band_y][None, :])
        aq_c = adjust_quant_index(np.asarray(q_indices)[:, None], qmatrix[band_c][None, :])
        ty = layout.lanes_to_plane(np.asarray(scale(jnp.asarray(qy), jnp.asarray(aq_y))),
                                   geo.y_slices, geo.x_slices, *geo.luma_slice, d)
        tu = layout.lanes_to_plane(np.asarray(scale(jnp.asarray(qu), jnp.asarray(aq_c))),
                                   geo.y_slices, geo.x_slices, *geo.chroma_slice, d)
        tv = layout.lanes_to_plane(np.asarray(scale(jnp.asarray(qv), jnp.asarray(aq_c))),
                                   geo.y_slices, geo.x_slices, *geo.chroma_slice, d)
        return Picture(ty, tu, tv, chroma_format)
    geo_key = (geo.y_slices, geo.x_slices, *geo.luma_slice, *geo.chroma_slice)
    out_key = (out_geometry.luma_height, out_geometry.luma_width,
               out_geometry.chroma_height, out_geometry.chroma_width)
    fn = _synthesis_fn(kernel, depth, geo_key, out_key, chroma_format)
    y, c1, c2 = fn(jnp.asarray(qy, jnp.int32), jnp.asarray(qu, jnp.int32),
                   jnp.asarray(qv, jnp.int32), jnp.asarray(q_indices, jnp.int32),
                   qm_y, qm_c)
    return Picture(np.asarray(y), np.asarray(c1), np.asarray(c2), chroma_format)
