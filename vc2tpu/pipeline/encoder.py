"""Encoder pipeline: device analysis (DWT + RDO + quantise) + host packing.

Mirrors the EncodeStream frame loop (/root/reference/src/EncodeStream/
EncodeStream.cpp:452-770): interlaced input encodes fields separately with a
halved byte budget; tap outputs expose each pipeline stage.

Device/host split: everything coefficient-shaped (transform, rate control,
quantisation) runs in one jitted function; everything stream-shaped (exp-
Golomb packing, data units) runs on host via the native codec.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vc2tpu.core.config import EncoderConfig, Mode, PictureGeometry
from vc2tpu.core.picture import Picture
from vc2tpu.quant.quantiser import MAX_QINDEX, adjust_quant_index, quant, scale
from vc2tpu.rdo.cbr import cbr_quant_indices
from vc2tpu.slices import layout
from vc2tpu.slices.hq import encode_hq_slices
from vc2tpu.wavelet import lifting, matrices


@dataclasses.dataclass(frozen=True)
class SliceGeometry:
    """Static per-picture slice/lane geometry."""

    y_slices: int
    x_slices: int
    padded_luma: tuple[int, int]
    padded_chroma: tuple[int, int]
    luma_slice: tuple[int, int]      # slice block dims in the luma plane
    chroma_slice: tuple[int, int]

    @property
    def n_slices(self) -> int:
        return self.y_slices * self.x_slices


def slice_geometry(cfg: EncoderConfig) -> SliceGeometry:
    g = cfg.geometry
    luma_h = g.luma_height // 2 if cfg.interlaced else g.luma_height
    chroma_h = g.chroma_height // 2 if cfg.interlaced else g.chroma_height
    y_slices = matrices.slice_size_is_valid(cfg.wavelet_depth, luma_h,
                                            chroma_h, cfg.y_size)
    x_slices = matrices.slice_size_is_valid(cfg.wavelet_depth, g.luma_width,
                                            g.chroma_width, cfg.x_size)
    if not y_slices or not x_slices:
        raise ValueError(
            "The given waveletDepth, hSlice, and vSlice parameters cannot "
            "encode this input.")
    pl = (matrices.padded_size(luma_h, cfg.wavelet_depth),
          matrices.padded_size(g.luma_width, cfg.wavelet_depth))
    pc = (matrices.padded_size(chroma_h, cfg.wavelet_depth),
          matrices.padded_size(g.chroma_width, cfg.wavelet_depth))
    return SliceGeometry(
        y_slices, x_slices, pl, pc,
        (pl[0] // y_slices, pl[1] // x_slices),
        (pc[0] // y_slices, pc[1] // x_slices),
    )


@dataclasses.dataclass
class EncodedPicture:
    q_indices: np.ndarray            # int32 [ySlices, xSlices]
    payload: bytes                   # concatenated slice payloads
    slice_totals: np.ndarray         # per-slice byte sizes, raster order
    transform: Picture | None = None
    quantised: Picture | None = None


class Encoder:
    """HQ (ConstQ / CBR) picture encoder. One instance per EncoderConfig;
    the device function compiles once per geometry."""

    def __init__(self, cfg: EncoderConfig):
        cfg.validate()
        self.cfg = cfg
        self.geo = slice_geometry(cfg)
        self.qmatrix = matrices.quant_matrix(cfg.kernel, cfg.wavelet_depth)
        d = cfg.wavelet_depth
        _, band_y = layout.lane_order(*self.geo.luma_slice, d)
        _, band_c = layout.lane_order(*self.geo.chroma_slice, d)
        self.qm_lanes_y = self.qmatrix[band_y].astype(np.int32)
        self.qm_lanes_c = self.qmatrix[band_c].astype(np.int32)
        if cfg.mode == Mode.HQ_CBR:
            self.picture_bytes = (cfg.compressed_bytes // 2 if cfg.interlaced
                                  else cfg.compressed_bytes)
            self.slice_budgets = layout.slice_bytes_map(
                self.geo.y_slices, self.geo.x_slices, self.picture_bytes,
                cfg.slice_scalar)
        else:
            self.slice_budgets = None
        self._analyse = jax.jit(self._analyse_impl,
                                static_argnames=("keep_planes",))

    # ---- device side ----

    def _to_lanes(self, plane, chroma: bool):
        return layout.plane_to_lanes(plane, self.geo.y_slices,
                                     self.geo.x_slices, self.cfg.wavelet_depth)

    def _analyse_impl(self, y, c1, c2, budgets, keep_planes: bool = False):
        cfg = self.cfg
        d = cfg.wavelet_depth
        ty = lifting.forward_plane(lifting.wavelet_pad(y, d), cfg.kernel, d)
        tu = lifting.forward_plane(lifting.wavelet_pad(c1, d), cfg.kernel, d)
        tv = lifting.forward_plane(lifting.wavelet_pad(c2, d), cfg.kernel, d)
        ly = self._to_lanes(ty, False)
        lu = self._to_lanes(tu, True)
        lv = self._to_lanes(tv, True)
        qm_y = jnp.asarray(self.qm_lanes_y)
        qm_c = jnp.asarray(self.qm_lanes_c)
        if cfg.mode == Mode.HQ_CBR:
            q_idx = cbr_quant_indices(ly, lu, lv, qm_y, qm_c, budgets,
                                      cfg.slice_scalar)
        else:
            q_idx = jnp.full((self.geo.n_slices,), cfg.q_index, dtype=jnp.int32)
        aq_y = adjust_quant_index(q_idx[:, None], qm_y[None, :])
        aq_c = adjust_quant_index(q_idx[:, None], qm_c[None, :])
        out = dict(q_indices=q_idx,
                   qy=quant(ly, aq_y), qu=quant(lu, aq_c), qv=quant(lv, aq_c))
        if keep_planes:
            out.update(ty=ty, tu=tu, tv=tv)
        return out

    # ---- host side ----

    def encode_picture(self, picture: Picture, keep_planes: bool = False,
                       ) -> EncodedPicture:
        budgets = (jnp.asarray(self.slice_budgets.ravel())
                   if self.slice_budgets is not None
                   else jnp.zeros((self.geo.n_slices,), jnp.int32))
        res = self._analyse(jnp.asarray(picture.y, jnp.int32),
                            jnp.asarray(picture.c1, jnp.int32),
                            jnp.asarray(picture.c2, jnp.int32),
                            budgets, keep_planes=keep_planes)
        q_idx = np.asarray(res["q_indices"])
        qy = np.asarray(res["qy"])
        qu = np.asarray(res["qu"])
        qv = np.asarray(res["qv"])
        if (q_idx > MAX_QINDEX).any():
            raise ValueError(
                "quantization index exceeds maximum implemented value.")
        sizes = (self.slice_budgets.ravel()
                 if self.slice_budgets is not None else None)
        payload, totals = encode_hq_slices(
            q_idx, qy, qu, qv, self.cfg.slice_prefix, self.cfg.slice_scalar,
            slice_sizes=sizes)
        out = EncodedPicture(
            q_indices=q_idx.reshape(self.geo.y_slices, self.geo.x_slices),
            payload=payload, slice_totals=np.asarray(totals))
        if keep_planes:
            out.transform = Picture(np.asarray(res["ty"]), np.asarray(res["tu"]),
                                    np.asarray(res["tv"]), picture.chroma_format)
            out.quantised = Picture(
                self._lanes_to_plane(qy, False), self._lanes_to_plane(qu, True),
                self._lanes_to_plane(qv, True), picture.chroma_format)
        return out

    def _lanes_to_plane(self, lanes: np.ndarray, chroma: bool) -> np.ndarray:
        sh, sw = self.geo.chroma_slice if chroma else self.geo.luma_slice
        return layout.lanes_to_plane(lanes, self.geo.y_slices, self.geo.x_slices,
                                     sh, sw, self.cfg.wavelet_depth)

    def decode_inprocess(self, enc: EncodedPicture, geometry: PictureGeometry,
                         ) -> Picture:
        """Inverse-quantise + inverse transform the quantised lanes, as the
        encoder's DECODED/PSNR taps do (EncodeStream.cpp:649-664)."""
        from vc2tpu.pipeline.decoder import synthesise_lanes

        res = enc
        qy = layout.plane_to_lanes(np.asarray(res.quantised.y), self.geo.y_slices,
                                   self.geo.x_slices, self.cfg.wavelet_depth)
        qu = layout.plane_to_lanes(np.asarray(res.quantised.c1), self.geo.y_slices,
                                   self.geo.x_slices, self.cfg.wavelet_depth)
        qv = layout.plane_to_lanes(np.asarray(res.quantised.c2), self.geo.y_slices,
                                   self.geo.x_slices, self.cfg.wavelet_depth)
        return synthesise_lanes(
            qy, qu, qv, res.q_indices.ravel(), self.qmatrix, self.cfg.kernel,
            self.cfg.wavelet_depth, self.geo, geometry,
            chroma_format=self.cfg.chroma_format)
