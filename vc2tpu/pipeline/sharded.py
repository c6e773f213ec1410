"""Multi-chip encode/decode steps over a (data, space) mesh.

Decomposition (SURVEY.md §2 parallelism table):

* ``data``  — independent frames (intra-only codec);
* ``space`` — row bands of each picture; the DWT exchanges halo rows per
  vertical lifting pass (vc2tpu.shard.halo) over an ICI ring, everything
  slice-local afterwards (RDO, quantisation, VLC sizing) partitions along
  the same axis with no further communication — slice rows coincide with
  row bands.

The whole step runs under one shard_map in the Mallat band form: subbands
stay contiguous per shard and slice-lane extraction is pure
reshape/transpose (the same layout choices as the single-chip pipeline).
The jitted step takes batched planes (B, H, W) and returns per-slice
quantiser indices plus quantised lanes, exactly equal to the single-device
pipeline output (ints, compared with ==).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vc2tpu.core.config import EncoderConfig, Mode
from vc2tpu.quant.quantiser import quant_banded, scale_banded
from vc2tpu.rdo.cbr import cbr_quant_indices
from vc2tpu.slices import layout
from vc2tpu.shard.halo import forward_bands_local, inverse_bands_local
from vc2tpu.wavelet import lifting, matrices


def _band_meta(geo, depth):
    _, band_y = layout.lane_order(*geo.luma_slice, depth)
    _, band_c = layout.lane_order(*geo.chroma_slice, depth)
    bs_y = tuple(int(c) for c in np.bincount(band_y))
    bs_c = tuple(int(c) for c in np.bincount(band_c))
    return bs_y, bs_c


def make_sharded_encode_step(cfg: EncoderConfig, mesh: Mesh, batch: int):
    """Build a jitted multi-chip HQ encode step.

    Returns (step_fn, plane_sharding, geo). step_fn(y, c1, c2, budgets) ->
    (q_indices (B, N), qy, qu, qv lanes). Padding must already be applied
    (shapes are the padded geometry); y_slices must divide by the ``space``
    extent so slice rows align with row bands.
    """
    from vc2tpu.pipeline.encoder import slice_geometry

    geo = slice_geometry(cfg)
    d = cfg.wavelet_depth
    space = mesh.shape["space"]
    if geo.y_slices % space:
        raise ValueError("y_slices must divide by the space mesh extent")
    qmatrix = matrices.quant_matrix(cfg.kernel, d)
    qm = jnp.asarray(qmatrix.astype(np.int32))
    bs_y, bs_c = _band_meta(geo, d)
    ys_local = geo.y_slices // space
    plane_spec = NamedSharding(mesh, P("data", "space", None))
    budget_spec = NamedSharding(mesh, P("data", "space"))

    def local(y, c1, c2, budgets):
        lanes = []
        for p in (y, c1, c2):
            bands = forward_bands_local(p, cfg.kernel, d, "space")
            lanes.append(lifting.bands_to_lanes(bands, ys_local,
                                                geo.x_slices))
        ly, lu, lv = lanes
        b = ly.shape[0]
        n_loc = ys_local * geo.x_slices
        if cfg.mode == Mode.HQ_CBR:
            q_idx = cbr_quant_indices(
                ly.reshape(b * n_loc, -1), lu.reshape(b * n_loc, -1),
                lv.reshape(b * n_loc, -1), qm, bs_y, bs_c,
                budgets.reshape(b * n_loc), cfg.slice_scalar).reshape(b, n_loc)
        else:
            q_idx = jnp.full((b, n_loc), cfg.q_index, dtype=jnp.int32)
        return (q_idx, quant_banded(ly, q_idx, qm, bs_y),
                quant_banded(lu, q_idx, qm, bs_c),
                quant_banded(lv, q_idx, qm, bs_c))

    shmap = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", "space", None),) * 3 + (P("data", "space"),),
        out_specs=(P("data", "space"), P("data", "space", None),
                   P("data", "space", None), P("data", "space", None)))

    with mesh:
        step_jit = jax.jit(shmap, in_shardings=(plane_spec,) * 3
                           + (budget_spec,))
    return step_jit, plane_spec, geo


def make_sharded_decode_step(kernel, depth: int, geo, mesh: Mesh):
    """Jitted multi-chip HQ synthesis: lanes -> dequant -> IDWT (band form,
    halo exchange per vertical pass)."""
    space = mesh.shape["space"]
    if geo.y_slices % space:
        raise ValueError("y_slices must divide by the space mesh extent")
    qmatrix = matrices.quant_matrix(kernel, depth)
    qm = jnp.asarray(qmatrix.astype(np.int32))
    bs_y, bs_c = _band_meta(geo, depth)
    ys_local = geo.y_slices // space
    dims_y = [(h // space, w) for (h, w) in
              lifting.band_dims(*geo.padded_luma, depth)]
    dims_c = [(h // space, w) for (h, w) in
              lifting.band_dims(*geo.padded_chroma, depth)]

    def local(q_idx, ly, lu, lv):
        def synth(lanes, dims, bs):
            t = scale_banded(lanes, q_idx, qm, bs)
            bands = lifting.lanes_to_bands(t, ys_local, geo.x_slices, dims)
            return inverse_bands_local(bands, kernel, depth, "space")

        return (synth(ly, dims_y, bs_y), synth(lu, dims_c, bs_c),
                synth(lv, dims_c, bs_c))

    shmap = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", "space"),) + (P("data", "space", None),) * 3,
        out_specs=(P("data", "space", None),) * 3)

    with mesh:
        return jax.jit(shmap)
