"""Multi-chip encode/decode steps over a (data, space) mesh.

Decomposition (SURVEY.md §2 parallelism table):

* ``data``  — independent frames (intra-only codec);
* ``space`` — row bands of each picture; the DWT exchanges halo rows per
  lifting pass (vc2tpu.shard.halo), everything slice-local afterwards
  (RDO, quantisation, VLC sizing) partitions along the same axis with no
  further communication — slice rows coincide with row bands.

The jitted step takes batched planes (B, H, W) and returns per-slice
quantiser indices plus quantised lanes, exactly equal to the single-device
pipeline output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vc2tpu.core.config import EncoderConfig, Mode
from vc2tpu.quant.quantiser import quant_banded, scale_banded
from vc2tpu.rdo.cbr import cbr_quant_indices
from vc2tpu.slices import layout
from vc2tpu.shard.halo import sharded_forward_plane, sharded_inverse_plane
from vc2tpu.wavelet import matrices


def make_sharded_encode_step(cfg: EncoderConfig, mesh: Mesh, batch: int):
    """Build a jitted multi-chip HQ encode step.

    Returns (step_fn, input_shardings). step_fn(y, c1, c2, budgets) ->
    (q_indices (B, N), qy, qu, qv lanes). Padding must already be applied
    (shapes are the padded geometry).
    """
    from vc2tpu.pipeline.encoder import slice_geometry

    geo = slice_geometry(cfg)
    d = cfg.wavelet_depth
    qmatrix = matrices.quant_matrix(cfg.kernel, d)
    import numpy as np

    _, band_y = layout.lane_order(*geo.luma_slice, d)
    _, band_c = layout.lane_order(*geo.chroma_slice, d)
    qm = jnp.asarray(qmatrix.astype(jnp.int32))
    bs_y = tuple(int(c) for c in np.bincount(band_y))
    bs_c = tuple(int(c) for c in np.bincount(band_c))
    plane_spec = NamedSharding(mesh, P("data", "space", None))
    lane_spec = NamedSharding(mesh, P("data", "space", None))

    def step(y, c1, c2, budgets):
        ty = sharded_forward_plane(y, mesh, cfg.kernel, d)
        tu = sharded_forward_plane(c1, mesh, cfg.kernel, d)
        tv = sharded_forward_plane(c2, mesh, cfg.kernel, d)
        # slice rows align with row bands: lane extraction partitions cleanly
        ly = layout.plane_to_lanes(ty, geo.y_slices, geo.x_slices, d)
        lu = layout.plane_to_lanes(tu, geo.y_slices, geo.x_slices, d)
        lv = layout.plane_to_lanes(tv, geo.y_slices, geo.x_slices, d)
        ly = jax.lax.with_sharding_constraint(ly, lane_spec)
        lu = jax.lax.with_sharding_constraint(lu, lane_spec)
        lv = jax.lax.with_sharding_constraint(lv, lane_spec)
        B = ly.shape[0]
        n = geo.n_slices
        if cfg.mode == Mode.HQ_CBR:
            q_idx = cbr_quant_indices(
                ly.reshape(B * n, -1), lu.reshape(B * n, -1),
                lv.reshape(B * n, -1), qm, bs_y, bs_c,
                budgets.reshape(B * n), cfg.slice_scalar).reshape(B, n)
        else:
            q_idx = jnp.full((B, n), cfg.q_index, dtype=jnp.int32)
        return (q_idx, quant_banded(ly, q_idx, qm, bs_y),
                quant_banded(lu, q_idx, qm, bs_c),
                quant_banded(lv, q_idx, qm, bs_c))

    with mesh:
        step_jit = jax.jit(step,
                           in_shardings=(plane_spec, plane_spec, plane_spec,
                                         NamedSharding(mesh, P("data", None))),
                           out_shardings=None)
    return step_jit, plane_spec, geo


def make_sharded_decode_step(kernel, depth: int, geo, mesh: Mesh):
    """Jitted multi-chip HQ synthesis: lanes -> dequant -> IDWT."""
    import numpy as np

    qmatrix = matrices.quant_matrix(kernel, depth)
    _, band_y = layout.lane_order(*geo.luma_slice, depth)
    _, band_c = layout.lane_order(*geo.chroma_slice, depth)
    qm = jnp.asarray(qmatrix.astype(jnp.int32))
    bs_y = tuple(int(c) for c in np.bincount(band_y))
    bs_c = tuple(int(c) for c in np.bincount(band_c))

    def step(q_idx, ly, lu, lv):
        ty = layout.lanes_to_plane(scale_banded(ly, q_idx, qm, bs_y),
                                   geo.y_slices, geo.x_slices,
                                   *geo.luma_slice, depth)
        tu = layout.lanes_to_plane(scale_banded(lu, q_idx, qm, bs_c),
                                   geo.y_slices, geo.x_slices,
                                   *geo.chroma_slice, depth)
        tv = layout.lanes_to_plane(scale_banded(lv, q_idx, qm, bs_c),
                                   geo.y_slices, geo.x_slices,
                                   *geo.chroma_slice, depth)
        y = sharded_inverse_plane(ty, mesh, kernel, depth)
        c1 = sharded_inverse_plane(tu, mesh, kernel, depth)
        c2 = sharded_inverse_plane(tv, mesh, kernel, depth)
        return y, c1, c2

    with mesh:
        return jax.jit(step)
