"""HQ-CBR rate control: batched binary search + luma-SSE hill climb.

The reference runs, per slice, a 7-step binary search for the smallest
quantiser whose trial-quantised slice fits the byte budget, then walks the
quantiser upward while the luma sum-of-squares keeps improving
(/root/reference/src/EncodeStream/EncodeStream.cpp:73-125, yss_for_slice at
src/Library/src/Quantisation.cpp:627-642). That is ~10 full
quantise+size passes over every coefficient — the encode-time hot loop.

Here each search step quantises and sizes *all* slices simultaneously:
one (nSlices, L) element-wise pass per step, with the per-slice
trial-quantiser vector updated by masked arithmetic. The hill climb is a
``lax.while_loop`` with a per-slice active mask. Identical decisions,
no per-slice loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vc2tpu.quant.quantiser import adjust_quant_index, quant, scale, signed_vlc_numbits


def _component_bytes(lanes, q, qm_lanes, scalar: int):
    """Scaled byte size of each slice's component at per-slice quantiser q.

    lanes: int32 (N, L); q: int32 (N,); qm_lanes: int32 (L,) per-lane matrix.
    Mirrors component_slice_bytes (reference Slices.cpp:97-119) including the
    trailing-zero truncation rule.
    """
    aq = adjust_quant_index(q[:, None], qm_lanes[None, :])
    qlanes = quant(lanes, aq)
    nbits = signed_vlc_numbits(qlanes)
    gross = jnp.cumsum(nbits, axis=1)
    count = jnp.max(jnp.where(qlanes != 0, gross, 0), axis=1)
    scaled = ((count + 7) // 8 + scalar - 1) // scalar
    return scaled * scalar


def _slice_bytes_at(q, lanes_y, lanes_u, lanes_v, qm_y, qm_c, scalar: int):
    return (_component_bytes(lanes_y, q, qm_y, scalar)
            + _component_bytes(lanes_u, q, qm_c, scalar)
            + _component_bytes(lanes_v, q, qm_c, scalar))


def _yss(lanes_y, q, qm_y):
    """Luma sum-of-squared reconstruction error at quantiser q (int64)."""
    aq = adjust_quant_index(q[:, None], qm_y[None, :])
    rec = scale(quant(lanes_y, aq), aq)
    d = (lanes_y - rec).astype(jnp.int64)
    return jnp.sum(d * d, axis=1)


def cbr_quant_indices(lanes_y, lanes_u, lanes_v, qm_y, qm_c,
                      budgets, scalar: int):
    """Per-slice quantiser indices for HQ-CBR.

    lanes_*: int32 (N, L_comp) unquantised transform lanes;
    qm_*: int32 (L_comp,) per-lane quant-matrix offsets;
    budgets: int32 (N,) nominal slice bytes (slice_bytes map).
    Returns int32 (N,).
    """
    available = budgets.astype(jnp.int32) - 4
    n = lanes_y.shape[0]
    trial = jnp.full((n,), 63, dtype=jnp.int32)
    best = jnp.full((n,), 127, dtype=jnp.int32)
    delta = 64
    while delta > 1:
        delta >>= 1
        required = _slice_bytes_at(trial, lanes_y, lanes_u, lanes_v,
                                   qm_y, qm_c, scalar)
        fits = required <= available
        best = jnp.where(fits & (trial < best), trial, best)
        trial = jnp.where(fits, trial - delta, trial + delta)
    # final binary-search iteration (delta reaches 0 after this probe)
    required = _slice_bytes_at(trial, lanes_y, lanes_u, lanes_v, qm_y, qm_c, scalar)
    fits = required <= available
    best = jnp.where(fits & (trial < best), trial, best)

    # hill climb: raise q while the luma SSE strictly improves
    # (reference EncodeStream.cpp:107-120)
    trial_q = best
    prev = _yss(lanes_y, trial_q, qm_y)

    def cond(state):
        _, _, active = state
        return jnp.any(active)

    def body(state):
        trial_q, prev, active = state
        nxt = jnp.where(active, trial_q + 1, trial_q)
        cur = _yss(lanes_y, nxt, qm_y)
        dss = cur - prev
        prev = jnp.where(active, cur, prev)
        still = active & (dss < 0)
        return nxt, prev, still

    active = jnp.ones((n,), dtype=bool)
    trial_q, _, _ = jax.lax.while_loop(cond, body, (trial_q, prev, active))
    return trial_q - 1
