"""HQ-CBR rate control: batched binary search + luma-SSE hill climb.

The reference runs, per slice, a 7-step binary search for the smallest
quantiser whose trial-quantised slice fits the byte budget, then walks the
quantiser upward while the luma sum-of-squares keeps improving
(/root/reference/src/EncodeStream/EncodeStream.cpp:73-125, yss_for_slice at
src/Library/src/Quantisation.cpp:627-642). That is ~10 full
quantise+size passes over every coefficient — the encode-time hot loop.

Here each search step quantises and sizes *all* slices simultaneously:
one (nSlices, L) element-wise pass per step, with the per-slice
trial-quantiser vector updated by masked arithmetic; quantiser tables are
gathered per (slice, band) and broadcast along the band-contiguous lanes
(quant_banded). The hill climb is a ``lax.while_loop`` with a per-slice
active mask. Identical decisions to the reference, no per-slice loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vc2tpu.quant.quantiser import (quant_banded, scale_banded,
                                    signed_vlc_numbits)


def _component_bytes(lanes, q, qm_bands, band_sizes, scalar: int):
    """Scaled byte size of each slice's component at per-slice quantiser q.

    lanes: int32 (N, L) band-contiguous; q: int32 (N,); qm_bands: (B,).
    Mirrors component_slice_bytes (reference Slices.cpp:97-119) including the
    trailing-zero truncation rule.
    """
    qlanes = quant_banded(lanes, q, qm_bands, band_sizes)
    nbits = signed_vlc_numbits(qlanes)
    # trailing-zero truncation rule without a cumsum: every trailing zero is
    # a 1-bit code (Slices.cpp:97-113)
    L = qlanes.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    last_nz = jnp.max(jnp.where(qlanes != 0, idx, -1), axis=-1)
    count = jnp.sum(nbits, axis=-1, dtype=jnp.int32) - (L - 1 - last_nz)
    scaled = ((count + 7) // 8 + scalar - 1) // scalar
    return scaled * scalar


def _slice_bytes_at(q, lanes_y, lanes_u, lanes_v, qm_bands, bs_y, bs_c,
                    scalar: int):
    return (_component_bytes(lanes_y, q, qm_bands, bs_y, scalar)
            + _component_bytes(lanes_u, q, qm_bands, bs_c, scalar)
            + _component_bytes(lanes_v, q, qm_bands, bs_c, scalar))


def _yss(lanes_y, q, qm_bands, bs_y):
    """Luma sum-of-squared reconstruction error at quantiser q (int64)."""
    rec = scale_banded(quant_banded(lanes_y, q, qm_bands, bs_y), q,
                       qm_bands, bs_y)
    d = (lanes_y - rec).astype(jnp.int64)
    return jnp.sum(d * d, axis=1)


def cbr_quant_indices(lanes_y, lanes_u, lanes_v, qm_bands, bs_y, bs_c,
                      budgets, scalar: int):
    """Per-slice quantiser indices for HQ-CBR.

    lanes_*: int32 (N, L_comp) unquantised transform lanes (band-contiguous);
    qm_bands: int32 (B,) quant-matrix offsets; bs_y/bs_c: static band sizes;
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
                                   qm_bands, bs_y, bs_c, scalar)
        fits = required <= available
        best = jnp.where(fits & (trial < best), trial, best)
        trial = jnp.where(fits, trial - delta, trial + delta)
    # final binary-search iteration (delta reaches 0 after this probe)
    required = _slice_bytes_at(trial, lanes_y, lanes_u, lanes_v, qm_bands,
                               bs_y, bs_c, scalar)
    fits = required <= available
    best = jnp.where(fits & (trial < best), trial, best)

    # hill climb: raise q while the luma SSE strictly improves
    # (reference EncodeStream.cpp:107-120). The final q is
    # best + (number of consecutive strict improvements), so the first K
    # steps evaluate as ONE batched pass over (slice, candidate) — the
    # while_loop only continues for the rare slices still improving past K.
    K = 3        # typical climbs are 0-2 steps; the loop handles the tail
    cand = best[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    yss_k = jax.vmap(lambda q: _yss(lanes_y, q, qm_bands, bs_y),
                     in_axes=1, out_axes=1)(cand)          # (N, K+1)
    improve = yss_k[:, 1:] < yss_k[:, :-1]                  # (N, K)
    run = jnp.cumprod(improve.astype(jnp.int32), axis=1)    # consecutive
    c = jnp.sum(run, axis=1)
    trial_q = best + c
    prev = jnp.take_along_axis(yss_k, c[:, None], axis=1)[:, 0]

    def cond(state):
        _, _, active = state
        return jnp.any(active)

    def body(state):
        trial_q, prev, active = state
        nxt = jnp.where(active, trial_q + 1, trial_q)
        cur = _yss(lanes_y, nxt, qm_bands, bs_y)
        dss = cur - prev
        prev = jnp.where(active, cur, prev)
        still = active & (dss < 0)
        return nxt, prev, still

    # only slices whose whole first-K run improved may keep climbing; the
    # mask derives from data so its shard_map "varying" type matches the body
    active = c == K
    trial_q, prev, active = jax.lax.while_loop(
        cond, body, (trial_q, prev, active))
    # while_loop applied the failed step to its active slices; the batched
    # prefix did not — align to the reference's trial_q semantics
    return jnp.where(c == K, trial_q - 1, trial_q)
