"""Fused one-level 2-D lifting as a Pallas TPU kernel.

One grid step reads a full-width row strip (plus HALO rows from each
neighbour), applies the complete horizontal + vertical predict/update ladder
of a wavelet level in VMEM, and writes the strip back: one HBM read + one
write per level instead of one per lifting pass. Replaces the XLA path of
vc2tpu.wavelet.lifting.lift_level for aligned shapes (bit-exact; see
tests/test_pallas_lift.py).

Mechanics (Mosaic-friendly forms only):
* horizontal taps: the even/odd column split is a lane-parity mask — each
  tap is a lane roll by (2*off - 1) with edge-clamp fixups, the update is
  applied under an iota parity mask (no lane-strided slicing, which Mosaic
  rejects);
* vertical taps: row-pair reshape (R/2, 2, W) splits parities on the
  sublane axis, taps are static row slices of an edge-padded buffer;
* strip boundaries: neighbour HALO rows carry real data; at the true top
  and bottom edge the first/last ROW PAIR is replicated into the halo,
  which reproduces the reference's index clamping
  (/root/reference/src/Library/src/WaveletTransform.cpp:495-498) exactly —
  and stays consistent through sequential lifting steps.

The halo is sized per kernel from the ladder's propagation reach: a strip's
interior rows are correct after the whole ladder iff every step's reads stay
inside rows the previous steps computed correctly, so the correctness region
shrinks by each step's tap reach — sum(max|off|) parity rows over the steps,
x2 interleaved (LeGall 2 -> 8-row halo, Fidelity 8 -> 16).

Status: bit-exact for all seven kernels (tests/test_pallas_lift.py), on the
chip and in interpret mode. Round 4's per-kernel halos + 2 MB strips cut a
1080p LeGall level from 1.24 ms to **0.01 ms** (4K: 0.20) — memory-bound
speed, and 3-14x FASTER than the XLA in-place form (`lifting.lift_level`,
0.14 / 0.62 ms) at every size. The production pipelines nevertheless stay
on the XLA Mallat BAND form: it keeps parities split across the whole
transform, so a per-level comparison includes the (de)interleaves only the
in-place layout needs — measured end-to-end (forward_bands depth 2, 1080p)
the band form is 0.07 ms vs 0.07/0.10 for a pallas-level-0 hybrid and the
hybrid loses outright at 4K (0.33 vs 0.42 fwd, 0.37 vs 0.59 inv). This
kernel is the right backend where the interleaved layout is imposed by the
caller (none of the shipping paths impose it on device).

Round-5 settlement: with the band form faster at every shipped geometry,
the Pallas budget went to the decode entropy-unpack scan instead (multi-code
peeks + virtual 1-fill tail, decode step 8.6 -> 5.0 ms) — the win there was
measured, not speculative. This module stays maintained as (a) the tuning
seed for any future caller that imposes the in-place interleaved layout on
device, and (b) the halo/strip sizing model (_true_reach) other fused
kernels can reuse; it is deliberately not wired into a production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vc2tpu.core.config import WaveletKernel
from vc2tpu.wavelet.lifting import _STEPS, TRANSFORM_SHIFT


def _true_reach(steps) -> int:
    """Exact interleaved contamination reach of one level's ladder: simulate
    how deep foreign rows (beyond a strip edge) propagate into the strip
    through the lifting dependency chain, both boundary directions. The
    closed-form halo below is an upper bound only by a rounding margin
    (Fidelity: true 14 vs halo 16), so `_halo` asserts against this exact
    value — a future _STEPS edit that would silently under-halo fails loudly
    instead."""
    N = 64

    def sim(sign):
        bad = {r: (r < 0) for r in range(-N, N)}
        get = lambda r: bad[r] if -N <= r < N else (r < 0)
        for (t, _s, taps, _a, _sh) in steps:
            pt = 1 if t == "o" else 0
            ps = 1 - pt
            new = dict(bad)
            for r in range(-N, N):
                if (r & 1) != pt:
                    continue
                if any(get(r + sign * (2 * o + ps - pt)) for o, _ in taps):
                    new[r] = True
            bad = new
        return max([r + 1 for r in range(N) if bad[r]] + [0])

    return max(sim(1), sim(-1))


@functools.lru_cache(maxsize=None)
def _halo(kernel: WaveletKernel) -> int:
    """Interleaved-row halo for one level of `kernel`: twice the ladder's
    summed parity-space tap reach, rounded up to the 8-row sublane
    granularity (and at least 8 so the halo BlockSpec stays tileable).
    Guarded by the exact dependency-propagation bound (_true_reach)."""
    reach = sum(max(abs(o) for o, _ in taps)
                for (_t, _s, taps, _a, _sh) in _STEPS[kernel])
    halo = max(8, -(-2 * reach // 8) * 8)
    exact = _true_reach(_STEPS[kernel])
    assert halo >= exact, (
        f"under-halo for kernel {kernel}: formula gives {halo} rows but the "
        f"ladder's true interleaved contamination reach is {exact}")
    return halo


def _lane_shift_clamped(x, k: int, p_src: int, w: int):
    """y[..., j] = x[..., j + k] with the source lane clamped to the
    [p_src, w - 2 + p_src] range of its parity (edge clamp in e/o space)."""
    if k == 0:
        return x
    n = x.shape[1]
    y = pltpu.roll(x, jnp.int32((-k) % n), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = lane + k
    lo = p_src
    hi = w - 2 + p_src
    y = jnp.where(s < lo, x[:, lo][:, None], y)
    y = jnp.where(s > hi, x[:, hi][:, None], y)
    return y


def _h_steps(x, steps, w: int):
    """All horizontal lifting steps, in-place interleaved lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    odd = (lane & 1) == 1
    for target, sign, taps, add, sh in steps:
        t_parity = 1 if target == "o" else 0
        p_src = 1 - t_parity
        acc = None
        for off, coeff in taps:
            k = 2 * off - 1 if t_parity == 1 else 2 * off + 1
            term = coeff * _lane_shift_clamped(x, k, p_src, w)
            acc = term if acc is None else acc + term
        delta = (acc + add) >> sh if sh else acc
        tgt = odd if t_parity == 1 else jnp.logical_not(odd)
        x = jnp.where(tgt, x + sign * delta, x)
    return x


def _row_shift(a, off: int, is_top, is_bot, lo: int, hi: int):
    """a[k + off] along axis 0. Interior reads use the halo's real data; at
    the TRUE picture edges reads beyond the real rows [lo, hi] are redirected
    to the boundary row — the reference's index clamp, applied per step so it
    always sees the boundary row's CURRENT (updated) value."""
    if off == 0:
        return a
    n = a.shape[0]
    if off > 0:
        body = a[off:]
        edge = jnp.broadcast_to(a[n - 1][None], (off,) + a.shape[1:])
        shifted = jnp.concatenate([body, edge], axis=0)
    else:
        body = a[:n + off]
        edge = jnp.broadcast_to(a[0][None], (-off,) + a.shape[1:])
        shifted = jnp.concatenate([edge, body], axis=0)
    k = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    if off < 0:
        fix = jnp.where(k + off < lo, a[lo][None], shifted)
        shifted = jnp.where(is_top, fix, shifted)
    else:
        fix = jnp.where(k + off > hi, a[hi][None], shifted)
        shifted = jnp.where(is_bot, fix, shifted)
    return shifted


def _v_steps(x, steps, is_top, is_bot, lo: int, hi: int):
    """All vertical lifting steps via row-pair parity split; lo/hi are the
    first/last REAL parity-row indices (the halo lies outside them)."""
    r, w = x.shape
    pairs = x.reshape(r // 2, 2, w)
    e = pairs[:, 0]
    o = pairs[:, 1]
    for target, sign, taps, add, sh in steps:
        src = e if target == "o" else o
        acc = None
        for off, coeff in taps:
            term = coeff * _row_shift(src, off, is_top, is_bot, lo, hi)
            acc = term if acc is None else acc + term
        delta = (acc + add) >> sh if sh else acc
        if target == "o":
            o = o + sign * delta
        else:
            e = e + sign * delta
    return jnp.stack([e, o], axis=1).reshape(r, w)


def _make_kernel(kernel: WaveletKernel, invert: bool, bh: int, w: int):
    steps = _STEPS[kernel]
    shift = TRANSFORM_SHIFT[kernel]
    halo = _halo(kernel)
    if invert:
        steps = tuple((t, -s, taps, add, sh)
                      for (t, s, taps, add, sh) in reversed(steps))

    lo = halo // 2                      # first real parity row
    hi = halo // 2 + bh // 2 - 1        # last real parity row

    def body(top_ref, mid_ref, bot_ref, out_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        is_top = i == 0
        is_bot = i == n - 1
        work = jnp.concatenate([top_ref[:], mid_ref[:], bot_ref[:]], axis=0)
        if not invert:
            if shift:
                work = work << shift
            work = _h_steps(work, steps, w)
            work = _v_steps(work, steps, is_top, is_bot, lo, hi)
        else:
            work = _v_steps(work, steps, is_top, is_bot, lo, hi)
            work = _h_steps(work, steps, w)
            if shift:
                work = (work + (1 << (shift - 1))) >> shift
        out_ref[:] = work[halo:halo + bh]

    return body


@functools.lru_cache(maxsize=64)
def _build(kernel: WaveletKernel, invert: bool, h: int, w: int, bh: int):
    body = _make_kernel(kernel, invert, bh, w)
    halo = _halo(kernel)
    grid = h // bh
    r = bh // halo

    def idx_top(i):
        return (jnp.maximum(i * r - 1, 0).astype(jnp.int32), jnp.int32(0))

    def idx_bot(i):
        return (jnp.minimum(i * r + r, h // halo - 1).astype(jnp.int32),
                jnp.int32(0))

    fn = pl.pallas_call(
        body,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((halo, w), idx_top, memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, w), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((halo, w), idx_bot, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, w), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )
    return fn


def _pick_bh(h: int, w: int, halo: int) -> int | None:
    """Largest strip height that divides h, is a multiple of halo, and
    keeps the (bh + 2*halo, w) working set within the VMEM budget."""
    # the lifting ladder keeps ~7 work-sized vectors live in VMEM (measured
    # by the compiler's scoped-vmem accounting), so the strip must stay
    # within ~2 MB of the 16 MB budget
    for bh in range(min(h, 2048) // halo * halo, halo - 1, -halo):
        if h % bh == 0 and (bh + 2 * halo) * w * 4 <= 2 * 2 ** 20:
            return bh
    return None


def supported(h: int, w: int, kernel: WaveletKernel) -> bool:
    if kernel == WaveletKernel.NullKernel:
        return False
    halo = _halo(kernel)
    if w % 128 or h % halo:
        return False
    bh = _pick_bh(h, w, halo)
    return bh is not None and bh >= 2 * halo


def lift_level(x, kernel: WaveletKernel, invert: bool = False):
    """Pallas one-level 2-D lift over the final two axes (no batch axes).
    Callers should gate on :func:`supported`; raises cleanly otherwise."""
    h, w = x.shape
    if not supported(h, w, kernel):
        raise ValueError(f"pallas lift: unsupported shape {h}x{w} for "
                         f"{kernel.name} (see pallas_lift.supported)")
    fn = _build(kernel, invert, h, w, _pick_bh(h, w, _halo(kernel)))
    return fn(x, x, x)
