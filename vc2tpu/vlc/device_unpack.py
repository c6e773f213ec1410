"""On-device HQ entropy unpack: payload bytes -> coefficient lanes, jitted.

Decodes the bounded interleaved exp-Golomb slice components of an HQ
picture entirely on the accelerator, so the device decode route ships the
*compressed* payload (plus the per-slice component lengths from the host
chain scan) instead of host-unpacked coefficients. Wire semantics follow
the reference exactly (/root/reference/src/Library/src/VLC.cpp:54-94 codes,
:182-185 bounded reads return 1-bits past the region;
/root/reference/src/Library/src/Slices.cpp:384-467 slice layout).

Design (TPU-first, no per-element scatters and one gather total):

* The payload is assembled into big-endian uint32 words on device; each
  slice component gathers a fixed-width window block of ``W`` words once.
  Bytes at or past the component's bound are OR-masked to 0xFF *by
  position*, which reproduces the bounded-read rule (reads past the bound
  see 1-bits) including codes that straddle the bound.
* A ``lax.scan`` over the ``L`` lanes decodes one signed code per step for
  every slice in lockstep: a 64-bit peek window is built by one-hot
  multiply over the block words (no dynamic gather inside the scan),
  ``clz`` of the follow-bit mask gives the data-bit count, and a log-step
  even-bit compress (inverse Morton spread) extracts the magnitude.
* Values land in lane order directly from the scan's stacked outputs -
  no scatter.

Codes with more than 31 data bits (|v| >= 2^31, impossible in conformant
streams and undefined in the reference's int arithmetic) are clamped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_FOLLOW = np.uint64(0xAAAAAAAAAAAAAAAA)
_C1 = np.uint64(0x5555555555555555)
_C2 = np.uint64(0x3333333333333333)
_C4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_C8 = np.uint64(0x00FF00FF00FF00FF)
_C16 = np.uint64(0x0000FFFF0000FFFF)
_C32 = np.uint64(0x00000000FFFFFFFF)


def _compress_even(x):
    """Gather the even-position bits of x into the low bits (inverse of the
    Morton spread used by golomb._spread16)."""
    x = x & _C1
    x = (x | (x >> jnp.uint64(1))) & _C2
    x = (x | (x >> jnp.uint64(2))) & _C4
    x = (x | (x >> jnp.uint64(4))) & _C8
    x = (x | (x >> jnp.uint64(8))) & _C16
    x = (x | (x >> jnp.uint64(16))) & _C32
    return x


def window_words(n_bytes_max: int, n_lanes: int) -> int:
    """Window block size (uint32 words) that covers the worst-case bit
    consumption of one component: 3 lead-alignment bytes + the bounded
    region + one 1-bit zero code per remaining lane + a straddling code +
    64 peek bits."""
    bits = 24 + 8 * n_bytes_max + n_lanes + 2 + 64 + 64
    return (bits + 31) // 32 + 1


def block_bytes_estimate(n_slices: int, comp_word_counts) -> int:
    """Device memory the per-slice window blocks will take. The block is
    sized by the LARGEST component region, so a heavily skewed stream (one
    huge slice among thousands of tiny ones) can inflate it far past the
    payload size — callers fall back to the host unpack above a cap."""
    return 4 * n_slices * int(sum(comp_word_counts))


def unpack_component(words, dstart, clen, n_lanes: int, n_words: int):
    """Decode ``n_lanes`` signed codes per slice from bounded regions.

    words: uint32 [P] big-endian-assembled payload words.
    dstart: int32 [N] absolute byte offset of each region.
    clen: int32 [N] region length in bytes (bound).
    Returns int32 [N, n_lanes] in lane order.
    """
    base = dstart >> 2
    lead = dstart & 3                                   # bytes before start
    j = jnp.arange(n_words, dtype=jnp.int32)
    block = words[base[:, None] + j[None, :]]           # (N, W) gather
    # positional bound mask: byte b of word j is relative byte 4j+b-lead;
    # bytes at or past clen read as 0xFF (VLC.cpp:182-185)
    rel0 = 4 * j[None, :] - lead[:, None]
    cl = clen[:, None]
    for b in range(4):
        sh = 24 - 8 * b
        over = (rel0 + b) >= cl
        block = block | (over.astype(jnp.uint32) << sh) * jnp.uint32(0xFF)

    u64 = lambda a: a.astype(jnp.uint64)
    pos0 = (lead * 8).astype(jnp.int32)

    def step(pos, _):
        widx = pos >> 5
        sh = u64(pos & 31)
        w0 = jnp.zeros_like(pos).astype(jnp.uint32)
        w1 = jnp.zeros_like(w0)
        w2 = jnp.zeros_like(w0)
        eq1 = eq2 = None
        for k in range(n_words):
            bk = block[:, k]
            eq = (widx == k).astype(jnp.uint32)     # one compare, reused
            w0 = w0 + bk * eq
            if eq1 is not None:
                w1 = w1 + bk * eq1
            if eq2 is not None:
                w2 = w2 + bk * eq2
            eq1, eq2 = eq, eq1
        win = (u64(w0) << (jnp.uint64(32) + sh)) | (u64(w1) << sh)
        t2 = u64(w2) >> (jnp.uint64(32) - jnp.maximum(sh, jnp.uint64(1)))
        win = win | jnp.where(sh > 0, t2, jnp.uint64(0))
        # first 1 follow bit (even code position) terminates the magnitude
        p = lax.clz(win & _FOLLOW).astype(jnp.int32)
        p = jnp.minimum(p, 62)                          # clamp corrupt codes
        ndata = u64(p >> 1)
        pe = jnp.maximum(p, 2)
        x = win >> u64(64 - pe)                         # code bits 0..p-1
        mag = ((jnp.uint64(1) << ndata) | _compress_even(x)) - jnp.uint64(1)
        sign = (win >> u64(62 - p)) & jnp.uint64(1)
        mag_i = mag.astype(jnp.int64)
        val = jnp.where(p == 0, 0,
                        jnp.where(sign > 0, -mag_i, mag_i)).astype(jnp.int32)
        return pos + jnp.where(p == 0, 1, p + 2), val

    _, vals = lax.scan(step, pos0, None, length=n_lanes)
    return vals.T                                       # (N, n_lanes)


_ALL64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def window_words_bits(n_bits_max: int, n_lanes: int) -> int:
    """Window block size (uint32 words) for BIT-granular regions (LD):
    31 lead-alignment bits + the bounded region + one 1-bit zero code per
    remaining lane + a straddling code + 64 peek bits."""
    bits = 31 + n_bits_max + n_lanes + 2 + 64 + 64
    return (bits + 31) // 32 + 1


def unpack_component_bits(words, dstart_bits, blen_bits, n_lanes: int,
                          n_words: int):
    """Decode ``n_lanes`` signed codes per stream from BIT-granular bounded
    regions — the LD slice layout, whose luma/chroma regions start mid-byte
    (after the 7-bit qIndex + length field) and bound in bits
    (reference LDSliceIO, Slices.cpp:195-303).

    words: uint32 [P] big-endian-assembled payload words. The caller must
    pad the payload tail with 0xFF (in-bound reads past the true payload
    end are 1-bits, the reference's at-EOF rule).
    dstart_bits: int32 [N] absolute bit offset of each region.
    blen_bits: int32 [N] region length in bits (bound, >= 0).
    Returns int32 [N, n_lanes] in code order.

    Unlike the byte-aligned HQ variant (whose bound is enforced by
    positional 0xFF byte masks), the bound here is applied per scan step:
    every window bit at or past the bound ORs to 1 before the decode, which
    reproduces the bounded-read rule including codes that straddle it.
    """
    base = dstart_bits >> 5
    lead = (dstart_bits & 31).astype(jnp.int32)
    j = jnp.arange(n_words, dtype=jnp.int32)
    block = words[base[:, None] + j[None, :]]           # (N, W) gather
    bound = lead + blen_bits.astype(jnp.int32)          # block-relative

    u64 = lambda a: a.astype(jnp.uint64)

    def step(pos, _):
        widx = pos >> 5
        sh = u64(pos & 31)
        w0 = jnp.zeros_like(pos).astype(jnp.uint32)
        w1 = jnp.zeros_like(w0)
        w2 = jnp.zeros_like(w0)
        eq1 = eq2 = None
        for k in range(n_words):
            bk = block[:, k]
            eq = (widx == k).astype(jnp.uint32)
            w0 = w0 + bk * eq
            if eq1 is not None:
                w1 = w1 + bk * eq1
            if eq2 is not None:
                w2 = w2 + bk * eq2
            eq1, eq2 = eq, eq1
        win = (u64(w0) << (jnp.uint64(32) + sh)) | (u64(w1) << sh)
        t2 = u64(w2) >> (jnp.uint64(32) - jnp.maximum(sh, jnp.uint64(1)))
        win = win | jnp.where(sh > 0, t2, jnp.uint64(0))
        # bounded 1-fill: window bits at or past the bound read as 1
        ok = u64(jnp.clip(bound - pos, 0, 64))
        fill = jnp.where(ok >= 64, jnp.uint64(0),
                         _ALL64 >> jnp.minimum(ok, jnp.uint64(63)))
        win = win | fill
        p = lax.clz(win & _FOLLOW).astype(jnp.int32)
        p = jnp.minimum(p, 62)
        ndata = u64(p >> 1)
        pe = jnp.maximum(p, 2)
        x = win >> u64(64 - pe)
        mag = ((jnp.uint64(1) << ndata) | _compress_even(x)) - jnp.uint64(1)
        sign = (win >> u64(62 - p)) & jnp.uint64(1)
        mag_i = mag.astype(jnp.int64)
        val = jnp.where(p == 0, 0,
                        jnp.where(sign > 0, -mag_i, mag_i)).astype(jnp.int32)
        return pos + jnp.where(p == 0, 1, p + 2), val

    _, vals = lax.scan(step, lead, None, length=n_lanes)
    return vals.T                                       # (N, n_lanes)


def unpack_ld_lanes(payload_u8, s_bits, len_bits, y_bits, uv_bits,
                    lane_counts: tuple[int, int],
                    word_counts: tuple[int, int]):
    """Jit-composable device unpack of an LD picture's slice payload.

    payload_u8: uint8 [P4] (P4 % 4 == 0, 0xFF-padded past the true end).
    s_bits/len_bits/y_bits/uv_bits: int32 [N] from the host header scan
    (slices/ld.ld_header_fields). lane_counts: (Ly, Lc).
    Returns (qy [N, Ly], quv [N, 2*Lc] with u,v interleaved per
    coefficient, exactly the wire order — Slices.cpp:71-95)."""
    words = assemble_words(payload_u8)
    Ly, Lc = lane_counts
    d_y = (s_bits + 7 + len_bits).astype(jnp.int32)
    qy = unpack_component_bits(words, d_y, y_bits, Ly, word_counts[0])
    quv = unpack_component_bits(words, (d_y + y_bits).astype(jnp.int32),
                                uv_bits, 2 * Lc, word_counts[1])
    return qy, quv


def assemble_words(payload_u8):
    """Big-endian uint32 words from a byte payload (length multiple of 4)."""
    r = payload_u8.reshape(-1, 4).astype(jnp.uint32)
    return (r[:, 0] << 24) | (r[:, 1] << 16) | (r[:, 2] << 8) | r[:, 3]


def hq_component_offsets(clens, prefix: int, start):
    """Per-component data byte offsets from the slice chain structure
    (Slices.cpp:384-467: prefix zeros, 1B qIndex, then per component
    {1B length, data}). clens: int32 [3, N]."""
    totals = prefix + 4 + clens[0] + clens[1] + clens[2]
    sstart = start + jnp.cumsum(totals) - totals
    d0 = sstart + prefix + 2
    d1 = d0 + clens[0] + 1
    d2 = d1 + clens[1] + 1
    return d0, d1, d2


def unpack_chroma_pair(words, d1, d2, clen1, clen2, n_lanes: int,
                       n_words: int):
    """Decode the two chroma components in ONE lane scan by stacking their
    regions along the slice axis (same lane count; one scan dispatch, twice
    the vector width). Returns (qu, qv)."""
    n = d1.shape[0]
    dstart = jnp.concatenate([d1, d2])
    clen = jnp.concatenate([clen1, clen2])
    both = unpack_component(words, dstart, clen, n_lanes, n_words)
    return both[:n], both[n:]


def unpack_hq_lanes(payload_u8, clens, start, prefix: int,
                    lane_counts: tuple[int, int, int],
                    word_counts: tuple[int, int, int]):
    """Jit-composable device unpack of a whole HQ picture's slice payload.

    payload_u8: uint8 [P4] (P4 % 4 == 0, zero/any padded).
    clens: int32 [3, N] component byte lengths (from the host chain scan).
    start: int32 scalar, byte offset of the first slice.
    Returns (qy, qu, qv) int32 lane arrays.
    """
    words = assemble_words(payload_u8)
    d0, d1, d2 = hq_component_offsets(clens, prefix, start)
    qy = unpack_component(words, d0, clens[0], lane_counts[0], word_counts[0])
    qu, qv = unpack_chroma_pair(words, d1, d2, clens[1], clens[2],
                                lane_counts[1],
                                max(word_counts[1], word_counts[2]))
    return qy, qu, qv
