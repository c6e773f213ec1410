"""Host-side bit packing / unpacking of exp-Golomb coefficient payloads.

Packing is vectorised NumPy: every code is scattered into a big-endian
uint64 word buffer with at most two ``bitwise_or.at`` scatters (a code spans
at most two 64-bit words). Unpacking runs the interleaved exp-Golomb state
machine; the C++ native module (vc2tpu/_native) is used when available,
with a lockstep-vectorised NumPy fallback.

Bounded-region semantics follow the reference exactly
(/root/reference/src/Library/src/VLC.cpp:149-257): writes beyond the bound
silently drop 1-bits (zero-valued trailing codes), reads beyond the bound
return 1-bits, and ``flush`` zero-fills to the bound.
"""

from __future__ import annotations

import numpy as np

from vc2tpu._native.bridge import native


def pack_codes(codes: np.ndarray, nbits: np.ndarray, bit_offsets: np.ndarray,
               total_bits: int) -> np.ndarray:
    """Scatter codes (uint64, MSB-first within ``nbits`` low bits) at absolute
    ``bit_offsets`` into a fresh buffer of ``total_bits`` bits. Returns uint8
    bytes (big-endian bit order). Codes (or code tails) that fall beyond
    ``total_bits`` must be all-ones and are dropped (bounded-write rule); the
    caller guarantees this by construction."""
    n_words = (int(total_bits) + 63) // 64
    if native is not None:
        out = np.zeros(n_words * 8, dtype=np.uint8)
        native.pack_codes(codes, nbits, bit_offsets, len(codes), total_bits, out)
        return out[: (int(total_bits) + 7) // 8]
    words = np.zeros(n_words, dtype=np.uint64)
    codes = codes.astype(np.uint64).ravel()
    n = nbits.astype(np.int64).ravel()
    o = bit_offsets.astype(np.int64).ravel()
    # putBits writes only the low nbits of a value (VLC.cpp:259-281): mask
    # so a too-wide value cannot bleed into the preceding field's bytes
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    mask = np.where(n >= 64, full,
                    (np.uint64(1) << np.minimum(n, 63).astype(np.uint64))
                    - np.uint64(1))
    codes = codes & mask
    end = o + n
    # clip codes straddling / beyond the bound: keep only bits before total_bits
    over = np.maximum(end - int(total_bits), 0)
    keep = n - over
    live = keep > 0
    codes, n, o, end, over, keep = (a[live] for a in (codes, n, o, end, over, keep))
    codes = np.where(over > 0, codes >> over.astype(np.uint64), codes)
    n = keep
    end = o + n
    w0 = o >> 6
    avail = 64 - (o & 63)
    fits = n <= avail
    sh1 = np.where(fits, avail - n, 0).astype(np.uint64)
    part1 = np.where(fits, codes << sh1, codes >> (n - avail).astype(np.uint64))
    np.bitwise_or.at(words, w0, part1.astype(np.uint64))
    spill = ~fits
    if spill.any():
        overflow = (n - avail)[spill].astype(np.uint64)
        tail = (codes[spill] & ((np.uint64(1) << overflow) - np.uint64(1)))
        tail = tail << (np.uint64(64) - overflow)
        np.bitwise_or.at(words, w0[spill] + 1, tail)
    buf = words.astype(">u8").tobytes()
    return np.frombuffer(buf, dtype=np.uint8)[: (int(total_bits) + 7) // 8].copy()


def unpack_signed_streams(payload: np.ndarray, start_bits: np.ndarray,
                          bound_bits: np.ndarray, n_lanes: int) -> np.ndarray:
    """Decode S bounded exp-Golomb streams, ``n_lanes`` signed values each.

    payload: uint8 byte buffer (shared); start_bits/bound_bits: int64[S]
    absolute start offset and region length in bits. Returns int32[S, n_lanes].
    """
    S = len(start_bits)
    out = np.zeros((S, n_lanes), dtype=np.int32)
    if S == 0 or n_lanes == 0:
        return out
    if native is not None:
        native.unpack_streams(payload, len(payload), start_bits.astype(np.int64),
                              bound_bits.astype(np.int64), S, n_lanes, out)
        return out
    # one trailing 1-pad: in-bound reads past the PAYLOAD end must see
    # 1-bits exactly like the reference istream at EOF (VLC.cpp getBit ->
    # 0xFF) and the native engine (vc2host.cpp bounded fetch); the clamp
    # below lands every past-end index on the pad (and makes an empty
    # payload decode as all-ones instead of crashing)
    bits = np.concatenate([np.unpackbits(payload), np.ones(1, np.uint8)])
    start = start_bits.astype(np.int64)
    bound = bound_bits.astype(np.int64)
    pos = np.zeros(S, dtype=np.int64)          # bits consumed in region
    lane = np.zeros(S, dtype=np.int64)
    acc = np.ones(S, dtype=np.int64)
    phase = np.zeros(S, dtype=np.int8)         # 0=follow, 1=data, 2=sign
    pending = np.zeros(S, dtype=np.int64)      # magnitude awaiting sign
    rows = np.arange(S)
    while True:
        active = lane < n_lanes
        # streams past their bound and at a fresh follow state produce only
        # zeros for the remaining lanes — finish them wholesale
        flush = active & (pos >= bound) & (phase == 0) & (acc == 1)
        if flush.any():
            lane[flush] = n_lanes
            active = lane < n_lanes
        if not active.any():
            break
        virt = pos >= bound
        idx = np.minimum(start + pos, bits.size - 1)
        bit = np.where(virt, 1, bits[idx]).astype(np.int64)
        bit = np.where(active, bit, 0)
        pos[active] += 1

        is_follow = active & (phase == 0)
        is_data = active & (phase == 1)
        is_sign = active & (phase == 2)

        # data: acc = acc<<1 | bit, back to follow
        acc[is_data] = (acc[is_data] << 1) | bit[is_data]
        phase[is_data] = 0

        # follow with bit==0 -> expect data bit
        f0 = is_follow & (bit == 0)
        phase[f0] = 1

        # follow with bit==1 -> value complete
        f1 = is_follow & (bit == 1)
        mag = acc[f1] - 1
        zero = mag == 0
        f1z = f1.copy(); f1z[f1] = zero
        f1n = f1.copy(); f1n[f1] = ~zero
        out[rows[f1z], lane[f1z]] = 0
        lane[f1z] += 1
        acc[f1z] = 1
        pending[f1n] = mag[~zero]
        phase[f1n] = 2

        # sign bit
        val = np.where(bit[is_sign] == 1, -pending[is_sign], pending[is_sign])
        out[rows[is_sign], lane[is_sign]] = val
        lane[is_sign] += 1
        acc[is_sign] = 1
        phase[is_sign] = 0
    return out
