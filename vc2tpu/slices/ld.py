"""LD-profile slice payload codec (batched pack/unpack).

Wire format per slice (reference /root/reference/src/Library/src/Slices.cpp:
195-303): 7-bit qIndex, an ``intlog2(8*size-7)``-bit luma-length field, a
bounded luma exp-Golomb region of exactly that many bits, then the remaining
bits as a bounded interleaved-U,V region zero-filled to the slice end.
Slices are fixed-size (the CBR byte map), so offsets vectorise fully.
"""

from __future__ import annotations

import numpy as np

from vc2tpu.core.intmath import intlog2
from vc2tpu.vlc import golomb
from vc2tpu.vlc.bitpack import pack_codes, unpack_signed_streams
from vc2tpu._native.bridge import native


def _codes(lanes: np.ndarray):
    if native is not None:
        codes = np.empty(lanes.size, dtype=np.uint64)
        nbits = np.empty(lanes.size, dtype=np.uint32)
        native.encode_lanes(lanes, codes, nbits)
        return codes.reshape(lanes.shape), nbits.reshape(lanes.shape)
    return golomb.signed_codes_np(lanes)


def _bits_used(lanes: np.ndarray) -> np.ndarray:
    n, L = lanes.shape
    if native is not None:
        out = np.zeros(n, dtype=np.int32)
        native.component_bits_used(lanes, n, L, out)
        return out.astype(np.int64)
    _, nbits = golomb.signed_codes_np(lanes)
    gross = np.cumsum(nbits.astype(np.int64), axis=1)
    return np.where(lanes != 0, gross, 0).max(axis=1).astype(np.int64)


def _emit(codes, nbits, start_bits, bound_bits):
    """Clip each slice-row of codes at its bound; return flat arrays."""
    nbits64 = nbits.astype(np.int64)
    cum = np.cumsum(nbits64, axis=1) - nbits64
    keep = np.clip(bound_bits[:, None] - cum, 0, nbits64)
    codes = np.where(keep < nbits64, codes >> (nbits64 - keep).astype(np.uint64),
                     codes)
    offsets = start_bits[:, None] + cum
    live = keep > 0
    return codes[live], keep[live].astype(np.uint32), offsets[live]


def encode_ld_slices(q_indices: np.ndarray, lanes_y: np.ndarray,
                     lanes_u: np.ndarray, lanes_v: np.ndarray,
                     slice_sizes: np.ndarray):
    """Pack all LD slices; returns (payload_bytes, per_slice_sizes)."""
    sizes = slice_sizes.astype(np.int64).ravel()
    n = len(sizes)
    if native is not None:
        out = np.zeros(int(sizes.sum()), np.uint8)
        if native.ld_pack(q_indices.ravel(), lanes_y, lanes_u, lanes_v,
                          sizes, out):
            raise ValueError(
                "SliceIO, LD mode: Too many bytes for the U and V slices")
        return out.tobytes(), sizes
    len_bits = np.array([intlog2(int(8 * s - 7)) for s in sizes], dtype=np.int64)
    y_bits = _bits_used(lanes_y)
    uv_bits = 8 * sizes - 7 - len_bits - y_bits
    # interleave chroma lanes: u0 v0 u1 v1 ... (Slices.cpp:230-241)
    Lc = lanes_u.shape[1]
    uv = np.empty((n, 2 * Lc), dtype=np.int32)
    uv[:, 0::2] = lanes_u
    uv[:, 1::2] = lanes_v
    need_uv = _bits_used(uv)
    if (uv_bits < need_uv).any():
        raise ValueError("SliceIO, LD mode: Too many bytes for the U and V slices")
    starts = np.concatenate([[0], np.cumsum(sizes)])
    total_bytes = int(starts[-1])
    s_bits = starts[:-1] * 8

    all_codes, all_nbits, all_offsets = [], [], []
    # headers as fixed-width codes
    all_codes.append(q_indices.astype(np.uint64))
    all_nbits.append(np.full(n, 7, dtype=np.uint32))
    all_offsets.append(s_bits)
    all_codes.append(y_bits.astype(np.uint64))
    all_nbits.append(len_bits.astype(np.uint32))
    all_offsets.append(s_bits + 7)
    # luma region
    cy, ny = _codes(lanes_y)
    c, nb, off = _emit(cy, ny, s_bits + 7 + len_bits, y_bits)
    all_codes.append(c); all_nbits.append(nb); all_offsets.append(off)
    # chroma region
    cu, nu = _codes(uv)
    c, nb, off = _emit(cu, nu, s_bits + 7 + len_bits + y_bits, uv_bits)
    all_codes.append(c); all_nbits.append(nb); all_offsets.append(off)

    payload = pack_codes(np.concatenate(all_codes),
                         np.concatenate(all_nbits),
                         np.concatenate(all_offsets), total_bytes * 8)
    return payload.tobytes(), sizes


def ld_header_fields(payload: np.ndarray, slice_sizes: np.ndarray,
                     start: int = 0):
    """Per-slice LD header scan: (q, s_bits, len_bits, y_bits, uv_bits,
    end_offset). The 7-bit qIndex and luma-length fields live in the first
    few bytes of each byte-aligned slice: unpack ONLY those (a full
    payload bit expansion would be an 8x allocation every picture). The
    0xFF tail pad gives past-payload reads the reference's at-EOF 1-bits.
    Shared by the host coefficient unpack and the on-chip (device) one."""
    sizes = slice_sizes.astype(np.int64).ravel()
    n = len(sizes)
    starts = start + np.concatenate([[0], np.cumsum(sizes)])[:-1]
    s_bits = starts * 8
    len_bits = np.array([intlog2(int(8 * s - 7)) for s in sizes], dtype=np.int64)
    k = (7 + int(len_bits.max(initial=0)) + 7) // 8
    buf = np.concatenate([np.asarray(payload, np.uint8),
                          np.full(k, 0xFF, np.uint8)])
    idx = np.minimum(starts[:, None] + np.arange(k)[None, :], len(buf) - 1)
    hbits = np.unpackbits(buf[idx], axis=1).astype(np.int64)   # (n, 8k)
    rows = np.arange(n)

    def field(off, widths):
        out = np.zeros(n, dtype=np.int64)
        for b in range(int(widths.max(initial=0))):
            take = b < widths
            out = np.where(take, (out << 1) | hbits[rows, off + b], out)
        return out

    q = field(0, np.full(n, 7, dtype=np.int64)).astype(np.int32)
    y_bits = field(7, len_bits)
    uv_bits = np.maximum(8 * sizes - 7 - len_bits - y_bits, 0)
    return q, s_bits, len_bits, y_bits, uv_bits, int(starts[-1] + sizes[-1])


def decode_ld_slices(payload: np.ndarray, slice_sizes: np.ndarray,
                     lane_counts: tuple[int, int], start: int = 0):
    """Decode LD slices. Returns (q_indices, lanes_y, lanes_u, lanes_v,
    end_offset)."""
    Ly, Lc = lane_counts
    q, s_bits, len_bits, y_bits, uv_bits, end = ld_header_fields(
        payload, slice_sizes, start)
    lanes_y = unpack_signed_streams(payload, s_bits + 7 + len_bits, y_bits, Ly)
    uv = unpack_signed_streams(payload, s_bits + 7 + len_bits + y_bits,
                               uv_bits, 2 * Lc)
    return q, lanes_y, uv[:, 0::2].copy(), uv[:, 1::2].copy(), end
