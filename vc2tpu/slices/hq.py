"""HQ-profile slice payload codec (CBR + VBR wire formats), batched.

Wire format per slice (reference /root/reference/src/Library/src/Slices.cpp:
305-612): ``prefix`` zero bytes, 1-byte qIndex, then per component
{1-byte length/scalar, bounded exp-Golomb data, byte-align}. CBR forces the
third component to fill ``sliceSize - 4 - yBytes - uBytes``; VBR sizes all
three exactly. Trailing zero-valued coefficients whose 1-bit codes fall past
the bound are dropped (bounded-write rule) — that is the truncation trick
that makes the sizes work.

All slices are packed/unpacked with flat-vectorised NumPy + the native
bit scatter; no per-slice Python loop on the encode path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from vc2tpu.vlc import golomb
from vc2tpu.vlc.bitpack import pack_codes, unpack_signed_streams
from vc2tpu._native.bridge import native


@dataclasses.dataclass
class HQSliceData:
    """Decoded HQ slice grid: qIndices plus per-component lane arrays.

    ``combined`` (when set) is ONE flat buffer [y lanes | c1 lanes | c2 lanes]
    (int16 normally, int32 if a coefficient overflowed int16) so the whole
    coefficient payload moves to the device in a single small transfer; the
    per-component ``lanes`` views alias it."""

    q_indices: np.ndarray           # int32 [N]
    lanes: tuple                    # (y, c1, c2) [N, L_comp]
    total_bytes: int = 0
    combined: np.ndarray | None = None
    widths: np.ndarray | None = None   # fixed-pack widths, uint8 [3N]


def _bits_used(lanes: np.ndarray) -> np.ndarray:
    """Per-slice bit count with trailing-zero truncation (Slices.cpp:97-113)."""
    n, L = lanes.shape
    out = np.zeros(n, dtype=np.int32)
    if native is not None:
        native.component_bits_used(lanes, n, L, out)
        return out
    _, nbits = golomb.signed_codes_np(lanes)
    gross = np.cumsum(nbits.astype(np.int64), axis=1)
    used = np.where(lanes != 0, gross, 0).max(axis=1)
    return used.astype(np.int32)


def component_bytes(lanes: np.ndarray, scalar: int) -> np.ndarray:
    """component_slice_bytes per slice (Slices.cpp:97-119)."""
    count = _bits_used(lanes)
    scaled = ((count + 7) // 8 + scalar - 1) // scalar
    if (scaled > 0xFF).any():
        raise ValueError(
            "Slice scalar is too small, consider using a larger slice scalar.")
    return (scaled * scalar).astype(np.int64)


def encode_hq_slices(q_indices: np.ndarray, lanes_y: np.ndarray,
                     lanes_u: np.ndarray, lanes_v: np.ndarray,
                     prefix: int, scalar: int,
                     slice_sizes: np.ndarray | None = None):
    """Pack all slices of a picture.

    slice_sizes: CBR per-slice nominal byte budget (N,), or None for VBR.
    Returns (payload_bytes, per_slice_total_bytes).
    """
    n = len(q_indices)
    yb = component_bytes(lanes_y, scalar)
    ub = component_bytes(lanes_u, scalar)
    if slice_sizes is None:
        vb = component_bytes(lanes_v, scalar)
    else:
        sizes = slice_sizes.astype(np.int64).ravel()
        vb = sizes - 4 - yb - ub
        need = component_bytes(lanes_v, scalar)
        if (vb < need).any():
            raise ValueError("SliceIO, HQ CBR mode: Too many bytes for the slice")
        if (vb // scalar > 255).any():
            raise ValueError(
                "Slice component length exceeds 1 byte when divided by "
                "slice size scalar. See above for suggestions to prevent "
                "this.")
    totals = prefix + 4 + yb + ub + vb
    starts = np.concatenate([[0], np.cumsum(totals)])
    total_bytes = int(starts[-1])
    payload = np.zeros(total_bytes, dtype=np.uint8)

    if native is not None:
        native.hq_pack_write(q_indices, lanes_y, lanes_u, lanes_v, prefix,
                             scalar, yb, ub, vb, starts[:-1], payload)
        return payload.tobytes(), totals

    # fixed header bytes
    s = starts[:-1]
    payload[s + prefix] = q_indices.astype(np.uint8)
    payload[s + prefix + 1] = (yb // scalar).astype(np.uint8)
    payload[s + prefix + 2 + yb] = (ub // scalar).astype(np.uint8)
    payload[s + prefix + 3 + yb + ub] = (vb // scalar).astype(np.uint8)

    data_start = (
        s + prefix + 2,                # y data
        s + prefix + 3 + yb,           # u data
        s + prefix + 4 + yb + ub,      # v data
    )
    comp_bytes = (yb, ub, vb)
    lanes_all = (lanes_y, lanes_u, lanes_v)

    all_codes, all_nbits, all_offsets = [], [], []
    for comp in range(3):
        lanes = lanes_all[comp]
        codes, nbits = golomb.signed_codes_np(lanes)
        nbits64 = nbits.astype(np.int64)
        cum = np.cumsum(nbits64, axis=1) - nbits64      # exclusive prefix sum
        bound = comp_bytes[comp][:, None] * 8
        keep = np.clip(bound - cum, 0, nbits64)
        codes = np.where(keep < nbits64,
                         codes >> (nbits64 - keep).astype(np.uint64), codes)
        offsets = data_start[comp][:, None] * 8 + cum
        live = keep > 0
        all_codes.append(codes[live])
        all_nbits.append(keep[live].astype(np.uint32))
        all_offsets.append(offsets[live])
    codes = np.concatenate(all_codes)
    nbits = np.concatenate(all_nbits)
    offsets = np.concatenate(all_offsets)
    packed = pack_codes(codes, nbits, offsets, total_bytes * 8)
    payload |= packed[:total_bytes]
    return payload.tobytes(), totals


def scan_hq_slice_offsets(payload: np.ndarray, n_slices: int, prefix: int,
                          scalar: int, start: int = 0):
    """Walk the self-describing VBR slice chain to locate per-slice fields.

    Returns (q_indices[N], data_starts[3][N] byte offsets, comp_bytes[3][N],
    end_offset). The chain walk is sequential by construction (each slice's
    size comes from its three length bytes), but is only ~4 reads per slice.
    """
    q = np.zeros(n_slices, dtype=np.int32)
    dstart = np.zeros((3, n_slices), dtype=np.int64)
    cbytes = np.zeros((3, n_slices), dtype=np.int64)
    if native is not None:
        payload = np.ascontiguousarray(payload, np.uint8)
        end = native.scan_hq_offsets(payload, n_slices, prefix, scalar, start,
                                     q, dstart.ravel(), cbytes.ravel())
        if end < 0:
            raise ValueError("slice payload runs past the end of the data unit")
        dstart = dstart.reshape(3, n_slices)
        cbytes = cbytes.reshape(3, n_slices)
        return q, dstart, cbytes, int(end)
    pos = start
    try:
        for i in range(n_slices):
            pos += prefix
            q[i] = payload[pos]
            pos += 1
            for c in range(3):
                size = int(payload[pos]) * scalar
                pos += 1
                dstart[c, i] = pos
                cbytes[c, i] = size
                pos += size
    except IndexError:
        raise ValueError("slice payload runs past the end of the data unit")
    if pos > len(payload):
        raise ValueError("slice payload runs past the end of the data unit")
    return q, dstart, cbytes, pos


def decode_hq_slices(payload: np.ndarray, n_slices: int, prefix: int,
                     scalar: int, lane_counts: tuple[int, int, int],
                     start: int = 0) -> HQSliceData:
    """Decode a run of HQ slices from ``payload`` (uint8 array).

    HQ slices are always parsed with the self-describing VBR lengths, as
    the reference decoder does (DecodeStream.cpp:512 — HQSliceIO_CBR's
    read-side length validation, Slices.cpp:443-446, is never reached
    from a stream decode).
    """
    q, dstart, cbytes, end = scan_hq_slice_offsets(payload, n_slices, prefix,
                                                   scalar, start)
    if native is not None:
        payload = np.ascontiguousarray(payload, np.uint8)
        sizes = [n_slices * lc for lc in lane_counts]
        combined = np.empty(sum(sizes), dtype=np.int16)
        widths = np.empty(3 * n_slices, dtype=np.uint8)
        splits = np.cumsum([0] + sizes)
        overflow = 0
        for c in range(3):
            view = combined[splits[c]:splits[c + 1]].reshape(n_slices,
                                                             lane_counts[c])
            overflow |= native.unpack_streams_i16(
                payload, len(payload), dstart[c] * 8, cbytes[c] * 8,
                n_slices, lane_counts[c], view,
                widths[c * n_slices:(c + 1) * n_slices])
        if not overflow:
            lanes = tuple(
                combined[splits[c]:splits[c + 1]].reshape(n_slices,
                                                          lane_counts[c])
                for c in range(3))
            return HQSliceData(q_indices=q, lanes=lanes,
                               total_bytes=end - start, combined=combined,
                               widths=widths)
    lanes = []
    for c in range(3):
        lanes.append(unpack_signed_streams(payload, dstart[c] * 8,
                                           cbytes[c] * 8, lane_counts[c]))
    combined = np.concatenate([l.ravel() for l in lanes]).astype(np.int32)
    return HQSliceData(q_indices=q, lanes=tuple(lanes),
                       total_bytes=end - start, combined=combined)
