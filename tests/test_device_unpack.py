"""On-device HQ entropy unpack (vlc/device_unpack.py) exactness tests.

The contract: the jitted device unpack must reproduce the host codec
(slices/hq.py + vlc/bitpack.py, itself golden-verified against the
reference binaries) bit-exactly, including bounded-region semantics
(reads past the bound return 1-bits — reference
/root/reference/src/Library/src/VLC.cpp:182-185) and codes that straddle
the bound.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vc2tpu.slices.hq import (decode_hq_slices, encode_hq_slices,
                              scan_hq_slice_offsets)
from vc2tpu.vlc import device_unpack as du
from vc2tpu.vlc.bitpack import unpack_signed_streams


def _device_lanes(payload: np.ndarray, n, prefix, scalar, lane_counts):
    _, _, cbytes, _ = scan_hq_slice_offsets(payload, n, prefix, scalar)
    p4 = (len(payload) + 3) // 4 * 4 + 8
    pad = np.zeros(p4, np.uint8)
    pad[:len(payload)] = payload
    wc = tuple(du.window_words(int(cbytes[c].max(initial=0)), lane_counts[c])
               for c in range(3))
    fn = jax.jit(lambda p, c, s: du.unpack_hq_lanes(p, c, s, prefix,
                                                    lane_counts, wc))
    return fn(jnp.asarray(pad), jnp.asarray(cbytes, jnp.int32), jnp.int32(0))


@pytest.mark.parametrize("scale,prefix,scalar,cbr", [
    (12, 0, 1, False),
    (300, 2, 3, False),
    (200000, 0, 1, False),      # huge magnitudes (long codes)
    (7, 0, 1, True),            # CBR: padded third component (bounded 1s)
    (3, 1, 2, True),
])
def test_unpack_matches_host_codec(scale, prefix, scalar, cbr):
    rng = np.random.default_rng(hash((scale, prefix, scalar, cbr)) % 2**32)
    N, Ly, Lc = 37, 64, 32
    ly = rng.normal(0, scale, (N, Ly)).astype(np.int32)
    lu = rng.normal(0, scale / 2, (N, Lc)).astype(np.int32)
    lv = rng.normal(0, scale / 2, (N, Lc)).astype(np.int32)
    ly[rng.random((N, Ly)) < 0.4] = 0
    lu[rng.random((N, Lc)) < 0.6] = 0
    lv[:, Lc // 2:] = 0                     # trailing-zero truncation paths
    q = rng.integers(0, 50, N).astype(np.int32)
    sizes = np.full(N, 160, np.int64) if cbr else None
    payload, _ = encode_hq_slices(q, ly, lu, lv, prefix, scalar,
                                  slice_sizes=sizes)
    pl = np.frombuffer(payload, np.uint8)
    ref = decode_hq_slices(pl, N, prefix, scalar, (Ly, Lc, Lc))
    got = _device_lanes(pl, N, prefix, scalar, (Ly, Lc, Lc))
    for a, b in zip(ref.lanes, got):
        np.testing.assert_array_equal(np.asarray(a, np.int32), np.asarray(b))


def test_unpack_random_bytes_fuzz():
    """Ultimate parity fuzz: decode bounded regions of *random bytes*
    (arbitrary code shapes, straddling codes, mid-code truncation) and
    compare against the reference-faithful host state machine."""
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, 4096, dtype=np.uint8)
    S, L = 64, 24
    starts = np.sort(rng.integers(0, 3000, S)).astype(np.int64)
    lens = rng.integers(0, 40, S).astype(np.int64)          # bytes, incl. 0
    ref = unpack_signed_streams(payload, starts * 8, lens * 8, L)
    p4 = (len(payload) + 3) // 4 * 4 + 8
    pad = np.zeros(p4, np.uint8)
    pad[:len(payload)] = payload
    W = du.window_words(int(lens.max()), L)
    words = du.assemble_words(jnp.asarray(pad))
    got = jax.jit(lambda w, d, c: du.unpack_component(w, d, c, L, W))(
        words, jnp.asarray(starts, jnp.int32), jnp.asarray(lens, jnp.int32))
    np.testing.assert_array_equal(ref, np.asarray(got))


def _pack_interleaved(vals):
    """Reference-shaped interleaved exp-Golomb packer (VLC.cpp:54-94): for
    magnitude m, the bits of m+1 below the leading 1, each preceded by a 0
    follow bit, then a 1 terminator, then the sign bit if m != 0."""
    bits = []
    for v in vals:
        m = abs(int(v))
        b = bin(m + 1)[3:]                  # bits below the leading 1
        for ch in b:
            bits += [0, int(ch)]
        bits.append(1)
        if m:
            bits.append(1 if v < 0 else 0)
    bits += [1] * (-len(bits) % 8)          # pad to a byte with 1s (0-codes)
    out = np.zeros(len(bits) // 8, np.uint8)
    for i, bit in enumerate(bits):
        out[i // 8] |= bit << (7 - i % 8)
    return out


@pytest.mark.parametrize("case", ["all_long", "alternating", "all_zero_bytes",
                                  "all_ones", "ramp"])
def test_unpack_adversarial_scan_bound(case):
    """Worst cases for the multi-code-per-peek scan's static step bound:
    rows of maximal 64-bit codes (one code per peek), tiny/huge
    alternation (peek-straddle every other code), all-0x00 regions (the
    corrupt-code clamp consuming 64 bits per step), all-0xFF (pure 1-fill,
    K codes per peek), and a magnitude ramp crossing every code length.
    Oracle: the host state machine (unpack_signed_streams)."""
    rng = np.random.default_rng(42)
    L = 24
    big = (1 << 30) + 12345                 # 62-bit code (31 data bits)
    if case == "all_long":
        rows = [[-big if i % 2 else big for i in range(L)]] * 4
        regions = [_pack_interleaved(r) for r in rows]
    elif case == "alternating":
        rows = [[0 if i % 2 else big for i in range(L)],
                [big if i % 3 else 0 for i in range(L)],
                [0, 0, big, big] * (L // 4)]
        regions = [_pack_interleaved(r) for r in rows]
    elif case == "all_zero_bytes":
        # <= 7-byte zero runs: a 56-bit all-zero code terminated by the
        # bound's 1-fill decodes exactly; 8+ bytes would enter the >62-bit
        # corrupt-code clamp, where the device engine (old and new) is
        # documented to diverge from the reference's undefined int wrap
        regions = [np.zeros(n, np.uint8) for n in (1, 3, 5, 7)]
    elif case == "all_ones":
        regions = [np.full(n, 0xFF, np.uint8) for n in (1, 8, 64)]
    else:
        rows = [[(1 << k) - 1 for k in range(L)],
                [-(1 << k) for k in range(L)]]
        regions = [_pack_interleaved(r) for r in rows]
    # scatter the regions into one payload at unaligned offsets
    gap = rng.integers(1, 5, len(regions))
    starts, lens, chunks, pos = [], [], [], 0
    for g, r in zip(gap, regions):
        chunks.append(np.zeros(g, np.uint8))
        pos += int(g)
        starts.append(pos)
        lens.append(len(r))
        chunks.append(r)
        pos += len(r)
    payload = np.concatenate(chunks)
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    ref = unpack_signed_streams(payload, starts * 8, lens * 8, L)
    p4 = (len(payload) + 3) // 4 * 4 + 8
    pad = np.zeros(p4, np.uint8)
    pad[:len(payload)] = payload
    W = du.window_words(int(lens.max()), L)
    words = du.assemble_words(jnp.asarray(pad))
    got = jax.jit(lambda w, d, c: du.unpack_component(w, d, c, L, W))(
        words, jnp.asarray(starts, jnp.int32), jnp.asarray(lens, jnp.int32))
    np.testing.assert_array_equal(ref, np.asarray(got))


def test_unpack_zero_length_components():
    """A 0-byte bounded region reads only 1-bits: every lane decodes 0."""
    N, Ly, Lc = 5, 16, 8
    z = np.zeros((N, Ly), np.int32)
    q = np.zeros(N, np.int32)
    payload, _ = encode_hq_slices(q, z, z[:, :Lc].copy(), z[:, :Lc].copy(),
                                  0, 1)
    pl = np.frombuffer(payload, np.uint8)
    got = _device_lanes(pl, N, 0, 1, (Ly, Lc, Lc))
    for g in got:
        assert not np.asarray(g).any()


def test_payload_synthesis_matches_lane_synthesis():
    """pipeline.decoder.synthesise_payload_to_words (full on-chip decode)
    must emit the same formatted words as the host-unpack device tail."""
    from vc2tpu.core.config import ColourFormat, PictureGeometry, WaveletKernel
    from vc2tpu.pipeline.decoder import (synthesise_payload_to_words,
                                         synthesise_to_words)
    from vc2tpu.pipeline.encoder import SliceGeometry
    from vc2tpu.wavelet import matrices

    rng = np.random.default_rng(3)
    ys = xs = 4
    lsh, lsw = 8, 8
    csh, csw = 8, 4
    geo = SliceGeometry(ys, xs, (ys * lsh, xs * lsw), (ys * csh, xs * csw),
                        (lsh, lsw), (csh, csw))
    N, Ly, Lc = ys * xs, lsh * lsw, csh * csw
    ly = rng.normal(0, 40, (N, Ly)).astype(np.int32)
    lu = rng.normal(0, 20, (N, Lc)).astype(np.int32)
    lv = rng.normal(0, 20, (N, Lc)).astype(np.int32)
    q = rng.integers(0, 30, N).astype(np.int32)
    payload, _ = encode_hq_slices(q, ly, lu, lv, 0, 1)
    pl = np.frombuffer(payload, np.uint8)
    data = decode_hq_slices(pl, N, 0, 1, (Ly, Lc, Lc))
    kernel, depth = WaveletKernel.LeGall, 2
    qm = matrices.quant_matrix(kernel, depth)
    out_geom = PictureGeometry.of(ys * lsh, xs * lsw, ColourFormat.CF422)
    ref_words, ref_post = synthesise_to_words(
        data.combined, data.q_indices, qm, kernel, depth, geo, out_geom, 10,
        widths=data.widths)
    _, _, cbytes, _ = scan_hq_slice_offsets(pl, N, 0, 1)
    got_words, got_post = synthesise_payload_to_words(
        pl, q, cbytes, qm, kernel, depth, geo, out_geom, 10, 0)
    assert ref_post(np.asarray(ref_words)) == got_post(np.asarray(got_words))


def _device_ld_lanes(payload: np.ndarray, sizes, Ly, Lc, start=0):
    from vc2tpu.slices.ld import ld_header_fields

    q, s_bits, len_bits, y_bits, uv_bits, _ = ld_header_fields(
        payload, sizes, start)
    p4 = (len(payload) + 3) // 4 * 4 + 8
    pad = np.full(p4, 0xFF, np.uint8)       # at-EOF reads are 1-bits
    pad[:len(payload)] = payload
    wc = (du.window_words_bits(int(y_bits.max(initial=0)), Ly),
          du.window_words_bits(int(uv_bits.max(initial=0)), 2 * Lc))
    fn = jax.jit(lambda p, s, l, y, u: du.unpack_ld_lanes(
        p, s, l, y, u, (Ly, Lc), wc))
    qy, quv = fn(jnp.asarray(pad),
                 jnp.asarray(s_bits, jnp.int32),
                 jnp.asarray(len_bits, jnp.int32),
                 jnp.asarray(y_bits, jnp.int32),
                 jnp.asarray(uv_bits, jnp.int32))
    qy, quv = np.asarray(qy), np.asarray(quv)
    return q, qy, quv[:, 0::2], quv[:, 1::2]


@pytest.mark.parametrize("seed,scale", [(0, 8), (1, 200), (2, 2500)])
def test_ld_unpack_matches_host_codec(seed, scale):
    """Device LD unpack (bit-granular bounded regions) == the host decode,
    lane for lane, on real LD payloads."""
    from vc2tpu.slices.ld import decode_ld_slices, encode_ld_slices

    rng = np.random.default_rng(seed)
    N, Ly, Lc = 24, 64, 32
    q = rng.integers(0, 100, N).astype(np.int32)
    ly = rng.normal(0, scale, (N, Ly)).astype(np.int32)
    # UV must FIT their remaining region (the reference LD writer throws
    # otherwise, Slices.cpp:210) — only the luma region truncates
    lu = rng.normal(0, min(scale / 2, 40), (N, Lc)).astype(np.int32)
    lv = rng.normal(0, min(scale / 2, 40), (N, Lc)).astype(np.int32)
    ly[rng.random((N, Ly)) < 0.4] = 0
    lu[rng.random((N, Lc)) < 0.6] = 0
    lv[:, Lc // 2:] = 0
    sizes = np.full(N, 220, np.int64)       # bounded: big luma codes truncate
    payload, _ = encode_ld_slices(q, ly, lu, lv, sizes)
    pl = np.frombuffer(payload, np.uint8)
    want_q, wy, wu, wv, _ = decode_ld_slices(pl, sizes, (Ly, Lc))
    got_q, gy, gu, gv = _device_ld_lanes(pl, sizes, Ly, Lc)
    np.testing.assert_array_equal(got_q, want_q)
    np.testing.assert_array_equal(gy, wy)
    np.testing.assert_array_equal(gu, wu)
    np.testing.assert_array_equal(gv, wv)


def test_ld_unpack_random_bytes_fuzz():
    """Pure-noise and truncated payloads decode identically to the host
    state machine (bounded 1-fill incl. codes straddling the bit bound)."""
    from vc2tpu.slices.ld import decode_ld_slices

    rng = np.random.default_rng(77)
    N, Ly, Lc = 16, 24, 12
    sizes = rng.integers(4, 40, N).astype(np.int64)
    for trial in range(6):
        pl = rng.integers(0, 256, int(sizes.sum()), dtype=np.uint8)
        if trial % 2:
            pl = pl[:-9]                    # truncated: EOF 1-bit reads
        want_q, wy, wu, wv, _ = decode_ld_slices(pl, sizes, (Ly, Lc))
        got_q, gy, gu, gv = _device_ld_lanes(pl, sizes, Ly, Lc)
        np.testing.assert_array_equal(got_q, want_q)
        np.testing.assert_array_equal(gy, wy)
        np.testing.assert_array_equal(gu, wu)
        np.testing.assert_array_equal(gv, wv)
