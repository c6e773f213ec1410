"""Exp-Golomb code generation, bit packing and bounded-region semantics."""

import os

import numpy as np
import pytest

from vc2tpu.stream.bits import BitReader, BitWriter
from vc2tpu.vlc import golomb
from vc2tpu.vlc.bitpack import pack_codes, unpack_signed_streams


def test_scalar_codes_roundtrip():
    w = BitWriter()
    values = [0, 1, -1, 5, -17, 255, 1023, -4096]
    for v in values:
        w.put_svlc(v)
    w.align()
    r = BitReader(w.getvalue())
    for v in values:
        assert r.get_svlc() == v


def test_unsigned_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 127, 128, 100000]
    for v in vals:
        w.put_uvlc(v)
    w.align()
    r = BitReader(w.getvalue())
    for v in vals:
        assert r.get_uvlc() == v


def test_vectorised_codes_match_scalar():
    rng = np.random.default_rng(3)
    v = rng.integers(-(1 << 20), 1 << 20, 2000).astype(np.int32)
    codes, nbits = golomb.signed_codes_np(v)
    for i in range(0, 2000, 97):
        n, bits = golomb.encode_signed_scalar(int(v[i]))
        assert nbits[i] == n
        assert codes[i] == bits


def test_device_codes_match_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    v = rng.integers(-(1 << 15), 1 << 15, 512).astype(np.int32)
    lo, hi, nb = golomb.signed_codes(jnp.asarray(v))
    codes, nbits = golomb.signed_codes_np(v)
    full = (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(lo, np.uint64)
    np.testing.assert_array_equal(np.asarray(nb), nbits)
    np.testing.assert_array_equal(full, codes)


def test_bounded_write_drops_ones():
    w = BitWriter()
    w.bounded(3)
    w.put_bits(3, 0b101)
    w.put_bit(1)          # beyond bound: silently dropped
    with pytest.raises(ValueError):
        w.put_bit(0)      # beyond bound: error
    w.align()
    assert w.getvalue() == bytes([0b10100000])


def test_bounded_read_returns_ones():
    r = BitReader(bytes([0b00000000]))
    r.bounded(2)
    assert r.get_bit() == 0
    assert r.get_bit() == 0
    assert r.get_bit() == 1   # past bound
    assert r.get_bit() == 1


def _pack_unpack_case(native_off):
    os.environ.pop("VC2TPU_NO_NATIVE", None)
    rng = np.random.default_rng(11)
    S, L = 37, 50
    lanes = rng.integers(-300, 300, (S, L)).astype(np.int32)
    lanes[:, 40:] = 0   # trailing zeros to exercise truncation
    codes, nbits = golomb.signed_codes_np(lanes)
    nbits64 = nbits.astype(np.int64)
    cum = np.cumsum(nbits64, axis=1) - nbits64
    used = np.where(lanes != 0, cum + nbits64, 0).max(axis=1)
    bounds = ((used + 7) // 8) * 8
    starts = np.concatenate([[0], np.cumsum(bounds)])[:-1]
    keep = np.clip(bounds[:, None] - cum, 0, nbits64)
    cl = np.where(keep < nbits64, codes >> (nbits64 - keep).astype(np.uint64), codes)
    live = keep > 0
    total = int(bounds.sum())
    buf = pack_codes(cl[live], keep[live].astype(np.uint32),
                     (starts[:, None] + cum)[live], total)
    out = unpack_signed_streams(buf, starts, bounds, L)
    np.testing.assert_array_equal(out, lanes)


def test_pack_unpack_roundtrip_native():
    from vc2tpu._native.bridge import native

    if native is None:
        pytest.skip("native codec unavailable")
    _pack_unpack_case(False)


def test_pack_unpack_roundtrip_numpy(monkeypatch):
    import vc2tpu.vlc.bitpack as bp

    monkeypatch.setattr(bp, "native", None)
    _pack_unpack_case(True)


def test_truncated_stream_decodes_zeros():
    """Reads past the bound return 1s => remaining values decode to 0."""
    w = BitWriter()
    w.put_svlc(5)
    w.align()
    payload = np.frombuffer(w.getvalue(), dtype=np.uint8)
    nbits = golomb.encode_signed_scalar(5)[0]
    out = unpack_signed_streams(payload, np.array([0]), np.array([nbits]), 10)
    assert out[0, 0] == 5
    assert (out[0, 1:] == 0).all()


def test_truncated_payload_reads_ones_both_routes(monkeypatch):
    """Bounded regions extending past the PAYLOAD end (not just past the
    bound) read 1-bits — the reference istream returns 0xFF at EOF — and
    the NumPy fallback must match the native engine bit for bit, including
    on an empty payload."""
    import vc2tpu.vlc.bitpack as bp
    from vc2tpu._native.bridge import native

    if native is None:
        pytest.skip("needs the native codec (the comparison is vacuous "
                    "when both sides run the NumPy fallback)")
    w = BitWriter()
    for v in (3, -7, 120, 0, 0, -1, 9):
        w.put_svlc(v)
    w.align()
    full = np.frombuffer(w.getvalue(), dtype=np.uint8)
    starts = np.array([0, 8])
    bounds = np.array([len(full) * 8 + 40, len(full) * 8])  # past payload
    cases = [full[:max(len(full) - 2, 1)],                   # truncated
             np.zeros(0, np.uint8)]                          # empty
    for payload in cases:
        want = unpack_signed_streams(payload, starts, bounds, 8)
        monkeypatch.setattr(bp, "native", None)
        got = bp.unpack_signed_streams(payload, starts, bounds, 8)
        monkeypatch.setattr(bp, "native", native)
        np.testing.assert_array_equal(got, want)
    # past-EOF bits are ones: an empty payload's first code never
    # terminates a magnitude with a 0-data bit, so everything decodes 0
    # only once the bound is exhausted; with bound >= 2 bits the all-ones
    # region decodes as zero-magnitude codes
    out = unpack_signed_streams(np.zeros(0, np.uint8), np.array([0]),
                                np.array([10]), 4)
    assert (out == 0).all()
