"""Device-side HQ payload assembly equals the host packer byte-for-byte."""

import numpy as np
import jax.numpy as jnp
import pytest

from vc2tpu.vlc import device_pack
from vc2tpu.slices.hq import encode_hq_slices
from vc2tpu.slices.layout import slice_bytes_map


def _lanes(rng, n, ly, lc, zero_frac=0.6, span=200):
    qy = rng.integers(-span, span, (n, ly)).astype(np.int32)
    qu = rng.integers(-span // 4, span // 4, (n, lc)).astype(np.int32)
    qv = rng.integers(-span // 4, span // 4, (n, lc)).astype(np.int32)
    qy[rng.random((n, ly)) < zero_frac] = 0
    qu[rng.random((n, lc)) < zero_frac + 0.1] = 0
    qv[rng.random((n, lc)) < zero_frac + 0.1] = 0
    return qy, qu, qv


@pytest.mark.parametrize("prefix,scalar,cbr", [
    (0, 1, False), (2, 3, False), (0, 1, True), (1, 2, True)])
def test_device_pack_equals_host(prefix, scalar, cbr):
    rng = np.random.default_rng(42)
    n, ly, lc = 24, 64, 32
    qy, qu, qv = _lanes(rng, n, ly, lc)
    q_idx = rng.integers(0, 100, n).astype(np.int32)
    if cbr:
        sizes = slice_bytes_map(1, n, n * 150, scalar).ravel()
        ref_payload, ref_totals = encode_hq_slices(
            q_idx, qy, qu, qv, prefix, scalar, slice_sizes=sizes)
    else:
        sizes = np.zeros(n, np.int32)
        ref_payload, ref_totals = encode_hq_slices(q_idx, qy, qu, qv, prefix,
                                                   scalar)
    w32 = (prefix + (int(sizes.max()) if cbr else 4 + 3 * 255 * scalar) + 3) // 4
    cap = int(np.asarray(ref_totals).sum()) + (7 if not cbr else 0)
    buf = np.asarray(device_pack.pack_hq_payload(
        jnp.asarray(qy), jnp.asarray(qu), jnp.asarray(qv), jnp.asarray(q_idx),
        jnp.asarray(sizes.astype(np.int32)), prefix=prefix, scalar=scalar,
        w32=w32, cap_bytes=cap, cbr=cbr))
    flags, q2, totals, payload = device_pack.unpack_result(buf, n)
    total = int(totals.sum())
    assert flags == 0
    assert np.array_equal(q2, q_idx)
    assert np.array_equal(totals, np.asarray(ref_totals))
    assert payload[:total].tobytes() == ref_payload


def test_device_pack_fuzz_alignments():
    """Randomised configs sweeping slice counts, prefixes, scalars and CBR
    budgets so slice starts hit every word-alignment phase — the word-space
    scatter assembly (alignment pre-shift + boundary-word OR) must equal the
    host packer byte-for-byte in all of them."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(3, 40))
        ly = int(rng.choice([4, 16, 64]))
        lc = max(ly // 2, 1)
        prefix = int(rng.integers(0, 4))
        scalar = int(rng.integers(1, 4))
        cbr = bool(rng.integers(0, 2))
        qy, qu, qv = _lanes(rng, n, ly, lc,
                            zero_frac=float(rng.uniform(0.2, 0.95)),
                            span=int(rng.integers(2, 400)))
        q_idx = rng.integers(0, 120, n).astype(np.int32)
        if cbr:
            # budgets = each slice's natural size plus random 0..7 slack:
            # always fits, and the ragged starts walk every byte phase
            _, natural = encode_hq_slices(q_idx, qy, qu, qv, prefix, scalar)
            sizes = (np.asarray(natural) - prefix
                     + rng.integers(0, 8, n) * scalar).astype(np.int32)
            ref_payload, ref_totals = encode_hq_slices(
                q_idx, qy, qu, qv, prefix, scalar, slice_sizes=sizes)
        else:
            sizes = np.zeros(n, np.int32)
            ref_payload, ref_totals = encode_hq_slices(q_idx, qy, qu, qv,
                                                       prefix, scalar)
        w32 = (int(np.asarray(ref_totals).max()) + 3) // 4 + 1
        cap = int(np.asarray(ref_totals).sum()) + int(rng.integers(0, 9))
        buf = np.asarray(device_pack.pack_hq_payload(
            jnp.asarray(qy), jnp.asarray(qu), jnp.asarray(qv),
            jnp.asarray(q_idx), jnp.asarray(sizes.astype(np.int32)),
            prefix=prefix, scalar=scalar, w32=w32, cap_bytes=cap, cbr=cbr))
        flags, q2, totals, payload = device_pack.unpack_result(buf, n)
        total = int(totals.sum())
        assert flags == 0, (trial, flags)
        assert np.array_equal(totals, np.asarray(ref_totals)), trial
        assert payload[:total].tobytes() == ref_payload, trial
        assert not payload[total:].any(), trial     # capacity padding zeroed


def test_pack10_thirds_round_trip():
    """The packed D2H wire form (planar thirds: word i holds samples
    i, i+m3, i+2*m3) must round-trip through BOTH host expanders — the
    native unpack10_to_be16 and the NumPy fallback — including sample
    counts that are not a multiple of 3."""
    import jax

    from vc2tpu._native.bridge import native
    from vc2tpu.pipeline import decoder

    rng = np.random.default_rng(3)
    for ns in (1, 2, 3, 4, 95, 96, 97, 3 * 4096):
        samples = rng.integers(0, 1024, ns).astype(np.uint32)
        words = np.asarray(jax.jit(decoder._pack10_words)(
            jnp.asarray(samples)))
        want = ((samples.astype(np.uint16) << 6).astype(">u2")).tobytes()
        # the shared entry (native fast path when available)
        assert decoder._unpack10(words, ns) == want, ns
        # the NumPy fallback expansion, explicitly
        flat = np.concatenate([(words >> 20) & 1023, (words >> 10) & 1023,
                               words & 1023]).astype(np.uint16)[:ns]
        assert (flat << 6).astype(">u2").tobytes() == want, ns
        if native is not None:
            assert native.unpack10_to_be16(words, ns).tobytes() == want, ns


def test_w32_overflow_flag():
    rng = np.random.default_rng(0)
    n, ly, lc = 8, 64, 32
    qy, qu, qv = _lanes(rng, n, ly, lc, zero_frac=0.0, span=3000)
    q_idx = np.zeros(n, np.int32)
    sizes = np.zeros(n, np.int32)
    buf = np.asarray(device_pack.pack_hq_payload(
        jnp.asarray(qy), jnp.asarray(qu), jnp.asarray(qv), jnp.asarray(q_idx),
        jnp.asarray(sizes), prefix=0, scalar=1, w32=4, cap_bytes=4096,
        cbr=False))
    flags, _, _, _ = device_pack.unpack_result(buf, n)
    assert flags & device_pack.FLAG_W32


def test_code_overflow_flag():
    n, ly, lc = 4, 8, 4
    qy = np.full((n, ly), 1 << 17, np.int32)
    qu = np.zeros((n, lc), np.int32)
    qv = np.zeros((n, lc), np.int32)
    buf = np.asarray(device_pack.pack_hq_payload(
        jnp.asarray(qy), jnp.asarray(qu), jnp.asarray(qv),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
        prefix=0, scalar=1, w32=64, cap_bytes=4096, cbr=False))
    flags, _, _, _ = device_pack.unpack_result(buf, n)
    assert flags & device_pack.FLAG_CODE_OVERFLOW
