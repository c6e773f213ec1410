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
