"""Fused native LD decode == the lane-path decode, bit for bit.

ld_decode_to_transform_host (bounded gang VLC + dequant straight into the
transform planes + LL prediction recurrence) must reproduce exactly what
decode_ld_slices -> lanes_to_plane -> ld_dequantise_picture produces,
including bounded-region truncation semantics on adversarial payloads."""

import numpy as np
import pytest

from vc2tpu._native.bridge import native
from vc2tpu.core.config import ColourFormat
from vc2tpu.slices import layout
from vc2tpu.slices.ld import decode_ld_slices, encode_ld_slices
from vc2tpu.wavelet import matrices
from vc2tpu.core.config import WaveletKernel

pytestmark = pytest.mark.skipif(native is None,
                                reason="needs the native host codec")


def _geo(ys, xs, sh, sw, csh, csw, depth):
    from vc2tpu.pipeline.encoder import SliceGeometry

    return SliceGeometry(ys, xs, (ys * sh, xs * sw), (ys * csh, xs * csw),
                         (sh, sw), (csh, csw))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("kernel,depth", [(WaveletKernel.LeGall, 2),
                                          (WaveletKernel.Haar1, 1)])
def test_fused_equals_lane_path(seed, kernel, depth):
    from vc2tpu.pipeline import ld as ld_pipeline

    rng = np.random.default_rng(seed)
    ts = 1 << depth
    ys, xs = 6, 8
    sh = sw = 2 * ts
    csh, csw = 2 * ts, ts
    geo = _geo(ys, xs, sh, sw, csh, csw, depth)
    n = ys * xs
    Ly, Lc = sh * sw, csh * csw
    qmatrix = matrices.quant_matrix(kernel, depth)
    qm_block_y = ld_pipeline._qm_block(sh, sw, depth, qmatrix)
    qm_block_c = ld_pipeline._qm_block(csh, csw, depth, qmatrix)

    # random quantised lanes + q map, then a REAL LD payload
    q_idx = rng.integers(0, 60, n).astype(np.int32)
    lanes_y = rng.integers(-300, 300, (n, Ly)).astype(np.int32)
    lanes_u = rng.integers(-100, 100, (n, Lc)).astype(np.int32)
    lanes_v = rng.integers(-100, 100, (n, Lc)).astype(np.int32)
    lanes_y[rng.random((n, Ly)) < 0.5] = 0       # realistic zero runs
    lanes_u[rng.random((n, Lc)) < 0.6] = 0
    lanes_v[rng.random((n, Lc)) < 0.6] = 0
    sizes = layout.slice_bytes_map(ys, xs, n * (8 + 2 * (Ly + 2 * Lc)),
                                   1).ravel()
    # the writer truncates codes at region bounds exactly as the reference
    payload_b, _ = encode_ld_slices(q_idx, lanes_y, lanes_u, lanes_v, sizes)
    payload = np.frombuffer(payload_b, np.uint8)

    # lane path
    q2, dly, dlu, dlv, _ = decode_ld_slices(payload, sizes, (Ly, Lc))
    from vc2tpu.core.picture import Picture

    quantised = Picture(
        layout.lanes_to_plane(dly, ys, xs, sh, sw, depth),
        layout.lanes_to_plane(dlu, ys, xs, csh, csw, depth),
        layout.lanes_to_plane(dlv, ys, xs, csh, csw, depth),
        ColourFormat.CF422)
    want = ld_pipeline.ld_dequantise_picture(quantised, q2, qm_block_y,
                                             qm_block_c, geo, depth)

    # fused path
    q3, got = ld_pipeline.ld_decode_to_transform_host(
        payload, sizes, geo, depth, qmatrix, qm_block_y, qm_block_c,
        ColourFormat.CF422)
    np.testing.assert_array_equal(q3, q2)
    np.testing.assert_array_equal(got.y, np.asarray(want.y))
    np.testing.assert_array_equal(got.c1, np.asarray(want.c1))
    np.testing.assert_array_equal(got.c2, np.asarray(want.c2))


def _w32(x):
    x &= 0xFFFFFFFF
    return x - 2 ** 32 if x >= 2 ** 31 else x


def _ref_quant(v, aq):
    """Literal Quantisation.cpp:69-76 with the int32-wrapped factor table
    (same model as test_quant_exact.ref_quant) and qf_i32's >119 clamp."""
    from vc2tpu.quant.quantiser import QUANT_FACTORS_I32

    qf = int(QUANT_FACTORS_I32[min(aq, 119)])
    neg = v < 0
    x = _w32(abs(v) << 2)
    r = abs(x) // abs(qf)
    r = -r if (x < 0) ^ (qf < 0) else r
    return -r if neg else r


def _ref_scale(v, aq):
    from vc2tpu.quant.quantiser import QUANT_FACTORS_I32, QUANT_OFFSETS

    aq = min(aq, 119)
    qf, qo = int(QUANT_FACTORS_I32[aq]), int(QUANT_OFFSETS[aq])
    neg = v < 0
    p = _w32(abs(v) * qf)
    if p > 0:
        p = _w32(p + qo)
    p = _w32(p + 2)
    r = abs(p) // 4
    r = -r if p < 0 else r
    return -r if neg else r


def _svlc_bits(v):
    return 1 if v == 0 else 2 * (abs(v) + 1).bit_length()


def _predict_dc(ll, llw, y, x):
    if y > 0 and x > 0:
        r = (ll[(y - 1) * llw + (x - 1)] + ll[(y - 1) * llw + x]
             + ll[y * llw + (x - 1)])
        return (r + 1) // 3 if r >= 0 else -((1 - r) // 3)
    if y > 0:
        return ll[(y - 1) * llw + x]
    if x > 0:
        return ll[y * llw + (x - 1)]
    return 0


class _ModelComp:
    """Pure-Python twin of vc2host.cpp's LDLaneQuantiser: per-slice lane
    gather, LL DC-prediction recurrence on every probe, reference
    truncated-bit counting. Deliberately shortcut-free — the truth the
    native engine's division-free sizing and all-zero-body fast paths are
    pinned against (incl. the non-monotone wrapped quant factors at
    adjusted index >= 117)."""

    def __init__(self, plane, ys, xs, ts, qm_block, perm):
        H, W = plane.shape
        self.plane, self.W, self.ts = plane, W, ts
        self.sliceH, self.sliceW = H // ys, W // xs
        self.llw = W // ts
        self.nLL = (self.sliceH // ts) * (self.sliceW // ts)
        self.qm = [int(qm_block[p]) for p in perm]
        by, bx = perm // self.sliceW, perm % self.sliceW
        self.off = [(int(b), int(x)) for b, x in zip(by, bx)]
        self.ll = [0] * ((H // ts) * (W // ts))
        self.v = self.h = 0
        self.vals = None

    def load_slice(self):
        base_y, base_x = self.v * self.sliceH, self.h * self.sliceW
        self.vals = [int(self.plane[base_y + b, base_x + x])
                     for b, x in self.off]

    def ll_lane(self, qi, k):
        aq = max(qi - self.qm[k], 0)
        by, bx = self.off[k]
        y = self.v * (self.sliceH // self.ts) + by // self.ts
        x = self.h * (self.sliceW // self.ts) + bx // self.ts
        pred = _predict_dc(self.ll, self.llw, y, x)
        qv = _ref_quant(self.vals[k] - pred, aq)
        self.ll[y * self.llw + x] = _ref_scale(qv, aq) + pred
        return qv

    def ll_nbs(self, qi):
        """Per-LL-lane code bit lengths; the recurrence state advances."""
        return [_svlc_bits(self.ll_lane(qi, k)) for k in range(self.nLL)]

    def body_nbs(self, qi):
        """Per-body-lane code bit lengths, exact (no shortcut)."""
        return [_svlc_bits(_ref_quant(self.vals[k],
                                      max(qi - self.qm[k], 0)))
                for k in range(self.nLL, len(self.qm))]

    def trial(self, qi):
        out = []
        for k in range(self.nLL):
            out.append(self.ll_lane(qi, k))
        for k in range(self.nLL, len(self.qm)):
            aq = max(qi - self.qm[k], 0)
            out.append(_ref_quant(self.vals[k], aq))
        return out

    def next_slice(self, xs):
        self.h += 1
        if self.h == xs:
            self.h, self.v = 0, self.v + 1


def _trunc_count(nbs):
    """Truncated-tail bit count: trailing zero (1-bit) codes are free
    (reference luma/chroma_slice_bits, Slices.cpp:51-95)."""
    gross = count = 0
    for nb in nbs:
        gross += nb
        if nb > 1:
            count = gross
    return count


def _interleave(a, b):
    out = []
    for x, y in zip(a, b):
        out.extend((x, y))
    return out


def _model_ld_encode(ty, tu, tv, grid, ts, qm_y, qm_c, perm_y, perm_c,
                     slice_bytes):
    """Pure-Python twin of vc2host.cpp ld_encode (the reference
    quantIndicesLD search, EncodeStream.cpp:195-245): per-slice binary
    search 63/Δ64, LL recurrences advancing on every probe, luma count
    then interleaved-chroma count, final trial at the chosen q."""
    ys, xs = grid
    my = _ModelComp(ty, ys, xs, ts, qm_y, perm_y)
    mu = _ModelComp(tu, ys, xs, ts, qm_c, perm_c)
    mv = _ModelComp(tv, ys, xs, ts, qm_c, perm_c)
    q_out, ly, lu, lv = [], [], [], []
    for i in range(ys * xs):
        for m in (my, mu, mv):
            m.load_slice()
        nbytes = int(slice_bytes[i])
        length_bits = max(0, (8 * nbytes - 8).bit_length())
        avail = 8 * nbytes - 7 - length_bits
        trial_q, q, delta = 63, 127, 64
        while delta > 0:
            delta >>= 1
            bits = _trunc_count(my.ll_nbs(trial_q) + my.body_nbs(trial_q))
            # chroma LL recurrences advance on every probe; the interleaved
            # chroma count is only added when luma fits (ll_only branch)
            u_ll, v_ll = mu.ll_nbs(trial_q), mv.ll_nbs(trial_q)
            if bits <= avail:
                bits += _trunc_count(
                    _interleave(u_ll, v_ll)
                    + _interleave(mu.body_nbs(trial_q),
                                  mv.body_nbs(trial_q)))
            if bits <= avail:
                if trial_q < q:
                    q = trial_q
                trial_q -= delta
            else:
                trial_q += delta
        q_out.append(q)
        ly.append(my.trial(q))
        lu.append(mu.trial(q))
        lv.append(mv.trial(q))
        for m in (my, mu, mv):
            m.next_slice(xs)
    return (np.asarray(q_out, np.int32), np.asarray(ly, np.int32),
            np.asarray(lu, np.int32), np.asarray(lv, np.int32))


@pytest.mark.parametrize("seed,magnitude", [
    (0, 300),                 # everyday magnitudes
    (1, 1 << 20),             # high but unwrapped adjusted indices
    (2, (1 << 28) - 1),       # wrapped region: probes hit aq in [116, 119]
    (3, (1 << 28) - 1),       # where |quant_factor| is NOT monotone in aq
    (4, -1),                  # dense huge lanes + minimal budgets: the
    (5, -1),                  # all-zero-body misfire flips fit decisions
])
def test_ld_encode_matches_reference_model(seed, magnitude):
    """native.ld_encode == a literal Python model of the reference search
    over the full exact coefficient domain, incl. |v| up to 2^28 where the
    binary search probes adjusted quantisers past the int32 wrap at
    aq=116 (regression: the all-zero-body shortcut assumed kAbsQf was
    monotone and undercounted slices whose low-qm lanes land on the
    wrapped, smaller entries; body_nb also read the tables out of bounds
    for trial q > 119)."""
    from vc2tpu.pipeline import ld as ld_pipeline

    rng = np.random.default_rng(seed)
    depth = 1 if seed % 2 else 2
    ts = 1 << depth
    ys, xs = 2, 3
    sh = sw = 2 * ts
    csh, csw = 2 * ts, ts
    H, W, CH, CW = ys * sh, xs * sw, ys * csh, xs * csw
    n = ys * xs
    Ly, Lc = sh * sw, csh * csw
    qmatrix = matrices.quant_matrix(WaveletKernel.LeGall, depth)
    qm_y = ld_pipeline._qm_block(sh, sw, depth, qmatrix)
    qm_c = ld_pipeline._qm_block(csh, csw, depth, qmatrix)
    perm_y, _ = layout.lane_order(sh, sw, depth)
    perm_c, _ = layout.lane_order(csh, csw, depth)

    if magnitude > 0:
        ty = rng.integers(-magnitude, magnitude, (H, W)).astype(np.int32)
        tu = rng.integers(-magnitude, magnitude, (CH, CW)).astype(np.int32)
        tv = rng.integers(-magnitude, magnitude, (CH, CW)).astype(np.int32)
        ty[rng.random((H, W)) < 0.3] = 0
        # budgets small enough that the search climbs deep into the table
        sizes = layout.slice_bytes_map(ys, xs, n * 9, 1).ravel()
    else:
        # most lanes in the band where only the wrapped entries (aq >= 117)
        # quantise them nonzero: |v|*4 between kAbsQf[119] and kAbsQf[115]
        def dense(h, w):
            mag = rng.integers(171_000_000, 268_000_000, (h, w))
            sgn = rng.choice([-1, 1], (h, w))
            return (mag * sgn).astype(np.int32)

        ty, tu, tv = dense(H, W), dense(CH, CW), dense(CH, CW)
        sizes = layout.slice_bytes_map(ys, xs, n * 4, 1).ravel()

    q_out = np.zeros(n, np.int32)
    got_y = np.empty((n, Ly), np.int32)
    got_u = np.empty((n, Lc), np.int32)
    got_v = np.empty((n, Lc), np.int32)
    native.ld_encode(ty, tu, tv, (H, W, CH, CW), (ys, xs), ts,
                     qm_y, qm_c, perm_y, perm_c, sizes, q_out,
                     got_y.ravel(), got_u.ravel(), got_v.ravel())
    want_q, want_y, want_u, want_v = _model_ld_encode(
        ty, tu, tv, (ys, xs), ts, qm_y, qm_c, perm_y, perm_c, sizes)
    np.testing.assert_array_equal(q_out, want_q)
    np.testing.assert_array_equal(got_y, want_y)
    np.testing.assert_array_equal(got_u, want_u)
    np.testing.assert_array_equal(got_v, want_v)


def test_fused_corrupt_payload_matches_lane_path():
    """Random byte corruption (in-length payload) must decode identically
    through both paths — the bounded 1-fill semantics are the contract."""
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline import ld as ld_pipeline

    rng = np.random.default_rng(9)
    depth, kernel = 2, WaveletKernel.LeGall
    ts = 1 << depth
    ys, xs = 4, 4
    sh = sw = csh = csw = 2 * ts
    geo = _geo(ys, xs, sh, sw, csh, csw, depth)
    n = ys * xs
    Ly, Lc = sh * sw, csh * csw
    qmatrix = matrices.quant_matrix(kernel, depth)
    qm_block_y = ld_pipeline._qm_block(sh, sw, depth, qmatrix)
    qm_block_c = ld_pipeline._qm_block(csh, csw, depth, qmatrix)
    sizes = layout.slice_bytes_map(ys, xs, n * 25, 1).ravel()
    for _trial in range(8):
        payload = rng.integers(0, 256, int(sizes.sum()),
                               dtype=np.uint8)      # pure noise payload
        if _trial % 2:                               # and truncated payloads:
            payload = payload[:-11]                  # past-EOF reads are 1s
        q2, dly, dlu, dlv, _ = decode_ld_slices(payload, sizes, (Ly, Lc))
        quantised = Picture(
            layout.lanes_to_plane(dly, ys, xs, sh, sw, depth),
            layout.lanes_to_plane(dlu, ys, xs, csh, csw, depth),
            layout.lanes_to_plane(dlv, ys, xs, csh, csw, depth),
            ColourFormat.CF422)
        want = ld_pipeline.ld_dequantise_picture(quantised, q2, qm_block_y,
                                                 qm_block_c, geo, depth)
        q3, got = ld_pipeline.ld_decode_to_transform_host(
            payload, sizes, geo, depth, qmatrix, qm_block_y, qm_block_c,
            ColourFormat.CF422)
        np.testing.assert_array_equal(q3, q2)
        np.testing.assert_array_equal(got.y, np.asarray(want.y))
        np.testing.assert_array_equal(got.c1, np.asarray(want.c1))
        np.testing.assert_array_equal(got.c2, np.asarray(want.c2))
