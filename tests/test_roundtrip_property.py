"""Seeded property tests: encode -> stream -> decode round trips for random
content across geometry/kernel/mode combinations (beyond the fixed goldens).

The decode of an encoded stream must reproduce the encoder's own in-process
reconstruction exactly (the codec is deterministic integer arithmetic), and
the stream must re-parse to the same slice data.
"""

import io

import numpy as np
import pytest

from vc2tpu.core.config import (ColourFormat, EncoderConfig, FrameRate, Mode,
                                Profile, WaveletKernel)
from vc2tpu.core.picture import Picture
from vc2tpu.cli.decode_stream import Decoder
from vc2tpu.pipeline.encoder import Encoder
from vc2tpu.stream.dataunit import PicturePreamble, StreamWriter
from vc2tpu.stream.headers import SequenceHeader


CASES = [
    # (h, w, fmt, depth_bits, kernel, wdepth, ys, xs, mode, extra)
    (48, 96, ColourFormat.CF422, 10, WaveletKernel.DD97, 2, 2, 2,
     Mode.HQ_ConstQ, dict(q_index=12)),
    (64, 64, ColourFormat.CF444, 12, WaveletKernel.Daub97, 3, 1, 1,
     Mode.HQ_ConstQ, dict(q_index=30)),
    (32, 128, ColourFormat.CF420, 8, WaveletKernel.Haar0, 1, 4, 4,
     Mode.HQ_CBR, dict(compressed_bytes=2048, slice_scalar=1)),
    (64, 96, ColourFormat.CF422, 10, WaveletKernel.Fidelity, 1, 2, 2,
     Mode.HQ_CBR, dict(compressed_bytes=4096, slice_scalar=2,
                       slice_prefix=2)),
]


@pytest.mark.parametrize("case", CASES)
def test_roundtrip(case):
    (h, w, fmt, bits, kernel, d, ys, xs, mode, extra) = case
    cfg = EncoderConfig(height=h, width=w, chroma_format=fmt, kernel=kernel,
                        wavelet_depth=d, y_size=ys, x_size=xs, mode=mode,
                        luma_depth=bits, chroma_depth=bits,
                        frame_rate=FrameRate.FR25, **extra)
    rng = np.random.default_rng(hash(case[:9]) & 0xFFFF)
    g = cfg.geometry
    half = 1 << (bits - 1)

    def plane(hh, ww):
        return rng.integers(-half, half, (hh, ww)).astype(np.int32)

    pics = [Picture(plane(g.luma_height, g.luma_width),
                    plane(g.chroma_height, g.chroma_width),
                    plane(g.chroma_height, g.chroma_width), fmt)
            for _ in range(2)]
    enc = Encoder(cfg)
    encoded = [enc.encode_picture(p) for p in pics]

    buf = io.BytesIO()
    wtr = StreamWriter(buf)
    wtr.start_sequence()
    wtr.write_sequence_header(SequenceHeader(
        profile=Profile.PROFILE_HQ, height=h, width=w, chroma_format=fmt,
        interlace=False, frame_rate=FrameRate.FR25, top_field_first=True,
        bitdepth=bits))
    for i, e in enumerate(encoded):
        wtr.write_picture(i, PicturePreamble(
            wavelet_kernel=kernel, depth=d, slices_x=enc.geo.x_slices,
            slices_y=enc.geo.y_slices, slice_prefix=cfg.slice_prefix,
            slice_size_scalar=cfg.slice_scalar), e.payload, hq=True,
            slice_sizes=e.slice_totals)
    wtr.end_sequence()

    # decode the stream and compare against the in-process reconstruction
    sink = io.BytesIO()
    dec = Decoder(sink=sink)
    assert dec.run(buf.getvalue()) == 0
    assert dec.frames_out == len(pics)

    from vc2tpu.core.picture import signal_clip
    from vc2tpu.core.planario import SampleFormat, encode_plane

    word = 1 if bits == 8 else 2
    fmt_out = SampleFormat(word_width=word, bit_depth=bits, offset=True)
    expect = b""
    for p, e in zip(pics, encoded):
        e2 = enc.encode_picture(p, keep_planes=True)
        rec = enc.decode_inprocess(e2, g)
        rec = signal_clip(rec, bits, bits)
        expect += (encode_plane(np.asarray(rec.y), fmt_out)
                   + encode_plane(np.asarray(rec.c1), fmt_out)
                   + encode_plane(np.asarray(rec.c2), fmt_out))
    assert sink.getvalue() == expect
