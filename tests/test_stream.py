"""Stream syntax: parse_info, sequence headers, preambles, fragments."""

import io

import numpy as np
import pytest

from vc2tpu.core.config import ColourFormat, FrameRate, Profile, WaveletKernel
from vc2tpu.core.intmath import intlog2, picture_number, rationalise
from vc2tpu.stream.dataunit import (DataUnitType, PicturePreamble, StreamReader,
                                    StreamWriter)
from vc2tpu.stream.headers import (SequenceHeader, default_source_parameters,
                                   sequence_header_of, video_format_of)


def test_parse_info_roundtrip():
    out = io.BytesIO()
    w = StreamWriter(out)
    w.start_sequence()
    w.write_padding(7)
    w.write_auxiliary(b"abc")
    w.end_sequence()
    rd = StreamReader(out.getvalue())
    t, nxt, prev = rd.read_data_unit()
    assert (t, nxt, prev) == (DataUnitType.PADDING_DATA, 20, 0)
    rd.r.seek(rd.r.byte_pos + nxt - 13)
    t, nxt2, prev = rd.read_data_unit()
    assert (t, nxt2, prev) == (DataUnitType.AUXILIARY_DATA, 16, 20)
    rd.r.seek(rd.r.byte_pos + nxt2 - 13)
    t, nxt3, prev = rd.read_data_unit()
    assert (t, nxt3, prev) == (DataUnitType.END_OF_SEQUENCE, 0, 16)


def test_bad_prefix_raises():
    rd = StreamReader(b"\x42\x42\x43\x45" + bytes(9))
    with pytest.raises(ValueError):
        rd.read_data_unit()


def test_unknown_parse_code_raises():
    rd = StreamReader(b"\x42\x42\x43\x44\x99" + bytes(8))
    with pytest.raises(ValueError):
        rd.read_data_unit()


def test_synchronise_scans_garbage():
    data = b"\x00garbage\x42\x42\x43\x44\x10" + bytes(8)
    rd = StreamReader(data)
    assert rd.synchronise()
    rd.r.seek(rd.r.byte_pos - 4)
    t, _, _ = rd.read_data_unit()
    assert t == DataUnitType.END_OF_SEQUENCE


def test_base_video_format_table():
    # reference tests/DataUnit.cpp base-format spot check + DataUnit.cpp:449
    f11 = default_source_parameters(11)
    assert (f11.height, f11.width) == (1080, 1920)
    assert f11.chroma_format == ColourFormat.CF422
    assert f11.interlace and f11.top_field_first and f11.bitdepth == 10
    with pytest.raises(ValueError):
        default_source_parameters(23)


@pytest.mark.parametrize("profile,h,w,fmt,intl,fr,bd", [
    (Profile.PROFILE_HQ, 1080, 1920, ColourFormat.CF422, False, FrameRate.FR50, 10),
    (Profile.PROFILE_HQ, 32, 64, ColourFormat.CF422, False, FrameRate.FR25, 10),
    (Profile.PROFILE_LD, 576, 720, ColourFormat.CF422, True, FrameRate.FR25, 10),
    (Profile.PROFILE_HQ, 2160, 3840, ColourFormat.CF422, False, FrameRate.FR50, 10),
    (Profile.PROFILE_HQ, 4320, 7680, ColourFormat.CF422, False, FrameRate.FR60000_1001, 10),
    (Profile.PROFILE_HQ, 480, 640, ColourFormat.CF420, False, FrameRate.FR24000_1001, 8),
    (Profile.PROFILE_HQ, 1080, 1920, ColourFormat.CF444, False, FrameRate.FR25, 16),
])
def test_sequence_header_roundtrip(profile, h, w, fmt, intl, fr, bd):
    hdr = SequenceHeader(profile=profile, height=h, width=w, chroma_format=fmt,
                         interlace=intl, frame_rate=fr, top_field_first=True,
                         bitdepth=bd)
    out = io.BytesIO()
    sw = StreamWriter(out)
    sw.start_sequence()
    sw.write_sequence_header(hdr)
    rd = StreamReader(out.getvalue())
    t, _, _ = rd.read_data_unit()
    assert t == DataUnitType.SEQUENCE_HEADER
    back = rd.read_sequence_header()
    assert (back.height, back.width) == (h, w)
    assert back.chroma_format == fmt
    assert back.interlace == intl
    assert back.frame_rate == fr
    assert back.bitdepth == bd
    assert back.profile == profile


def test_version_policy():
    hq = SequenceHeader(profile=Profile.PROFILE_HQ, height=32, width=64,
                        chroma_format=ColourFormat.CF422, interlace=False,
                        frame_rate=FrameRate.FR25, top_field_first=True,
                        bitdepth=10)
    assert hq.major_version == 2
    v3 = SequenceHeader(profile=Profile.PROFILE_HQ, height=32, width=64,
                        chroma_format=ColourFormat.CF422, interlace=False,
                        frame_rate=FrameRate.FR96, top_field_first=True,
                        bitdepth=10)
    assert v3.major_version == 3
    deep = SequenceHeader(profile=Profile.PROFILE_HQ, height=32, width=64,
                          chroma_format=ColourFormat.CF422, interlace=False,
                          frame_rate=FrameRate.FR25, top_field_first=True,
                          bitdepth=16)
    assert deep.major_version == 3


def test_preamble_roundtrip_hq_and_ld():
    for hq in (True, False):
        out = io.BytesIO()
        sw = StreamWriter(out)
        pre = PicturePreamble(wavelet_kernel=WaveletKernel.DD137, depth=3,
                              slices_x=40, slices_y=30, slice_prefix=2,
                              slice_size_scalar=5,
                              slice_bytes_numerator=7,
                              slice_bytes_denominator=3)
        out.write(sw._transform_params(pre, hq, force_asym_flags=False))
        rd = StreamReader(out.getvalue())
        back = rd.read_preamble(hq)
        assert back.wavelet_kernel == WaveletKernel.DD137
        assert back.depth == 3
        assert (back.slices_x, back.slices_y) == (40, 30)
        if hq:
            assert (back.slice_prefix, back.slice_size_scalar) == (2, 5)
        else:
            assert (back.slice_bytes_numerator, back.slice_bytes_denominator) == (7, 3)


def test_utils_semantics():
    # reference tests/Utils.cpp
    assert picture_number(0, 0, 1) == 0
    assert picture_number(1, 0, 2) == 1
    assert picture_number(1, 1, 2) == 3
    assert picture_number(0, (1 << 32) - 1, 1) == (1 << 32) - 1
    assert picture_number(0, 1 << 32, 1) == 0
    with pytest.raises(ValueError):
        picture_number(-1, 0, 1)
    with pytest.raises(ValueError):
        picture_number(2, 0, 1)
    with pytest.raises(ValueError):
        picture_number(0, 0, 3)
    assert intlog2(1) == 0
    assert intlog2(2) == 1
    assert intlog2(3) == 2
    assert intlog2(1024) == 10
    assert rationalise(6, 4) == (3, 2)
