"""Sequence header / video_format wire coding.

Port of the reference semantics (/root/reference/src/Library/src/DataUnit.cpp:
370-1079, 1203-1320): the 23 base video formats table, the base-format
matching + custom-flag minimisation, VLC-coded header write/read, and the
decode-side merge into a SequenceHeader. Quirks are preserved deliberately
(e.g. the final "picture coding mode" symbol reuses source_sampling, so an
exactly-matched interlaced base format writes 0 there).
"""

from __future__ import annotations

import dataclasses

from vc2tpu.core.config import (ColorSpec, ColourFormat, FrameRate, MAX_V2_FRAMERATE,
                                PixelAspectRatio, Profile)
from vc2tpu.stream.bits import BitReader, BitWriter


@dataclasses.dataclass
class SequenceHeader:
    """Mirror of the reference SequenceHeader (DataUnit.h:105-161)."""

    profile: Profile = Profile.PROFILE_UNKNOWN
    height: int = 0
    width: int = 0
    chroma_format: ColourFormat = ColourFormat.CF444
    interlace: bool = False
    frame_rate: FrameRate = FrameRate.FR0
    top_field_first: bool = False
    bitdepth: int = 0
    pixel_aspect_ratio: int = int(PixelAspectRatio.AR_UNSET)
    clean_width: int = -1
    clean_height: int = -1
    left_offset: int = -1
    top_offset: int = -1
    color_spec: int = int(ColorSpec.CS_UNSET)
    color_primaries: int = 0
    color_matrix: int = 0
    transfer_function: int = 0
    major_version: int = 1
    minor_version: int = 0
    frame_rate_numer: int = 0
    frame_rate_denom: int = 0
    luma_excursion: int = 0
    luma_offset: int = 0
    color_diff_excursion: int = 0
    color_diff_offset: int = 0
    pixel_aspect_ratio_numer: int = 0
    pixel_aspect_ratio_denom: int = 0

    def __post_init__(self):
        # version policy (reference DataUnit.cpp:425-433)
        if self.major_version == 1:
            if self.profile == Profile.PROFILE_HQ:
                self.major_version = 2
            if self.frame_rate > MAX_V2_FRAMERATE or self.bitdepth > 12:
                self.major_version = 3


def _base(profile, h, w, cf, intl, fr, tff, bd, par, cw, chh, lo, to, cs):
    return SequenceHeader(profile=profile, height=h, width=w, chroma_format=cf,
                          interlace=intl, frame_rate=fr, top_field_first=tff,
                          bitdepth=bd, pixel_aspect_ratio=int(par), clean_width=cw,
                          clean_height=chh, left_offset=lo, top_offset=to,
                          color_spec=int(cs))


_U = Profile.PROFILE_UNKNOWN
_CF444, _CF422, _CF420 = ColourFormat.CF444, ColourFormat.CF422, ColourFormat.CF420
FR = FrameRate
AR = PixelAspectRatio
CS = ColorSpec

# Base video formats 0..22 (reference DataUnit.cpp:435-464)
_BASE_FORMATS = [
    _base(_U, 480, 640, _CF420, False, FR.FR24000_1001, False, 8, AR.AR1_1, 640, 480, 0, 0, CS.CS_CUSTOM),
    _base(_U, 120, 176, _CF420, False, FR.FR15000_1001, False, 8, AR.AR10_11, 176, 120, 0, 0, CS.CS_SDTV_525),
    _base(_U, 144, 176, _CF420, False, FR.FR25_2, True, 8, AR.AR12_11, 176, 144, 0, 0, CS.CS_SDTV_625),
    _base(_U, 240, 352, _CF420, False, FR.FR15000_1001, False, 8, AR.AR10_11, 352, 240, 0, 0, CS.CS_SDTV_525),
    _base(_U, 288, 352, _CF420, False, FR.FR25_2, True, 8, AR.AR12_11, 352, 288, 0, 0, CS.CS_SDTV_625),
    _base(_U, 480, 704, _CF420, False, FR.FR15000_1001, False, 8, AR.AR10_11, 704, 480, 0, 0, CS.CS_SDTV_525),
    _base(_U, 576, 704, _CF420, False, FR.FR25_2, True, 8, AR.AR12_11, 704, 576, 0, 0, CS.CS_SDTV_625),
    _base(_U, 480, 720, _CF422, True, FR.FR30000_1001, False, 10, AR.AR10_11, 704, 480, 8, 0, CS.CS_SDTV_525),
    _base(_U, 576, 720, _CF422, True, FR.FR25, True, 10, AR.AR12_11, 704, 576, 8, 0, CS.CS_SDTV_625),
    _base(_U, 720, 1280, _CF422, False, FR.FR60000_1001, True, 10, AR.AR1_1, 1280, 720, 0, 0, CS.CS_HDTV),
    _base(_U, 720, 1280, _CF422, False, FR.FR50, True, 10, AR.AR1_1, 1280, 720, 0, 0, CS.CS_HDTV),
    _base(_U, 1080, 1920, _CF422, True, FR.FR30000_1001, True, 10, AR.AR1_1, 1920, 1080, 0, 0, CS.CS_HDTV),
    _base(_U, 1080, 1920, _CF422, True, FR.FR25, True, 10, AR.AR1_1, 1920, 1080, 0, 0, CS.CS_HDTV),
    _base(_U, 1080, 1920, _CF422, False, FR.FR60000_1001, True, 10, AR.AR1_1, 1920, 1080, 0, 0, CS.CS_HDTV),
    _base(_U, 1080, 1920, _CF422, False, FR.FR50, True, 10, AR.AR1_1, 1920, 1080, 0, 0, CS.CS_HDTV),
    _base(_U, 1080, 2048, _CF444, False, FR.FR24, True, 12, AR.AR1_1, 2048, 1080, 0, 0, CS.CS_D_CINEMA),
    _base(_U, 2160, 4096, _CF444, False, FR.FR24, True, 12, AR.AR1_1, 4096, 2160, 0, 0, CS.CS_D_CINEMA),
    _base(_U, 2160, 3840, _CF422, False, FR.FR60000_1001, True, 10, AR.AR1_1, 3840, 2160, 0, 0, CS.CS_UHDTV),
    _base(_U, 2160, 3840, _CF422, False, FR.FR50, True, 10, AR.AR1_1, 3840, 2160, 0, 0, CS.CS_UHDTV),
    _base(_U, 4320, 7680, _CF422, False, FR.FR60000_1001, True, 10, AR.AR1_1, 7680, 4320, 0, 0, CS.CS_UHDTV),
    _base(_U, 4320, 7680, _CF422, False, FR.FR50, True, 10, AR.AR1_1, 7680, 4320, 0, 0, CS.CS_UHDTV),
    _base(_U, 1080, 1920, _CF422, False, FR.FR24000_1001, True, 10, AR.AR1_1, 1920, 1080, 0, 0, CS.CS_HDTV),
    _base(_U, 486, 720, _CF422, True, FR.FR30000_1001, False, 10, AR.AR10_11, 720, 486, 0, 0, CS.CS_HDTV),
]


def default_source_parameters(index: int) -> SequenceHeader:
    if not (0 <= index < len(_BASE_FORMATS)):
        raise ValueError("DataUnitIO: unknown base video format")
    return dataclasses.replace(_BASE_FORMATS[index])


def _matches_fields(fmt: SequenceHeader, w, h, cf, r, bd, tff) -> bool:
    return (fmt.width == w and fmt.height == h and fmt.chroma_format == cf
            and fmt.frame_rate == r and fmt.bitdepth == bd
            and fmt.top_field_first == tff)


def _matches_index(fmt: SequenceHeader, index: int) -> bool:
    b = _BASE_FORMATS[index]
    return (fmt.width == b.width and fmt.height == b.height
            and fmt.chroma_format == b.chroma_format
            and fmt.frame_rate == b.frame_rate and fmt.bitdepth == b.bitdepth
            and fmt.interlace == b.interlace
            and fmt.top_field_first == b.top_field_first
            and (fmt.pixel_aspect_ratio == -1 or fmt.pixel_aspect_ratio == b.pixel_aspect_ratio)
            and (fmt.clean_width == -1 or fmt.clean_width == b.clean_width)
            and (fmt.clean_height == -1 or fmt.clean_height == b.clean_height)
            and (fmt.left_offset == -1 or fmt.left_offset == b.left_offset)
            and (fmt.top_offset == -1 or fmt.top_offset == b.top_offset)
            and (fmt.color_spec == -1 or fmt.color_spec == b.color_spec))


def _check_match(fmt: SequenceHeader, index: int) -> int:
    b = _BASE_FORMATS[index]
    non_matching = (
        (fmt.width != b.width) + (fmt.height != b.height)
        + (fmt.chroma_format != b.chroma_format) + (fmt.frame_rate != b.frame_rate)
        + (fmt.bitdepth != b.bitdepth) + (fmt.interlace != b.interlace)
        + ((fmt.pixel_aspect_ratio != -1) and (fmt.pixel_aspect_ratio != b.pixel_aspect_ratio))
        + ((fmt.clean_width != -1) and (fmt.clean_width != b.clean_width))
        + ((fmt.clean_height != -1) and (fmt.clean_height != b.clean_height))
        + ((fmt.left_offset != -1) and (fmt.left_offset != b.left_offset))
        + ((fmt.top_offset != -1) and (fmt.top_offset != b.top_offset))
        + ((fmt.color_spec != -1) and (fmt.color_spec != b.color_spec))
    )
    if fmt.top_field_first != b.top_field_first:
        return -1
    return non_matching


@dataclasses.dataclass
class VideoFormat:
    """Wire-level video format (reference video_format struct, DataUnit.h:165)."""

    major_version: int = 0
    minor_version: int = 0
    profile: int = 0
    level: int = 0
    base_video_format: int = 0
    custom_dimensions_flag: bool = False
    frame_width: int = 0
    frame_height: int = 0
    custom_color_diff_format_flag: bool = False
    color_diff_format: int = 0
    custom_scan_format_flag: bool = False
    source_sampling: int = 0
    custom_frame_rate_flag: bool = False
    frame_rate: int = 0
    frame_rate_numer: int = 0
    frame_rate_denom: int = 0
    custom_pixel_aspect_ratio_flag: bool = False
    pixel_aspect_ratio: int = 0
    pixel_aspect_ratio_numer: int = 0
    pixel_aspect_ratio_denom: int = 0
    custom_clean_area_flag: bool = False
    clean_width: int = 0
    clean_height: int = 0
    left_offset: int = 0
    top_offset: int = 0
    custom_signal_range_flag: bool = False
    bitdepth: int = 0
    luma_excursion: int = 0
    luma_offset: int = 0
    color_diff_excursion: int = 0
    color_diff_offset: int = 0
    custom_color_spec_flag: bool = False
    color_spec: int = 0
    custom_color_primaries_flag: bool = False
    color_primaries: int = 0
    custom_color_matrix_flag: bool = False
    color_matrix: int = 0
    custom_transfer_function_flag: bool = False
    transfer_function: int = 0


def video_format_of(fmt: SequenceHeader) -> VideoFormat:
    """Base-format matching and custom-flag minimisation
    (reference video_format::video_format(SequenceHeader), DataUnit.cpp:563-784)."""
    vf = VideoFormat()
    vf.major_version = fmt.major_version
    vf.minor_version = fmt.minor_version
    vf.profile = 3 if fmt.profile == Profile.PROFILE_HQ else 0

    def setm(i, lvl, scan=False):
        vf.base_video_format = i
        vf.level = lvl
        if scan:
            vf.custom_scan_format_flag = True
            vf.source_sampling = 0

    if fmt.interlace:
        if _matches_index(fmt, 7): setm(7, 2)
        elif _matches_index(fmt, 8): setm(8, 2)
        elif _matches_index(fmt, 22): setm(22, 2)
        elif (fmt.chroma_format == _CF422 and fmt.width == 720
              and 480 <= fmt.height <= 486 and fmt.frame_rate == FR.FR30000_1001
              and fmt.bitdepth == 10):
            vf.base_video_format = 7
            vf.level = 2
            vf.custom_dimensions_flag = True
            vf.frame_width = fmt.width
            vf.frame_height = fmt.height
        elif _matches_index(fmt, 11): setm(11, 3)
        elif _matches_index(fmt, 12): setm(12, 3)
    else:
        if _matches_index(fmt, 1): setm(1, 1)
        elif _matches_index(fmt, 2): setm(2, 1)
        elif _matches_index(fmt, 3): setm(3, 1)
        elif _matches_index(fmt, 4): setm(4, 1)
        elif _matches_index(fmt, 5): setm(5, 1)
        elif _matches_index(fmt, 6): setm(6, 1)
        elif _matches_fields(fmt, 720, 480, _CF422, FR.FR30000_1001, 10, False): setm(7, 2, scan=True)
        elif _matches_fields(fmt, 720, 576, _CF422, FR.FR25, 10, True): setm(8, 2, scan=True)
        elif _matches_fields(fmt, 720, 486, _CF422, FR.FR30000_1001, 10, False): setm(22, 2, scan=True)
        elif _matches_index(fmt, 9): setm(9, 3)
        elif _matches_index(fmt, 10): setm(10, 3)
        elif _matches_fields(fmt, 1920, 1080, _CF422, FR.FR30000_1001, 10, True): setm(11, 3, scan=True)
        elif _matches_fields(fmt, 1920, 1080, _CF422, FR.FR25, 10, True): setm(12, 3, scan=True)
        elif _matches_index(fmt, 13): setm(13, 3)
        elif _matches_index(fmt, 14): setm(14, 3)
        elif _matches_index(fmt, 21): setm(21, 3)
        elif _matches_index(fmt, 15): setm(15, 4)
        elif _matches_fields(fmt, 2048, 1080, _CF444, FR.FR48, 12, True):
            vf.base_video_format = 15
            vf.level = 4
            vf.custom_frame_rate_flag = True
            vf.frame_rate = int(FR.FR48)
        elif _matches_index(fmt, 16): setm(16, 5)
        elif _matches_index(fmt, 17): setm(17, 6)
        elif _matches_index(fmt, 18): setm(18, 6)
        elif _matches_index(fmt, 19): setm(19, 7)
        elif _matches_index(fmt, 20): setm(20, 7)

    if vf.base_video_format == 0:
        vf.level = 0
        best = 999
        for i in range(1, 23):
            nm = _check_match(fmt, i)
            if nm == -1:
                continue
            if nm < best:
                vf.base_video_format = i
                best = nm
        base = default_source_parameters(vf.base_video_format)
        if fmt.interlace != base.interlace:
            vf.custom_scan_format_flag = True
            vf.source_sampling = int(fmt.interlace)
        if fmt.width != base.width or fmt.height != base.height:
            vf.custom_dimensions_flag = True
            vf.frame_width = fmt.width
            vf.frame_height = fmt.height
        if fmt.chroma_format != base.chroma_format:
            vf.custom_color_diff_format_flag = True
            vf.color_diff_format = int(fmt.chroma_format)
        if fmt.frame_rate != base.frame_rate:
            vf.custom_frame_rate_flag = True
            vf.frame_rate = int(fmt.frame_rate)
            if vf.frame_rate == 0:
                vf.frame_rate_numer = fmt.frame_rate_numer
                vf.frame_rate_denom = fmt.frame_rate_denom
        if fmt.bitdepth != base.bitdepth:
            vf.custom_signal_range_flag = True
            table = {0: 0, 8: 1, 10: 3, 12: 4, 16: 7}
            if fmt.bitdepth not in table:
                raise ValueError("DataUnitIO: invalid bit depth")
            vf.bitdepth = table[fmt.bitdepth]
            if vf.bitdepth == 0:
                vf.luma_excursion = fmt.luma_excursion
                vf.luma_offset = fmt.luma_offset
                vf.color_diff_excursion = fmt.color_diff_excursion
                vf.color_diff_offset = fmt.color_diff_offset
        if fmt.pixel_aspect_ratio != -1 and fmt.pixel_aspect_ratio != base.pixel_aspect_ratio:
            vf.custom_pixel_aspect_ratio_flag = True
            vf.pixel_aspect_ratio = int(fmt.pixel_aspect_ratio)
            if vf.pixel_aspect_ratio == 0:
                vf.pixel_aspect_ratio_numer = fmt.pixel_aspect_ratio_numer
                vf.pixel_aspect_ratio_denom = fmt.pixel_aspect_ratio_denom
        clean_set = (fmt.clean_height != -1 or fmt.clean_width != -1
                     or fmt.left_offset != -1 or fmt.top_offset != -1)
        clean_differs = (fmt.clean_height != base.clean_height
                         or fmt.clean_width != base.clean_width
                         or fmt.left_offset != base.left_offset
                         or fmt.top_offset != base.top_offset)
        if clean_set and clean_differs:
            vf.custom_clean_area_flag = True
            vf.clean_height = fmt.clean_height
            vf.clean_width = fmt.clean_width
            vf.left_offset = fmt.left_offset
            vf.top_offset = fmt.top_offset
        elif vf.custom_dimensions_flag and not clean_set:
            vf.custom_clean_area_flag = True
            vf.clean_height = vf.frame_height
            vf.clean_width = vf.frame_width
            vf.left_offset = 0
            vf.top_offset = 0
        if fmt.color_spec != -1 and fmt.color_spec != base.color_spec:
            vf.custom_color_spec_flag = True
            vf.color_spec = int(fmt.color_spec)
        if fmt.color_spec == int(CS.CS_CUSTOM):
            if fmt.color_primaries != base.color_primaries:
                vf.custom_color_primaries_flag = True
                vf.color_primaries = fmt.color_primaries
            if fmt.color_matrix != base.color_matrix:
                vf.custom_color_matrix_flag = True
                vf.color_matrix = fmt.color_matrix
            if fmt.transfer_function != base.transfer_function:
                vf.custom_transfer_function_flag = True
                vf.transfer_function = fmt.transfer_function
    return vf


def write_video_format(w: BitWriter, vf: VideoFormat) -> None:
    """Reference operator<<(ostream&, const video_format&) DataUnit.cpp:786-881."""
    w.unbounded()
    w.put_uvlc(vf.major_version)
    w.put_uvlc(vf.minor_version)
    w.put_uvlc(vf.profile)
    w.put_uvlc(vf.level)
    w.put_uvlc(vf.base_video_format)
    w.put_bool(vf.custom_dimensions_flag)
    if vf.custom_dimensions_flag:
        w.put_uvlc(vf.frame_width)
        w.put_uvlc(vf.frame_height)
    w.put_bool(vf.custom_color_diff_format_flag)
    if vf.custom_color_diff_format_flag:
        w.put_uvlc(vf.color_diff_format)
    w.put_bool(vf.custom_scan_format_flag)
    if vf.custom_scan_format_flag:
        w.put_uvlc(vf.source_sampling)
    w.put_bool(vf.custom_frame_rate_flag)
    if vf.custom_frame_rate_flag:
        w.put_uvlc(vf.frame_rate)
        if vf.frame_rate == 0:
            w.put_uvlc(vf.frame_rate_numer)
            w.put_uvlc(vf.frame_rate_denom)
    w.put_bool(vf.custom_pixel_aspect_ratio_flag)
    if vf.custom_pixel_aspect_ratio_flag:
        w.put_uvlc(vf.pixel_aspect_ratio)
        if vf.pixel_aspect_ratio == 0:
            w.put_uvlc(vf.pixel_aspect_ratio_numer)
            w.put_uvlc(vf.pixel_aspect_ratio_denom)
    w.put_bool(vf.custom_clean_area_flag)
    if vf.custom_clean_area_flag:
        w.put_uvlc(vf.clean_width)
        w.put_uvlc(vf.clean_height)
        w.put_uvlc(vf.left_offset)
        w.put_uvlc(vf.top_offset)
    w.put_bool(vf.custom_signal_range_flag)
    if vf.custom_signal_range_flag:
        w.put_uvlc(vf.bitdepth)
        if vf.bitdepth == 0:
            w.put_uvlc(vf.luma_offset)
            w.put_uvlc(vf.luma_excursion)
            w.put_uvlc(vf.color_diff_offset)
            w.put_uvlc(vf.color_diff_excursion)
    w.put_bool(vf.custom_color_spec_flag)
    if vf.custom_color_spec_flag:
        w.put_uvlc(vf.color_spec)
        if vf.color_spec == int(CS.CS_CUSTOM):
            w.put_bool(vf.custom_color_primaries_flag)
            if vf.custom_color_primaries_flag:
                w.put_uvlc(vf.color_primaries)
            w.put_bool(vf.custom_color_matrix_flag)
            if vf.custom_color_matrix_flag:
                w.put_uvlc(vf.color_matrix)
            w.put_bool(vf.custom_transfer_function_flag)
            if vf.custom_transfer_function_flag:
                w.put_uvlc(vf.transfer_function)
    # picture coding mode, reusing source_sampling (reference quirk)
    w.put_uvlc(vf.source_sampling)
    w.align()


def read_video_format(r: BitReader) -> VideoFormat:
    """Reference operator>>(istream&, video_format&) DataUnit.cpp:883-1060."""
    r.unbounded()
    vf = VideoFormat()
    vf.major_version = r.get_uvlc()
    vf.minor_version = r.get_uvlc()
    vf.profile = r.get_uvlc()
    vf.level = r.get_uvlc()
    vf.base_video_format = r.get_uvlc()
    vf.custom_dimensions_flag = r.get_bool()
    if vf.custom_dimensions_flag:
        vf.frame_width = r.get_uvlc()
        vf.frame_height = r.get_uvlc()
    vf.custom_color_diff_format_flag = r.get_bool()
    if vf.custom_color_diff_format_flag:
        vf.color_diff_format = r.get_uvlc()
    vf.custom_scan_format_flag = r.get_bool()
    if vf.custom_scan_format_flag:
        vf.source_sampling = r.get_uvlc()
    vf.custom_frame_rate_flag = r.get_bool()
    if vf.custom_frame_rate_flag:
        vf.frame_rate = r.get_uvlc()
        if vf.frame_rate == 0:
            vf.frame_rate_numer = r.get_uvlc()
            vf.frame_rate_denom = r.get_uvlc()
    vf.custom_pixel_aspect_ratio_flag = r.get_bool()
    if vf.custom_pixel_aspect_ratio_flag:
        vf.pixel_aspect_ratio = r.get_uvlc()
        if vf.pixel_aspect_ratio == 0:
            vf.pixel_aspect_ratio_numer = r.get_uvlc()
            vf.pixel_aspect_ratio_denom = r.get_uvlc()
    vf.custom_clean_area_flag = r.get_bool()
    if vf.custom_clean_area_flag:
        vf.clean_width = r.get_uvlc()
        vf.clean_height = r.get_uvlc()
        vf.left_offset = r.get_uvlc()
        vf.top_offset = r.get_uvlc()
    vf.custom_signal_range_flag = r.get_bool()
    if vf.custom_signal_range_flag:
        vf.bitdepth = r.get_uvlc()
        if vf.bitdepth == 0:
            vf.luma_offset = r.get_uvlc()
            vf.luma_excursion = r.get_uvlc()
            vf.color_diff_offset = r.get_uvlc()
            vf.color_diff_excursion = r.get_uvlc()
    vf.custom_color_spec_flag = r.get_bool()
    if vf.custom_color_spec_flag:
        vf.color_spec = r.get_uvlc()
        if vf.color_spec == int(CS.CS_CUSTOM):
            vf.custom_color_primaries_flag = r.get_bool()
            if vf.custom_color_primaries_flag:
                vf.color_primaries = r.get_uvlc()
            vf.custom_color_matrix_flag = r.get_bool()
            if vf.custom_color_matrix_flag:
                vf.color_matrix = r.get_uvlc()
            vf.custom_transfer_function_flag = r.get_bool()
            if vf.custom_transfer_function_flag:
                vf.transfer_function = r.get_uvlc()
    vf.source_sampling = r.get_uvlc()
    r.align()
    return vf


_BITDEPTH_INDEX_TO_BITS = {0: 0, 1: 8, 2: 8, 3: 10, 4: 12, 5: 10, 6: 12, 7: 16, 8: 16}


def sequence_header_of(vf: VideoFormat) -> SequenceHeader:
    """Decode-side merge (reference copy_video_fmt_to_hdr, DataUnit.cpp:1203-1312)."""
    hdr = default_source_parameters(vf.base_video_format)
    hdr.major_version = vf.major_version
    hdr.minor_version = vf.minor_version
    hdr.profile = Profile.PROFILE_LD if vf.profile == 0 else (
        Profile.PROFILE_HQ if vf.profile == 3 else hdr.profile)
    if vf.custom_dimensions_flag:
        hdr.width = vf.frame_width
        hdr.height = vf.frame_height
    if vf.custom_color_diff_format_flag:
        hdr.chroma_format = ColourFormat(vf.color_diff_format)
    if vf.custom_scan_format_flag:
        hdr.interlace = vf.source_sampling != 0
    if vf.custom_frame_rate_flag:
        hdr.frame_rate = FrameRate(vf.frame_rate)
        if vf.frame_rate == 0:
            hdr.frame_rate_numer = vf.frame_rate_numer
            hdr.frame_rate_denom = vf.frame_rate_denom
        if vf.frame_rate > int(MAX_V2_FRAMERATE) and hdr.major_version < 3:
            hdr.major_version = 3
    if vf.custom_pixel_aspect_ratio_flag:
        hdr.pixel_aspect_ratio = vf.pixel_aspect_ratio
        if vf.pixel_aspect_ratio == 0:
            hdr.pixel_aspect_ratio_numer = vf.pixel_aspect_ratio_numer
            hdr.pixel_aspect_ratio_denom = vf.pixel_aspect_ratio_denom
    if vf.custom_clean_area_flag:
        hdr.clean_width = vf.clean_width
        hdr.clean_height = vf.clean_height
        hdr.left_offset = vf.left_offset
        hdr.top_offset = vf.top_offset
    if vf.custom_signal_range_flag:
        hdr.bitdepth = _BITDEPTH_INDEX_TO_BITS.get(vf.bitdepth, hdr.bitdepth)
        if vf.bitdepth == 0:
            hdr.luma_offset = vf.luma_offset
            hdr.luma_excursion = vf.luma_excursion
            hdr.color_diff_offset = vf.color_diff_offset
            hdr.color_diff_excursion = vf.color_diff_excursion
        if vf.bitdepth > 4 and hdr.major_version < 3:
            hdr.major_version = 3
    if vf.custom_color_spec_flag:
        hdr.color_spec = vf.color_spec
        if vf.color_spec == int(CS.CS_CUSTOM):
            if vf.custom_color_primaries_flag:
                hdr.color_primaries = vf.color_primaries
            if vf.custom_color_matrix_flag:
                hdr.color_matrix = vf.color_matrix
            if vf.custom_transfer_function_flag:
                hdr.transfer_function = vf.transfer_function
    return hdr
