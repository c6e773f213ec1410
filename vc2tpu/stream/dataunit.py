"""Data-unit framing: parse_info headers, picture preambles, fragments.

Byte-identical port of the reference stream syntax layer
(/root/reference/src/Library/src/DataUnit.cpp). The iostream iword state of
the reference (prev_parse_offset, major_version_number, fragment_length)
becomes explicit fields on StreamWriter / StreamReader.
"""

from __future__ import annotations

import dataclasses
import enum

from vc2tpu.core.config import WaveletKernel
from vc2tpu.stream.bits import BitReader, BitWriter
from vc2tpu.stream.headers import (SequenceHeader, VideoFormat, read_video_format,
                                   sequence_header_of, video_format_of,
                                   write_video_format)


class DataUnitType(enum.Enum):
    UNKNOWN = "unknown"
    SEQUENCE_HEADER = "sequence_header"
    END_OF_SEQUENCE = "end_of_sequence"
    AUXILIARY_DATA = "auxiliary_data"
    PADDING_DATA = "padding_data"
    HQ_PICTURE = "hq_picture"
    LD_PICTURE = "ld_picture"
    HQ_FRAGMENT = "hq_fragment"
    LD_FRAGMENT = "ld_fragment"


# parse codes (reference DataUnit.cpp:92-109, 1127-1139)
PARSE_CODES = {
    DataUnitType.SEQUENCE_HEADER: 0x00,
    DataUnitType.END_OF_SEQUENCE: 0x10,
    DataUnitType.AUXILIARY_DATA: 0x20,
    DataUnitType.PADDING_DATA: 0x30,
    DataUnitType.LD_PICTURE: 0xC8,
    DataUnitType.HQ_PICTURE: 0xE8,
    DataUnitType.LD_FRAGMENT: 0xCC,
    DataUnitType.HQ_FRAGMENT: 0xEC,
}
_CODE_TO_TYPE = {v: k for k, v in PARSE_CODES.items()}

_KERNEL_WIRE = {k: int(k) for k in WaveletKernel}


@dataclasses.dataclass
class PicturePreamble:
    """Transform parameters (reference PicturePreamble, DataUnit.h:221-234)."""

    wavelet_kernel: WaveletKernel = WaveletKernel.NullKernel
    depth: int = 0
    slices_x: int = 0
    slices_y: int = 0
    slice_prefix: int = 0
    slice_size_scalar: int = 0
    slice_bytes_numerator: int = 0
    slice_bytes_denominator: int = 1
    wavelet_kernel_ho: WaveletKernel = WaveletKernel.NullKernel
    depth_ho: int = 0


@dataclasses.dataclass
class Fragment:
    n_slices: int = 0
    slice_offset_x: int = 0
    slice_offset_y: int = 0
    data_length: int = 0


class StreamWriter:
    """Writes a VC-2 stream to a file object."""

    def __init__(self, fileobj) -> None:
        self.f = fileobj
        self.prev_parse_offset = 0
        self.major_version = 0
        self.fragment_length = 0

    # -- parse_info (reference ParseInfoIO, DataUnit.cpp:80-123) --

    def _parse_info(self, du_type: DataUnitType, data_size: int | None) -> None:
        next_off = 0 if data_size is None else data_size + 13
        b = bytearray(b"\x42\x42\x43\x44")
        b.append(PARSE_CODES[du_type])
        b += next_off.to_bytes(4, "big")
        b += self.prev_parse_offset.to_bytes(4, "big")
        self.f.write(bytes(b))
        self.prev_parse_offset = next_off

    def start_sequence(self) -> None:
        self.prev_parse_offset = 0

    def end_sequence(self) -> None:
        self._parse_info(DataUnitType.END_OF_SEQUENCE, None)
        self.prev_parse_offset = 0

    def write_sequence_header(self, hdr: SequenceHeader) -> None:
        vf = video_format_of(hdr)
        if self.fragment_length > 0 and hdr.major_version < 3:
            vf.major_version = 3
        self.major_version = vf.major_version
        w = BitWriter()
        write_video_format(w, vf)
        payload = w.getvalue()
        self._parse_info(DataUnitType.SEQUENCE_HEADER, len(payload))
        self.f.write(payload)

    # -- picture preamble bits (transform params) --

    def _transform_params(self, preamble: PicturePreamble, hq: bool,
                          force_asym_flags: bool) -> bytes:
        w = BitWriter()
        w.unbounded()
        w.put_uvlc(_KERNEL_WIRE[preamble.wavelet_kernel])
        w.put_uvlc(preamble.depth)
        if force_asym_flags or self.major_version >= 3:
            w.put_bool(False)   # asym_transform_index_flag
            w.put_bool(False)   # asym_transform_flag
        w.put_uvlc(preamble.slices_x)
        w.put_uvlc(preamble.slices_y)
        if hq:
            w.put_uvlc(preamble.slice_prefix)
            w.put_uvlc(preamble.slice_size_scalar)
        else:
            w.put_uvlc(preamble.slice_bytes_numerator)
            w.put_uvlc(preamble.slice_bytes_denominator)
        w.put_bool(False)       # custom quant matrix
        w.align()
        return w.getvalue()

    def write_picture(self, picture_number: int, preamble: PicturePreamble,
                      slice_payload: bytes, hq: bool,
                      slice_sizes=None) -> None:
        """One LD/HQ picture data unit, or a fragment series when
        fragment_length > 0 (reference LD/HQWrappedPictureIO,
        DataUnit.cpp:125-343). ``slice_sizes`` (flat per-slice byte sizes in
        raster order) is required for fragmented output."""
        du = DataUnitType.HQ_PICTURE if hq else DataUnitType.LD_PICTURE
        if self.fragment_length == 0:
            params = self._transform_params(preamble, hq, force_asym_flags=False)
            body = picture_number.to_bytes(4, "big") + params + slice_payload
            self._parse_info(du, len(body))
            self.f.write(body)
            return
        assert slice_sizes is not None, "fragmented output needs per-slice sizes"
        fw = self.begin_fragments(picture_number, preamble, hq)
        fw.feed(slice_sizes, slice_payload)
        fw.close()

    def begin_fragments(self, picture_number: int, preamble: PicturePreamble,
                        hq: bool) -> "FragmentWriter":
        """Start a fragment series for one picture: writes the transform-
        params fragment and returns the incremental FragmentWriter."""
        return FragmentWriter(self, picture_number, preamble, hq)

    def write_padding(self, nbytes: int) -> None:
        self._parse_info(DataUnitType.PADDING_DATA, nbytes)
        self.f.write(bytes(nbytes))

    def write_auxiliary(self, data: bytes) -> None:
        self._parse_info(DataUnitType.AUXILIARY_DATA, len(data))
        self.f.write(data)


class FragmentWriter:
    """Incremental fragment emission for ONE picture (reference fragment
    framing: /root/reference/src/Library/src/DataUnit.cpp:267-342).

    feed() accepts contiguous (slice_sizes, payload) spans in raster order
    — e.g. one span per mesh shard as its device buffer lands — and writes
    every fragment data unit the moment it completes, holding back only
    the open fragment that may continue into the next span. The greedy
    cut (as many whole slices as fit in fragment_length, at least one per
    fragment) is the reference's, so the stream is byte-identical to
    framing the fully assembled payload; buffering is bounded by one
    fragment regardless of picture size."""

    def __init__(self, writer: StreamWriter, picture_number: int,
                 preamble: PicturePreamble, hq: bool) -> None:
        self.w = writer
        self.pic = picture_number
        self.slices_x = preamble.slices_x
        self.frag_du = (DataUnitType.HQ_FRAGMENT if hq
                        else DataUnitType.LD_FRAGMENT)
        # first fragment: transform params, slice count 0
        params = writer._transform_params(preamble, hq, force_asym_flags=True)
        head = (picture_number.to_bytes(4, "big")
                + len(params).to_bytes(2, "big") + (0).to_bytes(2, "big"))
        writer._parse_info(self.frag_du, len(params) + 8)
        writer.f.write(head + params)
        self._first = 0              # first slice index of the open fragment
        self._count = 0              # slices in the open fragment
        self._chunks: list[bytes] = []
        self._bytes = 0
        self._next = 0               # next slice index expected by feed()
        self._closed = False

    def _emit(self) -> None:
        sy, sx = divmod(self._first, self.slices_x)
        body = (self.pic.to_bytes(4, "big")
                + self._bytes.to_bytes(2, "big")
                + self._count.to_bytes(2, "big")
                + sx.to_bytes(2, "big") + sy.to_bytes(2, "big")
                + b"".join(self._chunks))
        self.w._parse_info(self.frag_du, self._bytes + 12)
        self.w.f.write(body)
        self._first = self._next
        self._count = 0
        self._chunks = []
        self._bytes = 0

    def feed(self, slice_sizes, payload) -> None:
        """Append the next run of slices (sizes + their contiguous payload
        bytes, raster order); completed fragments are written immediately."""
        payload = bytes(payload)
        # validate BEFORE emitting: a mismatched span must fail fast with
        # no partial (corrupt) fragments already written to the output
        total = sum(int(s) for s in slice_sizes)
        if total != len(payload):
            raise ValueError(f"fragment span: {len(payload)} payload bytes "
                             f"but slice sizes sum to {total}")
        pos = 0
        limit = self.w.fragment_length
        for size in slice_sizes:
            size = int(size)
            if self._count and self._bytes + size > limit:
                self._emit()
            self._chunks.append(payload[pos:pos + size])
            self._bytes += size
            self._count += 1
            self._next += 1
            pos += size

    def close(self) -> None:
        """Flush the final fragment (the reference always emits one, even
        for an empty slice run)."""
        if not self._closed:
            self._emit()
            self._closed = True


class StreamReader:
    """Reads a VC-2 stream from a byte buffer."""

    def __init__(self, data: bytes) -> None:
        self.r = BitReader(data)
        self.data = data
        self.major_version = 0

    def synchronise(self) -> bool:
        """Scan to just past a 'BBCD' prefix (reference DataUnit.cpp:1086-1109).
        Returns False at EOF."""
        state = 0
        target = b"\x42\x42\x43\x44"
        while self.r.byte_pos < len(self.data):
            b = self.data[self.r.byte_pos]
            self.r.seek(self.r.byte_pos + 1)
            # NB: the reference does not rescan overlapped partial matches
            # (DataUnit.cpp:1086-1109) — mismatches reset to a fresh scan.
            state = state + 1 if b == target[state] else 0
            if state == 4:
                return True
        return False

    def eof(self) -> bool:
        return self.r.byte_pos >= len(self.data)

    def read_data_unit(self):
        """(type, next_parse_offset, prev_parse_offset); checks the prefix
        (reference operator>>(istream&, DataUnit&), DataUnit.cpp:1111-1144)."""
        prefix = self.r.get_raw(4)
        if prefix != b"\x42\x42\x43\x44":
            raise ValueError("Read bytes do not match expected parse_info_header.")
        code = self.r.get_bytes_value(1)
        if code not in _CODE_TO_TYPE:
            raise ValueError("Stream Error: Unknown data unit type.")
        next_off = self.r.get_bytes_value(4)
        prev_off = self.r.get_bytes_value(4)
        return _CODE_TO_TYPE[code], next_off, prev_off

    def read_sequence_header(self) -> SequenceHeader:
        vf = read_video_format(self.r)
        hdr = sequence_header_of(vf)
        self.major_version = hdr.major_version
        return hdr

    def read_picture_number(self) -> int:
        return self.r.get_bytes_value(4)

    def read_fragment_header(self) -> Fragment:
        frag = Fragment()
        frag.data_length = self.r.get_bytes_value(2)
        frag.n_slices = self.r.get_bytes_value(2)
        if frag.n_slices != 0:
            frag.slice_offset_x = self.r.get_bytes_value(2)
            frag.slice_offset_y = self.r.get_bytes_value(2)
        return frag

    def read_preamble(self, hq: bool) -> PicturePreamble:
        """Reference operator>>(istream&, PicturePreamble&), DataUnit.cpp:1339-1410."""
        r = self.r
        r.unbounded()
        p = PicturePreamble()
        p.wavelet_kernel = WaveletKernel(r.get_uvlc())
        p.depth = r.get_uvlc()
        p.wavelet_kernel_ho = p.wavelet_kernel
        p.depth_ho = 0
        if self.major_version >= 3:
            if r.get_bool():
                p.wavelet_kernel_ho = WaveletKernel(r.get_uvlc())
            if r.get_bool():
                p.depth_ho = r.get_uvlc()
        p.slices_x = r.get_uvlc()
        p.slices_y = r.get_uvlc()
        if hq:
            p.slice_prefix = r.get_uvlc()
            p.slice_size_scalar = r.get_uvlc()
            p.slice_bytes_numerator, p.slice_bytes_denominator = 0, 1
        else:
            from vc2tpu.core.intmath import rationalise

            num = r.get_uvlc()
            den = r.get_uvlc()
            p.slice_bytes_numerator, p.slice_bytes_denominator = rationalise(num, den)
            p.slice_prefix = 0
            p.slice_size_scalar = 0
        if r.get_bool():
            raise ValueError("DataUnitIO: Custom Quantisation Matrix flag not supported")
        r.align()
        return p
