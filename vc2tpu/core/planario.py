"""Planar picture file I/O (host-side, NumPy).

Replaces the reference's iostream-manipulator array I/O
(/root/reference/src/Library/src/Arrays.cpp:333-426) with vectorised NumPy.

Format model (identical semantics):
* ``word_width`` bytes per sample, big-endian;
* data is ``bit_depth`` bits, left (MSB) justified unless right-justified;
* ``offset`` binary adds/subtracts 2^(depth-1) (or an explicit zero level);
* ``signed`` binary uses an arithmetic shift when un-justifying.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SampleFormat:
    word_width: int = 2          # bytes per sample, 1..4
    bit_depth: int = 0           # 0 -> 8*word_width
    signed: bool = False
    offset: bool = True          # offset binary
    right_justified: bool = False
    zero_level: int | None = None

    @property
    def depth(self) -> int:
        return self.bit_depth if self.bit_depth else 8 * self.word_width

    @property
    def shift(self) -> int:
        return 0 if self.right_justified else 8 * self.word_width - self.depth

    @property
    def zero(self) -> int:
        if not self.offset:
            return 0
        return self.zero_level if self.zero_level is not None else 1 << (self.depth - 1)


_DTYPES = {1: ">u1", 2: ">u2", 3: None, 4: ">u4"}


def _read_words(buf: bytes, fmt: SampleFormat, count: int) -> np.ndarray:
    w = fmt.word_width
    if w == 3:
        raw = np.frombuffer(buf, dtype=np.uint8, count=count * 3).reshape(count, 3)
        return (raw[:, 0].astype(np.uint32) << 16) | (raw[:, 1].astype(np.uint32) << 8) \
            | raw[:, 2].astype(np.uint32)
    return np.frombuffer(buf, dtype=_DTYPES[w], count=count).astype(np.uint32)


def decode_plane(buf: bytes, height: int, width: int, fmt: SampleFormat) -> np.ndarray:
    """bytes -> int32 plane, per reference operator>>(istream, Array2D&)."""
    value = _read_words(buf, fmt, height * width)
    if fmt.signed:
        out = value.astype(np.int32) >> fmt.shift  # arithmetic shift
    else:
        out = (value >> fmt.shift).astype(np.int32)
    if fmt.offset:
        out = out - np.int32(fmt.zero)
    return out.reshape(height, width)


def encode_plane(plane: np.ndarray, fmt: SampleFormat) -> bytes:
    """int32 plane -> bytes, per reference operator<<(ostream, const Array2D&)."""
    value = (plane.astype(np.int64) + fmt.zero).astype(np.uint32) << np.uint32(fmt.shift)
    w = fmt.word_width
    if w == 3:
        flat = value.reshape(-1)
        raw = np.empty((flat.size, 3), dtype=np.uint8)
        raw[:, 0] = (flat >> 16) & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = flat & 0xFF
        return raw.tobytes()
    return value.astype(_DTYPES[w]).tobytes()


class PlanarReader:
    """Frame-at-a-time reader of Y,C1,C2 planar files."""

    def __init__(self, fileobj, geometry, luma_fmt: SampleFormat,
                 chroma_fmt: SampleFormat | None = None):
        self.f = fileobj
        self.g = geometry
        self.luma_fmt = luma_fmt
        self.chroma_fmt = chroma_fmt or luma_fmt

    def frame_bytes(self) -> int:
        g = self.g
        return (g.luma_height * g.luma_width * self.luma_fmt.word_width
                + 2 * g.chroma_height * g.chroma_width * self.chroma_fmt.word_width)

    def read_frame(self):
        from vc2tpu.core.picture import Picture

        g = self.g
        need = self.frame_bytes()
        buf = self.f.read(need)
        if len(buf) < need:
            return None
        ybytes = g.luma_height * g.luma_width * self.luma_fmt.word_width
        cbytes = g.chroma_height * g.chroma_width * self.chroma_fmt.word_width
        y = decode_plane(buf[:ybytes], g.luma_height, g.luma_width, self.luma_fmt)
        c1 = decode_plane(buf[ybytes:ybytes + cbytes], g.chroma_height, g.chroma_width,
                          self.chroma_fmt)
        c2 = decode_plane(buf[ybytes + cbytes:], g.chroma_height, g.chroma_width,
                          self.chroma_fmt)
        return Picture(y, c1, c2, g.chroma_format)


def write_picture(fileobj, picture, luma_fmt: SampleFormat,
                  chroma_fmt: SampleFormat | None = None) -> None:
    chroma_fmt = chroma_fmt or luma_fmt
    fileobj.write(encode_plane(np.asarray(picture.y), luma_fmt))
    fileobj.write(encode_plane(np.asarray(picture.c1), chroma_fmt))
    fileobj.write(encode_plane(np.asarray(picture.c2), chroma_fmt))
