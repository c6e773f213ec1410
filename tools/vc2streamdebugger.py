#!/usr/bin/env python3
"""VC-2 stream debugging tool: walks the parse_info chain and prints a
description of every data unit.

Functional port of the reference analyser
(/root/reference/tools/vc2streamdebugger:67-482): validates the
next/prev parse-offset back-links, reports garbage between units, decodes
sequence headers via the shared stream layer, and dumps HQ picture /
fragment transform parameters plus per-slice length+quantiser statistics.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vc2tpu.stream.bits import BitReader
from vc2tpu.stream.headers import read_video_format

PARSE_NAMES = {
    0x00: "Sequence Header",
    0x10: "End of Sequence",
    0x20: "Auxiliary Data",
    0x30: "Padding Data",
    0x08: "Core Syntax Picture (Arithmetic Coding)",
    0x48: "Core Syntax Picture (Variable Length Coding)",
    0xC8: "Low Delay Picture",
    0xE8: "High Quality Picture",
    0xCC: "Low Delay Fragment",
    0xEC: "High Quality Fragment",
}


def be32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 4], "big")


def check_links(stream: bytes, offset: int, nxt: int, prev: int):
    errs = []
    if prev:
        p = offset - prev
        if p < 0:
            errs.append("prev_parse_offset Error: Underrun")
        elif stream[p:p + 4] != b"BBCD":
            errs.append("prev_parse_offset Error: No parse info header at "
                        "previous location")
        elif be32(stream, p + 5) != prev:
            errs.append("prev_parse_offset Error: Offsets do not match")
    if nxt:
        n = offset + nxt
        if n + 12 >= len(stream):
            errs.append("next_parse_offset Error: Overrun")
        elif stream[n:n + 4] != b"BBCD":
            errs.append("next_parse_offset Error: No parse info header at "
                        "next location")
        elif be32(stream, n + 9) != nxt:
            errs.append("next_parse_offset Error: Offsets do not match")
    return errs


def dump_sequence_header(stream: bytes, offset: int) -> int:
    print("    -- Sequence Header --")
    try:
        vf = read_video_format(BitReader(stream, offset))
    except Exception as exc:
        print(f"      !! error decoding video format: {exc}")
        return 0
    print(f"      major_version     : {vf.major_version}")
    print(f"      minor_version     : {vf.minor_version}")
    print(f"      profile           : {vf.profile}")
    print(f"      level             : {vf.level}")
    print(f"      base video format : {vf.base_video_format}")
    if vf.custom_dimensions_flag:
        print(f"      frame size        : {vf.frame_width}x{vf.frame_height}")
    if vf.custom_color_diff_format_flag:
        print(f"      colour diff format: {vf.color_diff_format}")
    if vf.custom_scan_format_flag:
        print(f"      source sampling   : {vf.source_sampling}")
    if vf.custom_frame_rate_flag:
        print(f"      frame rate index  : {vf.frame_rate}")
    if vf.custom_signal_range_flag:
        print(f"      signal range index: {vf.bitdepth}")
    return vf.major_version


def dump_hq_transform_params(r: BitReader, mvn: int):
    wavelet = r.get_uvlc()
    depth = r.get_uvlc()
    ho = 0
    if mvn >= 3:
        if r.get_bool():
            wavelet = f"{wavelet} ({r.get_uvlc()}ho)"
        if r.get_bool():
            ho = r.get_uvlc()
    slices_x = r.get_uvlc()
    slices_y = r.get_uvlc()
    prefix = r.get_uvlc()
    scalar = r.get_uvlc()
    print(f"      wavelet           : {wavelet}")
    print(f"      depth             : {depth}")
    print(f"      slices            : {slices_x}x{slices_y}")
    print(f"      prefix bytes      : {prefix}")
    print(f"      slice size scalar : {scalar}")
    if r.get_bool():
        print("      custom quantisation matrix:")
        print(f"        LL              : {r.get_uvlc()}")
        for level in range(ho + 1, depth + 1):
            print(f"        level {level} HL/LH/HH: "
                  f"{r.get_uvlc()} {r.get_uvlc()} {r.get_uvlc()}")
    r.align()
    return slices_x, slices_y, prefix, scalar


def dump_hq_slices(stream: bytes, offset: int, end: int, n_slices: int,
                   prefix: int, scalar: int, verbose: bool):
    qi, lengths = [], []
    pos = offset
    try:
        for _ in range(n_slices):
            pos += prefix
            qi.append(stream[pos])
            pos += 1
            total = 0
            for _c in range(3):
                size = stream[pos] * scalar
                total += size
                pos += 1 + size
                if pos > end:
                    raise IndexError
            lengths.append(total + 4 + prefix)
    except IndexError:
        print(f"      !! slice chain overruns the data unit at slice "
              f"{len(qi)}")
        return
    if qi:
        print(f"      slices decoded    : {len(qi)}")
        print(f"      qIndex min/mean/max : {min(qi)}/"
              f"{sum(qi) / len(qi):.2f}/{max(qi)}")
        print(f"      slice bytes min/mean/max : {min(lengths)}/"
              f"{sum(lengths) / len(lengths):.2f}/{max(lengths)}")
    if verbose:
        for i, (q, l) in enumerate(zip(qi, lengths)):
            print(f"        slice {i}: qIndex={q} bytes={l}")


def dump_hq_picture(stream: bytes, offset: int, length: int, verbose: bool,
                    mvn: int):
    r = BitReader(stream, offset)
    picnum = r.get_bits(32)
    print(f"      picture number    : {picnum}")
    try:
        sx, sy, prefix, scalar = dump_hq_transform_params(r, mvn)
    except Exception as exc:
        print(f"      !! error decoding transform parameters: {exc}")
        return
    dump_hq_slices(stream, r.byte_pos, offset + length, sx * sy, prefix,
                   scalar, verbose)


def dump_hq_fragment(stream: bytes, offset: int, length: int, verbose: bool,
                     mvn: int, tp):
    r = BitReader(stream, offset)
    picnum = r.get_bits(32)
    data_length = r.get_bits(16)
    n_slices = r.get_bits(16)
    print(f"      picture number    : {picnum}")
    print(f"      fragment data len : {data_length}")
    print(f"      fragment slices   : {n_slices}")
    if n_slices == 0:
        try:
            tp = dump_hq_transform_params(r, mvn)
        except Exception as exc:
            print(f"      !! error decoding transform parameters: {exc}")
        return tp
    off_x = r.get_bits(16)
    off_y = r.get_bits(16)
    print(f"      slice offset      : ({off_x}, {off_y})")
    if tp is not None:
        _sx, _sy, prefix, scalar = tp
        dump_hq_slices(stream, r.byte_pos, offset + length, n_slices,
                       prefix, scalar, verbose)
    return tp


def parse_stream(stream: bytes, verbose: bool) -> None:
    offset = 0
    garbage = 0
    mvn = 0
    tp = None
    while offset + 13 <= len(stream):
        if stream[offset:offset + 4] != b"BBCD":
            offset += 1
            garbage += 1
            continue
        if garbage:
            print(f"0x{offset - garbage:010x} : [ GARBAGE    ] "
                  f"({garbage} bytes)")
            garbage = 0
        code = stream[offset + 4]
        nxt = be32(stream, offset + 5)
        prev = be32(stream, offset + 9)
        print(f"0x{offset:010x} : [ PARSE INFO ]")
        print(f"    parse_code        : 0x{code:02x} "
              f"({PARSE_NAMES.get(code, 'Unknown')})")
        print(f"    next_parse_offset : 0x{nxt:08x}")
        print(f"    prev_parse_offset : 0x{prev:08x}")
        for e in check_links(stream, offset, nxt, prev):
            print(f"    {e}")
        body = offset + 13
        length = nxt - 13 if nxt > 13 else 0
        if code == 0x00:
            mvn = dump_sequence_header(stream, body)
        elif code == 0xE8:
            print(f"    -- High Quality Picture ({length} bytes) --")
            dump_hq_picture(stream, body, length, verbose, mvn)
        elif code == 0xEC:
            print(f"    -- High Quality Fragment ({length} bytes) --")
            tp = dump_hq_fragment(stream, body, length, verbose, mvn, tp)
        elif code in PARSE_NAMES:
            print(f"    -- {PARSE_NAMES[code]} ({length} bytes) --")
        else:
            print(f"    -- Unknown Parse Code ({length} bytes) --")
        offset = body + length if nxt > 13 else body
        print()
    garbage += len(stream) - offset if offset < len(stream) else 0
    if garbage:
        print(f"0x{len(stream) - garbage:010x} : [ GARBAGE    ] "
              f"({garbage} bytes)")
    print(f"0x{len(stream):010x} : [ END        ]")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="VC2 Stream debugging tool.")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("infilename", metavar="file")
    args = p.parse_args(argv)
    with open(args.infilename, "rb") as f:
        parse_stream(f.read(), args.verbose)
    return 0


if __name__ == "__main__":
    sys.exit(main())
