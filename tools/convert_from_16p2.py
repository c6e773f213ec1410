#!/usr/bin/env python3
"""16p2 -> yuv converter (vectorised NumPy port of the reference tool,
/root/reference/tools/convert_from_16p2:29-79).

Input: "16p2" — 16-bit big-endian planar samples, active bits MSB-justified
(as written by vc2tpu-decode / DecodeStream). Output: ffmpeg planar yuv
(yuvNNNp for 8-bit, little-endian 16-bit words otherwise).
"""

import argparse
import sys

import numpy as np


def convert(data: bytes, bits: int) -> bytes:
    v = np.frombuffer(data, dtype=">u2")
    if bits == 8:
        return (v >> 8).astype(np.uint8).tobytes()
    return (v >> (16 - bits)).astype("<u2").tobytes()


CHUNK = 16 << 20          # per-sample transform: any even chunk size works


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="16p2 to yuv converter")
    p.add_argument("infilename", metavar="file")
    p.add_argument("--bits", type=int, default=10,
                   help="active bits (default 10)")
    args = p.parse_args(argv)
    # convert in bounded chunks: real sequences are tens of GB and the
    # transform is per-sample (the reference tool streams word-by-word)
    with open(args.infilename, "rb") as fi, \
            open(args.infilename + ".yuv", "wb") as fo:
        while True:
            data = fi.read(CHUNK)
            if not data:
                break
            fo.write(convert(data, args.bits))
    return 0


if __name__ == "__main__":
    sys.exit(main())
