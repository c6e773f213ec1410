#!/usr/bin/env python3
"""yuv -> 16p2 converter (vectorised NumPy port of the reference tool,
/root/reference/tools/convert_to_16p2:29-85).

Input: ffmpeg planar yuv (yuvNNNp for 8-bit, yuvNNNpM{le} for 10/12/16-bit
little-endian). Output: "16p2" — 16-bit big-endian planar samples with the
active bits MSB-justified, the native input format of vc2tpu-encode and the
reference EncodeStream.
"""

import argparse
import sys

import numpy as np


def convert(data: bytes, bits: int) -> bytes:
    if bits == 8:
        v = np.frombuffer(data, dtype=np.uint8).astype(np.uint16)
        return (v << 8).astype(">u2").tobytes()
    v = np.frombuffer(data, dtype="<u2")
    return (v << (16 - bits)).astype(">u2").tobytes()


CHUNK = 16 << 20          # per-sample transform: any even chunk size works


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="yuv to 16p2 converter")
    p.add_argument("infilename", metavar="file")
    p.add_argument("--bits", type=int, default=10,
                   help="active bits (default 10)")
    args = p.parse_args(argv)
    # convert in bounded chunks: real sequences are tens of GB and the
    # transform is per-sample (the reference tool streams word-by-word)
    with open(args.infilename, "rb") as fi, \
            open(args.infilename + ".16p2", "wb") as fo:
        while True:
            data = fi.read(CHUNK)
            if not data:
                break
            fo.write(convert(data, args.bits))
    return 0


if __name__ == "__main__":
    sys.exit(main())
