"""DecodeFrame-compatible CLI: headerless slice payloads -> planar file.

Decodes raw concatenated slice payloads (no VC-2 stream syntax) given the
geometry / kernel / depth / slice parameters on the command line, mirroring
the reference's optional frame decoder
(/root/reference/src/DecodeFrame/DecodeFrame.cpp:61-358, flag surface
src/DecodeFrame/DecodeParams.cpp:54-160). Useful as a conformance harness:
the same decode core as DecodeStream minus the stream parser.

Verified byte-identical to the reference binary for HQ Decoded output (all
frames) and Transform output (first frame). Two reference-binary defects are
intentionally not reproduced: (a) for multi-frame input its
Transform/Quantised taps corrupt every picture after the first (stale
iostream state); (b) in LD mode it fails to read its own encoder's Packaged
output at all ("Failed to read the first compressed frame"). This
implementation follows the reference SOURCE semantics in both cases — note
DecodeFrame dequantises LD without DC prediction (inverse_quantise_transform
_np, DecodeFrame.cpp:298), so LD output legitimately differs from
DecodeStream's predictive path.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from vc2tpu.core.config import (ColourFormat, DecOutput, PictureGeometry,
                                WaveletKernel, chroma_dims)
from vc2tpu.core.picture import Picture, interleave_fields, signal_clip
from vc2tpu.core.planario import SampleFormat, write_picture
from vc2tpu.pipeline.decoder import synthesise_lanes
from vc2tpu.pipeline.encoder import SliceGeometry
from vc2tpu.slices import layout
from vc2tpu.slices.hq import decode_hq_slices
from vc2tpu.slices.ld import decode_ld_slices
from vc2tpu.wavelet import matrices


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vc2tpu-decode-frame",
        description="Decodes headerless VC-2 frames to an uncompressed "
                    "planar file")
    p.add_argument("inFile")
    p.add_argument("outFile")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-m", "--mode", default="HQ", choices=["HQ", "LD"])
    p.add_argument("-o", "--output", default="Decoded",
                   choices=["Transform", "Quantised", "Indices", "Decoded"])
    p.add_argument("-a", "--hSlice", type=int, required=True)
    p.add_argument("-u", "--vSlice", type=int, required=True)
    p.add_argument("-d", "--waveletDepth", type=int, required=True)
    p.add_argument("-k", "--kernel", required=True,
                   choices=[k.name for k in WaveletKernel])
    p.add_argument("-b", "--bottomFieldFirst", action="store_true")
    p.add_argument("-t", "--topFieldFirst", action="store_true")
    p.add_argument("-i", "--interlace", action="store_true")
    p.add_argument("-p", "--progressive", action="store_true")
    p.add_argument("-c", "--chromaDepth", type=int, default=None)
    p.add_argument("-l", "--lumaDepth", type=int, default=None)
    p.add_argument("-z", "--bitDepth", type=int, default=None)
    p.add_argument("-n", "--bytes", type=int, default=2)
    p.add_argument("-f", "--format", required=True,
                   choices=["4:4:4", "4:2:2", "4:2:0"])
    p.add_argument("-x", "--width", type=int, required=True)
    p.add_argument("-y", "--height", type=int, required=True)
    p.add_argument("-S", "--scalar", type=int, default=1)
    p.add_argument("-P", "--prefix", type=int, default=0)
    p.add_argument("-s", "--compressedBytes", type=int, default=0)
    return p


def _synthesise(ly, lu, lv, q_idx, qmatrix, kernel, depth, geo, out_geom,
                chroma_format) -> Picture:
    """Dequant + IDWT, preferring the native host engine (no accelerator
    needed for a conformance decode); bit-exact either way."""
    from vc2tpu.pipeline import host_synth

    lanes3 = [np.asarray(a) for a in (ly, lu, lv)]
    # range check, not abs().max(): np.abs(INT32_MIN) wraps negative and
    # would pass, silently truncating the int16 cast below
    if (host_synth.available()
            and all(a.size == 0 or (int(a.min()) >= -32767
                                    and int(a.max()) <= 32767)
                    for a in lanes3)):
        qm = np.ascontiguousarray(qmatrix, np.int32)
        q_idx = np.ascontiguousarray(q_idx, np.int32)
        planes = []
        for lanes, (sh, sw), (oh, ow) in (
                (lanes3[0], geo.luma_slice,
                 (out_geom.luma_height, out_geom.luma_width)),
                (lanes3[1], geo.chroma_slice,
                 (out_geom.chroma_height, out_geom.chroma_width)),
                (lanes3[2], geo.chroma_slice,
                 (out_geom.chroma_height, out_geom.chroma_width))):
            p = host_synth.synthesise_component(
                np.ascontiguousarray(lanes, np.int16), q_idx, qm, kernel,
                depth, geo.y_slices, geo.x_slices, sh, sw)
            planes.append(p[:oh, :ow])
        return Picture(planes[0], planes[1], planes[2], chroma_format)
    return synthesise_lanes(ly, lu, lv, q_idx, qmatrix, kernel, depth, geo,
                            out_geom, chroma_format)


def run(args) -> int:
    # None-aware, not falsy: an explicit 0 must fail validation, not be
    # silently replaced with the default (see encode_stream.config_from_args)
    bit_depth = 8 * args.bytes if args.bitDepth is None else args.bitDepth
    luma_depth = bit_depth if args.lumaDepth is None else args.lumaDepth
    chroma_depth = luma_depth if args.chromaDepth is None else args.chromaDepth
    chroma_format = ColourFormat.parse(args.format)
    kernel = WaveletKernel.parse(args.kernel)
    depth = args.waveletDepth
    interlaced = args.interlace
    top_field_first = not args.bottomFieldFirst
    hq = args.mode == "HQ"

    pic_h = args.height // 2 if interlaced else args.height
    padded_h = matrices.padded_size(pic_h, depth)
    padded_w = matrices.padded_size(args.width, depth)
    y_tx = args.vSlice << depth
    x_tx = args.hSlice << depth
    if padded_h % y_tx or padded_w % x_tx:
        raise ValueError("Padded picture size is not divisible by slice size")
    ys, xs = padded_h // y_tx, padded_w // x_tx
    pch, pcw = chroma_dims(padded_h, padded_w, chroma_format)
    geo = SliceGeometry(ys, xs, (padded_h, padded_w), (pch, pcw),
                        (padded_h // ys, padded_w // xs),
                        (pch // ys, pcw // xs))
    Ly = geo.luma_slice[0] * geo.luma_slice[1]
    Lc = geo.chroma_slice[0] * geo.chroma_slice[1]
    qmatrix = matrices.quant_matrix(kernel, depth)
    picture_bytes = (args.compressedBytes // 2 if interlaced
                     else args.compressedBytes)
    ld_sizes = (layout.slice_bytes_map(ys, xs, picture_bytes, 1).ravel()
                if not hq else None)
    if not hq and int(ld_sizes.sum()) <= 0:
        # zero-size LD slices would decode end == start and loop forever
        raise ValueError("compressed bytes must be >0 in LD mode")

    data = (sys.stdin.buffer.read() if args.inFile == "-"
            else open(args.inFile, "rb").read())
    payload = np.frombuffer(data, dtype=np.uint8)
    sink = sys.stdout.buffer if args.outFile == "-" else open(args.outFile, "wb")
    out = DecOutput(args.output)
    sig_fmt = SampleFormat(word_width=4, signed=True, offset=False)
    out_geom = PictureGeometry.of(pic_h, args.width, chroma_format)
    frame_pics = 2 if interlaced else 1

    pos = 0
    frame = 0
    fields = []
    while True:
        pictures = []
        for pic in range(frame_pics):
            try:
                if hq:
                    d = decode_hq_slices(payload, geo.n_slices, args.prefix,
                                         args.scalar, (Ly, Lc, Lc), start=pos)
                    q_idx, (ly, lu, lv) = d.q_indices, d.lanes
                    end = pos + d.total_bytes
                else:
                    need = int(ld_sizes.sum())
                    if pos + need > payload.size:
                        raise ValueError("eof")
                    q_idx, ly, lu, lv, _ = decode_ld_slices(
                        payload, ld_sizes, (Ly, Lc), start=pos)
                    end = pos + need
            except (ValueError, IndexError):
                if frame == 0:
                    print("Failed to read the first compressed frame",
                          file=sys.stderr)
                    return 1
                if args.verbose:
                    print(f"End of input reached after {frame} frames",
                          file=sys.stderr)
                return 0
            pos = end
            pictures.append((q_idx, ly, lu, lv))

        for (q_idx, ly, lu, lv) in pictures:
            if out == DecOutput.INDICES:
                sink.write(q_idx.astype(np.uint8).tobytes())
                continue
            quantised = Picture(
                layout.lanes_to_plane(ly, ys, xs, *geo.luma_slice, depth),
                layout.lanes_to_plane(lu, ys, xs, *geo.chroma_slice, depth),
                layout.lanes_to_plane(lv, ys, xs, *geo.chroma_slice, depth),
                chroma_format)
            if out == DecOutput.QUANTISED:
                write_picture(sink, quantised, sig_fmt)
                continue
            if out == DecOutput.TRANSFORM:
                pic = synthesise_lanes(ly, lu, lv, q_idx, qmatrix, kernel,
                                       depth, geo, out_geom, chroma_format,
                                       dequant_only=True)
                write_picture(sink, pic, sig_fmt)
                continue
            picture = _synthesise(ly, lu, lv, q_idx, qmatrix, kernel, depth,
                                  geo, out_geom, chroma_format)
            fields.append(picture)

        if out == DecOutput.DECODED:
            if interlaced:
                out_frame = interleave_fields(fields[0], fields[1],
                                              top_field_first)
            else:
                out_frame = fields[0]
            fields = []
            out_frame = signal_clip(out_frame, luma_depth, chroma_depth)
            luma_fmt = SampleFormat(word_width=args.bytes,
                                    bit_depth=luma_depth, offset=True)
            chroma_fmt = SampleFormat(word_width=args.bytes,
                                      bit_depth=chroma_depth, offset=True)
            write_picture(sink, out_frame, luma_fmt, chroma_fmt)
        frame += 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        rc = run(args)
    except Exception as exc:
        # stdout, as the reference's catch-all does (DecodeFrame.cpp:352
        # prints to cout) — error-case output stays byte-comparable
        print(f"Error: {exc}")
        return 1
    if args.outFile != "-":
        pass
    return rc


if __name__ == "__main__":
    sys.exit(main())
