"""Headline benchmark: 1080p HQ decode frames/s, end-to-end (stream bytes ->
entropy unpack -> dequant + IDWT on device -> planar output bytes).

Prints ONE JSON line:
  {"metric": "hq_decode_1080p_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N / 1.32}

Baseline denominator: the reference DecodeStream compiled at -O2 on this host
decodes the same ConstQ stream at 1.32 fps (BASELINE.md round-2
re-measurement on exactly this content family, 2026-08-17).
Secondary metrics (encode fps, CBR encode fps) go to stderr.

Config matches BASELINE.json config #1 / BASELINE.md: 1920x1080 4:2:2 10-bit,
HQ ConstQ q=40, LeGall depth 2, 2x2 slice size (reference flags
`-x 1920 -y 1080 -f 4:2:2 -l 10 -k LeGall -d 2 -u 2 -a 2 -q 40`).
"""

from __future__ import annotations

import io
import json
import sys
import time

import numpy as np


N_FRAMES = 16          # frames timed per measurement
# reference binaries at -O2 on this host, measured 2026-08-17 on exactly the
# synth_frames content family (BASELINE.md "round-2 re-measurement")
BASELINE_DECODE_FPS = 1.32   # reference DecodeStream (HQ ConstQ stream)
BASELINE_ENCODE_FPS = 0.98   # reference EncodeStream HQ_ConstQ
BASELINE_CBR_FPS = 0.152     # reference EncodeStream HQ_CBR
BASELINE_LD_FPS = 0.37       # reference EncodeStream LD


def synth_frames(n, h=1080, w=1920, bits=10, seed=7):
    """Deterministic synthetic video: sinusoid + noise in ALL planes — the
    same content family as tests/make_golden.py and, critically, as the
    BASELINE.md reference-binary measurements (the denominators below were
    timed on this family; pure-noise chroma would make our stream strictly
    harder than the one the reference was benchmarked on)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:h, 0:w // 2]
    frames = []
    for i in range(n):
        base = (np.sin(xx / (19.0 + i)) * np.cos(yy / 13.0) + 1.0) / 2.0
        y = (base * (2 ** bits - 1)).astype(np.int64)
        y += rng.integers(0, 64, (h, w))
        y = np.clip(y, 0, 2 ** bits - 1).astype(np.int32)
        cb = (np.sin(cxx / (11.0 + i)) * np.cos(cyy / 17.0) + 1.0) / 2.0
        c1 = (cb * (2 ** bits - 1)).astype(np.int64)
        c1 += rng.integers(-32, 32, (h, w // 2))
        c1 = np.clip(c1, 0, 2 ** bits - 1).astype(np.int32)
        c2 = np.clip((2 ** bits - 1) - c1 // 2 +
                     rng.integers(-16, 16, (h, w // 2)),
                     0, 2 ** bits - 1).astype(np.int32)
        frames.append((y, c1, c2))
    return frames


def main() -> int:
    from vc2tpu.core.config import (ColourFormat, EncoderConfig, FrameRate,
                                    Mode, Profile, WaveletKernel)
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline.encoder import Encoder
    from vc2tpu.cli.decode_stream import Decoder
    from vc2tpu.stream.dataunit import PicturePreamble, StreamWriter
    from vc2tpu.stream.headers import SequenceHeader

    h, w, bits = 1080, 1920, 10
    cfg = EncoderConfig(height=h, width=w, chroma_format=ColourFormat.CF422,
                        kernel=WaveletKernel.LeGall, wavelet_depth=2,
                        y_size=2, x_size=2, mode=Mode.HQ_ConstQ,
                        luma_depth=bits, chroma_depth=bits,
                        frame_rate=FrameRate.FR50, q_index=40)
    frames = synth_frames(N_FRAMES, h, w, bits)
    offset = 1 << (bits - 1)
    pics = [Picture(y.astype(np.int32) - offset, c1 - offset, c2 - offset,
                    ColourFormat.CF422) for (y, c1, c2) in frames]

    enc = Encoder(cfg)
    # warm-up compiles (second call absorbs the adaptive fetch-cap resize)
    enc.encode_picture(pics[0])
    enc.encode_picture(pics[0])

    t0 = time.perf_counter()
    handles = [enc.encode_picture_async(p) for p in pics]
    encoded = [h() for h in handles]
    enc_fps = len(pics) / (time.perf_counter() - t0)

    buf = io.BytesIO()
    writer = StreamWriter(buf)
    writer.start_sequence()
    writer.write_sequence_header(SequenceHeader(
        profile=Profile.PROFILE_HQ, height=h, width=w,
        chroma_format=ColourFormat.CF422, interlace=False,
        frame_rate=FrameRate.FR50, top_field_first=True, bitdepth=bits))
    for i, e in enumerate(encoded):
        writer.write_picture(i, PicturePreamble(
            wavelet_kernel=cfg.kernel, depth=cfg.wavelet_depth,
            slices_x=enc.geo.x_slices, slices_y=enc.geo.y_slices,
            slice_prefix=cfg.slice_prefix, slice_size_scalar=cfg.slice_scalar),
            e.payload, hq=True, slice_sizes=e.slice_totals)
    writer.end_sequence()
    stream = buf.getvalue()
    print(f"bench: stream {len(stream)} bytes, {len(pics)} frames, "
          f"encode {enc_fps:.2f} fps (ref {BASELINE_ENCODE_FPS}, "
          f"{enc_fps / BASELINE_ENCODE_FPS:.1f}x)", file=sys.stderr)

    class NullSink:
        def write(self, b):
            self.n = getattr(self, "n", 0) + len(b)

    # warm-up decode (jit compile)
    dec = Decoder(sink=NullSink())
    dec.run(stream)
    assert dec.frames_out == len(pics), (dec.frames_out, len(pics))

    runs = []
    for _ in range(5):       # median of 5 (honest central estimate; the
        dec = Decoder(sink=NullSink())   # adaptive route makes decode mostly
        t0 = time.perf_counter()         # link-independent, see BASELINE.md)
        dec.run(stream)
        dt = time.perf_counter() - t0
        runs.append(dec.frames_out / dt)
    dec_fps = float(np.median(runs))
    print(f"bench: decode route={dec._route} runs="
          f"{[round(r, 2) for r in sorted(runs)]}", file=sys.stderr)

    # secondary: CBR encode (rate-control dominated path)
    cbr_cfg = EncoderConfig(height=h, width=w, chroma_format=ColourFormat.CF422,
                            kernel=WaveletKernel.LeGall, wavelet_depth=2,
                            y_size=2, x_size=2, mode=Mode.HQ_CBR,
                            luma_depth=bits, chroma_depth=bits,
                            frame_rate=FrameRate.FR50,
                            compressed_bytes=829440, slice_scalar=2)
    cbr = Encoder(cbr_cfg)
    cbr.encode_picture(pics[0])
    t0 = time.perf_counter()
    for r in [cbr.encode_picture_async(p) for p in pics[:8]]:
        r()
    cbr_fps = 8 / (time.perf_counter() - t0)
    print(f"bench: CBR encode {cbr_fps:.2f} fps (ref {BASELINE_CBR_FPS}, "
          f"{cbr_fps / BASELINE_CBR_FPS:.0f}x)   decode {dec_fps:.2f} fps "
          f"(ref {BASELINE_DECODE_FPS}, {dec_fps / BASELINE_DECODE_FPS:.1f}x)",
          file=sys.stderr)

    # secondary: LD profile (obsolete; host-routed analysis transform)
    try:
        from vc2tpu.pipeline.ld import LDEncoder

        ld_cfg = EncoderConfig(height=h, width=w,
                               chroma_format=ColourFormat.CF422,
                               kernel=WaveletKernel.LeGall, wavelet_depth=2,
                               y_size=2, x_size=2, mode=Mode.LD,
                               luma_depth=bits, chroma_depth=bits,
                               frame_rate=FrameRate.FR50,
                               compressed_bytes=829440)
        ld = LDEncoder(ld_cfg)
        ld.encode_picture(pics[0])
        t0 = time.perf_counter()
        for p in pics[:6]:
            ld.encode_picture(p)
        ld_fps = 6 / (time.perf_counter() - t0)
        print(f"bench: LD encode {ld_fps:.2f} fps (ref {BASELINE_LD_FPS}, "
              f"{ld_fps / BASELINE_LD_FPS:.1f}x, route={ld._route})",
              file=sys.stderr)
    except Exception as exc:
        print(f"bench: LD encode skipped ({exc})", file=sys.stderr)

    # secondary: 4K CBR encode (BASELINE.json config #4 single-chip leg)
    try:
        k4 = EncoderConfig(height=2160, width=3840,
                           chroma_format=ColourFormat.CF422,
                           kernel=WaveletKernel.LeGall, wavelet_depth=2,
                           y_size=2, x_size=2, mode=Mode.HQ_CBR,
                           luma_depth=bits, chroma_depth=bits,
                           frame_rate=FrameRate.FR50,
                           compressed_bytes=4 * 829440, slice_scalar=2)
        enc4 = Encoder(k4)
        f4 = synth_frames(3, 2160, 3840, bits, seed=11)
        p4 = [Picture(y - offset, c1 - offset, c2 - offset, ColourFormat.CF422)
              for (y, c1, c2) in f4]
        enc4.encode_picture(p4[0])
        t0 = time.perf_counter()
        for r in [enc4.encode_picture_async(p) for p in p4]:
            r()
        fps4 = len(p4) / (time.perf_counter() - t0)
        print(f"bench: 4K CBR encode {fps4:.2f} fps", file=sys.stderr)
    except Exception as exc:                      # secondary must not kill bench
        print(f"bench: 4K CBR encode skipped ({exc})", file=sys.stderr)

    print(json.dumps({"metric": "hq_decode_1080p_fps",
                      "value": round(dec_fps, 3), "unit": "frames/s",
                      "vs_baseline": round(dec_fps / BASELINE_DECODE_FPS, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
