"""Stage-level device timing of the on-chip HQ decode (run on the real TPU).

Breaks the full on-chip decode step (pipeline/decoder._payload_synthesis_fn)
into stages and times each with the fori_loop slope method (see bench.py
chain_ms — per-call dependent chains measure tunnel dispatch, not device
time):

  1. window block gather + masking only
  2. entropy unpack (luma + paired chroma lane scans)
  3. unpack + dequant + IDWT + format (the full step)

Usage: python scripts/profile_unpack.py [--h 1080 --w 1920 | --h 2160 --w 3840]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def chain_ms(step, label=""):
    """bench.chain_ms (the one copy of the fori-loop slope recipe and its
    correctness caveats) at this script's shorter loop lengths."""
    from bench import chain_ms as _chain_ms

    return _chain_ms(step, n_lo=4, n_hi=16, reps=3, label=label)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--q", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS=cpu env "
                         "var still probes the axon plugin, which hangs "
                         "when the tunnel is down)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import synth_frames
    from vc2tpu.core.config import (ColourFormat, EncoderConfig, FrameRate,
                                    Mode, PictureGeometry, WaveletKernel)
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline.decoder import (_bucket, _bucket_bytes,
                                         _payload_synthesis_fn)
    from vc2tpu.pipeline.encoder import Encoder
    from vc2tpu.slices.hq import scan_hq_slice_offsets
    from vc2tpu.vlc import device_unpack as du

    h, w, bits = args.h, args.w, 10
    cfg = EncoderConfig(height=h, width=w, chroma_format=ColourFormat.CF422,
                        kernel=WaveletKernel.LeGall, wavelet_depth=2,
                        y_size=2, x_size=2, mode=Mode.HQ_ConstQ,
                        luma_depth=bits, chroma_depth=bits,
                        frame_rate=FrameRate.FR50, q_index=args.q)
    (y, c1, c2) = synth_frames(1, h, w, bits)[0]
    off = 1 << (bits - 1)
    enc = Encoder(cfg)
    e = enc.encode_picture(Picture(y - off, c1 - off, c2 - off,
                                   ColourFormat.CF422))
    geo = enc.geo
    pl = np.frombuffer(e.payload, np.uint8)
    qs, dstart, cbytes, _ = scan_hq_slice_offsets(pl, geo.n_slices,
                                                  cfg.slice_prefix,
                                                  cfg.slice_scalar)
    Ly = geo.luma_slice[0] * geo.luma_slice[1]
    Lc = geo.chroma_slice[0] * geo.chroma_slice[1]
    wc = tuple(du.window_words(_bucket_bytes(int(cbytes[c].max())),
                               (Ly, Lc, Lc)[c]) for c in range(3))
    print(f"{h}x{w} q={args.q}: payload {len(pl)} B, {geo.n_slices} slices, "
          f"lanes ({Ly},{Lc},{Lc}), window words {wc}")

    padded = np.zeros(_bucket((len(pl) + 3) // 4 * 4 + 8), np.uint8)
    padded[:len(pl)] = pl
    pay = jnp.asarray(padded)
    clens = jnp.asarray(cbytes, jnp.int32)
    ds = jnp.asarray(dstart, jnp.int32)
    qi = jnp.asarray(qs, jnp.int32)
    qmb = jnp.asarray(enc.qmatrix.astype(np.int32))

    # stage 1: window gather + mask only (materialise the blocks)
    def gather_only(prev):
        dep = (jnp.uint8(0) if prev is None
               else (prev.ravel()[0] & 1).astype(jnp.uint8))
        words = du.assemble_words(pay.at[-1].set(dep))
        base = ds[0] >> 2
        j = jnp.arange(wc[0], dtype=jnp.int32)
        blk = words[base[:, None] + j[None, :]]
        return blk.sum(axis=1).astype(jnp.uint32)  # force materialisation

    chain_ms(gather_only, label="luma block gather")

    # stage 2a: merged lane scan only (raw dense blocks, no placement)
    def scan_only(prev):
        dep = (jnp.uint8(0) if prev is None
               else (prev[0].ravel()[0] & 1).astype(jnp.uint8))
        words = du.assemble_words(pay.at[-1].set(dep))
        d0, d1, d2 = du.hq_component_offsets(clens, 0, jnp.int32(0))
        dc = jnp.concatenate([d1, d2])
        Wy, Wc = wc[0], max(wc[1], wc[2])
        block = du._gather_blocks(words, [(d0 >> 2, Wy), (dc >> 2, Wc)])
        dall = jnp.concatenate([d0, dc])
        call = jnp.concatenate([clens[0], clens[1],
                                clens[2]]).astype(jnp.int32)
        pos0 = ((dall & 3) * 8).astype(jnp.int32)
        n = d0.shape[0]
        lim = jnp.concatenate([jnp.full((n,), Ly, jnp.int32),
                               jnp.full((2 * n,), Lc, jnp.int32)])
        steps = max(du._scan_steps(Wy, Ly), du._scan_steps(Wc, Lc))
        return du._decode_scan_raw(block, pos0, pos0 + 8 * call, lim, steps)

    chain_ms(scan_only, label="gather + lane scan (raw blocks)")

    # stage 2: entropy unpack (gather + scan + placement, all planes)
    def unpack_only(prev):
        dep = (jnp.uint8(0) if prev is None
               else (prev[0].ravel()[0] & 1).astype(jnp.uint8))
        return du.unpack_hq_lanes(pay.at[-1].set(dep), clens, jnp.int32(0),
                                  0, (Ly, Lc, Lc), wc)

    chain_ms(unpack_only, label="entropy unpack (all planes)")

    # stage 3: the full on-chip decode step
    geo_key = (geo.y_slices, geo.x_slices, *geo.luma_slice,
               *geo.chroma_slice)
    og = PictureGeometry.of(h, w, ColourFormat.CF422)
    out_key = (og.luma_height, og.luma_width, og.chroma_height,
               og.chroma_width)
    pfn = _payload_synthesis_fn(cfg.kernel, cfg.wavelet_depth, geo_key,
                                out_key, bits, True, cfg.slice_prefix, wc)

    def full_step(prev):
        dep = (jnp.uint8(0) if prev is None
               else (prev.ravel()[0] & 1).astype(jnp.uint8))
        return pfn(pay.at[-1].set(dep), clens, jnp.int32(0), qi, qmb)

    ms = chain_ms(full_step, label="full on-chip decode step")
    if ms > 0:
        print(f"=> {1000.0 / ms:.1f} fps/chip (device compute only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
