"""Stage-level device timing of the on-chip HQ entropy pack (real TPU).

The bench's device_cbr_encode_step_ms (analyse + pack) is dominated by the
pack at 1080p (r4: step 30.7 ms vs analyse 5.7 ms), so this breaks
vlc/device_pack.pack_hq_core into cumulative stages, each timed with the
fori_loop slope method (bench.chain_ms — per-call chains measure tunnel
dispatch, not device time):

  1. codes: signed_codes + bits_used + component byte math (sizing)
  2. local: + per-slice one-hot word assembly (incl. header bytes)
  3. full:  + global byte gather (pack_hq_core as shipped)

Stage boundaries compile as separate XLA programs, so fusion across a cut
is lost — treat deltas as attribution, not exact costs.

Usage: python scripts/profile_pack.py [--h 2160 --w 3840] [--cpu]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from bench import chain_ms, synth_frames
    from vc2tpu.core.config import (ColourFormat, EncoderConfig, FrameRate,
                                    Mode, WaveletKernel)
    from vc2tpu.core.picture import Picture
    from vc2tpu.pipeline.encoder import Encoder
    from vc2tpu.vlc import device_pack as dp

    h, w, bits = args.h, args.w, 10
    cfg = EncoderConfig(height=h, width=w, chroma_format=ColourFormat.CF422,
                        kernel=WaveletKernel.LeGall, wavelet_depth=2,
                        y_size=2, x_size=2, mode=Mode.HQ_CBR,
                        luma_depth=bits, chroma_depth=bits,
                        frame_rate=FrameRate.FR50,
                        compressed_bytes=(h * w) // 2500 * 1000,
                        slice_scalar=2)
    enc = Encoder(cfg)
    offset = 1 << (bits - 1)
    (y, c1, c2), = synth_frames(1, h, w, bits, seed=7)
    pic = Picture(y.astype(np.int32) - offset, c1 - offset, c2 - offset,
                  ColourFormat.CF422)
    enc.encode_picture(pic)                      # warm-up + route commit
    buf0, packed10 = enc._put_planes(pic)
    budgets = jnp.asarray(enc.slice_budgets.ravel())
    r = enc._analyse(buf0, budgets, packed10=packed10)
    qy, qu, qv = (jnp.asarray(r[k]) for k in ("qy", "qu", "qv"))
    q_idx = jnp.asarray(r["q_indices"])
    n = qy.shape[0]
    kw = dict(prefix=cfg.slice_prefix, scalar=cfg.slice_scalar,
              w32=enc._w32, cap_bytes=enc._cap, cbr=True)
    print(f"{w}x{h}: n={n} lanes={qy.shape[1]}+{qu.shape[1]}+{qv.shape[1]} "
          f"w32={enc._w32} cap={enc._cap}")

    def stage_codes(qy, qu, qv, q_idx, sizes, *, prefix, scalar, w32,
                    cap_bytes, cbr):
        comp_scaled = []
        out = jnp.uint32(0)
        for vals in (qy, qu, qv):
            vals = vals.astype(jnp.int32)
            code, nb, ovf = dp.signed_codes(vals)
            used = dp.bits_used(vals, nb)
            comp_scaled.append(((used + 7) // 8 + scalar - 1) // scalar)
            out = out + jnp.sum(code & 1) + jnp.sum(nb).astype(jnp.uint32)
        yb = comp_scaled[0] * scalar
        ub = comp_scaled[1] * scalar
        vb = sizes.astype(jnp.int32) - 4 - yb - ub
        totals = prefix + 4 + yb + ub + vb
        return out + jnp.sum(totals).astype(jnp.uint32)

    def stage_local(qy, qu, qv, q_idx, sizes, *, prefix, scalar, w32,
                    cap_bytes, cbr):
        comp_codes, comp_scaled = [], []
        for vals in (qy, qu, qv):
            vals = vals.astype(jnp.int32)
            code, nb, _ = dp.signed_codes(vals)
            used = dp.bits_used(vals, nb)
            comp_scaled.append(((used + 7) // 8 + scalar - 1) // scalar)
            comp_codes.append((code, nb))
        yb = comp_scaled[0] * scalar
        ub = comp_scaled[1] * scalar
        vb = sizes.astype(jnp.int32) - 4 - yb - ub
        local = jnp.zeros((n, w32), jnp.uint32)
        dstarts = (prefix + 2 + jnp.zeros_like(yb),
                   prefix + 3 + yb,
                   prefix + 4 + yb + ub)
        for c, cb in enumerate((yb, ub, vb)):
            code, keep, off = dp._component(*comp_codes[c], dstarts[c], cb)
            w0, p0, p1 = dp._parts(code, keep, off)
            local = dp._accumulate(local, w0, p0, p1, w32)
        return local

    stages = [
        ("codes+sizing", jax.jit(functools.partial(stage_codes, **kw))),
        ("+local assembly", jax.jit(functools.partial(stage_local, **kw))),
        ("full pack", jax.jit(functools.partial(dp.pack_hq_core, **kw))),
    ]
    lo, hi = (4, 16) if h > 1200 else (8, 32)
    for label, fn in stages:
        def call(prev, fn=fn):
            dep = (jnp.int32(0) if prev is None
                   else (jax.tree_util.tree_leaves(prev)[0].ravel()[-1] & 1
                         ).astype(jnp.int32))
            return fn(qy + dep, qu, qv, q_idx, budgets)

        chain_ms(call, n_lo=lo, n_hi=hi, label=label)


if __name__ == "__main__":
    main()
