"""Golden-stream conformance: byte-exact parity with the reference binaries.

Fixtures are produced by tests/make_golden.py from compiled
bbc/vc2-reference binaries. Every case asserts BOTH directions:
encode -> identical stream bytes; decode(reference stream) -> identical
planar output bytes.
"""

import io
import json
import os

import numpy as np
import pytest

from vc2tpu.cli import decode_stream, encode_stream
from vc2tpu.core.config import DecOutput

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
META = json.load(open(os.path.join(GOLDEN, "meta.json")))
CASES = [tuple(c) for c in META["cases"]]


def _encode_args(case, inp, extra):
    m = META["inputs"][inp]
    argv = ["-x", str(m["width"]), "-y", str(m["height"]), "-f", m["fmt"],
            "-l", str(m["depth"]), "-n", "2"] + list(extra)
    return argv


def _run_encode(argv, src, out):
    args = encode_stream.build_parser().parse_args(argv + [src, out])
    assert encode_stream.run(args) == 0


def _skip_ld_without_native(case):
    """The LD profile's DC-prediction recurrence runs only in the native
    host codec (vc2tpu/_native); without it LD paths are unavailable."""
    if case.startswith("ld_"):
        from vc2tpu._native.bridge import native

        if native is None:
            pytest.skip("LD profile requires the native host codec")


@pytest.mark.parametrize("case,inp,extra", CASES,
                         ids=[c[0] for c in CASES])
def test_encode_stream_byte_identical(case, inp, extra, tmp_path):
    _skip_ld_without_native(case)
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "out.vc2")
    _run_encode(_encode_args(case, inp, extra), src, out)
    ref = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
    mine = open(out, "rb").read()
    assert mine == ref


@pytest.mark.parametrize("route", ["device", "host"])
@pytest.mark.parametrize("case,inp,extra", CASES,
                         ids=[c[0] for c in CASES])
def test_decode_stream_bit_exact(case, inp, extra, route, tmp_path):
    """Both synthesis routes (device tail and native host tail) must be
    bit-exact vs the reference DecodeStream output."""
    if route == "host":
        from vc2tpu.pipeline import host_synth

        if not host_synth.available():
            pytest.skip("native host codec unavailable")
    _skip_ld_without_native(case)
    data = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
    sink = io.BytesIO()
    dec = decode_stream.Decoder(output=DecOutput.DECODED, sink=sink,
                                route=route)
    assert dec.run(data) == 0
    ref = open(os.path.join(GOLDEN, f"{case}.dec.16p2"), "rb").read()
    assert sink.getvalue() == ref


def test_ld_interlaced_reference_defect():
    """The reference cannot decode its own LD interlaced output anywhere:
    DecodeStream halves the preamble-derived byte count a second time
    (DecodeStream.cpp:312 + :335 vs EncodeStream.cpp:377+413) and desyncs;
    the encoder's in-process Decoded/PSNR tap inverse-quantises LD without
    the DC prediction the encode applied (EncodeStream.cpp:544 vs :651).
    Our decoder deviates deliberately (no second halving, predictive
    inverse); the golden .dec fixture is our own output (regression pin,
    see tests/make_golden.py REF_DECODE_DEFECTS). This test sanity-checks
    that pin against the SOURCE: the reconstruction error must be at
    LD-coding-loss scale, not desync-garbage scale (the broken reference
    tap measures ~1600x worse on this stream)."""
    import numpy as np

    got = open(os.path.join(GOLDEN, "ld_interlaced.dec.16p2"), "rb").read()
    src = open(os.path.join(GOLDEN, "tiny422.16p2"), "rb").read()
    assert len(got) == len(src)
    g = np.frombuffer(got, ">u2").astype(np.int64)
    s = np.frombuffer(src, ">u2").astype(np.int64)
    mse = float(((g - s) ** 2).mean())
    assert mse < 500_000, f"LD interlaced decode looks broken (MSE {mse})"

    refbin = "/tmp/refbuild/bin/DecodeStream"
    if os.path.exists(refbin):        # document the defect against the live binary
        import subprocess

        r = subprocess.run([refbin, os.path.join(GOLDEN, "ld_interlaced.vc2"),
                            os.devnull], capture_output=True, text=True)
        assert r.returncode != 0 and "parse_info" in (r.stdout + r.stderr)


@pytest.mark.parametrize("case,tap", [tuple(t) for t in META["taps"]],
                         ids=[f"{c}-{t}" for c, t in META["taps"]])
def test_encoder_tap_outputs(case, tap, tmp_path):
    _skip_ld_without_native(case)
    inp = next(i for c, i, _ in CASES if c == case)
    extra = next(e for c, _, e in CASES if c == case)
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "tap.raw")
    _run_encode(_encode_args(case, inp, extra) + ["-o", tap], src, out)
    ref = open(os.path.join(GOLDEN, f"{case}.{tap.lower()}.raw"), "rb").read()
    assert open(out, "rb").read() == ref


@pytest.mark.parametrize("mesh", ["1x8", "2x4"])
def test_encode_mesh_cli_byte_identical(mesh, tmp_path):
    """--mesh DxS (full sharded pipeline behind the CLI) must produce the
    same bytes as the reference encoder."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    for name in ("cbr_legall_d2", "constq_legall_d2"):
        case, inp, extra = next(c for c in CASES if c[0] == name)
        src = os.path.join(GOLDEN, f"{inp}.16p2")
        out = str(tmp_path / f"{name}.vc2")
        _run_encode(_encode_args(case, inp, extra) + ["--mesh", mesh],
                    src, out)
        ref = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
        assert open(out, "rb").read() == ref, name


@pytest.mark.skipif(not os.environ.get("VC2TPU_SLOW"),
                    reason="compile-heavy LD mesh permutation (~90 s); the "
                           "sharded analysis DWT itself is default-tier "
                           "covered by test_shard.py — set VC2TPU_SLOW=1")
def test_encode_mesh_ld_byte_identical(tmp_path):
    """--mesh on an LD encode (row-band sharded analysis DWT, host rate
    control) must still produce the reference's bytes."""
    import jax

    _skip_ld_without_native("ld_")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    case, inp, extra = next(c for c in CASES if c[0] == "ld_legall_d2")
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "out.vc2")
    _run_encode(_encode_args(case, inp, extra) + ["--mesh", "1x8"], src, out)
    ref = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
    assert open(out, "rb").read() == ref


@pytest.mark.parametrize("host_case", ["ld_legall_d2", "constq_legall_d2",
                                       "constq_fidelity_d1",
                                       "constq_extreme_fidelity"])
def test_encode_host_route_byte_identical(host_case, tmp_path, monkeypatch):
    """The encoders' host-route analysis paths (native forward DWT + native
    quantise/pack) must produce the same stream bytes as the reference
    binary — LD and HQ ConstQ."""
    from vc2tpu.pipeline import host_synth

    if not host_synth.available():
        pytest.skip("native host codec unavailable")
    monkeypatch.setenv("VC2TPU_ENCODE_ROUTE", "host")
    case, inp, extra = next(c for c in CASES if c[0] == host_case)
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "out.vc2")
    _run_encode(_encode_args(case, inp, extra), src, out)
    ref = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
    assert open(out, "rb").read() == ref


@pytest.mark.parametrize("dev_case", ["ld_legall_d2", "ld_midsize",
                                      "ld_fragmented", "ld_interlaced"])
def test_encode_ld_device_route_byte_identical(dev_case, tmp_path,
                                               monkeypatch):
    """The LD encoder's full on-chip route (device DWT + wavefront rate
    control rdo/ld.py + device entropy pack) must produce the same stream
    bytes as the reference binary."""
    _skip_ld_without_native("ld_")
    monkeypatch.setenv("VC2TPU_ENCODE_ROUTE", "device")
    case, inp, extra = next(c for c in CASES if c[0] == dev_case)
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "out.vc2")
    _run_encode(_encode_args(case, inp, extra), src, out)
    ref = open(os.path.join(GOLDEN, f"{case}.vc2"), "rb").read()
    assert open(out, "rb").read() == ref


def test_encoder_psnr_self_check(tmp_path):
    """DECODED tap: in-process decode of our own encode round-trips through
    the same clip/interleave path the reference uses (EncodeStream.cpp:649-767)."""
    case, inp, extra = CASES[0]
    src = os.path.join(GOLDEN, f"{inp}.16p2")
    out = str(tmp_path / "dec.16p2")
    _run_encode(_encode_args(case, inp, extra) + ["-o", "Decoded"], src, out)
    # our Decoded tap must equal DecodeStream's output on our own stream
    ref = open(os.path.join(GOLDEN, f"{case}.dec.16p2"), "rb").read()
    assert open(out, "rb").read() == ref
