"""DecodeFrame CLI: headerless slice payloads decode to the same pixels as
the full stream decoder (golden PACKAGED tap + golden decoded output)."""

import pathlib

from vc2tpu.cli import decode_frame

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

ARGS = ["-m", "HQ", "-x", "64", "-y", "32", "-f", "4:2:2", "-l", "10",
        "-n", "2", "-k", "LeGall", "-d", "2", "-u", "1", "-a", "2"]


def test_decode_frame_matches_stream_decode(tmp_path):
    out = tmp_path / "df.16p2"
    rc = decode_frame.main(
        ARGS + [str(GOLDEN / "constq_legall_d2.packaged.raw"), str(out)])
    assert rc == 0
    assert out.read_bytes() == (GOLDEN / "constq_legall_d2.dec.16p2").read_bytes()


def test_decode_frame_quantised_tap(tmp_path):
    out = tmp_path / "df.quant.raw"
    rc = decode_frame.main(
        ARGS + ["-o", "Quantised",
                str(GOLDEN / "constq_legall_d2.packaged.raw"), str(out)])
    assert rc == 0
    assert out.read_bytes() == (
        GOLDEN / "constq_legall_d2.quantised.raw").read_bytes()


def test_decode_frame_truncated_input_errors(tmp_path):
    data = (GOLDEN / "constq_legall_d2.packaged.raw").read_bytes()[:40]
    src = tmp_path / "short.raw"
    src.write_bytes(data)
    out = tmp_path / "out.16p2"
    rc = decode_frame.main(ARGS + [str(src), str(out)])
    assert rc == 1


def test_decode_frame_ld_requires_compressed_bytes(tmp_path):
    """LD mode with the default/zero -s used to loop forever on zero-size
    slices (end == start); it must error out instead."""
    src = tmp_path / "in.raw"
    src.write_bytes(b"\x00" * 256)
    out = tmp_path / "out.16p2"
    ld_args = ["-m", "LD", "-x", "64", "-y", "32", "-f", "4:2:2", "-l", "10",
               "-n", "2", "-k", "LeGall", "-d", "2", "-u", "1", "-a", "2"]
    rc = decode_frame.main(ld_args + [str(src), str(out)])
    assert rc == 1
