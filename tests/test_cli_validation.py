"""Encoder CLI cross-flag validation matrix parity
(reference EncodeParams.cpp:139-204)."""

import pytest

from vc2tpu.cli.encode_stream import build_parser, config_from_args

BASE = ["in", "out", "-x", "64", "-y", "32", "-f", "4:2:2", "-k", "LeGall",
        "-d", "2", "-u", "1", "-a", "2"]


def _cfg(extra):
    return config_from_args(build_parser().parse_args(BASE + extra))


@pytest.mark.parametrize("extra,msg", [
    (["-m", "HQ_ConstQ", "-q", "20", "-z", "10", "-l", "10"],
     "bitDepth is incompatible"),
    (["-m", "HQ_ConstQ", "-q", "20", "-i", "-p"], "both interlaced and progressive"),
    (["-m", "HQ_ConstQ", "-q", "20", "-p", "-t"], "field parity is incompatible"),
    (["-m", "HQ_ConstQ", "-q", "20", "-t", "-b"], "both top field first and bottom"),
    (["-m", "LD", "-s", "2048", "-S", "2"], "Slice Scalar is only used"),
    (["-m", "LD", "-s", "2048", "-P", "1"], "Slice Prefix is only used"),
    (["-m", "HQ_ConstQ", "-q", "20", "-F", "512"], "Fragment length is only used"),
    (["-m", "HQ_ConstQ", "-q", "20", "-s", "2048"], "Compressed bytes is only used"),
    (["-m", "HQ_CBR", "-s", "2048", "-q", "20"], "Quantisation index is only used"),
    (["-m", "HQ_CBR"], "Compressed bytes must be set"),
    (["-m", "HQ_ConstQ"], "Quantisation index must be set"),
    (["-m", "HQ_ConstQ", "-q", "120"], "range 0 to 119"),
    (["-m", "HQ_CBR", "-s", "0"], "compressed bytes must be >0"),
    # an explicit 0 must reach the range check, not silently become the
    # default (reference EncodeParams.cpp:166-170 isSet() handling)
    (["-m", "HQ_ConstQ", "-q", "20", "-l", "0"], "bit depth must be in range"),
    (["-m", "HQ_ConstQ", "-q", "20", "-z", "0"], "bit depth must be in range"),
    (["-m", "HQ_ConstQ", "-q", "20", "-c", "0"], "bit depth must be in range"),
])
def test_invalid_combinations(extra, msg):
    with pytest.raises(ValueError, match=msg):
        cfg = _cfg(extra)
        cfg.validate()


def test_valid_configs():
    _cfg(["-m", "HQ_ConstQ", "-q", "20"]).validate()
    _cfg(["-m", "HQ_CBR", "-s", "2048", "-S", "2", "-P", "1"]).validate()
    _cfg(["-m", "LD", "-s", "2048", "-F", "512"]).validate()


def test_slice_suggestions_on_geometry_error(capsys):
    """Geometry failure prints the reference's actionable hints
    (EncodeStream.cpp:383-399) before raising."""
    from vc2tpu.pipeline.encoder import slice_geometry

    # 64x32 4:2:2 depth 2: hSlice 3 does not divide the padded widths;
    # the nearest valid value (searched low-first, as the reference) is 2
    cfg = _cfg(["-m", "HQ_ConstQ", "-q", "20", "-a", "3"])
    with pytest.raises(ValueError, match="See above for suggested parameters"):
        slice_geometry(cfg)
    err = capsys.readouterr().err
    assert "Consider setting --hSlice (-a) to 2" in err
    assert "--vSlice (-u) to 1" in err

    # depth too deep for the chroma width: suggest a workable depth too
    deep = config_from_args(build_parser().parse_args(
        ["in", "out", "-x", "16", "-y", "32", "-f", "4:2:2", "-k", "LeGall",
         "-d", "4", "-u", "1", "-a", "1", "-m", "HQ_ConstQ", "-q", "20"]))
    with pytest.raises(ValueError, match="See above for suggested parameters"):
        slice_geometry(deep)
    err = capsys.readouterr().err
    assert "not possible to encode this input with a wavelet depth of 4" in err
    assert "Consider setting --waveletDepth (-d) to" in err
