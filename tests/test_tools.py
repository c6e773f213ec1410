"""Tools: 16p2 converters round-trip; stream debugger walks golden streams."""

import pathlib
import subprocess
import sys

import numpy as np

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"
GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

sys.path.insert(0, str(TOOLS))

import convert_from_16p2
import convert_to_16p2


def test_16p2_roundtrip_10bit():
    rng = np.random.default_rng(3)
    yuv = rng.integers(0, 1 << 10, 4096, dtype=np.uint16).astype("<u2").tobytes()
    p2 = convert_to_16p2.convert(yuv, 10)
    # MSB-justified big-endian
    v = np.frombuffer(p2, dtype=">u2")
    assert np.array_equal(v >> 6, np.frombuffer(yuv, dtype="<u2"))
    back = convert_from_16p2.convert(p2, 10)
    assert back == yuv


def test_16p2_roundtrip_8bit():
    rng = np.random.default_rng(4)
    yuv = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    p2 = convert_to_16p2.convert(yuv, 8)
    assert len(p2) == 2 * len(yuv)
    assert convert_from_16p2.convert(p2, 8) == yuv


def test_streamdebugger_runs_on_golden():
    out = subprocess.run(
        [sys.executable, str(TOOLS / "vc2streamdebugger.py"),
         str(GOLDEN / "constq_legall_d2.vc2")],
        capture_output=True, text=True, check=True)
    assert "High Quality Picture" in out.stdout
    assert "Sequence Header" in out.stdout
    assert "Error" not in out.stdout
    assert "GARBAGE" not in out.stdout


def test_streamdebugger_fragments():
    out = subprocess.run(
        [sys.executable, str(TOOLS / "vc2streamdebugger.py"),
         str(GOLDEN / "cbr_fragmented.vc2")],
        capture_output=True, text=True, check=True)
    assert "High Quality Fragment" in out.stdout
    assert "slice offset" in out.stdout
