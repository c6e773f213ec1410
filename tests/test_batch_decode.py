"""Batched decode dispatch produces byte-identical output to per-frame."""

import io
import pathlib

from vc2tpu.cli.decode_stream import Decoder

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"


def _decode(stream: bytes, batch: int) -> bytes:
    sink = io.BytesIO()
    dec = Decoder(sink=sink)
    dec._batch_size = batch
    assert dec.run(stream) == 0
    return sink.getvalue()


def test_batched_equals_single():
    stream = (GOLDEN / "constq_legall_d2.vc2").read_bytes()
    ref = (GOLDEN / "constq_legall_d2.dec.16p2").read_bytes()
    assert _decode(stream, 1) == ref
    assert _decode(stream, 3) == ref     # partial final batch exercises pad
    assert _decode(stream, 2) == ref
