"""vc2tpu — a TPU-native SMPTE ST 2042-1 "VC-2" video codec framework.

A from-scratch re-design of the capabilities of bbc/vc2-reference for TPU:

* the compute path (wavelet lifting transforms, dead-zone quantisation,
  rate-distortion search, exp-Golomb bit-length/bit-pattern generation) is
  pure-functional JAX batched over the picture's slice grid, with Pallas
  kernels for the hot lifting passes;
* the host path (bitstream bytes, stream syntax, file I/O) is NumPy plus a
  small C++ entropy packer/unpacker (``vc2tpu/_native``);
* multi-chip scale-out shards the slice grid / frame batch over a
  ``jax.sharding.Mesh`` with halo-exchange collectives for the DWT
  (``vc2tpu/shard``).

Decoded output is bit-exact against the reference ``DecodeStream`` and
encoded streams are byte-identical to ``EncodeStream`` for matching
parameters (see tests/golden).
"""

import os as _os

import jax as _jax

# The codec is exact integer arithmetic; the CBR hill-climb compares 64-bit
# sums of squared errors (reference EncodeStream.cpp:107-120 accumulates in
# long long), so 64-bit types must be real. Hot arrays are explicitly int32.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: one geometry compiles once per machine,
# not once per CLI invocation.
if not _os.environ.get("VC2TPU_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "vc2tpu-jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from vc2tpu.core.config import (  # noqa: F401
    WaveletKernel,
    ColourFormat,
    Profile,
    FrameRate,
    PixelAspectRatio,
    ColorSpec,
    EncoderConfig,
    DecoderConfig,
)

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (keeps bare import light)
    if name == "Encoder":
        from vc2tpu.pipeline.encoder import Encoder
        return Encoder
    if name == "LDEncoder":
        from vc2tpu.pipeline.ld import LDEncoder
        return LDEncoder
    if name == "Decoder":
        from vc2tpu.cli.decode_stream import Decoder
        return Decoder
    raise AttributeError(name)
