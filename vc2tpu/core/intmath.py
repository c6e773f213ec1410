"""Exact C-integer arithmetic helpers.

The whole VC-2 codec is exact 32-bit integer math; bit-exactness against the
reference binaries requires reproducing C semantics precisely:

* ``/`` on ints truncates toward zero (JAX/NumPy ``//`` floors),
* ``>>`` on negative ints is an arithmetic shift (JAX matches),
* intermediate products may wrap around int32 (the reference relies on x86
  two's-complement wrap-around, e.g. ``value *= quant_factor(q)`` in
  ``scale()`` — /root/reference/src/Library/src/Quantisation.cpp:89).

These helpers work on either ``jax.numpy`` or ``numpy`` arrays (both expose
the same ufunc surface used here).
"""

from __future__ import annotations


def _np_of(x):
    import numpy as _np

    if type(x).__module__.startswith("jax") or "jax" in type(x).__module__:
        import jax.numpy as _jnp

        return _jnp
    return _np


def wrap32(x):
    """Wrap an int64 (or wider) value into int32 two's-complement range."""
    return ((x + (1 << 31)) % (1 << 32)) - (1 << 31)


def trunc_div(a, b):
    """C-style truncating integer division (round toward zero).

    Works element-wise on arrays. b must be nonzero.
    """
    xp = _np_of(a)
    q = xp.abs(a) // xp.abs(b)
    return xp.where((a < 0) ^ (b < 0), -q, q)


def c_pow(base: int, exp: int) -> int:
    """utils::pow — integer power (reference src/Library/src/Utils.cpp:33)."""
    value = 1
    for _ in range(max(exp, 0)):
        value *= base
    return value


def intlog2(value: int) -> int:
    """Bits needed to express ``value`` (reference src/Library/src/Utils.cpp:40).

    intlog2(1) == 0; intlog2(2) == 1; intlog2(3) == 2 ...
    """
    log = 0
    value -= 1
    while value > 0:
        value >>= 1
        log += 1
    return log


def gcd(a: int, b: int) -> int:
    a, b = abs(a), abs(b)
    while b:
        a, b = b, a % b
    return a


def rationalise(numerator: int, denominator: int):
    """Reduce a fraction to simplest form (reference src/Library/src/Utils.cpp:65)."""
    g = gcd(numerator, denominator)
    if g == 0:
        return numerator, denominator
    return numerator // g, denominator // g


def picture_number(field_number: int, frame_number: int, fields_per_frame: int) -> int:
    """Picture number with wrap at 2^32 (reference src/Library/src/Utils.cpp:52)."""
    if field_number < 0:
        raise ValueError("field number should be positive")
    if field_number > fields_per_frame:
        raise ValueError("field number exceeds number of fields per frame")
    if fields_per_frame not in (1, 2):
        raise ValueError("number of fields per frame should be 1 or 2")
    return (field_number + frame_number * fields_per_frame) % (1 << 32)
