"""Small formatting/math helpers mirroring the reference's util layer.

Equivalents of ``util/output_helpers.hh`` (indent), ``util/math.hh``
(factorial/binomial/number_of_digits/is_power_of), and
``util/chrono_helpers.hh`` (SI-prefixed duration strings).
"""

from __future__ import annotations

import math


def indent(level: int, width: int = 2) -> str:
    """Indentation prefix (``util/output_helpers.hh:23-50``)."""
    return " " * (level * width)


def factorial(n: int) -> int:
    return math.factorial(n)


def binomial(n: int, k: int) -> int:
    return math.comb(n, k)


def number_of_digits(x: int, base: int = 10) -> int:
    """Digits of x in the given base (``util/math.hh``)."""
    if x == 0:
        return 1
    n = 0
    x = abs(x)
    while x:
        x //= base
        n += 1
    return n


def is_power_of(x: int, base: int) -> bool:
    if x < 1:
        return False
    while x % base == 0:
        x //= base
    return x == 1


_SI = [(1.0, "s"), (1e-3, "ms"), (1e-6, "us"), (1e-9, "ns")]


def duration_str(seconds: float, sep: str = " ") -> str:
    """Human duration like the reference's ``to_string(duration)``: "123 ms"."""
    for scale, unit in _SI:
        if abs(seconds) >= scale or unit == "ns":
            v = seconds / scale
            if abs(v) >= 100:
                return f"{v:.0f}{sep}{unit}"
            return f"{v:.3g}{sep}{unit}"
    return f"{seconds}{sep}s"
