"""Math scalar functions (SURVEY §2.5) — the Go math.* registry entries that
lack a 1:1 Spark builtin.

The reference registers Go `math.*` via `mathWrap` (fx_definitions.go:79-105,
wrappers 336-396).  Most map directly onto `pyspark.sql.functions` (abs, the
trig family, ceil/floor/round, exp/log/log2/log10, pow, sqrt) and need no
wrapper; this module covers the gap set:

- exp2 / pow10   (fx_definitions.go:88,97) — no Spark builtin
- trunc           (fx_definitions.go:104) — Spark's ``trunc`` is date-only;
                  Go ``math.Trunc`` rounds toward zero and returns float
- mod             (fx_definitions.go:94) — Go ``math.Mod`` keeps the sign of
                  the dividend (C fmod); Spark's ``%`` on doubles matches
- remainder       (fx_definitions.go:99) — IEEE 754 remainder: quotient
                  rounded half-to-even (``rint``), NOT truncated
- min / max 2-arg (fm_monad.go:848-878) — scalar forms usable outside GROUP

All are thin Column expressions — JVM-side, codegen-friendly, no UDFs.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exp2(c: Column | str) -> Column:
    """Go math.Exp2: 2**x."""
    return F.pow(F.lit(2.0), _col(c))


def pow10(c: Column | str) -> Column:
    """Go math.Pow10(n): 10**n (reference takes an int, mathWrapInt)."""
    return F.pow(F.lit(10.0), _col(c).cast("double"))


def trunc(c: Column | str) -> Column:
    """Go math.Trunc: round toward zero, result stays floating point."""
    x = _col(c)
    return F.signum(x) * F.floor(F.abs(x))


def mod(x: Column | str, y: Column | str | float) -> Column:
    """Go math.Mod: C fmod — result takes the sign of the dividend.
    Spark's ``%`` on doubles already has these semantics (Java ``%``)."""
    y = F.lit(y) if isinstance(y, (int, float)) else _col(y)
    return _col(x) % y


def remainder(x: Column | str, y: Column | str | float) -> Column:
    """Go math.Remainder: IEEE 754 remainder, x - y*round_even(x/y).
    ``bround`` is Spark's HALF_EVEN rounding — exactly the IEEE quotient
    rule.  Differs from mod() by up to y/2 in magnitude and can be negative
    for positive x."""
    xc = _col(x)
    y = F.lit(y) if isinstance(y, (int, float)) else _col(y)
    return xc - y * F.bround(xc / y, 0)


def min2(a: Column | str, b: Column | str | float) -> Column:
    """2-arg scalar min outside GROUP (fm_monad.go:848-862)."""
    b = F.lit(b) if isinstance(b, (int, float)) else _col(b)
    return F.least(_col(a), b)


def max2(a: Column | str, b: Column | str | float) -> Column:
    """2-arg scalar max outside GROUP (fm_monad.go:864-878)."""
    b = F.lit(b) if isinstance(b, (int, float)) else _col(b)
    return F.greatest(_col(a), b)
