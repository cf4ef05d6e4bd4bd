"""Time scalar functions (reference: mods/tql/fm_time.go).

Convention: the engine's canonical time is epoch-ns LongType (machbase
DATETIME, spi/machsvr/machsvr.go:901-917).  Helpers convert at the edges.
Durations are ns ints; ``parse_duration`` accepts the reference's Go-style
strings ('1s', '500ms', '1h30m', fm_dbsrc.go:946-953).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

NS = 1
US = 1_000
MS = 1_000_000
SECOND = 1_000_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d)")
_DUR_UNITS = {"ns": NS, "us": US, "µs": US, "ms": MS, "s": SECOND, "m": MINUTE, "h": HOUR, "d": DAY}


def parse_duration(s: str | int) -> int:
    """Go-style duration string -> ns ('1h30m', '500ms', '1s')."""
    if isinstance(s, int):
        return s
    total, pos = 0, 0
    for m in _DUR_RE.finditer(s):
        total += int(float(m.group(1)) * _DUR_UNITS[m.group(2)])
        pos = m.end()
    if pos != len(s.strip()):
        raise ValueError(f"bad duration: {s!r}")
    return total


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _div(c: Column, d: int) -> Column:
    """Exact floor-division of an epoch-ns long by a positive literal.

    ``floor(t / d)`` in double arithmetic is WRONG for epoch-ns: |t| > 2^53,
    so the cast to double alone perturbs t by up to ~256 ns and boundary
    timestamps land in the wrong bucket.  Stay integral: ``t - pmod(t, d)``
    is pure long arithmetic, and dividing that exact multiple via decimal
    keeps all 19 digits.
    """
    t = c.cast("long")
    m = t - F.pmod(t, F.lit(d))
    return (m.cast("decimal(38,0)") / F.lit(d)).cast("long")


def to_timestamp_ns(c: Column | str) -> Column:
    """epoch-ns long -> TimestampType (µs precision, for window/calendar ops)."""
    return F.timestamp_micros(_div(_col(c), 1000))


def from_timestamp(c: Column | str) -> Column:
    """TimestampType -> epoch-ns long."""
    return (F.unix_micros(_col(c)) * F.lit(1000)).cast("long")


def round_time(c: Column | str, duration: str | int) -> Column:
    """roundTime(ts, '1s') — floor to duration grid (fm_time.go:246-261)."""
    d = parse_duration(duration)
    t = _col(c).cast("long")
    return (t - F.pmod(t, F.lit(d))).cast("long")


def time_add(c: Column | str, duration: str | int) -> Column:
    """timeAdd(ts, dur) (fm_time.go:270-283)."""
    return (_col(c).cast("long") + F.lit(parse_duration(duration))).cast("long")


def time_unix(c):       return F.floor(_col(c) / F.lit(SECOND)).cast("long")   # noqa: E704
def time_unix_milli(c): return F.floor(_col(c) / F.lit(MS)).cast("long")       # noqa: E704
def time_unix_micro(c): return F.floor(_col(c) / F.lit(US)).cast("long")       # noqa: E704
def time_unix_nano(c):  return _col(c).cast("long")                            # noqa: E704


def str_time(c: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """strTime — format epoch-ns as string (fm_time.go:323-371); UTC."""
    return F.date_format(to_timestamp_ns(c), fmt)


def parse_time(c: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """parseTime(str, fmt) -> epoch-ns (fm_time.go:373-392)."""
    return from_timestamp(F.to_timestamp(_col(c), fmt))


# component extractors (fm_time.go:54-245) over epoch-ns
def time_year(c):    return F.year(to_timestamp_ns(c))        # noqa: E704
def time_month(c):   return F.month(to_timestamp_ns(c))       # noqa: E704
def time_day(c):     return F.dayofmonth(to_timestamp_ns(c))  # noqa: E704
def time_hour(c):    return F.hour(to_timestamp_ns(c))        # noqa: E704
def time_minute(c):  return F.minute(to_timestamp_ns(c))      # noqa: E704
def time_second(c):  return F.second(to_timestamp_ns(c))      # noqa: E704
def time_weekday(c): return F.dayofweek(to_timestamp_ns(c)) - 1  # 0=Sunday like Go  # noqa: E704


def time_range(from_ns: int, duration: str | int, period: str | int | None = None):
    """range(ts, dur[, period]) (fm_time.go:23-52) — window alignment params
    for timewindow(); returns (from, until, period_ns)."""
    d = parse_duration(duration)
    p = parse_duration(period) if period is not None else d
    return from_ns, from_ns + d, p
