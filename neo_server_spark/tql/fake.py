"""FAKE(...) synthetic data generators (reference: mods/tql/fm_fake.go:29-57
dispatch; linspace 324, meshgrid 350, arrange 281, once 265, sphere 397,
oscillator 438-519, csv/json literals 175-263).

All generators are ``spark.range``-based: data is born distributed, no driver
materialization — a FAKE(oscillator) of a billion samples is as partitionable
as a parquet scan.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def linspace(spark: SparkSession, start: float, stop: float, num: int = 50) -> DataFrame:
    """linspace(min, max, count) — evenly spaced samples (fm_fake.go:324-348;
    nums.go:75-91: num<=0 is EMPTY, num==1 is [start], the final element is
    exactly ``stop``)."""
    if num <= 0:
        return spark.range(0).select(F.col("id").cast("double").alias("x"))
    if num == 1:
        return spark.range(1).select(F.lit(float(start)).alias("x"))
    step = (stop - start) / (num - 1)
    return spark.range(num).select(
        F.when(F.col("id") == num - 1, F.lit(float(stop)))
        .otherwise(F.lit(start) + F.col("id") * F.lit(step)).alias("x"))


def arrange(spark: SparkSession, start: float, stop: float, step: float) -> DataFrame:
    """arrange(start, stop, step) — half-open range grid (fm_fake.go:281-322)."""
    n = max(int(math.floor((stop - start) / step)) + 1, 0)
    return spark.range(n).select((F.lit(start) + F.col("id") * F.lit(step)).alias("x"))


def once(spark: SparkSession, value) -> DataFrame:
    """once(v) — a single record (fm_fake.go:265-279)."""
    return spark.range(1).select(F.lit(value).alias("x"))


def meshgrid(spark: SparkSession, xs: Sequence[float], ys: Sequence[float]) -> DataFrame:
    """meshgrid(xs, ys) — cartesian grid via crossJoin (fm_fake.go:350-395)."""
    xdf = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    ydf = spark.createDataFrame([(float(y),) for y in ys], ["y"])
    return xdf.crossJoin(ydf)


def sphere(spark: SparkSession, lat_steps: int = 18, lon_steps: int = 36) -> DataFrame:
    """sphere() — unit-sphere surface grid (fm_fake.go:397-436)."""
    lat = spark.range(lat_steps).select((F.col("id") * (math.pi / lat_steps)).alias("theta"))
    lon = spark.range(lon_steps).select((F.col("id") * (2 * math.pi / lon_steps)).alias("phi"))
    return lat.crossJoin(lon).select(
        (F.sin("theta") * F.cos("phi")).alias("x"),
        (F.sin("theta") * F.sin("phi")).alias("y"),
        F.cos("theta").alias("z"),
    )


def oscillator(
    spark: SparkSession,
    components: Sequence[tuple[float, float]],
    from_ns: int,
    until_ns: int,
    period_ns: int,
) -> DataFrame:
    """oscillator(freq(hz, amp)..., range(from, dur, period)) — sum of
    sinusoids sampled on a fixed time grid (fm_fake.go:438-519):
    value(t) = Σ amp·sin(2π·hz·t_sec).  Columns: (time epoch-ns, value)."""
    n = max((until_ns - from_ns) // period_ns, 0)
    t = (F.lit(from_ns) + F.col("id") * F.lit(period_ns)).cast("long")
    tsec = t.cast("double") / F.lit(1e9)
    value = F.lit(0.0)
    for hz, amp in components:
        value = value + F.lit(amp) * F.sin(F.lit(2.0 * math.pi * hz) * tsec)
    return spark.range(n).select(t.alias("time"), value.alias("value"))


def random_walk(spark: SparkSession, n: int, seed: int = 42, scale: float = 1.0) -> DataFrame:
    """random() generator — seeded, reproducible uniform noise (nums/fakegen.go).
    Deterministic across runs/partitions: value derives from xxhash64(id)."""
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)).cast("double")
         / F.lit(1_000_000.0))
    return spark.range(n).select(F.col("id").alias("i"), (u * scale).alias("x"))


def simplex_noise(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Seeded smooth noise series: EXACT OpenSimplex (fm_fake.go:521-538,
    algorithm mods/nums/opensimplex) sampled at x = i/10 — Eval2(x, x),
    the reference's 1-coordinate simplex() contract."""
    from neo_server_spark.functions import noisefn

    noise = noisefn.simplex_udf(seed, 1)
    return spark.range(n).select(
        F.col("id").alias("i"),
        noise((F.col("id") / F.lit(10.0)).cast("double")).alias("x"))


def from_csv_literal(spark: SparkSession, text: str, columns: Sequence[str] | None = None) -> DataFrame:
    """FAKE(csv("...")) literal rows (fm_fake.go:175-263)."""
    import csv as _csv
    import io as _io

    rows = list(_csv.reader(_io.StringIO(text.strip())))
    cols = list(columns) if columns else [f"column{i}" for i in range(len(rows[0]))]
    return spark.createDataFrame(rows, cols)


def from_json_literal(spark: SparkSession, text: str, columns: Sequence[str] | None = None) -> DataFrame:
    """FAKE(json({...})) literal rows — one JSON array per record."""
    import json as _json

    rows = [tuple(r) for r in _json.loads(text)]
    cols = list(columns) if columns else [f"column{i}" for i in range(len(rows[0]))]
    return spark.createDataFrame(rows, cols)
