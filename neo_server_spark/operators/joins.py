"""Join operators beyond plain equi-joins: as-of join, tag-metadata enrich,
range bucketing.

The reference's TQL has NO join operator (registry fx_definitions.go:65-334);
joins live in its SQL engine.  Our SQL layer gets joins from Spark SQL for
free; this module adds the time-series joins a TSDB workload actually needs —
documented as extensions (SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str = "time",
    right_time: str = "time",
    right_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the latest right row
    with ``right.time <= left.time`` within the same ``on`` key.

    Implementation is the union-scan trick, NOT a range cross-join:
    both sides union into one frame tagged by origin, then a single
    ``last_value IGNORE NULLS`` window ordered by (time, origin) propagates
    the most recent right payload onto left rows.  Cost = one shuffle on the
    key + one sort per partition — linear at 100 TB, where a range join would
    explode quadratically.  Equal timestamps: the right row at the same time
    IS visible (inclusive), matching ASOF JOIN semantics.

    ``tolerance`` (same unit as the time columns) drops matches older than
    ``left_time - tolerance``.
    """
    rcols = list(right_cols or [c for c in right.columns if c not in on and c != right_time])
    lcols = [c for c in left.columns]

    lhs = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols if c not in on and c != left_time],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast("long").alias("__rt"),
    )
    rhs = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_time],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(right_time).cast("long").alias("__rt"),
    )
    unioned = lhs.unionByName(rhs)
    # right rows sort BEFORE left rows at equal time → inclusive as-of
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *unioned.columns,
        *[F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}") for c in rcols],
        F.last(F.col("__rt"), ignorenulls=True).over(w).alias("__ft"),
    )
    out = filled.filter(F.col("__is_right") == 0)
    keep_match = F.lit(True) if tolerance is None else (
        F.col("__ft").isNotNull() & ((F.col("__t").cast("long") - F.col("__ft")) <= tolerance)
    )
    proj = [F.col(c) for c in on] + [F.col("__t").alias(left_time)] + [
        F.col(c) for c in lcols if c not in on and c != left_time
    ] + [
        F.when(keep_match, F.col(f"__f_{c}")).alias(c + suffix if c in lcols or c == left_time else c)
        for c in rcols
    ]
    return out.select(*proj)


def enrich_tags(fact: DataFrame, meta: DataFrame, on: str = "name") -> DataFrame:
    """Tag METADATA enrich (spi/testsuite/tables.go:22-36): broadcast-join the
    per-tag dimension onto the fact stream."""
    return fact.join(F.broadcast(meta), on=on, how="left")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join for a dominant hot key (every IoT fleet has a
    hottest tag).  AQE skew-join splitting rebalances oversized partitions at
    runtime, but all rows of ONE key still hash to one reducer when the other
    side is too big to broadcast; salting shards each left key across
    ``salt`` sub-keys (deterministic hash of the whole left row) and
    replicates matching right rows salt-ways — ×salt better shuffle balance
    for a ×salt blow-up of the RIGHT side only.  Result is row-identical to
    the unsalted join (inner/left semantics preserved; pinned by test +
    oracle query).

    SIZING: salt ≈ (hot-key rows / target partition rows), small powers of
    two; oversalting multiplies right-side shuffle volume for nothing.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    lhs = left.withColumn("__salt", lsalt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lhs.join(rhs, [*keys, "__salt"], how).drop("__salt")


def range_bucket_join(left: DataFrame, right_ranges: DataFrame,
                      value_col: str, low_col: str = "low", high_col: str = "high") -> DataFrame:
    """Join rows to [low, high) buckets.  The bucket table is broadcast —
    a non-equi join stays cheap only when one side is tiny."""
    return left.join(
        F.broadcast(right_ranges),
        (F.col(value_col) >= F.col(low_col)) & (F.col(value_col) < F.col(high_col)),
        "left",
    )
