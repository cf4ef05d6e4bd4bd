"""Stateful streaming operators — per-series state across micro-batches.

The reference's stream processing keeps per-pipeline operator state alive for
the life of a subscriber (mods/scheduler/sched_subs.go runs one TQL task per
message stream; MAP_LOWPASS's x̂ accumulator in fm_monad.go:2081-2107 simply
persists in the goroutine).  Structured Streaming's equivalent is
``applyInPandasWithState``: state lives in the state store, keyed by series,
and survives micro-batch boundaries (and restarts, via checkpointing).

Batch-mode kernels for the same operators live in operators/series.py; these
are the continuous-ingest versions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_lowpass(
    stream: DataFrame,
    alpha: float,
    series: Sequence[str] = ("name",),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """MAP_LOWPASS over a stream: x̂ ← (1-α)·x̂ + α·v per series, with the
    accumulator carried across micro-batches in the state store.

    Output schema: series + (time, value, lowpass).  Rows within a batch are
    processed in ``time_col`` order; state is one double per series — O(tags)
    state total, no growth over time.
    """
    skey = list(series)
    out_schema = StructType(
        [StructField(c, StringType()) for c in skey]
        + [
            StructField(time_col, LongType()),
            StructField(value_col, DoubleType()),
            StructField("lowpass", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("xhat", DoubleType())])

    def fn(key, pdfs, state):
        import pandas as pd

        xhat = state.get[0] if state.exists else None
        rows_t, rows_v, rows_l = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for t, v in zip(pdf[time_col], pdf[value_col]):
                xhat = float(v) if xhat is None else (1.0 - alpha) * xhat + alpha * float(v)
                rows_t.append(int(t))
                rows_v.append(float(v))
                rows_l.append(xhat)
        if xhat is not None:
            state.update((xhat,))
        out = pd.DataFrame({time_col: rows_t, value_col: rows_v, "lowpass": rows_l})
        for i, c in enumerate(skey):
            out.insert(i, c, key[i])
        yield out

    return stream.groupBy(*skey).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_timewindow(
    stream: DataFrame,
    period: str = "1 hour",
    watermark: str = "10 minutes",
    series: Sequence[str] = ("name",),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming tumbling-window aggregation with late-data handling.

    The reference has NO watermark concept — records outside [from, until)
    are dropped (fm_monad.go:426-435) and out-of-order data is only seen on
    rollup recompute.  Structured Streaming's watermark is the principled
    version: rows later than ``watermark`` behind the max seen event time
    are dropped, everything else updates its (still-open) window.

    The epoch-ns long converts to a µs timestamp for window bookkeeping;
    output keeps window bounds as epoch-ns longs.
    """
    from neo_server_spark.functions.timefn import from_timestamp, to_timestamp_ns

    with_ts = stream.withColumn("__ts", to_timestamp_ns(F.col(time_col)))
    agged = (
        with_ts.withWatermark("__ts", watermark)
        .groupBy(*series, F.window("__ts", period).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    return agged.select(
        *series,
        from_timestamp(F.col("__w.start")).alias("window_start"),
        from_timestamp(F.col("__w.end")).alias("window_end"),
        "cnt", "sum_value", "min_value", "max_value",
    )


def streaming_timewindow_fill(
    stream: DataFrame,
    period_ns: int,
    series: Sequence[str] = ("name",),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming timewindow with GAP FILL across micro-batches (SURVEY risk
    item (d): batch gap-fill is a calendar join, but a stream must remember
    the last value per series to fill empty buckets it only discovers
    later).

    Per series, state = (next bucket to close, last seen value).  A bucket
    closes once a later bucket's data arrives; empty buckets in between
    emit with the previous value (predict('PiecewiseConstant')) and
    cnt = 0.  O(1) state per series; output is in bucket order per series
    across batches.
    """
    skey = list(series)
    out_schema = StructType(
        [StructField(c, StringType()) for c in skey]
        + [
            StructField(time_col, LongType()),
            StructField("cnt", LongType()),
            StructField("avg_value", DoubleType()),
        ]
    )
    state_schema = StructType([
        StructField("next_bucket", LongType()),
        StructField("last_value", DoubleType()),
        StructField("open_sum", DoubleType()),
        StructField("open_cnt", LongType()),
    ])

    def fn(key, pdfs, state):
        import pandas as pd

        next_bucket, last_value, open_sum, open_cnt = (
            state.get if state.exists else (None, None, 0.0, 0)
        )
        bsum: dict[int, float] = {}
        bcnt: dict[int, int] = {}
        for pdf in pdfs:
            for t, v in zip(pdf[time_col], pdf[value_col]):
                b = int(t) - int(t) % period_ns
                if next_bucket is not None and b < next_bucket:
                    continue  # behind the closed frontier: late row drops
                bsum[b] = bsum.get(b, 0.0) + float(v)
                bcnt[b] = bcnt.get(b, 0) + 1
        out_t, out_c, out_v = [], [], []
        if bsum:
            if next_bucket is None:
                next_bucket = min(bsum)
            # fold the carried open-bucket partial into this batch's view
            if open_cnt:
                bsum[next_bucket] = bsum.get(next_bucket, 0.0) + open_sum
                bcnt[next_bucket] = bcnt.get(next_bucket, 0) + open_cnt
            high = max(bsum)             # the max bucket stays open
            while next_bucket < high:
                c = bcnt.get(next_bucket, 0)
                if c:
                    last_value = bsum[next_bucket] / c
                out_t.append(next_bucket); out_c.append(c)
                out_v.append(last_value)
                next_bucket += period_ns
            state.update((next_bucket, last_value,
                          bsum.get(high, 0.0), bcnt.get(high, 0)))
        out = pd.DataFrame({time_col: out_t, "cnt": out_c, "avg_value": out_v})
        for i, c in enumerate(skey):
            out.insert(i, c, key[i])
        yield out

    return stream.groupBy(*skey).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_filter_changed(
    stream: DataFrame,
    series: Sequence[str] = ("name",),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """FILTER_CHANGED over a stream: emit only rows whose value differs from
    the series' previous value — the previous value persists across
    micro-batches (the batch window form would wrongly re-emit the first row
    of every batch)."""
    skey = list(series)
    out_schema = StructType(
        [StructField(c, StringType()) for c in skey]
        + [StructField(time_col, LongType()), StructField(value_col, DoubleType())]
    )
    state_schema = StructType([StructField("last", DoubleType())])

    def fn(key, pdfs, state):
        import pandas as pd

        last = state.get[0] if state.exists else None
        seen_any = state.exists
        rows_t, rows_v = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for t, v in zip(pdf[time_col], pdf[value_col]):
                v = float(v)
                if not seen_any or v != last:
                    rows_t.append(int(t))
                    rows_v.append(v)
                last, seen_any = v, True
        state.update((last,))
        out = pd.DataFrame({time_col: rows_t, value_col: rows_v})
        for i, c in enumerate(skey):
            out.insert(i, c, key[i])
        yield out

    return stream.groupBy(*skey).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str] = ("name", "time"),
    time_col: str = "time",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication on ``keys`` — the ingest-side twin of
    ``datapipe.dedup.exact_dedup`` (the reference's append path accepts
    duplicate (name, time) rows; mqtt_write.go has no dedup, so this is the
    at-least-once-to-exactly-once repair stage a training pipeline needs).

    With a ``watermark``, seen-key state older than the watermark is evicted
    (``dropDuplicatesWithinWatermark``) — state stays O(keys within the
    lateness horizon), not O(all keys ever), which is what survives an
    unbounded 100 TB/day stream.  ``watermark=None`` keeps global state
    (exact forever, bounded inputs only).

    ``time_col`` holds epoch-ns longs (engine canonical); the watermark
    bookkeeping needs a real timestamp column, converted transiently.
    """
    from neo_server_spark.functions.timefn import to_timestamp_ns

    if watermark is None:
        return stream.dropDuplicates(list(keys))
    with_ts = stream.withColumn("__ts", to_timestamp_ns(F.col(time_col)))
    return (
        with_ts.withWatermark("__ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
        .drop("__ts")
    )
