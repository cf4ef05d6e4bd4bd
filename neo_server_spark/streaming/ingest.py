"""Structured Streaming ingest: the APPEND path, wire decoders, and rollup
maintenance (SURVEY §2.9, §3.3).

Reference shape: MQTT/HTTP writes land on a per-table AppendWorker — a shared
async appender with a 10k-record channel draining into the engine's bulk
columnar ingest (spi/append_worker.go:16-120).  Spark mapping: a file/Kafka
``readStream`` micro-batched through ``foreachBatch`` into the partitioned
tag-table layout — the micro-batch IS the append buffer, checkpointing makes
it exactly-once, and partitioned parquet writes are the columnar bulk path.

The MQTT/NATS broker itself stays out of Spark scope (BASELINE.json): brokers
dump payload files (or a Kafka topic) that the stream tails.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

#: canonical tag-record schema for wire decoding: (name, time ns, value)
TAG_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("time", LongType()),
    StructField("value", DoubleType()),
])


# ---------------------------------------------------------------- decoders

def decode_csv_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """CSV wire decoder (mods/codec decoder registry): 'name,time_ns,value'."""
    # F.get is NULL on missing positions: short/garbage lines become NULL
    # rows to drop, never a stream-killing INVALID_ARRAY_INDEX (ANSI mode)
    parts = F.split(F.col(col), ",")
    return lines.select(
        F.get(parts, 0).alias("name"),
        F.get(parts, 1).try_cast("long").alias("time"),
        F.get(parts, 2).try_cast("double").alias("value"),
    ).filter(F.col("name").isNotNull() & F.col("time").isNotNull())


def decode_ndjson_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """NDJSON wire decoder: {"name":..., "time":..., "value":...}."""
    parsed = F.from_json(F.col(col), TAG_SCHEMA)
    return lines.select(parsed.alias("r")).select("r.name", "r.time", "r.value")


def decode_json_payload(payloads: DataFrame, col: str = "value") -> DataFrame:
    """JSON write-payload decoder (mods/codec/internal/json/json_decode.go):
    accepts either a bare rows array ``[[name,time,value],…]`` or the HTTP
    envelope ``{"data":{"rows":[[…],…]}}`` — the two shapes the reference's
    token scanner walks to.  One payload may carry many rows (explode);
    malformed payloads decode to NULL and are dropped, never poisoning the
    stream.  All JVM-side (get_json_object/from_json), no Python."""
    rows = F.coalesce(
        F.from_json(F.get_json_object(F.col(col), "$.data.rows"),
                    "array<array<string>>"),
        F.from_json(F.col(col), "array<array<string>>"),
    )
    return (
        payloads.select(F.explode(rows).alias("r"))
        .select(
            F.get("r", 0).alias("name"),
            F.get("r", 1).try_cast("long").alias("time"),
            F.get("r", 2).try_cast("double").alias("value"),
        )
        .filter(F.col("name").isNotNull() & F.col("time").isNotNull())
    )


def decode_line_protocol(lines: DataFrame, col: str = "value") -> DataFrame:
    """Influx line protocol decoder (spi/do.go:15-110):

        measurement[,tag=v...] field1=1.0,field2=2i [ts-ns]

    Machbase mapping: one OUTPUT ROW PER NUMERIC FIELD with
    name = "measurement.field", time = ts, value = field value.
    Non-numeric fields are dropped (do.go:52-66).  Pure split/explode —
    no Python in the row path.
    """
    # F.get (not []) everywhere: a poisoned payload line must decode to NULLs
    # and be dropped, not abort the micro-batch (ANSI INVALID_ARRAY_INDEX)
    segs = F.split(F.col(col), " ")
    measurement = F.get(F.split(F.get(segs, 0), ","), 0)
    field_str = F.get(segs, 1)
    ts = F.get(segs, 2).try_cast("long")
    kv = F.explode(F.split(field_str, ",")).alias("kv")
    exploded = lines.filter(field_str.isNotNull() & ts.isNotNull()).select(
        measurement.alias("m"), ts.alias("time"), kv)
    k = F.get(F.split(F.col("kv"), "="), 0)
    raw_v = F.get(F.split(F.col("kv"), "="), 1)
    # influx int fields end with 'i'; strings are quoted -> cast fails -> NULL
    # try_cast: non-numeric fields (quoted strings, bools) -> NULL -> dropped,
    # matching do.go:52-66; ANSI mode would otherwise throw on them
    v = F.when(raw_v.rlike(r"^-?\d+i$"),
               F.regexp_replace(raw_v, "i$", "").try_cast("double")
               ).otherwise(raw_v.try_cast("double"))
    return (
        exploded.select(
            F.concat_ws(".", F.col("m"), k).alias("name"),
            F.col("time"),
            v.alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )


DECODERS = {
    "csv": decode_csv_lines,
    "ndjson": decode_ndjson_lines,
    "json": decode_json_payload,   # rows array / data.rows envelope per message
    "line": decode_line_protocol,
}


# ---------------------------------------------------------------- append path

def _run_key(checkpoint: str) -> str:
    """Stable identity for a logical stream across restarts — derived from
    the checkpoint location, the same convention curation.stream_curate
    uses, so (run_key, epoch) is the txlog txn pair."""
    import hashlib
    import os

    return hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:8]


def stream_append(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint: str,
    fmt: str = "ndjson",
    name_buckets: int | None = None,
    trigger_available_now: bool = True,
    with_arrival_time: bool = True,
    table_format: str = "parquet",
):
    """The APPEND worker: tail ``source_dir`` for payload files, decode, and
    append into the partitioned tag-table layout.

    - exactly-once via checkpointed file-source offsets + idempotent-enough
      parquet appends (Delta would make it transactional; parquet keeps this
      container dependency-free);
    - ``table_format="txlog"`` makes the sink TRANSACTIONAL instead: each
      epoch commits through the txlog with txn=(run_key, epoch), so a
      foreachBatch retry or checkpoint-restart replay collapses to a no-op
      — true exactly-once with no directory convention.  Day-partition
      pruning is replaced by commit-log data skipping on the ``time``
      column (file-level min/max, pruned_files) — the same scan-narrowing
      at O(live files) metadata cost;
    - ``_ARRIVAL_TIME`` is stamped like log tables do implicitly
      (mods/server/http_write.go:133-136);
    - ``trigger_available_now`` runs a drain-and-stop batch (cron-timer mode,
      mods/scheduler/sched_timer.go) — otherwise continuous micro-batches.
    """
    from neo_server_spark.io import write_tag_table

    decoder = DECODERS[fmt]
    lines = spark.readStream.format("text").load(source_dir)
    decoded = decoder(lines)
    if with_arrival_time:
        decoded = decoded.withColumn("_arrival_time", F.current_timestamp())

    if table_format == "txlog":
        from neo_server_spark import txlog

        app = _run_key(checkpoint)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            txlog.write(batch_df, table_path, txn=(app, int(batch_id)),
                        stats_cols=["time"])
    elif table_format == "parquet":
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            write_tag_table(batch_df, table_path, name_buckets=name_buckets, mode="append")
    else:
        raise ValueError(f"unknown table_format {table_format!r}")

    writer = decoded.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint: str,
    on: list[str],
    order_col: str,
    fmt: str = "ndjson",
    trigger_available_now: bool = True,
    stats_cols: list[str] | None = None,
    cdf: bool = False,
):
    """Streaming UPSERT sink — the CDC-apply shape (Delta's
    foreachBatch-MERGE pattern): tail ``source_dir``, decode, elect one
    row per key within each micro-batch (the ``order_col``-latest, ties
    broken by the row itself so replays are bit-stable), and MERGE it
    into a txlog table keyed on ``on``.

    Exactly-once: the merge commits with txn=(run_key, epoch) — a
    foreachBatch retry probes the log and collapses to a no-op BEFORE
    doing any work, and a crash between the merge's rewrite and its
    commit leaves only invisible staged files.  Copy-on-write: each
    epoch rewrites only the files containing matched keys (stats-pruned
    from the batch's own key bounds, dml.merge auto-prune).

    First epoch against a missing table bootstraps it with a plain
    transactional write.  ``cdf=True`` publishes row-level change files
    per epoch (txlog.row_changes serves the downstream feed)."""
    from neo_server_spark import dml, txlog

    decoder = DECODERS[fmt]
    lines = spark.readStream.format("text").load(source_dir)
    decoded = decoder(lines)
    app = _run_key(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if txlog.last_txn_version(table_path, app, int(batch_id)) \
                is not None:
            return                    # replayed epoch: no-op
        cols = [c for c in batch_df.columns]
        latest = (batch_df.groupBy(*on).agg(
            F.max_by(F.struct(*[c for c in cols if c not in on]),
                     F.struct(F.col(order_col),
                              *[F.col(c) for c in cols
                                if c not in on])).alias("__r"))
            .select(*on, "__r.*"))
        import os

        if not os.path.isdir(os.path.join(table_path, "_txlog")):
            txlog.write(latest, table_path, txn=(app, int(batch_id)),
                        stats_cols=stats_cols)
            return
        dml.merge(spark, table_path, latest, on=on,
                  stats_cols=stats_cols, cdf=cdf,
                  txn=(app, int(batch_id)), validate_unique=False)

    writer = (decoded.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_scd2(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint: str,
    on: list[str],
    attrs: list[str],
    fmt: str = "ndjson",
    trigger_available_now: bool = True,
    stats_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming SCD Type-2 sink: each micro-batch's latest row per key
    (by the decoded ``time`` column) applies as a dimension snapshot —
    changed keys close their current version at the batch row's time
    and open a new one, unchanged keys cause no churn, new keys insert
    (dml.scd2_apply).  Exactly-once via txn=(run_key, epoch); a
    restart replays into a no-op before any work.

    The dimension table must exist (bootstrap with
    ``dml.scd2_init(first_snapshot, eff).write``); this sink then keeps
    full attribute history flowing from the stream — the streaming half
    of the Kimball pattern the batch scd2_apply covers."""
    from neo_server_spark import dml, txlog

    decoder = DECODERS[fmt]
    rd = spark.readStream.format("text")
    if max_files_per_trigger:
        # availableNow honors read limits (admission control): each
        # dropped file becomes its OWN epoch instead of one merged
        # last-wins batch — snapshots apply in arrival order
        rd = rd.option("maxFilesPerTrigger", int(max_files_per_trigger))
    lines = rd.load(source_dir)
    decoded = decoder(lines)
    app = _run_key(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if txlog.last_txn_version(table_path, app, int(batch_id)) \
                is not None:
            return
        cols = batch_df.columns
        latest = (batch_df.groupBy(*on).agg(
            F.max_by(F.struct(*[c for c in cols if c not in on]),
                     F.struct(F.col("time"),
                              *[F.col(c) for c in cols
                                if c not in on])).alias("__r"))
            .select(*on, "__r.*"))
        dml.scd2_apply(spark, table_path, latest, on=on, attrs=attrs,
                       effective_col="time", stats_cols=stats_cols,
                       txn=(app, int(batch_id)))

    writer = (decoded.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_rollup(
    spark: SparkSession,
    source_dir: str,
    rollup_base: str,
    checkpoint: str,
    fmt: str = "ndjson",
    period_ns: int = 1_000_000_000,
    trigger_available_now: bool = True,
    table_format: str = "parquet",
    distinct_col: str | None = None,
):
    """Streaming rollup maintenance: per micro-batch, append PARTIAL algebraic
    summaries at the sec level.  Partials are mergeable (count/sum/sumsq/
    min/max/min_by/max_by), so RollupRouter.query's fold-on-read produces
    exact results without ever locking or rewriting the rollup table —
    the same idea as the engine's background rollup builders (V$ROLLUP gap
    semantics, spi/show.go:1209-1222).  A periodic compaction job can rewrite
    partials into one row per bucket; correctness never depends on it.

    ``table_format="txlog"`` commits each epoch's partials with
    txn=(run_key, epoch): a replayed epoch cannot double-count a partial
    — the failure the plain append path is exposed to on foreachBatch
    retry (partials are NOT idempotent under duplication, unlike the raw
    appends).  Query via RollupRouter(..., table_format="txlog").
    """
    from neo_server_spark.sqlx.rollup import _summarize

    decoder = DECODERS[fmt]
    lines = spark.readStream.format("text").load(source_dir)
    decoded = decoder(lines)
    if table_format not in ("parquet", "txlog"):
        raise ValueError(f"unknown table_format {table_format!r}")
    app = _run_key(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        summary = _summarize(batch_df, period_ns, "name", "time", "value",
                             distinct_col=distinct_col)
        if table_format == "txlog":
            from neo_server_spark import txlog

            txlog.write(summary, f"{rollup_base}/rollup_sec",
                        txn=(app, int(batch_id)), stats_cols=["time"])
        else:
            summary.write.mode("append").parquet(f"{rollup_base}/rollup_sec")

    writer = decoded.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_rollup(spark: SparkSession, rollup_base: str, level: str = "sec") -> None:
    """Fold appended partial summaries into one row per (name, bucket).

    txlog-backed tables (stream_rollup(table_format="txlog")) fold through
    an atomic overwrite COMMIT — readers see the old partials or the
    folded rows, never a half-written mix, and the retired files wait for
    vacuum's retention window.  Plain-parquet tables keep the rewrite+
    rename path."""
    import os

    from neo_server_spark.sqlx.rollup import LEVELS, _fold

    path = f"{rollup_base}/rollup_{level}"
    if os.path.isdir(os.path.join(path, "_txlog")):
        from neo_server_spark import txlog

        folded = _fold(txlog.read_table(spark, path), LEVELS[level])
        # one atomic commit: remove every partial file, add the folded set
        txlog.write(folded.localCheckpoint(eager=True), path,
                    mode="overwrite", stats_cols=["time"])
        return
    folded = _fold(spark.read.parquet(path), LEVELS[level])
    tmp = f"{path}__compact"
    folded.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    spark.catalog.refreshByPath(path)  # invalidate cached file listings


# ---------------------------------------------------------------- retention

def apply_retention(spark: SparkSession, table_path: str, keep_days: int,
                    now_ns: int) -> list[str]:
    """Retention job (DURATION_GAP, machbase_template.conf:47-52): drop whole
    day-partitions older than the horizon — partition-pruned delete, no scan."""
    import os
    import shutil
    from datetime import datetime, timedelta, timezone

    cutoff = datetime.fromtimestamp(now_ns / 1e9, tz=timezone.utc) - timedelta(days=keep_days)
    dropped = []
    if not os.path.isdir(table_path):
        return dropped
    for entry in sorted(os.listdir(table_path)):
        if not entry.startswith("_day="):
            continue
        day = entry.split("=", 1)[1]
        try:
            d = datetime.strptime(day, "%Y%m%d").replace(tzinfo=timezone.utc)
        except ValueError:
            continue
        if d < cutoff.replace(hour=0, minute=0, second=0, microsecond=0):
            shutil.rmtree(os.path.join(table_path, entry))
            dropped.append(entry)
    return dropped
