"""Table watchers (reference: spi/watch.go — per-tag pollers keyed by last
basetime / _ARRIVAL_TIME, streamed to clients as SSE;
mods/server/http_query.go:109-200).

Two Spark shapes:
- ``watch_stream``: a real ``readStream`` over the table directory — new
  files become micro-batches (push model; what SSE clients would consume via
  foreachBatch).
- ``Watcher``: the reference's poll model — remembers the high-water mark per
  tag and returns only new rows each poll; cheap because the time predicate
  prunes partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def watch_stream(spark: SparkSession, table_path: str, schema: StructType) -> DataFrame:
    """Streaming view of a tag table path: emits newly appended files."""
    return spark.readStream.schema(schema).parquet(table_path)


class Watcher:
    """Poll-based watcher with per-tag high-water marks (spi/watch.go:29-120).

    ``poll()`` returns rows strictly newer than the previous high-water mark
    for each tag and advances the mark.  The mark state is a tiny dict on the
    driver (one entry per tag) — the scan itself stays distributed and
    time-pruned.

    CARDINALITY BOUND: each poll collects one (tag, max_time) row per tag to
    the driver — the SSE-watch contract is inherently per-tag, and the
    reference's watcher holds the same per-tag state server-side
    (spi/watch.go).  This is fine to ~1M tags (a few tens of MB); beyond
    that a watch should be scoped to a tag subset, which ``max_tags``
    enforces rather than letting a misconfigured watch stall the driver.
    """

    #: refuse to track more distinct tags than this per watcher
    DEFAULT_MAX_TAGS = 1_000_000

    def __init__(self, load: "callable[[], DataFrame]", name_col: str = "name",
                 time_col: str = "time", max_tags: int | None = None):
        self._load = load
        self.name_col = name_col
        self.time_col = time_col
        self.max_tags = max_tags or self.DEFAULT_MAX_TAGS
        self.marks: dict[str, int] = {}

    def poll(self) -> DataFrame:
        df = self._load()
        if self.marks:
            spark = df.sparkSession
            marks_df = spark.createDataFrame(
                list(self.marks.items()), [self.name_col, "__mark"]
            )
            df = (
                df.join(F.broadcast(marks_df), self.name_col, "left")
                .filter(F.col("__mark").isNull() | (F.col(self.time_col) > F.col("__mark")))
                .drop("__mark")
            )
        fresh = df.cache()
        frontier = (fresh.groupBy(self.name_col)
                    .agg(F.max(self.time_col).alias("mx"))
                    .limit(self.max_tags + 1).collect())
        if len(frontier) > self.max_tags:
            raise ValueError(
                f"watcher saw > {self.max_tags} distinct tags in one poll; "
                "scope the watch to a tag subset (see class docstring)")
        new_marks = {r[self.name_col]: r["mx"] for r in frontier}
        self.marks.update({k: v for k, v in new_marks.items() if v is not None})
        return fresh


class TagLatestWatcher:
    """The reference's TAG-table watch semantics (spi/watch.go:179-247,
    executeTag): per watched tag, remember the most recent basetime; when
    it advances, emit THE latest row for that tag (one WatchData object),
    not the backlog.  The first poll emits each tag's current latest row
    — exactly what a reference client sees on connect.

    One distributed query per poll regardless of tag count: filter to the
    watched tags (partition-prunable on the tag layout), per-tag latest
    row via a row_number window over the watched subset only.
    """

    def __init__(self, load, tags: list[str], name_col: str = "name",
                 time_col: str = "time",
                 tiebreak_cols: list[str] | None = None):
        if not tags:
            raise ValueError("tag table watch requires at least one tag "
                             "(spi/watch.go:110)")
        self._load = load
        self.tags = list(tags)
        self.name_col, self.time_col = name_col, time_col
        #: extra DESC sort columns after the basetime: with duplicate
        #: times per tag, "the latest row" is otherwise whichever row the
        #: engine returns first (the reference's QueryRow does the same) —
        #: pass a unique column to make the pick deterministic/replayable
        self.tiebreak_cols = list(tiebreak_cols or [])
        self.marks: dict[str, int] = {}

    def poll(self) -> list[dict]:
        from pyspark.sql.window import Window
        df = self._load().filter(F.col(self.name_col).isin(self.tags))
        w = Window.partitionBy(self.name_col) \
            .orderBy(F.col(self.time_col).desc(),
                     *[F.col(c).desc() for c in self.tiebreak_cols])
        latest = (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn").collect())
        out = []
        for r in latest:
            tag, t = r[self.name_col], r[self.time_col]
            if t is None:
                continue
            lt = self.marks.get(tag)
            if lt is not None and t <= lt:
                continue
            self.marks[tag] = t
            out.append(r.asDict())
        out.sort(key=lambda o: str(o.get(self.name_col)))
        return out


class LogWatcher:
    """The reference's LOG-table watch semantics (spi/watch.go:249-314,
    executeLog): high-water mark on the arrival column; the FIRST poll
    only establishes the mark (emits nothing), later polls emit every
    newer row in arrival order up to ``max_rows`` — more than that emits
    a ``too many changes, omit the rest`` error event and resets the
    mark so the next poll re-anchors at the current max.
    """

    def __init__(self, load, time_col: str = "_ARRIVAL_TIME",
                 max_rows: int = 20):
        self._load = load
        self.time_col = time_col
        self.max_rows = max(1, min(int(max_rows), 100))
        self.mark = None

    def poll(self) -> tuple[list[dict], list[str]]:
        df = self._load()
        if self.mark is None:
            self.mark = df.agg(F.max(self.time_col)).first()[0]
            return [], []
        rows = (df.filter(F.col(self.time_col) > F.lit(self.mark))
                .orderBy(self.time_col)
                .limit(self.max_rows + 1).collect())
        errs: list[str] = []
        if len(rows) > self.max_rows:
            rows = rows[: self.max_rows]
            errs.append("too many changes, omit the rest")
            self.mark = None   # next poll re-anchors at the current max
        else:
            if rows:
                self.mark = rows[-1][self.time_col]
        return [r.asDict() for r in rows], errs


class TxLogWatcher:
    """Change-data-feed watcher over a txlog table (the CDF model the
    run=/epoch= directory layout could not support): the commit log's
    version number IS the cursor, so a poll reads exactly the data files
    added since the last seen version — no high-water-mark scan of the
    table at all, and no per-tag driver state.  Deletes/rewrites are
    invisible by design (append-shaped consumers: watch, rollup feeds).

    Contrast with ``Watcher``: that polls by a time column (needs a scan
    with a time predicate per poll, exact for out-of-order data only up
    to the mark); this polls by commit version (zero scan when idle,
    sees late rows whenever they COMMIT, cost proportional to the new
    files).  At 100 TB the idle poll is a directory listing of the log
    tail — the table itself is never touched."""

    def __init__(self, spark: SparkSession, table: str):
        from neo_server_spark import txlog
        self._txlog = txlog
        self.spark = spark
        self.table = table
        self.version = 0

    def poll(self) -> DataFrame | None:
        """Rows committed since the last poll (None when idle); advances
        the version cursor."""
        cur, delta = self._txlog.changes(self.spark, self.table,
                                         self.version)
        self.version = cur
        return delta


class TagStatTable:
    """Engine-maintained per-tag stat table (V$<T>_STAT semantics,
    spi/show.go:1324 + fm_dbsrc.go:871-881 'stat' last-value resolution)
    kept fresh INCREMENTALLY off a txlog table's change feed — the r10
    VERDICT #8 stretch.

    ``show_tags`` recomputes ``groupBy(name).agg(count/min/max)`` over
    the whole table on demand: exact, but O(table) per call.  This
    consumer folds only the files COMMITTED since its cursor into a
    persistent stat table (itself a txlog table, so the fold publishes
    atomically and is versioned):

      refresh cost = scan of the DELTA files + an O(tags) merge,
      independent of table size — ``last``/bounds resolution at 100 TB
      is then a read of the O(tags) stat table, never a corpus scan.

    The CDF cursor is persisted inside the stat rows (``_src_version``),
    so a restarted maintainer resumes where it left off instead of
    double-counting.  Folds are exact for append-only tables (the tag
    layout's contract); compaction commits are dataChange=False and
    invisible to the feed by construction."""

    STAT_COLS = ("name", "row_count", "min_time", "max_time",
                 "min_value", "max_value", "last_value")

    def __init__(self, spark: SparkSession, table: str,
                 stat_table: str | None = None, name_col: str = "name",
                 time_col: str = "time", value_col: str = "value"):
        from neo_server_spark import txlog

        self._txlog = txlog
        self.spark = spark
        self.table = table
        self.stat_table = stat_table or table.rstrip("/") + "_stat"
        self.cols = (name_col, time_col, value_col)
        self.watcher = TxLogWatcher(spark, table)
        # resume: the stat rows carry the source version they cover
        try:
            row = txlog.read_table(spark, self.stat_table) \
                .agg(F.max("_src_version")).first()
            self.watcher.version = int(row[0] or 0)
        except FileNotFoundError:
            pass

    def _agg(self, df: DataFrame) -> DataFrame:
        n, t, v = self.cols
        return df.groupBy(F.col(n).alias("name")).agg(
            F.count(F.lit(1)).alias("row_count"),
            F.min(t).alias("min_time"), F.max(t).alias("max_time"),
            F.min(v).alias("min_value"), F.max(v).alias("max_value"),
            F.max_by(v, F.struct(F.col(t), F.col(v))).alias("last_value"))

    def refresh(self) -> int:
        """Fold newly committed files into the stat table; returns the
        number of delta rows folded (0 on an idle poll, which costs one
        log-tail listing and touches no data)."""
        delta = self.watcher.poll()
        if delta is None:
            return 0
        delta = delta.localCheckpoint(eager=True)   # count + agg, one scan
        n_rows = delta.count()
        fresh = self._agg(delta)
        try:
            prev = self._txlog.read_table(self.spark, self.stat_table) \
                .select(*self.STAT_COLS)
            merged = prev.unionByName(fresh).groupBy("name").agg(
                F.sum("row_count").alias("row_count"),
                F.min("min_time").alias("min_time"),
                F.max("max_time").alias("max_time"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
                F.max_by("last_value",
                         F.struct(F.col("max_time"), F.col("last_value")))
                .alias("last_value"))
        except FileNotFoundError:
            merged = fresh
        out = merged.withColumn("_src_version",
                                F.lit(int(self.watcher.version)))
        # atomic publish; eager checkpoint cuts the self-read lineage
        self._txlog.write(out.localCheckpoint(eager=True), self.stat_table,
                          mode="overwrite")
        return int(n_rows)

    def stats(self) -> DataFrame:
        """The stat table (V$<T>_STAT shape), one row per tag."""
        return self._txlog.read_table(self.spark, self.stat_table) \
            .select(*self.STAT_COLS).orderBy("name")

    def last(self, tag: str):
        """(last_time, last_value) for one tag — O(stat table) lookup,
        the reference's engine-maintained 'stat' fast path."""
        r = self._txlog.read_table(self.spark, self.stat_table) \
            .filter(F.col("name") == tag) \
            .select("max_time", "last_value").first()
        return None if r is None else (r["max_time"], r["last_value"])
