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
