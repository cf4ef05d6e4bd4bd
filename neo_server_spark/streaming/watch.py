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
