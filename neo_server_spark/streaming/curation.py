"""Streaming corpus curation: continuous document ingest through the C4
cleaning rules and incremental exact dedup against a PERSISTENT digest
index.

The operational shape for continuous corpus building at 100 TB: each
micro-batch is cleaned scan-side (datapipe/curate.py — zero shuffle),
deduped against the accumulated index (16 bytes per ever-seen document,
datapipe/dedup.py dedup_incremental), appended to the curated store, and
its fresh digests merged into the index — so no batch ever rescans the
corpus.  Same foreachBatch pattern as ingest.stream_append / the rollup
cascade; exactly-once comes from the checkpoint + idempotent parquet
appends.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..datapipe import curate, dedup

__all__ = ["curate_batch", "stream_curate"]


def curate_batch(spark: SparkSession, batch: DataFrame, index_dir: str,
                 out_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", sep: str = "\n",
                 min_words: int = 5, min_lines: int = 3) -> None:
    """One micro-batch: C4 clean -> dedup vs the persistent index ->
    append survivors + merge their digests.  Also the unit the batch
    backfill path calls in a loop."""
    cleaned = curate.c4_clean(batch, text_col=text_col, id_col=id_col,
                              sep=sep, min_words=min_words,
                              min_lines=min_lines)
    other = [c for c in batch.columns if c not in (text_col,)]
    cleaned = batch.select(*other).join(cleaned.drop("n_kept"), id_col)
    if os.path.isdir(index_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_dir)):
        seen = spark.read.parquet(index_dir)
    else:
        seen = spark.createDataFrame([], "digest string")
    fresh = dedup.dedup_incremental(cleaned, seen, text_col=text_col,
                                    id_col=id_col)
    # localCheckpoint: `fresh` feeds two sinks (corpus + index); cut the
    # lineage so the dedup join runs once, not once per sink
    fresh = fresh.localCheckpoint(eager=True)
    fresh.write.mode("append").parquet(out_dir)
    dedup.digest_index(fresh, text_col=text_col).write.mode("append") \
        .parquet(index_dir)


def stream_curate(stream: DataFrame, index_dir: str, out_dir: str,
                  checkpoint: str, text_col: str = "text",
                  id_col: str = "doc_id", sep: str = "\n",
                  min_words: int = 5, min_lines: int = 3,
                  available_now: bool = True):
    """readStream(documents) -> C4 clean -> incremental dedup -> curated
    parquet, with the digest index accumulating across batches AND across
    runs (a later stream run drops documents already curated by an
    earlier one).  Returns the StreamingQuery."""
    spark = stream.sparkSession

    def _batch(bdf: DataFrame, _epoch: int) -> None:
        curate_batch(spark, bdf, index_dir, out_dir, text_col=text_col,
                     id_col=id_col, sep=sep, min_words=min_words,
                     min_lines=min_lines)

    w = (stream.writeStream.foreachBatch(_batch)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
