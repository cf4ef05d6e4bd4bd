"""Streaming corpus curation: continuous document ingest through the C4
cleaning rules and incremental exact dedup against a PERSISTENT digest
index.

The operational shape for continuous corpus building at 100 TB: each
micro-batch is cleaned scan-side (datapipe/curate.py — zero shuffle),
deduped against the accumulated index (16 bytes per ever-seen document,
datapipe/dedup.py dedup_incremental), appended to the curated store, and
its fresh digests merged into the index — so no batch ever rescans the
corpus.  Same foreachBatch pattern as ingest.stream_append / the rollup
cascade.

Exactly-once: each epoch writes to its own ``run=<ck-hash>/epoch=<N>``
partition directory with OVERWRITE semantics, so a foreachBatch retry (or
a checkpoint-restart replaying the epoch) rewrites the same two
directories instead of appending duplicates — the run key is derived from
the checkpoint location, which is what identifies a logical stream across
restarts.  Plain flat appends (the pre-r9 layout) remain available via
``epoch=None`` for one-shot backfills, and are at-least-once only.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..datapipe import curate, dedup

__all__ = ["curate_batch", "stream_curate", "read_layered"]


def _layouts(path: str) -> tuple[list[str], bool]:
    """(root-level .parquet files, whether run=/epoch= partition dirs
    exist).  The two can coexist: a pre-r9 flat backfill (or an
    ``epoch=None`` append) plus later streaming epochs."""
    if not os.path.isdir(path):
        return [], False
    flat = [os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")]
    part = any(d.startswith("run=") for d in os.listdir(path)
               if os.path.isdir(os.path.join(path, d)))
    return flat, part


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def read_layered(spark: SparkSession, path: str) -> DataFrame:
    """Read an index/corpus directory that may hold the flat layout
    (root-level parquet from ``epoch=None`` backfills), the partitioned
    ``run=/epoch=`` layout, or BOTH.  ``spark.read.parquet(dir)`` on a
    mixed directory silently ignores the root-level files (partition
    discovery only walks the ``k=v`` subdirs) — losing every backfill
    digest means previously-curated documents get re-admitted, so the
    mixed case must union the two reads explicitly.  Flat rows surface
    with ``run``/``epoch`` = NULL when the partitioned side exists."""
    flat, part = _layouts(path)
    if flat and part:
        pdf = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, d) for d in os.listdir(path)
              if d.startswith("run=")])
        fdf = spark.read.parquet(*flat)
        for c in ("run", "epoch"):
            if c in pdf.columns and c not in fdf.columns:
                fdf = fdf.withColumn(c, F.lit(None).cast(pdf.schema[c].dataType))
        return pdf.unionByName(fdf, allowMissingColumns=True)
    return spark.read.parquet(path)


def curate_batch(spark: SparkSession, batch: DataFrame, index_dir: str,
                 out_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", sep: str = "\n",
                 min_words: int = 5, min_lines: int = 3,
                 epoch: int | None = None, run_key: str = "",
                 table_format: str = "parquet") -> None:
    """One micro-batch: C4 clean -> dedup vs the persistent index ->
    write survivors + merge their digests.  Also the unit the batch
    backfill path calls in a loop.

    With ``epoch`` set (the streaming path), both sinks write to
    ``run=<run_key>/epoch=<epoch>`` subdirectories with overwrite
    semantics — a retried epoch is idempotent.  Without it, plain
    appends (at-least-once on retry)."""
    cleaned = curate.c4_clean(batch, text_col=text_col, id_col=id_col,
                              sep=sep, min_words=min_words,
                              min_lines=min_lines)
    other = [c for c in batch.columns if c not in (text_col,)]
    cleaned = batch.select(*other).join(cleaned.drop("n_kept"), id_col)
    if table_format == "txlog":
        return _curate_batch_txlog(spark, cleaned, index_dir, out_dir,
                                   text_col, id_col, epoch, run_key)
    if table_format != "parquet":
        raise ValueError(f"unknown table_format {table_format!r}")
    if _has_parquet(index_dir):
        seen = read_layered(spark, index_dir)
        if epoch is not None and {"run", "epoch"} <= set(seen.columns):
            # a replayed epoch must not dedup against ITS OWN digests
            # from the failed attempt (that would overwrite the epoch's
            # corpus partition with an empty frame)
            # eqNullSafe: flat-layout rows carry run/epoch = NULL and
            # must survive this filter (plain == yields NULL -> dropped)
            seen = seen.filter(~(F.col("run").eqNullSafe(run_key or "adhoc")
                                 & F.col("epoch").eqNullSafe(int(epoch))))
        seen = seen.select("digest")
    else:
        seen = spark.createDataFrame([], "digest string")
    fresh = dedup.dedup_incremental(cleaned, seen, text_col=text_col,
                                    id_col=id_col)
    # localCheckpoint: `fresh` feeds two sinks (corpus + index); cut the
    # lineage so the dedup join runs once, not once per sink
    fresh = fresh.localCheckpoint(eager=True)
    digests = dedup.digest_index(fresh, text_col=text_col)
    if epoch is None:
        fresh.write.mode("append").parquet(out_dir)
        digests.write.mode("append").parquet(index_dir)
    else:
        sub = f"run={run_key or 'adhoc'}/epoch={int(epoch)}"
        fresh.write.mode("overwrite").parquet(f"{out_dir}/{sub}")
        digests.write.mode("overwrite").parquet(f"{index_dir}/{sub}")


def _curate_batch_txlog(spark: SparkSession, cleaned: DataFrame,
                        index_dir: str, out_dir: str, text_col: str,
                        id_col: str, epoch: int | None,
                        run_key: str) -> None:
    """Transactional-sink variant: both sinks are txlog tables, so
    exactly-once comes from the commit log's (app, epoch) txn dedupe
    instead of the run=/epoch= directory convention — readers just
    ``txlog.read_table`` with no layout knowledge, and a crash between
    staging and commit leaves invisible files, never a torn table.

    Write order (corpus THEN index) makes the replay self-consistent:
    if the index commit is missing, ``seen`` lacks this epoch's digests,
    the dedup recomputes the identical ``fresh`` set (deterministic),
    and the corpus write collapses into a no-op via its txn."""
    from neo_server_spark import txlog

    app = run_key or "adhoc"
    txn = None if epoch is None else (app, int(epoch))
    if txn is not None and \
            txlog.last_txn_version(index_dir, app, int(epoch)) is not None:
        return      # fully committed epoch: replay is a no-op
    try:
        seen = txlog.read_table(spark, index_dir).select("digest")
    except FileNotFoundError:
        seen = spark.createDataFrame([], "digest string")
    fresh = dedup.dedup_incremental(cleaned, seen, text_col=text_col,
                                    id_col=id_col)
    fresh = fresh.localCheckpoint(eager=True)
    txlog.write(fresh, out_dir, txn=txn)
    txlog.write(dedup.digest_index(fresh, text_col=text_col), index_dir,
                txn=txn)


def stream_curate(stream: DataFrame, index_dir: str, out_dir: str,
                  checkpoint: str, text_col: str = "text",
                  id_col: str = "doc_id", sep: str = "\n",
                  min_words: int = 5, min_lines: int = 3,
                  available_now: bool = True,
                  table_format: str = "parquet"):
    """readStream(documents) -> C4 clean -> incremental dedup -> curated
    parquet, with the digest index accumulating across batches AND across
    runs (a later stream run drops documents already curated by an
    earlier one).  Returns the StreamingQuery.

    Epoch writes are idempotent per (checkpoint, epoch) — see the module
    docstring — so a foreachBatch retry or a restart replaying the last
    uncommitted epoch cannot duplicate documents in the curated output.
    """
    spark = stream.sparkSession
    run_key = hashlib.md5(os.path.abspath(checkpoint).encode()) \
        .hexdigest()[:8]

    def _batch(bdf: DataFrame, epoch: int) -> None:
        curate_batch(spark, bdf, index_dir, out_dir, text_col=text_col,
                     id_col=id_col, sep=sep, min_words=min_words,
                     min_lines=min_lines, epoch=epoch, run_key=run_key,
                     table_format=table_format)

    w = (stream.writeStream.foreachBatch(_batch)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
