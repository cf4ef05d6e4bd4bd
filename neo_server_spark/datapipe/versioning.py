"""Corpus version diff — WHAT CHANGED between two versions of a txlog
document table, at document granularity.

A training-data pipeline versions its corpus (ingest, curation deletes,
right-to-be-forgotten DML, dedup rewrites all land as txlog commits);
the audit question "which documents entered / left / changed between
snapshot A and snapshot B?" should not cost two full corpus scans.

Spark-first design, O(changed files) not O(table):

* Both versions' live sets resolve from the COMMIT LOG alone (time
  travel, zero data reads).
* Data files are IMMUTABLE — a file live in both versions with the same
  deletion-vector state contributes identical rows to both sides, so
  NOTHING in it can differ.  The scan is bounded by the SYMMETRIC
  DIFFERENCE of the two file sets (plus files whose DV state drifted,
  which the immutability shortcut must not skip).
* The two bounded sides full-outer-join on the key; a row only in the
  new side is ``added``, only in the old side ``removed``, in both with
  different content digests ``modified``.  Rows identical on both sides
  appear on neither (they live in skipped common files) or cancel in
  the join.

At 100 TB this is the difference between "diff two snapshots" being a
metadata question plus a scan of the week's churn, and being two full
corpus reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo_server_spark import txlog

__all__ = ["corpus_diff"]


def _side(spark: SparkSession, table: str, rels: list[str], meta: dict,
          key: str, digest_cols: list[str], name: str) -> DataFrame:
    """(key, digest) for one version's rows within the bounded file
    set — digest over the listed content columns, computed JVM-side.

    Duplicate-key validation rides INSIDE this scan: the side
    aggregates by key, and a group with count > 1 raises from the same
    job that feeds the diff join (no separate groupBy-count pass — the
    old shape ran two extra driver actions per diff just to validate).
    The aggregation also pre-partitions each side on ``__k``, which the
    full-outer join reuses."""
    df = txlog.read_live(spark, table, rels, meta)
    dig = F.md5(F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                  for c in digest_cols]))
    dup = F.raise_error(F.concat(
        F.lit(f"duplicate {key!r} within the {name} snapshot's changed "
              f"files (corpus_diff needs a unique document identity): "),
        F.col("__k").cast("string")))
    return (df.select(F.col(key).alias("__k"), dig.alias("__d"))
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__n"), F.max("__d").alias("__dm"))
            .select("__k", F.when(F.col("__n") > 1, dup)
                    .otherwise(F.col("__dm")).alias("__d")))


def corpus_diff(spark: SparkSession, table: str,
                v_from: int, v_to: int,
                key: str, digest_cols: list[str]) -> DataFrame:
    """Document-level diff of ``table`` between versions ``v_from`` and
    ``v_to``: one row per changed document, ``change`` in
    {'added', 'removed', 'modified'}.

    ``key`` must identify a document in both versions (duplicate keys
    within one version raise — a diff over an ambiguous identity is
    meaningless).  ``digest_cols`` define content equality.

    Scan cost: only files NOT live-and-DV-identical in both versions
    are read — an unchanged corpus diffs for the cost of two log
    replays and zero data IO."""
    _v1, live1, _t1, _s1, meta1 = txlog._replay(table, as_of=v_from)
    _v2, live2, _t2, _s2, meta2 = txlog._replay(table, as_of=v_to)
    common = {
        rel for rel in (live1 & live2)
        if sorted(meta1["dvs"].get(rel, []))
        == sorted(meta2["dvs"].get(rel, []))
    }
    old_rels = sorted(live1 - common)
    new_rels = sorted(live2 - common)
    if not old_rels and not new_rels:
        # identical snapshots: empty diff, key typed like the table's.
        # The type comes from the LOGGED schema — a read_table here
        # would LIST every live file for schema inference (23s of pure
        # metadata at 12k files / 300M rows, measured r13) for a frame
        # that scans nothing
        sch = dict(txlog.table_schema(table) or [])
        if key in sch:
            return spark.createDataFrame(
                [], f"`{key}` {sch[key]}, `change` string")
        return (txlog.read_table(spark, table, version_as_of=v_to)
                .select(F.col(key)).limit(0)
                .withColumn("change", F.lit("added")))
    old = (_side(spark, table, old_rels, meta1, key, digest_cols, "old")
           if old_rels else None)
    new = (_side(spark, table, new_rels, meta2, key, digest_cols, "new")
           if new_rels else None)
    if old is None:
        return new.select(F.col("__k").alias(key),
                          F.lit("added").alias("change"))
    if new is None:
        return old.select(F.col("__k").alias(key),
                          F.lit("removed").alias("change"))
    j = (old.withColumnRenamed("__d", "__d_old")
         .join(new.withColumnRenamed("__d", "__d_new"), "__k", "full"))
    return (j.select(
        F.col("__k").alias(key),
        F.when(F.col("__d_old").isNull(), F.lit("added"))
         .when(F.col("__d_new").isNull(), F.lit("removed"))
         .when(F.col("__d_old") != F.col("__d_new"),
               F.lit("modified")).alias("change"))
        .filter(F.col("change").isNotNull()))
