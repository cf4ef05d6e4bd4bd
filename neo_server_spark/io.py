"""TESTDATA loaders and tag/log table layout helpers.

Data model (SURVEY §1): machbase's core abstraction is the TAG table
``(name VARCHAR PK, time DATETIME-ns BASETIME, value DOUBLE SUMMARIZED)``
(reference: spi/testsuite/tagtable.go:133-139).  Spark mapping: a parquet/Delta
table partitioned/bucketed by ``name`` plus a coarse time-bucket column; the
canonical time representation is epoch-ns LongType with derived timestamps for
window operations.

The driver's TESTDATA (TPC-H-ish star schema + ``events``/``documents``/
``embeddings``) is the correctness substrate; ``events`` doubles as the tag
table: ``event_type`` -> tag name, ``ts`` (epoch ns) -> basetime, ``value``.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from neo_server_spark.session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA parquet table.

    ``events.ts`` is parquet TIMESTAMP(NANOS) → surfaced as LongType epoch-ns
    (the engine's canonical basetime), via the nanosAsLong conf which
    ``ensure_engine_conf`` sets even on externally created sessions.
    """
    ensure_engine_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every TESTDATA table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def events_as_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Present ``events`` in the canonical tag-table shape (name, time, value).

    Extra columns ride along like a wide tag table's extra columns
    (reference DDL with extra cols: spi/testsuite/tagtable.go:237-244).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("name"),
        F.col("ts").alias("time"),
        F.col("value"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("props"),
    )


def with_event_time(df: DataFrame, time_col: str = "time", out: str = "event_ts") -> DataFrame:
    """Derive a microsecond TimestampType column from epoch-ns for window ops."""
    return df.withColumn(out, F.timestamp_micros(F.floor(F.col(time_col) / F.lit(1000)).cast("long")))


def write_tag_table(
    df: DataFrame,
    path: str,
    name_col: str = "name",
    time_col: str = "time",
    name_buckets: int = 64,
    mode: str = "append",
) -> None:
    """Persist a DataFrame in the scale-ready tag-table layout.

    Layout = parquet partitioned by (day-bucket, name-bucket):
    - partition pruning serves both access patterns the reference optimizes for:
      per-tag scans (name predicate) and time-range scans (basetime predicate),
      mirroring the engine's TAG_PARTITION_COUNT partitioned tag storage
      (reference: mods/server/machbase_template.conf:520);
    - bucketing the *hash* of name (not raw name) bounds partition count under
      high-cardinality tag sets — at 100 TB raw names would create millions of
      directories, hash-buckets keep it at days x name_buckets.
    """
    out = (
        df.withColumn("_day", F.date_format(F.timestamp_micros((F.col(time_col) / 1000).cast("long")), "yyyyMMdd"))
        .withColumn("_nb", F.pmod(F.xxhash64(F.col(name_col)), F.lit(name_buckets)).cast("int"))
    )
    out.write.partitionBy("_day", "_nb").mode(mode).parquet(path)


def read_tag_table(spark: SparkSession, path: str) -> DataFrame:
    ensure_engine_conf(spark)
    return spark.read.parquet(path)
