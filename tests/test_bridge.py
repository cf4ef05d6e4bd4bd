"""Bridge tests (mods/bridge/registry.go + fm_dbsrc.go/fm_dbsink.go
parity).  JDBC bridges are option-plumbing-only (no driver jars in this
container); the sqlite bridge runs FOR REAL on the stdlib native engine —
query source, partitioned parallel table reads, and the INSERT sink."""

import os

import pyspark.sql.functions as F
import pytest

from neo_server_spark.sources.bridge import BridgeRegistry


def test_bridge_registry_lifecycle():
    reg = BridgeRegistry()
    br = reg.register("pg1", "postgres", "jdbc:postgresql://h/db", user="u")
    assert reg.get("pg1") is br and reg.names() == ["pg1"]
    reg.unregister("pg1")
    with pytest.raises(KeyError, match="undefined bridge"):
        reg.get("pg1")


def test_bridge_rejects_unknown_type():
    reg = BridgeRegistry()
    with pytest.raises(ValueError, match="undefined bridge type"):
        reg.register("x", "nats", "nats://h")


def test_bridge_reader_options(spark):
    reg = BridgeRegistry()
    # forced-jdbc engine: plan construction works; execution needs the jar
    br = reg.register("lite", "sqlite", "jdbc:sqlite:/tmp/x.db",
                      engine="jdbc")
    with pytest.raises(Exception):
        br.sql(spark, "select 1").collect()


def _seed_db(path):
    import sqlite3

    con = sqlite3.connect(path)
    con.execute("CREATE TABLE m (id INTEGER, name TEXT, v REAL)")
    con.executemany("INSERT INTO m VALUES (?,?,?)",
                    [(i, f"tag-{i % 3}", i * 1.5) for i in range(100)])
    con.commit()
    con.close()


def test_sqlite_native_sql_roundtrip(spark, tmp_path):
    """SQL(bridge) executes for real: the query ships to the sqlite
    engine (WHERE evaluated there, not in Spark) and lands typed."""
    db = str(tmp_path / "b.db")
    _seed_db(db)
    reg = BridgeRegistry()
    br = reg.register("lite", "sqlite", f"jdbc:sqlite:{db}")
    assert br._use_native()
    got = br.sql(spark, "SELECT id, name, v FROM m WHERE id < 5 "
                        "ORDER BY id").collect()
    assert [(r.id, r.name, r.v) for r in got] == \
        [(i, f"tag-{i % 3}", i * 1.5) for i in range(5)]
    assert dict(br.sql(spark, "SELECT id, v FROM m").dtypes) == \
        {"id": "bigint", "v": "double"}


def test_sqlite_native_partitioned_table_read(spark, tmp_path):
    """table(partition_column=...) fans range reads out to executors
    (mapInPandas) with Spark's JDBC stride arithmetic: first/last ranges
    unbounded, so rows OUTSIDE [lower, upper) still arrive."""
    db = str(tmp_path / "p.db")
    _seed_db(db)
    reg = BridgeRegistry()
    br = reg.register("lite", "sqlite", db)
    df = br.table(spark, "m", partition_column="id", lower=20, upper=80,
                  num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100                      # nothing lost at bounds
    assert df.agg(F.sum("id")).first()[0] == sum(range(100))
    # unpartitioned native read
    assert br.table(spark, "m").count() == 100


def test_sqlite_native_insert_sink(spark, tmp_path):
    """INSERT(bridge): Spark frame -> executemany batch; append grows,
    overwrite replaces; round-trips exactly (INTEGER/REAL are 64-bit)."""
    import sqlite3

    db = str(tmp_path / "w.db")
    reg = BridgeRegistry()
    br = reg.register("lite", "sqlite", db)
    df = spark.createDataFrame([(1, "a", 1.25), (2, "b", 2.5)],
                               "id long, name string, v double")
    br.insert(df, "out")
    br.insert(df, "out")                          # append
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM out").fetchone()[0] == 4
    con.close()
    br.insert(df, "out", mode="overwrite")
    got = br.sql(spark, "SELECT * FROM out ORDER BY id").collect()
    assert [(r.id, r.name, r.v) for r in got] == [(1, "a", 1.25),
                                                  (2, "b", 2.5)]


def test_tql_sql_bridge_end_to_end(spark, tmp_path):
    """The TQL front-end's SQL(bridge('x'), '...') branch against a live
    (native sqlite) bridge — reference fm_dbsrc.go:338-357."""
    from neo_server_spark.sources.bridge import default_registry
    from neo_server_spark.tql.script import TqlRunner

    db = str(tmp_path / "t.db")
    _seed_db(db)
    default_registry.register("liteb", "sqlite", db)
    try:
        out = TqlRunner(spark).run(
            "SQL(bridge('liteb'), `SELECT name, count(*) AS n, "
            "round(sum(v), 6) AS s FROM m GROUP BY name ORDER BY name`)\n"
            "JSON()")
        import json

        rows = json.loads(out)["data"]["rows"]
        exp = {}
        for i in range(100):
            k = f"tag-{i % 3}"
            c, s = exp.get(k, (0, 0.0))
            exp[k] = (c + 1, s + i * 1.5)
        assert rows == [[k, c, round(s, 6)]
                        for k, (c, s) in sorted(exp.items())]
    finally:
        default_registry.unregister("liteb")
    _ = os
