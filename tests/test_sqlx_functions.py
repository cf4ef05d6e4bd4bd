"""SQL dialect, rollup router, catalog, and scalar-function tests."""

import pyspark.sql.functions as F
import pytest

from neo_server_spark.functions import strfn, timefn
from neo_server_spark.sqlx import catalog, dialect
from neo_server_spark.sqlx.rollup import HOUR, MINUTE, SECOND, RollupRouter


# ---------------------------------------------------------------- dialect

def test_rewrite_decode():
    out = dialect.rewrite_lake_sql("SELECT DECODE(a, 'x', 1, 0) FROM t")
    assert "CASE WHEN a <=> 'x' THEN 1 ELSE 0 END" in out


def test_rewrite_decode_nested():
    out = dialect.rewrite_lake_sql("SELECT DECODE(f(a, b), g(1, 2), h(3), 9) FROM t")
    assert out == "SELECT CASE WHEN f(a, b) <=> g(1, 2) THEN h(3) ELSE 9 END FROM t"


def test_rewrite_first_last_scan_backward():
    out = dialect.rewrite_lake_sql(
        "SELECT /*+ SCAN_BACKWARD(T) */ FIRST(time, value), LAST(time, value) FROM T"
    )
    assert "min_by(value, time)" in out and "max_by(value, time)" in out
    assert "SCAN_BACKWARD" not in out and out.rstrip().endswith("ORDER BY time DESC")


def test_lake_sql_end_to_end(spark, sf_dir):
    from neo_server_spark import io as nio

    nio.events_as_tag(spark, sf_dir).createOrReplaceTempView("tagt")
    df = dialect.lake_sql(spark, """
        SELECT name, DATE_TRUNC('HOUR', time, 1) AS bucket,
               FIRST(time, value) AS f, LAST(time, value) AS l,
               DECODE(name, 'click', 1, 0) AS is_click
        FROM tagt GROUP BY name, DATE_TRUNC('HOUR', time, 1)
    """)
    rows = df.limit(5).collect()
    assert rows and all(r.bucket % HOUR == 0 for r in rows)


# ---------------------------------------------------------------- rollup

@pytest.fixture(scope="module")
def router(spark, sf_dir, tmp_path_factory):
    from neo_server_spark import io as nio

    base = str(tmp_path_factory.mktemp("rollups"))
    r = RollupRouter(spark, base)
    r.build(nio.events_as_tag(spark, sf_dir))
    return r


def test_rollup_routes_to_coarsest(router):
    assert router.pick_level(HOUR) == "hour"
    assert router.pick_level(15 * MINUTE) == "min"
    assert router.pick_level(90 * SECOND) == "sec"
    assert router.pick_level(1500) is None


def test_rollup_matches_raw(spark, sf_dir, router):
    from neo_server_spark import io as nio

    raw = nio.events_as_tag(spark, sf_dir)
    bucket = (F.floor(F.col("time") / F.lit(HOUR)) * F.lit(HOUR)).cast("long")
    expect = {
        (r.name, r.time): (r.cnt, r.s, r.mn, r.mx)
        for r in raw.groupBy("name", bucket.alias("time")).agg(
            F.count("value").alias("cnt"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx")).collect()
    }
    got = {
        (r.name, r.time): (r.cnt, r.s, r.mn, r.mx)
        for r in router.query(HOUR, {"cnt": "count", "s": "sum", "mn": "min", "mx": "max"}).collect()
    }
    assert set(got) == set(expect)
    for k, (cnt, s, mn, mx) in expect.items():
        g = got[k]
        assert g[0] == cnt and g[2] == mn and g[3] == mx
        assert g[1] == pytest.approx(s, rel=1e-12)


def test_rollup_first_last(router, spark, sf_dir):
    from neo_server_spark import io as nio

    raw = nio.events_as_tag(spark, sf_dir)
    exp = raw.groupBy("name").agg(F.min_by("value", "time").alias("f")).collect()
    expect = {r.name: r.f for r in exp}
    day = 24 * HOUR
    got = router.query(day, {"f": "first"}).groupBy("name").agg(
        F.min_by("f", "time").alias("f")).collect()
    for r in got:
        assert r.f == expect[r.name]


# ---------------------------------------------------------------- catalog

def test_show_tags(spark, sf_dir):
    from neo_server_spark import io as nio

    out = catalog.show(spark, "tags", nio.events_as_tag(spark, sf_dir)).collect()
    assert len(out) == 5 and all(r.row_count > 0 for r in out)


def test_show_tables_and_columns(spark, sf_dir):
    from neo_server_spark import io as nio

    nio.load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    tables = catalog.show(spark, "tables").collect()
    assert any(t.name == "nation_v" for t in tables)
    cols = catalog.show(spark, "columns", "nation_v").collect()
    assert [c.name for c in cols] == ["n_nationkey", "n_name", "n_regionkey"]


def test_exec_table_flush(spark, sf_dir, tmp_path):
    from neo_server_spark import io as nio

    path = str(tmp_path / "flush_t")
    nio.load_table(spark, sf_dir, "nation").write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("flush_t")
    n0 = spark.table("flush_t").count()
    catalog.exec_table_flush(spark, "flush_t")     # refresh is a no-op on a fresh view
    assert spark.table("flush_t").count() == n0


def test_show_rollup(router):
    out = catalog.show(None, "rollup", router, level="hour").collect()
    assert len(out) == 5


# ---------------------------------------------------------------- functions

def test_parse_duration():
    assert timefn.parse_duration("1s") == 10**9
    assert timefn.parse_duration("1h30m") == 5400 * 10**9
    assert timefn.parse_duration("500ms") == 5 * 10**8
    with pytest.raises(ValueError):
        timefn.parse_duration("xyz")


def test_time_functions(spark):
    df = spark.createDataFrame([(1704067200_123456789,)], ["t"])
    row = df.select(
        timefn.round_time("t", "1s").alias("r"),
        timefn.time_year("t").alias("y"),
        timefn.str_time("t", "yyyy-MM-dd").alias("s"),
        timefn.time_unix("t").alias("u"),
    ).first()
    assert row.r == 1704067200 * 10**9
    assert row.y == 2024 and row.s == "2024-01-01" and row.u == 1704067200


def test_str_functions(spark):
    df = spark.createDataFrame([("  hello-world  ",)], ["s"])
    row = df.select(
        strfn.str_trim_space("s").alias("t"),
        strfn.str_has_prefix(strfn.str_trim_space("s"), "hello").alias("p"),
        strfn.glob("hello*", strfn.str_trim_space("s")).alias("g"),
        strfn.str_index(strfn.str_trim_space("s"), "world").alias("i"),
    ).first()
    assert row.t == "hello-world" and row.p and row.g and row.i == 6


def test_geo_functions(spark):
    from neo_server_spark.functions import geofn

    df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], ["a", "b", "c", "d"])
    row = df.select(
        geofn.haversine_m("a", "b", "c", "d").alias("m"),
        geofn.geo_point("a", "b").alias("gj"),
    ).first()
    assert row.m == pytest.approx(111194.9, rel=1e-3)
    assert '"type":"Point"' in row.gj


def test_round_time_ns_precision(spark):
    """Epoch-ns floor must be integer-exact: double arithmetic rounds a
    timestamp 64 ns before an hour boundary INTO the next hour (ns values
    exceed double's 2^53 mantissa)."""
    from neo_server_spark.functions.timefn import round_time
    from neo_server_spark.sqlx.dialect import register_dialect

    h = 3_600 * 10**9
    t_edge = 480_000 * h - 64          # 64 ns before the boundary
    t_exact = 480_000 * h
    df = spark.createDataFrame([(t_edge,), (t_exact,)], ["t"])
    got = [r.b for r in df.select(round_time("t", h).alias("b")).orderBy("t").collect()]
    assert got == [479_999 * h, 480_000 * h]

    register_dialect(spark)
    df.createOrReplaceTempView("edge_ts")
    got_sql = [r.b for r in spark.sql(
        "SELECT date_trunc_ns('HOUR', t, 1) AS b FROM edge_ts ORDER BY t").collect()]
    assert got_sql == [479_999 * h, 480_000 * h]


def test_show_storage_and_indexes(spark, sf_dir, tmp_path):
    from neo_server_spark import io as nio

    day_ns = 86_400 * 10**9
    df = spark.range(300).selectExpr(
        "concat('t', id % 3) AS name",
        f"CAST(id % 3 AS LONG) * {day_ns} + 7 AS time",
        "CAST(id AS DOUBLE) AS value",
    )
    path = str(tmp_path / "tt")
    nio.write_tag_table(df, path, mode="overwrite")
    st = catalog.show_storage(spark, path).collect()
    assert len(st) == 3 and all(r.file_count >= 1 and r.total_bytes > 0 for r in st)
    assert {r.partition for r in st} == {"_day=19700101", "_day=19700102", "_day=19700103"}

    nio.write_bucketed(df, "nb_idx_demo", 4, key="name", sort_cols=("time",))
    try:
        idx = catalog.show_indexes(spark, "nb_idx_demo").collect()
        assert ("nb_idx_demo", "name", "bucket") in [tuple(r) for r in idx]
    finally:
        spark.sql("DROP TABLE IF EXISTS nb_idx_demo")


def test_mathfn_matches_python_math(spark):
    import math

    from neo_server_spark.functions import mathfn

    vals = [0.01, 1.0, 2.5, 3.0, 7.5, -7.5, -2.7, 256.75, 490.02]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        mathfn.exp2(mathfn.mod("x", 8.0)).alias("e2"),
        mathfn.trunc("x").alias("tr"),
        mathfn.mod("x", 2.0).alias("md"),
        mathfn.remainder("x", 2.0).alias("rem"),
        mathfn.min2("x", 1.5).alias("mn"),
        mathfn.max2("x", 1.5).alias("mx"),
    ).collect()
    for v, r in zip(vals, got):
        assert r.e2 == pytest.approx(math.exp2(math.fmod(v, 8.0)), rel=1e-12)
        assert r.tr == math.trunc(v)
        assert r.md == math.fmod(v, 2.0)          # sign of dividend
        assert r.rem == math.remainder(v, 2.0)    # IEEE half-even quotient
        assert r.mn == min(v, 1.5) and r.mx == max(v, 1.5)


def test_geo_shape_builders(spark):
    import json

    from neo_server_spark.functions import geofn

    df = spark.createDataFrame(
        [([37.0, 37.5, 38.0], [127.0, 127.5, 127.0])],
        "lat array<double>, lon array<double>")
    row = df.select(
        geofn.geo_line_string("lat", "lon").alias("ls"),
        geofn.geo_multi_point("lat", "lon").alias("mp"),
        geofn.geo_polygon("lat", "lon").alias("pg"),
    ).first()
    ls, mp, pg = json.loads(row.ls), json.loads(row.mp), json.loads(row.pg)
    assert ls == {"type": "LineString",
                  "coordinates": [[127.0, 37.0], [127.5, 37.5], [127.0, 38.0]]}
    assert mp["type"] == "MultiPoint" and len(mp["coordinates"]) == 3
    # polygon ring auto-closes back to the first vertex
    assert pg["coordinates"][0][0] == pg["coordinates"][0][-1] == [127.0, 37.0]
    assert len(pg["coordinates"][0]) == 4


def test_named_timeformats_go_parity(spark):
    """Pin str_time_named against Go time.Format outputs for the registry in
    mods/util/time_formats.go (instant 2023-03-14T01:02:03.456789012Z; Go
    outputs computed from the stdlib layout rules)."""
    ns = 1678755723_456789012  # 2023-03-14 01:02:03.456789012 UTC (a Tuesday)
    zero_frac = 1678755723_000000000
    df = spark.createDataFrame([(ns,), (zero_frac,)], "t long")

    expect = {
        "Default":     ["2023-03-14 01:02:03.456", "2023-03-14 01:02:03"],
        "Default_ns":  ["2023-03-14 01:02:03.456789012", "2023-03-14 01:02:03"],
        "Default.us":  ["2023-03-14 01:02:03.456789", "2023-03-14 01:02:03.000000"],
        "DateTime":    ["2023-03-14 01:02:03", "2023-03-14 01:02:03"],
        "RFC3339":     ["2023-03-14T01:02:03Z", "2023-03-14T01:02:03Z"],
        "Kitchen":     ["1:02:03AM", "1:02:03AM"],
        "Ansic":       ["Tue Mar 14 01:02:03 2023", "Tue Mar 14 01:02:03 2023"],
        "Stamp":       ["Mar 14 01:02:03", "Mar 14 01:02:03"],
        "StampMilli":  ["Mar 14 01:02:03.456", "Mar 14 01:02:03.000"],
        "RFC1123":     ["Tue, 14 Mar 2023 01:02:03 UTC", "Tue, 14 Mar 2023 01:02:03 UTC"],
        "s.ms":        ["03.456", "03.000"],
        "s_ns":        ["03.456789012", "03"],
    }
    sel = [timefn.str_time_named("t", name).alias(f"c{i}")
           for i, name in enumerate(expect)]
    rows = df.orderBy(F.desc("t")).select(sel).collect()
    for i, (name, want) in enumerate(expect.items()):
        got = [rows[0][i], rows[1][i]]
        assert got == want, f"{name}: {got} != {want}"


def test_csv_timeformat_option(spark):
    from neo_server_spark.codecs import encoders

    df = spark.createDataFrame(
        [("a", 1678755723_456000000, 1.5)], "name string, time long, value double")
    out = encoders.to_csv(df, timeformat="Default")
    assert out == "name,time,value\na,2023-03-14 01:02:03.456,1.5\n"


def test_time_unix_boundary_exact(spark):
    """floor(t/1e9) in double floors …_999999999 into the NEXT second —
    the decimal path must not."""
    from neo_server_spark.functions import timefn
    t = 1_691_800_174_999_999_999
    df = spark.createDataFrame([(t,)], ["t"])
    r = df.select(
        timefn.time_unix("t").alias("s"),
        timefn.time_unix_milli("t").alias("ms"),
        timefn.time_unix_micro("t").alias("us"),
        timefn.time_nanosecond("t").alias("nsec"),
    ).first()
    assert r.s == 1_691_800_174
    assert r.ms == 1_691_800_174_999
    assert r.us == 1_691_800_174_999_999
    assert r.nsec == 999_999_999


def test_time_iso_extractors_match_python(spark):
    """timeISOWeek/timeISOYear/timeYearDay vs datetime.isocalendar over
    year-boundary dates (where ISO year != calendar year)."""
    import datetime as dt
    from neo_server_spark.functions import timefn
    days = ["2021-01-01", "2021-01-04", "2020-12-31", "2016-01-03",
            "2015-12-28", "2024-12-30", "2023-01-01"]
    rows = [(int(dt.datetime.fromisoformat(d + "T12:00:00+00:00").timestamp()) * 10**9,)
            for d in days]
    df = spark.createDataFrame(rows, ["t"])
    got = df.select(
        timefn.time_isoyear("t").alias("iy"),
        timefn.time_isoweek("t").alias("iw"),
        timefn.time_yearday("t").alias("yd"),
    ).collect()
    for d, r in zip(days, got):
        iso = dt.date.fromisoformat(d).isocalendar()
        assert (r.iy, r.iw) == (iso[0], iso[1]), d
        assert r.yd == dt.date.fromisoformat(d).timetuple().tm_yday, d


# ---------------------------------------------------------------------------
# VOLATILE/LOOKUP/KEYVALUE keyed tables (spi/do.go:197-207)
# ---------------------------------------------------------------------------

def test_keyed_table_upsert_delete(spark, tmp_path):
    from neo_server_spark.sqlx.keyvalue import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "lut"), key="name", kind="lookup")
    t.upsert([{"name": "FA1_CNC", "factory": "FA1", "equipment": "CNC"},
              {"name": "FA4_MILL", "factory": "FA4", "equipment": "MILLING"},
              {"name": "FA2_LATHE", "factory": "FA2", "equipment": "LATHE"}])
    assert t.df().count() == 3
    # ON DUPLICATE KEY UPDATE: update one, insert one
    t.upsert([{"name": "FA1_CNC", "factory": "FA1", "equipment": "CNC-5AX"},
              {"name": "FA9_EDM", "factory": "FA9", "equipment": "EDM"}])
    got = {r.name: r.equipment for r in t.df().collect()}
    assert got == {"FA1_CNC": "CNC-5AX", "FA4_MILL": "MILLING",
                   "FA2_LATHE": "LATHE", "FA9_EDM": "EDM"}
    t.delete(["FA2_LATHE"])
    assert sorted(r.name for r in t.df().collect()) == \
        ["FA1_CNC", "FA4_MILL", "FA9_EDM"]


def test_keyed_table_partial_upsert_keeps_columns(spark, tmp_path):
    """Reference ON DUPLICATE KEY UPDATE updates only PROVIDED columns: a
    partial-column upsert must not null surviving attributes, and a new
    column must extend the table (NULL for untouched rows)."""
    from neo_server_spark.sqlx.keyvalue import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "lut2"), key="name", kind="lookup")
    t.upsert([{"name": "FA1", "factory": "F1", "equipment": "CNC"},
              {"name": "FA2", "factory": "F2", "equipment": "LATHE"}])
    # partial update: only 'factory' provided — 'equipment' must survive
    t.upsert([{"name": "FA1", "factory": "F1-NEW"}])
    got = {r.name: (r.factory, r.equipment) for r in t.df().collect()}
    assert got == {"FA1": ("F1-NEW", "CNC"), "FA2": ("F2", "LATHE")}
    # new column extends the schema; existing rows read NULL
    t.upsert([{"name": "FA2", "tier": "gold"}])
    got = {r.name: (r.equipment, r.tier) for r in t.df().collect()}
    assert got == {"FA1": ("CNC", None), "FA2": ("LATHE", "gold")}


def test_keyed_table_isolation_and_broadcast_join(spark, tmp_path):
    from neo_server_spark.sqlx.keyvalue import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "kv"), key="k", kind="keyvalue")
    t.upsert([{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    before = t.df()          # reader resolves snapshot pointer at read time
    n_before = before.count()
    t.upsert([{"k": "c", "v": 3}])
    assert n_before == 2 and before.count() == 2     # old handle stays stable
    assert t.df().count() == 3
    # dimension-sized snapshot broadcasts when joined against a big side
    big = spark.range(100_000).selectExpr("id", "chr(97 + cast(id % 3 as int)) AS k")
    plan = big.join(t.df(), "k")._sc._jvm.PythonSQLUtils.explainString(
        big.join(t.df(), "k")._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan


def test_show_lsm_levels(spark, tmp_path):
    """SHOW LSM (spi/show.go:988): streaming slivers classify as level-0
    merge debt; compaction promotes partitions toward at-target levels."""
    from neo_server_spark import io as nio

    day_ns = 86_400 * 10**9
    df = spark.range(200).selectExpr(
        "concat('t', id % 2) AS name",
        f"CAST(id % 2 AS LONG) * {day_ns} + 5 AS time",
        "CAST(id AS DOUBLE) AS value")
    path = str(tmp_path / "lsm_t")
    nio.write_tag_table(df, path, mode="overwrite")
    lsm = catalog.show_lsm(spark, path).collect()
    assert lsm and all(r.index_name == "TAG_DAY_IDX" for r in lsm)
    assert {r.table_name for r in lsm} == {"_day=19700101", "_day=19700102"}
    assert all(r.level == 0 and r["count"] >= 1 for r in lsm)  # tiny files = L0


def test_show_rollup_gap(spark, sf_dir, router):
    """SHOW ROLLUPGAP (spi/show.go:1206): freshly built rollups have no
    backlog; appending newer source rows opens a positive gap."""
    from neo_server_spark import io as nio

    src = nio.events_as_tag(spark, sf_dir)
    gap0 = {r.rollup_name: r for r in catalog.show_rollup_gap(router, src).collect()}
    assert set(gap0) == {"sec", "min", "hour"}
    assert all(r.gap == 0 for r in gap0.values())
    assert all(r.run_state == "SLEEPING" for r in gap0.values())
    # source that extends past the rollup frontier -> positive gap
    future = src.limit(50).withColumn(
        "time", (F.col("time").cast("long") + F.lit(365 * 86_400 * 10**9)))
    extended = src.select("name", "time", "value").unionByName(
        future.select("name", "time", "value"))
    gap1 = {r.rollup_name: r.gap for r in
            catalog.show_rollup_gap(router, extended).collect()}
    assert all(g == 50 for g in gap1.values())
