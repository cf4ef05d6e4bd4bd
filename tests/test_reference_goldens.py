"""Reference golden-file parity tests (SURVEY §5.1).

Each case reproduces a reference TQL golden test (mods/tql/tql_test.go +
mods/tql/test/*.csv) through our pipeline and asserts the reference's own
expected output.  Goldens are read from the read-only reference checkout;
numeric columns compare at the golden's printed precision.
"""

import math
import os

import pytest

import pyspark.sql.functions as F

from neo_server_spark.operators import maps, series
from neo_server_spark.operators.group import agg, group
from neo_server_spark.tql import fake

GOLDEN_DIR = "/root/reference/mods/tql/test"

needs_goldens = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available"
)


def load_golden(name, header=False):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    return lines[1:] if header else lines


@needs_goldens
def test_linspace_golden(spark):
    """TestLoader.tql: FAKE(linspace(1,10,19)) -> CSV (tql_test loader)."""
    want = [float(x) for x in load_golden("TestLoader.csv")]
    got = [r.x for r in fake.linspace(spark, 1, 10, 19).collect()]
    assert got == pytest.approx(want)


@needs_goldens
def test_group_golden(spark):
    """TestLoader_group.tql: GROUP(by(kind), sum, avg, mean) at precision 2."""
    import json

    data = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5),
            ("b", 6), ("c", 7), ("c", 8), ("c", 9)]
    df = fake.from_json_literal(
        spark, json.dumps([list(r) for r in data]), columns=["kind", "v"],
    ).select("kind", F.col("v").cast("double").alias("v"))
    out = group(df, by=[(F.col("kind"), "kind")],
                aggs=[agg.sum("v", "sum"), agg.avg("v", "avg"), agg.avg("v", "mean")])
    got = [f"{r.kind},{r.sum:.2f},{r.avg:.2f},{r.mean:.2f}" for r in out.collect()]
    assert got == load_golden("TestLoader_group.csv", header=True)


def test_map_avg_golden(spark):
    """tql_test.go:1553-1565 MAP_AVG over arrange(10,30,10) -> 10,15,20."""
    df = fake.arrange(spark, 10, 30, 10)
    out = series.map_avg(df, "x", out="avg", order_by="x")
    got = [(round(r.x), round(r.avg)) for r in out.orderBy("x").collect()]
    assert got == [(10, 10), (20, 15), (30, 20)]


@needs_goldens
@pytest.mark.parametrize("golden,no_wait", [
    ("movavg_result.csv", False),
    ("movavg_result_nowait.csv", True),
])
def test_movavg_golden(spark, golden, no_wait):
    """tql_test.go:1566-1582 MAP_MOVAVG(linspace(0,100,100), 10 [,noWait])."""
    df = fake.linspace(spark, 0, 100, 100)
    out = series.map_movavg(df, "x", 10, out="ma", order_by="x", no_wait=no_wait)
    got = [(r.x, r.ma) for r in out.orderBy("x").collect()]
    want = []
    for ln in load_golden(golden):
        xs, ms = ln.split(",")
        want.append((float(xs), None if ms == "NULL" else float(ms)))
    assert len(got) == len(want) == 100
    for (gx, gm), (wx, wm) in zip(got, want):
        assert gx == pytest.approx(wx, abs=5e-5)
        if wm is None:
            assert gm is None
        else:
            assert gm == pytest.approx(wm, abs=5e-5)


@needs_goldens
def test_oscillator_golden(spark):
    """tql_test.go:1967-1976 FAKE(oscillator(freq(1,1),freq(2,2),freq(3,3),
    range(1685714510s, 1s, 1ms))) vs oscillator_1Hz_2Hz_3Hz.csv."""
    t0 = 1_685_714_510 * 10**9
    df = fake.oscillator(spark, [(1, 1.0), (2, 2.0), (3, 3.0)],
                         t0, t0 + 10**9, 10**6)
    got = [(r.time, r.value) for r in df.orderBy("time").collect()]
    want = []
    for ln in load_golden("oscillator_1Hz_2Hz_3Hz.csv", header=True):
        _, t, v = ln.split(",")
        want.append((int(t), float(v)))
    assert len(got) == len(want) == 1000
    for (gt, gv), (wt, wv) in zip(got, want):
        assert gt == wt
        assert gv == pytest.approx(wv, abs=5e-6)


@needs_goldens
def test_sphere_golden(spark):
    """tql_test.go:1748-1754 FAKE(sphere(4,4)) at precision 6."""
    got = [(r.x, r.y, r.z) for r in fake.sphere(spark, 4, 4).collect()]
    want = []
    for ln in load_golden("sphere_4_4.csv", header=True):
        _, x, y, z = ln.split(",")
        want.append((float(x), float(y), float(z)))
    assert len(got) == len(want)
    norm = lambda rows: sorted(tuple(round(v, 6) + 0.0 for v in r) for r in rows)
    assert norm(got) == norm(want)


def test_filter_changed_golden(spark):
    """tql_test.go:1719-1746 FILTER_CHANGED with/without useFirstWithLast."""
    rows = [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0), ("B", 5.0),
            ("C", 6.0), ("C", 7.0), ("D", 8.0), ("D", 9.0)]
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], ["rn", "k", "v"])
    base = maps.filter_changed(df, "k", order_by="rn")
    assert [(r.k, r.v) for r in base.orderBy("rn").collect()] == \
        [("A", 1.0), ("B", 3.0), ("C", 6.0), ("D", 8.0)]
    fwl = maps.filter_changed(df, "k", order_by="rn", with_last=True)
    assert [(r.k, r.v) for r in fwl.orderBy("rn").collect()] == \
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 5.0),
         ("C", 6.0), ("C", 7.0), ("D", 8.0), ("D", 9.0)]


@needs_goldens
def test_transpose_golden(spark, tql_factory=None):
    """transpose_all.tql: csv literal -> DROP(1 header) -> TRANSPOSE -> CSV."""
    text = ("N001,1508806800,0.1,aa,0.2,0.3\n"
            "N002,1508806900,0.4,bb,0.5,0.6\n"
            "N003,1508807000,0.7,cc,0.8,0.9")
    df = fake.from_csv_literal(spark, text)
    out = maps.transpose(df)
    got = [r[-1] for r in out.collect()]
    assert sorted(got) == sorted(load_golden("transpose_all.csv"))


@needs_goldens
def test_groupbykey_aggregate_battery_golden(spark):
    """TestLoader_groupbykey.tql: the full GROUP aggregate battery — sum/avg/
    min/max/first/last/rss/rms/mean/median/medianInterpolated/stddev/stderr/
    entropy — against the reference's own expected CSV at precision 2.

    Pins the two semantics that diverge from SQL builtins: medianInterpolated
    is gonum's LinInterp cumulant (median(1,2,3)=1.50, not 2.00) and entropy
    is gonum stat.Entropy fed raw values (-Σ x·ln x, so a=-4.68)."""
    data = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5),
            ("b", 6), ("c", 7), ("c", 8), ("c", 9)]
    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(data)], ["idx", "name", "v"])
    out = group(df, by=[(F.col("name"), "name")], aggs=[
        agg.sum("v", "SUM"), agg.avg("v", "AVG"),
        agg.min("v", "MIN"), agg.max("v", "MAX"),
        agg.first("v", "idx", "1st"), agg.last("v", "idx", "LAST"),
        agg.rss("v", "RSS"), agg.rms("v", "RMS"), agg.avg("v", "MEAN"),
        agg.median("v", "MEDIAN"), agg.median_lininterp("v", "MEDIAN_I"),
        agg.stddev("v", "STDDEV"), agg.stderr("v", "STDERR"),
        agg.entropy_raw("v", "ENTROPY"),
    ])
    got = [
        r["name"] + "," + ",".join(
            f"{r[c]:.2f}" for c in ["SUM", "AVG", "MIN", "MAX", "1st", "LAST",
                                    "RSS", "RMS", "MEAN", "MEDIAN", "MEDIAN_I",
                                    "STDDEV", "STDERR", "ENTROPY"])
        for r in out.orderBy("name").collect()
    ]
    assert got == load_golden("TestLoader_groupbykey.csv", header=True)


@needs_goldens
def test_iris_group_golden(spark):
    """TestLoader_iris.tql: CSV(file, typed field()s) -> GROUP(by(species),
    min/max/median/avg) -> CSV(precision 3), against the reference's expected
    CSV over its own iris.data fixture."""
    df = spark.read.schema(
        "sepal_length double, sepal_width double, petal_length double, "
        "petal_width double, species string"
    ).csv(os.path.join(GOLDEN_DIR, "iris.data"))
    out = group(df, by=[(F.col("species"), "species")], aggs=[
        agg.min("sepal_length", "min_sl"),
        agg.max("sepal_width", "max_sw"),
        agg.median("petal_length", "med_pl"),
        agg.avg("petal_width", "avg_pw"),
    ])
    got = [
        f"{r.species},{r.min_sl:.3f},{r.max_sw:.3f},{r.med_pl:.3f},{r.avg_pw:.3f}"
        for r in out.orderBy("species").collect()
    ]
    assert got == load_golden("TestLoader_iris.csv", header=True)


@needs_goldens
def test_pi_mapvalue_golden(spark):
    """TestLoader_Pi.tql: FAKE(linspace(0,360,36)) -> three MAPVALUE inserts
    (deg->rad, sin, cos) -> CSV(precision(4))."""
    df = fake.linspace(spark, 0, 360, 36)
    out = maps.mapvalue(df, 1, F.col("x") * (2 * math.pi) / 360, name="rad")
    out = maps.mapvalue(out, 2, F.sin(F.col("rad")), name="s")
    out = maps.mapvalue(out, 3, F.cos(F.col("rad")), name="c")
    got = [",".join(f"{v:.4f}" for v in r) for r in out.collect()]
    assert got == load_golden("TestLoader_Pi.csv")


@needs_goldens
def test_iris_setosa_filter_group_golden(spark):
    """TestLoader_iris_setosa.tql: FILTER(strToUpper(species)=='IRIS-SETOSA')
    -> GROUP(min/median/avg/max/stddev) -> CSV(precision(2))."""
    from neo_server_spark.functions import strfn

    df = spark.read.schema(
        "sl double, sw double, pl double, pw double, species string"
    ).csv(os.path.join(GOLDEN_DIR, "iris.data"))
    df = maps.filter_(df, strfn.str_to_upper("species") == "IRIS-SETOSA")
    out = group(df, by=[(F.col("species"), "species")], aggs=[
        agg.min("sl", "Min"), agg.median("sl", "Median"), agg.avg("sl", "Avg"),
        agg.max("sl", "Max"), agg.stddev("sl", "StdDev"),
    ])
    r = out.first()
    got = f"{r.species},{r.Min:.2f},{r.Median:.2f},{r.Avg:.2f},{r.Max:.2f},{r.StdDev:.2f}"
    assert got == load_golden("TestLoader_iris_setosa.csv", header=True)[0]


@needs_goldens
def test_csv_charset_golden(spark):
    """tql_test.go CSV_charset_jp: CSV(file('/euc-jp.csv'), charset('EUC-JP'))
    -> CSV must decode to the reference's expected UTF-8 row."""
    from neo_server_spark.tql.pipeline import Tql

    df = Tql(spark).csv(os.path.join(GOLDEN_DIR, "euc-jp.csv"),
                        charset="EUC-JP").df
    row = df.first()
    assert list(row) == ["利用されてきた文字コー", "1701913182", "3.141592"]


@needs_goldens
def test_string_source_qq_shape(spark):
    """TestLoader_qq.tql: STRING(payload, separator('\\n'), trimspace(true))
    -> FILTER(len>0) -> MAPVALUE(strSub(v,0,2)) — the deterministic columns
    of the golden (the time('now') column is excluded)."""
    from pyspark.sql import Window

    from neo_server_spark.functions import strfn
    from neo_server_spark.tql.pipeline import Tql

    payload = (" 12345\n                     23456\n                     78901\n"
               "                     89012\n                     90123\n                  ")
    p = Tql(spark).strings(payload, separator="\n", trimspace=True, literal=True)
    out = (p.filter(F.length("value") > 0)
            .df.withColumn("rn", F.monotonically_increasing_id()))
    out = out.select(
        F.concat(F.lit("text_"),
                 F.row_number().over(Window.orderBy("rn")).cast("string")).alias("label"),
        strfn.str_sub("value", 0, 2).alias("head2"),
    )
    got = [(r.label, r.head2) for r in out.collect()]
    want_heads = [ln.split(",")[2] for ln in load_golden("TestLoader_qq.csv")]
    assert got == [(f"text_{i+1}", h[:2]) for i, h in enumerate(want_heads)]


@needs_goldens
def test_markdown_sink_goldens(spark):
    """task_test.go TestSinkMarkdown: STRING(file('/lines.txt'),
    separator('\\n')) -> MARKDOWN(html(false)) pipe table and
    MARKDOWN(html(true)) xhtml (golden markdown_xhtml.txt)."""
    from pyspark.sql import Window

    from neo_server_spark.codecs import encoders
    from neo_server_spark.tql.pipeline import Tql

    lines = Tql(spark).strings(os.path.join(GOLDEN_DIR, "lines.txt")).df
    md = encoders.to_markdown(lines.withColumnRenamed("value", "STRING"))
    assert md.splitlines() == ["|STRING|", "|:-----|", "|line1|", "|line2|",
                               "||", "|line4|"]
    numbered = lines.select(
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
         .alias("ROWNUM"),
        F.col("value").alias("STRING"),
    )
    want = open(os.path.join(GOLDEN_DIR, "markdown_xhtml.txt")).read().splitlines()
    got = encoders.to_markdown(numbered, html=True).splitlines()
    assert got == want


def test_kalman_golden(spark):
    """tql_test.go:1607-1620 MAP_KALMAN(model(1.0,1.0,2.0)) over
    [1.3, 10.2, 5.0, 3.4] -> [1.3, 5.7, 5.4, 4.4] at precision 1."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.3, 10.2, 5.0, 3.4])], ["t", "v"])
    out = series.map_kalman(df, "v", order_by="t")
    got = [round(r.kalman, 1) for r in out.orderBy("t").collect()]
    assert got == [1.3, 5.7, 5.4, 4.4]


@needs_goldens
def test_fft2d_golden(spark):
    """tql_test.go:1766-1774 FAKE(oscillator(range(+1s,'1s','100us'),
    freq(10,1), freq(50,2))) -> GROUPBYKEY -> FFT(minHz(0),maxHz(60)) vs
    fft2d.csv (hz, ampl at precision 6)."""
    t0 = 1_685_714_510 * 10**9
    df = fake.oscillator(spark, [(10, 1.0), (50, 2.0)], t0, t0 + 10**9, 100_000)
    out = series.fft(df, min_hz=0, max_hz=60)
    got = [(r.hz, r.ampl) for r in out.orderBy("hz").collect()]
    want = [tuple(map(float, ln.split(","))) for ln in load_golden("fft2d.csv")]
    assert len(got) == len(want) == 59
    for (gh, ga), (wh, wa) in zip(got, want):
        assert gh == pytest.approx(wh, abs=2e-6)
        assert ga == pytest.approx(wa, abs=2e-6)


@needs_goldens
def test_fft3d_golden(spark):
    """tql_test.go:1796-1807 FFT_3d: same oscillator keyed by
    roundTime(time,'500ms') -> per-bucket FFT(maxHz(60)) -> FLATTEN vs
    fft3d.csv (bucket_ns, hz, ampl)."""
    t0 = 1_685_714_510 * 10**9
    half = 500_000_000
    df = fake.oscillator(spark, [(10, 1.0), (50, 2.0)], t0, t0 + 10**9, 100_000)
    df = df.withColumn("bucket", F.col("time") - F.pmod(F.col("time"), F.lit(half)))
    out = series.fft(df, series=["bucket"], max_hz=60)
    got = [(r.bucket, r.hz, r.ampl) for r in out.orderBy("bucket", "hz").collect()]
    want = [(int(p[0]), float(p[1]), float(p[2]))
            for p in (ln.split(",") for ln in load_golden("fft3d.csv"))]
    assert len(got) == len(want) == 58
    for (gb, gh, ga), (wb, wh, wa) in zip(got, want):
        assert gb == wb
        assert gh == pytest.approx(wh, abs=2e-6)
        assert ga == pytest.approx(wa, abs=2e-6)


_TRANSPOSE_ROWS = ("N001,1508806800,0.1,aa,0.2,0.3\n"
                   "N002,1508806900,0.4,bb,0.5,0.6\n"
                   "N003,1508807000,0.7,cc,0.8,0.9")
_TRANSPOSE_COLS = ["name", "time", "v1", "tail", "v2", "v3"]


@needs_goldens
def test_transpose_fixed_header_golden(spark):
    """transpose_hdr.tql: TRANSPOSE(header(true), fixed 0,1,3) — fixed cols
    ride along, melted cols labeled by source column name."""
    df = fake.from_csv_literal(spark, _TRANSPOSE_ROWS, columns=_TRANSPOSE_COLS)
    out = maps.transpose(df, fixed=(0, 1, 3), header=True)
    got = sorted(",".join(str(v) for v in r) for r in out.collect())
    assert got == sorted(load_golden("transpose_hdr.csv", header=True))


@needs_goldens
def test_transpose_all_header_golden(spark):
    """transpose_all_hdr.tql: TRANSPOSE(header(true)) with no fixed cols —
    every column melts to a (label, value) row."""
    df = fake.from_csv_literal(spark, _TRANSPOSE_ROWS, columns=_TRANSPOSE_COLS)
    out = maps.transpose(df, header=True)
    got = sorted(",".join(str(v) for v in r) for r in out.collect())
    assert got == sorted(load_golden("transpose_all_hdr.csv"))


def test_text_sink_first_last_envelope(spark):
    """tql_test.go:2370-2387 sqlite-to-text: per-row template with
    .IsFirst/.IsLast guards — our header/footer analogue renders the same
    envelope shape."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame(
        [(100, "alpha", 10, "street-100"), (200, "bravo", 20, "street-200")],
        ["id", "name", "age", "address"])
    txt = encoders.to_text(df, "- {id}: {name}, {age}, {address}",
                           header="--begin--", footer="--end--")
    assert txt.splitlines() == [
        "--begin--",
        "- 100: alpha, 10, street-100",
        "- 200: bravo, 20, street-200",
        "--end--",
    ]


@pytest.fixture(scope="module")
def envelope_df(spark):
    return spark.createDataFrame(
        [("name1", 1676432363333444555, 0.1234, "Office"),
         ("name2", 1676432364666777888, 0.2345, "Home")],
        ["name", "time", "value", "place"])


_ENVELOPE_TYPES = ["string", "datetime", "double", "string"]


def _strip_elapse(s):
    return s[:s.rindex(',"elapse')]


def test_json_envelope_transpose_golden(envelope_df):
    """mods/codec/internal/json/json_test.go TestEncoderTranspose — byte-exact."""
    from neo_server_spark.codecs import encoders
    got = _strip_elapse(encoders.to_json_envelope(
        envelope_df, transpose=True, rows_flatten=True, types=_ENVELOPE_TYPES))
    assert got == (
        '{"data":{"columns":["name","time","value","place"],'
        '"types":["string","datetime","double","string"],'
        '"cols":[["name1","name2"],[1676432363333444555,1676432364666777888],'
        '[0.1234,0.2345],["Office","Home"]]},"success":true,"reason":"success"')


def test_json_envelope_rows_flatten_golden(envelope_df):
    """json_test.go TestEncoderRowsFlatten (+WithRownum) — byte-exact."""
    from neo_server_spark.codecs import encoders
    got = _strip_elapse(encoders.to_json_envelope(
        envelope_df, rows_flatten=True, types=_ENVELOPE_TYPES))
    assert got == (
        '{"data":{"columns":["name","time","value","place"],'
        '"types":["string","datetime","double","string"],'
        '"rows":["name1",1676432363333444555,0.1234,"Office",'
        '"name2",1676432364666777888,0.2345,"Home"]},"success":true,"reason":"success"')
    got = _strip_elapse(encoders.to_json_envelope(
        envelope_df, rows_flatten=True, rownum=True, types=_ENVELOPE_TYPES))
    assert got == (
        '{"data":{"columns":["ROWNUM","name","time","value","place"],'
        '"types":["int64","string","datetime","double","string"],'
        '"rows":[1,"name1",1676432363333444555,0.1234,"Office",'
        '2,"name2",1676432364666777888,0.2345,"Home"]},"success":true,"reason":"success"')


def test_json_envelope_rows_array_golden(envelope_df):
    """json_test.go TestEncoderRowsArray — rowsArray wins over other flags,
    object keys alphabetical."""
    from neo_server_spark.codecs import encoders
    got = _strip_elapse(encoders.to_json_envelope(
        envelope_df, rows_flatten=True, rows_array=True, types=_ENVELOPE_TYPES))
    assert got == (
        '{"data":{"columns":["name","time","value","place"],'
        '"types":["string","datetime","double","string"],'
        '"rows":[{"name":"name1","place":"Office","time":1676432363333444555,"value":0.1234},'
        '{"name":"name2","place":"Home","time":1676432364666777888,"value":0.2345}]},'
        '"success":true,"reason":"success"')


def test_csv_encoder_golden(spark):
    """csv_encode_test.go TestCsvEncoder: ROWNUM + precision(3) +
    KITCHEN timeformat, NULL substitution default."""
    from neo_server_spark.codecs import encoders
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("col1", T.IntegerType()),
        T.StructField("col2", T.DoubleType()),
        T.StructField("col3", T.StringType()),
        T.StructField("col4", T.LongType()),
        T.StructField("col5", T.LongType()),
        T.StructField("col6", T.IntegerType()),
    ])
    ts = 1691800174 * 10**9 + 123456789
    df = spark.createDataFrame(
        [(1, 3.141592, "text some", ts, 98765, 16),
         (1, 3.141592, "text some", ts, 98765, None)], schema)
    got = encoders.to_csv(df, rownum=True, precision=3,
                          timeformat="KITCHEN", time_cols=("col4",))
    assert got.splitlines() == [
        "ROWNUM,col1,col2,col3,col4,col5,col6",
        "1,1,3.142,text some,12:29:34AM,98765,16",
        "2,1,3.142,text some,12:29:34AM,98765,NULL",
    ]
    got = encoders.to_csv(df, rownum=True, precision=2, substitute_null=1.234567,
                          timeformat="KITCHEN", time_cols=("col4",))
    assert got.splitlines()[2] == "2,1,3.14,text some,12:29:34AM,98765,1.23"


def test_box_encoder_golden(spark):
    """box_encode_test.go TestBox1: light style, uppercased headings,
    right-aligned ROWNUM, precision(3), KITCHEN timeformat — byte-exact."""
    from neo_server_spark.codecs import encoders
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("col1", T.IntegerType()),
        T.StructField("col2", T.DoubleType()),
        T.StructField("col3", T.StringType()),
        T.StructField("col4", T.LongType()),
        T.StructField("col5", T.LongType()),
        T.StructField("col6", T.IntegerType()),
    ])
    ts = 1691800174 * 10**9 + 123456789
    df = spark.createDataFrame(
        [(1, 3.141592, "text some", ts, 98765, 16),
         (1, 0.1400, "text some", ts, 98765, None)], schema)
    got = encoders.to_box(df, rownum=True, precision=3,
                          timeformat="KITCHEN", time_cols=("col4",))
    assert got.splitlines() == [
        "┌────────┬──────┬───────┬───────────┬────────────┬───────┬──────┐",
        "│ ROWNUM │ COL1 │ COL2  │ COL3      │ COL4       │ COL5  │ COL6 │",
        "├────────┼──────┼───────┼───────────┼────────────┼───────┼──────┤",
        "│      1 │ 1    │ 3.142 │ text some │ 12:29:34AM │ 98765 │ 16   │",
        "│      2 │ 1    │ 0.140 │ text some │ 12:29:34AM │ 98765 │ NULL │",
        "└────────┴──────┴───────┴───────────┴────────────┴───────┴──────┘",
    ]


def test_ndjson_encoder_goldens(spark):
    """ndjson/encode_test.go TestJsonEncode: epoch-ns default, "s"
    timeformat, and Default-format with ROWNUM — byte-exact lines."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame(
        [("my-car", 1670380342000000000, 1.0001),
         ("my-car", 1670380343000000000, 2.0002)],
        ["name", "time", "value"])
    assert encoders.to_ndjson(df).splitlines() == [
        '{"name":"my-car","time":1670380342000000000,"value":1.0001}',
        '{"name":"my-car","time":1670380343000000000,"value":2.0002}']
    assert encoders.to_ndjson(df, timeformat="s").splitlines() == [
        '{"name":"my-car","time":1670380342,"value":1.0001}',
        '{"name":"my-car","time":1670380343,"value":2.0002}']
    assert encoders.to_ndjson(df, rownum=True,
                              timeformat="2006/01/02 15:04:05").splitlines() == [
        '{"ROWNUM":1,"name":"my-car","time":"2022/12/07 02:32:22","value":1.0001}',
        '{"ROWNUM":2,"name":"my-car","time":"2022/12/07 02:32:23","value":2.0002}']


def test_ndjson_binary_hex(spark):
    """encode_test.go binary case: bytes render as 0x-hex strings."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame([("my-car", bytearray(b"abc"))], ["name", "value"])
    assert encoders.to_ndjson(df).strip() == '{"name":"my-car","value":"0x616263"}'


def test_box_encoder_nano_golden(spark):
    """box_encode_test.go TestNano("us"): ASCII (simple) style with epoch
    passthrough timeformat — time stays an integer at µs resolution."""
    from neo_server_spark.codecs import encoders
    ts = 1691800174 * 10**9 + 123456789
    df = spark.createDataFrame(
        [(3.141591, 3.141592, "1", ts, "127.0.0.1", 16.0),
         (1.0, 3.141592, "text some", ts, "127.0.0.1", 3.141591)],
        ["col1", "col2", "col3", "col4", "col5", "col6"])
    got = encoders.to_box(df, precision=0, timeformat="us",
                          time_cols=("col4",), style="simple")
    assert got.splitlines() == [
        "+------+------+-----------+------------------+-----------+------+",
        "| COL1 | COL2 | COL3      | COL4             | COL5      | COL6 |",
        "+------+------+-----------+------------------+-----------+------+",
        "| 3    | 3    | 1         | 1691800174123456 | 127.0.0.1 | 16   |",
        "| 1    | 3    | text some | 1691800174123456 | 127.0.0.1 | 3    |",
        "+------+------+-----------+------------------+-----------+------+",
    ]


def test_json_envelope_float_token_golden(spark):
    """json_encode_test.go TestPrecisionFloat64MarshalJSON applied through
    the envelope: AppendJSONValue renders float64 via AppendPrecisionFloat64
    — integral doubles lose the decimal point, trailing zeros trim,
    NaN/±Inf become quoted tokens, -0.0 normalizes to 0."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame(
        [(12.34, 10.0, -0.0, float("nan"), float("inf"), float("-inf"),
          20.55 - 22.2)],
        ["a", "b", "c", "d", "e", "f", "g"])
    got = _strip_elapse(encoders.to_json_envelope(df))
    assert '"rows":[[12.34,10,0,"NaN","+Inf","-Inf",-1.65]]' in got


def test_json_envelope_precision_golden(spark):
    """SetPrecision(2): fixed decimals survive into the JSON number token."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame([(3.5, 1.25)], ["x", "y"])
    got = _strip_elapse(encoders.to_json_envelope(df, precision=2))
    assert '"rows":[[3.50,1.25]]' in got


def test_json_envelope_binaryformat_golden(spark):
    """json_encode_test.go TestBinaryFormat — []byte through the
    BinaryFormatter, with rownum."""
    from neo_server_spark.codecs import encoders
    data = bytes([0x01, 0x02, 0x03, 0x04, 0x05, 0x06])
    for fmt, want in [
            ("preview", '[[1,"preview","0x0102030405.."]]'),
            ("hex", '[[1,"hex","0x010203040506"]]'),
            ("bytes", '[[1,"bytes","[1 2 3 4 5 6]"]]'),
            ("base64", '[[1,"base64","AQIDBAUG"]]'),
            ("_unknown_", '[[1,"_unknown_","0x010203040506"]]')]:
        df = spark.createDataFrame([(fmt, data)], ["FORMAT", "BIN"])
        got = encoders.to_json_envelope(df, rownum=True, binaryformat=fmt)
        assert want in got, (fmt, got)


def test_json_envelope_rows_array_rownum_golden(spark):
    """json_encode.go:229-231: rowsArray mode injects a ROWNUM key into
    each row object."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame([("a", 1.0), ("b", 2.5)], ["name", "value"])
    got = _strip_elapse(encoders.to_json_envelope(
        df, rows_array=True, rownum=True))
    assert ('"rows":[{"ROWNUM":1,"name":"a","value":1},'
            '{"ROWNUM":2,"name":"b","value":2.5}]') in got


def test_ndjson_float_and_precision_golden(spark):
    """ndjson/encode_test.go TestNdjsonEncodeFloatFormatting(+WithPrecision):
    floats via AppendJSONValue — trailing-zero trim, integral doubles bare,
    NaN quoted; fixed precision keeps its decimals."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame(
        [(12.34, 10.0, float("nan"))], ["a", "b", "c"])
    assert encoders.to_ndjson(df).strip() == \
        '{"a":12.34,"b":10,"c":"NaN"}'
    assert encoders.to_ndjson(df, precision=2).strip() == \
        '{"a":12.34,"b":10.00,"c":"NaN"}'


def test_ndjson_binaryformat_golden(spark):
    """encode.go AddRow []byte branch with an explicit BinaryFormatter."""
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame(
        [("x", bytes([1, 2, 3, 4, 5, 6]))], ["name", "value"])
    assert encoders.to_ndjson(df, binaryformat="base64").strip() == \
        '{"name":"x","value":"AQIDBAUG"}'
    assert encoders.to_ndjson(df, binaryformat="bytes").strip() == \
        '{"name":"x","value":"[1 2 3 4 5 6]"}'
