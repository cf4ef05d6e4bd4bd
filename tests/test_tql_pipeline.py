"""TQL DSL end-to-end tests — the reference's golden-file style: small
pipeline script → exact expected output (mods/tql/tql_test.go)."""

import math

import pytest

from neo_server_spark.tql import Tql, fake


@pytest.fixture()
def tql(spark, sf_dir):
    return Tql(spark, sf_dir)


def test_sql_select_pipeline(tql):
    out = (
        tql.sql_select("value", table="events", tag="purchase")
        .take(5, order_by=["time"])
        .to_df()
    )
    rows = out.collect()
    assert len(rows) == 5
    assert out.columns == ["name", "time", "value"]
    assert all(r.name == "purchase" for r in rows)


def test_sql_source(tql):
    out = tql.sql("SELECT count(*) AS n FROM lineitem").to_df().first()
    assert out.n > 0


def test_mapvalue_chain_csv_sink(tql):
    csv_text = (
        tql.fake(fake.linspace(tql.spark, 0, 4, 5))
        .mapvalue(0, "x * 2", "y")
        .csv()
    )
    # default precision = reference AppendPrecisionFloat64: six decimals
    # with trailing zeros stripped, integral floats bare: 0.0 -> "0"
    assert csv_text.splitlines() == ["y", "0", "2", "4", "6", "8"]


def test_oscillator_fft_pipeline(tql):
    # 2 Hz tone, 64 samples over 1 s -> FFT peak at 2 Hz (reference golden
    # shape: oscillator -> GROUPBYKEY -> FFT, tql_test.go FFT cases)
    p = (
        tql.oscillator([(2.0, 1.0)], 0, 1_000_000_000, 1_000_000_000 // 64)
        .fft()
    )
    rows = p.collect()
    peak = max(rows, key=lambda r: r.ampl)
    assert peak.hz == pytest.approx(2.0, rel=0.05)
    assert peak.ampl == pytest.approx(1.0, rel=0.05)


def test_group_pipeline(tql):
    from neo_server_spark.operators.group import agg
    import pyspark.sql.functions as F

    out = (
        tql.sql_select("value", table="events")
        .group(by=[(F.col("name"), "name")], aggs=[agg.count("value", "n")])
        .to_df()
    )
    assert out.count() == 5


def test_json_envelope_shape(tql):
    import json

    env = json.loads(
        tql.fake(fake.linspace(tql.spark, 1, 3, 3)).json()
    )
    assert env["success"] is True and env["reason"] == "success"
    assert env["data"]["columns"] == ["x"]
    assert env["data"]["types"] == ["double"]
    assert env["data"]["rows"] == [[1.0], [2.0], [3.0]]


def test_markdown_and_box(tql):
    md = tql.fake(fake.once(tql.spark, 7)).markdown()
    assert md.startswith("|x|")
    box = tql.fake(fake.once(tql.spark, 7)).box()
    assert "│ 7" in box


def test_key_ops_pipeline(tql):
    out = (
        tql.fake(fake.linspace(tql.spark, 0, 9, 10))
        .pushkey("cast(x as int) % 2", "parity")
        .groupbykey()
        .to_df()
    )
    rows = out.collect()
    assert len(rows) == 2 and len(rows[0].chunk) == 5


def test_fake_generators(spark):
    assert fake.arrange(spark, 0, 10, 2).count() == 6
    assert fake.meshgrid(spark, [1, 2], [3, 4, 5]).count() == 6
    assert fake.sphere(spark, 6, 6).count() == 36
    w = fake.random_walk(spark, 100, seed=1).collect()
    assert all(0 <= r.x <= 1 for r in w)
    n = fake.simplex_noise(spark, 100).collect()
    assert all(-1 <= r.x <= 1 for r in n)
    lit = fake.from_csv_literal(spark, "a,1\nb,2", ["k", "v"])
    assert lit.count() == 2


def test_script_mapinpandas(tql):
    from pyspark.sql.types import DoubleType, StructField, StructType

    def kernel(batches):
        for pdf in batches:
            pdf["x"] = pdf["x"] * 10
            yield pdf

    out = (
        tql.fake(fake.linspace(tql.spark, 1, 3, 3))
        .script(kernel, StructType([StructField("x", DoubleType())]))
        .to_df()
    )
    assert sorted(r.x for r in out.collect()) == [10.0, 20.0, 30.0]


def test_ndjson_sink(tql):
    nd = tql.fake(fake.once(tql.spark, 1)).ndjson()
    assert nd == '{"x":1}\n'


def test_shell_pipe(tql):
    out = (
        tql.fake(fake.linspace(tql.spark, 1, 5, 5))
        .shell("grep -v '3.0'")
        .to_df()
    )
    lines = sorted(r.line for r in out.collect())
    assert lines == ["1.0", "2.0", "4.0", "5.0"]


def test_html_text_sinks(tql):
    p = tql.fake(fake.linspace(tql.spark, 1, 2, 2))
    html = p.html()
    assert "<table>" in html and "<th>x</th>" in html and "<td>1.0</td>" in html
    txt = p.text()
    assert txt == "1.0\n2.0\n"
    templ = p.text("x={x}")
    assert templ == "x=1.0\nx=2.0\n"


def test_html_image_row(tql, spark):
    df = spark.createDataFrame([("image/png", bytearray(b"\x89PNG"))], ["mime", "data"])
    from neo_server_spark.codecs import encoders
    out = encoders.to_html(df)
    assert out.startswith('<div><img src="data:image/png;base64,')


def test_chart_and_geomap_specs(tql, spark):
    import json
    spec = json.loads(
        tql.fake(fake.linspace(tql.spark, 0, 2, 3)).pushvalue(1, "x * x", "y").chart("x", kind="bar")
    )
    assert spec["xAxis"]["data"] == [0.0, 1.0, 2.0]
    assert spec["series"][0]["type"] == "bar" and spec["series"][0]["data"] == [0.0, 1.0, 4.0]

    geo = spark.createDataFrame([(37.5, 127.0, "Seoul")], ["lat", "lon", "label"])
    from neo_server_spark.codecs import encoders
    markers = json.loads(encoders.to_geomap_spec(geo, popup="label"))
    assert markers == [{"type": "marker", "coord": [37.5, 127.0], "popup": {"content": "Seoul"}}]


def test_result_cache(tql):
    import time as _t

    from neo_server_spark.tql.cache import ResultCache

    calls = []

    def produce():
        calls.append(1)
        return f"v{len(calls)}"

    c = ResultCache(refresh_factor=1.0)  # no preemptive refresh
    assert c.get_or_compute("k", 0.3, produce) == "v1"
    assert c.get_or_compute("k", 0.3, produce) == "v1"   # hit
    assert len(calls) == 1
    _t.sleep(0.35)
    assert c.get_or_compute("k", 0.3, produce) == "v2"   # expired -> recompute
    assert c.stats["hits"] == 1 and c.stats["misses"] == 2


def test_result_cache_preemptive_refresh():
    import time as _t

    from neo_server_spark.tql.cache import ResultCache

    calls = []

    def produce():
        calls.append(1)
        return len(calls)

    c = ResultCache(refresh_factor=0.5)
    assert c.get_or_compute("k", 0.4, produce) == 1
    _t.sleep(0.25)                       # past 50% of ttl
    assert c.get_or_compute("k", 0.4, produce) == 1   # stale-ish hit...
    _t.sleep(0.1)                        # ...background refresh lands
    assert c.get_or_compute("k", 0.4, produce) == 2   # refreshed value served
    assert c.stats["refreshes"] >= 1


def test_pipeline_cached_sink(tql):
    p = tql.fake(fake.once(tql.spark, 42))
    r1 = p.cached("test-sink", 60, lambda pl: pl.csv())
    r2 = p.cached("test-sink", 60, lambda pl: "NOT-RUN")
    assert r1 == r2 == "x\n42\n"


def test_json_envelope_rows_array(tql):
    import json

    from neo_server_spark.codecs import encoders

    df = tql.fake(fake.linspace(tql.spark, 1, 2, 2)).to_df()
    env = json.loads(encoders.to_json_envelope(df, rows_array=True))
    assert env["data"]["rows"] == [{"x": 1.0}, {"x": 2.0}]


def test_schema_builders(spark):
    from neo_server_spark import schema as S

    tt = S.tag_table_schema([("quality", "uint16"), ("meta", "json")])
    assert [f.name for f in tt.fields] == ["name", "time", "value", "quality", "meta"]
    assert tt["time"].dataType.simpleString() == "bigint"
    assert tt["quality"].dataType.simpleString() == "int"       # widened
    assert S.spark_type("uint64").simpleString() == "decimal(20,0)"
    lt = S.log_table_schema([("msg", "varchar")])
    assert lt.fields[-1].name == "_ARRIVAL_TIME"


def test_datapipe_via_pipeline(tql, spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text here")],
        ["doc_id", "text"])
    p = tql.from_df(docs)
    assert p.dedup_exact().to_df().count() == 2
    out = p.quality_score().lang_id().fingerprint().to_df()
    assert {"quality", "lang_pred", "fp"} <= set(out.columns)
    assert p.sample(1.0, id_col="doc_id").to_df().count() == 3
    assert "lm_score" in p.lm_score().to_df().columns
    scrubbed = tql.from_df(
        spark.createDataFrame([(1, "mail a@b.co now")], ["doc_id", "text"])
    ).scrub_pii().to_df().first().text
    assert scrubbed == "mail <EMAIL> now"
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    kept = p.dedup_clusters(pairs, keep=True).to_df()
    assert {r.doc_id for r in kept.collect()} == {1, 3}


def test_chart_spec_markers(spark):
    import json as _json
    from neo_server_spark.codecs import encoders
    df = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 1.0)], ["t", "v"])
    spec = _json.loads(encoders.to_chart_spec(
        df, x="t", kind="line",
        mark_areas=[(1, 2, "warmup")], mark_x=[(2, "cut")], mark_y=[(3.0, "limit")]))
    s0 = spec["series"][0]
    assert s0["markArea"]["data"][0][0] == {"name": "warmup", "xAxis": 1}
    names = {d["name"] for d in s0["markLine"]["data"]}
    assert names == {"cut", "limit"}
