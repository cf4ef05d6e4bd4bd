"""GROUP / timewindow / series operator tests, including golden values ported
from the reference's semantics (movavg wait/noWait, lowpass recursion, FFT
single-tone recovery, Kalman convergence)."""

import math

import pyspark.sql.functions as F
import pytest

from neo_server_spark.operators import series, stats
from neo_server_spark.operators.group import agg, group, groupbykey, timewindow


@pytest.fixture()
def tagged(spark):
    rows = []
    for i in range(20):
        rows.append(("a", i * 1_000_000_000, float(i)))
        rows.append(("b", i * 1_000_000_000, float(i * 2)))
    return spark.createDataFrame(rows, ["name", "time", "value"])


def test_group_aggs(tagged):
    out = group(
        tagged,
        by=[(F.col("name"), "name")],
        aggs=[
            agg.count("value", "cnt"),
            agg.sum("value", "s"),
            agg.avg("value", "a"),
            agg.rss("value", "rss"),
            agg.rms("value", "rms"),
            agg.median_interpolated("value", "med"),
        ],
    ).collect()
    a = next(r for r in out if r.name == "a")
    assert a.cnt == 20 and a.s == sum(range(20))
    assert a.a == pytest.approx(9.5)
    assert a.rss == pytest.approx(math.sqrt(sum(i * i for i in range(20))))
    assert a.rms == pytest.approx(math.sqrt(sum(i * i for i in range(20)) / 20))
    assert a.med == pytest.approx(9.5)


def test_group_first_last(tagged):
    out = group(
        tagged,
        by=[(F.col("name"), "name")],
        aggs=[agg.first("value", "time", "f"), agg.last("value", "time", "l")],
    ).collect()
    b = next(r for r in out if r.name == "b")
    assert b.f == 0.0 and b.l == 38.0


def test_groupbykey(tagged):
    out = groupbykey(tagged, "name")
    rows = out.collect()
    assert len(rows) == 2
    assert len(rows[0].chunk) == 20


def test_timewindow_gapfill_null(spark):
    # data only in buckets 0 and 3 of [0, 40s) @ 10s
    df = spark.createDataFrame(
        [("a", 1_000_000_000, 1.0), ("a", 2_000_000_000, 3.0), ("a", 31_000_000_000, 7.0)],
        ["name", "time", "value"],
    )
    out = timewindow(
        df, "time", 0, 40_000_000_000, 10_000_000_000,
        aggs=[agg.avg("value", "v")], series=["name"],
    ).collect()
    assert len(out) == 4
    vals = [r.v for r in out]
    assert vals[0] == 2.0 and vals[1] is None and vals[2] is None and vals[3] == 7.0


def test_timewindow_fill_linear(spark):
    df = spark.createDataFrame(
        [("a", 1_000_000_000, 2.0), ("a", 31_000_000_000, 8.0)],
        ["name", "time", "value"],
    )
    out = timewindow(
        df, "time", 0, 40_000_000_000, 10_000_000_000,
        aggs=[agg.avg("value", "v")], series=["name"], fill="piecewiselinear",
    ).collect()
    vals = [r.v for r in out]
    assert vals == [2.0, 4.0, 6.0, 8.0]


def test_timewindow_fill_prev(spark):
    df = spark.createDataFrame(
        [("a", 1_000_000_000, 2.0), ("a", 31_000_000_000, 8.0)],
        ["name", "time", "value"],
    )
    out = timewindow(
        df, "time", 0, 40_000_000_000, 10_000_000_000,
        aggs=[agg.avg("value", "v")], series=["name"], fill="piecewiseconstant",
    ).collect()
    # gonum PiecewiseConstant = nearest known point to the RIGHT (verified
    # byte-for-byte by the TIMEWINDOW battery golden in test_tql_scripts)
    assert [r.v for r in out] == [2.0, 8.0, 8.0, 8.0]


def test_timewindow_drops_out_of_range(spark):
    df = spark.createDataFrame(
        [("a", -5_000_000_000, 9.0), ("a", 1_000_000_000, 1.0), ("a", 45_000_000_000, 9.0)],
        ["name", "time", "value"],
    )
    out = timewindow(df, "time", 0, 40_000_000_000, 10_000_000_000,
                     aggs=[agg.count("value", "n")], series=["name"]).collect()
    assert sum(r.n or 0 for r in out) == 1


def test_map_diff_family(tagged):
    out = series.map_diff(tagged, "value", series=["name"], order_by="time")
    a = [r.diff for r in out.filter("name='a'").orderBy("time").collect()]
    assert a[0] is None and a[1:] == [1.0] * 19
    out2 = series.map_nonegdiff(tagged, "value", series=["name"], order_by="time")
    assert out2.filter("name='b'").orderBy("time").collect()[1].nonegdiff == 2.0


def test_movavg_wait_semantics(spark):
    # reference golden shape: window=3, NULL until buffer full (fm_monad.go:2046-2050)
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])], ["t", "v"])
    out = series.map_movavg(df, "v", 3, order_by="t").orderBy("t").collect()
    assert [r.movavg for r in out] == [None, None, 2.0, 3.0, 4.0]
    out2 = series.map_movavg(df, "v", 3, order_by="t", no_wait=True).orderBy("t").collect()
    assert [r.movavg for r in out2] == [1.0, 1.5, 2.0, 3.0, 4.0]


def test_lowpass_recursion(spark):
    # x̂0 = v0; x̂ = (1-α)x̂ + αv (fm_monad.go:2081-2107)
    vals = [10.0, 20.0, 30.0, 40.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["t", "v"])
    out = series.map_lowpass(df, "v", 0.5, order_by="t").orderBy("t").collect()
    expect = [10.0, 15.0, 22.5, 31.25]
    assert [r.lowpass for r in out] == pytest.approx(expect)


def test_kalman_converges(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(50)], ["t", "v"])
    out = series.map_kalman(df, "v", order_by="t").orderBy("t").collect()
    assert out[-1].kalman == pytest.approx(5.0)


def test_map_distance(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0)], ["t", "lat", "lon"]
    )
    out = series.map_distance(df, "lat", "lon", order_by="t").orderBy("t").collect()
    assert out[0].distance == 0.0
    assert out[1].distance == pytest.approx(111194.9, rel=1e-3)  # 1° lon at equator


def test_fft_single_tone(spark):
    # 8 Hz sine sampled at 128 Hz for 1s -> peak at 8 Hz, amplitude ~1
    n, rate, freq = 128, 128.0, 8.0
    rows = [("a", int(i / rate * 1e9), math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]
    df = spark.createDataFrame(rows, ["name", "time", "value"])
    out = series.fft(df, series=["name"]).collect()
    peak = max(out, key=lambda r: r.ampl)
    # reference rate definition uses (n)/(t[-1]-t[0]) -> slight grid offset vs n/duration
    assert peak.hz == pytest.approx(freq, rel=0.02)
    assert peak.ampl == pytest.approx(1.0, rel=0.02)


def test_fft_min_samples_drop(spark):
    rows = [("tiny", int(i * 1e9), 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, ["name", "time", "value"])
    assert series.fft(df, series=["name"]).count() == 0


def test_histogram_fixed(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    out = stats.histogram(df, "v", 0, 100, 10).collect()
    assert len(out) == 10
    assert all(r["count"] == 10 for r in out)


def test_histogram_clamps_outliers(spark):
    df = spark.createDataFrame([(v,) for v in [-5.0, 105.0, 50.0]], ["v"])
    out = stats.histogram(df, "v", 0, 100, 10).orderBy("low").collect()
    assert out[0]["count"] == 1 and out[-1]["count"] == 1


def test_boxplot(spark):
    df = spark.createDataFrame([("a", float(v)) for v in range(1, 101)] + [("a", 1000.0)], ["c", "v"])
    row = stats.boxplot(df, "v", "c", interpolated=True).first()
    assert row.q1 == pytest.approx(26.0) and row.q3 == pytest.approx(76.0)
    assert row.outlier_count == 1


def test_timewindow_fill_spline(spark):
    # quadratic samples: Akima reproduces smooth curves closely in gaps
    pts = [(0, 0.0), (10, 100.0), (20, 400.0), (40, 1600.0), (50, 2500.0)]
    df = spark.createDataFrame(
        [("a", t * 1_000_000_000, v) for t, v in pts], ["name", "time", "value"]
    )
    from neo_server_spark.operators.group import agg, timewindow

    out = timewindow(
        df, "time", 0, 60_000_000_000, 10_000_000_000,
        aggs=[agg.avg("value", "v")], series=["name"], fill="akimaspline",
    ).collect()
    filled = {r.time // 10**9: r.v for r in out}
    assert filled[30] == pytest.approx(900.0, rel=0.05)   # x^2 at t=30
    assert filled[50] == 2500.0

    out2 = timewindow(
        df, "time", 0, 60_000_000_000, 10_000_000_000,
        aggs=[agg.avg("value", "v")], series=["name"], fill="fritschbutland",
    ).collect()
    f2 = {r.time // 10**9: r.v for r in out2}
    # monotone data -> monotone fill between neighbors
    assert 400.0 <= f2[30] <= 1600.0


def test_filter_changed_retain(spark):
    from neo_server_spark.operators import maps

    # value holds 'b' from t=20..50: with retain 25ns the run emits once the
    # hold is proven (t=45 is the first record >= 20+25)
    rows = [(10, "a"), (20, "b"), (30, "b"), (45, "b"), (50, "b"), (60, "c")]
    df = spark.createDataFrame(rows, ["time", "v"])
    out = maps.filter_changed(df, "v", order_by="time", retain_duration=25)
    assert [r.time for r in out.orderBy("time").collect()] == [45]
    # use_first emits the run's first record instead
    out2 = maps.filter_changed(df, "v", order_by="time", retain_duration=25,
                               use_first=True)
    assert [r.time for r in out2.orderBy("time").collect()] == [20]


def test_filter_changed_with_last(spark):
    from neo_server_spark.operators import maps

    rows = [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y")]
    df = spark.createDataFrame(rows, ["time", "v"])
    out = maps.filter_changed(df, "v", order_by="time", with_last=True)
    # first and last record of each run (single-record runs emit once)
    assert [r.time for r in out.orderBy("time").collect()] == [1, 2, 3, 5]


def test_map_diff_blocked_equivalence(spark, sf_dir):
    """Blocked lag (bounded tasks + boundary exchange) must equal the plain
    window row-for-row, including across empty blocks."""
    from neo_server_spark import io as nio
    from neo_server_spark.operators import series

    ev = nio.events_as_tag(spark, sf_dir).select("name", "time", "value", "event_id")
    plain = series.map_diff(ev, "value", out="d", series=["name"],
                            order_by=["time", "event_id"])
    blocked = series.map_diff_blocked(ev, "value", out="d", series=["name"],
                                      time_col="time", block_ns=6 * 3600 * 10**9,
                                      tiebreak=["event_id"])
    a = {(r.name, r.time, r.event_id): r.d for r in plain.collect()}
    b = {(r.name, r.time, r.event_id): r.d for r in blocked.collect()}
    assert a == b and len(a) > 0


def test_map_diff_blocked_empty_blocks(spark):
    from neo_server_spark.operators import series

    # rows at t=0 and t=25: with 10-unit blocks, block [10,20) is empty —
    # the tail must still carry from block 0 to block 2
    df = spark.createDataFrame([("a", 0, 1.0), ("a", 25, 4.0)], ["name", "time", "value"])
    out = series.map_diff_blocked(df, "value", out="d", series=["name"],
                                  time_col="time", block_ns=10)
    got = {r.time: r.d for r in out.collect()}
    assert got[0] is None and got[25] == 3.0


def test_map_lowpass_blocked_equivalence(spark, sf_dir):
    """Parallel-scan EWMA over bounded blocks must match the sequential
    per-series kernel to float precision."""
    from neo_server_spark import io as nio
    from neo_server_spark.operators import series

    ev = nio.events_as_tag(spark, sf_dir).select("name", "time", "value")
    plain = series.map_lowpass(ev, "value", 0.2, series=["name"], order_by="time")
    blocked = series.map_lowpass_blocked(ev, "value", 0.2, series=["name"],
                                         time_col="time", block_ns=6 * 3600 * 10**9)
    a = {(r.name, r.time): r.lowpass for r in plain.collect()}
    b = {(r.name, r.time): r.lowpass for r in blocked.collect()}
    assert len(a) == len(b) > 0
    for k, va in a.items():
        assert b[k] == pytest.approx(va, rel=1e-9, abs=1e-9), k


def test_map_kalman_blocked_equivalence(spark, sf_dir):
    """Blocked Kalman (linear time-varying recurrence composition) must match
    the sequential per-series kernel to float precision across block
    boundaries — the gain sequence is global-index-determined, so the entry
    variance/state chaining is the only thing that can go wrong."""
    from neo_server_spark import io as nio
    from neo_server_spark.operators import series

    ev = nio.events_as_tag(spark, sf_dir).select("name", "time", "value")
    plain = series.map_kalman(ev, "value", series=["name"], order_by="time",
                              init_variance=1.0, process_variance=1.0,
                              observation_variance=2.0)
    blocked = series.map_kalman_blocked(ev, "value", series=["name"],
                                        time_col="time",
                                        init_variance=1.0, process_variance=1.0,
                                        observation_variance=2.0,
                                        block_ns=6 * 3600 * 10**9)
    a = {(r.name, r.time): r.kalman for r in plain.collect()}
    b = {(r.name, r.time): r.kalman for r in blocked.collect()}
    assert len(a) == len(b) > 0
    for k, va in a.items():
        assert b[k] == pytest.approx(va, rel=1e-9, abs=1e-9), k


def test_fft_band_limits(spark):
    """FFT minHz()/maxHz() options drop out-of-band coefficients
    (fm_fourier.go:23-101)."""
    from neo_server_spark.operators import series
    from neo_server_spark.tql import fake

    src = fake.oscillator(spark, [(1.0, 1.0), (2.0, 0.5), (3.0, 0.25)],
                          0, 4_000_000_000, 4_000_000_000 // 256)
    out = series.fft(src, min_hz=1.5, max_hz=2.5).collect()
    hzs = [r.hz for r in out]
    assert all(1.5 <= h <= 2.5 for h in hzs)
    peak = max(out, key=lambda r: r.ampl)
    assert peak.hz == pytest.approx(2.0, abs=0.1)
    assert peak.ampl == pytest.approx(0.5, abs=0.05)


def test_percentile_accuracy_scale_guard(spark):
    """percentile_accuracy(n) bounds per-group percentile memory: the exact
    default matches SQL percentile; under a finite accuracy every
    quantile/median routes through percentile_approx (sketch), staying
    within 1/accuracy rank error, and restoring None returns to exact."""
    from neo_server_spark.operators.group import agg, percentile_accuracy

    df = spark.range(10_001).selectExpr("CAST(id AS DOUBLE) AS v",
                                        "id % 2 AS g")
    exact = df.groupBy("g").agg(
        agg.median_interpolated("v", "med"),
        agg.quantile("v", 0.9, "p90")).collect()
    prev = percentile_accuracy(100)
    try:
        approx = df.groupBy("g").agg(
            agg.median_interpolated("v", "med"),
            agg.quantile("v", 0.9, "p90")).collect()
        plan = df.groupBy("g").agg(
            agg.median_interpolated("v", "med"))._jdf.queryExecution() \
            .analyzed().toString()
        assert "percentile_approx" in plan  # sketch path, not sort-based
    finally:
        percentile_accuracy(prev)
    ex = {r.g: r for r in exact}
    ap = {r.g: r for r in approx}
    for g in ex:
        # 5000 elements per group, accuracy 100 -> rank error <= 50 -> value
        # error <= 100 on this uniform lattice
        assert abs(ex[g].med - ap[g].med) <= 100
        assert abs(ex[g].p90 - ap[g].p90) <= 100
    # exact semantics restored
    again = df.groupBy("g").agg(agg.median_interpolated("v", "med")).collect()
    assert {r.g: r.med for r in again} == {r.g: r.med for r in exact}
