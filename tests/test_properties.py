"""Property-based tests (hypothesis) — operator invariants on random data.

Complements the golden/oracle tests: these check algebraic laws that must
hold for ANY input, with a sequential Python model as the reference
implementation (the same role the reference's Go row-loop plays).
"""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo_server_spark.operators import maps, series
from neo_server_spark.functions.timefn import round_time

prop = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1, max_size=40,
)


@prop
@given(vs=values)
def test_map_diff_telescopes(spark, vs):
    """Σ diff_i = v_n - v_1 (telescoping), independent of partitioning."""
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    out = series.map_diff(df, "v", out="d", order_by="t")
    total = out.agg(F.sum("d")).first()[0]
    if len(vs) == 1:
        assert total is None
    else:
        assert total == pytest.approx(vs[-1] - vs[0], rel=1e-6, abs=1e-6)


@prop
@given(vs=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40))
def test_filter_changed_matches_sequential_model(spark, vs):
    """FILTER_CHANGED == the obvious sequential scan."""
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    got = [r.v for r in maps.filter_changed(df, "v", order_by="t").orderBy("t").collect()]
    want = [v for i, v in enumerate(vs) if i == 0 or v != vs[i - 1]]
    assert got == want


@prop
@given(
    ts=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30),
    d=st.sampled_from([1_000, 1_000_000_000, 3_600 * 10**9, 86_400 * 10**9]),
)
def test_round_time_is_aligned_floor(spark, ts, d):
    """round_time: result is d-aligned, <= t, within d of t — for ANY 62-bit
    ns timestamp (the double-arithmetic bug broke this near boundaries)."""
    df = spark.createDataFrame([(t,) for t in ts], ["t"])
    rows = df.select("t", round_time("t", d).alias("b")).collect()
    for r in rows:
        assert r.b % d == 0
        assert r.b <= r.t < r.b + d


@prop
@given(vs=values, window=st.integers(min_value=1, max_value=8))
def test_movavg_matches_sequential_model(spark, vs, window):
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    out = series.map_movavg(df, "v", window, out="m", order_by="t", no_wait=True)
    got = [r.m for r in out.orderBy("t").collect()]
    for i, g in enumerate(got):
        lo = max(0, i - window + 1)
        assert g == pytest.approx(sum(vs[lo:i + 1]) / (i - lo + 1), rel=1e-6, abs=1e-6)
