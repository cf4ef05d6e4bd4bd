"""MAP operator unit tests (reference model: mods/tql/task_test.go table-driven
cases — small input, exact expected output)."""

import pyspark.sql.functions as F
import pytest

from neo_server_spark.operators import maps


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(
        [(i, float(i * 10), chr(97 + i % 3)) for i in range(10)],
        ["k", "v", "c"],
    )


def test_filter(small):
    assert maps.filter_(small, F.col("v") >= 50).count() == 5
    assert maps.filter_(small, "v >= 50").count() == 5


def test_take_offset(small):
    rows = maps.take(small, 3, offset=2, order_by=["k"]).collect()
    assert [r.k for r in rows] == [2, 3, 4]


def test_drop(small):
    rows = maps.drop_(small, 8, order_by=["k"]).collect()
    assert sorted(r.k for r in rows) == [8, 9]
    rows = maps.drop_(small, 2, offset=3, order_by=["k"]).collect()
    assert sorted(r.k for r in rows) == [0, 1, 2, 5, 6, 7, 8, 9]


def test_mapvalue_replace_and_insert(small):
    out = maps.mapvalue(small, 1, F.col("v") * 2, name="v2")
    assert out.columns == ["k", "v2", "c"]
    assert out.orderBy("k").first().v2 == 0.0
    # out-of-range idx appends
    out2 = maps.mapvalue(small, 99, F.lit(1), name="one")
    assert out2.columns == ["k", "v", "c", "one"]


def test_mapvalue_where(small):
    out = maps.mapvalue(small, 1, F.lit(-1.0), where=F.col("k") < 5)
    vals = {r.k: r.v for r in out.collect()}
    assert vals[0] == -1.0 and vals[9] == 90.0


def test_push_pop_value(small):
    out = maps.pushvalue(small, 1, F.lit("x"), "tag")
    assert out.columns == ["k", "tag", "v", "c"]
    out2 = maps.popvalue(out, 1)
    assert out2.columns == ["k", "v", "c"]


def test_key_ops(small):
    out = maps.pushkey(small, F.col("v") * 0 + 7, "newk")
    assert out.columns == ["newk", "k", "v", "c"]
    out2 = maps.popkey(out)  # back: first value becomes key
    assert out2.columns == ["k", "v", "c"]
    out3 = maps.mapkey(small, F.col("k") + 100, "k2")
    assert out3.columns == ["k2", "v", "c"]
    assert out3.agg(F.min("k2")).first()[0] == 100


def test_transpose(small):
    out = maps.transpose(small.select("k", "v"), fixed=(0,), header=True)
    assert out.columns == ["k", "col_name", "value"]
    assert out.count() == 10


def test_flatten(spark):
    df = spark.createDataFrame([(1, [1, 2, 3]), (2, [4])], ["k", "arr"])
    out = maps.flatten(df)
    assert out.count() == 4


def test_filter_changed(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0), (4, 2.0), (5, 1.0)], ["t", "v"]
    )
    out = maps.filter_changed(df, "v", order_by="t")
    assert [r.t for r in out.orderBy("t").collect()] == [1, 3, 5]


def test_asof_join(spark):
    from neo_server_spark.operators import joins

    left = spark.createDataFrame(
        [("u", 10, "a"), ("u", 20, "b"), ("u", 5, "c")], ["k", "time", "ev"]
    )
    right = spark.createDataFrame(
        [("u", 8, 1.0), ("u", 10, 2.0), ("u", 15, 3.0)], ["k", "time", "v"]
    )
    out = joins.asof_join(left, right, on=["k"], right_cols=["v"])
    got = {r.ev: r.v for r in out.collect()}
    # inclusive at equal time (10 -> 2.0), none before 5, latest<=20 is 15->3.0
    assert got == {"a": 2.0, "b": 3.0, "c": None}


def test_asof_join_tolerance(spark):
    from neo_server_spark.operators import joins

    left = spark.createDataFrame([("u", 100, "a")], ["k", "time", "ev"])
    right = spark.createDataFrame([("u", 10, 1.0)], ["k", "time", "v"])
    out = joins.asof_join(left, right, on=["k"], right_cols=["v"], tolerance=50)
    assert out.first().v is None


def test_salted_join_matches_plain(spark):
    from neo_server_spark.operators import joins

    left = spark.createDataFrame(
        [(i, "hot" if i % 5 else f"cold{i}") for i in range(200)], ["id", "k"])
    right = spark.createDataFrame(
        [("hot", 1.0)] + [(f"cold{i}", float(i)) for i in range(0, 200, 5)],
        ["k", "v"])
    for how in ("inner", "left"):
        got = joins.salted_join(left, right, on="k", salt=4, how=how)
        want = left.join(right, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
