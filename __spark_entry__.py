"""Driver contract: entry(spark), queries(), oracle_sql().

Every query exercises an operator from SURVEY.md §2 through the
``neo_server_spark`` engine and has a DuckDB-equivalent oracle.  Column names
are aliased identically on both sides; time outputs are epoch-ns BIGINTs
(exact integers — the engine's canonical basetime representation) so no
timestamp-precision ambiguity enters the value hash.  Aggregates whose
float summation order differs between engines are rounded to 6 decimals on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from neo_server_spark import io as nio
from neo_server_spark.operators import joins, maps, series, stats
from neo_server_spark.operators.group import agg, entropy_of, group, mode_det, timewindow
from neo_server_spark.datapipe import curate, dedup, sampling, similarity, text

SF_SMOKE = "/root/testdata/sf0.001"


def _await(q, timeout: int) -> None:
    """awaitTermination that FAILS LOUDLY on timeout — a timed-out
    availableNow batch leaves sinks partially applied, and silently
    returning would feed a nondeterministic result to the oracle
    comparison."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not terminate "
            f"within {timeout}s")


def _us(col: str, name: str | None = None):
    """Epoch-ns long -> epoch-us long for oracle-compared time outputs
    (DuckDB's parquet reader truncates TIMESTAMP_NS to microseconds)."""
    return F.expr(f"{col} div 1000").alias(name or col.split(".")[-1])

# timewindow constants: [2024-01-05, 2024-01-20) at 1h, epoch-ns
TW_FROM = 1_704_412_800 * 1_000_000_000
TW_UNTIL = 1_705_708_800 * 1_000_000_000
TW_PERIOD = 3_600 * 1_000_000_000


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-tag hourly timewindow rollup with gap-filled buckets."""
    return _q_timewindow_avg(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# tag-table / TQL operator queries over `events` (name=event_type, time=ts ns)
# ---------------------------------------------------------------------------

def _tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nio.events_as_tag(spark, sf_dir)


def _q_tag_scan(spark, sf_dir):
    """SQL_SELECT(...) tag scan: name + time-range predicate + limit.

    Catalyst pushes both predicates into the parquet scan (PushedFilters) and
    TAKE compiles to TakeOrderedAndProject.
    """
    df = nio.events_as_tag(spark, sf_dir, from_ns=TW_FROM, until_ns=TW_UNTIL,
                           until_inclusive=True).filter(
        F.col("name") == "purchase"
    ).select("name", _us("time"), "value", "event_id")
    return maps.take(df, 500, order_by=[F.col("time"), F.col("event_id")])


def _q_timewindow_avg(spark, sf_dir):
    """GROUP(by(time, timewindow(...))) per tag, gap-filled calendar buckets.

    The scan is time-ranged at the source (pushdown-guaranteed row-group
    pruning); timewindow() re-applies the exact [from, until) bound."""
    df = nio.events_as_tag(spark, sf_dir, from_ns=TW_FROM, until_ns=TW_UNTIL)
    return timewindow(
        df, "time", TW_FROM, TW_UNTIL, TW_PERIOD,
        aggs=[
            agg.count("value", "cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ],
        series=["name"],
    )


def _q_group_aggs(spark, sf_dir):
    """GROUP aggregate battery (§2.3 table) per tag name."""
    df = _tag(spark, sf_dir)
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            agg.count("value", "cnt"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            agg.min("value", "min_value"),
            agg.max("value", "max_value"),
            F.round(agg.rss("value", "rss_value"), 6).alias("rss_value"),
            F.round(agg.rms("value", "rms_value"), 6).alias("rms_value"),
            F.round(agg.stddev("value", "x"), 6).alias("stddev_value"),
            F.round(agg.variance("value", "x"), 6).alias("var_value"),
            F.round(agg.stderr("value", "x"), 6).alias("stderr_value"),
            F.round(agg.median_interpolated("value", "x"), 6).alias("median_value"),
            F.round(agg.quantile_interpolated("value", 0.95, "x"), 6).alias("p95_value"),
        ],
    ).orderBy("name")


def _q_group_where(spark, sf_dir):
    """Per-aggregate where() filter (fm_monad.go:717-720)."""
    df = _tag(spark, sf_dir)
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            agg.count("value", "cnt_all"),
            agg.count("value", "cnt_high", where=F.col("value") > 100),
            F.round(agg.sum("value", "x", where=F.col("value") > 100), 6).alias("sum_high"),
        ],
    ).orderBy("name")


def _q_first_last(spark, sf_dir):
    """FIRST/LAST aggregates (http_lake.go:871-877) == min_by/max_by."""
    df = _tag(spark, sf_dir)
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            agg.first("value", "time", "first_value"),
            agg.last("value", "time", "last_value"),
            F.min(_us("time")).alias("min_time"),
            F.max(_us("time")).alias("max_time"),
        ],
    ).orderBy("name")


def _q_tag_stat(spark, sf_dir):
    """V$<table>_STAT equivalent: per-tag row count + time bounds
    (reference: spi/show.go ShowTags / fm_dbsrc.go:871-881)."""
    df = _tag(spark, sf_dir)
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            agg.count("*", "row_count"),
            F.min(_us("time")).alias("min_time"),
            F.max(_us("time")).alias("max_time"),
        ],
    ).orderBy("name")


def _q_filter_changed(spark, sf_dir):
    """FILTER_CHANGED over per-user event_type transitions."""
    ev = nio.load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    out = maps.filter_changed(ev, "event_type", series=["user_id"], order_by=["ts", "event_id"])
    return out.select("user_id", _us("ts", "time"), "event_type", "event_id").orderBy("event_id")


def _q_map_diff(spark, sf_dir):
    """MAP_DIFF per series (lag window)."""
    df = _tag(spark, sf_dir).select("name", "time", "value", "event_id")
    out = series.map_diff(df, "value", out="diff", series=["name"], order_by=["time", "event_id"])
    return out.select("name", _us("time"), "value", "diff").orderBy("name", "time", "value")


def _q_map_movavg(spark, sf_dir):
    """MAP_MOVAVG(window=5) wait-mode + cumulative mean per series.

    The cumulative mean is computed in exact integer-cents space (the events
    values are 2-decimal): integer window sums are order-independent, so the
    oracle comparison is exact with no float-rounding ambiguity.
    """
    from pyspark.sql import Window

    df = _tag(spark, sf_dir).select("name", "time", "value", "event_id")
    out = series.map_movavg(df, "value", 5, out="movavg", series=["name"], order_by=["time", "event_id"])
    w = Window.partitionBy("name").orderBy("time", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    cum = F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
    rn = F.row_number().over(w).cast("double")
    out = out.withColumn("cumavg", cum / (rn * F.lit(100.0)))
    return out.select(
        "name", _us("time"), "value",
        F.round("movavg", 6).alias("movavg"),
        "cumavg",
    ).orderBy("name", "time", "value")


def _q_map_diff_blocked(spark, sf_dir):
    """MAP_DIFF via the 100TB-shape blocked window (bounded task size +
    boundary exchange) — the oracle is the PLAIN lag SQL, proving the blocked
    decomposition is row-for-row exact."""
    df = _tag(spark, sf_dir).select("name", "time", "value", "event_id")
    out = series.map_diff_blocked(df, "value", out="diff", series=["name"],
                                  time_col="time", block_ns=86_400 * 10**9,
                                  tiebreak=["event_id"])
    return out.select("name", _us("time"), "value", "diff").orderBy("name", "time", "value")


def _q_take_drop(spark, sf_dir):
    """TAKE(offset, n) paging on an ordered scan."""
    df = _tag(spark, sf_dir).select("name", "time", "value", "event_id")
    return maps.take(df, 200, offset=100,
                     order_by=[F.col("time"), F.col("event_id")]).select(
        "name", _us("time"), "value", "event_id")


def _q_transpose(spark, sf_dir):
    """TRANSPOSE(fixed(0)) — melt value columns into rows."""
    df = nio.load_table(spark, sf_dir, "events").select("event_id", "value", "user_id")
    out = maps.transpose(df, fixed=(0,), header=True)
    # driver hashes rows in emission order — pin it
    return out.select("event_id", "col_name", "value").orderBy("event_id", "col_name")


def _q_pivot_counts(spark, sf_dir):
    """PIVOT (http_lake.go:1650-1652) — user_id x event_type count matrix.
    Explicit IN-list (the lake API always has one) skips the extra
    distinct-values job an open pivot() runs first."""
    ev = nio.load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", kinds).count()
    for c in [c for c in out.columns if c != "user_id"]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out.orderBy("user_id")


def _q_histogram(spark, sf_dir):
    """HISTOGRAM(value, bins(0,200,20), category(name))."""
    df = _tag(spark, sf_dir)
    return stats.histogram(df, "value", 0.0, 200.0, 20.0, category="name",
                           categories=["click", "error", "purchase", "signup", "view"])


def _q_boxplot(spark, sf_dir):
    """BOXPLOT(value, category(name)) with interpolated quartiles."""
    df = _tag(spark, sf_dir)
    out = stats.boxplot(df, "value", "name", interpolated=True)
    return out.select(
        "category",
        F.round("min", 6).alias("min"),
        F.round("lower_whisker", 6).alias("lower_whisker"),
        F.round("q1", 6).alias("q1"),
        F.round("median", 6).alias("median"),
        F.round("q3", 6).alias("q3"),
        F.round("upper_whisker", 6).alias("upper_whisker"),
        F.round("max", 6).alias("max"),
        "outlier_count",
    ).orderBy("category")


def _q_rollup_hourly(spark, sf_dir):
    """DATE_TRUNC-style rollup (http_lake.go:1707-1716): hourly avg/min/max/sum."""
    df = _tag(spark, sf_dir)
    bucket = (F.floor(F.col("time") / F.lit(TW_PERIOD)) * F.lit(TW_PERIOD)).cast("long")
    return (
        df.groupBy(F.col("name"), bucket.alias("time"))
        .agg(
            F.count("value").alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("name", "time")
    )


# ---------------------------------------------------------------------------
# relational / SQL-surface queries over the TPC-H-ish tables
# ---------------------------------------------------------------------------

def _q_tpch_q1(spark, sf_dir):
    """Pricing summary (Spark SQL surface; tests groupBy/agg at scale)."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_join_revenue(spark, sf_dir):
    """Broadcast-join star query: revenue per nation."""
    cust = nio.load_table(spark, sf_dir, "customer")
    nat = nio.load_table(spark, sf_dir, "nation")
    orders = nio.load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
        .orderBy("n_name")
    )


def _q_tpch_q3(spark, sf_dir):
    """Shipping-priority style 3-way join + top-k (SQL surface): Catalyst
    broadcast-joins the filtered customer dim, AQE handles the orders x
    lineitem shuffle join, and the final top-10 is a TakeOrderedAndProject —
    no global sort materializes."""
    cust = nio.load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = nio.load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = nio.load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def _q_tpch_q6(spark, sf_dir):
    """Forecast-revenue filter+agg: every predicate reaches the parquet scan
    (PushedFilters), zero shuffle beyond the final single-row agg."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# datapipe: text analysis / dedup / similarity (BASELINE north star)
# ---------------------------------------------------------------------------

def _q_group_aggs2(spark, sf_dir):
    """Second aggregate battery: corr/covar/regression-slope/central moment/
    cdf/discrete quantiles (§2.3) — time as epoch-seconds for the regressions."""
    df = _tag(spark, sf_dir).withColumn("tsec", F.expr("time div 1000") / F.lit(1e6))
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            F.round(agg.correlation("tsec", "value", "x"), 6).alias("corr_tv"),
            F.round(agg.covariance("tsec", "value", "x"), 6).alias("covar_tv"),
            F.round(agg.lrs("tsec", "value", "x"), 6).alias("lrs_tv"),
            F.round(agg.moment("value", 2, "x"), 6).alias("moment2"),
            F.round(agg.cdf("value", 100.0, "x"), 6).alias("cdf_100"),
            agg.quantile("value", 0.9, "p90_disc"),
            agg.median("value", "median_disc"),
        ],
    ).orderBy("name")


def _q_mode_entropy(spark, sf_dir):
    """Deterministic mode + Shannon entropy per tag (two-level aggregates)."""
    df = _tag(spark, sf_dir).withColumn("vbin", F.floor(F.col("value") / 10).cast("long"))
    m = mode_det(df, ["name"], "vbin", out="mode_vbin")
    e = entropy_of(df, ["name"], "user_id", out="entropy_user")
    return (
        m.join(e, "name")
        .select("name", "mode_vbin", F.round("entropy_user", 6).alias("entropy_user"))
        .orderBy("name")
    )


def _q_json_extract(spark, sf_dir):
    """JSON column access (engine json type ~ get_json_object; SURVEY §2.5)."""
    ev = nio.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("int").alias("k"),
    )


def _q_topk_per_group(spark, sf_dir):
    """Top-3 records per tag by value (scan-direction + limit per series)."""
    from pyspark.sql import Window

    df = _tag(spark, sf_dir)
    w = Window.partitionBy("name").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("name", _us("time"), "value", "event_id",
                F.col("rk").cast("long").alias("rk"))
        .orderBy("name", "rk")
    )


def _q_asof_join(spark, sf_dir):
    """As-of join (extension, SURVEY §2.8): each purchase joined to the
    user's latest click at-or-before it — union-scan implementation."""
    ev = nio.load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id", "value")
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = joins.asof_join(left, right, on=["user_id"], left_time="ts", right_time="ts",
                          right_cols=["value"])
    return out.select(
        "user_id", _us("ts", "time"), "event_id", "value",
        F.col("value_right").alias("click_value"),
    ).orderBy("event_id")


def _q_flatten_tokens(spark, sf_dir):
    """FLATTEN (explode) — tokens with position, small slice of documents."""
    docs = nio.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    ).withColumn("pos", (F.col("pos") + 1).cast("long"))


def _q_lang_quality(spark, sf_dir):
    """Language-ID heuristic + quality score per document."""
    docs = nio.load_table(spark, sf_dir, "documents")
    out = text.lang_id(text.quality_score(docs))
    return out.select("doc_id", "lang_pred",
                      F.col("lang_score").cast("long").alias("lang_score"),
                      "quality")


def _q_ngram_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs, language-blocked (all-pairs verify)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.05,
                                     prefilter_col="lang").orderBy("id_a", "id_b")


def _q_map_lowpass(spark, sf_dir):
    """MAP_LOWPASS EWMA (α=0.2) per tag via applyInPandas."""
    df = _tag(spark, sf_dir).select("name", "time", "value")
    out = series.map_lowpass(df, "value", 0.2, series=["name"], order_by="time")
    return out.select("name", _us("time"), "value",
                      F.round("lowpass", 6).alias("lowpass")) \
        .orderBy("name", "time", "value")


def _q_fft(spark, sf_dir):
    """FFT per tag over the full series, certified against a naive-DFT SQL
    oracle (the rfft IS the DFT; hz is rounded at 9 — both sides compute
    the identical double expression — and ampl at 6 to absorb the ~1e-10
    difference between numpy's factored FFT and the oracle's naive
    trig-sum accumulation order)."""
    df = _tag(spark, sf_dir).select("name", "time", "value")
    out = series.fft(df, series=["name"])
    return out.select("name", F.round("hz", 9).alias("hz"),
                      F.round("ampl", 6).alias("ampl")).orderBy("name", "hz")


def _q_minhash_pairs(spark, sf_dir):
    """Banded MinHash-LSH near-dup pairs, certified end-to-end by a SQL
    oracle: hash_fn='md5' derives each signature entry from the md5 hex
    prefix (identical in Spark and DuckDB) and keys bands by the raw
    signature slice, so candidacy is slice-equality the oracle reproduces
    exactly; candidates verify with exact shingle Jaccard.  The production
    default stays xxhash64 (seeded JVM hash, no string materialization) —
    same code path, different hash family (pytest-covered)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, shingle_n=3,
                                   jaccard_threshold=0.05, hash_fn="md5") \
        .orderBy("id_a", "id_b")


def _q_simhash(spark, sf_dir):
    """SimHash signatures certified by a SQL oracle: hash_fn='md5' votes
    the 60-bit md5 hex prefix per token (identical in Spark and DuckDB);
    production default stays xxhash64 over 64 bits — same vote/pack code
    path, different hash family."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "text", hash_fn="md5", keep=["doc_id"]) \
        .select("doc_id", "simhash").orderBy("doc_id")


def _q_histogram_streaming(spark, sf_dir):
    """Streaming merging histogram (mods/nums/histogram.go:49-91), run with
    the reference's EXACT sequential semantics per tag — insert in (time,
    event_id) order, merge the first minimal adjacent gap past max_bins —
    so a DuckDB recursive CTE reproduces every centroid bit-for-bit.  The
    input is bounded (event_id < 4000) to keep the oracle's recursion depth
    tractable; the orderless mergeable path for full-scale data is
    stats.histogram_streaming (histogram_numeric partial aggregation)."""
    df = _tag(spark, sf_dir).filter(F.col("event_id") < 4000)
    return stats.histogram_stream_exact(df, "value", max_bins=12,
                                        category="name",
                                        order_by=("time", "event_id"))


def _q_embedding_dupes(spark, sf_dir):
    """Embedding-cosine near-dup pairs with MULTI-BAND hyperplane LSH,
    certified end-to-end by a SQL oracle: hash_fn='md5' derives hyperplane
    signs from md5 hex-prefix parity (identical in Spark and DuckDB), so
    the oracle reproduces bucketing, candidacy and exact-cosine verify
    pair-for-pair.  bits/bands auto-derive from the threshold for >=0.95
    recall at the threshold cosine (tests/test_datapipe.py pins the recall
    vs the exact baseline); production default stays xxhash64."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_dupes(emb, threshold=0.35, hash_fn="md5") \
        .orderBy("id_a", "id_b")


def _q_embedding_dupes_exact(spark, sf_dir):
    """Embedding near-dup pairs, EXACT all-pairs cosine baseline (the
    oracle-checkable ground truth the LSH-blocked variant approximates;
    datapipe/dedup.py embedding_dupes is the scale path).  Self-join on
    id<id sweep runs as an Arrow kernel (dedup.exact_cosine_pairs) with the
    same sequential float64 folds as the SQL self-join form, so values
    hash-match at round-6."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    return dedup.exact_cosine_pairs(emb, threshold=0.35) \
        .orderBy("id_a", "id_b")


def _q_filter_changed_retain(spark, sf_dir):
    """FILTER_CHANGED with retain(time, 10m): a per-user event_type run emits
    only once the value has held for >= 10 minutes (fm_monad.go:160-186)."""
    dur = 600 * 1_000_000_000
    ev = nio.load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    out = maps.filter_changed(ev, "event_type", series=["user_id"],
                              order_by=["ts", "event_id"], retain_duration=dur,
                              time_col="ts")
    return out.select("user_id", _us("ts", "time"), "event_type", "event_id").orderBy("event_id")


def _q_timewindow_spline(spark, sf_dir):
    """timewindow gap-fill with predict('AkimaSpline') — numpy Hermite
    kernel over the aggregated bucket frame, certified BIT-EXACT against a
    pure-SQL Akima oracle (secant slopes + boundary extrapolation +
    |slope-diff|-weighted knot derivatives + cubic Hermite evaluation as
    window expressions and an ASOF bracket join; 1800/1800 rows equal
    before rounding slack is even needed)."""
    df = _tag(spark, sf_dir)
    out = timewindow(
        df, "time", TW_FROM, TW_UNTIL, TW_PERIOD,
        aggs=[F.avg("value").alias("avg_value")],
        series=["name"], fill="akimaspline",
    )
    return out.select("name", "time",
                      F.round("avg_value", 6).alias("avg_value")) \
        .orderBy("name", "time")


def _q_oscillator_fft(spark, sf_dir):
    """FAKE(oscillator) -> FFT golden: 3 tones recovered at their amplitudes
    (reference golden fixture shape: mods/tql/test/fft2d.csv).  Rows-only
    check; the unit tests assert the analytic peak values."""
    from neo_server_spark.tql import fake as FK

    src = FK.oscillator(spark, [(1.0, 1.0), (2.0, 0.5), (3.0, 0.25)],
                        0, 4_000_000_000, 4_000_000_000 // 256)
    out = series.fft(src)
    return out.select(F.round("hz", 6).alias("hz"),
                      F.round("ampl", 6).alias("ampl")).orderBy("hz")


def _q_projection_ops(spark, sf_dir):
    """Projection / key-shift battery (§2.2): PUSHKEY -> MAPVALUE -> PUSHVALUE
    -> POPVALUE -> POPKEY chained; pure column projections, one scan, no
    shuffle (fm_monad.go:1515-1804)."""
    ev = nio.load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = maps.pushkey(ev, F.col("event_id") % 7, name="key")   # [key, event_id, user_id, value]
    out = maps.mapvalue(out, 3, F.round(F.col("value") * 2, 6), name="value2")
    out = maps.pushvalue(out, 2, F.col("user_id") % 100, name="userbucket")
    out = maps.popvalue(out, 3)                                  # drop user_id
    out = maps.popkey(out, 0)                                    # event_id becomes key
    return out


def _q_scalar_funcs(spark, sf_dir):
    """Scalar function battery (§2.5): string ops (strfn) + time component
    extractors / roundTime / strTime (timefn) in one projection."""
    from neo_server_spark.functions import strfn, timefn

    ev = nio.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        strfn.str_to_upper("event_type").alias("upper_type"),
        strfn.str_sub("event_type", 1, 3).alias("sub_type"),
        strfn.str_index("event_type", "e").cast("long").alias("idx_e"),
        strfn.str_sprintf("%s#%d", F.col("event_type"), F.col("user_id")).alias("tag_label"),
        strfn.str_has_prefix("event_type", "p").alias("is_p"),
        timefn.str_time(F.col("ts").cast("long"), "yyyy-MM-dd HH:mm").alias("ts_str"),
        timefn.time_year(F.col("ts").cast("long")).cast("long").alias("yr"),
        timefn.time_hour(F.col("ts").cast("long")).cast("long").alias("hr"),
        timefn.time_weekday(F.col("ts").cast("long")).cast("long").alias("wd"),
        F.expr("ts div 1000").alias("t_us"),
        timefn._div(timefn.round_time(F.col("ts").cast("long"), 300 * 10**9), 1000).alias("t5m_us"),
    )


def _q_math_funcs(spark, sf_dir):
    """Math scalar battery (§2.5, fx_definitions.go:79-105): the Go math.*
    entries with no 1:1 Spark builtin — exp2/pow10/trunc/mod/remainder plus
    2-arg min/max (fm_monad.go:848-878).  Divisors are powers of two so the
    float arithmetic is bit-exact against the oracle's formulas."""
    from neo_server_spark.functions import mathfn

    ev = nio.load_table(spark, sf_dir, "events")
    x = F.col("value")
    return ev.select(
        "event_id",
        F.round(mathfn.exp2(mathfn.mod(x, 8.0)), 6).alias("e2"),
        mathfn.pow10(F.col("event_id") % 3).alias("p10"),
        mathfn.trunc(x - 256.0).alias("tr"),
        mathfn.mod(x, 2.0).alias("md"),
        mathfn.remainder(x, 2.0).alias("rem"),
        mathfn.min2(x, 100.0).alias("mn"),
        mathfn.max2(x, 100.0).alias("mx"),
    )


def _q_range_join(spark, sf_dir):
    """Range-bucket join (extension, SURVEY §2.8): rows joined to [low, high)
    value buckets via a broadcast non-equi join — the scale-safe shape for a
    tiny bucket dimension (BroadcastNestedLoopJoin, no shuffle of the fact
    side)."""
    ranges = spark.createDataFrame(
        [(i * 100.0, (i + 1) * 100.0, f"b{i}") for i in range(10)],
        "low double, high double, bucket string")
    ev = nio.load_table(spark, sf_dir, "events").select("event_id", "value")
    return joins.range_bucket_join(ev, ranges, "value") \
        .select("event_id", "value", "bucket").orderBy("event_id")


def _q_time_format(spark, sf_dir):
    """Named timeformat rendering (mods/util/time_formats.go via the sinks'
    timeformat() option): DATETIME / RFC3339 / Default.ms layouts as
    JVM-side date_format expressions with exact sub-second digits."""
    from neo_server_spark.functions import timefn

    ev = nio.load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    return ev.select(
        "event_id",
        timefn.str_time_named(t, "DateTime").alias("f_datetime"),
        timefn.str_time_named(t, "RFC3339").alias("f_rfc3339"),
        timefn.str_time_named(t, "Default.ms").alias("f_ms"),
    )


def _q_fake_gens(spark, sf_dir):
    """FAKE generators (fm_fake.go): linspace x arrange meshgrid grid.  The
    hashed surface value is exactly representable in binary (x on a 0.5
    lattice, y integer -> x*x + y is a multiple of 0.25), so JVM-vs-libm ulp
    drift can't flip a rounding boundary; the trig surface (sphere()) is
    asserted against numpy in tests/test_tql_pipeline.py instead."""
    from neo_server_spark.tql import fake as FK

    xs = FK.linspace(spark, 0.0, 10.0, 21)                   # step 0.5, exact
    ys = FK.arrange(spark, 0.0, 2.0, 1.0).withColumnRenamed("x", "y")
    grid = xs.crossJoin(ys)                                   # meshgrid
    return grid.select(
        "x", "y",
        (F.col("x") * F.col("x") + F.col("y")).alias("z"),
    ).orderBy("x", "y")  # deterministic emit order — driver hashes row order


def _q_csv_source(spark, sf_dir):
    """CSV literal source with typed field() coercion (fm_csv.go:326-373)."""
    from neo_server_spark.tql import fake as FK

    raw = FK.from_csv_literal(
        spark,
        "1,temp.a,3.14\n2,temp.b,2.71\n3,hum.a,55.5",
        columns=["id", "tag", "val"],
    )
    return raw.select(
        F.col("id").cast("int").alias("id"),
        "tag",
        F.col("val").cast("double").alias("val"),
    )


def _q_show_tags(spark, sf_dir):
    """SHOW TAGS + V$<T>_STAT via the catalog API (spi/show.go:1324)."""
    from neo_server_spark.sqlx import catalog

    out = catalog.show_tags(_tag(spark, sf_dir))
    return out.select(
        "name", "row_count",
        F.expr("min_time div 1000").alias("min_time"),
        F.expr("max_time div 1000").alias("max_time"),
        "min_value", "max_value",
    ).orderBy("name")


def _q_show_rollup_gap(spark, sf_dir):
    """SHOW ROLLUPGAP (spi/show.go:1206-1245 ShowRollupGap; V$ROLLUP
    gap visibility, r13 verdict #6): the cascade is built from rows
    BEFORE a cutoff, then the gap report is computed against the full
    source — per level, src frontier vs covered-end (max bucket +
    period) and the unrolled-backlog row count, which the oracle
    recomputes from the raw rows.  One source pass for all three
    levels' backlogs (conditional counts)."""
    import tempfile

    from neo_server_spark.sqlx import catalog
    from neo_server_spark.sqlx.rollup import RollupRouter

    cut = 19732 * 86400 * 10**9          # 2024-01-10T00:00Z, epoch-ns
    ev = (_tag(spark, sf_dir).filter(F.col("event_id") < 6000)
          .select("name", "time", "value"))
    router = RollupRouter(spark, tempfile.mkdtemp(prefix="rgap_"))
    router.build(ev.filter(F.col("time") < cut))
    out = catalog.show_rollup_gap(router, ev)
    # rollup_table is a tempdir path — not oracle-comparable
    return (out.select("rollup_name", "src_end_time",
                       "rollup_end_time", "gap", "run_state")
            .orderBy("rollup_name"))


def _q_show_lsm(spark, sf_dir):
    """SHOW LSM (spi/show.go:988-1016 ShowLsm; r13 verdict #6):
    per-day-partition file-size tier occupancy.  The fixture writes a
    DETERMINISTIC file count per day partition (day d gets d%3+1
    files: three append rounds, round j covering days with d%3+1 >= j,
    coalesce(1) so each round lays exactly one file per day), then
    reads the tier report at both threshold extremes — target 0 puts
    every file at level 2, target 1 GB at level 0 — so the oracle can
    recompute table_name/level/count exactly from the construction
    rule."""
    import tempfile

    from neo_server_spark.sqlx import catalog

    ev = (_tag(spark, sf_dir).filter(F.col("event_id") < 6000)
          .select("name", "time", "value",
                  F.expr("time div 86400000000000").alias("d"))
          .filter(F.col("d") < 19731))
    root = tempfile.mkdtemp(prefix="show_lsm_")
    for j in (1, 2, 3):
        (ev.filter(F.expr(f"d % 3 + 1 >= {j}")).coalesce(1)
         .write.mode("append").partitionBy("d").parquet(root))
    hot = catalog.show_lsm(spark, root, target_file_bytes=0)
    cold = catalog.show_lsm(spark, root, target_file_bytes=10**9)
    return hot.unionByName(cold).orderBy("table_name", "level")


def _q_tql_dsl(spark, sf_dir):
    """End-to-end TQL DSL pipeline through Tql/Pipeline (SRC -> MAP* -> df):
    SQL_SELECT builder -> MAPVALUE -> PUSHVALUE, the L1 slice of SURVEY §7."""
    from neo_server_spark.tql import Tql

    p = (
        Tql(spark, sf_dir)
        .sql_select("value", table="events", tag=["purchase", "error"],
                    between=(TW_FROM, TW_UNTIL))
        .mapvalue(2, F.round(F.col("value") * 1.1, 6), name="value")
        .pushvalue(3, F.expr("time div 1000"), name="time_us")
    )
    return p.to_df().drop("time").orderBy("name", "time_us", "value")


TQL_SCRIPT = """
// per-tag rollup written as a TQL *script* (text), parsed and lowered by
// tql/script.py onto the engine — SQL source + GROUP battery + rounding
SQL('select event_type, value from events')
GROUP(by(value(0), "name"),
      sum(value(1), "sum_value"),
      avg(value(1), "avg_value"),
      count(value(1), "cnt"))
MAPVALUE(1, round(value(1), 6))
MAPVALUE(2, round(value(2), 6))
"""


def _q_tql_script(spark, sf_dir):
    """TQL text front-end end-to-end: parse + run a .tql script string
    (script_parser.go / fx_definitions.go surface; goldens in
    tests/test_tql_scripts.py run the reference's own files)."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run(TQL_SCRIPT)


def _q_tql_script_js(spark, sf_dir):
    """SCRIPT("js", {...}) inside a TQL text script (fm_script.go:34-109):
    the jslite interpreter filters and maps records in one persistent VM
    ($.values access, arithmetic, modulo), then GROUP aggregates with
    sorted emit.  Certifies the SCRIPT statement end-to-end against a pure
    SQL oracle."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run("""
        SQL('select event_type, value, user_id from events')
        SCRIPT("js", {
            if ($.values[1] > 100) {
                $.yield($.values[0], $.values[1], $.values[2] % 7)
            }
        })
        GROUP(by(value(0), "name"), count(value(1), "cnt"),
              sum(value(2), "modsum"))
    """)



def _q_tql_set_vars(spark, sf_dir):
    """SET(name, expr) record variables + $name references through the
    text front-end (task_node.go:137-147, task_record.go:123-139;
    task_test.go TestSetVariables): the bound expression composes per
    record into later MAPVALUEs — pure column algebra, scan-side, no
    shuffle."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run("""
        SQL('select event_id, event_type, value from events')
        SET(v2, value(2) * 2)
        SET(v2, $v2 + 1)
        MAPVALUE(3, round($v2, 6), "v2p")
        POPVALUE(2)
    """)


def _q_simplex_noise(spark, sf_dir):
    """EXACT OpenSimplex noise (mods/nums/opensimplex, Kurt Spencer's
    public-domain algorithm; fm_fake.go:521-538 simplex()) — the
    TestLoader_simplex.tql shape: 10x10 meshgrid, abs(simplex(123,x,y))*10.
    The oracle pins the 100 closed-form values (the same technique as the
    WAV/PPM decode oracles); noise evaluation is an Arrow-batched
    numpy-vectorized pandas UDF — scale-safe (stateless per batch)."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run("""
        FAKE( meshgrid( linspace(0, 10, 10), linspace(0, 10, 10)) )
        MAPVALUE(2, round(abs(simplex(123, value(0), value(1))) * 10, 6), "v")
    """)


def _q_when_throttle(spark, sf_dir):
    """WHEN(cond, doLog(...)) + THROTTLE(tps) are flow-preserving
    (fm_monad.go:2395-2413, 240-271): side effects fire per matching
    record, the stream passes through unchanged; THROTTLE is a batch
    no-op (rate limiting is a streaming-trigger concern).  The oracle is
    the unchanged projection — certifying the pass-through contract."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run("""
        SQL('select event_id, event_type, value from events')
        THROTTLE(1000000)
        WHEN( value(2) > 489.0, doLog("hot", value(0), value(2)) )
        MAPVALUE(2, round(value(2), 6))
    """)


def _q_group_weighted(spark, sf_dir):
    """weight() aggregate variants (fm_monad.go:743-746 + newAggregate
    Weight arm; gonum weighted stat semantics): weighted mean/variance/
    stddev/stderr are plain aggregate algebra (map-side partial combine,
    scale-safe); weighted quantile/mode scan a per-group sorted array —
    bounded groups (per-tag), the reference's own collect-per-group
    shape."""
    from neo_server_spark.operators.group import agg as A

    ev = nio.load_table(spark, sf_dir, "events")
    w = (F.lit(1.0) + F.col("user_id") % 5).alias("__w")
    vv = (F.round(F.col("value") / 50.0) * 50.0).alias("__vv")
    df = ev.select(F.col("event_type").alias("name"),
                   F.col("value").alias("__x"), w, vv)
    return df.groupBy("name").agg(
        F.round(A.wavg("__x", "__w", "wmean"), 6).alias("wmean"),
        F.round(A.wvariance("__x", "__w", "wvar"), 6).alias("wvar"),
        F.round(A.wstddev("__x", "__w", "wstd"), 6).alias("wstd"),
        F.round(A.wstderr("__x", "__w", "wse"), 6).alias("wse"),
        A.wquantile("__x", "__w", 0.9, "q90"),
        A.wmode("__vv", "__w", "wmode"),
    ).orderBy("name")


def _q_codec_csv(spark, sf_dir):
    """The CSV codec itself under the driver's value-hash gate: render
    1000 events through codecs.encoders.to_csv (float shortest-at-6
    formatting, 'Default' trimmed-millis time layout — float.go:8-38 /
    time_formats.go:17 parity) and return the LINES as rows; the oracle
    reproduces every byte with printf/strftime.  Complements the byte-exact
    reference-golden tests with an independent engine-vs-SQL check."""
    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id", F.col("ts").cast("long").alias("time"), "value")
          .orderBy("event_id").limit(1000))
    txt = encoders.to_csv(ev, header=False, timeformat="Default",
                          time_cols=("time",))
    rows = [(i, ln) for i, ln in enumerate(txt.splitlines())]
    return spark.createDataFrame(rows, "i long, line string")


def _q_scalar_funcs_tql(spark, sf_dir):
    """Round-5 registry completion exercised through the TEXT front-end:
    the trig/hyperbolic family, log2/exp2/trunc/mod/remainder
    (fx_definitions.go:79-105), strIndex/strLastIndex (fm_fake.go:632-638),
    regexp/glob (fm_monad.go:2144-2167), strTime + the timeYear..timeWeekDay
    extractors, timeUnix*, and tz() (fm_time.go:54-394) — every expression
    parsed from .tql text and lowered to JVM-side Column expressions (no
    UDFs, scan-side projection; scale-safe by construction)."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir).run("""
        SQL('select event_id, ts, value, event_type from events')
        MAPVALUE(4, timeYear(value(1)), "yr")
        MAPVALUE(5, timeISOWeek(value(1)), "isow")
        MAPVALUE(6, timeISOYear(value(1)), "isoy")
        MAPVALUE(7, timeYearDay(value(1)), "yday")
        MAPVALUE(8, timeWeekDay(value(1)), "wd")
        MAPVALUE(9, timeUnixMilli(value(1)), "t_ms")
        MAPVALUE(10, timeHour(value(1), tz('Asia/Seoul')), "hr_kst")
        MAPVALUE(11, strTime(value(1), 'RFC3339'), "rfc")
        MAPVALUE(12, round(atan(value(2)), 6), "at")
        MAPVALUE(13, round(sinh(mod(value(2), 4)), 6), "sh")
        MAPVALUE(14, round(tanh(value(2) / 100), 6), "th")
        MAPVALUE(15, round(log2(abs(value(2)) + 1), 6), "l2")
        MAPVALUE(16, round(exp2(mod(value(2), 8)), 6), "e2")
        MAPVALUE(17, trunc(value(2) / 7), "tr")
        MAPVALUE(18, round(remainder(value(2), 2), 6), "rem")
        MAPVALUE(19, round(acos(mod(value(2), 1)), 6), "ac")
        MAPVALUE(20, strIndex(value(3), 'a'), "idx_a")
        MAPVALUE(21, strLastIndex(value(3), 'a'), "lidx_a")
        MAPVALUE(22, regexp('^[cp]', value(3)), "rx")
        MAPVALUE(23, glob('*e*', value(3)), "gl")
        POPVALUE(1, 2, 3)
    """)


def _q_lookup_join(spark, sf_dir):
    """VOLATILE/LOOKUP keyed table (spi/do.go:197-207): upsert -> update ->
    delete, then enrich the event stream by joining the final state.  The
    oracle holds the closed-form final table as VALUES; the snapshot is
    dimension-sized so the join broadcasts (no shuffle on the fact side)."""
    import tempfile

    from neo_server_spark.sqlx.keyvalue import KeyedTable

    t = KeyedTable(spark, tempfile.mkdtemp(prefix="neo_lut_"),
                   key="name", kind="lookup")
    t.upsert([{"name": "purchase", "tier": "basic"},
              {"name": "click", "tier": "silver"},
              {"name": "error", "tier": "bronze"},
              {"name": "view", "tier": "basic"},
              {"name": "signup", "tier": "silver"}])
    # ON DUPLICATE KEY UPDATE + an unmatched insert
    t.upsert([{"name": "purchase", "tier": "gold"},
              {"name": "refund", "tier": "none"}])
    t.delete(["view"])
    ev = _tag(spark, sf_dir)
    return (
        ev.join(t.df(), "name")
        .groupBy("name", "tier")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .orderBy("name")
    )


def _q_sliding_window(spark, sf_dir):
    """Sliding-window agg (1h window / 30min hop): sequence() explode +
    single hash aggregate (extension beyond tumbling timewindow)."""
    from neo_server_spark.operators.group import sliding_window

    df = _tag(spark, sf_dir)
    out = sliding_window(
        df, "time", 3_600 * 10**9, 1_800 * 10**9,
        aggs=[F.count(F.lit(1)).alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value")],
        series=["name"], bucket_name="w",
    )
    return out.select("name", F.expr("w div 1000").alias("time"), "cnt",
                      "avg_value").orderBy("name", "time")


def _q_session_window(spark, sf_dir):
    """Session windows (30min inactivity gap) per user: gaps-and-islands in
    exact ns math."""
    from neo_server_spark.operators.group import session_window

    ev = nio.load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("time"), "value")
    out = session_window(
        ev, "time", 1_800 * 10**9,
        aggs=[F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("sum_value")],
        series=["user_id"],
    )
    return out.select(
        "user_id",
        F.expr("session_start div 1000").alias("session_start"),
        F.expr("session_end div 1000").alias("session_end"),
        "cnt", "sum_value",
    ).orderBy("user_id", "session_start")


def _q_stats_aggs(spark, sf_dir):
    """GROUP statistical aggregate battery II (fm_monad.go:1213-1307):
    moment(2|3), correlation, covariance, lrs slope, cdf, weighted mean."""
    df = _tag(spark, sf_dir).select("name", "value", "event_id",
                                    F.col("user_id").cast("double").alias("uid"))
    wgt = (F.col("event_id") % 10 + 1).cast("double")
    return group(
        df,
        by=[(F.col("name"), "name")],
        aggs=[
            F.round(agg.moment("value", 2, "x"), 4).alias("moment2"),
            F.round(agg.moment("value", 3, "x"), 2).alias("moment3"),
            F.round(agg.correlation("value", "uid", "x"), 6).alias("corr_vu"),
            F.round(agg.covariance("value", "uid", "x"), 4).alias("covar_vu"),
            F.round(agg.lrs("uid", "value", "x"), 8).alias("lrs_slope"),
            agg.cdf("value", 100.0, "cdf_100"),
            F.round(agg.wavg("value", wgt, "x"), 6).alias("wavg_value"),
        ],
    ).orderBy("name")


def _q_series_diffs(spark, sf_dir):
    """MAP_ABSDIFF / MAP_NONEGDIFF on value + MAP_DIFF on the time column
    (fm_monad.go:1806-1906; time diffs are exact integer ns)."""
    df = _tag(spark, sf_dir).select("name", "time", "value", "event_id",
                                    F.expr("time div 1000").alias("time_us"))
    out = series.map_absdiff(df, "value", out="absdiff", series=["name"],
                             order_by=["time", "event_id"])
    out = series.map_nonegdiff(out, "value", out="nonegdiff", series=["name"],
                               order_by=["time", "event_id"])
    # diff in us space: the oracle's parquet reader truncates ns -> us
    out = series.map_diff(out, "time_us", out="diff_us", series=["name"],
                          order_by=["time", "event_id"])
    return out.select("name", _us("time"), "value", "absdiff", "nonegdiff",
                      "diff_us").orderBy("name", "time", "value")


def _q_map_distance(spark, sf_dir):
    """MAP_DISTANCE — haversine meters from the previous point per series
    (fm_monad.go:2109-2142).  Coordinates derived deterministically from the
    events columns (no geo columns in TESTDATA); cm-rounded so libm-vs-JVM
    trig ulps can't flip the value hash."""
    df = _tag(spark, sf_dir).select(
        "name", "time", "event_id",
        ((F.col("user_id") % 17000) / 100.0 - 85.0).alias("lat"),
        ((F.col("event_id") % 36000) / 100.0 - 180.0).alias("lon"),
    )
    out = series.map_distance(df, "lat", "lon", out="dist_m", series=["name"],
                              order_by=["time", "event_id"])
    return out.select("name", _us("time"), "lat", "lon",
                      F.round("dist_m", 2).alias("dist_m")) \
        .orderBy("name", "time", "lat", "lon")


def _q_lake_pivot(spark, sf_dir):
    """PIVOT (agg FOR col IN (...)) (http_lake.go:1650-1652) — hourly bucket
    x event_type sum-of-value matrix via groupBy().pivot() with an explicit
    IN-list (single-pass pivot, no second distinct job)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    df = _tag(spark, sf_dir)
    h = 3_600 * 10**9
    bucket = F.expr(f"(time div {h}) * {h} div 1000").alias("bucket")
    out = df.groupBy(bucket).pivot("name", kinds).sum("value")
    for k in kinds:
        out = out.withColumn(k, F.round(F.coalesce(F.col(k), F.lit(0.0)), 6))
    return out.orderBy("bucket")


def _q_group_list(spark, sf_dir):
    """GROUP list(...) chunk aggregate (fm_monad.go:1170-1184) — the ordered
    per-group value list, emitted as an integer-cents CSV string so the
    array's cross-engine representation can't affect the value hash."""
    df = _tag(spark, sf_dir).filter(F.col("name") == "error")
    cents = F.round(F.col("value") * 100).cast("long")
    lst = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("time"), F.col("event_id"), cents.alias("c")))),
            lambda s: s["c"].cast("string"),
        ), ",")
    return df.groupBy("name").agg(lst.alias("value_list"))


def _q_rollup_routed(spark, sf_dir):
    """ROLLUP-hint routed aggregation (http_lake.go:1692-1698): the hourly
    answer is served from the sec->min->hour rollup cascade, never the raw
    table.  Exactness: count/min/max/first/last are exactly mergeable; avg is
    derived from merged sum/cnt (rounded like every float aggregate here)."""
    import os

    from neo_server_spark.sqlx.rollup import RollupRouter

    base = f"/tmp/neo_rollups_{os.path.basename(os.path.normpath(sf_dir))}"
    router = RollupRouter(spark, base)
    if not os.path.isdir(os.path.join(base, "rollup_hour")):
        router.build(nio.events_as_tag(spark, sf_dir))
    out = router.query(TW_PERIOD, {"cnt": "count", "min_value": "min",
                                   "max_value": "max", "avg_value": "avg",
                                   "first_value": "first", "last_value": "last"})
    return out.select("name", "time", "cnt", "min_value", "max_value",
                      F.round("avg_value", 6).alias("avg_value"),
                      "first_value", "last_value").orderBy("name", "time")


def _q_lake_decode(spark, sf_dir):
    """Lake-API dialect SQL end-to-end: DECODE / FIRST / LAST / DATE_TRUNC
    rewritten onto Spark SQL (http_lake.go dialect, SURVEY §2.7)."""
    from neo_server_spark.sqlx import dialect

    nio.events_as_tag(spark, sf_dir).createOrReplaceTempView("tag_events")
    df = dialect.lake_sql(spark, """
        SELECT name,
               DATE_TRUNC('HOUR', time, 6) AS bucket,
               FIRST(time, value) AS first_value,
               LAST(time, value) AS last_value,
               sum(DECODE(name, 'error', 1, 0)) AS n_error_rows,
               count(*) AS cnt
        FROM tag_events
        GROUP BY name, DATE_TRUNC('HOUR', time, 6)
    """)
    # driver hashes rows in emission order — pin it
    return df.orderBy("name", "bucket")


def _q_lake_tochar(spark, sf_dir):
    """Lake-dialect TO_CHAR + /*+ SCAN_BACKWARD */ end-to-end: the hint
    strips to an ORDER BY time DESC (Catalyst top-down scan analogue),
    TO_CHAR rewrites to date_format — both purely textual, then Spark SQL."""
    from neo_server_spark.sqlx import dialect

    nio.events_as_tag(spark, sf_dir).createOrReplaceTempView("tag_events")
    return dialect.lake_sql(spark, """
        SELECT /*+ SCAN_BACKWARD(tag_events) */
               name, time DIV 1000 AS time,
               TO_CHAR(timestamp_micros(time DIV 1000), 'yyyy-MM-dd HH') AS hour_str,
               value
        FROM tag_events WHERE name = 'click'
    """)


def _q_text_stats(spark, sf_dir):
    docs = nio.load_table(spark, sf_dir, "documents")
    out = text.text_stats(docs)
    return out.withColumn("char_len", F.col("char_len").cast("long")) \
              .withColumn("n_tokens", F.col("n_tokens").cast("long"))


def _q_token_counts(spark, sf_dir):
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.token_count_by(docs, by="lang").orderBy("lang")


def _q_doc_fingerprint(spark, sf_dir):
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs).select("doc_id", "fp")


def _q_dedup_exact(spark, sf_dir):
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_stats(docs).orderBy("source")


def _q_similarity_topk(spark, sf_dir):
    emb = nio.load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, query_vec_id=0, k=20)


def _q_similarity_ivf_batch(spark, sf_dir):
    """Batch IVF k-NN (similarity.ivf_topk_join — the production shape
    for eval-set / dedup-probe ANN: one broadcast probe-frame join
    replaces |queries| separate jobs).  Probing ALL centroids degrades to
    exact brute force, so the brute-force SQL oracle certifies the probe
    assignment, the bucket join, self-exclusion, and per-query ranking
    end-to-end (recall at restricted nprobe is measured in COVERAGE.md's
    recall audit)."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    cents, assigned = similarity.ivf_index(emb, n_centroids=8, iters=2)
    qs = emb.filter(F.col("vec_id") < 3)
    return (similarity.ivf_topk_join(assigned, cents, qs, k=5, nprobe=8)
            .orderBy("query_id", F.col("cosine").desc(), "vec_id"))


def _q_similarity_pq_rerank(spark, sf_dir):
    """Two-stage PQ ANN (similarity.pq_search_rerank): ADC shortlist ->
    exact-cosine re-rank of ONLY the shortlist rows.  With the shortlist
    covering the corpus the result is exactly brute force (the property
    pinned here by the brute-force SQL oracle); production sizes
    shortlist ~10x k, turning ADC's recall@shortlist into the final
    recall@k at O(shortlist) vector fetches — COVERAGE.md's recall audit
    measured why the raw 32-bit-code ranking needs this stage."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    cb = similarity.pq_train(emb, m=8, k=16, iters=0)
    rest = emb.filter(F.col("vec_id") != 0)
    codes = similarity.pq_encode(rest, cb)
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return similarity.pq_search_rerank(codes, cb, rest, qv, k=10,
                                       shortlist=1_000_000)


def _q_similarity_batch(spark, sf_dir):
    """Batch k-NN (similarity.topk_join): tiny query set broadcast over the
    corpus, per-query window top-k — corpus side never shuffles before the
    k x |queries|-row rank."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    return (
        similarity.topk_join(emb, qs, k=5)
        .orderBy("query_id", F.col("cosine").desc(), "vec_id")
    )


def _q_similarity_ivf(spark, sf_dir):
    """IVF-bucketed ANN (datapipe/similarity.py): k-means coarse index +
    probed bucket search.  Probing ALL centroids makes the result exactly
    the brute-force top-k, so the brute-force SQL oracle checks the whole
    index/probe pipeline end-to-end."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    centroids, assigned = similarity.ivf_index(emb, n_centroids=8, iters=2)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    hits = similarity.ivf_search(assigned.filter(F.col("vec_id") != 0), centroids,
                                 qv, k=20, nprobe=8)
    lbl = emb.select("vec_id", "label")
    return (hits.join(F.broadcast(lbl), "vec_id")
            .select("vec_id", "label", F.round("cosine", 6).alias("cosine")))


def _q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing (datapipe/multimodal.py): binary payload column ->
    mapInPandas feature extraction over Arrow batches.  The digest kernel
    stands in for a model forward pass; schema/batching/partitioning are the
    real article."""
    from neo_server_spark.datapipe import multimodal

    assets = multimodal.synthesize_assets(spark, 128)
    return multimodal.extract_features(assets)


def _q_line_protocol(spark, sf_dir):
    """Influx line-protocol decode (spi/do.go:15-110): measurement.field
    fan-out, int 'i' suffix, quoted strings dropped."""
    from neo_server_spark.streaming import ingest

    lines = spark.createDataFrame(
        [
            ("cpu,host=a usage=0.5,cores=8i 1704067200000000001",),
            ("mem usage=0.25 1704067200000000002",),
            ("cpu label=\"text\",usage=0.75 1704067200000000003",),
            ("garbage-line",),
        ],
        ["value"],
    )
    return ingest.decode_line_protocol(lines)


def _q_contamination(spark, sf_dir):
    """Benchmark-decontamination screen (datapipe.text.contamination):
    src0/src1 documents stand in for the eval benchmark; every other doc
    reports its distinct 5-gram overlap against them.  The semi-join rides
    the xxhash64 shingle digest (fixed-width shuffle keys); the oracle
    joins raw shingles — equal modulo 64-bit collisions (~1e-10 here)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source").isin("src0", "src1"))
    rest = docs.filter(~F.col("source").isin("src0", "src1"))
    return text.contamination(rest, bench, shingle_n=5, threshold=0.2) \
        .orderBy("doc_id")


def _q_multimodal_decode(spark, sf_dir):
    """REAL image decode certified by a closed-form oracle: PPM payloads
    (deterministic gradient synthesis) decode in a mapInPandas kernel to
    per-asset dimensions and channel means; the oracle recomputes the
    expected means analytically from the synthesis formula — the binary
    round-trip is the only way the Spark side can match it
    (datapipe/multimodal.py decode_image_raw, no PIL required)."""
    from neo_server_spark.datapipe import multimodal

    assets = multimodal.synthesize_ppm_assets(spark, 16)
    out = multimodal.image_stats(assets)
    return out.withColumn("width", F.col("width").cast("long")) \
              .withColumn("height", F.col("height").cast("long")) \
              .orderBy("asset_id")


def _q_multimodal_audio(spark, sf_dir):
    """REAL audio decode certified by a closed-form oracle: PCM WAV
    payloads (int16 sawtooth synthesis) decode in a mapInPandas kernel to
    rate/length/peak/RMS; the oracle recomputes RMS analytically from the
    synthesis formula with the identical float expression
    (datapipe/multimodal.py decode_audio_raw, stdlib wave only)."""
    from neo_server_spark.datapipe import multimodal

    assets = multimodal.synthesize_wav_assets(spark, 8)
    out = multimodal.audio_stats(assets)
    return out.withColumn("rate", F.col("rate").cast("long")) \
              .withColumn("peak", F.col("peak").cast("long")) \
              .orderBy("asset_id")


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs at Hamming distance <= 3 (Charikar/Manku
    et al.; dedup.simhash_hamming_pairs): the 60-bit md5-mode signature
    splits into 4 pigeonhole blocks, candidates come from block-keyed
    equi-joins, and only candidates pay the XOR-popcount verify.  The
    oracle recomputes signatures, block candidacy and bit_count(xor)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(docs, max_dist=3, hash_fn="md5") \
        .orderBy("id_a", "id_b")


def _q_multimodal_video(spark, sf_dir):
    """REAL video decode certified by a SQL oracle: YUV4MPEG2 payloads
    (deterministic luma pattern (a*7+f*31+k)%251) decode in a mapInPandas
    kernel to per-frame exact luma sums; the oracle recomputes each sum
    from the synthesis formula with generate_series
    (datapipe/multimodal.py decode_video_y4m — stdlib only; compressed
    containers gate on ffmpeg)."""
    from neo_server_spark.datapipe import multimodal

    assets = multimodal.synthesize_y4m_assets(spark, 6)
    return (multimodal.video_frame_stats(assets)
            .withColumn("frame_no", F.col("frame_no").cast("long"))
            .withColumn("width", F.col("width").cast("long"))
            .withColumn("height", F.col("height").cast("long"))
            .withColumn("fps", F.col("fps").cast("long"))
            .orderBy("asset_id", "frame_no"))


def _q_streaming_rollup(spark, sf_dir):
    """Structured Streaming end-to-end with a BATCH ORACLE: file-source
    readStream over the events parquet -> hourly per-tag rollup (complete
    mode) -> availableNow -> memory sink, returning the final materialized
    table.  The memory sink is the verification harness only — the
    production path is streaming/ingest.stream_rollup's foreachBatch
    parquet writer; the aggregate itself (groupBy tag+bucket) is the same
    bounded-state shape either way (O(tags x buckets) state rows)."""
    import uuid

    from neo_server_spark import io as nio

    import os

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # Spark-written layout: events.parquet IS a directory of parts
        src = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file layout: the file source wants a directory — point at
        # sf_dir and glob the one file
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    src = nio._normalize_basetime(src, ("ts",))
    hour = 3_600 * 10**9
    agg = (
        src.groupBy(F.col("event_type").alias("name"),
                    (F.col("ts") - F.pmod("ts", F.lit(hour))).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )
    table = "stream_rollup_" + uuid.uuid4().hex[:8]
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(table).trigger(availableNow=True).start())
    _await(q, 120)
    return spark.table(table).orderBy("name", "bucket")


def _q_streaming_lowpass(spark, sf_dir):
    """Stateful streaming operator end-to-end vs a batch oracle: file-source
    readStream -> applyInPandasWithState EWMA (streaming/stateful.py:30 —
    one double of state per tag, O(tags) total) -> availableNow -> memory
    sink.  The oracle is the closed-form geometric expansion of the same
    recursion (identical to map_lowpass's).  Verification harness only;
    production wiring is streaming/ingest.py."""
    import os
    import uuid

    from neo_server_spark.streaming import stateful

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    src = nio._normalize_basetime(src, ("ts",))
    stream = src.select(F.col("event_type").alias("name"),
                        F.col("ts").cast("long").alias("time"),
                        F.col("value"))
    out = stateful.streaming_lowpass(stream, alpha=0.2, series=("name",))
    table = "stream_lowpass_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(table).trigger(availableNow=True).start())
    _await(q, 120)
    return (spark.table(table)
            .select("name", _us("time"), "value",
                    F.round("lowpass", 6).alias("lowpass"))
            .orderBy("name", "time", "value"))


def _read_events_stream(spark, sf_dir):
    """File-source readStream over the events table, normalized to epoch-ns
    (handles both the single-file and Spark-directory parquet layouts)."""
    import os

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    return nio._normalize_basetime(src, ("ts",))


def _q_streaming_filter_changed(spark, sf_dir):
    """Stateful streaming FILTER_CHANGED vs a batch lag() oracle: the
    per-series previous value persists across micro-batches in the state
    store (streaming/stateful.py:196 — one double per tag), so batch
    boundaries never re-emit; availableNow + memory sink is the
    verification harness."""
    import uuid

    from neo_server_spark.streaming import stateful

    stream = _read_events_stream(spark, sf_dir).select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    out = stateful.streaming_filter_changed(stream, series=("name",))
    table = "stream_fc_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(table).trigger(availableNow=True).start())
    _await(q, 120)
    return (spark.table(table).select("name", _us("time"), "value")
            .orderBy("name", "time"))


def _q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (streaming/stateful.py:238
    dropDuplicatesWithinWatermark — state bounded by the lateness horizon,
    the shape that survives an unbounded stream): the source is the events
    stream UNIONED with itself, so every (name, time) key arrives twice;
    the oracle is the plain batch DISTINCT."""
    import uuid

    from neo_server_spark.streaming import stateful

    base = _read_events_stream(spark, sf_dir).select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    doubled = base.union(base)
    out = stateful.streaming_dedup(doubled, keys=("name", "time"),
                                   watermark="10 minutes")
    table = "stream_dedup_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(table).trigger(availableNow=True).start())
    _await(q, 120)
    return (spark.table(table).select("name", _us("time"), "value")
            .orderBy("name", "time"))


def _q_streaming_fill(spark, sf_dir):
    """Streaming timewindow with cross-batch GAP FILL (streaming/
    stateful.py:119 — SURVEY risk item (d)): per series, buckets close as
    later data arrives and empty buckets emit the previous bucket's average
    (PiecewiseConstant), the last bucket staying open.  The batch oracle is
    the calendar join + last-non-null window fill over [min, max) buckets.
    O(1) state per series — the shape that survives an unbounded stream."""
    import uuid

    from neo_server_spark.streaming import stateful

    stream = _read_events_stream(spark, sf_dir).select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    out = stateful.streaming_timewindow_fill(
        stream, period_ns=3_600 * 10**9, series=("name",))
    table = "stream_fill_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(table).trigger(availableNow=True).start())
    _await(q, 120)
    return (spark.table(table)
            .select("name", _us("time"), "cnt",
                    F.round("avg_value", 6).alias("avg_value"))
            .orderBy("name", "time"))


def _q_rollup_cascade(spark, sf_dir):
    """The sec->min->hour rollup maintenance cascade itself
    (sqlx/rollup.py _summarize + two _fold merges — the background builders
    the engine's V$ROLLUP gap view tracks; ingest.py:158-191): hourly
    count/sum/min/max/avg/first/last recovered from second-level algebraic
    partials must equal the direct raw aggregation.  Merges are pure
    map-side-combining groupBys — the 100 TB maintenance shape (no raw-row
    reshuffle past the sec level)."""
    from neo_server_spark.sqlx.rollup import HOUR, MINUTE, SECOND, _fold, _summarize

    ev = nio.load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    sec = _summarize(ev, SECOND, "name", "time", "value")
    hour = _fold(_fold(sec, MINUTE), HOUR)
    return hour.select(
        "name", _us("time"), F.col("cnt").alias("cnt"),
        F.round("sum", 6).alias("sum_v"),
        F.round("min", 6).alias("min_v"),
        F.round("max", 6).alias("max_v"),
        F.round(F.col("sum") / F.col("cnt"), 6).alias("avg_v"),
        F.round("first", 6).alias("first_v"),
        F.round("last", 6).alias("last_v"),
    ).orderBy("name", "time")


def _q_retention(spark, sf_dir):
    """Retention job (machbase_template.conf DURATION_GAP;
    streaming/ingest.py apply_retention): whole day-partitions older than
    the horizon are DROPPED by partition pruning — no scan, no rewrite of
    surviving data.  The oracle is the equivalent time filter; matching
    rows prove the day-boundary semantics exactly."""
    import tempfile

    from neo_server_spark.io import write_tag_table
    from neo_server_spark.streaming.ingest import apply_retention

    ev = nio.load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    tmp = tempfile.mkdtemp(prefix="neo_retention_")
    write_tag_table(ev, tmp)
    # fixed horizon: now = 2024-02-11 UTC, keep 14 days -> drop < 2024-01-28
    now_ns = 1_707_609_600 * 10**9
    apply_retention(spark, tmp, keep_days=14, now_ns=now_ns)
    kept = spark.read.parquet(tmp)
    return (kept.select("name", _us("time"), "value")
            .orderBy("name", "time", "value"))


def _q_compaction(spark, sf_dir):
    """Small-file compaction (io.compact_tag_table — the engine's LSM-merge
    analogue, spi/show.go ShowLsm): three fragmented appends per day
    partition rewrite into ~target-size files, and the table's CONTENT is
    untouched — the oracle is the plain projection of the source rows.
    Cold-partition rewrite + atomic directory swap is the at-scale shape
    (no scan of surviving partitions, races with nothing)."""
    import tempfile

    from neo_server_spark.io import compact_tag_table, write_tag_table

    ev = nio.load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("name"),
        F.col("ts").cast("long").alias("time"), F.col("value"))
    tmp = tempfile.mkdtemp(prefix="neo_compact_")
    # fragment: three appends -> 3x files per (day x salt)
    for chunk in range(3):
        write_tag_table(ev.filter(F.pmod("time", F.lit(3)) == chunk),
                        tmp, mode="append")
    compact_tag_table(spark, tmp)
    kept = spark.read.parquet(tmp)
    return (kept.select("name", _us("time"), "value")
            .orderBy("name", "time", "value"))


def _q_script_udtf(spark, sf_dir):
    """SCRIPT(...) as MAP with $.yield() UDTF semantics (fm_script.go:82-109):
    Python/mapInPandas replaces the reference's embedded goja JS runtime.
    Every input row yields one 'base' record and 'purchase' rows additionally
    yield a 'bonus' record — 0..n outputs per input, streamed over Arrow
    batches (no row-at-a-time Python).  Rounding happens JVM-side after the
    kernel so both engines round identically."""
    from neo_server_spark.tql.pipeline import Pipeline

    ev = nio.load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "event_id": pdf["event_id"],
                "kind": "base",
                "out_value": pdf["value"] * 2.0,
            })
            bonus = pdf[pdf["event_type"] == "purchase"]
            if len(bonus):
                yield pd.DataFrame({
                    "event_id": bonus["event_id"],
                    "kind": "bonus",
                    "out_value": bonus["value"] * 3.0,
                })

    out = Pipeline(ev).script(kernel, "event_id long, kind string, out_value double").df
    return out.withColumn("out_value", F.round("out_value", 6))


def _q_shell_pipe(spark, sf_dir):
    """SHELL(cmd) (fm_shell.go:49-154): records CSV-serialized through an
    external awk process — one process per partition via rdd.pipe (per-
    executor fan-out, not per-row) — stdout lines re-parsed into typed
    columns.  Integer-only math so the text round-trip is exact."""
    from neo_server_spark.tql.pipeline import Pipeline

    ev = nio.load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = Pipeline(ev).shell("awk -F, '{print $1 \",\" ($2 % 7)}'").df
    parts = F.split(F.col("line"), ",")
    return out.select(
        parts[0].cast("long").alias("event_id"),
        parts[1].cast("long").alias("bucket"),
    )


def _q_query_builder(spark, sf_dir):
    """QUERY(value, from(...), between(...)) value-first builder
    (fm_dbsrc.go:56-91) with a multi-tag IN-list: the lake API's per-tag
    goroutine fan-out (http_lake.go:1596-1645) is a single parquet pass here —
    tag IN-list + time range both reach the scan as PushedFilters."""
    from neo_server_spark.tql.pipeline import Tql

    p = Tql(spark, sf_dir=sf_dir).query(
        "value", table="events", tag=["click", "view"], between=(TW_FROM, TW_UNTIL)
    )
    return p.df.select("name", _us("time"), "value").orderBy("name", "time", "value")


def _q_map_kalman(spark, sf_dir):
    """MAP_KALMAN(value, model(iv,pv,ov)) per tag (fm_monad.go:1908-1991,
    mods/nums/kalman) — applyInPandas scalar recursion, certified against a
    RECURSIVE-CTE oracle that walks the identical (P,K,x) update chain;
    tests/test_group_series.py additionally pins the reference golden
    sequence."""
    df = _tag(spark, sf_dir).select("name", "time", "value")
    out = series.map_kalman(df, "value", series=["name"], order_by="time")
    return out.select("name", _us("time"), "value",
                      F.round("kalman", 6).alias("kalman")) \
        .orderBy("name", "time", "value")


def _q_tpch_q5(spark, sf_dir):
    """Local-supplier-volume 6-table join (SQL surface breadth): region
    filter broadcast into nation, nation broadcast into the fact chain;
    customer ⨝ orders ⨝ lineitem ⨝ supplier are AQE-planned shuffle joins
    with the c_nationkey = s_nationkey equi-constraint riding the supplier
    join — no cartesian step anywhere in the plan."""
    r = nio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = nio.load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = nio.load_table(spark, sf_dir, "customer")
    o = nio.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01")))
    li = nio.load_table(spark, sf_dir, "lineitem")
    s = nio.load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def _q_lm_score(spark, sf_dir):
    """Unigram LM quality score: corpus vocabulary broadcast into the
    token-occurrence join — token stream never shuffles."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.lm_score(docs).orderBy("doc_id")


def _q_tokens_bpe(spark, sf_dir):
    """Regex (BPE-pre-tokenizer) token counts over punctuated text — word
    runs and punctuation marks counted as separate tokens."""
    docs = nio.load_table(spark, sf_dir, "documents")
    punct = F.concat(F.lit("Dr. "), F.col("source"), F.lit(": \""),
                     F.substring("text", 1, 30), F.lit("\" (v1.2, ok!)"))
    return (
        docs.select("doc_id",
                    F.size(text.tokens_re(punct)).cast("long").alias("n_bpe_tokens"),
                    F.size(text.tokens(F.substring("text", 1, 30))).cast("long").alias("n_ws_tokens"))
        .orderBy("doc_id")
    )


def _q_vocab_topk(spark, sf_dir):
    """Corpus top-100 vocabulary: explode → map-side-combined hash agg →
    TakeOrderedAndProject (shuffle is O(vocab), sort capped at k)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.vocab(docs, top_k=100).withColumnRenamed("count", "cnt")


def _q_embedding_stats(spark, sf_dir):
    """Embedding-quality profile per label: dim drift, L2-norm spread,
    zero-vector count — one scan, JVM-side fold, one hash agg."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_stats(emb, by="label")
    return out.withColumn("max_dim", F.col("max_dim").cast("long")) \
              .withColumn("min_dim", F.col("min_dim").cast("long")) \
              .orderBy("label")


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster resolution: n-gram Jaccard pairs → connected
    components (distributed min-label propagation, lineage-checkpointed per
    round) → canonical id per document.  Oracle re-derives the same
    components with a recursive CTE."""
    docs = nio.load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.05,
                                      prefilter_col="lang")
    return (
        dedup.dedup_clusters(docs, pairs)
        .select("doc_id", "canonical_id")
        .orderBy("doc_id")
    )


def _q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling (datapipe.sampling): keep 25%
    of en, all of de, half of fr/es, none of zh — decided by md5(doc_id), so
    the sample is identical on any engine/cluster/partitioning and stable
    under appends.  Scan-side filter, zero shuffle."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return (
        sampling.stratified_sample(
            docs, {"en": 0.25, "de": 1.0, "fr": 0.5, "es": 0.5}, by="lang")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _q_pii_scrub(spark, sf_dir):
    """PII redaction (datapipe.text.scrub_pii): synthetic email/IP/phone are
    woven into each doc from doc_id, then scrubbed by the chained
    regexp_replace patterns — all JVM-side, codegen'd, UDF-free."""
    docs = nio.load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    raw = F.concat(
        F.lit("u"), did, F.lit("@ex.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7 call +1-555-000-"),
        did, F.lit(" "), F.substring("text", 1, 40))
    return (
        text.scrub_pii(docs.withColumn("raw", raw), "raw", out="scrubbed")
        .select("doc_id", "scrubbed")
        .orderBy("doc_id")
    )


def _q_set_ops(spark, sf_dir):
    """Set operations (SURVEY §2.8 — native in our SQL layer, absent from
    TQL): users who clicked but never purchased, via EXCEPT — planned as a
    LEFT ANTI hash join on the deduplicated key sets."""
    ev = nio.load_table(spark, sf_dir, "events").withColumn(
        "t", F.col("ts").cast("long"))
    hour = 3_600 * 10**9
    bucket = ((F.col("t") - F.pmod(F.col("t"), F.lit(hour)))
              .cast("decimal(38,0)") / 1000).cast("long")
    clicked = ev.filter(F.col("event_type") == "click").select(
        "user_id", bucket.alias("hour_us"))
    bought = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", bucket.alias("hour_us"))
    return clicked.subtract(bought).orderBy("user_id", "hour_us")


def _q_distinct_users(spark, sf_dir):
    """Distinct-aggregation shape: per-tag exact distinct users + row counts
    in one pass — Spark plans the distinct as a partial-dedup expand, so the
    shuffle carries (tag, user) pairs already deduplicated map-side."""
    ev = nio.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("name"))
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_rows"))
        .orderBy("name")
    )


def _q_tpch_q4(spark, sf_dir):
    """Order-priority count with an EXISTS subquery (late-shipped lineitem)
    — planned as a LEFT SEMI join so the lineitem side deduplicates during
    the join instead of materializing matches; the o_orderdate range filter
    is pushed to the orders scan."""
    o = nio.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01")))
    li = nio.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
               "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def _q_tpch_q14(spark, sf_dir):
    """Promo-revenue ratio: lineitem ⨝ broadcast(part) with a conditional
    (CASE-guarded) numerator and shared denominator in ONE aggregate pass —
    the reference's DECODE/CASE-in-agg pattern (http_lake.go:794) at TPC-H
    shape.  part is dimension-sized at any SF that matters → broadcast, so
    the fact side never shuffles before the single-row agg."""
    li = nio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01")))
    p = nio.load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(
            100 * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
                        .otherwise(F.lit(0.0))) / F.sum(rev), 6,
        ).alias("promo_revenue"))
    )


def _q_tpch_q10(spark, sf_dir):
    """Returned-item top customers: lineitem(R-flag) ⨝ orders(qtr) ⨝
    customer ⨝ broadcast(nation), groupBy customer, top-20 by revenue —
    TakeOrderedAndProject caps the sort at k instead of a full global sort."""
    li = nio.load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = nio.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01")))
    c = nio.load_table(spark, sf_dir, "customer")
    n = nio.load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def _q_tpch_q7(spark, sf_dir):
    """Two-nation trade volume: lineitem ⨝ supplier ⨝ orders ⨝ customer with
    TWO broadcast copies of nation (supp/cust sides) and a symmetric
    nation-pair predicate — the fact chain shuffles only on its join keys,
    the nation filter rides each broadcast."""
    n1 = nio.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nio.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    li = nio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01")))
    s = nio.load_table(spark, sf_dir, "supplier")
    o = nio.load_table(spark, sf_dir, "orders")
    c = nio.load_table(spark, sf_dir, "customer")
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def _q_tpch_q8(spark, sf_dir):
    """Market-share: 6-table join, then a share-of-total conditional ratio
    per year in ONE aggregate pass (sum(when)/sum) — no second scan or
    self-join for the denominator."""
    r = nio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nio.load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("c_nk"))
    n2 = nio.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    p = nio.load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD").select("p_partkey")
    li = nio.load_table(spark, sf_dir, "lineitem")
    o = nio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31"))
    c = nio.load_table(spark, sf_dir, "customer")
    s = nio.load_table(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
            / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def _q_tpch_q13(spark, sf_dir):
    """Customer order-count distribution: LEFT OUTER customer⨝orders →
    per-customer count → count-of-counts.  Two hash aggs, the second over
    at most |distinct counts| rows — the classic distribution-of-cardinality
    shape."""
    c = nio.load_table(spark, sf_dir, "customer").select("c_custkey")
    o = nio.load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def _q_tpch_q18(spark, sf_dir):
    """Large-volume orders: lineitem pre-aggregated per order, HAVING
    sum(qty) > threshold BEFORE joining orders/customer — the heavy join
    input is reduced to qualifying orders first (the same early-reduction
    the reference's engine does with its rollup routing)."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
        .filter(F.col("sum_qty") > 212)
    )
    o = nio.load_table(spark, sf_dir, "orders")
    c = nio.load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def _q_tpch_q15(spark, sf_dir):
    """Top supplier(s) by quarter revenue: revenue aggregate reused twice
    (per-supplier + global max) — localCheckpoint materializes it ONCE, the
    max side reduces to a single broadcast row joined back as a filter."""
    li = nio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01")))
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    s = nio.load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mr)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def _q_tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H q17 shape): the correlated
    per-part avg-quantity subquery is a window aggregate over the
    part-filtered fact — ONE shuffle on l_partkey, one fact scan, and no
    broadcast of a fact-derived aggregate (per-partkey cardinality scales
    with SF; forcing it through the driver blows the broadcast budget at
    100x — AQE decides the dim join instead)."""
    from pyspark.sql import Window

    li = nio.load_table(spark, sf_dir, "lineitem")
    p = nio.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5)).select("p_partkey")
    lp = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        lp.withColumn("qlim", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qlim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def _q_salted_join(spark, sf_dir):
    """Skew-salted equi-join (joins.salted_join): events sharded across 4
    sub-keys per user, per-user totals replicated 4x — row-identical to the
    plain join (the oracle IS the plain join), but the shuffle spreads a hot
    user over 4 reducers instead of serializing on one."""
    ev = nio.load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    left = ev.select("event_id", "user_id")
    # driver hashes rows in emission order — pin it
    return joins.salted_join(left, totals, on="user_id", salt=4).orderBy("event_id")


def _q_tpch_q2(spark, sf_dir):
    """Min-cost supplier per part (TPC-H q2 shape, correlated MIN subquery —
    no partsupp table in TESTDATA so lineitem stands in as the cost source).
    The correlated MIN is a window aggregate over the part-filtered fact:
    ONE shuffle on l_partkey, one fact scan, no broadcast of the
    per-partkey aggregate (its cardinality scales with SF — AQE picks the
    dim-join strategy; nation stays an explicit broadcast because it's a
    fixed 25-row enumeration at every SF)."""
    from pyspark.sql import Window

    li = nio.load_table(spark, sf_dir, "lineitem")
    p = nio.load_table(spark, sf_dir, "part").filter(
        F.col("p_size") <= 5).select("p_partkey")
    lp = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    best = (
        lp.withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .select("p_partkey", "l_suppkey", "min_price").distinct()
    )
    s = nio.load_table(spark, sf_dir, "supplier")
    n = nio.load_table(spark, sf_dir, "nation")
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_acctbal", "s_name", F.col("n_name").alias("nation"),
                "p_partkey", "min_price")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


def _q_tpch_q11(spark, sf_dir):
    """Important-stock parts (TPC-H q11 shape): per-part value with a HAVING
    against a scalar fraction of the GLOBAL total.  The global total is
    re-aggregated from the per-part aggregate (localCheckpoint'd so the
    subtree runs once) — one scan of the fact, and the threshold arrives as
    a broadcast single row, not a second shuffle."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    pv = (li.groupBy("l_partkey")
          .agg(F.sum("l_extendedprice").alias("val"))
          .localCheckpoint(eager=False))
    tot = pv.agg((F.sum("val") * 0.0007).alias("thresh"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > F.col("thresh"))
        .select("l_partkey", F.round("val", 4).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def _q_tpch_q16(spark, sf_dir):
    """Supplier-count per part attributes with a NOT-IN exclusion list
    (TPC-H q16 shape): the exclusion (negative-balance suppliers) is a
    broadcast LEFT ANTI against the fact, the part dim a broadcast inner —
    only the final countDistinct shuffles, on the small (brand,type,size)
    grouping."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    p = nio.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    bad = nio.load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def _q_tpch_q20(spark, sf_dir):
    """Nested semi-join chain (TPC-H q20 shape): part-name semi-join reduces
    the fact, per-supplier HAVING reduces again, and the survivors semi-join
    the supplier dim.  Each IN(...) stays a semi-join — no row multiplication
    at any stage."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    red = nio.load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    qual = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey").agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 2000).select("l_suppkey")
    )
    s = nio.load_table(spark, sf_dir, "supplier")
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def _q_tpch_q21(spark, sf_dir):
    """Correlated EXISTS + NOT-EXISTS self-joins (TPC-H q21 shape): per
    completed-order lineitem, EXISTS another supplier's line (semi self-join)
    and NOT EXISTS another supplier's line with larger quantity (anti
    self-join with a non-equi term riding the o_orderkey equi key).  Both
    self-joins shuffle on l_orderkey ONCE each — the non-equi predicate is
    evaluated inside the sort-merge join, not as a post-filter on a cross
    product."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    o = nio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"),
                   F.col("l_quantity").alias("q3"))
    cand = l1.join(
        l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "left_semi")
    sole_max = cand.join(
        l3, (cand.l_orderkey == F.col("k3")) & (cand.l_suppkey != F.col("s3"))
        & (F.col("q3") > cand.l_quantity), "left_anti")
    s = nio.load_table(spark, sf_dir, "supplier")
    return (
        sole_max.join(F.broadcast(s), sole_max.l_suppkey == s.s_suppkey)
        .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def _q_tpch_q22(spark, sf_dir):
    """Anti-join + scalar-subquery threshold (TPC-H q22 shape): customers
    above the positive-balance average with no completed orders.  The scalar
    average is a broadcast single row; the NOT EXISTS is a LEFT ANTI on the
    projected orders key."""
    c = nio.load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    fo = nio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(fo, c.c_custkey == fo.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
        .orderBy("cntrycode")
    )


def _q_boilerplate(spark, sf_dir):
    """Corpus-wide boilerplate profile (datapipe.text.boilerplate_stats):
    paragraph (here: token) duplication counted on 16-byte digests, the
    digest->boilerplate flag broadcast back so the per-doc pass never
    shuffles document text."""
    docs = nio.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # driver hashes rows in emission order — pin it
    return text.boilerplate_stats(docs, sep=" ", min_dup=390).orderBy("doc_id")


def _q_boilerplate_clean(spark, sf_dir):
    """Boilerplate removal (datapipe.text.remove_boilerplate): drop
    corpus-duplicated segments, reassemble each doc in original order
    (posexplode position survives the shuffle)."""
    docs = nio.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.remove_boilerplate(docs, sep=" ", min_dup=390)


def _q_tpch_q9(spark, sf_dir):
    """Product-line profit by nation and year (TPC-H q9 shape): the
    part-name filter broadcasts and prunes the fact FIRST (~12% survive),
    then the one unavoidable big-big join (lineitem ⨝ orders on orderkey)
    runs on the reduced fact; supplier/nation ride along as broadcasts."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    p = nio.load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")).select("p_partkey")
    s = nio.load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = nio.load_table(spark, sf_dir, "nation")
    o = nio.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("profit"))
        .orderBy("nation", "o_year")
    )


def _q_tpch_q12(spark, sf_dir):
    """Priority-split line counts (TPC-H q12 shape, l_returnflag standing in
    for the absent l_shipmode): conditional counts via when(), one shuffle
    on the 3-value grouping key after the orderkey join."""
    li = nio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01")))
    o = nio.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("ship_group")
    )


def _q_tpch_q19(spark, sf_dir):
    """Disjunctive multi-predicate revenue (TPC-H q19 shape): three
    brand/size/quantity conjunctions OR'd together.  The part dim broadcasts;
    the whole disjunction evaluates inside one WholeStageCodegen span over
    the joined rows — no UDF, no multi-pass union."""
    li = nio.load_table(spark, sf_dir, "lineitem")
    p = nio.load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


def _q_curation_funnel(spark, sf_dir):
    """End-to-end curation funnel — the training-data pipeline composed from
    library operators: C4 quality filter → Gopher repetition filter → exact
    dedup (canonical min doc_id per fingerprint) → deterministic 50% hash
    sample, reporting per-stage attrition.  Every stage is a scan-side
    filter or a digest-keyed agg; document text is never shuffled except by
    the (doc, gram) repetition count."""
    docs = nio.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = (text.quality_score(docs).filter(F.col("quality") >= 0.71)
         .select("doc_id", "text"))
    # repetition runs on the QUALITY SURVIVORS only — the (doc, gram)
    # shuffle is the funnel's dominant cost and the quality filter is a
    # scan-side predicate, so filtering first shrinks the shuffle by the
    # stage-2 attrition (same per-doc stats, same counts)
    rep = text.repetition_stats(q, n=2).select("doc_id", "dup_gram_frac")
    # the funnel is counted at every stage — materialize the expensive
    # repetition join ONCE (lazy localCheckpoint) instead of re-running the
    # gram shuffle for the dedup and sample counts
    s2 = (q.join(rep, "doc_id").filter(F.col("dup_gram_frac") <= 0.09)
          .select("doc_id", "text").localCheckpoint(eager=False))
    s3 = text.fingerprint(s2).groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    s4 = sampling.hash_sample(s3, 0.5)

    def cnt(df, stage):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs")

    return (cnt(docs, "1_raw").unionAll(cnt(q, "2_quality"))
            .unionAll(cnt(s2, "3_repetition")).unionAll(cnt(s3, "4_dedup"))
            .unionAll(cnt(s4, "5_sample")))


def _q_embedding_quantize(spark, sf_dir):
    """Int8 quantization go/no-go gate (similarity.quantization_error):
    per-label max/mean reconstruction error — all array math in built-in
    transform/aggregate/zip_with (JVM codegen), no Python."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    return similarity.quantization_error(emb, by="label").orderBy("label")


def _q_source_profile(spark, sf_dir):
    """Per-source curation profile: doc counts, size, token and language
    spread — the groupBy key is the source column, so partial aggregation
    collapses each scan task to O(sources) rows before the shuffle."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("n_chars"), 6).alias("avg_chars"),
             F.round(F.avg(F.size(F.expr(
                 "filter(split(text, ' '), t -> t != '')"))), 6)
             .alias("avg_tokens"),
             F.countDistinct("lang").alias("n_langs"))
        .orderBy("source")
    )


def _q_repetition(spark, sf_dir):
    """Gopher repetition filters (datapipe.text.repetition_stats): bigram
    duplication profile per document — grams built JVM-side via zip_with on
    the shifted token array, one (doc, gram) shuffle."""
    docs = nio.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # driver hashes rows in emission order — pin it
    return text.repetition_stats(docs, n=2).orderBy("doc_id")


def _q_substring_spans(spark, sf_dir):
    """Exact substring duplication (Lee et al. train-dedup criterion as a
    k-gram digest join, datapipe/dedup.py duplicate_spans): per-document
    maximal duplicated-span profile.  One shuffle on the 16-byte gram
    digest; text never shuffles."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return dedup.substring_dedup_stats(docs, k=8).orderBy("doc_id")


def _synth_url():
    """Deterministic URL column for the web-curation entries (documents
    carry no URL; the derivation is the same expression in the oracle)."""
    return F.concat(
        F.lit("HTTPS://WWW."), F.col("source"),
        F.lit(".Example.COM:443/Docs/"), F.col("doc_id").cast("string"),
        F.lit("?utm_source=ads&id="), F.col("doc_id").cast("string"),
        F.lit("&fbclid=zz#frag"))


def _q_url_normalize(spark, sf_dir):
    """URL canonicalization (datapipe/web.py normalize_url/url_host/
    url_domain): lowercased scheme+host, default-port and fragment strip,
    tracking-param removal — RE2-safe regex chain, checked verbatim by the
    oracle."""
    from neo_server_spark.datapipe import web
    docs = nio.load_table(spark, sf_dir, "documents")
    u = _synth_url()
    return docs.select(
        "doc_id",
        web.normalize_url(u).alias("url_norm"),
        web.url_host(u).alias("host"),
        web.url_domain(u).alias("domain"),
    ).orderBy("doc_id")


def _q_domain_caps(spark, sf_dir):
    """Per-domain document caps (datapipe/web.py domain_caps): keep at
    most 3 docs per domain by deterministic md5(id) order — one window
    rank on the domain key, no text shuffle."""
    from neo_server_spark.datapipe import web
    docs = nio.load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   (F.col("doc_id") % 5).cast("string"),
                   F.lit(".com/p/"), F.col("doc_id").cast("string"))
    capped = web.domain_caps(docs.withColumn("url", url),
                             url_col="url", cap=3)
    return capped.select("doc_id", F.col("__dom").alias("domain")) \
        .orderBy("domain", "doc_id")


def _q_lm_buckets(spark, sf_dir):
    """CCNet-style perplexity tiers (datapipe/text.py lm_buckets): rank by
    unigram LM score, equal-frequency head/middle/tail split, per-bucket
    profile.  Only (id, score) enters the global window."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.lm_bucket_profile(docs, n_buckets=3)


def _q_pack_sequences(spark, sf_dir):
    """Concatenate-and-chunk sequence packing plan (datapipe/text.py
    pack_sequences): documents laid out in id order into 512-token
    training sequences; one cumulative-sum window over (id, n_tokens)."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.pack_sequences(docs, window=512).orderBy(
        "doc_id", "chunk_id")


def _q_codec_ndjson(spark, sf_dir):
    """The NDJSON codec under the value-hash gate: 200 events rendered
    through codecs.encoders.to_ndjson (key order = column order, Default
    trimmed-millis time layout, AppendPrecisionFloat64 float tokens) and
    returned line-per-row; the oracle rebuilds every byte."""
    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id", F.col("ts").cast("long").alias("time"),
                  "value")
          .orderBy("event_id").limit(200))
    txt = encoders.to_ndjson(ev, timeformat="Default", time_cols=("time",))
    rows = [(i, ln) for i, ln in enumerate(txt.splitlines()) if ln]
    return spark.createDataFrame(rows, "i long, line string")


def _q_codec_markdown(spark, sf_dir):
    """The MARKDOWN codec under the value-hash gate: header + :----- rule
    + %f float cells (md_encode.go:226-310), line-per-row."""
    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id",
                  F.expr("CAST(ts AS LONG) div 1000000000").alias("tsec"),
                  "value")
          .orderBy("event_id").limit(200))
    txt = encoders.to_markdown(ev)
    rows = [(i, ln) for i, ln in enumerate(txt.splitlines())]
    return spark.createDataFrame(rows, "i long, line string")


def _q_codec_html(spark, sf_dir):
    """The HTML codec under the value-hash gate: one <table> string
    (html.go:36-55 shape) for 100 events with integer cents values —
    byte-rebuilt by the oracle with string_agg."""
    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id",
                  F.expr("CAST(value * 100 AS LONG)").alias("cents"))
          .orderBy("event_id").limit(100))
    txt = encoders.to_html(ev)
    return spark.createDataFrame([(0, txt.rstrip("\n"))],
                                 "i long, html string")


def _q_codec_box(spark, sf_dir):
    """The BOX codec under the value-hash gate: box-drawing frame with
    content-derived column widths (box_encode.go), line-per-row; the
    oracle recomputes widths and pads with lpad/rpad."""
    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id",
                  F.expr("CAST(value * 100 AS LONG)").alias("cents"))
          .orderBy("event_id").limit(50))
    txt = encoders.to_box(ev)
    rows = [(i, ln) for i, ln in enumerate(txt.splitlines())]
    return spark.createDataFrame(rows, "i long, line string")


def _q_codec_json(spark, sf_dir):
    """The JSON envelope codec under the value-hash gate: full
    {"data":{columns,types,rows},"success","reason","elapse"} text for 50
    events with the elapse duration masked (the one nondeterministic
    field); every other byte — key order, api type names, float tokens —
    is rebuilt by the oracle."""
    import re as _re

    from neo_server_spark.codecs import encoders

    ev = (nio.load_table(spark, sf_dir, "events")
          .select("event_id", "value")
          .orderBy("event_id").limit(50))
    txt = encoders.to_json_envelope(ev)
    txt = _re.sub(r'"elapse":"[^"]*"', '"elapse":"X"', txt)
    return spark.createDataFrame([(0, txt)], "i long, envelope string")


def _q_codec_chart(spark, sf_dir):
    """The CHART sink's JS data asset under the value-hash gate: run a
    .tql CHART() over events (fixed chartID so every byte is
    deterministic) and return the asset line-per-row; the oracle rebuilds
    the _column_N arrays (time as epoch-ms, integral floats without a
    fraction — chart.go Close / Go json.Marshal parity) and the IIFE
    scaffolding verbatim."""
    from neo_server_spark.tql.script import TqlRunner

    r = TqlRunner(spark, sf_dir=sf_dir)
    r.run("""
        SQL('select CAST(ts AS LONG) div 1000000000 * 1000000000 AS t,
                    CAST(value * 100 AS LONG) AS cents
             from events order by event_id limit 50')
        MAPVALUE(0, parseTime(value(0), "ns", "UTC"))
        CHART(chartID('CID1'))
    """)
    rows = [(i, ln) for i, ln in enumerate(r.chart_js.splitlines())]
    return spark.createDataFrame(rows, "i long, line string")


def _q_codec_geomap(spark, sf_dir):
    """The GEOMAP sink's JS asset under the value-hash gate: numeric
    (lat, lon) records lower to L.marker layers with a fitBounds over the
    data (geomap/geomap.go shape); fixed geomapID makes every byte
    deterministic and the oracle rebuilds the marker and initBounds lines
    from the same rows."""
    from neo_server_spark.tql.script import TqlRunner

    r = TqlRunner(spark, sf_dir=sf_dir)
    r.run("""
        SQL('select (300 + event_id % 100) / 10.0 AS lat,
                    (1200 + event_id % 300) / 10.0 AS lon
             from events order by event_id limit 40')
        GEOMAP(geomapID('GID1'))
    """)
    rows = [(i, ln) for i, ln in enumerate(r.geomap_js.splitlines())]
    return spark.createDataFrame(rows, "i long, line string")


def _q_string_source(spark, sf_dir):
    """STRING(payload(), separator(), trimspace()) source (fm_bytes.go:
    26-130) under the value-hash gate: the request payload splits into
    line records; the oracle recomputes the same split in SQL.  PUSHKEY
    surfaces the 1-based ordinal like task_test.go TestString."""
    from neo_server_spark.tql.script import TqlRunner

    payload = "  alpha \nbeta\n gamma\ndelta  "
    r = TqlRunner(spark, sf_dir=sf_dir, payload=payload)
    return r.run("""
        STRING(payload(), separator("\\n"), trimspace(true))
        PUSHKEY('ROWNUM')
    """).toDF("rownum", "string")


def _q_bytes_source(spark, sf_dir):
    """BYTES(payload(), separator()) source: raw byte-slice records; the
    oracle hex-compares via md5 of the same fragments."""
    from neo_server_spark.tql.script import TqlRunner

    payload = "ab,cd,ef,gh"
    r = TqlRunner(spark, sf_dir=sf_dir, payload=payload)
    df = r.run("""
        BYTES(payload(), separator(","))
        PUSHKEY('ROWNUM')
    """).toDF("rownum", "bytes")
    return df.select("rownum", F.md5(F.col("bytes")).alias("digest"))


def _q_substring_cut(spark, sf_dir):
    """The CUT step of exact substring dedup (dedup.remove_duplicate_
    spans): duplicated spans drop out of the text, everything else passes
    untouched; the oracle rebuilds the cleaned text per document."""
    docs = nio.load_table(spark, sf_dir, "documents")
    out = dedup.remove_duplicate_spans(docs, k=8)
    return out.select("doc_id", F.md5("clean_text").alias("clean_fp"),
                      F.length("clean_text").alias("clean_len")) \
        .orderBy("doc_id")


def _q_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training (datapipe/text.py bpe_train,
    Sennrich et al. 2016): one corpus pass builds the word-frequency
    frame, then each merge round is a JVM pair-count + literal string
    replace — semantics chosen to be identical in Spark and DuckDB, so
    the oracle re-trains the same 4 merges in unrolled SQL."""
    docs = nio.load_table(spark, sf_dir, "documents")
    merges = text.bpe_train(docs, n_merges=4)
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, merged string, "
                "cnt long")


def _bpe_oracle(n: int = 5) -> str:
    """Unrolled n-round BPE training in DuckDB SQL (same tie-break:
    count desc, pair asc; same padded-string literal replace)."""
    cte = ["w0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ')"
           " || ' ' AS s, freq FROM (SELECT w, count(*) AS freq FROM "
           "(SELECT unnest(string_split(lower(text), ' ')) AS w "
           "FROM documents) WHERE w <> '' GROUP BY w))"]
    sel = []
    for r in range(1, n + 1):
        cte.append(
            f"l{r} AS (SELECT s, freq, string_split(trim(s), ' ') AS l "
            f"FROM w{r-1}), "
            f"x{r} AS (SELECT freq, l, unnest(range(1, "
            f"greatest(len(l) - 1, 0) + 1)) AS i FROM l{r}), "
            f"p{r} AS (SELECT l[i] || ' ' || l[i+1] AS pair, "
            f"sum(freq) AS c FROM x{r} GROUP BY 1), "
            f"b{r} AS (SELECT pair, CAST(c AS BIGINT) AS c FROM p{r} "
            f"ORDER BY c DESC, pair LIMIT 1), "
            f"w{r} AS (SELECT replace(s, ' ' || b.pair || ' ', ' ' || "
            f"replace(b.pair, ' ', '') || ' ') AS s, freq "
            f"FROM w{r-1}, b{r} b)")
        sel.append(
            f"SELECT CAST({r-1} AS BIGINT) AS rank, "
            f"split_part(pair, ' ', 1) AS lhs, "
            f"split_part(pair, ' ', 2) AS rhs, "
            f"replace(pair, ' ', '') AS merged, c AS cnt FROM b{r}")
    return ("WITH " + ",\n".join(cte) + "\n"
            + "\nUNION ALL ".join(sel) + "\nORDER BY rank")


def _q_bpe_encode(spark, sf_dir):
    """BPE application (text.bpe_encode): a fixed merge list tokenizes
    every document via the chained literal-replace form; the oracle
    applies the identical chain and compares per-doc token counts."""
    docs = nio.load_table(spark, sf_dir, "documents")
    merges = [(0, "s", "c", "sc", 0), (1, "t", "a", "ta", 0),
              (2, "ta", "b", "tab", 0), (3, "v", "a", "va", 0)]
    return (text.bpe_encode(docs, merges)
            .select("doc_id",
                    F.col("n_bpe_tokens").cast("long")
                    .alias("n_bpe_tokens"))
            .orderBy("doc_id"))


def _q_lake_api_raw(spark, sf_dir):
    """The lake REST API's GetRawData SQL shape (sqlx/lake.py raw_sql ->
    lake dialect): scan hint, TO_CHAR time column, IN + BETWEEN range,
    LIMIT — the exact text /lakes/values/raw generates."""
    from neo_server_spark.sqlx import lake
    from neo_server_spark.sqlx.dialect import lake_sql
    tag = nio.events_as_tag(spark, sf_dir)
    lake.register_lake_views(spark, tag)
    t0 = 1704067200 * 10**9
    sql = lake.raw_sql(["click", "view"], t0, t0 + 2 * 3600 * 10**9,
                       limit="200")
    df = lake_sql(spark, sql)
    return df.orderBy("NAME", "TIME", "VALUE")


def _q_lake_api_calc(spark, sf_dir):
    """The lake REST API's GetCalculateData SQL shape (calc_sql):
    DATE_TRUNC bucketing + aggregate, exactly what
    /lakes/values/calculated generates."""
    from neo_server_spark.sqlx import lake
    from neo_server_spark.sqlx.dialect import lake_sql
    tag = nio.events_as_tag(spark, sf_dir)
    lake.register_lake_views(spark, tag)
    t0 = 1704067200 * 10**9
    sql = lake.calc_sql(["click", "view"], t0, t0 + 24 * 3600 * 10**9,
                        calc_mode="AVG", interval_type="HOUR",
                        interval_value=1, limit="5000")
    df = lake_sql(spark, sql)
    return df.select("NAME", "TIME",
                     F.round("VALUE", 6).alias("VALUE")) \
        .orderBy("NAME", "TIME")


def _q_lake_fanout(spark, sf_dir):
    """64-tag lake fan-out parity (r14 verdict stretch #8): the
    reference fans a multi-tag lake read across one goroutine per tag
    (mods/server/http_lake.go:1596-1645 — per-tag queries joined at
    the response writer); Spark expresses the SAME semantics as ONE
    declarative plan — a single ranged scan, one hash aggregate keyed
    (NAME, bucket) — and gets the parallelism from partitioning
    instead of per-tag jobs.  The plan is pinned right here: exactly
    one parquet scan of events, no 64-branch union (plus
    tests/test_plans.py::test_lake_fanout_single_scan)."""
    from neo_server_spark.sqlx import lake
    from neo_server_spark.sqlx.dialect import lake_sql
    ev = nio.events_as_tag(spark, sf_dir)
    tag = ev.select(
        F.concat(F.lit("t"),
                 F.lpad(F.pmod("event_id", F.lit(64)).cast("string"),
                        2, "0")).alias("name"),
        "time", "value")
    lake.register_lake_views(spark, tag)
    t0 = 1704067200 * 10**9
    sql = lake.calc_sql([f"t{i:02d}" for i in range(64)],
                        t0, t0 + 24 * 3600 * 10**9,
                        calc_mode="AVG", interval_type="HOUR",
                        interval_value=1, limit="100000")
    df = lake_sql(spark, sql)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # "(N) Scan parquet" = one detail block per physical scan (the
    # bare string appears twice per scan: tree line + detail header)
    n_scans = plan.count(") Scan parquet")
    assert n_scans == 1, \
        f"64-tag fan-out must be ONE scan, plan has {n_scans}"
    assert "Union" not in plan, "per-tag plan branches detected"
    return df.select("NAME", "TIME",
                     F.round("VALUE", 6).alias("VALUE")) \
        .orderBy("NAME", "TIME")


def _q_similarity_lsh(spark, sf_dir):
    """LSH-bucketed ANN (similarity.lsh_topk): the query's multi-band
    hyperplane buckets select candidates; exact cosine ranks them.  md5
    hash mode makes every bucket SQL-certifiable (the same technique that
    certifies embedding_dupes); xxhash64 stays the production family."""
    from neo_server_spark.datapipe import similarity as sim
    emb = nio.load_table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, query_vec_id=0, k=10, block_bits=3,
                        bands=12, hash_fn="md5")


def _q_pipeline_v2(spark, sf_dir):
    """The FULL modern curation pipeline composed from library operators —
    decontamination → C4 quality → Gopher repetition → exact-substring
    dedup (Lee et al.) → fingerprint dedup → CCNet perplexity tiering →
    sequence-packing budget — with per-stage attrition counts.

    Stage order follows cost: scan-side filters first, each digest-keyed
    shuffle runs only on the previous stage's survivors, and EVERY reused
    frame (base and s2-s7) localCheckpoints once — documents is scanned
    exactly twice (base + benchmark split), never once per consumer.
    Text never shuffles; every cross-doc meet rides a 8/16-byte digest."""
    from neo_server_spark.datapipe import dedup as dd
    docs = nio.load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "source")
    bench = docs.filter(F.col("source").isin("src0", "src1"))
    base = docs.filter(~F.col("source").isin("src0", "src1")) \
        .select("doc_id", "text").localCheckpoint(eager=False)
    # 2: decontamination (keep overlap < 0.2 vs the benchmark shingles)
    cont = text.contamination(base, bench, shingle_n=5, threshold=0.2) \
        .select("doc_id", "contaminated")
    s2 = (base.join(cont, "doc_id")
          .filter(~F.col("contaminated")).select("doc_id", "text")
          .localCheckpoint(eager=False))
    # 3: C4-style quality floor
    s3 = (text.quality_score(s2).filter(F.col("quality") >= 0.71)
          .select("doc_id", "text").localCheckpoint(eager=False))
    # 4: Gopher repetition ceiling (gram shuffle on stage-3 survivors)
    rep = text.repetition_stats(s3, n=2).select("doc_id", "dup_gram_frac")
    s4 = (s3.join(rep, "doc_id").filter(F.col("dup_gram_frac") <= 0.09)
          .select("doc_id", "text").localCheckpoint(eager=False))
    # 5: exact-substring duplication ceiling over the surviving corpus
    sub = dd.substring_dedup_stats(s4, k=8).select("doc_id", "dup_frac")
    s5 = (s4.join(sub, "doc_id", "left")
          .filter((F.col("dup_frac").isNull()) | (F.col("dup_frac") <= 0.6))
          .select("doc_id", "text").localCheckpoint(eager=False))
    # 6: exact dedup, canonical min doc_id per fingerprint — realized as
    # a LOSERS anti-join (r15): only (doc_id, fp) digests shuffle for
    # the per-fp rank, and the re-attach joins the loser id set (the dup
    # tail — small by construction) against the checkpointed corpus,
    # where the former keeper-set inner join would shuffle the TEXT once
    # the keep set outgrows broadcast.  Kept rows are identical: keeper
    # = min doc_id per fp <=> losers = rank > 1.
    from pyspark.sql import Window as _W
    w6 = _W.partitionBy("fp").orderBy("doc_id")
    losers = (text.fingerprint(s5).select("doc_id", "fp")
              .withColumn("__rk", F.row_number().over(w6))
              .filter(F.col("__rk") > 1).select("doc_id"))
    s6 = (s5.join(losers, "doc_id", "left_anti")
          .select("doc_id", "text")
          .localCheckpoint(eager=False))
    # 7: CCNet tiers over the deduped corpus — keep head+middle
    tiers = text.lm_buckets(s6).filter(F.col("bucket") != "tail") \
        .select("doc_id")
    s7 = s6.join(tiers, "doc_id").localCheckpoint(eager=False)
    # 8: packing budget — 512-token training sequences the corpus fills
    chunks = text.pack_sequences(s7, window=512) \
        .agg(F.countDistinct("chunk_id").alias("n"))

    def cnt(df, stage):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(stage).alias("stage"), "n")

    return (cnt(base, "1_raw")
            .unionAll(cnt(s2, "2_decontam"))
            .unionAll(cnt(s3, "3_quality"))
            .unionAll(cnt(s4, "4_repetition"))
            .unionAll(cnt(s5, "5_substring"))
            .unionAll(cnt(s6, "6_dedup"))
            .unionAll(cnt(s7, "7_lm_tiers"))
            .unionAll(chunks.select(F.lit("8_chunks").alias("stage"), "n")))


#: shared by the mixture_plan / data_mixture entries (and their oracles):
#: src0 oversamples into the max_epochs clamp (rate ~4.6 -> 4.0, frac 0 —
#: the "no fractional epoch" branch), src1 repeats ~1.3 epochs (whole epoch
#: + fractional remainder), src2/src3 downsample (~0.24), srcX is absent
#: from the corpus (rate 0).
MIX_WEIGHTS = {"src0": 20.0, "src1": 6.0, "src2": 1.0, "src3": 1.0, "srcX": 2.0}
MIX_BUDGET = 10000.0


def _q_watch_latest(spark, sf_dir):
    """TagLatestWatcher connect-time poll (streaming/watch.py — the
    tag-mode poller behind GET /db/watch/:table, spi/watch.go:179-247
    executeTag): the first poll emits THE latest row per watched tag,
    deterministic under duplicate basetimes via the event_id tie-break.
    One distributed query per poll; the oracle replays the per-tag
    argmax row selection."""
    from neo_server_spark.streaming.watch import TagLatestWatcher

    def load():
        return nio.events_as_tag(spark, sf_dir).select(
            "name", "time", "value", "event_id")

    w = TagLatestWatcher(load, tags=["click", "view", "error"],
                         tiebreak_cols=["event_id"])
    rows = w.poll()
    assert w.poll() == []   # static data: the high-water mark holds
    sdf = spark.createDataFrame(
        [(r["name"], r["time"], r["value"], r["event_id"]) for r in rows],
        "name string, time long, value double, event_id long")
    return sdf.select("name", _us("time"), "value", "event_id") \
        .orderBy("name")


def _q_backup_mount(spark, sf_dir):
    """BACKUP TABLE -> MOUNT DATABASE -> query-through round-trip
    (sqlx/backup.py; reference backupd.go / machsvr mount): 40
    deterministic click events land in a DDL tag table, archive to disk,
    mount read-only, and the mounted view is queried via the lake
    dialect's mount rewrite.  The oracle replays the same row selection
    straight from events — equality certifies the archive manifest,
    the parquet round-trip, and the mount-qualified name resolution."""
    import tempfile

    from neo_server_spark.sqlx import backup as bk
    from neo_server_spark.sqlx import ddl
    from neo_server_spark.sqlx.dialect import lake_sql

    tbl, mname = "bkm_events", "bkmarch"
    if mname in bk.mounts():
        ddl.exec_sql(spark, f"UNMOUNT DATABASE '{mname}'")
    if ddl.has_table(tbl):
        ddl.drop_table(spark, tbl)
    ddl.exec_sql(spark, f"CREATE TAG TABLE {tbl}("
                        "name varchar(40) primary key, "
                        "time datetime basetime, "
                        "value double summarized)")
    src = (nio.load_table(spark, sf_dir, "events")
           .filter(F.col("event_type") == "click")
           .orderBy("event_id").limit(40)
           .select("event_type", F.col("ts").cast("long"), "value")
           .collect())
    ddl.insert_rows(spark, tbl, ["name", "time", "value"],
                    [tuple(r) for r in src])
    path = tempfile.mkdtemp(prefix="bkm_arch_")
    ddl.exec_sql(spark, f"BACKUP TABLE {tbl} INTO DISK = '{path}'")
    ddl.exec_sql(spark, f"MOUNT DATABASE '{path}' TO '{mname}'")
    rows = lake_sql(spark, f"select name, time, value "
                           f"from {mname}.{tbl}").collect()
    ddl.exec_sql(spark, f"UNMOUNT DATABASE '{mname}'")
    ddl.drop_table(spark, tbl)
    out = spark.createDataFrame([tuple(r) for r in rows],
                                "name string, time long, value double")
    return out.select("name", _us("time"), "value") \
        .orderBy("name", "time", "value")


def _q_timer_fire(spark, sf_dir):
    """Timer facility end-to-end under the value-hash gate (streaming/
    scheduler.py + server/http_api.py timers router; reference
    mods/scheduler/sched_timer.go:16-60 — a cron TIMER entry runs a .tql
    task per firing): a timer is created over POST /web/api/timers with a
    .tql task that aggregates events and INSERTs into a DDL tag table;
    one synchronous tick fires (the reference's manual trigger), and the
    appended rows are the result.  The oracle replays the aggregation
    straight from events — equality certifies the facility router, the
    scheduler execution, the TQL pipeline, and the table append."""
    import json as _json
    import tempfile
    import urllib.request

    from neo_server_spark.server.http_api import EngineHttpServer
    from neo_server_spark.sqlx import ddl

    tbl = "tmr_metrics"
    if ddl.has_table(tbl):
        ddl.drop_table(spark, tbl)
    ddl.exec_sql(spark, f"CREATE TAG TABLE {tbl}("
                        "name varchar(40) primary key, "
                        "time datetime basetime, "
                        "value double summarized)")
    root = tempfile.mkdtemp(prefix="timer_fire_")
    with open(f"{root}/metrics.tql", "w") as f:
        f.write("SQL('select event_type, cast(count(*) as long)"
                " * 1000000000, round(sum(value), 6)"
                " from events group by event_type order by event_type')\n"
                f"INSERT(\"name\", \"time\", \"value\", table('{tbl}'))\n")
    srv = EngineHttpServer(spark, sf_dir=sf_dir, fs_root=root)
    port = srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/web/api/timers",
            data=_json.dumps({"name": "t_metrics",
                              "schedule": "@every 1h",
                              "path": "metrics.tql"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert _json.loads(r.read())["success"]
        srv._sched.trigger_now("t_metrics")      # one synchronous tick
        ent = next(e for e in srv._sched.entries()
                   if e["name"] == "t_metrics")
        assert ent["run_count"] == 1 and ent["last_error"] is None, ent
        rows = spark.table(tbl) \
            .select("name", "time", "value").collect()
    finally:
        srv.stop()
        ddl.drop_table(spark, tbl)
    out = spark.createDataFrame([tuple(r) for r in rows],
                                "name string, time long, value double")
    return out.select("name", _us("time"), "value").orderBy("name")


def _q_subscriber_flow(spark, sf_dir):
    """Subscriber facility end-to-end under the value-hash gate
    (server/http_api.py subscribers router over the directory-queue
    bridge; reference mods/scheduler/sched_subs.go:220-246 doMqttTask —
    broker message -> per-message task): message files dropped into
    ``fs_root/<bridge>/<topic>/`` are drained by one synchronous
    subscriber tick into a DDL tag table via a ``db/append`` write
    descriptor, with processed files tombstoned into done/.  The oracle
    is the literal payload rows — equality certifies subscriber CRUD,
    the queue drain, payload CSV decode, and the table append."""
    import json as _json
    import os
    import tempfile
    import urllib.request

    from neo_server_spark.server.http_api import EngineHttpServer
    from neo_server_spark.sqlx import ddl

    tbl = "sub_readings"
    if ddl.has_table(tbl):
        ddl.drop_table(spark, tbl)
    ddl.exec_sql(spark, f"CREATE TAG TABLE {tbl}("
                        "name varchar(40) primary key, "
                        "time datetime basetime, "
                        "value double summarized)")
    root = tempfile.mkdtemp(prefix="subscriber_flow_")
    qdir = os.path.join(root, "mq", "sensors")
    os.makedirs(qdir)
    with open(f"{qdir}/m1.csv", "w") as f:
        f.write("sens.a,1000000000,1.5\nsens.b,1000000000,2.5\n")
    with open(f"{qdir}/m2.csv", "w") as f:
        f.write("sens.a,2000000000,3.25\n")
    srv = EngineHttpServer(spark, sf_dir=sf_dir, fs_root=root)
    port = srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/web/api/subscribers",
            data=_json.dumps({"name": "s_flow", "bridge": "mq",
                              "topic": "sensors",
                              "task": f"db/append/{tbl}:csv"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert _json.loads(r.read())["success"]
        srv._sched.trigger_now("sub:s_flow")     # one synchronous drain
        # both messages consumed and tombstoned — a second tick is a no-op
        assert sorted(os.listdir(os.path.join(qdir, "done"))) == \
            ["m1.csv", "m2.csv"]
        srv._sched.trigger_now("sub:s_flow")
        rows = spark.table(tbl) \
            .select("name", "time", "value").collect()
    finally:
        srv.stop()
        ddl.drop_table(spark, tbl)
    out = spark.createDataFrame([tuple(r) for r in rows],
                                "name string, time long, value double")
    return out.select("name", _us("time"), "value") \
        .orderBy("name", "time")


def _q_txlog_table(spark, sf_dir):
    """Transactional table format under the value-hash gate
    (neo_server_spark/txlog.py — Delta-style commit log over parquet +
    atomic put-if-absent, the exactly-once sink behind
    stream_curate(table_format='txlog')): 30 deterministic click events
    land over two txn-tagged commits, epoch 0 is REPLAYED (the
    foreachBatch-retry case — must collapse to a no-op), and an orphaned
    data file simulates a crash between staging and commit (must stay
    invisible).  The oracle replays the row selection straight from
    events — equality certifies the commit protocol, replay dedupe,
    crash invisibility, and the log-driven read."""
    import os
    import tempfile

    from neo_server_spark import txlog

    t = os.path.join(tempfile.mkdtemp(prefix="txlog_entry_"), "tbl")
    base = (nio.load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "click")
            .orderBy("event_id").limit(30)
            .select("event_id", F.col("event_type").alias("name"),
                    F.col("ts").cast("long").alias("time"), "value"))
    txlog.write(base.filter(F.col("event_id") % 2 == 0), t, txn=("e", 0))
    txlog.write(base.filter(F.col("event_id") % 2 == 0), t, txn=("e", 0))
    txlog.write(base.filter(F.col("event_id") % 2 == 1), t, txn=("e", 1))
    # crash between staging and commit: uncommitted file stays invisible
    base.limit(5).write.mode("overwrite") \
        .parquet(os.path.join(t, "data", "orphan.parquet"))
    out = txlog.read_table(spark, t)
    return out.select("event_id", "name", _us("time"), "value") \
        .orderBy("event_id")


def _q_tag_stat_incremental(spark, sf_dir):
    """Engine-maintained per-tag stat table under the value-hash gate
    (streaming/watch.TagStatTable — the reference's V$<T>_STAT
    semantics, spi/show.go:1324 / fm_dbsrc.go:871-881, kept fresh off
    the txlog CDF instead of recomputed by scan): events land in a
    txlog table over TWO commits with a refresh after each (so the
    second fold demonstrably merges a DELTA into existing stats rather
    than rescanning), plus a dataChange=False compaction that must stay
    invisible.  The oracle recomputes row_count/min/max/last-value per
    tag from raw events — equality certifies the incremental fold, the
    merge algebra (count-sum, min-of-min, max-of-max, later-last-wins),
    and CDF silence of rewrites."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming.watch import TagStatTable

    t = os.path.join(tempfile.mkdtemp(prefix="tagstat_entry_"), "tbl")
    base = (nio.load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 3000)
            .select("event_id", F.col("event_type").alias("name"),
                    F.col("ts").cast("long").alias("time"), "value"))
    st = TagStatTable(spark, t)
    txlog.write(base.filter(F.col("event_id") < 1500)
                .select("name", "time", "value"), t, txn=("s", 0))
    st.refresh()
    txlog.write(base.filter(F.col("event_id") >= 1500)
                .select("name", "time", "value"), t, txn=("s", 1))
    st.refresh()
    txlog.compact(spark, t, target_files=1)
    st.refresh()                       # dataChange=False: must be a no-op
    return (st.stats()
            .select("name", F.col("row_count").cast("long")
                    .alias("row_count"),
                    F.expr("min_time div 1000").alias("min_time"),
                    F.expr("max_time div 1000").alias("max_time"),
                    F.round("min_value", 6).alias("min_value"),
                    F.round("max_value", 6).alias("max_value"),
                    F.round("last_value", 6).alias("last_value"))
            .orderBy("name"))


def _q_rollup_distinct(spark, sf_dir):
    """HLL approx-COUNT(DISTINCT) served from the rollup cascade under
    the value-hash gate (sqlx/rollup.py distinct_col — DataSketches
    hll_sketch_agg partials, hll_union folds; beyond-reference: the
    engine's rollup modes are count/sum/sumsq/min/max/avg/first/last,
    http_lake.go:1738-1762, and none can express distinct-users-per-tag
    at rollup cost).  Per-bucket cardinalities here are <= 10, far
    inside the sketch's exact coupon range, so the estimate equals
    DuckDB's exact COUNT(DISTINCT) — certifying the partials, the
    lossless union fold, and the estimate read path end-to-end."""
    import os
    import tempfile

    from neo_server_spark.sqlx.rollup import HOUR, RollupRouter

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select(F.col("event_type").alias("name"),
                  F.col("ts").cast("long").alias("time"), "value",
                  F.col("user_id").alias("uid")))
    base = os.path.join(tempfile.mkdtemp(prefix="rudist_entry_"), "r")
    r = RollupRouter(spark, base)
    r.build(ev, distinct_col="uid")
    out = r.query(HOUR, {"cnt": "count", "users": "approx_distinct"})
    return (out.select("name", F.col("time").cast("long").alias("time"),
                       F.col("cnt").cast("long").alias("cnt"),
                       F.col("users").cast("long").alias("users"))
            .orderBy("name", "time"))


def _q_zorder_prune(spark, sf_dir):
    """Z-ORDER compaction + multi-dimensional data skipping under the
    value-hash gate (operators/zorder.py + txlog.compact(zorder_by) —
    the OPTIMIZE ZORDER shape; reference parity: the engine's
    LSM/partitioned-tag layout serves 'prune by more than one key',
    spi/show.go ShowLsm): events land in a txlog table over four
    commits, the compaction rewrite clusters on the Morton interleave
    of (time, value), and the read prunes files off the LOGGED footer
    stats on BOTH ranges before applying the exact filter.  The oracle
    is the plain filter over raw events — equality certifies that
    z-clustering + two-sided pruning changes WHICH FILES are read,
    never the result."""
    import os
    import tempfile

    from neo_server_spark import txlog

    t = os.path.join(tempfile.mkdtemp(prefix="zorder_entry_"), "tbl")
    base = (nio.load_table(spark, sf_dir, "events")
            .select("event_id", F.col("event_type").alias("name"),
                    F.col("ts").cast("long").alias("time"), "value"))
    for k in range(4):
        txlog.write(base.filter(F.pmod("event_id", F.lit(4)) == k), t,
                    txn=("z", k))
    txlog.compact(spark, t, target_files=8,
                  stats_cols=["time", "value"],
                  zorder_by=["time", "value"])
    t_hi = 1_705_276_800 * 1_000_000_000        # 2024-01-15
    pruned = txlog.pruned_files(t, {"time": (None, t_hi - 1),
                                    "value": (None, 100.0)})
    assert len(pruned) < len(txlog.live_files(t)), \
        "z-order produced no file-level pruning"
    out = txlog.read_table(spark, t, prune={"time": (None, t_hi - 1),
                                            "value": (None, 100.0)})
    return (out.filter((F.col("time") < t_hi) & (F.col("value") <= 100.0))
            .select("event_id", "name", _us("time"), "value")
            .orderBy("event_id"))


def _q_bridge_sql(spark, sf_dir):
    """SQL(bridge('x'), '…') certified end-to-end against a LIVE bridge
    (reference fm_dbsrc.go:312-384 bridge branch + fm_dbsink.go INSERT):
    a bounded events slice is INSERT(bridge)-written into a file-backed
    sqlite database (the reference's own default bridge type) through
    the native stdlib engine, then the TQL front-end ships an aggregate
    query TO the external engine — WHERE/GROUP BY evaluate in sqlite,
    not Spark — and the result lands typed.  The oracle recomputes the
    same aggregate from the native events table, so equality certifies
    registration, the INSERT sink's batch write, the SQL(bridge) source
    branch, and type fidelity across the bridge (INTEGER/REAL are
    64-bit exact)."""
    import os
    import tempfile
    import uuid

    from neo_server_spark.sources.bridge import default_registry
    from neo_server_spark.tql.script import TqlRunner

    db = os.path.join(tempfile.mkdtemp(prefix="bridge_entry_"), "ext.db")
    base = (nio.load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 1000)
            .select(F.col("event_type").alias("name"),
                    F.col("ts").cast("long").alias("time"), "value"))
    bname = "ext_" + uuid.uuid4().hex[:8]
    br = default_registry.register(bname, "sqlite", db)
    try:
        br.insert(base, "events_ext")
        out = TqlRunner(spark).run(
            f"SQL(bridge('{bname}'), `SELECT name, count(*) AS cnt, "
            f"round(sum(value), 6) AS sum_value, "
            f"min(time) / 1000 AS first_time "
            f"FROM events_ext WHERE value > 100 "
            f"GROUP BY name ORDER BY name`)")
    finally:
        default_registry.unregister(bname)
    return out.select("name", F.col("cnt").cast("long").alias("cnt"),
                      "sum_value", F.col("first_time").cast("long")
                      .alias("first_time")).orderBy("name")


def _q_rollup_txlog(spark, sf_dir):
    """txlog-backed streaming rollup cascade under the value-hash gate
    (streaming/ingest.stream_rollup(table_format='txlog') — the r10
    VERDICT #6 item): events rows become ndjson payload files, the
    availableNow drain commits per-epoch PARTIAL summaries through the
    commit log with txn=(run_key, epoch), a simulated foreachBatch
    retry of the committed epoch collapses to a no-op (partials are NOT
    idempotent under duplication — the defect the txn prevents),
    compact_rollup folds the partials in ONE atomic overwrite commit,
    and RollupRouter(table_format='txlog') serves the query off the
    log.  The oracle recomputes the per-second per-tag aggregates from
    raw events — equality certifies decode, partial summarize, txn
    replay dedupe, atomic fold, and the log-driven read."""
    import json as _json
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import SECOND, RollupRouter
    from neo_server_spark.streaming import ingest

    root = tempfile.mkdtemp(prefix="rollup_txlog_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    ck = os.path.join(root, "ck")
    base = os.path.join(root, "rollups")
    rows = (nio.load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 2000)
            .select("event_id", F.col("event_type").alias("name"),
                    F.col("ts").cast("long").alias("time"), "value")
            .collect())
    for tag, lo, hi in (("a", 0, 1000), ("b", 1000, 2000)):
        with open(os.path.join(src, f"{tag}.ndjson"), "w") as f:
            for r in rows:
                if lo <= r.event_id < hi:
                    f.write(_json.dumps({"name": r.name, "time": r.time,
                                         "value": r.value}) + "\n")
    q = ingest.stream_rollup(spark, src, base, ck, table_format="txlog")
    _await(q, 120)
    sec = os.path.join(base, "rollup_sec")
    # foreachBatch retry of the committed epoch 0: txn dedupe no-ops it
    app = ingest._run_key(ck)
    txlog.write(txlog.read_table(spark, sec).limit(1), sec, txn=(app, 0))
    # OPTIMIZE: fold every partial into one file, one atomic commit
    ingest.compact_rollup(spark, base, "sec")
    router = RollupRouter(spark, base, table_format="txlog")
    out = router.query(SECOND, {"cnt": "count", "sum_value": "sum",
                                "min_value": "min", "max_value": "max"})
    return (out.select("name", F.col("time").cast("long").alias("time"),
                       F.col("cnt").cast("long").alias("cnt"),
                       F.round("sum_value", 6).alias("sum_value"),
                       F.round("min_value", 6).alias("min_value"),
                       F.round("max_value", 6).alias("max_value"))
            .orderBy("name", "time"))


def _q_http_source(spark, sf_dir):
    """HTTP-fetched CSV source under the value-hash gate (tql/script.py
    CSV(file('http://...')) — fm_csv.go:115-135 URL fetch + field()
    coercions): a local stdlib server serves a fixed CSV body; the TQL
    text front-end fetches it driver-side and types the fields.  The
    oracle is the literal payload — equality certifies the fetch, the
    CSV decode, and the typed-field coercion path end-to-end."""
    import http.server
    import threading

    body = b"1,temp.a,3.14\n2,temp.b,2.71\n3,hum.a,55.5\n"

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from neo_server_spark.tql.script import TqlRunner
        port = srv.server_address[1]
        df = TqlRunner(spark, sf_dir=sf_dir).run(f"""
            CSV(file('http://127.0.0.1:{port}/feed.csv'),
                field(0, intType(), 'id'),
                field(1, stringType(), 'tag'),
                field(2, doubleType(), 'val'))
        """)
        rows = [tuple(r) for r in df.collect()]
    finally:
        srv.shutdown()
    out = spark.createDataFrame(rows, "id int, tag string, val double")
    return out.select(F.col("id").cast("long").alias("id"), "tag", "val") \
        .orderBy("id")


def _q_cache_hit(spark, sf_dir):
    """TTL result cache under the value-hash gate (tql/cache.py —
    tqlcache.go:21-70 LRU+TTL checked before execution): the producer
    runs a real distributed aggregation ONCE; the second lookup must be
    a hit serving identical rows.  The oracle replays the aggregation —
    equality certifies the cache never corrupts or staleness-skews what
    it serves."""
    from neo_server_spark.tql.cache import ResultCache

    cache = ResultCache(capacity=8)
    calls = {"n": 0}

    def produce():
        calls["n"] += 1
        df = (nio.load_table(spark, sf_dir, "events")
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.round(F.sum("value"), 6).alias("sum_value"))
              .orderBy("event_type"))
        return [tuple(r) for r in df.collect()]

    first = cache.get_or_compute("agg", ttl=300.0, producer=produce)
    second = cache.get_or_compute("agg", ttl=300.0, producer=produce)
    assert calls["n"] == 1 and first == second \
        and cache.stats["hits"] >= 1, (calls, cache.stats)
    return spark.createDataFrame(
        second, "event_type string, cnt long, sum_value double") \
        .orderBy("event_type")


def _q_when_do(spark, sf_dir):
    """WHEN(cond, do(...)) sub-pipeline under the value-hash gate
    (tql/doers.py + script.py — fm_monad.go:2310-2383: a nested TQL task
    runs per matching record, ARGS() reads the evaluated args, INSERT
    appends): the sub-pipeline's side-effect table IS the result.  The
    oracle replays the condition — equality certifies WHEN matching,
    argument evaluation, the nested task, and the table append."""
    import tempfile

    from neo_server_spark.tql.script import TqlRunner

    root = tempfile.mkdtemp(prefix="when_do_")
    # bounded source: the nested task runs PER MATCHING RECORD (one
    # small append job each) — that per-event cost is the semantics
    # being certified, so certify it on a 60-event slice, not the corpus
    TqlRunner(spark, sf_dir=sf_dir, fs_root=root).run("""
        SQL('select event_id, event_type, value from events
             order by event_id limit 60')
        WHEN( value(1) == 'click', do(value(0), value(2), {
            ARGS()
            INSERT("event_id", "value", table('when_hits'))
        }))
    """).collect()     # drain the main stream so every doer fires
    hits = spark.read.parquet(f"{root}/when_hits")
    return hits.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value").cast("double"), 6).alias("value")) \
        .orderBy("event_id")


def _q_tql_args(spark, sf_dir):
    """Request params in the TQL text front-end (script.py param() —
    fm_args / GetRequestParam): FILTER on param('etype'), MAPVALUE
    rounding, certified against the parameter inlined in SQL."""
    from neo_server_spark.tql.script import TqlRunner

    return TqlRunner(spark, sf_dir=sf_dir, params={"etype": "error"}).run("""
        SQL('select event_id, event_type, value from events order by event_id')
        FILTER( value(1) == param('etype') )
        MAPVALUE(2, round(value(2), 6))
    """)


def _q_append_sink(spark, sf_dir):
    """APPEND(table(...)) sink under the value-hash gate (tql/script.py —
    fm_sink.go append path: bulk rows into the engine's tag-table
    layout, the message envelope reporting success/fail counts): a
    SQL-sourced 50-row slice appends into a fresh tag table; reading the
    table back IS the result.  The oracle replays the slice — equality
    certifies the sink's row shaping, the tag-table write layout, and
    the read-back path."""
    import json as _json
    import tempfile

    from neo_server_spark.tql.script import TqlRunner

    root = tempfile.mkdtemp(prefix="append_sink_")
    out = TqlRunner(spark, sf_dir=sf_dir, fs_root=root).run("""
        SQL('select event_type as name, cast(ts as long) as time, value
             from events where event_type = ? order by event_id limit 50',
            'signup')
        APPEND(table('apnd'))
    """)
    msg = _json.loads(out)["data"]["message"]
    assert "success 50, fail 0" in msg, msg
    tbl = nio.read_tag_table(spark, f"{root}/apnd")
    return tbl.select("name", _us("time"), F.round("value", 6)
                      .alias("value")) \
        .orderBy("time", "value")


def _q_semdedup(spark, sf_dir):
    """SemDeDup (datapipe.dedup.semdedup — Abbas et al. 2023): embeddings
    clustered to 32 fixed centroids (the first 32 vectors — deterministic, so
    the assignment itself is SQL-checkable), then near-identical pairs are
    pruned WITHIN clusters only.  The oracle replays nearest-centroid
    argmin + the cluster-local cosine sweep, certifying assignment, pair
    generation, keep-lowest-id policy, and the cosine math end-to-end."""
    emb = nio.load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    return dedup.semdedup(emb, cents, threshold=0.4).orderBy("vec_id")


def _q_mixture_plan(spark, sf_dir):
    """Domain-mixture plan (datapipe.sampling.mixture_plan): Pile/DoReMi-
    style target weights + token budget -> per-domain sampling rate split
    into whole epochs and a fractional hash-sampled remainder.  One
    map-side-combined token-count agg; every derived number is closed-form
    so DuckDB reproduces the plan bit-for-bit."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return sampling.mixture_plan(docs, MIX_WEIGHTS, MIX_BUDGET, by="source") \
        .orderBy("domain")


def _q_data_mixture(spark, sf_dir):
    """Materialized mixture sample (datapipe.sampling.mixture_sample): each
    doc appears once per whole epoch of its domain plus deterministically
    (md5(doc_id#epoch) threshold) for the fractional epoch — reproducible
    oversampling/downsampling with zero shuffle and no RNG state."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return sampling.mixture_sample(docs, MIX_WEIGHTS, MIX_BUDGET, by="source") \
        .orderBy("doc_id", "epoch")


def _q_quality_classifier(spark, sf_dir):
    """Model-based quality filter (datapipe.text.classifier_score): fastText
    architecture — hashed unigram+bigram features, mean-pooled linear margin,
    sigmoid — scored with pure JVM array expressions (no UDF, no shuffle).
    md5-derived pseudo-weights make the whole scoring path engine-checkable;
    production swaps in trained weights via a broadcast map."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.classifier_score(docs).orderBy("doc_id")


def _q_similarity_pq(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_train/encode/search — Jégou
    et al. 2011, the IVF-PQ memory layout behind billion-scale indexes):
    deterministic first-16 codebook init (iters=0 keeps it SQL-replayable),
    8-subspace encode, asymmetric-distance top-20.  The oracle replays
    codebook slicing, per-subspace argmin, the ADC lookup table, and the
    distance sum — certifying the whole quantize/score path."""
    from neo_server_spark.datapipe import similarity as sim

    emb = nio.load_table(spark, sf_dir, "embeddings")
    cb = sim.pq_train(emb, m=8, k=16, iters=0)
    codes = sim.pq_encode(emb.filter(F.col("vec_id") != 0), cb)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return (sim.pq_search(codes, cb, qv, k=20)
            .select("vec_id", F.round("adc_d2", 6).alias("adc_d2")))


def _q_text_normalize(spark, sf_dir):
    """Corpus text normalization (datapipe.text.normalize_text): NFC via an
    Arrow-batched mapInPandas unicodedata kernel + JVM control-strip and
    whitespace collapse.  Combining sequences (e+U+0301, n+U+0303), a BEL
    control and doubled spaces are woven around each doc so every rule has
    real work; DuckDB's nfc_normalize replays the kernel exactly."""
    docs = nio.load_table(spark, sf_dir, "documents")
    raw = F.concat(F.lit("Café  \x07"), F.col("text"),
                   F.lit("  straño"))
    return (text.normalize_text(docs.withColumn("raw", raw), "raw")
            .orderBy("doc_id"))


def _q_shard_export(spark, sf_dir):
    """Token-budgeted shard assignment (datapipe.text.shard_plan): the
    distributed-prefix-sum layout that write_shards materializes as
    partitioned parquet.  The oracle recomputes the running offset with a
    single SQL window — equal because the partitioned prefix sum is exact,
    not approximate."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return text.shard_plan(docs, shard_tokens=5000).orderBy("doc_id")


# --- round 8: corpus-curation operators (datapipe/curate.py) ---

#: deterministic synthetic "lines" for the C4/line-dedup entries — the
#: documents table is single-line word soup, so lines are derived as 8-token
#: chunks with arithmetic-determined terminal punctuation and rule-trigger
#: tokens; the SAME expression is mirrored in the oracle.
_LINED_EXPR = (
    "array_join(transform(sequence(0, int(ceil(size(__tk) / 8.0)) - 1), j -> "
    "concat(array_join(slice(__tk, j * 8 + 1, 8), ' '), "
    " case when (doc_id + j) % 3 = 1 then '.' "
    "      when (doc_id + j) % 3 = 2 then '?' else '' end, "
    " case when j % 7 = 3 then ' javascript.' else '' end)), '|')")


def _lined_docs(spark, sf_dir):
    docs = nio.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("__tk"),
    ).select("doc_id", F.expr(_LINED_EXPR).alias("text"))


def _q_c4_filters(spark, sf_dir):
    """C4 heuristic cleaning rules (Raffel et al. 2020 §2.2;
    datapipe/curate.py c4_line_stats): per-document line survival under the
    terminal-punctuation / >=5-words / javascript line rules plus the
    page-level lorem-ipsum / curly-brace / too-few-lines removals.
    Scan-side array expressions, zero shuffle."""
    return curate.c4_line_stats(_lined_docs(spark, sf_dir), sep="|") \
        .orderBy("doc_id")


def _q_line_dedup(spark, sf_dir):
    """Corpus-global duplicate-line removal, first occurrence wins (C4's
    span dedup at line granularity; curate.dedup_lines).  Only (md5, doc,
    pos) shuffles — the text never does; keeper election is a groupBy(min)
    on the line digest."""
    return curate.dedup_lines(_lined_docs(spark, sf_dir), sep="|") \
        .orderBy("doc_id")


def _q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023; curate.dsir_select):
    hashed-unigram bucket distributions for corpus vs target (lang='en'),
    per-doc log importance weight, top-25% selection.  Token stream
    collapses map-side to O(buckets); the ratio table broadcasts.
    md5 bucket mode makes every weight SQL-reproducible."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), 0.25,
        n_buckets=64, hash_fn="md5").orderBy("doc_id")


def _q_winnow_fp(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. SIGMOD 2003, the MOSS
    scheme; curate.winnow_profile): per-document selected-fingerprint
    profile at k=5, w=4.  The windowed rightmost-min argmin is pure
    per-row array arithmetic on a packed hash+position key — no shuffle,
    no UDF."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.winnow_profile(docs, k=5, w=4).orderBy("doc_id")


def _q_winnow_overlap(spark, sf_dir):
    """MOSS overlap report (curate.winnow_overlap): document pairs sharing
    >=2 distinct winnowing fingerprints; the join is keyed on the 28-bit
    fingerprint value after a hot-key fence."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.winnow_overlap(docs, k=5, w=4, min_shared=2) \
        .orderBy("id_a", "id_b")


def _q_tfidf_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (curate.tfidf_top_terms, the
    scikit-learn smoothed-idf convention): map-side-combined term
    frequencies, O(vocab) document-frequency join, per-doc window top-k."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.tfidf_top_terms(docs, top_k=3).orderBy("doc_id", "rank")


def _q_dedup_canonical(spark, sf_dir):
    """Quality-aware canonicalization (dedup.canonicalize_best): within
    each near-dup cluster keep the LONGEST member (ties to lowest id)
    instead of the arbitrary min-id — the curation policy when duplicates
    differ in cleanliness.  Same components as dedup_clusters plus one
    map-side-combinable argmax groupBy."""
    docs = nio.load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.05,
                                      prefilter_col="lang")
    return (
        dedup.canonicalize_best(docs, pairs, score_col="n_chars")
        .select("doc_id", "cluster_id", "canonical_id", "keep")
        .orderBy("doc_id")
    )


def _q_corpus_card(spark, sf_dir):
    """Dataset-card headline numbers (datapipe/report.py corpus_profile —
    Gebru et al. 2021 'datasheets'): corpus totals + exact-dup accounting
    in ONE aggregate pass, all map-side-combinable."""
    docs = nio.load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(F.size(toks)).alias("n_tokens"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )


def _q_gopher_quality(spark, sf_dir):
    """The full Gopher quality rule set (Rae et al. 2021 Table A1;
    curate.gopher_quality): word-count/mean-length/symbol-ratio/bullet/
    ellipsis/alpha-fraction/stop-word rules, all scan-side array
    arithmetic with per-rule booleans and the combined keep."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.gopher_quality(docs).orderBy("doc_id")


def _q_readability(spark, sf_dir):
    """Flesch reading-ease screen (curate.readability): vowel-run
    syllable counting and terminal-punctuation sentence splitting,
    closed-form score — zero shuffle."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.readability(docs).orderBy("doc_id")


def _q_streaming_curation(spark, sf_dir):
    """End-to-end STREAMING curation (streaming/curation.py): readStream
    over documents -> C4 clean (scan-side) -> incremental dedup against
    the persistent digest index -> curated parquet, one availableNow
    batch; checked against the batch SQL oracle (same technique as
    streaming_rollup).  The index accumulates across runs so continuous
    corpus building never rescans curated data."""
    import tempfile
    import uuid

    from neo_server_spark.streaming import curation

    path = f"{sf_dir}/documents.parquet"
    import os as _os
    schema = spark.read.parquet(path).schema
    if _os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", "documents.parquet").parquet(sf_dir))
    lined = src.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("__tk"),
    ).select("doc_id", F.expr(_LINED_EXPR).alias("text"))
    base = tempfile.mkdtemp(prefix="stream_curate_" + uuid.uuid4().hex[:6])
    out, idx, ck = f"{base}/out", f"{base}/idx", f"{base}/ck"
    q = curation.stream_curate(lined, idx, out, ck, sep="|")
    _await(q, 180)
    return spark.read.parquet(out).select("doc_id", "text").orderBy("doc_id")


def _q_lm2(spark, sf_dir):
    """Interpolated bigram LM scoring (curate.lm_score_bigram — the
    CCNet-style perplexity filter, self-trained): unigram/bigram tables
    are map-side-combined aggs; per-occurrence bigrams equi-join them."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.lm_score_bigram(docs).orderBy("doc_id")


def _q_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per document
    (curate.char_entropy): per-row sorted-fold array arithmetic — zero
    shuffle, summation order pinned so the float is engine-exact."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.char_entropy(docs).orderBy("doc_id")


def _q_mad_outliers(spark, sf_dir):
    """Robust per-source length outliers via median/MAD modified z-score
    (curate.mad_outliers, Iglewicz & Hoaglin): two exact-percentile aggs
    on (source, value) pairs, broadcast joins back."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return curate.mad_outliers(docs).orderBy("doc_id")


def _q_dedup_incr(spark, sf_dir):
    """Incremental exact dedup against a persistent digest index
    (dedup.dedup_incremental): the accumulated corpus participates as
    16-byte digests only — daily batches anti-join the index and dedup
    in-batch, all keyed on the digest.  Seen = docs with doc_id%3==0."""
    docs = nio.load_table(spark, sf_dir, "documents")
    seen = dedup.digest_index(docs.filter(F.col("doc_id") % 3 == 0))
    newb = docs.filter(F.col("doc_id") % 3 != 0)
    return (dedup.dedup_incremental(newb, seen)
            .select("doc_id", "source", "n_chars").orderBy("doc_id"))


def _q_txlog_dml(spark, sf_dir):
    """Copy-on-write DML + time travel under the value-hash gate
    (neo_server_spark/dml.py over txlog.py — the lakehouse form of the
    engine's row mutations, e.g. DELETE FROM ... WHERE exercised at
    mods/server/http_query_test.go:394): events land in a txlog table
    over four stats-carrying commits, then DELETE (id%7), UPDATE
    (id%5 doubles val), and MERGE (id%11 upserts, id%13+100000 inserts)
    each rewrite ONLY the files containing affected rows and publish
    one atomic conflict-checked commit.  The entry also asserts the
    pre-DML snapshot is still readable via version_as_of (time travel)
    and that every statement touched fewer files than the table holds
    (copy-on-write minimality).  The oracle replays the same three
    statements as pure SQL set algebra."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id", "user_id", "event_type",
                  F.floor(F.col("value") * 1000).alias("val")))
    t = os.path.join(tempfile.mkdtemp(prefix="txlog_dml_"), "tbl")
    # the four seed batches are INDEPENDENT appends: submit them from
    # driver threads so each write job's tail back-fills the others'
    # idle executors (guide §2.6 — Spark's scheduler runs concurrent
    # jobs fine; txlog's optimistic commit protocol serializes the four
    # commits through its version-race retry, the exact multi-writer
    # shape the 7-actor stress pins).  Result rows are order-independent
    # (disjoint appends); base_ver is read after the barrier.
    from concurrent.futures import ThreadPoolExecutor

    def _load(k: int) -> int:
        return txlog.write(ev.filter(F.pmod("event_id", F.lit(4)) == k)
                           .repartition(2), t, stats_cols=["event_id"])

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(_load, range(4)))
    base_ver = txlog.current_version(t)
    n_base = ev.count()
    d = dml.delete(spark, t, "event_id % 7 = 0",
                   stats_cols=["event_id"])
    u = dml.update(spark, t, "event_id % 5 = 0", {"val": "val * 2"},
                   stats_cols=["event_id"])
    src = (ev.filter(F.col("event_id") % 11 == 0)
           .select("event_id", "user_id",
                   F.lit("merged").alias("event_type"),
                   F.lit(-1).cast("long").alias("val"))
           .unionByName(
               ev.filter(F.col("event_id") % 13 == 0)
               .select((F.col("event_id") + 100000).alias("event_id"),
                       "user_id", F.lit("inserted").alias("event_type"),
                       F.lit(-2).cast("long").alias("val"))))
    m = dml.merge(spark, t, src, on=["event_id"],
                  stats_cols=["event_id"])
    assert txlog.read_table(spark, t,
                            version_as_of=base_ver).count() == n_base, \
        "time travel must reconstruct the pre-DML snapshot"
    for res in (d, u, m):
        assert 1 <= res["files_touched"] < len(txlog.live_files(t)) + 1
    return txlog.read_table(spark, t).orderBy("event_id")


def _q_doc_chunks(spark, sf_dir):
    """Overlapping token-budgeted document chunking
    (text.chunk_documents — the long-document splitter a retrieval /
    context-window pipeline needs, complement of pack_sequences):
    chunk k covers tokens [k*56, k*56+64) so consecutive chunks share 8
    tokens; entirely JVM-side (split -> sequence -> explode -> slice ->
    concat_ws in one codegen span, plan pinned in test_datapipe).  The
    oracle reproduces the slicing with DuckDB list arithmetic."""
    docs = (nio.load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 5 == 0))
    out = text.chunk_documents(docs, max_tokens=64, overlap=8)
    return (out.select("doc_id",
                       F.col("chunk_id").cast("long").alias("chunk_id"),
                       F.col("chunk_tokens").cast("long")
                       .alias("chunk_tokens"),
                       "chunk")
            .orderBy("doc_id", "chunk_id"))


def _q_matview_incr(spark, sf_dir):
    """Incrementally-maintained materialized view under the value-hash
    gate (streaming/matview.MatView — generalizes TagStatTable to
    arbitrary self-mergeable aggregates off the txlog CDF): events land
    in a txlog table over TWO commits with a refresh after each, so the
    second refresh folds ONLY the delta files into the stored partials
    (count/sum/min/max/(sum,cnt)-avg/HLL-distinct); the oracle
    recomputes the view from the raw rows.  user_id%8 keeps every
    group's cardinality inside the HLL sketch's exact coupon range, so
    the estimate IS the exact distinct count (same property
    rollup_distinct pins)."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming.matview import MatView

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id",
                  F.col("event_type").alias("name"),
                  F.floor(F.col("value") * 1000).alias("val"),
                  F.pmod("user_id", F.lit(8)).alias("u")))
    root = tempfile.mkdtemp(prefix="matview_")
    src = os.path.join(root, "src")
    vt = os.path.join(root, "view")
    aggs = {"n": ("count", "val"), "total": ("sum", "val"),
            "lo": ("min", "val"), "hi": ("max", "val"),
            "mean": ("avg", "val"), "users": ("approx_distinct", "u")}
    txlog.write(ev.filter(F.col("event_id") % 2 == 0).drop("event_id"),
                src)
    mv = MatView(spark, src, vt, keys=["name"], aggs=aggs)
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0).drop("event_id"),
                src)
    assert mv.refresh()["mode"] == "incremental", \
        "second refresh must fold the delta, not recompute"
    return (mv.read()
            .select("name", "n", "total", "lo", "hi",
                    F.round("mean", 6).alias("mean"),
                    F.col("users").cast("long").alias("users"))
            .orderBy("name"))


def _q_auth_flow(spark, sf_dir):
    """Auth surface end-to-end under the value-hash gate (server/auth.py
    + the http_api middlewares; reference handleLogin http.go:663,
    handleKeysGen http_facility.go:502, handleAuthToken http.go:458):
    an anonymous /db/query is refused 401 -> login issues a JWT pair ->
    the JWT mints a client API key over /web/api/keys -> the KEY (not
    the JWT) runs the aggregate over /db/query -> deleting the key
    closes the door again.  The returned rows came through the whole
    authenticated HTTP path; the oracle recomputes the aggregate
    directly, so equality certifies login, key issue/validate, the
    gates, and the query route in one hash."""
    import json as _json
    import tempfile
    import urllib.error
    import urllib.parse
    import urllib.request

    from neo_server_spark.server.auth import Authenticator
    from neo_server_spark.server.http_api import EngineHttpServer

    srv = EngineHttpServer(spark, sf_dir=sf_dir,
                           fs_root=tempfile.mkdtemp(prefix="auth_flow_"),
                           auth=Authenticator())
    port = srv.start()
    base = f"http://127.0.0.1:{port}"

    def call(path, body=None, bearer=None, method=None):
        headers = {"Content-Type": "application/json"}
        if bearer:
            headers["Authorization"] = f"Bearer {bearer}"
        req = urllib.request.Request(
            base + path,
            data=_json.dumps(body).encode() if body is not None else None,
            headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, _json.loads(r.read())
        except urllib.error.HTTPError as ex:
            return ex.code, _json.loads(ex.read())
    q = urllib.parse.quote(
        "select event_type as name, cast(count(*) as long) as n, "
        "round(sum(value), 6) as sv from events "
        "group by event_type order by event_type")
    try:
        st, _ = call(f"/db/query?q={q}&format=json")
        assert st == 401, "anonymous /db access must be refused"
        st, _ = call("/web/api/login",
                     {"loginName": "sys", "password": "wrong"})
        assert st == 404, "bad password must be refused"
        st, rsp = call("/web/api/login",
                       {"loginName": "sys", "password": "manager"})
        assert st == 200 and rsp["success"]
        jwt = rsp["accessToken"]
        st, rsp = call("/web/api/keys", {"name": "pipeline-01"},
                       bearer=jwt)
        assert st == 200 and rsp["token"].startswith("pipeline-01:b:")
        key = rsp["token"]
        st, rsp = call(f"/db/query?q={q}&format=json", bearer=key)
        assert st == 200, rsp
        cols = rsp["data"]["columns"]
        # JSON drops the .0 on integral doubles: coerce per column type
        rows = [(r[0], int(r[1]), float(r[2]))
                for r in rsp["data"]["rows"]]
        st, _ = call("/web/api/keys/pipeline-01", bearer=jwt,
                     method="DELETE")
        assert st == 200
        st, _ = call(f"/db/query?q={q}&format=json", bearer=key)
        assert st == 401, "deleted key must stop validating"
    finally:
        srv.stop()
    assert [c.lower() for c in cols] == ["name", "n", "sv"]
    return (spark.createDataFrame(rows,
                                  "name string, n long, sv double")
            .orderBy("name"))


def _q_streaming_upsert(spark, sf_dir):
    """Streaming CDC-apply upsert under the value-hash gate
    (streaming/ingest.stream_upsert — foreachBatch MERGE with
    txn=(run_key, epoch) exactly-once, per-batch latest-row election):
    events become two ndjson waves with strictly increasing times
    (event_id < 1500, then >= 1500), each drained as its own epoch into
    a keyed txlog table; because wave-2 times exceed wave-1's, the final
    table equals the global latest-per-key, which the oracle computes
    with one window."""
    import json as _json
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming import ingest

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select(F.concat(F.lit("u"), (F.col("user_id") % 97)
                           .cast("string")).alias("name"),
                  F.col("event_id").alias("time"),
                  F.floor(F.col("value") * 1000).cast("double")
                  .alias("value")))
    rows = ev.collect()
    root = tempfile.mkdtemp(prefix="stream_upsert_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    tbl = os.path.join(root, "tbl")
    ck = os.path.join(root, "ck")
    for fname, lo, hi in (("w1.ndjson", 0, 1500),
                          ("w2.ndjson", 1500, 3000)):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                if lo <= r["time"] < hi:
                    f.write(_json.dumps(
                        {"name": r["name"], "time": r["time"],
                         "value": r["value"]}) + "\n")
        q = ingest.stream_upsert(spark, src, tbl, ck, on=["name"],
                                 order_col="time", stats_cols=["time"])
        _await(q, 120)
    out = txlog.read_table(spark, tbl)
    return out.select("name", "time", "value").orderBy("name")


def _q_scd2_dimension(spark, sf_dir):
    """SCD Type-2 dimension maintenance under the value-hash gate
    (dml.scd2_apply — Kimball dimension history as copy-on-write over
    the txlog): snapshot 1 (max event_type per user bucket over
    event_id < 1500) bootstraps the dimension at eff=1000; snapshot 2
    (>= 1500) applies at eff=2000 — changed keys close their current
    version and open a new one, unchanged keys produce NO version
    churn, new keys insert.  The oracle rebuilds the same version
    table with a FULL OUTER JOIN of the two snapshots."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000))
    w1 = (ev.filter(F.col("event_id") < 1500)
          .groupBy((F.col("user_id") % 200).alias("k"))
          .agg(F.max("event_type").alias("attr")))
    w2 = (ev.filter(F.col("event_id") >= 1500)
          .groupBy((F.col("user_id") % 200).alias("k"))
          .agg(F.max("event_type").alias("attr")))
    t = os.path.join(tempfile.mkdtemp(prefix="scd2_"), "dim")
    txlog.write(dml.scd2_init(w1, F.lit(1000).cast("long"))
                .repartition(2), t)
    res = dml.scd2_apply(
        spark, t, w2.withColumn("eff", F.lit(2000).cast("long")),
        on=["k"], attrs=["attr"], effective_col="eff")
    # copy-on-write minimality: the rewrite stays within the discovery
    # candidates, and a rewrite happened iff some shared key actually
    # changed its attribute — at sf0.001 snapshot 2's max(event_type)
    # ties snapshot 1 on every shared key (a legitimate no-churn
    # apply), so the former unconditional files_touched >= 1 rejected
    # a correct result on tiny fixtures.
    assert res["files_touched"] <= res["files_total"]
    any_changed = (w1.withColumnRenamed("attr", "__a1")
                   .join(w2.withColumnRenamed("attr", "__a2"), "k")
                   .filter(~F.col("__a1").eqNullSafe(F.col("__a2")))
                   .limit(1).count() > 0)
    assert (res["files_touched"] >= 1) == any_changed
    return (txlog.read_table(spark, t)
            .select("k", "attr", "_valid_from", "_valid_to",
                    "_is_current")
            .orderBy("k", "_valid_from"))


def _q_stream_scd2(spark, sf_dir):
    """STREAMING SCD Type-2 sink under the value-hash gate
    (streaming/ingest.stream_scd2 -> dml.scd2_apply per micro-batch,
    exactly-once via txn=(run, epoch) — the streaming half of the
    Kimball pattern scd2_dimension certifies in batch): the dimension
    bootstraps from snapshot 1 (max val per name over event_id<1000,
    eff=1000); TWO NDJSON micro-batches then stream snapshots 2
    (eff=2000) and 3 (eff=3000) through the sink — each epoch closes
    changed keys at its effective time, inserts unseen keys, and never
    churns identical tuples.  floor(value*1000) keeps the streamed
    double integral so the JSON wire round-trip is exact.  The oracle
    chains the three snapshots per key and drops consecutive
    duplicates with a window walk (the no-churn rule)."""
    import json as _json
    import os
    import tempfile

    from neo_server_spark import dml, txlog
    from neo_server_spark.streaming import ingest

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select(F.concat(F.col("event_type"), F.lit("-"),
                           F.pmod("user_id", F.lit(40)).cast("string"))
                  .alias("name"),
                  "event_id",
                  F.floor(F.col("value") * 1000).cast("double")
                  .alias("value")))

    def snap(lo, hi):
        return (ev.filter((F.col("event_id") >= lo)
                          & (F.col("event_id") < hi))
                .groupBy("name").agg(F.max("value").alias("value")))

    root = tempfile.mkdtemp(prefix="stream_scd2_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    table = os.path.join(root, "dim")
    ckpt = os.path.join(root, "ck")
    txlog.write(dml.scd2_init(snap(0, 1000), F.lit(1000).cast("long")),
                table)
    now = int(os.stat(table).st_mtime)
    for i, (lo, hi) in enumerate([(1000, 2000), (2000, 3000)]):
        eff = 2000 + i * 1000
        p = os.path.join(src, f"b{i}.ndjson")
        with open(p, "w") as f:
            for r in snap(lo, hi).collect():   # O(keys) driver rows
                f.write(_json.dumps(
                    {"name": r["name"], "time": eff,
                     "value": r["value"]}) + "\n")
        # strictly increasing mtimes pin the file-source epoch order
        os.utime(p, (now - 20 + 10 * i, now - 20 + 10 * i))
    # ONE stream run, TWO epochs: maxFilesPerTrigger=1 makes each
    # snapshot its own micro-batch (r12 verdict #4: half the stream
    # startup cost without weakening the multi-epoch semantics)
    q = ingest.stream_scd2(spark, src, table, ckpt,
                           on=["name"], attrs=["value"],
                           max_files_per_trigger=1)
    _await(q, 120)
    return (txlog.read_table(spark, table)
            .select("name", "value", "_valid_from", "_valid_to",
                    "_is_current")
            .orderBy("name", "_valid_from"))


def _q_rollup_matview(spark, sf_dir):
    """time-ROLLUP answered from an INCREMENTALLY-maintained matview
    (sqlx/rollup.MatViewRollup — the r11 VERDICT #8 stretch unifying
    the rollup cascade and the IVM machinery; reference semantics:
    engine-maintained rollups, http_lake.go:1692-1698): events land in
    a txlog tag table over TWO commits; a MatView folds each delta into
    (name, sec-bucket) count/sum/sumsq/min/max partials (the second
    refresh is asserted O(delta), mode='incremental'); the 1-minute
    ROLLUP query is then answered from the partials with ZERO
    base-table scans (plan-pinned in tests/test_plans.py).  The oracle
    computes the same rollup straight off the raw rows."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    ev = (_tag(spark, sf_dir)
          .filter(F.col("event_id") < 6000)
          .select("name", "time", "value", "event_id"))
    root = tempfile.mkdtemp(prefix="rollup_mv_")
    base = os.path.join(root, "tag")
    txlog.write(ev.filter(F.col("event_id") % 2 == 0)
                .drop("event_id"), base)
    r = MatViewRollup(spark, base, os.path.join(root, "view"))
    assert r.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0)
                .drop("event_id"), base)
    assert r.refresh()["mode"] == "incremental", \
        "second refresh must fold only the delta commit"
    out = r.query(MINUTE, {"cnt": "count", "sum_v": "sum",
                           "min_v": "min", "max_v": "max",
                           "avg_v": "avg"})
    return out.select(
        "name", F.expr("time div 1000").alias("time"),
        "cnt", F.round("sum_v", 6).alias("sum_v"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round("avg_v", 6).alias("avg_v")).orderBy("name", "time")


def _q_rollup_matview_distinct(spark, sf_dir):
    """APPROX COUNT(DISTINCT) served from the IVM matview (r13: the
    last calc mode unified onto the incremental path — MatViewRollup
    distinct_col carries an HLL sketch partial per (name, sec-bucket);
    sketch union is lossless, so folding partials to the requested
    period gives the SAME estimate as one pass over the raw rows, and
    user_id%8 keeps every bucket inside the sketch's exact coupon
    range so the estimate IS the exact distinct count the oracle
    computes).  Two commits, second refresh asserted incremental."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    ev = (_tag(spark, sf_dir)
          .filter(F.col("event_id") < 4000)
          .select("name", "time", "value", "event_id",
                  F.pmod("user_id", F.lit(8)).alias("dev")))
    root = tempfile.mkdtemp(prefix="rollup_mv_d_")
    base = os.path.join(root, "tag")
    txlog.write(ev.filter(F.col("event_id") % 2 == 0)
                .drop("event_id"), base)
    r = MatViewRollup(spark, base, os.path.join(root, "view"),
                      distinct_col="dev")
    assert r.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0)
                .drop("event_id"), base)
    assert r.refresh()["mode"] == "incremental", \
        "second refresh must fold only the delta commit"
    out = r.query(MINUTE, {"cnt": "count", "devs": "approx_distinct"})
    return out.select(
        "name", F.expr("time div 1000").alias("time"), "cnt",
        F.col("devs").cast("long").alias("devs")).orderBy("name", "time")


def _q_matview_evolve(spark, sf_dir):
    """Schema evolution THROUGH the incremental matview (r12 verdict
    stretch #8, streaming/matview.MatView.evolve): the source evolves
    (merge_schema append adds ``val2``) and the view widens with
    aggregates over the new column by backfilling ONLY post-evolution
    files — rows that predate the evolution contribute the NULL fold
    identity, so no full recompute.  Sequence: v1 append (no val2) ->
    refresh -> v2 merge_schema append (val2) -> refresh (still
    incremental, typed-NULL CDF projection) -> evolve(wsum/whi,
    since_version=2) -> read.  PURE O(delta): the recompute escape
    hatch lives in its own entry (matview_evolve_recompute) so bench
    attribution never conflates the backfill cost with a full
    recompute (r14 verdict #4).  The oracle recomputes the widened
    view from the raw rows with val2 NULL on the pre-evolution
    tranche."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming.matview import MatView

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id",
                  F.col("event_type").alias("name"),
                  F.floor(F.col("value") * 1000).alias("val"),
                  F.floor(F.col("value") * 500).alias("val2")))
    root = tempfile.mkdtemp(prefix="mv_evolve_")
    src = os.path.join(root, "src")
    mv_aggs = {"n": ("count", "val"), "total": ("sum", "val")}
    txlog.write(ev.filter(F.col("event_id") % 2 == 0)
                .select("name", "val", "event_id"), src)         # v1
    mv = MatView(spark, src, os.path.join(root, "view"),
                 keys=["name"], aggs=mv_aggs)
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0)
                .select("name", "val", "val2", "event_id"), src,
                merge_schema=True)                               # v2
    assert mv.refresh()["mode"] == "incremental", \
        "evolved delta must still fold incrementally"
    r = mv.evolve({"wsum": ("sum", "val2"), "whi": ("max", "val2")},
                  since_version=2)
    assert r["mode"] == "evolve" and r["backfill_files"] >= 1
    return (mv.read()
            .select("name", "n", F.col("total").cast("long")
                    .alias("total"),
                    F.col("wsum").cast("long").alias("wsum"), "whi")
            .orderBy("name"))


def _q_matview_evolve_recompute(spark, sf_dir):
    """The evolve() ESCAPE HATCH (r13 verdict #4, r14 #4: its own
    entry so the O(table) recompute never pollutes matview_evolve's
    O(delta) bench attribution): aggregates whose fold identity is
    not NULL — row-counting ``count`` and order-aware ``last`` —
    cannot be backfilled from post-evolution files, so
    ``recompute=True`` rebuilds the whole widened view in ONE atomic
    publish at the current cursor (mode 'evolve_recompute'), priced
    honestly as a full scan.  Same fixture as matview_evolve; the
    oracle recomputes the widened view from the raw rows (v2last
    coalesces so both engines' max_by/arg_max NULL semantics stay out
    of play; event_id is a strict total order)."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming.matview import MatView

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id",
                  F.col("event_type").alias("name"),
                  F.floor(F.col("value") * 1000).alias("val"),
                  F.floor(F.col("value") * 500).alias("val2")))
    root = tempfile.mkdtemp(prefix="mv_evolve_rc_")
    src = os.path.join(root, "src")
    txlog.write(ev.filter(F.col("event_id") % 2 == 0)
                .select("name", "val", "event_id"), src)         # v1
    mv = MatView(spark, src, os.path.join(root, "view"),
                 keys=["name"],
                 aggs={"n": ("count", "val"),
                       "total": ("sum", "val")})
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0)
                .select("name", "val", "val2", "event_id"), src,
                merge_schema=True)                               # v2
    assert mv.refresh()["mode"] == "incremental"
    # count/last are REJECTED on the O(delta) path (identity not NULL)
    try:
        mv.evolve({"rows2": ("count", "val2")}, since_version=2)
        raise AssertionError("count must not ride the O(delta) path")
    except ValueError:
        pass
    r = mv.evolve({"rows2": ("count", "val"),
                   "v2last": ("last", "coalesce(val2, -1)",
                              "event_id")},
                  since_version=2, recompute=True)
    assert r["mode"] == "evolve_recompute"
    # the widened set keeps folding incrementally afterwards
    assert mv.refresh()["mode"] == "noop"
    return (mv.read()
            .select("name", F.col("n").cast("long").alias("n"),
                    F.col("rows2").cast("long").alias("rows2"),
                    "v2last")
            .orderBy("name"))


def _q_stream_matview(spark, sf_dir):
    """IVM maintenance as a REAL Structured Streaming query (r13
    verdict stretch #8, streaming/matview.stream_maintain): the commit
    log is the change feed — a file-source readStream over ``_txlog``
    with maxFilesPerTrigger=1 is a CDF subscription folding ONE commit
    per micro-batch via MatView.refresh pinned at the batch's version,
    each an atomic view publish with a monotonically advancing cursor
    (asserted mid-stream).  availableNow drains the 3-commit backlog;
    the oracle recomputes the view from the raw rows."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.streaming.matview import MatView, \
        stream_maintain

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id",
                  F.col("event_type").alias("name"),
                  F.floor(F.col("value") * 1000).alias("val")))
    root = tempfile.mkdtemp(prefix="stream_mv_")
    src = os.path.join(root, "src")
    for k in range(3):
        txlog.write(ev.filter(F.pmod("event_id", F.lit(3)) == k)
                    .drop("event_id"), src)
    mv = MatView(spark, src, os.path.join(root, "view"),
                 keys=["name"],
                 aggs={"n": ("count", "val"), "total": ("sum", "val"),
                       "lo": ("min", "val"), "hi": ("max", "val")})
    seen = []
    orig = mv.refresh

    def spy(**kw):
        r = orig(**kw)
        seen.append((mv.watcher.version, r["mode"]))
        return r

    mv.refresh = spy
    q = stream_maintain(spark, mv, os.path.join(root, "ckpt"),
                        max_commits_per_trigger=1)
    assert q.awaitTermination(300), "stream did not drain"
    assert [v for v, m in seen if m == "incremental"] == [1, 2, 3], \
        f"expected one-commit-per-batch monotone folds, got {seen}"
    return (mv.read().select("name", "n", "total", "lo", "hi")
            .orderBy("name"))


def _q_rollup_matview_firstlast(spark, sf_dir):
    """ROLLUP FIRST/LAST served from the IVM matview (r12 verdict #5;
    reference calc modes incl. FIRST/LAST:
    mods/server/http_lake.go:1738-1762, 871-877): the MatView carries
    (value-at-min/max-raw-time, raw-time-extreme) partials — a
    semigroup under min_by/max_by, so the order-aware modes fold
    O(delta) like the algebraic ones (sqlx/rollup.py MatViewRollup;
    streaming/matview.py first/last partials).  Two commits, second
    refresh asserted incremental, and the 1-minute query is pinned to
    ZERO base-table scans right here (plus tests/test_plans.py)."""
    import os
    import tempfile

    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    ev = (_tag(spark, sf_dir)
          .filter(F.col("event_id") < 4000)
          .select("name", "time", "value", "event_id"))
    # determinism guard (r13 advice): min_by/arg_min pick an ARBITRARY
    # winner on raw-timestamp ties, so the Spark/DuckDB comparison is
    # only well-defined while the fixture has no (name, ts) pair with
    # differing values — assert that, loudly, instead of hoping
    dups = (ev.groupBy("name", "time")
            .agg(F.count_distinct("value").alias("c"))
            .filter(F.col("c") > 1).count())
    assert dups == 0, \
        f"{dups} (name, ts) collisions — first/last oracle undefined"
    root = tempfile.mkdtemp(prefix="rollup_mv_fl_")
    base = os.path.join(root, "tag")
    txlog.write(ev.filter(F.col("event_id") % 2 == 0)
                .drop("event_id"), base)
    r = MatViewRollup(spark, base, os.path.join(root, "view"))
    assert r.refresh()["mode"] == "incremental"
    txlog.write(ev.filter(F.col("event_id") % 2 != 0)
                .drop("event_id"), base)
    assert r.refresh()["mode"] == "incremental", \
        "second refresh must fold only the delta commit"
    out = r.query(MINUTE, {"first_v": "first", "last_v": "last",
                           "cnt": "count"})
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert base not in plan, \
        "first/last ROLLUP must not scan the base table"
    assert os.path.join(root, "view") in plan
    return out.select(
        "name", F.expr("time div 1000").alias("time"),
        F.round("first_v", 6).alias("first_v"),
        F.round("last_v", 6).alias("last_v"),
        "cnt").orderBy("name", "time")


def _q_describe_history(spark, sf_dir):
    """DESCRIBE HISTORY with clone lineage (txlog.history; reference
    DESCRIBE paths: spi/show.go) — r12 verdict #7: the SHOW/DESCRIBE
    family's one oracle-certified entry.  A src table takes two
    appends and a DML delete; a zero-copy CLONE snapshots it and takes
    one more append.  The entry emits each surviving commit's
    operation label (clone commits carry 'CLONE of <src>@v<n>') PLUS
    the time-travel row count at that version, so the oracle derives
    every count from the raw events and pins the labels — certifying
    both the lineage metadata and the version arithmetic it points at.
    History itself is O(surviving entries), zero data reads; the
    row-count probes are the test harness, not the operator."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id", "event_type", "value"))
    root = tempfile.mkdtemp(prefix="hist_")
    src = os.path.join(root, "src")
    txlog.write(ev.filter(F.pmod("event_id", F.lit(2)) == 0)
                .coalesce(2), src)
    txlog.write(ev.filter(F.pmod("event_id", F.lit(2)) == 1)
                .coalesce(2), src)
    dml.delete(spark, src, "event_id % 5 = 0")
    cl = os.path.join(root, "clone")
    txlog.clone(src, cl)
    extra = (nio.load_table(spark, sf_dir, "events")
             .filter((F.col("event_id") >= 3000)
                     & (F.col("event_id") < 3500))
             .select("event_id", "event_type", "value"))
    txlog.write(extra.coalesce(1), cl)
    rows = []
    for tbl_name, path in (("src", src), ("clone", cl)):
        for h in txlog.history(path):
            op = h["operation"].replace(src, "SRC")
            n = txlog.read_table(
                spark, path, version_as_of=h["version"]).count()
            rows.append((tbl_name, h["version"], op,
                         bool(h["data_change"]), n))
    return (spark.createDataFrame(
        rows, "tbl string, version long, operation string, "
              "data_change boolean, n_rows long")
        .orderBy("tbl", "version"))


def _q_corpus_diff(spark, sf_dir):
    """Corpus version diff (datapipe/versioning.corpus_diff — the
    dataset-versioning audit a training pipeline runs between two
    corpus snapshots): documents land in a txlog table, then an UPDATE
    (doc_id%7==1 gets '-v2' appended), a DELETE (doc_id%11==2) and an
    INSERT (the doc_id%3==0 tranche) advance it; the diff between the
    two versions reads ONLY the file-set symmetric difference (files
    live-and-DV-identical in both snapshots are skipped wholesale —
    immutability makes them incapable of differing).  The oracle
    recomputes added/removed/modified from the raw rows."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog
    from neo_server_spark.datapipe.versioning import corpus_diff

    docs = (nio.load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 2000)
            .select("doc_id", "text"))
    t = os.path.join(tempfile.mkdtemp(prefix="corpus_diff_"), "corpus")
    txlog.write(docs.filter(F.pmod("doc_id", F.lit(3)) != 0)
                .repartitionByRange(4, "doc_id"), t,
                stats_cols=["doc_id"])
    v_from = txlog.current_version(t)
    dml.update(spark, t, "doc_id % 7 = 1", {"text": "text || '-v2'"})
    dml.delete(spark, t, "doc_id % 11 = 2")
    txlog.write(docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
                .repartitionByRange(2, "doc_id"), t,
                stats_cols=["doc_id"])
    out = corpus_diff(spark, t, v_from, txlog.current_version(t),
                      key="doc_id", digest_cols=["text"])
    return out.orderBy("doc_id", "change")


def _q_table_clone(spark, sf_dir):
    """Zero-copy table clone under the value-hash gate (txlog.clone —
    Delta CLONE semantics: hardlinked snapshot, one commit, independent
    lifecycle): events land over two stats-carrying commits, a DV
    delete tombstones rows, the table is CLONED, then the SOURCE
    mutates (delete) and vacuums — the clone must still serve the
    snapshot exactly (hardlinks keep the shared bytes alive; the
    clone's own commit carries schema/stats/DVs).  The oracle filters
    the raw rows to the snapshot the clone captured."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id", "user_id", "event_type",
                  F.floor(F.col("value") * 1000).alias("val")))
    root = tempfile.mkdtemp(prefix="table_clone_")
    s = os.path.join(root, "src")
    for k in range(2):
        txlog.write(ev.filter(F.pmod("event_id", F.lit(2)) == k)
                    .coalesce(1), s, stats_cols=["event_id"])
    dml.delete(spark, s, "event_id % 5 = 0", mode="dv")
    c = os.path.join(root, "clone")
    txlog.clone(s, c)
    # source moves on and vacuums; the clone must not notice
    dml.delete(spark, s, "event_id % 3 = 0")
    txlog.vacuum(s, retention_s=0)
    out = txlog.read_table(spark, c)
    return (out.select("event_id", "user_id", "event_type", "val")
            .orderBy("event_id"))


def _q_epoch_shuffle(spark, sf_dir):
    """Deterministic training-epoch shuffle (sampling.epoch_shuffle):
    every document ranked by md5(id || seed) — a reproducible
    pseudorandom permutation, computed as a distributed prefix count
    (never a global single-partition window).  md5 is engine-portable,
    so the oracle reproduces the exact permutation with a SQL window;
    the rank column makes the ORDER itself value-hashed."""
    docs = nio.load_table(spark, sf_dir, "documents")
    return (sampling.epoch_shuffle(docs, seed=42)
            .select("doc_id", "shuffle_rank").orderBy("doc_id"))


def _q_budget_select(spark, sf_dir):
    """Quality-first selection under a token budget
    (sampling.select_until_budget — the greedy subset cut a
    DSIR/FineWeb-style pipeline makes after scoring): take documents in
    (score DESC, id) order while the running whitespace-token total
    stays <= 20,000; the running total is a distributed prefix sum.
    The oracle is one SQL window cumsum."""
    docs = (nio.load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.col("n_chars").cast("long").alias("score"),
                    F.size(F.split("text", " ")).cast("long")
                    .alias("toks")))
    return (sampling.select_until_budget(
        docs, 20_000, score_col="score", tokens_col="toks")
        .orderBy("doc_id"))


def _q_dv_delete(spark, sf_dir):
    """Deletion-vector delete under the value-hash gate
    (dml.delete(mode='dv') — Delta's DV fast-delete shape): events land
    in a txlog table over two stats-carrying commits, two DV deletes
    tombstone (file, row-index) pairs WITHOUT rewriting any data file
    (the entry asserts the live set is byte-identical), reads anti-join
    the tombstones, and a final compaction materializes the deletes and
    retires every DV.  The oracle is the plain double filter."""
    import os
    import tempfile

    from neo_server_spark import dml, txlog

    ev = (nio.load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id", "user_id", "event_type",
                  F.floor(F.col("value") * 1000).alias("val")))
    t = os.path.join(tempfile.mkdtemp(prefix="dv_delete_"), "tbl")
    for k in range(2):
        txlog.write(ev.filter(F.pmod("event_id", F.lit(2)) == k)
                    .coalesce(1), t, stats_cols=["event_id"])
    before = set(txlog.live_files(t))
    dml.delete(spark, t, "event_id % 7 = 0", mode="dv")
    dml.delete(spark, t, "user_id % 5 = 0", mode="dv")
    assert set(txlog.live_files(t)) == before, \
        "DV deletes must not rewrite data files"
    mid = txlog.read_table(spark, t).count()
    txlog.compact(spark, t, target_files=2, stats_cols=["event_id"])
    from neo_server_spark.txlog import _replay
    assert _replay(t)[4]["dvs"] == {}, "compaction must retire DVs"
    out = txlog.read_table(spark, t)
    assert out.count() == mid
    return (out.select("event_id", "user_id", "event_type", "val")
            .orderBy("event_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Ordering is deliberate: the verification driver checks the
        # first 50 entries.  Round-15 window = the TWO new entries
        # (matview_evolve_recompute — the r14 #4 split so the O(table)
        # escape hatch never pollutes matview_evolve's O(delta) bench
        # attribution — and lake_fanout, the 64-tag single-scan parity
        # exhibit per r14 stretch #8), EIGHT entries whose code paths
        # changed this round (matview.py bootstrap publish batching +
        # _bound_until budget fix + evolve rollback safety + exact
        # commit-glob admission -> matview_evolve/matview_incr/
        # stream_matview; sqlx/rollup.py stored-layout cache + gated
        # fold -> rollup_matview{,_firstlast,_distinct}/rollup_routed;
        # txlog.latest_version + the r14 perf-delta adjudication ->
        # txlog_table), the TWENTY-EIGHT r10-vintage rows r14 directive
        # #1 queued (clearing them makes the minimum registry vintage
        # r11 with zero exceptions), and the 12 alphabetically-first
        # r11-vintage rows starting the next rotation queue.
        # Everything else rotates behind.
        "matview_evolve_recompute": _q_matview_evolve_recompute,
        "lake_fanout": _q_lake_fanout,
        "matview_evolve": _q_matview_evolve,
        "matview_incr": _q_matview_incr,
        "stream_matview": _q_stream_matview,
        "rollup_matview": _q_rollup_matview,
        "rollup_matview_firstlast": _q_rollup_matview_firstlast,
        "rollup_matview_distinct": _q_rollup_matview_distinct,
        "rollup_routed": _q_rollup_routed,
        "txlog_table": _q_txlog_table,
        "asof_join": _q_asof_join,
        "boxplot": _q_boxplot,
        "codec_csv": _q_codec_csv,
        "embedding_stats": _q_embedding_stats,
        "fft": _q_fft,
        "filter_changed": _q_filter_changed,
        "filter_changed_retain": _q_filter_changed_retain,
        "first_last": _q_first_last,
        "flatten_tokens": _q_flatten_tokens,
        "group_aggs": _q_group_aggs,
        "group_aggs2": _q_group_aggs2,
        "group_where": _q_group_where,
        "lm_score": _q_lm_score,
        "map_kalman": _q_map_kalman,
        "multimodal_audio": _q_multimodal_audio,
        "multimodal_decode": _q_multimodal_decode,
        "oscillator_fft": _q_oscillator_fft,
        "salted_join": _q_salted_join,
        "session_window": _q_session_window,
        "simhash": _q_simhash,
        "sliding_window": _q_sliding_window,
        "source_profile": _q_source_profile,
        "timewindow_spline": _q_timewindow_spline,
        "tokens_bpe": _q_tokens_bpe,
        "tpch_q12": _q_tpch_q12,
        "tpch_q19": _q_tpch_q19,
        "tpch_q9": _q_tpch_q9,
        "tql_dsl": _q_tql_dsl,
        "bridge_sql": _q_bridge_sql,
        "doc_chunks": _q_doc_chunks,
        "group_weighted": _q_group_weighted,
        "histogram": _q_histogram,
        "histogram_streaming": _q_histogram_streaming,
        "join_revenue": _q_join_revenue,
        "json_extract": _q_json_extract,
        "lang_quality": _q_lang_quality,
        "map_diff": _q_map_diff,
        "map_diff_blocked": _q_map_diff_blocked,
        "map_lowpass": _q_map_lowpass,
        "map_movavg": _q_map_movavg,
        # ---- end of driver window (50) ----
        "show_rollup_gap": _q_show_rollup_gap,
        "show_lsm": _q_show_lsm,
        "table_clone": _q_table_clone,
        "embedding_dupes_exact": _q_embedding_dupes_exact,
        "tpch_q2": _q_tpch_q2,
        "tpch_q4": _q_tpch_q4,
        "tpch_q5": _q_tpch_q5,
        "tpch_q7": _q_tpch_q7,
        "tpch_q8": _q_tpch_q8,
        "tpch_q10": _q_tpch_q10,
        "tpch_q13": _q_tpch_q13,
        "tpch_q14": _q_tpch_q14,
        "tpch_q15": _q_tpch_q15,
        "tpch_q17": _q_tpch_q17,
        "tpch_q18": _q_tpch_q18,
        "tpch_q22": _q_tpch_q22,
        "similarity_topk": _q_similarity_topk,
        "stratified_sample": _q_stratified_sample,
        "tql_script": _q_tql_script,
        "tql_script_js": _q_tql_script_js,
        "text_stats": _q_text_stats,
        "token_counts": _q_token_counts,
        "vocab_topk": _q_vocab_topk,
        "streaming_curation": _q_streaming_curation,
        "watch_latest": _q_watch_latest,
        "pack_sequences": _q_pack_sequences,
        "timer_fire": _q_timer_fire,
        "subscriber_flow": _q_subscriber_flow,
        "similarity_pq_rerank": _q_similarity_pq_rerank,
        "http_source": _q_http_source,
        "cache_hit": _q_cache_hit,
        "when_do": _q_when_do,
        "tql_args": _q_tql_args,
        "append_sink": _q_append_sink,
        "simplex_noise": _q_simplex_noise,
        "fake_gens": _q_fake_gens,
        "csv_source": _q_csv_source,
        "line_protocol": _q_line_protocol,
        "minhash_pairs": _q_minhash_pairs,
        "boilerplate_clean": _q_boilerplate_clean,
        "contamination": _q_contamination,
        "embedding_dupes": _q_embedding_dupes,
        "embedding_quantize": _q_embedding_quantize,
        "codec_box": _q_codec_box,
        "codec_html": _q_codec_html,
        "codec_markdown": _q_codec_markdown,
        "codec_ndjson": _q_codec_ndjson,
        "lake_api_raw": _q_lake_api_raw,
        "lake_api_calc": _q_lake_api_calc,
        "lm2": _q_lm2,
        "substring_spans": _q_substring_spans,
        "winnow_fp": _q_winnow_fp,
        "winnow_overlap": _q_winnow_overlap,
        "describe_history": _q_describe_history,
        "corpus_diff": _q_corpus_diff,
        "stream_scd2": _q_stream_scd2,
        "dv_delete": _q_dv_delete,
        "scd2_dimension": _q_scd2_dimension,
        "compaction": _q_compaction,
        "txlog_dml": _q_txlog_dml,
        "backup_mount": _q_backup_mount,
        "boilerplate": _q_boilerplate,
        "curation_funnel": _q_curation_funnel,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_exact": _q_dedup_exact,
        "distinct_users": _q_distinct_users,
        "doc_fingerprint": _q_doc_fingerprint,
        "group_list": _q_group_list,
        "lake_decode": _q_lake_decode,
        "lake_pivot": _q_lake_pivot,
        "lake_tochar": _q_lake_tochar,
        "lookup_join": _q_lookup_join,
        "map_distance": _q_map_distance,
        "multimodal_features": _q_multimodal_features,
        "pii_scrub": _q_pii_scrub,
        "pipeline_v2": _q_pipeline_v2,
        "query_builder": _q_query_builder,
        "repetition": _q_repetition,
        "script_udtf": _q_script_udtf,
        "semdedup": _q_semdedup,
        "set_ops": _q_set_ops,
        "shell_pipe": _q_shell_pipe,
        "similarity_batch": _q_similarity_batch,
        "similarity_ivf": _q_similarity_ivf,
        "streaming_upsert": _q_streaming_upsert,
        "epoch_shuffle": _q_epoch_shuffle,
        "budget_select": _q_budget_select,
        "auth_flow": _q_auth_flow,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q20": _q_tpch_q20,
        "tpch_q21": _q_tpch_q21,
        "simhash_pairs": _q_simhash_pairs,
        "bpe_encode": _q_bpe_encode,
        "bpe_merges": _q_bpe_merges,
        "bytes_source": _q_bytes_source,
        "c4_filters": _q_c4_filters,
        "char_entropy": _q_char_entropy,
        "codec_chart": _q_codec_chart,
        "codec_geomap": _q_codec_geomap,
        "codec_json": _q_codec_json,
        "corpus_card": _q_corpus_card,
        "data_mixture": _q_data_mixture,
        "dedup_canonical": _q_dedup_canonical,
        "dedup_incr": _q_dedup_incr,
        "domain_caps": _q_domain_caps,
        "dsir_sample": _q_dsir_sample,
        "gopher_quality": _q_gopher_quality,
        "line_dedup": _q_line_dedup,
        "lm_buckets": _q_lm_buckets,
        "mad_outliers": _q_mad_outliers,
        "mixture_plan": _q_mixture_plan,
        "multimodal_video": _q_multimodal_video,
        "quality_classifier": _q_quality_classifier,
        "readability": _q_readability,
        "series_diffs": _q_series_diffs,
        "shard_export": _q_shard_export,
        "similarity_lsh": _q_similarity_lsh,
        "similarity_pq": _q_similarity_pq,
        "string_source": _q_string_source,
        "substring_cut": _q_substring_cut,
        "text_normalize": _q_text_normalize,
        "tfidf_terms": _q_tfidf_terms,
        "url_normalize": _q_url_normalize,
        "rollup_txlog": _q_rollup_txlog,
        "tag_stat_incremental": _q_tag_stat_incremental,
        "zorder_prune": _q_zorder_prune,
        "rollup_distinct": _q_rollup_distinct,
        "similarity_ivf_batch": _q_similarity_ivf_batch,
        "streaming_rollup": _q_streaming_rollup,
        "math_funcs": _q_math_funcs,
        "mode_entropy": _q_mode_entropy,
        "ngram_pairs": _q_ngram_pairs,
        "pivot_counts": _q_pivot_counts,
        "projection_ops": _q_projection_ops,
        "range_join": _q_range_join,
        "retention": _q_retention,
        "rollup_cascade": _q_rollup_cascade,
        "rollup_hourly": _q_rollup_hourly,
        "scalar_funcs": _q_scalar_funcs,
        "scalar_funcs_tql": _q_scalar_funcs_tql,
        "show_tags": _q_show_tags,
        "stats_aggs": _q_stats_aggs,
        "streaming_dedup": _q_streaming_dedup,
        "streaming_fill": _q_streaming_fill,
        "streaming_filter_changed": _q_streaming_filter_changed,
        "streaming_lowpass": _q_streaming_lowpass,
        "tag_scan": _q_tag_scan,
        "tag_stat": _q_tag_stat,
        "take_drop": _q_take_drop,
        "time_format": _q_time_format,
        "timewindow_avg": _q_timewindow_avg,
        "topk_per_group": _q_topk_per_group,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q6": _q_tpch_q6,
        "tql_set_vars": _q_tql_set_vars,
        "transpose": _q_transpose,
        "when_throttle": _q_when_throttle,
    }


_LINED_DUCK = """
    SELECT doc_id, array_to_string(list_transform(
        generate_series(0, CAST(ceil(len(l) / 8.0) AS INT) - 1), j ->
        array_to_string(l[j*8+1:j*8+8], ' ')
        || CASE WHEN (doc_id + j) % 3 = 1 THEN '.'
                WHEN (doc_id + j) % 3 = 2 THEN '?' ELSE '' END
        || CASE WHEN j % 7 = 3 THEN ' javascript.' ELSE '' END), '|') AS text
    FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                 t -> trim(t) <> '') AS l FROM documents)
"""


def oracle_sql() -> dict[str, str]:
    f, u, p = TW_FROM, TW_UNTIL, TW_PERIOD
    return {
        "c4_filters": f"""
            WITH lined AS ({_LINED_DUCK}),
            base AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(text, '|'),
                                 l -> trim(l)), l -> l <> '') AS lines,
                     list_filter(list_transform(string_split(text, '|'),
                                 l -> trim(l)), l ->
                         l <> ''
                         AND (ends_with(l, '.') OR ends_with(l, '!')
                              OR ends_with(l, '?') OR ends_with(l, '"')
                              OR ends_with(l, ''''))
                         AND len(list_filter(string_split(l, ' '),
                                 w -> w <> '')) >= 5
                         AND NOT contains(lower(l), 'javascript')) AS kept,
                     lower(text) AS low
              FROM lined
            )
            SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
                   (CASE WHEN contains(low, 'lorem ipsum') THEN 'lorem_ipsum'
                         WHEN contains(low, '{{') THEN 'curly_brace'
                         WHEN len(kept) < 3 THEN 'too_few_lines'
                         ELSE '' END) <> '' AS doc_removed,
                   CASE WHEN contains(low, 'lorem ipsum') THEN 'lorem_ipsum'
                        WHEN contains(low, '{{') THEN 'curly_brace'
                        WHEN len(kept) < 3 THEN 'too_few_lines'
                        ELSE '' END AS reason
            FROM base ORDER BY doc_id
        """,
        "line_dedup": f"""
            WITH lined AS ({_LINED_DUCK}),
            arrs AS (
              SELECT doc_id, list_filter(list_transform(string_split(text, '|'),
                     l -> trim(l)), l -> l <> '') AS a
              FROM lined
            ),
            lines AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS pos, a[i] AS line
              FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                    FROM arrs)
            ),
            keep AS (
              SELECT doc_id, pos, line,
                     row_number() OVER (PARTITION BY line
                                        ORDER BY doc_id, pos) AS rn
              FROM lines
            )
            SELECT doc_id, string_agg(line, '|' ORDER BY pos) AS text,
                   count(*) AS n_kept
            FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
        """,
        "dsir_sample": """
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                     t -> t <> '')) AS tok FROM documents
            ),
            bt AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
              FROM tok
            ),
            raw_d AS (SELECT bucket, count(*) AS c_raw FROM bt GROUP BY bucket),
            tgt AS (
              SELECT ('0x' || substr(md5(u.tok), 1, 15))::BIGINT % 64 AS bucket
              FROM (SELECT unnest(list_filter(string_split(text, ' '),
                           t -> t <> '')) AS tok
                    FROM documents WHERE lang = 'en') u
            ),
            tgt_d AS (SELECT bucket, count(*) AS c_tgt FROM tgt GROUP BY bucket),
            grid AS (SELECT unnest(generate_series(0, 63)) AS bucket),
            counts AS (
              SELECT g.bucket, coalesce(c_raw, 0) AS c_raw,
                     coalesce(c_tgt, 0) AS c_tgt
              FROM grid g LEFT JOIN raw_d USING (bucket)
                          LEFT JOIN tgt_d USING (bucket)
            ),
            lr AS (
              SELECT bucket,
                     ln((c_tgt + 1) * 1.0 /
                        ((SELECT sum(c_tgt) FROM counts) + 64))
                     - ln((c_raw + 1) * 1.0 /
                          ((SELECT sum(c_raw) FROM counts) + 64)) AS log_ratio
              FROM counts
            ),
            pb AS (SELECT doc_id, bucket, count(*) AS c FROM bt GROUP BY 1, 2),
            w AS (
              SELECT doc_id, round(sum(c * log_ratio), 6) AS log_w,
                     CAST(sum(c) AS BIGINT) AS n_tokens
              FROM pb JOIN lr USING (bucket) GROUP BY doc_id
            )
            SELECT doc_id, log_w, n_tokens,
                   row_number() OVER (ORDER BY log_w DESC, doc_id)
                     <= ceil(0.25 * (SELECT count(*) FROM w)) AS selected
            FROM w ORDER BY doc_id
        """,
        "winnow_fp": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '),
                     t -> trim(t) <> '') AS l
              FROM documents
            ),
            g AS (
              SELECT doc_id, len(l) AS n,
                     list_transform(generate_series(1, len(l) - 4), i ->
                         ('0x' || substr(md5(array_to_string(l[i:i+4], ' ')),
                          1, 7))::BIGINT * 2097152 + (2097152 - 1 - i)) AS keys
              FROM toks WHERE len(l) >= 5
            ),
            wins AS (
              SELECT doc_id, n,
                     CASE WHEN len(keys) >= 4 THEN
                       list_distinct(list_transform(
                           generate_series(1, len(keys) - 3),
                           s -> list_min(keys[s:s+3])))
                     ELSE [list_min(keys)] END AS w
              FROM g
            ),
            dec AS (
              SELECT doc_id, n, unnest(w) // 2097152 AS fp FROM wins
            ),
            prof AS (
              SELECT doc_id, any_value(n) - 4 AS n_grams, count(*) AS n_fps,
                     count(DISTINCT fp) AS n_distinct, min(fp) AS min_fp
              FROM dec GROUP BY doc_id
            )
            SELECT doc_id, n_grams, n_fps, n_distinct,
                   round(n_fps * 1.0 / greatest(n_grams, 1), 6) AS density,
                   min_fp
            FROM prof ORDER BY doc_id
        """,
        "winnow_overlap": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '),
                     t -> trim(t) <> '') AS l
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_transform(generate_series(1, len(l) - 4), i ->
                         ('0x' || substr(md5(array_to_string(l[i:i+4], ' ')),
                          1, 7))::BIGINT * 2097152 + (2097152 - 1 - i)) AS keys
              FROM toks WHERE len(l) >= 5
            ),
            wins AS (
              SELECT doc_id,
                     CASE WHEN len(keys) >= 4 THEN
                       list_distinct(list_transform(
                           generate_series(1, len(keys) - 3),
                           s -> list_min(keys[s:s+3])))
                     ELSE [list_min(keys)] END AS w
              FROM g
            ),
            fps AS (
              SELECT DISTINCT doc_id, unnest(w) // 2097152 AS fp FROM wins
            ),
            cold AS (
              SELECT doc_id, fp FROM fps
              WHERE fp NOT IN (SELECT fp FROM fps GROUP BY fp
                               HAVING count(*) > 1000)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*) AS shared_fps
            FROM cold a JOIN cold b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY id_a, id_b
        """,
        "simhash_pairs": """
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
                  FROM t),
            v AS (
              SELECT doc_id, i.i,
                     sum(CASE WHEN (hv // (1::BIGINT << i.i)) % 2 = 1
                         THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i) i
              GROUP BY doc_id, i.i
            ),
            s AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << i)
                              ELSE 0 END) AS BIGINT) AS sig
              FROM v GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
              AND ((a.sig // 1) % 32768 = (b.sig // 1) % 32768
                OR (a.sig // 32768) % 32768 = (b.sig // 32768) % 32768
                OR (a.sig // 1073741824) % 32768
                   = (b.sig // 1073741824) % 32768
                OR (a.sig // 35184372088832) % 32768
                   = (b.sig // 35184372088832) % 32768)
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
            ORDER BY id_a, id_b
        """,
        "multimodal_video": """
            WITH a AS (SELECT unnest(generate_series(0, 5)) AS asset_id),
            f AS (
              SELECT asset_id, unnest(generate_series(0,
                     2 + CAST(asset_id % 3 AS INT))) AS frame_no
              FROM a
            )
            SELECT asset_id, frame_no,
                   CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
                   CAST(25 AS BIGINT) AS fps,
                   (SELECT CAST(sum((asset_id * 7 + frame_no * 31 + k.k)
                                    % 251) AS BIGINT)
                    FROM (SELECT unnest(generate_series(0, 255)) AS k) k)
                     AS sum_luma
            FROM f ORDER BY asset_id, frame_no
        """,
        "dedup_canonical": """
            WITH RECURSIVE sh AS (
              SELECT doc_id, lang,
                     list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 3 + 1, 1) + 1),
                       i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
              FROM documents
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(a.s || b.s)) >= 0.05
            ), e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION ALL
              SELECT id_b, id_a FROM p
            ), reach(id, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.src, r.comp FROM e JOIN reach r ON e.dst = r.id
            ), labeled AS (
              SELECT d.doc_id, d.n_chars, min(r.comp) AS cluster_id
              FROM documents d JOIN reach r ON r.id = d.doc_id
              GROUP BY d.doc_id, d.n_chars
            ), best AS (
              SELECT cluster_id, doc_id AS canonical_id FROM (
                SELECT cluster_id, doc_id,
                       row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) AS rk
                FROM labeled) WHERE rk = 1
            )
            SELECT l.doc_id, l.cluster_id, b.canonical_id,
                   l.doc_id = b.canonical_id AS keep
            FROM labeled l JOIN best b USING (cluster_id)
            ORDER BY l.doc_id
        """,
        "corpus_card": """
            SELECT count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(sum(len(list_filter(string_split(text, ' '),
                        t -> t <> ''))) AS BIGINT) AS n_tokens,
                   count(DISTINCT md5(text)) AS n_distinct,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources
            FROM documents
        """,
        "gopher_quality": """
            WITH base AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> t <> '') AS w,
                     list_filter(list_transform(string_split(text, chr(10)),
                                 l -> trim(l)), l -> l <> '') AS l
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     len(w) AS n_words,
                     round(list_sum(list_transform(w, x -> len(x))) * 1.0
                           / greatest(len(w), 1), 6) AS mean_word_len,
                     round(list_sum(list_transform(w, x -> len(x)
                           - len(replace(replace(x, '#', ''), '...', ''))))
                           * 1.0 / greatest(len(w), 1), 6) AS symbol_ratio,
                     round(len(list_filter(l, x -> x LIKE '-%' OR
                           x LIKE '*%' OR x LIKE '•%')) * 1.0
                           / greatest(len(l), 1), 6) AS bullet_frac,
                     round(len(list_filter(l, x -> x LIKE '%...')) * 1.0
                           / greatest(len(l), 1), 6) AS ellipsis_frac,
                     round(len(list_filter(w, x ->
                           regexp_matches(x, '[a-zA-Z]'))) * 1.0
                           / greatest(len(w), 1), 6) AS alpha_word_frac,
                     len(list_intersect(list_transform(w, x -> lower(x)),
                         ['the','be','to','of','and','that','have','with']))
                       AS n_stop_words
              FROM base
            )
            SELECT *,
                   n_words >= 50 AND n_words <= 100000 AS ok_words,
                   mean_word_len >= 3 AND mean_word_len <= 10 AS ok_mean_len,
                   symbol_ratio <= 0.1 AS ok_symbols,
                   bullet_frac < 0.9 AS ok_bullets,
                   ellipsis_frac < 0.3 AS ok_ellipsis,
                   alpha_word_frac >= 0.8 AS ok_alpha,
                   n_stop_words >= 2 AS ok_stops,
                   (n_words >= 50 AND n_words <= 100000)
                   AND (mean_word_len >= 3 AND mean_word_len <= 10)
                   AND symbol_ratio <= 0.1 AND bullet_frac < 0.9
                   AND ellipsis_frac < 0.3 AND alpha_word_frac >= 0.8
                   AND n_stop_words >= 2 AS keep
            FROM m ORDER BY doc_id
        """,
        "readability": """
            WITH base AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), t -> t <> '') AS w
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     greatest(len(w), 1) AS n_words,
                     greatest(len(list_filter(regexp_split_to_array(text,
                              '[.!?]+'), s -> trim(s) <> '')), 1)
                       AS n_sentences,
                     CAST(list_sum(list_transform(w, x -> greatest(1,
                         len(list_filter(string_split(regexp_replace(
                             lower(x), '[^aeiouy]+', ' ', 'g'), ' '),
                             s -> s <> '')))))
                          AS BIGINT) AS n_syllables
              FROM base
            )
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                         - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
            FROM m ORDER BY doc_id
        """,
        "streaming_curation": f"""
            WITH lined AS ({_LINED_DUCK}),
            base AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(text, '|'),
                                 l -> trim(l)), l ->
                         l <> ''
                         AND (ends_with(l, '.') OR ends_with(l, '!')
                              OR ends_with(l, '?') OR ends_with(l, '"')
                              OR ends_with(l, ''''))
                         AND len(list_filter(string_split(l, ' '),
                                 w -> w <> '')) >= 5
                         AND NOT contains(lower(l), 'javascript')) AS kept,
                     lower(text) AS low
              FROM lined
            ),
            clean AS (
              SELECT doc_id, array_to_string(kept, '|') AS text
              FROM base
              WHERE NOT contains(low, 'lorem ipsum')
                AND NOT contains(low, '{{')
                AND len(kept) >= 3
            ),
            keep AS (
              SELECT md5(text) AS d, min(doc_id) AS doc_id
              FROM clean GROUP BY 1
            )
            SELECT c.doc_id, c.text
            FROM clean c JOIN keep k
              ON md5(c.text) = k.d AND c.doc_id = k.doc_id
            ORDER BY c.doc_id
        """,
        "lm2": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '),
                     t -> t <> '') AS l
              FROM documents
            ),
            occ AS (
              SELECT doc_id, l[i] AS w1, l[i+1] AS w2
              FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM toks)
            ),
            uni AS (
              SELECT u.w AS w, count(*) AS cu
              FROM (SELECT unnest(l) AS w FROM toks) u GROUP BY 1
            ),
            tot AS (SELECT sum(cu) AS t FROM uni),
            big AS (SELECT w1, w2, count(*) AS cb FROM occ GROUP BY 1, 2)
            SELECT doc_id,
                   round(avg(ln(0.7 * cb / c1.cu + 0.3 * c2.cu / t)), 6)
                     AS lm2_score,
                   count(*) AS n_bigrams
            FROM occ JOIN big USING (w1, w2)
                 JOIN uni c1 ON c1.w = occ.w1
                 JOIN uni c2 ON c2.w = occ.w2
                 CROSS JOIN tot
            GROUP BY doc_id ORDER BY doc_id
        """,
        "char_entropy": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                     list_sort(list_distinct(string_split(text, ''))) AS dch
              FROM documents
            )
            SELECT doc_id, n AS n_chars, len(dch) AS n_distinct_chars,
                   round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(dch, ch ->
                           -(len(list_filter(string_split(text, ''),
                                             c -> c = ch))
                             / CAST(n AS DOUBLE))
                           * ln(len(list_filter(string_split(text, ''),
                                                c -> c = ch))
                                / CAST(n AS DOUBLE)))),
                       (acc, x) -> acc + x), 6) AS entropy
            FROM base ORDER BY doc_id
        """,
        "mad_outliers": """
            WITH med AS (
              SELECT source, quantile_cont(n_chars, 0.5) AS med
              FROM documents GROUP BY source
            ),
            dev AS (
              SELECT d.doc_id, d.source, d.n_chars, m.med,
                     abs(d.n_chars - m.med) AS adev
              FROM documents d JOIN med m USING (source)
            ),
            mad AS (
              SELECT source, quantile_cont(adev, 0.5) AS mad
              FROM dev GROUP BY source
            )
            SELECT doc_id, dev.source, CAST(n_chars AS DOUBLE) AS value,
                   round(dev.med, 6) AS med, round(mad.mad, 6) AS mad,
                   round(0.6745 * adev / greatest(mad.mad, 1e-12), 6) AS mod_z,
                   0.6745 * adev / greatest(mad.mad, 1e-12) > 3.0 AS outlier
            FROM dev JOIN mad USING (source) ORDER BY doc_id
        """,
        "dedup_incr": """
            WITH seen AS (
              SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 3 = 0
            ),
            newb AS (
              SELECT doc_id, source, n_chars, md5(text) AS d
              FROM documents WHERE doc_id % 3 <> 0
            ),
            fresh AS (
              SELECT * FROM newb WHERE d NOT IN (SELECT d FROM seen)
            ),
            keep AS (SELECT d, min(doc_id) AS doc_id FROM fresh GROUP BY d)
            SELECT f.doc_id, f.source, f.n_chars
            FROM fresh f JOIN keep k ON f.d = k.d AND f.doc_id = k.doc_id
            ORDER BY f.doc_id
        """,
        "tfidf_terms": """
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                     t -> t <> '')) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            s AS (
              SELECT doc_id, term, tf, df,
                     round(tf * (ln((n + 1) * 1.0 / (df + 1)) + 1), 6) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY tfidf DESC, term) AS rank
              FROM s
            )
            SELECT doc_id, rank, term, tf, tfidf FROM r WHERE rank <= 3
            ORDER BY doc_id, rank
        """,
        "tql_set_vars": """
            SELECT event_id, event_type, round(value * 2 + 1, 6) AS v2p
            FROM events
        """,
        "simplex_noise": """
            SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y,
                   CAST(v AS DOUBLE) AS v FROM (VALUES
              (0.0e0, 0.0e0, 0.0e0),
              (0.0e0, 1.1111111111111112e0, 2.844148e0),
              (0.0e0, 2.2222222222222223e0, 2.944842e0),
              (0.0e0, 3.3333333333333335e0, 5.016112e0),
              (0.0e0, 4.444444444444445e0, 4.123739e0),
              (0.0e0, 5.555555555555555e0, 4.690863e0),
              (0.0e0, 6.666666666666667e0, 3.36291e0),
              (0.0e0, 7.777777777777779e0, 1.13989e0),
              (0.0e0, 8.88888888888889e0, 0.152624e0),
              (0.0e0, 10.0e0, 1.515982e0),
              (1.1111111111111112e0, 0.0e0, 3.085908e0),
              (1.1111111111111112e0, 1.1111111111111112e0, 2.108969e0),
              (1.1111111111111112e0, 2.2222222222222223e0, 0.509348e0),
              (1.1111111111111112e0, 3.3333333333333335e0, 3.944786e0),
              (1.1111111111111112e0, 4.444444444444445e0, 1.582072e0),
              (1.1111111111111112e0, 5.555555555555555e0, 3.04488e0),
              (1.1111111111111112e0, 6.666666666666667e0, 6.483385e0),
              (1.1111111111111112e0, 7.777777777777779e0, 4.447147e0),
              (1.1111111111111112e0, 8.88888888888889e0, 3.81773e0),
              (1.1111111111111112e0, 10.0e0, 2.212878e0),
              (2.2222222222222223e0, 0.0e0, 3.04023e0),
              (2.2222222222222223e0, 1.1111111111111112e0, 5.594955e0),
              (2.2222222222222223e0, 2.2222222222222223e0, 3.891435e0),
              (2.2222222222222223e0, 3.3333333333333335e0, 2.973115e0),
              (2.2222222222222223e0, 4.444444444444445e0, 1.922085e0),
              (2.2222222222222223e0, 5.555555555555555e0, 5.71068e0),
              (2.2222222222222223e0, 6.666666666666667e0, 5.26592e0),
              (2.2222222222222223e0, 7.777777777777779e0, 1.343823e0),
              (2.2222222222222223e0, 8.88888888888889e0, 5.733952e0),
              (2.2222222222222223e0, 10.0e0, 3.704195e0),
              (3.3333333333333335e0, 0.0e0, 4.237807e0),
              (3.3333333333333335e0, 1.1111111111111112e0, 5.032603e0),
              (3.3333333333333335e0, 2.2222222222222223e0, 2.474983e0),
              (3.3333333333333335e0, 3.3333333333333335e0, 1.246472e0),
              (3.3333333333333335e0, 4.444444444444445e0, 2.556287e0),
              (3.3333333333333335e0, 5.555555555555555e0, 3.6036e0),
              (3.3333333333333335e0, 6.666666666666667e0, 1.043281e0),
              (3.3333333333333335e0, 7.777777777777779e0, 0.985204e0),
              (3.3333333333333335e0, 8.88888888888889e0, 0.856938e0),
              (3.3333333333333335e0, 10.0e0, 2.343707e0),
              (4.444444444444445e0, 0.0e0, 4.557945e0),
              (4.444444444444445e0, 1.1111111111111112e0, 4.76384e0),
              (4.444444444444445e0, 2.2222222222222223e0, 1.260366e0),
              (4.444444444444445e0, 3.3333333333333335e0, 3.04731e0),
              (4.444444444444445e0, 4.444444444444445e0, 0.274697e0),
              (4.444444444444445e0, 5.555555555555555e0, 2.911628e0),
              (4.444444444444445e0, 6.666666666666667e0, 5.772146e0),
              (4.444444444444445e0, 7.777777777777779e0, 2.494278e0),
              (4.444444444444445e0, 8.88888888888889e0, 3.669496e0),
              (4.444444444444445e0, 10.0e0, 3.07372e0),
              (5.555555555555555e0, 0.0e0, 3.239957e0),
              (5.555555555555555e0, 1.1111111111111112e0, 5.111701e0),
              (5.555555555555555e0, 2.2222222222222223e0, 2.500173e0),
              (5.555555555555555e0, 3.3333333333333335e0, 4.119462e0),
              (5.555555555555555e0, 4.444444444444445e0, 3.576903e0),
              (5.555555555555555e0, 5.555555555555555e0, 2.909416e0),
              (5.555555555555555e0, 6.666666666666667e0, 0.806519e0),
              (5.555555555555555e0, 7.777777777777779e0, 3.268613e0),
              (5.555555555555555e0, 8.88888888888889e0, 7.005408e0),
              (5.555555555555555e0, 10.0e0, 5.009555e0),
              (6.666666666666667e0, 0.0e0, 0.254461e0),
              (6.666666666666667e0, 1.1111111111111112e0, 5.900421e0),
              (6.666666666666667e0, 2.2222222222222223e0, 6.642096e0),
              (6.666666666666667e0, 3.3333333333333335e0, 2.755193e0),
              (6.666666666666667e0, 4.444444444444445e0, 2.158826e0),
              (6.666666666666667e0, 5.555555555555555e0, 0.811417e0),
              (6.666666666666667e0, 6.666666666666667e0, 2.803303e0),
              (6.666666666666667e0, 7.777777777777779e0, 7.800004e0),
              (6.666666666666667e0, 8.88888888888889e0, 1.173348e0),
              (6.666666666666667e0, 10.0e0, 4.82008e0),
              (7.777777777777779e0, 0.0e0, 6.848036e0),
              (7.777777777777779e0, 1.1111111111111112e0, 3.880075e0),
              (7.777777777777779e0, 2.2222222222222223e0, 4.837215e0),
              (7.777777777777779e0, 3.3333333333333335e0, 0.015493e0),
              (7.777777777777779e0, 4.444444444444445e0, 2.544435e0),
              (7.777777777777779e0, 5.555555555555555e0, 0.618988e0),
              (7.777777777777779e0, 6.666666666666667e0, 1.541166e0),
              (7.777777777777779e0, 7.777777777777779e0, 0.174137e0),
              (7.777777777777779e0, 8.88888888888889e0, 2.103712e0),
              (7.777777777777779e0, 10.0e0, 4.493135e0),
              (8.88888888888889e0, 0.0e0, 2.00674e0),
              (8.88888888888889e0, 1.1111111111111112e0, 3.494378e0),
              (8.88888888888889e0, 2.2222222222222223e0, 0.661377e0),
              (8.88888888888889e0, 3.3333333333333335e0, 3.103895e0),
              (8.88888888888889e0, 4.444444444444445e0, 3.272465e0),
              (8.88888888888889e0, 5.555555555555555e0, 1.120021e0),
              (8.88888888888889e0, 6.666666666666667e0, 5.571573e0),
              (8.88888888888889e0, 7.777777777777779e0, 5.443599e0),
              (8.88888888888889e0, 8.88888888888889e0, 2.242505e0),
              (8.88888888888889e0, 10.0e0, 2.091566e0),
              (10.0e0, 0.0e0, 1.580519e0),
              (10.0e0, 1.1111111111111112e0, 0.09125e0),
              (10.0e0, 2.2222222222222223e0, 3.187042e0),
              (10.0e0, 3.3333333333333335e0, 1.401484e0),
              (10.0e0, 4.444444444444445e0, 1.313117e0),
              (10.0e0, 5.555555555555555e0, 4.07378e0),
              (10.0e0, 6.666666666666667e0, 4.041872e0),
              (10.0e0, 7.777777777777779e0, 4.253867e0),
              (10.0e0, 8.88888888888889e0, 1.326133e0),
              (10.0e0, 10.0e0, 3.98433e0)
            ) AS t(x, y, v)
        """,
        "when_throttle": """
            SELECT event_id, event_type, round(value, 6) AS value
            FROM events
        """,
        "tag_scan": f"""
            SELECT event_type AS name, epoch_us(ts) AS time, value, event_id
            FROM events
            WHERE event_type = 'purchase' AND epoch_ns(ts) BETWEEN {f} AND {u}
            ORDER BY time, event_id LIMIT 500
        """,
        "timewindow_avg": f"""
            WITH raw AS (
              SELECT event_type AS name, epoch_ns(ts) AS t, value FROM events
              WHERE epoch_ns(ts) >= {f} AND epoch_ns(ts) < {u}
            ), ag AS (
              SELECT name, {f} + ((t - {f}) // {p}) * {p} AS time,
                     count(value) AS cnt, round(avg(value), 6) AS avg_value,
                     min(value) AS min_value, max(value) AS max_value
              FROM raw GROUP BY 1, 2
            ), grid AS (
              SELECT n.name, g.range AS time
              FROM (SELECT DISTINCT name FROM raw) n
              CROSS JOIN range({f}, {u}, {p}) g
            )
            SELECT grid.name, grid.time, ag.cnt, ag.avg_value, ag.min_value, ag.max_value
            FROM grid LEFT JOIN ag ON grid.name = ag.name AND grid.time = ag.time
            ORDER BY grid.name, grid.time
        """,
        "group_aggs": """
            SELECT event_type AS name,
                   count(value) AS cnt,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   round(sqrt(sum(value*value)), 6) AS rss_value,
                   round(sqrt(avg(value*value)), 6) AS rms_value,
                   round(stddev_samp(value), 6) AS stddev_value,
                   round(var_samp(value), 6) AS var_value,
                   round(stddev_samp(value)/sqrt(count(value)), 6) AS stderr_value,
                   round(quantile_cont(value, 0.5), 6) AS median_value,
                   round(quantile_cont(value, 0.95), 6) AS p95_value
            FROM events GROUP BY 1 ORDER BY name
        """,
        "group_where": """
            SELECT event_type AS name,
                   count(value) AS cnt_all,
                   count(value) FILTER (value > 100) AS cnt_high,
                   round(sum(value) FILTER (value > 100), 6) AS sum_high
            FROM events GROUP BY 1 ORDER BY name
        """,
        "first_last": """
            SELECT event_type AS name,
                   arg_min(value, epoch_ns(ts)) AS first_value,
                   arg_max(value, epoch_ns(ts)) AS last_value,
                   min(epoch_us(ts)) AS min_time,
                   max(epoch_us(ts)) AS max_time
            FROM events GROUP BY 1
            ORDER BY name
        """,
        "tag_stat": """
            SELECT event_type AS name, count(*) AS row_count,
                   min(epoch_us(ts)) AS min_time, max(epoch_us(ts)) AS max_time
            FROM events GROUP BY 1
            ORDER BY name
        """,
        "filter_changed": """
            WITH w AS (
              SELECT user_id, epoch_us(ts) AS time, event_type, event_id,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT user_id, time, event_type, event_id FROM w
            WHERE rn = 1 OR prev IS DISTINCT FROM event_type
            ORDER BY event_id
        """,
        "map_diff": """
            SELECT event_type AS name, epoch_us(ts) AS time, value,
                   value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS diff
            FROM events
            ORDER BY name, time, value
        """,
        "map_diff_blocked": """
            SELECT event_type AS name, epoch_us(ts) AS time, value,
                   value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS diff
            FROM events
            ORDER BY name, time, value
        """,
        "map_movavg": """
            WITH w AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value,
                     avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
                     sum(CAST(round(value * 100) AS BIGINT))
                         OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
              FROM events
            )
            SELECT name, time, value,
                   round(CASE WHEN rn >= 5 THEN ma END, 6) AS movavg,
                   CAST(cum_cents AS DOUBLE) / (rn * 100.0) AS cumavg
            FROM w
            ORDER BY name, time, value
        """,
        "take_drop": f"""
            SELECT event_type AS name, epoch_us(ts) AS time, value, event_id
            FROM events ORDER BY epoch_ns(ts), event_id LIMIT 200 OFFSET 100
        """,
        "transpose": """
            SELECT event_id, 'value' AS col_name, value FROM events
            UNION ALL
            SELECT event_id, 'user_id' AS col_name, CAST(user_id AS DOUBLE) FROM events
            ORDER BY event_id, col_name
        """,
        "pivot_counts": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'error') AS error,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup') AS signup,
                   count(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY user_id
        """,
        # histogram_streaming: the reference's sequential Add+trim loop
        # (mods/nums/histogram.go:49-90) as a recursive CTE — per tag, one
        # recursion step per inserted value: a (v,1) bin goes before the
        # first strictly-greater bin (k = #elements <= v), then the FIRST
        # minimal adjacent gap merges into its weighted centroid whenever
        # the bin count exceeds 12.  Same IEEE op order as the Spark side,
        # so centroids match bit-for-bit.
        "histogram_streaming": """
            WITH RECURSIVE
            src AS (
              SELECT event_type AS name,
                     list(value ORDER BY ts, event_id) AS vs,
                     count(*) AS n
              FROM events WHERE event_id < 4000 GROUP BY 1
            ),
            st AS (
              SELECT name, 0 AS i,
                     CAST([] AS DOUBLE[]) AS xs, CAST([] AS DOUBLE[]) AS ys
              FROM src
              UNION ALL
              SELECT st.name, i + 1, t2.xs2, t2.ys2
              FROM st, src,
              LATERAL (SELECT vs[i+1] AS v) tv,
              LATERAL (SELECT len(list_filter(xs, e -> e <= tv.v)) AS k) tk,
              LATERAL (SELECT
                  list_concat(list_concat(xs[1:tk.k], [tv.v]),
                              xs[tk.k+1:len(xs)]) AS xs1,
                  list_concat(list_concat(ys[1:tk.k], [CAST(1 AS DOUBLE)]),
                              ys[tk.k+1:len(ys)]) AS ys1) t1,
              LATERAL (SELECT CASE WHEN len(t1.xs1) <= 12 THEN NULL
                              ELSE list_position(ds, list_min(ds)) END AS p
                       FROM (SELECT list_transform(
                                 generate_series(2, len(t1.xs1)),
                                 j -> t1.xs1[j] - t1.xs1[j-1]) AS ds)) tp,
              LATERAL (SELECT
                  CASE WHEN tp.p IS NULL THEN t1.xs1
                       ELSE list_concat(list_concat(t1.xs1[1:tp.p-1],
                            [(t1.xs1[tp.p+1]*t1.ys1[tp.p+1]
                              + t1.xs1[tp.p]*t1.ys1[tp.p])
                             / (t1.ys1[tp.p+1] + t1.ys1[tp.p])]),
                            t1.xs1[tp.p+2:len(t1.xs1)]) END AS xs2,
                  CASE WHEN tp.p IS NULL THEN t1.ys1
                       ELSE list_concat(list_concat(t1.ys1[1:tp.p-1],
                            [t1.ys1[tp.p+1] + t1.ys1[tp.p]]),
                            t1.ys1[tp.p+2:len(t1.ys1)]) END AS ys2) t2
              WHERE st.name = src.name AND i < src.n
            )
            SELECT st.name, b, xs[b] AS x, ys[b] AS y
            FROM st, src, (SELECT unnest(generate_series(1, 12)) AS b)
            WHERE st.name = src.name AND st.i = src.n AND b <= len(xs)
            ORDER BY st.name, b
        """,
        "histogram": """
            WITH binned AS (
              SELECT CASE WHEN idx < 0 THEN 0
                          WHEN idx > 11 THEN 11 ELSE idx END AS bin,
                     event_type
              FROM (SELECT CAST(trunc(value / 20.0) AS INT) + 1 AS idx,
                           event_type FROM events)
            ), grid AS (SELECT g.range AS bin FROM range(0, 12) g),
            j AS (
              SELECT grid.bin,
                     CASE WHEN grid.bin = 0 THEN CAST('-Infinity' AS DOUBLE)
                          ELSE (grid.bin - 1) * 20.0 END AS low,
                     CASE WHEN grid.bin = 11 THEN CAST('Infinity' AS DOUBLE)
                          ELSE grid.bin * 20.0 END AS high,
                     coalesce(count(*) FILTER (event_type = 'click'), 0) AS click,
                     coalesce(count(*) FILTER (event_type = 'error'), 0) AS error,
                     coalesce(count(*) FILTER (event_type = 'purchase'), 0) AS purchase,
                     coalesce(count(*) FILTER (event_type = 'signup'), 0) AS signup,
                     coalesce(count(*) FILTER (event_type = 'view'), 0) AS view
              FROM grid LEFT JOIN binned ON grid.bin = binned.bin
              GROUP BY 1, 2, 3
            )
            SELECT low, high, click, error, purchase, signup, view
            FROM j
            WHERE NOT (bin IN (0, 11)
                       AND click + error + purchase + signup + view = 0)
            ORDER BY low
        """,
        "boxplot": """
            WITH s AS (
              SELECT event_type AS category,
                     min(value) AS vmin, max(value) AS vmax,
                     quantile_cont(value, 0.25) AS q1,
                     quantile_cont(value, 0.5) AS med,
                     quantile_cont(value, 0.75) AS q3
              FROM events GROUP BY 1
            ), s2 AS (
              SELECT category, vmin, vmax, q1, med, q3,
                     greatest(vmin, q1 - 1.5*(q3-q1)) AS lw,
                     least(vmax, q3 + 1.5*(q3-q1)) AS uw
              FROM s
            )
            SELECT s2.category,
                   round(vmin, 6) AS min, round(lw, 6) AS lower_whisker,
                   round(q1, 6) AS q1, round(med, 6) AS median, round(q3, 6) AS q3,
                   round(uw, 6) AS upper_whisker, round(vmax, 6) AS max,
                   (SELECT count(*) FROM events e
                    WHERE e.event_type = s2.category AND (e.value < s2.lw OR e.value > s2.uw)) AS outlier_count
            FROM s2 ORDER BY category
        """,
        "rollup_hourly": f"""
            SELECT event_type AS name,
                   (epoch_ns(ts) // {p}) * {p} AS time,
                   count(value) AS cnt,
                   round(avg(value), 6) AS avg_value,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
            ORDER BY name, time
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_revenue": """
            SELECT n_name,
                   round(sum(o_totalprice), 4) AS revenue,
                   count(*) AS order_cnt
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY n_name
        """,
        "tpch_q3": """
            SELECT l.l_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < DATE '1995-03-15'
              AND l.l_shipdate > DATE '1995-03-15'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue DESC, l.l_orderkey LIMIT 10
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
              AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
        """,
        "group_aggs2": """
            WITH t AS (
              SELECT event_type AS name, epoch_us(ts) / 1e6 AS tsec, value FROM events
            )
            SELECT name,
                   round(corr(tsec, value), 6) AS corr_tv,
                   round(covar_samp(tsec, value), 6) AS covar_tv,
                   round(regr_slope(value, tsec), 6) AS lrs_tv,
                   round(var_pop(value), 6) AS moment2,
                   round(avg(CASE WHEN value <= 100.0 THEN 1.0 ELSE 0.0 END), 6) AS cdf_100,
                   quantile_disc(value, 0.9) AS p90_disc,
                   quantile_disc(value, 0.5) AS median_disc
            FROM t GROUP BY name
            ORDER BY name
        """,
        "mode_entropy": """
            WITH b AS (
              SELECT event_type AS name, CAST(floor(value/10) AS BIGINT) AS vbin, user_id FROM events
            ), mc AS (
              SELECT name, vbin, count(*) AS n FROM b GROUP BY 1, 2
            ), m AS (
              SELECT name, vbin AS mode_vbin,
                     row_number() OVER (PARTITION BY name ORDER BY n DESC, vbin ASC) AS rk
              FROM mc
            ), uc AS (
              SELECT name, user_id, count(*) AS n FROM b GROUP BY 1, 2
            ), e AS (
              SELECT name, ln(sum(n)) - sum(n * ln(n)) / sum(n) AS h FROM uc GROUP BY name
            )
            SELECT m.name, m.mode_vbin, round(e.h, 6) AS entropy_user
            FROM m JOIN e ON m.name = e.name WHERE m.rk = 1
            ORDER BY m.name
        """,
        "json_extract": """
            SELECT event_id, regexp_extract(props, '"k":\\s*(\\d+)', 1)::INT AS k
            FROM events
        """,
        "topk_per_group": """
            WITH w AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value, event_id,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rk
              FROM events
            )
            SELECT name, time, value, event_id, rk FROM w WHERE rk <= 3
            ORDER BY name, rk
        """,
        "asof_join": """
            SELECT l.user_id, epoch_us(l.ts) AS time, l.event_id, l.value,
                   r.value AS click_value
            FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
            ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY event_id
        """,
        "flatten_tokens": """
            SELECT doc_id,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id < 100
        """,
        "lang_quality": """
            WITH scored AS (
              SELECT doc_id,
                     list_distinct(string_split(text, ' ')) AS toks,
                     len(string_split(text, ' ')) * 1.0 AS n_tok,
                     length(text) * 1.0 AS n_chars,
                     length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) * 1.0 AS punct
              FROM documents
            ), s2 AS (
              SELECT doc_id, n_tok, n_chars, punct,
                     len(list_distinct(toks)) * 1.0 AS n_uniq,
              len(list_intersect(toks, ['the','and','of','to','in'])) AS s_en,
              len(list_intersect(toks, ['der','die','und','nicht','das'])) AS s_de,
              len(list_intersect(toks, ['le','la','et','les','des'])) AS s_fr,
              len(list_intersect(toks, ['el','la','que','de','los'])) AS s_es,
              len(list_intersect(toks, ['de5','shi4','le5','zai4','he2'])) AS s_zh
              FROM scored
            )
            SELECT doc_id,
                   CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END AS lang_pred,
                   CASE WHEN (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END) = 'zh' THEN s_zh WHEN (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END) = 'fr' THEN s_fr WHEN (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END) = 'es' THEN s_es WHEN (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END) = 'en' THEN s_en WHEN (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh' WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es' WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en' WHEN s_de >= s_zh AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de' END) = 'de' THEN s_de END AS lang_score,
                   round( (n_uniq / n_tok) * 0.4
                        + least(n_tok / 50.0, 1.0) * 0.4
                        + (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality
            FROM s2
        """,
        "ngram_pairs": """
            WITH sh AS (
              SELECT doc_id, lang,
                     list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 3 + 1, 1) + 1),
                       i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(a.s || b.s)), 6) AS jaccard
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(a.s || b.s)) >= 0.05
            ORDER BY id_a, id_b
        """,
        "map_lowpass": """
            WITH w AS (
              SELECT event_type AS name, ts, event_id, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT a.name, epoch_us(a.ts) AS time, a.value,
                   round(sum(CASE WHEN b.rn = 1 THEN power(0.8, a.rn - 1) * b.value
                                  ELSE 0.2 * power(0.8, a.rn - b.rn) * b.value END), 6) AS lowpass
            FROM w a JOIN w b ON a.name = b.name AND b.rn <= a.rn
            GROUP BY a.name, a.ts, a.value, a.rn
            ORDER BY a.name, time, a.value
        """,
        "filter_changed_retain": """
            WITH w AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
              FROM events
            ), r AS (
              SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
              FROM w
            ), runs AS (
              SELECT *,
                     row_number() OVER (PARTITION BY user_id, rid ORDER BY ts, event_id) AS rn,
                     min(epoch_ns(ts)) OVER (PARTITION BY user_id, rid) AS rstart
              FROM r
            ), held AS (
              SELECT *,
                     min(CASE WHEN epoch_ns(ts) - rstart >= 600000000000 THEN rn END)
                         OVER (PARTITION BY user_id, rid) AS fh
              FROM runs
            )
            SELECT user_id, epoch_us(ts) AS time, event_type, event_id
            FROM held WHERE rn = fh
            ORDER BY event_id
        """,
        "projection_ops": """
            SELECT event_id, user_id % 100 AS userbucket,
                   round(value * 2, 6) AS value2
            FROM events
        """,
        "scalar_funcs": """
            SELECT event_id,
                   upper(event_type) AS upper_type,
                   substring(event_type, 2, 3) AS sub_type,
                   CASE WHEN strpos(event_type, 'e') = 0 THEN -1
                        ELSE strpos(event_type, 'e') - 1 END AS idx_e,
                   printf('%s#%d', event_type, user_id) AS tag_label,
                   starts_with(event_type, 'p') AS is_p,
                   strftime(ts AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M') AS ts_str,
                   year(ts) AS yr,
                   hour(ts) AS hr,
                   dayofweek(ts) AS wd,
                   epoch_us(ts) AS t_us,
                   (epoch_ns(ts) - epoch_ns(ts) % 300000000000) // 1000 AS t5m_us
            FROM events
        """,
        "math_funcs": """
            SELECT event_id,
                   round(power(2.0, value - 8.0 * CAST(trunc(value / 8.0) AS DOUBLE)), 6) AS e2,
                   power(10.0, event_id % 3) AS p10,
                   CAST(trunc(value - 256.0) AS DOUBLE) AS tr,
                   value - 2.0 * CAST(trunc(value / 2.0) AS DOUBLE) AS md,
                   value - 2.0 * round_even(value / 2.0, 0) AS rem,
                   least(value, 100.0) AS mn,
                   greatest(value, 100.0) AS mx
            FROM events
        """,
        "range_join": """
            SELECT event_id, value, bucket
            FROM events LEFT JOIN (
                SELECT i * 100.0 AS low, (i + 1) * 100.0 AS high,
                       'b' || CAST(i AS VARCHAR) AS bucket
                FROM generate_series(0, 9) t(i)
            ) r ON value >= low AND value < high
            ORDER BY event_id
        """,
        "time_format": """
            SELECT event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS f_datetime,
                   strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS f_rfc3339,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS f_ms
            FROM events
        """,
        "fake_gens": """
            SELECT CAST(xi AS DOUBLE) * 0.5 AS x, CAST(yi AS DOUBLE) * 1.0 AS y,
                   (CAST(xi AS DOUBLE) * 0.5) * (CAST(xi AS DOUBLE) * 0.5)
                     + CAST(yi AS DOUBLE) * 1.0 AS z
            FROM generate_series(0, 20) tx(xi), generate_series(0, 2) ty(yi)
            ORDER BY x, y
        """,
        "csv_source": """
            SELECT id, tag, CAST(val AS DOUBLE) AS val
            FROM (VALUES (1, 'temp.a', 3.14), (2, 'temp.b', 2.71),
                         (3, 'hum.a', 55.5)) AS t(id, tag, val)
        """,
        "show_tags": """
            SELECT event_type AS name, count(*) AS row_count,
                   min(epoch_us(ts)) AS min_time, max(epoch_us(ts)) AS max_time,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY event_type
            ORDER BY name
        """,
        "lookup_join": """
            SELECT e.event_type AS name, l.tier AS tier,
                   count(*) AS cnt, round(sum(e.value), 6) AS sum_value
            FROM events e
            JOIN (VALUES ('purchase', 'gold'), ('click', 'silver'),
                         ('error', 'bronze'), ('signup', 'silver'),
                         ('refund', 'none')) l(name, tier)
              ON e.event_type = l.name
            GROUP BY 1, 2 ORDER BY 1
        """,
        "embedding_dupes_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35
            ORDER BY id_a, id_b
        """,
        "embedding_dupes": """
            WITH hp AS (
              SELECT p.p, j.j,
                     CASE WHEN ('0x' || substr(md5(p.p::VARCHAR || '|' || j.j::VARCHAR), 1, 15))::BIGINT
                               % 2 = 0
                          THEN 1.0 ELSE -1.0 END AS h
              FROM (SELECT unnest(generate_series(0, 35)) AS p) p,
                   (SELECT unnest(generate_series(0, 63)) AS j) j
            ), dots AS (
              SELECT e.vec_id, hp.p, sum(CAST(e.embedding[hp.j + 1] AS DOUBLE) * hp.h) AS d
              FROM embeddings e, hp GROUP BY 1, 2
            ), bk AS (
              SELECT vec_id, p // 3 AS band,
                     CAST(sum(CASE WHEN d > 0 THEN 1 << (p % 3) ELSE 0 END) AS BIGINT) AS bucket
              FROM dots GROUP BY 1, 2
            ), cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM bk a JOIN bk b
                ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT c.id_a, c.id_b,
                   round(list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))), 6)
                       AS cosine
            FROM cand c JOIN embeddings x ON x.vec_id = c.id_a
                        JOIN embeddings y ON y.vec_id = c.id_b
            WHERE list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))) >= 0.35
            ORDER BY id_a, id_b
        """,
        "simhash": """
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
            h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM t),
            v AS (
              SELECT doc_id, i.i,
                     sum(CASE WHEN (hv // (1::BIGINT << i.i)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i) i
              GROUP BY doc_id, i.i
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
            FROM v GROUP BY doc_id ORDER BY doc_id
        """,
        "minhash_pairs": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), shl AS (
              SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(l) - 3, 0)),
                  i -> array_to_string(l[i+1:i+3], ' '))) AS sh
              FROM toks
            ), shx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT % 2147483647 AS m
              FROM shl
            ), hs AS (
              SELECT doc_id, t.i,
                     min(((t.i + 1) * 2654435761 % 2147483647 * m
                          + (t.i + 1) * 2654445111 % 2147483647) % 2147483647) AS h
              FROM shx CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) t
              GROUP BY doc_id, t.i
            ), sig AS (
              SELECT doc_id, list(h ORDER BY i) AS g FROM hs GROUP BY doc_id
            ), cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              WHERE len(list_filter(generate_series(0, 15),
                        bb -> a.g[bb*4+1:bb*4+4] = b.g[bb*4+1:bb*4+4])) > 0
            ), shd AS (
              -- the engine verifies on distinct md5 shingle DIGESTS (the
              -- 8-byte tokens its bucket kernel intersects, so text never
              -- shuffles); replay the identical digest sets
              SELECT doc_id, list_distinct(list_transform(sh,
                  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS sh
              FROM shl
            )
            SELECT c.id_a, c.id_b,
                   round(len(list_intersect(x.sh, y.sh)) * 1.0
                         / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
            FROM cand c JOIN shd x ON x.doc_id = c.id_a JOIN shd y ON y.doc_id = c.id_b
            WHERE len(list_intersect(x.sh, y.sh)) * 1.0
                  / len(list_distinct(x.sh || y.sh)) >= 0.05
            ORDER BY id_a, id_b
        """,
        "timewindow_spline": f"""
            WITH ag AS (
              SELECT event_type AS name,
                     epoch_ns(ts) - epoch_ns(ts) % {p} AS b, avg(value) AS v
              FROM events
              WHERE epoch_ns(ts) - epoch_ns(ts) % {p} >= {f}
                AND epoch_ns(ts) - epoch_ns(ts) % {p} < {u}
              GROUP BY 1, 2
            ), grid AS (
              SELECT n.name, g.range AS b
              FROM (SELECT DISTINCT name FROM ag) n CROSS JOIN range({f}, {u}, {p}) g
            ), j AS (
              SELECT grid.name, grid.b, ag.v FROM grid LEFT JOIN ag USING (name, b)
            ), knots AS (
              SELECT name, b, v, row_number() OVER (PARTITION BY name ORDER BY b) - 1 AS i,
                     count(*) OVER (PARTITION BY name) AS nk
              FROM j WHERE v IS NOT NULL
            ), slopes AS (
              SELECT *,
                     (lead(v) OVER w - v) / (CAST(lead(b) OVER w AS DOUBLE) - CAST(b AS DOUBLE)) AS m
              FROM knots WINDOW w AS (PARTITION BY name ORDER BY i)
            ), bnd AS (
              SELECT *,
                     first_value(m) OVER wo AS fm0,
                     nth_value(m, 2) OVER wo AS fm1,
                     nth_value(m, CAST(nk - 1 AS INTEGER)) OVER wo AS lm,
                     nth_value(m, CAST(nk - 2 AS INTEGER)) OVER wo AS lp
              FROM slopes
              WINDOW wo AS (PARTITION BY name ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ), ext AS (
              SELECT *,
                     coalesce(lag(m, 2) OVER w, 2 * fm0 - fm1) AS m1,
                     coalesce(lag(m, 1) OVER w, 2 * fm0 - fm1) AS m2,
                     coalesce(m,             2 * lm - lp) AS m3,
                     coalesce(lead(m, 1) OVER w, 2 * lm - lp) AS m4
              FROM bnd WINDOW w AS (PARTITION BY name ORDER BY i)
            ), drv AS (
              SELECT name, b, v, i, nk,
                     CASE WHEN abs(m4 - m3) + abs(m2 - m1) = 0 THEN 0.5 * (m2 + m3)
                          ELSE (abs(m4 - m3) * m2 + abs(m2 - m1) * m3)
                               / (abs(m4 - m3) + abs(m2 - m1)) END AS d
              FROM ext
            ), gaps AS (
              SELECT j.name, j.b FROM j WHERE j.v IS NULL
            ), lo AS (
              SELECT g.name, g.b, k.b AS x0, k.v AS y0, k.d AS d0, k.i AS i0, k.nk
              FROM gaps g ASOF JOIN drv k ON g.name = k.name AND g.b >= k.b
            ), filled AS (
              SELECT lo.name, lo.b,
                     CASE WHEN lo.nk < 3 OR k1.b IS NULL THEN NULL ELSE
                       (1 + 2 * t) * (1 - t) * (1 - t) * lo.y0
                       + t * (1 - t) * (1 - t) * h * lo.d0
                       + t * t * (3 - 2 * t) * k1.v
                       + t * t * (t - 1) * h * k1.d
                     END AS v
              FROM lo LEFT JOIN drv k1 ON k1.name = lo.name AND k1.i = lo.i0 + 1,
              LATERAL (SELECT CAST(k1.b AS DOUBLE) - CAST(lo.x0 AS DOUBLE) AS h,
                              (CAST(lo.b AS DOUBLE) - CAST(lo.x0 AS DOUBLE))
                              / (CAST(k1.b AS DOUBLE) - CAST(lo.x0 AS DOUBLE)) AS t) lat
            )
            SELECT name, b AS time, round(v, 6) AS avg_value FROM knots
            UNION ALL
            SELECT name, b, round(v, 6) FROM filled
            UNION ALL
            SELECT g.name, g.b, NULL FROM gaps g LEFT JOIN lo ON g.name = lo.name AND g.b = lo.b
            WHERE lo.b IS NULL
            ORDER BY name, time
        """,
        "multimodal_audio": """
            SELECT i AS asset_id, CAST(8000 AS BIGINT) AS rate,
                   CAST(256 AS BIGINT) AS n_samples,
                   CAST(32 AS BIGINT) AS duration_ms,
                   CAST(4000 * (i + 1) AS BIGINT) AS peak,
                   printf('%.4f', sqrt((1408.0 * (1000.0 * (i + 1)) * (1000.0 * (i + 1))) / 256.0)) AS rms
            FROM generate_series(0, 7) t(i) ORDER BY asset_id
        """,
        "contamination": """
            WITH sh AS (
              SELECT doc_id, source, list_distinct(list_transform(
                  generate_series(0, greatest(len(string_split(text, ' ')) - 5, 0)),
                  i -> array_to_string((string_split(text, ' '))[i+1:i+5], ' '))) AS sh
              FROM documents
            ), b AS (
              SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source IN ('src0', 'src1')
            ), d AS (
              SELECT doc_id, unnest(sh) AS s FROM sh
              WHERE source NOT IN ('src0', 'src1')
            ), t AS (
              SELECT doc_id, count(*) AS n_shingles FROM d GROUP BY 1
            ), h AS (
              SELECT d.doc_id, count(*) AS n_hits FROM d JOIN b ON d.s = b.s GROUP BY 1
            )
            SELECT t.doc_id, t.n_shingles,
                   coalesce(h.n_hits, 0) AS n_hits,
                   round(coalesce(h.n_hits, 0) * 1.0 / t.n_shingles, 6) AS overlap,
                   coalesce(h.n_hits, 0) * 1.0 / t.n_shingles >= 0.2 AS contaminated
            FROM t LEFT JOIN h ON h.doc_id = t.doc_id
            ORDER BY t.doc_id
        """,
        "multimodal_decode": """
            WITH a AS (
              SELECT i, 8 + i % 5 AS w, 6 + i % 4 AS h FROM generate_series(0, 15) t(i)
            ), mr AS (
              SELECT a.i, avg(CAST(x * 255 // (a.w - 1) AS DOUBLE)) AS m
              FROM a, LATERAL (SELECT unnest(generate_series(0, a.w - 1)) AS x) xs
              GROUP BY a.i
            ), mg AS (
              SELECT a.i, avg(CAST(y * 255 // (a.h - 1) AS DOUBLE)) AS m
              FROM a, LATERAL (SELECT unnest(generate_series(0, a.h - 1)) AS y) ys
              GROUP BY a.i
            )
            SELECT a.i AS asset_id, CAST(a.w AS BIGINT) AS width,
                   CAST(a.h AS BIGINT) AS height,
                   printf('%.4f', mr.m) AS mean_r,
                   printf('%.4f', mg.m) AS mean_g,
                   printf('%.4f', CAST(a.i * 13 % 256 AS DOUBLE)) AS mean_b
            FROM a JOIN mr ON mr.i = a.i JOIN mg ON mg.i = a.i
            ORDER BY asset_id
        """,
        "streaming_rollup": """
            SELECT event_type AS name,
                   epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bucket,
                   count(*) AS cnt, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY name, bucket
        """,
        "map_kalman": """
            WITH RECURSIVE s AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn
              FROM events
            ), kal AS (
              SELECT name, time, value, rn, value AS x, CAST(1.0 AS DOUBLE) AS p
              FROM s WHERE rn = 1
              UNION ALL
              SELECT s.name, s.time, s.value, s.rn,
                     k.x + ((k.p + 1.0) / (k.p + 1.0 + 2.0)) * (s.value - k.x) AS x,
                     (1.0 - (k.p + 1.0) / (k.p + 1.0 + 2.0)) * (k.p + 1.0) AS p
              FROM kal k JOIN s ON s.name = k.name AND s.rn = k.rn + 1
            )
            SELECT name, time, value, round(x, 6) AS kalman FROM kal
            ORDER BY name, time, value
        """,
        "fft": """
            WITH s AS (
              SELECT event_type AS name, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1 AS i,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     (max(epoch_ns(ts)) OVER (PARTITION BY event_type)
                      - min(epoch_ns(ts)) OVER (PARTITION BY event_type)) / 1e9 AS dur
              FROM events
            ), meta AS (
              SELECT DISTINCT name, n, dur FROM s
            ), ks AS (
              SELECT name, n, dur, unnest(generate_series(1, n // 2)) AS k FROM meta
            ), dft AS (
              SELECT ks.name, ks.k, ks.n, ks.dur,
                     sum(s.value * cos(2 * pi() * ks.k * s.i / ks.n)) AS re,
                     sum(s.value * sin(2 * pi() * ks.k * s.i / ks.n)) AS im
              FROM ks JOIN s ON s.name = ks.name
              GROUP BY 1, 2, 3, 4
            )
            SELECT name,
                   round((CAST(k AS DOUBLE) / n) * (CAST(n AS DOUBLE) / dur), 9) AS hz,
                   round(2.0 * sqrt(re * re + im * im) / n, 6) AS ampl
            FROM dft ORDER BY name, hz
        """,
        "oscillator_fft": """
            WITH s AS (
              SELECT i,
                     sin(2*pi()*1.0*((i::BIGINT*15625000)/1000000000.0))
                     + 0.5*sin(2*pi()*2.0*((i::BIGINT*15625000)/1000000000.0))
                     + 0.25*sin(2*pi()*3.0*((i::BIGINT*15625000)/1000000000.0)) AS v
              FROM generate_series(0, 255) t(i)
            ), ks AS (SELECT k FROM generate_series(1, 128) tk(k)),
            dft AS (
              SELECT k,
                     sum(v * cos(2*pi()*k*i/256.0)) AS re,
                     sum(v * sin(2*pi()*k*i/256.0)) AS im
              FROM s, ks GROUP BY k
            )
            SELECT round((k/256.0) * (256.0/((255::BIGINT*15625000)/1000000000.0)), 6) AS hz,
                   round(2.0*sqrt(re*re + im*im)/256.0, 6) AS ampl
            FROM dft ORDER BY hz
        """,
        "tql_script": """
            SELECT event_type AS name, round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value, count(value) AS cnt
            FROM events GROUP BY 1 ORDER BY name
        """,
        "tql_script_js": """
            SELECT event_type AS name, count(*) AS cnt,
                   CAST(sum(user_id % 7) AS DOUBLE) AS modsum
            FROM events WHERE value > 100
            GROUP BY 1 ORDER BY name
        """,
"streaming_lowpass": """
            WITH w AS (
              SELECT event_type AS name, ts, event_id, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT a.name, epoch_us(a.ts) AS time, a.value,
                   round(sum(CASE WHEN b.rn = 1 THEN power(0.8, a.rn - 1) * b.value
                                  ELSE 0.2 * power(0.8, a.rn - b.rn) * b.value END), 6) AS lowpass
            FROM w a JOIN w b ON a.name = b.name AND b.rn <= a.rn
            GROUP BY a.name, a.ts, a.value, a.rn
            ORDER BY a.name, time, a.value
        """,
        "streaming_filter_changed": """
            WITH w AS (
              SELECT event_type AS name, ts, value,
                     lag(value) OVER (PARTITION BY event_type
                                      ORDER BY ts) AS pv
              FROM events
            )
            SELECT name, epoch_us(ts) AS time, value
            FROM w WHERE pv IS NULL OR pv IS DISTINCT FROM value
            ORDER BY name, time
        """,
        "streaming_dedup": """
            SELECT event_type AS name, epoch_us(ts) AS time, value
            FROM events
            ORDER BY name, time
        """,
        "codec_csv": """
            WITH e AS (
              SELECT event_id, ts, value FROM events ORDER BY event_id LIMIT 1000
            )
            SELECT row_number() OVER (ORDER BY event_id) - 1 AS i,
                   CAST(event_id AS VARCHAR) || ',' ||
                   strftime(ts, '%Y-%m-%d %H:%M:%S') ||
                   CASE WHEN f3 = '' THEN '' ELSE '.' || f3 END || ',' ||
                   CASE WHEN value = 0 THEN '0'
                        ELSE COALESCE(NULLIF(rtrim(rtrim(
                                 printf('%.6f', value), '0'), '.'), ''), '0')
                   END AS line
            FROM (
              SELECT *,
                     rtrim(lpad(CAST(epoch_ns(ts) % 1000000000 // 1000000
                                     AS VARCHAR), 3, '0'), '0') AS f3
              FROM e
            )
            ORDER BY event_id
        """,
        "codec_ndjson": """
            WITH e AS (
              SELECT event_id, ts, value FROM events ORDER BY event_id LIMIT 200
            )
            SELECT row_number() OVER (ORDER BY event_id) - 1 AS i,
                   '{"event_id":' || CAST(event_id AS VARCHAR) ||
                   ',"time":"' || strftime(ts, '%Y-%m-%d %H:%M:%S') ||
                   CASE WHEN f3 = '' THEN '' ELSE '.' || f3 END ||
                   '","value":' ||
                   CASE WHEN value = 0 THEN '0'
                        ELSE COALESCE(NULLIF(rtrim(rtrim(
                                 printf('%.6f', value), '0'), '.'), ''), '0')
                   END || '}' AS line
            FROM (
              SELECT *,
                     rtrim(lpad(CAST(epoch_ns(ts) % 1000000000 // 1000000
                                     AS VARCHAR), 3, '0'), '0') AS f3
              FROM e
            )
            ORDER BY event_id
        """,
        "codec_markdown": """
            WITH e AS (
              SELECT event_id, epoch_ns(ts) // 1000000000 AS tsec, value
              FROM events ORDER BY event_id LIMIT 200
            )
            SELECT 0 AS i, '|event_id|tsec|value|' AS line
            UNION ALL
            SELECT 1, '|:-----|:-----|:-----|'
            UNION ALL
            SELECT row_number() OVER (ORDER BY event_id) + 1,
                   '|' || CAST(event_id AS VARCHAR) ||
                   '|' || CAST(tsec AS VARCHAR) ||
                   '|' || printf('%.6f', value) || '|'
            FROM e
            ORDER BY i
        """,
        "codec_html": """
            WITH e AS (
              SELECT event_id, CAST(trunc(value * 100) AS BIGINT) AS cents
              FROM events ORDER BY event_id LIMIT 100
            )
            SELECT 0 AS i,
                   '<table><thead><tr><th>event_id</th><th>cents</th></tr>'
                   || '</thead><tbody>'
                   || string_agg('<tr><td>' || CAST(event_id AS VARCHAR)
                                 || '</td><td>' || CAST(cents AS VARCHAR)
                                 || '</td></tr>', '' ORDER BY event_id)
                   || '</tbody></table>' AS html
            FROM e
        """,
        "bpe_merges": _bpe_oracle(4),
        "lake_api_raw": """
            SELECT name AS NAME,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIME,
                   value AS VALUE
            FROM (SELECT event_type AS name, ts, value FROM events)
            WHERE name IN ('click', 'view')
              AND epoch_ns(ts) BETWEEN 1704067200000000000
                                   AND 1704074400000000000
            ORDER BY NAME, TIME, VALUE
            LIMIT 200
        """,
        "lake_api_calc": """
            WITH t AS (
              SELECT event_type AS name,
                     epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS b,
                     value
              FROM events
              WHERE event_type IN ('click', 'view')
                AND epoch_ns(ts) BETWEEN 1704067200000000000
                                     AND 1704153600000000000
            )
            SELECT name AS NAME,
                   strftime(to_timestamp(b // 1000000000),
                            '%Y-%m-%d %H:%M:%S') AS TIME,
                   round(avg(value), 6) AS VALUE
            FROM t GROUP BY name, b ORDER BY NAME, TIME
        """,
        "lake_fanout": """
            WITH t AS (
              SELECT 't' || lpad(CAST(event_id % 64 AS VARCHAR),
                                 2, '0') AS name,
                     epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS b,
                     value
              FROM events
              WHERE epoch_ns(ts) BETWEEN 1704067200000000000
                                     AND 1704153600000000000
            )
            SELECT name AS NAME,
                   strftime(to_timestamp(b // 1000000000),
                            '%Y-%m-%d %H:%M:%S') AS TIME,
                   round(avg(value), 6) AS VALUE
            FROM t GROUP BY name, b ORDER BY NAME, TIME
        """,
        "bpe_encode": """
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS wd
              FROM documents
            ),
            s0 AS (SELECT doc_id,
                          ' ' || array_to_string(string_split(wd, ''), ' ')
                          || ' ' AS s FROM w),
            s1 AS (SELECT doc_id, replace(s, ' s c ', ' sc ') AS s FROM s0),
            s2 AS (SELECT doc_id, replace(s, ' t a ', ' ta ') AS s FROM s1),
            s3 AS (SELECT doc_id, replace(s, ' ta b ', ' tab ') AS s FROM s2),
            s4 AS (SELECT doc_id, replace(s, ' v a ', ' va ') AS s FROM s3)
            SELECT doc_id,
                   CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT)
                       AS n_bpe_tokens
            FROM s4 GROUP BY doc_id ORDER BY doc_id
        """,
        "substring_cut": """
            WITH toks0 AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            pos0 AS (
              SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i
              FROM toks0
            ),
            grams AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     md5(array_to_string(t[i:i+7], ' ')) AS d
              FROM pos0
            ),
            dup AS (SELECT d FROM grams GROUP BY d HAVING count(*) >= 2),
            marked AS (
              SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (d)
            ),
            isl AS (
              SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM marked
            ),
            spans AS (
              SELECT doc_id, min(pos) AS s, max(pos) AS e
              FROM isl GROUP BY doc_id, grp
            ),
            affected AS (SELECT DISTINCT doc_id FROM spans),
            tok AS (
              SELECT t0.doc_id, CAST(p AS BIGINT) AS pos, t0.t[p] AS tok
              FROM (SELECT doc_id, t,
                           unnest(range(1, len(t) + 1)) AS p
                    FROM toks0
                    WHERE doc_id IN (SELECT doc_id FROM affected)) t0
            ),
            surv AS (
              SELECT tk.doc_id, tk.pos, tk.tok
              FROM tok tk
              WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tk.doc_id
                  AND tk.pos >= sp.s AND tk.pos <= sp.e + 7)
            ),
            rebuilt AS (
              SELECT doc_id,
                     COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS ct
              FROM surv GROUP BY doc_id
            ),
            allrows AS (
              SELECT d.doc_id,
                     CASE WHEN a.doc_id IS NULL THEN d.text
                          ELSE COALESCE(r.ct, '') END AS ct
              FROM documents d
              LEFT JOIN affected a USING (doc_id)
              LEFT JOIN rebuilt r USING (doc_id)
            )
            SELECT doc_id, md5(ct) AS clean_fp,
                   CAST(length(ct) AS BIGINT) AS clean_len
            FROM allrows ORDER BY doc_id
        """,
        "similarity_lsh": """
            WITH hp AS (
              SELECT p.p, j.j,
                     CASE WHEN ('0x' || substr(md5(p.p::VARCHAR || '|' ||
                                j.j::VARCHAR), 1, 15))::BIGINT % 2 = 0
                          THEN 1.0 ELSE -1.0 END AS h
              FROM (SELECT unnest(generate_series(0, 35)) AS p) p,
                   (SELECT unnest(generate_series(0, 63)) AS j) j
            ), dots AS (
              SELECT e.vec_id, hp.p,
                     sum(CAST(e.embedding[hp.j + 1] AS DOUBLE) * hp.h) AS d
              FROM embeddings e, hp GROUP BY 1, 2
            ), bk AS (
              SELECT vec_id, p // 3 AS band,
                     CAST(sum(CASE WHEN d > 0 THEN 1 << (p % 3)
                              ELSE 0 END) AS BIGINT) AS bucket
              FROM dots GROUP BY 1, 2
            ), qb AS (SELECT band, bucket FROM bk WHERE vec_id = 0),
            cand AS (
              SELECT DISTINCT bk.vec_id FROM bk JOIN qb USING (band, bucket)
              WHERE bk.vec_id <> 0
            ),
            qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id, e.label,
                     list_dot_product(e.embedding::DOUBLE[], qv.v::DOUBLE[])
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv.v::DOUBLE[],
                                                qv.v::DOUBLE[]))) AS c
              FROM embeddings e JOIN cand USING (vec_id), qv
            )
            SELECT vec_id, label, round(c, 6) AS cosine
            FROM scored ORDER BY c DESC, vec_id LIMIT 10
        """,
        "string_source": """
            SELECT CAST(i AS BIGINT) AS rownum,
                   trim(fragment) AS string
            FROM (
              SELECT unnest(string_split('  alpha \nbeta\n gamma\ndelta  ',
                                         chr(10))) AS fragment,
                     generate_subscripts(string_split(
                       '  alpha \nbeta\n gamma\ndelta  ', chr(10)), 1) AS i
            )
            ORDER BY rownum
        """,
        "bytes_source": """
            SELECT CAST(i AS BIGINT) AS rownum, md5(fragment) AS digest
            FROM (
              SELECT unnest(string_split('ab,cd,ef,gh', ',')) AS fragment,
                     generate_subscripts(string_split('ab,cd,ef,gh', ','),
                                         1) AS i
            )
            ORDER BY rownum
        """,
        "codec_geomap": r"""
            WITH e AS (
              SELECT event_id,
                     (300 + event_id % 100) / 10.0 AS lat,
                     (1200 + event_id % 300) / 10.0 AS lon
              FROM events ORDER BY event_id LIMIT 40
            ),
            f AS (
              SELECT event_id,
                     COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', lat),
                              '0'), '.'), ''), '0') AS slat,
                     COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', lon),
                              '0'), '.'), ''), '0') AS slon,
                     row_number() OVER (ORDER BY event_id) - 1 AS n
              FROM e
            ),
            b AS (
              SELECT COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', min(lat)),
                              '0'), '.'), ''), '0') AS lat0,
                     COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', min(lon)),
                              '0'), '.'), ''), '0') AS lon0,
                     COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', max(lat)),
                              '0'), '.'), ''), '0') AS lat1,
                     COALESCE(NULLIF(rtrim(rtrim(printf('%.6f', max(lon)),
                              '0'), '.'), ''), '0') AS lon1,
                     count(*) AS nmk
              FROM e
            )
            SELECT CAST(0 AS BIGINT) AS i, '((opt)=>{' AS line
            UNION ALL SELECT 1, 'var map;'
            UNION ALL SELECT 2, 'if (opt && opt.map) {'
            UNION ALL SELECT 3, '  map = opt.map;'
            UNION ALL SELECT 4, '  opt.map.eachLayer(function (layer) {'
            UNION ALL SELECT 5, '    if (!(layer instanceof L.TileLayer)) {'
            UNION ALL SELECT 6, '      opt.map.removeLayer(layer);'
            UNION ALL SELECT 7, '    }'
            UNION ALL SELECT 8, '  });'
            UNION ALL SELECT 9, '} else {'
            UNION ALL SELECT 10,
              '  map = L.map("GID1", {crs: L.CRS.EPSG3857, attributionControl:false});'
            UNION ALL SELECT 11,
              '  L.tileLayer("https://tile.openstreetmap.org/{z}/{x}/{y}.png").addTo(map);'
            UNION ALL SELECT 12, '  opt.map = map;'
            UNION ALL SELECT 13, '}'
            UNION ALL SELECT 14,
              'opt.initBounds = [[' || lat0 || ',' || lon0 || '],['
               || lat1 || ',' || lon1 || ']];' FROM b
            UNION ALL SELECT 15, 'map.fitBounds(opt.initBounds);'
            UNION ALL SELECT 16 + n,
              'var obj' || CAST(n AS VARCHAR) || ' = L.marker(['
               || slat || ',' || slon || '],{}).addTo(map);' FROM f
            UNION ALL SELECT 16 + nmk, '})(GID1);' FROM b
            ORDER BY i
        """,
        "codec_chart": r"""
            WITH e AS (
              SELECT epoch_ns(ts) // 1000000000 * 1000 AS tms,
                     CAST(trunc(value * 100) AS BIGINT) AS cents,
                     event_id
              FROM events ORDER BY event_id LIMIT 50
            ),
            c0 AS (SELECT '[' || string_agg(CAST(tms AS VARCHAR), ','
                                            ORDER BY event_id) || ']' AS a
                   FROM e),
            c1 AS (SELECT '[' || string_agg(CAST(cents AS VARCHAR), ','
                                            ORDER BY event_id) || ']' AS a
                   FROM e)
            SELECT CAST(0 AS BIGINT) AS i, '(()=>{' AS line
            UNION ALL SELECT 1, '    "use strict";'
            UNION ALL SELECT 2, '    const _column_0=' || c0.a || ';' FROM c0
            UNION ALL SELECT 3, '    const _column_1=' || c1.a || ';' FROM c1
            UNION ALL SELECT 4, '    const _columns=[_column_0,_column_1];'
            UNION ALL SELECT 5,
              '    function column(idx) { return _columns[idx]; }'
            UNION ALL SELECT 6, '    let _chartID = ''CID1'';'
            UNION ALL SELECT 7,
              '    let _chart = echarts.init(document.getElementById(_chartID), "white");'
            UNION ALL SELECT 8, '})();'
            ORDER BY i
        """,
        "codec_json": """
            WITH e AS (
              SELECT event_id, value FROM events ORDER BY event_id LIMIT 50
            ),
            cell AS (
              SELECT event_id,
                     '[' || CAST(event_id AS VARCHAR) || ',' ||
                     CASE WHEN value = 0 THEN '0'
                          ELSE COALESCE(NULLIF(rtrim(rtrim(
                                  printf('%.6f', value), '0'), '.'), ''), '0')
                     END || ']' AS r
              FROM e
            )
            SELECT 0 AS i,
                   '{"data":{"columns":["event_id","value"],'
                   || '"types":["int64","double"],"rows":['
                   || string_agg(r, ',' ORDER BY event_id)
                   || ']},"success":true,"reason":"success","elapse":"X"}'
                   AS envelope
            FROM cell
        """,
        "codec_box": """
            WITH e AS (
              SELECT event_id, CAST(trunc(value * 100) AS BIGINT) AS cents
              FROM events ORDER BY event_id LIMIT 50
            ),
            s AS (
              SELECT row_number() OVER (ORDER BY event_id) AS rn,
                     CAST(event_id AS VARCHAR) AS c1,
                     CAST(cents AS VARCHAR) AS c2
              FROM e
            ),
            w AS (
              SELECT CAST(greatest(length('EVENT_ID'),
                                 max(length(c1))) AS INTEGER) AS w1,
                     CAST(greatest(length('CENTS'),
                                 max(length(c2))) AS INTEGER) AS w2,
                     max(rn) AS nrows
              FROM s
            )
            SELECT 0 AS i,
                   '┌' || repeat('─', w1 + 2) || '┬'
                       || repeat('─', w2 + 2) || '┐' AS line FROM w
            UNION ALL
            SELECT 1, '│ ' || rpad('EVENT_ID', w1, ' ') || ' │ '
                           || rpad('CENTS', w2, ' ') || ' │' FROM w
            UNION ALL
            SELECT 2, '├' || repeat('─', w1 + 2) || '┼'
                          || repeat('─', w2 + 2) || '┤' FROM w
            UNION ALL
            SELECT rn + 2,
                   '│ ' || rpad(c1, w1, ' ') || ' │ '
                        || rpad(c2, w2, ' ') || ' │'
            FROM s, w
            UNION ALL
            SELECT nrows + 3,
                   '└' || repeat('─', w1 + 2) || '┴'
                       || repeat('─', w2 + 2) || '┘' FROM w
            ORDER BY i
        """,
        "streaming_fill": """
            WITH w AS (
              SELECT event_type AS name,
                     epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS b, value
              FROM events
            ),
            agg AS (SELECT name, b, count(*) AS c, sum(value) AS s
                    FROM w GROUP BY 1, 2),
            rng AS (SELECT name, min(b) AS mn, max(b) AS mx
                    FROM agg GROUP BY 1),
            cal AS (SELECT name, u.bb AS b
                    FROM rng, UNNEST(generate_series(mn, mx - 3600000000000,
                                                     3600000000000)) u(bb)),
            j AS (SELECT cal.name, cal.b, coalesce(agg.c, 0) AS cnt,
                         CASE WHEN agg.c IS NULL THEN NULL
                              ELSE agg.s / agg.c END AS av
                  FROM cal LEFT JOIN agg
                    ON cal.name = agg.name AND cal.b = agg.b)
            SELECT name, b // 1000 AS time, cnt,
                   round(last_value(av IGNORE NULLS)
                         OVER (PARTITION BY name ORDER BY b
                               ROWS UNBOUNDED PRECEDING), 6) AS avg_value
            FROM j
            ORDER BY name, time
        """,
        "rollup_cascade": """
            SELECT event_type AS name,
                   (epoch_ns(ts) - epoch_ns(ts) % 3600000000000) // 1000
                       AS time,
                   count(*) AS cnt,
                   round(sum(value), 6) AS sum_v,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v,
                   round(sum(value) / count(*), 6) AS avg_v,
                   round(min_by(value, ts), 6) AS first_v,
                   round(max_by(value, ts), 6) AS last_v
            FROM events
            GROUP BY 1, 2
            ORDER BY name, time
        """,
        "retention": """
            SELECT event_type AS name, epoch_us(ts) AS time, value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-28 00:00:00'
            ORDER BY name, time, value
        """,
        "compaction": """
            SELECT event_type AS name, epoch_us(ts) AS time, value
            FROM events
            ORDER BY name, time, value
        """,
        "group_weighted": """
            WITH w AS (
              SELECT event_type AS name, value AS x,
                     1.0 + user_id % 5 AS w,
                     round(value / 50.0) * 50.0 AS vv
              FROM events
            ),
            tot AS (
              SELECT name, sum(w) AS tw, count(x) AS n,
                     sum(w * x) AS swx, sum(w * x * x) AS swx2
              FROM w GROUP BY 1
            ),
            cum AS (
              SELECT name, x,
                     sum(w) OVER (PARTITION BY name ORDER BY x
                                  ROWS UNBOUNDED PRECEDING) AS cw
              FROM w
            ),
            q AS (
              SELECT cum.name, min(x) AS q90
              FROM cum JOIN tot USING (name)
              WHERE cw >= 0.9 * tw GROUP BY 1
            ),
            md AS (
              SELECT name, vv, sum(w) AS sw,
                     row_number() OVER (PARTITION BY name
                                        ORDER BY sum(w) DESC, vv ASC) AS rn
              FROM w GROUP BY name, vv
            )
            SELECT tot.name,
                   round(swx / tw, 6) AS wmean,
                   round((swx2 - swx * swx / tw) / (tw - 1), 6) AS wvar,
                   round(sqrt((swx2 - swx * swx / tw) / (tw - 1)), 6) AS wstd,
                   round(sqrt((swx2 - swx * swx / tw) / (tw - 1))
                         / sqrt(n), 6) AS wse,
                   q.q90 AS q90,
                   (SELECT vv FROM md WHERE md.name = tot.name AND rn = 1)
                       AS wmode
            FROM tot JOIN q ON tot.name = q.name
            ORDER BY tot.name
        """,
        "scalar_funcs_tql": """
            SELECT event_id,
                   year(ts) AS yr,
                   weekofyear(ts) AS isow,
                   isoyear(ts) AS isoy,
                   dayofyear(ts) AS yday,
                   dayofweek(ts) AS wd,
                   epoch_us(ts) // 1000 AS t_ms,
                   hour(ts + INTERVAL 9 HOUR) AS hr_kst,
                   strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS rfc,
                   round(atan(value), 6) AS at,
                   round((exp(value - 4.0 * trunc(value / 4.0))
                          - exp(-(value - 4.0 * trunc(value / 4.0)))) / 2,
                         6) AS sh,
                   round((exp(2 * value / 100) - 1)
                         / (exp(2 * value / 100) + 1), 6) AS th,
                   round(log2(abs(value) + 1), 6) AS l2,
                   round(power(2.0, value - 8.0 * trunc(value / 8.0)), 6) AS e2,
                   CAST(trunc(value / 7) AS DOUBLE) AS tr,
                   round(value - 2.0 * round_even(value / 2.0, 0), 6) AS rem,
                   round(acos(value - trunc(value)), 6) AS ac,
                   CASE WHEN strpos(event_type, 'a') = 0 THEN -1
                        ELSE strpos(event_type, 'a') - 1 END AS idx_a,
                   CASE WHEN strpos(reverse(event_type), 'a') = 0 THEN -1
                        ELSE length(event_type)
                             - strpos(reverse(event_type), 'a') END AS lidx_a,
                   regexp_matches(event_type, '^[cp]') AS rx,
                   event_type LIKE '%e%' AS gl
            FROM events
        """,
        "tql_dsl": """
            SELECT event_type AS name, round(value * 1.1, 6) AS value,
                   epoch_us(ts) AS time_us
            FROM events
            WHERE event_type IN ('purchase', 'error')
              AND epoch_ns(ts) BETWEEN 1704412800000000000 AND 1705708800000000000
            ORDER BY name, time_us, value
        """,
        "sliding_window": """
            WITH x AS (
              SELECT event_type AS name, value,
                     epoch_ns(ts) - epoch_ns(ts) % 1800000000000 AS lw
              FROM events
            )
            SELECT name, w // 1000 AS time, count(*) AS cnt,
                   round(avg(value), 6) AS avg_value
            FROM x, UNNEST(generate_series(lw - 1800000000000, lw, 1800000000000)) u(w)
            GROUP BY name, w
            ORDER BY name, time
        """,
        "session_window": """
            WITH w AS (
              SELECT user_id, epoch_ns(ts) AS t, value,
                     CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                               OVER (PARTITION BY user_id ORDER BY ts) > 1800000000000
                          THEN 1
                          WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS ns
              FROM events
            ), s AS (
              SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM w
            )
            SELECT user_id, min(t) // 1000 AS session_start,
                   max(t) // 1000 AS session_end,
                   count(*) AS cnt, round(sum(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "stats_aggs": """
            WITH m AS (
              SELECT event_type, avg(value) AS mu FROM events GROUP BY event_type
            )
            SELECT e.event_type AS name,
                   round(avg(pow(e.value - m.mu, 2)), 4) AS moment2,
                   round(avg(pow(e.value - m.mu, 3)), 2) AS moment3,
                   round(corr(e.value, CAST(e.user_id AS DOUBLE)), 6) AS corr_vu,
                   round(covar_samp(e.value, CAST(e.user_id AS DOUBLE)), 4) AS covar_vu,
                   round(regr_slope(e.value, CAST(e.user_id AS DOUBLE)), 8) AS lrs_slope,
                   avg(CASE WHEN e.value <= 100.0 THEN 1.0 ELSE 0.0 END) AS cdf_100,
                   round(sum(e.value * (e.event_id % 10 + 1)) /
                         sum(e.event_id % 10 + 1), 6) AS wavg_value
            FROM events e JOIN m ON m.event_type = e.event_type
            GROUP BY e.event_type
            ORDER BY name
        """,
        "series_diffs": """
            SELECT event_type AS name, epoch_us(ts) AS time, value,
                   abs(value - lag(value) OVER w) AS absdiff,
                   CASE WHEN value - lag(value) OVER w < 0 THEN NULL
                        ELSE value - lag(value) OVER w END AS nonegdiff,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS diff_us
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
            ORDER BY name, time, value
        """,
        "map_distance": """
            WITH pts AS (
              SELECT event_type AS name, ts, event_id,
                     (user_id % 17000) / 100.0 - 85.0 AS lat,
                     (event_id % 36000) / 100.0 - 180.0 AS lon
              FROM events
            ), w AS (
              SELECT name, ts, lat, lon,
                     lag(lat) OVER (PARTITION BY name ORDER BY ts, event_id) AS plat,
                     lag(lon) OVER (PARTITION BY name ORDER BY ts, event_id) AS plon
              FROM pts
            )
            SELECT name, epoch_us(ts) AS time, lat, lon,
                   round(coalesce(2.0 * 6371000.0 * asin(sqrt(
                       pow(sin((radians(lat) - radians(plat)) / 2), 2) +
                       cos(radians(plat)) * cos(radians(lat)) *
                       pow(sin((radians(lon) - radians(plon)) / 2), 2)
                   )), 0.0), 2) AS dist_m
            FROM w
            ORDER BY name, time, lat, lon
        """,
        "lake_pivot": """
            SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 // 1000 AS bucket,
                   round(coalesce(sum(value) FILTER (event_type = 'click'), 0.0), 6) AS click,
                   round(coalesce(sum(value) FILTER (event_type = 'error'), 0.0), 6) AS error,
                   round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0.0), 6) AS purchase,
                   round(coalesce(sum(value) FILTER (event_type = 'signup'), 0.0), 6) AS signup,
                   round(coalesce(sum(value) FILTER (event_type = 'view'), 0.0), 6) AS view
            FROM events GROUP BY 1
            ORDER BY bucket
        """,
        "group_list": """
            SELECT event_type AS name,
                   string_agg(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                              ',' ORDER BY ts, event_id) AS value_list
            FROM events WHERE event_type = 'error' GROUP BY event_type
        """,
        "rollup_routed": f"""
            SELECT event_type AS name,
                   (epoch_ns(ts) // {p}) * {p} AS time,
                   count(value) AS cnt,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   round(sum(value) / count(value), 6) AS avg_value,
                   arg_min(value, epoch_ns(ts)) AS first_value,
                   arg_max(value, epoch_ns(ts)) AS last_value
            FROM events GROUP BY 1, 2
            ORDER BY name, time
        """,
        "lake_decode": f"""
            SELECT event_type AS name,
                   (epoch_ns(ts) // {6 * p}) * {6 * p} AS bucket,
                   arg_min(value, epoch_ns(ts)) AS first_value,
                   arg_max(value, epoch_ns(ts)) AS last_value,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error_rows,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY name, bucket
        """,
        "text_stats": """
            SELECT doc_id,
                   length(text) AS char_len,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_token_len,
                   round(len(string_split(text, ' ')) * 1.0 /
                         len(list_distinct(string_split(text, ' '))), 6) AS ttr_inv
            FROM documents
        """,
        "token_counts": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                   round(avg(len(string_split(text, ' '))), 6) AS avg_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(lower(text)) AS fp FROM documents
        """,
        "dedup_exact": """
            SELECT source,
                   count(*) AS n_docs,
                   count(DISTINCT md5(text)) AS n_unique,
                   count(*) - count(DISTINCT md5(text)) AS n_dupes
            FROM documents GROUP BY source
            ORDER BY source
        """,
        "similarity_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id, e.label,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS dot,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)) AS sa,
                     sum(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS sb
              FROM embeddings e, q, range(1, 65) t(i)
              WHERE e.vec_id <> 0
              GROUP BY e.vec_id, e.label
            ),
            ranked AS (
              SELECT vec_id, label, dot / (sqrt(sa) * sqrt(sb)) AS c
              FROM scored ORDER BY c DESC, vec_id LIMIT 20
            )
            SELECT vec_id, label, round(c, 6) AS cosine FROM ranked
        """,
        "similarity_ivf": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id, e.label,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS dot,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)) AS sa,
                     sum(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS sb
              FROM embeddings e, q, range(1, 65) t(i)
              WHERE e.vec_id <> 0
              GROUP BY e.vec_id, e.label
            ),
            ranked AS (
              SELECT vec_id, label, dot / (sqrt(sa) * sqrt(sb)) AS c
              FROM scored ORDER BY c DESC, vec_id LIMIT 20
            )
            SELECT vec_id, label, round(c, 6) AS cosine FROM ranked
        """,
        "multimodal_features": """
            SELECT i AS asset_id,
                   (['image', 'audio', 'video'])[(i % 3) + 1] AS modality,
                   32 AS feat_dim,
                   sha256('payload-' || i) AS feature
            FROM generate_series(0, 127) t(i)
        """,
        "line_protocol": """
            SELECT name, time, CAST(value AS DOUBLE) AS value FROM (VALUES
                ('cpu.usage',  1704067200000000001, 0.5),
                ('cpu.cores',  1704067200000000001, 8.0),
                ('mem.usage',  1704067200000000002, 0.25),
                ('cpu.usage',  1704067200000000003, 0.75)
            ) AS t(name, time, value)
        """,
        "script_udtf": """
            SELECT event_id, 'base' AS kind, round(value * 2, 6) AS out_value
            FROM events
            UNION ALL
            SELECT event_id, 'bonus' AS kind, round(value * 3, 6) AS out_value
            FROM events WHERE event_type = 'purchase'
        """,
        "shell_pipe": """
            SELECT event_id, user_id % 7 AS bucket FROM events
        """,
        "query_builder": f"""
            SELECT event_type AS name, epoch_us(ts) AS time, value
            FROM events
            WHERE event_type IN ('click', 'view')
              AND epoch_ns(ts) BETWEEN {f} AND {u}
            ORDER BY name, time, value
        """,
        "salted_join": """
            WITH totals AS (
              SELECT user_id, round(sum(value), 6) AS total, count(*) AS n
              FROM events GROUP BY user_id
            )
            SELECT e.event_id, e.user_id, t.total, t.n
            FROM events e JOIN totals t USING (user_id)
            ORDER BY e.event_id
        """,
        "tpch_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "tpch_q14": """
            SELECT round(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "lake_tochar": """
            SELECT event_type AS name, epoch_us(ts) AS time,
                   strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H') AS hour_str,
                   value
            FROM events WHERE event_type = 'click'
            ORDER BY time DESC
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "tpch_q8": """
            SELECT year(o_orderdate) AS o_year,
                   round(sum(CASE WHEN n2.n_name = 'NATION_3'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
              AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31'
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q13": """
            SELECT c_count, count(*) AS custdist FROM (
              SELECT c.c_custkey, count(o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority NOT LIKE '1%'
              GROUP BY c.c_custkey
            ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_totalprice, sum_qty
            FROM (SELECT l_orderkey, round(sum(l_quantity), 6) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 212) big
            JOIN orders ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "set_ops": """
            SELECT user_id,
                   (epoch_ns(ts) - epoch_ns(ts) % 3600000000000) // 1000 AS hour_us
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id,
                   (epoch_ns(ts) - epoch_ns(ts) % 3600000000000) // 1000 AS hour_us
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, hour_us
        """,
        "distinct_users": """
            SELECT event_type AS name,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_rows
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "tpch_q15": """
            WITH rev AS (
              SELECT l_suppkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
            ORDER BY s_suppkey
        """,
        "tpch_q17": """
            SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
            FROM lineitem l
            JOIN part ON l.l_partkey = p_partkey
            WHERE p_brand = 'Brand#23' AND p_size <= 5
              AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE CASE lang
                    WHEN 'en' THEN '{sampling.sample_threshold(0.25)}'
                    WHEN 'de' THEN '{sampling.sample_threshold(1.0)}'
                    WHEN 'fr' THEN '{sampling.sample_threshold(0.5)}'
                    WHEN 'es' THEN '{sampling.sample_threshold(0.5)}'
                    ELSE '' END != ''
              AND substr(md5(cast(doc_id AS VARCHAR)), 1, 8) <=
                  CASE lang
                    WHEN 'en' THEN '{sampling.sample_threshold(0.25)}'
                    WHEN 'de' THEN '{sampling.sample_threshold(1.0)}'
                    WHEN 'fr' THEN '{sampling.sample_threshold(0.5)}'
                    WHEN 'es' THEN '{sampling.sample_threshold(0.5)}'
                    ELSE '' END
            ORDER BY doc_id
        """,
        "pii_scrub": r"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       'u' || doc_id || '@ex.com ip 10.0.' || (doc_id % 256)
                           || '.7 call +1-555-000-' || doc_id || ' '
                           || substr(text, 1, 40),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS scrubbed
            FROM documents ORDER BY doc_id
        """,
        "dedup_clusters": """
            WITH RECURSIVE sh AS (
              SELECT doc_id, lang,
                     list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 3 + 1, 1) + 1),
                       i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
              FROM documents
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(a.s || b.s)) >= 0.05
            ORDER BY id_a, id_b
            ), e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION ALL
              SELECT id_b, id_a FROM p
            ), reach(id, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.src, r.comp FROM e JOIN reach r ON e.dst = r.id
            )
            SELECT id AS doc_id, min(comp) AS canonical_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        "similarity_batch": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                       WHERE vec_id < 3),
            scored AS (
              SELECT q.qid, e.vec_id,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS dot,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)) AS sa,
                     sum(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS sb
              FROM embeddings e, q, range(1, 65) t(i)
              WHERE e.vec_id <> q.qid
              GROUP BY q.qid, e.vec_id
            ),
            ranked AS (
              SELECT qid AS query_id, vec_id, dot / (sqrt(sa) * sqrt(sb)) AS c,
                     row_number() OVER (PARTITION BY qid
                         ORDER BY dot / (sqrt(sa) * sqrt(sb)) DESC, vec_id) AS rk
              FROM scored
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine
            FROM ranked WHERE rk <= 5
            ORDER BY query_id, cosine DESC, vec_id
        """,
        # all-probe batch IVF == the brute-force ranking (same oracle
        # shape as similarity_batch)
        "similarity_ivf_batch": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                       WHERE vec_id < 3),
            scored AS (
              SELECT q.qid, e.vec_id,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS dot,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)) AS sa,
                     sum(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS sb
              FROM embeddings e, q, range(1, 65) t(i)
              WHERE e.vec_id <> q.qid
              GROUP BY q.qid, e.vec_id
            ),
            ranked AS (
              SELECT qid AS query_id, vec_id, dot / (sqrt(sa) * sqrt(sb)) AS c,
                     row_number() OVER (PARTITION BY qid
                         ORDER BY dot / (sqrt(sa) * sqrt(sb)) DESC, vec_id) AS rk
              FROM scored
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine
            FROM ranked WHERE rk <= 5
            ORDER BY query_id, cosine DESC, vec_id
        """,
        # full-shortlist PQ rerank == brute-force top-10 for query vec 0
        "similarity_pq_rerank": """
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS dot,
                     sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)) AS sa,
                     sum(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) AS sb
              FROM embeddings e, q
              CROSS JOIN range(1, 65) t(i)
              WHERE e.vec_id <> 0
              GROUP BY e.vec_id
            )
            SELECT vec_id, round(dot / (sqrt(sa) * sqrt(sb)), 6) AS cosine
            FROM scored
            ORDER BY dot / (sqrt(sa) * sqrt(sb)) DESC, vec_id
            LIMIT 10
        """,
        "lm_score": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
            ), tk AS (SELECT * FROM tok WHERE token != ''),
            v AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
            t AS (SELECT sum(c) AS s FROM v)
            SELECT doc_id, round(avg(ln(c * 1.0 / s)), 6) AS lm_score,
                   count(*) AS n_tokens
            FROM tk JOIN v USING (token), t
            GROUP BY doc_id ORDER BY doc_id
        """,
        "tokens_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(
                       'Dr. ' || source || ': "' || substr(text, 1, 30) || '" (v1.2, ok!)',
                       '\w+|[^\w\s]')) AS n_bpe_tokens,
                   len(string_split(substr(text, 1, 30), ' ')) AS n_ws_tokens
            FROM documents ORDER BY doc_id
        """,
        "vocab_topk": """
            SELECT token, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE token != ''
            GROUP BY token ORDER BY cnt DESC, token LIMIT 100
        """,
        "embedding_stats": """
            WITH n AS (
              SELECT label, len(embedding) AS d,
                     sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
              FROM embeddings
            )
            SELECT label, count(*) AS n_vecs,
                   min(d) AS min_dim, max(d) AS max_dim,
                   round(avg(nrm), 6) AS avg_norm,
                   round(min(nrm), 6) AS min_norm,
                   round(max(nrm), 6) AS max_norm,
                   CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
            FROM n GROUP BY label ORDER BY label
        """,
        "tpch_q2": """
            SELECT DISTINCT s_acctbal, s_name, n_name AS nation,
                   p.p_partkey, l.l_extendedprice AS min_price
            FROM part p, lineitem l, supplier s, nation n
            WHERE p.p_partkey = l.l_partkey AND l.l_suppkey = s.s_suppkey
              AND s.s_nationkey = n.n_nationkey AND p.p_size <= 5
              AND l.l_extendedprice = (
                    SELECT min(l2.l_extendedprice) FROM lineitem l2
                    WHERE l2.l_partkey = p.p_partkey)
            ORDER BY s_acctbal DESC, p.p_partkey LIMIT 100
        """,
        "tpch_q11": """
            SELECT l_partkey, round(sum(l_extendedprice), 4) AS part_value
            FROM lineitem GROUP BY 1
            HAVING sum(l_extendedprice) >
                   (SELECT sum(l_extendedprice) * 0.0007 FROM lineitem)
            ORDER BY part_value DESC, l_partkey
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20": """
            SELECT s_name, s_acctbal FROM supplier
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN
                    (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
              GROUP BY l_suppkey HAVING sum(l_quantity) > 2000)
            ORDER BY s_name
        """,
        "tpch_q21": """
            SELECT s_name, count(*) AS numwait
            FROM supplier, lineitem l1, orders o
            WHERE s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
              AND o.o_orderstatus = 'F'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_quantity > l1.l_quantity)
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        """,
        "tpch_q22": """
            SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                   round(sum(c_acctbal), 4) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'F')
            GROUP BY 1
            ORDER BY cntrycode
        """,
        "boilerplate": """
            WITH paras AS (
              SELECT doc_id, trim(p) AS para
              FROM documents, unnest(string_split(text, ' ')) AS u(p)
              WHERE trim(p) <> ''
            ), counts AS (
              SELECT para, count(DISTINCT doc_id) AS n_docs
              FROM paras GROUP BY 1
            )
            SELECT p.doc_id, count(*) AS n_paras,
                   CAST(sum(CASE WHEN c.n_docs >= 390 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
            FROM paras p JOIN counts c USING (para)
            GROUP BY 1 ORDER BY doc_id
        """,
        "boilerplate_clean": """
            WITH paras AS (
              SELECT doc_id, trim(p) AS para
              FROM documents, unnest(string_split(text, ' ')) AS u(p)
              WHERE trim(p) <> ''
            ), boiler AS (
              SELECT coalesce(list(para), []) AS bl FROM (
                SELECT para FROM paras GROUP BY para
                HAVING count(DISTINCT doc_id) >= 390) t
            )
            SELECT d.doc_id,
                   coalesce(array_to_string(list_filter(string_split(d.text, ' '),
                       x -> trim(x) <> '' AND NOT list_contains(b.bl, trim(x))),
                       ' '), '') AS text
            FROM documents d CROSS JOIN boiler b
        """,
        "repetition": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> trim(t) <> '') AS l
              FROM documents
            ), grams AS (
              SELECT doc_id, unnest(list_filter(list_transform(list_zip(l, l[2:]),
                     z -> CASE WHEN z[2] IS NULL THEN NULL
                          ELSE z[1] || ' ' || z[2] END), g -> g IS NOT NULL)) AS gram
              FROM toks
            ), pg AS (
              SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
            )
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, count(*) AS n_distinct,
                   round(max(c) * 1.0 / sum(c), 6) AS top_gram_frac,
                   round(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) * 1.0
                         / sum(c), 6) AS dup_gram_frac
            FROM pg GROUP BY 1 ORDER BY doc_id
        """,
        "tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS profit
            FROM lineitem, supplier, orders, nation, part
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND s_nationkey = n_nationkey AND p_partkey = l_partkey
              AND p_name LIKE '%blue%'
            GROUP BY 1, 2 ORDER BY nation, o_year
        """,
        "tpch_q12": """
            SELECT l_returnflag AS ship_group,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders, lineitem
            WHERE o_orderkey = l_orderkey
              AND l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
            GROUP BY 1 ORDER BY ship_group
        """,
        "tpch_q19": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND (
              (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
              OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                  AND l_quantity BETWEEN 10 AND 20)
              OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                  AND l_quantity BETWEEN 20 AND 30))
        """,
        "embedding_quantize": """
            WITH q AS (
              SELECT label, embedding,
                     list_max(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
              FROM embeddings
            ), e AS (
              SELECT label,
                     CASE WHEN s = 0 THEN 0 ELSE
                       list_max(list_transform(embedding, x ->
                         abs(CAST(x AS DOUBLE)
                             - round(CAST(x AS DOUBLE) / s) * s))) END AS mx,
                     CASE WHEN s = 0 THEN 0 ELSE
                       list_sum(list_transform(embedding, x ->
                         abs(CAST(x AS DOUBLE)
                             - round(CAST(x AS DOUBLE) / s) * s)))
                       / len(embedding) END AS av
              FROM q
            )
            SELECT label, count(*) AS n_vecs,
                   round(max(mx), 6) AS max_err, round(avg(av), 6) AS avg_err
            FROM e GROUP BY label ORDER BY label
        """,
        "source_profile": """
            SELECT source, count(*) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars,
                   round(avg(len(list_filter(string_split(text, ' '),
                         t -> t <> ''))), 6) AS avg_tokens,
                   count(DISTINCT lang) AS n_langs
            FROM documents GROUP BY source ORDER BY source
        """,
        "curation_funnel": r"""
            WITH base AS (SELECT doc_id, text FROM documents),
            q AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       round((len(list_distinct(string_split(text, ' '))) * 1.0
                              / len(string_split(text, ' '))) * 0.4
                            + least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.4
                            + (1.0 - least(length(regexp_replace(text,
                               '[^\.,;:!\?]', '', 'g')) * 1.0
                               / greatest(length(text), 1) * 10.0, 1.0)) * 0.2,
                             6) AS quality
                FROM base) WHERE quality >= 0.71
            ),
            toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> trim(t) <> '') AS l
              FROM base
            ), grams AS (
              SELECT doc_id, unnest(list_filter(list_transform(list_zip(l, l[2:]),
                     z -> CASE WHEN z[2] IS NULL THEN NULL
                          ELSE z[1] || ' ' || z[2] END), g -> g IS NOT NULL)) AS gram
              FROM toks
            ), pg AS (
              SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
            ), rep AS (
              SELECT doc_id, round(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
                     * 1.0 / sum(c), 6) AS dup_frac
              FROM pg GROUP BY 1
            ),
            s2 AS (SELECT q.doc_id, q.text FROM q JOIN rep USING (doc_id)
                   WHERE rep.dup_frac <= 0.09),
            s3 AS (SELECT md5(lower(text)) AS fp, min(doc_id) AS doc_id
                   FROM s2 GROUP BY 1),
            s4 AS (SELECT doc_id FROM s3
                   WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 8) <= '7fffffff')
            SELECT '1_raw' AS stage, count(*) AS n_docs FROM base
            UNION ALL SELECT '2_quality', count(*) FROM q
            UNION ALL SELECT '3_repetition', count(*) FROM s2
            UNION ALL SELECT '4_dedup', count(*) FROM s3
            UNION ALL SELECT '5_sample', count(*) FROM s4
        """,
        "substring_spans": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            pos0 AS (
              SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i
              FROM toks
            ),
            grams AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     md5(array_to_string(t[i:i+7], ' ')) AS d
              FROM pos0
            ),
            dup AS (SELECT d FROM grams GROUP BY d HAVING count(*) >= 2),
            marked AS (
              SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (d)
            ),
            isl AS (
              SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM marked
            ),
            spans AS (
              SELECT doc_id, min(pos) AS s, max(pos) AS e
              FROM isl GROUP BY doc_id, grp
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_spans,
                     CAST(sum(e - s + 8) AS BIGINT) AS dup_tokens
              FROM spans GROUP BY doc_id
            )
            SELECT a.doc_id, a.n_spans, a.dup_tokens,
                   round(a.dup_tokens * 1.0
                         / len(string_split(d.text, ' ')), 6) AS dup_frac
            FROM agg a JOIN documents d USING (doc_id)
            ORDER BY doc_id
        """,
        "url_normalize": """
            WITH u0 AS (
              SELECT doc_id,
                     'HTTPS://WWW.' || source || '.Example.COM:443/Docs/'
                     || CAST(doc_id AS VARCHAR) || '?utm_source=ads&id='
                     || CAST(doc_id AS VARCHAR) || '&fbclid=zz#frag' AS url
              FROM documents
            ),
            lc AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                || regexp_replace(url,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS u1
              FROM u0
            ),
            steps AS (
              SELECT doc_id, url,
                regexp_replace(
                 regexp_replace(
                  regexp_replace(
                   regexp_replace(
                    regexp_replace(
                     regexp_replace(u1, '#.*$', '', 'g'),
                     '^(https://[^/?#:]+):443([/?#].*)?$', '\\1\\2'),
                    '^(http://[^/?#:]+):80([/?#].*)?$', '\\1\\2'),
                   '([?&])utm_source=[^&#]*&', '\\1', 'g'),
                  '[?&]utm_source=[^&#]*$', ''),
                 '[?&]fbclid=[^&#]*$', '') AS u2
              FROM lc
            )
            SELECT doc_id, u2 AS url_norm,
                   lower(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]+)',
                     1)) AS host,
                   regexp_extract(
                     regexp_replace(
                       lower(regexp_extract(url,
                         '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]+)',
                         1)), '^www\\.', ''),
                     '([^.]+\\.[^.]+)$', 1) AS domain
            FROM steps ORDER BY doc_id
        """,
        "domain_caps": """
            WITH d AS (
              SELECT doc_id,
                     source || CAST(doc_id % 5 AS VARCHAR) || '.com'
                       AS domain
              FROM documents
            ),
            rk AS (
              SELECT doc_id, domain,
                     row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
              FROM d
            )
            SELECT doc_id, domain FROM rk WHERE r <= 3
            ORDER BY domain, doc_id
        """,
        "lm_buckets": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents
            ), tk AS (SELECT * FROM tok WHERE token != ''),
            v AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
            t AS (SELECT sum(c) AS s FROM v),
            scored AS (
              SELECT doc_id, round(avg(ln(c * 1.0 / s)), 6) AS lm_score,
                     count(*) AS n_tokens
              FROM tk JOIN v USING (token), t GROUP BY doc_id
            ),
            tiered AS (
              SELECT *,
                     ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS nb
              FROM scored
            )
            SELECT CASE nb WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                           ELSE 'tail' END AS bucket,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   round(min(lm_score), 6) AS min_score,
                   round(max(lm_score), 6) AS max_score
            FROM tiered GROUP BY bucket ORDER BY bucket
        """,
        "pack_sequences": """
            WITH sized AS (
              SELECT doc_id, len(string_split(text, ' ')) AS nt
              FROM documents
            ),
            laid AS (
              SELECT doc_id, nt,
                     COALESCE(sum(nt) OVER (
                       ORDER BY doc_id, nt
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS off
              FROM sized
            ),
            chunks AS (
              SELECT doc_id, nt, off,
                     CAST(unnest(range(CAST(off // 512 AS BIGINT),
                                       CAST((off + nt - 1) // 512 + 1
                                            AS BIGINT)))
                          AS BIGINT) AS chunk_id
              FROM laid
            )
            SELECT doc_id, chunk_id,
                   CAST(greatest(off - chunk_id * 512, 0) AS BIGINT)
                       AS chunk_start,
                   CAST(least(off + nt - chunk_id * 512, 512) - 1 AS BIGINT)
                       AS chunk_end
            FROM chunks ORDER BY doc_id, chunk_id
        """,
        "pipeline_v2": r"""
            WITH bench AS (
              SELECT doc_id, text FROM documents
              WHERE source IN ('src0', 'src1')
            ),
            base AS (
              SELECT doc_id, text FROM documents
              WHERE source NOT IN ('src0', 'src1')
            ),
            bsh AS (
              SELECT DISTINCT unnest(list_distinct(list_transform(
                generate_series(0, greatest(len(string_split(text, ' ')) - 5, 0)),
                i -> array_to_string((string_split(text, ' '))[i+1:i+5], ' ')))) AS s
              FROM bench
            ),
            dsh AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                generate_series(0, greatest(len(string_split(text, ' ')) - 5, 0)),
                i -> array_to_string((string_split(text, ' '))[i+1:i+5], ' ')))) AS s
              FROM base
            ),
            tot AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
            hit AS (SELECT d.doc_id, count(*) AS h
                    FROM dsh d JOIN bsh b ON d.s = b.s GROUP BY 1),
            s2 AS (
              SELECT base.doc_id, base.text
              FROM base JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
              WHERE coalesce(h, 0) * 1.0 / n < 0.2
            ),
            s3 AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       round((len(list_distinct(string_split(text, ' '))) * 1.0
                              / len(string_split(text, ' '))) * 0.4
                            + least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.4
                            + (1.0 - least(length(regexp_replace(text,
                               '[^\.,;:!\?]', '', 'g')) * 1.0
                               / greatest(length(text), 1) * 10.0, 1.0)) * 0.2,
                             6) AS quality
                FROM s2) WHERE quality >= 0.71
            ),
            rtoks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> trim(t) <> '') AS l
              FROM s3
            ), rgrams AS (
              SELECT doc_id, unnest(list_filter(list_transform(list_zip(l, l[2:]),
                     z -> CASE WHEN z[2] IS NULL THEN NULL
                          ELSE z[1] || ' ' || z[2] END), g -> g IS NOT NULL)) AS gram
              FROM rtoks
            ), rpg AS (
              SELECT doc_id, gram, count(*) AS c FROM rgrams GROUP BY 1, 2
            ), rep AS (
              SELECT doc_id, round(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
                     * 1.0 / sum(c), 6) AS dup_frac
              FROM rpg GROUP BY 1
            ),
            s4 AS (
              SELECT s3.doc_id, s3.text FROM s3 JOIN rep USING (doc_id)
              WHERE rep.dup_frac <= 0.09
            ),
            st AS (SELECT doc_id, string_split(text, ' ') AS t FROM s4),
            sp0 AS (SELECT doc_id, t,
                           unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i
                    FROM st),
            sg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                          md5(array_to_string(t[i:i+7], ' ')) AS d
                   FROM sp0),
            sdup AS (SELECT d FROM sg GROUP BY d HAVING count(*) >= 2),
            smk AS (SELECT g.doc_id, g.pos FROM sg g JOIN sdup USING (d)),
            sisl AS (SELECT doc_id, pos,
                            pos - row_number() OVER (PARTITION BY doc_id
                                                     ORDER BY pos) AS grp
                     FROM smk),
            ssp AS (SELECT doc_id, min(pos) AS sb, max(pos) AS se
                    FROM sisl GROUP BY doc_id, grp),
            sagg AS (SELECT doc_id, sum(se - sb + 8) AS dup_tokens
                     FROM ssp GROUP BY doc_id),
            sfrac AS (SELECT a.doc_id,
                             round(a.dup_tokens * 1.0
                                   / len(string_split(s4.text, ' ')), 6) AS f
                      FROM sagg a JOIN s4 USING (doc_id)),
            s5 AS (
              SELECT s4.doc_id, s4.text FROM s4 LEFT JOIN sfrac USING (doc_id)
              WHERE f IS NULL OR f <= 0.6
            ),
            s6k AS (SELECT min(doc_id) AS doc_id
                    FROM (SELECT md5(lower(text)) AS fp, doc_id FROM s5)
                    GROUP BY fp),
            s6 AS (SELECT s5.doc_id, s5.text FROM s5 JOIN s6k USING (doc_id)),
            tok7 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM s6),
            tk7 AS (SELECT * FROM tok7 WHERE token != ''),
            v7 AS (SELECT token, count(*) AS c FROM tk7 GROUP BY token),
            t7 AS (SELECT sum(c) AS s FROM v7),
            sc7 AS (SELECT doc_id, round(avg(ln(c * 1.0 / s)), 6) AS score
                    FROM tk7 JOIN v7 USING (token), t7 GROUP BY doc_id),
            tier AS (SELECT doc_id,
                            ntile(3) OVER (ORDER BY score DESC, doc_id) AS nb
                     FROM sc7),
            s7 AS (SELECT s6.doc_id, s6.text FROM s6 JOIN tier USING (doc_id)
                   WHERE nb <= 2),
            ch AS (SELECT coalesce(
                     CAST((sum(len(string_split(text, ' '))) + 511) // 512
                          AS BIGINT), 0) AS n FROM s7)
            SELECT '1_raw' AS stage, count(*) AS n FROM base
            UNION ALL SELECT '2_decontam', count(*) FROM s2
            UNION ALL SELECT '3_quality', count(*) FROM s3
            UNION ALL SELECT '4_repetition', count(*) FROM s4
            UNION ALL SELECT '5_substring', count(*) FROM s5
            UNION ALL SELECT '6_dedup', count(*) FROM s6
            UNION ALL SELECT '7_lm_tiers', count(*) FROM s7
            UNION ALL SELECT '8_chunks', (SELECT n FROM ch)
        """,
        # SemDeDup: nearest-of-8-fixed-centroids assignment (argmin L2,
        # tie-break cid) + cluster-local cosine sweep, keep-lowest-id.
        "backup_mount": """
            WITH src AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value
              FROM events WHERE event_type = 'click'
              ORDER BY event_id LIMIT 40
            )
            SELECT name, time, value FROM src
            ORDER BY name, time, value
        """,
        # timer facility: the .tql task aggregates events per type and
        # appends (name, count*1e9 ns, round(sum,6)); times surface in µs.
        "timer_fire": """
            SELECT event_type AS name,
                   count(*) * 1000000 AS time,
                   round(sum(value), 6) AS value
            FROM events GROUP BY event_type ORDER BY name
        """,
        # HTTP CSV source: the literal payload the local server returns
        "http_source": """
            SELECT CAST(id AS BIGINT) AS id, tag,
                   CAST(val AS DOUBLE) AS val
            FROM (VALUES (1, 'temp.a', 3.14), (2, 'temp.b', 2.71),
                         (3, 'hum.a', 55.5)) AS t(id, tag, val)
            ORDER BY id
        """,
        # TTL cache: the second lookup serves the identical aggregation
        "cache_hit": """
            SELECT event_type, count(*) AS cnt,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # WHEN/do(): the nested task appended exactly the matching rows
        # of the 60-event slice
        "when_do": """
            WITH sl AS (SELECT event_id, event_type, value FROM events
                        ORDER BY event_id LIMIT 60)
            SELECT event_id, round(value, 6) AS value
            FROM sl WHERE event_type = 'click'
            ORDER BY event_id
        """,
        # param('etype') = 'error' inlined
        "tql_args": """
            SELECT event_id, event_type, round(value, 6) AS value
            FROM events WHERE event_type = 'error'
            ORDER BY event_id
        """,
        # APPEND sink: the 50-row signup slice lands in the tag table
        "append_sink": """
            WITH sl AS (SELECT event_type AS name, epoch_us(ts) AS time,
                               value
                        FROM events WHERE event_type = 'signup'
                        ORDER BY event_id LIMIT 50)
            SELECT name, time, round(value, 6) AS value FROM sl
            ORDER BY time, value
        """,
        # DV delete: tombstoned rows vanish from every read; the
        # oracle is the equivalent double filter.
        "dv_delete": """
            SELECT event_id, user_id, event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS val
            FROM events
            WHERE event_id < 3000
              AND event_id % 7 <> 0
              AND user_id % 5 <> 0
            ORDER BY event_id
        """,
        # epoch shuffle: md5 is engine-portable, so the permutation
        # (and therefore the rank) reproduces exactly in SQL.
        "epoch_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                     ORDER BY md5(CAST(doc_id AS VARCHAR) || '-42'),
                              doc_id) - 1 AS BIGINT) AS shuffle_rank
            FROM documents ORDER BY doc_id
        """,
        # budget selection: one window cumsum in (score DESC, id) order.
        "budget_select": """
            WITH t AS (
              SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
              FROM documents),
            c AS (
              SELECT doc_id, score, toks,
                     CAST(sum(toks) OVER (ORDER BY score DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_tokens
              FROM t)
            SELECT doc_id, score, toks, cum_tokens
            FROM c WHERE cum_tokens <= 20000 ORDER BY doc_id
        """,
        # SCD2: rebuild the version table from the two snapshots.
        "table_clone": """
            SELECT event_id, user_id, event_type,
                   CAST(floor(value * 1000) AS BIGINT) AS val
            FROM events
            WHERE event_id < 3000 AND event_id % 5 <> 0
            ORDER BY event_id
        """,
        "corpus_diff": """
            WITH base AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000),
            v1 AS (SELECT * FROM base WHERE doc_id % 3 <> 0)
            SELECT doc_id, 'removed' AS change
            FROM v1 WHERE doc_id % 11 = 2
            UNION ALL
            SELECT doc_id, 'modified'
            FROM v1 WHERE doc_id % 11 <> 2 AND doc_id % 7 = 1
                     AND text IS NOT NULL
            UNION ALL
            SELECT doc_id, 'added'
            FROM base WHERE doc_id % 3 = 0
            ORDER BY doc_id, change
        """,
        "rollup_matview": """
            SELECT event_type AS name,
                   CAST((epoch_ns(ts) - epoch_ns(ts) % 60000000000)
                        // 1000 AS BIGINT) AS time,
                   count(*) AS cnt,
                   round(sum(value), 6) AS sum_v,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v,
                   round(sum(value) / count(*), 6) AS avg_v
            FROM events
            WHERE event_id < 6000
            GROUP BY 1, 2
            ORDER BY name, time
        """,
        "rollup_matview_distinct": """
            SELECT event_type AS name,
                   CAST((epoch_ns(ts) - epoch_ns(ts) % 60000000000)
                        // 1000 AS BIGINT) AS time,
                   count(*) AS cnt,
                   count(DISTINCT user_id % 8) AS devs
            FROM events
            WHERE event_id < 4000
            GROUP BY 1, 2
            ORDER BY name, time
        """,
        "matview_evolve": """
            WITH base AS (
              SELECT event_id, event_type AS name,
                     CAST(FLOOR(value * 1000) AS BIGINT) AS val,
                     CASE WHEN event_id % 2 <> 0
                          THEN CAST(FLOOR(value * 500) AS BIGINT)
                     END AS val2
              FROM events WHERE event_id < 3000)
            SELECT name, count(*) AS n,
                   CAST(sum(val) AS BIGINT) AS total,
                   CAST(sum(val2) AS BIGINT) AS wsum,
                   max(val2) AS whi
            FROM base GROUP BY name ORDER BY name
        """,
        "matview_evolve_recompute": """
            WITH base AS (
              SELECT event_id, event_type AS name,
                     CASE WHEN event_id % 2 <> 0
                          THEN CAST(FLOOR(value * 500) AS BIGINT)
                     END AS val2
              FROM events WHERE event_id < 3000)
            SELECT name, count(*) AS n, count(*) AS rows2,
                   arg_max(coalesce(val2, -1), event_id) AS v2last
            FROM base GROUP BY name ORDER BY name
        """,
        "show_rollup_gap": """
            WITH base AS (
              SELECT epoch_ns(ts) AS t FROM events
              WHERE event_id < 6000),
            built AS (
              SELECT t FROM base WHERE t < 1704844800000000000),
            lv(rollup_name, p) AS (VALUES
              ('sec',  CAST(1000000000 AS BIGINT)),
              ('min',  CAST(60000000000 AS BIGINT)),
              ('hour', CAST(3600000000000 AS BIGINT))),
            re AS (
              SELECT rollup_name,
                     CAST(max(t - t % p) + p AS BIGINT) AS rollup_end
              FROM lv, built GROUP BY rollup_name, p)
            SELECT rollup_name,
                   (SELECT max(t) FROM base) AS src_end_time,
                   rollup_end AS rollup_end_time,
                   (SELECT count(*) FROM base
                    WHERE t >= re.rollup_end) AS gap,
                   'SLEEPING' AS run_state
            FROM re ORDER BY rollup_name
        """,
        "show_lsm": """
            WITH days AS (
              SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS d
              FROM events
              WHERE event_id < 6000
                AND epoch_ns(ts) // 86400000000000 < 19731),
            k AS (SELECT d, d % 3 + 1 AS cnt FROM days)
            SELECT * FROM (
              SELECT 'd=' || CAST(d AS VARCHAR) AS table_name,
                     'TAG_DAY_IDX' AS index_name,
                     CAST(2 AS INTEGER) AS level,
                     CAST(cnt AS BIGINT) AS count
              FROM k
              UNION ALL
              SELECT 'd=' || CAST(d AS VARCHAR), 'TAG_DAY_IDX',
                     CAST(0 AS INTEGER), CAST(cnt AS BIGINT)
              FROM k)
            ORDER BY table_name, level
        """,
        "describe_history": """
            WITH ev AS (
              SELECT event_id FROM events WHERE event_id < 3000),
            c1 AS (SELECT count(*) AS n FROM ev WHERE event_id % 2 = 0),
            c2 AS (SELECT count(*) AS n FROM ev),
            c3 AS (SELECT count(*) AS n FROM ev WHERE event_id % 5 <> 0),
            c5 AS (SELECT (SELECT n FROM c3)
                          + (SELECT count(*) FROM events
                             WHERE event_id >= 3000 AND event_id < 3500)
                          AS n)
            SELECT * FROM (
              SELECT 'src' AS tbl, CAST(1 AS BIGINT) AS version,
                     'WRITE (append)' AS operation,
                     TRUE AS data_change,
                     CAST((SELECT n FROM c1) AS BIGINT) AS n_rows
              UNION ALL
              SELECT 'src', 2, 'WRITE (append)', TRUE,
                     (SELECT n FROM c2)
              UNION ALL
              SELECT 'src', 3, 'DML rewrite', TRUE, (SELECT n FROM c3)
              UNION ALL
              SELECT 'clone', 1, 'CLONE of SRC@v3', TRUE,
                     (SELECT n FROM c3)
              UNION ALL
              SELECT 'clone', 2, 'WRITE (append)', TRUE,
                     (SELECT n FROM c5)
            ) ORDER BY tbl, version
        """,
        "rollup_matview_firstlast": """
            SELECT event_type AS name,
                   CAST((epoch_ns(ts) - epoch_ns(ts) % 60000000000)
                        // 1000 AS BIGINT) AS time,
                   round(arg_min(value, epoch_ns(ts)), 6) AS first_v,
                   round(arg_max(value, epoch_ns(ts)), 6) AS last_v,
                   count(*) AS cnt
            FROM events
            WHERE event_id < 4000
            GROUP BY 1, 2
            ORDER BY name, time
        """,
        "stream_scd2": """
            WITH base AS (
              SELECT event_type || '-' || CAST(user_id % 40 AS VARCHAR)
                       AS name,
                     event_id,
                     CAST(floor(value * 1000) AS DOUBLE) AS value
              FROM events WHERE event_id < 3000),
            s AS (
              SELECT name, CAST(1000 AS BIGINT) AS eff,
                     max(value) AS value
              FROM base WHERE event_id < 1000 GROUP BY name
              UNION ALL
              SELECT name, CAST(2000 AS BIGINT), max(value)
              FROM base WHERE event_id >= 1000 AND event_id < 2000
              GROUP BY name
              UNION ALL
              SELECT name, CAST(3000 AS BIGINT), max(value)
              FROM base WHERE event_id >= 2000 AND event_id < 3000
              GROUP BY name),
            dedup AS (
              SELECT name, eff, value FROM (
                SELECT name, eff, value,
                       lag(value) OVER (PARTITION BY name ORDER BY eff)
                         AS pv
                FROM s)
              WHERE pv IS NULL OR pv <> value),
            vers AS (
              SELECT name, value, eff AS _valid_from,
                     lead(eff) OVER (PARTITION BY name ORDER BY eff)
                       AS _valid_to
              FROM dedup)
            SELECT name, value, _valid_from, _valid_to,
                   (_valid_to IS NULL) AS _is_current
            FROM vers
            ORDER BY name, _valid_from
        """,
        "scd2_dimension": """
            WITH w1 AS (
              SELECT user_id % 200 AS k, max(event_type) AS attr
              FROM events WHERE event_id < 1500 GROUP BY 1),
            w2 AS (
              SELECT user_id % 200 AS k, max(event_type) AS attr
              FROM events WHERE event_id >= 1500 AND event_id < 3000
              GROUP BY 1),
            closed AS (
              SELECT w1.k, w1.attr,
                     CAST(1000 AS BIGINT) AS _valid_from,
                     CAST(2000 AS BIGINT) AS _valid_to,
                     FALSE AS _is_current
              FROM w1 JOIN w2 ON w1.k = w2.k WHERE w1.attr <> w2.attr),
            cur AS (
              SELECT COALESCE(w2.k, w1.k) AS k,
                     CASE WHEN w2.k IS NULL THEN w1.attr
                          WHEN w1.k IS NULL THEN w2.attr
                          WHEN w1.attr = w2.attr THEN w1.attr
                          ELSE w2.attr END AS attr,
                     CAST(CASE WHEN w2.k IS NULL THEN 1000
                          WHEN w1.k IS NULL THEN 2000
                          WHEN w1.attr = w2.attr THEN 1000
                          ELSE 2000 END AS BIGINT) AS _valid_from,
                     CAST(NULL AS BIGINT) AS _valid_to,
                     TRUE AS _is_current
              FROM w1 FULL OUTER JOIN w2 ON w1.k = w2.k)
            SELECT k, attr, _valid_from, _valid_to, _is_current
            FROM (SELECT * FROM closed UNION ALL SELECT * FROM cur)
            ORDER BY k, _valid_from
        """,
        # streaming CDC upsert: wave-2 times strictly exceed wave-1's,
        # so the upserted state == global latest-per-key in one window.
        "streaming_upsert": """
            WITH base AS (
              SELECT 'u' || CAST(user_id % 97 AS VARCHAR) AS name,
                     event_id AS time,
                     CAST(FLOOR(value * 1000) AS DOUBLE) AS value
              FROM events WHERE event_id < 3000),
            r AS (SELECT name, time, value,
                         row_number() OVER (PARTITION BY name
                                            ORDER BY time DESC) AS rn
                  FROM base)
            SELECT name, time, value FROM r WHERE rn = 1 ORDER BY name
        """,
        # authenticated query flow: the rows travelled login -> key ->
        # gated /db/query; the oracle recomputes the aggregate directly.
        "auth_flow": """
            SELECT event_type AS name, count(*) AS n,
                   round(sum(value), 6) AS sv
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # incremental materialized view: recompute from raw rows; the
        # HLL estimate is exact at <=8 distinct per group (coupon mode).
        "stream_matview": """
            WITH base AS (
              SELECT event_type AS name,
                     CAST(FLOOR(value * 1000) AS BIGINT) AS val
              FROM events WHERE event_id < 3000)
            SELECT name, count(*) AS n,
                   CAST(sum(val) AS BIGINT) AS total,
                   min(val) AS lo, max(val) AS hi
            FROM base GROUP BY name ORDER BY name
        """,
        "matview_incr": """
            WITH base AS (
              SELECT event_type AS name,
                     CAST(FLOOR(value * 1000) AS BIGINT) AS val,
                     user_id % 8 AS u
              FROM events WHERE event_id < 3000)
            SELECT name, count(*) AS n,
                   CAST(sum(val) AS BIGINT) AS total,
                   min(val) AS lo, max(val) AS hi,
                   round(sum(val) * 1.0 / count(val), 6) AS mean,
                   count(DISTINCT u) AS users
            FROM base GROUP BY name ORDER BY name
        """,
        # overlapping token chunking: DuckDB list slicing mirrors the
        # Spark slice() arithmetic exactly (both 1-based inclusive).
        "doc_chunks": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks,
                     len(string_split(text, ' ')) AS n
              FROM documents WHERE doc_id % 5 = 0),
            c AS (
              SELECT doc_id, toks,
                     unnest(range(CASE WHEN n <= 64 THEN 1
                         ELSE 1 + CAST(ceil((n - 64) / 56.0) AS BIGINT)
                         END)) AS chunk_id
              FROM t)
            SELECT doc_id, chunk_id,
                   len(toks[chunk_id*56+1 : chunk_id*56+64])
                     AS chunk_tokens,
                   array_to_string(toks[chunk_id*56+1 : chunk_id*56+64],
                                   ' ') AS chunk
            FROM c ORDER BY doc_id, chunk_id
        """,
        # copy-on-write DML: the oracle replays DELETE -> UPDATE ->
        # MERGE as pure SQL set algebra over the same base selection.
        "txlog_dml": """
            WITH base AS (
              SELECT event_id, user_id, event_type,
                     CAST(FLOOR(value * 1000) AS BIGINT) AS val
              FROM events WHERE event_id < 3000),
            after_del AS (SELECT * FROM base WHERE event_id % 7 <> 0),
            after_upd AS (
              SELECT event_id, user_id, event_type,
                     CASE WHEN event_id % 5 = 0 THEN val * 2
                          ELSE val END AS val
              FROM after_del),
            src AS (
              SELECT event_id, user_id, 'merged' AS event_type,
                     CAST(-1 AS BIGINT) AS val
              FROM base WHERE event_id % 11 = 0
              UNION ALL
              SELECT event_id + 100000, user_id, 'inserted',
                     CAST(-2 AS BIGINT)
              FROM base WHERE event_id % 13 = 0)
            SELECT event_id, user_id, event_type, val FROM (
              SELECT * FROM after_upd
              WHERE event_id NOT IN (SELECT event_id FROM src)
              UNION ALL SELECT * FROM src)
            ORDER BY event_id
        """,
        # txlog: two committed epochs (one replayed into a no-op) cover
        # all 30 selected rows; the orphaned file never surfaces.
        "txlog_table": """
            SELECT event_id, event_type AS name, epoch_us(ts) AS time,
                   value
            FROM events WHERE event_type = 'click'
            ORDER BY event_id LIMIT 30
        """,
        # CDF-maintained per-tag stats: recomputed from raw events; the
        # last value per tag is the value at max ts (ties broken by
        # larger value, matching Spark's max_by(v, struct(t, v))).
        "tag_stat_incremental": """
            WITH s AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY ts DESC, value DESC) AS rn
              FROM events WHERE event_id < 3000
            )
            SELECT name, count(*) AS row_count,
                   min(time) AS min_time, max(time) AS max_time,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   round(min(CASE WHEN rn = 1 THEN value END), 6)
                     AS last_value
            FROM s GROUP BY name ORDER BY name
        """,
        # HLL distinct rollup: per-bucket cardinality <= 10 keeps the
        # sketch in its exact coupon range, so the estimate IS the
        # exact count.
        "rollup_distinct": """
            SELECT event_type AS name,
                   epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS time,
                   count(*) AS cnt,
                   count(DISTINCT user_id) AS users
            FROM events WHERE event_id < 3000
            GROUP BY 1, 2 ORDER BY name, time
        """,
        # z-order pruned read: the oracle is the plain filter — pruning
        # may only change which files are read, never the rows.
        "zorder_prune": """
            SELECT event_id, event_type AS name, epoch_us(ts) AS time,
                   value
            FROM events
            WHERE ts < TIMESTAMP '2024-01-15' AND value <= 100.0e0
            ORDER BY event_id
        """,
        # live sqlite bridge: the aggregate ran IN the external engine;
        # the oracle recomputes it from the native events table.
        "bridge_sql": """
            SELECT event_type AS name, count(*) AS cnt,
                   round(sum(value), 6) AS sum_value,
                   min(epoch_us(ts)) AS first_time
            FROM events WHERE event_id < 1000 AND value > 100
            GROUP BY 1 ORDER BY name
        """,
        # txlog-backed streaming rollup: per-second per-tag aggregates
        # recomputed from raw events (bucket in exact epoch-ns — second
        # boundaries are µs-exact so DuckDB's ns->µs truncation cannot
        # move a row across one).
        "rollup_txlog": """
            SELECT event_type AS name,
                   epoch_ns(ts) - epoch_ns(ts) % 1000000000 AS time,
                   count(*) AS cnt,
                   round(sum(value), 6) AS sum_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events WHERE event_id < 2000
            GROUP BY 1, 2 ORDER BY name, time
        """,
        # subscriber facility: the drained queue IS the literal payloads
        # (times written in ns, surfaced in µs).
        "subscriber_flow": """
            SELECT name, CAST(time AS BIGINT) AS time,
                   CAST(value AS DOUBLE) AS value FROM (VALUES
                ('sens.a', 1000000, 1.5),
                ('sens.a', 2000000, 3.25),
                ('sens.b', 1000000, 2.5)
            ) AS t(name, time, value)
            ORDER BY name, time
        """,
        "watch_latest": """
            WITH latest AS (
              SELECT event_type AS name, epoch_us(ts) AS time, value,
                     event_id,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
              FROM events
              WHERE event_type IN ('click', 'view', 'error')
            )
            SELECT name, time, value, event_id FROM latest
            WHERE rn = 1 ORDER BY name
        """,
        "semdedup": """
            WITH c AS (SELECT vec_id AS cid, embedding AS cv
                       FROM embeddings WHERE vec_id < 32),
            d AS (SELECT e.vec_id, c.cid,
                         sum((CAST(e.embedding[t.i] AS DOUBLE) - CAST(c.cv[t.i] AS DOUBLE))
                             * (CAST(e.embedding[t.i] AS DOUBLE) - CAST(c.cv[t.i] AS DOUBLE))) AS d2
                  FROM embeddings e, c, range(1, 65) t(i)
                  GROUP BY e.vec_id, c.cid),
            asg AS (SELECT vec_id, cid FROM
                      (SELECT vec_id, cid,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cid) AS rk
                       FROM d) WHERE rk = 1),
            pe AS (SELECT a.vec_id, a.cid, e.embedding
                   FROM asg a JOIN embeddings e USING (vec_id)),
            pc AS (SELECT x.vec_id AS ida,
                          sum(CAST(x.embedding[t.i] AS DOUBLE) * CAST(y.embedding[t.i] AS DOUBLE)) AS dot,
                          sum(CAST(x.embedding[t.i] AS DOUBLE) * CAST(x.embedding[t.i] AS DOUBLE)) AS sa,
                          sum(CAST(y.embedding[t.i] AS DOUBLE) * CAST(y.embedding[t.i] AS DOUBLE)) AS sb
                   FROM pe x JOIN pe y ON x.cid = y.cid AND x.vec_id > y.vec_id,
                        range(1, 65) t(i)
                   GROUP BY x.vec_id, y.vec_id),
            mx AS (SELECT ida AS vec_id, max(cosv) AS mc
                   FROM (SELECT ida, dot / (sqrt(sa) * sqrt(sb)) AS cosv FROM pc)
                   WHERE cosv >= 0.4 GROUP BY ida)
            SELECT a.vec_id, a.cid, mx.vec_id IS NULL AS keep,
                   round(mx.mc, 6) AS max_dup_cos
            FROM asg a LEFT JOIN mx USING (vec_id)
            ORDER BY a.vec_id
        """,
        # Mixture plan/sample share this arithmetic: target = budget*w/wsum,
        # rate = least(max_epochs, target/have), split into floor + round-6
        # fraction.  Literals mirror MIX_WEIGHTS / MIX_BUDGET exactly.
        "mixture_plan": f"""
            WITH w(domain, w) AS (VALUES {", ".join(f"('{d}', {v!r})" for d, v in sorted(MIX_WEIGHTS.items()))}),
            h AS (SELECT source AS domain,
                         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS have
                  FROM documents GROUP BY source),
            p AS (SELECT w.domain, coalesce(h.have, 0) AS have_tokens,
                         {MIX_BUDGET!r} * w.w / {sum(MIX_WEIGHTS.values())!r} AS target,
                         CASE WHEN coalesce(h.have, 0) = 0 THEN 0.0
                              ELSE least(4.0, ({MIX_BUDGET!r} * w.w / {sum(MIX_WEIGHTS.values())!r})
                                              / coalesce(h.have, 0)) END AS rate
                  FROM w LEFT JOIN h USING (domain))
            SELECT domain, have_tokens, round(target, 6) AS target_tokens,
                   CAST(floor(rate) AS INTEGER) AS epochs,
                   round(rate - floor(rate), 6) AS frac
            FROM p ORDER BY domain
        """,
        "data_mixture": f"""
            WITH w(domain, w) AS (VALUES {", ".join(f"('{d}', {v!r})" for d, v in sorted(MIX_WEIGHTS.items()))}),
            h AS (SELECT source AS domain,
                         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS have
                  FROM documents GROUP BY source),
            p AS (SELECT w.domain,
                         CASE WHEN coalesce(h.have, 0) = 0 THEN 0.0
                              ELSE least(4.0, ({MIX_BUDGET!r} * w.w / {sum(MIX_WEIGHTS.values())!r})
                                              / coalesce(h.have, 0)) END AS rate
                  FROM w LEFT JOIN h USING (domain)),
            pf AS (SELECT domain, CAST(floor(rate) AS BIGINT) AS epochs,
                          round(rate - floor(rate), 6) AS frac FROM p),
            z AS (SELECT d.doc_id, d.source AS domain,
                         list_filter(generate_series(0, pf.epochs), ep ->
                             ep < pf.epochs
                             OR (pf.frac > 0 AND
                                 substr(md5(d.doc_id::VARCHAR || '#' || ep::VARCHAR), 1, 8) <=
                                 printf('%08x', CAST(floor(pf.frac * 4294967296.0) AS BIGINT) - 1))
                         ) AS eps
                  FROM documents d JOIN pf ON d.source = pf.domain),
            ux AS (SELECT doc_id, domain, unnest(eps) AS ep FROM z)
            SELECT doc_id, domain, CAST(ep AS INTEGER) AS epoch
            FROM ux ORDER BY doc_id, epoch
        """,
        # IVF-PQ: deterministic first-16 codebook (iters=0), per-subspace
        # argmin encode (tie-break lowest code), ADC lookup-table top-20.
        "similarity_pq": """
            WITH cb AS (
              SELECT s.sub, CAST(e.vec_id AS INTEGER) AS code,
                     list_transform(generate_series(1, 8),
                         i -> CAST(e.embedding[s.sub * 8 + i] AS DOUBLE)) AS cv
              FROM embeddings e, range(0, 8) s(sub) WHERE e.vec_id < 16),
            sv AS (
              SELECT e.vec_id, s.sub,
                     list_transform(generate_series(1, 8),
                         i -> CAST(e.embedding[s.sub * 8 + i] AS DOUBLE)) AS sv
              FROM embeddings e, range(0, 8) s(sub) WHERE e.vec_id <> 0),
            d AS (
              SELECT sv.vec_id, sv.sub, cb.code,
                     list_sum(list_transform(generate_series(1, 8),
                         i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))) AS d2
              FROM sv JOIN cb USING (sub)),
            enc AS (
              SELECT vec_id, sub, code FROM
                (SELECT vec_id, sub, code,
                        row_number() OVER (PARTITION BY vec_id, sub
                                           ORDER BY d2, code) AS rk
                 FROM d) WHERE rk = 1),
            q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
            lut AS (
              SELECT cb.sub, cb.code,
                     list_sum(list_transform(generate_series(1, 8),
                         i -> (cb.cv[i] - CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE))
                            * (cb.cv[i] - CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE)))) AS pd2
              FROM cb, q),
            sc AS (SELECT enc.vec_id, sum(pd2) AS adc
                   FROM enc JOIN lut USING (sub, code) GROUP BY enc.vec_id)
            SELECT vec_id, round(adc, 6) AS adc_d2
            FROM sc ORDER BY adc, vec_id LIMIT 20
        """,
        # shard_plan: shard = floor(running start offset / budget) over the
        # doc_id-ordered token stream.
        "shard_export": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(floor(coalesce(sum(len(string_split(text, ' ')))
                         OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) / 5000) AS BIGINT) AS shard_id
            FROM documents ORDER BY doc_id
        """,
        # normalize_text: control strip -> space collapse -> trim -> NFC,
        # with the same synthetic combining/control weave as the Spark side.
        "text_normalize": """
            SELECT doc_id,
                   nfc_normalize(trim(regexp_replace(regexp_replace(
                       'Cafe' || chr(769) || '  ' || chr(7) || text
                           || '  stran' || chr(771) || 'o',
                       '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
                       ' {2,}', ' ', 'g'))) AS norm_text
            FROM documents ORDER BY doc_id
        """,
        # fastText-architecture scorer: hashed unigram+bigram features,
        # md5-derived pseudo-weights in [-1,1), mean-pooled margin, sigmoid.
        "quality_classifier": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            u AS (SELECT doc_id, unnest(tk) AS f FROM t
                  UNION ALL
                  SELECT doc_id,
                         unnest(list_transform(generate_series(1, len(tk) - 1),
                                               i -> tk[i] || '_' || tk[i + 1])) AS f
                  FROM t),
            m AS (SELECT doc_id,
                         sum((('0x' || substr(md5(f), 1, 8))::BIGINT / 4294967296.0)
                             * 2.0 - 1.0) / count(*) AS s
                  FROM u GROUP BY doc_id)
            SELECT doc_id, round(s, 6) AS margin,
                   round(1.0 / (1.0 + exp(-s)), 6) AS clf_score,
                   s >= 0.0 AS keep
            FROM m ORDER BY doc_id
        """,
    }
