"""HISTOGRAM / BOXPLOT standalone statistics MAPs (SURVEY §2.3).

Reference semantics: mods/tql/fm_stat.go (HISTOGRAM 36-290, BOXPLOT 294-530,
IQR whiskers 357-359); streaming merging histogram mods/nums/histogram.go:49-91
(Ben-Haim/Tom-Tov-style nearest-bin merge).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _c(expr: Column | str) -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


def histogram(
    df: DataFrame,
    value: Column | str,
    bin_min: float,
    bin_max: float,
    bin_step: float,
    category: str | None = None,
    order: Sequence[str] | None = None,
    categories: Sequence[str] | None = None,
) -> DataFrame:
    """HISTOGRAM(v, bins(min,max,step) [, category()]) — fixed-step bins.

    Matches the reference's predicted-bins path (fm_stat.go:36-290): bins cover
    [min, max) at ``step``; values outside clamp into the first/last bin (the
    reference grows edge bins).  Output: (low, high, count) with one count
    column per category when ``category`` is given (pivot).

    Scale shape: one narrow projection + hash aggregate on ~(range/step) keys;
    the bin grid join is broadcast.

    EXACT bucket structure (fm_stat.go NewBuckets:265-291): an UNDERFLOW
    bin (-Inf, min) and an OVERFLOW bin [min+n*step, +Inf) bracket the
    int((max-min)/step) inner bins; out-of-range values land in them, and
    an edge bin is emitted only when its total count (across categories)
    is non-zero (fm_stat.go:112-114)."""
    n_inner = int((bin_max - bin_min) / bin_step)
    n = n_inner + 2
    v = _c(value).cast("double")
    # int() in Go truncates TOWARD ZERO (fm_stat.go:282), so values in
    # (min-step, min) index to 0+1 = the FIRST REAL BIN, not underflow;
    # the underflow bucket only receives fv <= min-step.  Spark's
    # double->int cast has the same truncation semantics.
    idx = (((v - F.lit(bin_min)) / F.lit(bin_step)).cast("int")
           + F.lit(1))
    idx = F.when(idx < 0, 0).when(idx >= n, n - 1).otherwise(idx)
    binned = df.withColumn("__bin", idx)
    spark = df.sparkSession
    inf = float("inf")
    grid = spark.range(n).select(
        F.col("id").cast("int").alias("__bin"),
        F.when(F.col("id") == 0, F.lit(-inf))
        .otherwise(F.lit(bin_min) + (F.col("id") - 1) * F.lit(bin_step))
        .alias("low"),
        F.when(F.col("id") == n - 1, F.lit(inf))
        .otherwise(F.lit(bin_min) + F.col("id") * F.lit(bin_step))
        .alias("high"),
    )
    if category:
        # known ``categories`` skip the distinct-values pre-job an open
        # pivot() runs (a full extra pass over the category column)
        counts = binned.groupBy("__bin").pivot(category, list(categories) if categories else None).count()
        out = F.broadcast(grid).join(counts, "__bin", "left")
        cat_cols = [c for c in counts.columns if c != "__bin"]
        # sortCategoryNames (fm_stat.go:196-221): categories named in
        # order() first (in that order), the REST follow sorted ascending
        # — a partial order() must not drop unlisted categories
        if order:
            ordered = ([c for c in order if c in cat_cols]
                       + sorted(c for c in cat_cols if c not in set(order)))
        else:
            ordered = sorted(cat_cols)
        # backtick-escape: category values may contain dots ("Cat.A")
        # which bare F.col would parse as struct access
        def _cc(c):
            return F.col("`%s`" % c.replace("`", "``"))
        for c in ordered:
            out = out.withColumn(c, F.coalesce(_cc(c), F.lit(0)))
        total = sum((_cc(c) for c in ordered), F.lit(0))
        out = out.filter(~(((F.col("__bin") == 0) | (F.col("__bin") == n - 1))
                           & (total == 0)))
        out = out.select("low", "high", *[_cc(c) for c in ordered])
    else:
        counts = binned.groupBy("__bin").agg(F.count(F.lit(1)).alias("count"))
        out = (
            F.broadcast(grid).join(counts, "__bin", "left")
            .select("__bin", "low", "high",
                    F.coalesce(F.col("count"), F.lit(0)).alias("count"))
        )
        out = out.filter(~(((F.col("__bin") == 0) | (F.col("__bin") == n - 1))
                           & (F.col("count") == 0))).drop("__bin")
    return out.orderBy("low")


def histogram_streaming(df: DataFrame, value: Column | str, max_bins: int = 100,
                        category: str | None = None) -> DataFrame:
    """HISTOGRAM without bins(): streaming merging histogram, default 100 bins
    (mods/nums/histogram.go:49-91).

    Spark's ``histogram_numeric`` implements the same Ben-Haim/Tom-Tov merge —
    a single-pass, mergeable sketch (partial aggregation works, so it scales
    like any hash aggregate).  Output: (x, y) bin centroids and heights,
    optionally per category.
    """
    v = _c(value).cast("double")
    keys = [category] if category else []
    sketch = df.groupBy(*keys).agg(F.histogram_numeric(v, F.lit(max_bins)).alias("h"))
    out = sketch.select(*keys, F.explode("h").alias("bin")).select(
        *keys, F.col("bin.x").alias("x"), F.col("bin.y").alias("y")
    )
    return out.orderBy(*keys, "x")


def histogram_stream_exact(df: DataFrame, value: Column | str,
                           max_bins: int, category: str,
                           order_by: Sequence[str]) -> DataFrame:
    """The reference's streaming histogram, EXACTLY (mods/nums/histogram.go
    Add:49-65 + trim:67-90): per category, values are inserted one at a
    time in ``order_by`` sequence — a new (v, 1) bin goes before the first
    strictly-greater bin — and whenever the bin count exceeds ``max_bins``
    the FIRST minimal adjacent gap is merged into its weighted centroid.

    This sequential contract is the reference's own semantic (one sketch
    per series, single goroutine); it is reproducible bit-for-bit by a SQL
    recursive CTE, which is what certifies the operator.  Each category is
    one Arrow batch in applyInPandas, so categories parallelize across the
    cluster while the per-series loop stays faithful.  For the
    orderless/mergeable 100 TB path use ``histogram_streaming`` above
    (histogram_numeric: partial aggregation, no sequence dependence).

    Output: (category, b, x, y) — b is the 1-based bin position.
    """
    import bisect

    import pandas as pd

    val_col, cat_col = "__hv", category
    prep = df.select(
        F.col(cat_col),
        _c(value).cast("double").alias(val_col),
        *[F.col(c) for c in order_by])

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(list(order_by), kind="mergesort")
        xs: list[float] = []
        ys: list[float] = []
        for v in pdf[val_col]:
            k = bisect.bisect_right(xs, v)   # before first strictly-greater
            xs.insert(k, float(v))
            ys.insert(k, 1.0)
            if len(xs) > max_bins:           # trim: first minimal gap merges
                bj, bd = 1, xs[1] - xs[0]
                for j in range(2, len(xs)):
                    dv = xs[j] - xs[j - 1]
                    if dv < bd:
                        bj, bd = j, dv
                cnt = ys[bj] + ys[bj - 1]
                merged = (xs[bj] * ys[bj] + xs[bj - 1] * ys[bj - 1]) / cnt
                xs[bj - 1:bj + 1] = [merged]
                ys[bj - 1:bj + 1] = [cnt]
        return pd.DataFrame({
            cat_col: pdf[cat_col].iloc[0],
            "b": range(1, len(xs) + 1), "x": xs, "y": ys})

    out_schema = f"{cat_col} string, b long, x double, y double"
    return (prep.groupBy(cat_col).applyInPandas(run, out_schema)
            .orderBy(cat_col, "b"))


def boxplot(
    df: DataFrame,
    value: Column | str,
    category: Column | str,
    interpolated: bool = False,
) -> DataFrame:
    """BOXPLOT(v, category()) — quartiles + 1.5·IQR whiskers per category
    (fm_stat.go:294-530, IQR at 357-359).

    Output per category: (category, min, lower_whisker, q1, median, q3,
    upper_whisker, max, outlier_count).  Whiskers are clamped to the data
    range like standard Tukey boxplots.
    """
    v = _c(value).cast("double")
    cat = _c(category)
    if interpolated:
        q = F.percentile(v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    else:
        q = F.percentile_approx(v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(2147483647))
    stats = df.groupBy(cat.alias("category")).agg(
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        q.alias("q"),
        F.count(v).alias("n"),
    ).select(
        "category", "min", "max", "n",
        F.col("q")[0].alias("q1"), F.col("q")[1].alias("median"), F.col("q")[2].alias("q3"),
    ).withColumn("iqr", F.col("q3") - F.col("q1")).withColumn(
        "lower_whisker", F.greatest(F.col("min"), F.col("q1") - 1.5 * F.col("iqr"))
    ).withColumn(
        "upper_whisker", F.least(F.col("max"), F.col("q3") + 1.5 * F.col("iqr"))
    )
    outliers = df.select(cat.alias("category"), v.alias("__v")).join(
        F.broadcast(stats.select("category", "lower_whisker", "upper_whisker")), "category"
    ).filter((F.col("__v") < F.col("lower_whisker")) | (F.col("__v") > F.col("upper_whisker"))).groupBy(
        "category"
    ).agg(F.count(F.lit(1)).alias("outlier_count"))
    return (
        stats.join(outliers, "category", "left")
        .withColumn("outlier_count", F.coalesce(F.col("outlier_count"), F.lit(0)))
        .select("category", "min", "lower_whisker", "q1", "median", "q3",
                "upper_whisker", "max", "outlier_count")
        .orderBy("category")
    )
