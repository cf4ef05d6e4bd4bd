"""GROUP / GROUPBYKEY aggregation with timewindow and gap-fill (SURVEY §2.3).

Reference semantics: mods/tql/fm_monad.go:354-633 (GROUP core), aggregate
buffers 1153-1508, timewindow flooring 660-666, out-of-range drop 426-435,
empty-bucket fill 622-633.  Reference "lazy" mode (buffer all, emit sorted by
key at EOF) is the semantic we reproduce; emit-on-key-change is a single-node
optimization of sorted input that hash aggregation subsumes.

Spark shape: ``groupBy().agg()`` — partial (map-side) aggregation + AQE do the
heavy lifting; gap-fill is a generated calendar ``sequence()`` left-join (no
driver-side loop); linear/previous interpolation is pure window expressions
(stays in whole-stage codegen, no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _c(expr: Column | str) -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


def _guard(col: Column, where: Column | str | None) -> Column:
    """Per-aggregate where() filter (fm_monad.go:717-720) via NULL masking."""
    if where is None:
        return col
    return F.when(_c(where), col)


#: Percentile scale guard.  ``None`` (default) = EXACT percentiles —
#: reference parity, but the exact forms buffer per group (sort-based
#: `percentile`, max-accuracy `percentile_approx` sketches, collect_list
#: for the gonum LinInterp form).  On extreme group sizes (100 TB tag
#: cardinality skew: one tag holding billions of rows) set a finite
#: accuracy to cut every quantile/median over to a bounded-memory
#: KLL-style sketch: error <= 1/accuracy of the group's rank range.
#: ``percentile_accuracy(10_000)`` is a good production default.
_PERCENTILE_ACCURACY: int | None = None
_EXACT_ACCURACY = 2147483647  # percentile_approx's maximum = exact


def percentile_accuracy(accuracy: int | None) -> int | None:
    """Set (and return the previous) global percentile accuracy.  ``None``
    restores exact semantics; an int bounds per-group aggregation memory at
    the cost of rank error <= 1/accuracy (see module note above)."""
    global _PERCENTILE_ACCURACY
    prev = _PERCENTILE_ACCURACY
    _PERCENTILE_ACCURACY = accuracy
    return prev


def _accuracy() -> int:
    return _PERCENTILE_ACCURACY or _EXACT_ACCURACY


class agg:
    """Aggregate constructors mirroring newAggregate (fm_monad.go:811-838).

    Each returns an aliased Column ready for ``DataFrame.agg``.  ``where``
    reproduces the per-aggregate where() option.
    """

    @staticmethod
    def count(col: Column | str = "*", name: str = "count", where=None) -> Column:
        c = F.lit(1) if col == "*" else _c(col)
        return F.count(_guard(c, where)).alias(name)

    @staticmethod
    def sum(col, name="sum", where=None) -> Column:
        return F.sum(_guard(_c(col), where)).alias(name)

    @staticmethod
    def min(col, name="min", where=None) -> Column:
        return F.min(_guard(_c(col), where)).alias(name)

    @staticmethod
    def max(col, name="max", where=None) -> Column:
        return F.max(_guard(_c(col), where)).alias(name)

    @staticmethod
    def avg(col, name="avg", where=None) -> Column:
        return F.avg(_guard(_c(col), where)).alias(name)

    mean = avg  # weighted mean variant: use wavg

    @staticmethod
    def first(col, order, name="first", where=None) -> Column:
        """First by arrival order == min over the order column (min_by).
        A where() guard must exclude non-matching rows from the ORDER side
        too — min_by over a guarded value alone would still pick the
        globally-first row and return its NULL."""
        o = _c(order) if where is None else F.when(where, _c(order))
        return F.min_by(_guard(_c(col), where), o).alias(name)

    @staticmethod
    def last(col, order, name="last", where=None) -> Column:
        o = _c(order) if where is None else F.when(where, _c(order))
        return F.max_by(_guard(_c(col), where), o).alias(name)

    @staticmethod
    def rss(col, name="rss", where=None) -> Column:
        """√Σx² (fm_monad.go:1426-1429)."""
        c = _guard(_c(col), where)
        return F.sqrt(F.sum(c * c)).alias(name)

    @staticmethod
    def rms(col, name="rms", where=None) -> Column:
        """√(Σx²/n)."""
        c = _guard(_c(col), where)
        return F.sqrt(F.avg(c * c)).alias(name)

    @staticmethod
    def variance(col, name="variance", where=None) -> Column:
        return F.var_samp(_guard(_c(col), where)).alias(name)

    @staticmethod
    def stddev(col, name="stddev", where=None) -> Column:
        return F.stddev_samp(_guard(_c(col), where)).alias(name)

    @staticmethod
    def stderr(col, name="stderr", where=None) -> Column:
        c = _guard(_c(col), where)
        return (F.stddev_samp(c) / F.sqrt(F.count(c))).alias(name)

    @staticmethod
    def median(col, name="median", where=None) -> Column:
        """Empirical (non-interpolated) median — an actual element of the group
        (gonum stat.Quantile Empirical, fm_monad.go:1325-1335).  Honors the
        ``percentile_accuracy`` scale guard."""
        return F.percentile_approx(_guard(_c(col), where), F.lit(0.5),
                                   F.lit(_accuracy())).alias(name)

    @staticmethod
    def median_interpolated(col, name="median", where=None) -> Column:
        """Sort-based exact by default; under a finite
        ``percentile_accuracy`` cuts over to the bounded-memory sketch
        (approximate, no interpolation — documented non-parity trade)."""
        c = _guard(_c(col), where)
        if _PERCENTILE_ACCURACY:
            return F.percentile_approx(c, F.lit(0.5), F.lit(_accuracy())).alias(name)
        return F.percentile(c, F.lit(0.5)).alias(name)

    @staticmethod
    def quantile(col, p: float, name="quantile", where=None) -> Column:
        return F.percentile_approx(_guard(_c(col), where), F.lit(p),
                                   F.lit(_accuracy())).alias(name)

    @staticmethod
    def quantile_interpolated(col, p: float, name="quantile", where=None) -> Column:
        """See median_interpolated for the accuracy cutover."""
        c = _guard(_c(col), where)
        if _PERCENTILE_ACCURACY:
            return F.percentile_approx(c, F.lit(p), F.lit(_accuracy())).alias(name)
        return F.percentile(c, F.lit(p)).alias(name)

    @staticmethod
    def quantile_lininterp(col, p: float, name="quantile", where=None) -> Column:
        """gonum LinInterp empirical quantile — exact parity with the
        reference's quantileInterpolated/medianInterpolated (fm_monad.go:1325
        feeds gonum stat.Quantile(LinInterp)), which interpolates on the
        CUMULATIVE-WEIGHT axis, not the usual type-7 sample axis: for unit
        weights and f = p·n, the result is x_{i-1} + (f-(i-1))·(x_i - x_{i-1})
        with i = ⌈f⌉ (1-indexed sorted values), clamped to x_1 when f ≤ 1.
        median([1,2,3]) = 1.5 here vs 2.0 for SQL percentile — pinned by the
        TestLoader_groupbykey golden.

        SCALE: array-buffering form (collect_list + sort) — for the TQL GROUP
        shapes whose groups are bounded (one series / one bucket); use the
        SQL `percentile` family when type-7 semantics are acceptable.
        """
        c = _guard(_c(col), where).cast("double")
        xs = F.array_sort(F.collect_list(c))
        n = F.size(xs).cast("double")
        fidx = F.lit(float(p)) * n
        i = F.greatest(F.ceil(fidx).cast("int"), F.lit(1))
        lo = F.element_at(xs, F.greatest(i - 1, F.lit(1)))
        hi = F.element_at(xs, i)
        t = fidx - (i.cast("double") - F.lit(1.0))
        return (
            F.when(fidx <= 1.0, F.element_at(xs, 1))
            .otherwise(lo + t * (hi - lo))
            .alias(name)
        )

    @staticmethod
    def median_lininterp(col, name="median", where=None) -> Column:
        return agg.quantile_lininterp(col, 0.5, name, where)

    @staticmethod
    def cdf(col, q: float | Column, name="cdf", where=None) -> Column:
        """P(x <= q) within the group."""
        c = _guard(_c(col), where)
        qv = q if isinstance(q, Column) else F.lit(q)
        return F.avg(F.when(c <= qv, 1.0).otherwise(0.0)).alias(name)

    @staticmethod
    def mode(col, name="mode", where=None) -> Column:
        return F.mode(_guard(_c(col), where)).alias(name)

    @staticmethod
    def entropy(col, name="entropy", where=None) -> Column:
        """Shannon entropy over the group's value distribution: -Σ p·ln p.

        Single pass trick: with counts n_v per distinct value and N total,
        H = ln N - (Σ n_v ln n_v)/N — computed via a count-map aggregate.

        SCALE: this in-expression form buffers the group's values in an
        array — only for small/bounded groups (a TQL GROUP over one series).
        For billion-row groups use ``entropy_of`` (two-level hash aggregate,
        no per-group buffering).
        """
        c = _guard(_c(col), where)
        xs = F.collect_list(c)
        counts = F.transform(
            F.array_distinct(xs),
            lambda d: F.size(F.filter(xs, lambda x: x == d)).cast("double"),
        )
        n = F.size(xs).cast("double")
        sum_nlogn = F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * F.log(x))
        return (F.log(n) - sum_nlogn / n).alias(name)

    @staticmethod
    def entropy_raw(col, name="entropy", where=None) -> Column:
        """Reference-parity entropy: the reference hands the group's RAW
        values to gonum stat.Entropy (fm_monad.go:1361), which assumes its
        input is a probability vector — so the computed quantity is -Σ x·ln x
        over the values themselves (zero terms skipped), NOT Shannon entropy
        of the distribution.  Kept verbatim for golden parity
        (TestLoader_groupbykey.csv: entropy(1,2,3) = -4.68); use ``entropy``
        / ``entropy_of`` for the statistically meaningful quantity."""
        c = _guard(_c(col), where).cast("double")
        term = F.when(c == 0.0, 0.0).otherwise(c * F.log(c))
        return (-F.sum(term)).alias(name)

    @staticmethod
    def moment(col, k: int, name="moment", where=None) -> Column:
        """k-th central moment E[(x-μ)^k] — algebraic expansion of E[x^j]
        keeps it one pass (no second scan over the data)."""
        c = _guard(_c(col), where).cast("double")
        # E[(x-m)^k] = sum_{j=0..k} C(k,j) E[x^j] (-m)^(k-j)
        from math import comb

        m = F.avg(c)
        terms = []
        for j in range(k + 1):
            e_xj = F.avg(F.pow(c, F.lit(j))) if j > 0 else F.lit(1.0)
            terms.append(F.lit(float(comb(k, j))) * e_xj * F.pow(-m, F.lit(k - j)))
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.alias(name)

    @staticmethod
    def correlation(x, y, name="correlation", where=None) -> Column:
        return F.corr(_guard(_c(x), where), _guard(_c(y), where)).alias(name)

    @staticmethod
    def covariance(x, y, name="covariance", where=None) -> Column:
        return F.covar_samp(_guard(_c(x), where), _guard(_c(y), where)).alias(name)

    @staticmethod
    def lrs(x, y, name="lrs", where=None) -> Column:
        """Slope of least-squares y = a + b·x (fm_monad.go:1224-1229)."""
        return F.regr_slope(_guard(_c(y), where), _guard(_c(x), where)).alias(name)

    @staticmethod
    def list(col, name="list", where=None) -> Column:
        return F.collect_list(_guard(_c(col), where)).alias(name)

    @staticmethod
    def wavg(col, weight, name="avg", where=None) -> Column:
        """weight() option of mean (fm_monad.go:743-746): Σwx/Σw."""
        c, w = _guard(_c(col), where), _c(weight)
        return (F.sum(c * w) / F.sum(F.when(c.isNotNull(), w))).alias(name)

    # -- weight() variants (fm_monad.go:743-746 Weight; gonum stat takes a
    # parallel weights slice).  All are plain aggregate-expression algebra:
    # map-side partial aggregation applies, no arrays except where the
    # definition is inherently order-dependent (wquantile/wmode).

    @staticmethod
    def wvariance(col, weight, name="variance", where=None) -> Column:
        """gonum stat.Variance with weights (unbiased):
        Σw(x-μ)²/(Σw-1) = (Σwx² - (Σwx)²/Σw)/(Σw-1)."""
        c, w = _guard(_c(col), where).cast("double"), _c(weight).cast("double")
        w = F.when(c.isNotNull(), w)
        sw, swx, swx2 = F.sum(w), F.sum(w * c), F.sum(w * c * c)
        return ((swx2 - swx * swx / sw) / (sw - 1)).alias(name)

    @staticmethod
    def wstddev(col, weight, name="stddev", where=None) -> Column:
        return F.sqrt(agg.wvariance(col, weight, name, where)).alias(name)

    @staticmethod
    def wstderr(col, weight, name="stderr", where=None) -> Column:
        """Weighted stderr = weighted stddev / sqrt(COUNT) — the reference
        divides by the sample count, not Σw (task_test.go stderr golden:
        0.58/√2 = 0.41)."""
        c = _guard(_c(col), where)
        return (F.sqrt(agg.wvariance(col, weight, name, where))
                / F.sqrt(F.count(c))).alias(name)

    @staticmethod
    def _wsorted(col, weight, where):
        c, w = _guard(_c(col), where).cast("double"), _c(weight).cast("double")
        pair = F.when(c.isNotNull(),
                      F.struct(c.alias("x"), w.alias("w")))
        return F.array_sort(F.collect_list(pair))

    @staticmethod
    def wquantile(col, weight, p: float, name="quantile", where=None) -> Column:
        """gonum weighted Empirical quantile: smallest x whose cumulative
        weight fraction reaches p."""
        xs = agg._wsorted(col, weight, where)
        total = F.aggregate(xs, F.lit(0.0), lambda a, s: a + s.w)
        # the threshold lives in the fold's INIT state: init evaluates once
        # per group, while an outer aggregate referenced inside the merge
        # lambda would re-evaluate per element (O(n²))
        init = F.struct(F.lit(0.0).alias("cum"),
                        (F.lit(p) * total).alias("thr"),
                        F.lit(None).cast("double").alias("ans"))
        scan = F.aggregate(
            xs, init,
            lambda a, s: F.struct(
                (a.cum + s.w).alias("cum"), a.thr.alias("thr"),
                F.coalesce(a.ans, F.when(a.cum + s.w >= a.thr,
                                         s.x)).alias("ans")),
            lambda a: F.coalesce(a.ans, F.element_at(xs, -1).x))
        return scan.alias(name)

    @staticmethod
    def wmode(col, weight, name="mode", where=None) -> Column:
        """gonum stat.Mode with weights: the value with the greatest total
        weight; on ties the smallest value (gonum scans sorted x with a
        strict >)."""
        xs = agg._wsorted(col, weight, where)
        init = F.struct(F.lit(None).cast("double").alias("prev"),
                        F.lit(0.0).alias("runw"),
                        F.lit(None).cast("double").alias("bestx"),
                        F.lit(0.0).alias("bestw"))
        def step(a, s):
            same = a.prev.eqNullSafe(s.x)
            closes = ~same & a.prev.isNotNull() & (a.runw > a.bestw)
            return F.struct(
                s.x.alias("prev"),
                F.when(same, a.runw + s.w).otherwise(s.w).alias("runw"),
                F.when(closes, a.prev).otherwise(a.bestx).alias("bestx"),
                F.when(closes, a.runw).otherwise(a.bestw).alias("bestw"))
        scan = F.aggregate(
            xs, init, step,
            lambda a: F.when(a.runw > a.bestw, a.prev).otherwise(a.bestx))
        return scan.alias(name)


def group(
    df: DataFrame,
    by: Sequence[tuple[Column | str, str]],
    aggs: Sequence[Column],
    sort: bool = True,
) -> DataFrame:
    """GROUP(by(...), aggs...) — lazy-mode semantics: hash-aggregate then emit
    sorted by key (fm_monad.go:458-485, sort at 470-474).

    ``by`` is a list of (expression, output-name).  Chunk mode (no aggs) is
    ``groupbykey``.
    """
    keys = [_c(e).alias(n) for e, n in by]
    out = df.groupBy(*keys).agg(*aggs)
    if sort:
        out = out.orderBy(*[n for _, n in by])
    return out


def groupbykey(df: DataFrame, key: Column | str | None = None, sort: bool = True) -> DataFrame:
    """GROUPBYKEY() — chunk records per key: collect remaining columns as an
    array of structs (fm_monad.go:1005-1032)."""
    key_name = key if isinstance(key, str) else df.columns[0]
    rest = [c for c in df.columns if c != key_name]
    out = df.groupBy(key_name).agg(
        F.collect_list(F.struct(*[F.col(c) for c in rest])).alias("chunk")
    )
    return out.orderBy(key_name) if sort else out


def mode_det(df: DataFrame, by: Sequence[str], col: str, out: str = "mode") -> DataFrame:
    """Deterministic mode: the SMALLEST most-frequent value per group.

    Spark's ``mode()`` aggregate is tie-nondeterministic; this two-level form
    (count per value → rank by (count desc, value asc)) pins ties, which the
    oracle comparison requires.  Still just two hash shuffles on bounded keys.
    """
    counts = df.groupBy(*by, col).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*by).orderBy(F.col("__n").desc(), F.col(col).asc())
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(*by, F.col(col).alias(out))
    )


def entropy_of(df: DataFrame, by: Sequence[str], col: str, out: str = "entropy") -> DataFrame:
    """Shannon entropy (nats) of ``col``'s distribution per group, via the
    two-level aggregate (value counts → -Σ p·ln p) — the scalable shape for
    high-cardinality groups (agg.entropy's array form is for small groups)."""
    counts = df.groupBy(*by, col).agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.groupBy(*by)
        .agg(
            (F.log(F.sum("__n")) - F.sum(F.col("__n") * F.log("__n")) / F.sum("__n")).alias(out)
        )
    )


def sliding_window(
    df: DataFrame,
    time_col: str,
    width_ns: int,
    slide_ns: int,
    aggs: Sequence[Column],
    series: Sequence[str] = (),
    bucket_name: str = "time",
) -> DataFrame:
    """Sliding (hopping) window aggregation — beyond the reference's
    tumbling-only timewindow (SURVEY §2.9: extension).

    Each row replicates into its ``width/slide`` covering windows via an
    executor-side ``sequence()`` explode (integer ns math), then one hash
    aggregate on (series, window-start).  ``width_ns`` must be a multiple of
    ``slide_ns``.  Scale shape: fan-out factor = width/slide (bounded,
    chosen by the query), single shuffle.
    """
    if width_ns % slide_ns != 0:
        raise ValueError("width_ns must be a multiple of slide_ns")
    t = F.col(time_col).cast("long")
    last_w = t - F.pmod(t, F.lit(slide_ns))
    first_w = last_w - F.lit(width_ns - slide_ns)
    win = F.explode(F.sequence(first_w, last_w, F.lit(slide_ns))).alias(bucket_name)
    exploded = df.select(*df.columns, win)
    return (
        exploded.groupBy(*series, bucket_name)
        .agg(*aggs)
        .orderBy(*series, bucket_name)
    )


def session_window(
    df: DataFrame,
    time_col: str,
    gap_ns: int,
    aggs: Sequence[Column],
    series: Sequence[str] = (),
) -> DataFrame:
    """Session windows: a session closes after ``gap_ns`` of inactivity
    (SURVEY §2.9: extension; Spark's ``F.session_window`` is µs-precision —
    this long-math form keeps exact ns and an exact SQL oracle).

    Gaps-and-islands: session id = running count of gap-exceeding steps per
    series; output = per-session (start, end, aggs).
    """
    t = F.col(time_col).cast("long")
    w = Window.partitionBy(*[F.col(c) for c in series]).orderBy(t)
    new_session = F.when(
        (t - F.lag(t).over(w)) > F.lit(gap_ns), 1
    ).otherwise(F.when(F.lag(t).over(w).isNull(), 1).otherwise(0))
    sess = df.withColumn(
        "__sid", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(*series, "__sid")
        .agg(
            F.min(t).alias("session_start"),
            F.max(t).alias("session_end"),
            *aggs,
        )
        .drop("__sid")
        .orderBy(*series, "session_start")
    )


# ---------------------------------------------------------------- timewindow

FILL_METHODS = ("null", "value", "piecewiseconstant", "piecewiselinear",
                "linearregression", "akimaspline", "fritschbutland")


def timewindow(
    df: DataFrame,
    time_col: str,
    from_ns: int,
    until_ns: int,
    period_ns: int,
    aggs: Sequence[Column],
    series: Sequence[str] = (),
    fill: str = "null",
    fill_value: float | None = None,
    fill_cols: Sequence[str] | None = None,
    bucket_name: str = "time",
) -> DataFrame:
    """GROUP(by(ts, timewindow(from, until, period)), aggs...).

    Reference behavior reproduced (fm_monad.go:426-435, 622-666):
    - records outside [from, until) are DROPPED;
    - ts floors to the period grid anchored at ``from``;
    - every bucket in the range is emitted, including empty ones, whose
      aggregate columns are gap-filled per ``fill``:
        * 'null'              — leave NULL
        * 'value'             — constant ``fill_value``   (nullValue(v))
        * 'piecewiseconstant' — previous non-null bucket  (predict())
        * 'piecewiselinear'   — linear interpolation between neighbors
        * 'linearregression'  — least-squares line over non-null buckets
        * 'akimaspline' / 'fritschbutland' — cubic spline fills (numpy kernel
          over the aggregated bucket frame, operators/interp.py)

    Scale notes: the bucket grid is ``sequence()``-generated (executor-side,
    no driver loop) and the join is broadcast when the calendar is small; the
    interpolation fills are window expressions over the *aggregated* frame
    (bucket count = range/period, tiny next to the raw data).

    ``time_col`` is epoch-ns long.  ``series`` columns (e.g. tag name) produce
    a per-series calendar via a crossJoin of distinct series keys x grid.
    """
    t = F.col(time_col).cast("long")
    # integer-only bucket math: epoch-ns exceeds double precision (2^53).
    # Buckets are EPOCH-anchored — the reference truncates the record time to
    # the absolute period grid ((ts/period)*period, fm_monad.go:665), NOT a
    # grid anchored at ``from``; the two agree only when from is
    # period-aligned (pinned by task_test.go TestGroupByTimeWindow, whose
    # from=...62 emits buckets ...64/68/72).
    bucket = (t - F.pmod(t, F.lit(period_ns))).cast("long")
    # calendar = epoch buckets w with from <= w < until (fm_monad.go fill()
    # skips windows before ``from``); records bucketed outside the calendar
    # are dropped.
    cal_start = -(-from_ns // period_ns) * period_ns
    in_range = (bucket >= F.lit(cal_start)) & (bucket < F.lit(until_ns))
    grouped = (
        df.withColumn(bucket_name, bucket)
        .filter(in_range)
        .groupBy(*series, bucket_name)
        .agg(*aggs)
    )

    # calendar of every bucket in [cal_start, until)
    last_bucket = cal_start + ((until_ns - 1 - cal_start) // period_ns) * period_ns
    spark = df.sparkSession
    grid = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(cal_start), F.lit(last_bucket), F.lit(period_ns))
        ).alias(bucket_name)
    )
    if series:
        # distinct keys come from the AGGREGATED frame (tiny), not a second
        # scan of the raw data — at 100 TB the raw rescan would double the job.
        # localCheckpoint materializes the aggregate once: without it Catalyst
        # executes the whole scan+agg subtree twice (keys + join), measured 2x
        # the warm runtime.  Size is bounded by |series| x bucket-count = the
        # operator's own output, so executor-memory cost is already budgeted.
        grouped = grouped.localCheckpoint(eager=False)
        keys = grouped.select(*series).distinct()
        grid = keys.crossJoin(grid)
    out = grid.join(F.broadcast(grouped) if not series else grouped,
                    on=[*series, bucket_name], how="left")

    agg_cols = [c for c in out.columns if c not in (*series, bucket_name)]
    if isinstance(fill, dict):
        # per-column fill modes (TIMEWINDOW colspec ':Interpolator' applies
        # per column; nullValue(v) covers the rest): group columns sharing a
        # (mode, value) so each window/spline pass runs once per mode
        by_mode: dict[tuple, list[str]] = {}
        for c, (mode, val) in fill.items():
            by_mode.setdefault((mode, val), []).append(c)
        for (mode, val), cols in by_mode.items():
            out = _apply_gap_fill(out, series, bucket_name, cols, mode, val)
    else:
        targets = list(fill_cols) if fill_cols else agg_cols
        out = _apply_gap_fill(out, series, bucket_name, targets, fill, fill_value)
    return out.orderBy(*series, bucket_name)


def _apply_gap_fill(
    out: DataFrame,
    series: Sequence[str],
    bucket_name: str,
    targets: Sequence[str],
    fill: str,
    fill_value: float | None,
) -> DataFrame:
    """Apply one gap-fill mode to ``targets`` (see timewindow docstring)."""
    if fill == "value":
        for c in targets:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill_value)))
    elif fill in ("akimaspline", "fritschbutland"):
        from neo_server_spark.operators.interp import spline_fill

        out = spline_fill(out, series, bucket_name, targets, method=fill)
    elif fill in ("piecewiseconstant", "piecewiselinear", "linearregression"):
        w = Window.partitionBy(*series).orderBy(bucket_name)
        prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
        next_w = w.rowsBetween(0, Window.unboundedFollowing)
        for c in targets:
            v = F.col(c)
            prev_v = F.last(v, ignorenulls=True).over(prev_w)
            next_v = F.first(v, ignorenulls=True).over(next_w)
            prev_t = F.last(F.when(v.isNotNull(), F.col(bucket_name)), ignorenulls=True).over(prev_w)
            next_t = F.first(F.when(v.isNotNull(), F.col(bucket_name)), ignorenulls=True).over(next_w)
            if fill == "piecewiseconstant":
                # gonum PiecewiseConstant: value at the nearest known point
                # to the RIGHT; beyond the last known point, the last value
                # (task_test.go rss:PiecewiseConstant golden)
                filled = F.coalesce(v, next_v, prev_v)
            elif fill == "piecewiselinear":
                frac = (F.col(bucket_name) - prev_t).cast("double") / (next_t - prev_t).cast("double")
                interp = prev_v + (next_v - prev_v) * frac
                filled = F.coalesce(v, interp, prev_v, next_v)
            else:  # linearregression over non-null buckets of the series
                full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                x = F.col(bucket_name).cast("double")
                slope = F.regr_slope(v, x).over(full)
                icept = F.regr_intercept(v, x).over(full)
                filled = F.coalesce(v, slope * x + icept)
            out = out.withColumn(c, filled)
    return out
