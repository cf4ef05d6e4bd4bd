"""Rollup tables + ROLLUP-hint router (SURVEY §4.1 — the one genuinely
custom optimizer piece).

Reference: the engine maintains per-interval rollup aggregate tables for
SUMMARIZED tag columns and routes `time ROLLUP n {SEC|MIN|HOUR}` queries to
them (http_lake.go:1692-1698, calc modes 1738-1762; gap metrics via V$ROLLUP,
spi/show.go:1209-1222).

Spark design:
- Rollup tables are parquet materializations keyed by (name, bucket) holding
  the FULL algebraic summary (count/sum/sumsq/min/max/first/last) — every
  calc mode (MIN/MAX/AVG/SUM/SUMSQ/COUNT) is derivable, and coarser levels
  fold from finer ones WITHOUT rescanning raw data (sec -> min -> hour
  cascade), because all stored aggregates are algebraic and mergeable.
- The router answers a (period, agg) query from the finest rollup whose
  period divides the request period — a materialized-view selection done in
  the query layer (a custom Catalyst rule would be sugar on top; the
  semantics live here).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SECOND = 1_000_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE

#: canonical cascade levels (engine default rollups: SEC, MIN, HOUR)
LEVELS = {"sec": SECOND, "min": MINUTE, "hour": HOUR}


def _summarize(df: DataFrame, period_ns: int, name_col: str, time_col: str,
               value_col: str, distinct_col: str | None = None) -> DataFrame:
    """Raw rows -> algebraic summary at ``period_ns`` buckets.

    ``distinct_col`` adds an HLL sketch partial (Apache DataSketches via
    ``hll_sketch_agg``) so the cascade can ALSO serve approximate
    COUNT(DISTINCT col) — distinct devices/users per tag per bucket —
    which no combination of the algebraic partials can express.  Like
    every other column here the sketch is mergeable: folds and
    fold-on-read stay exact with respect to the sketch state (union is
    lossless), so estimates are identical whether computed from the
    partials or from one pass over the raw rows."""
    bucket = (F.col(time_col).cast("long") - F.pmod(F.col(time_col).cast("long"), F.lit(period_ns))).cast("long")
    v = F.col(value_col)
    aggs = [
        F.count(v).alias("cnt"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("sumsq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.min_by(v, F.col(time_col)).alias("first"),
        F.max_by(v, F.col(time_col)).alias("last"),
        F.min(F.col(time_col).cast("long")).alias("first_time"),
        F.max(F.col(time_col).cast("long")).alias("last_time"),
    ]
    if distinct_col:
        aggs.append(F.hll_sketch_agg(F.col(distinct_col)).alias("hll"))
    return (
        df.groupBy(F.col(name_col).alias("name"), bucket.alias("time"))
        .agg(*aggs)
    )


def _fold(summary: DataFrame, period_ns: int) -> DataFrame:
    """Finer summary -> coarser summary (merge of algebraic aggregates)."""
    bucket = (F.col("time") - F.pmod(F.col("time"), F.lit(period_ns))).cast("long")
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.sum("sumsq").alias("sumsq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.min_by("first", "first_time").alias("first"),
        F.max_by("last", "last_time").alias("last"),
        F.min("first_time").alias("first_time"),
        F.max("last_time").alias("last_time"),
    ]
    if "hll" in summary.columns:
        aggs.append(F.hll_union_agg("hll").alias("hll"))
    return summary.groupBy("name", bucket.alias("time")).agg(*aggs)


class RollupRouter:
    """Maintains the sec/min/hour cascade for one tag table and routes
    aggregate queries to the coarsest usable level."""

    def __init__(self, spark: SparkSession, base_path: str,
                 table_format: str = "parquet"):
        if table_format not in ("parquet", "txlog"):
            raise ValueError(f"unknown table_format {table_format!r}")
        self.spark = spark
        self.base_path = base_path
        self.table_format = table_format

    def path(self, level: str) -> str:
        return os.path.join(self.base_path, f"rollup_{level}")

    def _write(self, df: DataFrame, level: str) -> None:
        if self.table_format == "txlog":
            from neo_server_spark import txlog

            txlog.write(df, self.path(level), mode="overwrite",
                        stats_cols=["time"])
        else:
            df.write.mode("overwrite").parquet(self.path(level))

    # ------------------------------------------------------------ build

    def build(self, df: DataFrame, name_col: str = "name", time_col: str = "time",
              value_col: str = "value", distinct_col: str | None = None) -> None:
        """(Re)materialize the full cascade.  Only the finest level scans the
        raw data; min folds from sec, hour folds from min.
        ``distinct_col`` adds HLL partials so ``query`` can serve
        ``approx_distinct`` (see _summarize)."""
        sec = _summarize(df, LEVELS["sec"], name_col, time_col, value_col,
                         distinct_col=distinct_col)
        self._write(sec, "sec")
        self._write(_fold(self.level("sec"), LEVELS["min"]), "min")
        self._write(_fold(self.level("min"), LEVELS["hour"]), "hour")

    def level(self, level: str) -> DataFrame:
        # no DataFrame caching: streaming appends/compaction change the file
        # set underneath; the parquet listing is cheap next to the query
        if self.table_format == "txlog":
            from neo_server_spark import txlog

            return txlog.read_table(self.spark, self.path(level))
        return self.spark.read.parquet(self.path(level))

    # ------------------------------------------------------------ route

    def pick_level(self, period_ns: int) -> str | None:
        """Coarsest maintained level whose period divides the request."""
        best = None
        for lvl, p in LEVELS.items():
            if period_ns % p == 0 and period_ns >= p:
                if best is None or p > LEVELS[best]:
                    best = lvl
        return best

    def attach_matview(self, mv_rollup: "MatViewRollup") -> None:
        """Route queries to an INCREMENTALLY-maintained MatViewRollup
        when it covers them (period divisible by its finest level AND
        every calc mode servable from its partials); everything else
        falls back to the built cascade.  This unifies the two
        maintenance paths: the IVM view stays fresh at O(delta) per
        refresh (incl. first/last, and approx_distinct when built with
        distinct_col, since r13), while undivisible periods — and
        approx_distinct against a sketch-less view — keep the
        rebuilt-cascade answer."""
        self._matview = mv_rollup

    def _covered_by_matview(self, period_ns: int,
                            aggs: dict[str, str]) -> bool:
        mv = getattr(self, "_matview", None)
        if mv is None:
            return False
        # servable_modes probes the PUBLISHED partial layout — a view
        # written by an older code vintage may lack first/last or HLL
        # partial columns, and claiming coverage for them would fail at
        # read time instead of routing to the built cascade (r13
        # advice)
        modes = mv.servable_modes()
        return (period_ns % mv.period_ns == 0
                and period_ns >= mv.period_ns
                and all(m.lower() in modes for m in aggs.values()))

    def query(self, period_ns: int, aggs: dict[str, str],
              tags: list[str] | None = None,
              between: tuple[int, int] | None = None) -> DataFrame:
        """`SELECT time ROLLUP ... , AGG(value) GROUP BY name, bucket` served
        from the cascade.  ``aggs`` maps output-name -> calc mode
        (min|max|avg|sum|sumsq|count|first|last, http_lake.go:1738-1762).

        Falls back to an error if no level divides the period — the caller
        then computes from raw data (router contract mirrors the engine,
        which only accepts SEC/MIN/HOUR multiples).
        """
        if self._covered_by_matview(period_ns, aggs):
            # IVM-maintained partials answer it with zero base scans
            return self._matview.query(period_ns, aggs, tags=tags,
                                       between=between)
        lvl = self.pick_level(period_ns)
        if lvl is None:
            raise ValueError(f"period {period_ns}ns not servable from rollups")
        base = self.level(lvl)
        if tags:
            base = base.filter(F.col("name").isin(tags))
        if between:
            base = base.filter(F.col("time").between(between[0], between[1] - 1))
        bucket = (F.col("time") - F.pmod(F.col("time"), F.lit(period_ns))).cast("long")
        fold_aggs = [
            F.sum("cnt").alias("_cnt"), F.sum("sum").alias("_sum"),
            F.sum("sumsq").alias("_sumsq"), F.min("min").alias("_min"),
            F.max("max").alias("_max"),
            F.min_by("first", "first_time").alias("_first"),
            F.max_by("last", "last_time").alias("_last"),
        ]
        if "hll" in base.columns:
            fold_aggs.append(F.hll_union_agg("hll").alias("_hll"))
        folded = base.groupBy("name", bucket.alias("time")).agg(*fold_aggs)
        exprs = []
        for out, mode in aggs.items():
            mode = mode.lower()
            if mode == "approx_distinct" and "_hll" not in [
                    c.lower() for c in folded.columns]:
                raise ValueError(
                    "approx_distinct needs a cascade built with "
                    "distinct_col=... (RollupRouter.build/"
                    "stream_rollup) — this rollup carries no HLL "
                    "partials")
            if mode == "approx_distinct":
                # HLL estimate off the merged sketch (requires a cascade
                # built with distinct_col; union is lossless, so this
                # equals the estimate over the raw rows)
                exprs.append(
                    F.hll_sketch_estimate(F.col("_hll")).alias(out))
                continue
            col = {
                "count": F.col("_cnt"),
                "sum": F.col("_sum"),
                "sumsq": F.col("_sumsq"),
                "min": F.col("_min"),
                "max": F.col("_max"),
                "avg": F.col("_sum") / F.col("_cnt"),
                "first": F.col("_first"),
                "last": F.col("_last"),
            }[mode]
            exprs.append(col.alias(out))
        return folded.select("name", "time", *exprs).orderBy("name", "time")


class MatViewRollup:
    """ROLLUP cascade maintained INCREMENTALLY by a MatView — the r12
    unification of the two maintenance paths (reference semantics:
    engine-maintained rollups, http_lake.go:1692-1698).

    ``RollupRouter.build`` re-materializes the cascade from a full scan;
    this instead attaches a :class:`~neo_server_spark.streaming.matview.
    MatView` to the base TXLOG tag table that folds ONLY delta commits
    into (name, bucket) algebraic partials (count/sum/sumsq/min/max) at
    the finest level.  ``query`` answers ``time ROLLUP n`` requests for
    any period the finest level divides — by folding the O(tags ×
    buckets) partials, with ZERO base-table scans (plan-pinned in
    tests/test_plans.py).

    Maintenance cost per refresh = scan of the delta files + an O(keys)
    merge — at 100 TB the rollup stays seconds-fresh for the cost of
    the new data only.  Calc modes: count/sum/sumsq/min/max/avg plus
    first/last (r13: value-at-time-extreme partials are a semigroup
    under min_by/max_by, so the order-aware modes fold incrementally
    too) and, with ``distinct_col=...``, approx_distinct (HLL sketch
    partials; union is lossless, so the IVM estimate equals the
    cascade's)."""

    def __init__(self, spark: SparkSession, base_table: str,
                 view_path: str, name_col: str = "name",
                 time_col: str = "time", value_col: str = "value",
                 period_ns: int = SECOND,
                 distinct_col: str | None = None):
        from neo_server_spark.streaming.matview import MatView

        self.spark = spark
        self.name_col = name_col
        self.view_path = view_path
        self.period_ns = period_ns
        self.has_hll = distinct_col is not None
        v = f"CAST({value_col} AS DOUBLE)"
        t = f"CAST({time_col} AS BIGINT)"
        # cnt counts NON-NULL values (sum of 0/1) so count/avg match
        # RollupRouter's F.count(value) / SQL AVG semantics — a MatView
        # "count" agg would count rows and silently deflate averages
        # over NULL-bearing buckets.  first/last partials (value at
        # min/max RAW time, paired with the extreme) make the
        # order-aware calc modes servable from the IVM view too (r12
        # verdict #5; reference FIRST/LAST:
        # mods/server/http_lake.go:1738-1762, 871-877) — the ordering
        # binds to the raw time column, which the bucketed "time" key
        # shadows (MatView._bound handles that).  ``distinct_col`` adds
        # an HLL sketch partial so approx_distinct folds from the IVM
        # view exactly like the built cascade's (union is lossless).
        aggs: dict = {
            "cnt": ("sum",
                    f"CAST(({value_col}) IS NOT NULL AS BIGINT)"),
            "sum": ("sum", v),
            "sumsq": ("sum", f"{v} * {v}"),
            "min": ("min", v),
            "max": ("max", v),
            "first": ("first", v, t),
            "last": ("last", v, t)}
        if distinct_col:
            aggs["dcount"] = ("approx_distinct", distinct_col)
        self.mv = MatView(
            spark, base_table, view_path,
            keys=[name_col, "time"],
            aggs=aggs,
            # pmod (floor semantics), NOT SQL % (sign-follows-dividend):
            # the query() fold and the RollupRouter cascade both bucket
            # with F.pmod, so negative time values must round the same
            # way here or the matview path and the cascade fallback
            # would disagree on the bucket
            key_exprs={"time": f"CAST({time_col} AS BIGINT) - "
                               f"pmod(CAST({time_col} AS BIGINT), "
                               f"{int(period_ns)})"})

    def refresh(self) -> dict:
        """Fold the base table's delta commits into the partials
        (MatView.refresh: O(delta files) for plain appends)."""
        return self.mv.refresh()

    #: calc mode -> the stored partial columns it folds from
    _MODE_NEEDS = {
        "count": ("_p_cnt",), "sum": ("_p_sum",),
        "sumsq": ("_p_sumsq",), "min": ("_p_min",), "max": ("_p_max",),
        "avg": ("_p_sum", "_p_cnt"),
        "first": ("_p_first", "_t_first"),
        "last": ("_p_last", "_t_last"),
        "approx_distinct": ("_p_dcount",),
    }

    def _stored_cols(self) -> set[str] | None:
        """Column names of the PUBLISHED view, from the logged schema
        (no file listing) — None when the view has not been published
        yet (the first refresh writes the full current spec).

        Cached keyed by the view's latest VERSION (one log listdir to
        probe, r14 advice: the uncached path replayed the view's whole
        commit log on every routed query via table_schema) — any
        refresh/publish/evolve bumps the version and invalidates."""
        from neo_server_spark import txlog

        try:
            ver = txlog.latest_version(self.view_path)
        except (FileNotFoundError, ValueError):
            return None
        cached = getattr(self, "_stored_cols_cache", None)
        if cached is not None and cached[0] == ver:
            return cached[1]
        try:
            sch = txlog.table_schema(self.view_path)
        except FileNotFoundError:
            return None
        cols = None if sch is None else {n for n, _t in sch}
        self._stored_cols_cache = (ver, cols)
        return cols

    def servable_modes(self) -> set[str]:
        """Calc modes the STORED partial layout can actually serve — a
        view published by a pre-r13 code vintage lacks the first/last
        (and possibly HLL) partial columns, and claiming them would
        fail with an AnalysisException at read time instead of letting
        the router fall back to the built cascade (r13 advice)."""
        cols = self._stored_cols()
        modes = {m for m, need in self._MODE_NEEDS.items()
                 if cols is None or all(c in cols for c in need)}
        if not self.has_hll:
            modes.discard("approx_distinct")
        return modes

    def query(self, period_ns: int, aggs: dict[str, str],
              tags: list[str] | None = None,
              between: tuple[int, int] | None = None) -> DataFrame:
        """Same contract as RollupRouter.query, served from the
        incrementally-maintained partials."""
        if period_ns % self.period_ns != 0 or period_ns < self.period_ns:
            raise ValueError(
                f"period {period_ns}ns not servable from a "
                f"{self.period_ns}ns matview rollup")
        ok = self.servable_modes()
        for mode in aggs.values():
            m = mode.lower()
            if m in ok:
                continue
            if m not in self._MODE_NEEDS:
                raise ValueError(
                    f"calc mode {mode!r} not servable from IVM "
                    f"partials")
            if m == "approx_distinct" and not self.has_hll:
                raise ValueError(
                    "calc mode 'approx_distinct' needs a view built "
                    "with distinct_col=...")
            raise ValueError(
                f"calc mode {mode!r} needs partial columns the stored "
                f"view lacks (pre-r13 layout); rebuild the view or "
                f"route through RollupRouter's cascade")
        # fold the RAW partials — sums re-sum, (value, extreme) pairs
        # re-merge via min_by/max_by, HLL sketches re-union losslessly.
        # Select/fold only the partials the STORED layout has (a legacy
        # view serves its algebraic modes even without first/last
        # columns).
        stored = self._stored_cols()
        pcols = [c for c in self.mv._partial_cols()
                 if stored is None or c in stored]
        from neo_server_spark import txlog

        base = txlog.read_table(self.spark, self.view_path) \
            .select(*self.mv.keys, *pcols)
        if tags:
            base = base.filter(F.col(self.name_col).isin(tags))
        if between:
            base = base.filter(
                F.col("time").between(between[0], between[1] - 1))
        bucket = (F.col("time")
                  - F.pmod(F.col("time"), F.lit(period_ns))).cast("long")
        # every fold entry is gated on the STORED layout, algebraic
        # partials included — a layout missing one (hand-pruned or a
        # future vintage) must not raise AnalysisException for modes
        # servable_modes() approved (r14 advice)
        fold = []
        if "_p_cnt" in pcols:
            fold.append(F.sum("_p_cnt").alias("_cnt"))
        if "_p_sum" in pcols:
            fold.append(F.sum("_p_sum").alias("_sum"))
        if "_p_sumsq" in pcols:
            fold.append(F.sum("_p_sumsq").alias("_sumsq"))
        if "_p_min" in pcols:
            fold.append(F.min("_p_min").alias("_min"))
        if "_p_max" in pcols:
            fold.append(F.max("_p_max").alias("_max"))
        if "_p_first" in pcols and "_t_first" in pcols:
            fold.append(F.min_by("_p_first", "_t_first").alias("_first"))
        if "_p_last" in pcols and "_t_last" in pcols:
            fold.append(F.max_by("_p_last", "_t_last").alias("_last"))
        if self.has_hll and "_p_dcount" in pcols:
            fold.append(F.hll_union_agg("_p_dcount").alias("_hll"))
        folded = base.groupBy(self.name_col,
                              bucket.alias("time")).agg(*fold)
        exprs = []
        for out, mode in aggs.items():
            mode = mode.lower()
            col = {
                "count": F.col("_cnt"),
                "sum": F.col("_sum"),
                "sumsq": F.col("_sumsq"),
                "min": F.col("_min"),
                "max": F.col("_max"),
                "avg": F.col("_sum") / F.col("_cnt"),
                "first": F.col("_first"),
                "last": F.col("_last"),
            }[mode] if mode != "approx_distinct" else \
                F.hll_sketch_estimate(F.col("_hll"))
            exprs.append(col.alias(out))
        return (folded.select(self.name_col, "time", *exprs)
                .orderBy(self.name_col, "time"))
