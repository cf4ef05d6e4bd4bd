"""Ordered/stateful per-series transforms (SURVEY §2.4).

Reference semantics: mods/tql/fm_monad.go (MAP_DIFF family 1806-1906,
MAP_AVG 1993, MAP_MOVAVG 2023-2079, MAP_LOWPASS 2081-2107, MAP_KALMAN
1908-1991, MAP_DISTANCE 2109-2142) and mods/tql/fm_fourier.go / mods/nums/fft
(FFT).

Reference pipelines are implicitly single-series in arrival order; the
distributed equivalents take explicit ``series`` (partition keys) and
``order_by`` arguments: ``Window.partitionBy(series).orderBy(order_by)``.
Everything expressible as a window function stays JVM-side in whole-stage
codegen; only the genuinely recursive kernels (low-pass EWMA, Kalman) and FFT
drop to Arrow-batched ``applyInPandas`` — one pandas call per series, state
never crosses series boundaries, so the fan-out scales with tag cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import DoubleType, StructField, StructType


def _c(expr: Column | str) -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


def _series_window(series: Sequence[str], order_by) -> Window:
    orders = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    return Window.partitionBy(*[F.col(c) for c in series]).orderBy(*[_c(o) for o in orders])


# ---------------------------------------------------------------- diffs

def map_diff(df: DataFrame, value_col: str, out: str = "diff",
             series: Sequence[str] = (), order_by: Column | str = "time",
             mode: str = "diff") -> DataFrame:
    """MAP_DIFF / MAP_ABSDIFF / MAP_NONEGDIFF — successive difference
    (fm_monad.go:1806-1906).  First row of each series yields NULL."""
    w = _series_window(series, order_by)
    d = F.col(value_col) - F.lag(F.col(value_col)).over(w)
    if mode == "abs":
        d = F.abs(d)
    elif mode == "noneg":
        d = F.when(d < 0, None).otherwise(d)
    return df.withColumn(out, d)


def map_diff_blocked(df: DataFrame, value_col: str, out: str = "diff",
                     series: Sequence[str] = (), time_col: str = "time",
                     block_ns: int = 86_400 * 10**9, mode: str = "diff",
                     tiebreak: Sequence[str] = ()) -> DataFrame:
    """MAP_DIFF at 100 TB: time-blocked lag with boundary exchange.

    A plain ``partitionBy(series)`` window puts an ENTIRE series in one task —
    with few distinct tags (the common tag-table shape) that is 10s of TB in a
    single sort.  Blocked form:

    1. window inside ``(series, time-block)`` partitions — bounded task size
       regardless of series length, any block count runs in parallel;
    2. per-block tails (last row per block: one tiny row per block) get a
       ``lag`` over the *tails frame* — this carries values across empty
       blocks too;
    3. broadcast the tails back; only each block's FIRST row uses the
       exchanged boundary value.

    Equivalent to :func:`map_diff` row-for-row (oracle-checked); cost = one
    bounded-partition sort + one aggregate + one broadcast join, versus one
    unbounded sort.  ``tiebreak`` columns break equal-timestamp order (must
    make the order total for exact parity with the unblocked form).
    """
    t = F.col(time_col).cast("long")
    blk = (t - F.pmod(t, F.lit(block_ns))).alias("__blk")
    orders = [F.col(time_col), *[F.col(c) for c in tiebreak]]
    df_b = df.withColumn("__blk", blk)
    w = Window.partitionBy(*[F.col(c) for c in series], F.col("__blk")).orderBy(*orders)

    # tails: last row's value per (series, block) — one row per block
    tail_sort = F.struct(t.alias("t"), *[F.col(c).alias(f"k{i}") for i, c in enumerate(tiebreak)])
    tails = df_b.groupBy(*series, "__blk").agg(
        F.max_by(F.col(value_col), tail_sort).alias("__tail"))
    tw = Window.partitionBy(*[F.col(c) for c in series]).orderBy("__blk")
    prev_tails = tails.select(*series, "__blk", F.lag("__tail").over(tw).alias("__prev_tail"))

    # no broadcast hint: tails = tags x blocks rows — small here, but at
    # 100 TB it can exceed broadcast size; AQE picks broadcast when it fits
    joined = df_b.join(prev_tails, on=[*series, "__blk"], how="left")
    in_block_prev = F.lag(F.col(value_col)).over(w)
    prev = F.coalesce(in_block_prev, F.when(F.row_number().over(w) == 1, F.col("__prev_tail")))
    d = F.col(value_col) - prev
    if mode == "abs":
        d = F.abs(d)
    elif mode == "noneg":
        d = F.when(d < 0, None).otherwise(d)
    return joined.withColumn(out, d).drop("__blk", "__prev_tail")


def map_absdiff(df, value_col, out="absdiff", series=(), order_by="time"):
    return map_diff(df, value_col, out, series, order_by, mode="abs")


def map_nonegdiff(df, value_col, out="nonegdiff", series=(), order_by="time"):
    return map_diff(df, value_col, out, series, order_by, mode="noneg")


# ---------------------------------------------------------------- running means

def map_avg(df: DataFrame, value_col: str, out: str = "avg",
            series: Sequence[str] = (), order_by: Column | str = "time") -> DataFrame:
    """MAP_AVG — cumulative running mean (fm_monad.go:1993-2021)."""
    w = _series_window(series, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.avg(F.col(value_col)).over(w))


def map_movavg(df: DataFrame, value_col: str, window: int, out: str = "movavg",
               series: Sequence[str] = (), order_by: Column | str = "time",
               no_wait: bool = False) -> DataFrame:
    """MAP_MOVAVG(value, window [, noWait()]) (fm_monad.go:2023-2079).

    Average of the trailing ``window`` records; NULL values occupy a slot but
    are excluded from the mean (Spark ``avg`` matches).  Until the buffer holds
    ``window`` records the reference emits NULL unless noWait().
    """
    w = _series_window(series, order_by)
    mov = F.avg(F.col(value_col)).over(w.rowsBetween(-(window - 1), 0))
    if not no_wait:
        rn = F.row_number().over(w)
        mov = F.when(rn >= window, mov)
    return df.withColumn(out, mov)


# ---------------------------------------------------------------- recursive kernels

def map_lowpass(df: DataFrame, value_col: str, alpha: float, out: str = "lowpass",
                series: Sequence[str] = (), order_by: str = "time") -> DataFrame:
    """MAP_LOWPASS — EWMA x̂ = (1-α)·x̂ + α·v, seeded with the first value
    (fm_monad.go:2081-2107).

    Recursive — no closed-form window function — so: ``applyInPandas`` per
    series with pandas ``ewm(alpha, adjust=False)``, which computes exactly
    this recursion in a vectorized C loop.
    """
    if not 0 < alpha < 1:
        raise ValueError("MAP_LOWPASS() should have 0 < alpha < 1 ")
    fields = df.schema.fields + [StructField(out, DoubleType())]
    schema = StructType(fields)
    order_key = order_by

    def kernel(pdf):
        pdf = pdf.sort_values(order_key)
        pdf[out] = pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        return pdf

    if not series:
        df = df.withColumn("__one", F.lit(1))
        out_df = df.groupBy("__one").applyInPandas(
            lambda pdf: kernel(pdf), StructType(df.schema.fields + [StructField(out, DoubleType())])
        ).drop("__one")
        return out_df
    return df.groupBy(*series).applyInPandas(lambda pdf: kernel(pdf), schema)


def map_lowpass_blocked(df: DataFrame, value_col: str, alpha: float,
                        out: str = "lowpass", series: Sequence[str] = (),
                        time_col: str = "time",
                        block_ns: int = 86_400 * 10**9) -> DataFrame:
    """MAP_LOWPASS at 100 TB: parallel-scan decomposition of the EWMA
    recurrence over bounded time blocks.

    The EWMA x̂_i = (1-α)·x̂_{i-1} + α·v_i is a linear recurrence, so a block
    of n rows COMPOSES: exiting state = A·s + B with A = (1-α)^n and
    B = the block's EWMA seeded from 0.  Three bounded steps:

    1. per (series, block) pandas kernel — zero-seeded prefix ``pref_i`` and
       row index i (blocks are bounded; this is the only pass over raw rows);
    2. per-series scan over the per-block (A, B) summaries to produce each
       block's ENTRY state — one tiny frame (blocks x series rows);
    3. join entry states back: x̂_i = pref_i + (1-α)^i · s_entry, plus the
       reference's first-value seeding (x̂_1 = v_1) folded into the entry
       state of the first block.

    Row-for-row equal to :func:`map_lowpass` (equivalence-tested); no task
    ever holds more than one block of one series.
    """
    if not 0 < alpha < 1:
        raise ValueError("MAP_LOWPASS() should have 0 < alpha < 1 ")
    import pandas as pd

    t = F.col(time_col).cast("long")
    df_b = df.withColumn("__blk", t - F.pmod(t, F.lit(block_ns)))
    skey = list(series)

    # -- step 1: zero-seeded within-block prefix + per-block composition
    row_schema = StructType(df_b.schema.fields + [
        StructField("__pref", DoubleType()), StructField("__i", DoubleType())])

    def block_kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values(time_col)
        v = pdf[value_col].astype("float64")
        # pandas ewm(adjust=False) seeds e_1 = v_1; the ZERO-seeded prefix
        # pref_i = a·Σ(1-a)^(i-j)·v_j differs by the homogeneous solution:
        # pref_i = e_i - (1-a)^i · v_1
        e = v.ewm(alpha=alpha, adjust=False).mean().to_numpy()
        i = np.arange(1, len(pdf) + 1, dtype="float64")
        v1 = float(v.iloc[0]) if len(v) else 0.0
        pdf["__pref"] = e - np.power(1.0 - alpha, i) * v1
        pdf["__i"] = i
        return pdf

    rows = df_b.groupBy(*skey, "__blk").applyInPandas(block_kernel, row_schema)

    # -- step 2: entry state per block from the tiny summary frame
    summaries = rows.groupBy(*skey, "__blk").agg(
        F.count(F.lit(1)).alias("__n"),
        F.max_by("__pref", "__i").alias("__B"),
        F.min_by(F.col(value_col).cast("double"), "__i").alias("__v1"),
    )
    entry_schema = StructType(
        [summaries.schema[c] for c in [*skey, "__blk"]] +
        [StructField("__entry", DoubleType())])

    def scan_kernel(pdf):
        pdf = pdf.sort_values("__blk")
        s, first = 0.0, True
        entries = []
        for n, B, v1 in zip(pdf["__n"], pdf["__B"], pdf["__v1"]):
            if first:
                # reference seeds x̂_1 = v_1: entry state s0 chosen so that
                # (1-a)*s0 + a*v1 == v1  =>  s0 = v1
                s, first = float(v1), False
            entries.append(s)
            s = (1.0 - alpha) ** float(n) * s + float(B)
        return pd.DataFrame({
            **{c: pdf[c] for c in pdf.columns if c in ([*skey, "__blk"])},
            "__entry": entries,
        })

    grouping = summaries.groupBy(*skey) if skey else summaries.groupBy(F.lit(1).alias("__g"))
    entries = grouping.applyInPandas(scan_kernel, entry_schema)

    # -- step 3: combine
    joined = rows.join(entries, on=[*skey, "__blk"], how="left")
    final = F.col("__pref") + F.pow(F.lit(1.0 - alpha), F.col("__i")) * F.col("__entry")
    return joined.withColumn(out, final).drop("__blk", "__pref", "__i", "__entry")


def map_kalman_blocked(df: DataFrame, value_col: str, out: str = "kalman",
                       series: Sequence[str] = (), time_col: str = "time",
                       init_variance: float = 1.0, process_variance: float = 1.0,
                       observation_variance: float = 2.0,
                       block_ns: int = 86_400 * 10**9) -> DataFrame:
    """MAP_KALMAN at 100 TB: blocked decomposition of the constant-model
    Kalman recursion (same three-step shape as :func:`map_lowpass_blocked`).

    Why it composes: for the 1-D constant model the gain sequence K_i is
    DATA-INDEPENDENT — P evolves deterministically from (iv, pv, ov), so
    K_i is a function of the global row index alone.  The state update
    x_i = (1-K_i)·x_{i-1} + K_i·z_i is then a linear time-varying
    recurrence: a block of rows with zero entry state yields per-row
    (A_i, B_i) with x_i = A_i·x_entry + B_i, and block summaries
    (A_n, B_n) chain entry states across blocks.

    Steps:
    1. per-(series, block) COUNT — a tiny aggregate, one narrow shuffle;
    2. per-series scan over block counts → each block's global start index
       and entry variance P (P iterates with geometric convergence, so the
       scan iterates at most ~200 steps before P is constant — never O(rows)
       on the driver);
    3. per-(series, block) pandas kernel over raw rows computes zero-entry
       (A_i, B_i); a second tiny per-series scan chains entry states; a
       final join emits x_i = A_i·entry + B_i.

    Row-for-row equal to :func:`map_kalman` (equivalence-tested); no task
    holds more than one block of one series.
    """
    import pandas as pd

    iv, pv, ov = float(init_variance), float(process_variance), float(observation_variance)
    t = F.col(time_col).cast("long")
    df_b = df.withColumn("__blk", t - F.pmod(t, F.lit(block_ns)))
    skey = list(series)

    # -- step 1: per-block counts (tiny frame)
    counts = df_b.groupBy(*skey, "__blk").agg(F.count(F.lit(1)).alias("__n"))

    # -- step 2: global start index + entry variance per block
    meta_schema = StructType(
        [counts.schema[c] for c in [*skey, "__blk"]] +
        [StructField("__start", DoubleType()), StructField("__p0", DoubleType())])

    def _advance_p(p: float, steps: int) -> float:
        # P_{i} = ((P_{i-1}+pv)·ov)/(P_{i-1}+pv+ov) — monotone, geometric
        # convergence to its fixed point; stop early once stationary.
        for _ in range(steps):
            nxt = ((p + pv) * ov) / (p + pv + ov)
            if abs(nxt - p) <= 1e-15 * max(abs(p), 1e-300):
                return nxt
            p = nxt
        return p

    def meta_kernel(pdf):
        pdf = pdf.sort_values("__blk")
        start, p, gi = 1, iv, 1  # gi = global index P corresponds to entering
        starts, ps = [], []
        for n in pdf["__n"]:
            starts.append(float(start))
            ps.append(p)
            # advance P across this block: row 1 leaves P untouched (seed row)
            steps = int(n) - (1 if start == 1 else 0)
            p = _advance_p(p, steps)
            start += int(n)
        return pd.DataFrame({
            **{c: pdf[c] for c in pdf.columns if c in ([*skey, "__blk"])},
            "__start": starts, "__p0": ps,
        })

    g = counts.groupBy(*skey) if skey else counts.groupBy(F.lit(1).alias("__g"))
    meta = g.applyInPandas(meta_kernel, meta_schema)

    # -- step 3a: zero-entry per-row (A_i, B_i) within each block
    staged = df_b.join(meta, on=[*skey, "__blk"], how="left")
    row_schema = StructType(staged.schema.fields + [
        StructField("__A", DoubleType()), StructField("__B", DoubleType())])

    def block_kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values(time_col)
        z = pdf[value_col].astype("float64").to_numpy()
        start = int(pdf["__start"].iloc[0])
        p = float(pdf["__p0"].iloc[0])
        A, B = np.empty_like(z), np.empty_like(z)
        a_run, b_run = 1.0, 0.0
        for j, zj in enumerate(z):
            if start + j == 1:
                a_run, b_run = 0.0, zj  # x_1 = z_1, P stays iv (seed row)
            else:
                p_pred = p + pv           # predict:  P' = P + pv
                k = p_pred / (p_pred + ov)  # gain — global-index-determined
                a_run = (1.0 - k) * a_run
                b_run = (1.0 - k) * b_run + k * zj
                p = (1.0 - k) * p_pred    # update:  P = (1-K)P'
            A[j], B[j] = a_run, b_run
        pdf["__A"], pdf["__B"] = A, B
        return pdf

    rows = staged.groupBy(*skey, "__blk").applyInPandas(block_kernel, row_schema)

    # -- step 3b: chain entry states over block summaries (tiny frame)
    summaries = rows.groupBy(*skey, "__blk").agg(
        F.max_by("__A", F.col(time_col).cast("long")).alias("__An"),
        F.max_by("__B", F.col(time_col).cast("long")).alias("__Bn"))
    entry_schema = StructType(
        [summaries.schema[c] for c in [*skey, "__blk"]] +
        [StructField("__entry", DoubleType())])

    def entry_kernel(pdf):
        pdf = pdf.sort_values("__blk")
        e, entries = 0.0, []
        for An, Bn in zip(pdf["__An"], pdf["__Bn"]):
            entries.append(e)
            e = float(An) * e + float(Bn)
        return pd.DataFrame({
            **{c: pdf[c] for c in pdf.columns if c in ([*skey, "__blk"])},
            "__entry": entries,
        })

    g2 = summaries.groupBy(*skey) if skey else summaries.groupBy(F.lit(1).alias("__g"))
    entries = g2.applyInPandas(entry_kernel, entry_schema)

    joined = rows.join(entries, on=[*skey, "__blk"], how="left")
    final = F.col("__A") * F.col("__entry") + F.col("__B")
    return joined.withColumn(out, final).drop(
        "__blk", "__start", "__p0", "__A", "__B", "__entry")


def map_kalman(df: DataFrame, value_col: str, out: str = "kalman",
               series: Sequence[str] = (), order_by: str = "time",
               init_variance: float = 1.0, process_variance: float = 1.0,
               observation_variance: float = 2.0) -> DataFrame:
    """MAP_KALMAN(value, model(iv, pv, ov)) — 1-D constant-model Kalman filter
    (fm_monad.go:1908-1991, mods/nums/kalman).

    Scalar recursion per series:
        predict:  P = P + pv
        update :  K = P/(P+ov);  x = x + K(z-x);  P = (1-K)P
    seeded x = first observation, P = iv.
    """
    fields = df.schema.fields + [StructField(out, DoubleType())]
    schema = StructType(fields)
    order_key = order_by

    def kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values(order_key)
        z = pdf[value_col].astype("float64").to_numpy()
        xs = np.empty_like(z)
        x, p = None, init_variance
        for i, zi in enumerate(z):
            if x is None:
                x = zi
            else:
                p = p + process_variance
                k = p / (p + observation_variance)
                x = x + k * (zi - x)
                p = (1.0 - k) * p
            xs[i] = x
        pdf[out] = xs
        return pdf

    if not series:
        df = df.withColumn("__one", F.lit(1))
        return df.groupBy("__one").applyInPandas(
            lambda pdf: kernel(pdf), StructType(df.schema.fields + [StructField(out, DoubleType())])
        ).drop("__one")
    return df.groupBy(*series).applyInPandas(lambda pdf: kernel(pdf), schema)


# ---------------------------------------------------------------- geo

def map_distance(df: DataFrame, lat_col: str, lon_col: str, out: str = "distance",
                 series: Sequence[str] = (), order_by: Column | str = "time") -> DataFrame:
    """MAP_DISTANCE — haversine meters from the previous point
    (fm_monad.go:2109-2142, mods/nums/geography.go).  First row → 0."""
    w = _series_window(series, order_by)
    lat1, lon1 = F.radians(F.lag(lat_col).over(w)), F.radians(F.lag(lon_col).over(w))
    lat2, lon2 = F.radians(F.col(lat_col)), F.radians(F.col(lon_col))
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    meters = F.lit(2.0 * 6371000.0) * F.asin(F.sqrt(a))
    return df.withColumn(out, F.coalesce(meters, F.lit(0.0)))


# ---------------------------------------------------------------- FFT

def fft(df: DataFrame, time_col: str = "time", value_col: str = "value",
        series: Sequence[str] = (), min_hz: float | None = None,
        max_hz: float | None = None, min_samples: int = 16) -> DataFrame:
    """FFT — per-series real FFT of (time, value) → (hz, ampl)
    (mods/tql/fm_fourier.go:23-101; math in mods/nums/fft/fft.go:10-39).

    Replicates the reference exactly:
    - sample rate = n / ((t[n-1]-t[0]) in seconds), times epoch-ns;
    - hz_i = (i/n)·rate for the i-th rfft coefficient, i>0 (DC dropped);
    - amplitude = 2·|c_i|/n;
    - series with < ``min_samples`` rows are dropped (not an error);
    - optional [min_hz, max_hz] band filter.

    ``applyInPandas`` with numpy.fft.rfft: one Arrow batch per series.
    """
    out_fields = [df.schema[c] for c in series] + [
        StructField("hz", DoubleType()), StructField("ampl", DoubleType()),
    ]
    schema = StructType(out_fields)

    def kernel(key, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(time_col)
        n = len(pdf)
        if n < min_samples:
            return pd.DataFrame({f.name: pd.Series(dtype="float64") for f in schema.fields})
        t = pdf[time_col].astype("int64").to_numpy()
        v = pdf[value_col].astype("float64").to_numpy()
        dur_sec = (t[-1] - t[0]) / 1e9
        rate = n / dur_sec
        coeff = np.fft.rfft(v)
        idx = np.arange(len(coeff))
        hz = idx / n * rate
        ampl = 2.0 * np.abs(coeff) / n
        mask = hz > 0
        if min_hz is not None:
            mask &= hz >= min_hz
        if max_hz is not None:
            mask &= hz <= max_hz
        res = {}
        for i, s in enumerate(series):
            res[s] = np.repeat(key[i], mask.sum())
        res["hz"] = hz[mask]
        res["ampl"] = ampl[mask]
        return pd.DataFrame(res)

    if not series:
        grouped = df.withColumn("__one", F.lit(1)).groupBy("__one")
        schema_anon = StructType([StructField("hz", DoubleType()), StructField("ampl", DoubleType())])

        def kernel_anon(pdf):
            import pandas as pd
            out = kernel((), pdf)
            return out[["hz", "ampl"]] if len(out) else pd.DataFrame(
                {"hz": pd.Series(dtype="float64"), "ampl": pd.Series(dtype="float64")})

        return grouped.applyInPandas(lambda pdf: kernel_anon(pdf), schema_anon)
    return df.groupBy(*series).applyInPandas(kernel, schema)
