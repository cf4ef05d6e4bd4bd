"""Spline interpolators for timewindow gap-fill: predict('AkimaSpline') /
predict('FritschButland') (reference: gonum/interp fillers bound in
fm_monad.go:723-767, fit/predict 1066-1151).

Pure-numpy cubic Hermite evaluation (scipy is not in this container).  Both
methods fit per series over the non-null buckets and predict the null ones —
run as a grouped ``applyInPandas`` kernel over the ALREADY-AGGREGATED bucket
frame, whose size is range/period (tiny next to raw data), so the Python hop
is O(buckets), never O(rows).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _hermite_eval(xk, yk, dk, x):
    """Evaluate the cubic Hermite spline with knots (xk, yk) and knot
    derivatives dk at points x (numpy arrays; x within [xk[0], xk[-1]])."""
    import numpy as np

    idx = np.clip(np.searchsorted(xk, x, side="right") - 1, 0, len(xk) - 2)
    h = xk[idx + 1] - xk[idx]
    t = (x - xk[idx]) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    return h00 * yk[idx] + h10 * h * dk[idx] + h01 * yk[idx + 1] + h11 * h * dk[idx + 1]


def _akima_derivatives(x, y):
    """Knot derivatives per Akima (1970): weighted average of adjacent
    secant slopes, weights = |slope difference| of the outer pairs."""
    import numpy as np

    n = len(x)
    m = np.diff(y) / np.diff(x)
    # extend slopes at both ends (Akima's quadratic extrapolation)
    m_ext = np.concatenate(([2 * m[0] - m[1], 2 * m[0] - m[1]] if n > 2 else [m[0], m[0]],
                            m,
                            [2 * m[-1] - m[-2], 2 * m[-1] - m[-2]] if n > 2 else [m[-1], m[-1]]))
    d = np.empty(n)
    for i in range(n):
        m1, m2, m3, m4 = m_ext[i], m_ext[i + 1], m_ext[i + 2], m_ext[i + 3]
        w1, w2 = abs(m4 - m3), abs(m2 - m1)
        if w1 + w2 == 0:
            d[i] = 0.5 * (m2 + m3)
        else:
            d[i] = (w1 * m2 + w2 * m3) / (w1 + w2)
    return d


def _fritsch_butland_derivatives(x, y):
    """Monotonicity-preserving derivatives (Fritsch-Butland 1984)."""
    import numpy as np

    n = len(x)
    h = np.diff(x)
    m = np.diff(y) / h
    d = np.zeros(n)
    d[0], d[-1] = m[0], m[-1]
    for i in range(1, n - 1):
        if m[i - 1] * m[i] <= 0:
            d[i] = 0.0
        else:
            d[i] = 3 * (h[i - 1] + h[i]) / (
                (2 * h[i] + h[i - 1]) / m[i - 1] + (h[i] + 2 * h[i - 1]) / m[i]
            )
    return d


METHODS = {"akimaspline": _akima_derivatives, "fritschbutland": _fritsch_butland_derivatives}


def spline_fill(df: DataFrame, series: Sequence[str], bucket_col: str,
                targets: Sequence[str], method: str = "akimaspline") -> DataFrame:
    """Fill NULLs in ``targets`` per series by spline interpolation over the
    non-null buckets.  Buckets outside the fitted knot range stay NULL
    (no extrapolation — matches fit/predict gap-fill, not forecasting)."""
    method = method.lower()
    if method not in METHODS:
        raise ValueError(f"unknown spline method {method!r}")
    deriv = METHODS[method]
    schema = df.schema
    tcols = list(targets)
    bcol = bucket_col

    def kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values(bcol).reset_index(drop=True)
        x_all = pdf[bcol].astype("float64").to_numpy()
        for c in tcols:
            y = pdf[c].astype("float64").to_numpy()
            known = ~np.isnan(y)
            if known.sum() < 3:
                continue  # too few knots for a cubic — leave NULLs
            xk, yk = x_all[known], y[known]
            dk = deriv(xk, yk)
            missing = np.isnan(y) & (x_all >= xk[0]) & (x_all <= xk[-1])
            if missing.any():
                y[missing] = _hermite_eval(xk, yk, dk, x_all[missing])
                pdf[c] = y
        return pdf

    if not series:
        return (
            df.withColumn("__one", F.lit(1)).groupBy("__one")
            .applyInPandas(lambda pdf: kernel(pdf.drop(columns="__one")).assign(__one=1),
                           df.withColumn("__one", F.lit(1)).schema)
            .drop("__one")
        )
    return df.groupBy(*series).applyInPandas(lambda key, pdf: kernel(pdf), schema)
