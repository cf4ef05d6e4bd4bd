"""Row-transform (MAP) operators: projection / filter / limit / reshape.

Reference semantics: mods/tql/fm_monad.go (FILTER 114, TAKE 37, DROP 77,
MAPVALUE 1745, PUSHVALUE 1612, POPVALUE 1698, key ops 1515-1610,
TRANSPOSE 2415, FLATTEN 273, FILTER_CHANGED 121).

All are thin, Catalyst-friendly wrappers: pure Column expressions, no UDFs,
so filter/limit pushdown and column pruning stay intact.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _to_col(expr: Column | str) -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


# ---------------------------------------------------------------- FILTER / limits

def filter_(df: DataFrame, predicate: Column | str) -> DataFrame:
    """FILTER(expr) — keep records where predicate holds (fm_monad.go:114)."""
    return df.filter(_to_col(predicate))


def take(df: DataFrame, n: int, offset: int = 0, order_by: Sequence[Column | str] | None = None) -> DataFrame:
    """TAKE([offset,] n) (fm_monad.go:37-75).

    TQL relies on pipeline arrival order; distributed limit needs an explicit
    order to be deterministic.  With ``order_by`` this compiles to Catalyst's
    TakeOrderedAndProject (top-k per partition, no full sort at scale).
    """
    if order_by is not None:
        df = df.orderBy(*[_to_col(c) for c in order_by])
    if offset:
        df = df.offset(offset)
    return df.limit(n)


def drop_(df: DataFrame, n: int, offset: int = 0, order_by: Sequence[Column | str] | None = None) -> DataFrame:
    """DROP([offset,] n) — skip n records (fm_monad.go:77-112).

    Rows before ``offset`` and from ``offset + n`` on are kept.
    """
    if order_by is None:
        return df.offset(n)  # arrival-order best effort
    cols = df.columns
    w = Window.orderBy(*[_to_col(c) for c in order_by])
    rn = F.row_number().over(w) - 1  # 0-based like TQL record numbering
    return (
        df.withColumn("__rn", rn)
        .filter((F.col("__rn") < offset) | (F.col("__rn") >= offset + n))
        .select(*cols)
    )


# ---------------------------------------------------------------- value column ops

def mapvalue(df: DataFrame, idx: int, expr: Column | str, name: str | None = None,
             where: Column | str | None = None) -> DataFrame:
    """MAPVALUE(idx, expr [, name][, where()]) (fm_monad.go:1745-1804).

    Replaces column ``idx``; an out-of-range ``idx`` appends instead (reference
    inserts when idx is out of range).  ``where`` guards the rewrite per row,
    keeping the original value elsewhere.
    """
    cols = df.columns
    new = _to_col(expr)
    if 0 <= idx < len(cols):
        old_name = cols[idx]
        out_name = name or old_name
        if where is not None:
            new = F.when(_to_col(where), new).otherwise(F.col(old_name))
        projected = [
            new.alias(out_name) if i == idx else F.col(c) for i, c in enumerate(cols)
        ]
        return df.select(*projected)
    out_name = name or f"column{len(cols)}"
    return df.select(*cols, new.alias(out_name))


def pushvalue(df: DataFrame, idx: int, expr: Column | str, name: str | None = None) -> DataFrame:
    """PUSHVALUE(idx, expr [, name]) — insert a column at position idx
    (fm_monad.go:1612-1696)."""
    cols = list(df.columns)
    idx = max(0, min(idx, len(cols)))
    out_name = name or f"column{len(cols)}"
    projected = [F.col(c) for c in cols]
    projected.insert(idx, _to_col(expr).alias(out_name))
    return df.select(*projected)


def popvalue(df: DataFrame, *idxs: int) -> DataFrame:
    """POPVALUE(idx...) — delete columns by position (fm_monad.go:1698-1743)."""
    cols = df.columns
    keep = [c for i, c in enumerate(cols) if i not in set(idxs)]
    return df.select(*keep)


# ---------------------------------------------------------------- key ops

def mapkey(df: DataFrame, expr: Column | str, name: str | None = None) -> DataFrame:
    """MAPKEY(expr) — replace the key (column 0) (fm_monad.go:1597-1610)."""
    cols = df.columns
    out_name = name or cols[0]
    return df.select(_to_col(expr).alias(out_name), *cols[1:])


def pushkey(df: DataFrame, expr: Column | str, name: str = "key") -> DataFrame:
    """PUSHKEY(newkey) — old key becomes the first value, newkey becomes key
    (fm_monad.go:1575-1595)."""
    cols = df.columns
    return df.select(_to_col(expr).alias(name), *cols)


def popkey(df: DataFrame, idx: int = 0) -> DataFrame:
    """POPKEY([idx]) — drop the key; value ``idx`` becomes the new key
    (fm_monad.go:1515-1570)."""
    cols = df.columns
    values = cols[1:]
    if not values:
        return df
    idx = max(0, min(idx, len(values) - 1))
    new_key = values[idx]
    rest = [c for i, c in enumerate(values) if i != idx]
    return df.select(new_key, *rest)


# ---------------------------------------------------------------- reshape

def transpose(df: DataFrame, fixed: Sequence[int] = (), header: bool = False) -> DataFrame:
    """TRANSPOSE([fixed(i...)]) — unpivot value columns into rows
    (fm_monad.go:2415-2594).

    Fixed columns are kept; remaining columns melt into (name, value) pairs via
    ``stack`` — a narrow transformation, no shuffle.  ``header=True`` labels
    rows with the source column name (mirrors the reference's header() option).
    """
    from pyspark.sql.types import NumericType

    cols = df.columns
    fixed_cols = [cols[i] for i in fixed]
    melt_cols = [c for i, c in enumerate(cols) if i not in set(fixed)]
    ids = [F.col(c) for c in fixed_cols]
    # stack needs one common type: all-numeric melts to double, anything
    # else melts to string (the reference's record values are untyped `any`,
    # fm_monad.go:2415 — string is the faithful mixed-type behavior)
    all_numeric = all(
        isinstance(df.schema[c].dataType, NumericType) for c in melt_cols
    )
    target = "double" if all_numeric else "string"
    pairs: list[Column] = []
    for c in melt_cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast(target))
    stacked = F.stack(F.lit(len(melt_cols)), *pairs).alias("col_name", "value")
    out = df.select(*ids, stacked)
    if not header:
        out = out.drop("col_name")
    return out


def flatten(df: DataFrame, array_col: str | None = None) -> DataFrame:
    """FLATTEN() — explode a nested array value into records (fm_monad.go:273-324)."""
    cols = df.columns
    target = array_col or cols[-1]
    others = [c for c in cols if c != target]
    return df.select(*others, F.explode(F.col(target)).alias(target))


# ---------------------------------------------------------------- FILTER_CHANGED

def filter_changed(
    df: DataFrame,
    value_col: str,
    series: Sequence[str] = (),
    order_by: str | Column = "time",
    retain_duration: int | None = None,
    time_col: str = "time",
    use_first: bool = False,
    with_last: bool = False,
) -> DataFrame:
    """FILTER_CHANGED(value [, retain(t, dur)] [, useFirstWithLast()]) —
    deduplicate runs of equal values (fm_monad.go:121-238).

    Semantics (set-equivalent to the reference's streaming emission):
    - base: the FIRST record of each equal-value run passes;
    - ``retain_duration`` (ns): a run only emits once its value has held for
      >= duration — the emitted record is the first one crossing the hold
      threshold, or the run's first record when ``use_first``;
    - ``with_last``: additionally the LAST record of each run passes
      (the reference emits it on the next change / EOF).

    Spark shape: gaps-and-islands — a run id from a cumulative change
    counter, then per-run window ranks.  Two window passes over the same
    (series, order) sort; no UDFs.
    """
    orders = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    w = Window.partitionBy(*[F.col(c) for c in series]).orderBy(*[_to_col(o) for o in orders])
    cols = df.columns
    if retain_duration is None and not with_last:
        # fast path: first-of-run needs only lag over one window pass
        prev0 = F.lag(F.col(value_col)).over(w)
        keep0 = (F.row_number().over(w) == 1) | ~prev0.eqNullSafe(F.col(value_col))
        return df.withColumn("__keep", keep0).filter(F.col("__keep")).select(*cols)
    prev = F.lag(F.col(value_col)).over(w)
    changed = F.when(~prev.eqNullSafe(F.col(value_col)) | (F.row_number().over(w) == 1), 1).otherwise(0)
    out = df.withColumn("__rid", F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    rw = Window.partitionBy(*[F.col(c) for c in series], F.col("__rid")).orderBy(
        *[_to_col(o) for o in orders])
    full = rw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = out.withColumn("__rn", F.row_number().over(rw))
    out = out.withColumn("__last_rn", F.max(F.col("__rn")).over(full))
    if retain_duration is None:
        keep = F.col("__rn") == 1
    else:
        run_start = F.min(F.col(time_col)).over(full)
        held = (F.col(time_col).cast("long") - run_start.cast("long")) >= F.lit(retain_duration)
        out = out.withColumn("__fh", F.min(F.when(held, F.col("__rn"))).over(full))
        if use_first:
            keep = F.col("__fh").isNotNull() & (F.col("__rn") == 1)
        else:
            keep = F.col("__rn") == F.col("__fh")
    if with_last:
        keep = keep | (F.col("__rn") == F.col("__last_rn"))
    return out.filter(keep).select(*cols)
