"""Z-order (Morton) clustering for multi-column data skipping.

A (name, time)-sorted file layout gives tight footer min/max on the sort
prefix only: a predicate on a SECOND column (value, a second time axis,
a geo coordinate) intersects every file and prunes nothing.  Z-ordering
interleaves the bits of several columns' rank-scaled values so that
files covering a contiguous z range cover a small HYPER-RECTANGLE of the
column space — footer stats become tight on EVERY participating column
at once (the locality argument behind Delta's OPTIMIZE ZORDER BY and
the classic Morton-curve UB-tree layout; public literature, no code
lineage).

Spark-first: the z-value is a pure column expression (quantize each
column to ``bits`` levels between its min and max, then interleave with
shift/and/multiply terms — whole-stage-codegen-friendly, no UDF), and
clustering is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
so each output file owns one contiguous z slice.  Cost: one tiny
min/max aggregate + one range shuffle — the same shape as any OPTIMIZE
rewrite, run on cold/closed data.

Reference parity: the engine keeps per-tag partitioned storage + LSM
index merges (machbase_template.conf:520, spi/show.go ShowLsm); z-order
is the lake-layout analogue that serves the same "prune by more than
one key" need at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["zvalue_expr", "zorder_frame"]


def zvalue_expr(quantized: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each already-quantized LONG column
    into one Morton code (column i contributes bit b to output bit
    ``b * n + i``).  Pure shift/and/multiply terms: stays inside
    whole-stage codegen."""
    n = len(quantized)
    # the interleave must fit a signed 64-bit long: bit positions reach
    # (bits-1)*n + (n-1), so cap bits at 63 // n (io.zorder_key applies
    # the same guard) — 4 columns still get 15 bits = 32k levels each
    bits = min(bits, 63 // max(n, 1))
    terms = []
    for b in range(bits):
        for i, q in enumerate(quantized):
            terms.append(
                F.shiftright(q, b).bitwiseAND(F.lit(1))
                * F.lit(1 << (b * n + i)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_frame(df: DataFrame, cols: list[str], target_files: int = 1,
                 bits: int = 16) -> DataFrame:
    """Return ``df`` redistributed into ``target_files`` partitions of
    contiguous z-range, rows z-sorted within each — writing the result
    yields files whose footer min/max are tight on EVERY column in
    ``cols``.

    Quantization is min/max-scaled to ``2**bits`` levels (one tiny agg
    job; NULLs sort to level 0).  Equal-width buckets are the standard
    OPTIMIZE trade-off: rank-perfect buckets would need a full sort, and
    skipping only needs monotone bucketing, not uniform occupancy."""
    row = df.agg(*[f for c in cols for f in
                   (F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"mx_{c}"))]) \
        .first()
    lim = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            quantized.append(F.lit(0).cast("long"))
            continue
        scaled = ((F.col(c).cast("double") - F.lit(float(mn)))
                  / F.lit(float(mx - mn)) * F.lit(float(lim)))
        quantized.append(
            F.coalesce(F.floor(scaled), F.lit(0))
            .cast("long").alias(f"q_{c}"))
    z = zvalue_expr(quantized, bits=bits)
    out = df.withColumn("__z", z)
    out = out.repartitionByRange(max(1, target_files), "__z") \
        .sortWithinPartitions("__z")
    return out.drop("__z")
