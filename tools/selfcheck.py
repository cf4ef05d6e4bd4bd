"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf against its ``oracle_sql()``
DuckDB equivalent and compares row count, column names, and values
(rows sorted, exact match per cell with a float report showing max abs diff
when exact fails).  Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows, columns):
    """Sort columns by name, then rows, mirroring the driver's compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [columns[i] for i in order]


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b or str(a) == str(b)


def main():
    import duckdb

    from neo_server_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_norm, s_cn = normalize(s_rows, s_cols)
        o_norm, o_cn = normalize(o_rows, o_cols)
        dt = time.time() - t0
        if s_cn != o_cn:
            print(f"FAIL  {name}: columns {s_cn} != {o_cn}")
            n_fail += 1
            continue
        if len(s_norm) != len(o_norm):
            print(f"FAIL  {name}: rowcount {len(s_norm)} != {len(o_norm)}")
            n_fail += 1
            continue
        bad = None
        max_diff = 0.0
        n_bad = 0
        for i, (sr, orow) in enumerate(zip(s_norm, o_norm)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if not cells_equal(a, b):
                    n_bad += 1
                    if bad is None:
                        bad = (i, s_cn[j], a, b)
                    try:
                        max_diff = max(max_diff, abs(float(a) - float(b)))
                    except (TypeError, ValueError):
                        max_diff = float("inf")
        if bad:
            print(f"FAIL  {name}: {n_bad} cell mismatches, first row {bad[0]} col {bad[1]}: {bad[2]!r} != {bad[3]!r} (maxdiff={max_diff:.3g})")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_norm)} rows  ({dt:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
