"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> [query ...]

With no query names, captures every entry in bench.BENCH_QUERIES.  Each
query function is invoked (fixture entries execute their setup), then the
returned DataFrame's formatted plan is written to <out_dir>/<name>_<suffix>.txt
where suffix comes from $PLAN_SUFFIX (default "plan").  Failures are recorded
inline so one broken fixture doesn't kill the sweep.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    suffix = os.environ.get("PLAN_SUFFIX", "plan")

    import bench
    import __spark_entry__ as entrymod
    from neo_server_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="neo-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if not names:
        names = list(bench.BENCH_QUERIES)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as exc:  # record, keep sweeping
            plan = f"ERROR capturing plan: {exc!r}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {time.time() - t0:.1f}s -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
