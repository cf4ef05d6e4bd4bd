"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the no-op sink (full pipeline runs, no driver
collect overhead), matching how a cluster job would consume results.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: benchmark set — the expensive/representative subset of queries()
BENCH_QUERIES = [
    "tag_scan",
    "timewindow_avg",
    "group_aggs",
    "filter_changed",
    "map_diff",
    "map_movavg",
    "rollup_hourly",
    "histogram",
    "boxplot",
    "pivot_counts",
    "tpch_q1",
    "join_revenue",
    "text_stats",
    "token_counts",
    "dedup_exact",
    "similarity_topk",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from neo_server_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="neo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM + parquet footers once
    qs["tag_scan"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
