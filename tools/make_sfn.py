"""Generate an N-times scaled copy of a TESTDATA sf directory for scaling
experiments (default 10x sf0.1 ~= sf1).

Replication preserves join semantics: every key column is shifted by
copy_index * OFFSET so fact/dimension relationships hold within each copy
and keys never collide across copies.  Time columns are left unchanged —
the time range stays fixed while event density grows N-fold, which is how
a higher-throughput feed actually scales (and keeps time-window query
selectivity comparable across scale factors).

Usage: python tools/make_sfn.py [src_dir] [dst_dir] [n_copies] [salt]

With the optional 4th arg ``salt``, each document copy's text is prefixed
with a run of copy-specific tokens so replicas are NOT near-duplicates of
each other: without it, every doc has n_copies exact twins and every
near-dup operator's OUTPUT grows O(n_copies^2) — a property of the
replication, not of the algorithm under test.  Salted replicas measure
candidate-generation scalability on a realistically-deduplicated corpus;
unsalted ones stress the pathological all-dupes case.

Writes parquet per table; dst is disposable scratch (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

OFFSET = 1_000_000_000

#: key columns to shift per copy, per table (dimension tables that the
#: TPC-H queries treat as fixed enumerations — region/nation — replicate
#: by reference, i.e. copy once)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sfn"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from neo_server_spark.session import get_spark

    spark = get_spark(app_name="make-sfn")
    os.makedirs(dst, exist_ok=True)
    for t in COPY_ONCE:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))
        print(t, df.count())
    salt = len(sys.argv) > 4 and sys.argv[4] == "salt"

    reps = spark.range(n).withColumnRenamed("id", "__rep")
    for t, keys in SHIFT.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        out = df.crossJoin(F.broadcast(reps))
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(OFFSET))
        if salt and t == "documents":
            # 25 copy-specific tokens: enough SimHash/MinHash votes that
            # copies of the same base doc stop being near-duplicates
            marker = F.concat_ws(" ", F.array(*[
                F.concat(F.lit(f"rseed{j}x"), F.col("__rep").cast("string"))
                for j in range(25)]))
            out = out.withColumn("text",
                                 F.concat_ws(" ", marker, F.col("text")))
        # realistic file layout: a corpus N times bigger arrives in ~N
        # times more files, not one giant file — a single-file replica
        # makes every scan-side stage look single-threaded and hides
        # nothing about the plan (repartition on __rep keeps copies
        # together so min/max footer pruning on shifted keys still works)
        out = out.repartition(min(n, 200), "__rep")
        out.drop("__rep").write.mode("overwrite") \
           .parquet(os.path.join(dst, f"{t}.parquet"))
        print(t, "x", n)
    print("done ->", dst)


if __name__ == "__main__":
    main()
