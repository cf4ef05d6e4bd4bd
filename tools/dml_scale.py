"""Measure copy-on-write DML cost scaling on txlog tables.

Claim under test: DELETE/UPDATE/MERGE cost is O(touched files), not
O(table) — at 100 TB a targeted delete (one tag, one day, one doc set)
rewrites the handful of files the commit-log stats can't rule out,
while a naive engine rewrites the corpus.

Builds a txlog table from N copies of sf0.1 events (key-shifted like
tools/make_sfn.py so ids stay unique), committed as one file per
event_id range so footer stats give disjoint [min,max] id windows —
the layout a time/tag-partitioned ingest produces naturally.  Then:

  * narrow DELETE (~0.1% of rows, contiguous ids) with stats pruning
  * the same DELETE with pruning disabled (discovery must scan all)
  * MERGE upsert of a small source (0.05% of keys)
  * FULL REWRITE baseline: what overwrite-the-table would cost

Prints one JSON line; run at several scales to see the curve:

    python tools/dml_scale.py 10          # ~1M rows
    python tools/dml_scale.py 100         # ~10M rows
    python tools/dml_scale.py 3000 10     # ~300M rows, 10 copies/commit

The second arg batches N copies into one commit (fewer, bigger write
jobs — the build would otherwise dominate the 300M point); each FILE
still holds a tight disjoint event_id window, so pruning behaves
identically.  The 300M run also measures the r12 additions: an
incrementally-maintained MatView (initial fold, O(delta) refresh after
an append, CDF signed-fold refresh after a DV delete) and a
time-travel read of the pre-delete snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo_server_spark import dml, txlog  # noqa: E402
from neo_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_commit = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n0 = base.count()
    root = tempfile.mkdtemp(prefix="dml_scale_")
    t = os.path.join(root, "tbl")
    out = {"copies": copies, "rows": n0 * copies,
           "copies_per_commit": per_commit}

    def _shifted(ks: list[int]):
        # explode over the batch's offsets: ONE job writes the whole
        # batch, each file still a tight disjoint id window after the
        # range repartition (the shape a time-ordered ingest produces)
        offs = F.array(*[F.lit(k * 10_000_000) for k in ks])
        return (base.withColumn("__o", F.explode(offs))
                .select((F.col("event_id") + F.col("__o"))
                        .alias("event_id"),
                        "user_id", "event_type",
                        F.floor(F.col("value") * 1000).alias("val")))

    tick = time.time()
    for k0 in range(0, copies, per_commit):
        ks = list(range(k0, min(k0 + per_commit, copies)))
        txlog.write(_shifted(ks).repartitionByRange(4 * len(ks),
                                                    "event_id"),
                    t, stats_cols=["event_id"])
    out["build_sec"] = round(time.time() - tick, 3)
    out["files"] = len(txlog.live_files(t))

    # ---- incrementally-maintained MatView over the table (r12) ----
    from neo_server_spark.streaming.matview import MatView

    mv = MatView(spark, t, os.path.join(root, "view"),
                 keys=["event_type"],
                 aggs={"n": ("count", "event_id"),
                       "total": ("sum", "val")})
    tick = time.time()
    assert mv.refresh()["mode"] == "incremental"     # initial full fold
    out["matview_initial_sec"] = round(time.time() - tick, 3)
    # one more appended copy: refresh must fold ONLY the delta files
    txlog.write(_shifted([copies]).repartitionByRange(4, "event_id"),
                t, stats_cols=["event_id"])
    tick = time.time()
    r = mv.refresh()
    out["matview_delta_sec"] = round(time.time() - tick, 3)
    out["matview_delta_mode"] = r["mode"]

    # DV delete WITH row-level change files, then a CDF signed-fold
    # refresh: view maintenance cost = O(deleted rows), not O(table)
    lo4 = 1 * 10_000_000
    hi4 = lo4 + n0 // 10
    ver_before_dv = txlog.current_version(t)
    tick = time.time()
    dml.delete(spark, t, f"event_id >= {lo4} AND event_id < {hi4}",
               prune={"event_id": (lo4, hi4 - 1)}, mode="dv", cdf=True)
    out["delete_dv_cdf_sec"] = round(time.time() - tick, 3)
    tick = time.time()
    r = mv.refresh()
    out["matview_cdf_sec"] = round(time.time() - tick, 3)
    out["matview_cdf_mode"] = r["mode"]

    # time travel: the pre-delete snapshot resolves from log metadata
    # alone (no copies) — the read itself is a plain scan of old files
    tick = time.time()
    out["timetravel_rows"] = txlog.read_table(
        spark, t, version_as_of=ver_before_dv).count()
    out["timetravel_sec"] = round(time.time() - tick, 3)

    # narrow contiguous delete: ~0.1% of rows in ONE copy's id window
    lo, hi = 3 * 10_000_000, 3 * 10_000_000 + n0 // 10
    tick = time.time()
    res = dml.delete(spark, t, f"event_id >= {lo} AND event_id < {hi}",
                     prune={"event_id": (lo, hi - 1)},
                     stats_cols=["event_id"])
    out["delete_pruned_sec"] = round(time.time() - tick, 3)
    out["delete_pruned_candidates"] = res["files_total"]
    out["delete_pruned_touched"] = res["files_touched"]

    # same shape without pruning: discovery scans every live file
    lo2 = 5 * 10_000_000
    hi2 = lo2 + n0 // 10
    tick = time.time()
    res = dml.delete(spark, t,
                     f"event_id >= {lo2} AND event_id < {hi2}",
                     stats_cols=["event_id"])
    out["delete_unpruned_sec"] = round(time.time() - tick, 3)
    out["delete_unpruned_candidates"] = res["files_total"]
    out["delete_unpruned_touched"] = res["files_touched"]

    # same narrow delete via DELETION VECTORS: writes O(matched rows)
    # of tombstones, rewrites nothing
    lo3 = 8 * 10_000_000
    hi3 = lo3 + n0 // 10
    tick = time.time()
    res = dml.delete(spark, t, f"event_id >= {lo3} AND event_id < {hi3}",
                     prune={"event_id": (lo3, hi3 - 1)}, mode="dv")
    out["delete_dv_sec"] = round(time.time() - tick, 3)
    out["delete_dv_touched"] = res["files_touched"]
    tick = time.time()
    out["read_after_dv_rows"] = txlog.read_table(spark, t).count()
    out["read_after_dv_sec"] = round(time.time() - tick, 3)

    # small merge upsert: 0.05% of keys spread over two copies
    src = (base.limit(max(1, n0 // 2000))
           .select((F.col("event_id") + 7 * 10_000_000).alias("event_id"),
                   "user_id", F.lit("merged").alias("event_type"),
                   F.lit(-1).cast("long").alias("val")))
    tick = time.time()
    res = dml.merge(spark, t, src, on=["event_id"],
                    stats_cols=["event_id"])
    out["merge_sec"] = round(time.time() - tick, 3)
    out["merge_touched"] = res["files_touched"]

    # baseline: the O(table) full rewrite a stats-free engine pays
    tick = time.time()
    full = txlog.read_table(spark, t).filter("event_id % 1000 != 0")
    txlog.write(full, t + "_rewrite", mode="overwrite")
    out["full_rewrite_sec"] = round(time.time() - tick, 3)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
