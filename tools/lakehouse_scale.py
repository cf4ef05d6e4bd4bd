"""Measure the r12/r13 lakehouse surfaces' cost scaling on txlog tables.

Claims under test (all "O(metadata) or O(churn), never O(table)"):

  * CLONE is O(live files) hardlinks + one commit — zero data bytes.
  * DESCRIBE HISTORY is O(surviving log entries) — zero data reads.
  * corpus_diff of an UNCHANGED table is a pure log question (zero
    data-file scans); after a narrow DML it reads only the file-set
    symmetric difference.
  * MatView.evolve backfills new aggregates from post-evolution files
    only — adding a column to a 300M-row view costs the new tranche,
    not the table.

Builds the same key-shifted N-copies-of-sf0.1-events table as
tools/dml_scale.py (one tight event_id window per file), then times
each operation plus a full-scan baseline for contrast.  Prints one
JSON line; run at several scales to see the curve:

    python tools/lakehouse_scale.py 10          # ~1M rows
    python tools/lakehouse_scale.py 100         # ~10M rows
    python tools/lakehouse_scale.py 3000 10     # ~300M rows
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo_server_spark import dml, txlog  # noqa: E402
from neo_server_spark.datapipe.versioning import corpus_diff  # noqa: E402
from neo_server_spark.session import get_spark  # noqa: E402
from neo_server_spark.streaming.matview import MatView  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_commit = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n0 = base.count()
    root = tempfile.mkdtemp(prefix="lake_scale_")
    t = os.path.join(root, "tbl")
    out = {"copies": copies, "rows": n0 * copies,
           "copies_per_commit": per_commit}

    def _shifted(ks: list[int]):
        offs = F.array(*[F.lit(k * 10_000_000) for k in ks])
        return (base.withColumn("__o", F.explode(offs))
                .select((F.col("event_id") + F.col("__o"))
                        .alias("event_id"),
                        "event_type",
                        F.floor(F.col("value") * 1000).alias("val")))

    tick = time.time()
    for k0 in range(0, copies, per_commit):
        ks = list(range(k0, min(k0 + per_commit, copies)))
        txlog.write(_shifted(ks).repartitionByRange(4 * len(ks),
                                                    "event_id"),
                    t, stats_cols=["event_id"])
    out["build_sec"] = round(time.time() - tick, 3)
    out["files"] = len(txlog.live_files(t))

    # warm the session's local-frame path once (first createDataFrame
    # pays ~1s of Py4J conversion init — session cost, not operation
    # cost; the timings below measure the operations)
    spark.createDataFrame([], "x long").count()

    # full-scan baseline: what any O(table) answer would at least cost
    tick = time.time()
    out["fullscan_rows"] = txlog.read_table(spark, t).count()
    out["fullscan_sec"] = round(time.time() - tick, 3)

    # ---- CLONE: O(files) hardlinks, zero data bytes ----
    tick = time.time()
    txlog.clone(t, os.path.join(root, "cl"))
    out["clone_sec"] = round(time.time() - tick, 3)

    # ---- DESCRIBE HISTORY: O(entries) ----
    tick = time.time()
    out["history_entries"] = len(txlog.history(t))
    out["history_sec"] = round(time.time() - tick, 3)

    # ---- corpus_diff, unchanged: zero data-file scans ----
    v = txlog.current_version(t)
    tick = time.time()
    out["diff_unchanged_rows"] = corpus_diff(
        spark, t, v, v, key="event_id", digest_cols=["val"]).count()
    out["diff_unchanged_sec"] = round(time.time() - tick, 3)

    # ---- corpus_diff after a narrow DML: bounded by churn ----
    lo = 2 * 10_000_000
    hi = lo + n0 // 20
    dml.update(spark, t, f"event_id >= {lo} AND event_id < {hi}",
               {"val": "val + 1"},
               prune={"event_id": (lo, hi - 1)})
    tick = time.time()
    out["diff_churn_rows"] = corpus_diff(
        spark, t, v, txlog.current_version(t),
        key="event_id", digest_cols=["val"]).count()
    out["diff_churn_sec"] = round(time.time() - tick, 3)

    # ---- MatView.evolve: widen with a new-column agg, backfill only
    # the post-evolution tranche ----
    mv = MatView(spark, t, os.path.join(root, "view"),
                 keys=["event_type"],
                 aggs={"n": ("count", "event_id"),
                       "total": ("sum", "val")})
    tick = time.time()
    mv.refresh()
    out["matview_initial_sec"] = round(time.time() - tick, 3)

    # ---- chunked, restartable bootstrap (r13 #3): same table, a
    # second view built in bounded per-commit-range chunks — each an
    # atomic publish with the cursor in the rows, so a kill resumes at
    # the last chunk.  Must produce IDENTICAL partials to the
    # monolithic fold (semigroup reassociation only) ----
    mv2 = MatView(spark, t, os.path.join(root, "view2"),
                  keys=["event_type"],
                  aggs={"n": ("count", "event_id"),
                        "total": ("sum", "val")})
    # r14 verdict #5: FINER chunks (32 bounded restart points) but the
    # publish — the dominant per-chunk cost at this scale — amortized
    # over publish_every chunks, so the whole build pays ~4 view
    # overwrites instead of one per chunk
    chunk_files = max(out["files"] // 32, 1)
    tick = time.time()
    rb = mv2.bootstrap(max_files_per_chunk=chunk_files,
                       publish_every=8)
    out["bootstrap_chunked_sec"] = round(time.time() - tick, 3)
    out["bootstrap_chunks"] = rb["chunks"]
    out["bootstrap_publishes"] = rb.get("publishes")
    out["bootstrap_chunk_files"] = chunk_files

    def _phash(m):
        import hashlib
        rows = sorted(map(tuple, m.read_partials().collect()))
        return hashlib.md5(repr(rows).encode()).hexdigest()

    out["bootstrap_partials_hash_equal"] = _phash(mv) == _phash(mv2)

    ev_ver = txlog.current_version(t) + 1
    txlog.write(_shifted([copies]).withColumn(
        "w", (F.col("val") * 2)).repartitionByRange(4, "event_id"),
        t, stats_cols=["event_id"], merge_schema=True)
    mv.refresh()
    tick = time.time()
    r = mv.evolve({"wsum": ("sum", "w"), "whi": ("max", "w")},
                  since_version=ev_ver)
    out["evolve_sec"] = round(time.time() - tick, 3)
    out["evolve_backfill_files"] = r["backfill_files"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
