"""1B-row ingest point (r9 VERDICT #6).

The r9 1000x campaign stopped at a 100M-row single batch: one monolithic
repartition of 1B rows needs >8 GB of shuffle buffers in a local JVM.
This tool records the 1B point the way a real feed arrives — as a
SEQUENCE of bounded micro-batches appended to the same partitioned tag
layout (exactly the shape stream_append's foreachBatch drains) — so
memory stays flat at the batch size regardless of total volume.

Usage:
    python tools/ingest_1b.py [total_rows] [batch_rows] [--json out.json]
        [--sync]

``--sync`` runs os.sync() after every batch and charges it to that
batch's wall clock.  Rationale (r11 attribution): without it the early
batches ride the page cache while the tail pays accumulated writeback
once cumulative dirty bytes cross vm.dirty_* throttling (the r10 run's
11s->21s "slowdown" reproduced EXACTLY with compaction keeping file
counts flat, and per-batch Dirty: telemetry below shows the threshold
crossing) — so flat-vs-rising is an OS cache artifact, not an engine
property.  With --sync every batch pays its own writeback: the timings
are flat and equal to true disk-bound steady state.

Prints per-batch and aggregate 3-col rows/s on the same write path
bench.py's ingest section measures (write_tag_table: day-partitioned,
salted, (name,time)-clustered parquet).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402


def main():
    from neo_server_spark.functions.timefn import DAY
    from neo_server_spark.io import write_tag_table
    from neo_server_spark.session import default_parallelism, get_spark

    args = [a for a in sys.argv[1:]]
    json_out = None
    do_sync = "--sync" in args
    if do_sync:
        args.remove("--sync")
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    total = int(args[0]) if args else 1_000_000_000
    batch = int(args[1]) if len(args) > 1 else 50_000_000

    spark = get_spark(app_name="ingest-1b")
    spark.sparkContext.setLogLevel("ERROR")
    salt = max(2, default_parallelism() // 5)
    out_dir = tempfile.mkdtemp(prefix="neo_ingest_1b_")
    shutil.rmtree(out_dir)

    def feed(start: int, n: int):
        # same 3-col shape as bench.py's ingest section: 5 tags, 5 days
        return spark.range(start, start + n).select(
            F.concat(F.lit("name-"), (F.col("id") % 5).cast("string"))
             .alias("name"),
            (F.lit(1_704_067_200_000_000_000)
             + (F.col("id") % total) * F.lit(5 * DAY // total)).alias("time"),
            (F.lit(1.001) * (F.col("id") + 1)).alias("value"),
        )

    # warmup: absorb JVM/codegen/committer one-time cost on a small batch
    write_tag_table(feed(0, 1_000_000), out_dir, mode="overwrite",
                    write_salt=salt)
    shutil.rmtree(out_dir)

    import os
    from datetime import datetime, timezone

    from neo_server_spark.io import compact_tag_table

    def day_of(t_ns: int) -> str:
        return datetime.fromtimestamp(t_ns / 1e9, tz=timezone.utc) \
            .strftime("%Y%m%d")

    # maintenance cadence (r10 VERDICT #5: per-batch wall rose 11s->21s
    # as day-dirs accumulated ~600 files): after each batch, compact the
    # day partitions the monotone feed has CLOSED — a cold partition
    # races with nothing, so this is exactly the production cadence
    # compact_tag_table documents.  Compaction cost is recorded
    # separately; it overlaps nothing here but would run as its own job
    # on a cluster.
    def dirty_kb() -> int:
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("Dirty:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return -1

    walls = []
    dirty = []
    compactions = []
    compacted: set[str] = set()
    t_all = time.time()
    done = 0
    while done < total:
        n = min(batch, total - done)
        t0 = time.time()
        write_tag_table(feed(done, n), out_dir, mode="append",
                        write_salt=salt)
        if do_sync:
            os.sync()          # charge this batch's writeback to itself
        dt = time.time() - t0
        walls.append(round(dt, 1))
        dirty.append(dirty_kb())
        done += n
        print(f"batch {len(walls)}: {n:,} rows in {dt:.1f}s "
              f"({n / dt / 1e6:.2f}M rows/s) dirty={dirty[-1] // 1024}MB "
              f"— {done:,}/{total:,}", flush=True)
        # day cells strictly before the feed's current day are closed
        open_day = day_of(1_704_067_200_000_000_000
                          + (done % total) * (5 * DAY // total))
        closed = sorted(
            d for d in os.listdir(out_dir)
            if d.startswith("_day=") and d.split("=", 1)[1] < open_day
            and d not in compacted)
        if closed and done < total:
            t0 = time.time()
            compact_tag_table(spark, out_dir, partitions=closed)
            csec = time.time() - t0
            compacted.update(closed)
            compactions.append({"after_batch": len(walls),
                                "days": [d.split("=")[1] for d in closed],
                                "sec": round(csec, 1)})
            print(f"  compacted {closed} in {csec:.1f}s", flush=True)
    wall = time.time() - t_all
    append_wall = sum(walls)
    rps = total / append_wall          # comparable with the r9/r10 points
    # sanity: all rows landed (footer-count only — no full scan)
    landed = spark.read.parquet(out_dir).count()
    first5 = sum(walls[:5]) / min(5, len(walls))
    last5 = sum(walls[-5:]) / min(5, len(walls))
    rep = {"total_rows": total, "batch_rows": batch,
           "wall_sec": round(wall, 1), "rows_per_sec": round(rps),
           "rows_per_sec_incl_maintenance": round(total / wall),
           "batches_sec": walls, "landed_rows": landed,
           "write_salt": salt, "sync_per_batch": do_sync,
           "dirty_kb_after_batch": dirty,
           "compactions": compactions,
           "compact_sec_total": round(sum(c["sec"] for c in compactions), 1),
           "first5_mean_sec": round(first5, 2),
           "last5_mean_sec": round(last5, 2),
           "last5_over_first5": round(last5 / first5, 3)}
    print(json.dumps(rep))
    assert landed == total, (landed, total)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rep, f, indent=1)
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
