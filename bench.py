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
    "tpch_q3",
    "tpch_q6",
    "tpch_q5",
    "tpch_q4",
    "tpch_q10",
    "tpch_q14",
    "tpch_q7",
    "tpch_q8",
    "tpch_q13",
    "tpch_q18",
    "tpch_q15",
    "tpch_q17",
    "tpch_q2",
    "tpch_q21",
    "tpch_q9",
    "tpch_q19",
    "join_revenue",
    "stats_aggs",
    "lake_pivot",
    "sliding_window",
    "session_window",
    "map_diff_blocked",
    "asof_join",
    "text_stats",
    "token_counts",
    "dedup_exact",
    "similarity_topk",
    "stratified_sample",
    "pii_scrub",
    "vocab_topk",
    "lm_score",
    "curation_funnel",
    # round-7 additions — when comparing totals against BENCH_r06 and
    # earlier, subtract these four (the first 44 names are the stable
    # cross-round set)
    "substring_spans",
    "lm_buckets",
    "pack_sequences",
    "pipeline_v2",
    "semdedup",
    "similarity_pq",
    "data_mixture",
    "quality_classifier",
    "text_normalize",
    # round-8 additions (outside the stable-44 subtotal)
    "c4_filters",
    "line_dedup",
    "dsir_sample",
    "winnow_fp",
    "tfidf_terms",
    "lm2",
    "char_entropy",
    "dedup_incr",
    "gopher_quality",
    "readability",
    # round-9 additions: simhash_pairs' kernel was rebuilt for the 100x
    # campaign (Arrow XOR-popcount verify).  similarity_pq, whose ADC
    # encode was also rebuilt, already runs in the round-7 section —
    # listing it here again double-counted it in the section subtotals
    # and let the later rerun overwrite the earlier timings.
    "simhash_pairs",
    # round-10 additions: the two ANN paths added off the recall audit
    # (batch IVF probe-join; two-stage ADC+rerank) and the transactional
    # table round-trip
    "similarity_ivf_batch",
    "similarity_pq_rerank",
    "txlog_table",
    # round-11 additions: copy-on-write DML + time travel round-trip,
    # JVM-side overlapping chunking, incremental materialized view
    "txlog_dml",
    "doc_chunks",
    "matview_incr",
    # round-12 additions: ROLLUP served from an IVM matview (zero
    # base-table scans) and the deletion-vector delete + compaction
    # round-trip
    "rollup_matview",
    "dv_delete",
    # round-13 additions: order-aware FIRST/LAST folded from the IVM
    # partials, schema evolution through the matview, and the
    # changed-file-bounded corpus version diff (dup-check folded into
    # the diff scan this round)
    "rollup_matview_firstlast",
    "matview_evolve",
    "corpus_diff",
    # round-15 additions: the evolve() escape hatch split into its own
    # entry (r14 verdict #4 — matview_evolve above is pure O(delta)
    # again) and the 64-tag single-scan lake fan-out parity exhibit
    # (r14 stretch #8)
    "matview_evolve_recompute",
    "lake_fanout",
]


def _quiesce(threshold: float, timeout_s: float) -> dict:
    """Spin until the 1-min loadavg drops below ``threshold`` (ambient
    load from OTHER processes — call before any Spark work so our own
    executors don't inflate it).  The r10 driver run started its stable
    section at loadavg 5.9 vs 2.4 for r9 and the whole common set read
    1.15x slower with zero code changes; this gate plus per-rep load
    telemetry makes that attributable instead of a mystery."""
    t0 = time.time()
    waited = 0.0
    load = os.getloadavg()[0]
    while load >= threshold and waited < timeout_s:
        time.sleep(min(5.0, timeout_s - waited))
        waited = time.time() - t0
        load = os.getloadavg()[0]
    if load >= threshold:
        print(f"bench: WARNING quiesce timed out after {waited:.0f}s, "
              f"loadavg {load:.2f} >= {threshold} — timings may read "
              f"slow for ambient reasons", file=sys.stderr)
    return {"threshold": threshold,
            "waited_sec": round(waited, 1),
            "loadavg_after": round(load, 2)}


def main() -> None:
    # quiesce BEFORE the JVM comes up: at this point loadavg is ambient
    quiesce = _quiesce(
        float(os.environ.get("SPARK_GRAFT_QUIESCE_LOAD", "4.0")),
        float(os.environ.get("SPARK_GRAFT_QUIESCE_TIMEOUT", "180")))

    import __spark_entry__ as entrymod
    from neo_server_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="neo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the engine once (JVM, codegen templates, Arrow workers, parquet
    # footers) on miniature synthetic shapes — steady-state per-query latency
    # is the meaningful number, as in the reference's iterated go-bench.
    # Real query DATA is never touched before its timed run.
    _warm_engine(spark)
    qs["tag_scan"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-2 per query: a single timed run is a coin flip under GC /
    # shuffle-service jitter (round-4 recorded a phantom 19% regression on
    # code-untouched queries that a rerun contradicted); the minimum of two
    # runs is the steady-state latency the plan actually costs.
    #
    # Sections run in HISTORICAL order — the stable cross-round set FIRST,
    # before any of the heavy round-7/8 curation queries touch the JVM —
    # with a forced full GC at each section boundary and per-section wall
    # clocks + host load averages in the JSON, so a cross-round comparison
    # of `stable44_sec` is never confounded by what shares the session
    # (rounds 4 and 8 both burned an analysis cycle on exactly that).
    sections = [
        ("stable44", BENCH_QUERIES[:43]),
        ("round7", BENCH_QUERIES[43:52]),
        ("round8", BENCH_QUERIES[52:62]),
        ("round9", BENCH_QUERIES[62:63]),
        ("round10", BENCH_QUERIES[63:66]),
        ("round11", BENCH_QUERIES[66:69]),
        ("round12", BENCH_QUERIES[69:71]),
        ("round13", BENCH_QUERIES[71:74]),
        ("round15", BENCH_QUERIES[74:]),
    ]
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    rep_loads: dict[str, list[float]] = {}
    section_stats: dict[str, dict] = {}
    for sec_name, names in sections:
        spark.sparkContext._jvm.System.gc()
        load0 = list(os.getloadavg())
        sec_t0 = time.time()
        for name in names:
            fn = qs.get(name)
            if fn is None:
                continue
            runs, loads = [], []
            for _rep in range(2):
                loads.append(round(os.getloadavg()[0], 2))
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            # reps that disagree >1.5x on a non-trivial query are jitter,
            # not signal — buy one more sample so min() is trustworthy
            if min(runs) > 0.3 and max(runs) > 1.5 * min(runs):
                loads.append(round(os.getloadavg()[0], 2))
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            reps[name] = runs
            rep_loads[name] = loads
            timings[name] = min(runs)
        section_stats[sec_name] = {
            "wall_sec": round(time.time() - sec_t0, 3),
            "sum_best_sec": round(sum(timings[n] for n in names
                                      if n in timings), 3),
            "loadavg_at_start": [round(x, 2) for x in load0],
        }

    ingest = _bench_ingest(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    # the first 43 names are the unchanged cross-round set ("stable44" kept
    # as the historical field name); everything appended in rounds 7/8 is
    # excluded so the subtotal stays comparable with BENCH_r06 and earlier
    stable = set(BENCH_QUERIES[:43])
    stable44 = round(sum(v for k, v in timings.items() if k in stable), 3)
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query [rep1, rep2(, rep3)] raw timings — the spread IS the
        # noise floor; a "regression" whose min sits inside the other
        # round's spread is jitter, not a plan change.  A third rep is
        # added automatically when the first two disagree >1.5x.
        "query_reps": reps,
        # 1-min loadavg sampled immediately BEFORE each rep — if a slow
        # rep lines up with a load spike, blame the box, not the plan
        "query_rep_loadavg": rep_loads,
        # ambient-load gate before the JVM started (threshold/wait/final)
        "quiesce": quiesce,
        # the first 44 names are the unchanged cross-round set; compare
        # THIS number against BENCH_r06 and earlier totals
        "stable44_sec": stable44,
        "sections": section_stats,
        "sf": sf,
        "ingest": ingest,
    }
    # same-box A/B (HEAD vs the round-start commit, tools/ab_bench.py):
    # the primary cross-round perf signal — a loaded driver box cannot
    # manufacture a regression out of ambient noise when the two
    # commits were measured under identical conditions
    ab_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_ab.json")
    ab = None
    if os.path.exists(ab_path):
        try:
            with open(ab_path) as f:
                ab = json.load(f)
            # refuse a stale measurement: the ratio is only the current
            # perf signal if the MEASURED CODE is this commit's code.
            # Commits that touch only artifacts/docs/tests (e.g. the
            # commit that records bench_ab.json itself) don't invalidate
            # it — the ratio describes paths that did not change.
            import subprocess
            repo = os.path.dirname(ab_path)
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=repo,
                capture_output=True, text=True, timeout=10
            ).stdout.strip()
            if head and ab.get("head_commit") \
                    and not head.startswith(ab["head_commit"]):
                diff = subprocess.run(
                    ["git", "diff", "--name-only",
                     f"{ab['head_commit']}..HEAD"], cwd=repo,
                    capture_output=True, text=True, timeout=10
                ).stdout.splitlines()
                code_changed = any(
                    p.startswith("neo_server_spark/")
                    or p in ("bench.py", "__spark_entry__.py")
                    for p in diff)
                if code_changed or not diff:
                    ab = {"stale": True,
                          "measured_at": ab.get("head_commit"),
                          "ratio": ab.get("ratio")}
        except Exception:
            ab = None
    # targeted per-entry A/B (tools/ab_entry.py, r14 verdict #2): the
    # full per-entry ratio map rides the FULL line only — in r15 it rode
    # the compact line, pushed it over the driver's 2,000-char window,
    # and the trim evicted the 14 FASTEST queries from the driver's
    # ground-truth map (PERF mislabeled them "dropped_from_bench").
    abt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ab_targeted.json")
    abt = None
    if os.path.exists(abt_path):
        try:
            with open(abt_path) as f:
                raw_abt = json.load(f)
            abt = {
                "q": {n: v["ratio"]
                      for n, v in raw_abt.get("entries", {}).items()},
                "ingest": {n: v["ratio"]
                           for n, v in raw_abt.get("ingest", {}).items()},
                "pairs": raw_abt.get("pairs"),
                "conv": raw_abt.get("converged"),
                "base": raw_abt.get("base_commit"),
            }
        except Exception:
            abt = None
    if abt:
        full["abt"] = abt
    if ab:
        full["ab"] = ab
    # Output order matters: the verification driver records only the
    # LAST 2,000 chars of stdout.  The full JSON (reps, loadavgs, the
    # A/B payloads) goes FIRST for humans reading the log; the compact
    # summary prints LAST so the driver tail always carries the
    # cross-round comparison payload.
    print(json.dumps(full))
    print(_compact_tail(total, sf, stable44, timings, reps,
                        section_stats, ingest, quiesce, ab, abt))
    spark.stop()


def _compact_tail(total, sf, stable44, timings, reps, section_stats,
                  ingest, quiesce, ab, abt, limit: int = 1950) -> str:
    """The driver-tail line.  CONTRACT (r15 verdict #2): the per-query
    best map carries EVERY bench entry, always — the driver's
    round-over-round comparison reads this map and a trimmed entry reads
    as "dropped_from_bench".  Core fields print unconditionally (the
    76-entry map plus required fields measures ~1.6k chars); telemetry
    extras are added back one at a time, most valuable first, only while
    the line stays inside the driver's 2,000-char stdout window."""
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "stable44_sec": stable44,
        # 1-decimal bests; the FULL line carries 3-decimal timings
        "queries": {k: round(v, 1) for k, v in timings.items()},
    }
    # variance telemetry (r13 verdict #2): per-query final spread for
    # every flagged query plus rep counts, so a cross-round reader can
    # adjudicate a per-query delta from the tail alone — a "regression"
    # whose min sits inside a >1.5x rep spread is box noise by
    # definition, not a plan change.  Capped at the 4 worst spreads
    # (count preserved in _more) so a loaded box cannot crowd out the
    # telemetry extras below.
    noise = {k: round(max(v) / min(v), 1) for k, v in reps.items()
             if min(v) > 0.3 and max(v) > 1.5 * min(v)}
    if len(noise) > 4:
        worst4 = dict(sorted(noise.items(), key=lambda kv: -kv[1])[:4])
        noise = {**worst4, "_more": len(noise) - 4}
    rep_n = [len(v) for v in reps.values()]
    ab_mini = {k: ab[k] for k in ("ratio", "stale", "base_commit",
                                  "measured_at") if k in ab} if ab else None
    abt_mini = {"pairs": abt.get("pairs"), "conv": abt.get("conv"),
                "base": abt.get("base")} if abt else None
    extras = [
        ("sections_sec", {k: v["sum_best_sec"]
                          for k, v in section_stats.items()}),
        ("ingest_rows_per_sec", (ingest or {}).get(
            "ingest_3col_rows_per_sec")),
        ("noise", noise),
        ("rep_counts", {"q": len(rep_n), "reps": sum(rep_n),
                        "reran": sum(1 for n in rep_n if n > 2)}),
        ("ab", ab_mini),
        ("abt", abt_mini),
        ("quiesce_load", quiesce.get("loadavg_after")),
    ]
    line = json.dumps(compact, separators=(",", ":"))
    for key, val in extras:
        if val is None:
            continue
        trial = dict(compact)
        trial[key] = val
        tline = json.dumps(trial, separators=(",", ":"))
        if len(tline) <= limit:
            compact, line = trial, tline
    # last resort — unreachable with the current 76-entry registry, but
    # if the map ever outgrows the window, trim the sub-cut tail rather
    # than emit a line the driver truncates mid-JSON
    if len(line) > limit:
        for cut in (0.5, 1.0, 2.0):
            compact["queries"] = {k: round(v, 1)
                                  for k, v in timings.items()
                                  if v >= cut}
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= limit:
                break
    return line


def _warm_engine(spark) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    tiny = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.col("id").alias("t"),
        (F.col("id") * 1.5).alias("v"),
    )
    w = Window.partitionBy("k").orderBy("t")
    shapes = [
        tiny.groupBy("k").agg(F.sum("v"), F.percentile(F.col("v"), F.lit(0.5))),
        tiny.withColumn("lag", F.col("v") - F.lag("v").over(w)),
        tiny.join(tiny.groupBy("k").count(), "k", "left"),
        tiny.groupBy("k").applyInPandas(
            lambda pdf: pdf.assign(e=pdf["v"].ewm(alpha=0.5, adjust=False).mean()),
            "k string, t long, v double, e double"),
    ]
    for df in shapes:
        df.write.format("noop").mode("overwrite").save()


def _bench_ingest(spark, sf_dir: str) -> dict:
    """Append-path throughput vs BASELINE.md (3-col tag_simple 1.49M rows/s,
    13-col tag_data 58k rows/s — both single-core reference numbers).

    Measures end-to-end bulk append of the events table into the partitioned
    tag layout: decode-shape projection + day/name-bucket partitioned parquet
    write, the same code path stream_append's foreachBatch uses.
    """
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from neo_server_spark.io import load_table, write_tag_table

    from neo_server_spark.functions.timefn import DAY

    n = 1_000_000  # 1M synthetic rows over 5 days, BASELINE benchmark-style
    base = spark.range(n).select(
        F.concat(F.lit("name-"), (F.col("id") % 5).cast("string")).alias("name"),
        (F.lit(1_704_067_200_000_000_000) + F.col("id") * F.lit(5 * DAY // n)).alias("time"),
        (F.lit(1.001) * (F.col("id") + 1)).alias("value"),
    )
    out: dict[str, float] = {"rows": n}
    wide = base.select(
        "name", "time", "value",
        (F.col("value").cast("long") % 100).cast("short").alias("short_value"),
        (F.col("value").cast("long") % 200).cast("int").alias("ushort_value"),
        F.col("value").cast("int").alias("int_value"),
        F.col("value").cast("long").alias("uint_value"),
        F.col("value").cast("long").alias("long_value"),
        F.col("value").cast("decimal(20,0)").alias("ulong_value"),
        F.col("name").alias("str_value"),
        F.format_string('{"t":"json-%s"}', F.col("name")).alias("json_value"),
        F.lit("127.0.0.1").alias("ipv4_value"),
        F.lit("::1").alias("ipv6_value"),
    )
    for label, df in (("3col", base), ("13col", wide)):
        tmp = tempfile.mkdtemp(prefix=f"neo_ingest_{label}_")
        shutil.rmtree(tmp)
        # steady-state throughput like the reference's iterated go-bench
        # (spi/benchmark_test.go): first write absorbs one-time JVM/codegen
        # warmup, the timed second write measures the path itself.
        # write_salt per io.write_tag_table's SIZING RULE: the batch spans 5
        # day cells, so salt ~= cores / cells keeps one writer wave with
        # large files (measured ~25% over the salt=8 default on local[32]).
        from neo_server_spark.session import default_parallelism
        salt = max(2, default_parallelism() // 5)
        write_tag_table(df, tmp, mode="overwrite", write_salt=salt)
        shutil.rmtree(tmp)
        # best-of-2 timed writes, same rationale as the query timings —
        # a single run swings ~2x under GC/writer jitter
        dt = None
        for _rep in range(2):
            t0 = time.time()
            write_tag_table(df, tmp, mode="overwrite", write_salt=salt)
            dt = min(dt or 9e9, time.time() - t0)
            shutil.rmtree(tmp, ignore_errors=True)
        out[f"ingest_{label}_sec"] = round(dt, 3)
        out[f"ingest_{label}_rows_per_sec"] = round(n / dt)
    return out


if __name__ == "__main__":
    main()
