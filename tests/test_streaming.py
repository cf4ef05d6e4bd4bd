"""Streaming ingest / rollup / watcher / retention tests — file-source streams
with availableNow triggers (runnable in local mode, same code path as Kafka)."""

import json
import os

import pyspark.sql.functions as F
import pytest

from neo_server_spark.streaming import ingest
from neo_server_spark.streaming.watch import Watcher


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_decode_line_protocol(spark):
    df = spark.createDataFrame(
        [("cpu,host=a usage=0.5,idle=99.5,mode=\"x\" 1704067200000000000",)], ["value"]
    )
    rows = {r.name: r.value for r in ingest.decode_line_protocol(df).collect()}
    # one row per numeric field, name = measurement.field (spi/do.go:15-23)
    assert rows == {"cpu.usage": 0.5, "cpu.idle": 99.5}


def test_decode_line_protocol_int_suffix(spark):
    df = spark.createDataFrame([("m f=42i 1000",)], ["value"])
    r = ingest.decode_line_protocol(df).first()
    assert r.name == "m.f" and r.value == 42.0 and r.time == 1000


def test_decode_csv_and_ndjson(spark):
    df = spark.createDataFrame([("tag1,1000,3.5",)], ["value"])
    r = ingest.decode_csv_lines(df).first()
    assert (r.name, r.time, r.value) == ("tag1", 1000, 3.5)
    df2 = spark.createDataFrame([(json.dumps({"name": "t", "time": 5, "value": 1.0}),)], ["value"])
    r2 = ingest.decode_ndjson_lines(df2).first()
    assert (r2.name, r2.time, r2.value) == ("t", 5, 1.0)


def test_decode_json_payload_both_shapes(spark):
    # json_decode.go accepts a bare rows array OR the {"data":{"rows":…}}
    # envelope; garbage payloads drop instead of erroring
    df = spark.createDataFrame(
        [('[["a",123,4.5],["b",456,7.25]]',),
         ('{"data":{"rows":[["c",789,1.5]]}}',),
         ("not json",)], ["value"])
    got = sorted(tuple(r) for r in ingest.decode_json_payload(df).collect())
    assert got == [("a", 123, 4.5), ("b", 456, 7.25), ("c", 789, 1.5)]


def test_stream_append_end_to_end(spark, tmp_path):
    src = tmp_path / "incoming"
    table = tmp_path / "tagtable"
    ckpt = tmp_path / "ckpt"
    day_ns = 86_400 * 10**9
    _write_lines(str(src / "batch1.ndjson"), [
        json.dumps({"name": "s1", "time": 1 * day_ns, "value": 1.0}),
        json.dumps({"name": "s1", "time": 1 * day_ns + 5, "value": 2.0}),
        json.dumps({"name": "s2", "time": 40 * day_ns, "value": 3.0}),
    ])
    q = ingest.stream_append(spark, str(src), str(table), str(ckpt), fmt="ndjson")
    q.awaitTermination(60)
    out = spark.read.parquet(str(table))
    assert out.count() == 3
    assert "_arrival_time" in out.columns
    # partitioned layout: day + name-bucket directories exist
    assert any(e.startswith("_day=") for e in os.listdir(table))
    # exactly-once: re-running the drain does not duplicate
    q2 = ingest.stream_append(spark, str(src), str(table), str(ckpt), fmt="ndjson")
    q2.awaitTermination(60)
    assert spark.read.parquet(str(table)).count() == 3
    # new file appends only the delta
    _write_lines(str(src / "batch2.ndjson"), [
        json.dumps({"name": "s2", "time": 40 * day_ns + 7, "value": 4.0}),
    ])
    q3 = ingest.stream_append(spark, str(src), str(table), str(ckpt), fmt="ndjson")
    q3.awaitTermination(60)
    assert spark.read.parquet(str(table)).count() == 4


def test_stream_rollup_partials_fold_exact(spark, tmp_path):
    from neo_server_spark.sqlx.rollup import SECOND, RollupRouter

    src = tmp_path / "in"
    base = tmp_path / "rollups"
    _write_lines(str(src / "a.ndjson"), [
        json.dumps({"name": "t", "time": int(0.1 * SECOND), "value": 1.0}),
        json.dumps({"name": "t", "time": int(0.2 * SECOND), "value": 3.0}),
    ])
    q = ingest.stream_rollup(spark, str(src), str(base), str(tmp_path / "ck1"))
    q.awaitTermination(60)
    # second batch hits the SAME bucket -> two partial rows, fold must merge
    _write_lines(str(src / "b.ndjson"), [
        json.dumps({"name": "t", "time": int(0.5 * SECOND), "value": 5.0}),
    ])
    q2 = ingest.stream_rollup(spark, str(src), str(base), str(tmp_path / "ck1"))
    q2.awaitTermination(60)
    router = RollupRouter(spark, str(base))
    out = router.query(SECOND, {"cnt": "count", "avg": "avg", "mx": "max", "f": "first", "l": "last"}).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cnt == 3 and r.avg == pytest.approx(3.0) and r.mx == 5.0
    assert r.f == 1.0 and r.l == 5.0
    # compaction folds partials to one physical row, same answers
    ingest.compact_rollup(spark, str(base), "sec")
    assert spark.read.parquet(str(base / "rollup_sec")).count() == 1
    r2 = router.query(SECOND, {"cnt": "count"}).first()
    assert r2.cnt == 3


def test_watcher_high_water_mark(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([("a", 10, 1.0), ("b", 20, 2.0)], ["name", "time", "value"])
    df1.write.mode("append").parquet(path)
    w = Watcher(lambda: spark.read.parquet(path))
    assert w.poll().count() == 2      # first poll sees everything
    assert w.poll().count() == 0      # nothing new
    spark.createDataFrame([("a", 30, 3.0), ("b", 15, 9.0)], ["name", "time", "value"]) \
        .write.mode("append").parquet(path)
    got = w.poll().collect()          # only rows past each tag's mark
    assert {(r.name, r.time) for r in got} == {("a", 30)}


def test_retention_drops_old_days(spark, tmp_path):
    from neo_server_spark.io import write_tag_table

    day_ns = 86_400 * 10**9
    rows = [("x", 5 * day_ns, 1.0), ("x", 400 * day_ns, 2.0)]
    df = spark.createDataFrame(rows, ["name", "time", "value"])
    path = str(tmp_path / "tt")
    write_tag_table(df, path, name_buckets=2)
    dropped = ingest.apply_retention(spark, path, keep_days=90, now_ns=400 * day_ns)
    assert len(dropped) == 1 and dropped[0].startswith("_day=1970")
    assert spark.read.parquet(path).count() == 1


def test_scheduler_timer(spark):
    import time as _t

    from neo_server_spark.streaming.scheduler import Scheduler

    hits = []
    s = Scheduler()
    s.add_timer("t1", 0.1, lambda: hits.append(1), start=True)
    _t.sleep(0.45)
    s.stop("t1")
    n = len(hits)
    assert 2 <= n <= 6
    _t.sleep(0.25)
    assert len(hits) == n  # stopped timers stop firing
    st = s.entries()[0]
    assert st["state"] == "STOP" and st["run_count"] == n


def test_scheduler_error_recorded():
    from neo_server_spark.streaming.scheduler import Scheduler

    s = Scheduler()

    def boom():
        raise RuntimeError("kaput")

    s.add_timer("bad", 99, boom)
    s.trigger_now("bad")
    e = s.entries()[0]
    assert e["run_count"] == 1 and "kaput" in e["last_error"]


def test_streaming_lowpass_state_across_batches(spark, tmp_path):
    """The EWMA accumulator must survive micro-batch boundaries: feeding the
    same rows in one batch vs two must give identical lowpass values."""
    import pyspark.sql.functions as F

    from neo_server_spark.streaming.stateful import streaming_lowpass

    src = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ck"
    _write_lines(str(src / "b1.csv"), ["a,1,10.0", "a,2,20.0"])

    def run_available():
        lines = spark.readStream.format("text").load(str(src))
        parts = F.split(F.col("value"), ",")
        parsed = lines.select(
            parts[0].alias("name"),
            parts[1].cast("long").alias("time"),
            parts[2].cast("double").alias("value"),
        )
        lp = streaming_lowpass(parsed, alpha=0.5, series=["name"])
        q = (lp.writeStream.format("parquet")
             .option("path", str(out_dir)).option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_available()                                     # batch 1: t=1,2
    _write_lines(str(src / "b2.csv"), ["a,3,30.0"])
    run_available()                                     # batch 2: t=3

    got = {r.time: r.lowpass for r in spark.read.parquet(str(out_dir)).collect()}
    # x1=10, x2=0.5*10+0.5*20=15, x3=0.5*15+0.5*30=22.5 (state carried!)
    assert got == {1: 10.0, 2: 15.0, 3: 22.5}


def test_streaming_filter_changed_across_batches(spark, tmp_path):
    import pyspark.sql.functions as F

    from neo_server_spark.streaming.stateful import streaming_filter_changed

    src = tmp_path / "in2"
    out_dir = tmp_path / "out2"
    ckpt = tmp_path / "ck2"
    _write_lines(str(src / "b1.csv"), ["a,1,5.0", "a,2,5.0"])

    def run_available():
        lines = spark.readStream.format("text").load(str(src))
        parts = F.split(F.col("value"), ",")
        parsed = lines.select(
            parts[0].alias("name"),
            parts[1].cast("long").alias("time"),
            parts[2].cast("double").alias("value"),
        )
        fc = streaming_filter_changed(parsed, series=["name"])
        q = (fc.writeStream.format("parquet")
             .option("path", str(out_dir)).option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_available()
    # batch 2 repeats 5.0 — the batch-local window form would re-emit it;
    # the stateful form must not
    _write_lines(str(src / "b2.csv"), ["a,3,5.0", "a,4,7.0"])
    run_available()

    got = sorted((r.time, r.value) for r in spark.read.parquet(str(out_dir)).collect())
    assert got == [(1, 5.0), (4, 7.0)]


def test_compact_tag_table(spark, tmp_path):
    import os

    from neo_server_spark.io import compact_tag_table, write_tag_table

    day_ns = 86_400 * 10**9
    df = spark.range(10_000).selectExpr(
        "concat('t', id % 3) AS name",
        f"CAST(id * 1000000 + {day_ns} AS LONG) AS time",
        "CAST(id AS DOUBLE) AS value",
    )
    path = str(tmp_path / "tt")
    for _ in range(4):                      # 4 appends x salt -> many files
        write_tag_table(df, path, mode="append")
    day_dir = [d for d in os.listdir(path) if d.startswith("_day=")][0]
    before = len([f for f in os.listdir(os.path.join(path, day_dir)) if f.endswith(".parquet")])
    n = compact_tag_table(spark, path, target_file_bytes=1 << 30)
    after = len([f for f in os.listdir(os.path.join(path, day_dir)) if f.endswith(".parquet")])
    assert n >= 1 and before > after == 1
    assert spark.read.parquet(path).count() == 40_000


def test_streaming_timewindow_watermark(spark, tmp_path):
    """Windowed streaming agg: a closed window emits once the watermark
    passes it, and a too-late row is dropped instead of corrupting it."""
    import pyspark.sql.functions as F

    from neo_server_spark.streaming.stateful import streaming_timewindow

    src = tmp_path / "in3"
    out_dir = tmp_path / "out3"
    ckpt = tmp_path / "ck3"
    h = 3_600 * 10**9

    def run_available():
        lines = spark.readStream.format("text").load(str(src))
        parts = F.split(F.col("value"), ",")
        parsed = lines.select(
            parts[0].alias("name"),
            parts[1].cast("long").alias("time"),
            parts[2].cast("double").alias("value"),
        )
        win = streaming_timewindow(parsed, period="1 hour",
                                   watermark="10 minutes", series=["name"])
        q = (win.writeStream.format("parquet").outputMode("append")
             .option("path", str(out_dir)).option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # hour-0 rows
    _write_lines(str(src / "b1.csv"), [f"a,{10 * 60 * 10**9},1.0", f"a,{20 * 60 * 10**9},3.0"])
    run_available()
    # jump to hour 3 — after this batch the watermark passes hour 0
    _write_lines(str(src / "b2.csv"), [f"a,{3 * h + 10**9},5.0"])
    run_available()
    # now a too-late hour-0 row: behind the watermark -> dropped
    _write_lines(str(src / "b3.csv"), [f"a,{30 * 60 * 10**9},100.0"])
    run_available()
    # drain: close remaining windows
    _write_lines(str(src / "b4.csv"), [f"a,{5 * h},7.0"])
    run_available()

    rows = {r.window_start: (r.cnt, r.sum_value)
            for r in spark.read.parquet(str(out_dir)).collect()}
    # hour-0 window closed with ONLY the on-time rows; late 100.0 was dropped
    assert rows[0] == (2, 4.0)


def test_streaming_timewindow_fill_gap_state(spark, tmp_path):
    """Gap-filled streaming buckets: empty buckets discovered across batch
    boundaries emit with the carried last value; open-bucket partials merge."""
    import pyspark.sql.functions as F

    from neo_server_spark.streaming.stateful import streaming_timewindow_fill

    src = tmp_path / "in4"
    out_dir = tmp_path / "out4"
    ckpt = tmp_path / "ck4"
    P = 10  # tiny period in ns for readable buckets

    def run_available():
        lines = spark.readStream.format("text").load(str(src))
        parts = F.split(F.col("value"), ",")
        parsed = lines.select(
            parts[0].alias("name"),
            parts[1].cast("long").alias("time"),
            parts[2].cast("double").alias("value"),
        )
        win = streaming_timewindow_fill(parsed, period_ns=P, series=["name"])
        q = (win.writeStream.format("parquet").outputMode("append")
             .option("path", str(out_dir)).option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # bucket 0: values 2,4 ; bucket 2: first half (10)
    _write_lines(str(src / "b1.csv"), ["a,1,2.0", "a,5,4.0", "a,21,10.0"])
    run_available()
    # bucket 2 second half (20) + jump to bucket 5 -> closes 2,3,4
    _write_lines(str(src / "b2.csv"), ["a,25,20.0", "a,51,7.0"])
    run_available()

    rows = {r.time: (r.cnt, r.avg_value)
            for r in spark.read.parquet(str(out_dir)).collect()}
    assert rows == {
        0: (2, 3.0),      # real bucket
        10: (0, 3.0),     # gap filled with previous value
        20: (2, 15.0),    # partials merged across batches: (10+20)/2
        30: (0, 15.0),
        40: (0, 15.0),
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate (name, time) rows must collapse to one — including a
    duplicate arriving in a LATER micro-batch while the key is still inside
    the watermark horizon."""
    import pyspark.sql.functions as F

    from neo_server_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ck"
    ns = 1_000_000_000

    def run_available():
        lines = spark.readStream.format("text").load(str(src))
        parts = F.split(F.col("value"), ",")
        parsed = lines.select(
            parts[0].alias("name"),
            parts[1].cast("long").alias("time"),
            parts[2].cast("double").alias("value"),
        )
        dd = streaming_dedup(parsed, keys=["name", "time"], watermark="1 hour")
        q = (dd.writeStream.format("parquet")
             .option("path", str(out_dir)).option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_lines(str(src / "b1.csv"),
                 [f"a,{1 * ns},10.0", f"a,{1 * ns},10.0", f"a,{2 * ns},20.0"])
    run_available()                       # in-batch duplicate collapses
    _write_lines(str(src / "b2.csv"),
                 [f"a,{1 * ns},10.0", f"b,{1 * ns},1.0"])
    run_available()                       # cross-batch duplicate suppressed

    rows = sorted((r.name, r.time, r.value)
                  for r in spark.read.parquet(str(out_dir)).collect())
    assert rows == [("a", 1 * ns, 10.0), ("a", 2 * ns, 20.0), ("b", 1 * ns, 1.0)]


def test_stream_curate_end_to_end_and_cross_run_index(spark, tmp_path):
    """Streaming curation (streaming/curation.py): C4 clean + incremental
    dedup inside foreachBatch.  Run 1 curates a directory; run 2 sees new
    files whose docs partially duplicate run 1 — the persistent digest
    index must drop them WITHOUT rescanning the curated corpus."""
    import pyspark.sql.functions as F
    from neo_server_spark.streaming import curation

    good = "this line has plenty of words and punctuation."
    other = "a different proper sentence with enough words here!"
    junk = "short."
    src = tmp_path / "in"
    out = str(tmp_path / "curated")
    idx = str(tmp_path / "index")
    src.mkdir()

    spark.createDataFrame(
        [(0, f"{good}\n{junk}\n{other}"),     # survives, junk line dropped
         (1, f"{good}\n{other}"),             # duplicate text of doc 0's clean
         (2, "lorem ipsum dolor sit amet and then some more.")],  # page kill
        ["doc_id", "text"]).coalesce(1).write.parquet(str(src / "b1"))

    schema = "doc_id long, text string"

    def run(sub):
        stream = spark.readStream.schema(schema).parquet(str(src / sub))
        q = curation.stream_curate(
            stream, idx, out, str(tmp_path / f"ck_{sub}"), min_lines=2)
        q.awaitTermination(120)

    run("b1")
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # doc 1's cleaned text == doc 0's cleaned text -> min id wins; doc 2 dies
    assert set(got) == {0}
    assert got[0] == f"{good}\n{other}"

    # run 2: one doc duplicating run 1's output, one genuinely new
    fresh = "an entirely new sentence that nobody has written yet!"
    spark.createDataFrame(
        [(10, f"{good}\n{other}"),            # already in the index
         (11, f"{fresh}\n{other}")],          # new
        ["doc_id", "text"]).coalesce(1).write.parquet(str(src / "b2"))
    run("b2")
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 11}
    # the index holds exactly the distinct curated digests
    n_idx = spark.read.parquet(idx).distinct().count()
    assert n_idx == 2


def test_curate_batch_epoch_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry replays the same epoch after ANY partial
    failure point (corpus written / both written): epoch-keyed overwrite
    must converge to exactly one copy, never zero and never two."""
    from neo_server_spark.streaming import curation

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(0, "this line has plenty of words and punctuation.\n"
             "a different proper sentence with enough words here!")],
        ["doc_id", "text"])
    for _attempt in range(3):   # original + two retries
        curation.curate_batch(spark, batch, idx, out, min_lines=2,
                              epoch=0, run_key="ckh")
    rows = spark.read.parquet(out).select("doc_id").collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert spark.read.parquet(idx).select("digest").count() == 1
    # a LATER epoch of the same run still accumulates (no cross-epoch
    # overwrite), and its duplicate doc is dropped by the index
    batch2 = spark.createDataFrame(
        [(1, "this line has plenty of words and punctuation.\n"
             "a different proper sentence with enough words here!"),
         (2, "an entirely new sentence that nobody has written yet!\n"
             "and one more full line to clear the line minimum, yes.")],
        ["doc_id", "text"])
    curation.curate_batch(spark, batch2, idx, out, min_lines=2,
                          epoch=1, run_key="ckh")
    got = sorted(r["doc_id"]
                 for r in spark.read.parquet(out).select("doc_id").collect())
    assert got == [0, 2]


def test_curate_mixed_layout_backfill_plus_epochs(spark, tmp_path):
    """A pre-r9 flat backfill (epoch=None appends at the directory root)
    followed by epoch-keyed streaming writes produces a MIXED layout.
    spark.read.parquet on such a directory silently drops the root-level
    files — the index read must union both layouts so backfill digests
    still dedup later batches, and read_layered(out) must surface the
    flat corpus rows."""
    from neo_server_spark.streaming import curation

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    d1 = "this line has plenty of words and punctuation.\n" \
         "a different proper sentence with enough words here!"
    d2 = "an entirely new sentence that nobody has written yet!\n" \
         "and one more full line to clear the line minimum, yes."
    # 1. flat backfill (epoch=None -> root-level parquet)
    curation.curate_batch(spark, spark.createDataFrame(
        [(0, d1)], ["doc_id", "text"]), idx, out, min_lines=2)
    # 2. streaming epoch: duplicates the backfilled doc + one new doc
    curation.curate_batch(spark, spark.createDataFrame(
        [(10, d1), (11, d2)], ["doc_id", "text"]), idx, out,
        min_lines=2, epoch=0, run_key="ckh")
    # the backfilled digest must have been visible: doc 10 dropped
    corpus = curation.read_layered(spark, out)
    assert sorted(r["doc_id"] for r in corpus.collect()) == [0, 11]
    # both digests (flat + epoch) visible through the layered reader
    assert curation.read_layered(spark, idx) \
        .select("digest").distinct().count() == 2
    # a further epoch still dedups against BOTH layers
    curation.curate_batch(spark, spark.createDataFrame(
        [(20, d1), (21, d2)], ["doc_id", "text"]), idx, out,
        min_lines=2, epoch=1, run_key="ckh")
    corpus = curation.read_layered(spark, out)
    assert sorted(r["doc_id"] for r in corpus.collect()) == [0, 11]


def test_stream_append_txlog_transactional(spark, tmp_path):
    """table_format='txlog': the append path lands in a transactional
    table — exactly-once via (run_key, epoch) txn dedupe (a simulated
    foreachBatch retry of a committed epoch is a no-op), snapshot reads
    via txlog.read_table, and time-range data skipping off the commit
    log replaces day-partition pruning."""
    import json as _json

    from neo_server_spark import txlog

    src = tmp_path / "in"
    table = str(tmp_path / "tx_table")
    ckpt = str(tmp_path / "ck")
    day_ns = 86_400 * 10**9
    _write_lines(str(src / "b1.ndjson"), [
        _json.dumps({"name": "s1", "time": 1 * day_ns, "value": 1.0}),
    ])
    q = ingest.stream_append(spark, str(src), table, ckpt, fmt="ndjson",
                             table_format="txlog")
    q.awaitTermination(60)
    # second epoch, disjoint time range -> its own commit + file(s)
    _write_lines(str(src / "b2.ndjson"), [
        _json.dumps({"name": "s2", "time": 40 * day_ns, "value": 3.0}),
    ])
    qb = ingest.stream_append(spark, str(src), table, ckpt, fmt="ndjson",
                              table_format="txlog")
    qb.awaitTermination(60)
    out = txlog.read_table(spark, table)
    assert out.count() == 2 and "_arrival_time" in out.columns
    # a foreachBatch RETRY of the committed epoch collapses to a no-op
    app = ingest._run_key(ckpt)
    retry = out.limit(1)
    assert txlog.write(retry, table, txn=(app, 0)) == 1
    assert txlog.read_table(spark, table).count() == 2
    # checkpoint-restart drain: file-source offsets + txn both hold
    q2 = ingest.stream_append(spark, str(src), table, ckpt, fmt="ndjson",
                              table_format="txlog")
    q2.awaitTermination(60)
    assert txlog.read_table(spark, table).count() == 2
    # data skipping on time: the day-40 range prunes the day-1 file
    assert len(txlog.pruned_files(table, {"time": (39 * day_ns, None)})) \
        < len(txlog.live_files(table))


def test_stream_rollup_txlog_replay_safe(spark, tmp_path):
    """txlog-backed rollup cascade: partials are NOT idempotent under
    duplication (a replayed epoch would double-count), which is exactly
    what the txn commit prevents; the router reads the commit log and
    compact_rollup folds through one atomic overwrite commit."""
    import json as _json

    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import SECOND, RollupRouter

    src = tmp_path / "in"
    base = str(tmp_path / "rollups")
    ck = str(tmp_path / "ck1")
    _write_lines(str(src / "a.ndjson"), [
        _json.dumps({"name": "t", "time": int(0.1 * SECOND), "value": 1.0}),
        _json.dumps({"name": "t", "time": int(0.2 * SECOND), "value": 3.0}),
    ])
    q = ingest.stream_rollup(spark, str(src), base, ck,
                             table_format="txlog")
    q.awaitTermination(60)
    _write_lines(str(src / "b.ndjson"), [
        _json.dumps({"name": "t", "time": int(0.5 * SECOND), "value": 5.0}),
    ])
    q2 = ingest.stream_rollup(spark, str(src), base, ck,
                              table_format="txlog")
    q2.awaitTermination(60)
    router = RollupRouter(spark, base, table_format="txlog")
    r = router.query(SECOND, {"cnt": "count", "avg": "avg",
                              "f": "first", "l": "last"}).first()
    assert r.cnt == 3 and r.avg == pytest.approx(3.0)
    assert r.f == 1.0 and r.l == 5.0
    # replayed epoch (same run_key, epoch 0) must NOT double-count
    sec_table = f"{base}/rollup_sec"
    app = ingest._run_key(ck)
    dup = txlog.read_table(spark, sec_table).limit(1)
    txlog.write(dup, sec_table, txn=(app, 0))
    assert router.query(SECOND, {"cnt": "count"}).first().cnt == 3
    # compaction folds to one physical row via an atomic commit
    ingest.compact_rollup(spark, base, "sec")
    assert txlog.read_table(spark, sec_table).count() == 1
    assert router.query(SECOND, {"cnt": "count"}).first().cnt == 3


def test_rollup_router_build_txlog(spark, tmp_path):
    """RollupRouter(table_format='txlog') materializes the full cascade
    into txlog tables and answers identically to the parquet router."""
    from neo_server_spark.sqlx.rollup import HOUR, RollupRouter

    df = spark.createDataFrame(
        [("a", i * HOUR // 4, float(i)) for i in range(16)],
        ["name", "time", "value"])
    rp = RollupRouter(spark, str(tmp_path / "p"))
    rp.build(df)
    rt = RollupRouter(spark, str(tmp_path / "t"), table_format="txlog")
    rt.build(df)
    want = sorted((r.name, r.time, r.cnt, r.s) for r in
                  rp.query(HOUR, {"cnt": "count", "s": "sum"}).collect())
    got = sorted((r.name, r.time, r.cnt, r.s) for r in
                 rt.query(HOUR, {"cnt": "count", "s": "sum"}).collect())
    assert got == want and len(got) == 4


def test_tag_stat_table_incremental(spark, tmp_path):
    """TagStatTable: per-tag V$T_STAT folded off the txlog CDF — each
    refresh scans ONLY the delta, the fold matches the full-scan
    show_tags answer exactly, the cursor survives a restart (no double
    count), and idle refreshes are free."""
    from neo_server_spark import txlog
    from neo_server_spark.sqlx.catalog import show_tags
    from neo_server_spark.streaming.watch import TagStatTable

    t = str(tmp_path / "tags")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "name string, time long, value double")
    txlog.write(mk([("a", 10, 1.0), ("a", 20, 5.0), ("b", 15, 2.0)]), t)
    st = TagStatTable(spark, t)
    assert st.refresh() == 3
    def full():
        return [(r.name, r.row_count, r.min_time, r.max_time,
                 r.min_value, r.max_value) for r in
                show_tags(txlog.read_table(spark, t)).collect()]
    def stat():
        return [(r.name, r.row_count, r.min_time, r.max_time,
                 r.min_value, r.max_value) for r in st.stats().collect()]
    assert stat() == full()
    assert st.last("a") == (20, 5.0)
    assert st.refresh() == 0                      # idle: no data touched
    # second commit: late row for a (older time), new tag c
    txlog.write(mk([("a", 5, 9.0), ("c", 99, 7.0)]), t)
    assert st.refresh() == 2                      # delta rows only
    assert stat() == full()
    assert st.last("a") == (20, 5.0)              # late row didn't win
    assert st.last("c") == (99, 7.0)
    # restart: a fresh maintainer resumes at the persisted cursor
    st2 = TagStatTable(spark, t)
    assert st2.refresh() == 0
    assert [r.name for r in st2.stats().collect()] == ["a", "b", "c"]
    # compaction rewrite is CDF-silent -> stat table unchanged
    txlog.compact(spark, t, target_files=1)
    assert st2.refresh() == 0
    txlog.write(mk([("b", 30, 0.5)]), t)
    assert st2.refresh() == 1
    got = {r.name: (r.row_count, r.min_value) for r in
           st2.stats().collect()}
    assert got["b"] == (2, 0.5)
    assert stat() == full()                       # st re-reads the table


def test_rollup_hll_approx_distinct(spark, tmp_path):
    """HLL sketch partials in the rollup cascade: approx COUNT(DISTINCT)
    per tag per bucket served from the cascade, with the sketch-union
    invariant pinned EXACTLY — the estimate from folded partials equals
    the estimate from one pass over the raw rows (union is lossless),
    and at small cardinalities the estimate equals the exact count."""
    from neo_server_spark.sqlx.rollup import HOUR, RollupRouter, _summarize

    rows = [("a", (i % 8) * HOUR // 8, float(i), f"user-{i % 37}")
            for i in range(4000)] + \
           [("b", (i % 4) * HOUR // 4, float(i), f"dev-{i % 11}")
            for i in range(1000)]
    df = spark.createDataFrame(rows, ["name", "time", "value", "uid"])
    r = RollupRouter(spark, str(tmp_path / "h"))
    r.build(df, distinct_col="uid")
    got = {x["name"]: x["d"] for x in
           r.query(HOUR, {"d": "approx_distinct"}).collect()}
    # HLL is exact far below its sketch resolution (lgK=12 -> thousands)
    assert got == {"a": 37, "b": 11}
    # lossless-union invariant: estimate(fold(partials)) ==
    # estimate(sketch(raw)) even at finer partial granularity
    import pyspark.sql.functions as F2
    raw = (df.groupBy("name")
           .agg(F2.hll_sketch_estimate(
               F2.hll_sketch_agg("uid")).alias("d")))
    fine = _summarize(df, HOUR // 8, "name", "time", "value",
                      distinct_col="uid")
    from neo_server_spark.sqlx.rollup import _fold
    coarse = _fold(_fold(fine, HOUR // 4), HOUR)
    folded = (coarse.groupBy("name")
              .agg(F2.hll_sketch_estimate(
                  F2.hll_union_agg("hll")).alias("d")))
    assert {(x["name"], x["d"]) for x in folded.collect()} == \
        {(x["name"], x["d"]) for x in raw.collect()}


def test_stream_upsert_cdc_apply(spark, tmp_path):
    """Streaming UPSERT (CDC apply): per micro-batch the order_col-latest
    row per key merges into a txlog table; restarts with the same
    checkpoint replay into no-ops; later epochs overwrite earlier keys
    and the change feed serves the row-level history."""
    from neo_server_spark import txlog

    src = tmp_path / "cdc"
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ck_up")
    _write_lines(str(src / "b1.ndjson"), [
        json.dumps({"name": "s1", "time": 100, "value": 1.0}),
        json.dumps({"name": "s1", "time": 200, "value": 2.0}),   # wins
        json.dumps({"name": "s2", "time": 100, "value": 3.0}),
    ])
    q = ingest.stream_upsert(spark, str(src), table, ckpt,
                             on=["name"], order_col="time",
                             stats_cols=["time"], cdf=True)
    q.awaitTermination(60)
    got = {r["name"]: (r["time"], r["value"])
           for r in txlog.read_table(spark, table).collect()}
    assert got == {"s1": (200, 2.0), "s2": (100, 3.0)}
    v1 = txlog.current_version(table)
    # restart on the same checkpoint: nothing replays
    q2 = ingest.stream_upsert(spark, str(src), table, ckpt,
                              on=["name"], order_col="time",
                              stats_cols=["time"], cdf=True)
    q2.awaitTermination(60)
    assert txlog.current_version(table) == v1
    # second wave: update s2, insert s3
    _write_lines(str(src / "b2.ndjson"), [
        json.dumps({"name": "s2", "time": 500, "value": 9.0}),
        json.dumps({"name": "s3", "time": 50, "value": 7.0}),
    ])
    q3 = ingest.stream_upsert(spark, str(src), table, ckpt,
                              on=["name"], order_col="time",
                              stats_cols=["time"], cdf=True)
    q3.awaitTermination(60)
    got = {r["name"]: (r["time"], r["value"])
           for r in txlog.read_table(spark, table).collect()}
    assert got == {"s1": (200, 2.0), "s2": (500, 9.0),
                   "s3": (50, 7.0)}
    # the merge epoch published row-level changes
    _cur, rows = txlog.row_changes(spark, table, v1)
    by = {}
    for r in rows.collect():
        by.setdefault(r["_change_type"], set()).add(r["name"])
    assert by["update_postimage"] == {"s2"}
    assert by["insert"] == {"s3"}


def test_stream_scd2_dimension(spark, tmp_path):
    """Streaming SCD2: per epoch the latest row per key applies as a
    snapshot — version history accumulates across epochs, restarts
    replay into no-ops, unchanged keys never churn."""
    from neo_server_spark import dml, txlog
    import pyspark.sql.functions as SF

    src = tmp_path / "scd2in"
    table = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ck_scd2")
    # dimension schema = keys + attrs + meta (the stream's `time` is
    # the EFFECTIVE timestamp, not a dimension attribute)
    boot = spark.createDataFrame(
        [("s1", 1.0), ("s2", 2.0)], "name string, value double")
    txlog.write(dml.scd2_init(boot, SF.lit(0).cast("long")), table)
    # epoch 0: s1 changes (two rows, later wins), s2 identical, s3 new
    _write_lines(str(src / "b1.ndjson"), [
        json.dumps({"name": "s1", "time": 100, "value": 9.0}),
        json.dumps({"name": "s1", "time": 50, "value": 5.0}),
        json.dumps({"name": "s2", "time": 120, "value": 2.0}),
        json.dumps({"name": "s3", "time": 80, "value": 7.0}),
    ])
    q = ingest.stream_scd2(spark, str(src), table, ckpt,
                           on=["name"], attrs=["value"])
    q.awaitTermination(60)
    rows = {(r["name"], r["_is_current"]):
            (r["value"], r["_valid_from"], r["_valid_to"])
            for r in txlog.read_table(spark, table).collect()}
    assert rows[("s1", False)] == (1.0, 0, 100)    # closed at batch time
    assert rows[("s1", True)] == (9.0, 100, None)  # later row won
    assert rows[("s2", True)] == (2.0, 0, None)    # identical: no churn
    assert rows[("s3", True)] == (7.0, 80, None)
    assert len(rows) == 4
    v1 = txlog.current_version(table)
    # restart: no replays
    q2 = ingest.stream_scd2(spark, str(src), table, ckpt,
                            on=["name"], attrs=["value"])
    q2.awaitTermination(60)
    assert txlog.current_version(table) == v1
    # epoch 1: s1 changes again -> three versions of s1
    _write_lines(str(src / "b2.ndjson"), [
        json.dumps({"name": "s1", "time": 200, "value": 11.0}),
    ])
    q3 = ingest.stream_scd2(spark, str(src), table, ckpt,
                            on=["name"], attrs=["value"])
    q3.awaitTermination(60)
    hist = sorted((r["_valid_from"], r["_valid_to"], r["value"])
                  for r in txlog.read_table(spark, table)
                  .filter("name = 's1'").collect())
    assert hist == [(0, 100, 1.0), (100, 200, 9.0), (200, None, 11.0)]
