"""Physical-plan shape assertions — the scale contract.

These tests pin the *plan*, not just the result: predicates must reach the
parquet scan (PushedFilters), day partitions must prune (PartitionFilters),
small dimensions must broadcast, top-k must compile to
TakeOrderedAndProject, and hot paths must stay inside WholeStageCodegen.
A regression here is invisible at sf0.01 and fatal at 100 TB.
"""

import pyspark.sql.functions as F
import pytest

from neo_server_spark import io as nio
from neo_server_spark.operators import joins, maps


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tag_scan_predicate_pushdown(spark, sf_dir):
    """Time range routed to the source MUST reach the parquet scan as a raw
    ts predicate (row-group pruning), whatever the physical time encoding."""
    df = nio.events_as_tag(
        spark, sf_dir,
        from_ns=1_704_412_800 * 10**9, until_ns=1_705_708_800 * 10**9,
        until_inclusive=True,
    ).filter(F.col("name") == "purchase").select("name", "time", "value")
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(ts" in plan, plan.split("PushedFilters:")[1].splitlines()[0]
    assert "LessThanOrEqual(ts" in plan
    assert "EqualTo(event_type,purchase)" in plan
    # column pruning: props/user_id must not be read
    assert "props" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_tag_table_partition_pruning(spark, tmp_path):
    """Day-partitioned layout: a time-range predicate must prune partitions
    at planning time (PartitionFilters), not scan-and-filter."""
    day_ns = 86_400 * 10**9
    df = spark.range(1000).selectExpr(
        "concat('t', id % 3) AS name",
        f"CAST(id % 10 AS LONG) * {day_ns} + 1000 AS time",
        "CAST(id AS DOUBLE) AS value",
    )
    path = str(tmp_path / "tt")
    nio.write_tag_table(df, path, mode="overwrite")
    rd = nio.read_tag_table(spark, path).filter(F.col("_day") == "19700103")
    plan = plan_of(rd)
    assert "PartitionFilters: [isnotnull(_day" in plan
    # only 1 of 10 day directories may be scanned
    assert rd.count() == 100


def test_enrich_tags_broadcasts(spark, sf_dir):
    fact = nio.events_as_tag(spark, sf_dir)
    meta = spark.createDataFrame(
        [("purchase", "rev"), ("view", "traffic")], ["name", "kind"])
    plan = plan_of(joins.enrich_tags(fact, meta))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_take_compiles_to_top_k(spark, sf_dir):
    df = nio.events_as_tag(spark, sf_dir).select("name", "time", "value")
    out = maps.take(df, 100, order_by=[F.col("time")])
    assert "TakeOrderedAndProject" in plan_of(out)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Co-located bucketed layout: both sides bucketed on the join key with
    the same bucket count -> the join must plan with zero Exchange nodes.
    This is the 100 TB fact-join strategy (io.write_bucketed)."""
    ev = nio.load_table(spark, sf_dir, "events")
    facts = ev.select("user_id", "ts", "value")
    totals = ev.groupBy("user_id").agg(F.sum("value").alias("total"))
    nio.write_bucketed(facts, "nb_facts", 4, key="user_id", sort_cols=("user_id",))
    nio.write_bucketed(totals, "nb_totals", 4, key="user_id", sort_cols=("user_id",))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("nb_facts").join(spark.table("nb_totals"), "user_id")
        plan = plan_of(joined)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == facts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS nb_facts")
        spark.sql("DROP TABLE IF EXISTS nb_totals")


def test_aggregate_stays_in_codegen(spark, sf_dir):
    df = nio.events_as_tag(spark, sf_dir)
    out = df.groupBy("name").agg(F.sum("value"), F.avg("value"))
    out.collect()  # AQE finalizes the physical plan only on execution
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "*(" in executed          # WholeStageCodegen stage markers
    assert "BatchEvalPython" not in executed  # no row-at-a-time Python in the path


def test_tpch_q4_semi_join_and_pushdown(spark, sf_dir):
    import __spark_entry__ as e
    plan = plan_of(e.queries()["tpch_q4"](spark, sf_dir))
    assert "LeftSemi" in plan                 # EXISTS stays a semi join
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or \
           "GreaterThanOrEqual(o_orderdate" in plan  # date range reaches the scan


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import text
    docs = nio.load_table(spark, sf_dir, "documents")
    plan = plan_of(text.vocab(docs, top_k=100))
    assert "TakeOrderedAndProject" in plan    # top-k, never a global sort


def test_stratified_sample_is_scan_side_filter(spark, sf_dir):
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import sampling
    docs = nio.load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(docs, {"en": 0.25, "de": 1.0}, by="lang")
    plan = plan_of(out.select("doc_id"))
    assert "Exchange" not in plan             # pure filter: no shuffle at any SF


def test_tpch_q21_self_joins_keep_equi_key(spark, sf_dir):
    """The EXISTS/NOT-EXISTS self-joins must ride the l_orderkey equi key
    (semi/anti hash or sort-merge join) — never a nested-loop/cartesian
    product, whose cost is quadratic in order size at 100 TB."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["tpch_q21"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_tpch_q2_q17_no_forced_fact_broadcast(spark, sf_dir):
    """q2/q17's per-partkey aggregates scale with SF.  With the auto
    broadcast threshold disabled (simulating the 100 TB regime where
    nothing fact-derived fits the driver), the plans must contain NO
    BroadcastExchange except q2's explicit 25-row nation hint — the
    correlated MIN/AVG subqueries are single Window passes over one
    l_partkey shuffle, not broadcast probes."""
    import __spark_entry__ as e
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan2 = plan_of(e.queries()["tpch_q2"](spark, sf_dir))
        plan17 = plan_of(e.queries()["tpch_q17"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re
    def n_broadcasts(plan):
        # formatted plans list each node twice (tree + detail) — count node ids
        return len(re.findall(r"\(\d+\) BroadcastExchange", plan))
    assert "Window" in plan2                 # correlated MIN = window pass
    assert n_broadcasts(plan2) == 1          # the nation hint, nothing else
    assert "Window" in plan17
    assert n_broadcasts(plan17) == 0


def test_boilerplate_flag_table_broadcasts(spark, sf_dir):
    """The digest->boilerplate flag table joins back as a broadcast: the
    per-doc pass must not shuffle document text on the digest."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["boilerplate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    """Catalyst must derive per-side filters from the OR-of-ANDs predicate:
    the l_quantity range union reaches the lineitem parquet scan and the
    brand/size union reaches the part scan — at 100 TB that row-group
    pruning is the difference between scanning 3 ranges and scanning all."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["tpch_q19"](spark, sf_dir))
    assert plan.count("PushedFilters:") >= 2
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan   # derived quantity union
    assert "EqualTo(p_brand,Brand#12)" in plan            # derived part union
    assert "BroadcastHashJoin" in plan


def test_scalar_funcs_tql_is_jvm_projection(spark, sf_dir):
    """The round-5 TQL scalar battery must lower entirely to JVM Column
    expressions: no Python evaluation node in the plan, and the scan reads
    only the four referenced columns."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["scalar_funcs_tql"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema" in plan
    import re
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "ts", "value", "event_type"}


def test_group_weighted_single_agg_shuffle(spark, sf_dir):
    """Weighted aggregates are one hash-aggregate pass: partial + final
    exchange on the group key plus the output sort — no extra shuffle, no
    Python nodes, and column pruning to the three used columns."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["group_weighted"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"user_id", "event_type", "value"}
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_pack_sequences_no_global_window(spark, sf_dir):
    """pack_sequences' prefix sum must be the DISTRIBUTED form: every
    Window node is partitioned (__pid) — a single-partition global window
    would serialize the whole corpus layout through one task."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import text as dtext
    docs = nio.load_table(spark, sf_dir, "documents")
    plan = plan_of(dtext.pack_sequences(docs, window=512))
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in spec or "," in spec.split("ROWS")[0], spec
    # no empty partition spec: Spark renders an unpartitioned window as
    # windowspecdefinition(<order> ASC ...) with no partition column
    assert not re.search(
        r"windowspecdefinition\(doc_id#\d+L ASC", plan), plan


def test_pipeline_v2_scans_documents_at_most_twice(spark, sf_dir):
    """pipeline_v2's per-stage attrition counts must NOT re-derive the
    stages: base/s2…s7 each localCheckpoint once, so the returned plan
    reads checkpoint RDDs and the `documents` parquet appears at most
    twice in the whole DAG (base + benchmark split) — r8's executed plan
    had NINE separate parquet scans of documents and 0 ReusedExchange."""
    import re
    import __spark_entry__ as entry
    df = entry.queries()["pipeline_v2"](spark, sf_dir)
    plan = plan_of(df)
    n_parquet = len(re.findall(r"Scan parquet", plan))
    assert n_parquet <= 2, f"{n_parquet} parquet scans:\n{plan[:2000]}"
    # the stage counts must come from checkpointed RDDs
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 6, plan[:2000]


def test_substring_spans_shuffles_digests_only(spark, sf_dir):
    """duplicate_spans' corpus meet rides the 16-byte md5 digest: the
    text column must be pruned before every Exchange."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import dedup as dd
    docs = nio.load_table(spark, sf_dir, "documents")
    plan = plan_of(dd.duplicate_spans(docs, k=8))
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts                               # the digest meet must shuffle
    for p in parts:
        assert "text" not in p, p
    # and the scan prunes to the two used columns
    assert re.search(r"ReadSchema: [^\n]*text", plan)
    assert not re.search(r"ReadSchema: [^\n]*n_chars", plan)


def test_contamination_benchmark_broadcasts(spark, sf_dir):
    """The benchmark shingle set (eval corpora — tiny by definition) must
    broadcast into the meet join; the corpus shingle stream must not
    shuffle for the meet, and (r15) the corpus explodes its shingles
    EXACTLY ONCE — the totals and the hit counts fold in one
    aggregation, so the plan carries a single corpus-side Generate and
    a single corpus-side aggregate pair."""
    import __spark_entry__ as e
    plan = plan_of(e.queries()["contamination"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # corpus side: one documents scan feeding one Generate (the bench
    # side contributes the second scan+Generate; a third means the
    # corpus is being exploded twice again)
    import re
    n_gen = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert n_gen <= 2, plan[:2000]


def test_semdedup_assignment_broadcasts_and_pairs_shuffle_on_cid(spark, sf_dir):
    """SemDeDup scale contract (Arrow-kernel form): assignment is a
    mapInPandas projection — the corpus never exchanges to get its
    cluster id and never explodes to N*k rows — and the ONLY exchange in
    the whole plan is the cid repartition feeding the grouped sweep."""
    import re

    from neo_server_spark.datapipe import dedup

    emb = nio.load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    plan = plan_of(dedup.semdedup(emb, cents, threshold=0.4))
    assert "MapInPandas" in plan                # the assignment kernel
    assert "FlatMapGroupsInPandas" in plan      # the cluster-local sweep
    assert "CartesianProduct" not in plan       # never an unkeyed pair sweep
    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert exchanges and all("cid" in e for e in exchanges), exchanges


def test_pq_encode_codebook_broadcasts(spark, sf_dir):
    """PQ encode: the m*k codebook joins as a broadcast; the corpus side
    must not sort-merge against it."""
    from neo_server_spark.datapipe import similarity

    emb = nio.load_table(spark, sf_dir, "embeddings")
    cb = similarity.pq_train(emb, m=8, k=16, iters=0)
    plan = plan_of(similarity.pq_encode(emb, cb))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_classifier_and_mixture_stay_scan_side(spark, sf_dir):
    """The classifier score and the mixture keep/drop decision are pure
    per-row expressions: no Exchange may appear before the (optional)
    ordering, and no Python UDF (BatchEvalPython) anywhere."""
    from neo_server_spark.datapipe import sampling, text

    docs = nio.load_table(spark, sf_dir, "documents")
    p1 = plan_of(text.classifier_score(docs))
    assert "Exchange" not in p1 and "BatchEvalPython" not in p1
    p2 = plan_of(sampling.mixture_sample(docs, {"src0": 1.0}, 1000.0, by="source"))
    # the plan table is collected up front; the sample itself is scan-side
    assert "Exchange" not in p2 and "BatchEvalPython" not in p2


def test_c4_and_winnow_and_entropy_are_scan_side(spark, sf_dir):
    """The round-8 per-row curation ops (C4 rules, winnowing selection,
    char entropy) are pure array arithmetic: their plans must contain no
    KEYED exchange (hash/range) — the shape that scales linearly with
    scan width.  The only exchange permitted is the r15 input-widening
    round-robin repartition, which exists exactly when the input is
    narrower than the cluster (a no-op at scale) and never moves rows by
    key."""
    import re
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import curate
    docs = nio.load_table(spark, sf_dir, "documents")
    for df in (curate.c4_line_stats(docs),
               curate.c4_clean(docs),
               curate.winnow_fingerprints(docs, k=5, w=4),
               curate.char_entropy(docs)):
        plan = plan_of(df)
        assert "hashpartitioning" not in plan, plan[:2000]
        assert "rangepartitioning" not in plan, plan[:2000]
        assert "BroadcastExchange" not in plan, plan[:2000]
        # every remaining exchange must be the round-robin widening:
        # anchor each Exchange node's OWN Arguments line (a global
        # substring count could be satisfied by a tree/details re-print
        # without every exchange actually being round-robin)
        ex_nodes = re.findall(r"\(\d+\) Exchange\n(?:(?!\(\d+\) )[^\n]*\n)*?"
                              r"Arguments: ([^,\n]*)", plan)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert len(ex_nodes) == n_ex, plan[:2000]
        for arg in ex_nodes:
            assert arg.startswith("RoundRobinPartitioning"), (arg, plan[:2000])


def test_dedup_lines_never_shuffles_text(spark, sf_dir):
    """Corpus-global line dedup must move only digests/ids/positions:
    the text (and the exploded line) must be pruned before every
    Exchange; the doc text participates only in the final row-local
    rebuild."""
    import re
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import curate
    docs = nio.load_table(spark, sf_dir, "documents")
    plan = plan_of(curate.dedup_lines(docs))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts                               # keeper election shuffles
    for p in parts:
        assert "text" not in p and "line" not in p, p


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    """DSIR's O(buckets) log-ratio table must broadcast into the
    per-document weight join — the token stream collapses map-side and
    never shuffles wide."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import curate
    import pyspark.sql.functions as F
    docs = nio.load_table(spark, sf_dir, "documents")
    plan = plan_of(curate.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), 0.25))
    assert "BroadcastExchange" in plan


def test_zorder_layout_clusters_2d_boxes(spark, tmp_path):
    """Z-order clustering contract: an axis-aligned 2-D box predicate must
    touch FEWER files than on a linear (one-column-sorted) layout of the
    same data — the file-level analogue of row-group min/max skipping."""
    import pyspark.sql.functions as F
    df = spark.range(40_000).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") / 200).cast("long").alias("y"),
        F.col("id").alias("v"))
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    (df.repartitionByRange(16, "y").sortWithinPartitions("y")
       .write.mode("overwrite").parquet(lin))
    nio.write_zordered(df, zo, ["x", "y"], n_files=16)

    def files_touched(path):
        d = spark.read.parquet(path).filter(
            "x between 20 and 39 and y between 20 and 39")
        assert d.count() == 400          # correctness of the box
        return d.select(F.input_file_name()).distinct().count()

    t_lin, t_zo = files_touched(lin), files_touched(zo)
    # linear-on-y reads ~all x for the y stripe (2 of 16 range files);
    # z-order confines the box to a corner of the curve
    assert t_zo <= t_lin
    assert t_zo <= 4, (t_lin, t_zo)

def test_zorder_key_bit_budget(spark):
    """5 columns at the default bits=16 would shift past bit 63 (sign flip
    at 64, JVM shift wrap beyond) — bits must auto-reduce so every key is
    non-negative and distinct-per-cell, and 0 columns must refuse."""
    import pyspark.sql.functions as F
    import pytest as _pytest
    df = spark.range(64).select(
        *[F.shiftright(F.col("id"), i).bitwiseAND(F.lit(1)).alias(f"c{i}")
          for i in range(5)])
    keyed = nio.zorder_key(df, [f"c{i}" for i in range(5)], bits=16)
    rows = keyed.select("__z").collect()
    assert all(r["__z"] >= 0 for r in rows)
    # 5 binary dims over ids 0..63 -> 32 distinct cells, none colliding
    assert len({r["__z"] for r in rows}) == 32
    with _pytest.raises(ValueError):
        nio.zorder_key(df, [], bits=16)

def test_pq_encode_single_exchange_at_cluster_width(spark, sf_dir):
    """pq_encode must shuffle its narrow (id, sub, subvector) rows exactly
    ONCE, before the k-way broadcast-join distance expansion — the groupBy
    reuses that partitioning.  Regression pin for the 100x finding where
    the 25M-row fold ran at the parquet file count (one task on a
    single-file table) because the only exchange sat after it."""
    import re
    from neo_server_spark.datapipe import similarity as sim
    emb = nio.load_table(spark, sf_dir, "embeddings")
    cb = sim.pq_train(emb, m=8, k=16, iters=0)
    plan = plan_of(sim.pq_encode(emb, cb))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]
    # and it must be the pre-join hash exchange on (id, sub), not a
    # post-aggregation one: the exchange's input is the 3-col slice row
    m = re.search(r"\(\d+\) Exchange\nInput \[3\]: \[vec_id#\d+L, sub#\d+,"
                  r" sv#\d+\]", plan)
    assert m, plan[:1500]


def test_ivf_topk_join_broadcasts_probe_frame(spark, sf_dir):
    """Batch IVF k-NN: the (qid, cid) probe frame must broadcast onto the
    cid-bucketed corpus — never a sort-merge or cartesian over the corpus
    side — and the final per-query rank is the only window."""
    from neo_server_spark.datapipe import similarity

    emb = nio.load_table(spark, sf_dir, "embeddings")
    cents, assigned = similarity.ivf_index(emb, n_centroids=8, iters=1)
    qs = emb.filter(F.col("vec_id") < 3)
    plan = plan_of(similarity.ivf_topk_join(assigned, cents, qs,
                                            k=5, nprobe=2))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_rerank_fetches_only_shortlist(spark, sf_dir):
    """Two-stage PQ: the vector fetch joins the corpus against the
    BROADCAST ADC shortlist (left side pruned before any exchange of
    float vectors)."""
    from neo_server_spark.datapipe import similarity

    emb = nio.load_table(spark, sf_dir, "embeddings")
    cb = similarity.pq_train(emb, m=8, k=16, iters=0)
    rest = emb.filter(F.col("vec_id") != 0)
    codes = similarity.pq_encode(rest, cb)
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    plan = plan_of(similarity.pq_search_rerank(codes, cb, rest, qv,
                                               k=5, shortlist=50))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dv_read_broadcasts_tombstones(spark, tmp_path):
    """VERDICT r11 #4: the deletion-vector anti-join must broadcast the
    tombstone frame EXPLICITLY (not rely on AQE) — a shuffled anti-join
    over every DV'd file's rows is the 100-TB failure mode."""
    from neo_server_spark import dml, txlog

    t = str(tmp_path / "dvplan")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    txlog.write(df.coalesce(2), t)
    dml.delete(spark, t, "id % 100 = 3", mode="dv")
    out = txlog.read_table(spark, t)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftAnti" in plan
    # and the read is correct
    assert out.count() == 990


def test_matview_rollup_reads_no_base_table(spark, tmp_path):
    """r12 stretch: a ROLLUP query served by MatViewRollup must scan
    ONLY the view's partial files — zero base-table reads (that's the
    whole point of engine-maintained rollups at 100 TB)."""
    from neo_server_spark import txlog
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    base = str(tmp_path / "basetag")
    view = str(tmp_path / "mvroll")
    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("name"),
        (F.col("id") * 100_000_000).alias("time"),
        (F.col("id") % 17).cast("double").alias("value"))
    txlog.write(df, base)
    r = MatViewRollup(spark, base, view)
    assert r.refresh()["mode"] == "incremental"
    out = r.query(MINUTE, {"cnt": "count", "avg_v": "avg"})
    plan = plan_of(out)
    assert "basetag" not in plan, "ROLLUP query scanned the base table"
    assert "mvroll" in plan
    # and the fold is correct vs a raw-data recompute
    exp = {(x["name"], x["t"]): (x["c"], x["a"]) for x in
           df.groupBy("name",
                      (F.col("time") - F.col("time") % MINUTE)
                      .alias("t"))
           .agg(F.count(F.lit(1)).alias("c"), F.avg("value").alias("a"))
           .collect()}
    got = {(x["name"], x["time"]): (x["cnt"], x["avg_v"])
           for x in out.collect()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9


def test_corpus_diff_zero_scan_and_single_action(spark, tmp_path):
    """VERDICT r12 #3: (a) an unchanged-corpus diff compiles to an empty
    relation — ZERO data-file scans (the whole diff is a log-replay
    metadata question); (b) duplicate-key validation rides INSIDE the
    diff scan (raise_error over a per-key count), so the changed-file
    path is ONE action — no separate groupBy-count jobs per side."""
    from neo_server_spark import dml, txlog
    from neo_server_spark.datapipe.versioning import corpus_diff

    t = str(tmp_path / "corpdiffplan")
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string")
    txlog.write(mk([(1, "a"), (2, "b")]).coalesce(1), t)
    v1 = txlog.current_version(t)
    d0 = corpus_diff(spark, t, v1, v1, key="doc_id",
                     digest_cols=["text"])
    p0 = plan_of(d0)
    assert "Scan parquet" not in p0, p0
    assert d0.count() == 0
    txlog.write(mk([(3, "c")]).coalesce(1), t)
    dml.update(spark, t, "doc_id = 1", {"text": "'a2'"})
    v2 = txlog.current_version(t)
    d = corpus_diff(spark, t, v1, v2, key="doc_id",
                    digest_cols=["text"])
    assert "raise_error" in plan_of(d)   # validation is in-plan
    sc = spark.sparkContext
    sc.setJobGroup("corpus-diff-pin", "job-count pin")
    try:
        rows = d.collect()
    finally:
        sc.setJobGroup("corpus-diff-pin-done", "")
    jobs = sc.statusTracker().getJobIdsForGroup("corpus-diff-pin")
    # one action; AQE materializes <=4 stages-as-jobs for agg+join.
    # The pre-r13 shape ran 2 extra validation ACTIONS (>=5 jobs total).
    assert 1 <= len(jobs) <= 4, jobs
    assert {(r["doc_id"], r["change"]) for r in rows} == \
        {(1, "modified"), (3, "added")}


def test_lake_fanout_single_scan(spark, sf_dir):
    """r14 verdict stretch #8: the reference fans a 64-tag lake read
    across one goroutine per tag (http_lake.go:1596-1645); our plan
    must be ONE ranged parquet scan + ONE hash aggregate — no per-tag
    jobs, no 64-branch union, partial aggregation before the single
    shuffle, and top-k compiled to TakeOrderedAndProject."""
    import __spark_entry__ as e

    df = e.queries()["lake_fanout"](spark, sf_dir)
    plan = plan_of(df)
    assert plan.count(") Scan parquet") == 1
    assert "Union" not in plan
    assert "partial_avg" in plan, "map-side partial aggregation lost"
    # "(N) Exchange" = detail header, once per physical shuffle
    assert plan.count(") Exchange") == 1, \
        "expected exactly one shuffle (the keyed aggregate)"
    assert "TakeOrderedAndProject" in plan


def test_lm2_vocab_pin_gated_on_input_size(spark, sf_dir, monkeypatch):
    """lm_score_bigram's vocab localCheckpoint is a scale-side swap
    behind a size gate (r16): small inputs keep the re-scan shape
    (measured faster up to 1.5GB local), large inputs pin the
    vocabulary-sized frame so the corpus is not re-tokenized per
    consumer.  Pin the BRANCH SELECTION itself: below the gate the plan
    has no RDD scan; with the gate forced low, the pinned vocab appears
    as a Scan ExistingRDD."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import curate

    docs = nio.load_table(spark, sf_dir, "documents")
    assert "ExistingRDD" not in plan_of(curate.lm_score_bigram(docs))
    monkeypatch.setattr(curate, "_LM2_PIN_MIN_BYTES", 1)
    assert "ExistingRDD" in plan_of(curate.lm_score_bigram(docs))
