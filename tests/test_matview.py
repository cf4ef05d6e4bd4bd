"""Incremental materialized views (streaming/matview.py): delta folds
match a from-scratch recompute for every supported aggregate, the
cursor survives a restart, row-removing commits trigger the full
fallback, and holistic aggregates are rejected."""

import pyspark.sql.functions as F
import pytest

from neo_server_spark import dml, txlog
from neo_server_spark.streaming.matview import MatView


def _mk(spark, lo, hi):
    rows = [(i, "grp%d" % (i % 3), i % 7, float(i)) for i in range(lo, hi)]
    return spark.createDataFrame(rows, "id long, g string, u long, v double")


AGGS = {"n": ("count", "id"), "total": ("sum", "v"),
        "lo": ("min", "v"), "hi": ("max", "v"),
        "mean": ("avg", "v"), "users": ("approx_distinct", "u")}


def _expect(spark, src):
    # u has <= 7 distinct values per group: the HLL sketch is in its
    # exact coupon range, so approx == exact here
    df = txlog.read_table(spark, src)
    return {r["g"]: r for r in df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
        F.countDistinct("u").alias("users")).collect()}


def _got(view):
    return {r["g"]: r for r in view.read().collect()}


def test_incremental_matches_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 40), src)
    mv = MatView(spark, src, vt, keys=["g"], aggs=AGGS)
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(_mk(spark, 40, 90), src)
    txlog.write(_mk(spark, 90, 130), src)
    r = mv.refresh()
    assert r["mode"] == "incremental" and r["delta_rows"] == 90
    want, got = _expect(spark, src), _got(mv)
    assert set(got) == set(want)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])
        assert (got[g]["lo"], got[g]["hi"]) == \
            (want[g]["lo"], want[g]["hi"])
        assert got[g]["mean"] == pytest.approx(want[g]["mean"])
        assert got[g]["users"] == want[g]["users"]
    assert mv.refresh() == {"mode": "noop", "delta_rows": 0}


def test_cursor_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 30), src)
    MatView(spark, src, vt, keys=["g"], aggs=AGGS).refresh()
    # a NEW maintainer resumes from the persisted cursor: an idle poll
    # is a noop (no double count), a new commit folds incrementally
    mv2 = MatView(spark, src, vt, keys=["g"], aggs=AGGS)
    assert mv2.refresh()["mode"] == "noop"
    txlog.write(_mk(spark, 30, 60), src)
    r = mv2.refresh()
    assert r["mode"] == "incremental" and r["delta_rows"] == 30
    want, got = _expect(spark, src), _got(mv2)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])


def test_delete_triggers_full_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 50).coalesce(2), src)
    mv = MatView(spark, src, vt, keys=["g"], aggs=AGGS)
    mv.refresh()
    dml.delete(spark, src, "id < 10")
    txlog.write(_mk(spark, 50, 60), src)
    r = mv.refresh()
    assert r["mode"] == "full"
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])
        assert got[g]["users"] == want[g]["users"]
    # compaction is dataChange=False: NOT a fallback trigger
    txlog.compact(spark, src, target_files=1)
    txlog.write(_mk(spark, 60, 70), src)
    r = mv.refresh()
    assert r["mode"] == "incremental" and r["delta_rows"] == 10
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]


def test_holistic_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="self-mergeable"):
        MatView(spark, "x", "y", keys=["g"],
                aggs={"med": ("median", "v")})


def test_cdf_signed_fold_on_delete(spark, tmp_path):
    """When every aggregate is subtractable (count/sum/avg) and the DML
    published row-level change files, a delete folds as a SIGNED delta
    — no full recompute — and a group whose count reaches zero
    disappears from the view."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    aggs = {"n": ("count", "id"), "total": ("sum", "v"),
            "mean": ("avg", "v")}
    txlog.write(_mk(spark, 0, 60).repartition(3), src)
    mv = MatView(spark, src, vt, keys=["g"], aggs=aggs)
    assert mv.refresh()["mode"] == "incremental"
    # delete one full group (g = 'grp1' <=> id % 3 == 1) plus a slice
    dml.delete(spark, src, "id % 3 = 1", cdf=True)
    dml.update(spark, src, "id = 9", {"v": "v + 100"}, cdf=True)
    r = mv.refresh()
    assert r["mode"] == "cdf", r
    want, got = _expect(spark, src), _got(mv)
    assert set(got) == set(want) == {"grp0", "grp2"}   # grp1 vanished
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])
        assert got[g]["mean"] == pytest.approx(want[g]["mean"])
    # a delete WITHOUT cdf files falls back to full, still exact
    dml.delete(spark, src, "id = 12")
    r = mv.refresh()
    assert r["mode"] == "full"
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])


def test_failed_publish_does_not_advance_cursor(spark, tmp_path):
    """r11 advice (low): refresh() used to advance the in-memory cursor
    BEFORE the fold/publish — a publish failure then silently skipped
    that delta until a process restart.  The cursor must only move
    after _publish succeeds."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 40), src)
    mv = MatView(spark, src, vt, keys=["g"], aggs=AGGS)
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(_mk(spark, 40, 90), src)
    real = mv._publish

    def boom(partials, v):
        raise RuntimeError("publish failed")

    mv._publish = boom
    before = mv.watcher.version
    with pytest.raises(RuntimeError, match="publish failed"):
        mv.refresh()
    assert mv.watcher.version == before       # cursor NOT advanced
    mv._publish = real
    assert mv.refresh()["mode"] == "incremental"   # delta NOT skipped
    assert {g: (r["n"], r["total"]) for g, r in _got(mv).items()} == \
        {g: (r["n"], r["total"]) for g, r in _expect(spark, src).items()}


def test_matview_rollup_incremental_and_calc_modes(spark, tmp_path):
    """MatViewRollup (r12): sec-level partials maintained O(delta),
    every calc mode folds exactly, coarser periods fold from the finest
    level, unsupported modes/periods raise."""
    from neo_server_spark.sqlx.rollup import MINUTE, SECOND, MatViewRollup

    base = str(tmp_path / "tag")
    df1 = _mk(spark, 0, 60).select(
        "g", (F.col("id") * 700_000_000).alias("time"),
        F.col("v").alias("value")).withColumnRenamed("g", "name")
    df2 = _mk(spark, 60, 130).select(
        "g", (F.col("id") * 700_000_000).alias("time"),
        F.col("v").alias("value")).withColumnRenamed("g", "name")
    txlog.write(df1, base)
    r = MatViewRollup(spark, base, str(tmp_path / "v"))
    assert r.refresh()["mode"] == "incremental"
    txlog.write(df2, base)
    assert r.refresh()["mode"] == "incremental"
    out = {(x["name"], x["time"]): x for x in
           r.query(MINUTE, {"c": "count", "s": "sum", "q": "sumsq",
                            "lo": "min", "hi": "max", "m": "avg"})
           .collect()}
    raw = txlog.read_table(spark, base)
    exp = {(x["name"], x["t"]): x for x in
           raw.groupBy("name", (F.col("time") - F.col("time") % MINUTE)
                       .alias("t"))
           .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("s"),
                F.sum(F.col("value") * F.col("value")).alias("q"),
                F.min("value").alias("lo"), F.max("value").alias("hi"),
                F.avg("value").alias("m")).collect()}
    assert out.keys() == exp.keys()
    for k, e in exp.items():
        g = out[k]
        for c in ("c", "lo", "hi"):
            assert g[c] == e[c], (k, c)
        for c in ("s", "q", "m"):
            assert abs(g[c] - e[c]) < 1e-6, (k, c)
    with pytest.raises(ValueError, match="not servable"):
        r.query(SECOND + 1, {"c": "count"})
    # r13: order-aware modes fold from (value-at-extreme, extreme-time)
    # partials — first/last must equal the raw min_by/max_by recompute
    fl = {(x["name"], x["time"]): x for x in
          r.query(MINUTE, {"f": "first", "l": "last"}).collect()}
    exp_fl = {(x["name"], x["t"]): x for x in
              raw.groupBy("name",
                          (F.col("time") - F.col("time") % MINUTE)
                          .alias("t"))
              .agg(F.min_by("value", "time").alias("f"),
                   F.max_by("value", "time").alias("l")).collect()}
    assert fl.keys() == exp_fl.keys()
    for k, e in exp_fl.items():
        assert fl[k]["f"] == e["f"], (k, "first")
        assert fl[k]["l"] == e["l"], (k, "last")
    with pytest.raises(ValueError, match="calc mode"):
        r.query(MINUTE, {"d": "approx_distinct"})


def test_matview_rollup_null_value_count_semantics(spark, tmp_path):
    """count/avg must use SQL COUNT(value) semantics (non-null), like
    RollupRouter — a row-count would silently deflate averages over
    NULL-bearing buckets (r12 review finding)."""
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    base = str(tmp_path / "nulltag")
    df = spark.createDataFrame(
        [("a", 1_000_000_000, 1.0), ("a", 2_000_000_000, None),
         ("a", 3_000_000_000, 3.0)],
        "name string, time long, value double")
    txlog.write(df, base)
    r = MatViewRollup(spark, base, str(tmp_path / "vnull"))
    assert r.refresh()["mode"] == "incremental"
    row = r.query(MINUTE, {"c": "count", "m": "avg"}).collect()[0]
    assert row["c"] == 2
    assert abs(row["m"] - 2.0) < 1e-9


def test_router_prefers_attached_matview_and_falls_back(spark, tmp_path):
    """RollupRouter.attach_matview: covered (period, aggs) requests —
    incl. first/last since r13 — are served from the IVM partials;
    modes the view cannot carry (approx_distinct's HLL) fall back to
    the built cascade — one router, two maintenance paths."""
    from neo_server_spark.sqlx.rollup import (MINUTE, MatViewRollup,
                                              RollupRouter)

    base = str(tmp_path / "tagr")
    df = spark.createDataFrame(
        [("a", i * 700_000_000, float(i % 5)) for i in range(200)],
        "name string, time long, value double")
    txlog.write(df, base)
    router = RollupRouter(spark, str(tmp_path / "casc"))
    router.build(txlog.read_table(spark, base), distinct_col="name")
    mvr = MatViewRollup(spark, base, str(tmp_path / "ivm"))
    mvr.refresh()
    router.attach_matview(mvr)
    covered = router.query(MINUTE, {"c": "count", "m": "avg",
                                    "f": "first", "l": "last"})
    cplan = covered._sc._jvm.PythonSQLUtils.explainString(
        covered._jdf.queryExecution(), "formatted")
    assert "ivm" in cplan and "casc" not in cplan
    fallback = router.query(MINUTE, {"d": "approx_distinct"})
    plan = fallback._sc._jvm.PythonSQLUtils.explainString(
        fallback._jdf.queryExecution(), "formatted")
    assert "casc" in plan and "ivm" not in plan
    # IVM-served first/last agree with the cascade's fold
    router._matview = None                        # force cascade path
    a = {(r["name"], r["time"]): (r["f"], r["l"])
         for r in covered.collect()}
    b = {(r["name"], r["time"]): (r["f"], r["l"])
         for r in router.query(
             MINUTE, {"f": "first", "l": "last"}).collect()}
    assert a == b


def test_matview_evolve_schema_widening(spark, tmp_path):
    """r12 verdict stretch #8: an evolved source column reaches the
    matview WITHOUT a full recompute — evolve() backfills the new
    aggregates' partials from post-evolution files only, and later
    refreshes stay mode='incremental'."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    aggs = {"n": ("count", "id"), "total": ("sum", "v")}
    txlog.write(_mk(spark, 0, 40), src)                        # v1
    mv = MatView(spark, src, vt, keys=["g"], aggs=aggs)
    assert mv.refresh()["mode"] == "incremental"
    # evolution commit: merge_schema append adds column w
    df2 = _mk(spark, 40, 80).withColumn("w", F.col("v") * 2)
    txlog.write(df2, src, merge_schema=True)                   # v2
    txlog.write(_mk(spark, 80, 120).withColumn(
        "w", F.col("v") + 1), src)                             # v3
    assert mv.refresh()["mode"] == "incremental"
    ev_ver = 2
    r = mv.evolve({"wsum": ("sum", "w"), "wavg": ("avg", "w"),
                   "whi": ("max", "w")}, since_version=ev_ver)
    assert r["mode"] == "evolve" and r["backfill_files"] >= 2
    # widened view == full recompute (pre-evolution rows: w IS NULL)
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
               F.sum("w").alias("wsum"), F.avg("w").alias("wavg"),
               F.max("w").alias("whi")).collect()}
    got = _got(mv)
    assert set(got) == set(exp)
    for g in exp:
        assert got[g]["n"] == exp[g]["n"]
        assert got[g]["total"] == pytest.approx(exp[g]["total"])
        assert got[g]["wsum"] == pytest.approx(exp[g]["wsum"])
        assert got[g]["wavg"] == pytest.approx(exp[g]["wavg"])
        assert got[g]["whi"] == exp[g]["whi"]
    # subsequent appends keep folding the widened set incrementally
    txlog.write(_mk(spark, 120, 150).withColumn(
        "w", F.col("v") * 3), src)                             # v4
    assert mv.refresh()["mode"] == "incremental"
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("w").alias("wsum")).collect()}
    got = _got(mv)
    for g in exp:
        assert got[g]["n"] == exp[g]["n"]
        assert got[g]["wsum"] == pytest.approx(exp[g]["wsum"])
    # a restarted maintainer must see the widened agg set too
    mv2 = MatView(spark, src, vt, keys=["g"],
                  aggs={**aggs, "wsum": ("sum", "w"),
                        "wavg": ("avg", "w"), "whi": ("max", "w")})
    assert mv2.refresh()["mode"] == "noop"
    # non-NULL-identity aggregates refuse the shortcut
    with pytest.raises(ValueError, match="backfilled"):
        mv.evolve({"rows2": ("count", "w")}, since_version=ev_ver)
    with pytest.raises(ValueError, match="backfilled"):
        mv.evolve({"fw": ("first", "w", "id")}, since_version=ev_ver)


def test_matview_evolve_before_fold_pads_null_partials(spark, tmp_path):
    """evolve() called when the cursor has not yet crossed the evolving
    commit: the stored partials widen with TYPED NULLs and the next
    refresh folds every post-evolution value exactly once."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 30), src)                        # v1
    mv = MatView(spark, src, vt, keys=["g"],
                 aggs={"n": ("count", "id"), "total": ("sum", "v")})
    assert mv.refresh()["mode"] == "incremental"    # cursor = 1
    txlog.write(_mk(spark, 30, 60).withColumn(
        "w", F.col("v") * 5), src, merge_schema=True)          # v2
    r = mv.evolve({"wsum": ("sum", "w")}, since_version=2)
    assert r == {"mode": "evolve", "backfill_files": 0}
    assert mv.refresh()["mode"] == "incremental"
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("w").alias("wsum")).collect()}
    got = _got(mv)
    for g in exp:
        assert got[g]["n"] == exp[g]["n"]
        assert got[g]["wsum"] == pytest.approx(exp[g]["wsum"])


def test_matview_rollup_approx_distinct(spark, tmp_path):
    """r13: a MatViewRollup built with distinct_col carries HLL sketch
    partials — approx_distinct folds from the IVM view (lossless sketch
    union) and equals the exact count inside the coupon range; the
    router covers it instead of falling back to the cascade."""
    from neo_server_spark.sqlx.rollup import (MINUTE, MatViewRollup,
                                              RollupRouter)

    base = str(tmp_path / "tagd")
    df = spark.createDataFrame(
        [("a", i * 700_000_000, float(i % 5), i % 7)
         for i in range(120)],
        "name string, time long, value double, dev long")
    txlog.write(df.filter(F.col("time") < 40_000_000_000), base)
    r = MatViewRollup(spark, base, str(tmp_path / "ivmd"),
                      distinct_col="dev")
    assert r.refresh()["mode"] == "incremental"
    txlog.write(df.filter(F.col("time") >= 40_000_000_000), base)
    assert r.refresh()["mode"] == "incremental"
    got = {(x["name"], x["time"]): (x["c"], x["d"]) for x in
           r.query(MINUTE, {"c": "count", "d": "approx_distinct"})
           .collect()}
    exp = {(x["name"], x["t"]): (x["c"], x["d"]) for x in
           df.groupBy("name", (F.col("time") - F.col("time") % MINUTE)
                      .alias("t"))
           .agg(F.count("value").alias("c"),
                F.countDistinct("dev").alias("d")).collect()}
    assert got == exp
    # router covers approx_distinct ONLY when the view carries sketches
    router = RollupRouter(spark, str(tmp_path / "cascd"))
    router.build(txlog.read_table(spark, base), distinct_col="dev")
    router.attach_matview(r)
    q = router.query(MINUTE, {"d": "approx_distinct"})
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "ivmd" in plan and "cascd" not in plan
    sketchless = MatViewRollup(spark, base, str(tmp_path / "ivm0"))
    sketchless.refresh()
    router.attach_matview(sketchless)
    q2 = router.query(MINUTE, {"d": "approx_distinct"})
    plan2 = q2._sc._jvm.PythonSQLUtils.explainString(
        q2._jdf.queryExecution(), "formatted")
    assert "cascd" in plan2 and "ivm0" not in plan2


def test_matview_model_random_ops(spark, tmp_path):
    """Model-based check: a random commit sequence (append /
    merge_schema-evolving append / rewrite-delete / DV-delete /
    compact) with refreshes at random points and ONE mid-sequence
    evolve() — after every refresh the view must equal a from-scratch
    recompute of the current aggregate set, whatever mix of
    incremental / cdf / full paths got it there."""
    import random

    rng = random.Random(20260817)
    for case in range(2):
        src = str(tmp_path / f"m{case}")
        vt = str(tmp_path / f"v{case}")
        mk = lambda lo, hi: spark.createDataFrame(
            [(i, "g%d" % (i % 3), float(i % 11)) for i in range(lo, hi)],
            "id long, g string, v double")
        nxt = 30
        txlog.write(mk(0, 30).coalesce(1), src)
        aggs = {"n": ("count", "id"), "total": ("sum", "v")}
        mv = MatView(spark, src, vt, keys=["g"], aggs=aggs)
        mv.refresh()
        evolved_at = None

        def check():
            exprs = [F.count(F.lit(1)).alias("n"),
                     F.sum("v").alias("total")]
            if evolved_at is not None:
                exprs += [F.sum("w").alias("wsum"),
                          F.max("w").alias("whi")]
            exp = {r["g"]: r for r in
                   txlog.read_table(spark, src)
                   .groupBy("g").agg(*exprs).collect()}
            got = {r["g"]: r for r in mv.read().collect()}
            assert set(got) == set(exp)
            for g, e in exp.items():
                assert got[g]["n"] == e["n"], (case, g, "n")
                assert got[g]["total"] == pytest.approx(e["total"])
                if evolved_at is not None:
                    if e["wsum"] is None:
                        assert got[g]["wsum"] is None
                    else:
                        assert got[g]["wsum"] == \
                            pytest.approx(e["wsum"]), (case, g)
                    assert got[g]["whi"] == e["whi"]

        for step in range(8):
            op = rng.choice(["append", "append", "delete", "dv",
                             "compact", "evolve_src"])
            if op == "append":
                df = mk(nxt, nxt + rng.randint(5, 15))
                if evolved_at is not None:
                    df = df.withColumn("w", F.col("v") * 2)
                    txlog.write(df.coalesce(1), src)
                else:
                    txlog.write(df.coalesce(1), src)
                nxt += 15
            elif op == "evolve_src" and evolved_at is None:
                txlog.write(mk(nxt, nxt + 10).withColumn(
                    "w", F.col("v") * 2).coalesce(1), src,
                    merge_schema=True)
                evolved_at = txlog.current_version(src)
                nxt += 10
            elif op == "delete":
                dml.delete(spark, src, f"id % 13 = {step}")
            elif op == "dv":
                dml.delete(spark, src, f"id % 17 = {step}", mode="dv")
            else:
                txlog.compact(spark, src, target_files=1)
            if rng.random() < 0.6 or op == "evolve_src":
                mv.refresh()
                if op == "evolve_src":
                    mv.evolve({"wsum": ("sum", "w"),
                               "whi": ("max", "w")},
                              since_version=evolved_at)
                check()
        mv.refresh()
        check()


def test_evolve_includes_compaction_rewrites(spark, tmp_path):
    """r13 advice (medium): a compaction (dataChange=False) landing
    between the evolving commit and evolve() moves live post-evolution
    rows into NEW files — the backfill must include those rewrites or
    the new aggregates silently under-count."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 40).coalesce(2), src)            # v1
    mv = MatView(spark, src, vt, keys=["g"],
                 aggs={"n": ("count", "id"), "total": ("sum", "v")})
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(_mk(spark, 40, 80).withColumn(
        "w", F.col("v") * 2).coalesce(2), src,
        merge_schema=True)                                     # v2
    txlog.write(_mk(spark, 80, 120).withColumn(
        "w", F.col("v") + 1).coalesce(2), src)                 # v3
    assert mv.refresh()["mode"] == "incremental"
    # the compaction rewrites EVERY live file (pre- and post-evolution
    # rows alike) into fresh ones — exactly the window the advice names
    txlog.compact(spark, src, target_files=1)                  # v4
    r = mv.evolve({"wsum": ("sum", "w"), "whi": ("max", "w")},
                  since_version=2)
    assert r["mode"] == "evolve" and r["backfill_files"] >= 1
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
               F.sum("w").alias("wsum"), F.max("w").alias("whi"))
           .collect()}
    got = _got(mv)
    assert set(got) == set(exp)
    for g in exp:
        assert got[g]["n"] == exp[g]["n"]
        assert got[g]["total"] == pytest.approx(exp[g]["total"])
        assert got[g]["wsum"] == pytest.approx(exp[g]["wsum"]), \
            "compaction rewrites were excluded from the backfill"
        assert got[g]["whi"] == exp[g]["whi"]


def test_evolve_recompute_escape_hatch(spark, tmp_path):
    """r13 verdict #4: count/first/last cannot ride the O(delta)
    backfill (their fold identity is not NULL) — recompute=True wires
    them through ONE atomic full-recompute publish instead of leaving
    manual view recreation as the only recourse."""
    src = str(tmp_path / "src")
    vt = str(tmp_path / "view")
    txlog.write(_mk(spark, 0, 40), src)                        # v1
    mv = MatView(spark, src, vt, keys=["g"],
                 aggs={"n": ("count", "id"), "total": ("sum", "v")})
    assert mv.refresh()["mode"] == "incremental"
    txlog.write(_mk(spark, 40, 80).withColumn(
        "w", F.col("v") * 2), src, merge_schema=True)          # v2
    assert mv.refresh()["mode"] == "incremental"
    # without the flag: refused (identity is not NULL)
    with pytest.raises(ValueError, match="recompute=True"):
        mv.evolve({"wn": ("count", "w")}, since_version=2)
    r = mv.evolve({"wn": ("count", "w"),
                   "wfirst": ("first", "w", "id")},
                  since_version=2, recompute=True)
    assert r["mode"] == "evolve_recompute"
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
               F.count(F.lit(1)).alias("wn"),
               F.min_by("w", "id").alias("wfirst")).collect()}
    got = _got(mv)
    assert set(got) == set(exp)
    for g in exp:
        assert got[g]["n"] == exp[g]["n"]
        assert got[g]["wn"] == exp[g]["wn"]
        assert got[g]["wfirst"] == exp[g]["wfirst"]
    # the widened set keeps folding incrementally afterwards
    txlog.write(_mk(spark, 80, 110).withColumn(
        "w", F.col("v") * 3), src)                             # v3
    assert mv.refresh()["mode"] == "incremental"
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.count(F.lit(1)).alias("wn"),
               F.min_by("w", "id").alias("wfirst")).collect()}
    got = _got(mv)
    for g in exp:
        assert got[g]["wn"] == exp[g]["wn"]
        assert got[g]["wfirst"] == exp[g]["wfirst"]


def test_bootstrap_chunked_equals_monolithic(spark, tmp_path):
    """r13 verdict #3: the initial view build folds in bounded chunks
    (one atomic publish per chunk, cursor riding in the rows) and the
    result is IDENTICAL to the monolithic refresh — chunking only
    reassociates the same semigroup fold.  A killed bootstrap resumes
    at the last published chunk instead of restarting O(table)."""
    src = str(tmp_path / "src")
    for i in range(6):                       # 6 commits, 2 files each
        txlog.write(_mk(spark, i * 20, (i + 1) * 20).coalesce(2), src)
    mono = MatView(spark, src, str(tmp_path / "mono"),
                   keys=["g"], aggs=AGGS)
    assert mono.refresh()["mode"] == "incremental"
    chunked = MatView(spark, src, str(tmp_path / "chunk"),
                      keys=["g"], aggs=AGGS)
    r = chunked.bootstrap(max_files_per_chunk=3)
    assert r["mode"] == "bootstrap" and r["chunks"] >= 3, \
        f"expected >=3 bounded chunks, got {r}"
    assert r["delta_rows"] == 120
    # identical partials (finalized values compare HLL as estimates)
    a = sorted(map(tuple, mono.read().collect()))
    b = sorted(map(tuple, chunked.read().collect()))
    assert a == b
    # resume-after-kill: partial progress (2 chunks), then a FRESH
    # maintainer finishes from the persisted cursor
    part = MatView(spark, src, str(tmp_path / "part"),
                   keys=["g"], aggs=AGGS)
    assert part.refresh(max_files=3)["mode"] == "incremental"
    assert part.refresh(max_files=3)["mode"] == "incremental"
    assert part.watcher.version < txlog.current_version(src)
    resumed = MatView(spark, src, str(tmp_path / "part"),
                      keys=["g"], aggs=AGGS)       # the "restart"
    assert resumed.watcher.version == part.watcher.version
    r2 = resumed.bootstrap(max_files_per_chunk=3)
    assert r2["chunks"] >= 1
    c = sorted(map(tuple, resumed.read().collect()))
    assert c == a, "resumed bootstrap double-counted or lost a chunk"
    assert resumed.refresh() == {"mode": "noop", "delta_rows": 0}


def test_matview_rollup_legacy_layout_falls_back(spark, tmp_path):
    """r13 advice (low): a view published by pre-r13 code has no
    first/last (or HLL) partial columns — coverage must be gated on the
    STORED layout so the router falls back to the cascade instead of
    failing with an AnalysisException at read time, while the algebraic
    modes keep being served from the legacy view."""
    from neo_server_spark.sqlx.rollup import (MINUTE, MatViewRollup,
                                              RollupRouter)

    base = str(tmp_path / "tagl")
    df = spark.createDataFrame(
        [("a", i * 700_000_000, float(i % 5)) for i in range(120)],
        "name string, time long, value double")
    txlog.write(df, base)
    vt = str(tmp_path / "ivml")
    r = MatViewRollup(spark, base, vt)
    assert r.refresh()["mode"] == "incremental"
    # simulate the pre-r13 layout: rewrite the stored view WITHOUT the
    # first/last partial columns
    legacy = txlog.read_table(spark, vt).drop(
        "_p_first", "_t_first", "_p_last", "_t_last")
    txlog.write(legacy.localCheckpoint(eager=True), vt,
                mode="overwrite")
    r2 = MatViewRollup(spark, base, vt)
    modes = r2.servable_modes()
    assert "first" not in modes and "last" not in modes
    assert {"count", "sum", "min", "max", "avg"} <= modes
    # algebraic modes still served from the legacy view
    got = {(x["name"], x["time"]): x["c"] for x in
           r2.query(MINUTE, {"c": "count"}).collect()}
    exp = {(x["name"], x["t"]): x["c"] for x in
           df.groupBy("name", (F.col("time") - F.col("time") % MINUTE)
                      .alias("t"))
           .agg(F.count("value").alias("c")).collect()}
    assert got == exp
    # order-aware modes: clear refusal, not an AnalysisException
    with pytest.raises(ValueError, match="pre-r13 layout"):
        r2.query(MINUTE, {"f": "first"})
    # the router routes first/last to the cascade, count to the view
    router = RollupRouter(spark, str(tmp_path / "cascl"))
    router.build(txlog.read_table(spark, base))
    router.attach_matview(r2)
    q = router.query(MINUTE, {"f": "first", "c": "count"})
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "cascl" in plan and "ivml" not in plan
    qc = router.query(MINUTE, {"c": "count"})
    plan2 = qc._sc._jvm.PythonSQLUtils.explainString(
        qc._jdf.queryExecution(), "formatted")
    assert "ivml" in plan2 and "cascl" not in plan2


def test_stream_maintain_monotone_cursor(spark, tmp_path):
    """r13 verdict stretch #8: IVM maintenance as a REAL Structured
    Streaming query over the commit log (no scheduler tick).  With
    max_commits_per_trigger=1 each micro-batch folds exactly one
    commit: mid-stream the cursor advances MONOTONICALLY one version
    at a time, and the drained view equals a from-scratch recompute.
    A restarted stream (same checkpoint) replays into noops, then
    folds only genuinely new commits."""
    from neo_server_spark.streaming.matview import stream_maintain

    src = str(tmp_path / "src")
    for i in range(4):
        txlog.write(_mk(spark, i * 25, (i + 1) * 25).coalesce(1), src)
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs=AGGS)
    seen = []
    orig = mv.refresh

    def spy(**kw):
        r = orig(**kw)
        seen.append((mv.watcher.version, r["mode"]))
        return r

    mv.refresh = spy
    ckpt = str(tmp_path / "ckpt")
    q = stream_maintain(spark, mv, ckpt, max_commits_per_trigger=1)
    assert q.awaitTermination(180), "stream did not drain"
    cursors = [v for v, _ in seen]
    assert cursors == sorted(cursors), f"cursor regressed: {seen}"
    incr = [v for v, m in seen if m == "incremental"]
    assert incr == [1, 2, 3, 4], \
        f"expected one-commit-per-batch folds, got {seen}"
    want, got = _expect(spark, src), _got(mv)
    assert set(got) == set(want)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])
        assert got[g]["users"] == want[g]["users"]
    # restart on the same checkpoint: replayed batches are noops; a
    # new commit folds exactly once
    seen.clear()
    txlog.write(_mk(spark, 100, 120).coalesce(1), src)
    q2 = stream_maintain(spark, mv, ckpt, max_commits_per_trigger=1)
    assert q2.awaitTermination(180)
    assert [m for _, m in seen].count("incremental") == 1, seen
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]


def test_bound_until_oversized_commit_still_progresses(spark, tmp_path):
    """A single commit larger than max_files must still be taken whole
    (the chunk bound is >= one commit), or bootstrap would spin."""
    src = str(tmp_path / "src")
    txlog.write(_mk(spark, 0, 30).coalesce(4), src)     # 4 files > max 1
    txlog.write(_mk(spark, 30, 60).coalesce(4), src)
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs={"n": ("count", "id")})
    r = mv.bootstrap(max_files_per_chunk=1)
    assert r["chunks"] == 2 and r["delta_rows"] == 60
    got = {x["g"]: x["n"] for x in mv.read().collect()}
    exp = {x["g"]: x["n"] for x in
           txlog.read_table(spark, src).groupBy("g")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == exp


def test_stream_maintain_live_trigger(spark, tmp_path):
    """The processingTime (live) mode: a commit landing WHILE the
    stream runs is folded without a restart — the continuous-maintainer
    shape (r13 stretch #8), vs availableNow's drain-and-stop."""
    import time as _time

    from neo_server_spark.streaming.matview import stream_maintain

    src = str(tmp_path / "src")
    txlog.write(_mk(spark, 0, 30).coalesce(1), src)
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs={"n": ("count", "id"),
                                   "total": ("sum", "v")})
    q = stream_maintain(spark, mv, str(tmp_path / "ckpt"),
                        processing_time="1 second")
    try:
        deadline = _time.time() + 120
        while mv.watcher.version < 1 and _time.time() < deadline:
            _time.sleep(0.5)
        assert mv.watcher.version >= 1, "initial commit never folded"
        txlog.write(_mk(spark, 30, 70).coalesce(1), src)  # mid-stream
        while mv.watcher.version < 2 and _time.time() < deadline:
            _time.sleep(0.5)
        assert mv.watcher.version >= 2, "live commit never folded"
    finally:
        q.stop()
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])


def test_matview_rollup_legacy_hll_layout(spark, tmp_path):
    """The stored-layout gate also covers sketches: a view CONSTRUCTED
    with distinct_col whose PUBLISHED partials predate the HLL column
    must not claim approx_distinct — router falls back to the cascade,
    and query() refuses with the rebuild message (not an
    AnalysisException)."""
    from neo_server_spark.sqlx.rollup import (MINUTE, MatViewRollup,
                                              RollupRouter)

    base = str(tmp_path / "tagh")
    df = spark.createDataFrame(
        [("a", i * 700_000_000, float(i % 5), i % 7)
         for i in range(120)],
        "name string, time long, value double, dev long")
    txlog.write(df, base)
    vt = str(tmp_path / "ivmh")
    r = MatViewRollup(spark, base, vt, distinct_col="dev")
    assert r.refresh()["mode"] == "incremental"
    legacy = txlog.read_table(spark, vt).drop("_p_dcount")
    txlog.write(legacy.localCheckpoint(eager=True), vt,
                mode="overwrite")
    r2 = MatViewRollup(spark, base, vt, distinct_col="dev")
    assert "approx_distinct" not in r2.servable_modes()
    assert "count" in r2.servable_modes()
    with pytest.raises(ValueError, match="pre-r13 layout"):
        r2.query(MINUTE, {"d": "approx_distinct"})
    router = RollupRouter(spark, str(tmp_path / "casch"))
    router.build(txlog.read_table(spark, base), distinct_col="dev")
    router.attach_matview(r2)
    q = router.query(MINUTE, {"d": "approx_distinct"})
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "casch" in plan and "ivmh" not in plan
    # counts still served from the legacy view
    got = {(x["name"], x["time"]): x["c"] for x in
           r2.query(MINUTE, {"c": "count"}).collect()}
    exp = {(x["name"], x["t"]): x["c"] for x in
           df.groupBy("name", (F.col("time") - F.col("time") % MINUTE)
                      .alias("t"))
           .agg(F.count("value").alias("c")).collect()}
    assert got == exp


def test_bound_until_never_exceeds_budget(spark, tmp_path):
    """r14 advice: the chunk bound is checked BEFORE admitting a
    commit — with 2-file commits and max_files=3 every chunk takes
    exactly one commit (adding the second would reach 4 > 3), where
    the old include-then-break let chunks overshoot to 4 files."""
    src = str(tmp_path / "src")
    for i in range(4):
        txlog.write(_mk(spark, i * 10, (i + 1) * 10).coalesce(2), src)
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs={"n": ("count", "id")})
    bounds = []
    v = 0
    while v < txlog.current_version(src):
        nxt = mv._bound_until(v, txlog.current_version(src), 3)
        assert nxt == v + 1, \
            f"chunk (since={v}] admitted versions through {nxt}: " \
            f"2+2=4 files exceeds the max_files=3 budget"
        bounds.append(nxt)
        v = nxt
    assert bounds == [1, 2, 3, 4]
    # progress guarantee unchanged: one oversized FIRST commit is
    # still taken whole
    big = str(tmp_path / "big")
    txlog.write(_mk(spark, 0, 30).coalesce(4), big)
    mvb = MatView(spark, big, str(tmp_path / "viewb"),
                  keys=["g"], aggs={"n": ("count", "id")})
    assert mvb._bound_until(0, 1, 1) == 1


def test_evolve_failure_leaves_object_consistent(spark, tmp_path):
    """r14 advice: a failed evolve publish (checkpoint failure, commit
    conflict) must NOT wedge the maintainer — self.aggs stays at the
    stored layout, refresh() keeps working, and retrying the evolve
    succeeds instead of raising 'already exists'."""
    src = str(tmp_path / "src")
    txlog.write(_mk(spark, 0, 40), src)
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs={"n": ("count", "id"),
                                   "total": ("sum", "v")})
    assert mv.refresh()["mode"] == "incremental"
    ev_ver = txlog.write(
        _mk(spark, 40, 60).withColumn("w", F.col("v") * 2.0),
        src, merge_schema=True)
    assert mv.refresh()["mode"] == "incremental"
    orig_publish = mv._publish

    def boom(*a, **kw):
        raise RuntimeError("injected publish failure")

    before = dict(mv.aggs)
    for kw in ({"recompute": True}, {}):
        mv._publish = boom
        with pytest.raises(RuntimeError, match="injected"):
            mv.evolve({"wsum": ("sum", "w")}, since_version=ev_ver,
                      **kw)
        assert mv.aggs == before, \
            "failed evolve left phantom aggregates in self.aggs"
        mv._publish = orig_publish
        # the maintainer still works against the stored layout
        txlog.write(_mk(spark, 60, 70), src)
        assert mv.refresh()["mode"] == "incremental"
    # the retry now SUCCEEDS (no 'already exists')
    r = mv.evolve({"wsum": ("sum", "w")}, since_version=ev_ver)
    assert r["mode"] == "evolve"
    got = _got(mv)
    exp = {x["g"]: x for x in
           txlog.read_table(spark, src).groupBy("g").agg(
               F.sum("w").alias("wsum")).collect()}
    for g in exp:
        assert got[g]["wsum"] == exp[g]["wsum"]


def test_stream_maintain_admission_excludes_checkpoints(spark,
                                                        tmp_path):
    """r14 verdict #3 + advice: checkpoint summaries
    (N.checkpoint.json) must not enter the file-source feed at all —
    they would consume maxFilesPerTrigger admission slots and fire
    no-op micro-batches.  With the exact commit glob, a log holding
    interleaved checkpoints drains in EXACTLY one batch per commit."""
    import os

    from neo_server_spark.streaming.matview import (_COMMIT_GLOB,
                                                    stream_maintain)

    src = str(tmp_path / "src")
    txlog.write(_mk(spark, 0, 20).coalesce(1), src)      # v1
    txlog.write(_mk(spark, 20, 40).coalesce(1), src)     # v2
    txlog.checkpoint(src)            # 2.checkpoint.json interleaved
    txlog.write(_mk(spark, 40, 60).coalesce(1), src)     # v3
    txlog.checkpoint(src)            # 3.checkpoint.json
    txlog.write(_mk(spark, 60, 80).coalesce(1), src)     # v4
    log_dir = os.path.join(src, "_txlog")
    assert sum(1 for n in os.listdir(log_dir)
               if n.endswith(".checkpoint.json")) == 2
    # admission level: the glob admits exactly the 4 commit entries
    admitted = {os.path.basename(r["p"]) for r in
                spark.read.format("text")
                .option("pathGlobFilter", _COMMIT_GLOB)
                .load(log_dir)
                .select(F.col("_metadata.file_path").alias("p"))
                .collect()}
    assert len(admitted) == 4
    assert not any(n.endswith(".checkpoint.json") for n in admitted)
    # stream level: one micro-batch per commit, no checkpoint-only
    # no-op batches, every batch folds exactly one version
    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs=AGGS)
    seen = []
    orig = mv.refresh

    def spy(**kw):
        r = orig(**kw)
        seen.append((kw.get("until_version"), r["mode"]))
        return r

    mv.refresh = spy
    q = stream_maintain(spark, mv, str(tmp_path / "ckpt"),
                        max_commits_per_trigger=1)
    assert q.awaitTermination(180), "stream did not drain"
    assert [u for u, _ in seen] == [1, 2, 3, 4], \
        f"admission control admitted non-commit files: {seen}"
    batches = [p for p in q.recentProgress
               if p["numInputRows"] > 0]
    assert len(batches) == 4, \
        f"expected 4 one-commit batches, got " \
        f"{[(p['batchId'], p['numInputRows']) for p in q.recentProgress]}"
    assert all(p["numInputRows"] == 1 for p in batches)
    want, got = _expect(spark, src), _got(mv)
    for g in want:
        assert got[g]["n"] == want[g]["n"]
        assert got[g]["total"] == pytest.approx(want[g]["total"])


def test_bootstrap_publish_every_amortizes_publishes(spark, tmp_path):
    """r14 verdict #5: the per-chunk cost at scale is the PUBLISH
    (localCheckpoint + full view overwrite), not the fold — bootstrap
    folds per chunk but publishes every K chunks.  Publish count drops
    to ceil(chunks / K), the result stays identical to the monolithic
    fold, and a kill BETWEEN publishes resumes from the last publish
    without loss or double count."""
    src = str(tmp_path / "src")
    for i in range(6):
        txlog.write(_mk(spark, i * 20, (i + 1) * 20).coalesce(2), src)
    mono = MatView(spark, src, str(tmp_path / "mono"),
                   keys=["g"], aggs=AGGS)
    mono.refresh()
    a = sorted(map(tuple, mono.read().collect()))

    mv = MatView(spark, src, str(tmp_path / "view"),
                 keys=["g"], aggs=AGGS)
    publishes = []
    orig = mv._publish

    def counting(df, ver):
        publishes.append(ver)
        return orig(df, ver)

    mv._publish = counting
    r = mv.bootstrap(max_files_per_chunk=2, publish_every=3)
    assert r["chunks"] == 6 and r["delta_rows"] == 120
    assert len(publishes) == 2, \
        f"6 chunks / publish_every=3 should publish twice, " \
        f"got {publishes}"
    assert publishes == [3, 6]      # cursor rides each publish
    assert sorted(map(tuple, mv.read().collect())) == a

    # kill between publishes: die on the SECOND publish — the view
    # keeps the first publish's cursor, a fresh maintainer re-folds
    # only chunks 4-6 and converges to the same partials
    mv2 = MatView(spark, src, str(tmp_path / "view2"),
                  keys=["g"], aggs=AGGS)
    orig2 = mv2._publish
    calls = {"n": 0}

    def dying(df, ver):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("killed mid-bootstrap")
        return orig2(df, ver)

    mv2._publish = dying
    with pytest.raises(RuntimeError, match="killed"):
        mv2.bootstrap(max_files_per_chunk=2, publish_every=3)
    resumed = MatView(spark, src, str(tmp_path / "view2"),
                      keys=["g"], aggs=AGGS)
    assert resumed.watcher.version == 3, \
        "kill between publishes must resume at the last publish"
    r2 = resumed.bootstrap(max_files_per_chunk=2, publish_every=3)
    assert r2["chunks"] == 3
    assert sorted(map(tuple, resumed.read().collect())) == a
    assert resumed.refresh() == {"mode": "noop", "delta_rows": 0}


def test_stored_cols_cache_invalidates_on_publish(spark, tmp_path):
    """r14 advice: _covered_by_matview probed the stored layout by
    replaying the view's commit log PER ROUTED QUERY — now cached
    keyed by the view's latest version (one listdir to probe), and any
    publish invalidates it."""
    from neo_server_spark.sqlx.rollup import MINUTE, MatViewRollup

    base = str(tmp_path / "tagc")
    df = spark.createDataFrame(
        [("a", i * 700_000_000, float(i % 5)) for i in range(60)],
        "name string, time long, value double")
    txlog.write(df, base)
    vt = str(tmp_path / "ivmc")
    r = MatViewRollup(spark, base, vt)
    assert r.refresh()["mode"] == "incremental"
    assert "first" in r.servable_modes()
    ver0 = txlog.latest_version(vt)
    assert r._stored_cols_cache[0] == ver0
    # cached probe: repeated calls reuse the same tuple (no replay)
    c1 = r._stored_cols()
    assert r._stored_cols() is c1
    # a publish (here: a legacy-layout overwrite) bumps the version
    # and invalidates — servable_modes reflects the NEW layout without
    # constructing a fresh router
    legacy = txlog.read_table(spark, vt).drop(
        "_p_first", "_t_first", "_p_last", "_t_last")
    txlog.write(legacy.localCheckpoint(eager=True), vt,
                mode="overwrite")
    assert txlog.latest_version(vt) > ver0
    modes = r.servable_modes()
    assert "first" not in modes and "count" in modes
    got = {(x["name"], x["time"]): x["c"] for x in
           r.query(MINUTE, {"c": "count"}).collect()}
    exp = {(x["name"], x["t"]): x["c"] for x in
           df.groupBy("name", (F.col("time") - F.col("time") % MINUTE)
                      .alias("t"))
           .agg(F.count("value").alias("c")).collect()}
    assert got == exp
