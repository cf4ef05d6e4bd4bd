"""Copy-on-write DML over txlog tables (neo_server_spark/dml.py):
DELETE/UPDATE/MERGE semantics (incl. NULL-condition rows and duplicate
source keys), touched-file minimality (untouched files are not
rewritten), stats-pruned discovery, write-conflict detection against
concurrent compaction, and time travel across DML versions."""

import os

import pyspark.sql.functions as F
import pytest

from neo_server_spark import dml, txlog


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v long")


def _seed(spark, tmp_path, name="t"):
    """Four single-file commits, ids 0..19 in blocks of 5."""
    t = str(tmp_path / name)
    for k in range(4):
        rows = [(k * 5 + i, "ab"[k % 2], (k * 5 + i) * 10)
                for i in range(5)]
        txlog.write(_mk(spark, rows).coalesce(1), t, stats_cols=["id"])
    return t


def _ids(spark, t, **kw):
    return sorted(r["id"]
                  for r in txlog.read_table(spark, t, **kw).collect())


def test_delete_rewrites_only_touched_files(spark, tmp_path):
    t = _seed(spark, tmp_path)
    before = txlog.live_files(t)
    res = dml.delete(spark, t, "id >= 7 AND id <= 8")
    assert res["files_touched"] == 1          # ids 5..9 live in one file
    after = txlog.live_files(t)
    # the three untouched files are byte-identical live entries
    assert len(set(before) & set(after)) == 3
    assert _ids(spark, t) == [i for i in range(20) if i not in (7, 8)]


def test_delete_null_condition_keeps_row(spark, tmp_path):
    t = str(tmp_path / "tn")
    df = spark.createDataFrame([(1, None), (2, 5), (3, 50)],
                               "id long, v long")
    txlog.write(df.coalesce(1), t)
    dml.delete(spark, t, "v > 10")            # NULL > 10 is NULL -> keep
    assert sorted(r["id"] for r in
                  txlog.read_table(spark, t).collect()) == [1, 2]


def test_delete_whole_file_commits_pure_removal(spark, tmp_path):
    t = _seed(spark, tmp_path)
    res = dml.delete(spark, t, "id < 5")
    assert res["files_touched"] == 1
    assert len(txlog.live_files(t)) == 3
    assert _ids(spark, t) == list(range(5, 20))


def test_delete_no_match_is_noop(spark, tmp_path):
    t = _seed(spark, tmp_path)
    v = txlog.current_version(t)
    res = dml.delete(spark, t, "id > 1000")
    assert res == {"version": v, "files_touched": 0, "files_total": 4}
    assert txlog.current_version(t) == v


def test_delete_uses_stats_pruning(spark, tmp_path):
    t = _seed(spark, tmp_path)
    res = dml.delete(spark, t, "id = 12", prune={"id": (12, 12)})
    # footer stats cut the candidate set before the discovery scan
    assert res["files_total"] == 1
    assert res["files_touched"] == 1
    assert 12 not in _ids(spark, t)


def test_update_semantics_and_schema_stable(spark, tmp_path):
    t = _seed(spark, tmp_path)
    res = dml.update(spark, t, "id % 5 = 0", {"v": "v + 1"})
    assert res["files_touched"] == 4          # one multiple-of-5 per file
    out = {r["id"]: r["v"]
           for r in txlog.read_table(spark, t).collect()}
    for i in range(20):
        assert out[i] == i * 10 + (1 if i % 5 == 0 else 0)
    assert txlog.read_table(spark, t).schema == _mk(spark, []).schema


def test_merge_upsert(spark, tmp_path):
    t = _seed(spark, tmp_path)
    src = _mk(spark, [(3, "z", -3), (18, "z", -18), (40, "z", -40)])
    res = dml.merge(spark, t, src, on=["id"])
    assert res["files_touched"] == 2          # files holding 3 and 18
    out = {r["id"]: (r["grp"], r["v"])
           for r in txlog.read_table(spark, t).collect()}
    assert len(out) == 21
    assert out[3] == ("z", -3) and out[18] == ("z", -18)
    assert out[40] == ("z", -40)              # inserted
    assert out[4] == ("a", 40)                # untouched neighbor intact


def test_merge_delete_and_ignore(spark, tmp_path):
    t = _seed(spark, tmp_path)
    src = _mk(spark, [(0, "x", 0), (19, "x", 0), (99, "x", 0)])
    res = dml.merge(spark, t, src, on=["id"], when_matched="delete",
                    when_not_matched="ignore")
    assert res["files_touched"] == 2
    assert _ids(spark, t) == list(range(1, 19))


def test_merge_insert_only_never_rewrites(spark, tmp_path):
    t = _seed(spark, tmp_path)
    before = set(txlog.live_files(t))
    src = _mk(spark, [(5, "s", 1), (100, "s", 2)])
    res = dml.merge(spark, t, src, on=["id"], when_matched="keep")
    assert res["files_touched"] == 0          # keep = append-only merge
    assert before <= set(txlog.live_files(t))
    assert _ids(spark, t) == list(range(20)) + [100]
    v = {r["id"]: r["v"] for r in txlog.read_table(spark, t).collect()}
    assert v[5] == 50                         # matched row untouched


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    t = _seed(spark, tmp_path)
    src = _mk(spark, [(3, "z", 1), (3, "z", 2)])
    with pytest.raises(ValueError, match="duplicate keys"):
        dml.merge(spark, t, src, on=["id"])


def test_dml_conflict_with_concurrent_compact(spark, tmp_path):
    """A rewrite computed from a snapshot whose files a concurrent
    compact retired must raise TxConflict, not resurrect rows."""
    t = _seed(spark, tmp_path)
    touched = txlog.live_files(t)[:1]
    # simulate the race: compact lands between discovery and commit
    txlog.compact(spark, t, target_files=1)
    with pytest.raises(txlog.TxConflict, match="write conflict"):
        txlog.commit(t, [], remove=touched, must_be_live=touched)
    # and the public API path: monkeypatch discovery to a stale set
    real = dml._touched

    def stale(spark_, table_, match_, prune_, **kw):
        cand, tch = real(spark_, table_, match_, prune_, **kw)
        txlog.compact(spark_, table_, target_files=2)
        return cand, tch

    dml._touched = stale
    try:
        with pytest.raises(txlog.TxConflict):
            dml.delete(spark, t, "id = 3")
    finally:
        dml._touched = real
    # conflict left no staged garbage in the live set; rows intact
    assert _ids(spark, t) == list(range(20))


def test_time_travel_versions(spark, tmp_path):
    t = _seed(spark, tmp_path)                # versions 1..4
    dml.delete(spark, t, "id < 10")           # version 5
    dml.update(spark, t, "id = 15", {"v": "0"})   # version 6
    assert _ids(spark, t, version_as_of=4) == list(range(20))
    assert _ids(spark, t, version_as_of=5) == list(range(10, 20))
    assert _ids(spark, t, version_as_of=2) == list(range(10))
    v15 = {r["id"]: r["v"] for r in txlog.read_table(
        spark, t, version_as_of=5).collect()}[15]
    assert v15 == 150                         # pre-update value
    assert {r["id"]: r["v"] for r in txlog.read_table(
        spark, t).collect()}[15] == 0


def test_time_travel_across_checkpoint_and_timestamp(spark, tmp_path):
    t = _seed(spark, tmp_path)
    txlog.checkpoint(t)                       # checkpoint at v4
    dml.delete(spark, t, "id >= 15")          # v5
    # as-of BEFORE the checkpoint still reconstructs from raw entries
    assert _ids(spark, t, version_as_of=3) == list(range(15))
    txlog.checkpoint(t)
    # timestamp resolution: every surviving commit has ts <= now
    import time

    now_ms = int(time.time() * 1000) + 1000
    assert txlog.version_at(t, now_ms) == 5
    assert _ids(spark, t, timestamp_as_of_ms=now_ms) == list(range(15))
    with pytest.raises(ValueError, match="no commit at or before"):
        txlog.version_at(t, 1)


def test_time_travel_vacuumed_version_raises(spark, tmp_path):
    t = _seed(spark, tmp_path)
    txlog.checkpoint(t)
    txlog.vacuum(t, retention_s=0)            # truncates entries <= cp
    with pytest.raises(ValueError, match="vacuum"):
        txlog.live_files(t, as_of=2)


def test_row_changes_cdf(spark, tmp_path):
    """Row-level change feed: appends emit inserts from the data files;
    DML with cdf=True emits precise delete / update pre+post rows;
    a row-removing commit WITHOUT change files raises; vacuum keeps
    referenced change files and reaps orphans past retention."""
    t = _seed(spark, tmp_path)                 # v1..v4, ids 0..19
    dml.delete(spark, t, "id IN (3, 7)", cdf=True)          # v5
    dml.update(spark, t, "id = 11", {"v": "v + 5"}, cdf=True)   # v6
    src = _mk(spark, [(0, "z", -1), (50, "z", -2)])
    dml.merge(spark, t, src, on=["id"], cdf=True)           # v7
    cur, rows = txlog.row_changes(spark, t, 0)
    assert cur == 7
    by = {}
    for r in rows.collect():
        by.setdefault(r["_change_type"], []).append(r)
    assert sorted(r["id"] for r in by["insert"]
                  if r["_commit_version"] <= 4) == list(range(20))
    assert sorted(r["id"] for r in by["delete"]) == [3, 7]
    pre = {r["id"]: r["v"] for r in by["update_preimage"]}
    post = {r["id"]: r["v"] for r in by["update_postimage"]}
    assert pre[11] == 110 and post[11] == 115      # update rows
    assert pre[0] == 0 and post[0] == -1           # merge upsert rows
    assert [r["id"] for r in by["insert"]
            if r["_commit_version"] == 7] == [50]
    # polling from v4 sees only the DML tail
    _cur, tail_rows = txlog.row_changes(spark, t, 4)
    assert tail_rows.filter("_change_type = 'insert'") \
        .collect()[0]["id"] == 50
    # a remove without cdf files cannot be served precisely
    dml.delete(spark, t, "id = 12")                # v8, no cdf
    with pytest.raises(ValueError, match="without change files"):
        txlog.row_changes(spark, t, 7)
    # vacuum: referenced cdf files survive, an orphan is reaped
    import os

    orphan = os.path.join(t, "_cdf", "orphan.parquet")
    open(orphan, "wb").close()
    old = 10**9
    os.utime(orphan, (old, old))
    n_cdf = len(os.listdir(os.path.join(t, "_cdf")))
    txlog.vacuum(t, retention_s=3600)
    left = os.listdir(os.path.join(t, "_cdf"))
    assert len(left) == n_cdf - 1 and "orphan.parquet" not in left


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    """RESTORE: one metadata commit flips the live set back to the
    historical snapshot (no data copied); restored history remains
    time-travelable; restoring over a vacuumed version raises."""
    t = _seed(spark, tmp_path)                 # v1..v4
    files_v4 = set(txlog.live_files(t))
    dml.delete(spark, t, "id < 10")            # v5
    dml.update(spark, t, "id >= 15", {"v": "0"})   # v6
    v = txlog.restore(t, 4)                    # v7
    assert v == 7
    assert _ids(spark, t) == list(range(20))
    assert {r["v"] for r in txlog.read_table(spark, t)
            .filter("id >= 15").collect()} == {150, 160, 170, 180, 190}
    # metadata-only: the restored live set IS the v4 file set
    assert set(txlog.live_files(t)) == files_v4
    # the undone states remain readable above the restore point
    assert _ids(spark, t, version_as_of=5) == list(range(10, 20))
    # restore of a restore
    txlog.restore(t, 5)
    assert _ids(spark, t) == list(range(10, 20))


def test_partial_compaction(spark, tmp_path):
    """compact(prune=...) rewrites only the stat-intersecting subset —
    the compact-one-closed-day maintenance shape; untouched files keep
    their identity and rows stay exact."""
    t = _seed(spark, tmp_path)                 # 4 files, ids 0..19
    before = txlog.live_files(t)
    v = txlog.compact(spark, t, target_files=1,
                      prune={"id": (0, 9)}, stats_cols=["id"])
    after = txlog.live_files(t)
    # the two id>=10 files are untouched; the two id<10 merged into one
    # (live_files sorts by uuid name, so compare as SETS: exactly two
    # of the original files must survive identically)
    assert len(after) == 3
    assert len(set(before) & set(after)) == 2
    assert _ids(spark, t) == list(range(20))
    # CDF-silent: a consumer polling across it sees nothing new
    cur, delta = txlog.changes(spark, t, v - 1)
    assert delta is None


def test_scd2_apply(spark, tmp_path):
    """Type-2 dimension apply: changed keys close their current version
    and open a new one, unchanged keys are no-ops (no version churn),
    new keys insert, history rows never rewrite, txn replays no-op."""
    t = str(tmp_path / "dim")
    snap = spark.createDataFrame(
        [(1, "NY", "gold"), (2, "LA", "silver"), (3, "SF", "gold")],
        "k long, city string, tier string")
    txlog.write(dml.scd2_init(snap, F.lit(100)).coalesce(1), t)
    src = spark.createDataFrame(
        [(1, "NY", "plat"),      # tier changes -> close + open
         (2, "LA", "silver"),    # identical -> no-op
         (4, "TX", "gold")],     # new key -> insert
        "k long, city string, tier string") \
        .withColumn("eff", F.lit(200))
    res = dml.scd2_apply(spark, t, src, on=["k"],
                         attrs=["city", "tier"], effective_col="eff",
                         txn=("dim", 0))
    assert res["files_touched"] == 1
    rows = {(r["k"], r["_is_current"]):
            (r["city"], r["tier"], r["_valid_from"], r["_valid_to"])
            for r in txlog.read_table(spark, t).collect()}
    assert rows[(1, False)] == ("NY", "gold", 100, 200)   # closed
    assert rows[(1, True)] == ("NY", "plat", 200, None)   # new version
    assert rows[(2, True)] == ("LA", "silver", 100, None)  # untouched
    assert rows[(3, True)] == ("SF", "gold", 100, None)
    assert rows[(4, True)] == ("TX", "gold", 200, None)   # inserted
    assert len(rows) == 5
    # replay: exactly-once no-op
    res2 = dml.scd2_apply(spark, t, src, on=["k"],
                          attrs=["city", "tier"], effective_col="eff",
                          txn=("dim", 0))
    assert res2.get("replayed") and \
        txlog.read_table(spark, t).count() == 5
    # second wave: key 1 changes again -> two closed versions
    src2 = spark.createDataFrame([(1, "NY", "gold")],
                                 "k long, city string, tier string") \
        .withColumn("eff", F.lit(300))
    dml.scd2_apply(spark, t, src2, on=["k"],
                   attrs=["city", "tier"], effective_col="eff")
    hist = sorted((r["_valid_from"], r["_valid_to"], r["tier"])
                  for r in txlog.read_table(spark, t)
                  .filter("k = 1").collect())
    assert hist == [(100, 200, "gold"), (200, 300, "plat"),
                    (300, None, "gold")]


def test_deletion_vectors(spark, tmp_path):
    """DV delete: data files stay byte-identical, reads anti-join the
    tombstones, repeated/overlapping DVs layer correctly, compaction
    materializes and retires them, time travel spans DV versions, and
    vacuum keeps referenced tombstones."""
    t = _seed(spark, tmp_path)                 # 4 files, ids 0..19
    before = set(txlog.live_files(t))
    res = dml.delete(spark, t, "id IN (3, 7, 12)", mode="dv", cdf=True)
    assert res["files_touched"] == 3
    # zero data files rewritten
    assert set(txlog.live_files(t)) == before
    assert _ids(spark, t) == [i for i in range(20)
                              if i not in (3, 7, 12)]
    # a second DV layers on top (and already-deleted rows can't rematch)
    res2 = dml.delete(spark, t, "id IN (3, 4)", mode="dv")
    assert res2["files_touched"] == 1          # only id=4's file matches
    assert _ids(spark, t) == [i for i in range(20)
                              if i not in (3, 4, 7, 12)]
    # time travel reconstructs both pre-DV states
    assert _ids(spark, t, version_as_of=4) == list(range(20))
    assert _ids(spark, t, version_as_of=5) == \
        [i for i in range(20) if i not in (3, 7, 12)]
    # rewrite-mode DML on a DV'd file must NOT resurrect deleted rows
    dml.update(spark, t, "id = 2", {"v": "999"})
    assert _ids(spark, t) == [i for i in range(20)
                              if i not in (3, 4, 7, 12)]
    # the rewrite retired file-1's DVs; other files keep theirs
    from neo_server_spark.txlog import _replay
    dvs = _replay(t)[4]["dvs"]
    assert all("data/" in k for k in dvs) and len(dvs) == 2
    # v5 (dv+cdf) serves row changes; v6 (dv, no cdf) in the same range
    # poisons it — the feed refuses rather than serving a wrong delta
    with pytest.raises(ValueError, match="without change files"):
        txlog.row_changes(spark, t, 4)
    # checkpoint carries the DV map; reads after it still apply DVs
    txlog.checkpoint(t)
    assert _ids(spark, t) == [i for i in range(20)
                              if i not in (3, 4, 7, 12)]
    # compaction materializes the deletes and retires every DV
    txlog.compact(spark, t, target_files=1)
    assert _replay(t)[4]["dvs"] == {}
    assert _ids(spark, t) == [i for i in range(20)
                              if i not in (3, 4, 7, 12)]
    # vacuum(0) after compaction reaps the now-unreferenced tombstones
    txlog.vacuum(t, retention_s=0)
    dvdir = os.path.join(t, "_dv")
    assert not os.path.isdir(dvdir) or os.listdir(dvdir) == []


def test_dv_restore_and_matview_fallback(spark, tmp_path):
    """RESTORE reconciles deletion-vector state (a post-restore read
    equals the target snapshot even when DVs were added after it), and
    a DV delete triggers the matview full-recompute fallback."""
    t = _seed(spark, tmp_path)                 # v1..v4
    dml.delete(spark, t, "id = 5", mode="dv")  # v5
    dml.delete(spark, t, "id = 6", mode="dv")  # v6
    assert _ids(spark, t) == [i for i in range(20) if i not in (5, 6)]
    txlog.restore(t, 5)                        # undo v6's DV
    assert _ids(spark, t) == [i for i in range(20) if i != 5]
    txlog.restore(t, 4)                        # undo all DVs
    assert _ids(spark, t) == list(range(20))

    from neo_server_spark.streaming.matview import MatView
    vt = str(tmp_path / "view")
    mv = MatView(spark, t, vt, keys=["grp"],
                 aggs={"n": ("count", "id"), "hi": ("max", "v")})
    assert mv.refresh()["mode"] in ("incremental", "full")
    dml.delete(spark, t, "id < 5", mode="dv")
    txlog.write(_mk(spark, [(50, "c", 500)]), t)
    r = mv.refresh()
    assert r["mode"] == "full"                 # max is not subtractable
    got = {x["grp"]: x["n"] for x in mv.read().collect()}
    want = {x["grp"]: x["n"] for x in
            txlog.read_table(spark, t).groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_dml_model_based_random_ops(spark, tmp_path):
    """Model-based check over the FULL mutation surface: random
    sequences of append / rewrite-delete / DV-delete / update / merge /
    compact / partial-compact / checkpoint / restore against an
    in-memory dict model.  Invariant after EVERY op: read_table ==
    model; after restore: read_table == the remembered snapshot."""
    import random

    rng = random.Random(20260816)
    for case in range(4):
        t = str(tmp_path / f"dm{case}")
        model: dict[int, int] = {}
        next_id = 0
        snapshots: list[tuple[int, dict[int, int]]] = []

        def mk(ids):
            return spark.createDataFrame(
                [(i, "g%d" % (i % 3), model_val(i)) for i in ids],
                "id long, grp string, v long")

        def model_val(i):
            return i * 10

        for _op in range(rng.randint(6, 10)):
            ops = ["append", "delete", "dv", "update", "merge",
                   "compact", "pcompact", "checkpoint"]
            if snapshots:
                ops.append("restore")
            op = rng.choice(ops)
            if op == "append" or not model:
                ids = list(range(next_id, next_id + rng.randint(2, 5)))
                next_id += len(ids)
                txlog.write(mk(ids).coalesce(1), t, stats_cols=["id"])
                for i in ids:
                    model[i] = model_val(i)
            elif op in ("delete", "dv"):
                lo = rng.randint(0, max(next_id - 1, 0))
                hi = lo + rng.randint(0, 4)
                dml.delete(spark, t, f"id >= {lo} AND id <= {hi}",
                           mode="dv" if op == "dv" else "rewrite",
                           stats_cols=["id"])
                for i in list(model):
                    if lo <= i <= hi:
                        del model[i]
            elif op == "update":
                m = rng.randint(2, 4)
                dml.update(spark, t, f"id % {m} = 0",
                           {"v": "v + 1"}, stats_cols=["id"])
                for i in model:
                    if i % m == 0:
                        model[i] += 1
            elif op == "merge":
                ids = [rng.randint(0, next_id)] + [next_id]
                next_id += 1
                src = spark.createDataFrame(
                    [(i, "m", -i) for i in sorted(set(ids))],
                    "id long, grp string, v long")
                dml.merge(spark, t, src, on=["id"],
                          stats_cols=["id"])
                for i in set(ids):
                    model[i] = -i
            elif op == "compact":
                txlog.compact(spark, t, target_files=1,
                              stats_cols=["id"])
            elif op == "pcompact":
                txlog.compact(spark, t, target_files=1,
                              prune={"id": (0, next_id // 2)},
                              stats_cols=["id"])
            elif op == "checkpoint" and txlog.live_files(t):
                txlog.checkpoint(t)
            elif op == "restore":
                ver, snap = rng.choice(snapshots)
                try:
                    txlog.restore(t, ver)
                except ValueError:
                    continue           # vacuumed-away target: fine
                model = dict(snap)
            if not txlog.live_files(t):
                continue
            got = {r["id"]: r["v"] for r in
                   txlog.read_table(spark, t).collect()}
            assert got == model, (case, _op, op)
            snapshots.append((txlog.current_version(t), dict(model)))


def test_review_fixes_merge_dups_update_validation_scd2_nochurn(
        spark, tmp_path):
    """Review-pass regressions: (a) merge updates EVERY matched target
    row (duplicate target keys do not collapse); (b) UPDATE rejects
    unknown SET columns; (c) an all-identical SCD2 apply rewrites
    nothing; (d) file-level changes() refuses DML-rewrite commits but
    still serves plain overwrites."""
    # (a) duplicate target keys
    t = str(tmp_path / "dup")
    txlog.write(_mk(spark, [(1, "a", 10), (1, "b", 20), (2, "c", 30)])
                .coalesce(1), t)
    src = _mk(spark, [(1, "z", -1)])
    dml.merge(spark, t, src, on=["id"])
    rows = sorted((r["id"], r["grp"], r["v"]) for r in
                  txlog.read_table(spark, t).collect())
    assert rows == [(1, "z", -1), (1, "z", -1), (2, "c", 30)]

    # (b) unknown SET column
    with pytest.raises(ValueError, match="unknown column"):
        dml.update(spark, t, "id = 1", {"vv": "1"})

    # (c) SCD2 no-churn: identical apply bumps nothing
    d = str(tmp_path / "dim2")
    snap = spark.createDataFrame([(1, "x"), (2, "y")],
                                 "k long, a string")
    txlog.write(dml.scd2_init(snap, F.lit(1).cast("long")), d)
    v0 = txlog.current_version(d)
    res = dml.scd2_apply(spark, d,
                         snap.withColumn("eff", F.lit(2).cast("long")),
                         on=["k"], attrs=["a"], effective_col="eff")
    assert res["files_touched"] == 0
    assert txlog.current_version(d) == v0
    # ...and a changed+new mix narrows the rewrite to changed keys only
    src2 = spark.createDataFrame([(1, "x2"), (3, "w")],
                                 "k long, a string") \
        .withColumn("eff", F.lit(3).cast("long"))
    dml.scd2_apply(spark, d, src2, on=["k"], attrs=["a"],
                   effective_col="eff")
    got = {(r["k"], r["_is_current"]): r["a"] for r in
           txlog.read_table(spark, d).collect()}
    assert got == {(1, False): "x", (1, True): "x2",
                   (2, True): "y", (3, True): "w"}

    # (d) changes() refuses EVERY row-removing commit: the DML rewrite
    # AND the overwrite — an overwrite's add-files replace rows the
    # append-only consumer already emitted, so folding them as inserts
    # would double-count (r11 advice: the old code silently folded it)
    t2 = str(tmp_path / "cf")
    txlog.write(_mk(spark, [(1, "a", 1)]), t2)
    dml.delete(spark, t2, "id = 1")
    with pytest.raises(ValueError, match="removed rows"):
        txlog.changes(spark, t2, 0)
    txlog.write(_mk(spark, [(9, "o", 9)]), t2, mode="overwrite")
    with pytest.raises(ValueError, match="removed rows"):
        txlog.changes(spark, t2, 2)   # overwrite raises too now
    # plain appends AFTER the overwrite still serve incrementally
    v3 = txlog.current_version(t2)
    txlog.write(_mk(spark, [(10, "p", 10)]), t2)
    _cur, delta = txlog.changes(spark, t2, v3)
    assert [r["id"] for r in delta.collect()] == [10]


def test_dml_on_schema_evolved_table_keeps_new_columns(spark, tmp_path):
    """r11 advice (high): DML reading files written before AND after a
    merge_schema evolution must union footers — a non-mergeSchema read
    infers one file's schema and the rewrite would silently DROP the
    evolved column from surviving rows (data loss)."""
    t = str(tmp_path / "evo")
    txlog.write(_mk(spark, [(1, "a", 10), (2, "a", 20)]).coalesce(1), t)
    wide = spark.createDataFrame(
        [(3, "b", 30, "x"), (4, "b", 40, "y")],
        "id long, grp string, v long, extra string")
    txlog.write(wide.coalesce(1), t, merge_schema=True)
    # delete touches BOTH vintages (pre- and post-evolution files)
    dml.delete(spark, t, "id IN (1, 3)")
    got = {r["id"]: r["extra"]
           for r in txlog.read_table(spark, t).collect()}
    assert got == {2: None, 4: "y"}           # evolved column SURVIVES
    # update across vintages: assignment works, evolved column intact
    dml.update(spark, t, "id = 2", {"v": "99"})
    rows = {r["id"]: (r["v"], r["extra"])
            for r in txlog.read_table(spark, t).collect()}
    assert rows == {2: (99, None), 4: (40, "y")}


def test_rewrite_conflicts_with_concurrent_dv_delete(spark, tmp_path):
    """r11 advice (medium): a DV delete leaves its target file LIVE, so
    liveness-only conflict detection let a rewrite computed from a
    pre-DV snapshot commit and RESURRECT the tombstoned rows — the
    commit must also detect deletion-vector drift."""
    t = _seed(spark, tmp_path)
    real = dml._touched
    state = {"fired": False}

    def stale(spark_, table_, match_, prune_, **kw):
        cand, tch = real(spark_, table_, match_, prune_, **kw)
        if not state["fired"]:                # the inner delete recurses
            state["fired"] = True
            dml.delete(spark_, table_, "id = 6", mode="dv")
        return cand, tch

    dml._touched = stale
    try:
        with pytest.raises(txlog.TxConflict, match="deletion-vector"):
            dml.update(spark, t, "id = 5", {"v": "0"})
    finally:
        dml._touched = real
    # id=6 stays deleted (the DV delete was NOT resurrected) and a
    # retry from a fresh snapshot lands the update
    dml.update(spark, t, "id = 5", {"v": "0"})
    vals = {r["id"]: r["v"] for r in txlog.read_table(spark, t).collect()}
    assert 6 not in vals
    assert vals[5] == 0


def test_compact_materializes_dv_dense_files(spark, tmp_path):
    """VERDICT r11 #4: a file whose tombstoned fraction exceeds the
    density cap is force-rewritten by compact() even when pruning would
    skip it, resetting its DV list (read-amplification cap)."""
    t = _seed(spark, tmp_path)
    # tombstone 3 of 5 rows of the ids-5..9 file -> 60% > 20% cap
    dml.delete(spark, t, "id >= 5 AND id <= 7", mode="dv")
    assert txlog._replay(t)[4]["dvs"]         # DV present before
    # partial compact aimed at the ids-15..19 file ONLY
    txlog.compact(spark, t, target_files=1, prune={"id": (15, 19)},
                  stats_cols=["id"])
    meta = txlog._replay(t)[4]
    assert meta["dvs"] == {}                  # dense file materialized
    assert _ids(spark, t) == [0, 1, 2, 3, 4, 8, 9] + list(range(10, 20))


def test_insert_only_merge_folds_in_change_feed(spark, tmp_path):
    """An insert-only MERGE (or SCD2 apply with only new keys) removes
    nothing — the file-level change feed must fold its adds as a plain
    append instead of refusing; the dml flag is reserved for
    survivor-carrying rewrites (r12 review finding)."""
    t = _seed(spark, tmp_path)
    v0 = txlog.current_version(t)
    src = _mk(spark, [(100, "n", 1), (101, "n", 2)])
    dml.merge(spark, t, src, on=["id"], when_matched="keep")
    _cur, delta = txlog.changes(spark, t, v0)
    assert sorted(r["id"] for r in delta.collect()) == [100, 101]
    # new-keys-only SCD2 apply is likewise a pure append to the feed
    d = str(tmp_path / "dim_feed")
    boot = spark.createDataFrame([(1, "x")], "k long, a string")
    txlog.write(dml.scd2_init(boot, F.lit(1).cast("long")), d)
    v1 = txlog.current_version(d)
    dml.scd2_apply(spark, d, spark.createDataFrame(
        [(2, "y", 5)], "k long, a string, eff long"),
        on=["k"], attrs=["a"], effective_col="eff")
    _cur, delta = txlog.changes(spark, d, v1)
    assert [r["k"] for r in delta.collect()] == [2]
    # ...but a survivor-carrying rewrite still refuses
    dml.update(spark, d, "k = 1", {"a": "'z'"})
    with pytest.raises(ValueError, match="removed rows"):
        txlog.changes(spark, d, v1)


def test_corpus_diff_versions(spark, tmp_path):
    """datapipe.versioning.corpus_diff: added/removed/modified between
    two txlog versions, scanning only the file-set symmetric difference
    (+ DV-drifted files); unchanged docs in common files never read,
    compaction-moved-but-identical docs cancel out."""
    from neo_server_spark.datapipe.versioning import corpus_diff

    t = str(tmp_path / "corpus")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    txlog.write(mk([(1, "alpha"), (2, "beta")]).coalesce(1), t)    # v1
    txlog.write(mk([(3, "gamma"), (4, "delta")]).coalesce(1), t)   # v2
    v_from = txlog.current_version(t)
    dml.update(spark, t, "doc_id = 3", {"text": "'gamma-2'"})      # v3
    dml.delete(spark, t, "doc_id = 2")                             # v4
    txlog.write(mk([(5, "epsilon")]).coalesce(1), t)               # v5
    v_to = txlog.current_version(t)
    got = {r["doc_id"]: r["change"] for r in
           corpus_diff(spark, t, v_from, v_to,
                       key="doc_id", digest_cols=["text"]).collect()}
    assert got == {2: "removed", 3: "modified", 5: "added"}
    # DV delete drifts a common file's DV state: must surface as removed
    v_mid = v_to
    dml.delete(spark, t, "doc_id = 4", mode="dv")
    got2 = {r["doc_id"]: r["change"] for r in
            corpus_diff(spark, t, v_mid, txlog.current_version(t),
                        key="doc_id", digest_cols=["text"]).collect()}
    assert got2 == {4: "removed"}
    # identical snapshots diff to nothing (and cost no data IO)
    assert corpus_diff(spark, t, v_mid, v_mid,
                       key="doc_id", digest_cols=["text"]).count() == 0
    # compaction moves every doc to new files with identical content:
    # the diff cancels to empty
    v_pre = txlog.current_version(t)
    txlog.compact(spark, t, target_files=1)
    assert corpus_diff(spark, t, v_pre, txlog.current_version(t),
                       key="doc_id", digest_cols=["text"]).count() == 0
    # ambiguous identity raises — from INSIDE the diff job (r13: the
    # validation rides the same scan, no separate groupBy-count action)
    txlog.write(mk([(5, "epsilon-dup")]).coalesce(1), t)
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(spark, t, v_pre, txlog.current_version(t),
                    key="doc_id", digest_cols=["text"]).collect()


def test_corpus_diff_model_random_ops(spark, tmp_path):
    """Model-based check: random commit sequences (insert / update /
    rewrite-delete / DV-delete / compact), then corpus_diff between
    sampled version pairs must equal the brute-force diff of the two
    time-travel reads — validating the file-skip and DV-drift logic
    against the snapshots themselves."""
    import random

    from neo_server_spark.datapipe.versioning import corpus_diff

    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    rng = random.Random(20260816)
    for case in range(3):
        t = str(tmp_path / f"cd{case}")
        txlog.write(mk([(i, f"t{i}") for i in range(5)]).coalesce(1), t)
        next_id = 5
        versions = [txlog.current_version(t)]
        for _op in range(rng.randint(4, 6)):
            live = sorted(r["id"] for r in
                          txlog.read_table(spark, t).collect())
            op = rng.choice(["insert", "update", "delete", "dv",
                             "compact"])
            if op == "insert":
                n = rng.randint(1, 3)
                ids = list(range(next_id, next_id + n))
                next_id += n
                txlog.write(mk([(i, f"t{i}") for i in ids])
                            .coalesce(1), t)
            elif op == "update" and live:
                pick = rng.choice(live)
                dml.update(spark, t, f"id = {pick}",
                           {"v": f"v || '-u{_op}'"})
            elif op == "delete" and len(live) > 2:
                dml.delete(spark, t, f"id = {rng.choice(live)}")
            elif op == "dv" and len(live) > 2:
                dml.delete(spark, t, f"id = {rng.choice(live)}",
                           mode="dv")
            else:
                txlog.compact(spark, t,
                              target_files=rng.randint(1, 2))
            versions.append(txlog.current_version(t))
        pairs = [(versions[0], versions[-1]),
                 (versions[len(versions) // 2], versions[-1]),
                 (versions[-1], versions[-1])]
        for vf, vt in pairs:
            old = {r["id"]: r["v"] for r in txlog.read_table(
                spark, t, version_as_of=vf).collect()}
            new = {r["id"]: r["v"] for r in txlog.read_table(
                spark, t, version_as_of=vt).collect()}
            expect = {}
            for k in old.keys() | new.keys():
                if k not in new:
                    expect[k] = "removed"
                elif k not in old:
                    expect[k] = "added"
                elif old[k] != new[k]:
                    expect[k] = "modified"
            got = {r["id"]: r["change"] for r in
                   corpus_diff(spark, t, vf, vt, key="id",
                               digest_cols=["v"]).collect()}
            assert got == expect, (case, vf, vt)
