"""Copy-on-write DML (DELETE / UPDATE / MERGE) over txlog tables.

The reference engine mutates rows in place through its storage layer
(``DELETE FROM tag WHERE name=...`` is exercised at
mods/server/http_query_test.go:394 and routed like any other SQL
statement); an immutable-parquet lakehouse expresses the same semantics
as Delta Lake does — REWRITE ONLY THE FILES THAT CONTAIN AFFECTED ROWS
and publish the swap in one atomic commit:

* **Touched-file discovery is distributed and pruned**: candidate files
  come from the commit log's footer stats (``pruned_files``), then ONE
  scan with ``input_file_name()`` finds the files that actually contain
  matching rows.  At 100 TB a DELETE of one day's rows reads the
  handful of files whose [min,max] time range intersects — never the
  table.
* **Copy-on-write**: untouched live files are neither read nor
  rewritten.  The commit removes the touched files and adds their
  rewrites; readers of the pre-DML snapshot keep their files (physical
  deletion is vacuum()'s job, behind the retention window).
* **Write-conflict detection**: the commit carries
  ``must_be_live=touched`` — if a concurrent compact/overwrite/DML
  retired any file this rewrite was computed from, the commit raises
  ``TxConflict`` instead of resurrecting deleted rows (Delta's
  serializable conflict check for read-modify-write transactions).

This is the mechanism a training-data pipeline needs for
right-to-be-forgotten / revocation deletes: remove specific documents
from a 100 TB corpus at O(touched files) cost with an auditable commit,
not an O(table) rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from neo_server_spark import txlog

__all__ = ["delete", "update", "merge", "scd2_init", "scd2_apply"]

# broadcast the merge-source key set below this many keys; above it the
# touched-file semi-join falls back to a shuffle join (AQE still picks
# broadcast if the bytes allow)
_BCAST_KEYS = 2_000_000


def _cond(condition) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def _snapshot(table: str) -> dict:
    """The table's schema/DV metadata as of NOW — captured ONCE per DML
    statement so every read within it sees one consistent snapshot, and
    so the commit can conflict-check the DV state the rewrite was
    computed from (txlog must_match_dvs)."""
    return txlog._replay(table)[4]


def _dv_snap(meta: dict, rels: list[str]) -> dict[str, list[str]]:
    """See txlog.dv_snapshot — the must_match_dvs guard dict."""
    return txlog.dv_snapshot(meta, rels)


def _touched(spark: SparkSession, table: str, match,
             prune: dict | None,
             meta: dict | None = None) -> tuple[list[str], list[str]]:
    """(candidate rels, rels that actually contain matching rows).

    ``match`` maps a candidate DataFrame (with ``__file`` = absolute
    input path) to the matching subset.  One distributed scan; the
    collect is O(files), never O(rows)."""
    cand = txlog.pruned_files(table, prune)
    if not cand:
        return [], []
    # DV-aware: rows already tombstoned by a deletion vector must not
    # re-touch their file (and must not re-match a DML)
    df = _read(spark, table, cand, with_file=True, meta=meta)
    hit = (match(df).select("__file").distinct().collect())
    # data files are flat under data/<uuid>.parquet: basename <-> rel
    base_to_rel = {rel.split("/")[-1]: rel for rel in cand}
    touched = sorted(base_to_rel[r["__file"].rsplit("/", 1)[-1]]
                     for r in hit)
    return cand, touched


def _read(spark: SparkSession, table: str, rels: list[str],
          with_file: bool = False, with_pos: bool = False,
          meta: dict | None = None) -> DataFrame:
    """Deletion-vector-aware read of specific table files (the ONLY way
    DML may read target rows — a raw parquet read would resurrect
    DV-deleted rows into a rewrite).

    Schema-evolution-aware via txlog.read_live: a DML touching
    pre-evolution files must NOT infer the narrow schema — the rewrite
    would silently DROP evolved columns from surviving rows."""
    if meta is None:
        meta = _snapshot(table)
    return txlog.read_live(spark, table, rels, meta,
                           with_file=with_file, with_pos=with_pos)


def _stage_cdf(parts: list[tuple[DataFrame, str]], table: str
               ) -> list[str]:
    """Write row-level change files (Delta CDF): each part is (rows,
    _change_type).  Staged like data files — invisible until the DML's
    commit references them."""
    out: DataFrame | None = None
    for df, ctype in parts:
        tagged = df.withColumn("_change_type", F.lit(ctype))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        return []
    return txlog.stage_files(out, table, subdir="_cdf")


def _rewrite_commit(spark: SparkSession, table: str, touched: list[str],
                    new_df: DataFrame | None,
                    stats_cols: list[str] | None,
                    cdf_parts: list[tuple[DataFrame, str]] | None = None,
                    txn: tuple[str, int] | None = None,
                    meta: dict | None = None,
                    staged: list[str] | None = None) -> int:
    """Stage the rewrite (if any rows survive) and atomically swap it
    for the touched files, with write-conflict detection (liveness AND
    deletion-vector drift when ``meta`` carries the read snapshot).
    ``cdf_parts`` are (rows, change_type) frames to publish as the
    commit's row-level change feed.  ``staged`` passes rels the caller
    already staged (delete() stages first to learn the survivor count
    from the footers)."""
    import os

    rels = staged if staged is not None else (
        txlog.stage_files(new_df, table) if new_df is not None else [])
    stats = (txlog._file_stats(table, rels, stats_cols)
             if stats_cols and rels else None)
    cdf_rels = _stage_cdf(cdf_parts, table) if cdf_parts else []
    dv_guard = _dv_snap(meta, touched) if meta is not None else None
    try:
        # dml=True marks add-files that carry SURVIVORS of removed rows;
        # an insert-only statement (merge/scd2 with no touched files)
        # removed nothing, so its adds are plain new rows the file-level
        # change feed may fold — flagging it would make changes()/
        # MatView.refresh refuse a commit that is semantically an append
        return txlog.commit(table, rels, remove=touched, stats=stats,
                            must_be_live=touched,
                            must_match_dvs=dv_guard,
                            cdf=cdf_rels or None,
                            txn=txn, dml=bool(touched))
    except txlog.TxConflict:
        # the rewrite is stale — drop its staged files before re-raising
        for rel in rels + cdf_rels:
            p = os.path.join(table, rel)
            if os.path.exists(p):
                os.unlink(p)
        raise


def delete(spark: SparkSession, table: str, condition,
           prune: dict | None = None,
           stats_cols: list[str] | None = None,
           cdf: bool = False,
           txn: tuple[str, int] | None = None,
           mode: str = "rewrite") -> dict:
    """DELETE FROM table WHERE condition, copy-on-write.

    ``mode="dv"`` writes DELETION VECTORS instead of rewriting files:
    matched (file, row-index) pairs land in tombstone files the commit
    references, and every read anti-joins them — a tiny delete costs
    O(matched rows) IO however large the touched files are.  A later
    rewrite/compaction of a tombstoned file materializes the delete and
    retires its DVs.

    Rows where ``condition`` evaluates true are removed; false/NULL
    rows are kept (SQL DELETE semantics).  ``cdf=True`` additionally
    publishes the deleted rows as change files so
    ``txlog.row_changes`` / subtractable MatViews can consume the
    delete incrementally.  Returns ``{"version", "files_touched",
    "files_total"}``; version is the pre-existing one when nothing
    matched (no empty commits)."""
    if txn is not None:
        prior = txlog.last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            # exactly-once replay (foreachBatch retry): the statement
            # already committed as this (app, epoch) — no-op
            return {"version": prior, "files_touched": 0,
                    "files_total": 0, "replayed": True}
    cond = _cond(condition)
    meta = _snapshot(table)
    hit_cond = F.coalesce(cond, F.lit(False))
    import os

    if mode == "dv":
        # deletion-vector path: name the matched rows as tombstones
        # instead of rewriting the files — O(matched rows) written, the
        # data files stay byte-identical (Delta's DV fast delete).
        #
        # ONE scan over the stats-pruned candidates stages the
        # tombstones directly; the touched-file set is recovered from
        # the staged tombstones' __f column on the driver (O(matched
        # rows) of dictionary-encoded basenames — the former separate
        # discovery job scanned the same candidate rows a second time,
        # and a DV delete's premise is that the matched set is small).
        cand = txlog.pruned_files(table, prune)
        if not cand:
            return {"version": txlog.current_version(table),
                    "files_touched": 0, "files_total": 0}
        df = _read(spark, table, cand, with_pos=True, meta=meta)
        hit = df.filter(hit_cond)
        tomb = hit.select("__f", "__pos")
        dv_rels = txlog.stage_files(tomb, table, subdir="_dv")
        import pyarrow.parquet as pq

        def _tomb_bases(rel: str) -> list[str]:
            pf = pq.ParquetFile(os.path.join(table, rel))
            if not pf.metadata.num_rows:
                return []
            return (pf.read(columns=["__f"])
                    .column("__f").unique().to_pylist())

        bases: set[str] = set()
        for lst in txlog._pmap_meta(_tomb_bases, dv_rels):
            bases.update(lst)
        base_to_rel = {rel.split("/")[-1]: rel for rel in cand}
        touched = sorted(base_to_rel[b] for b in bases)
        if not touched:
            for rel in dv_rels:
                pth = os.path.join(table, rel)
                if os.path.exists(pth):
                    os.unlink(pth)
            return {"version": txlog.current_version(table),
                    "files_touched": 0, "files_total": len(cand)}
        cdf_rels = (_stage_cdf([(hit.drop("__f", "__pos"), "delete")],
                               table) if cdf else [])
        try:
            ver = txlog.commit(table, [], must_be_live=touched,
                               must_match_dvs=_dv_snap(meta, touched),
                               dv={t: dv_rels for t in touched},
                               cdf=cdf_rels or None, txn=txn)
        except txlog.TxConflict:
            for rel in dv_rels + cdf_rels:
                pth = os.path.join(table, rel)
                if os.path.exists(pth):
                    os.unlink(pth)
            raise
        return {"version": ver, "files_touched": len(touched),
                "files_total": len(cand)}
    cand, touched = _touched(spark, table, lambda d: d.filter(cond),
                             prune, meta=meta)
    if not touched:
        return {"version": txlog.current_version(table),
                "files_touched": 0, "files_total": len(cand)}
    df = _read(spark, table, touched, meta=meta)
    keep = df.filter(~hit_cond)
    parts = [(df.filter(hit_cond), "delete")] if cdf else None
    # stage the rewrite FIRST — the job that had to run anyway — and
    # read the survivor count from the staged parquet FOOTERS (driver
    # metadata, thread-pooled above a handful of files): an all-matching
    # file set is detected without the former separate keep.isEmpty()
    # job, and touched-file discovery keeps its pushed-down match filter
    # (a per-file count probe tried in r15 lost the pushdown and read
    # every candidate row — reverted)
    rels = txlog.stage_files(keep, table)
    n_keep = txlog.staged_rows(table, rels)
    if n_keep == 0:
        # all rows in the touched files matched: commit pure removal
        for r in rels:
            p = os.path.join(table, r)
            if os.path.exists(p):
                os.unlink(p)
        rels = []
    ver = _rewrite_commit(spark, table, touched,
                          keep if rels else None, stats_cols,
                          cdf_parts=parts, txn=txn, meta=meta,
                          staged=rels)
    return {"version": ver, "files_touched": len(touched),
            "files_total": len(cand)}


def update(spark: SparkSession, table: str, condition,
           assignments: dict[str, object],
           prune: dict | None = None,
           stats_cols: list[str] | None = None,
           cdf: bool = False,
           txn: tuple[str, int] | None = None) -> dict:
    """UPDATE table SET col=expr, ... WHERE condition, copy-on-write.

    ``assignments`` maps column name -> SQL expression string (or
    Column) evaluated over the matching row; non-matching rows in a
    touched file are rewritten byte-identical.  ``cdf=True`` publishes
    the matched rows as update_preimage/update_postimage change
    files."""
    if txn is not None:
        prior = txlog.last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            # exactly-once replay (foreachBatch retry): the statement
            # already committed as this (app, epoch) — no-op
            return {"version": prior, "files_touched": 0,
                    "files_total": 0, "replayed": True}
    sch = txlog.table_schema(table)
    known = ([n for n, _t in sch] if sch
             else txlog.read_table(spark, table).columns)
    unknown = [c for c in assignments if c not in known]
    if unknown:
        raise ValueError(
            f"UPDATE sets unknown column(s) {unknown}; table has "
            f"{known}")
    cond = _cond(condition)
    meta = _snapshot(table)
    cand, touched = _touched(spark, table, lambda d: d.filter(cond),
                             prune, meta=meta)
    if not touched:
        return {"version": txlog.current_version(table),
                "files_touched": 0, "files_total": len(cand)}
    import os

    df = _read(spark, table, touched, meta=meta)
    hit = F.coalesce(cond, F.lit(False))

    def apply_assign(frame):
        return frame.select(*[
            (_cond(assignments[c]).cast(df.schema[c].dataType)
             .alias(c)) if c in assignments else F.col(c)
            for c in df.columns])

    out = df.select(*[
        (F.when(hit, _cond(assignments[c]).cast(df.schema[c].dataType))
          .otherwise(F.col(c)).alias(c)) if c in assignments
        else F.col(c)
        for c in df.columns])
    parts = None
    if cdf:
        pre = df.filter(hit)
        parts = [(pre, "update_preimage"),
                 (apply_assign(pre), "update_postimage")]
    ver = _rewrite_commit(spark, table, touched, out, stats_cols,
                          cdf_parts=parts, txn=txn, meta=meta)
    return {"version": ver, "files_touched": len(touched),
            "files_total": len(cand)}


def merge(spark: SparkSession, table: str, source: DataFrame,
          on: list[str],
          when_matched: str = "update",
          when_not_matched: str = "insert",
          prune: dict | None = None,
          stats_cols: list[str] | None = None,
          validate_unique: bool = True,
          cdf: bool = False,
          txn: tuple[str, int] | None = None) -> dict:
    """MERGE INTO table USING source ON key columns — the lakehouse
    upsert (Delta MERGE core shapes):

    * ``when_matched='update'`` replaces each matched target row with
      its source row; ``'delete'`` drops it; ``'keep'`` leaves it.
    * ``when_not_matched='insert'`` appends source rows whose key has
      no target match; ``'ignore'`` drops them.

    Only files containing matched keys are rewritten (semi-join of the
    stats-pruned candidates against the source key set, broadcast when
    small); inserts are plain new files.  One atomic commit with
    write-conflict detection covers the whole statement.

    ``validate_unique`` rejects a source with duplicate keys — two
    source rows matching one target row is non-deterministic (the same
    error Delta raises)."""
    if txn is not None:
        prior = txlog.last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            # exactly-once replay (foreachBatch retry): the statement
            # already committed as this (app, epoch) — no-op
            return {"version": prior, "files_touched": 0,
                    "files_total": 0, "replayed": True}
    if when_matched not in ("update", "delete", "keep"):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    if when_matched == "keep" and when_not_matched == "ignore":
        cand = txlog.pruned_files(table, prune)
        return {"version": txlog.current_version(table),
                "files_touched": 0, "files_total": len(cand)}
    # ONE probe job over the source replaces the former three (duplicate
    # -key validation, prune-bound min/max, broadcast sizing): group by
    # the merge key once — max(per-key count) answers uniqueness, the
    # group count IS the distinct-key count for broadcast sizing, and
    # min/max of a key column over the groups equals min/max over the
    # raw source (the key columns are the group keys).
    #
    # Prune-bound soundness (unchanged): a target file whose logged
    # [min,max] misses [min(src), max(src)] on a key column cannot
    # contain a match.  String columns are excluded — parquet writers
    # may TRUNCATE long string min/max stats, and a truncated max is a
    # prefix (sorts LOWER than the real max); numeric/temporal stats
    # are exact.  Files without stats are conservatively kept by
    # pruned_files.
    safe = [c for c in on
            if not source.schema[c].dataType.simpleString()
            .startswith(("string", "binary", "varchar", "char"))] \
        if prune is None else []
    grouped = source.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    probe_aggs = [F.max("__n").alias("__mx"),
                  F.count(F.lit(1)).alias("__nk")]
    for c in safe:
        probe_aggs += [F.min(c).alias(f"__lo_{c}"),
                       F.max(c).alias(f"__hi_{c}")]
    p = grouped.agg(*probe_aggs).first()
    if validate_unique and (p["__mx"] or 0) > 1:
        raise ValueError("merge source has duplicate keys on "
                         f"{on}; dedupe it first")
    if safe:
        prune = {c: (p[f"__lo_{c}"], p[f"__hi_{c}"]) for c in safe
                 if p[f"__lo_{c}"] is not None} or None
    keys = source.select(*on).distinct()
    bkeys = F.broadcast(keys) if (p["__nk"] or 0) <= _BCAST_KEYS else keys
    meta = _snapshot(table)
    cand, touched = _touched(
        spark, table, lambda d: d.join(bkeys, on, "left_semi"), prune,
        meta=meta)
    import os

    # column names come from the LOGGED schema (O(1) metadata), not a
    # read_table() whose plan would LIST every live file — at 12k+ files
    # that listing alone dominated a small merge (300M-point profile)
    sch = txlog.table_schema(table)
    tgt_cols = [n for n, _t in sch] if sch \
        else txlog.read_table(spark, table).columns
    # every target key that matches a source key lives in a touched
    # file BY CONSTRUCTION, so the touched files' key set IS the full
    # table's matched-key set — unmatched-source discovery never scans
    # the untouched bulk of the table
    tgt = _read(spark, table, touched, meta=meta) if touched else None
    matched_keys = (tgt.select(*on).join(bkeys, on, "left_semi")
                    .distinct() if tgt is not None else None)
    parts: list[DataFrame] = []
    cdf_parts: list[tuple[DataFrame, str]] = []
    rewrite_touched = touched and when_matched in ("update", "delete")
    if rewrite_touched:
        parts.append(tgt.join(bkeys, on, "left_anti"))   # unmatched tgt
        matched_tgt = tgt.join(bkeys, on, "left_semi")
        if when_matched == "update":
            # one output row PER MATCHED TARGET ROW (duplicate target
            # keys are legal on a txlog table; collapsing them to one
            # source row would silently shrink the table) — Delta's
            # update-every-matched-row semantics
            repl = matched_tgt.select(*on).join(source, on, "inner")
            parts.append(repl)
            if cdf:
                cdf_parts += [
                    (matched_tgt.select(*tgt_cols), "update_preimage"),
                    (repl.select(*tgt_cols), "update_postimage")]
        elif cdf:
            cdf_parts.append((matched_tgt.select(*tgt_cols), "delete"))
    if when_not_matched == "insert":
        inserts = (source.join(matched_keys, on, "left_anti")
                   if matched_keys is not None else source)
        parts.append(inserts)
        if cdf:
            cdf_parts.append((inserts.select(*tgt_cols), "insert"))
    elif not rewrite_touched:
        # keep+ignore handled above; delete/update with no touched
        # files and no inserts is a no-op
        return {"version": txlog.current_version(table),
                "files_touched": 0, "files_total": len(cand)}
    out = parts[0].select(*tgt_cols)
    for p in parts[1:]:
        out = out.unionByName(p.select(*tgt_cols))
    remove = touched if rewrite_touched else []
    # stage the rewrite FIRST — the job that had to run anyway — and
    # read the output row count from the staged parquet FOOTERS (driver
    # metadata, thread-pooled): the former separate out.isEmpty() job
    # executed the whole union plan (touched-file read + three joins +
    # source scans) a second time just to learn emptiness (same
    # staged-first collapse delete() ships)
    rels = txlog.stage_files(out, table)
    n_out = txlog.staged_rows(table, rels)
    if n_out == 0:
        for r in rels:
            p = os.path.join(table, r)
            if os.path.exists(p):
                os.unlink(p)
        if not remove:
            return {"version": txlog.current_version(table),
                    "files_touched": 0, "files_total": len(cand)}
        rels = []
    ver = _rewrite_commit(spark, table, remove,
                          out if rels else None, stats_cols,
                          cdf_parts=cdf_parts or None, txn=txn,
                          meta=meta, staged=rels)
    return {"version": ver, "files_touched": len(remove),
            "files_total": len(cand)}


def scd2_init(df: DataFrame, effective_col) -> DataFrame:
    """Bootstrap a Type-2 slowly-changing dimension from an initial
    snapshot: every row becomes the OPEN version (_valid_from =
    effective, _valid_to = NULL, _is_current = true)."""
    eff = _cond(effective_col) if isinstance(effective_col, str) \
        else effective_col
    return (df.withColumn("_valid_from", eff)
            .withColumn("_valid_to",
                        F.lit(None).cast(df.select(eff).schema[0].dataType))
            .withColumn("_is_current", F.lit(True)))


def scd2_apply(spark: SparkSession, table: str, source: DataFrame,
               on: list[str], attrs: list[str], effective_col: str,
               stats_cols: list[str] | None = None,
               txn: tuple[str, int] | None = None) -> dict:
    """SCD Type-2 apply (Kimball dimension history), copy-on-write:

    * a source key with a DIFFERENT attribute tuple than its current
      row CLOSES that row (_valid_to = source effective time,
      _is_current = false) and inserts the new open version;
    * an unseen key inserts its first open version;
    * an identical attribute tuple is a no-op (no version churn).

    Only files holding CURRENT rows of source keys are rewritten
    (historical versions of other files are never touched — at 100 TB
    the dimension's history bulk stays cold).  One atomic
    conflict-checked commit; ``txn`` gives foreachBatch exactly-once.
    NULL-safe attribute comparison (<=>): NULL -> value and value ->
    NULL both count as changes."""
    if txn is not None:
        prior = txlog.last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            return {"version": prior, "files_touched": 0,
                    "files_total": 0, "replayed": True}
    # one probe job answers BOTH duplicate-key validation (max per-key
    # count) and broadcast sizing (distinct-key count) — same collapse
    # as merge()'s source probe
    p = (source.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
         .agg(F.max("__n").alias("__mx"),
              F.count(F.lit(1)).alias("__nk")).first())
    if (p["__mx"] or 0) > 1:
        raise ValueError(f"scd2 source has duplicate keys on {on}")
    keys = source.select(*on).distinct()
    nkeys = p["__nk"] or 0          # reused for both joins
    bkeys = F.broadcast(keys) if nkeys <= _BCAST_KEYS else keys
    meta = _snapshot(table)
    cand, touched = _touched(
        spark, table,
        lambda d: d.filter(F.col("_is_current"))
                   .join(bkeys, on, "left_semi"),
        None, meta=meta)
    import os

    # column names come from the LOGGED schema (O(1) metadata), not a
    # read_table() whose plan would LIST every live file — at 12k+ files
    # that listing alone dominated a small merge (300M-point profile)
    sch = txlog.table_schema(table)
    tgt_cols = [n for n, _t in sch] if sch \
        else txlog.read_table(spark, table).columns
    meta_cols = {"_valid_from", "_valid_to", "_is_current"}
    expected = [c for c in tgt_cols if c not in meta_cols]
    if sorted(expected) != sorted(list(on) + list(attrs)):
        raise ValueError(
            f"scd2 dimension columns {expected} must equal "
            f"on+attrs {sorted(list(on) + list(attrs))}; every "
            f"non-meta column is part of the version identity and "
            f"must be listed")
    s = source.select(*on, *attrs,
                      F.col(effective_col).alias("__eff"))
    tgt = _read(spark, table, touched, meta=meta) if touched else None
    if tgt is not None:
        cur = tgt.filter(F.col("_is_current"))
        probe = cur.select(*on,
                           *[F.col(a).alias(f"__c_{a}") for a in attrs],
                           F.lit(True).alias("__present"))
        j = s.join(F.broadcast(probe) if nkeys <= _BCAST_KEYS
                   else probe, on, "left")
    else:
        j = s.withColumn("__present", F.lit(None).cast("boolean"))
        for a in attrs:
            j = j.withColumn(f"__c_{a}", F.lit(None))
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__c_{a}"))
    news = j.filter(F.col("__present").isNull())
    changed = j.filter(F.col("__present").isNotNull() & differs)

    def open_rows(frame):
        base = frame.select(*on, *attrs, F.col("__eff"))
        return (base.withColumn("_valid_from", F.col("__eff"))
                .withColumn("_valid_to",
                            F.lit(None).cast(
                                base.schema["__eff"].dataType))
                .withColumn("_is_current", F.lit(True))
                .drop("__eff"))

    changed_keys = (changed.select(*on).localCheckpoint(eager=True)
                    if tgt is not None else None)
    changed_cnt = changed_keys.count() if changed_keys is not None else 0
    if changed_cnt == 0:
        # the no-churn contract: identical attribute tuples rewrite
        # NOTHING — at most a pure append of first-version inserts
        inserts = open_rows(news).select(*tgt_cols)
        # staged-first (same collapse as delete()/merge()): the former
        # inserts.isEmpty() probe executed the source-vs-current join a
        # second time; stage the appends once and read the row count
        # from the staged parquet footers (thread-pooled)
        rels = txlog.stage_files(inserts, table)
        if txlog.staged_rows(table, rels) == 0:
            for r in rels:
                pth = os.path.join(table, r)
                if os.path.exists(pth):
                    os.unlink(pth)
            return {"version": txlog.current_version(table),
                    "files_touched": 0, "files_total": len(cand)}
        ver = _rewrite_commit(spark, table, [], inserts, stats_cols,
                              txn=txn, meta=meta, staged=rels)
        return {"version": ver, "files_touched": 0,
                "files_total": len(cand)}
    # narrow the rewrite to files holding CURRENT rows of CHANGED keys
    # (the discovery above spanned ALL source keys — rewriting a file
    # whose matches are all no-ops would be churn for nothing)
    ck = F.broadcast(changed_keys)
    _cand2, touched2 = _touched(
        spark, table,
        lambda d: d.filter(F.col("_is_current"))
                   .join(ck, on, "left_semi"),
        None, meta=meta)
    tgt2 = _read(spark, table, touched2, meta=meta)
    parts: list[DataFrame] = []
    # untouched rows of touched files: history + unchanged currents
    parts.append(tgt2.join(
        ck, on, "left_anti").unionByName(
        tgt2.filter(~F.col("_is_current"))
            .join(ck, on, "left_semi")))
    # closed versions: current rows of changed keys, stamped with the
    # source row's effective time
    closing = (tgt2.filter(F.col("_is_current"))
               .join(ck, on, "left_semi")
               .join(changed.select(*on, "__eff"), on, "inner"))
    parts.append(closing.select(
        *[F.col("__eff").alias("_valid_to")
          if c == "_valid_to"
          else (F.lit(False).alias("_is_current")
                if c == "_is_current" else F.col(c))
          for c in tgt_cols]))
    parts.append(open_rows(changed.unionByName(news)))
    out = parts[0].select(*tgt_cols)
    for p in parts[1:]:
        out = out.unionByName(p.select(*tgt_cols))
    ver = _rewrite_commit(spark, table, touched2, out, stats_cols,
                          txn=txn, meta=meta)
    return {"version": ver, "files_touched": len(touched2),
            "files_total": len(cand)}
