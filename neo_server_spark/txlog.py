"""Minimal transactional table format (Delta-style commit log, zero deps).

The streaming sinks' ``run=/epoch=`` partition convention makes retries
idempotent, but readers must know the convention and half-written files
are only invisible because overwrite rewrites whole directories.  This
module gives the same guarantees Delta Lake builds on — an append-only
JSON commit log as the single source of truth — with nothing but parquet
and atomic filesystem primitives, so it stays dependency-free in this
container while keeping the design 100-TB-shaped (the log bounds
listing: readers never glob the data directory).

Layout::

    table/
      _txlog/00000000000000000001.json   one JSON per committed version
      _txlog/00000000000000000008.checkpoint.json   full live-set snapshot
      data/<uuid>-<k>.parquet            immutable data files

Protocol (mirrors the Delta/Iceberg commit core):

* WRITE: stage part files under ``data/`` with fresh UUID names, then
  publish them with ONE atomic commit-log entry.  A crash before the
  commit leaves invisible garbage, never a torn table.
* COMMIT: ``os.link`` (fails with EEXIST if the version is taken) gives
  atomic put-if-absent; on conflict the writer re-reads the log and
  retries at the next version — optimistic concurrency.
* IDEMPOTENT RETRIES: a commit may carry a ``txn`` (app, epoch) pair —
  the streaming foreachBatch identity.  A replayed epoch finds its pair
  already in the log, discards its staged files, and returns the
  original version: exactly-once without any directory convention
  (Delta's ``txn`` action, Iceberg's snapshot dedupe).
* READ: replay the log — latest checkpoint + tail — into the live file
  set; ``spark.read.parquet(*files)``.  O(commits since checkpoint)
  metadata work, independent of data size.
* CHANGES: files added per version > N — a change-data feed for watch /
  incremental consumers.

Concurrency contract (optimistic, Delta-style; enforced by
``_atomic_commit``'s liveness + DV-drift checks and exercised by the
multi-process stress tests in tests/test_txlog.py):

====================  ========  =========  ==========  ========  ======
first writer \\ racer  append    rewrite*   DV delete   compact   vacuum
====================  ========  =========  ==========  ========  ======
append                ok        ok         ok          ok        ok
rewrite*              ok        conflict＋  conflict＋   conflict＋ ok
DV delete             ok        conflict＋  conflict＋   conflict＋ ok
compact               ok        conflict＋  conflict＋   conflict＋ ok
vacuum                ok        ok         ok          ok        ok
====================  ========  =========  ==========  ========  ======

``rewrite*`` = any read-modify-write over shared files (DML rewrite,
SCD2, compact's materialization).  ``conflict＋`` = only when the two
touch a COMMON file (liveness via must_be_live, deletion-vector drift
via must_match_dvs); disjoint file sets serialize cleanly through the
version race retry.  Vacuum never conflicts: it deletes only files no
committed version references, behind a retention window that protects
in-flight staging, and every reader retries the checkpoint+truncation
race (``_replay``).

Reference parity: the engine's backup manifests (sqlx/backup.py) answer
"what is in this archive"; the txlog answers "what is IN the table right
now" under concurrent appends and retries.
"""

from __future__ import annotations

import errno
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["commit", "write", "read_table", "changes", "row_changes",
           "checkpoint", "clone",
           "live_files", "pruned_files", "compact", "restore", "vacuum",
           "last_txn_version", "current_version", "version_at",
           "stage_files", "table_schema", "history", "describe_detail",
           "TxConflict",
           "SchemaConflict"]

_LOG = "_txlog"
_DATA = "data"
_CDF = "_cdf"
_DV = "_dv"
_W = 20  # zero-padded version width keeps lexical == numeric order
# broadcast the deletion-vector tombstone frame when its DECODED row
# count fits comfortably in every executor — on-disk parquet of two
# highly-compressible columns can decode 50-200x larger, so disk bytes
# is the wrong guard; ~1M (basename, pos) rows hash to well under
# 100 MB.  Above this the anti-join falls back to a shuffle (AQE may
# still pick broadcast from runtime stats).
_DV_BCAST_ROWS = 1_000_000
# compact() auto-materializes (rewrites) any file whose tombstoned-row
# fraction exceeds this, even when it is not otherwise selected — the
# read-amplification cap Delta applies to heavily-deleted DV files
_DV_DENSITY_CAP = 0.20


class TxConflict(RuntimeError):
    """Another writer took the version and retries were exhausted."""


class SchemaConflict(RuntimeError):
    """The write's schema is incompatible with the table's (type change,
    or a new column without ``merge_schema=True``) — Delta's schema
    enforcement."""


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _ver_of(fn: str) -> int:
    return int(fn.split(".")[0])


def _list_log(table: str) -> tuple[int | None, list[str]]:
    """(latest checkpoint version, ordered commit filenames after it)."""
    d = _log_dir(table)
    if not os.path.isdir(d):
        return None, []
    # dot-prefixed names are in-flight staging tmps (.tmp-<hex>) — a
    # writer between dump and link, or a crashed writer's leftover.
    # Listing them would replay an uncommitted entry as committed (torn
    # read) or crash _ver_of, so every log listing excludes dotfiles.
    names = sorted(n for n in os.listdir(d)
                   if n.endswith(".json") and not n.startswith("."))
    cps = [n for n in names if n.endswith(".checkpoint.json")]
    cp_ver = _ver_of(cps[-1]) if cps else None
    tail = [n for n in names if not n.endswith(".checkpoint.json")
            and (cp_ver is None or _ver_of(n) > cp_ver)]
    return cp_ver, tail


def _replay(table: str, as_of: int | None = None
            ) -> tuple[int, set[str], dict[str, int], dict[str, dict],
                       dict]:
    """Race-tolerant wrapper around :func:`_replay_once`: a concurrent
    checkpoint+vacuum may truncate a tail entry BETWEEN our log listing
    and the open() — the entry's effect now lives in a newer checkpoint,
    so the correct response is to re-list and replay again, not crash
    (the multi-process stress tests hit this)."""
    for _ in range(10):
        try:
            return _replay_once(table, as_of)
        except FileNotFoundError:
            continue
    return _replay_once(table, as_of)


def _replay_once(table: str, as_of: int | None = None
                 ) -> tuple[int, set[str], dict[str, int],
                            dict[str, dict], dict]:
    """(current version, live file set, {app:epoch -> version} txn map,
    {file -> column min/max stats}, schema meta).

    Schema meta: ``{"schema": [[name, type], ...] | None,
    "seen": set[json]}`` — the table's current MERGED schema and the
    distinct PHYSICAL file schemas still possibly live (read_table
    unions footers only when len(seen) > 1; a full compaction resets
    the set).

    Metadata cost is O(commits since the last checkpoint): the
    checkpoint snapshot carries the full live set, the txn map, AND the
    stats, so dedupe and data skipping survive compaction.

    ``as_of`` replays only versions <= as_of — time travel (Delta's
    ``versionAsOf``).  Retired data files stay on disk until vacuum()
    ages them out, so any version whose commit entries (or a covering
    checkpoint) survive is reconstructible; a vacuumed-away version
    raises ValueError."""
    cp_ver, tail = _list_log(table)
    if as_of is not None and cp_ver is not None and cp_ver > as_of:
        # the latest checkpoint postdates the target: rebuild from the
        # newest surviving checkpoint <= as_of (or from version 1) using
        # the commit entries vacuum() has not yet truncated
        d = _log_dir(table)
        names = [n for n in os.listdir(d)
                 if n.endswith(".json") and not n.startswith(".")]
        older_cps = sorted(_ver_of(n) for n in names
                           if n.endswith(".checkpoint.json")
                           and _ver_of(n) <= as_of)
        cp_ver = older_cps[-1] if older_cps else None
        floor = cp_ver or 0
        tail = sorted((n for n in names
                       if not n.endswith(".checkpoint.json")
                       and floor < _ver_of(n) <= as_of), key=_ver_of)
        if not tail and cp_ver is None:
            raise ValueError(
                f"version {as_of} of {table} was checkpointed and "
                f"vacuumed; the earliest reconstructible version is "
                f"the latest checkpoint")
        if tail and _ver_of(tail[0]) != floor + 1:
            raise ValueError(
                f"commit entries below version {_ver_of(tail[0])} were "
                f"vacuumed; version {as_of} is not reconstructible")
    live: set[str] = set()
    txns: dict[str, int] = {}
    stats: dict[str, dict] = {}
    meta: dict = {"schema": None, "seen": set(), "dvs": {}}
    ver = 0
    if cp_ver is not None:
        with open(os.path.join(_log_dir(table),
                               f"{cp_ver:0{_W}d}.checkpoint.json")) as f:
            snap = json.load(f)
        live = set(snap["live"])
        txns = dict(snap.get("txns", {}))
        stats = dict(snap.get("stats", {}))
        meta["schema"] = snap.get("schema")
        meta["seen"] = set(snap.get("schemas_seen", []))
        meta["dvs"] = {k: list(v)
                       for k, v in snap.get("dvs", {}).items()}
        ver = cp_ver
    for fn in tail:
        with open(os.path.join(_log_dir(table), fn)) as f:
            entry = json.load(f)
        if as_of is not None and entry["version"] > as_of:
            break
        ver = entry["version"]
        removed = set(entry.get("remove", []))
        live -= removed
        live |= set(entry.get("add", []))
        for rel in removed:
            stats.pop(rel, None)
            meta["dvs"].pop(rel, None)   # a rewrite retires the file's DVs
        for data_rel, dv_rels in entry.get("dv", {}).items():
            meta["dvs"].setdefault(data_rel, []).extend(dv_rels)
        stats.update(entry.get("stats", {}))
        if entry.get("schema"):
            meta["schema"] = entry["schema"]
            fs = json.dumps(entry.get("file_schema") or entry["schema"])
            if entry.get("schemaReset"):
                meta["seen"] = {fs}
            else:
                meta["seen"].add(fs)
        for fs_ in entry.get("schemasSeen", []):
            # a clone of an evolved table carries the source's full
            # physical-schema set so reads keep merging footers
            meta["seen"].add(json.dumps(fs_))
        t = entry.get("txn")
        if t:
            txns[f"{t['app']}:{t['epoch']}"] = ver
    return ver, live, txns, stats, meta


def version_at(table: str, timestamp_ms: int) -> int:
    """Latest version whose commit timestamp is <= ``timestamp_ms``
    (Delta's ``timestampAsOf`` resolution).  Resolved from the commit
    entries still on disk; raises if the timestamp predates the oldest
    surviving entry's version range."""
    d = _log_dir(table)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no txlog at {table}")
    best = None
    oldest_ts = None
    for n in os.listdir(d):
        if not n.endswith(".json") or n.startswith(".") \
                or n.endswith(".checkpoint.json"):
            continue
        with open(os.path.join(d, n)) as f:
            entry = json.load(f)
        ts = entry.get("ts", 0)
        oldest_ts = ts if oldest_ts is None else min(oldest_ts, ts)
        if ts <= timestamp_ms:
            v = entry["version"]
            best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(
            f"no commit at or before ts={timestamp_ms} survives in the "
            f"log (oldest surviving commit ts={oldest_ts})")
    return best


def live_files(table: str, as_of: int | None = None) -> list[str]:
    """Committed data files (relative paths), sorted.  ``as_of`` lists
    the live set at that historical version (time travel)."""
    return sorted(_replay(table, as_of=as_of)[1])


def current_version(table: str) -> int:
    """Latest committed version (0 for an empty log)."""
    return _replay(table)[0]


def latest_version(table: str) -> int:
    """Latest committed version from ONE log listing — no entry reads,
    no replay.  Equivalent to :func:`current_version` (the version is
    carried in the entry filename) at a fraction of the cost; the cheap
    probe cache keys want (e.g. the rollup router's stored-layout cache
    checks it per routed query)."""
    cp_ver, tail = _list_log(table)
    if tail:
        return _ver_of(tail[-1])
    return cp_ver or 0


def last_txn_version(table: str, app: str, epoch: int) -> int | None:
    """Version that committed (app, epoch), or None — the idempotence
    probe foreachBatch retries use."""
    return _replay(table)[2].get(f"{app}:{epoch}")


def _atomic_commit(table: str, entry: dict, retries: int = 20,
                   overwrite: bool = False,
                   must_be_live: list[str] | None = None,
                   must_match_dvs: dict[str, list[str]] | None = None,
                   evolve_from: tuple | None = None) -> int:
    """Put-if-absent the next version; optimistic retry on conflict.

    ``overwrite=True`` recomputes the remove set from a FRESH replay on
    every attempt: if this commit loses the version race to a concurrent
    append, the retry must retire the racer's files too — a stale,
    pre-race remove set would leave them live after the "overwrite".

    ``must_be_live`` is Delta-style WRITE-CONFLICT detection for
    read-modify-write commits (DML, dml.py): the listed files are the
    snapshot the rewrite was computed FROM; if any of them is no longer
    live when the commit attempts (a concurrent compact/overwrite/DML
    retired it), the rewrite is stale and blindly committing it would
    resurrect deleted rows or drop concurrent ones — raise TxConflict
    so the caller re-reads and recomputes instead.

    ``must_match_dvs`` extends the conflict check to DELETION-VECTOR
    state: a DV delete leaves its target file LIVE, so liveness alone
    would let a rewrite computed from a pre-DV snapshot commit and
    RESURRECT the tombstoned rows (replay also pops a file's DVs on
    remove).  The map records {file -> tombstone rels} as of the
    snapshot the rewrite read; any drift raises TxConflict."""
    d = _log_dir(table)
    os.makedirs(d, exist_ok=True)
    for _ in range(retries):
        cur, live, _txns, _stats, _meta = _replay(table)
        if evolve_from is not None:
            # schema is re-merged against the FRESH replay on every
            # attempt: losing the version race to a concurrent schema
            # evolution must not clobber the racer's new column with a
            # stale merge (SchemaConflict propagates, never retries)
            entry["schema"] = _evolve_schema(
                _meta["schema"], evolve_from[0], evolve_from[1])
        if must_be_live is not None:
            gone = [rel for rel in must_be_live if rel not in live]
            if gone:
                raise TxConflict(
                    f"write conflict: {len(gone)} file(s) this rewrite "
                    f"was computed from were retired concurrently "
                    f"(e.g. {gone[0]}); recompute from a fresh snapshot")
        if must_match_dvs is not None:
            drift = [rel for rel, snap in must_match_dvs.items()
                     if sorted(_meta["dvs"].get(rel, [])) != sorted(snap)]
            if drift:
                raise TxConflict(
                    f"write conflict: deletion-vector state of "
                    f"{len(drift)} file(s) changed since this rewrite's "
                    f"snapshot (e.g. {drift[0]}); committing would "
                    f"resurrect concurrently-tombstoned rows — "
                    f"recompute from a fresh snapshot")
        ver = cur + 1
        entry["version"] = ver
        if overwrite:
            entry["remove"] = sorted(live)
        # stage with a dot-prefixed, non-.json name so no log listing
        # can ever observe the uncommitted entry
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        final = os.path.join(d, f"{ver:0{_W}d}.json")
        try:
            os.link(tmp, final)     # atomic, EEXIST when version is taken
            os.unlink(tmp)
            return ver
        except FileExistsError:
            os.unlink(tmp)          # lost the race: re-read log, retry
    raise TxConflict(f"gave up after {retries} version conflicts")


def _file_stats(table: str, rels: list[str],
                stats_cols: list[str]) -> dict[str, dict]:
    """Per-file [min, max] for ``stats_cols`` from the parquet FOOTERS
    (row-group statistics — no data read).  The commit log carries them
    so reads can skip whole files on a range predicate: Delta/Iceberg
    data skipping, file-listing-free and O(live files) cheap."""
    import pyarrow.parquet as pq

    def _st(rel: str) -> dict:
        md = pq.ParquetFile(os.path.join(table, rel)).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        st: dict[str, list] = {}
        for c in stats_cols:
            i = names.get(c)
            if i is None:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(i).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                st[c] = [lo, hi]
        return st

    return {rel: st
            for rel, st in zip(rels, _pmap_meta(_st, rels)) if st}


def table_schema(table: str) -> list[list[str]] | None:
    """The table's current merged schema as ``[[name, type], ...]``
    (None for pre-schema-tracking tables)."""
    return _replay(table)[4]["schema"]


def _df_schema(df: DataFrame) -> list[list[str]]:
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _evolve_schema(cur: list[list[str]] | None, new: list[list[str]],
                   merge_schema: bool) -> list[list[str]]:
    """Schema enforcement + evolution (Delta semantics): same-name
    columns must keep their type; columns the table has but the write
    lacks are fine (readers fill nulls); NEW columns are appended to
    the merged schema only under ``merge_schema=True``."""
    if cur is None:
        return new
    cur_types = {n: t for n, t in cur}
    added = []
    for n, t in new:
        if n in cur_types:
            if cur_types[n] != t:
                raise SchemaConflict(
                    f"column {n!r} is {cur_types[n]} in the table but "
                    f"{t} in the write; cast it or overwrite the table")
        else:
            added.append([n, t])
    if added and not merge_schema:
        raise SchemaConflict(
            f"write adds column(s) {[n for n, _ in added]} not in the "
            f"table schema; pass merge_schema=True to evolve")
    return [list(c) for c in cur] + added


def commit(table: str, add: list[str], mode: str = "append",
           txn: tuple[str, int] | None = None,
           stats: dict[str, dict] | None = None,
           data_change: bool = True,
           remove: list[str] | None = None,
           must_be_live: list[str] | None = None,
           must_match_dvs: dict[str, list[str]] | None = None,
           schema: list[list[str]] | None = None,
           file_schema: list[list[str]] | None = None,
           schema_reset: bool = False,
           cdf: list[str] | None = None,
           dv: dict[str, list[str]] | None = None,
           evolve_from: tuple | None = None,
           dml: bool = False) -> int:
    """Publish staged files.  mode='append' adds; mode='overwrite'
    removes the current live set in the same atomic entry; ``remove``
    names an explicit file set to retire (compaction).  Returns the
    committed version; if ``txn`` was already committed, discards
    ``add`` and returns the original version (idempotent replay).
    ``data_change=False`` marks a file-reorganization commit (compaction)
    that CDF consumers must not re-emit."""
    if txn is not None:
        prior = last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            staged = list(add) + list(cdf or []) + \
                [d for lst in (dv or {}).values() for d in lst]
            for rel in staged:
                p = os.path.join(table, rel)
                if os.path.exists(p):
                    os.unlink(p)
            return prior
    entry: dict = {"add": sorted(add), "ts": int(time.time() * 1000)}
    if txn is not None:
        entry["txn"] = {"app": txn[0], "epoch": int(txn[1])}
    if stats:
        entry["stats"] = stats
    if not data_change:
        entry["dataChange"] = False
    if schema:
        entry["schema"] = schema
        if file_schema and (file_schema != schema
                            or evolve_from is not None):
            # under evolve_from the merged schema is recomputed per
            # retry attempt, so the physical file schema must always be
            # recorded explicitly — the two can diverge on a lost race
            entry["file_schema"] = file_schema
        if schema_reset:
            entry["schemaReset"] = True
    if cdf:
        # row-level change files (Delta CDF): written by the DML that
        # KNOWS exactly which rows changed, referenced by the commit so
        # row_changes() can serve precise +/- deltas
        entry["cdf"] = sorted(cdf)
    if dv:
        # deletion vectors: {data file -> [tombstone files]} — the rows
        # named by the tombstones are DELETED without rewriting the
        # data file (Delta's DV shape); readers anti-join them
        entry["dv"] = {k: sorted(v) for k, v in dv.items()}
    if dml:
        # marks a read-modify-write rewrite whose "add" files carry the
        # SURVIVORS of previously-emitted rows — the file-level feed
        # must refuse it (overwrite/restore adds are genuinely new-to-
        # the-feed files and keep the old emit semantics)
        entry["dml"] = True
    if mode == "overwrite":
        # remove set is computed INSIDE the retry loop from a fresh
        # replay, so a lost version race still retires the racer's files
        return _atomic_commit(table, entry, overwrite=True)
    if remove:
        entry["remove"] = sorted(remove)
    elif mode != "append":
        raise ValueError(f"unknown mode {mode!r}")
    return _atomic_commit(table, entry, must_be_live=must_be_live,
                          must_match_dvs=must_match_dvs,
                          evolve_from=evolve_from)


def write(df: DataFrame, table: str, mode: str = "append",
          txn: tuple[str, int] | None = None,
          stats_cols: list[str] | None = None,
          merge_schema: bool = False) -> int:
    """Stage ``df`` as immutable parquet files under ``data/`` and commit
    them atomically.  Exactly-once when ``txn=(app, epoch)`` identifies
    the logical batch: a foreachBatch retry replays into a no-op.

    Schema enforcement (Delta semantics): an append whose column types
    conflict with the table's raises SchemaConflict; NEW columns are
    rejected unless ``merge_schema=True``, which evolves the table
    schema (old files' missing columns read as NULL).  An overwrite
    replaces the schema outright.  The check is against the COMMIT LOG
    (zero file reads) and the evolved schema rides in the commit entry.

    A pre-commit txn probe skips the WRITE too on replay (cheap), but
    correctness only needs the commit-time check — two racing attempts
    of the same epoch both stage, one commits, the loser's files are
    unlinked by its own commit() call."""
    if txn is not None and last_txn_version(table, txn[0], txn[1]) is not None:
        return last_txn_version(table, txn[0], txn[1])
    new_schema = _df_schema(df)
    if mode == "overwrite":
        merged = new_schema
        evolve = None
    else:
        # pre-check fails fast BEFORE the (expensive) staging write; the
        # commit re-merges against a fresh replay on every retry so a
        # concurrent evolution is never clobbered
        merged = _evolve_schema(table_schema(table), new_schema,
                                merge_schema)
        evolve = (new_schema, merge_schema)
    rels = stage_files(df, table)
    stats = _file_stats(table, rels, stats_cols) if stats_cols else None
    return commit(table, rels, mode=mode, txn=txn, stats=stats,
                  schema=merged, file_schema=new_schema,
                  schema_reset=(mode == "overwrite"),
                  evolve_from=evolve)


def stage_files(df: DataFrame, table: str,
                subdir: str = _DATA) -> list[str]:
    """Write ``df`` as fresh immutable UUID-named parquet files under
    ``subdir/`` WITHOUT committing them — invisible to every reader
    until a commit() publishes the returned relative paths.  A crash
    here leaves garbage for vacuum(), never a torn table."""
    os.makedirs(os.path.join(table, subdir), exist_ok=True)
    stage = os.path.join(table, subdir, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    rels = []
    tag = uuid.uuid4().hex
    for k, fn in enumerate(sorted(os.listdir(stage))):
        if not fn.endswith(".parquet"):
            continue
        rel = f"{subdir}/{tag}-{k}.parquet"
        os.rename(os.path.join(stage, fn), os.path.join(table, rel))
        rels.append(rel)
    shutil.rmtree(stage, ignore_errors=True)
    return rels


def pruned_files(table: str, prune: dict[str, tuple] | None,
                 as_of: int | None = None) -> list[str]:
    """Live files whose footer stats intersect every ``{col: (lo, hi)}``
    range (None bound = open).  Files without recorded stats for a
    pruning column are conservatively kept."""
    _ver, live, _txns, stats, _meta = _replay(table, as_of=as_of)
    if not prune:
        return sorted(live)
    out = []
    for rel in sorted(live):
        st = stats.get(rel, {})
        keep = True
        for col, (lo, hi) in prune.items():
            if col not in st:
                continue
            fmin, fmax = st[col]
            if (hi is not None and fmin > hi) or \
                    (lo is not None and fmax < lo):
                keep = False
                break
        if keep:
            out.append(rel)
    return out


def _pmap_meta(fn, items, threads: int = 16) -> list:
    """Driver-side parquet-footer metadata reads, in parallel, order
    preserved.

    A wide rewrite can stage THOUSANDS of files; a serial per-file
    footer loop serializes O(files) metadata opens on the driver (guide
    §5 — the driver should do almost no data work, and what it must do
    should not run single-threaded).  Footer opens are I/O-bound (a few
    ms locally, tens on object stores), so a small thread pool gives
    near-linear speedup; at a handful of files the pool setup is not
    worth it and the loop stays serial."""
    items = list(items)
    if len(items) <= 4:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(threads, len(items))) as ex:
        return list(ex.map(fn, items))


def staged_rows(table: str, rels: list[str]) -> int:
    """Total row count of just-staged files from their parquet footers
    (driver metadata, zero jobs) — the staged-first DML/matview
    collapse reads survivor counts from here.  The files were staged by
    the caller moments ago, so a missing file is a real error, not a
    vacuum race."""
    import pyarrow.parquet as pq

    def _n(rel: str) -> int:
        return pq.ParquetFile(os.path.join(table, rel)).metadata.num_rows

    return sum(_pmap_meta(_n, rels))


def _dv_tomb_rows(dv_paths: list[str]) -> int | None:
    """DECODED tombstone row count from parquet footers (metadata-only,
    no column IO) — the broadcast/compaction guards key on this, not on
    compressed disk bytes.  None when any file is missing (concurrently
    vacuumed under a time-travel reader): callers treat that as
    'unknown, do not hint' and let the actual read raise."""
    import pyarrow.parquet as pq

    def _n(p: str) -> int | None:
        try:
            return pq.ParquetFile(p).metadata.num_rows
        except (FileNotFoundError, OSError):
            return None

    counts = _pmap_meta(_n, dv_paths)
    if any(c is None for c in counts):
        return None
    return sum(counts)


def read_files(spark: SparkSession, table: str, rels: list[str],
               dvs: dict[str, list[str]] | None = None,
               with_file: bool = False,
               with_pos: bool = False,
               merge_schema: bool = False) -> DataFrame:
    """Read specific data files of a txlog table with their deletion
    vectors applied: files named in ``dvs`` anti-join their tombstone
    rows on (file basename, parquet row index) — Delta's DV read path —
    while files without DVs read untouched (no metadata columns, no
    join).  ``with_file`` keeps a ``__file`` column (absolute path) for
    touched-file discovery; ``with_pos`` keeps ``__f``/``__pos`` (file
    basename, row index) so a DV-writing DML can name the rows it
    deletes."""
    dvs = {k: v for k, v in (dvs or {}).items() if k in set(rels)}
    plain = [r for r in rels if r not in dvs]
    frames = []

    def _rd(paths, pos):
        rd = spark.read
        if merge_schema:
            rd = rd.option("mergeSchema", "true")
        df = rd.parquet(*paths)
        if pos:
            df = (df.withColumn("__f", F.col("_metadata.file_name"))
                  .withColumn("__pos", F.col("_metadata.row_index")))
        if with_file:
            df = df.withColumn("__file", F.input_file_name())
        return df

    if plain:
        frames.append(_rd([os.path.join(table, r) for r in plain],
                          with_pos))
    if dvs:
        dv_rels = sorted({d for lst in dvs.values() for d in lst})
        dv_paths = [os.path.join(table, d) for d in dv_rels]
        tomb = (spark.read.parquet(*dv_paths)
                .select(F.col("__f"), F.col("__pos")).distinct())
        # tombstones are O(matched rows) and normally tiny — broadcast
        # them EXPLICITLY (don't rely on AQE noticing) so the anti-join
        # never shuffles the DV'd files' rows; the decoded-row guard
        # keeps a pathological DV accumulation from OOMing the
        # executors (compact()'s density cap rewrites such files away
        # anyway).  A None probe means a DV file vanished under a
        # time-travel reader (concurrent vacuum) — skip the broadcast
        # hint and let the actual read surface the error.
        rows = _dv_tomb_rows(dv_paths)
        if rows is not None and rows <= _DV_BCAST_ROWS:
            tomb = F.broadcast(tomb)
        df = _rd([os.path.join(table, r) for r in dvs], True)
        df = df.join(tomb, ["__f", "__pos"], "left_anti")
        if not with_pos:
            df = df.drop("__f", "__pos")
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no files to read in {table}")
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_, allowMissingColumns=merge_schema)
    return out


def read_live(spark: SparkSession, table: str, rels: list[str],
              meta: dict, with_file: bool = False,
              with_pos: bool = False) -> DataFrame:
    """DV-aware AND schema-evolution-aware read of specific live files —
    the ONE read shape read_table, compact() and the DML layer share:
    when >1 physical file schema may be live (``meta['seen']``), union
    footers (mergeSchema) and project to the logged canonical schema;
    metadata columns requested via ``with_file``/``with_pos`` ride
    through the projection."""
    evolved = len(meta["seen"]) > 1
    df = read_files(spark, table, rels, dvs=meta["dvs"],
                    with_file=with_file, with_pos=with_pos,
                    merge_schema=evolved)
    if evolved:
        # canonical columns ABSENT from every file in this subset (a
        # rel list of pre-evolution files only) project as typed NULLs
        # — mergeSchema can only union the schemas it actually read
        keep = [F.col(n) if n in df.columns
                else F.lit(None).cast(t).alias(n)
                for n, t in meta["schema"]]
        extras = [c for c in ("__file", "__f", "__pos")
                  if c in df.columns]
        df = df.select(*keep, *extras)
    return df


def dv_snapshot(meta: dict, rels: list[str]) -> dict[str, list[str]]:
    """{file -> tombstone rels as of ``meta``'s snapshot} for the files
    a rewrite will retire — pass as ``must_match_dvs`` so the commit
    raises TxConflict if any drifted (a concurrent DV delete whose
    tombstones the rewrite would otherwise resurrect)."""
    return {rel: sorted(meta["dvs"].get(rel, [])) for rel in rels}


def read_table(spark: SparkSession, table: str,
               prune: dict[str, tuple] | None = None,
               version_as_of: int | None = None,
               timestamp_as_of_ms: int | None = None) -> DataFrame:
    """Snapshot read of the committed live set — staged/orphaned files
    under data/ are invisible by construction.  ``prune={col: (lo, hi)}``
    skips files whose logged min/max cannot intersect the range (data
    skipping off the COMMIT LOG — zero footer reads at query time); the
    caller still applies its exact filter, pruning only shrinks the
    scan.

    ``version_as_of`` / ``timestamp_as_of_ms`` read the table AS OF a
    historical version (Delta time travel): the live set is replayed up
    to that version and, because retired files stay on disk until
    vacuum() ages them out, the old snapshot is served from the same
    immutable files the current one shares — zero copies."""
    if timestamp_as_of_ms is not None:
        if version_as_of is not None:
            raise ValueError("pass version_as_of OR timestamp_as_of_ms")
        version_as_of = version_at(table, timestamp_as_of_ms)
    meta = _replay(table, as_of=version_as_of)[4]
    rels = pruned_files(table, prune, as_of=version_as_of)
    if not rels:
        if not live_files(table, as_of=version_as_of):
            raise FileNotFoundError(f"empty txlog table: {table}")
        # everything pruned: empty frame with the table's schema
        any_file = os.path.join(table,
                                live_files(table, as_of=version_as_of)[0])
        return spark.read.parquet(any_file).limit(0)
    # files with deletion vectors anti-join their tombstones; plain
    # files (the common case) read direct with zero extra work.
    # Evolved tables project the footer union to the log's canonical
    # column order (absent columns read as NULL); homogeneous tables
    # (any table after a full compaction resets the seen-set) skip the
    # mergeSchema footer reads entirely.
    return read_live(spark, table, rels, meta)


def restore(table: str, version: int) -> int:
    """Roll the table back to ``version`` (Delta RESTORE): ONE
    metadata-only commit whose live set is the historical snapshot's —
    the old files are still on disk until vacuum() ages them out, so
    nothing is copied and the restore itself is O(files) log work.
    The rolled-back history stays in the log (a restore of a restore
    works, and time travel ABOVE the restored version still serves the
    undone states).  Raises if the target version was vacuumed away.

    Caveat (same as Delta): the restore commit re-adds files whose rows
    CDF consumers may have already seen — appends-only consumers
    (changes()/row_changes()) should re-read the snapshot after a
    restore instead of folding the feed across it."""
    cur, cur_live, _txns, _stats, _meta = _replay(table)
    _ver, old_live, _t2, old_stats, old_meta = _replay(table,
                                                      as_of=version)
    add = old_live - cur_live
    remove = cur_live - old_live
    # files whose DELETION-VECTOR state differs between now and the
    # target snapshot: remove + re-add the file in the same entry —
    # replay clears its DV list on remove, then the entry's "dv" field
    # reinstates the target state
    cur_dvs = _meta["dvs"]
    old_dvs = old_meta["dvs"]
    dv_diff = {f for f in (old_live & cur_live)
               if sorted(cur_dvs.get(f, [])) != sorted(old_dvs.get(f, []))}
    add |= dv_diff
    remove |= dv_diff
    entry: dict = {"add": sorted(add),
                   "remove": sorted(remove),
                   "ts": int(time.time() * 1000),
                   "restore_of": version}
    restored_dvs = {f: old_dvs[f] for f in old_live
                    if old_dvs.get(f) and (f in add or f in dv_diff)}
    if restored_dvs:
        entry["dv"] = {k: sorted(v) for k, v in restored_dvs.items()}
    if old_stats:
        entry["stats"] = {rel: old_stats[rel]
                          for rel in old_live if rel in old_stats}
    if old_meta["schema"]:
        entry["schema"] = old_meta["schema"]
    # conflict detection: if a concurrent writer retires any file we
    # a surviving COMMIT ENTRY does not imply a surviving DATA file:
    # vacuum() may have aged the retired files out while keep_log_from
    # preserved the log — re-adding a vacuumed-away file would commit a
    # live set the reader cannot serve.  Check disk before committing.
    needed = sorted(add) + [d for lst in restored_dvs.values()
                            for d in lst]
    vacuumed = [rel for rel in needed
                if not os.path.exists(os.path.join(table, rel))]
    if vacuumed:
        raise FileNotFoundError(
            f"cannot restore {table} to version {version}: "
            f"{len(vacuumed)} required data/DV file(s) were vacuumed "
            f"away (e.g. {vacuumed[0]})")
    # plan to keep, the restore's snapshot arithmetic is stale
    return _atomic_commit(table, entry,
                          must_be_live=sorted(cur_live & old_live))


def _dv_dense_files(table: str, meta: dict) -> list[str]:
    """Live files whose TOMBSTONED-ROW fraction exceeds
    ``_DV_DENSITY_CAP`` — compact() materializes these even when not
    otherwise selected.  Driver-side pyarrow work bounded by the DV
    bytes themselves (tombstones are O(matched rows) by construction;
    a DV set too big to count cheaply is by definition over the cap)."""
    dvs = meta["dvs"]
    if not dvs:
        return []
    import pyarrow as pa
    import pyarrow.parquet as pq

    dv_rels = sorted({d for lst in dvs.values() for d in lst})
    dv_paths = [os.path.join(table, d) for d in dv_rels
                if os.path.exists(os.path.join(table, d))]
    if not dv_paths:
        return []
    rows = _dv_tomb_rows(dv_paths)
    if rows is None or rows > 64 * _DV_BCAST_ROWS:
        return sorted(dvs)          # clearly heavy: rewrite them all
    # dedupe (duplicate tombstones across DV files are legal) then
    # count per file — both as Arrow group_bys, never a Python loop
    # over decoded tuples (a dense DV decodes to tens of millions of
    # rows; only the O(distinct files) result crosses into Python)
    tomb = pa.concat_tables(
        [pq.read_table(p, columns=["__f", "__pos"]) for p in dv_paths])
    uniq = tomb.group_by(["__f", "__pos"]).aggregate([])
    per_file = uniq.group_by("__f").aggregate([("__pos", "count")])
    counts = dict(zip(per_file.column("__f").to_pylist(),
                      per_file.column("__pos_count").to_pylist()))
    out = []
    for rel in dvs:
        n = counts.get(rel.rsplit("/", 1)[-1], 0)
        if not n:
            continue
        total = pq.ParquetFile(
            os.path.join(table, rel)).metadata.num_rows
        if total and n / total > _DV_DENSITY_CAP:
            out.append(rel)
    return sorted(out)


def compact(spark: SparkSession, table: str,
            target_files: int = 1,
            stats_cols: list[str] | None = None,
            zorder_by: list[str] | None = None,
            prune: dict[str, tuple] | None = None) -> int:
    """Rewrite the live set into ``target_files`` larger files in ONE
    atomic commit (remove old + add new), marked ``dataChange=False`` so
    CDF consumers do not re-emit the rows — the OPTIMIZE half of the
    small-files story (the streaming sink accretes one file set per
    epoch; compaction resets the file count without touching
    readers/writers in flight: they read the snapshot they started
    with).

    ``zorder_by`` clusters the rewrite on a Morton interleave of those
    columns (operators/zorder.py) so the logged footer stats become
    tight on EVERY listed column — multi-dimensional data skipping for
    ``read_table(prune=...)``, Delta's OPTIMIZE ZORDER shape."""
    # ``prune`` compacts only the stat-intersecting subset — the 100-TB
    # maintenance shape (compact ONE closed day/tag range, never the
    # table); without it the whole live set rewrites
    old = pruned_files(table, prune)
    cur_ver, live, _txns, _stats, meta = _replay(table)
    # DV density cap: any live file whose tombstoned-row fraction
    # exceeds _DV_DENSITY_CAP is force-included in the rewrite even if
    # pruning skipped it — accumulated deletion vectors are read
    # amplification on every scan, and materializing the delete resets
    # the file's DV list (Delta's OPTIMIZE does the same)
    if meta["dvs"]:
        dense = [f for f in _dv_dense_files(table, meta) if f in live]
        old = sorted(set(old) | set(dense))
    partial = len(old) < len(live)
    if not old:
        return cur_ver
    # evolved (heterogeneous-schema) live sets union footers and
    # project to the canonical schema; the rewrite homogenizes every
    # file to the merged schema, so a FULL compaction RESETS the
    # seen-schema set and later reads skip mergeSchema again (a partial
    # one leaves untouched files as-is)
    df = read_live(spark, table, old, meta)
    if zorder_by:
        from neo_server_spark.operators.zorder import zorder_frame

        out = zorder_frame(df, zorder_by, target_files=max(1, target_files))
    else:
        out = df.coalesce(max(1, target_files))
    rels = stage_files(out, table)
    stats = _file_stats(table, rels, stats_cols) if stats_cols else None
    # the retired files stay on DISK: a reader that resolved its file
    # list from a pre-compaction snapshot finishes its scan untouched
    # (Delta defers physical deletion to VACUUM's retention window);
    # vacuum() removes them once they age past retention.
    # must_match_dvs: a concurrent DV delete landing after this
    # rewrite's read would otherwise be LOST (remove pops the file's
    # DVs and the rewrite carries the rows it tombstoned)
    return commit(table, rels, remove=old, stats=stats, data_change=False,
                  schema=_df_schema(out), schema_reset=not partial,
                  must_be_live=old,
                  must_match_dvs=dv_snapshot(meta, old))


def changes(spark: SparkSession, table: str,
            since_version: int,
            until_version: int | None = None
            ) -> tuple[int, DataFrame | None]:
    """(current version, rows ADDED after ``since_version``) — the
    change-data feed incremental consumers / watch poll on.  None when
    nothing changed.  ``dataChange=False`` commits (compaction
    rewrites) are skipped; ``until_version`` bounds the range so a
    consumer can pin its cursor before commits that land mid-fold.

    APPEND-ONLY contract: a commit in the range that REMOVED rows
    (rewrite-DML, overwrite, deletion vectors) raises — a rewrite's
    "add" files carry the surviving rows of rows already emitted, so
    blindly folding them would silently double-count (the failure the
    row-level feed, ``row_changes``, exists to serve precisely)."""
    cur, _live, _txns, _stats, _meta = _replay(table)
    if until_version is not None:
        cur = min(cur, until_version)
    if cur <= since_version:
        return cur, None
    cp_ver, tail = _list_log(table)
    added: list[str] = []
    scan = tail
    if cp_ver is not None and cp_ver > since_version:
        # part of the range predates the checkpoint: the commit entries
        # are still on disk until vacuum() truncates them, so read them
        # directly; only a vacuumed-away range is unrecoverable
        d = _log_dir(table)
        pre = sorted(n for n in os.listdir(d)
                     if n.endswith(".json")
                     and not n.startswith(".")
                     and not n.endswith(".checkpoint.json")
                     and since_version < _ver_of(n) <= cp_ver)
        if not pre or _ver_of(pre[0]) != since_version + 1:
            raise ValueError(
                f"versions <= {cp_ver} were checkpointed and vacuumed; "
                f"re-read the snapshot instead of "
                f"changes({since_version})")
        scan = pre + tail
    for fn in scan:
        try:
            with open(os.path.join(_log_dir(table), fn)) as f:
                entry = json.load(f)
        except FileNotFoundError:
            # concurrent checkpoint+vacuum truncated this entry between
            # our listing and the open — same contract as finding the
            # range already truncated
            raise ValueError(
                f"commit entry {fn} was vacuumed concurrently; re-read "
                f"the snapshot instead of changes({since_version})")
        if entry["version"] > cur:
            continue
        if entry["version"] > since_version \
                and entry.get("dataChange", True):
            if entry.get("dml") or entry.get("dv") or entry.get("remove"):
                # ANY row-removing commit breaks the append-only
                # contract: a DML rewrite's add-files carry SURVIVORS
                # of rows this feed already emitted, and an overwrite/
                # restore's add-files replace rows the consumer keeps —
                # folding either as plain inserts double-counts.
                raise ValueError(
                    f"version {entry['version']} removed rows "
                    f"(DML/deletion-vector/overwrite/restore); folding "
                    f"its add-files as inserts would double-count.  "
                    f"Use row_changes() (DML with cdf=True) or re-read "
                    f"the snapshot")
            added.extend(entry.get("add", []))
    files = [os.path.join(table, rel) for rel in added]
    if not files:
        return cur, None
    if len(_meta["seen"]) > 1:
        # evolved table: the polled range may span schema versions —
        # union footers and project to the canonical column order so
        # CDF consumers always see the merged schema.  A range whose
        # files ALL predate an evolution lacks the evolved columns
        # physically: project them as typed NULLs (same machinery as
        # read_live) instead of failing the select
        df = spark.read.option("mergeSchema", "true").parquet(*files)
        keep = [F.col(n) if n in df.columns
                else F.lit(None).cast(t).alias(n)
                for n, t in _meta["schema"]]
        return cur, df.select(*keep)
    return cur, spark.read.parquet(*files)


def _iter_entries(table: str, since_version: int) -> list[dict]:
    """Commit entries with version > since_version, oldest first,
    reading pre-checkpoint entries straight from disk while vacuum()
    has not truncated them (same recovery rule as changes())."""
    cp_ver, tail = _list_log(table)
    scan = list(tail)
    if cp_ver is not None and cp_ver > since_version:
        d = _log_dir(table)
        pre = sorted((n for n in os.listdir(d)
                      if n.endswith(".json")
                      and not n.startswith(".")
                      and not n.endswith(".checkpoint.json")
                      and since_version < _ver_of(n) <= cp_ver),
                     key=_ver_of)
        if not pre or _ver_of(pre[0]) != since_version + 1:
            raise ValueError(
                f"versions <= {cp_ver} were checkpointed and vacuumed; "
                f"re-read the snapshot instead of polling from "
                f"{since_version}")
        scan = pre + scan
    out = []
    for fn in scan:
        try:
            with open(os.path.join(_log_dir(table), fn)) as f:
                entry = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"commit entry {fn} was vacuumed concurrently; re-read "
                f"the snapshot instead of polling from {since_version}")
        if entry["version"] > since_version:
            out.append(entry)
    return out


def row_changes(spark: SparkSession, table: str, since_version: int,
                until_version: int | None = None
                ) -> tuple[int, DataFrame | None]:
    """Row-level change feed (Delta CDF shape): every row changed after
    ``since_version`` with ``_change_type`` in {insert, delete,
    update_preimage, update_postimage} and ``_commit_version``.

    Pure appends emit their added files as inserts (no extra storage —
    the data files ARE the change).  DML commits emit the change files
    the statement wrote at execution time (``dml.delete/update/merge``
    with ``cdf=True``).  A row-removing commit WITHOUT recorded change
    files cannot be served precisely and raises — re-read the snapshot
    (same contract as Delta's table_changes over a non-CDF commit).
    ``dataChange=False`` reorganizations are invisible."""
    cur = _replay(table)[0]
    if until_version is not None:
        cur = min(cur, until_version)
    if cur <= since_version:
        return cur, None
    parts: list[tuple[list[str], str | None, int]] = []
    for entry in _iter_entries(table, since_version):
        if not entry.get("dataChange", True):
            continue
        ver = entry["version"]
        if ver > cur:
            continue
        if entry.get("cdf"):
            parts.append((entry["cdf"], None, ver))
        elif entry.get("remove") or entry.get("dv"):
            raise ValueError(
                f"version {ver} removed rows without change files; "
                f"run the DML with cdf=True or re-read the snapshot")
        elif entry.get("add"):
            parts.append((entry["add"], "insert", ver))
    frames = []
    for rels, ctype, ver in parts:
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(table, r) for r in rels])
        if ctype is not None:
            df = df.withColumn("_change_type", F.lit(ctype))
        frames.append(df.withColumn("_commit_version",
                                    F.lit(ver).cast("long")))
    if not frames:
        return cur, None
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_, allowMissingColumns=True)
    return cur, out



def _unlink_quiet(path: str) -> bool:
    """Unlink tolerating a concurrent cleaner having won the race —
    two vacuums may both elect the same orphan (the multi-process
    stress test hits this); losing the unlink is success."""
    try:
        os.unlink(path)
        return True
    except FileNotFoundError:
        return False


DEFAULT_RETENTION_S = 24 * 3600.0


def vacuum(table: str, keep_log_from: int | None = None,
           retention_s: float = DEFAULT_RETENTION_S) -> dict:
    """Garbage-collect the physical table: delete data files that no
    committed version references (staging leftovers from crashed
    writers, files retired by overwrite/compact) and, when a checkpoint
    exists, truncate commit entries at or before it (their effect lives
    in the snapshot; ``keep_log_from`` retains entries >= that version
    for CDF consumers with older cursors).  Returns counts.

    Safety: only files under data/ absent from the LIVE set AND older
    than ``retention_s`` are removed (Delta's retention window).  The
    age guard is what makes vacuum safe under CONCURRENT writers:
    write() renames staged files into data/ *before* its commit
    publishes them, so a zero-retention vacuum between the rename and
    the commit would delete the files of a commit that then succeeds —
    a torn table.  With retention, an in-flight writer younger than the
    window is untouched.  ``retention_s=0`` is therefore OFFLINE-ONLY:
    call it only when no writer can be mid-commit (tests, single-writer
    maintenance).  Log truncation never crosses the latest checkpoint —
    a reader of any current snapshot observes nothing."""
    _ver, live, _txns, _stats, _meta = _replay(table)
    removed_files = 0
    now = time.time()
    ddir = os.path.join(table, _DATA)
    if os.path.isdir(ddir):
        for fn in os.listdir(ddir):
            rel = f"{_DATA}/{fn}"
            full = os.path.join(ddir, fn)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue                    # raced another cleaner
            if age < retention_s:
                continue                    # possibly an in-flight commit
            if os.path.isdir(full):        # abandoned staging dir
                shutil.rmtree(full, ignore_errors=True)
                removed_files += 1
            elif rel not in live:
                removed_files += _unlink_quiet(full)
    dvdir = os.path.join(table, _DV)
    if os.path.isdir(dvdir):
        # tombstone files referenced by the LIVE dv map stay; orphans
        # (retired by rewrites/compaction, crashed DML staging) age out
        live_dvs: set[str] = set()
        for lst in _meta["dvs"].values():
            live_dvs.update(lst)
        for fn in os.listdir(dvdir):
            rel = f"{_DV}/{fn}"
            full = os.path.join(dvdir, fn)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age < retention_s:
                continue
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
                removed_files += 1
            elif rel not in live_dvs:
                removed_files += _unlink_quiet(full)
    cdir = os.path.join(table, _CDF)
    if os.path.isdir(cdir):
        # change files referenced by a surviving commit entry stay
        # (row_changes can still serve that range); unreferenced ones
        # (truncated entries, crashed DML staging) age out
        referenced: set[str] = set()
        for fn in os.listdir(_log_dir(table)):
            if fn.endswith(".json") and not fn.startswith(".") \
                    and not fn.endswith(".checkpoint.json"):
                with open(os.path.join(_log_dir(table), fn)) as f:
                    referenced.update(json.load(f).get("cdf", []))
        for fn in os.listdir(cdir):
            rel = f"{_CDF}/{fn}"
            full = os.path.join(cdir, fn)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age < retention_s:
                continue
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
                removed_files += 1
            elif rel not in referenced:
                removed_files += _unlink_quiet(full)
    ldir = _log_dir(table)
    if os.path.isdir(ldir):
        # crashed writer between tmp dump and os.link: its .tmp- file is
        # invisible to every listing; reap it once it ages out
        for fn in os.listdir(ldir):
            if not fn.startswith(".tmp-"):
                continue
            full = os.path.join(ldir, fn)
            try:
                if now - os.path.getmtime(full) >= retention_s:
                    os.unlink(full)
                    removed_files += 1
            except OSError:
                pass
    cp_ver, _tail = _list_log(table)
    removed_log = 0
    if cp_ver is not None:
        cut = cp_ver if keep_log_from is None \
            else min(cp_ver, keep_log_from - 1)
        d = _log_dir(table)
        for fn in list(os.listdir(d)):
            if fn.endswith(".json") \
                    and not fn.startswith(".") \
                    and not fn.endswith(".checkpoint.json") \
                    and _ver_of(fn) <= cut:
                removed_log += _unlink_quiet(os.path.join(d, fn))
    return {"data_files_removed": removed_files,
            "log_entries_removed": removed_log}


def checkpoint(table: str) -> int:
    """Snapshot the live set + txn map at the current version so readers
    replay O(1) files instead of the whole log (Delta's parquet
    checkpoint, JSON here).  Returns the checkpointed version."""
    ver, live, txns, stats, meta = _replay(table)
    d = _log_dir(table)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"version": ver, "live": sorted(live), "txns": txns,
                   "stats": stats, "schema": meta["schema"],
                   "schemas_seen": sorted(meta["seen"]),
                   "dvs": {k: sorted(v)
                           for k, v in meta["dvs"].items()}}, f)
    os.rename(tmp, os.path.join(d, f"{ver:0{_W}d}.checkpoint.json"))
    return ver


def history(table: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per surviving commit entry, newest
    first — version, timestamp, operation kind (append / overwrite /
    dml / compaction / restore / dv-delete), row-affecting flags, and
    file counts.  Pure log metadata: O(surviving entries), zero data
    reads.  Entries vacuumed past a checkpoint are summarized by the
    checkpoint itself being the floor of what survives."""
    d = _log_dir(table)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no txlog at {table}")
    out = []
    for fn in sorted(os.listdir(d), reverse=True):
        if not fn.endswith(".json") or fn.startswith(".") \
                or fn.endswith(".checkpoint.json"):
            continue
        with open(os.path.join(d, fn)) as f:
            e = json.load(f)
        if "restore_of" in e:
            op = f"RESTORE to v{e['restore_of']}"
        elif "clone_of" in e:
            op = (f"CLONE of {e['clone_of']['table']}"
                  f"@v{e['clone_of']['version']}")
        elif e.get("dv"):
            op = "DELETE (deletion vectors)"
        elif e.get("dml"):
            op = "DML rewrite"
        elif not e.get("dataChange", True):
            op = "OPTIMIZE (compaction)"
        elif e.get("remove") and e.get("add"):
            op = "WRITE (overwrite)"
        else:
            op = "WRITE (append)"
        out.append({
            "version": e["version"], "timestamp_ms": e.get("ts"),
            "operation": op,
            "num_added_files": len(e.get("add", [])),
            "num_removed_files": len(e.get("remove", [])),
            "data_change": e.get("dataChange", True),
            "txn": (f"{e['txn']['app']}:{e['txn']['epoch']}"
                    if e.get("txn") else None),
        })
    return out


def describe_detail(table: str) -> dict:
    """DESCRIBE DETAIL: current-snapshot facts off the log + file
    sizes — version, file/byte counts, schema, DV and change-file
    counts.  O(live files) stat calls, zero data reads."""
    ver, live, _txns, _stats, meta = _replay(table)
    size = 0
    for rel in live:
        try:
            size += os.path.getsize(os.path.join(table, rel))
        except OSError:
            pass
    return {
        "version": ver,
        "num_files": len(live),
        "size_bytes": size,
        "schema": meta["schema"],
        "num_dv_files": sum(len(v) for v in meta["dvs"].values()),
        "files_with_dvs": len(meta["dvs"]),
        "schema_variants": len(meta["seen"]),
    }


def clone(src: str, dst: str, version_as_of: int | None = None) -> int:
    """CREATE TABLE ``dst`` AS CLONE OF ``src`` [VERSION AS OF v] —
    zero-copy: every live data/DV file of the source snapshot is
    HARDLINKED into the new table (immutable files make sharing safe:
    each table's vacuum only unlinks its own directory entry), and ONE
    commit publishes the snapshot with its schema, seen-schema set and
    footer stats carried over.  O(files) metadata work, no data bytes
    moved — Delta's deep-clone independence at shallow-clone cost on a
    posix filesystem (cross-device falls back to a real copy).

    The clone's lifecycle is fully independent of the source: either
    side may append/DML/compact/vacuum without affecting the other —
    the staging pattern for "run the experiment against last week's
    corpus" without a second corpus.

    Caveat (same as Delta CLONE): the source's TXN map (streaming
    exactly-once history) is NOT carried — re-pointing a foreachBatch
    sink at a clone re-applies any epoch whose (app, epoch) pair only
    the source remembers.  Start cloned sinks from a fresh checkpoint.
    """
    # reserve the destination ATOMICALLY by creating DST ITSELF with
    # exist_ok=False — a check-then-act isdir probe would let two
    # concurrent clones to the same dst both pass and both commit, and
    # reserving only the _txlog leaf would claim a PRE-EXISTING
    # non-table directory whose unrelated contents the failure path's
    # rmtree must never delete (r13 advice): CREATE TABLE semantics,
    # the target name must be free
    try:
        os.makedirs(dst, exist_ok=False)
    except FileExistsError:
        raise FileExistsError(f"clone target {dst} already exists")
    try:
        os.makedirs(_log_dir(dst))
        return _clone_into(src, dst, version_as_of)
    except BaseException:
        # the reservation created dst itself, so tearing down the
        # half-built tree (hardlinks only unlink OUR directory entries)
        # deletes nothing pre-existing, leaves the source untouched and
        # frees the name for a retry
        shutil.rmtree(dst, ignore_errors=True)
        raise


def _clone_into(src: str, dst: str, version_as_of: int | None) -> int:
    _ver, live, _txns, stats, meta = _replay(src, as_of=version_as_of)
    if not live:
        raise FileNotFoundError(f"nothing to clone: {src} is empty "
                                f"at that version")
    dv_rels = sorted({d for lst in meta["dvs"].values() for d in lst})
    needed = sorted(live) + dv_rels
    vacuumed = [rel for rel in needed
                if not os.path.exists(os.path.join(src, rel))]
    if vacuumed:
        raise FileNotFoundError(
            f"cannot clone {src} at version "
            f"{version_as_of if version_as_of is not None else _ver}: "
            f"{len(vacuumed)} required file(s) were vacuumed away "
            f"(e.g. {vacuumed[0]})")
    for rel in needed:
        s = os.path.join(src, rel)
        d = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.link(s, d)
        except OSError as e:
            if e.errno != errno.EXDEV:
                # NOT the cross-device case — e.g. the source file was
                # vacuumed between the liveness probe and the link
                # (ENOENT); surface it as the vacuumed-away error
                # instead of re-failing confusingly inside copy2
                if e.errno == errno.ENOENT:
                    raise FileNotFoundError(
                        f"cannot clone {src}: required file {rel} was "
                        f"vacuumed away mid-clone") from e
                raise
            shutil.copy2(s, d)               # cross-device: copy bytes
    entry: dict = {"add": sorted(live), "ts": int(time.time() * 1000),
                   "clone_of": {"table": src,
                                "version": version_as_of or _ver}}
    if stats:
        entry["stats"] = {rel: stats[rel] for rel in live
                          if rel in stats}
    if meta["dvs"]:
        entry["dv"] = {k: sorted(v) for k, v in meta["dvs"].items()}
    if meta["schema"]:
        entry["schema"] = meta["schema"]
    if len(meta["seen"]) > 1:
        # heterogeneous physical schemas must survive the clone or the
        # new table would read pre-evolution files without mergeSchema
        entry["schemasSeen"] = [json.loads(s)
                                for s in sorted(meta["seen"])]
    return _atomic_commit(dst, entry)
