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

Reference parity: the engine's backup manifests (sqlx/backup.py) answer
"what is in this archive"; the txlog answers "what is IN the table right
now" under concurrent appends and retries.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["commit", "write", "read_table", "changes", "checkpoint",
           "live_files", "last_txn_version", "TxConflict"]

_LOG = "_txlog"
_DATA = "data"
_W = 20  # zero-padded version width keeps lexical == numeric order


class TxConflict(RuntimeError):
    """Another writer took the version and retries were exhausted."""


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _ver_of(fn: str) -> int:
    return int(fn.split(".")[0])


def _list_log(table: str) -> tuple[int | None, list[str]]:
    """(latest checkpoint version, ordered commit filenames after it)."""
    d = _log_dir(table)
    if not os.path.isdir(d):
        return None, []
    names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    cps = [n for n in names if n.endswith(".checkpoint.json")]
    cp_ver = _ver_of(cps[-1]) if cps else None
    tail = [n for n in names if not n.endswith(".checkpoint.json")
            and (cp_ver is None or _ver_of(n) > cp_ver)]
    return cp_ver, tail


def _replay(table: str) -> tuple[int, set[str], dict[str, int]]:
    """(current version, live file set, {app:epoch -> version} txn map).

    Metadata cost is O(commits since the last checkpoint): the
    checkpoint snapshot carries the full live set AND the txn map, so
    dedupe survives compaction."""
    cp_ver, tail = _list_log(table)
    live: set[str] = set()
    txns: dict[str, int] = {}
    ver = 0
    if cp_ver is not None:
        with open(os.path.join(_log_dir(table),
                               f"{cp_ver:0{_W}d}.checkpoint.json")) as f:
            snap = json.load(f)
        live = set(snap["live"])
        txns = dict(snap.get("txns", {}))
        ver = cp_ver
    for fn in tail:
        with open(os.path.join(_log_dir(table), fn)) as f:
            entry = json.load(f)
        ver = entry["version"]
        live -= set(entry.get("remove", []))
        live |= set(entry.get("add", []))
        t = entry.get("txn")
        if t:
            txns[f"{t['app']}:{t['epoch']}"] = ver
    return ver, live, txns


def live_files(table: str) -> list[str]:
    """Committed data files (relative paths), sorted."""
    return sorted(_replay(table)[1])


def last_txn_version(table: str, app: str, epoch: int) -> int | None:
    """Version that committed (app, epoch), or None — the idempotence
    probe foreachBatch retries use."""
    return _replay(table)[2].get(f"{app}:{epoch}")


def _atomic_commit(table: str, entry: dict, retries: int = 20) -> int:
    """Put-if-absent the next version; optimistic retry on conflict."""
    d = _log_dir(table)
    os.makedirs(d, exist_ok=True)
    for _ in range(retries):
        ver = _replay(table)[0] + 1
        entry["version"] = ver
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
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


def commit(table: str, add: list[str], mode: str = "append",
           txn: tuple[str, int] | None = None) -> int:
    """Publish staged files.  mode='overwrite' removes the current live
    set in the same atomic entry.  Returns the committed version; if
    ``txn`` was already committed, discards ``add`` and returns the
    original version (idempotent replay)."""
    if txn is not None:
        prior = last_txn_version(table, txn[0], txn[1])
        if prior is not None:
            for rel in add:
                p = os.path.join(table, rel)
                if os.path.exists(p):
                    os.unlink(p)
            return prior
    entry: dict = {"add": sorted(add), "ts": int(time.time() * 1000)}
    if txn is not None:
        entry["txn"] = {"app": txn[0], "epoch": int(txn[1])}
    if mode == "overwrite":
        entry["remove"] = live_files(table)
    elif mode != "append":
        raise ValueError(f"unknown mode {mode!r}")
    return _atomic_commit(table, entry)


def write(df: DataFrame, table: str, mode: str = "append",
          txn: tuple[str, int] | None = None) -> int:
    """Stage ``df`` as immutable parquet files under ``data/`` and commit
    them atomically.  Exactly-once when ``txn=(app, epoch)`` identifies
    the logical batch: a foreachBatch retry replays into a no-op.

    A pre-commit txn probe skips the WRITE too on replay (cheap), but
    correctness only needs the commit-time check — two racing attempts
    of the same epoch both stage, one commits, the loser's files are
    unlinked by its own commit() call."""
    if txn is not None and last_txn_version(table, txn[0], txn[1]) is not None:
        return last_txn_version(table, txn[0], txn[1])
    os.makedirs(os.path.join(table, _DATA), exist_ok=True)
    stage = os.path.join(table, _DATA, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    rels = []
    tag = uuid.uuid4().hex
    for k, fn in enumerate(sorted(os.listdir(stage))):
        if not fn.endswith(".parquet"):
            continue
        rel = f"{_DATA}/{tag}-{k}.parquet"
        os.rename(os.path.join(stage, fn), os.path.join(table, rel))
        rels.append(rel)
    shutil.rmtree(stage, ignore_errors=True)
    return commit(table, rels, mode=mode, txn=txn)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Snapshot read of the committed live set — staged/orphaned files
    under data/ are invisible by construction."""
    files = [os.path.join(table, rel) for rel in live_files(table)]
    if not files:
        raise FileNotFoundError(f"empty txlog table: {table}")
    return spark.read.parquet(*files)


def changes(spark: SparkSession, table: str,
            since_version: int) -> tuple[int, DataFrame | None]:
    """(current version, rows ADDED after ``since_version``) — the
    change-data feed incremental consumers / watch poll on.  None when
    nothing changed.  Removed files are not re-read: appends-only
    consumers (the watch/rollup shape) see each row exactly once."""
    cur, _live, _ = _replay(table)
    if cur <= since_version:
        return cur, None
    cp_ver, tail = _list_log(table)
    added: list[str] = []
    if cp_ver is not None and cp_ver > since_version:
        # the checkpoint swallowed part of the range: fall back to the
        # full snapshot delta (rare — checkpoints are explicit)
        raise ValueError(
            f"versions <= {cp_ver} were checkpointed away; "
            f"re-read the snapshot instead of changes({since_version})")
    for fn in tail:
        with open(os.path.join(_log_dir(table), fn)) as f:
            entry = json.load(f)
        if entry["version"] > since_version:
            added.extend(entry.get("add", []))
    files = [os.path.join(table, rel) for rel in added]
    return cur, spark.read.parquet(*files) if files else None


def checkpoint(table: str) -> int:
    """Snapshot the live set + txn map at the current version so readers
    replay O(1) files instead of the whole log (Delta's parquet
    checkpoint, JSON here).  Returns the checkpointed version."""
    ver, live, txns = _replay(table)
    d = _log_dir(table)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"version": ver, "live": sorted(live), "txns": txns}, f)
    os.rename(tmp, os.path.join(d, f"{ver:0{_W}d}.checkpoint.json"))
    return ver
