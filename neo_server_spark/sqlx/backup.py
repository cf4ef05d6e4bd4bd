"""BACKUP / MOUNT / UNMOUNT — the engine's archive surface.

Mirrors the reference's backup service (mods/backup/backupd.go): the HTTP
wrapper there builds machbase SQL — ``BACKUP DATABASE|TABLE t
[FROM FROM_UNIXTIME(a) TO FROM_UNIXTIME(b)|sysdate | AFTER '<prev>']
INTO DISK = '<path>'`` and ``MOUNT DATABASE '<path>' TO '<name>'`` /
``UNMOUNT DATABASE '<name>'`` — and runs it over a plain connection
(backupd.go:186-220, 386-391, 442).  Here the same statements are handled
by :func:`backup_exec`, plugged under ``ddl.exec_sql``'s verb dispatch.

Archive layout: one directory per backup holding ``backup.dat`` (the
manifest — the marker file the reference's archive listing looks for,
backupd.go:343) and one parquet file per engine table.  "Engine tables"
are the DDL-catalog tables (sqlx/ddl.py `_TABLES`) — dimension-sized
mutable side tables; the big append-only tag layouts are parquet
directories already (io.write_tag_table) and back up at the file layer,
like machbase's separately-archived TAG_TABLESPACE (backupd.go:327).

Mounted archives are read-only: MOUNT registers one temp view per backed
up table and queries reference them machbase-style as
``mount_name.table`` (or ``mount_name.user.table``);
:func:`rewrite_mounts` is applied by the lake dialect before planning.
The ``V$STORAGE_MOUNT_DATABASES`` system view (queried by the reference's
mounts listing, backupd.go:484) is kept registered with the machbase
column set.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import SparkSession

from . import ddl

__all__ = ["backup_exec", "backup_database", "restore_database",
           "mount_database", "unmount_database", "rewrite_mounts",
           "list_archives", "mounts", "MANIFEST_NAME", "BackupError"]

#: the archive marker/manifest filename the reference scans for
#: (backupd.go:343 "backup.dat")
MANIFEST_NAME = "backup.dat"

#: mount name (lowercased) -> {"path", "scn", "begin_ns", "end_ns",
#:                             "tables": [names]}
_MOUNTS: dict[str, dict] = {}


class BackupError(Exception):
    pass


def _lit(s: str) -> str:
    return s.strip().strip("'\"")


# --------------------------------------------------------------- backup

def _table_rows(name: str, t: dict, from_ns: int | None, to_ns: int | None,
                after_rows: int | None):
    """Rows to archive: optionally time-bounded on the table's first
    datetime column (machbase's duration backup bounds _arrival_time);
    incremental (AFTER) takes rows appended since the previous archive —
    the DDL catalog is append-ordered, matching machbase's restriction of
    incremental backup to appended data."""
    rows = t["rows"]
    if after_rows is not None:
        rows = rows[after_rows:]
    if from_ns is None and to_ns is None:
        return list(rows)
    ti = next((i for i, (_n, m, _s) in enumerate(t["cols"])
               if m == "datetime"), None)
    if ti is None:
        return list(rows)
    lo = from_ns if from_ns is not None else -(1 << 62)
    hi = to_ns if to_ns is not None else (1 << 62)
    return [r for r in rows
            if r[ti] is not None and lo <= r[ti] < hi]


def backup_database(spark: SparkSession, path: str, table: str | None = None,
                    from_ns: int | None = None, to_ns: int | None = None,
                    after: str | None = None) -> int:
    """Archive the DDL catalog (or one table) into ``path``.  Returns the
    number of rows archived."""
    names = ([table.lower()] if table else sorted(ddl._TABLES))
    prev = None
    if after:
        prev = _read_manifest(after)
    os.makedirs(path, exist_ok=True)
    manifest: dict = {
        "type": "table" if table else "database",
        "created_ns": int(time.time() * 1e9),
        "from_ns": from_ns, "to_ns": to_ns,
        "after": after,
        "tables": {},
    }
    total = 0
    for name in names:
        if name not in ddl._TABLES:
            raise BackupError(f"table {name} does not exist")
        t = ddl._TABLES[name]
        after_rows = None
        if prev is not None:
            after_rows = prev["tables"].get(name, {}).get("n_rows", 0)
        rows = _table_rows(name, t, from_ns, to_ns, after_rows)
        schema = ddl._schema_ddl(t["cols"])
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"{name}.parquet"))
        ti = next((i for i, (_n, m, _s) in enumerate(t["cols"])
                   if m == "datetime"), None)
        times = [r[ti] for r in rows if ti is not None and r[ti] is not None]
        manifest["tables"][name] = {
            "kind": t["kind"],
            "cols": [(n, m) for n, m, _s in t["cols"]],
            "n_rows": len(t["rows"]),       # catalog size (for AFTER chains)
            "n_archived": len(rows),
            "min_time_ns": min(times) if times else None,
            "max_time_ns": max(times) if times else None,
        }
        total += len(rows)
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    return total


def _read_manifest(path: str) -> dict:
    mf = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mf):
        raise BackupError(f"invalid backup {path!r}: no {MANIFEST_NAME}")
    with open(mf) as f:
        return json.load(f)


def restore_database(spark: SparkSession, path: str) -> int:
    """Load an archive back into the DDL catalog (the machadmin-restore
    analogue, exposed as ``RESTORE DATABASE FROM DISK = '<path>'``).
    Existing tables with the same names are replaced."""
    manifest = _read_manifest(path)
    total = 0
    for name, meta in manifest["tables"].items():
        cols = [(n, m, ddl._TYPE_MAP[m]) for n, m in meta["cols"]]
        rows = [tuple(r) for r in spark.read.parquet(
            os.path.join(path, f"{name}.parquet")).collect()]
        ddl._TABLES[name] = {
            "cols": cols, "rows": rows, "kind": meta["kind"],
            "lengths": [ddl._TYPE_LENGTHS.get(m, 0) for _n, m in meta["cols"]],
            "flags": ["" for _ in cols],
        }
        ddl._refresh_view(spark, name)
        total += len(rows)
    return total


# ---------------------------------------------------------------- mount

def _mount_view(mount: str, table: str) -> str:
    return f"__mnt_{mount}_{table}"


def mount_database(spark: SparkSession, path: str, name: str) -> None:
    name = name.lower()
    if name in _MOUNTS:
        raise BackupError(f"mount {name} already exists")
    manifest = _read_manifest(path)
    tables = sorted(manifest["tables"])
    for t in tables:
        spark.read.parquet(os.path.join(path, f"{t}.parquet")) \
            .createOrReplaceTempView(_mount_view(name, t))
    times = [m for t in tables
             for m in (manifest["tables"][t]["min_time_ns"],
                       manifest["tables"][t]["max_time_ns"]) if m is not None]
    _MOUNTS[name] = {
        "path": os.path.abspath(path),
        "scn": manifest["created_ns"],
        "begin_ns": min(times) if times else 0,
        "end_ns": max(times) if times else 0,
        "tables": tables,
    }
    _refresh_mounts_view(spark)


def unmount_database(spark: SparkSession, name: str) -> None:
    name = name.lower()
    if name not in _MOUNTS:
        raise BackupError(f"mount {name} does not exist")
    for t in _MOUNTS[name]["tables"]:
        spark.catalog.dropTempView(_mount_view(name, t))
    del _MOUNTS[name]
    _refresh_mounts_view(spark)


def mounts() -> dict[str, dict]:
    return dict(_MOUNTS)


def _refresh_mounts_view(spark: SparkSession) -> None:
    """V$STORAGE_MOUNT_DATABASES with the machbase column set
    (backupd.go:456-467 StorageMount scan order)."""
    rows = [(n, m["path"], 0, m["scn"], n.upper(),
             str(m["begin_ns"]), str(m["end_ns"]),
             str(m["scn"]), str(m["scn"]), 0)
            for n, m in sorted(_MOUNTS.items())]
    spark.createDataFrame(
        rows, "NAME string, PATH string, BACKUP_TBSID long, BACKUP_SCN long,"
        " MOUNTDB string, DB_BEGIN_TIME string, DB_END_TIME string,"
        " BACKUP_BEGIN_TIME string, BACKUP_END_TIME string, FLAG int"
    ).createOrReplaceTempView("v_storage_mount_databases")


#: FROM/JOIN followed by a comma-separated list of (possibly qualified,
#: possibly aliased) table references — the only position where a
#: ``mount.table`` token means a table (never a column reference like
#: ``alias.col`` in SELECT/WHERE, which an earlier blanket rewrite
#: silently hijacked when an alias collided with a mount name)
#: words that may directly follow a table reference and must never be
#: swallowed as its alias (``FROM t1 JOIN m.t2`` — ``JOIN`` is not an
#: alias of t1, and consuming it hides m.t2 from the rewrite)
_NOT_ALIAS = (r"(?!(?:join|on|where|group|order|left|right|inner|outer|"
              r"cross|full|natural|union|intersect|except|limit|having|"
              r"using|lateral|semi|anti|window|qualify|asof)\b)")
_FROM_LIST = re.compile(
    r"(?i)\b(from|join)(\s+)"
    r"((?:\w+\.){0,2}\w+(?:\s+(?:as\s+)?" + _NOT_ALIAS + r"\w+)?"
    r"(?:\s*,\s*(?:\w+\.){0,2}\w+(?:\s+(?:as\s+)?" + _NOT_ALIAS
    + r"\w+)?)*)")

_QNAME = re.compile(r"^(\w+)\.(?:(\w+)\.)?(\w+)(.*)$", re.S)


def rewrite_mounts(q: str) -> str:
    """Rewrite machbase mounted-table references —
    ``mount_name.table`` / ``mount_name.user.table`` — to the mount's
    registered views, and ``V$STORAGE_MOUNT_DATABASES`` to its view.
    Inert when nothing is mounted and the system view isn't referenced.

    Token-aware: string literals are never touched, and only identifiers
    in table-reference position (after FROM/JOIN, including comma lists)
    rewrite — ``a.events`` as a column reference under an alias ``a``
    stays a column reference even while a mount named ``a`` exists."""
    q = re.sub(r"V\$STORAGE_MOUNT_DATABASES",
               "v_storage_mount_databases", q, flags=re.I)
    if not _MOUNTS:
        return q

    def rw_item(item: str) -> str:
        m = _QNAME.match(item)
        if m:
            mount, table = m.group(1).lower(), m.group(3).lower()
            if mount in _MOUNTS and table in _MOUNTS[mount]["tables"]:
                return _mount_view(mount, table) + m.group(4)
        return item

    def rw_list(m: re.Match) -> str:
        parts = re.split(r"(\s*,\s*)", m.group(3))
        parts[::2] = [rw_item(p) for p in parts[::2]]
        return m.group(1) + m.group(2) + "".join(parts)

    # split out single-quoted literals ('' = escaped quote); rewrite only
    # the code segments between them
    segs = re.split(r"('(?:[^']|'')*')", q)
    segs[::2] = [_FROM_LIST.sub(rw_list, s) for s in segs[::2]]
    return "".join(segs)


# ------------------------------------------------------------- SQL verbs

_BACKUP_RE = re.compile(
    r"backup\s+(database|table\s+(\w+))"
    r"(?:\s+from\s+from_unixtime\s*\(\s*(\d+)\s*\)"
    r"\s+to\s+(?:from_unixtime\s*\(\s*(\d+)\s*\)|sysdate))?"
    r"(?:\s+after\s+'([^']+)')?"
    r"\s+into\s+disk\s*=\s*'([^']+)'\s*$", re.I | re.S)


def backup_exec(spark: SparkSession, sql: str) -> int | None:
    """Handle BACKUP / RESTORE / MOUNT / UNMOUNT statements; returns the
    affected-row count, or None when the text is none of these verbs."""
    s = sql.strip().rstrip(";").strip()
    m = _BACKUP_RE.match(s)
    if m:
        table = m.group(2)
        from_s, to_s = m.group(3), m.group(4)
        return backup_database(
            spark, m.group(6), table=table,
            from_ns=int(from_s) * 1_000_000_000 if from_s else None,
            to_ns=int(to_s) * 1_000_000_000 if to_s else None,
            after=m.group(5))
    m = re.match(r"restore\s+database\s+from\s+disk\s*=\s*'([^']+)'\s*$",
                 s, re.I)
    if m:
        return restore_database(spark, m.group(1))
    m = re.match(r"mount\s+database\s+'([^']+)'\s+to\s+'?(\w+)'?\s*$", s, re.I)
    if m:
        mount_database(spark, m.group(1), m.group(2))
        return 0
    m = re.match(r"unmount\s+database\s+'?(\w+)'?\s*$", s, re.I)
    if m:
        unmount_database(spark, m.group(1))
        return 0
    return None
