"""VOLATILE / LOOKUP / KEYVALUE tables: small keyed side tables with
insert-or-update, delete, and join-readable state.

Reference: table kinds spi/do.go:197-207 (TableTypeVolatile / TableTypeLookup
/ TableTypeKeyValue), exercised by the engine's `INSERT ... ON DUPLICATE KEY
UPDATE` path and VOLATILE/KEYVALUE FULL SCAN plans
(spi/testsuite/explain.go:24-25).  machbase uses these for device metadata,
config, and enrichment tables that mutate while log/tag tables append.

Spark mapping: a versioned parquet snapshot per mutation with an atomically
flipped pointer file — readers resolve the pointer once per read and never
observe partial state (the same reader-isolation contract the engine's MVCC
volatile store provides).  These tables are dimension-sized by contract
(devices, configs — thousands to low millions of rows), so each mutation
rewriting the snapshot is the right trade: the table stays one compact
parquet file that Spark broadcasts on join (autoBroadcastJoinThreshold), so
enriching a 100 TB fact scan with lookup attributes costs no shuffle.
Delta MERGE is the industrial-scale analogue when mutations outpace this
snapshot model.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"

KINDS = ("volatile", "lookup", "keyvalue")


class KeyedTable:
    """An upsertable keyed table (VOLATILE/LOOKUP/KEYVALUE semantics)."""

    def __init__(self, spark: SparkSession, path: str,
                 key: str | Sequence[str] = "name", kind: str = "volatile"):
        if kind not in KINDS:
            raise ValueError(f"kind must be one of {KINDS}")
        self.spark = spark
        self.path = path
        self.keys = [key] if isinstance(key, str) else list(key)
        self.kind = kind
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ snapshots

    def _pointer_path(self) -> str:
        return os.path.join(self.path, _POINTER)

    def _current_snap(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                name = f.read().strip()
            return os.path.join(self.path, name) if name else None
        except FileNotFoundError:
            return None

    #: superseded snapshots kept after a flip — the immediately previous
    #: snapshot stays for readers that resolved the pointer before the flip;
    #: older generations are garbage (reader isolation needs live snapshots,
    #: not history — without pruning a per-minute upsert fills the disk)
    KEEP_SNAPSHOTS = 2

    def _flip(self, df: DataFrame) -> None:
        import shutil
        import time as _time

        prev = self._current_snap()
        snap = f"snap-{int(_time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.path, snap)
        # dimension-sized by contract -> one file, broadcast-friendly
        df.coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._pointer_path())  # atomic pointer flip
        keep = {snap, os.path.basename(prev) if prev else None}
        snaps = sorted(d for d in os.listdir(self.path) if d.startswith("snap-"))
        for d in snaps[:-self.KEEP_SNAPSHOTS]:
            if d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # ------------------------------------------------------------ operations

    def df(self) -> DataFrame:
        snap = self._current_snap()
        if snap is None:
            raise FileNotFoundError(f"keyed table at {self.path} has no data yet")
        return self.spark.read.parquet(snap)

    def exists(self) -> bool:
        return self._current_snap() is not None

    def _write_lock(self):
        """Advisory writer lock: the snapshot flip is a read-modify-write,
        so concurrent writers would silently drop each other's updates
        (last flip wins).  Readers never take the lock — pointer resolution
        stays lock-free."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def held():
            with open(os.path.join(self.path, ".write_lock"), "w") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)
        return held()

    def upsert(self, rows: DataFrame | Iterable[dict]) -> None:
        """INSERT ... ON DUPLICATE KEY UPDATE (the reference path updates
        only the PROVIDED columns on a key match): for matched keys each
        incoming value coalesces with the surviving row's value per column,
        so a partial-column upsert never nulls attributes it didn't mention;
        unmatched existing rows survive; new columns extend the table."""
        new = rows if isinstance(rows, DataFrame) else \
            self.spark.createDataFrame(list(rows))
        with self._write_lock():
            if self.exists():
                cur = self.df()
                joined = cur.alias("c").join(new.alias("n"), self.keys,
                                             "full_outer")
                cols = []
                for c in dict.fromkeys([*cur.columns, *new.columns]):
                    if c in self.keys:
                        cols.append(F.col(c))
                    elif c in cur.columns and c in new.columns:
                        cols.append(F.coalesce(F.col(f"n.{c}"),
                                               F.col(f"c.{c}")).alias(c))
                    elif c in new.columns:
                        cols.append(F.col(f"n.{c}").alias(c))
                    else:
                        cols.append(F.col(f"c.{c}").alias(c))
                merged = joined.select(*cols)
            else:
                merged = new
            self._flip(merged)

    def delete(self, keys: DataFrame | Iterable) -> None:
        """Delete by key (scalar iterable for a single-key table, dict
        iterable or DataFrame otherwise)."""
        if isinstance(keys, DataFrame):
            kdf = keys.select(*self.keys)
        else:
            vals = list(keys)
            if vals and not isinstance(vals[0], dict):
                vals = [{self.keys[0]: v} for v in vals]
            kdf = self.spark.createDataFrame(vals).select(*self.keys)
        with self._write_lock():
            self._flip(self.df().join(kdf, self.keys, "left_anti"))

    def truncate(self) -> None:
        with self._write_lock():
            self._flip(self.df().limit(0))

    def register(self, view: str) -> None:
        self.df().createOrReplaceTempView(view)
