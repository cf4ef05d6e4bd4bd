"""External-system bridges (mods/bridge/registry.go:20-30).

The reference registers named connections to sqlite/postgres/mysql/mssql
(SQL bridges) and MQTT/NATS (message bridges); TQL then runs
``SQL(bridge('name'), 'select …')`` or ``INSERT(bridge('name'), …)``
against them.

Spark mapping: the SQL bridges are ``spark.read/write.jdbc`` with a
connection registry keyed by name — Spark's JDBC source gives predicate
pushdown, partitioned parallel reads (``partitionColumn``/bounds), and
batched writes, replacing the reference's row-loop drivers.  Message
bridges (MQTT/NATS) stay out of engine scope (BASELINE.json: the broker is
not part of the Spark job); their ingest path is streaming/ingest.py over
whatever feed lands files/Kafka topics.

This container ships no JDBC drivers, so jdbc-engine connections fail at
read time with the JVM's driver-not-found error — the registry, option
plumbing, and pushdown wiring are the engine's part and are unit-tested.
The SQLITE bridge additionally has a NATIVE engine (Python's stdlib
``sqlite3``, selected automatically) that executes for real: the
reference's own test/default bridge is a file-backed sqlite DB
(mods/bridge sqlite3 driver), so the full SQL(bridge)/INSERT(bridge)
surface is driver-certifiable in this container.  Native reads of a whole
query run on one connection (exactly the reference's row-loop shape);
``table(partition_column=...)`` fans range-predicated reads out to
EXECUTORS via mapInPandas — the same parallel-read contract as Spark's
JDBC source, valid wherever the DB file is reachable from the executors
(local mode, NFS).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: bridge type -> JDBC driver class (the reference's compile-time drivers)
DRIVERS = {
    "sqlite": "org.sqlite.JDBC",
    "postgres": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "mssql": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
}


@dataclass
class Bridge:
    name: str
    type: str
    url: str                      # jdbc:... connection path (def.Path)
    options: dict[str, str] = field(default_factory=dict)
    engine: str = "auto"          # auto|jdbc|native

    def _use_native(self) -> bool:
        if self.engine == "native":
            return True
        # auto: sqlite has a stdlib driver; everything else needs JDBC
        return self.engine == "auto" and self.type == "sqlite"

    def _db_path(self) -> str:
        p = self.url
        for prefix in ("jdbc:sqlite:", "sqlite:", "file:"):
            if p.startswith(prefix):
                p = p[len(prefix):]
        return p

    def _base(self, spark: SparkSession):
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("driver", DRIVERS[self.type])
        )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader

    def sql(self, spark: SparkSession, query: str) -> DataFrame:
        """SQL(bridge('x'), 'select …') (fm_dbsrc.go:312-384) — the query
        ships to the remote engine as a pushed-down subquery (jdbc) or
        runs on one native connection (sqlite — the reference's
        fetch-loop over the bridge conn, fm_dbsrc.go:360-384)."""
        if self._use_native():
            import sqlite3

            import pandas as pd

            con = sqlite3.connect(self._db_path())
            try:
                pdf = pd.read_sql_query(query, con)
            finally:
                con.close()
            return spark.createDataFrame(pdf)
        return self._base(spark).option("query", query).load()

    def table(self, spark: SparkSession, table: str,
              partition_column: str | None = None,
              lower: int | None = None, upper: int | None = None,
              num_partitions: int | None = None) -> DataFrame:
        """Full-table read; with ``partition_column`` + bounds the read
        fans out as ``num_partitions`` parallel range-predicated queries
        — Spark's JDBC partitioned-read contract, reproduced for the
        native engine with mapInPandas range readers on the executors."""
        if self._use_native():
            if not partition_column:
                return self.sql(spark, f"SELECT * FROM {table}")
            return self._native_partitioned(
                spark, table, partition_column, int(lower), int(upper),
                int(num_partitions or 8))
        reader = self._base(spark).option("dbtable", table)
        if partition_column:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower))
                .option("upperBound", str(upper))
                .option("numPartitions", str(num_partitions or 8))
            )
        return reader.load()

    def _native_partitioned(self, spark: SparkSession, table: str,
                            pc: str, lower: int, upper: int,
                            num_partitions: int) -> DataFrame:
        """Executor-side range reads: partition k covers
        [lower + k*stride, next), first/last ranges unbounded below/above
        — exactly Spark's JDBC stride arithmetic, so no row is lost
        outside [lower, upper)."""
        import pandas as pd

        path = self._db_path()
        # schema probe: one row on the driver types the frame
        probe = self.sql(spark, f"SELECT * FROM {table} LIMIT 1")
        schema = probe.schema
        stride = max(1, (upper - lower) // num_partitions)
        bounds = []
        for k in range(num_partitions):
            lo = None if k == 0 else lower + k * stride
            hi = None if k == num_partitions - 1 else lower + (k + 1) * stride
            bounds.append((k, lo, hi))
        parts = spark.createDataFrame(bounds, "k long, lo long, hi long") \
            .repartition(num_partitions, "k")

        def read_ranges(batches):
            import sqlite3

            for pdf in batches:
                for _, row in pdf.iterrows():
                    conds = []
                    if not pd.isna(row["lo"]):
                        conds.append(f"{pc} >= {int(row['lo'])}")
                    if not pd.isna(row["hi"]):
                        conds.append(f"{pc} < {int(row['hi'])}")
                    where = f" WHERE {' AND '.join(conds)}" if conds else ""
                    con = sqlite3.connect(path)
                    try:
                        out = pd.read_sql_query(
                            f"SELECT * FROM {table}{where}", con)
                    finally:
                        con.close()
                    if len(out):
                        yield out[[f.name for f in schema.fields]]

        return parts.mapInPandas(read_ranges, schema)

    def insert(self, df: DataFrame, table: str, mode: str = "append") -> None:
        """INSERT(bridge('x'), …) (fm_dbsink.go:38-165) — batched JDBC
        write, or an executemany batch per Arrow chunk on the native
        engine (the reference's prepared-statement loop)."""
        if self._use_native():
            import sqlite3

            pdf = df.toPandas()
            con = sqlite3.connect(self._db_path())
            try:
                cols = ", ".join(pdf.columns)
                marks = ", ".join("?" for _ in pdf.columns)
                if mode == "overwrite":
                    con.execute(f"DROP TABLE IF EXISTS {table}")
                decls = ", ".join(
                    f"{c} {_sqlite_decl(df.schema[c].dataType)}"
                    for c in pdf.columns)
                con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({decls})")
                con.executemany(
                    f"INSERT INTO {table} ({cols}) VALUES ({marks})",
                    pdf.itertuples(index=False, name=None))
                con.commit()
            finally:
                con.close()
            return
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("driver", DRIVERS[self.type])
            .option("dbtable", table)
            .mode(mode)
            .save()
        )


def _sqlite_decl(dt) -> str:
    """Spark type -> sqlite column affinity for the native CREATE TABLE."""
    from pyspark.sql.types import (ByteType, DoubleType, FloatType,
                                   IntegerType, LongType, ShortType)

    if isinstance(dt, (LongType, IntegerType, ShortType, ByteType)):
        return "INTEGER"
    if isinstance(dt, (DoubleType, FloatType)):
        return "REAL"
    return "TEXT"


class BridgeRegistry:
    """Named-bridge registry (mods/bridge/registry.go Register/Unregister)."""

    def __init__(self) -> None:
        self._bridges: dict[str, Bridge] = {}

    def register(self, name: str, type_: str, url: str,
                 engine: str = "auto", **options: str) -> Bridge:
        if type_ not in DRIVERS:
            raise ValueError(
                f"undefined bridge type {type_!r}, unable to register"
                f" (message bridges mqtt/nats are out of Spark scope)")
        br = Bridge(name=name, type=type_, url=url,
                    options=dict(options), engine=engine)
        self._bridges[name] = br
        return br

    def get(self, name: str) -> Bridge:
        try:
            return self._bridges[name]
        except KeyError:
            raise KeyError(f"undefined bridge {name!r}") from None

    def unregister(self, name: str) -> None:
        self._bridges.pop(name, None)

    def names(self) -> list[str]:
        return sorted(self._bridges)


default_registry = BridgeRegistry()
