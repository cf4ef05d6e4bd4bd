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

This container ships no JDBC drivers, so connections fail at read time with
the JVM's driver-not-found error — the registry, option plumbing, and
pushdown wiring are the engine's part and are unit-tested.
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
        ships to the remote engine as a pushed-down subquery."""
        return self._base(spark).option("query", query).load()

    def table(self, spark: SparkSession, table: str,
              partition_column: str | None = None,
              lower: int | None = None, upper: int | None = None,
              num_partitions: int | None = None) -> DataFrame:
        """Full-table read; with ``partition_column`` + bounds Spark issues
        ``num_partitions`` parallel range-predicated queries — the scale
        path for big remote tables."""
        reader = self._base(spark).option("dbtable", table)
        if partition_column:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower))
                .option("upperBound", str(upper))
                .option("numPartitions", str(num_partitions or 8))
            )
        return reader.load()

    def insert(self, df: DataFrame, table: str, mode: str = "append") -> None:
        """INSERT(bridge('x'), …) (fm_dbsink.go:38-165) — batched JDBC write."""
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("driver", DRIVERS[self.type])
            .option("dbtable", table)
            .mode(mode)
            .save()
        )


class BridgeRegistry:
    """Named-bridge registry (mods/bridge/registry.go Register/Unregister)."""

    def __init__(self) -> None:
        self._bridges: dict[str, Bridge] = {}

    def register(self, name: str, type_: str, url: str, **options: str) -> Bridge:
        if type_ not in DRIVERS:
            raise ValueError(
                f"undefined bridge type {type_!r}, unable to register"
                f" (message bridges mqtt/nats are out of Spark scope)")
        br = Bridge(name=name, type=type_, url=url, options=dict(options))
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
