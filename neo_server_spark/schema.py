"""Type system and table-schema builders (SURVEY §1.1-1.2).

Machbase's scalar type set comes from the CGO binding
(spi/machsvr/machsvr.go:901-917 raw types, 919-954 name mapping).  Spark has
no unsigned integers, so unsigned types WIDEN to the next signed type that
holds the full range (`uint64` → decimal(20,0) — the only lossless container
for 2^64-1); `ipv4/ipv6` are strings, `json` is a string column queried with
``get_json_object`` on demand, and `datetime` is epoch-ns LongType (machbase
DATETIME is int64 nanoseconds — TimestampType would truncate to µs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import types as T

#: machbase type name (api.DataType, spi/machsvr/machsvr.go:919-954) -> Spark type
MACHBASE_TO_SPARK: dict[str, T.DataType] = {
    "int16": T.ShortType(),
    "uint16": T.IntegerType(),        # widened: no unsigned in Spark
    "int32": T.IntegerType(),
    "uint32": T.LongType(),           # widened
    "int64": T.LongType(),
    "uint64": T.DecimalType(20, 0),   # widened: full 2^64-1 range
    "datetime": T.LongType(),         # epoch-ns (int64), NOT TimestampType
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "ipv4": T.StringType(),
    "ipv6": T.StringType(),
    "varchar": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "json": T.StringType(),           # queried via get_json_object
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),       # API-layer type (spi/sql_wrap.go:411)
}


def spark_type(machbase_name: str) -> T.DataType:
    try:
        return MACHBASE_TO_SPARK[machbase_name.lower()]
    except KeyError:
        raise ValueError(f"unknown machbase type: {machbase_name!r}") from None


def tag_table_schema(extra_cols: Sequence[tuple[str, str]] = ()) -> T.StructType:
    """TAG table DDL shape (spi/testsuite/tagtable.go:133-139):
    ``(name VARCHAR PRIMARY KEY, time DATETIME BASETIME, value DOUBLE
    SUMMARIZED, ...extra)``."""
    fields = [
        T.StructField("name", T.StringType(), False),
        T.StructField("time", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
    fields += [T.StructField(n, spark_type(t), True) for n, t in extra_cols]
    return T.StructType(fields)


def log_table_schema(cols: Sequence[tuple[str, str]]) -> T.StructType:
    """LOG table shape: user columns + implicit ``_ARRIVAL_TIME``
    (mods/server/http_write.go:133-136 strips it on write; we stamp it at
    ingest, streaming/ingest.py)."""
    fields = [T.StructField(n, spark_type(t), True) for n, t in cols]
    fields.append(T.StructField("_ARRIVAL_TIME", T.LongType(), True))
    return T.StructType(fields)


def metadata_table_schema(extra: Sequence[tuple[str, str]] = ()) -> T.StructType:
    """Per-tag METADATA side table (spi/testsuite/tables.go:22-30): joined
    onto the fact table by ``name`` (broadcast dimension)."""
    fields = [T.StructField("name", T.StringType(), False)]
    fields += [T.StructField(n, spark_type(t), True) for n, t in extra]
    return T.StructType(fields)
