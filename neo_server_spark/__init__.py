"""neo_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of machbase/neo-server.

Not a port: the reference (Go + embedded C engine) defines WHAT to compute —
the TQL operator surface (reference: mods/tql/fx_definitions.go:65-334), the
generated SQL dialect (mods/server/http_lake.go), and the tag/log data model
(spi/do.go:197-207).  This package re-expresses those semantics on the Spark
DataFrame/SQL stack so Catalyst + Tungsten own optimization and execution.

Layout
------
- ``session``   : tuned SparkSession factory ("engine boot")
- ``io``        : TESTDATA loaders, tag/log table layout helpers
- ``operators`` : TQL MAP/GROUP/series operators on DataFrames
- ``tql``       : fluent pipeline DSL (SRC -> MAP* -> SINK) and FAKE generators
- ``functions`` : scalar function surface (time/string/geo helpers)
- ``sqlx``      : SQL dialect shims (DECODE/FIRST/LAST/ROLLUP router/SHOW)
- ``datapipe``  : large-scale training-data ops (dedup, similarity, text, multimodal)
- ``streaming`` : Structured Streaming ingest / rollup / watch
- ``codecs``    : result encoders (csv/json/ndjson/markdown/box)
"""

__version__ = "0.1.0"

from neo_server_spark.session import get_spark, ensure_engine_conf  # noqa: F401
from neo_server_spark.io import load_table, load_tables, register_views  # noqa: F401
