"""TQL operator surface re-expressed on DataFrames (SURVEY §2).

Conventions
-----------
- A TQL record is ``(key, value...)`` (reference: mods/tql/task_record.go:27-32).
  We model a pipeline DataFrame with the *key as column 0* when key operators
  are in play; plain relational operators ignore the convention.
- Reference pipelines are single-series and see rows in arrival (time) order
  (mods/tql/task_node.go:185-268).  Distributed equivalents of order-sensitive
  operators take explicit ``series``/``order_by`` arguments: per-series state
  becomes ``Window.partitionBy(series).orderBy(order_by)``.
"""

from neo_server_spark.operators import maps, group, series, stats  # noqa: F401
