from neo_server_spark.sqlx.dialect import register_dialect, rewrite_lake_sql  # noqa: F401
from neo_server_spark.sqlx.catalog import show  # noqa: F401
from neo_server_spark.sqlx.rollup import RollupRouter  # noqa: F401
