from neo_server_spark.tql.pipeline import Tql, Pipeline  # noqa: F401
from neo_server_spark.tql import fake  # noqa: F401
