from neo_server_spark.streaming import ingest, watch  # noqa: F401
