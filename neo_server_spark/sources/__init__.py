from neo_server_spark.sources.bridge import Bridge, BridgeRegistry  # noqa: F401
