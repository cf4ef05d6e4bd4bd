from neo_server_spark.codecs.encoders import (  # noqa: F401
    to_box,
    to_csv,
    to_json_envelope,
    to_markdown,
    to_ndjson,
)
