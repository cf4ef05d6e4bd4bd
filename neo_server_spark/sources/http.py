"""HTTP() source — driver-side fetch -> DataFrame shim.

Reference: the TQL HTTP map/source family (mods/tql/fm_http.go; sink side
fm_encoder.go:169).  The reference fetches once per query execution on the
server; the Spark analogue fetches once on the driver and parallelizes the
parsed rows.  This is a *presentational/config* source by contract (API
responses, small CSV feeds) — bulk data belongs in object storage read by
``spark.read`` directly, so no distributed-fetch machinery is warranted.
"""

from __future__ import annotations

import io
import json
import urllib.request
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def fetch(url: str, method: str = "GET", headers: dict | None = None,
          body: bytes | None = None, timeout: float = 10.0) -> bytes:
    req = urllib.request.Request(url, data=body, method=method.upper(),
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


def http_source(
    spark: SparkSession,
    url: str,
    format: str = "csv",
    columns: Sequence[str] | None = None,
    header: bool = False,
    method: str = "GET",
    headers: dict | None = None,
    timeout: float = 10.0,
) -> DataFrame:
    """HTTP(GET|POST url) -> records.

    ``format``: ``csv`` (default, reference's text/csv convention),
    ``json`` (array-of-arrays or array-of-objects), or ``ndjson``.
    """
    raw = fetch(url, method=method, headers=headers, timeout=timeout)
    text = raw.decode("utf-8")
    if format == "csv":
        import csv as _csv
        rows = [tuple(r) for r in _csv.reader(io.StringIO(text)) if r]
        if not rows:
            raise ValueError(f"HTTP source returned no rows: {url}")
        if header:
            columns = columns or list(rows[0])
            rows = rows[1:]
        cols = list(columns) if columns else [f"column{i}" for i in range(len(rows[0]))]
        return spark.createDataFrame(rows, cols)
    if format in ("json", "ndjson"):
        if format == "ndjson":
            data = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
        else:
            data = json.loads(text)
        if not data:
            raise ValueError(f"HTTP source returned no rows: {url}")
        if isinstance(data[0], dict):
            cols = list(columns) if columns else sorted(data[0])
            rows = [tuple(d.get(c) for c in cols) for d in data]
        else:
            rows = [tuple(d) for d in data]
            cols = list(columns) if columns else [f"column{i}" for i in range(len(rows[0]))]
        return spark.createDataFrame(rows, cols)
    raise ValueError(f"unsupported HTTP source format {format!r}")
