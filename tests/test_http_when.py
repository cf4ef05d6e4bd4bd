"""HTTP() source shim + WHEN doLog()/doHttp() doers against a local stub
server (reference behaviors: fm_http.go source, fm_monad.go:2169-2413
doers with log-and-continue error semantics)."""

import http.server
import json
import threading

import pytest

import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def stub_server():
    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _respond(self, code, body: bytes, ctype="text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            hits.append(("GET", self.path, None))
            if self.path.startswith("/csv"):
                self._respond(200, b"tag,val\na,1.5\nb,2\n", "text/csv")
            elif self.path.startswith("/json"):
                self._respond(200, json.dumps(
                    [{"tag": "x", "val": 10}, {"tag": "y", "val": 20}]).encode(),
                    "application/json")
            elif self.path.startswith("/alert"):
                self._respond(200, b"ok")
            else:
                self._respond(404, b"nope")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            hits.append(("POST", self.path, self.rfile.read(n)))
            self._respond(200, b"ok")

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hits
    srv.shutdown()


def test_http_source_csv(spark, stub_server):
    from neo_server_spark.sources.http import http_source

    base, _ = stub_server
    df = http_source(spark, f"{base}/csv", format="csv", header=True)
    rows = {r.tag: r.val for r in df.collect()}
    assert rows == {"a": "1.5", "b": "2"}


def test_http_source_json(spark, stub_server):
    from neo_server_spark.sources.http import http_source

    base, _ = stub_server
    df = http_source(spark, f"{base}/json", format="json")
    assert {r.tag: r.val for r in df.collect()} == {"x": 10, "y": 20}


def test_when_dolog_and_dohttp(spark, stub_server):
    from neo_server_spark.tql import Tql
    from neo_server_spark.tql.doers import do_http, do_log

    base, hits = stub_server
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 150.0), ("c", 200.0)], ["tag", "v"])
    before = len(hits)
    p = Tql(spark).fake(df).when(
        F.col("v") > 100,
        do_http("GET", base + "/alert?tag={tag}"))
    # stream unchanged by WHEN
    assert p.to_df().count() == 3
    got = [h for h in hits[before:] if h[1].startswith("/alert")]
    assert sorted(h[1] for h in got) == ["/alert?tag=b", "/alert?tag=c"]

    p2 = Tql(spark).fake(df).when(F.col("v") > 100, do_log("high:", lambda r: r.tag))
    assert p2.to_df().count() == 3


def test_when_dohttp_post_csv_body(spark, stub_server):
    from neo_server_spark.tql import Tql
    from neo_server_spark.tql.doers import do_http

    base, hits = stub_server
    df = spark.createDataFrame([("b", 150.0)], ["tag", "v"])
    before = len(hits)
    Tql(spark).fake(df).when(
        F.col("v") > 100,
        do_http("POST", base + "/ingest",
                content=lambda r: [r.tag, r.v])).to_df().count()
    posts = [h for h in hits[before:] if h[0] == "POST"]
    assert posts and posts[0][2] == b"b,150\n"  # Go-shortest float encoding


def test_when_doer_error_never_breaks_stream(spark):
    from neo_server_spark.tql import Tql
    from neo_server_spark.tql.doers import do_http

    df = spark.createDataFrame([("a", 999.0)], ["tag", "v"])
    out = Tql(spark).fake(df).when(
        F.col("v") > 0,
        do_http("GET", "http://127.0.0.1:1/unreachable", timeout=0.2)
    ).to_df()
    assert out.count() == 1  # fmWhen recover: log + continue


def test_http_dsl_multipart_inline_body(spark):
    """fm_encoder_test.go TestHttpMultipartWithInlineBody: the HTTP()
    statement ships a multipart/form-data body VERBATIM (inline sections
    after the blank line); the raw response becomes the record."""
    import http.server
    import threading

    got = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            got["ctype"] = self.headers.get("Content-Type")
            got["body"] = self.rfile.read(n).decode()
            self.send_response(200)
            body = b"uploaded"
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from neo_server_spark.tql.script import run_script
        boundary = "----Boundary7MA4YWxkTrZu0gW"
        content = "\n".join([
            f"POST http://127.0.0.1:{port}/upload",
            f"Content-Type: multipart/form-data; boundary={boundary}",
            "",
            f"--{boundary}",
            'Content-Disposition: form-data; name="NAME"',
            "",
            "camera-1",
            f"--{boundary}",
            'Content-Disposition: form-data; name="DATA"; filename="image_file.svg"',
            "Content-Type: image/svg",
            "",
            '<svg xmlns="http://w3.org" width="100" height="100">',
            "</svg>",
            f"--{boundary}--",
        ])
        out = run_script(
            spark,
            "FAKE(once(1))\nHTTP({%s})\nTEXT()" % content)
    finally:
        srv.shutdown()
    assert got["ctype"].startswith("multipart/form-data; boundary=")
    assert 'name="NAME"' in got["body"] and "camera-1" in got["body"]
    assert '<svg xmlns="http://w3.org"' in got["body"]
    assert "HTTP/1.1 200 OK" in out and "uploaded" in out
