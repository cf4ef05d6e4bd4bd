"""Command-line entrypoint — the engine as a runnable product, mirroring
the reference binary's primary verbs (machbase-neo serve / shell):

    python -m neo_server_spark serve [--host H] [--port P] [--sf-dir D]
                                     [--fs-root D] [--backup-dir D]
    python -m neo_server_spark sql  "select ..." [--sf-dir D] [--format F]
    python -m neo_server_spark tql  script.tql | -  [--sf-dir D]
    python -m neo_server_spark bench

``serve`` starts the HTTP API (http://host:port — /db/query,
/web/api/tql, /db/write, /lakes/*, /metrics/*, /web/api/backup/*) over a
local SparkSession and blocks until Ctrl-C.
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from neo_server_spark.session import get_spark

    spark = get_spark(app_name="neo-server-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_serve(args) -> int:
    from neo_server_spark.server.http_api import EngineHttpServer

    spark = _spark(args)
    srv = EngineHttpServer(spark, sf_dir=args.sf_dir, fs_root=args.fs_root,
                           host=args.host, port=args.port,
                           backup_dir=args.backup_dir)
    port = srv.start()
    print(f"neo-server-spark listening on http://{args.host}:{port}",
          flush=True)
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


def cmd_sql(args) -> int:
    from neo_server_spark.tql.script import TqlRunner

    spark = _spark(args)
    runner = TqlRunner(spark, sf_dir=args.sf_dir,
                       params={"q": args.query})
    sink = args.format.upper()
    script = f"SQL(param('q'))\n{sink}()"
    out = runner.run(script)
    sys.stdout.write(out if isinstance(out, str) else str(out))
    return 0


def cmd_tql(args) -> int:
    from neo_server_spark.tql.script import TqlRunner

    text = (sys.stdin.read() if args.script == "-"
            else open(args.script).read())
    spark = _spark(args)
    runner = TqlRunner(spark, sf_dir=args.sf_dir)
    out = runner.run(text)
    sys.stdout.write(out if isinstance(out, str) else str(out))
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="neo_server_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("serve", help="start the HTTP API server")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=5654)
    ps.add_argument("--sf-dir", default=None)
    ps.add_argument("--fs-root", default=None)
    ps.add_argument("--backup-dir", default=None)
    ps.set_defaults(fn=cmd_serve)

    pq = sub.add_parser("sql", help="run one SQL statement")
    pq.add_argument("query")
    pq.add_argument("--sf-dir", default=None)
    pq.add_argument("--format", default="box",
                    choices=["csv", "json", "ndjson", "markdown", "box",
                             "html", "text"])
    pq.set_defaults(fn=cmd_sql)

    pt = sub.add_parser("tql", help="run a .tql script (or - for stdin)")
    pt.add_argument("script")
    pt.add_argument("--sf-dir", default=None)
    pt.set_defaults(fn=cmd_tql)

    pb = sub.add_parser("bench", help="run the benchmark suite")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    raise SystemExit(main())
