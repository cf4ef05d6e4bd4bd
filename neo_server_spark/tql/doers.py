"""WHEN(...) canned doers: doLog() and doHttp().

Reference: mods/tql/fm_monad.go — LogDoer (2169-2178), HttpDoer
(2181-2338), fmWhen dispatch (2395-2413).  Contract reproduced exactly:
a doer fires per matching record as a SIDE EFFECT; any doer error is
logged and swallowed (fmWhen's recover) — the record stream continues
unchanged either way.

These callables are handed to ``Pipeline.when(cond, doer)``, which runs
them via ``foreach`` on the executors — the side effects scale out rather
than serializing through the driver (the reference runs them on its task
goroutine; the distributed analogue is per-partition execution).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

LOG = logging.getLogger("neo_server_spark.tql.when")


def _fmt_value(v) -> str:
    # Go strconv.FormatFloat(v, 'f', -1, 64) parity for CSV bodies
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def do_log(*args) -> Callable:
    """doLog(args...) — log the args (LogDoer, fm_monad.go:2169-2178).
    A callable arg is evaluated with the record (the expression-engine
    analogue of doLog(value(0), ...))."""
    def doer(row) -> None:
        vals = [a(row) if callable(a) else a for a in args]
        LOG.info(" ".join(str(v) for v in vals))
    return doer


def do_http(method: str, url: str, *header_args: str,
            content=None, timeout: float = 3.0) -> Callable:
    """doHttp(method, url, headers... [, content]) (HttpDoer,
    fm_monad.go:2181-2338).

    - ``url`` may contain ``{column}`` placeholders filled from the record;
    - headers are "Key: Value" strings (reference's strings.Cut parsing);
    - POST content defaults to text/csv with Go-shortest float encoding
      (HttpDoer's csv.Writer branch); a callable content is evaluated with
      the record;
    - every failure is logged, never raised (fmWhen recover).
    """
    import csv as _csv
    import io as _io
    import urllib.request

    headers: dict[str, str] = {}
    for h in header_args:
        k, _, v = h.partition(":")
        if v:
            headers[k.strip()] = v.strip()

    def doer(row) -> None:
        import re as _re
        import urllib.parse as _up
        try:
            vals = row.asDict() if hasattr(row, "asDict") else {}
            # substitute ONLY {column} placeholders that name a record column,
            # URL-encoding the value; literal braces (JSON in a query string)
            # pass through untouched — str.format would raise on them and
            # silently kill every send
            target = _re.sub(
                r"\{(\w+)\}",
                lambda m: _up.quote(str(vals[m.group(1)]), safe="")
                if m.group(1) in vals else m.group(0),
                url)
            body = None
            hdrs = dict(headers)
            if method.upper() == "POST" and content is not None:
                c = content(row) if callable(content) else content
                if "Content-Type" not in hdrs:
                    hdrs["Content-Type"] = "text/csv"
                    buf = _io.StringIO()
                    w = _csv.writer(buf, lineterminator="\n")
                    cells = c if isinstance(c, (list, tuple)) else [c]
                    w.writerow([_fmt_value(x) for x in cells])
                    body = buf.getvalue().encode()
                else:
                    body = c if isinstance(c, bytes) else str(c).encode()
            req = urllib.request.Request(target, data=body,
                                         method=method.upper(), headers=hdrs)
            urllib.request.urlopen(req, timeout=timeout).read()
        except Exception as e:  # fmWhen: log + continue, never kill the stream
            LOG.error("f(WHEN) Doer fail, %s", e)
    return doer
