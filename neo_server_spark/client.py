"""Thin HTTP client for a running engine server — the counterpart of the
reference's client libraries (machbase/neo-* clients speak the same
/db/query, /db/write, /web/api/tql routes; mods/server/http.go).

Stdlib-only.  Usage::

    c = Client("http://127.0.0.1:5654")
    rows = c.query("select name, time, value from example where name = ?",
                   params=["tag1"])
    c.write("example", [["tag9", 1700000000000000000, 1.5]],
            columns=["name", "time", "value"])
    text = c.tql("FAKE(linspace(0, 1, 3))\\nCSV()")
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

__all__ = ["Client", "ClientError"]


class ClientError(RuntimeError):
    def __init__(self, status: int, reason: str):
        super().__init__(f"HTTP {status}: {reason}")
        self.status, self.reason = status, reason


class Client:
    def __init__(self, base_url: str, timeout: float = 120.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    # ------------------------------------------------------------ plumbing

    def _get(self, path: str, qs: dict) -> tuple[int, str]:
        url = f"{self.base}{path}?{urllib.parse.urlencode(qs)}"
        return self._do(urllib.request.Request(url))

    def _post(self, path: str, body: bytes, ctype: str,
              qs: dict | None = None) -> tuple[int, str]:
        url = f"{self.base}{path}"
        if qs:
            url += "?" + urllib.parse.urlencode(qs)
        return self._do(urllib.request.Request(
            url, data=body, headers={"Content-Type": ctype}))

    def _do(self, req) -> tuple[int, str]:
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.status, r.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    @staticmethod
    def _envelope(status: int, text: str) -> dict:
        try:
            obj = json.loads(text)
        except ValueError:
            raise ClientError(status, text[:200])
        if not obj.get("success", False):
            raise ClientError(status, obj.get("reason", "unknown"))
        return obj

    # -------------------------------------------------------------- verbs

    def query(self, sql: str, params: list | None = None,
              format: str = "json") -> list[list]:
        """Run SQL; returns rows for fetch verbs (json format), or the
        rendered text for csv/markdown/... formats."""
        qs = {"q": sql, "format": format}
        if params is not None:
            qs["p"] = json.dumps(params)
        status, text = self._get("/db/query", qs)
        if format != "json":
            if status != 200:
                raise ClientError(status, text[:200])
            return text
        obj = self._envelope(status, text)
        data = obj.get("data") or {}
        return data.get("rows", data)

    def exec(self, sql: str, params: list | None = None) -> str:
        """Non-fetch SQL (CREATE/INSERT/BACKUP/...); returns the engine's
        user message."""
        qs = {"q": sql}
        if params is not None:
            qs["p"] = json.dumps(params)
        status, text = self._get("/db/query", qs)
        obj = self._envelope(status, text)
        return (obj.get("data") or {}).get("message", "executed.")

    def write(self, table: str, rows: list[list],
              columns: list[str] | None = None,
              method: str = "insert") -> str:
        """Row ingest via /db/write/<table> (ndjson object lines, like the
        reference's write API; ``columns`` names the row positions)."""
        if not columns:
            raise ValueError("write() needs the column names")
        payload = "\n".join(
            json.dumps(dict(zip(columns, r))) for r in rows)
        status, text = self._post(
            f"/db/write/{table}", payload.encode(),
            "application/x-ndjson",
            {"method": method, "format": "ndjson"})
        return self._envelope(status, text).get("reason", "")

    def tql(self, script: str, **params) -> str:
        """Execute a TQL script; returns the sink's rendered output."""
        status, text = self._post("/web/api/tql", script.encode(),
                                  "text/plain", params or None)
        if status != 200:
            raise ClientError(status, text[:200])
        return text

    def facilities(self, kind: str) -> list[dict]:
        """List a facility router's entries: ``kind`` in 'timers',
        'subscribers', 'bridges' (GET /web/api/<kind>)."""
        if kind not in ("timers", "subscribers", "bridges"):
            raise ValueError(f"unknown facility {kind!r}")
        status, text = self._get(f"/web/api/{kind}", {})
        env = self._envelope(status, text)
        if status != 200 or not env.get("success"):
            raise ClientError(status, env.get("reason", text[:200]))
        return env.get("data", [])

    def watch(self, table: str, tags: list[str] | None = None,
              period: str = "1s", keep_alive: str = "30s",
              max_rows: int = 100, timeformat: str = "ns",
              max_events: int | None = None):
        """Subscribe to ``GET /db/watch/:table`` (SSE) and yield one dict
        per ``data:`` event — the reference watch journey from a client
        (tag mode with ``tags``, log mode without).  ``error:`` events
        raise :class:`ClientError`; keep-alive comments are skipped.
        Generator runs until the connection drops or ``max_events``."""
        qs = [("period", period), ("keep-alive", keep_alive),
              ("max-rows", str(max_rows)), ("timeformat", timeformat)]
        qs += [("tag", t) for t in (tags or [])]
        url = (f"{self.base}/db/watch/{urllib.parse.quote(table)}?"
               + urllib.parse.urlencode(qs))
        seen = 0
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            if resp.status != 200:
                raise ClientError(resp.status, resp.read().decode()[:200])
            while max_events is None or seen < max_events:
                line = resp.readline().decode()
                if not line:
                    return                     # server closed the stream
                line = line.rstrip("\n")
                if line.startswith("data: "):
                    seen += 1
                    yield json.loads(line[len("data: "):])
                elif line.startswith("error: "):
                    raise ClientError(200, line[len("error: "):])
