"""Result encoders (SINK codecs) — CSV / JSON envelope / NDJSON / MARKDOWN /
BOX, matching the reference codec registry's output shapes
(mods/codec/builder.go:68-127).

Two paths:
- **bulk**: ``write_*`` functions use ``df.write`` — distributed, for real
  datasets (the reference's row-at-a-time encoders have no bulk path at all);
- **API**: ``to_*`` functions render a (small, already-limited) result to a
  string exactly shaped like the reference's HTTP codecs — e.g. the JSON
  envelope ``{"data":{"columns":[],"types":[],"rows":[]},"success":true,...}``
  (mods/codec/internal/json/json_encode.go:152, golden shape in
  json_encode_test.go:103).
"""

from __future__ import annotations

import io
import json
import time as _time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _json_default(v):
    """JSON fallback: binary renders as 0x-hex (ndjson/encode.go:126-ish
    BinaryFormat), everything else via str."""
    if isinstance(v, (bytes, bytearray)):
        return "0x" + v.hex()
    return str(v)

#: Spark type -> machbase api.DataType name (spi/machsvr/machsvr.go:919-954)
_TYPE_NAMES = {
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.TimestampType: "datetime",
    T.TimestampNTZType: "datetime",
    T.BinaryType: "binary",
    T.BooleanType: "boolean",
}


def machbase_type(dt: T.DataType) -> str:
    return _TYPE_NAMES.get(type(dt), dt.simpleString())


def _collect(df: DataFrame, limit: int | None):
    if limit is not None:
        df = df.limit(limit)
    return df.columns, [list(r) for r in df.collect()]


#: epoch passthrough formats (mods/util/time_formats.go "epoch" group):
#: keep the time column an integer at the given resolution
_EPOCH_DIV = {"ns": 1, "us": 10**3, "ms": 10**6, "s": 10**9}


def _format_time_cols(df: DataFrame, timeformat: str | None,
                      time_cols: tuple[str, ...], tz: str | None = None) -> DataFrame:
    """Render epoch-ns long time columns per ``timeformat`` — epoch names
    stay integers (divided), named layouts / Go layouts become strings via
    the shared registry; ``tz`` shifts wall-clock rendering (tz() codec
    option).  Shared by the CSV/NDJSON/BOX sinks."""
    if not timeformat:
        return df
    from neo_server_spark.functions import timefn

    for tc in time_cols:
        if tc not in df.columns:
            continue
        if timeformat in _EPOCH_DIV:
            d = _EPOCH_DIV[timeformat]
            if d > 1:
                # integer div: double division of epoch-ns magnitudes rounds
                df = df.withColumn(tc, F.expr(f"`{tc}` div {d}"))
        else:
            df = df.withColumn(tc, timefn.str_time_named(tc, timeformat, tz=tz))
    return df


def format_binary(val: bytes, fmt: str = "hex") -> str:
    """mods/util/types.go BinaryFormatter: base64 / hex / bytes (Go %v)
    / preview (0x + first 5 bytes + '..'); unknown names fall to hex."""
    import base64 as _b64
    if not val:
        return ""
    fmt = (fmt or "hex").lower()
    if fmt == "base64":
        return _b64.b64encode(bytes(val)).decode()
    if fmt == "bytes":
        return "[" + " ".join(str(b) for b in val) + "]"
    if fmt == "preview":
        if len(val) <= 5:
            return "0x" + bytes(val).hex()
        return "0x" + bytes(val[:5]).hex() + ".."
    return "0x" + bytes(val).hex()


def to_csv(df: DataFrame, header: bool = True, delimiter: str = ",",
           precision: int = -1, substitute_null: object = "NULL",
           limit: int | None = None, timeformat: str | None = None,
           time_cols: tuple[str, ...] = ("time",), rownum: bool = False,
           tz: str | None = None, binaryformat: str = "hex") -> str:
    """CSV() sink — string render (mods/codec/internal/csv).

    ``timeformat``: a reference format name or Go layout
    (mods/util/time_formats.go via fx_codec_opts); applied to the epoch-ns
    long columns named in ``time_cols`` BEFORE collect, so the formatting
    runs distributed (date_format, JVM-side), not on the driver.
    ``rownum`` prepends a 1-based ROWNUM column; a float ``substitute_null``
    is formatted at ``precision`` like any other float (both per
    csv_encode_test.go TestCsvEncoder/TestCsvEncoderNullValue)."""
    df = _format_time_cols(df, timeformat, time_cols, tz=tz)
    cols, rows = _collect(df, limit)
    if rownum:
        cols = ["ROWNUM", *cols]
        rows = [(i + 1, *r) for i, r in enumerate(rows)]

    def cell(v) -> str:
        if v is None:
            v = substitute_null
        if isinstance(v, bool):
            return "true" if v else "false"  # Go FormatBool
        if isinstance(v, float):
            return _format_float(v, precision)
        if isinstance(v, (bytes, bytearray)):
            # codec BinaryFormatter rendering; empty byte rows print
            # empty like the reference
            return format_binary(v, binaryformat)
        if isinstance(v, (list, tuple)):
            # csv_encode.go:244-245 default case prints the Go TYPE name
            # (%T) — a slice value renders literally as "[]interface {}"
            return "[]interface {}"
        if isinstance(v, dict):
            return "map[string]interface {}"
        s = str(v)
        # minimal quoting like the reference's writer: a lone empty field
        # stays empty (python csv.writer would emit """"" there)
        if delimiter in s or '"' in s or "\n" in s or "\r" in s:
            return '"' + s.replace('"', '""') + '"'
        return s

    lines = []
    if header:
        lines.append(delimiter.join(cell(c) for c in cols))
    for row in rows:
        lines.append(delimiter.join(cell(v) for v in row))
    return "\n".join(lines) + "\n" if lines else ""


def _format_float(v: float, precision: int = -1) -> str:
    """AppendPrecisionFloat64 parity (mods/codec/internal/float.go:8-38):
    NaN/±Inf tokens; ANY zero (including -0.0) prints unsigned; fixed
    precision pads; default precision renders at 6 decimals then strips
    trailing zeros and the dot (1.0 -> "1", 1.5 -> "1.5",
    0.30000000000000004 -> "0.3")."""
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    if v == 0:
        return f"%.{precision}f" % 0.0 if precision >= 0 else "0"
    if precision >= 0:
        return f"%.{precision}f" % v
    s = "%.6f" % v
    s = s.rstrip("0").rstrip(".")
    return s or "0"


def to_json_envelope(df: DataFrame, limit: int | None = None,
                     transpose: bool = False, rows_flatten: bool = False,
                     rows_array: bool = False, rownum: bool = False,
                     types: list[str] | None = None,
                     columns: list[str] | None = None,
                     json_cols: tuple[str, ...] = (),
                     precision: int = -1,
                     binaryformat: str | None = None) -> str:
    """JSON() sink — the reference HTTP envelope, byte-compatible shape:
    {"data":{"columns":[...],"types":[...],"rows":[...]},"success":true,
     "reason":"success","elapse":"..."}.  ``rows_array`` emits one object per
    row keyed by column name (the rowsArray() option); option precedence and
    the ROWNUM column follow mods/codec/internal/json/json_encode.go:114-126,
    250-262 (rowsArray > transpose > rowsFlatten; rownum is ignored under
    transpose); ``types`` overrides the inferred machbase type names (the
    encoder's SetColumnTypes)."""
    tick = _time.time()
    cols, rows = _collect(df, limit)
    types = list(types) if types else [machbase_type(f.dataType) for f in df.schema.fields]
    if columns is not None:
        # SetResultColumns carry-over: SCRIPT yieldArray without $.result
        # keeps the SOURCE's column list even when rows are wider
        # (fm_script_test js-yieldArray cases); explicit `types` pairs
        # with it, else the inferred list truncates to match
        cols = list(columns)
        types = types[:len(cols)]
    if json_cols:
        # object columns travel as canonical JSON text in the record
        # model — re-embed them as objects (the reference marshals the
        # goja map directly)
        jidx = [i for i, c in enumerate(cols) if c in json_cols]

        def _embed(v):
            try:
                return json.loads(v) if isinstance(v, str) else v
            except ValueError:
                return v
        rows = [tuple(_embed(v) if i in jidx else v
                      for i, v in enumerate(r)) for r in rows]
    if rownum and not transpose:
        cols = ["ROWNUM", *cols]
        types = ["int64", *types]
        rows = [(i + 1, *r) for i, r in enumerate(rows)]
    # AppendJSONValue parity (json_encode.go:164-205): float64 renders
    # through AppendPrecisionFloat64 (NaN/±Inf as quoted tokens, integral
    # doubles without a decimal point, default precision = 6-trimmed),
    # []byte through the BinaryFormatter.  Raw numeric tokens ride a \x00
    # sentinel that the final dump strips back out of the quotes.
    jidx2 = {i for i, c in enumerate(cols) if c in json_cols}

    def _cell(i, v):
        if i in jidx2:
            return v
        if isinstance(v, float):
            if v != v:
                return "NaN"
            if v == float("inf"):
                return "+Inf"
            if v == float("-inf"):
                return "-Inf"
            return "\x00" + _format_float(v, precision) + "\x00"
        if isinstance(v, (bytes, bytearray)) and binaryformat is not None:
            return format_binary(bytes(v), binaryformat)
        return v
    rows = [tuple(_cell(i, v) for i, v in enumerate(r)) for r in rows]
    key = "rows"
    if rows_array:
        # key order inside each object is alphabetical (Go map marshalling)
        data_rows: object = [dict(sorted(zip(cols, r))) for r in rows]
    elif transpose:
        data_rows = [list(c) for c in zip(*rows)] if rows else []
        key = "cols"
    elif rows_flatten:
        data_rows = [v for r in rows for v in r]
    else:
        data_rows = [list(r) for r in rows]
    envelope = {
        "data": {"columns": cols, "types": types, key: data_rows},
        "success": True,
        "reason": "success",
        "elapse": f"{_time.time() - tick:.6f}s",
    }
    out = json.dumps(envelope, default=_json_default, separators=(",", ":"))
    import re as _re
    return _re.sub(r'"\\u0000([^"\\]*)\\u0000"', r"\1", out)


def to_ndjson(df: DataFrame, limit: int | None = None, rownum: bool = False,
              timeformat: str | None = None,
              time_cols: tuple[str, ...] = ("time",),
              tz: str | None = None, precision: int = -1,
              binaryformat: str | None = None) -> str:
    """NDJSON() sink — one JSON object per row, keys in column order with an
    optional leading ROWNUM, time columns rendered per ``timeformat``
    (mods/codec/internal/ndjson/encode.go; goldens in encode_test.go).
    ``timeformat`` "ns"/"s"/… keep epoch integers; named layouts format to
    strings — both via the shared named-format registry, JVM-side.  Floats
    render through AppendPrecisionFloat64 like the JSON envelope (encode.go
    delegates to json.AppendJSONValue)."""
    df = _format_time_cols(df, timeformat, time_cols, tz=tz)
    cols, rows = _collect(df, limit)
    if rownum:
        cols = ["ROWNUM", *cols]
        rows = [(i + 1, *r) for i, r in enumerate(rows)]

    def _cell(v):
        if isinstance(v, float):
            if v != v:
                return "NaN"
            if v == float("inf"):
                return "+Inf"
            if v == float("-inf"):
                return "-Inf"
            return "\x00" + _format_float(v, precision) + "\x00"
        if isinstance(v, (bytes, bytearray)) and binaryformat is not None:
            return format_binary(bytes(v), binaryformat)
        return v
    import re as _re
    out = "\n".join(
        _re.sub(r'"\\u0000([^"\\]*)\\u0000"', r"\1",
                json.dumps(dict(zip(cols, (_cell(v) for v in r))),
                           default=_json_default, separators=(",", ":")))
        for r in rows)
    return out + ("\n" if rows else "")


def _md_cell(v, precision: int = -1) -> str:
    """Markdown cell rendering (md_encode.go:226-310): floats via %f
    (6 decimals) or %.*f with precision; bools via strconv.FormatBool."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v in (float("inf"), float("-inf")):
            return "+Inf" if v > 0 else "-Inf"
        return f"%.{precision}f" % v if precision >= 0 else "%f" % v
    if isinstance(v, (bytes, bytearray)):
        return format_binary(v, "hex")   # md_encode.go []byte rendering
    return str(v)


def to_markdown(df: DataFrame, limit: int | None = None, html: bool = False,
                precision: int = -1) -> str:
    """MARKDOWN([html(bool)][, precision(n)]) sink
    (mods/codec/internal/markdown).

    ``html=True`` renders the goldmark-style xhtml table the reference's
    html(true) option produces (golden: mods/tql/test/markdown_xhtml.txt) —
    one tag per line, ``align="left"`` on non-empty cells only.
    """
    cols, rows = _collect(df, limit)
    if html:
        out = ["<div>", "<table>", "<thead>", "<tr>"]
        out += [f'<th align="left">{c}</th>' for c in cols]
        out += ["</tr>", "</thead>", "<tbody>"]
        for r in rows:
            out.append("<tr>")
            for v in r:
                s = _md_cell(v, precision)
                out.append(f'<td align="left">{s}</td>' if s else "<td></td>")
            out.append("</tr>")
        out += ["</tbody>", "</table>"]
        if not rows:    # md_encode.go:151-152 — tail renders in html too
            out += ["<blockquote>", "<p><em>No record</em></p>",
                    "</blockquote>"]
        out.append("</div>")
        return "\n".join(out) + "\n"
    lines = ["|" + "|".join(str(c) for c in cols) + "|",
             "|" + "|".join(":-----" for _ in cols) + "|"]
    for r in rows:
        lines.append("|" + "|".join(_md_cell(v, precision) for v in r) + "|")
    out = "\n".join(lines) + "\n"
    if not rows:    # md_encode.go:151-152
        out += "\n> *No record*\n"
    return out


def to_box(df: DataFrame, limit: int | None = None, precision: int = -1,
           timeformat: str | None = None, time_cols: tuple[str, ...] = ("time",),
           rownum: bool = False, heading: bool = True,
           style: str = "light", tz: str | None = None) -> str:
    """BOX() sink — the reference's box table
    (mods/codec/internal/box/box_encode.go): uppercased headings, ROWNUM
    right-aligned, data cells left-aligned, NULL for nulls, floats at
    ``precision``, time columns rendered via ``timeformat``; ``style``
    "light" = box-drawing chars (TestBox1), anything else = ASCII +/-/|
    (the encoder's "simple" default, TestNano)."""
    df = _format_time_cols(df, timeformat, time_cols, tz=tz)
    cols, rows = _collect(df, limit)
    light = style == "light"
    H, V = ("─", "│") if light else ("-", "|")
    corners = (("┌", "┬", "┐"), ("├", "┼", "┤"), ("└", "┴", "┘")) if light \
        else (("+", "+", "+"),) * 3

    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, float) and precision >= 0:
            return f"%.{precision}f" % v
        return str(v)

    data = [[fmt(v) for v in r] for r in rows]
    if rownum:
        cols = ["ROWNUM", *cols]
        data = [[str(i + 1), *r] for i, r in enumerate(data)]
    head = [str(c).upper() for c in cols]
    widths = [max(len(head[i]), *(len(r[i]) for r in data)) if data else len(head[i])
              for i in range(len(cols))]

    def line(kind):
        l, m, r = corners[kind]
        return l + m.join(H * (w + 2) for w in widths) + r

    def row_line(cells, right_first):
        parts = []
        for i, c in enumerate(cells):
            parts.append(f" {c:>{widths[i]}} " if (right_first and i == 0)
                         else f" {c:<{widths[i]}} ")
        return V + V.join(parts) + V

    out = [line(0)]
    if heading:
        out.append(row_line(head, False))
        out.append(line(1))
    for r in data:
        out.append(row_line(r, rownum))
    out.append(line(2))
    return "\n".join(out) + "\n"


def to_html(df: DataFrame, limit: int | None = None) -> str:
    """HTML() sink — table render; (mime, bytes) image rows become inline
    data-URI <img> divs like the reference encoder
    (mods/codec/internal/html/html.go:36-55)."""
    import base64

    cols, rows = _collect(df, limit)
    parts: list[str] = []
    table_rows: list[str] = []
    for r in rows:
        if len(r) == 2 and r[0] in ("image/png", "image/jpeg") and isinstance(r[1], (bytes, bytearray)):
            b64 = base64.b64encode(bytes(r[1])).decode()
            parts.append(f'<div><img src="data:{r[0]};base64,{b64}"/></div>')
            continue
        cells = "".join(f"<td>{'' if v is None else v}</td>" for v in r)
        table_rows.append(f"<tr>{cells}</tr>")
    if table_rows:
        head = "".join(f"<th>{c}</th>" for c in cols)
        parts.append(f"<table><thead><tr>{head}</tr></thead><tbody>{''.join(table_rows)}</tbody></table>")
    return "\n".join(parts) + "\n"


def to_text(df: DataFrame, template: str | None = None, limit: int | None = None,
            header: str | None = None, footer: str | None = None) -> str:
    """TEXT() sink — template-driven text render (mods/codec/internal/templ,
    Format TEXT).  ``template`` is a Python format string over column names
    (our analogue of the reference's Go text/template ``.V.col``); ``header``/
    ``footer`` are emitted once before/after the rows — the analogue of the
    reference templates' ``.IsFirst``/``.IsLast`` guards (tql_test.go
    sqlite-to-text).  Default is tab-separated values."""
    cols, rows = _collect(df, limit)
    if template is None:
        body = [ "\t".join("" if v is None else str(v) for v in r) for r in rows]
    else:
        body = [template.format(**dict(zip(cols, r))) for r in rows]
    parts = ([header] if header is not None else []) + body + (
        [footer] if footer is not None else [])
    return "\n".join(parts) + "\n"


def to_chart_spec(df: DataFrame, x: str, ys: list[str] | None = None,
                  kind: str = "line", limit: int | None = None,
                  mark_areas: list[tuple] | None = None,
                  mark_x: list[tuple] | None = None,
                  mark_y: list[tuple] | None = None) -> str:
    """CHART_LINE/BAR/SCATTER sink — emit the echarts option JSON the
    reference's chart codec feeds to the renderer
    (mods/codec/internal/chart/chart.go:294-306).  Rendering itself stays out
    of engine scope; consumers pass this spec to echarts directly.

    ``mark_areas`` = [(from, to, label), …] → series markArea;
    ``mark_x``/``mark_y`` = [(coord, name), …] → series markLine xAxis/yAxis
    entries (chartcompat.go SetMarkAreaNameCoord / SetMarkLine*AxisCoord)."""
    cols, rows = _collect(df, limit)
    ys = ys or [c for c in cols if c != x]
    xi = cols.index(x)
    series = [
        {"type": kind, "name": y, "data": [r[cols.index(y)] for r in rows]}
        for y in ys
    ]
    if mark_areas:
        series[0]["markArea"] = {"data": [
            [{"name": label, "xAxis": a}, {"xAxis": b}]
            for a, b, label in mark_areas]}
    lines = [{"name": n, "xAxis": v, "label": {"formatter": n}} for v, n in (mark_x or [])]
    lines += [{"name": n, "yAxis": v, "label": {"formatter": n}} for v, n in (mark_y or [])]
    if lines:
        series[0]["markLine"] = {"data": lines}
    option = {
        "xAxis": {"type": "category", "data": [r[xi] for r in rows]},
        "yAxis": {"type": "value"},
        "series": series,
    }
    return json.dumps(option, default=_json_default, separators=(",", ":"))


def to_geomap_spec(df: DataFrame, lat: str = "lat", lon: str = "lon",
                   popup: str | None = None, limit: int | None = None) -> str:
    """GEOMAP() sink — leaflet layer spec JSON (mods/codec/internal/geomap):
    one marker object per row."""
    cols, rows = _collect(df, limit)
    la, lo = cols.index(lat), cols.index(lon)
    po = cols.index(popup) if popup else None
    markers = [
        {"type": "marker", "coord": [r[la], r[lo]],
         **({"popup": {"content": str(r[po])}} if po is not None else {})}
        for r in rows
    ]
    return json.dumps(markers, default=_json_default, separators=(",", ":"))


# ---------------------------------------------------------------- bulk writers

def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.option("header", header).mode(mode).csv(path)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet_append(df: DataFrame, path: str) -> None:
    """APPEND(table()) — the high-throughput bulk path (fm_dbsink.go:167-252);
    micro-batch appends land as new parquet files, no rewrite."""
    df.write.mode("append").parquet(path)
