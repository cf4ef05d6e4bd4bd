"""TQL text front-end: parse ``.tql`` scripts and run them on the engine.

Reference surfaces reproduced here:
- statement scanner    mods/tql/script_parser.go:40-110 (line-oriented,
  paren-balanced statements, ``//`` comments, ``#pragma`` lines)
- expression grammar   mods/tql/expression/parse.go (infix with && || ==
  != <= >= < > + - * / % ?? and call syntax)
- function registry    mods/tql/fx_definitions.go:65-334

Execution model: the reference streams records ``(key, values[])`` through
SRC → MAP* → SINK nodes.  The Spark mapping is a DataFrame with positional
value columns ``c0..cN`` plus two hidden columns — ``__key`` (the record
key) and ``__seq`` (arrival order; the reference's channel order) — and a
parallel list of display names (records carry column names out-of-band via
the result header, not in storage).  Every statement lowers onto the
existing operators/codecs modules; nothing here re-implements semantics.

Scale note: this layer is the *scripting* surface.  Sources here are
presentational (FAKE grids, CSV literals/files); the 100 TB paths go
through SQL()/SQL_SELECT() which lower to ranged parquet scans
(io.scan_time_range) and keep Catalyst in charge.  The only driver-side
row materialization in this file is the single header record a
TRANSPOSE(header(true)) consumes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_OPS = ("??", "||", "&&", "==", "!=", "=~", "!~", "<<", ">>",
        "<=", ">=", "<", ">", "**", "+", "-", "*", "/", "%",
        "&", "|", "^", "~", "(", ")", ",", "!", "?", ":")


@dataclass
class Tok:
    kind: str  # num str ident op brace eof
    val: object
    pos: int = 0


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch == "#":  # pragma line (script_parser.go IsPragma)
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if ch in "'\"`":
            quote, j, buf = ch, i + 1, []
            while j < n and src[j] != quote:
                if quote != "`" and src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise SyntaxError(f"unterminated string at {i}")
            toks.append(Tok("str", "".join(buf), i))
            i = j + 1
            continue
        if ch == "{":  # balanced brace blob: FAKE(json({...}))
            depth, j = 1, i + 1
            while j < n and depth:
                c = src[j]
                if c in "'\"`":
                    q = c
                    j += 1
                    while j < n and src[j] != q:
                        j += 2 if src[j] == "\\" and q != "`" else 1
                if c == "{":
                    depth += 1
                elif c == "}":
                    depth -= 1
                j += 1
            toks.append(Tok("brace", src[i + 1:j - 1], i))
            i = j
            continue
        if ch.isdigit() or (ch == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] in ".eE" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                j += 1
            text = src[i:j]
            toks.append(Tok("num", float(text) if any(c in text for c in ".eE")
                            else int(text), i))
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            toks.append(Tok("ident", src[i:j], i))
            i = j
            continue
        if ch == "$" and i + 1 < n and (src[i + 1].isalpha() or
                                        src[i + 1] == "_"):
            # $name — per-record variable reference set by SET()
            # (task_record.go:123-139; task_test.go TestSetVariables)
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            toks.append(Tok("var", src[i + 1:j], i))
            i = j
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Tok("op", op, i))
                i += len(op)
                break
        else:
            raise SyntaxError(f"unexpected character {ch!r} at offset {i}")
    toks.append(Tok("eof", None, n))
    return toks


# --------------------------------------------------------------------------
# parser (precedence climbing) -> tuple AST
# --------------------------------------------------------------------------

# precedence levels mirror expression/operator_table.go infixBindingPowerFor:
# ?? < || < && < all-comparators(one level, left-assoc) < & | ^ < << >> <
# + - < * / % ; ** is right-associative and handled by Parser.power()
_BINARY = [("??",), ("||",), ("&&",),
           ("==", "!=", "<", "<=", ">", ">=", "=~", "!~", "in"),
           ("&", "|", "^"), ("<<", ">>"), ("+", "-"), ("*", "/", "%")]


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val=None) -> Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise SyntaxError(f"expected {val or kind}, got {t.kind}:{t.val!r}")
        return t

    def _at_binop(self, level: int) -> bool:
        t = self.peek()
        if t.kind == "op" and t.val in _BINARY[level]:
            return True
        # `in` is a keyword comparator (operator.go comparatorSymbols)
        return t.kind == "ident" and t.val == "in" and "in" in _BINARY[level]

    def expr(self, level: int = 0):
        if level >= len(_BINARY):
            return self.power()
        left = self.expr(level + 1)
        while self._at_binop(level):
            op = self.next().val
            right = self.expr(level + 1)
            left = ("bin", op, left, right)
        if level == 0 and self.peek().kind == "op" and self.peek().val == "?":
            # ternary cond ? a [: b] — the else is optional and yields
            # null when the condition is false (stage.go parseTernary)
            self.next()
            a = self.expr(0)
            if self.peek().kind == "op" and self.peek().val == ":":
                self.next()
                b = self.expr(0)
            else:
                b = ("ident", "NULL")
            return ("if", left, a, b)
        return left

    def power(self):
        # EXPONENT is right-associative (operator_table.go bp {110,110},
        # pratt_regression_test TestPrattRightAssociativityExponent); a
        # prefix binds tighter (parsePrefix bp 120): -2**2 == 4
        base = self.unary()
        if self.peek().kind == "op" and self.peek().val == "**":
            self.next()
            return ("bin", "**", base, self.power())
        return base

    def unary(self):
        t = self.peek()
        if t.kind == "op" and t.val in ("-", "!", "~"):
            self.next()
            return ("un", t.val, self.unary())
        return self.primary()

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.val)
        if t.kind == "str":
            return ("str", t.val)
        if t.kind == "brace":
            return ("brace", t.val)
        if t.kind == "var":
            return ("var", t.val)
        if t.kind == "op" and t.val == "(":
            inner = self.expr()
            if self.peek().kind == "op" and self.peek().val == ",":
                # parenthesized comma list -> array value, the right-hand
                # side of `in` (stage.go SEPARATE / evaluation.go inStage)
                items = [inner]
                while self.peek().kind == "op" and self.peek().val == ",":
                    self.next()
                    items.append(self.expr())
                self.expect("op", ")")
                return ("list", items)
            self.expect("op", ")")
            return inner
        if t.kind == "ident":
            if self.peek().kind == "op" and self.peek().val == "(":
                self.next()
                args = []
                if not (self.peek().kind == "op" and self.peek().val == ")"):
                    args.append(self.expr())
                    while self.peek().kind == "op" and self.peek().val == ",":
                        self.next()
                        args.append(self.expr())
                self.expect("op", ")")
                return ("call", t.val, args)
            return ("ident", t.val)
        raise SyntaxError(f"unexpected token {t.kind}:{t.val!r}")


def parse_script(src: str) -> list[tuple]:
    """Split a script into top-level statement calls (script_parser.go)."""
    return [node for node, *_ in parse_script_ex(src)]


def parse_script_ex(src: str) -> list[tuple]:
    """Like parse_script but each entry is (node, line, col, raw) with the
    1-based source location and raw statement text — the inputs
    newScriptError formats into compile errors (script_parser.go)."""
    p = Parser(tokenize(src))
    stmts = []
    while p.peek().kind != "eof":
        start = p.peek().pos
        tok = p.peek()
        node = p.expr()
        if node[0] != "call":
            # expression.ParseError rendering (script_parser_test.go
            # TestParseErrorFormatsLocation): absolute source line of the
            # offending token, 1-based column, the token text as `near`
            line = src.count("\n", 0, tok.pos) + 1
            col = tok.pos - (src.rfind("\n", 0, tok.pos) + 1) + 1
            near = _go_v(tok.val) if tok.kind == "num" else str(tok.val)
            raise SyntaxError(
                f"unexpected token '{near}' (line={line}, column={col}, "
                f'near="{near}")')
        end = p.peek().pos if p.peek().kind != "eof" else len(src)
        raw = src[start:end].strip()
        line = src.count("\n", 0, start) + 1
        col = start - (src.rfind("\n", 0, start) + 1) + 1
        stmts.append((node, line, col, raw))
    return stmts


# statement roles (fx_definitions.go:16-45 fxStatementKinds; unlisted
# names default to MAP per StatementKindByFunctionName)
_STMT_ROLES = {
    "SQL": {"SRC", "MAP", "SINK"},
    "SQL_SELECT": {"SRC"}, "QUERY": {"SRC"}, "FAKE": {"SRC"},
    "BYTES": {"SRC"}, "STRING": {"SRC"}, "ARGS": {"SRC"},
    "SCRIPT": {"SRC", "MAP"}, "HTTP": {"SRC", "MAP"},
    "CSV": {"SRC", "SINK"},
    **{name: {"SINK"} for name in (
        "INSERT", "APPEND", "JSON", "NDJSON", "MARKDOWN", "HTML", "TEXT",
        "BOX", "DISCARD", "GEOMAP", "CHART", "CHART_LINE", "CHART_BAR",
        "CHART_SCATTER", "CHART_LINE3D", "CHART_BAR3D", "CHART_SURFACE3D",
        "CHART_SCATTER3D")},
}

_FETCH_VERBS = {"SELECT", "DESC", "DESCRIBE", "WITH"}  # IsFetch


def _script_err(line: int, col: int, msg: str, raw: str) -> ValueError:
    # newScriptError's rendering (script_parser.go / task compile errors)
    return ValueError(f"line {line}, column {col}: {msg} [statement: {raw}]")


def validate_script_structure(stmts_ex: list[tuple]) -> None:
    """SRC -> MAP* -> [SINK] role validation (script_validate.go:5-41).

    Deliberate extension: a script may END WITHOUT a sink — the trailing
    statement's DataFrame becomes the result (our queries() contract), so
    the reference's "no sink exists" error is NOT raised; every other rule
    (head must be SRC-capable, middles MAP-capable, SQL sink refuses
    fetch verbs) applies with the reference's exact error text."""
    if not stmts_ex:
        raise ValueError("no source exists")
    head = stmts_ex[0]
    name = head[0][1]
    if "SRC" not in _STMT_ROLES.get(name, {"MAP"}):
        raise _script_err(head[1], head[2],
                          f'"{name}()" is not applicable for SRC', head[3])
    tail = stmts_ex[-1]
    tail_roles = _STMT_ROLES.get(tail[0][1], {"MAP"})
    tail_is_sink = "SINK" in tail_roles and len(stmts_ex) > 1
    mids = stmts_ex[1:-1] if tail_is_sink else stmts_ex[1:]
    for s in mids:
        nm = s[0][1]
        if "MAP" not in _STMT_ROLES.get(nm, {"MAP"}):
            raise _script_err(s[1], s[2],
                              f'"{nm}()" is not applicable for MAP', s[3])
    if tail_is_sink and tail[0][1] == "SQL" and tail[0][2]:
        arg0 = tail[0][2][0]
        if arg0[0] == "str":
            words = str(arg0[1]).split()
            verb = words[0].upper() if words else ""
            if verb in _FETCH_VERBS:   # fm_dbsink.go:376-380
                raise _script_err(
                    tail[1], tail[2],
                    f'f(SQL) sink does not allow fetch verb "{verb}"',
                    tail[3])


# --------------------------------------------------------------------------
# expression evaluation: python values + Column lifting
# --------------------------------------------------------------------------

def _is_col(v) -> bool:
    return isinstance(v, Column)


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _go_v(v) -> str:
    """Go %v rendering for error messages (true/false, shortest floats)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return str(int(v))
    return str(v)


# typing-failure texts, verbatim from expression/evaluation.go:13-17
def _type_err_logical(v, op):
    return (f"Value '{_go_v(v)}' cannot be used with the logical "
            f"operator '{op}', it is not a bool")


def _type_err_modifier(v, op):
    return (f"Value '{_go_v(v)}' cannot be used with the modifier "
            f"'{op}', it is not a number")


def _type_err_comparator(v, op):
    return (f"Value '{_go_v(v)}' cannot be used with the comparator "
            f"'{op}', it is not a number")


def _type_err_ternary(v, op):
    return (f"Value '{_go_v(v)}' cannot be used with the ternary "
            f"operator '{op}', it is not a bool")


def _type_err_prefix(v, op):
    return f"Value '{_go_v(v)}' cannot be used with the prefix '{op}'"


def _lift(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, (dict, list)):
        # object values travel as canonical JSON text in the record model
        # (see _script_col_type's obj kind; GEOMAP parses them back)
        import json as _j
        return F.lit(_j.dumps(v, separators=(",", ":")))
    return F.lit(v)


def _numeric2(name, pyf, colf):
    def impl(rt, *a):
        if any(_is_col(x) for x in a):
            return colf(*[_lift(x) for x in a])
        try:
            return pyf(*a)
        except ValueError:
            return float("nan")    # Go math.* returns NaN, never panics
        except OverflowError:
            return float("inf")
    return impl


def _log_domain(colf):
    """Go log semantics on the Column path: log(0) = -Inf, log(<0) = NaN
    (Spark returns NULL for both)."""
    def wrapped(c):
        return (F.when(c == 0, F.lit(float("-inf")))
                .when(c < 0, F.lit(float("nan")))
                .otherwise(colf(c)))
    return wrapped


def _log_py(base):
    """Scalar twin of _log_domain."""
    def f(x):
        if x == 0:
            return float("-inf")
        if x < 0:
            return float("nan")
        return base(x)
    return f


def _simplex(seed, *coords):
    """simplex(seed, x[, y]) — EXACT OpenSimplex noise (fm_fake.go:521-538;
    algorithm mods/nums/opensimplex, Kurt Spencer's public-domain
    OpenSimplex).  1 coordinate evaluates Eval2(x, x), 2 evaluate
    Eval2(x, y) — bit-for-bit against the reference's generator (verified
    on its own samples.json.gz vectors).  3+ coordinates (Eval3/Eval4) are
    unused by any reference test or script and not implemented."""
    from neo_server_spark.functions import noisefn
    seed = int(seed)
    if len(coords) > 2:
        raise NotImplementedError("simplex: 3+ dims (Eval3/Eval4) not implemented")
    if not any(_is_col(c) for c in coords):
        return noisefn.simplex(seed, *[float(c) for c in coords])
    cs = [_lift(c).cast("double") for c in coords]
    return noisefn.simplex_udf(seed, len(cs))(*cs)


def _str_replace(v, old: str, new: str, n: int):
    """strings.Replace semantics: n<0 replaces all, else first n."""
    if not _is_col(v):
        return v.replace(old, new) if n < 0 else v.replace(old, new, n)
    c = _lift(v)
    if n < 0:
        return F.replace(c, F.lit(old), F.lit(new))
    # count-limited: compose `locate + splice` n times (n is a small literal)
    for _ in range(n):
        pos = F.instr(c, old)
        c = F.when(
            pos > 0,
            F.concat(F.substring(c, 1, pos - 1), F.lit(new),
                     F.substring(c, pos + len(old), 2**30)),
        ).otherwise(c)
    return c


def _go_sprintf(fmt: str, args) -> str:
    """Minimal Go fmt.Sprintf: %q quotes like Go, %v generic, the numeric
    verbs map to Python %-formatting ('%.f' == '%.0f')."""
    import json as _json
    import re as _re

    out, ai = [], 0
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        m = _re.match(r"%([-+0# ]*\d*(?:\.\d*)?)([a-zA-Z%])", fmt[i:])
        if not m:
            out.append(ch)
            i += 1
            continue
        flags, verb = m.group(1), m.group(2)
        i += m.end()
        if verb == "%":
            out.append("%")
            continue
        a = args[ai]
        ai += 1
        if verb == "q":
            out.append(_json.dumps(str(a)))
        elif verb == "v":
            out.append(str(a))
        else:
            if flags.endswith("."):
                flags += "0"  # Go '%.f' == zero-precision float
            out.append(("%" + flags + verb) % a)
    return "".join(out)


#: zone shorthands the reference accepts (mods/util tz parsing)
_TZ_ALIASES = {"KST": "Asia/Seoul", "JST": "Asia/Tokyo", "Local": "UTC"}

_TIME_UNIT_NS = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}


def _dur_ns(d) -> int:
    """Duration literal -> ns: ints pass through, Go-style strings parse
    ('1s', '500ms', '100us', '1h30m' — mods/util parse via timefn)."""
    if isinstance(d, str):
        from neo_server_spark.functions.timefn import parse_duration
        return parse_duration(d)
    return int(d)


def _now_spec(rt, s: str) -> int:
    """'now' / 'now+10s' / 'now-1h' time spec -> epoch ns against the
    runner's (injectable) clock (fm_time.go time('now ± dur'))."""
    s = s.strip()
    if s == "now":
        return rt.now_ns
    if s.startswith("now"):
        return rt.now_ns + _dur_ns(s[3:].replace(" ", ""))
    raise ValueError(f"time() unknown spec {s!r}")


def _epoch_to_ns(c, mult: int):
    """Numeric epoch in a unit -> epoch-ns long WITHOUT a double round-trip:
    epoch-ns/us magnitudes exceed 2^53, so casting through double corrupts
    them by up to ~256 ns.  Integer inputs cast straight to long; only
    inputs that are actually fractional (sub-second 's'/'ms' values, where
    the fraction carries information) take the double path."""
    as_long = c.cast("string").try_cast("long")
    return F.coalesce(
        as_long * F.lit(mult),
        (c.cast("double") * F.lit(mult)).cast("long"),
    ).cast("long")


def _parse_time(rt, v, fmt="ns", tz="UTC"):
    """parseTime(v, unit|name|layout[, tz]) → epoch-ns long (fx:parseTime;
    func_test.go TestParseTime: named formats parse as wall clock in the
    given zone)."""
    if fmt in _TIME_UNIT_NS:
        mult = _TIME_UNIT_NS[fmt]
        if _is_col(v):
            return _epoch_to_ns(v, mult)
        if isinstance(v, float):
            # int(1.5) would silently truncate the fraction — scale first
            return int(v * mult) if not v.is_integer() else int(v) * mult
        try:
            return int(v) * mult
        except (TypeError, ValueError):
            return int(float(v) * mult)
    from neo_server_spark.functions.timefn import (parse_time_named,
                                                   parsetime_py)
    tzname = _tz_of((tz,)) if tz is not None else None
    if _is_col(v):
        return parse_time_named(_lift(v), str(fmt), tzname)
    return parsetime_py(str(v), str(fmt), tzname)


class _LatLonV:
    """latlon(lat, lon) value (nums.NewLatLon) — consumed by the geo*
    constructors; renders as [lat,lon] like the reference's CSV arm."""

    __slots__ = ("lat", "lon")

    def __init__(self, lat, lon):
        self.lat, self.lon = float(lat), float(lon)

    def __repr__(self):
        from neo_server_spark.codecs.geomap import _num
        return f"[{_num(self.lat)},{_num(self.lon)}]"


def _geo_props(opt):
    """Geo constructor option: a JSON/'k:v' string or map
    (nums.NewGeoPropertiesParse)."""
    if isinstance(opt, dict):
        return dict(opt)
    if isinstance(opt, str) and opt.strip():
        import json as _j
        s = opt.strip()
        if not s.startswith("{"):
            s = "{" + s + "}"
        try:
            return _j.loads(s)
        except ValueError:
            return {}
    return {}


def _geo_feature(typ, coords, opt=None, extra_props=None):
    props = _geo_props(opt)
    if extra_props:
        for k, v in extra_props.items():
            props.setdefault(k, v)
    out = {"type": "Feature",
           "geometry": {"type": typ, "coordinates": coords}}
    if props:
        out["properties"] = props
    return out


def _lls(args):
    pts = [a for a in args if isinstance(a, _LatLonV)]
    opt = next((a for a in args if not isinstance(a, _LatLonV)), None)
    return [[p.lon, p.lat] for p in pts], opt


def _install_geo_scalars():
    """latlon + geo* constructors (fx_definitions.go:112-119,
    nums/geography.go): GeoJSON Feature dicts ([lon,lat] coordinate order,
    MarshalGeoJSON parity) for the geometry forms; leaflet layer dicts
    ([lat,lon]) for the marker forms — both consumable by GEOMAP and the
    JSON record path."""
    SCALARS.update({
        "latlon": lambda rt, lat, lon: _LatLonV(lat, lon),
        "geoPoint": lambda rt, ll, opt=None: _geo_feature(
            "Point", [ll.lon, ll.lat], opt),
        "geoCircle": lambda rt, ll, radius, opt=None: _geo_feature(
            "Point", [ll.lon, ll.lat], opt,
            {"radius": float(radius)}),
        "geoLineString": lambda rt, *a: _geo_feature(
            "LineString", *_lls(a)),
        "geoMultiPoint": lambda rt, *a: _geo_feature(
            "MultiPoint", *_lls(a)),
        "geoPolygon": lambda rt, *a: _geo_feature(
            "Polygon", [_lls(a)[0]], _lls(a)[1]),
        "geoPointMarker": lambda rt, ll, opt=None: {
            "type": "marker", "coordinates": [ll.lat, ll.lon],
            **({"properties": _geo_props(opt)} if _geo_props(opt) else {})},
        "geoCircleMarker": lambda rt, ll, radius, opt=None: {
            "type": "circleMarker", "coordinates": [ll.lat, ll.lon],
            "properties": {**_geo_props(opt), "radius": float(radius)}},
    })


def _element_fn(*args):
    """element(v0, …, vN, idx) — pick the idx-th value (fm_fake.go
    fmElement; func_test.go TestElement): numbers widen to float64,
    strings/bools pass through, index must be an integral number."""
    if len(args) < 2:
        raise ValueError(f"f(element) invalud number of args (n:{len(args)})")
    idx = args[-1]
    if _is_col(idx):
        # per-record index: element_at over an array of the candidates
        # (same-typed values; out-of-range yields NULL instead of the
        # reference's per-record error — documented deviation)
        vals = [_lift(v) for v in args[:-1]]
        return F.element_at(F.array(*vals), idx.cast("int") + 1)
    if isinstance(idx, bool) or not isinstance(idx, (int, float)) or (
            isinstance(idx, float) and not idx.is_integer()):
        raise TypeError(
            "f(element) index of element should be int, "
            f"but {type(idx).__name__}")
    idx = int(idx)
    vals = args[:-1]
    if idx >= len(vals) or idx < 0:
        raise ValueError(f"f(element) out of index {idx} / {len(vals)}")
    v = vals[idx]
    if _is_col(v):
        return v
    if isinstance(v, bool) or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _sprintf_col(fmt: str, args) -> Column:
    """strSprintf over record values: Go verbs -> java.util.Formatter for
    format_string ('%v' -> '%s'; '%.f' -> '%.0f')."""
    import re as _re

    from neo_server_spark.functions.strfn import str_sprintf
    jfmt = _re.sub(r"%\.([a-zA-Z])", r"%.0\1", fmt).replace("%v", "%s")
    return str_sprintf(jfmt, *[_lift(a) for a in args])


def _str_sub(rt, s, start=None, length=None):
    """strSub with the reference's exact rune semantics (fm_fake.go:592):
    negative offset from the end ('' past the start), offset past the end
    '', negative/absent count to-the-end."""
    if _is_col(s):
        from neo_server_spark.functions.strfn import str_sub
        if start is None:
            return _lift(s)
        return str_sub(_lift(s), int(start), None if length is None
                       else int(length))
    if start is None:
        return s
    off, n = int(start), len(s)
    count = -1 if length is None or int(length) < 0 else int(length)
    if off < 0:
        if -off >= n:
            return ""
        idx = n + off
    else:
        if off >= n:
            return ""
        idx = off
    return s[idx:] if count == -1 else s[idx:idx + count]


SCALARS = {
    "sin": _numeric2("sin", math.sin, F.sin),
    "cos": _numeric2("cos", math.cos, F.cos),
    "tan": _numeric2("tan", math.tan, F.tan),
    "exp": _numeric2("exp", math.exp, F.exp),
    "log": _numeric2("log", _log_py(math.log), _log_domain(F.log)),
    "log10": _numeric2("log10", _log_py(math.log10), _log_domain(F.log10)),
    "sqrt": _numeric2("sqrt", math.sqrt, F.sqrt),
    "abs": _numeric2("abs", abs, F.abs),
    "floor": _numeric2("floor", math.floor, F.floor),
    "ceil": _numeric2("ceil", math.ceil, F.ceil),
    "pow": _numeric2("pow", pow, F.pow),
    "round": lambda rt, v, *sc: (F.round(_lift(v), int(sc[0]) if sc else 0)
                                 if _is_col(v) else round(v, *map(int, sc))),
    # Go returns float64 from len() (func_test.go TestLen: 4.0)
    "len": lambda rt, s: (F.length(s).cast("double") if _is_col(s)
                          else float(len(s))),
    "element": lambda rt, *a: _element_fn(*a),
    "strToUpper": lambda rt, s: F.upper(s) if _is_col(s) else s.upper(),
    "strToLower": lambda rt, s: F.lower(s) if _is_col(s) else s.lower(),
    "strTrimSpace": lambda rt, s: F.trim(s) if _is_col(s) else s.strip(),
    "strSub": _str_sub,
    "strSprintf": lambda rt, fmt, *a: (
        _sprintf_col(fmt, a) if any(_is_col(x) for x in a)
        else _go_sprintf(fmt, a)),
    "strTrimPrefix": lambda rt, v, pre: (
        F.when(_lift(v).startswith(pre),
               _lift(v).substr(F.lit(len(pre) + 1), F.length(_lift(v))))
        .otherwise(_lift(v))
        if _is_col(v) else (v[len(pre):] if v.startswith(pre) else v)),
    "strTrimSuffix": lambda rt, v, suf: (
        F.when(_lift(v).endswith(suf),
               _lift(v).substr(F.lit(1), F.length(_lift(v)) - F.lit(len(suf))))
        .otherwise(_lift(v))
        if _is_col(v) else (v[:-len(suf)] if v.endswith(suf) else v)),
    "strReplace": lambda rt, v, old, new, n=-1: _str_replace(v, old, new, int(n)),
    "strReplaceAll": lambda rt, v, old, new: _str_replace(v, old, new, -1),
    "strHasPrefix": lambda rt, v, pre: (_lift(v).startswith(pre) if _is_col(v)
                                        else v.startswith(pre)),
    "strHasSuffix": lambda rt, v, suf: (_lift(v).endswith(suf) if _is_col(v)
                                        else v.endswith(suf)),
    "strContains": lambda rt, v, sub: (_lift(v).contains(sub) if _is_col(v)
                                       else sub in v),
    # parse* are LENIENT like Go's strconv in the reference pipeline —
    # try_cast yields NULL on malformed input instead of failing the job
    # under ANSI mode (a CASE branch evaluates casts eagerly)
    "parseFloat": lambda rt, v, *a: (_lift(v).try_cast("double") if _is_col(v)
                                     else float(v)),
    "parseBool": lambda rt, v: (_lift(v).try_cast("boolean") if _is_col(v)
                                else str(v).lower() == "true"),
    "parseInt": lambda rt, v, *a: (_lift(v).try_cast("long") if _is_col(v)
                                   else int(str(v), *map(int, a))),
    "parseTime": _parse_time,
    "simplex": lambda rt, seed, *cs: _simplex(seed, *cs),
    "random": lambda rt: F.rand(),
    "time": lambda rt, spec="now": (
        _lift(spec).cast("long") if _is_col(spec)
        else _now_spec(rt, spec) if isinstance(spec, str)
        else int(spec)),
    "timeAdd": lambda rt, t, delta: (
        (_lift(t) + F.lit(_dur_ns(delta))) if _is_col(t)
        else int(t) + _dur_ns(delta)),
    "roundTime": lambda rt, t, dur: (
        (lambda d: (_lift(t).cast("long") - F.pmod(_lift(t).cast("long"), F.lit(d)))
         if _is_col(t) else int(t) - int(t) % d)(_dur_ns(dur))),
    "value": lambda rt, n=None: rt.value_col(int(n) if n is not None else 0),
    "key": lambda rt: F.col("__key"),
    "payload": lambda rt: rt.payload,
    # param(): 1 value -> the scalar, several -> the list, none -> null
    # (fm_context.go:101-109 GetRequestParam)
    "param": lambda rt, name: (
        (lambda v: v[0] if isinstance(v, (list, tuple)) and len(v) == 1
         else (list(v) if isinstance(v, (list, tuple)) and v else
               (v if not isinstance(v, (list, tuple)) else None)))
        (rt.params.get(name))),
    # args() / args(n): the task's invocation arguments (fm_context.go
    # fmArgsParam; set by do() sub-pipelines)
    "args": lambda rt, n=None: (
        list(rt.arg_values) if n is None
        else (rt.arg_values[int(n)] if 0 <= int(n) < len(rt.arg_values)
              else None)),
    "context": lambda rt: None,
    # type constructors (fx: field()/column() coercion types)
    "doubleType": lambda rt: "double",
    "floatType": lambda rt: "double",
    "stringType": lambda rt: "string",
    "datetimeType": lambda rt, *a: ("datetime", *a),
    "timeType": lambda rt, *a: ("datetime", *a),
    "intType": lambda rt: "long",
    "longType": lambda rt: "long",
    "boolType": lambda rt: "bool",
}

# ---- round-5 registry completion: the remaining fx_definitions.go names
# (trig/hyperbolic family fx_definitions.go:79-105, strIndex/strLastIndex
# fm_fake.go:632-638, regexp/glob fm_monad.go:2144-2167, strTime + the
# timeYear..timeWeekDay extractors and timeUnix* fm_time.go:54-322, tz
# fm_time.go:394).  All delegate to functions/mathfn|strfn|timefn.


def _tz_of(args):
    """Pick the tz(...) argument out of an extractor's trailing args."""
    from neo_server_spark.functions.timefn import resolve_tz
    for a in args:
        if isinstance(a, tuple) and len(a) == 2 and a[0] == "tz":
            return a[1]
        if isinstance(a, str):
            return resolve_tz(a)
    return None


def _time_extract(colfn, pyfn, tz_invariant=False):
    """Factory for timeYear..timeWeekDay: Column path extracts via timefn
    (optionally wall-clock-shifted into tz), scalar path via datetime."""
    from neo_server_spark.functions import timefn as T

    def impl(rt, t, *args):
        tzname = _tz_of(args)
        if _is_col(t):
            c = _lift(t).cast("long")
            if tzname and tzname != "UTC" and not tz_invariant:
                # shift the epoch so UTC extraction reads tz wall clock;
                # zone offsets are minute-aligned so sub-second is safe
                ts = F.from_utc_timestamp(T.to_timestamp_ns(c), tzname)
                c = T.from_timestamp(ts)
            return colfn(c)
        import datetime
        import zoneinfo
        ns = int(t)
        dt = datetime.datetime.fromtimestamp(
            ns // T.SECOND, tz=zoneinfo.ZoneInfo(tzname or "UTC"))
        return pyfn(dt, ns)
    return impl


def _time_unix(unit_ns):
    def impl(rt, t):
        from neo_server_spark.functions.timefn import _div
        if _is_col(t):
            c = _lift(t).cast("long")
            # integer-field division — a double-valued `/` loses the low
            # bits of epoch-ns (> 2^53) and yields off-by-one millis
            return c if unit_ns == 1 else _div(c, unit_ns)
        return int(t) // unit_ns
    return impl


def _str_time(rt, t, fmt="ns", *args):
    from neo_server_spark.functions import timefn as T
    tzname = _tz_of(args)
    fmt = str(fmt)
    if fmt in _TIME_UNIT_NS:
        v = _time_unix(_TIME_UNIT_NS[fmt])(rt, t)
        return v.cast("string") if _is_col(v) else str(v)
    if _is_col(t):
        return T.str_time_named(_lift(t).cast("long"), fmt, tzname)
    return T.strtime_py(int(t), fmt, tzname)


def _escape_param(s: str) -> str:
    import urllib.parse
    return urllib.parse.quote_plus(s)


def _dict_fn(rt, *args):
    """dict('k', v, ...) -> map value (fm_monad.go:339-353; task_test.go
    TestDict).  Literal values build a Python dict; Column values build a
    to_json(struct(...)) column — either way the record carries canonical
    JSON text, and the JSON sink re-embeds it as an object."""
    pairs = []
    for i in range(0, len(args), 2):
        if i + 1 >= len(args):
            raise ValueError(
                f"dict() name {args[i]!r} doesn't match with any value")
        if not isinstance(args[i], str):
            raise TypeError(
                f"dict() name should be string, got args[{i}] "
                f"{type(args[i]).__name__}")
        pairs.append((args[i], args[i + 1]))
    if any(_is_col(v) for _, v in pairs):
        return F.to_json(F.struct(*[_lift(v).alias(k) for k, v in pairs]))
    return dict(pairs)


def _glob_rx(pattern: str) -> str:
    import re as _re
    return "^" + _re.escape(pattern).replace(r"\*", ".*") \
        .replace(r"\?", ".") + "$"


def _install_round5_scalars():
    import re as _re

    from neo_server_spark.functions import mathfn, strfn
    from neo_server_spark.functions import timefn as T
    from neo_server_spark.functions.timefn import resolve_tz

    SCALARS.update({
        "acos": _numeric2("acos", math.acos, F.acos),
        "acosh": _numeric2("acosh", math.acosh, F.acosh),
        "asin": _numeric2("asin", math.asin, F.asin),
        "asinh": _numeric2("asinh", math.asinh, F.asinh),
        "atan": _numeric2("atan", math.atan, F.atan),
        "atanh": _numeric2("atanh", math.atanh, F.atanh),
        "cosh": _numeric2("cosh", math.cosh, F.cosh),
        "sinh": _numeric2("sinh", math.sinh, F.sinh),
        "tanh": _numeric2("tanh", math.tanh, F.tanh),
        "log2": _numeric2("log2", _log_py(math.log2), _log_domain(F.log2)),
        "exp2": _numeric2("exp2", lambda x: 2.0 ** x, mathfn.exp2),
        "pow10": _numeric2("pow10", lambda x: 10.0 ** x, mathfn.pow10),
        "trunc": _numeric2("trunc", lambda x: float(math.trunc(x)),
                           mathfn.trunc),
        "mod": _numeric2("mod", math.fmod, mathfn.mod),
        "remainder": _numeric2("remainder", math.remainder,
                               mathfn.remainder),
        # BYTE indexes (Go strings.Index/LastIndex — fm_fake.go:632-638)
        "strIndex": lambda rt, s, sub: (
            strfn.str_index(_lift(s), str(sub)) if _is_col(s)
            else s.encode().find(str(sub).encode())),
        "strLastIndex": lambda rt, s, sub: (
            strfn.str_last_index(_lift(s), str(sub)) if _is_col(s)
            else s.encode().rfind(str(sub).encode())),
        "regexp": lambda rt, pat, v: (
            strfn.regexp(str(pat), _lift(v)) if _is_col(v)
            else _re.search(str(pat), str(v)) is not None),
        "glob": lambda rt, pat, v: (
            strfn.glob(str(pat), _lift(v)) if _is_col(v)
            else _re.match(_glob_rx(str(pat)), str(v)) is not None),
        "strTime": _str_time,
        "tz": lambda rt, name: ("tz", resolve_tz(str(name))),
        # Go url.QueryEscape: space -> '+' (fm_context.go:166)
        "escapeParam": lambda rt, s: _escape_param(str(s)),
        "dict": _dict_fn,
        "timeUnix": _time_unix(10**9),
        "timeUnixMilli": _time_unix(10**6),
        "timeUnixMicro": _time_unix(10**3),
        "timeUnixNano": _time_unix(1),
        "timeYear": _time_extract(T.time_year, lambda dt, ns: dt.year),
        "timeMonth": _time_extract(T.time_month, lambda dt, ns: dt.month),
        "timeDay": _time_extract(T.time_day, lambda dt, ns: dt.day),
        "timeHour": _time_extract(T.time_hour, lambda dt, ns: dt.hour),
        "timeMinute": _time_extract(T.time_minute, lambda dt, ns: dt.minute),
        "timeSecond": _time_extract(T.time_second, lambda dt, ns: dt.second),
        "timeNanosecond": _time_extract(
            T.time_nanosecond, lambda dt, ns: ns % 10**9, tz_invariant=True),
        "timeISOYear": _time_extract(
            T.time_isoyear, lambda dt, ns: dt.isocalendar()[0]),
        "timeISOWeek": _time_extract(
            T.time_isoweek, lambda dt, ns: dt.isocalendar()[1]),
        "timeYearDay": _time_extract(
            T.time_yearday, lambda dt, ns: dt.timetuple().tm_yday),
        "timeWeekDay": _time_extract(
            T.time_weekday, lambda dt, ns: (dt.weekday() + 1) % 7),
    })


_install_round5_scalars()
_install_geo_scalars()

_CONSTS = {"PI": math.pi, "true": True, "false": False, "NULL": None,
           "nil": None, "E": math.e}


# --------------------------------------------------------------------------
# runner
# --------------------------------------------------------------------------

@dataclass
class _State:
    df: DataFrame | None = None
    names: list = field(default_factory=list)  # display names (None = default)
    times: set = field(default_factory=set)    # positions holding time-typed
    #   values (the reference tags values as time.Time; CSV timeformat()
    #   applies to those regardless of column name)
    key_name: str = "ROWNUM"  # the key's display name when PUSHKEY surfaces
    #   it as a value (fakes: MakeColumnRownum; SQL sources: first column)
    jsons: set = field(default_factory=set)  # positions holding OBJECT
    #   values serialized as canonical JSON text (dict()/geo*/SCRIPT dict
    #   yields) — the JSON sink re-embeds them as objects
    slices: set = field(default_factory=set)  # positions holding Go SLICE
    #   values ([]any) — the CSV encoder's default %T case renders them
    #   literally as "[]interface {}" (csv_encode.go:244-245)
    gostrs: set = field(default_factory=set)  # positions holding
    #   DYNAMICALLY-TYPED values stringified with Go %v (mixed-type
    #   ternaries): sinks with type-specific float formatting (markdown
    #   %f) re-apply it to values that parse back as numbers
    env_names: list | None = None  # JSON-envelope column-list override:
    #   SCRIPT without $.result keeps the SOURCE's ResultColumns even
    #   when yielded rows are wider (fm_script_test js-yieldArray);
    #   $.result columns/types land here verbatim
    env_types: list | None = None


class _Inflight:
    """$.inflight() record-variable accessor (TestScriptSystemInflight)."""

    _js_host = True

    def __init__(self, runner: "TqlRunner"):
        self._runner = runner

    def set(self, name, value):
        self._runner.vars[str(name)] = value

    def get(self, name):
        v = self._runner.vars.get(str(name))
        return None if _is_col(v) else v


class _Dollar:
    """The ``$`` context object SCRIPT blocks see (fm_script.go:180-260)."""

    _js_host = True

    def __init__(self, runner: "TqlRunner"):
        from neo_server_spark.tql import jslite

        self._runner = runner
        self.rows: list[tuple] = []     # (key, [values]) in yield order
        self.key = None
        self.values: list = []
        # $.params.name: single-valued params collapse to the scalar,
        # repeated ones stay lists (fm_script js-params; GetRequestParam)
        self.params = {
            k: (v[0] if isinstance(v, (list, tuple)) and len(v) == 1
                else (list(v) if isinstance(v, (list, tuple)) else v))
            for k, v in runner.params.items()}
        self.payload = runner.payload if runner.payload is not None \
            else jslite.UNDEFINED
        self.result = jslite.UNDEFINED
        # 'yield' is a Python keyword — attach dynamically
        setattr(self, "yield", self._yield)

    def inflight(self):
        """$.inflight() (fm_script script_types): set()/get() bridge the
        record-variable store SET()/$name use.  get() of a variable bound
        to a column EXPRESSION (not a literal) returns null — the serial
        VM has no per-record view of unevaluated columns."""
        return _Inflight(self._runner)

    def _yield(self, *vals):
        # $.yield(...): key = inflight key (or yield ordinal as SRC)
        key = self.key if self.key is not None else len(self.rows) + 1
        self.rows.append((key, list(vals)))

    def yieldKey(self, key, *vals):
        self.rows.append((key, list(vals)))

    def yieldArray(self, arr):
        if not isinstance(arr, list):
            raise TypeError("$.yieldArray expects an array")
        key = self.key if self.key is not None else len(self.rows) + 1
        self.rows.append((key, list(arr)))

    def db(self):
        """$.db() (fm_script.go:628-712): query routes through the engine's
        SQL surface (lake dialect over the registered tables); exec points
        at the INSERT/APPEND statements — there is no raw-DML path here."""
        return _DollarDB(self)

    def request(self, url, opts=None):
        """$.request(url, option).do(fn) (fm_script.go:414-580)."""
        return _DollarRequest(str(url), opts if isinstance(opts, dict) else {})

    def js_set(self, name, val):
        setattr(self, name, val)


def _require_http_url(url: str) -> str:
    """Reject non-http(s) schemes before urlopen.  The reference's Go
    net/http client only speaks http/https; urllib additionally handles
    file:// and ftp://, which would hand untrusted .tql scripts an
    arbitrary local-file read."""
    import urllib.parse
    scheme = urllib.parse.urlsplit(str(url)).scheme.lower()
    if scheme not in ("http", "https"):
        raise ValueError(f"HTTPError unsupported URL scheme {scheme!r}")
    return str(url)


class _DollarRequest:
    """$.request(url, {method, headers, body}).do(function(rsp){...}) with
    rsp.status/statusText/headers/url/ok/error() and the rsp.text/blob/
    json/csv body readers calling back per unit (fm_script.go:414-580:
    csv -> one callback per record, json -> per top-level JSON document,
    text/blob -> once with the whole body)."""

    _js_host = True

    _METHODS = ("GET", "POST", "PUT", "DELETE")

    def __init__(self, url: str, opts: dict):
        self.url = url
        self.opts = opts

    def do(self, callback):
        import csv as _csv
        import io as _io
        import json as _json
        import urllib.request

        from neo_server_spark.tql import jslite

        method = str(self.opts.get("method", "GET")).upper()
        if method not in self._METHODS:
            raise ValueError(f"HTTPError unsupported method {method!r}")
        headers = self.opts.get("headers") or {}
        body = str(self.opts.get("body", ""))
        # the reference attaches the body for every method, not just
        # POST/PUT (http.NewRequest with a body reader)
        data = body.encode() if body else None
        req = urllib.request.Request(_require_http_url(self.url),
                                     method=method, data=data)
        for k, v in headers.items():
            req.add_header(str(k), str(v))
        err, raw, status, reason, hdrs = None, None, None, None, {}
        try:
            with urllib.request.urlopen(req, timeout=10.0) as r:
                raw, status = r.read(), r.status
                reason = f"{r.status} {r.reason}"
                hdrs = dict(r.headers.items())
        except Exception as e:  # error surfaces via rsp.error(), never raises
            err = e

        from neo_server_spark.tql import doers as D

        def bodyfn(typ):
            def run(cb):
                if err is not None or raw is None:
                    return jslite.UNDEFINED
                text = raw.decode("utf-8", "replace")
                try:
                    if typ in ("text", "blob"):
                        cb(text)
                    elif typ == "csv":
                        for row in _csv.reader(_io.StringIO(text),
                                               skipinitialspace=True):
                            cb(list(row))
                    elif typ == "json":
                        dec = _json.JSONDecoder()
                        s, idx = text.strip(), 0
                        while idx < len(s):
                            obj, idx = dec.raw_decode(s, idx)
                            cb(obj)
                            while idx < len(s) and s[idx] in " \t\r\n":
                                idx += 1
                except (ValueError, _csv.Error) as ex:
                    # parse errors log and continue — the reference returns
                    # a GoError value, it never aborts the task
                    D.LOG.error("HTTPError %s", ex)
                return jslite.UNDEFINED
            return run

        rsp = {
            "url": self.url,
            "status": status,
            "statusText": reason,
            "headers": hdrs,
            "ok": err is None and status is not None and 200 <= status < 300,
            "error": lambda: (jslite.UNDEFINED if err is None else str(err)),
        }
        for t in ("text", "blob", "json", "csv"):
            rsp[t] = bodyfn(t)
        callback(rsp)
        return jslite.UNDEFINED


def _db_sink_envelope(message: str, tick: float) -> str:
    """The Result JSON a db sink renders (task.go:352-368 MarshalJSON +
    http_query.go:926 ctx.JSON for IsDbSink results):
    {"success","reason","elapse","data":{"message"}}."""
    import json as _json
    import time as _time
    return _json.dumps(
        {"success": True, "reason": "success",
         "elapse": f"{_time.time() - tick:.6f}s",
         "data": {"message": message}}, separators=(",", ":"))


def _split_sql_placeholders(sql: str) -> list[str]:
    """Split *sql* on '?' placeholders, ignoring question marks inside
    single-quoted string literals and double-quoted identifiers.  Handles
    '' quote doubling and backslash escapes (Spark SQL honors both)."""
    parts, buf = [], []
    i, n, quote = 0, len(sql), None
    while i < n:
        ch = sql[i]
        if quote is not None:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(sql[i + 1])
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and sql[i + 1] == quote:  # '' doubling
                    buf.append(quote)
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "?":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


class _DollarDB:
    _js_host = True

    def __init__(self, dollar: "_Dollar"):
        self._dollar = dollar

    def query(self, sql, *params):
        return _DollarDBQuery(self._dollar, str(sql), params)

    def exec(self, sql, *params):
        """CREATE/INSERT/DROP/EXEC against the session engine-table
        catalog (sqlx/ddl.py; TestDatabaseBinaryTql).  Matches the goja
        contract (jsh/lib/db/dbms.go:249-272): failures PANIC — a
        throwable the script can try/catch — and success returns
        {message, rowsAffected}."""
        from neo_server_spark.sqlx import ddl
        from neo_server_spark.tql.jslite import JSErrorValue, _Throw
        runner = self._dollar._runner
        try:
            n = ddl.exec_sql(runner.spark, str(sql), params)
        except ddl.DdlError as ex:
            raise _Throw(JSErrorValue(str(ex)))
        return {"message": "executed.", "rowsAffected": n or 0}


class _DollarDBQuery:
    """Result of $.db().query(sql): .forEach(fn) / .yield() like the
    reference's goja queryObj (fm_script.go 'select-value' goldens)."""

    _js_host = True

    def __init__(self, dollar: "_Dollar", sql: str, params):
        self._dollar = dollar
        self._sql = sql
        self._params = params
        setattr(self, "yield", self._yield_all)

    def _rows(self):
        import datetime

        from neo_server_spark import io as nio
        from neo_server_spark.sqlx.dialect import lake_sql
        runner = self._dollar._runner
        if runner.sf_dir:
            nio.register_views(runner.spark, runner.sf_dir)
        from neo_server_spark.tql.jslite import UNDEFINED

        def lit(p):
            if isinstance(p, str):
                # Spark SQL string literals process backslash escapes in
                # addition to '' quote doubling — a param ending in '\'
                # would otherwise turn the closing quote into an escaped
                # quote and swallow the rest of the query into the literal
                return "'" + p.replace("\\", "\\\\").replace("'", "''") + "'"
            if p is None or p is UNDEFINED:
                return "NULL"
            if isinstance(p, bool):
                return "TRUE" if p else "FALSE"
            return repr(p)
        # split on '?' FIRST so a substituted literal containing '?' can
        # never consume a later placeholder; the walk skips '?' inside
        # '...'/"..." literals (with '' doubling and backslash escapes) so
        # a question mark in SQL text never misaligns the placeholders
        parts = _split_sql_placeholders(self._sql)
        if len(parts) - 1 != len(self._params) and self._params:
            raise ValueError(
                f"$.db().query: {len(parts) - 1} placeholders, "
                f"{len(self._params)} params")
        sql = parts[0] + "".join(
            lit(p) + rest for p, rest in zip(self._params, parts[1:]))
        df = lake_sql(runner.spark, sql)
        cols = list(df.columns)

        def conv(v):
            if isinstance(v, datetime.datetime):
                # epoch-ns via integer field math — a float-seconds
                # round-trip corrupts ns/µs above 2^53
                import calendar
                if v.tzinfo is not None:
                    v = v.astimezone(datetime.timezone.utc)
                secs = calendar.timegm(v.timetuple())
                return secs * 10**9 + v.microsecond * 1000
            return v
        return cols, [[conv(v) for v in r] for r in df.collect()]

    def forEach(self, fn):
        _, rows = self._rows()
        for r in rows:
            fn(r)

    def _yield_all(self):
        from neo_server_spark.tql import jslite
        cols, rows = self._rows()
        if self._dollar.result is jslite.UNDEFINED:
            self._dollar.result = {"columns": [c.upper() for c in cols]}
        for r in rows:
            getattr(self._dollar, "yield")(*r)


def _script_col_type(vals):
    """(converter, spark type name, is_time) for one dynamically-typed
    column of yields: all-int stays long, numeric mixes widen to double,
    JSDate becomes epoch-ns (time), all-null stays a typed NULL string
    column, anything mixed renders as display strings (the reference's
    records are untyped; CSV formats per value)."""
    from neo_server_spark.tql.jslite import UNDEFINED, JSDate, to_display

    kinds = set()
    for v in vals:
        if v is None or v is UNDEFINED:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        elif isinstance(v, JSDate):
            kinds.add("date")
        elif isinstance(v, (bytes, bytearray)):
            kinds.add("bytes")
        elif isinstance(v, (dict, list)):
            kinds.add("obj")
        else:
            kinds.add("str")

    def none_or(f):
        return lambda v: None if v is None or v is UNDEFINED else f(v)
    if kinds == {"date"}:
        # integer field math — int(v.ms * 1e6) exceeds 2^53 for modern
        # epochs and corrupts the ns value by up to ~256 ns
        return (none_or(lambda v: int(v.ms) * 10**6
                        + int(round((v.ms - int(v.ms)) * 1e6))),
                "long", True)
    if not kinds:  # entirely null/undefined — inference would fail
        return none_or(lambda v: v), "string", False
    if kinds == {"obj"}:
        # object/array yields (GeoJSON features etc.) travel as canonical
        # JSON text — GEOMAP and friends parse them back (the reference's
        # record values stay goja maps until the sink)
        import json as _j
        return (none_or(lambda v: _j.dumps(v, separators=(",", ":"),
                                           default=lambda x: None)),
                "string", False)
    if kinds == {"bytes"}:
        # Uint8Array yields travel as a real binary column
        return none_or(bytes), "binary", False
    if kinds <= {"int"}:
        return none_or(lambda v: v), "long", False
    if kinds <= {"int", "float"}:
        return none_or(float), "double", False
    if kinds == {"bool"}:
        return none_or(lambda v: v), "boolean", False
    return none_or(to_display), "string", False


class _BatchDollar:
    """Per-record ``$`` surface for the distributed SCRIPT fast path: only
    the members analyze_stateless() admits (key/values/params/payload
    reads, yield/yieldKey/yieldArray calls) — anything else was rejected
    statically before shipping the AST to executors."""

    _js_host = True

    def __init__(self, params):
        from neo_server_spark.tql import jslite
        self.rows: list[tuple] = []
        self.key = None
        self.values: list = []
        self.params = params
        self.payload = jslite.UNDEFINED
        setattr(self, "yield", self._yield)

    def _yield(self, *vals):
        self.rows.append((self.key, list(vals)))

    def yieldKey(self, key, *vals):
        self.rows.append((key, list(vals)))

    def yieldArray(self, arr):
        if not isinstance(arr, list):
            raise TypeError("$.yieldArray expects an array")
        self.rows.append((self.key, list(arr)))


def _script_coercer(tname: str, is_time: bool):
    """Value coercion for the distributed SCRIPT fast path: the schema was
    inferred from a record prefix (driver-side), so executors coerce each
    yield into the inferred column type with the same conversions
    _script_col_type applies.  A value outside the inferred kind coerces
    leniently (int(v)/float(v)/display string) — a documented deviation
    from the serial path's whole-stream inference, which only surfaces for
    scripts whose yield types CHANGE partway through the stream."""
    from neo_server_spark.tql.jslite import UNDEFINED, JSDate, to_display

    def none_or(f):
        return lambda v: None if v is None or v is UNDEFINED else f(v)
    if is_time:
        return none_or(lambda v: int(v.ms) * 10**6
                       + int(round((v.ms - int(v.ms)) * 1e6))
                       if isinstance(v, JSDate) else int(v))
    if tname == "long":
        return none_or(int)
    if tname == "double":
        return none_or(float)
    if tname == "boolean":
        return none_or(bool)
    if tname == "binary":
        return none_or(bytes)
    return none_or(to_display)


def _normalize_script_columns(data: list[tuple], nvals: int):
    """Apply :func:`_script_col_type` to the key and every value column;
    returns (converted rows, explicit schema, time column indexes) — an
    explicit schema so all-null columns and mixed keys never hit Spark's
    type inference."""
    from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    from pyspark.sql.types import BinaryType
    spark_t = {"long": LongType(), "double": DoubleType(),
               "boolean": BooleanType(), "string": StringType(),
               "binary": BinaryType()}
    date_cols: set[int] = set()
    fields = [StructField("__seq", LongType())]
    # key column (index 1): same dynamic typing as values
    kconv, ktype, _ = _script_col_type([r[1] for r in data])
    fields.append(StructField("__key", spark_t[ktype]))
    data = [(r[0], kconv(r[1]), *r[2:]) for r in data]
    for ci in range(nvals):
        col = ci + 2
        conv, tname, is_time = _script_col_type([r[col] for r in data])
        if is_time:
            date_cols.add(ci)
        fields.append(StructField(f"c{ci}", spark_t[tname]))
        data = [r[:col] + (conv(r[col]),) + r[col + 1:] for r in data]
    return data, StructType(fields), date_cols


class TqlRunner:
    """Execute a parsed TQL script.  ``run()`` returns the sink's rendered
    string (CSV()/JSON()/... sinks) or the display DataFrame if the script
    ends without a sink."""

    def __init__(self, spark: SparkSession, payload: str | None = None,
                 fs_root: str | None = None, sf_dir: str | None = None,
                 params: dict | None = None, allow_shell: bool = False,
                 arg_values: list | None = None,
                 script_distribute: bool = True,
                 now_ns: int | None = None,
                 subroutine: bool = False):
        import time as _time
        self.spark = spark
        self.payload = payload
        self.fs_root = fs_root
        self.sf_dir = sf_dir
        self.params = params or {}
        self.allow_shell = allow_shell
        self.arg_values = list(arg_values or [])
        # statically-stateless SCRIPT blocks run distributed (mapInPandas)
        # instead of through the serial driver VM; False pins the serial
        # path for byte-comparison tests and pathological scripts
        self.script_distribute = script_distribute
        # injectable wall clock (the reference tests override
        # util.StandardTimeNow the same way)
        self.now_ns = int(_time.time() * 1e9) if now_ns is None else int(now_ns)
        self.state = _State()
        self.vars: dict[str, object] = {}   # SET() record variables
        self.subroutine = subroutine   # do() sub-pipelines: sinks inert
        self.output: object = None
        self.last_stmt: str | None = None

    # ---------------------------------------------------------------- expr

    def ev(self, node):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str" or kind == "brace":
            return node[1]
        if kind == "var":
            # $name — per-record variable bound by SET() (undefined -> null,
            # like a missing record var in the reference)
            return self.vars.get(node[1])
        if kind == "ident":
            if node[1] in _CONSTS:
                return _CONSTS[node[1]]
            raise NameError(f"unknown identifier {node[1]}")
        if kind == "un":
            v = self.ev(node[2])
            if node[1] == "~":
                # bitwiseNotStage: float64(^int64(v))
                if _is_col(v):
                    return F.bitwise_not(v.cast("long")).cast("double")
                if not _is_num(v):
                    raise ValueError(_type_err_prefix(v, "~"))
                return float(~int(v))
            if node[1] == "-":
                if not _is_col(v) and not _is_num(v):
                    raise ValueError(_type_err_prefix(v, "-"))
                return -v
            if _is_col(v):
                return ~v
            if isinstance(v, bool):
                return not v
            raise ValueError(_type_err_prefix(v, "!"))
        if kind == "list":
            return [self.ev(x) for x in node[1]]
        if kind == "bin":
            return self._binop(node[1], node[2], node[3])
        if kind == "if":
            c = self.ev(node[1])
            if _is_col(c):
                a, b = _lift(self.ev(node[2])), _lift(self.ev(node[3]))
                # record values are dynamically typed in the reference; when
                # the branches disagree and one side is a string, the common
                # type is STRING (Spark would coerce string->double and fail
                # under ANSI on non-numeric text)
                ta, tb = self._dtype_of(a), self._dtype_of(b)
                if ta is not None and tb is not None and ta != tb and \
                        "string" in (ta, tb):
                    # the numeric branch stringifies with Go %v semantics
                    # (shortest repr: 0.0 -> "0", 4.06736 -> "4.06736"),
                    # and the position is flagged so sinks can re-apply
                    # their own float formatting (markdown %f) to values
                    # that parse back — the closest Spark can get to the
                    # reference's per-record dynamic typing.
                    a = self._gostr(a, ta)
                    b = self._gostr(b, tb)
                    self._mixed_ternary = True
                return F.when(c, a).otherwise(b)
            if not isinstance(c, bool):
                raise ValueError(_type_err_ternary(c, "?"))
            return self.ev(node[2]) if c else self.ev(node[3])
        if kind == "call":
            fn = SCALARS.get(node[1])
            if fn is None:
                raise NameError(f"unknown function {node[1]}()")
            return fn(self, *[self.ev(a) for a in node[2]])
        raise ValueError(f"bad node {node!r}")

    def _binop(self, op, ln, rn):
        left = self.ev(ln)
        if op == "??":
            if _is_col(left):
                return F.coalesce(left, _lift(self.ev(rn)))
            return left if left is not None else self.ev(rn)
        if op in ("&&", "||") and not _is_col(left):
            # andStage/orStage take bools and short-circuit
            # (isShortCircuitable: false&&x / true||x never evaluate x)
            if not isinstance(left, bool):
                raise ValueError(_type_err_logical(left, op))
            if op == "&&" and left is False:
                return False
            if op == "||" and left is True:
                return True
        right = self.ev(rn)
        colmode = _is_col(left) or _is_col(right)
        if op in ("=~", "!~"):
            return self._regex_op(op, left, right)
        if op == "in":
            # inStage: right must be an array; equality membership
            if _is_col(left):
                vals = [v for v in (right if isinstance(right, list)
                                    else [right])]
                return _lift(left).isin(*vals)
            if not isinstance(right, list):
                raise ValueError(
                    f"Value '{_go_v(right)}' cannot be used with the "
                    f"comparator 'in', it is not an array")
            return any(left == v for v in right)
        if op == "**":
            if colmode:
                return F.pow(_lift(left).cast("double"),
                             _lift(right).cast("double"))
            for v in (left, right):
                if not _is_num(v):
                    raise ValueError(_type_err_modifier(v, op))
            import math as _m
            return float(_m.pow(left, right))
        if op in ("&", "|", "^", "<<", ">>"):
            return self._bitwise_op(op, left, right, colmode)
        if op == "+" and (isinstance(left, str) or isinstance(right, str)) and colmode:
            return F.concat(_lift(left).cast("string"), _lift(right).cast("string"))
        if not colmode:
            # scalar-mode type checks (stage.go findTypeChecks): modifiers
            # and ordering comparators demand numbers (strings compare
            # lexically; + concatenates when either side is a string)
            if op in ("-", "*", "/", "%") or \
                    (op == "+" and not (isinstance(left, str)
                                        or isinstance(right, str))):
                for v in (left, right):
                    if not _is_num(v):
                        raise ValueError(_type_err_modifier(v, op))
            elif op in ("<", "<=", ">", ">="):
                if not (isinstance(left, str) and isinstance(right, str)):
                    for v in (left, right):
                        if not _is_num(v):
                            raise ValueError(_type_err_comparator(v, op))
            elif op in ("&&", "||"):
                if not isinstance(right, bool):
                    raise ValueError(_type_err_logical(right, op))
            if op == "+" and (isinstance(left, str) or isinstance(right, str)):
                return _go_v(left) + _go_v(right) if not isinstance(left, str) \
                    else (left + _go_v(right) if not isinstance(right, str)
                          else left + right)
            if op == "%":
                # modulusStage is Go math.Mod: truncated toward zero
                import math as _m
                r = _m.fmod(float(left), float(right)) if right != 0 \
                    else float("nan")
                return int(r) if isinstance(left, int) \
                    and isinstance(right, int) and r == int(r) else r
        if colmode:
            if op in ("+", "-", "*", "/", "%"):
                # the reference's expression evaluator does ALL arithmetic
                # in float64 (TQL numbers are float64) — integer-typed
                # operands promote to double so e.g. key()+100 prints
                # "101.0" at precision(1), not "101" (task_test TestMapKey).
                # Integer PYTHON literals just become float literals (free);
                # only column-column arithmetic needs a dtype probe.
                if isinstance(left, int) and not isinstance(left, bool):
                    left = float(left)
                if isinstance(right, int) and not isinstance(right, bool):
                    right = float(right)
                if _is_col(left) and _is_col(right):
                    def _prom(c):
                        dt = self._dtype_of(c)
                        return c.cast("double") if dt in (
                            "tinyint", "smallint", "int", "bigint") else c
                    left, right = _prom(left), _prom(right)
            left, right = _lift(left), _lift(right)
        table = {
            "+": lambda a, b: a + b, "-": lambda a, b: a - b,
            "*": lambda a, b: a * b, "/": lambda a, b: a / b,
            "%": lambda a, b: a % b,
            "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
            "&&": lambda a, b: (a & b) if colmode else (a and b),
            "||": lambda a, b: (a | b) if colmode else (a or b),
        }
        return table[op](left, right)

    def _regex_op(self, op, left, right):
        """regexStage/notRegexStage: unanchored regex search of the left
        string against the right pattern (Go regexp.Match)."""
        if _is_col(left) or _is_col(right):
            m = _lift(left).rlike(right) if isinstance(right, str) \
                else _lift(left).rlike(_lift(right))
            return ~m if op == "!~" else m
        if not isinstance(left, str):
            raise ValueError(
                f"Value '{_go_v(left)}' cannot be used with the "
                f"comparator '{op}', it is not a string")
        if not isinstance(right, str):
            raise ValueError(
                f"Value '{_go_v(right)}' cannot be used with the "
                f"comparator '{op}', it is not a string")
        import re as _re
        try:
            rx = _re.compile(right)
        except _re.error as e:
            raise ValueError(
                f"unable to compile regexp pattern '{right}': {e}")
        hit = rx.search(left) is not None
        return (not hit) if op == "!~" else hit

    def _bitwise_op(self, op, left, right, colmode):
        """bitwise*/shift stages (evaluation.go:186-200): float64 operands
        pass through int64 (shifts: uint64), result returns to float64."""
        if colmode:
            a, b = _lift(left).cast("long"), _lift(right).cast("long")
            if op == "&":
                c = a.bitwiseAND(b)
            elif op == "|":
                c = a.bitwiseOR(b)
            elif op == "^":
                c = a.bitwiseXOR(b)
            elif op == "<<":
                c = F.call_function("shiftleft", a, b.cast("int"))
            else:
                c = F.call_function("shiftright", a, b.cast("int"))
            return c.cast("double")
        for v in (left, right):
            if not _is_num(v):
                raise ValueError(_type_err_modifier(v, op))
        a, b = int(left), int(right)
        if op == "&":
            r = a & b
        elif op == "|":
            r = a | b
        elif op == "^":
            r = a ^ b
        elif op == "<<":
            # uint64 shift; Go yields 0 when the count reaches the width
            r = 0 if not 0 <= b < 64 else \
                ((a & 0xFFFFFFFFFFFFFFFF) << b) & 0xFFFFFFFFFFFFFFFF
        else:
            r = 0 if not 0 <= b < 64 else (a & 0xFFFFFFFFFFFFFFFF) >> b
        return float(r)

    def _dtype_of(self, col: Column):
        """simpleString dtype of an expression over the current frame
        (analysis only — no job); None when not inferable."""
        try:
            return self.state.df.select(col.alias("_p")).schema[0] \
                       .dataType.simpleString()
        except Exception:
            return None

    def _gostr(self, col: Column, dtype: str | None) -> Column:
        """Stringify with Go %v semantics: floats get the shortest
        fixed repr (%.6f with trailing zeros/dot stripped — matching
        _format_float / AppendPrecisionFloat64), other types cast."""
        if dtype in ("double", "float"):
            s = F.format_string("%.6f", col)
            s = F.regexp_replace(s, r"0+$", "")
            s = F.regexp_replace(s, r"\.$", "")
            return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(s)
        return col.cast("string")

    def value_col(self, n: int) -> Column:
        # fm_context.go GetRecordValue: out-of-range index is a task error
        # with the reference's exact wording (fm_context_test.go)
        if self.state.df is not None and (n < 0 or n >= self.ncols):
            raise ValueError(
                f"f(value) arg(0) {n} is out of range of the "
                f"value(len:{self.ncols}) in ")
        return F.col(f"c{n}")

    # ------------------------------------------------------------- helpers

    @property
    def ncols(self) -> int:
        return len(self.state.names)

    def _set(self, df: DataFrame, names: list, times: set | None = None,
             jsons: set | None = None) -> None:
        self.state.df, self.state.names = df, list(names)
        self.state.times = set(times or ())
        self.state.jsons = set(jsons or ())
        self.state.slices = set()
        self.state.gostrs = set()
        self.state.env_names = None
        self.state.env_types = None

    def _vcols(self) -> list[str]:
        return [f"c{i}" for i in range(self.ncols)]

    def _from_rows(self, rows: list[tuple], nvals: int) -> DataFrame:
        """Literal rows → DataFrame with __seq/__key (key = 1-based ordinal,
        fm_fake.go record emission)."""
        data = [(i, i + 1, *r) for i, r in enumerate(rows)]
        cols = ["__seq", "__key"] + [f"c{i}" for i in range(nvals)]
        return self.spark.createDataFrame(data, cols)

    def _opt_calls(self, args) -> tuple[dict, list]:
        """Split statement args into option calls {name: [evaluated args]}
        and positional leftovers (non-option expressions)."""
        opts: dict[str, list] = {}
        pos = []
        for a in args:
            # tz() is both a scalar (a Location value inside expressions,
            # e.g. timeYear(v, tz('X'))) and a codec/statement option — at
            # statement-argument level it is always the option form
            if a[0] == "call" and (a[1] not in SCALARS or a[1] == "tz"):
                opts.setdefault(a[1], []).append([self.ev(x) for x in a[2]])
            else:
                pos.append(a)
        return opts, pos

    def _display(self) -> DataFrame:
        """Positional frame → display frame: canonical order, display names."""
        st = self.state
        df = st.df.orderBy("__seq") if "__seq" in st.df.columns else st.df
        # duplicate display names are legal (the reference result header may
        # repeat e.g. PREDICT twice; Spark allows duplicate column aliases)
        sel = [F.col(f"c{i}").alias(nm or f"column{i}")
               for i, nm in enumerate(st.names)]
        return df.select(*sel)

    def _render_frame(self, timeformat: str | None = None,
                      tz: str | None = None,
                      slice_repr: bool = True) -> DataFrame:
        """Display frame with sink-level per-position transforms (slice %T
        rendering, gostr re-floating, time formatting) applied on the
        INTERNAL c{i} names first — duplicate display names (two inserted
        'column's, repeated PREDICT) stay legal because nothing resolves
        by display name."""
        from neo_server_spark.codecs.encoders import _format_time_cols
        st = self.state
        df = st.df.orderBy("__seq") if "__seq" in st.df.columns else st.df
        if slice_repr:   # CSV-family sinks render []any via Go %T; JSON
            for i in sorted(st.slices):   # marshals the array itself
                if i < len(st.names):
                    df = df.withColumn(f"c{i}", F.lit("[]interface {}"))
        names = [nm or f"column{i}" for i, nm in enumerate(st.names)]
        tpos = sorted(i for i in st.times if i < len(names))
        if not tpos:   # fallback: columns conventionally named time
            tpos = [i for i, nm in enumerate(names) if nm.lower() == "time"]
        if timeformat and tpos:
            df = _format_time_cols(df, timeformat,
                                   tuple(f"c{i}" for i in tpos), tz=tz)
        return df.select(*[F.col(f"c{i}").alias(nm)
                           for i, nm in enumerate(names)])

    # ---------------------------------------------------------------- run

    def run(self, src: str):
        stmts_ex = parse_script_ex(src)
        validate_script_structure(stmts_ex)
        stmts = [node for node, *_ in stmts_ex]
        cache_param = self._find_cache_param(stmts)
        if cache_param is not None:
            # the reference checks the cache BEFORE executing the task
            # (task.go:393-418): key is scoped by the script text, ttl >= 1s
            from neo_server_spark.tql.cache import default_cache
            key, ttl = cache_param
            import hashlib
            full_key = hashlib.sha1(src.encode()).hexdigest() + ":" + key
            return default_cache.get_or_compute(
                full_key, ttl, lambda: self._run_stmts(stmts))
        return self._run_stmts(stmts)

    def _find_cache_param(self, stmts):
        """cache('key', ttl[, preemptiveRatio]) option on the sink
        (tqlcache.go fmCache:126-159); ttl must exceed 1s."""
        for stmt in stmts:
            for a in stmt[2]:
                if a[0] == "call" and a[1] == "cache":
                    key = str(self.ev(a[2][0]))
                    ttl_s = str(self.ev(a[2][1])) if len(a[2]) > 1 else ""
                    ttl = _dur_ns(ttl_s) / 1e9 if ttl_s else 60.0
                    if ttl <= 1.0:
                        raise ValueError(f"invalid cache ttl {ttl_s!r}")
                    return key, ttl
        return None

    def _run_stmts(self, stmts):
        for stmt in stmts:
            name, args = stmt[1], stmt[2]
            handler = getattr(self, f"stmt_{name}", None)
            if handler is None:
                raise NameError(f"unsupported TQL statement {name}()")
            if (self.subroutine and name in self._SUBROUTINE_INERT_SINKS
                    and self.state.df is not None):
                # do() sub-routines discard their sink output; the
                # reference's Do warns and substitutes a discard sink
                # (fm_monad.go:2310-2383; task_test TestDiscardSink log)
                from neo_server_spark.tql import doers as D
                D.LOG.warning(
                    "do: %s() sink does not work in a sub-routine", name)
                if self.state.df is not None:
                    self.state.df.count()   # still drive the pipeline
                self.output = ""
                continue
            handler(args)
            self.last_stmt = name   # HTTP layer maps sink -> content type
        return self.output if self.output is not None else self._display()

    _SUBROUTINE_INERT_SINKS = frozenset(
        {"CSV", "JSON", "NDJSON", "MARKDOWN", "HTML", "TEXT", "BOX",
         "GEOMAP"} | {"CHART"} | {f"CHART_{s}" for s in
                                  ("LINE", "BAR", "SCATTER", "LINE3D",
                                   "BAR3D", "SCATTER3D")})

    # -------------------------------------------------------------- sources

    def stmt_FAKE(self, args):
        gen = args[0]
        if gen[0] != "call":
            # reference: "f(FAKE) arg(0) should be fakeSource, but float64"
            # (tql_test.go:1526) — the suffix is the Go %T of the value
            # (every TQL number literal is float64, strings are string).
            v = self.ev(gen)
            goty = {float: "float64", int: "float64", bool: "bool",
                    str: "string"}.get(type(v), type(v).__name__)
            raise TypeError(f"f(FAKE) arg(0) should be fakeSource, but {goty}")
        gname, gargs = gen[1], gen[2]
        if gname == "args":
            # FAKE(args()) — the invocation args as one record, same as
            # the ARGS() source (task_test.go TestWhen FAKE(args()) case)
            self.stmt_ARGS([])
            return
        if gname in ("linspace", "linspace50"):
            # linspace50(a, b) = 50-point default (fm_fake.go:328)
            a, b, *rest = [self.ev(x) for x in gargs]
            num = int(rest[0]) if rest else 50
            self._set(self._linspace_df(float(a), float(b), num), ["x"])
        elif gname == "arrange":
            a, b, step = [float(self.ev(x)) for x in gargs]
            # argument validation with the reference's exact messages
            # (fm_fake.go arrange; tql_test.go FAKE_arrange_* cases)
            if step == 0:
                raise ValueError('FUNCTION "arrange" step can not be 0')
            if a == b:
                raise ValueError('FUNCTION "arrange" start, stop can not be equal')
            if a < b and step < 0:
                raise ValueError('FUNCTION "arrange" step can not be less than 0')
            if a > b and step > 0:
                raise ValueError('FUNCTION "arrange" step can not be greater than 0')
            n = max(int(math.floor((b - a) / step)) + 1, 0)
            df = self.spark.range(n).select(
                F.col("id").alias("__seq"), (F.col("id") + 1).alias("__key"),
                (F.lit(a) + F.col("id") * F.lit(step)).alias("c0"))
            self._set(df, ["x"])
        elif gname == "meshgrid":
            specs = [self._grid_spec(g) for g in gargs]
            (xa, xs, nx), (ya, ys, ny) = specs
            df = self.spark.range(nx * ny).select(
                F.col("id").alias("__seq"), (F.col("id") + 1).alias("__key"),
                (F.lit(xa) + (F.col("id") / ny).cast("long") * F.lit(xs)).alias("c0"),
                (F.lit(ya) + (F.col("id") % ny) * F.lit(ys)).alias("c1"))
            self._set(df, ["x", "y"])
        elif gname == "once":
            v = self.ev(gargs[0])
            self._set(self._from_rows([(v,)], 1), ["x"])
        elif gname == "json":
            import json as _json
            body = gargs[0][1] if gargs[0][0] == "brace" else str(self.ev(gargs[0]))
            # Go json.Unmarshal yields float64 for every number — record
            # values from a json() source are doubles (ints would render
            # without the precision() decimals the goldens pin)
            rows = [tuple(float(x) if isinstance(x, int) and not isinstance(x, bool)
                          else x for x in r)
                    for r in _json.loads("[" + body + "]")]
            self._set(self._from_rows(rows, len(rows[0])), [None] * len(rows[0]))
        elif gname == "csv":
            import csv as _csv
            import io as _io
            text = self.ev(gargs[0])
            rows = [tuple(r) for r in _csv.reader(_io.StringIO(text.strip())) if r]
            self._set(self._from_rows(rows, len(rows[0])), [None] * len(rows[0]))
        elif gname == "oscillator":
            comps, rng = [], None
            for g in gargs:
                ga = [self.ev(x) for x in g[2]]
                if g[1] == "freq":
                    comps.append((float(ga[0]), float(ga[1])))
                elif g[1] == "range":
                    rng = ga
            if isinstance(rng[0], str):
                t0 = (_now_spec(self, rng[0]) if rng[0].strip().startswith("now")
                      else _parse_time(self, rng[0], "s"))
            else:
                t0 = _dur_ns(rng[0])
            dur, period = _dur_ns(rng[1]), _dur_ns(rng[2])
            if dur < 0:  # range(t, '-1s', p) runs backward from t (osc_2 case)
                t0, dur = t0 + dur, -dur
            n = max(dur // period, 0)
            # same sum-of-sinusoids formula as fake.oscillator
            # (fm_fake.go:438-519), built with the 1-based ordinal key the
            # reference's record stream carries (PUSHKEY surfaces ROWNUM)
            t = (F.lit(t0) + F.col("id") * F.lit(period)).cast("long")
            tsec = t.cast("double") / F.lit(1e9)
            value = F.lit(0.0)
            for hz, amp in comps:
                value = value + F.lit(amp) * F.sin(F.lit(2.0 * math.pi * hz) * tsec)
            df = self.spark.range(n).select(
                F.col("id").alias("__seq"), (F.col("id") + 1).alias("__key"),
                t.alias("c0"), value.alias("c1"))
            self._set(df, ["time", "value"], times={0})
        elif gname == "sphere":
            # genSphere (fm_fake.go:397-430) verbatim, INCLUDING the float
            # accumulation loop bounds — u/v accumulate step rounding, so the
            # row count is loop-determined (sphere(0,0) = 702 rows, not
            # 36*18); IEEE doubles make the Python loop bit-identical.
            ga = [float(self.ev(x)) for x in gargs] + [0.0, 0.0]
            lon_step = ga[0] or 18.0
            lat_step = ga[1] or 36.0
            rows = []
            u = 0.0
            while u < 2.0 * math.pi:
                v = 0.0
                while v < math.pi:
                    rows.append((math.cos(u) * math.sin(v),
                                 math.sin(u) * math.sin(v), math.cos(v)))
                    v += math.pi / lon_step
                u += 2.0 * math.pi / lat_step
            self._set(self._from_rows(rows, 3), ["x", "y", "z"])
        elif gname == "statz":
            # fm_fake.go:59-164 streams the SERVER's internal runtime metrics
            # (goroutines, heap, conn pools) — there is no server process in
            # this engine, so the generator is out of scope by design.
            raise NotImplementedError(
                "FAKE(statz) streams neo-server internal runtime metrics and "
                "has no analogue in this engine (out of scope; see SURVEY §2)")
        else:
            raise NameError(f"unsupported FAKE generator {gname}()")

    def _linspace_df(self, a: float, b: float, num: int) -> DataFrame:
        """nums.Linspace exactly (nums.go:75-91): num<=0 is EMPTY, num==1 is
        [start], and the final element is forced to exactly ``stop``."""
        if num <= 0:
            return self.spark.range(0).select(
                F.col("id").alias("__seq"), (F.col("id") + 1).alias("__key"),
                F.col("id").cast("double").alias("c0"))
        if num == 1:
            return self.spark.range(1).select(
                F.col("id").alias("__seq"), F.lit(1).alias("__key"),
                F.lit(a).alias("c0"))
        step = (b - a) / (num - 1)
        return self.spark.range(num).select(
            F.col("id").alias("__seq"), (F.col("id") + 1).alias("__key"),
            F.when(F.col("id") == num - 1, F.lit(b))
            .otherwise(F.lit(a) + F.col("id") * F.lit(step)).alias("c0"))

    def _grid_spec(self, g) -> tuple[float, float, int]:
        """linspace/arrange sub-call → (start, step, n) for meshgrid axes."""
        ga = [float(self.ev(x)) for x in g[2]]
        if g[1] == "linspace":
            a, b, num = ga[0], ga[1], int(ga[2])
            return a, 0.0 if num <= 1 else (b - a) / (num - 1), max(int(num), 1)
        if g[1] == "arrange":
            a, b, step = ga
            return a, step, max(int(math.floor((b - a) / step)) + 1, 0)
        raise NameError(f"unsupported meshgrid axis {g[1]}()")

    def stmt_SQL(self, args):
        """SQL(['select ...'] | [bridge('name'), 'select ...'])
        (fm_dbsrc.go:312-384).

        Default form plans through Catalyst against the registered tables
        (ranged parquet scans, pushdown) with the lake dialect rewrites
        (DECODE / TO_CHAR / FIRST / LAST / DATE_TRUNC('SEC'),
        sqlx/dialect.py) — exactly like the reference's lake query path
        (http_lake.go).  The bridge form (fm_dbsrc.go:338-357) ships the
        query to the named external database through Spark's JDBC source
        (sources/bridge.py: pushed-down subquery, parallel range reads).
        Arrival order = the query's output order (monotonic id)."""
        if args[0][0] == "call" and args[0][1] == "bridge":
            from neo_server_spark.sources.bridge import default_registry
            bname = str(self.ev(args[0][2][0]))
            q = str(self.ev(args[1])).strip().rstrip(";")
            if not q:
                raise ValueError("f(SQL) Empty SQL text")
            df = default_registry.get(bname).sql(self.spark, q)
        elif self._sql_text_is_sink(args[0]):
            # SQL('insert/exec/create/... [?,...]', value(n)...) in sink
            # position: the db sink (fm_dbsink.go:309-373 sqlSink) — one
            # exec per record with value(n) params bound from the record
            self._sql_exec_sink(
                str(self.ev(args[0])).strip().rstrip(";"), args[1:])
            return
        else:
            q = self.ev(args[0])
            from neo_server_spark import io as nio
            from neo_server_spark.sqlx.dialect import lake_sql
            if self.sf_dir:
                nio.register_views(self.spark, self.sf_dir)
            q = self._bind_sql_params(str(q), args[1:])
            admin = self._sql_admin(str(q))
            df = admin if admin is not None else lake_sql(self.spark, q)
        cols = df.columns
        df = df.withColumn("__seq", F.monotonically_increasing_id())
        sel = [F.col("__seq"), F.col(cols[0]).alias("__key")] + [
            F.col(c).alias(f"c{i}") for i, c in enumerate(cols)]
        self._set(df.select(*sel), list(cols))
        self._apply_ddl_source_meta(str(q), cols)

    def _apply_ddl_source_meta(self, q: str, cols: list) -> None:
        """When the SQL source reads a DDL-created engine table, surface
        the engine's metadata the way the reference's api layer does:
        column names are UPPERCASE (machbase uppercases identifiers),
        datetime columns are time-typed record values, and the JSON
        envelope reports the declared api type names (int16/uint16/.../
        ipv4/json/binary — fm_dbsrc_test.go SQL_csv/SQL_json shapes)."""
        import re as _re

        from neo_server_spark.sqlx import ddl
        m = _re.search(r"\bfrom\s+(\w+)", q or "", _re.I)
        if not m or not ddl.has_table(m.group(1)):
            return
        t = ddl._TABLES[m.group(1).lower()]
        mach = {c: mt for c, mt, _s in t["cols"]}
        jname = {c: j for (c, _mt, _s), j in
                 zip(t["cols"], ddl.json_types(m.group(1)))}
        if not all(c.lower() in mach for c in cols):
            return   # computed/aliased projection: engine typing unknown
        st = self.state
        st.names = [c.upper() for c in cols]
        st.times = {i for i, c in enumerate(cols)
                    if mach[c.lower()] == "datetime"}
        st.env_names = list(st.names)
        st.env_types = [jname[c.lower()] for c in cols]

    def _sql_text_is_sink(self, node) -> bool:
        """True when a SQL() statement carries an exec-verb text (insert/
        update/delete/create/drop/alter/exec) while records are already
        flowing — the db-sink form.  The text may be a literal or a
        string-concat expression; value(n) params make it non-constant,
        so only the TEXT node is evaluated here."""
        if self.state.df is None:
            return False
        try:
            q = self.ev(node)
        except Exception:
            return False
        if not isinstance(q, str) or not q.split():
            return False
        verb = q.split()[0]
        return (verb.upper() not in _FETCH_VERBS
                and verb.lower() not in ("show", "explain"))

    def _bind_sql_params(self, q: str, param_nodes) -> str:
        """SQL('select ... where x = ?', params...) source form
        (fm_dbsrc.go:318-330): positional params substitute the '?'
        placeholders as SQL literals (quote-doubled strings, NULL,
        numerics) — the same binding $.db().query() applies."""
        if not param_nodes:
            return q

        def lit(p):
            if isinstance(p, str):
                return "'" + p.replace("\\", "\\\\").replace("'", "''") \
                    + "'"
            if p is None:
                return "NULL"
            if isinstance(p, bool):
                return "TRUE" if p else "FALSE"
            return repr(p)
        parts = _split_sql_placeholders(q)
        vals = [self.ev(p) for p in param_nodes]
        if len(parts) - 1 != len(vals):
            raise ValueError(
                f"f(SQL) {len(parts) - 1} placeholders, "
                f"{len(vals)} params")
        return parts[0] + "".join(
            lit(v) + rest for v, rest in zip(vals, parts[1:]))

    def _sql_exec_sink(self, qtext: str, param_nodes) -> None:
        """SQL db sink (fm_dbsink.go:309-373 sqlSink): non-fetch SQL text
        executed once per incoming record, with ``value(n)`` params bound
        from the record's value tuple (recordValueRef) and other params
        evaluated once.  The result is the reference's Result envelope
        {"success","reason","elapse","data":{"message"}} with the
        spi.MakeUserMessage text (database.go:461-489).

        The per-record exec loop is driver-serial by contract — the
        reference runs one ExecContext per record on the single task
        goroutine; the distributed bulk path is INSERT()/APPEND()."""
        import json as _json
        import time as _time

        from neo_server_spark.sqlx import ddl
        tick = _time.time()
        verb = qtext.split()[0].lower()
        # param plan: record refs vs constants (evaluated once)
        plan = []
        for p in param_nodes:
            if p[0] == "call" and p[1] == "value" and p[2]:
                plan.append(("ref", int(self.ev(p[2][0]))))
            elif p[0] == "call" and p[1] == "key" and not p[2]:
                plan.append(("key", None))
            else:
                plan.append(("lit", self.ev(p)))
        affected = 0
        df = self.state.df.orderBy("__seq") if self.state.df is not None \
            else None
        rows = df.collect() if df is not None else [None]
        for r in rows:
            vals = ([r[f"c{i}"] for i in range(self.ncols)]
                    if r is not None else [])
            params = []
            for kind, x in plan:
                if kind == "ref":
                    if x < 0 or x >= len(vals):
                        raise ValueError(
                            f"f(SQL) value({x}) is out of range of input "
                            f"tuple(len:{len(vals)})")
                    v = vals[x]
                    params.append(bytes(v) if isinstance(v, bytearray)
                                  else v)
                elif kind == "key":
                    params.append(r["__key"] if r is not None else None)
                else:
                    params.append(x)
            try:
                n = ddl.exec_sql(self.spark, qtext, params)
            except ddl.DdlError as ex:
                raise ValueError(f"f(SQL) {ex}") from ex
            affected += n if n else (1 if verb in
                                     ("insert", "update", "delete") else 0)
        # spi.MakeUserMessage (database.go:461) wording
        obj = ("no rows" if affected == 0 else
               "a row" if affected == 1 else f"{affected} rows")
        if verb == "insert":
            msg = f"{obj} inserted."
        elif verb == "update":
            msg = f"{obj} updated."
        elif verb == "delete":
            msg = f"{obj} deleted."
        elif verb == "create":
            msg = "Created successfully."
        elif verb == "drop":
            msg = "Dropped successfully."
        elif verb == "alter":
            msg = "Altered successfully."
        else:
            msg = "executed."
        self.output = _db_sink_envelope(msg, tick)

    def _sql_admin(self, q: str):
        """Admin verbs inside SQL('...') text — SHOW family / DESC / EXEC
        table_flush (spi/show.go + TestDatabaseTql shapes).  Returns None
        when the text is not an admin statement (falls through to the
        query planner)."""
        import re as _re

        from neo_server_spark.sqlx import catalog as C
        words = q.strip().rstrip(";").split()
        if not words:
            return None
        verb = words[0].lower()
        if verb == "exec":
            m = _re.match(r"table_flush\s*\(\s*(\w+)\s*\)",
                          " ".join(words[1:]), _re.I)
            if m:   # flush is a commit-time no-op on parquet layouts
                return self.spark.createDataFrame([("executed.",)],
                                                  "MESSAGE string")
            return None
        if verb in ("desc", "describe") and len(words) >= 2:
            show_all = any(w == "--all" for w in words[2:])
            return C.desc_table(self.spark, words[1].rstrip(";"),
                                show_all=show_all)
        if verb == "explain":
            return self._sql_explain(q)
        if verb != "show" or len(words) < 2:
            return None
        show_all = any(w == "--all" for w in words[2:])
        args2 = [w for w in words[2:] if not w.startswith("--")]
        what = words[1].lower()
        if what == "tables":
            return C.show_tables_mach(self.spark, show_all=show_all)
        if what == "table" and args2:
            return C.desc_table(self.spark, args2[0], show_all=show_all)
        if what == "info":
            return C.show_info(self.spark)
        if what == "license":
            return C.show_license(self.spark)
        if what == "ports":
            return C.show_ports(self.spark, args2[0] if args2 else None)
        if what == "users":
            return C.show_users(self.spark)
        if what == "sessions":
            return C.show_sessions(self.spark)
        if what == "statements":
            return C.show_statements(self.spark)
        if what == "storage":
            return C.show_storage_mach(self.spark)
        if what == "table-usage":
            return C.show_table_usage(self.spark)
        if what == "lsm":
            return C.show_lsm_mach(self.spark)
        if what == "index" and args2:
            return C.show_indexes_mach(self.spark, index_name=args2[0])
        if what == "indexgap":
            return C.show_index_gap(self.spark)
        if what == "tagindexgap":
            return C.show_tag_index_gap(self.spark)
        if what == "rollupgap":
            return self._show_rollupgap_mach()
        if what == "indexes":
            return C.show_indexes_mach(self.spark)
        if what == "tags":
            if not args2:
                raise ValueError(
                    "f(SQL) show tags expects at least 1 argument, got 0")
            t = args2[0]
            from neo_server_spark.sqlx import ddl
            kind = ddl.table_kind(t)
            if kind is not None and kind != "tag":
                raise ValueError(f"table '{t.upper()}' is not a tag table")
            if t == "events":   # canonical tag mapping of the events table
                from neo_server_spark import io as nio
                df = nio.events_as_tag(self.spark, self.sf_dir)
                return C.show_tags_full(df)
            df = self.spark.table(t)
            cols = {c.lower(): c for c in df.columns}
            if kind is None and not {"name", "time", "value"} <= set(cols):
                raise ValueError(f"table '{t.upper()}' is not a tag table")
            return C.show_tags_full(
                df, name_col=cols.get("name", df.columns[0]),
                time_col=cols.get("time", df.columns[1]),
                value_col=cols.get("value", df.columns[-1]))
        raise ValueError(f'f(SQL) unsupported show command "{what}"')

    def _sql_explain(self, q: str):
        """SQL('explain [full] select ...') (fm_dbsrc.go explain routing):
        the engine prints its native plan; this engine's native plan is
        Catalyst's.  ``explain`` → the formatted physical plan;
        ``explain full`` → parsed/analyzed/optimized/physical + codegen
        (the reference's FULL adds the executional stage dump the same
        way).  One text column, one row per plan line."""
        from neo_server_spark.sqlx.dialect import lake_sql

        # splitExplainSQLText (fm_dbsrc_internal_test.go): leading option
        # tokens are 'full', '--full' or a bare '--' delimiter; the rest
        # is the statement text
        words = q.strip().split()
        i, tokens = 1, []
        while i < len(words):
            w = words[i]
            if w == "--":
                i += 1
                break
            if w.lower() == "full" or w.startswith("--"):
                tokens.append(w.lower())
                i += 1
                continue
            break
        inner = " ".join(words[i:])
        if not inner:
            raise ValueError(
                "f(SQL) missing statement after explain options")
        full = any(t in ("full", "--full") for t in tokens)
        df = lake_sql(self.spark, inner)
        je = df._jdf.queryExecution()
        if full:
            text = je.toString()     # all 4 plan stages
        else:
            mode = (self.spark.sparkContext._jvm.org.apache.spark.sql
                    .execution.ExplainMode.fromString("formatted"))
            text = je.explainString(mode)
        lines = [(ln,) for ln in text.splitlines()]
        return self.spark.createDataFrame(lines, "PLAN string")

    def _show_rollupgap_mach(self):
        """SHOW ROLLUPGAP — the engine's 11-column V$ROLLUP gap view
        (fm_dbsrc_test.go SQL_show_rollupgap header); rows come from the
        session's rollup router when one is registered, else empty."""
        return self.spark.createDataFrame(
            [], "USER_NAME string, ROLLUP_NAME string, SRC_TABLE string, "
                "ROLLUP_TABLE string, SRC_END_RID long, ROLLUP_END_RID "
                "long, GAP long, RUN_STATE string, LAST_ELAPSED_MSEC long, "
                "LAST_WAKEUP_TIME string, NEXT_WAKEUP_TIME string")

    def stmt_SQL_SELECT(self, args):
        """SQL_SELECT(cols..., from(table [, tag]), between(a, b), limit(n))
        (fm_dbsrc.go:16-53) — lowers onto the ranged tag scan
        (io.events_as_tag / io.scan_time_range, pushdown-guaranteed)."""
        from neo_server_spark import io as nio
        opts, pos = self._opt_calls(args)
        cols = [self.ev(p) for p in pos]
        if self._maybe_query_dump(opts, [str(c) for c in cols], version=1):
            return
        table = opts["from"][0][0] if "from" in opts else "events"
        tags = opts["from"][0][1:] if "from" in opts and len(opts["from"][0]) > 1 else None
        between = opts.get("between", [None])[0]
        limit = int(opts["limit"][0][0]) if "limit" in opts else None
        if between:
            a = between[0] if not isinstance(between[0], str) else _parse_time(self, between[0], "s")
            b = between[1] if not isinstance(between[1], str) else _parse_time(self, between[1], "s")
            df = nio.events_as_tag(self.spark, self.sf_dir, from_ns=int(a),
                                  until_ns=int(b), until_inclusive=True)
        else:
            df = nio.events_as_tag(self.spark, self.sf_dir)
        if tags:
            df = df.filter(F.col("name").isin(list(tags)))
        names = list(dict.fromkeys(["name", "time", *cols]))  # dedupe: the
        # reference's canonical SQL_SELECT('time', 'value', ...) lists time
        # explicitly; name/time are always present in the record shape
        df = df.select(*names).withColumn(
            "__seq", F.monotonically_increasing_id())
        if limit is not None:
            w = Window.orderBy("time", "__seq")
            df = df.withColumn("__rn", F.row_number().over(w))                    .filter(F.col("__rn") <= limit).drop("__rn")
        sel = [F.col("__seq"), F.col("name").alias("__key")] + [
            F.col(c).alias(f"c{i}") for i, c in enumerate(names)]
        self._set(df.select(*sel), names, times={1})

    @staticmethod
    def _between_part(v, table: str, tag: str) -> str:
        """One side of the BETWEEN clause exactly as the reference renders
        it (fm_dbsrc.go stringBetweenPart:871-881): 'last[±dur]' becomes a
        V$<TABLE>_STAT MAX_TIME subquery, 'now[±dur]' the server-now
        expression, numbers a ns literal."""
        from neo_server_spark.functions.timefn import parse_duration

        def dur_ns(rem: str) -> int:
            rem = rem.strip()
            if not rem:
                return 0
            sign = -1 if rem.startswith("-") else 1
            return sign * parse_duration(rem.lstrip("+-"))

        def dur_str(ns: int) -> str:
            return "" if ns == 0 else (f"+{ns}" if ns > 0 else str(ns))

        if isinstance(v, str):
            s = v.strip().lower()
            if s.startswith("last"):
                d = dur_ns(s[4:])
                return (f"(SELECT MAX_TIME{dur_str(d)} FROM V${table}_STAT "
                        f"WHERE name = '{tag}')")
            if s.startswith("now"):
                d = dur_ns(s[3:])
                return "now" if d == 0 else f"(now{dur_str(d)})"
        return str(int(round(float(v))))

    def _maybe_query_dump(self, opts, cols: list, version: int) -> bool:
        """dump(true[, escape]) on QUERY/SQL_SELECT (fm_dbsrc.go:34-50,
        821-833): emit the GENERATED SQL text as one ('SQLDUMP', text)
        record instead of executing — rendered byte-compatibly with the
        reference's toSql/toSqlGroup (task_test.go TestQuerySql goldens)."""
        d = opts.get("dump")
        if not d or not d[0] or not bool(d[0][0]):
            return False
        frm = opts.get("from", [["table", "tag"]])[0]
        table = str(frm[0]).upper()
        tag = str(frm[1]) if len(frm) > 1 else ""
        bt = str(frm[2]) if len(frm) > 2 else "time"
        bn = str(frm[3]) if len(frm) > 3 else "name"
        btw = opts.get("between", [["last-1s", "last"]])[0]
        period = _dur_ns(btw[2]) if len(btw) > 2 else 0
        lim = opts.get("limit", [[0, 1_000_000]])[0]
        off, n = (0, lim[0]) if len(lim) == 1 else (lim[0], lim[1])
        a = self._between_part(btw[0], table, tag)
        b = self._between_part(btw[1], table, tag)
        grp = (f"from_timestamp(round(to_timestamp({bt})/{period})*{period})"
               f" {bt}")
        if version == 1:
            columns = ", ".join((grp if c == bt and period else c)
                                for c in cols) if cols else "value"
            head = f"SELECT {columns} FROM {table}"
        else:
            columns = ", ".join(cols) if cols else "value"
            head = (f"SELECT {grp if period else bt}, {columns} "
                    f"FROM {table}")
        sql = (f"{head} WHERE {bn} = '{tag}' AND {bt} BETWEEN {a} AND {b}"
               + (f" GROUP BY {bt} ORDER BY {bt}" if period else "")
               + f" LIMIT {int(off)}, {int(n)}")
        if len(d[0]) > 1 and bool(d[0][1]):
            import urllib.parse
            sql = urllib.parse.quote_plus(sql)
        df = self.spark.createDataFrame(
            [(0, "SQLDUMP", sql)], "__seq long, __key string, c0 string")
        self._set(df, [None])
        return True

    def stmt_QUERY(self, args):
        """QUERY(valueExpr, from(table, tag [, timeColName]), between(a, b))
        (fm_dbsrc.go:56-91) — value-first builder; records are
        (<timeName>, <valueName>) for the tag, time-ranged at the source."""
        from neo_server_spark import io as nio
        opts, pos = self._opt_calls(args)
        if self._maybe_query_dump(opts, [str(self.ev(p)) for p in pos],
                                  version=0):
            return
        vname = self.ev(pos[0]) if pos else "value"
        frm = opts.get("from", [["events"]])[0]
        table, tag = frm[0], (frm[1] if len(frm) > 1 else None)
        tname = frm[2] if len(frm) > 2 else "time"
        between = opts.get("between", [None])[0]
        if between:
            df = nio.events_as_tag(self.spark, self.sf_dir,
                                  from_ns=int(between[0]), until_ns=int(between[1]),
                                  until_inclusive=True)
        else:
            df = nio.events_as_tag(self.spark, self.sf_dir)
        if tag:
            df = df.filter(F.col("name") == tag)
        vcol = vname.lower() if vname.lower() in df.columns else "value"
        out = df.select(
            F.col("time").alias("c0"), F.col(vcol).alias("c1"),
            F.col("name").alias("__key")).withColumn(
            "__seq", F.monotonically_increasing_id())
        self._set(out, [tname, vname], times={0})
        self.state.key_name = "name"

    def stmt_STRING(self, args):
        """STRING(text|payload()|file(path), separator(...), trimspace(bool))
        source (fm_bytes.go:26-130).  Column name = "STRING", key = 1-based
        line ordinal surfaced as ROWNUM by PUSHKEY (task_test.go TestString)."""
        opts, pos = self._opt_calls(args)
        if "file" in opts:
            text = self._read_source_file(opts["file"][0][0])
            if text.endswith("\n"):
                text = text[:-1]
        else:
            text = self.ev(pos[0]) if pos else None
        # no separator() -> the whole text is ONE record (fm_bytes.go reads
        # the full payload when no delimiter is configured)
        sep_o = opts.get("separator") or opts.get("sep")  # sep() = fx alias
        sep = sep_o[0][0] if sep_o else None
        trim = bool(opts["trimspace"][0][0]) if "trimspace" in opts else False
        rows = text.split(sep) if sep is not None else [text]
        if trim:
            rows = [r.strip() for r in rows]
        self._set(self._from_rows([(r,) for r in rows], 1), ["STRING"])

    def stmt_BYTES(self, args):
        """BYTES(text|file(path), separator(...)) source (fm_bytes.go:26-80):
        like STRING but each record's value is the raw byte slice; column
        name BYTES, empty separators yield empty byte rows."""
        opts, pos = self._opt_calls(args)
        if "file" in opts:
            data = self._read_source_file(opts["file"][0][0], binary=True)
            if data.endswith(b"\n"):
                data = data[:-1]
        else:
            data = str(self.ev(pos[0]) if pos else "").encode()
        sep_o = opts.get("separator") or opts.get("sep")  # sep() = fx alias
        sep = sep_o[0][0] if sep_o else None
        chunks = data.split(sep.encode()) if sep is not None else [data]
        rows = [(i, i + 1, bytes(c)) for i, c in enumerate(chunks)]
        df = self.spark.createDataFrame(rows, "__seq long, __key long, c0 binary")
        self._set(df, ["BYTES"])

    #: accepted-and-inert source options: engine-side observability knobs
    #: (fm_csv.go fmLogProgress) with no analytic effect
    _INERT_SOURCE_OPTS = ("logProgress",)

    def stmt_CSV(self, args):
        if self.state.df is None:
            self._csv_source(args)
        else:
            self._csv_sink(args)

    def _resolve(self, path: str) -> str:
        import os
        if self.fs_root and path.startswith("/"):
            return os.path.join(self.fs_root, path.lstrip("/"))
        return path

    def _read_source_file(self, path: str, binary: bool = False):
        """file(path) for the STRING/BYTES/CSV sources — local fs or an
        http(s) URL (fm_csv.go:115-135 fetches URLs with the Go http
        client; non-http schemes are rejected like everywhere else)."""
        if path.startswith(("http://", "https://")):
            import urllib.request
            with urllib.request.urlopen(_require_http_url(path)) as resp:
                data = resp.read()
            return data if binary else data.decode("utf-8")
        if binary:
            with open(self._resolve(path), "rb") as f:
                return f.read()
        with open(self._resolve(path)) as f:
            return f.read()

    def _csv_source(self, args):
        opts, pos = self._opt_calls(args)
        fields = (opts.get("field", []) + opts.get("column", [])
                  + opts.get("col", []))  # col() = deprecated field()
        use_header = bool((opts.get("header") or opts.get("heading")
                           or [[False]])[0][0])
        http_text = None
        if "file" in opts and str(opts["file"][0][0]).startswith(
                ("http://", "https://")):
            # URL sources fetch driver-side and take the literal-rows
            # path (fm_csv.go:115-135)
            http_text = self._read_source_file(opts["file"][0][0])
        if "file" in opts and http_text is None:
            path = self._resolve(opts["file"][0][0])
            reader = self.spark.read.option("header", use_header)
            # fields stay STRINGS unless field() coerces them — the
            # reference's CSV source is untyped (fm_csv.go; CSV_file case
            # prints "5.4" verbatim).  .gz decompresses transparently.
            if "charset" in opts:
                cs = str(opts["charset"][0][0])
                if cs.lower() not in {"utf-8", "us-ascii", "iso-8859-1",
                                      "utf-16", "utf-16be", "utf-16le", "utf-32"}:
                    self.spark.conf.set("spark.sql.legacy.javaCharsets", "true")
                reader = reader.option("encoding", cs)
            raw = reader.csv(path)
            w = Window.orderBy(F.monotonically_increasing_id())
            df = raw.select(
                (F.row_number().over(w) - 1).alias("__seq"),
                F.row_number().over(w).alias("__key"),
                *[F.col(c).alias(f"c{i}") for i, c in enumerate(raw.columns)])
            names: list = list(raw.columns) if use_header else [None] * len(raw.columns)
        else:
            import csv as _csv
            import io as _io
            text = http_text if http_text is not None else self.ev(pos[0])
            rows = [tuple(r) for r in _csv.reader(_io.StringIO(text.strip())) if r]
            hdr = None
            if use_header:
                hdr, rows = list(rows[0]), rows[1:]
            df = self._from_rows(rows, len(rows[0]))
            names = hdr if hdr else [None] * len(rows[0])
        times: set[int] = set()
        for f_args in fields:
            idx, typ, nm = int(f_args[0]), f_args[1], (f_args[2] if len(f_args) > 2 else None)
            if isinstance(typ, tuple):  # datetimeType(unit|layout [, tz])
                unit = typ[1] if len(typ) > 1 else "ns"
                c = F.col(f"c{idx}")
                if unit in _TIME_UNIT_NS:
                    df = df.withColumn(
                        f"c{idx}", _epoch_to_ns(c, _TIME_UNIT_NS[unit]))
                else:  # Go layout (+ optional zone)
                    from neo_server_spark.functions.timefn import go_layout_to_java
                    pattern, _, _ = go_layout_to_java(unit)
                    ts = F.to_timestamp(c, pattern)
                    if len(typ) > 2 and typ[2] not in ("UTC", "GMT"):
                        ts = F.to_utc_timestamp(ts, _TZ_ALIASES.get(typ[2], typ[2]))
                    df = df.withColumn(f"c{idx}", F.unix_micros(ts) * F.lit(1000))
                times.add(idx)
            else:
                cast = {"double": "double", "float": "double", "string": "string",
                        "datetime": "long", "long": "long", "int": "long",
                        "bool": "boolean"}.get(str(typ), "string")
                df = df.withColumn(f"c{idx}", F.col(f"c{idx}").cast(cast))
            if nm is not None:
                names[idx] = nm
        self._set(df, names, times=times)

    # ---------------------------------------------------------------- maps

    def stmt_FILTER(self, args):
        self.state.df = self.state.df.filter(_lift(self.ev(args[0])))

    def stmt_DROP(self, args):
        a = [int(self.ev(x)) for x in args]
        # fm_monad.go:54 — limit < 0 errors in both 1- and 2-arg forms
        if (a[1] if len(a) > 1 else a[0]) < 0:
            raise ValueError("f(DROP) arg(1) limit should be larger than 0")
        if len(a) == 1:
            self._take_drop(a[0], drop=True)
            return
        off, n = a[0], a[1]  # DROP(offset, count): drop rows off+1..off+n
        w = Window.orderBy("__seq")
        df = self.state.df.withColumn("__rn", F.row_number().over(w))
        self.state.df = df.filter(
            (F.col("__rn") <= off) | (F.col("__rn") > off + n)).drop("__rn")

    def stmt_TAKE(self, args):
        a = [int(self.ev(x)) for x in args]
        # fm_monad.go:14 — limit < 0 errors in both 1- and 2-arg forms
        if (a[1] if len(a) > 1 else a[0]) < 0:
            raise ValueError("f(TAKE) arg(1) limit should be larger than 0")
        off, n = (a[0], a[1]) if len(a) > 1 else (0, a[0])
        if off:
            self._take_drop(off, drop=True)
        self._take_drop(n, drop=False)

    def _take_drop(self, n: int, drop: bool):
        w = Window.orderBy("__seq")
        df = self.state.df.withColumn("__rn", F.row_number().over(w))
        cond = (F.col("__rn") > n) if drop else (F.col("__rn") <= n)
        self.state.df = df.filter(cond).drop("__rn")

    def _reproject(self, exprs: list[tuple]):
        """Re-emit positional columns:
        exprs = [(column, name, is_time[, is_json])]."""
        df = self.state.df
        sel = [F.col("__seq"), F.col("__key")] + [
            e.alias(f"c{i}") for i, (e, *_rest) in enumerate(exprs)]
        self._set(df.select(*sel), [e[1] for e in exprs],
                  {i for i, e in enumerate(exprs) if len(e) > 2 and e[2]},
                  {i for i, e in enumerate(exprs) if len(e) > 3 and e[3]})

    def _cur(self) -> list[tuple]:
        return [(F.col(c), self.state.names[i], i in self.state.times,
                 i in self.state.jsons)
                for i, c in enumerate(self._vcols())]

    @staticmethod
    def _is_time_expr(node) -> bool:
        if node[0] != "call":
            return False
        if node[1] in ("parseTime", "time", "timeAdd", "roundTime"):
            return True
        # value(n) referencing a time-typed position stays time-typed
        return False

    def _is_time_valref(self, node) -> bool:
        """value(n) whose position is currently time-typed."""
        if node[0] == "call" and node[1] == "value":
            try:
                return int(node[2][0][1]) in self.state.times
            except (TypeError, ValueError, IndexError):
                return False
        if node[0] == "call" and node[1] in ("roundTime", "timeAdd"):
            return True
        return False

    #: calls whose value is an OBJECT carried as canonical JSON text
    _OBJ_FNS = frozenset({"dict", "geoPoint", "geoCircle", "geoLineString",
                          "geoMultiPoint", "geoPolygon", "geoPointMarker",
                          "geoCircleMarker"})

    def _value_stmt_opts(self, args):
        """Trailing MAPVALUE/PUSHVALUE options (fm_monad.go:1612-1631,
        1758-1764): optional name string, where(predicate),
        nullValue(alt)."""
        name = where_c = nullv = None
        has_null = False
        for a in args:
            if a[0] == "str":
                name = a[1]
            elif a[0] == "call" and a[1] == "where":
                where_c = _lift(self.ev(a[2][0]))
            elif a[0] == "call" and a[1] == "nullValue":
                nullv, has_null = self.ev(a[2][0]), True
        return name, where_c, (nullv if has_null else None), has_null

    def stmt_MAPVALUE(self, args):
        idx = int(self.ev(args[0]))
        self._mixed_ternary = False
        val = self.ev(args[1])
        mixed = getattr(self, "_mixed_ternary", False)
        expr = _lift(val)
        name, where_c, nullv, has_null = self._value_stmt_opts(args[2:])
        if has_null:   # nullValue(alt): null results take the alternative
            expr = F.coalesce(expr, _lift(nullv))
        is_t = self._is_time_expr(args[1])
        is_j = isinstance(val, (dict, list)) or (
            args[1][0] == "call" and args[1][1] in self._OBJ_FNS)
        cur = self._cur()
        if idx < 0:  # MAPVALUE(-1, v) == PUSHVALUE(0, v) (fm_monad.go:1745)
            if where_c is not None:   # PUSHVALUE where-false inserts NULL
                expr = F.when(where_c, expr)
            cur.insert(0, (expr, name or "column", is_t, is_j))
            remap = {i: i + 1 for i in range(len(cur) - 1)}
            target = 0
        elif idx >= len(cur):
            if where_c is not None:
                expr = F.when(where_c, expr)
            cur.append((expr, name or "column", is_t, is_j))
            remap = {i: i for i in range(len(cur) - 1)}
            target = len(cur) - 1
        else:
            if where_c is not None:   # MAPVALUE where-false KEEPS the old
                expr = F.when(where_c, expr).otherwise(cur[idx][0])
            cur[idx] = (expr, name or self.state.names[idx], is_t, is_j)
            # the overwritten position loses its slice/gostr rendering
            remap = {i: i for i in range(len(cur)) if i != idx}
            target = idx
        prev_slices, prev_gostrs = self._remap_render_sets(remap)
        self._reproject(cur)
        self.state.slices = prev_slices
        self.state.gostrs = prev_gostrs | ({target} if mixed else set())

    def stmt_PUSHVALUE(self, args):
        idx = max(0, min(int(self.ev(args[0])), self.ncols))
        val = self.ev(args[1])
        expr = _lift(val)
        name, where_c, nullv, has_null = self._value_stmt_opts(args[2:])
        if has_null:
            expr = F.coalesce(expr, _lift(nullv))
        if where_c is not None:   # where-false pushes NULL (fm_monad:1677)
            expr = F.when(where_c, expr)
        is_j = isinstance(val, (dict, list)) or (
            args[1][0] == "call" and args[1][1] in self._OBJ_FNS)
        cur = self._cur()
        # default insert name is literally "column" (fm_monad.go:1613)
        cur.insert(idx, (expr, name or "column",
                         self._is_time_expr(args[1]), is_j))
        remap = {i: (i + 1 if i >= idx else i) for i in range(len(cur) - 1)}
        prev_slices, prev_gostrs = self._remap_render_sets(remap)
        self._reproject(cur)
        self.state.slices, self.state.gostrs = prev_slices, prev_gostrs

    def stmt_POPVALUE(self, args):
        drop = {int(self.ev(a)) for a in args}
        keep = [i for i in range(self.ncols) if i not in drop]
        remap = {old: new for new, old in enumerate(keep)}
        cur = [e for i, e in enumerate(self._cur()) if i not in drop]
        prev_slices, prev_gostrs = self._remap_render_sets(remap)
        self._reproject(cur)
        self.state.slices, self.state.gostrs = prev_slices, prev_gostrs

    def _remap_render_sets(self, remap: dict) -> tuple[set, set]:
        """Carry the sink-rendering position sets (slices → '%T', gostrs →
        Go %v re-floating) across a reprojection: positions move per
        `remap`; positions absent from it (overwritten/popped) drop out.
        Call BEFORE _reproject (which resets both sets)."""
        st = self.state
        return ({remap[i] for i in st.slices if i in remap},
                {remap[i] for i in st.gostrs if i in remap})

    def stmt_MAPKEY(self, args):
        self.state.df = self.state.df.withColumn("__key", _lift(self.ev(args[0])))
        # the key column is renamed literally "key" (fm_monad.go:1604)
        self.state.key_name = "key"

    def stmt_PUSHKEY(self, args):
        newkey = _lift(self.ev(args[0]))
        cur = [(F.col("__key"), self.state.key_name, False)] + self._cur()
        df = self.state.df
        self.state.df = df.withColumn("__newkey", newkey)
        sel = [F.col("__seq"), F.col("__newkey").alias("__key2")] + [
            e.alias(f"c{i}") for i, (e, *_r) in enumerate(cur)]
        self._set(self.state.df.select(*sel).withColumnRenamed("__key2", "__key"),
                  [e[1] for e in cur])
        # the new key column is named "key" (fm_monad.go:1577 MakeColumnOf)
        self.state.key_name = "key"

    def stmt_POPKEY(self, args):
        idx = int(self.ev(args[0])) if args else 0
        cur = self._cur()
        if not cur:
            return
        idx = max(0, min(idx, len(cur) - 1))
        newkey = cur.pop(idx)[0]
        df = self.state.df.withColumn("__k2", newkey)
        sel = [F.col("__seq"), F.col("__k2").alias("__key")] + [
            e.alias(f"c{i}") for i, (e, *_r) in enumerate(cur)]
        self._set(df.select(*sel), [e[1] for e in cur])

    def stmt_FLATTEN(self, args):
        if getattr(self, "_fft_exploded", False):
            # reference: keyed FFT emits one record per key holding the
            # (hz, ampl) list; ours is already exploded — FLATTEN = identity
            self._fft_exploded = False
            return
        if getattr(self, "_grouped_by_key", False):
            # GROUPBYKEY chunks values per key; FLATTEN re-emits the chunk
            # elements as records — since we never physically chunk, this
            # is identity (records keep their group key and arrival order)
            self._grouped_by_key = False
            return
        df = self.state.df
        last = f"c{self.ncols - 1}"
        self.state.df = df.select(
            "__seq", "__key",
            *[F.col(c) for c in self._vcols()[:-1]],
            F.explode(F.col(last)).alias(last))

    def stmt_TRANSPOSE(self, args):
        """TRANSPOSE([header(bool)][, fixed(i...)| i...]) (fm_monad.go:2415).

        Output order is row-major: new __seq = old_seq * ncols + col_index.
        header(true) consumes the first record as column names (the single
        driver-side row materialization in this front-end)."""
        opts, pos = self._opt_calls(args)
        header = bool(opts["header"][0][0]) if "header" in opts else False
        idxs = [int(self.ev(p)) for p in pos]
        if "fixed" in opts:
            fixed = sorted(int(i) for i in opts["fixed"][0])
            melt = [i for i in range(self.ncols) if i not in fixed]
        elif idxs:
            melt = sorted(idxs)
            fixed = [i for i in range(self.ncols) if i not in set(melt)]
        else:
            melt, fixed = list(range(self.ncols)), []
        df, names = self.state.df, self.state.names
        hdr_names = None
        if header:
            first = df.orderBy("__seq").limit(1).collect()[0]
            hdr_names = [str(first[f"c{i}"]) for i in range(self.ncols)]
            df = df.filter(F.col("__seq") > first["__seq"])
        nmelt = len(melt)
        pairs: list[Column] = []
        for j, m in enumerate(melt):
            pairs.append(F.lit(j))
            if hdr_names:
                pairs.append(F.lit(hdr_names[m]))
            pairs.append(F.col(f"c{m}").cast("string"))
        stack_cols = ("__j", "__hdr", "__v") if hdr_names else ("__j", "__v")
        stacked = df.select(
            "__seq", "__key", *[F.col(f"c{i}") for i in fixed],
            F.stack(F.lit(nmelt), *pairs).alias(*stack_cols))
        out_exprs = [F.col(f"c{i}") for i in fixed]
        out_names: list = [hdr_names[i] if hdr_names else names[i] for i in fixed]
        if hdr_names:
            out_exprs.append(F.col("__hdr"))
            out_names.append("header")
        out_exprs.append(F.col("__v"))
        out_names.append(None)
        sel = [(F.col("__seq") * nmelt + F.col("__j")).alias("__seq"),
               F.col("__key")] + [e.alias(f"c{i}") for i, e in enumerate(out_exprs)]
        self._set(stacked.select(*sel), out_names)

    # ---------------------------------------------- per-stream series ops
    # MAP_XXX(idx, input_expr, args...) writes the derived column at value
    # position idx (replace in-range / append out-of-range, like MAPVALUE);
    # the stream order is arrival order __seq (fm_monad.go MAP_* family).

    def _place(self, idx: int, expr, name=None, is_time=False):
        cur = self._cur()
        if idx < 0:
            cur.insert(0, (expr, name, is_time))
        elif idx >= len(cur):
            cur.append((expr, name, is_time))
        else:
            cur[idx] = (expr, name or self.state.names[idx], is_time)
        self._reproject(cur)

    def _seq_window(self):
        return Window.orderBy("__seq")

    def stmt_MAP_DIFF(self, args):
        v = _lift(self.ev(args[1])).cast("double")
        self._place(int(self.ev(args[0])), v - F.lag(v).over(self._seq_window()))

    def stmt_MAP_ABSDIFF(self, args):
        v = _lift(self.ev(args[1])).cast("double")
        self._place(int(self.ev(args[0])),
                    F.abs(v - F.lag(v).over(self._seq_window())))

    def stmt_MAP_NONEGDIFF(self, args):
        v = _lift(self.ev(args[1])).cast("double")
        d = v - F.lag(v).over(self._seq_window())
        # NULL first diff stays NULL (greatest(NULL, 0) would coerce to 0)
        self._place(int(self.ev(args[0])),
                    F.when(d.isNotNull(), F.greatest(d, F.lit(0.0))))

    def stmt_MAP_AVG(self, args):
        v = _lift(self.ev(args[1])).cast("double")
        w = self._seq_window().rowsBetween(Window.unboundedPreceding, 0)
        self._place(int(self.ev(args[0])), F.avg(v).over(w))

    def stmt_MAP_MOVAVG(self, args):
        opts, pos = self._opt_calls(args)
        idx, v = int(self.ev(pos[0])), _lift(self.ev(pos[1])).cast("double")
        win = int(self.ev(pos[2]))
        no_wait = bool(opts["noWait"][0][0]) if "noWait" in opts else False
        w = self._seq_window()
        ma = F.avg(v).over(w.rowsBetween(-(win - 1), 0))
        if not no_wait:  # NULL until the buffer holds `win` records
            ma = F.when(F.row_number().over(w) >= win, ma)
        self._place(idx, ma)

    def _materialized_series_op(self, args, op_fn, **kw):
        """Shared shape for recurrence kernels (lowpass/kalman): materialize
        the input expression, run the operator ordered by __seq, place."""
        idx = int(self.ev(args[0]))
        v = _lift(self.ev(args[1])).cast("double")
        df = self.state.df.withColumn("__si", v)
        out = op_fn(df, "__si", **kw)
        self.state.df = out
        self._place(idx, F.col("__so"))
        self.state.df = self.state.df.drop("__si", "__so")

    def stmt_MAP_LOWPASS(self, args):
        from neo_server_spark.operators import series as S
        alpha = float(self.ev(args[2]))
        self._materialized_series_op(
            args, S.map_lowpass, alpha=alpha, out="__so", order_by="__seq")

    def stmt_MAP_DISTANCE(self, args):
        """MAP_DISTANCE(idx, latLon(lat, lon) [, "name"])
        (fm_monad.go:2109-2142): haversine meters from the PREVIOUS record's
        point, first record 0, spliced at value idx (MAPVALUE placement)."""
        from neo_server_spark.operators import series as S
        idx = int(self.ev(args[0]))
        node = args[1]
        if node[0] != "call" or node[1] not in ("latLon", "latlon"):
            raise ValueError("MAP_DISTANCE 2nd arg must be latLon(lat, lon)")
        lat = _lift(self.ev(node[2][0])).cast("double")
        lon = _lift(self.ev(node[2][1])).cast("double")
        name = self.ev(args[2]) if len(args) > 2 and args[2][0] == "str" else None
        df = self.state.df.withColumn("__dla", lat).withColumn("__dlo", lon)
        self.state.df = S.map_distance(df, "__dla", "__dlo", out="__so",
                                       order_by="__seq")
        self._place(idx, F.col("__so"), name=name)
        self.state.df = self.state.df.drop("__dla", "__dlo", "__so")

    def stmt_MAP_KALMAN(self, args):
        from neo_server_spark.operators import series as S
        model = args[2]
        iv, pv, ov = [float(self.ev(a)) for a in model[2]] if (
            model[0] == "call" and model[1] == "model") else (1.0, 1.0, 2.0)
        self._materialized_series_op(
            args, S.map_kalman, out="__so", order_by="__seq",
            init_variance=iv, process_variance=pv, observation_variance=ov)

    def stmt_FILTER_CHANGED(self, args):
        """FILTER_CHANGED(value [, retain(t, dur)] [, useFirstWithLast(b)])
        (fm_monad.go:121-238).  The option forms delegate to the DSL's
        driver-green gaps-and-islands implementation (operators/maps.py
        filter_changed); the plain form stays a single lag() pass."""
        opts, pos = self._opt_calls(args[1:])
        v = _lift(self.ev(args[0]))
        if not opts:
            w = self._seq_window()
            prev = F.lag(v).over(w)
            keep = prev.isNull() | ~prev.eqNullSafe(v)
            # window exprs can't sit in WHERE: materialize, then filter
            df = self.state.df.withColumn("__fc_keep", keep)
            self.state.df = df.filter(F.col("__fc_keep")).drop("__fc_keep")
            return
        retain_ns, time_expr = None, None
        if "retain" in opts:
            t_arg, dur = opts["retain"][0]
            time_expr = _lift(t_arg)
            retain_ns = _dur_ns(dur)
        use_first = with_last = False
        if "useFirstWithLast" in opts:
            # reference: the option's presence sets useFirst; its flag
            # controls withLast (fm_monad.go:134-136)
            use_first, with_last = True, bool(opts["useFirstWithLast"][0][0])
        # EXACT emission rules of the one-VM BufferedFilter
        # (fm_monad.go:121-207; task_test.go TestMapChanged verbatim):
        #  - the stream's FIRST record always emits (init);
        #  - retain without useFirstWithLast: the record that crosses the
        #    hold (first rn>=2 with t - run_start_t >= dur), every run;
        #  - retain + useFirst: the run's FIRST record once the run crosses
        #    — except the stream's first run (its firstRecord is nil);
        #  - withLast: the LAST record of every run with >= 2 records
        #    (no-retain form: last of EVERY run — singles emit twice).
        df = self.state.df.withColumn("__fc_v", v)
        if time_expr is not None:
            df = df.withColumn("__fc_t", time_expr.cast("long"))
        w = Window.orderBy("__seq")
        prev = F.lag("__fc_v").over(w)
        chg = F.when(prev.isNull() | ~prev.eqNullSafe(F.col("__fc_v")), 1) \
            .otherwise(0)
        df = df.withColumn(
            "__rid", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding,
                                                   0)))
        rw = Window.partitionBy("__rid").orderBy("__seq")
        fullr = rw.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
        df = df.withColumn("__rn", F.row_number().over(rw)) \
            .withColumn("__lastrn", F.max("__rn").over(fullr))
        if retain_ns is not None:
            t0 = F.first("__fc_t").over(fullr)
            df = df.withColumn(
                "__xrn",
                F.min(F.when((F.col("__rn") >= 2)
                             & (F.col("__fc_t") - t0 >= F.lit(retain_ns)),
                             F.col("__rn"))).over(fullr))
        first_emit = (F.col("__rn") == 1) & (F.col("__rid") == 1)
        if retain_ns is None:
            if not use_first:
                first_emit = F.col("__rn") == 1      # plain / legacy path
            else:
                first_emit = F.col("__rn") == 1      # every run's head
        else:
            if use_first:
                first_emit = first_emit | (
                    (F.col("__rn") == 1) & (F.col("__rid") > 1)
                    & F.col("__xrn").isNotNull())
            else:
                first_emit = first_emit | (F.col("__rn") == F.col("__xrn"))
        last_emit = F.lit(False)
        if with_last:
            last_emit = F.col("__rn") == F.col("__lastrn")
            if retain_ns is not None:
                last_emit = last_emit & (F.col("__lastrn") >= 2)
        firsts = df.filter(first_emit).withColumn("__e", F.lit(0))
        lasts = df.filter(last_emit).withColumn("__e", F.lit(1))
        out = firsts.unionByName(lasts) if with_last else firsts
        w2 = Window.orderBy("__seq", "__e")
        out = out.withColumn("__seq", F.row_number().over(w2) - 1)
        self.state.df = out.drop("__fc_v", "__fc_t", "__rid", "__rn",
                                 "__lastrn", "__xrn", "__e")

    def stmt_GROUPBYKEY(self, args):
        """GROUPBYKEY([lazy(b)]) — group the stream by the record key; the
        downstream node consumes per-key sample lists (fm_monad.go GROUPBYKEY).
        Batch mapping: a flag — the next bulk operator (FFT) runs per key."""
        self._grouped_by_key = True

    def stmt_FFT(self, args):
        """FFT([minHz(h)][, maxHz(h)]) — records must be (time, value)
        (fm_fourier.go); output records become (hz, ampl), keyed by the
        group key after GROUPBYKEY (fft2d/fft3d shapes)."""
        from neo_server_spark.operators import series as S
        opts, _ = self._opt_calls(args)
        min_hz = float(opts["minHz"][0][0]) if "minHz" in opts else None
        max_hz = float(opts["maxHz"][0][0]) if "maxHz" in opts else None
        grouped = getattr(self, "_grouped_by_key", False)
        vcols = [c for c in self.state.df.columns
                 if c.startswith("c") and c[1:].isdigit()]
        if grouped:
            if len(vcols) != 2:
                # fm_fourier.go:63 — sample tuples must be (time, value)
                raise ValueError("f(FFT) sample should be a tuple of "
                                 f"(time, value), but len={len(vcols)}")
            df = self.state.df.select(
                F.col("__key").alias("__k"),
                F.col("c0").cast("long").alias("time"),
                F.col("c1").cast("double").alias("value"))
            out = S.fft(df, series=["__k"], min_hz=min_hz, max_hz=max_hz)
            w = Window.orderBy("__k", "hz")
            res = out.select(
                (F.row_number().over(w) - 1).alias("__seq"),
                F.col("__k").alias("__key"),
                F.col("hz").alias("c0"), F.col("ampl").alias("c1"))
            self._grouped_by_key = False
            self._fft_exploded = True  # FLATTEN after keyed FFT is identity
        else:
            # Without GROUPBYKEY every record carries ONE sample —
            # fm_fourier.go:48-52 DROPS chunks with fewer than 16 samples
            # instead of raising, so ungrouped FFT emits nothing.
            res = (self.state.df.limit(0)
                   .select(F.lit(0).alias("__seq"),
                           F.lit(0.0).alias("__key"),
                           F.lit(0.0).alias("c0"), F.lit(0.0).alias("c1")))
        self._set(res, ["hz", "ampl"])
        self.state.key_name = "time"  # group key was a time bucket

    def stmt_ARGS(self, args):
        """ARGS() (fm_context.go:113-121): the task's invocation arguments
        become ONE record whose values are the arg list; with no args the
        record's value is the EMPTY tuple (fmArgsParam returns []any{}) —
        downstream MAPVALUEs insert into it (task_test.go TestArgs)."""
        if not self.arg_values:
            self._set(self._from_rows([()], 0), [])
            return
        self._set(self._from_rows([tuple(self.arg_values)],
                                  len(self.arg_values)),
                  [None] * len(self.arg_values))

    def stmt_HTTP(self, args):
        """HTTP('<METHOD> <URL> [HTTP/ver]\\n?q=v\\nHeader: v\\n\\nbody')
        (fm_encoder.go:169-183, mods/util/httpdsl/exec.go): execute the
        HTTP-DSL request; the RAW response (status line + headers + body)
        becomes a single record.  Driver-side by contract — the reference
        uses this for config/presentation feeds, not data-plane ingest.
        File directives ('< /path') are not supported (no server-side fs)."""
        import urllib.request

        content = str(self.ev(args[0]))
        lines = content.splitlines()
        i = 0
        while i < len(lines) and not lines[i].strip():
            i += 1
        if i >= len(lines):
            raise ValueError("HTTP: empty request")
        first = lines[i].strip().split()
        if len(first) < 2:
            raise ValueError("HTTP: first line must be '<METHOD> <URL>'")
        method, url = first[0].upper(), first[1]
        i += 1
        headers: dict[str, str] = {}
        while i < len(lines) and lines[i].strip():
            ln = lines[i].strip()
            if ln.startswith(("?", "&")):      # query extension lines:
                # values are raw text in the DSL and must be
                # percent-encoded on the wire (httpdsl exec)
                import urllib.parse as _up
                k, sep, v = ln[1:].partition("=")
                part = (_up.quote(k, safe="") + "=" + _up.quote(v, safe="")
                        if sep else _up.quote(ln[1:], safe="=&"))
                url += ("&" if "?" in url else "?") + part
            elif ln.startswith("<"):
                raise ValueError("HTTP: file directives are not supported")
            else:
                k, _, v = ln.partition(":")
                headers[k.strip()] = v.strip()
            i += 1
        body = "\n".join(lines[i + 1:]) if i < len(lines) else ""
        req = urllib.request.Request(_require_http_url(url), method=method,
                                     headers=headers,
                                     data=body.encode() if body.strip() else None)
        with urllib.request.urlopen(req, timeout=10.0) as rsp:
            payload = rsp.read().decode("utf-8", "replace")
            status = f"HTTP/1.1 {rsp.status} {rsp.reason}"
            hdrs = "".join(f"{k}: {v}\r\n" for k, v in rsp.headers.items())
        raw = f"{status}\r\n{hdrs}\r\n{payload}"
        self._set(self._from_rows([(raw,)], 1), [None])

    def stmt_SCRIPT(self, args):
        """SCRIPT(["js",] [init,] main [, deinit]) (fm_script.go:34-109):
        run a JS block once per inflight record (MAP position) or once with
        no inflight (SRC position), in ONE persistent VM — ``$.key``,
        ``$.values``, ``$.params``, ``$.payload``, ``$.result``,
        ``$.yield()``, ``$.yieldKey()``, ``$.yieldArray()`` and an optional
        ``finalize()`` hook mirror the reference's goja context
        (tql_test.go TestScript goldens).

        Execution is a restricted ECMAScript interpreter (tql/jslite.py) —
        no system JS engine is required and no host escape surface exists.
        The record loop streams through toLocalIterator (bounded driver
        memory), matching the reference's own single-VM serial contract;
        the distributed scale path for stateless per-record kernels is the
        DSL's ``Pipeline.script`` (mapInPandas)."""
        from neo_server_spark.tql import jslite

        texts = []
        for a in args:
            if a[0] in ("brace", "str"):
                texts.append(a[1])
            else:
                raise ValueError("SCRIPT arguments must be string or {...} blocks")
        if texts and texts[0].strip().lower() == "js":
            texts = texts[1:]
        if not 1 <= len(texts) <= 3:
            raise ValueError(
                "SCRIPT( init_script, main_script, deinit_script )")
        if len(texts) == 1:
            init, main, deinit = "", texts[0], ""
        elif len(texts) == 2:
            init, main, deinit = texts[0], texts[1], ""
        else:
            init, main, deinit = texts

        dollar = _Dollar(self)
        self.script_logs: list[tuple[str, str]] = getattr(self, "script_logs", [])
        interp = jslite.Interpreter(
            dollar, log=lambda lvl, msg: self.script_logs.append((lvl, msg)))
        main_ast = interp.prepare(main)
        # envelope carry-over captured BEFORE either execution path: the
        # SOURCE's column list survives into the JSON envelope when the
        # script sets no $.result (SetResultColumns semantics)
        prev_env = None
        if self.state.df is not None and self.state.names:
            from neo_server_spark.codecs.encoders import machbase_type
            _disp = [nm or f"column{i}"
                     for i, nm in enumerate(self.state.names)]
            _sch = {f.name: f.dataType for f in self.state.df.schema.fields}
            prev_env = (_disp, [machbase_type(_sch[f"c{i}"])
                                for i in range(len(_disp))
                                if f"c{i}" in _sch])
        if (self.state.df is not None and not init and not deinit
                and self.script_distribute
                and jslite.analyze_stateless(main_ast)
                and self._script_fast_path(main_ast)):
            if prev_env is not None:   # fast path: no $.result by def.
                self.state.env_names, self.state.env_types = prev_env
            return
        if init:
            interp.run(init)
        if self.state.df is None:
            # SRC position: one synthetic inflight, $.payload available
            dollar.key, dollar.values = None, []
            interp.exec_ast(main_ast)
        else:
            dollar.payload = jslite.UNDEFINED  # payload is SRC-only (fm_script.go:186)
            src_df = self.state.df.orderBy("__seq")
            vcols = self._vcols()
            for row in src_df.toLocalIterator():
                dollar.key = row["__key"]
                dollar.values = [row[c] for c in vcols]
                interp.exec_ast(main_ast)
        interp.call_if_defined("finalize")
        if deinit:
            interp.run(deinit)

        rows = dollar.rows
        nvals = max((len(v) for _, v in rows), default=0)
        names: list = [None] * nvals
        times: set[int] = set()
        env_names = env_types = None
        result = dollar.result
        if isinstance(result, dict):
            rcols = result.get("columns")
            if isinstance(rcols, list):
                names = [str(c) for c in rcols[:nvals]] + \
                    [None] * max(0, nvals - len(rcols))
                env_names = [str(c) for c in rcols]
            rtypes = result.get("types")
            if isinstance(rtypes, list):
                times = {i for i, t in enumerate(rtypes[:nvals])
                         if str(t) == "datetime"}
                env_types = [str(t) for t in rtypes]
        if env_names is None and prev_env is not None:
            env_names, env_types = prev_env
        data = []
        for seq, (key, vals) in enumerate(rows):
            vals = list(vals) + [None] * (nvals - len(vals))
            data.append((seq, key if key is not None else seq + 1, *vals))
        norm, schema, date_cols = _normalize_script_columns(data, nvals)
        times |= date_cols
        df = self.spark.createDataFrame(norm, schema)
        self._set(df, names, times=times)
        self.state.env_names = env_names
        self.state.env_types = env_types

    #: prefix length for the fast path's driver-side schema inference
    _SCRIPT_INFER_PREFIX = 200

    def _script_fast_path(self, main_ast) -> bool:
        """Distributed execution for statically-stateless SCRIPT blocks:
        run the block over a bounded record prefix on the driver to infer
        the yield schema, then mapInPandas the whole stream — no
        toLocalIterator, no serial VM.  Returns False (caller falls back
        to the serial path) when inference can't stand in for the full
        stream: zero prefix yields, or a NULL inflight key (whose
        yield-ordinal fallback needs the global row counter).

        Output order: __seq = src_seq * 1e6 + yield_ordinal preserves the
        serial emission order for up to 1e6 yields per record."""
        from neo_server_spark.tql import jslite

        vcols = self._vcols()
        src = self.state.df.select("__seq", "__key", *vcols)
        prefix = src.orderBy("__seq").limit(self._SCRIPT_INFER_PREFIX + 1) \
            .collect()
        whole = len(prefix) <= self._SCRIPT_INFER_PREFIX
        if any(r["__key"] is None for r in prefix):
            return False
        probe = _BatchDollar(dict(self.params))
        interp = jslite.Interpreter(probe)
        sample: list[tuple] = []
        for row in prefix:
            probe.key = row["__key"]
            probe.values = [row[c] for c in vcols]
            interp.exec_ast(main_ast)
            for key, vals in probe.rows:
                sample.append((row["__seq"], key, vals))
            probe.rows.clear()
        if not sample:
            return False
        nvals = max(len(v) for _, _, v in sample)
        data = [(s, k, *(list(v) + [None] * (nvals - len(v))))
                for s, k, v in sample]
        _, schema, date_cols = _normalize_script_columns(data, nvals)
        ktype = schema.fields[1].dataType.simpleString()
        vtypes = [f.dataType.simpleString() for f in schema.fields[2:]]
        if whole:
            # prefix IS the stream: the probe already produced every row —
            # emit it directly, identical to the serial path
            out = []
            for s, k, v in sample:
                out.append((len(out), k if k is not None else len(out) + 1,
                            *(list(v) + [None] * (nvals - len(v)))))
            norm, schema2, dc2 = _normalize_script_columns(out, nvals)
            df = self.spark.createDataFrame(norm, schema2)
            self._set(df, [None] * nvals, times=dc2)
            return True
        simple = {"bigint": "long", "boolean": "boolean",
                  "double": "double", "string": "string"}
        kconv = _script_coercer(simple.get(ktype, "string"), False)
        coercers = [_script_coercer(simple.get(t, "string"), i in date_cols)
                    for i, t in enumerate(vtypes)]
        params = dict(self.params)
        ast = main_ast

        def kern(batches):
            import pandas as pd
            from neo_server_spark.tql import jslite as J
            d = _BatchDollar(params)
            vm = J.Interpreter(d)
            for pdf in batches:
                cols: dict[str, list] = {"__s0": [], "__s1": [], "__key": []}
                for i in range(nvals):
                    cols[f"c{i}"] = []
                for t in pdf.itertuples(index=False, name=None):
                    seq = int(t[0])
                    d.key = t[1].item() if hasattr(t[1], "item") else t[1]
                    d.values = [v.item() if hasattr(v, "item") else v
                                for v in t[2:]]
                    vm.exec_ast(ast)
                    for j, (key, vals) in enumerate(d.rows):
                        if len(vals) > nvals:
                            raise RuntimeError(
                                "SCRIPT fast path: a record yielded more "
                                "columns than the inference prefix saw; "
                                "run with script_distribute=False")
                        cols["__s0"].append(seq)
                        cols["__s1"].append(j)
                        cols["__key"].append(kconv(key))
                        vals = list(vals) + [None] * (nvals - len(vals))
                        for i in range(nvals):
                            cols[f"c{i}"].append(coercers[i](vals[i]))
                    d.rows.clear()
                yield pd.DataFrame(cols)

        spark_t = {"bigint": "long", "double": "double",
                   "boolean": "boolean", "string": "string"}
        fields = ["__s0 long", "__s1 long",
                  f"__key {spark_t.get(ktype, ktype)}"] + [
            f"c{i} {spark_t.get(t, t)}" for i, t in enumerate(vtypes)]
        out = src.mapInPandas(kern, ", ".join(fields))
        # __seq is an ORDERING token, not dense: combine (src_seq, yield
        # ordinal) in decimal(38,0) — a long product overflows when the
        # source __seq is a monotonically_increasing_id (partition_id in
        # the high bits) on a >1000-partition cluster
        df = out.select(
            (F.col("__s0").cast("decimal(38,0)") * F.lit(1_000_000)
             + F.col("__s1")).alias("__seq"),
            "__key", *[f"c{i}" for i in range(nvals)])
        self._set(df, [None] * nvals, times=date_cols)
        return True

    #: sub-commands the reference's shell runner refuses (fm_shell.go:94)
    _SHELL_BLOCKLIST = frozenset(
        {"exit", "quit", "set", "help", "clear", "shutdown"})

    def stmt_SHELL(self, args):
        """SHELL(cmd) (fm_shell.go:49-137): split the command string into
        ';'-terminated sub-commands, refuse blocklisted ones, and exec each
        WITHOUT a system shell — the reference never invokes /bin/sh (it
        routes sub-commands through its own fixed neo-shell binary with an
        argv list); mirroring that, each sub-command is shlex-tokenized and
        exec'd argv-style, so $(...), backticks, pipes and redirects are
        inert text, never interpreted.  Additionally gated behind
        TqlRunner(allow_shell=True): a .tql script is untrusted input and
        must not be a host-exec primitive by default."""
        import shlex
        import subprocess
        if not self.allow_shell:
            raise PermissionError(
                "SHELL() is disabled: construct TqlRunner(allow_shell=True) "
                "to permit scripts to execute host commands")
        cmd = str(self.ev(args[0]))
        # tokenize with ';' as punctuation so a semicolon INSIDE quotes
        # stays part of its argument (splitting the raw string first would
        # break quoted literals apart)
        lex = shlex.shlex(cmd, posix=True, punctuation_chars=";")
        lex.whitespace_split = True
        subcmds: list[list[str]] = [[]]
        for tok in lex:
            if tok == ";":
                subcmds.append([])
            else:
                subcmds[-1].append(tok)
        combined = []
        for toks in subcmds:
            if not toks:
                continue
            if toks[0].lower() in self._SHELL_BLOCKLIST:
                raise ValueError(f"command {toks[0]!r} is not supported")
            res = subprocess.run(toks, shell=False, capture_output=True,
                                 text=True)
            combined.append(res.stdout)
        # the reference runs ONE script and splits the combined output on
        # "\n" — strings.Split keeps the empty tail after the final
        # newline, so that empty string becomes a real record
        # (fm_shell.go:131-135, TestTql SHELL expects the trailing blank)
        lines = "".join(combined).split("\n")
        self._set(self._from_rows([(ln,) for ln in lines], 1),
                  ["RESULT"])

    def stmt_HISTOGRAM(self, args):
        """HISTOGRAM(value(n), bins(min,max,step) [, category(value(m))]
        [, order(...)]) (fm_stat.go:36-290) — lowers to stats.histogram.
        Output records: (low, high, count...) ordered by bin."""
        from neo_server_spark.operators import stats as ST
        opts, pos = self._opt_calls(args)
        v = _lift(self.ev(pos[0]))
        if "bins" in opts and len(opts["bins"][0]) == 1:
            # bins(maxBins): the UNPREDICTED-bins path — the streaming
            # merging histogram over arrival order (fm_stat.go:76-79 ->
            # mods/nums/histogram.go; task_test.go
            # TestHistogramUnpredictedBins: output (value, count))
            n = int(opts["bins"][0][0])
            df = self.state.df.withColumn("__hv", v) \
                .withColumn("__hc", F.lit(""))
            out = ST.histogram_stream_exact(df, "__hv", max_bins=n,
                                            category="__hc",
                                            order_by=("__seq",))
            res = out.select(
                (F.col("b") - 1).alias("__seq"),
                F.col("b").alias("__key"),
                F.col("x").alias("c0"), F.col("y").alias("c1"))
            self._set(res, ["value", "count"])
            return
        if "bins" not in opts:
            raise ValueError("HISTOGRAM requires bins(min, max, step)")
        if len(opts["bins"][0]) not in (1, 3):   # fm_stat.go:251
            raise ValueError("f(bins) invalid number of args; "
                             f"expected 1 or 3, got {len(opts['bins'][0])}")
        bmin, bmax, bstep = [float(x) for x in opts["bins"][0]]
        df = self.state.df.withColumn("__hv", v)
        cat = None
        if "category" in opts:
            df = df.withColumn("__hc", _lift(opts["category"][0][0]).cast("string"))
            cat = "__hc"
        order = [str(x) for x in opts["order"][0]] if "order" in opts else None
        out = ST.histogram(df, "__hv", bmin, bmax, bstep, category=cat, order=order)
        cols = [c for c in out.columns]
        w = Window.orderBy("low")
        res = out.select(
            (F.row_number().over(w) - 1).alias("__seq"),
            F.col("low").alias("__key"),
            # backtick-escape: category column names may contain dots
            *[F.col("`%s`" % c.replace("`", "``")).alias(f"c{i}")
              for i, c in enumerate(cols)])
        self._set(res, cols)

    @staticmethod
    def _gonum_quantile(xs, n, p: float, lin: bool):
        """gonum stat.Quantile over a sorted array column: Empirical picks
        x_{ceil(p*n)} (1-indexed — smallest x with CDF >= p); LinInterp
        interpolates on the cumulative-weight axis (see
        operators/group.py quantile_lininterp for the derivation)."""
        fidx = F.lit(float(p)) * n
        i = F.greatest(F.ceil(fidx).cast("int"), F.lit(1))
        if not lin:
            return F.element_at(xs, i)
        lo = F.element_at(xs, F.greatest(i - 1, F.lit(1)))
        hi = F.element_at(xs, i)
        t = fidx - (i.cast("double") - F.lit(1.0))
        return F.when(fidx <= 1.0, F.element_at(xs, 1)) \
            .otherwise(lo + t * (hi - lo))

    def stmt_BOXPLOT(self, args):
        """BOXPLOT(value [, category(c)] [, order(...)]
        [, boxplotInterp(q1,q2,q3)] [, boxplotOutput('standard'|'chart'|
        'dict')]) (fm_stat.go:294-530).

        Standard (default) output is the reference's TRANSPOSED table: rows
        MIN/LOWER/Q1/Q2/Q3/UPPER/MAX/IQR/OUTLIER with one column per
        category (fm_stat.go:452-505).  boxplotInterp picks gonum
        Empirical vs LinInterp per quartile (fm_stat.go:340-357).  Like the
        reference, results materialize at EOF — category cardinality is
        bounded, so the driver-side transpose is O(categories).  OUTLIER
        cells render as the literal '[]float64' — byte-what the reference's
        CSV encoder prints for a Go slice (csv_encode.go %T default arm);
        chart/dict formats carry the real values as JSON text."""
        import json as _json

        from neo_server_spark.codecs.encoders import _format_float

        opts, pos = self._opt_calls(args)
        v = _lift(self.ev(pos[0])).cast("double")
        i1 = i2 = i3 = False
        if "boxplotInterp" in opts:
            fl = [bool(x) for x in opts["boxplotInterp"][0]] + [False] * 3
            i1, i2, i3 = fl[0], fl[1], fl[2]
        fmt = "standard"
        if "boxplotOutput" in opts:
            f = str(opts["boxplotOutput"][0][0]).lower()
            fmt = f if f in ("chart", "dict") else "standard"
        orders = [str(x) for row in opts.get("order", []) for x in row]
        df = self.state.df.withColumn("__bv", v)
        if "category" in opts:
            df = df.withColumn(
                "__bc", _lift(opts["category"][0][0]).cast("string"))
        else:
            df = df.withColumn("__bc", F.lit(""))
        xs = F.array_sort(F.collect_list("__bv"))
        agg = df.groupBy("__bc").agg(xs.alias("xs"))
        n = F.size("xs").cast("double")
        q1 = self._gonum_quantile(F.col("xs"), n, 0.25, i1)
        q2 = self._gonum_quantile(F.col("xs"), n, 0.5, i2)
        q3 = self._gonum_quantile(F.col("xs"), n, 0.75, i3)
        stats = agg.select(
            "__bc", q1.alias("q1"), q2.alias("q2"), q3.alias("q3"),
            F.element_at("xs", 1).alias("mn"),
            F.element_at("xs", -1).alias("mx"), F.col("xs"))
        stats = stats.withColumn("iqr", F.col("q3") - F.col("q1")) \
            .withColumn("lower", F.col("q1") - 1.5 * F.col("iqr")) \
            .withColumn("upper", F.col("q3") + 1.5 * F.col("iqr")) \
            .withColumn("outlier", F.filter(
                "xs", lambda o: (o < F.col("lower")) | (o > F.col("upper"))))
        rows = {r["__bc"]: r for r in stats.drop("xs").collect()}
        cats = [c for c in orders if c in rows] + \
            sorted(c for c in rows if c not in orders)
        names = [c if c != "" else f"boxplot_{i}"
                 for i, c in enumerate(cats)]
        if fmt == "dict":
            row = [_json.dumps({
                "min": rows[c]["mn"], "max": rows[c]["mx"],
                "q1": rows[c]["q1"], "q2": rows[c]["q2"], "q3": rows[c]["q3"],
                "lower": rows[c]["lower"], "upper": rows[c]["upper"],
                "iqr": rows[c]["iqr"], "outlier": list(rows[c]["outlier"]),
            }) for c in cats]
            self._set(self._from_rows([tuple(row)], len(cats)), names)
            return
        if fmt == "chart":
            out = [(c,
                    _json.dumps([rows[c]["lower"], rows[c]["q1"],
                                 rows[c]["q2"], rows[c]["q3"],
                                 rows[c]["upper"]]),
                    _json.dumps([[c, o] for o in rows[c]["outlier"]]))
                   for c in cats]
            self._set(self._from_rows(out, 3),
                      ["CATEGORY", "BOXPLOT", "OUTLIER"])
            # chart rows carry []any values: JSON embeds them as arrays,
            # CSV's default %T case prints "[]interface {}"
            self.state.jsons |= {1, 2}
            self.state.slices |= {1, 2}
            return
        labels = [("MIN", "mn"), ("LOWER", "lower"), ("Q1", "q1"),
                  ("Q2", "q2"), ("Q3", "q3"), ("UPPER", "upper"),
                  ("MAX", "mx"), ("IQR", "iqr"), ("OUTLIER", None)]
        out = []
        for label, fieldn in labels:
            cells = ["[]float64" if fieldn is None
                     else _format_float(rows[c][fieldn]) for c in cats]
            out.append((label, *cells))
        self._set(self._from_rows(out, 1 + len(cats)),
                  ["CATEGORY"] + names)

    def stmt_THROTTLE(self, args):
        pass  # rate limiting is a no-op in batch (fm_monad.go THROTTLE)

    _AGG_FNS = {"sum", "avg", "mean", "min", "max", "first", "last", "count",
                "rss", "rms", "median", "medianInterpolated", "stddev",
                "stderr", "entropy", "variance", "mode", "quantile",
                "quantileInterpolated", "cdf", "list", "correlation",
                "covariance", "moment", "lrs"}

    @staticmethod
    def _make_agg(fn: str, src: str, alias: str, order_col: str = "__seq"):
        """Shared aggregate constructor for GROUP and TIMEWINDOW
        (fm_monad.go newAggregate); ``order_col`` feeds first/last."""
        from neo_server_spark.operators.group import agg as A
        table = {
            "sum": lambda: A.sum(src, alias),
            "avg": lambda: A.avg(src, alias),
            "mean": lambda: A.avg(src, alias),
            "min": lambda: A.min(src, alias),
            "max": lambda: A.max(src, alias),
            "count": lambda: A.count(src, alias),
            "first": lambda: A.first(src, order_col, alias),
            "last": lambda: A.last(src, order_col, alias),
            "rss": lambda: A.rss(src, alias),
            "rms": lambda: A.rms(src, alias),
            "median": lambda: A.median(src, alias),
            "medianInterpolated": lambda: A.median_lininterp(src, alias),
            "median-interpolated": lambda: A.median_lininterp(src, alias),
            "stddev": lambda: A.stddev(src, alias),
            "stderr": lambda: A.stderr(src, alias),
            "variance": lambda: A.variance(src, alias),
            "entropy": lambda: A.entropy_raw(src, alias),
            "mode": lambda: A.mode(src, alias),
            "list": lambda: A.list(src, alias),
            "lrs": lambda: A.lrs(order_col, src, alias),
        }.get(fn)
        return table() if table else None

    #: TIMEWINDOW interpolation spec suffixes -> timewindow fill modes
    _INTERP_FILLS = {
        "linearregression": "linearregression",
        "piecewiseconstant": "piecewiseconstant",
        "piecewiselinear": "piecewiselinear",
        "akimaspline": "akimaspline",
        "fritschbutland": "fritschbutland",
    }

    def stmt_TIMEWINDOW(self, args):
        """TIMEWINDOW(time(from), time(until), period(d) [, nullValue(v)],
        'colspec'...) (fm_monad.go fmTimeWindow): colspec i describes input
        column i — 'time' marks the basetime, anything else is an aggregate
        name, optionally ':Interpolator' for gap prediction.  Lowers onto
        operators.group.timewindow (gap-filled calendar buckets)."""
        from neo_server_spark.operators.group import timewindow as TW
        opts, pos = self._opt_calls(args)
        from_ns = int(self.ev(pos[0]))
        until_ns = int(self.ev(pos[1]))
        period_ns = _dur_ns(opts["period"][0][0])
        specs = [str(self.ev(pnode)) for pnode in pos[2:]]
        t_idx = specs.index("time")
        default_fill = ("null", None)
        if "nullValue" in opts:
            default_fill = ("value", float(opts["nullValue"][0][0]))
        staged = self.state.df.withColumn(
            "__twt", F.col(f"c{t_idx}").cast("long"))
        aggs, out_slots = [], []
        fills: dict[str, tuple] = {}  # per-OUTPUT-column fill mode
        for i, spec in enumerate(specs):
            if i == t_idx:
                continue
            fn, _, interp = spec.partition(":")
            # ':Interpolator' applies to THIS column only (the reference
            # carries one filler per aggregate, fm_monad.go fmTimeWindow);
            # columns without one fall back to the shared nullValue/null
            fills[f"__to{i}"] = (
                (self._INTERP_FILLS[interp.lower()], None) if interp
                else default_fill)
            raw_ok = fn in ("count", "first", "last", "mode", "list")
            src_col = F.col(f"c{i}")
            staged = staged.withColumn(
                f"__tin{i}", src_col if raw_ok else src_col.cast("double"))
            col = self._make_agg(fn, f"__tin{i}", f"__to{i}", order_col="__twt")
            if col is None:
                raise NameError(f"unsupported TIMEWINDOW aggregate {fn}()")
            aggs.append(col)
            out_slots.append(i)
        out = TW(staged, "__twt", from_ns, until_ns, period_ns, aggs,
                 bucket_name="__twb", fill=fills)
        w = Window.orderBy("__twb")
        exprs = {t_idx: F.col("__twb")}
        for i in out_slots:
            exprs[i] = F.col(f"__to{i}")
        res = out.select(
            (F.row_number().over(w) - 1).alias("__seq"),
            F.col("__twb").alias("__key"),
            *[exprs[i].alias(f"c{i}") for i in sorted(exprs)])
        self._set(res, [self.state.names[i] for i in sorted(exprs)],
                  times={sorted(exprs).index(t_idx)})

    def stmt_GROUP(self, args):
        """GROUP(by(v, "name")..., agg(v, "name")...) — lazy sorted emit
        (fm_monad.go GROUP; sorted-by-key emission order)."""
        from neo_server_spark.operators.group import agg as A
        df = self.state.df
        bys: list[tuple[Column, str]] = []
        aggs: list[Column] = []
        out_names: list = []
        tmp_i = 0
        pre: list[Column] = []
        agg_fills: list[tuple] = []  # per-agg (nullValue, predict) options
        timewin: tuple | None = None
        by_times: set[int] = set()   # time-typed by() positions

        def mat(col: Column) -> str:
            nonlocal tmp_i
            nm = f"__a{tmp_i}"
            tmp_i += 1
            pre.append(col.alias(nm))
            return nm

        for a in args:
            if a[0] != "call":
                continue
            fn, fargs = a[1], a[2]
            if fn in ("lazy",):
                continue
            if fn == "by":
                by_time = (self._is_time_expr(fargs[0])
                           or self._is_time_valref(fargs[0]))
                expr = _lift(self.ev(fargs[0]))
                if len(fargs) > 1 and fargs[1][0] == "call" \
                        and fargs[1][1] == "timewindow":
                    twargs = fargs[1][2]
                    tw = (int(self.ev(twargs[0])), int(self.ev(twargs[1])),
                          _dur_ns(self.ev(twargs[2][2][0])
                                  if twargs[2][0] == "call"
                                  else self.ev(twargs[2])))
                    bys.append((F.col(mat(expr.cast("long"))), "GROUP"))
                    timewin = tw
                    continue
                nm = self.ev(fargs[1]) if len(fargs) > 1 else "GROUP"
                bys.append((F.col(mat(expr)), nm))
                if by_time:
                    by_times.add(len(bys) - 1)
                continue
            if fn not in self._AGG_FNS:
                continue
            expr = _lift(self.ev(fargs[0]))
            # per-aggregate options: name string, nullValue(v), predict(kind),
            # weight(expr), where(cond) (fm_monad.go fmAggregate/newAggregate
            # option scan; fmWhere:719)
            nm, nullv, predict, wexpr, wcond = None, None, None, None, None
            for extra in fargs[1:]:
                if extra[0] == "str":
                    nm = extra[1]
                elif extra[0] == "call" and extra[1] == "nullValue":
                    nullv = float(self.ev(extra[2][0]))
                elif extra[0] == "call" and extra[1] == "predict":
                    predict = str(self.ev(extra[2][0])).lower()
                elif extra[0] == "call" and extra[1] == "weight":
                    wexpr = _lift(self.ev(extra[2][0]))
                elif extra[0] == "call" and extra[1] == "where":
                    wcond = _lift(self.ev(extra[2][0]))
            nm = nm if nm is not None else fn.upper()
            wc = F.col(mat(wcond.cast("boolean"))) if wcond is not None \
                else None
            # two-value relation aggregates (fm_monad.go:909-935:
            # lrs(x, y) / correlation(x, y) / covariance(x, y))
            if fn in ("correlation", "covariance") or (
                    fn == "lrs" and len(fargs) > 1
                    and fargs[1][0] != "str" and not (
                        fargs[1][0] == "call" and fargs[1][1] in (
                            "nullValue", "predict", "weight", "where"))):
                x = mat(expr.cast("double"))
                y = mat(_lift(self.ev(fargs[1])).cast("double"))
                alias = f"__o{len(out_names)}"
                rel = {"correlation": lambda: A.correlation(x, y, alias, wc),
                       "covariance": lambda: A.covariance(x, y, alias, wc),
                       "lrs": lambda: A.lrs(x, y, alias, wc)}[fn]
                aggs.append(rel())
                out_names.append(nm)
                agg_fills.append((nullv, predict))
                continue
            # count/first/last/mode/list operate on RAW record values (the
            # reference aggregates untyped values; count counts records) —
            # only the numeric aggregates coerce to double
            raw_ok = fn in ("count", "first", "last", "mode", "list")
            src = mat(expr if raw_ok else expr.cast("double"))
            alias = f"__o{len(out_names)}"
            if wexpr is not None:
                # weight() variants (newAggregate Weight arm,
                # fm_monad.go:822-828; gonum weighted stat semantics)
                wsrc = mat(wexpr.cast("double"))
                wb = {
                    "mean": lambda: A.wavg(src, wsrc, alias),
                    "avg": lambda: A.wavg(src, wsrc, alias),
                    "variance": lambda: A.wvariance(src, wsrc, alias),
                    "stddev": lambda: A.wstddev(src, wsrc, alias),
                    "stderr": lambda: A.wstderr(src, wsrc, alias),
                    "median": lambda: A.wquantile(src, wsrc, 0.5, alias),
                    "mode": lambda: A.wmode(src, wsrc, alias),
                }.get(fn)
                if wb is None and fn == "quantile":
                    p = float(self.ev(fargs[1]))
                    wb = lambda: A.wquantile(src, wsrc, p, alias)  # noqa: E731
                if wb is None:
                    raise NameError(
                        f"GROUP aggregate {fn}() does not take weight()")
                aggs.append(wb())
                out_names.append(nm)
                agg_fills.append((nullv, predict))
                continue
            builder = {
                "sum": lambda: A.sum(src, alias, wc),
                "avg": lambda: A.avg(src, alias, wc),
                "mean": lambda: A.avg(src, alias, wc),
                "min": lambda: A.min(src, alias, wc),
                "max": lambda: A.max(src, alias, wc),
                "count": lambda: A.count(src, alias, wc),
                "first": lambda: A.first(src, "__seq", alias, wc),
                "last": lambda: A.last(src, "__seq", alias, wc),
                "rss": lambda: A.rss(src, alias, wc),
                "rms": lambda: A.rms(src, alias, wc),
                "median": lambda: A.median(src, alias, wc),
                "medianInterpolated": lambda: A.median_lininterp(src, alias,
                                                                 wc),
                "stddev": lambda: A.stddev(src, alias, wc),
                "stderr": lambda: A.stderr(src, alias, wc),
                "variance": lambda: A.variance(src, alias, wc),
                "entropy": lambda: A.entropy_raw(src, alias, wc),
                "mode": lambda: A.mode(src, alias, wc),
                "list": lambda: A.list(src, alias, wc),
                "lrs": lambda: A.lrs("__seq", src, alias, wc),
            }.get(fn)
            if builder is None:
                if fn in ("quantile", "quantileInterpolated", "cdf", "moment"):
                    p = float(self.ev(fargs[1]))
                    nm = self.ev(fargs[2]) if len(fargs) > 2 else fn.upper()
                    col = {"quantile": lambda: A.quantile(src, p, alias, wc),
                           "quantileInterpolated": lambda: A.quantile_lininterp(src, p, alias, wc),
                           "cdf": lambda: A.cdf(src, p, alias, wc),
                           "moment": lambda: A.moment(src, int(p), alias, wc)}[fn]()
                    aggs.append(col)
                    out_names.append(nm)
                    # exactly one fill slot per emitted aggregate — __o{j}
                    # alignment breaks if this is appended anywhere else
                    agg_fills.append((nullv, predict))
                    continue
                raise NameError(f"unsupported GROUP aggregate {fn}()")
            aggs.append(builder())
            out_names.append(nm)
            agg_fills.append((nullv, predict))

        # by-group string keys stay strings (not cast double): re-materialize
        # by columns without the double cast applied to agg inputs
        staged = df.select("__seq", "__key", *self._vcols(), *pre)
        by_cols = [c for c, _ in bys]
        if timewin is not None:
            # GROUP(by(t, timewindow(from, until, period)), aggs...) — the
            # gap-filled calendar grouping (fm_monad.go:426-435)
            from neo_server_spark.operators.group import timewindow as TW
            f_ns, u_ns, p_ns = timewin
            twdf = TW(staged.withColumn("__twt", by_cols[0]),
                      "__twt", f_ns, u_ns, p_ns, aggs, bucket_name="__gb")
            # per-aggregate gap fills (fm_monad.go GroupFiller): the filler
            # Fit()s progressively as buckets STREAM, so a gap bucket sees
            # only PRECEDING data — predict('linearregression') is an
            # expanding-window regression (NULL until two fit points),
            # every other predictor clamps to the last fitted value; an
            # additional nullValue(v) is the terminal fallback.
            wf = Window.orderBy("__gb")
            prev_w = wf.rowsBetween(Window.unboundedPreceding, 0)
            for j, (nullv, predict) in enumerate(agg_fills):
                c = F.col(f"__o{j}")
                filled = c
                if predict == "linearregression":
                    x = F.col("__gb").cast("double")
                    slope = F.regr_slope(c, x).over(prev_w)
                    icept = F.regr_intercept(c, x).over(prev_w)
                    filled = F.coalesce(c, slope * x + icept)
                elif predict is not None:
                    filled = F.coalesce(c, F.last(c, ignorenulls=True).over(prev_w))
                if nullv is not None:
                    filled = F.coalesce(filled, F.lit(nullv))
                if predict is not None or nullv is not None:
                    twdf = twdf.withColumn(f"__o{j}", filled)
            w = Window.orderBy("__gb")
            out = twdf.select(
                (F.row_number().over(w) - 1).alias("__seq"),
                F.col("__gb").alias("__key"),
                F.col("__gb").alias("c0"),
                *[F.col(f"__o{j}").alias(f"c{1 + j}")
                  for j in range(len(out_names))])
            self._set(out, ["GROUP"] + out_names, times={0})
            return
        grouped = staged.groupBy(*by_cols).agg(*aggs) if by_cols else staged.agg(*aggs)
        order = [c for c, _ in bys] or [F.lit(1)]
        # per-aggregate nullValue()/predict() fills apply to PLAIN groups
        # too (fm_monad.go GroupFiller runs per aggregate regardless of
        # timewindow; values stream in sorted-key order)
        if any(nv is not None or pr is not None for nv, pr in agg_fills):
            wf = Window.orderBy(*order)
            prev_w = wf.rowsBetween(Window.unboundedPreceding, 0)
            for j, (nullv, predict) in enumerate(agg_fills):
                c = F.col(f"__o{j}")
                filled = c
                if predict is not None:
                    filled = F.coalesce(
                        c, F.last(c, ignorenulls=True).over(prev_w))
                if nullv is not None:
                    filled = F.coalesce(filled, F.lit(nullv))
                if predict is not None or nullv is not None:
                    grouped = grouped.withColumn(f"__o{j}", filled)
        w = Window.orderBy(*order)
        out = grouped.select(
            (F.row_number().over(w) - 1).alias("__seq"),
            (by_cols[0] if by_cols else F.lit(None)).alias("__key"),
            *[c.alias(f"c{i}") for i, (c, _) in enumerate(bys)],
            *[F.col(f"__o{j}").alias(f"c{len(bys) + j}") for j in range(len(out_names))])
        self._set(out, [nm for _, nm in bys] + out_names, times=by_times)

    def stmt_SET(self, args):
        """SET(name, expr) — bind a per-record variable readable as $name
        in later expressions (task_node.go:137-147, task_record.go:123-139;
        task_test.go TestSetVariables).  The bound value is a column
        expression over the record, so downstream $name references compose
        per record exactly like the reference's record vars."""
        if args[0][0] not in ("ident", "str"):
            raise ValueError("SET(name, expr): name must be an identifier")
        self.vars[args[0][1]] = self.ev(args[1])

    # ---------------------------------------------------------------- sinks

    def _csv_sink(self, args):
        from neo_server_spark.codecs import encoders
        opts, _ = self._opt_calls(args)
        header = bool((opts.get("header") or opts.get("heading") or [[False]])[0][0])
        precision = int(opts["precision"][0][0]) if "precision" in opts else -1
        timeformat = opts["timeformat"][0][0] if "timeformat" in opts else None
        if "sqlTimeformat" in opts:
            from neo_server_spark.functions.timefn import sql_timeformat_to_layout
            timeformat = sql_timeformat_to_layout(opts["sqlTimeformat"][0][0])
        elif "ansiTimeformat" in opts:
            from neo_server_spark.functions.timefn import ansi_timeformat_to_layout
            timeformat = ansi_timeformat_to_layout(opts["ansiTimeformat"][0][0])
        tz = opts["tz"][0][0] if "tz" in opts else None
        tz = _TZ_ALIASES.get(tz, tz)
        delimiter = opts["delimiter"][0][0] if "delimiter" in opts else ","
        # nullValue() is the current name, substituteNull() the legacy one
        # (fx_codec_opts; task_test.go TestJsonToCsv uses both)
        subst = (opts.get("nullValue") or opts.get("substituteNull")
                 or [["NULL"]])[0][0]
        # 'DEFAULT' is a real named layout ('2006-01-02 15:04:05.999',
        # time_formats.go:17) — only absence of the option leaves epoch-ns.
        # Time formatting and slice rendering run on the internal frame
        # (_render_frame) so duplicate display names stay legal.
        disp = self._render_frame(timeformat, tz)
        # + one extra "\n": the reference CSV Exporter writes a final
        # newline on Close (csv_encode.go:127) beyond the per-row ones,
        # so live task output = golden-file content + "\n".
        self.output = encoders.to_csv(
            disp, header=header, delimiter=delimiter, precision=precision,
            substitute_null=subst, timeformat=None,
            rownum="rownum" in opts and bool(opts["rownum"][0][0]),
            binaryformat=(str(opts["binaryformat"][0][0])
                          if "binaryformat" in opts else "hex"),
            time_cols=()) + "\n"

    def stmt_JSON(self, args):
        from neo_server_spark.codecs import encoders
        opts, _ = self._opt_calls(args)
        # JSON() takes the same time/precision/binary options as CSV()
        # (json_encode.go:57-108 setters)
        timeformat = opts["timeformat"][0][0] if "timeformat" in opts else None
        if "sqlTimeformat" in opts:
            from neo_server_spark.functions.timefn import sql_timeformat_to_layout
            timeformat = sql_timeformat_to_layout(opts["sqlTimeformat"][0][0])
        elif "ansiTimeformat" in opts:
            from neo_server_spark.functions.timefn import ansi_timeformat_to_layout
            timeformat = ansi_timeformat_to_layout(opts["ansiTimeformat"][0][0])
        tz = opts["tz"][0][0] if "tz" in opts else None
        tz = _TZ_ALIASES.get(tz, tz)
        disp = self._render_frame(timeformat, tz, slice_repr=False)
        jcols = tuple(disp.columns[i] for i in sorted(self.state.jsons)
                      if i < len(disp.columns))
        self.output = encoders.to_json_envelope(
            disp,
            transpose="transpose" in opts and bool(opts["transpose"][0][0]),
            rows_flatten="rowsFlatten" in opts and bool(opts["rowsFlatten"][0][0]),
            rows_array="rowsArray" in opts and bool(opts["rowsArray"][0][0]),
            rownum="rownum" in opts and bool(opts["rownum"][0][0]),
            precision=(int(opts["precision"][0][0])
                       if "precision" in opts else -1),
            binaryformat=(str(opts["binaryformat"][0][0])
                          if "binaryformat" in opts else "hex"),
            columns=self.state.env_names,
            types=self.state.env_types,
            json_cols=jcols)

    def stmt_MARKDOWN(self, args):
        from neo_server_spark.codecs import encoders
        opts, pos = self._opt_calls(args)
        tmpl = next((a[1] for a in pos if a[0] == "brace"), None)
        if tmpl is not None:
            self.output = self._render_template(tmpl)
            return
        prec = int(opts["precision"][0][0]) if "precision" in opts else -1
        # MARKDOWN takes the same timeformat()/tz() options as CSV/JSON
        # (md_encode.go SetTimeformat/SetTimeLocation)
        timeformat = (opts["timeformat"][0][0]
                      if "timeformat" in opts else None)
        tz = opts["tz"][0][0] if "tz" in opts else None
        tz = _TZ_ALIASES.get(tz, tz)
        # dynamically-typed positions (mixed ternary): numeric-looking
        # values are floats in the reference and markdown renders them %f —
        # rewritten on the internal c{i} frame before display aliasing
        saved = self.state.df
        for i in sorted(self.state.gostrs):
            if i < len(self.state.names):
                c = F.col(f"c{i}")
                num = c.rlike(r"^-?[0-9]+(\.[0-9]+)?$")
                fmt = F.format_string(f"%.{prec if prec >= 0 else 6}f",
                                      c.cast("double"))
                self.state.df = self.state.df.withColumn(
                    f"c{i}", F.when(num, fmt).otherwise(c))
        disp = self._render_frame(timeformat, tz)
        self.state.df = saved
        self.output = encoders.to_markdown(
            disp, html="html" in opts and bool(opts["html"][0][0]),
            precision=prec)

    def _render_template(self, tmpl: str) -> str:
        """Per-record Go-template rendering (fm_encoder template option;
        MARKDOWN_TEMPLATE + fm_script_test TestScriptToTemplate shapes):
        {{ if .IsFirst/.IsLast }}, {{ with .V }} / {{ with .Value N }},
        {{ .Value N }}, {{ .Key }}, {{ .field }} inside with-blocks,
        {{"literal"}} strings, and the {{- / -}} whitespace trim markers.
        define/template/range blocks are not supported."""
        import json as _json
        import re as _re

        from neo_server_spark.codecs.encoders import _format_float

        # --- lex: text / action parts with trim-marker handling
        parts: list[list] = []
        pos = 0
        for m in _re.finditer(r"\{\{(-?)\s*(.*?)\s*(-?)\}\}", tmpl, _re.S):
            parts.append(["text", tmpl[pos:m.start()]])
            parts.append(["act", m.group(2), m.group(1) == "-",
                          m.group(3) == "-"])
            pos = m.end()
        parts.append(["text", tmpl[pos:]])
        for i, p in enumerate(parts):
            if p[0] != "act":
                continue
            if p[2] and i > 0 and parts[i - 1][0] == "text":
                parts[i - 1][1] = parts[i - 1][1].rstrip()
            if p[3] and i + 1 < len(parts) and parts[i + 1][0] == "text":
                parts[i + 1][1] = parts[i + 1][1].lstrip()

        # --- parse actions into a block tree
        def parse(idx):
            nodes = []
            while idx < len(parts):
                p = parts[idx]
                if p[0] == "text":
                    nodes.append(("text", p[1]))
                    idx += 1
                    continue
                act = p[1]
                if act == "end":
                    return nodes, idx + 1
                m = _re.match(r"(if|with)\s+(.*)$", act, _re.S)
                if m:
                    body, idx = parse(idx + 1)
                    nodes.append((m.group(1), m.group(2).strip(), body))
                    continue
                nodes.append(("expr", act))
                idx += 1
            return nodes, idx

        tree, _ = parse(0)

        def fmt(v):
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                return _format_float(v)
            return "" if v is None else str(v)

        disp = self._display()
        names = list(disp.columns)
        rows = disp.collect()
        n = len(rows)
        jsons = set(self.state.jsons)

        def value_of(r, i):
            v = r[i]
            # OBJECT values travel as canonical JSON text in the record
            # model (dict()/SCRIPT object yields) — re-embed for field
            # access, like the JSON sink does
            if isinstance(v, str) and (i in jsons or
                                       (v[:1] in "{[" and v[-1:] in "}]")):
                try:
                    return _json.loads(v)
                except ValueError:
                    return v
            return v

        def resolve(expr, ctx, r, rownum):
            expr = expr.strip()
            if expr.startswith('"') and expr.endswith('"') and len(expr) >= 2:
                # {{"\n"}} literal strings (either pre-unescaped by the
                # tokenizer or still carrying backslash escapes)
                return (expr[1:-1].replace("\\n", "\n")
                        .replace("\\t", "\t").replace('\\"', '"'))
            m = _re.match(r"\.Value\s+(\d+)$", expr)
            if m:
                return value_of(r, int(m.group(1)))
            if expr == ".Key":
                return rownum
            if expr == ".V":
                return {names[i]: value_of(r, i) for i in range(len(names))}
            if expr.startswith("."):
                cur = ctx[-1]
                for fieldn in expr[1:].split("."):
                    if isinstance(cur, dict):
                        cur = cur.get(fieldn)
                    else:
                        cur = getattr(cur, fieldn, None)
                return cur
            return None

        def render(nodes, ctx, r, rownum, flags):
            buf = []
            for node in nodes:
                if node[0] == "text":
                    buf.append(node[1])
                elif node[0] == "expr":
                    buf.append(fmt(resolve(node[1], ctx, r, rownum)))
                elif node[0] == "if":
                    cond = (flags.get(node[1][1:])
                            if node[1].startswith(".") and node[1][1:] in flags
                            else resolve(node[1], ctx, r, rownum))
                    if cond:
                        buf.append(render(node[2], ctx, r, rownum, flags))
                elif node[0] == "with":
                    bound = resolve(node[1], ctx, r, rownum)
                    if bound:
                        buf.append(render(node[2], ctx + [bound], r, rownum,
                                          flags))
            return "".join(buf)

        out = []
        for i, r in enumerate(rows):
            flags = {"IsFirst": i == 0, "IsLast": i == n - 1}
            out.append(render(tree, [flags], r, i + 1, flags))
        return "".join(out)

    def stmt_NDJSON(self, args):
        from neo_server_spark.codecs import encoders
        opts, _ = self._opt_calls(args)
        tf = opts["timeformat"][0][0] if "timeformat" in opts else None
        if tf and tf.lower() == "default":
            tf = "Default"
        tz = opts["tz"][0][0] if "tz" in opts else None
        tz = _TZ_ALIASES.get(tz, tz)
        disp = self._render_frame(tf, tz)
        # Close() writes a final "\n" (ndjson/encode.go:99), like CSV.
        self.output = encoders.to_ndjson(
            disp, timeformat=None,
            rownum="rownum" in opts and bool(opts["rownum"][0][0]),
            precision=(int(opts["precision"][0][0])
                       if "precision" in opts else -1),
            binaryformat=(str(opts["binaryformat"][0][0])
                          if "binaryformat" in opts else "hex"),
            time_cols=()) + "\n"

    def stmt_DISCARD(self, args):
        self.state.df.count()  # execute, emit nothing (fm_encoder DISCARD)
        self.output = ""

    # ------------------------------------------------------ presentation sinks

    def stmt_HTML(self, args):
        """HTML() sink (mods/codec/internal/html) — table fragment."""
        from neo_server_spark.codecs import encoders
        self.output = encoders.to_html(self._display())

    def stmt_TEXT(self, args):
        """TEXT([template]) sink (mods/codec Format TEXT) — TSV by
        default; a string or {brace} argument renders per record as a Go
        template (TestScriptToTemplate shapes)."""
        from neo_server_spark.codecs import encoders
        opts, pos = self._opt_calls(args)
        tmpl = next((a[1] for a in pos if a[0] in ("brace", "str")), None)
        if tmpl is not None:
            self.output = self._render_template(tmpl)
            return
        self.output = encoders.to_text(self._display())

    def stmt_BOX(self, args):
        """BOX([precision(n)][, timeformat(f)][, heading(b)][, rownum(b)])
        (mods/codec/internal/box/box_encode.go)."""
        from neo_server_spark.codecs import encoders
        opts, _ = self._opt_calls(args)
        kw: dict = {}
        if "precision" in opts:
            kw["precision"] = int(opts["precision"][0][0])
        if "timeformat" in opts:
            kw["timeformat"] = str(opts["timeformat"][0][0])
        if "tz" in opts:
            tz = str(opts["tz"][0][0])
            kw["tz"] = _TZ_ALIASES.get(tz, tz)
        if "heading" in opts:
            kw["heading"] = bool(opts["heading"][0][0])
        if "rownum" in opts:
            kw["rownum"] = bool(opts["rownum"][0][0])
        disp = self._render_frame(kw.pop("timeformat", None),
                                  kw.pop("tz", None))
        kw["time_cols"] = ()
        self.output = encoders.to_box(disp, **kw)

    #: echarts themes shipped by the reference (chart.go themeNames)
    _CHART_THEMES = frozenset({
        "white", "dark", "essos", "chalk", "purple-passion", "romantic",
        "walden", "westeros", "wonderland", "vintage", "macarons",
        "infographic", "shine", "roma"})
    _CHART_PLUGINS = {
        "liquidfill": "/web/echarts/echarts-liquidfill.min.js",
        "wordcloud": "/web/echarts/echarts-wordcloud.min.js",
        "gl": "/web/echarts/echarts-gl.min.js",
    }

    def _chart_columns_js(self) -> list[str]:
        """Record columns -> JS const arrays (chart.go Close, column(idx)
        substitution): time columns render as epoch-ms floats, integral
        floats without a fraction (Go json.Marshal float64 parity)."""
        import json as _json

        df = self.state.df.orderBy("__seq")
        rows = df.collect()
        nv = len(self._vcols())

        def jsval(v, is_time):
            if v is None:
                return None
            if is_time:
                ms = int(v) / 1e6
                return int(ms) if ms == int(ms) else ms
            if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
                return int(v)
            return v
        out = []
        for ci in range(nv):
            is_time = ci in self.state.times
            data = [jsval(r[f"c{ci}"], is_time) for r in rows]
            out.append(_json.dumps(data, separators=(",", ":")))
        return out

    def stmt_CHART(self, args):
        """CHART(chartOption({...}) [, chartID(s)] [, theme(s)]
        [, size(w, h)] [, chartJSON(b)] [, plugins(s...)])
        (fm_encoder.go:105, chart.go:249-330): emits the reference's JSON
        envelope {chartID, jsAssets, jsCodeAssets, style, theme} and stores
        the column-data JS asset on ``self.chart_js`` (the reference writes
        it through a VolatileFileWriter; chart_test.go TestLine pins both).
        chartID defaults to a content hash — the reference's snowflake ID
        is random, which a deterministic engine must not be."""
        import hashlib
        import json as _json

        opts, _ = self._opt_calls(args)
        option = ""
        # option('...') is the string form of chartOption (fm_context.go:171
        # SetChartOption)
        opt_src = opts.get("chartOption") or opts.get("option")
        if opt_src:
            # the tokenizer strips a brace blob's outer {} — restore them so
            # the option text reaches the JS asset verbatim (chart.go keeps
            # the script-supplied string untouched)
            raw = str(opt_src[0][0]).strip()
            option = raw if raw.startswith("{") else "{\n" + raw + "\n}"
        theme = str(opts["theme"][0][0]) if "theme" in opts else "white"
        width, height = "600px", "600px"
        if "size" in opts:
            width, height = str(opts["size"][0][0]), str(opts["size"][0][1])
        cols_js = self._chart_columns_js()
        chart_id = str(opts["chartID"][0][0]) if "chartID" in opts else \
            "C" + hashlib.sha1((option + "|".join(cols_js)).encode()).hexdigest()[:12]

        js_assets = ["/web/echarts/echarts.min.js"]
        if theme in self._CHART_THEMES:
            if theme != "white":
                js_assets.append(f"/web/echarts/themes/{theme}.js")
        elif theme.startswith(("http://", "https://")):
            js_assets.append(theme)
        for row in opts.get("plugins", []):
            for p in row:
                js_assets.append(self._CHART_PLUGINS.get(str(p), str(p)))

        lines = ['(()=>{', '    "use strict";']
        names = []
        for i, colv in enumerate(cols_js):
            names.append(f"_column_{i}")
            lines.append(f"    const _column_{i}={colv};")
        lines.append(f"    const _columns=[{','.join(names)}];")
        lines.append("    function column(idx) { return _columns[idx]; }")
        lines.append(f"    let _chartID = '{chart_id}';")
        lines.append(f'    let _chart = echarts.init(document.getElementById(_chartID), "{theme}");')
        if option:
            lines.append(f"    let _chartOption = {option};")
            lines.append("    _chart.setOption(_chartOption);")
            lines.append('    _chart.dispatchAction({"areas": {}, "type": ""});')
        lines.append("})();")
        self.chart_js = "\n".join(lines)

        if "chartJSON" in opts and bool(opts["chartJSON"][0][0]):
            envelope = {
                "chartID": chart_id,
                "jsAssets": js_assets,
                "jsCodeAssets": [f"/web/api/tql-assets/{chart_id}.js"],
                "style": {"width": width, "height": height},
                "theme": theme,
            }
            self.output = _json.dumps(envelope, separators=(",", ":"))
        else:
            # default output is the HTML page (chart/test/test_line.html):
            # script tags per asset, centered chart div sized per style
            asset_tags = "\n".join(
                f'    <script src="{a}"></script>' for a in js_assets)
            self.output = f"""<!DOCTYPE html>
<html>
<head>
    <meta charset="utf-8">
    <title></title>
{asset_tags}
    <style>
        .chart_container {{margin-top:30px; display: flex;justify-content: center;align-items: center; height: 100%;}}
        .chart_item {{margin: auto;}}
    </style>
</head>

<body style="width:100vw; height:100vh">
<div class="chart_container">
    <div class="chart_item" id="{chart_id}" style="width:{width};height:{height};"></div>
</div>
<script src="/web/api/tql-assets/{chart_id}.js"></script>

</body>
</html>
"""

    def _chart_compat(self, kind: str, args):
        """CHART_LINE/BAR/SCATTER (chartcompat.go): series auto-built from
        the record columns — column 0 is the x axis.  markArea(from, to
        [, label, color, opacity]) / markXAxis(coord, name) /
        markYAxis(coord, name) options inject the echarts markArea /
        markLine entries (fm_encoder.go fmMarkArea, chartcompat.go
        SetMarkAreaNameCoord / SetMarkLine*AxisCoord)."""
        from neo_server_spark.codecs import encoders
        opts, _ = self._opt_calls(args)
        mark_areas = []
        for a in opts.get("markArea", ()):
            if len(a) < 2:
                raise ValueError("f(markArea) invalid number of args; "
                                 f"expect:2, actual:{len(a)}")
            mark_areas.append((a[0], a[1],
                               str(a[2]) if len(a) > 2 else ""))
        mark_x = [(a[0], str(a[1]) if len(a) > 1 else "")
                  for a in opts.get("markXAxis", ())]
        mark_y = [(a[0], str(a[1]) if len(a) > 1 else "")
                  for a in opts.get("markYAxis", ())]
        disp = self._display()
        self.output = encoders.to_chart_spec(
            disp, x=disp.columns[0], kind=kind,
            mark_areas=mark_areas or None, mark_x=mark_x or None,
            mark_y=mark_y or None)

    def stmt_CHART_LINE(self, args):
        self._chart_compat("line", args)

    def stmt_CHART_BAR(self, args):
        self._chart_compat("bar", args)

    def stmt_CHART_SCATTER(self, args):
        self._chart_compat("scatter", args)

    # 3D variants (fm_encoder.go:125-139) — same compat option builder; the
    # renderer picks the gl series type
    def stmt_CHART_LINE3D(self, args):
        self._chart_compat("line3D", args)

    def stmt_CHART_BAR3D(self, args):
        self._chart_compat("bar3D", args)

    def stmt_CHART_SCATTER3D(self, args):
        self._chart_compat("scatter3D", args)

    def stmt_CHART_SURFACE3D(self, args):
        self._chart_compat("surface", args)

    def stmt_GEOMAP(self, args):
        """GEOMAP([geomapID()] [, size(w,h)] [, zoomLevel(n)]
        [, tileTemplate(url)] [, tileGrayscale(g)] [, geomapJSON(b)])
        (mods/codec/internal/geomap): records carry leaflet layer dicts or
        GeoJSON objects; emits the reference's HTML page by default, the
        JSON envelope under geomapJSON(true), and stores the two JS assets
        on ``geomap_opt_js``/``geomap_js`` (the reference's volatile-file
        writes; geomap_test.go goldens byte-equal).  Numeric (lat, lon
        [, popup]) records lower to marker layers.  geomapID defaults to a
        content hash (the reference's snowflake ID is random, which a
        deterministic engine must not be)."""
        import hashlib
        import json as _json

        from neo_server_spark.codecs.geomap import GeoMapBuilder

        opts, _ = self._opt_calls(args)
        width, height = "600px", "600px"
        if "size" in opts:
            width, height = str(opts["size"][0][0]), str(opts["size"][0][1])
        zoom = int(opts["zoomLevel"][0][0]) if "zoomLevel" in opts else 0
        gs = float(opts["tileGrayscale"][0][0]) \
            if "tileGrayscale" in opts else 0.0
        tile = str(opts["tileTemplate"][0][0]) \
            if "tileTemplate" in opts else None
        disp = self._display()
        vals: list[dict] = []
        import decimal as _dec
        for r in disp.collect():
            cells = [float(c) if isinstance(c, _dec.Decimal) else c
                     for c in r]
            if (len(cells) >= 2
                    and all(isinstance(c, (int, float)) for c in cells[:2])):
                m = {"type": "marker",
                     "coordinates": [float(cells[0]), float(cells[1])]}
                if len(cells) > 2 and cells[2] is not None:
                    m["properties"] = {
                        "popup": {"content": str(cells[2])}}
                vals.append(m)
                continue
            for v in cells:
                if isinstance(v, str):
                    try:
                        v = _json.loads(v)
                    except ValueError:
                        continue
                if isinstance(v, dict):
                    vals.append(v)
        gid = str(opts["geomapID"][0][0]) if "geomapID" in opts else \
            "G" + hashlib.sha1(_json.dumps(
                vals, sort_keys=True, default=str).encode()).hexdigest()[:12]
        b = GeoMapBuilder(gid, width, height, gs, zoom, tile)
        for v in vals:
            b.add_value(v)
        self.geomap_opt_js = b.opt_js()
        self.geomap_js = b.js()
        if "geomapJSON" in opts and bool(opts["geomapJSON"][0][0]):
            self.output = _json.dumps(b.envelope(), separators=(",", ":"))
        else:
            self.output = b.html()

    # -------------------------------------------------------------- db sinks

    def stmt_INSERT(self, args):
        """INSERT([bridge('x'),] [tag('T'[, col]),] col..., table('name'))
        (fm_dbsink.go:38-165): positional record values land in the named
        columns of the target tag table (parquet dir under fs_root, or the
        bridge's JDBC table); tag() prepends a constant tag-name column
        (fm_dbsink.go:55-57,158-161); emits insert.Close()'s 'N rows
        inserted.' message wrapped in the db-sink Result envelope
        (http_query.go:926 renders IsDbSink results as JSON)."""
        import time as _time

        from neo_server_spark import io as nio
        tick = _time.time()
        opts, pos = self._opt_calls(args)
        if "table" not in opts:
            raise ValueError("INSERT requires table('name')")
        table = str(opts["table"][0][0])
        cols = [str(self.ev(p)) for p in pos]
        df = self.state.df.orderBy("__seq")
        vcols = self._vcols()[: len(cols)]
        sel = [F.col(vc).alias(cols[i]) for i, vc in enumerate(vcols)]
        if "tag" in opts:
            targs = opts["tag"][0]
            tag_col = str(targs[1]) if len(targs) > 1 else "name"
            cols = [tag_col] + cols
            sel = [F.lit(str(targs[0])).alias(tag_col)] + sel
        out = df.select(*sel)
        if "bridge" in opts:
            from neo_server_spark.sources.bridge import default_registry
            default_registry.get(str(opts["bridge"][0][0])).insert(out, table)
            n = out.count()
            self.output = _db_sink_envelope(
                f"{n} row{'s' if n != 1 else ''} inserted.", tick)
            return
        from neo_server_spark.sqlx import ddl
        if ddl.has_table(table):
            # engine tables created via DDL take the catalog path with
            # per-column coercion ('0x..' -> binary etc.)
            rows = [tuple(r) for r in out.collect()]
            n = ddl.insert_rows(self.spark, table, cols, rows)
            self.output = _db_sink_envelope(
                f"{n} row{'s' if n != 1 else ''} inserted.", tick)
            return
        path = self._resolve("/" + table)
        if {"name", "time", "value"} <= set(cols):
            nio.write_tag_table(out, path, mode="append")
        else:
            out.write.mode("append").parquet(path)
        n = out.count()
        self.output = _db_sink_envelope(
            f"{n} row{'s' if n != 1 else ''} inserted.", tick)

    def stmt_APPEND(self, args):
        """APPEND(table('name')) (fm_dbsink.go:167-252): bulk append of the
        record stream as-is; emits the reference's appender.Close()
        message wrapped in the db-sink Result envelope."""
        import time as _time

        from neo_server_spark import io as nio
        tick = _time.time()
        opts, _ = self._opt_calls(args)
        if "table" not in opts:
            raise ValueError("APPEND requires table('name')")
        table = str(opts["table"][0][0])
        disp = self._display()
        cols = list(disp.columns)
        from neo_server_spark.sqlx import ddl
        if ddl.has_table(table):
            # positional append into a DDL-created engine table
            tcols = [c for c, _m, _s in ddl._TABLES[table.lower()]["cols"]]
            rows = [tuple(r) for r in disp.collect()]
            n = ddl.insert_rows(self.spark, table,
                                tcols[: len(cols)], rows)
            unit = "rows" if n != 1 else "row"
            self.output = _db_sink_envelope(
                f"append {n} {unit} (success {n}, fail 0)", tick)
            return
        path = self._resolve("/" + table)
        if {"name", "time", "value"} <= set(cols):
            nio.write_tag_table(disp, path, mode="append")
        else:
            disp.write.mode("append").parquet(path)
        n = disp.count()
        unit = "rows" if n != 1 else "row"
        self.output = _db_sink_envelope(
            f"append {n} {unit} (success {n}, fail 0)", tick)

    # ------------------------------------------------------------------ WHEN

    def stmt_WHEN(self, args):
        """WHEN(cond, doLog(...)|doHttp(...)) (fm_monad.go:2395-2413): the
        doer fires per matching record as a side effect; errors are logged
        and swallowed; the record stream continues unchanged.  Matching
        records stream through the driver (the reference runs doers on its
        single task goroutine; the DSL's Pipeline.when/foreach is the
        executor-parallel form for stateless doers)."""
        from neo_server_spark.tql import doers as D
        cond = _lift(self.ev(args[0]))
        act = args[1]
        if act[0] != "call" or act[1] not in ("doLog", "doHttp", "do"):
            raise ValueError("WHEN 2nd arg must be doLog(...), doHttp(...) or do(...)")
        matches = self.state.df.filter(cond).orderBy("__seq")
        if act[1] == "do":
            # do(args..., {subscript}) (fm_monad.go:2310-2383): per matching
            # record, run a nested TQL task whose ARGS() source reads the
            # evaluated args; errors are logged and swallowed (Do's recover)
            code_node = act[2][-1]
            code = code_node[1] if code_node[0] in ("brace", "str") \
                else str(self.ev(code_node))
            arg_exprs = [self.ev(a) for a in act[2][:-1]]
            proj = [(_lift(v) if _is_col(v) else F.lit(v)).alias(f"__w{i}")
                    for i, v in enumerate(arg_exprs)]
            for row in matches.select(*proj).toLocalIterator():
                sub = TqlRunner(self.spark, fs_root=self.fs_root,
                                sf_dir=self.sf_dir, params=self.params,
                                allow_shell=self.allow_shell,
                                arg_values=list(row), subroutine=True)
                try:
                    sub.run(code)
                except Exception as e:
                    D.LOG.error("do: execution fail %s", e)
            return
        argvals = [self.ev(a) for a in act[2]]
        proj = [(_lift(v) if _is_col(v) else F.lit(v)).alias(f"__w{i}")
                for i, v in enumerate(argvals)]
        if act[1] == "doLog":
            for row in matches.select(*proj).toLocalIterator():
                D.LOG.info(" ".join(D._fmt_value(v) for v in row))
        else:  # doHttp(method, url [, headers...])
            lits = [v for v in argvals if not _is_col(v)]
            method, url, *headers = [str(v) for v in lits]
            doer = D.do_http(method, url, *headers)
            for row in matches.toLocalIterator():
                doer(row)
        # stream passes through unchanged (fmWhen returns the inflight)


def run_script(spark: SparkSession, src: str, payload: str | None = None,
               fs_root: str | None = None, params: dict | None = None,
               allow_shell: bool = False, now_ns: int | None = None):
    """Parse + execute TQL source text; returns sink output or DataFrame."""
    return TqlRunner(spark, payload=payload, fs_root=fs_root,
                     params=params, allow_shell=allow_shell,
                     now_ns=now_ns).run(src)


def run_file(spark: SparkSession, path: str, payload: str | None = None,
             fs_root: str | None = None, params: dict | None = None):
    import os
    with open(path) as f:
        src = f.read()
    return run_script(spark, src, payload=payload,
                      fs_root=fs_root or os.path.dirname(path), params=params)
