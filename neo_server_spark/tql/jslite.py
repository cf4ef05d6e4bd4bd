"""A small ECMAScript-subset interpreter for TQL SCRIPT() blocks.

The reference embeds a full JS engine (goja) and exposes a ``$`` context
object to scripts (mods/tql/fm_script.go:34-109, 180-260): ``$.key``,
``$.values``, ``$.params``, ``$.payload``, ``$.result``, ``$.yield()``,
``$.yieldKey()``, ``$.yieldArray()``, plus ``console.log`` — scripts run in
ONE VM, main code once per inflight record, with an optional ``finalize()``
hook after the last record (tql_test.go TestScript goldens).

This module interprets the subset of JS that real .tql scripts use for
record shaping: var/let/const, assignments (incl. compound), if/else,
classic for, for-of, while, function declarations/expressions, return,
ternary, &&/||/??, ===/!==/==/!=, arithmetic, member/index access, array
and object literals, and the standard library surface scripts lean on
(Math, JSON, parseInt/parseFloat, String/Array methods, new Date with
toISOString/getTime, console).

It is deliberately NOT a sandbox escape surface: no import, no filesystem,
no network, no constructor tricks — member access on host values is routed
through an allowlist of methods, and ``require()`` resolves only from a
fixed registry of pure host modules (mathx/spatial).

Numbers follow JS semantics where visible: ``/`` is float division,
integer-valued results keep printing without a fraction (the CSV encoder
trims), ``%`` follows the dividend's sign.
"""

from __future__ import annotations

import json as _json
import math as _math
from dataclasses import dataclass


class JSError(Exception):
    pass


UNDEFINED = type("JSUndefined", (), {
    "__repr__": lambda self: "undefined",
    "__bool__": lambda self: False,
})()


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_PUNCT = [
    "===", "!==", "**=", "...",
    "==", "!=", "<=", ">=", "&&", "||", "??", "++", "--", "+=", "-=", "*=",
    "/=", "%=", "=>",
    "+", "-", "*", "/", "%", "=", "<", ">", "!", "?", ":", ",", ";", ".",
    "(", ")", "[", "]", "{", "}",
]

_KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for",
    "while", "break", "continue", "true", "false", "null", "undefined",
    "new", "typeof", "of", "in", "do", "instanceof",
    "try", "catch", "finally", "throw",
}


@dataclass
class Tok:
    kind: str  # num str ident kw punct eof
    val: object
    pos: int


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
            if j < 0:
                raise JSError("unterminated block comment")
            i = j + 2
            continue
        if ch in "'\"":
            q, j, buf = ch, i + 1, []
            while j < n and src[j] != q:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                                "'": "'", '"': '"', "0": "\0"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSError("unterminated string")
            toks.append(Tok("str", "".join(buf), i))
            i = j + 1
            continue
        # ASCII digits only: str.isdigit() admits Unicode numerals
        # ('¹', '٣') that int()/float() reject — fuzz-found
        if ch in "0123456789" or (ch == "." and i + 1 < n
                                  and src[i + 1] in "0123456789"):
            j = i
            isfloat = False
            if src.startswith("0x", i) or src.startswith("0X", i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                if j == i + 2:     # bare '0x' — fuzz-found
                    raise JSError(f"invalid number literal {src[i:j]!r}")
                toks.append(Tok("num", int(src[i:j], 16), i))
                i = j
                continue
            while j < n and (src[j] in "0123456789" or src[j] in ".eE" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                if src[j] in ".eE":
                    isfloat = True
                j += 1
            text = src[i:j]
            try:
                val = float(text) if isfloat else int(text)
            except ValueError as ex:
                raise JSError(f"invalid number literal {text!r}") from ex
            toks.append(Tok("num", val, i))
            i = j
            continue
        if ch.isalpha() or ch in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            toks.append(Tok("kw" if word in _KEYWORDS else "ident", word, i))
            i = j
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, i))
                i += len(p)
                break
        else:
            raise JSError(f"unexpected character {ch!r} at {i}")
    toks.append(Tok("eof", None, n))
    return toks


# ---------------------------------------------------------------------------
# parser — recursive descent to tuple-AST
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k=0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, val=None) -> bool:
        t = self.peek()
        return t.kind == kind and (val is None or t.val == val)

    def eat(self, kind, val=None) -> Tok:
        if not self.at(kind, val):
            t = self.peek()
            raise JSError(f"expected {val or kind}, got {t.val!r}")
        return self.next()

    def opt(self, kind, val=None) -> bool:
        if self.at(kind, val):
            self.next()
            return True
        return False

    # ------------------------------------------------------------ program

    def program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return ("block", body)

    def statement(self):
        if self.opt("punct", ";"):
            return ("empty",)
        if self.at("punct", "{"):
            return self.block()
        if self.at("kw", "var") or self.at("kw", "let") or self.at("kw", "const"):
            self.next()
            decls = []
            while True:
                name = self.eat("ident").val
                init = None
                if self.opt("punct", "="):
                    init = self.assignment()
                decls.append((name, init))
                if not self.opt("punct", ","):
                    break
            self.opt("punct", ";")
            return ("vardecl", decls)
        if self.at("kw", "function"):
            self.next()
            name = self.eat("ident").val
            params, body = self._function_rest()
            return ("funcdecl", name, params, body)
        if self.at("kw", "return"):
            self.next()
            if self.at("punct", ";") or self.at("punct", "}") or self.at("eof"):
                val = None
            else:
                val = self.expression()
            self.opt("punct", ";")
            return ("return", val)
        if self.at("kw", "if"):
            self.next()
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            then = self.statement()
            other = None
            if self.opt("kw", "else"):
                other = self.statement()
            return ("if", cond, then, other)
        if self.at("kw", "while"):
            self.next()
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            return ("while", cond, self.statement())
        if self.at("kw", "do"):
            self.next()
            body = self.statement()
            self.eat("kw", "while")
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            self.opt("punct", ";")
            return ("dowhile", cond, body)
        if self.at("kw", "for"):
            self.next()
            self.eat("punct", "(")
            # for (ident of expr) / for (var ident of expr)
            save = self.i
            decl_kw = self.opt("kw", "var") or self.opt("kw", "let") or \
                self.opt("kw", "const")
            if self.at("ident") and self.peek(1).kind == "kw" and \
                    self.peek(1).val in ("of", "in"):
                name = self.next().val
                mode = self.next().val
                seq = self.expression()
                self.eat("punct", ")")
                return ("forof", name, seq, self.statement(), mode)
            self.i = save
            if self.at("punct", ";"):
                init = ("empty",)
                self.next()
            else:
                init = self.statement()  # consumes its own ';'
            cond = None if self.at("punct", ";") else self.expression()
            self.eat("punct", ";")
            update = None if self.at("punct", ")") else self.expression()
            self.eat("punct", ")")
            return ("for", init, cond, update, self.statement())
        if self.at("kw", "throw"):
            self.next()
            val = self.expression()
            self.opt("punct", ";")
            return ("throw", val)
        if self.at("kw", "try"):
            self.next()
            body = self.block()
            param = catch = fin = None
            if self.opt("kw", "catch"):
                if self.opt("punct", "("):
                    param = self.eat("ident").val
                    self.eat("punct", ")")
                catch = self.block()
            if self.opt("kw", "finally"):
                fin = self.block()
            return ("try", body, param, catch, fin)
        if self.at("kw", "break"):
            self.next()
            self.opt("punct", ";")
            return ("break",)
        if self.at("kw", "continue"):
            self.next()
            self.opt("punct", ";")
            return ("continue",)
        expr = self.expression()
        self.opt("punct", ";")
        return ("expr", expr)

    def block(self):
        self.eat("punct", "{")
        body = []
        while not self.at("punct", "}"):
            body.append(self.statement())
        self.eat("punct", "}")
        return ("block", body)

    def _function_rest(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.eat("ident").val)
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        body = self.block()
        return params, body

    # --------------------------------------------------------- expressions

    def expression(self):
        e = self.assignment()
        while self.at("punct", ","):
            # comma expressions only appear in for-updates (i++, j++)
            self.next()
            e = ("comma", e, self.assignment())
        return e

    def assignment(self):
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        left = self.ternary()
        if self.at("punct") and self.peek().val in ("=", "+=", "-=", "*=", "/=", "%="):
            op = self.next().val
            right = self.assignment()
            return ("assign", op, left, right)
        return left

    def _try_arrow(self):
        """Arrow functions: `x => e`, `(a, b) => e`, `() => { ... }` —
        lowered to the same funcexpr node as function expressions."""
        if self.at("ident") and self.peek(1).kind == "punct" \
                and self.peek(1).val == "=>":
            name = self.next().val
            self.next()
            return ("funcexpr", [name], self._arrow_body())
        if self.at("punct", "("):
            # token lookahead: ( ident, ... ) =>
            j = self.i + 1
            params = []
            while True:
                t = self.peek(j - self.i)
                if t.kind == "punct" and t.val == ")":
                    j += 1
                    break
                if t.kind != "ident":
                    return None
                params.append(t.val)
                j += 1
                t = self.peek(j - self.i)
                if t.kind == "punct" and t.val == ",":
                    j += 1
                elif t.kind == "punct" and t.val == ")":
                    j += 1
                    break
                else:
                    return None
            t = self.peek(j - self.i)
            if not (t.kind == "punct" and t.val == "=>"):
                return None
            self.i = j + 1
            return ("funcexpr", params, self._arrow_body())
        return None

    def _arrow_body(self):
        if self.at("punct", "{"):
            return self.block()
        return ("block", [("return", self.assignment())])

    def ternary(self):
        cond = self.nullish()
        if self.opt("punct", "?"):
            a = self.assignment()
            self.eat("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binlevel(self, ops, nextfn):
        e = nextfn()
        while self.at("punct") and self.peek().val in ops:
            op = self.next().val
            e = ("bin", op, e, nextfn())
        return e

    def nullish(self):
        return self._binlevel(("??",), self.orx)

    def orx(self):
        return self._binlevel(("||",), self.andx)

    def andx(self):
        return self._binlevel(("&&",), self.equality)

    def equality(self):
        return self._binlevel(("===", "!==", "==", "!="), self.relational)

    def relational(self):
        e = self._binlevel(("<", "<=", ">", ">="), self.additive)
        while self.at("kw", "in") or self.at("kw", "instanceof"):
            op = self.next().val
            e = ("bin", op, e, self.additive())
        return e

    def additive(self):
        return self._binlevel(("+", "-"), self.multiplicative)

    def multiplicative(self):
        return self._binlevel(("*", "/", "%"), self.unary)

    def unary(self):
        if self.at("punct") and self.peek().val in ("!", "-", "+"):
            op = self.next().val
            return ("un", op, self.unary())
        if self.at("punct") and self.peek().val in ("++", "--"):
            op = self.next().val
            return ("preincr", op, self.unary())
        if self.at("kw", "typeof"):
            self.next()
            return ("typeof", self.unary())
        if self.at("kw", "new"):
            self.next()
            callee = self.member_chain(self.primary(), calls=False)
            args = []
            if self.opt("punct", "("):
                while not self.at("punct", ")"):
                    args.append(self.assignment())
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", ")")
            return self.member_chain(("new", callee, args))
        return self.postfix()

    def postfix(self):
        e = self.member_chain(self.primary())
        if self.at("punct") and self.peek().val in ("++", "--"):
            op = self.next().val
            return ("postincr", op, e)
        return e

    def member_chain(self, e, calls=True):
        while True:
            if self.opt("punct", "."):
                e = ("member", e, self.next().val)
            elif self.at("punct", "["):
                self.next()
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx)
            elif calls and self.at("punct", "("):
                self.next()
                args = []
                while not self.at("punct", ")"):
                    if self.opt("punct", "..."):   # spread: f(...arr)
                        args.append(("spread", self.assignment()))
                    else:
                        args.append(self.assignment())
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", ")")
                e = ("call", e, args)
            else:
                return e

    def primary(self):
        t = self.peek()
        if t.kind == "num" or t.kind == "str":
            self.next()
            return ("lit", t.val)
        if t.kind == "kw":
            if t.val in ("true", "false"):
                self.next()
                return ("lit", t.val == "true")
            if t.val == "null":
                self.next()
                return ("lit", None)
            if t.val == "undefined":
                self.next()
                return ("lit", UNDEFINED)
            if t.val == "function":
                self.next()
                if self.at("ident"):
                    self.next()  # named function expression; name unused
                params, body = self._function_rest()
                return ("funcexpr", params, body)
            raise JSError(f"unexpected keyword {t.val!r}")
        if t.kind == "ident":
            self.next()
            return ("ident", t.val)
        if t.val == "(":
            self.next()
            e = self.expression()
            self.eat("punct", ")")
            return e
        if t.val == "[":
            self.next()
            items = []
            while not self.at("punct", "]"):
                if self.opt("punct", "..."):   # spread: [...a, b]
                    items.append(("spread", self.assignment()))
                else:
                    items.append(self.assignment())
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "]")
            return ("array", items)
        if t.val == "{":
            self.next()
            pairs = []
            while not self.at("punct", "}"):
                kt = self.next()
                if kt.kind not in ("ident", "str", "kw", "num"):
                    raise JSError(f"bad object key {kt.val!r}")
                self.eat("punct", ":")
                pairs.append((str(kt.val), self.assignment()))
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "}")
            return ("object", pairs)
        raise JSError(f"unexpected token {t.val!r}")


# ---------------------------------------------------------------------------
# runtime values
# ---------------------------------------------------------------------------


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Throw(Exception):
    """A JS `throw` in flight — carries the thrown value verbatim."""

    def __init__(self, value):
        self.value = value

    def __str__(self):
        return to_display(self.value)


class JSFunction:
    # fields are underscore-private so member access from scripts (which
    # never resolves underscore names) cannot reach the interpreter or the
    # scope chain through a function value
    def __init__(self, params, body, env, interp):
        self._params, self._body, self._env, self._interp = \
            params, body, env, interp

    def __call__(self, *args):
        local = Scope(self._env)
        for i, p in enumerate(self._params):
            local.declare(p, args[i] if i < len(args) else UNDEFINED)
        try:
            self._interp.exec_block(self._body, local)
        except _Return as r:
            return r.value
        return UNDEFINED


class Scope:
    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def declare(self, name, value):
        self.vars[name] = value

    def get(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise JSError(f"{name} is not defined")

    def has(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return True
            s = s.parent
        return False

    def set(self, name, value):
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        # implicit global (sloppy-mode JS, heavily used in reference scripts)
        root = self
        while root.parent is not None:
            root = root.parent
        root.vars[name] = value


class JSDate:
    """Minimal Date: constructed from epoch-ms or ISO text."""
    _js_host = True

    def __init__(self, ms: float):
        self.ms = float(ms)

    def getTime(self):
        return self.ms

    def toISOString(self):
        import datetime as _dt
        dt = _dt.datetime.fromtimestamp(self.ms / 1000.0, tz=_dt.timezone.utc)
        return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"

    def getUTCFullYear(self):
        import datetime as _dt
        return _dt.datetime.fromtimestamp(self.ms / 1000.0, tz=_dt.timezone.utc).year

    def __truediv__(self, other):  # goja: date / number -> ms / number
        return self.ms / other

    def __repr__(self):
        return self.toISOString()


def _js_num_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    return str(v)


def to_display(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, (int, float, bool)):
        return _js_num_str(v)
    if isinstance(v, list):
        return ",".join(to_display(x) for x in v)
    return str(v)


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------


class Interpreter:
    """One VM: globals persist across `run_main` calls (the reference keeps
    one goja context per SCRIPT node for the whole record stream)."""

    #: per-exec_ast step budget — bounds a runaway while(true){} in an
    #: untrusted script (the reference's goja tasks run under a
    #: cancellable context; a deterministic engine uses a step count)
    STEP_LIMIT = 10_000_000

    def __init__(self, dollar, log=None, step_limit: int | None = None):
        self.globals = Scope()
        self.log = log or (lambda *a: None)
        self.step_limit = step_limit or self.STEP_LIMIT
        self._steps = 0
        g = self.globals
        g.declare("$", dollar)
        g.declare("console", _Console(self.log))
        g.declare("Math", _MATH)
        g.declare("JSON", _JSONNS())
        g.declare("parseInt", _parse_int)
        g.declare("parseFloat", _parse_float)
        g.declare("isNaN", lambda v=UNDEFINED: _to_number(v) != _to_number(v))
        g.declare("String", lambda v=UNDEFINED: to_display(v))
        g.declare("Number", lambda v=UNDEFINED: _to_number(v))
        g.declare("Boolean", lambda v=UNDEFINED: _truthy(v))
        g.declare("Date", _DateCtor())
        g.declare("Array", _ArrayNS())
        g.declare("Uint8Array", _Uint8ArrayCtor())
        g.declare("NaN", float("nan"))
        g.declare("Infinity", float("inf"))

        def _encode_uri_component(v=UNDEFINED):
            import urllib.parse
            return urllib.parse.quote(to_display(v), safe="!'()*-._~")

        def _decode_uri_component(v=UNDEFINED):
            import urllib.parse
            return urllib.parse.unquote(to_display(v))
        g.declare("encodeURIComponent", _encode_uri_component)
        g.declare("decodeURIComponent", _decode_uri_component)
        g.declare("require", _require)
        g.declare("Error", _ERROR_CTOR)

    # ------------------------------------------------------------- driving

    def run(self, src: str, scope: Scope | None = None):
        self.exec_ast(self.prepare(src), scope)

    @staticmethod
    def prepare(src: str):
        """Parse once; the AST is reusable across per-record exec_ast calls."""
        return Parser(tokenize(src)).program()

    def exec_ast(self, ast, scope: Scope | None = None):
        self._steps = 0
        self.exec_block(ast, scope or self.globals)

    def call_if_defined(self, name: str):
        if self.globals.has(name):
            fn = self.globals.get(name)
            if callable(fn):
                fn()

    # ----------------------------------------------------------- execution

    def exec_block(self, node, scope):
        # hoist function declarations (goldens call before definition order)
        for st in node[1]:
            if st[0] == "funcdecl":
                scope.declare(st[1], JSFunction(st[2], st[3], scope, self))
        for st in node[1]:
            self.exec_stmt(st, scope)

    def exec_stmt(self, node, scope):
        self._steps += 1
        if self._steps > self.step_limit:
            raise JSError(
                f"script exceeded the {self.step_limit}-step budget")
        k = node[0]
        if k == "empty":
            return
        if k == "block":
            self.exec_block(node, Scope(scope))
            return
        if k == "vardecl":
            for name, init in node[1]:
                scope.declare(name, self.eval(init, scope)
                              if init is not None else UNDEFINED)
            return
        if k == "funcdecl":
            scope.declare(node[1], JSFunction(node[2], node[3], scope, self))
            return
        if k == "expr":
            self.eval(node[1], scope)
            return
        if k == "return":
            raise _Return(self.eval(node[1], scope)
                          if node[1] is not None else UNDEFINED)
        if k == "if":
            if _truthy(self.eval(node[1], scope)):
                self.exec_stmt(node[2], scope)
            elif node[3] is not None:
                self.exec_stmt(node[3], scope)
            return
        if k == "while":
            while _truthy(self.eval(node[1], scope)):
                try:
                    self.exec_stmt(node[2], scope)
                except _Break:
                    break
                except _Continue:
                    continue
            return
        if k == "dowhile":
            while True:
                try:
                    self.exec_stmt(node[2], scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if not _truthy(self.eval(node[1], scope)):
                    break
            return
        if k == "for":
            inner = Scope(scope)
            self.exec_stmt(node[1], inner)
            while node[2] is None or _truthy(self.eval(node[2], inner)):
                try:
                    self.exec_stmt(node[4], inner)
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], inner)
            return
        if k == "forof":
            seq = self.eval(node[2], scope)
            if node[4] == "in":
                seq = list(seq.keys()) if isinstance(seq, dict) else \
                    [str(i) for i in range(len(seq))]
            inner = Scope(scope)
            inner.declare(node[1], UNDEFINED)
            for item in seq:
                inner.vars[node[1]] = item
                try:
                    self.exec_stmt(node[3], inner)
                except _Break:
                    break
                except _Continue:
                    continue
            return
        if k == "break":
            raise _Break()
        if k == "continue":
            raise _Continue()
        if k == "throw":
            raise _Throw(self.eval(node[1], scope))
        if k == "try":
            # JS user throws (_Throw) and runtime errors (JSError except
            # the step-budget guard) are catchable, like goja; control-flow
            # exceptions (_Return/_Break/_Continue) pass through
            try:
                try:
                    self.exec_stmt(node[1], scope)
                except (_Throw, JSError) as ex:
                    if isinstance(ex, JSError) and "step budget" in str(ex):
                        raise
                    if node[3] is None:
                        # try/finally without catch: the finally clause
                        # runs (outer `finally:`) and the exception
                        # RE-RAISES — JS never swallows it here
                        raise
                    else:
                        inner = Scope(scope)
                        if node[2] is not None:
                            val = (ex.value if isinstance(ex, _Throw)
                                   else JSErrorValue(str(ex)))
                            inner.declare(node[2], val)
                        self.exec_stmt(node[3], inner)
            finally:
                if node[4] is not None:
                    self.exec_stmt(node[4], scope)
            return
        raise JSError(f"unsupported statement {k}")

    # ---------------------------------------------------------- evaluation

    def eval(self, node, scope):
        k = node[0]
        if k == "lit":
            return node[1]
        if k == "ident":
            return scope.get(node[1])
        if k == "array":
            out = []
            for x in node[1]:
                if x[0] == "spread":
                    seq = self.eval(x[1], scope)
                    out.extend(list(seq) if seq is not None
                               and seq is not UNDEFINED else [])
                else:
                    out.append(self.eval(x, scope))
            return out
        if k == "object":
            return {key: self.eval(v, scope) for key, v in node[1]}
        if k == "funcexpr":
            return JSFunction(node[1], node[2], scope, self)
        if k == "member":
            return self.get_member(self.eval(node[1], scope), node[2])
        if k == "index":
            obj = self.eval(node[1], scope)
            idx = self.eval(node[2], scope)
            return self.get_index(obj, idx)
        if k == "call":
            callee = node[1]
            if callee[0] == "member":
                obj = self.eval(callee[1], scope)
                fn = self.get_member(obj, callee[2])
            else:
                fn = self.eval(callee, scope)
            args = []
            for a in node[2]:
                if a[0] == "spread":
                    seq = self.eval(a[1], scope)
                    args.extend(list(seq) if seq is not None
                                and seq is not UNDEFINED else [])
                else:
                    args.append(self.eval(a, scope))
            if not callable(fn):
                if callee[0] == "member" and (fn is UNDEFINED or fn is None):
                    # goja's text for calling a missing member
                    # (fm_script_test TestScriptException)
                    raise JSError(
                        f"Object has no member '{callee[2]}'")
                raise JSError(f"{fn!r} is not a function")
            return fn(*args)
        if k == "new":
            ctor = self.eval(node[1], scope)
            args = [self.eval(a, scope) for a in node[2]]
            make = getattr(ctor, "construct", None)
            if make is None:
                raise JSError("not a constructor")
            return make(*args)
        if k == "un":
            v = self.eval(node[2], scope)
            if node[1] == "!":
                return not _truthy(v)
            if node[1] == "-":
                return -_to_number(v)
            return _to_number(v)
        if k == "typeof":
            try:
                v = self.eval(node[1], scope)
            except JSError:
                return "undefined"
            if v is UNDEFINED:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if callable(v):
                return "function"
            return "object"
        if k == "bin":
            return self.binop(node[1], node[2], node[3], scope)
        if k == "ternary":
            return self.eval(node[2] if _truthy(self.eval(node[1], scope))
                             else node[3], scope)
        if k == "comma":
            self.eval(node[1], scope)
            return self.eval(node[2], scope)
        if k == "assign":
            return self.assign(node[1], node[2], node[3], scope)
        if k in ("preincr", "postincr"):
            old = _to_number(self.eval(node[2], scope))
            new = old + (1 if node[1] == "++" else -1)
            self.store(node[2], new, scope)
            return new if k == "preincr" else old
        raise JSError(f"unsupported expression {k}")

    def binop(self, op, ln, rn, scope):
        if op == "&&":
            left = self.eval(ln, scope)
            return self.eval(rn, scope) if _truthy(left) else left
        if op == "||":
            left = self.eval(ln, scope)
            return left if _truthy(left) else self.eval(rn, scope)
        if op == "??":
            left = self.eval(ln, scope)
            return self.eval(rn, scope) if left is None or left is UNDEFINED \
                else left
        a = self.eval(ln, scope)
        b = self.eval(rn, scope)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return to_display(a) + to_display(b)
            if isinstance(a, list) or isinstance(b, list):
                return to_display(a) + to_display(b)
            return _arith(a, b, lambda x, y: x + y)
        if op == "-":
            return _arith(a, b, lambda x, y: x - y)
        if op == "*":
            return _arith(a, b, lambda x, y: x * y)
        if op == "/":
            return _js_div(a, b)
        if op == "%":
            return _js_mod(a, b)
        if op in ("===", "!=="):
            eq = _strict_eq(a, b)
            return eq if op == "===" else not eq
        if op in ("==", "!="):
            eq = _loose_eq(a, b)
            return eq if op == "==" else not eq
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            else:
                a, b = _to_number(a), _to_number(b)
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        if op == "in":
            if isinstance(b, dict):
                return to_display(a) in b
            if isinstance(b, list):
                return isinstance(a, (int, float)) and 0 <= int(a) < len(b)
            return False
        if op == "instanceof":
            check = getattr(b, "js_instanceof", None)
            return bool(check(a)) if check is not None else False
        raise JSError(f"unsupported operator {op}")

    def assign(self, op, target, valnode, scope):
        val = self.eval(valnode, scope)
        if op != "=":
            cur = self.eval(target, scope)
            base = op[0]
            if base == "+":
                if isinstance(cur, str) or isinstance(val, str):
                    val = to_display(cur) + to_display(val)
                else:
                    val = _arith(cur, val, lambda x, y: x + y)
            elif base == "-":
                val = _arith(cur, val, lambda x, y: x - y)
            elif base == "*":
                val = _arith(cur, val, lambda x, y: x * y)
            elif base == "/":
                val = _js_div(cur, val)
            elif base == "%":
                val = _js_mod(cur, val)
        self.store(target, val, scope)
        return val

    def store(self, target, val, scope):
        k = target[0]
        if k == "ident":
            scope.set(target[1], val)
            return
        if k == "member":
            obj = self.eval(target[1], scope)
            if isinstance(obj, dict):
                obj[target[2]] = val
                return
            setter = getattr(obj, "js_set", None)
            if setter is not None:
                setter(target[2], val)
                return
            raise JSError(f"cannot set property {target[2]}")
        if k == "index":
            obj = self.eval(target[1], scope)
            idx = self.eval(target[2], scope)
            if isinstance(obj, list):
                i = int(idx)
                if i < 0:
                    # JS sets a '-1' string property and leaves the array
                    # elements untouched; Python negative indexing would
                    # silently overwrite from the end — ignore the write
                    return
                while len(obj) <= i:
                    obj.append(UNDEFINED)
                obj[i] = val
                return
            if isinstance(obj, dict):
                obj[to_display(idx)] = val
                return
            raise JSError("cannot index-assign")
        raise JSError("invalid assignment target")

    # -------------------------------------------------------- member lookup

    def get_member(self, obj, name):
        if obj is UNDEFINED or obj is None:
            raise JSError(f"cannot read property {name!r} of {to_display(obj)}")
        if isinstance(obj, dict):
            return obj.get(name, UNDEFINED)
        if isinstance(obj, str):
            return _string_member(obj, name)
        if isinstance(obj, list):
            return _array_member(obj, name)
        if isinstance(obj, (int, float)) and not isinstance(obj, bool):
            if name == "toFixed":
                return lambda nd=0: f"{float(obj):.{int(nd)}f}"
            if name == "toString":
                return lambda: _js_num_str(obj)
        # underscore names never resolve — dunders like __class__ are the
        # classic interpreter-escape surface and host-object internals are
        # private by convention.  The getattr fallback additionally
        # requires the class to opt in with _js_host = True, so a future
        # host type (or a JSFunction) never leaks arbitrary attributes —
        # everything else goes through js_get-only dispatch.
        if (not name.startswith("_")
                and getattr(type(obj), "_js_host", False)):
            attr = getattr(obj, name, None)
            if attr is not None:
                return attr
        js_get = getattr(obj, "js_get", None)
        if js_get is not None:
            return js_get(name)
        return UNDEFINED

    def get_index(self, obj, idx):
        if isinstance(obj, (list, str)):
            i = int(idx)
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEFINED
        if isinstance(obj, dict):
            return obj.get(to_display(idx), UNDEFINED)
        return self.get_member(obj, to_display(idx))


# ---------------------------------------------------------------------------
# host library
# ---------------------------------------------------------------------------


def _truthy(v) -> bool:
    if v is UNDEFINED or v is None:
        return False
    if isinstance(v, float) and v != v:
        return False
    if isinstance(v, (list, dict)):
        return True  # JS objects are always truthy, even empty
    return bool(v)


def _to_number(v) -> float:
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if v is None:
        return 0
    if v is UNDEFINED:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return float("nan")
    if isinstance(v, JSDate):
        return v.ms
    return float("nan")


def _js_div(a, b):
    """JS '/': NaN dividend -> NaN; x/±0 -> ±Infinity by the SIGNS of both
    operands (copysign handles -0.0 divisors, which Python's >= treats as
    non-negative); never raises."""
    x, y = _to_number(a), _to_number(b)
    if x != x or y != y:
        return float("nan")
    if y == 0:
        if x == 0:
            return float("nan")
        sign = _math.copysign(1.0, x) * _math.copysign(1.0, y)
        return _math.copysign(float("inf"), sign)
    return x / y


def _js_mod(a, b):
    """JS '%': truncating fmod; x % 0 and NaN operands -> NaN; int stays
    int when both operands are ints; never raises."""
    x, y = _to_number(a), _to_number(b)
    if x != x or y != y or y == 0 or x in (float("inf"), float("-inf")):
        return float("nan")
    r = _math.fmod(x, y)
    if isinstance(x, int) and isinstance(y, int) and r == int(r):
        return int(r)
    return r


def _arith(a, b, fn):
    x, y = _to_number(a), _to_number(b)
    r = fn(x, y)
    if isinstance(x, int) and isinstance(y, int) and isinstance(r, int):
        return r
    return r


def _strict_eq(a, b) -> bool:
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if type(a) is type(b) or (isinstance(a, str) and isinstance(b, str)):
        return a == b if not isinstance(a, (list, dict)) else a is b
    return False


def _loose_eq(a, b) -> bool:
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    if isinstance(a, str) and isinstance(b, (int, float)) and not isinstance(b, bool):
        return _to_number(a) == b
    if isinstance(b, str) and isinstance(a, (int, float)) and not isinstance(a, bool):
        return _to_number(b) == a
    return _strict_eq(a, b)


def _parse_int(v=UNDEFINED, base=10):
    s = to_display(v).strip()
    try:
        if int(base) == 10:
            # parseInt truncates at the first non-digit
            i, neg = 0, False
            if s[:1] in "+-":
                neg = s[0] == "-"
                i = 1
            j = i
            while j < len(s) and s[j].isdigit():
                j += 1
            if j == i:
                return float("nan")
            n = int(s[i:j])
            return -n if neg else n
        return int(s, int(base))
    except (ValueError, TypeError):
        return float("nan")


def _parse_float(v=UNDEFINED):
    s = to_display(v).strip()
    import re
    m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    if not m:
        return float("nan")
    return float(m.group(0))


class _Console:
    _js_host = True
    def __init__(self, log):
        self._log = log

    def log(self, *args):
        self._log("INFO", " ".join(to_display(a) for a in args))

    def warn(self, *args):
        self._log("WARN", " ".join(to_display(a) for a in args))

    def error(self, *args):
        self._log("ERROR", " ".join(to_display(a) for a in args))

    debug = log


class _MathNS:
    _js_host = True
    PI = _math.pi
    E = _math.e

    abs = staticmethod(lambda v: abs(_to_number(v)))
    floor = staticmethod(lambda v: int(_math.floor(_to_number(v))))
    ceil = staticmethod(lambda v: int(_math.ceil(_to_number(v))))
    trunc = staticmethod(lambda v: int(_to_number(v)))
    sqrt = staticmethod(lambda v: _math.sqrt(_to_number(v)))
    pow = staticmethod(lambda a, b: _to_number(a) ** _to_number(b))
    sin = staticmethod(lambda v: _math.sin(_to_number(v)))
    cos = staticmethod(lambda v: _math.cos(_to_number(v)))
    tan = staticmethod(lambda v: _math.tan(_to_number(v)))
    atan2 = staticmethod(lambda a, b: _math.atan2(_to_number(a), _to_number(b)))
    log = staticmethod(lambda v: _math.log(_to_number(v)))
    exp = staticmethod(lambda v: _math.exp(_to_number(v)))

    @staticmethod
    def round(v):
        # JS rounds half UP (toward +inf), not banker's
        return int(_math.floor(_to_number(v) + 0.5))

    @staticmethod
    def min(*vs):
        return min((_to_number(v) for v in vs), default=float("inf"))

    @staticmethod
    def max(*vs):
        return max((_to_number(v) for v in vs), default=float("-inf"))


_MATH = _MathNS()


class _JSONNS:
    _js_host = True
    @staticmethod
    def parse(s):
        return _json.loads(s)

    @staticmethod
    def stringify(v, *_):
        def norm(o):
            # JS has one number type: integral doubles serialize without
            # a decimal point, non-finite numbers serialize as null
            if isinstance(o, bool) or o is None:
                return o
            if isinstance(o, float):
                if o != o or o in (float("inf"), float("-inf")):
                    return None
                return int(o) if o.is_integer() and abs(o) < 2**53 else o
            if isinstance(o, list):
                return [norm(x) for x in o]
            if isinstance(o, dict):
                return {k: norm(x) for k, x in o.items()}
            return o

        def default(o):
            if o is UNDEFINED:
                return None
            if isinstance(o, JSDate):
                return o.toISOString()
            return str(o)
        return _json.dumps(norm(v), default=default, separators=(",", ":"))


class _DateCtor:
    """new Date(ms) / new Date(iso); Date.parse(iso) -> epoch-ms."""
    _js_host = True

    def construct(self, *args):
        if not args:
            raise JSError("Date() without arguments is non-deterministic; "
                          "pass an epoch or ISO string")
        v = args[0]
        if isinstance(v, str):
            return JSDate(self.parse(v))
        return JSDate(_to_number(v))

    def __call__(self, *args):
        return self.construct(*args).toISOString()

    @staticmethod
    def parse(s):
        import datetime as _dt
        s = str(s).strip()
        fmts = ["%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ",
                "%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z",
                "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%dT%H:%M", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"]
        for f in fmts:
            try:
                dt = _dt.datetime.strptime(s, f)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=_dt.timezone.utc)
                return dt.timestamp() * 1000.0
            except ValueError:
                continue
        return float("nan")


class _ArrayNS:
    _js_host = True
    @staticmethod
    def isArray(v=UNDEFINED):
        return isinstance(v, list)

    def construct(self, *args):
        if len(args) == 1 and isinstance(args[0], (int, float)):
            return [UNDEFINED] * int(args[0])
        return list(args)


class _Uint8ArrayCtor:
    """new Uint8Array([..]) / new Uint8Array(n) — lands as Python bytes,
    the record stream's binary value type (goja exports Uint8Array as
    []byte; tql_test.go TestDatabaseBinaryTql, fm_dbsrc_test.go SQL_sink
    bin_value)."""
    _js_host = True

    def construct(self, *args):
        if not args:
            return b""
        v = args[0]
        if isinstance(v, (int, float)):
            return bytes(int(v))
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, list):
            return bytes(int(_to_number(x)) & 0xFF for x in v)
        raise JSError("Uint8Array: unsupported argument")


def _string_member(s: str, name: str):
    if name == "length":
        return len(s)
    simple = {
        "toUpperCase": lambda: s.upper(),
        "toLowerCase": lambda: s.lower(),
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "toString": lambda: s,
    }
    if name in simple:
        return simple[name]
    if name == "split":
        def split(sep=UNDEFINED, limit=UNDEFINED):
            if sep is UNDEFINED:
                return [s]
            parts = list(s) if sep == "" else s.split(sep)
            if limit is not UNDEFINED:
                parts = parts[: int(limit)]
            return parts
        return split
    if name == "indexOf":
        return lambda sub, start=0: s.find(to_display(sub), int(start))
    if name == "lastIndexOf":
        return lambda sub: s.rfind(to_display(sub))
    if name == "includes":
        return lambda sub: to_display(sub) in s
    if name == "startsWith":
        return lambda sub: s.startswith(to_display(sub))
    if name == "endsWith":
        return lambda sub: s.endswith(to_display(sub))
    if name == "charAt":
        return lambda i=0: s[int(i)] if 0 <= int(i) < len(s) else ""
    if name == "charCodeAt":
        return lambda i=0: ord(s[int(i)]) if 0 <= int(i) < len(s) else float("nan")
    if name == "substring":
        def substring(a=0, b=UNDEFINED):
            a = max(0, int(a))
            b = len(s) if b is UNDEFINED else max(0, int(b))
            if a > b:
                a, b = b, a
            return s[a:b]
        return substring
    if name == "slice":
        def sl(a=0, b=UNDEFINED):
            return s[int(a): None if b is UNDEFINED else int(b)]
        return sl
    if name == "replace":
        return lambda old, new: s.replace(to_display(old), to_display(new), 1)
    if name == "replaceAll":
        return lambda old, new: s.replace(to_display(old), to_display(new))
    if name == "repeat":
        return lambda n: s * int(n)
    if name == "padStart":
        return lambda n, pad=" ": s.rjust(int(n), to_display(pad)[:1] or " ")
    if name == "padEnd":
        return lambda n, pad=" ": s.ljust(int(n), to_display(pad)[:1] or " ")
    if name == "concat":
        return lambda *xs: s + "".join(to_display(x) for x in xs)
    return UNDEFINED


def _array_member(arr: list, name: str):
    if name == "length":
        return len(arr)
    if name == "push":
        def push(*xs):
            arr.extend(xs)
            return len(arr)
        return push
    if name == "pop":
        return lambda: arr.pop() if arr else UNDEFINED
    if name == "shift":
        return lambda: arr.pop(0) if arr else UNDEFINED
    if name == "unshift":
        def unshift(*xs):
            arr[:0] = xs
            return len(arr)
        return unshift
    if name == "map":
        return lambda fn: [fn(v, i, arr) if _fn_arity(fn) > 1 else fn(v)
                           for i, v in enumerate(arr)]
    if name == "forEach":
        def foreach(fn):
            for i, v in enumerate(arr):
                if _fn_arity(fn) > 1:
                    fn(v, i, arr)
                else:
                    fn(v)
            return UNDEFINED
        return foreach
    if name == "filter":
        return lambda fn: [v for v in arr if _truthy(fn(v))]
    if name == "reduce":
        def reduce(fn, init=UNDEFINED):
            it = iter(arr)
            acc = next(it) if init is UNDEFINED else init
            for v in it:
                acc = fn(acc, v)
            return acc
        return reduce
    if name == "join":
        return lambda sep=",": to_display(sep).join(to_display(v) for v in arr)
    if name == "indexOf":
        def index_of(v):
            for i, x in enumerate(arr):
                if _strict_eq(x, v):
                    return i
            return -1
        return index_of
    if name == "includes":
        return lambda v: any(_strict_eq(x, v) for x in arr)
    if name == "slice":
        def sl(a=0, b=UNDEFINED):
            return arr[int(a): None if b is UNDEFINED else int(b)]
        return sl
    if name == "concat":
        def concat(*xs):
            out = list(arr)
            for x in xs:
                out.extend(x) if isinstance(x, list) else out.append(x)
            return out
        return concat
    if name == "reverse":
        def reverse():
            arr.reverse()
            return arr
        return reverse
    if name == "sort":
        def sort(fn=UNDEFINED):
            if fn is UNDEFINED:
                arr.sort(key=to_display)
            else:
                import functools

                def cmp(a, b):
                    r = _to_number(fn(a, b))  # one comparator call per compare
                    return -1 if r < 0 else (1 if r > 0 else 0)
                arr.sort(key=functools.cmp_to_key(cmp))
            return arr
        return sort
    return UNDEFINED


def _fn_arity(fn) -> int:
    if isinstance(fn, JSFunction):
        return len(fn._params)
    try:
        import inspect
        return len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return 1


# ---------------------------------------------------------------------------
# static statelessness analysis — can a SCRIPT main block run per-record
# independently (mapInPandas) instead of through the one serial VM?
# ---------------------------------------------------------------------------

#: $ members a per-record kernel can serve without the driver VM
STATELESS_DOLLAR_READS = frozenset({"key", "values", "params", "payload"})
STATELESS_DOLLAR_CALLS = frozenset({"yield", "yieldKey", "yieldArray"})
#: pure globals safe in any record context
_SAFE_GLOBALS = frozenset({
    "Math", "JSON", "parseInt", "parseFloat", "isNaN", "String", "Number",
    "Boolean", "Date", "Array", "NaN", "Infinity", "encodeURIComponent",
    "decodeURIComponent", "undefined", "require", "Error", "Uint8Array",
})


class _Stateful(Exception):
    pass


def analyze_stateless(ast) -> bool:
    """True when a SCRIPT main block has no cross-record state: every
    assignment targets a variable declared WITHIN the block (main re-runs
    per record, so such variables reset anyway), ``$`` is touched only
    through the per-record surface ($.key/$.values/$.params/$.payload
    reads; $.yield/$.yieldKey/$.yieldArray calls), no finalize() is
    defined, and no driver-only facility (console, $.db, $.request,
    $.result, implicit globals) appears.  Conservative: any construct the
    walker does not recognize makes the block stateful."""
    try:
        _walk_block(ast, set())
        return True
    except _Stateful:
        return False


def _is_dollar(node) -> bool:
    return node[0] == "ident" and node[1] == "$"


def _walk_local_base(node, declared):
    """An assignment/store base must bottom out at a locally-declared
    variable; ``$``/console/anything global is cross-record state."""
    if node[0] == "ident":
        if node[1] not in declared:
            raise _Stateful()
        return
    if node[0] in ("member",):
        _walk_local_base(node[1], declared)
        return
    if node[0] == "index":
        _walk_local_base(node[1], declared)
        _walk_expr(node[2], declared)
        return
    raise _Stateful()


def _walk_target(node, declared):
    if node[0] == "ident":
        if node[1] not in declared:
            raise _Stateful()      # outer/implicit-global write persists
        return
    if node[0] in ("member", "index"):
        _walk_local_base(node, declared)
        return
    raise _Stateful()


def _walk_stmt(node, declared):
    k = node[0]
    if k in ("empty", "break", "continue"):
        return
    if k == "block":
        _walk_block(node, set(declared))
        return
    if k == "vardecl":
        for name, init in node[1]:
            if init is not None:
                _walk_expr(init, declared)
            declared.add(name)
        return
    if k == "funcdecl":
        if node[1] == "finalize":
            raise _Stateful()      # EOF hook = cross-record by definition
        declared.add(node[1])
        _walk_block(node[3], set(declared) | set(node[2]))
        return
    if k == "expr":
        _walk_expr(node[1], declared)
        return
    if k == "return":
        if node[1] is not None:
            _walk_expr(node[1], declared)
        return
    if k == "if":
        _walk_expr(node[1], declared)
        _walk_stmt(node[2], declared)
        if node[3] is not None:
            _walk_stmt(node[3], declared)
        return
    if k in ("while", "dowhile"):
        _walk_expr(node[1], declared)
        _walk_stmt(node[2], declared)
        return
    if k == "for":
        inner = set(declared)
        _walk_stmt(node[1], inner)
        if node[2] is not None:
            _walk_expr(node[2], inner)
        if node[3] is not None:
            _walk_expr(node[3], inner)
        _walk_stmt(node[4], inner)
        return
    if k == "forof":
        inner = set(declared)
        _walk_expr(node[2], inner)
        inner.add(node[1])
        _walk_stmt(node[3], inner)
        return
    raise _Stateful()


def _walk_block(node, declared):
    for st in node[1]:
        _walk_stmt(st, declared)


def _walk_expr(node, declared):
    k = node[0]
    if k == "lit":
        return
    if k == "ident":
        if node[1] in declared or node[1] in _SAFE_GLOBALS:
            return
        raise _Stateful()          # includes bare `$`/console aliasing
    if k == "array":
        for x in node[1]:
            _walk_expr(x, declared)
        return
    if k == "spread":
        _walk_expr(node[1], declared)
        return
    if k == "object":
        for _key, v in node[1]:
            _walk_expr(v, declared)
        return
    if k == "funcexpr":
        _walk_block(node[2], set(declared) | set(node[1]))
        return
    if k == "member":
        if _is_dollar(node[1]):
            if node[2] in STATELESS_DOLLAR_READS:
                return
            raise _Stateful()      # $.result/$.db/$.request/...
        _walk_expr(node[1], declared)
        return
    if k == "index":
        _walk_expr(node[1], declared)
        _walk_expr(node[2], declared)
        return
    if k == "call":
        callee = node[1]
        if callee[0] == "member" and _is_dollar(callee[1]):
            if callee[2] not in STATELESS_DOLLAR_CALLS:
                raise _Stateful()
        else:
            _walk_expr(callee, declared)
        for a in node[2]:
            _walk_expr(a, declared)
        return
    if k == "new":
        _walk_expr(node[1], declared)
        for a in node[2]:
            _walk_expr(a, declared)
        return
    if k == "un":
        _walk_expr(node[2], declared)
        return
    if k == "typeof":
        _walk_expr(node[1], declared)
        return
    if k == "bin":
        _walk_expr(node[2], declared)
        _walk_expr(node[3], declared)
        return
    if k == "ternary":
        _walk_expr(node[1], declared)
        _walk_expr(node[2], declared)
        _walk_expr(node[3], declared)
        return
    if k == "comma":
        _walk_expr(node[1], declared)
        _walk_expr(node[2], declared)
        return
    if k == "assign":               # ("assign", op, target, value)
        _walk_target(node[2], declared)
        _walk_expr(node[3], declared)
        return
    if k in ("preincr", "postincr"):
        _walk_target(node[2], declared)
        return
    raise _Stateful()


# ---------------------------------------------------------------------------
# require() — the reference embeds a js module registry (mods/jsh); only the
# modules real .tql scripts lean on are provided, as host dicts
# ---------------------------------------------------------------------------

_GEOJSON_TYPES = frozenset({
    "Feature", "FeatureCollection", "Point", "MultiPoint", "LineString",
    "MultiLineString", "Polygon", "MultiPolygon", "GeometryCollection"})


def _parse_geojson(obj):
    """mathx/spatial parseGeoJSON (tql_test.go TestGeoJSON): validate the
    object's GeoJSON type and hand it back for GEOMAP to consume.  Invalid
    input returns an Error VALUE (goja contract: scripts test
    ``obj instanceof Error``)."""
    if not isinstance(obj, dict):
        return JSErrorValue("parseGeoJSON: expected an object")
    typ = obj.get("type")
    if typ not in _GEOJSON_TYPES:
        return JSErrorValue(f"parseGeoJSON: invalid geojson type {typ!r}")
    if typ == "Feature" and not isinstance(obj.get("geometry"), dict):
        return JSErrorValue("parseGeoJSON: Feature requires a geometry")
    if typ == "FeatureCollection" and \
            not isinstance(obj.get("features"), list):
        return JSErrorValue(
            "parseGeoJSON: FeatureCollection requires features")
    return obj


class _SystemNow:
    """@jsh/system now() value — unix()/unixNano() accessors
    (fm_script_test js-system-now)."""

    _js_host = True

    def __init__(self):
        import time as _t
        self._ns = int(_t.time() * 1e9)

    def unix(self):
        return self._ns // 10**9

    def unixNano(self):
        return self._ns


def _make_system_module():
    """@jsh/system (fm_script system module): free_os_memory()/gc() are
    runtime hints (no-ops here — the JVM/CPython manage memory), now()
    returns a time value."""
    import gc as _gc
    return {
        "free_os_memory": lambda: None,
        "gc": lambda: (_gc.collect(), None)[1],
        "now": _SystemNow,
    }


def _spatial_haversine(coord1=UNDEFINED, coord2=UNDEFINED, radius=UNDEFINED):
    """mathx/spatial haversine (jsh/lib/mathx/spatial/spatial.go:40-66):
    great-circle distance between two [lat, lon] coordinates; Earth radius
    6371000 m (WGS84 Web Mercator) unless a positive radius is given."""
    import math
    r = 6371000.0
    if isinstance(radius, (int, float)) and not isinstance(radius, bool) \
            and radius > 0:
        r = float(radius)
    if not (isinstance(coord1, list) and isinstance(coord2, list)
            and len(coord1) >= 2 and len(coord2) >= 2):
        raise JSError("haversine: expected [lat, lon] coordinates")
    lat1, lon1 = float(coord1[0]), float(coord1[1])
    lat2, lon2 = float(coord2[0]), float(coord2[1])
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlam = math.radians(lon2 - lon1)
    a = math.sin(dphi / 2) ** 2 \
        + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2
    return 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * r


def _spatial_simplify(tolerance=UNDEFINED, *coords):
    """mathx/spatial simplify — Ramer-Douglas-Peucker path simplification
    (spatial.go:68-85 over nums/simplify.go:4-19 + geometry.go:39-63).
    Input/output coordinates are [lat, lon]; the line-distance math runs on
    (lng, lat) points exactly as the reference converts them."""
    import math
    ep = float(tolerance) if isinstance(tolerance, (int, float)) \
        and not isinstance(tolerance, bool) else 0.0
    pts = [(float(c[1]), float(c[0])) for c in coords]

    def dist(l0, l1, p):
        # ax + by + c = 0 line through l0-l1 (geometry.go:48-53)
        a = l0[1] - l1[1]
        b = l1[0] - l0[0]
        c = l0[0] * l1[1] - l1[0] * l0[1]
        num = abs(a * p[0] + b * p[1] + c)
        den = math.sqrt(a * a + b * b)
        if den == 0.0:  # degenerate segment: Go float division semantics
            return math.inf if num else math.nan
        return num / den

    def simp(points):
        if len(points) <= 2:
            return list(points)
        l0, l1 = points[0], points[-1]
        idx, maxd = 0, 0.0
        for i, p in enumerate(points):
            d = dist(l0, l1, p)
            if d > maxd:
                maxd, idx = d, i
        if maxd >= ep:
            left = simp(points[:idx + 1])
            right = simp(points[idx:])
            return left[:-1] + right
        return [points[0], points[-1]]

    return [[p[1], p[0]] for p in simp(pts)]


def _mathx_fft(times, values):
    """mathx fft(times, values) -> [[hz, ampl], ...]
    (fm_script mathx module; math identical to mods/nums/fft/fft.go:10-39
    and operators/series.fft): rate = n / duration_sec (times epoch-ns),
    hz_i = i/n * rate, ampl = 2|c_i|/n, DC dropped."""
    import numpy as np
    t = np.asarray(list(times), dtype="int64")
    v = np.asarray(list(values), dtype="float64")
    n = len(v)
    if n < 16:
        return []
    rate = n / ((t[-1] - t[0]) / 1e9)
    coeff = np.fft.rfft(v)
    idx = np.arange(len(coeff))
    hz = idx / n * rate
    ampl = 2.0 * np.abs(coeff) / n
    return [[float(h), float(a)] for h, a in zip(hz[1:], ampl[1:])]


_MODULES = {
    "mathx/spatial": {"parseGeoJSON": _parse_geojson,
                      "haversine": _spatial_haversine,
                      "simplify": _spatial_simplify},
    "mathx": {"fft": _mathx_fft},
}


def _require(name=UNDEFINED):
    key = to_display(name)
    if key == "@jsh/system":
        return _make_system_module()
    mod = _MODULES.get(key)
    if mod is None:
        # goja loader's text (fm_script_test js-invalid-module)
        raise JSError("Invalid module, " + key)
    return dict(mod)


# ---------------------------------------------------------------------------
# Error values — scripts receive failures as values (`obj instanceof Error`,
# obj.message), matching goja's error contract
# ---------------------------------------------------------------------------


class JSErrorValue:
    _js_host = True

    def __init__(self, message=""):
        self.message = to_display(message) if message != "" else ""
        self.name = "Error"

    def toString(self):
        return f"Error: {self.message}" if self.message else "Error"

    def __repr__(self):
        return self.toString()


class _ErrorCtor:
    _js_host = True

    def __call__(self, message=""):
        return JSErrorValue(message)

    construct = __call__

    @staticmethod
    def js_instanceof(v) -> bool:
        return isinstance(v, JSErrorValue)


_ERROR_CTOR = _ErrorCtor()
