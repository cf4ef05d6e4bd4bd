"""jslite (SCRIPT("js") interpreter) semantics: property tests against
Python reference semantics plus targeted JS-quirk cases."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neo_server_spark.tql.jslite import UNDEFINED, Interpreter, JSError, to_display


class Sink:
    _js_host = True

    def __init__(self):
        self.rows = []
        self.key = None
        self.values = []
        self.params = {}
        self.result = UNDEFINED
        setattr(self, "yield", lambda *v: self.rows.append(list(v)))

    def js_set(self, name, val):
        setattr(self, name, val)


def run_expr(src: str):
    d = Sink()
    it = Interpreter(d)
    it.run(f"$.yield({src})")
    return d.rows[0][0]


ints = st.integers(min_value=-10**9, max_value=10**9)
floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                   allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(a=ints, b=ints)
def test_integer_arithmetic_matches_python(a, b):
    assert run_expr(f"({a}) + ({b})") == a + b
    assert run_expr(f"({a}) - ({b})") == a - b
    assert run_expr(f"({a}) * ({b})") == a * b


@settings(max_examples=200, deadline=None)
@given(a=floats, b=floats)
def test_float_division_and_comparison(a, b):
    if b != 0:
        assert run_expr(f"({a!r}) / ({b!r})") == pytest.approx(a / b, rel=1e-12)
    assert run_expr(f"({a!r}) < ({b!r})") == (a < b)
    assert run_expr(f"({a!r}) >= ({b!r})") == (a >= b)


@settings(max_examples=100, deadline=None)
@given(a=ints, b=st.integers(min_value=1, max_value=10**6))
def test_modulo_follows_dividend_sign(a, b):
    # JS % truncates toward zero (fmod), unlike Python's floor mod
    assert run_expr(f"({a}) % ({b})") == math.fmod(a, b)


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet=st.characters(codec="ascii",
                                        exclude_characters="\\'\"\n\r\0"),
                 max_size=30),
       t=st.text(alphabet=st.characters(codec="ascii",
                                        exclude_characters="\\'\"\n\r\0"),
                 max_size=30))
def test_string_concat_and_methods(s, t):
    assert run_expr(f"'{s}' + '{t}'") == s + t
    assert run_expr(f"('{s}').length") == len(s)
    assert run_expr(f"('{s}').toUpperCase()") == s.upper()


def test_js_quirks():
    # number+string coerces to string with JS number formatting
    assert run_expr("1 + '2'") == "12"
    assert run_expr("1.0 + 'x'") == "1x"
    # ternary, nullish, logical short-circuit return values
    assert run_expr("true ? 1 : 2") == 1
    assert run_expr("null ?? 'fallback'") == "fallback"
    assert run_expr("0 || 'x'") == "x"
    assert run_expr("'a' && 'b'") == "b"
    # strict vs loose equality
    assert run_expr("'1' == 1") is True
    assert run_expr("'1' === 1") is False
    assert run_expr("null == undefined") is True
    assert run_expr("null === undefined") is False
    # typeof
    assert run_expr("typeof 1") == "number"
    assert run_expr("typeof 'x'") == "string"
    assert run_expr("typeof undefined") == "undefined"
    # Math.round half-up (not banker's)
    assert run_expr("Math.round(0.5)") == 1
    assert run_expr("Math.round(1.5)") == 2
    assert run_expr("Math.round(-0.5)") == 0
    # empty array/object are truthy in JS
    assert run_expr("[] ? 'yes' : 'no'") == "yes"
    # parseInt truncates at first non-digit
    assert run_expr("parseInt('42px')") == 42
    assert run_expr("parseFloat('3.14abc')") == 3.14


def test_closures_and_hoisting():
    d = Sink()
    it = Interpreter(d)
    it.run("""
        function make(x) { return function(y) { return x + y; }; }
        var add5 = make(5);
        $.yield(add5(3), hoisted());
        function hoisted() { return 'later'; }
    """)
    assert d.rows == [[8, "later"]]


def test_array_methods_chain():
    assert run_expr("[3,1,2].sort().join('-')") == "1-2-3"
    assert run_expr("[1,2,3,4].filter(function(v){return v % 2 == 0}).length") == 2
    assert run_expr("[1,2,3].map(function(v){return v*v}).reduce(function(a,b){return a+b})") == 14
    assert run_expr("['a','b'].indexOf('b')") == 1


def test_for_of_and_objects():
    d = Sink()
    it = Interpreter(d)
    it.run("""
        var total = 0;
        var obj = {a: 1, b: 2, c: 3};
        for (var k of ['a', 'b', 'c']) { total += obj[k]; }
        $.yield(total, obj.a, obj['b']);
    """)
    assert d.rows == [[6, 1, 2]]


def test_no_host_escape():
    # underscore members never resolve on host values — dunders like
    # __class__ are the classic interpreter-escape surface
    assert run_expr("(1).__class__") is UNDEFINED
    assert run_expr("'x'.__class__") is UNDEFINED
    assert run_expr("[].__class__") is UNDEFINED
    d = Sink()
    it = Interpreter(d)
    with pytest.raises(JSError):
        it.run("require('fs')")
    # host-object private attributes stay private
    assert run_expr("$._runner") is UNDEFINED or run_expr("$._runner") is None


def test_to_display_number_formatting():
    assert to_display(1.0) == "1"
    assert to_display(1.5) == "1.5"
    assert to_display(True) == "true"
    assert to_display(None) == "null"
    assert to_display(UNDEFINED) == "undefined"


def test_review_findings_division_and_display():
    """Round-4 review regressions: Infinity display, JS division/modulo
    edge semantics, compound-assignment parity, sort comparator calls."""
    # Infinity renders, never raises
    assert run_expr("'' + 1/0") == "Infinity"
    assert run_expr("'' + (-1)/0") == "-Infinity"
    assert to_display(float("inf")) == "Infinity"
    # x/±0 follows BOTH signs; NaN propagates
    assert run_expr("1 / -0.0") == float("-inf")
    assert run_expr("-1 / -0.0") == float("inf")
    assert math.isnan(run_expr("(0/0) / 0"))
    assert math.isnan(run_expr("(0/0) % 2"))
    # compound assignment uses the same never-raise semantics
    d = Sink()
    it = Interpreter(d)
    it.run("var x = 5; x /= 0; var y = 7; y %= 0; $.yield('' + x, '' + y);")
    assert d.rows == [["Infinity", "NaN"]]
    # int-preserving %= like %
    assert run_expr("7 % 2") == 1
    d2 = Sink()
    Interpreter(d2).run("var z = 7; z %= 2; $.yield(z);")
    assert d2.rows == [[1]]
    # sort comparator: one call per comparison (a 2-element sort is
    # exactly one comparison; the old code invoked the comparator twice)
    d3 = Sink()
    Interpreter(d3).run("""
        var calls = 0;
        [2, 1].sort(function(a, b){ calls += 1; return a - b; });
        $.yield(calls);
    """)
    assert d3.rows[0][0] == 1


def test_analyze_stateless_adversarial():
    """Soundness probes: shapes that LOOK stateless but carry cross-record
    state must be rejected; per-record-local mutation must pass."""
    from neo_server_spark.tql.jslite import Interpreter, analyze_stateless
    P = Interpreter.prepare
    stateful = [
        "$.values = []; $.yield(1)",              # member write on $
        "$.values[0] = 9; $.yield(1)",            # index write through $
        "var f = function(){ g = 1 }; f(); $.yield(g)",   # closure global
        "for (i = 0; i < 3; i++) { $.yield(i) }",  # undeclared loop var
    ]
    # reading $.values into a local is FINE (fresh per record)
    assert analyze_stateless(P("var a = $.values; $.yield(a[0])"))
    assert not analyze_stateless(P(stateful[0]))
    assert not analyze_stateless(P(stateful[1]))
    assert not analyze_stateless(P(stateful[2]))
    assert not analyze_stateless(P(stateful[3]))
    # closure mutating a MAIN-declared local: resets per record, stateless
    assert analyze_stateless(P(
        "var acc = 0; $.values.forEach(function(v){ acc += v });"
        " $.yield(acc)"))
    # require of a pure module is stateless; aliasing $ never is
    assert analyze_stateless(P(
        'var m = require("mathx/spatial");'
        " $.yield(m.parseGeoJSON($.values[0]))"))
    assert not analyze_stateless(P("var d = $; d.yield(1)"))


@settings(max_examples=300, deadline=None)
@given(src=st.text(max_size=80))
def test_parser_total_on_arbitrary_input(src):
    """Untrusted-input hardening: the tokenizer/parser either produce an
    AST or raise JSError — never an arbitrary exception, never a hang."""
    from neo_server_spark.tql.jslite import Interpreter
    try:
        Interpreter.prepare(src)
    except JSError:
        pass
    except RecursionError:
        pass  # deeply nested input hits Python's recursion guard cleanly


def test_step_budget_stops_runaway_loops():
    """An untrusted while(true){} cannot hang the VM: each exec_ast has a
    step budget (the reference's goja tasks run under a cancellable
    context)."""
    d = Sink()
    it = Interpreter(d, step_limit=100_000)
    with pytest.raises(JSError, match="step budget"):
        it.run("while (true) { var x = 1; }")
    with pytest.raises(JSError, match="step budget"):
        it.run("for (var i = 0; true; i++) ;")
    # the budget resets per exec_ast — normal records are unaffected
    it2 = Interpreter(d)
    it2.run("var t = 0; for (var i = 0; i < 10000; i++) { t += i; } $.yield(t)")
    assert d.rows[-1] == [49995000]


# ---------------------------------------------------------------------------
# mathx/spatial haversine + simplify — verbatim vectors from the reference's
# jsh/lib/mathx/spatial/spatial_test.go (TestHaversine, TestSimplify); the
# assertions compare engine-independent values (toFixed strings / JSON),
# not jsh console formatting.
# ---------------------------------------------------------------------------


def test_spatial_haversine_reference_vectors():
    d = Sink()
    it = Interpreter(d)
    it.run(
        'var m = require("mathx/spatial");'
        "var coord1 = [-34.83333, -58.5166646];"   # buenos aires
        "var coord2 = [49.0083899664, 2.53844117956];"  # paris
        "$.yield(m.haversine(coord1, coord2).toFixed(0));"
        "$.yield(m.haversine(coord1, coord2, 6371).toFixed(0));")
    assert d.rows[0] == ["11099540"]
    assert d.rows[1] == ["11100"]


def test_spatial_haversine_city_battery():
    # TestHaversine js-haversine-cities: 7 city pairs, radius 6371 km
    pairs = [
        ([22.55, 43.12], [13.45, 100.28], "6094.544"),
        ([20.10, 57.30], [0.57, 100.21], "5145.526"),
        ([51.45, 1.15], [41.54, 12.27], "1389.179"),
        ([22.34, 17.05], [51.56, 4.29], "3429.893"),
        ([63.24, 56.59], [8.50, 13.14], "6996.186"),
        ([90.0, 0.0], [48.51, 2.21], "4613.478"),
        ([45.04, 7.42], [3.09, 101.42], "10078.112"),
    ]
    d = Sink()
    it = Interpreter(d)
    for c1, c2, want in pairs:
        d.rows.clear()
        it.run(
            'var m = require("mathx/spatial");'
            f"$.yield(m.haversine({c1}, {c2}, 6371).toFixed(3));")
        assert d.rows[0] == [want], (c1, c2)


def test_spatial_simplify_reference_vectors():
    d = Sink()
    it = Interpreter(d)
    it.run(
        'var m = require("mathx/spatial");'
        "var points = [[0, 0], [1, 2], [2, 7], [3, 1], [4, 8],"
        " [5, 2], [6, 8], [7, 3], [8, 3], [9, 0]];"
        "$.yield(JSON.stringify(m.simplify(0, ...points)));"
        "$.yield(JSON.stringify(m.simplify(2, ...points)));"
        "$.yield(JSON.stringify(m.simplify(100, ...points)));"
        # short inputs pass through (js-simplify-short-input)
        "$.yield(JSON.stringify(m.simplify(0.5, [37.1, 127.1], [37.2, 127.2])));"
        "$.yield(JSON.stringify(m.simplify(10, [37.1, 127.1])));")
    assert d.rows[0] == ["[[0,0],[1,2],[2,7],[3,1],[4,8],[5,2],[6,8],[7,3],[8,3],[9,0]]"]
    assert d.rows[1] == ["[[0,0],[2,7],[3,1],[4,8],[5,2],[6,8],[9,0]]"]
    assert d.rows[2] == ["[[0,0],[9,0]]"]
    assert d.rows[3] == ["[[37.1,127.1],[37.2,127.2]]"]
    assert d.rows[4] == ["[[37.1,127.1]]"]


def test_spatial_seek_most_distant_semantics():
    # nums/simplify_test.go TestSeekMostDistantPoint: the line (0,0)-(0,10)
    # vs points — farthest is (13,13) at distance 13.  Exercised through
    # simplify: with tolerance 12.9 the split happens at that point.
    # Points here are (x, y) = (lng, lat) in reference space, so [lat, lon]
    # input is [y, x].
    d = Sink()
    it = Interpreter(d)
    it.run(
        'var m = require("mathx/spatial");'
        "$.yield(JSON.stringify(m.simplify(13.0001,"
        " [0, 0], [13, 13], [15, 1], [1, 1], [6, 3], [10, 0])));"
        "$.yield(JSON.stringify(m.simplify(12.9,"
        " [0, 0], [13, 13], [15, 1], [1, 1], [6, 3], [10, 0])));")
    # above the max distance: everything collapses to the endpoints
    assert d.rows[0] == ["[[0,0],[10,0]]"]
    # just below: the distant point survives
    assert "[13,13]" in d.rows[1][0]
