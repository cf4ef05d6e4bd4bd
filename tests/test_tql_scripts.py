"""Run the reference's OWN .tql golden scripts, unmodified, through the TQL
text front-end and compare byte-for-byte against the reference's expected
CSV outputs (mods/tql/test/*.tql + *.csv, executed by mods/tql/tql_test.go
TestTqlLoader).

This is the strongest parity evidence the engine can produce: the inputs
are the reference's files verbatim, not ports.
"""

import os

import pytest

from neo_server_spark.tql.script import parse_script, run_file, run_script

GOLDEN_DIR = "/root/reference/mods/tql/test"

needs_goldens = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available"
)


def golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return f.read()


def out_lines(out):
    """Sink output lines with the Exporter.Close trailing newline removed
    (csv_encode.go:127) — the same normalization task_test.go's runTest
    applies before comparing."""
    return out.rstrip("\n").split("\n") if out.strip() else []



def run_golden(spark, name: str) -> str:
    return run_file(spark, os.path.join(GOLDEN_DIR, f"{name}.tql"),
                    fs_root=GOLDEN_DIR)


# one test per reference .tql file — executed unmodified
GOLDEN_CASES = [
    "TestLoader",            # FAKE(linspace) -> CSV
    "TestLoader_Pi",         # MAPVALUE trig chain, precision(4)
    "TestLoader_group",      # GROUP by + sum/avg/mean, precision(2)
    "TestLoader_groupbykey", # 14-aggregate battery incl. lininterp median,
                             # raw-gonum entropy, first/last by arrival
    "TestLoader_iris",       # CSV(file) + field() coercions + GROUP
    "TestLoader_iris_setosa",# CSV(file) inferred types + FILTER + GROUP
    "transpose_all",         # TRANSPOSE() all fields
    "transpose_all_hdr",     # TRANSPOSE(header(true))
    "transpose_hdr",         # TRANSPOSE(header(true), 2,4,5) + parseTime
    "transpose_nohdr",       # TRANSPOSE(2,4,5) without header
    "TestLoader_simplex",    # meshgrid + EXACT OpenSimplex noise (noisefn)
]


@needs_goldens
@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_reference_tql_golden(spark, name):
    # live task output = golden-file content + the Exporter.Close "\n"
    # (csv_encode.go:127) — exactly what tql_test.go's loadLines models.
    assert run_golden(spark, name) == golden(f"{name}.csv") + "\n"


@needs_goldens
def test_all_reference_tql_files_parse():
    """Every .tql file in the reference test corpus must at least PARSE
    (TestLoader_qq executes too but isn't value-comparable:
    time('now') is wall-clock)."""
    for fn in sorted(os.listdir(GOLDEN_DIR)):
        if fn.endswith(".tql"):
            stmts = parse_script(open(os.path.join(GOLDEN_DIR, fn)).read())
            assert stmts, fn


@needs_goldens
def test_simplex_exact_vectors():
    """noisefn.OpenSimplex reproduces the reference's own 2D sample
    vectors (mods/nums/opensimplex/test/samples.json.gz) bit-for-bit."""
    import gzip
    import json

    from neo_server_spark.functions.noisefn import OpenSimplex

    path = "/root/reference/mods/nums/opensimplex/test/samples.json.gz"
    n = OpenSimplex(0)
    dec = json.JSONDecoder()
    buf = gzip.open(path, "rt").read()
    i = checked = 0
    while i < len(buf):
        while i < len(buf) and buf[i] in " \n\t\r":
            i += 1
        if i >= len(buf):
            break
        s, i = dec.raw_decode(buf, i)
        if len(s) == 3:   # 2D samples; 3D/4D are out of TQL's surface
            assert abs(float(n.eval2(s[0], s[1])) - s[2]) <= 1e-12
            checked += 1
    assert checked == 2048


def test_string_source_and_ops(spark):
    """STRING source + FILTER + MAPVALUE(-1) insert-at-front (the
    TestLoader_qq shape, with a deterministic timestamp)."""
    src = """
STRING(payload() ?? `a
bb

ccc`, separator('\\n'), trimspace(true))
FILTER( len(value(0)) > 0 )
MAPVALUE(-1, "id_"+key())
CSV()
"""
    out = run_script(spark, src)
    rows = [ln.split(",") for ln in out_lines(out) if ln]
    assert [r[1] for r in rows] == ["a", "bb", "ccc"]
    assert all(r[0].startswith("id_") for r in rows)


def test_take_drop_pushpop(spark):
    src = """
FAKE( linspace(1, 10, 10) )
DROP(2)
TAKE(3)
PUSHVALUE(0, value(0) * 100, "hundred")
POPVALUE(1)
CSV(header(true))
"""
    out = run_script(spark, src)
    assert out_lines(out) == ["hundred", "300", "400", "500"]


def test_sql_source_group(spark, sf_dir):
    """SQL('select ...') source statement + GROUP over real tables."""
    from neo_server_spark.tql.script import TqlRunner

    src = """
SQL('select event_type, value from events')
GROUP(by(value(0), "name"), count(value(1), "cnt"))
CSV(header(true))
"""
    out = TqlRunner(spark, sf_dir=sf_dir).run(src)
    lines = out_lines(out)
    assert lines[0] == "name,cnt"
    assert len(lines) > 1
    assert lines[1:] == sorted(lines[1:])  # GROUP emits sorted by key


def test_sql_statement_lake_dialect(spark, sf_dir):
    """SQL() in a script accepts the lake dialect: DECODE and TO_CHAR
    rewrite before planning (http_lake.go surface through the text layer)."""
    from neo_server_spark.tql.script import TqlRunner

    src = """
SQL("select DECODE(event_type, 'purchase', 1, 0) AS is_p from events limit 5")
CSV(header(true))
"""
    out = TqlRunner(spark, sf_dir=sf_dir).run(src)
    lines = out_lines(out)
    assert lines[0] == "is_p"
    assert set(lines[1:]) <= {"0", "1"}


def test_sql_select_builder_statement(spark, sf_dir):
    """SQL_SELECT('value', from('events', 'purchase'), limit(5)) — ranged
    tag-scan source through the text surface."""
    from neo_server_spark.tql.script import TqlRunner

    src = """
SQL_SELECT('value', from('events', 'purchase'), limit(5))
CSV(header(true))
"""
    out = TqlRunner(spark, sf_dir=sf_dir).run(src)
    lines = out_lines(out)
    assert lines[0] == "name,time,value"
    assert len(lines) == 6
    assert all(ln.startswith("purchase,") for ln in lines[1:])


# ---------------------------------------------------------------------------
# inline scripts from mods/tql/tql_test.go (no .tql file; script text + the
# reference's expected CSV, verbatim)
# ---------------------------------------------------------------------------

INLINE_CASES = [
    ("MAP_AVG", """
        FAKE( arrange(10, 30, 10) )
        MAP_AVG(1, value(0))
        CSV( precision(0) )
     """, ["10,10", "20,15", "30,20"]),                  # tql_test.go:1553
    ("MAP_KALMAN", """
        FAKE(json({[1.3], [10.2], [5.0], [3.4]}))
        MAP_KALMAN(1, value(0), model(1.0, 1.0, 2.0))
        CSV(precision(1))
     """, ["1.3,1.3", "10.2,5.7", "5.0,5.4", "3.4,4.4"]),  # tql_test.go:1607
    ("MAP_DIFF", """
        FAKE( csv("1\\n3\\n2\\n7") )
        MAP_DIFF(0, value(0))
        CSV()
     """, ["NULL", "2", "-1", "5"]),                     # tql_test.go:1622
    ("MAP_NONEGDIFF", """
        FAKE( csv("1\\n3\\n2\\n7") )
        MAP_NONEGDIFF(0, value(0))
        CSV()
     """, ["NULL", "2", "0", "5"]),
    ("MAP_ABSDIFF", """
        FAKE( csv("1\\n3\\n2\\n7") )
        MAP_ABSDIFF(0, value(0))
        CSV()
     """, ["NULL", "2", "1", "5"]),
    ("CSV_CSV", """
        CSV("1,line1\\n2,line2\\n3,\\n4,line4")
        CSV( heading(true) )
     """, ["column0,column1", "1,line1", "2,line2", "3,", "4,line4"]),
    ("CSV_CSV_single_column", """
        CSV("line1\\nline2\\n\\nline4")
        CSV( heading(true) )
     """, ["column0", "line1", "line2", "line4"]),
    ("MAP_pushkey_manual", """
        FAKE( linspace(1, 2, 2) )
        PUSHKEY("k")
        CSV()
     """, ["1,1", "2,2"]),
    ("MAP_popkey_manual", """
        FAKE( json({
            ["TAG0", 1, 10],
            ["TAG1", 2, 20]
        }))
        POPKEY()
        CSV()
     """, ["1,10", "2,20"]),
    ("MAP_transpose_header_manual", """
        FAKE(csv("CITY,DATE,TEMPERATURE,HUMIDITY\\nTokyo,2023/12/07,23,30"))
        TRANSPOSE(header(true))
        CSV()
     """, ["CITY,Tokyo", "DATE,2023/12/07", "TEMPERATURE,23", "HUMIDITY,30"]),
    ("MAP_take_offset_count_manual", """
        FAKE( json({
            ["TAG0", 1, 10], ["TAG0", 2, 11], ["TAG0", 3, 12],
            ["TAG0", 4, 13], ["TAG0", 5, 14], ["TAG0", 6, 15]
        }))
        TAKE(3, 2)
        CSV()
     """, ["TAG0,4,13", "TAG0,5,14"]),
    ("MAP_drop_offset_count_manual", """
        FAKE( json({
            ["TAG0", 1, 10], ["TAG0", 2, 11], ["TAG0", 3, 12],
            ["TAG0", 4, 13], ["TAG0", 5, 14], ["TAG0", 6, 15]
        }))
        DROP(2, 3)
        CSV()
     """, ["TAG0,1,10", "TAG0,2,11", "TAG0,6,15"]),
    ("strSprintf", """
        FAKE(json(strSprintf('[%.f, %q]', 123, "hello")))
        CSV( heading(false) )
     """, ["123,hello"]),
    ("UTIL_sqlTimeformat_csv", """
        FAKE( json({
            [1701345032123456789, 10],
            [1701345043219876543, 11]
        }))
        MAPVALUE(0, time(value(0)))
        CSV(sqlTimeformat("YYYY-MM-DD HH24:MI:SS.nnnnnn"), tz("Asia/Seoul"))
     """, ["2023-11-30 20:50:32.123456,10", "2023-11-30 20:50:43.219876,11"]),
    ("UTIL_ansiTimeformat_csv", """
        FAKE( json({
            [1701345032123456789, 10],
            [1701345043219876543, 11]
        }))
        MAPVALUE(0, time(value(0)))
        CSV(ansiTimeformat("yyyy-mm-dd hh:nn:ss.ffffff"), tz("UTC"))
     """, ["2023-11-30 11:50:32.123456,10", "2023-11-30 11:50:43.219876,11"]),
    ("UTIL_string_trim_replace", """
        FAKE( json({
            ["prefix-hello-suffix"]
        }))
        MAPVALUE(0, strTrimPrefix(value(0), "prefix-"))
        MAPVALUE(0, strTrimSuffix(value(0), "-suffix"))
        MAPVALUE(0, strReplace(value(0), "l", "L", 1))
        CSV()
     """, ["heLlo"]),
    ("UTIL_string_predicates", """
        FAKE( json({
            ["prefix-hello-suffix"],
            ["hello"]
        }))
        PUSHVALUE(1, strHasPrefix(value(0), "prefix-"))
        PUSHVALUE(2, strHasSuffix(value(0), "-suffix"))
        CSV()
     """, ["prefix-hello-suffix,true,true", "hello,false,false"]),
    ("UTIL_string_replace_all", """
        FAKE( json({
            ["a-b-c"]
        }))
        MAPVALUE(0, strReplaceAll(value(0), "-", "_"))
        CSV()
     """, ["a_b_c"]),
    ("FAKE_json_manual", """
        FAKE(
            json({
                ["A", 1, true],
                ["B", 2, false],
                ["C", 3, true]
            })
        )
        MAPVALUE(1, value(1)*10)
        CSV()
     """, ["A,10,true", "B,20,false", "C,30,true"]),
    ("FAKE_csv_manual", """
        FAKE(
            csv(
                strTrimSpace(`
                    A,1,true
                    B,2,false
                    C,3,true
                `)
            )
        )
        MAPVALUE(0, strTrimSpace(value(0)))
        MAPVALUE(1, parseFloat(value(1))*10)
        MAPVALUE(2, parseBool(value(2)))
        CSV()
     """, ["A,10,true", "B,20,false", "C,30,true"]),
    ("FAKE_meshgrid_manual", """
        FAKE(
            meshgrid(linspace(1, 2, 2), linspace(10, 20, 2))
        )
        CSV()
     """, ["1,10", "1,20", "2,10", "2,20"]),
    ("FILTER_CHANGED_string", """
        FAKE(json({
            ["A", 1.0],
            ["A", 2.0],
            ["B", 3.0],
            ["B", 4.0]
        }))
        FILTER_CHANGED(value(0))
        CSV()
     """, ["A,1", "B,3"]),                               # tql_test.go:1648
]


@pytest.mark.parametrize("name,script,want", INLINE_CASES,
                         ids=[c[0] for c in INLINE_CASES])
def test_tql_test_go_inline_scripts(spark, name, script, want):
    out = run_script(spark, script)
    assert [ln for ln in out_lines(out) if ln] == want


def test_csv_markdown_script(spark):
    """tql_test.go:1086-1110 CSV(payload(), header(true)) -> MARKDOWN()."""
    payload = "\n".join([
        "NAME,TIME,VALUE",
        "wave.sin,1676432361,0.000000",
        "wave.cos,1676432361,1.000000",
        "wave.sin,1676432362,0.406736",
        "wave.cos,1676432362,0.913546",
        "wave.sin,1676432363,0.743144",
    ])
    out = run_script(spark, """
        CSV(payload(), header(true))
        MARKDOWN()
    """, payload=payload)
    assert out_lines(out) == [
        "|NAME|TIME|VALUE|",
        "|:-----|:-----|:-----|",
        "|wave.sin|1676432361|0.000000|",
        "|wave.cos|1676432361|1.000000|",
        "|wave.sin|1676432362|0.406736|",
        "|wave.cos|1676432362|0.913546|",
        "|wave.sin|1676432363|0.743144|",
    ]


def test_histogram_statement(spark):
    """HISTOGRAM(v, bins(min,max,step)) (fm_stat.go predicted-bins path)."""
    out = run_script(spark, """
        FAKE( linspace(0, 9.99, 100) )
        HISTOGRAM(value(0), bins(0, 10, 2))
        CSV(header(true))
    """)
    assert out_lines(out) == ["low,high,count", "0,2,20", "2,4,20",
                                "4,6,20", "6,8,20", "8,10,20"]


def test_boxplot_statement(spark):
    """BOXPLOT standard output is the reference's transposed table
    (fm_stat.go:452-505): rows MIN..OUTLIER, one column per category;
    quartiles are gonum Empirical (actual elements).  OUTLIER cells print
    the literal '[]float64' — the reference CSV encoder's %T default arm
    for a Go slice (csv_encode.go)."""
    out = run_script(spark, """
        FAKE( json({
            ["a", 1], ["a", 2], ["a", 3], ["a", 4],
            ["b", 10], ["b", 20], ["b", 30], ["b", 40]
        }))
        BOXPLOT(value(1), category(value(0)))
        CSV(header(true))
    """)
    assert out_lines(out) == [
        "CATEGORY,a,b",
        "MIN,1,10", "LOWER,-2,-20", "Q1,1,10", "Q2,2,20", "Q3,3,30",
        "UPPER,6,60", "MAX,4,40", "IQR,2,20",
        "OUTLIER,[]float64,[]float64"]


def test_boxplot_interp_and_output(spark):
    """boxplotInterp(q1,q2,q3) picks gonum LinInterp per quartile
    (fm_stat.go:340-357); boxplotOutput('chart') emits per-category rows
    with echarts [lower,q1,q2,q3,upper] (fm_stat.go:424-450); order()
    controls category sequence."""
    src = """
        FAKE( json({
            ["a", 1], ["a", 2], ["a", 3], ["a", 4], ["a", 5], ["a", 50]
        }))
    """
    # [1,2,3,4,5,50], n=6: Empirical q1 = x[ceil(1.5)] = x[2] = 2;
    # LinInterp q1: fidx=1.5, i=2 -> 1 + 0.5*(2-1) = 1.5
    out = run_script(spark, src + """
        BOXPLOT(value(1), category(value(0)), boxplotInterp(true, false, false))
        CSV(header(true))
    """)
    lines = dict(ln.split(",", 1) for ln in out_lines(out))
    assert lines["Q1"] == "1.5" and lines["Q2"] == "3" and lines["Q3"] == "5"
    out = run_script(spark, src + """
        BOXPLOT(value(1), category(value(0)))
        CSV(header(true))
    """)
    lines = dict(ln.split(",", 1) for ln in out_lines(out))
    # empirical q1=2, q3=5, iqr=3, upper=9.5 -> 50 is an outlier
    assert lines["Q1"] == "2" and lines["UPPER"] == "9.5"
    out = run_script(spark, """
        FAKE( json({
            ["a", 1], ["a", 2], ["a", 3], ["a", 4],
            ["b", 10], ["b", 20], ["b", 30], ["b", 40]
        }))
        BOXPLOT(value(1), category(value(0)), order('b', 'a'),
                boxplotOutput('chart'))
        CSV(header(true))
    """)
    lines = out_lines(out)
    assert lines[0] == "CATEGORY,BOXPLOT,OUTLIER"
    # chart-mode rows carry []any values; the CSV encoder's default %T
    # case renders them as the literal Go type name (csv_encode.go:244)
    assert lines[1] == "b,[]interface {},[]interface {}"
    assert lines[2] == "a,[]interface {},[]interface {}"


def test_filter_changed_options_statement(spark):
    """FILTER_CHANGED retain()/useFirstWithLast() through the text
    front-end (fm_monad.go:121-238), delegating to the driver-green DSL."""
    # value holds A (t=0..2s), then B (t=3..4s), then A (t=5s);
    # retain 2s: a run emits only once its value held >= 2s
    src = """
        FAKE( json({
            [0, "A"], [1000000000, "A"], [2000000000, "A"],
            [3000000000, "B"], [4000000000, "B"],
            [5000000000, "A"]
        }))
        FILTER_CHANGED(value(1), retain(value(0), "2s"))
        CSV()
    """
    out = run_script(spark, src)
    # the stream's FIRST record always emits (BufferedFilter init,
    # fm_monad.go:139-158); only the first A-run holds >= 2s and emits its
    # crossing record (t=2s)
    assert out_lines(out) == ["0,A", "2000000000,A"]
    out = run_script(spark, """
        FAKE( json({
            [0, "A"], [1000000000, "A"], [2000000000, "A"],
            [3000000000, "B"], [4000000000, "B"],
            [5000000000, "A"]
        }))
        FILTER_CHANGED(value(1), retain(value(0), "2s"),
                       useFirstWithLast(true))
        CSV()
    """)
    # useFirst -> the run's FIRST record; withLast -> the run's last too
    assert out_lines(out)[0] == "0,A"


def test_ternary_expression(spark):
    """expression/parse.go conditional: cond ? a : b."""
    out = run_script(spark, """
        FAKE(json({[1], [200]}))
        MAPVALUE(0, value(0) > 100 ? value(0) * 2 : value(0))
        CSV()
    """)
    assert [ln for ln in out_lines(out) if ln] == ["1", "400"]


def test_csv_payload_field_coercions(spark):
    """tql_test.go:967-1001 CSV(payload(), field(...)) with datetimeType
    unit and Go-layout+zone parsing; CSV(timeformat('s')) round-trips."""
    script = """
        CSV(payload(),
            field(0, stringType(), "name"),
            field(1, datetimeType("s"), "time"),
            field(2, doubleType(), "value"),
            field(3, stringType(), "active")
        )
        CSV(timeformat("s"), heading(true))
    """
    out = run_script(spark, script, payload="temp.name,1691662156,123.456789,true\n")
    assert [ln for ln in out_lines(out) if ln] == [
        "name,time,value,active",
        "temp.name,1691662156,123.456789,true"]

    layout = """
        CSV(payload(),
            field(0, stringType(), "name"),
            field(1, datetimeType("2006/01/02 15:04:05", "KST"), "time"),
            field(2, doubleType(), "value"),
            field(3, stringType(), "active")
        )
        CSV(timeformat("s"), heading(true))
    """
    out2 = run_script(spark, layout,
                      payload="temp.name,2023/08/10 19:09:16,123.456789,true\n")
    assert [ln for ln in out_lines(out2) if ln] == [
        "name,time,value,active",
        "temp.name,1691662156,123.456789,true"]


@needs_goldens
@pytest.mark.parametrize("nowait", [False, True])
def test_movavg_script_golden(spark, nowait):
    """tql_test.go:1567-1582 MAP_MOVAVG against movavg_result[_nowait].csv."""
    opt = ", noWait(true)" if nowait else ""
    script = f"""
        FAKE( linspace(0, 100, 100) )
        MAP_MOVAVG(1, value(0), 10{opt})
        CSV( precision(4) )
    """
    got = [ln for ln in run_script(spark, script).splitlines() if ln]
    fname = "movavg_result_nowait.csv" if nowait else "movavg_result.csv"
    want = [ln for ln in golden(fname).splitlines() if ln]
    assert got == want


@needs_goldens
@pytest.mark.parametrize("lon,lat,hdr,fname", [
    (4, 4, "true", "sphere_4_4.csv"),
    (0, 0, "false", "sphere_0_0.csv"),
])
def test_sphere_script_golden(spark, lon, lat, hdr, fname):
    """tql_test.go FAKE_sphere cases: the float-accumulation loop bounds
    (702 rows for the default grid, not 36*18), unsigned-zero rendering and
    ROWNUM key naming must match byte-for-byte."""
    script = f"""
        FAKE( sphere({lon}, {lat}) )
        PUSHKEY('test')
        CSV( header({hdr}), precision(6) )
    """
    got = [ln for ln in run_script(spark, script).splitlines() if ln]
    want = [ln for ln in golden(fname).splitlines() if ln]
    assert got == want


@needs_goldens
def test_fft2d_script_golden(spark):
    """tql_test.go:1766-1775 FFT case, verbatim: oscillator -> MAPKEY ->
    GROUPBYKEY -> FFT(minHz, maxHz) vs fft2d.csv."""
    script = """
        FAKE( oscillator( range(timeAdd(1685714509*1000000000,'1s'), '1s', '100us'), freq(10, 1.0), freq(50, 2.0)))
        MAPKEY('samples')
        GROUPBYKEY(lazy(false))
        FFT(minHz(0), maxHz(60))
        CSV(precision(6))
    """
    got = [ln for ln in run_script(spark, script).splitlines() if ln]
    want = [ln for ln in golden("fft2d.csv").splitlines() if ln]
    assert got == want


@needs_goldens
def test_fft3d_script_golden(spark):
    """tql_test.go:1796-1808 FFT_3d, verbatim: per-500ms-bucket FFT ->
    FLATTEN -> PUSHKEY vs fft3d.csv."""
    script = """
        FAKE( oscillator( range(timeAdd(1685714509*1000000000,'1s'), '1s', '100us'), freq(10, 1.0), freq(50, 2.0)))
        MAPKEY( roundTime(value(0), '500ms') )
        GROUPBYKEY()
        FFT(maxHz(60))
        FLATTEN()
        PUSHKEY('fft3d')
        CSV(precision(6))
    """
    got = [ln for ln in run_script(spark, script).splitlines() if ln]
    want = [ln for ln in golden("fft3d.csv").splitlines() if ln]
    assert got == want


def test_fft_script(spark):
    """FFT() statement: oscillator -> GROUPBYKEY -> spectrum with the 2 Hz
    peak.  Ungrouped FFT drops every record (each carries ONE sample,
    fm_fourier.go:48-52 drops chunks under 16 samples instead of raising)."""
    script = """
        FAKE( oscillator( freq(2, 1.0), range(0, 1000000000, 7812500)) )
        MAPKEY('samples')
        GROUPBYKEY(lazy(false))
        FFT()
    """
    df = run_script(spark, script)
    rows = sorted(df.collect(), key=lambda r: -r.ampl)
    assert abs(rows[0].hz - 2.0) < 0.2 and abs(rows[0].ampl - 1.0) < 0.05
    ungrouped = run_script(spark, """
        FAKE( oscillator( freq(2, 1.0), range(0, 1000000000, 7812500)) )
        FFT()
    """)
    assert ungrouped.count() == 0


def test_json_sink_roundtrip(spark):
    src = """
FAKE( json({
    ["x", 1],
    ["y", 2]
}) )
CSV()
"""
    assert out_lines(run_script(spark, src)) == ["x,1", "y,2"]


def test_string_source_pushkey_csv(spark):
    """task_test.go TestString: STRING literal -> PUSHKEY -> CSV(heading)."""
    out = run_script(spark, r"""
        STRING("line1\nline2\n\nline4", separator("\n"))
        PUSHKEY('test')
        CSV( heading(true) )
    """)
    assert out_lines(out) == ["ROWNUM,STRING", "1,line1", "2,line2",
                                "3,", "4,line4"]


@needs_goldens
def test_string_file_markdown_xhtml_golden(spark):
    """task_test.go TestSinkMarkdown: STRING(file) -> PUSHKEY ->
    MARKDOWN(html(true)) vs markdown_xhtml.txt, byte-for-byte."""
    out = run_script(spark, r"""
        STRING(file('/lines.txt'), separator('\n'))
        PUSHKEY('test')
        MARKDOWN(html(true))
    """, fs_root=GOLDEN_DIR)
    assert out.rstrip("\n") == golden("markdown_xhtml.txt").rstrip("\n")


@needs_goldens
def test_string_file_markdown_plain(spark):
    out = run_script(spark, r"""
        STRING(file('/lines.txt'), separator('\n'))
        MARKDOWN(html(false))
    """, fs_root=GOLDEN_DIR)
    assert out_lines(out) == ["|STRING|", "|:-----|", "|line1|",
                                "|line2|", "||", "|line4|"]


def test_bytes_source_hex(spark):
    """task_test.go TestBytes: BYTES literal -> CSV(binaryformat hex),
    with and without PUSHKEY."""
    out = run_script(spark, r"""
        BYTES("line1\nline2\n\nline4", separator("\n"))
        PUSHKEY('test')
        CSV( heading(true), binaryformat("hex") )
    """)
    assert out_lines(out) == ["ROWNUM,BYTES", "1,0x6c696e6531",
                                "2,0x6c696e6532", "3,", "4,0x6c696e6534"]
    out2 = run_script(spark, r"""
        BYTES("line1\nline2\n\nline4", separator("\n"))
        CSV( heading(true), binaryformat("hex") )
    """)
    assert out_lines(out2) == ["BYTES", "0x6c696e6531", "0x6c696e6532",
                                 "", "0x6c696e6534"]


@needs_goldens
@pytest.mark.parametrize("fname", ["iris.data", "iris.data.gz"])
def test_csv_file_untyped(spark, fname):
    """tql_test.go CSV_file / CSV_file_gz: fields stay strings, printed
    verbatim; gzip decompresses transparently."""
    out = run_script(spark, f"""
        CSV(file('/{fname}'))
        DROP(10)
        TAKE(2)
        CSV()
    """, fs_root=GOLDEN_DIR)
    assert [ln for ln in out_lines(out) if ln] == [
        "5.4,3.7,1.5,0.2,Iris-setosa",
        "4.8,3.4,1.6,0.2,Iris-setosa"]


@needs_goldens
def test_csv_file_charset_jp(spark):
    """tql_test.go CSV_charset_jp: EUC-JP decoding at the reader."""
    out = run_script(spark, """
        CSV(file("/euc-jp.csv"), charset("EUC-JP"))
        CSV()
    """, fs_root=GOLDEN_DIR)
    assert [ln for ln in out_lines(out) if ln] == [
        "利用されてきた文字コー,1701913182,3.141592"]


def test_query_builder_statement(spark, sf_dir):
    """QUERY('VALUE', from('events', 'purchase', 'TIME'), between(...)) —
    the value-first builder (tql_test.go QUERY_CSV shape on our substrate)."""
    from neo_server_spark.tql.script import TqlRunner

    src = """
QUERY('VALUE', from('events', 'purchase', "TIME"), between(1704412800000000000, 1704499200000000000))
CSV( precision(3), header(true) )
"""
    out = TqlRunner(spark, sf_dir=sf_dir).run(src)
    lines = out_lines(out)
    assert lines[0] == "TIME,VALUE"
    assert len(lines) > 1
    assert all(len(ln.split(",")) == 2 for ln in lines[1:])


def test_sql_select_explicit_time_column(spark, sf_dir):
    """SQL_SELECT('time', 'value', ...) — the reference's canonical column
    list names time explicitly; must not produce duplicate columns."""
    from neo_server_spark.tql.script import TqlRunner

    out = TqlRunner(spark, sf_dir=sf_dir).run("""
SQL_SELECT('time', 'value', from('events', 'purchase'), limit(3))
CSV(header(true))
""")
    lines = out_lines(out)
    assert lines[0] == "name,time,value"
    assert len(lines) == 4


def test_group_count_over_strings(spark):
    """count/first/last aggregate RAW record values — a string column must
    count records, not nulls-after-double-cast."""
    out = run_script(spark, """
        FAKE(json({
            ["a", "x"], ["a", "y"], ["b", "z"]
        }))
        GROUP(by(value(0), "k"), count(value(1), "cnt"),
              first(value(1), "fst"), last(value(1), "lst"))
        CSV(header(true))
    """)
    assert out_lines(out) == ["k,cnt,fst,lst", "a,2,x,y", "b,1,z,z"]


# ---------------------------------------------------------------------------
# presentation sinks in the text front-end (CHART/BOX/TEXT/HTML/GEOMAP) and
# db sinks (INSERT/APPEND) + WHEN — chart_test.go / fm_dbsink.go parity
# ---------------------------------------------------------------------------

REF_CHART_DIR = "/root/reference/mods/codec/internal/chart/test"


def test_chart_statement_testline_golden(spark):
    """chart_test.go TestLine: CHART(chartOption({...})) must emit the
    reference's envelope JSON and column-data JS asset (whitespace-trimmed
    line compare, exactly like the reference's StringsEq)."""
    import json as _json
    import os

    from neo_server_spark.tql.script import TqlRunner

    if not os.path.isdir(REF_CHART_DIR):
        pytest.skip("reference chart goldens not available")
    runner = TqlRunner(spark)
    out = runner.run("""
        FAKE(json({
            [1692670838086467000, 0.0],
            [1692670839086467000, 1.0],
            [1692670840086467000, 2.0]
        }))
        MAPVALUE(0, time(value(0)))
        CHART(
            chartID('WejMYXCGcYNL'),
            theme('white'),
            chartJSON(true),
            chartOption({
                "xAxis": { "type": "time", "data": column(0 ) },
                "yAxis": { "type": "value"},
                "series": [
                    { "type": "line", "data": column( 1) }
                ]
            })
        )
    """)
    with open(os.path.join(REF_CHART_DIR, "test_line.json")) as f:
        assert _json.loads(out) == _json.load(f)
    with open(os.path.join(REF_CHART_DIR, "test_line.js")) as f:
        want = [ln.strip() for ln in f.read().strip().splitlines()]
    got = [ln.strip() for ln in runner.chart_js.strip().splitlines()]
    assert got == want


def test_chart_statement_html_golden(spark):
    """chart_test.go TestLine html mode: without chartJSON(true) the sink
    emits the reference's HTML page (whitespace-trimmed line compare)."""
    import os

    from neo_server_spark.tql.script import TqlRunner

    if not os.path.isdir(REF_CHART_DIR):
        pytest.skip("reference chart goldens not available")
    out = TqlRunner(spark).run("""
        FAKE(json({ [1692670838086467000, 0.0] }))
        MAPVALUE(0, time(value(0)))
        CHART(
            chartID('WejMYXCGcYNL'),
            theme('white'),
            chartOption({ "series": [ { "type": "line", "data": column(1) } ] })
        )
    """)
    with open(os.path.join(REF_CHART_DIR, "test_line.html")) as f:
        want = [ln.strip() for ln in f.read().strip().splitlines() if ln.strip()]
    got = [ln.strip() for ln in out.strip().splitlines() if ln.strip()]
    assert got == want


def test_chart_statement_scatter_golden(spark):
    """chart_test.go TestScatter — same pipeline, scatter series type."""
    import json as _json
    import os

    from neo_server_spark.tql.script import TqlRunner

    if not os.path.isdir(REF_CHART_DIR):
        pytest.skip("reference chart goldens not available")
    runner = TqlRunner(spark)
    out = runner.run("""
        FAKE(json({
            [1692670838086467000, 0.0],
            [1692670839086467000, 1.0],
            [1692670840086467000, 2.0]
        }))
        MAPVALUE(0, time(value(0)))
        CHART(
            chartID('WejMYXCGcYNL'),
            theme('white'),
            chartJSON(true),
            chartOption({
                "xAxis": { "type": "time", "data": column(0) },
                "yAxis": { "type": "value"},
                "series": [
                    { "type": "scatter", "data": column(1) }
                ]
            })
        )
    """)
    with open(os.path.join(REF_CHART_DIR, "test_scatter.json")) as f:
        assert _json.loads(out) == _json.load(f)


def test_box_text_html_sinks(spark):
    out = run_script(spark, """
        FAKE(json({ ["temp", 12.3], ["hum", 55.5] }))
        BOX()
    """)
    assert "COLUMN0" in out.upper() and "temp" in out and "│" in out
    out = run_script(spark, """
        FAKE(json({ ["temp", 12.3] }))
        TEXT()
    """)
    assert out_lines(out)[0] == "temp\t12.3"
    out = run_script(spark, """
        FAKE(json({ ["temp", 12.3] }))
        HTML()
    """)
    assert "<table" in out and "temp" in out


def test_insert_append_roundtrip(spark, tmp_path):
    """fm_dbsink.go: INSERT names columns, APPEND bulk-appends; both land
    in the tag-table layout and read back through the ranged scan."""
    from neo_server_spark import io as nio
    from neo_server_spark.tql.script import TqlRunner

    out = TqlRunner(spark, fs_root=str(tmp_path)).run("""
        FAKE(json({
            ["pump-a", 1692670838000000000, 1.5],
            ["pump-b", 1692670839000000000, 2.5]
        }))
        INSERT("name", "time", "value", table('example'))
    """)
    import json as _json
    assert _json.loads(out)["data"]["message"] == "2 rows inserted."
    back = nio.read_tag_table(spark, str(tmp_path / "example"))
    got = {(r["name"], r["time"], r["value"]) for r in back.collect()}
    assert got == {("pump-a", 1692670838000000000, 1.5),
                   ("pump-b", 1692670839000000000, 2.5)}

    out = TqlRunner(spark, fs_root=str(tmp_path)).run("""
        FAKE(json({
            ["pump-c", 1692670840000000000, 3.5]
        }))
        MAPVALUE(0, value(0), "name")
        MAPVALUE(1, value(1), "time")
        MAPVALUE(2, value(2), "value")
        APPEND(table('example'))
    """)
    import json as _json
    assert (_json.loads(out)["data"]["message"]
            == "append 1 row (success 1, fail 0)")
    assert nio.read_tag_table(spark, str(tmp_path / "example")).count() == 3


REF_SERVER_TQL = "/root/reference/mods/server/test"


def test_server_csv_map_tql_verbatim(spark):
    """http_test.go csv_map.tql golden: payload rows map value(1)+\"0\"
    (string concat) and re-emit as CSV — run the reference's FILE."""
    import os

    from neo_server_spark.tql.script import run_file

    path = os.path.join(REF_SERVER_TQL, "csv_map.tql")
    if not os.path.isfile(path):
        pytest.skip("reference server tql not available")
    out = run_file(spark, path, payload="a,1\nb,2\n")
    assert out_lines(out) == ["a,10", "b,20"]


def test_server_csv_append_tql_verbatim(spark, tmp_path):
    """mqtt_test.go csv_append.tql golden: payload decodes (name,
    parseTime ns, parseFloat) and APPENDs into table 'example' — run the
    reference's FILE, then read the landed rows back."""
    import os

    from neo_server_spark.tql.script import run_file

    path = os.path.join(REF_SERVER_TQL, "csv_append.tql")
    if not os.path.isfile(path):
        pytest.skip("reference server tql not available")
    payload = ("my-mqtt-tql,1705291859000000000,1.2345\n"
               "my-mqtt-tql,1705291860000000000,2.3456")
    out = run_file(spark, path, payload=payload, fs_root=str(tmp_path))
    import json as _json
    assert (_json.loads(out)["data"]["message"]
            == "append 2 rows (success 2, fail 0)")
    back = spark.read.parquet(str(tmp_path / "example"))
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [("my-mqtt-tql", 1705291859000000000, 1.2345),
                    ("my-mqtt-tql", 1705291860000000000, 2.3456)]


def test_args_statement(spark):
    """fm_context.go ARGS(): the invocation args become one record."""
    from neo_server_spark.tql.script import TqlRunner

    out = TqlRunner(spark, arg_values=["hello", 42]).run("""
        ARGS()
        CSV()
    """)
    assert out_lines(out) == ["hello,42"]
    out = TqlRunner(spark).run("""
        ARGS()
        CSV()
    """)
    assert out.strip() == ""


def test_map_distance_statement(spark):
    """fm_monad.go:2109 MAP_DISTANCE(idx, latLon(lat,lon)): haversine from
    the previous record, first record 0 — Seoul->Busan golden distance
    (TestGeoDistance, mods/nums geography)."""
    out = run_script(spark, """
        FAKE(json({
            [37.5665, 126.9780],
            [35.1796, 129.0756]
        }))
        MAP_DISTANCE(2, latLon(value(0), value(1)), "dist")
        CSV(header(true), precision(0))
    """)
    lines = out_lines(out)
    assert lines[0] == "column0,column1,dist"
    assert lines[1].endswith(",0")
    dist = float(lines[2].split(",")[2])
    assert abs(dist - 325_075) < 1000  # great-circle Seoul-Busan ~325 km


def test_http_statement(spark, stub_server=None):
    """fm_encoder.go HTTP(dsl): raw response becomes one record."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"pong:" + self.path.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        out = run_script(spark, f"""
            HTTP('GET http://127.0.0.1:{port}/ping
                  ?x=1
                  Accept: text/plain')
            CSV()
        """)
        assert "HTTP/1.1 200" in out
        assert "pong:/ping?x=1" in out
    finally:
        srv.shutdown()


def test_when_do_subroutine(spark, tmp_path):
    """fm_monad.go:2310-2383 WHEN(cond, do(args..., {code})): a nested TQL
    task runs per matching record with ARGS() reading the evaluated args;
    the main stream passes through unchanged."""
    from neo_server_spark.tql.script import TqlRunner

    out = TqlRunner(spark, fs_root=str(tmp_path)).run("""
        FAKE( linspace(1, 4, 4) )
        WHEN( value(0) > 2.5, do(value(0), value(0) * 10, {
            ARGS()
            INSERT("v", "v10", table('hits'))
        }))
        CSV()
    """)
    assert out_lines(out) == ["1", "2", "3", "4"]
    hits = spark.read.parquet(str(tmp_path / "hits"))
    got = sorted(tuple(r) for r in hits.collect())
    assert got == [(3.0, 30.0), (4.0, 40.0)]


def test_when_dolog_statement(spark, caplog):
    """fm_monad.go fmWhen + LogDoer: doer fires per matching record, the
    stream passes through unchanged."""
    import logging

    with caplog.at_level(logging.INFO, logger="neo_server_spark.tql.when"):
        out = run_script(spark, """
            FAKE( linspace(1, 4, 4) )
            WHEN( value(0) > 2.5, doLog("high:", value(0)) )
            CSV()
        """)
    assert out_lines(out) == ["1", "2", "3", "4"]
    msgs = [r.message for r in caplog.records]
    assert msgs == ["high: 3", "high: 4"]


# ---------------------------------------------------------------------------
# tql_test.go TestScript — SCRIPT() statement goldens (fm_script.go), run on
# the jslite interpreter
# ---------------------------------------------------------------------------

def test_script_src(spark):
    """tql_test.go script_src: SRC-position SCRIPT, for loop + $.yieldKey."""
    out = run_script(spark, """
        SCRIPT({
            for (i = 0; i < 10; i++) {
                $.yieldKey("test", i, i*10)
            }
        })
        CSV()
    """)
    assert out_lines(out) == [
        "0,0", "1,10", "2,20", "3,30", "4,40",
        "5,50", "6,60", "7,70", "8,80", "9,90"]


def test_script_src_map(spark):
    """tql_test.go script_src_map: SCRIPT chained into SCRIPT, comments,
    $.values access, multi-value yield."""
    out = run_script(spark, """
        SCRIPT({
            a = 10*2+1
            // comment

            $.yield(a)
        })
        SCRIPT({
            a = $.values[0];
            $.yield(a+1, 2, 3, 4)
        })
        CSV()
    """)
    assert out_lines(out) == ["22,2,3,4"]


def test_script_map_params_key(spark):
    """tql_test.go script_2: MAP-position SCRIPT sees $.key (MAPKEY) and
    $.params; undefined params read as JS undefined."""
    out = run_script(spark, """
        FAKE( linspace(1,2,2))
        MAPKEY("hello")
        SCRIPT("js", {
            c = 0;
            if ($.params.temp !== undefined) {
                c = $.params.temp;
            }
            $.yield($.key, $.values[0], c)
        })
        MAPVALUE(0, value(0), "key")
        MAPVALUE(1, value(1), "value")
        MAPVALUE(2, value(2), "parameter")
        CSV(header(true))
    """)
    assert out_lines(out) == ["key,value,parameter", "hello,1,0", "hello,2,0"]


def test_script_finalize(spark):
    """tql_test.go js-finalize: function declarations persist across
    records in one VM; finalize() fires after the last record."""
    out = run_script(spark, """
        FAKE( linspace(1,3,3))
        SCRIPT("js", {
            function finalize(){ $.yieldKey("last", 1.234); }
            function square(x) { return x * x };
            $.yield(square($.values[0]));
        })
        CSV(header(false))
    """)
    assert out_lines(out) == ["1", "4", "9", "1.234"]


def test_script_console_log_discard(spark):
    """tql_test.go js-console-log: log-only script, DISCARD emits nothing."""
    out = run_script(spark, """
        SCRIPT("js", "console.log('Hello, World!')")
        DISCARD()
    """)
    assert out == ""


def test_script_date_timeformat(spark):
    """tql_test.go js-timeformat / js-timeformat-parse: parseInt, new Date,
    toISOString, Date.parse — epoch arithmetic matches goja."""
    out = run_script(spark, """
        STRING(param("format_time") ?? "808210800", separator('\\n'))
        SCRIPT("js", {
            epoch = parseInt($.values[0])
            time = new Date(epoch * 1000)
            $.yield(epoch, time.toISOString())
        })
        CSV()
    """)
    assert out_lines(out) == ["808210800,1995-08-12T07:00:00.000Z"]
    out = run_script(spark, """
        STRING(param("timestamp") ?? "1995-08-12T00:00:00.000Z", separator('\\n'))
        SCRIPT("js", {
            ts = new Date( Date.parse($.values[0]) );
            epoch = ts / 1000;
            $.yield(epoch, ts.toISOString());
        })
        CSV()
    """)
    assert out_lines(out) == ["808185600,1995-08-12T00:00:00.000Z"]


def test_script_yield_array(spark):
    """tql_test.go js-yieldArray-string/-number: $.yieldArray with String
    split and Array.map(parseFloat)."""
    out = run_script(spark, """
        STRING('1,2,3,4,5', separator('\\n'))
        SCRIPT("js", {
            $.yieldArray($.values[0].split(','))
        })
        CSV()
    """)
    assert out_lines(out) == ["1,2,3,4,5"]
    out = run_script(spark, """
        STRING('1.2,2.3,3.4,5.6', separator('\\n'))
        SCRIPT("js", {
            $.yieldArray($.values[0].split(',').map(function(v){ return parseFloat(v) }))
        })
        CSV()
    """)
    assert out_lines(out) == ["1.2,2.3,3.4,5.6"]


def test_script_request_csv_json(spark):
    """tql_test.go js-request-csv / js-request-json: $.request(url,
    {method}).do(rsp => rsp.csv/json per-record callbacks), with
    encodeURIComponent in the URL expression."""
    import http.server
    import json as _json
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/csv"):
                body = b"tag1,1692686707000,0.1\ntag1,1692686708000,0.2\n"
                ctype = "text/csv"
            else:
                body = _json.dumps({"data": {"rows": [
                    ["tag1", 1692686707000000000, 0.1],
                    ["tag1", 1692686708000000000, 0.2]]}}).encode()
                ctype = "application/json"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        out = run_script(spark, """
            SCRIPT("js", {
                $.request("http://127.0.0.1:%d/csv?q=" + encodeURIComponent("a b"),
                          {method: 'GET'})
                    .do(function(rsp) {
                        rsp.csv(function(r){
                            $.yield(r[0], parseInt(r[1]), parseFloat(r[2]));
                        })
                    })
            })
            CSV()
        """ % port)
        assert out_lines(out) == ["tag1,1692686707000,0.1",
                                    "tag1,1692686708000,0.2"]
        out = run_script(spark, """
            SCRIPT("js", {
                $.request("http://127.0.0.1:%d/json", {method: 'GET'})
                    .do(function(rsp) {
                        rsp.text(function(body){
                            obj = JSON.parse(body);
                            obj.data.rows.forEach(function(r){
                                $.yield(r[0], r[1]/1000000000, r[2]);
                            })
                        })
                    })
            })
            CSV()
        """ % port)
        assert out_lines(out) == ["tag1,1692686707,0.1",
                                    "tag1,1692686708,0.2"]
    finally:
        srv.shutdown()


def test_script_db_query(spark, sf_dir):
    """fm_script.go select-value goldens: $.db().query(sql).forEach(fn) and
    .yield() route through the engine's SQL surface; .yield() uppercases
    the query's columns into $.result like the reference."""
    from neo_server_spark.tql.script import TqlRunner

    q = ("select event_type, count(*) as cnt from events "
         "group by event_type order by event_type")
    out = TqlRunner(spark, sf_dir=sf_dir).run("""
        SCRIPT("js", {
            $.db().query("%s").forEach(function(row) {
                $.yield(row[0], row[1]);
            });
        })
        CSV()
    """ % q)
    out2 = TqlRunner(spark, sf_dir=sf_dir).run("""
        SCRIPT("js", {
            $.db().query("%s").yield();
        })
        CSV(header(true))
    """ % q)
    assert out_lines(out2)[0] == "EVENT_TYPE,CNT"
    assert out_lines(out) == out_lines(out2)[1:]
    # exec has no raw-DML path — the INSERT/APPEND statements are the surface
    import pytest as _pytest
    with _pytest.raises(Exception):
        TqlRunner(spark, sf_dir=sf_dir).run("""
            SCRIPT("js", { $.db().exec("delete from events"); })
            CSV()
        """)


def test_shell_statement(spark):
    """tql_test.go SHELL_shell-command: stdout lines become records; the
    comma-bearing line gets CSV-quoted.  SHELL() is opt-in (allow_shell)
    and never goes through a system shell."""
    src = """
        FAKE( once(1) )
        SHELL("echo 'Hello, World!'; echo 123;")
        CSV()
    """
    out = run_script(spark, src, allow_shell=True)
    assert out_lines(out)[:2] == ['"Hello, World!"', "123"]
    # disabled by default: untrusted scripts must not exec host commands
    import pytest as _pytest
    with _pytest.raises(PermissionError):
        run_script(spark, src)


def test_shell_statement_no_shell_interpretation(spark):
    """Metacharacters are inert text (argv exec, no /bin/sh): $(...) must
    NOT be substituted, and blocklisted sub-commands are refused
    (fm_shell.go:94)."""
    out = run_script(spark, """
        FAKE( once(1) )
        SHELL("echo '$(id)'")
        CSV()
    """, allow_shell=True)
    assert out_lines(out)[0] == "$(id)"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not supported"):
        run_script(spark, """
            FAKE( once(1) )
            SHELL("shutdown now")
            CSV()
        """, allow_shell=True)


def test_ndjson_timeformat_default(spark):
    """tql_test.go SQL_NDJSON shape: NDJSON(timeformat('default'), tz('UTC'))
    renders time values as '2023-08-22 06:45:07.38' (trimmed ms fraction);
    the time tag follows the column through PUSHVALUE/POPVALUE shifts."""
    out = run_script(spark, """
        FAKE(json({
            [1692686707380411000, 0.1],
            [1692686708380411000, 0.2]
        }))
        MAPVALUE(0, time(value(0)), "TIME")
        MAPVALUE(1, value(1), "VALUE")
        NDJSON( timeformat('default'), tz('UTC') )
    """)
    assert out_lines(out) == [
        '{"TIME":"2023-08-22 06:45:07.38","VALUE":0.1}',
        '{"TIME":"2023-08-22 06:45:08.38","VALUE":0.2}']


@pytest.mark.parametrize("script,msg", [
    ("FAKE( arrange(10, 30, 0) )\nCSV()", 'step can not be 0'),
    ("FAKE( arrange(10, 10, 10) )\nCSV()", 'start, stop can not be equal'),
    ("FAKE( arrange(10, 30, -10) )\nCSV()", 'step can not be less than 0'),
    ("FAKE( arrange(30, 10, 10) )\nCSV()", 'step can not be greater than 0'),
    ("FAKE( 123 )\nCSV()", "should be fakeSource"),
])
def test_fake_argument_errors(spark, script, msg):
    """tql_test.go FAKE_arrange_*/invalid_generator: the reference's
    argument-validation error messages, verbatim."""
    with pytest.raises((ValueError, TypeError), match=msg):
        run_script(spark, script)


@needs_goldens
def test_oscillator_script_golden(spark):
    """tql_test.go FAKE_oscillator_1Hz_2Hz_3Hz, verbatim: 1000 samples of a
    3-tone sum vs the reference CSV at precision(6) — sin() agrees
    byte-for-byte between the JVM and Go libm here."""
    out = run_script(spark, """
        FAKE( 
            oscillator(
                range(timeAdd(1685714509*1000000000,'1s'), '1s', '1ms'), 
                freq(1, 1.0), freq(2, 2.0), freq(3, 3.0)))
        PUSHKEY('test')
        CSV( header(true), precision(6) )
    """)
    assert out.rstrip("\n") == golden("oscillator_1Hz_2Hz_3Hz.csv").rstrip("\n")


def test_csv_payload_timeformat_precision(spark):
    """tql_test.go:1003-1027 CSV(payload(), field(timeType/floatType/
    boolType)) -> CSV(timeformat('s'), precision(2)), verbatim."""
    payload = "\n".join([
        "1700256261,dry,1,true",
        "1700256262,dry,2,false",
        "1700256262,wet,2,TRUE",
        "1700256263,dry,3,False",
        "1700256264,dry,4,1",
        "1700256264,wet,5,0",
        "",
    ])
    out = run_script(spark, """
        CSV(payload(), field(0, timeType("s"), "time"), field(2, floatType(), "value"), field(3, boolType(),"flag") )
        CSV(timeformat("s"), heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "time,column1,value,flag",
        "1700256261,dry,1.00,true",
        "1700256262,dry,2.00,false",
        "1700256262,wet,2.00,true",
        "1700256263,dry,3.00,false",
        "1700256264,dry,4.00,true",
        "1700256264,wet,5.00,false",
    ]


def test_markdown_template(spark):
    """tql_test.go:1056-1084 CSV(payload) -> MARKDOWN({go template}) with
    IsFirst/IsLast guards and .Value accessors (reference ExpectFunc
    Contains assertions, verbatim)."""
    payload = "\n".join([
        "NAME,TIME,VALUE,BOOL",
        "wave.sin,1676432361,0.000000,true",
        "wave.cos,1676432361,1.0000000,false",
        "wave.sin,1676432362,0.406736,true",
        "wave.cos,1676432362,0.913546,false",
        "wave.sin,1676432363,0.743144,true",
    ]) + "\n"
    out = run_script(spark, """
        CSV(payload(), header(false))
        MAPVALUE(2, value(2) != "VALUE" ? parseFloat(value(2))*10 : value(2))
        MARKDOWN({
{{ if .IsFirst }}## demo
{{ end }}{{ .Value 0 }},{{ .Value 2 }}
{{ if .IsLast }}--------
{{ end }}
        })
    """, payload=payload)
    for frag in ["## demo", "NAME,VALUE", "wave.sin,0", "wave.cos,10",
                 "wave.sin,4.067", "wave.cos,9.135", "--------"]:
        assert frag in out, frag


# ---------------------------------------------------------------------------
# task_test.go TestTimeWindow: the full aggregate battery incl. interpolators,
# scripts + expected CSV verbatim
# ---------------------------------------------------------------------------

TW_PAYLOAD = "\n".join([
    "1700256261,1", "1700256262,2", "1700256263,3", "1700256264,4",
    "1700256265,5", "1700256266,6", "1700256267,7", "1700256268,8",
    "1700256269,9", "1700256276,10",
])

TW_EXPECT = {
    "avg":    ["0.00", "0.00", "2.50", "7.00", "0.00", "10.00", "0.00"],
    "mean":   ["0.00", "0.00", "2.50", "7.00", "0.00", "10.00", "0.00"],
    "median": ["0.00", "0.00", "2.00", "7.00", "0.00", "10.00", "0.00"],
    "median-interpolated":
              ["0.00", "0.00", "2.00", "6.50", "0.00", "10.00", "0.00"],
    "stddev": ["0.00", "0.00", "1.29", "1.58", "0.00", "0.00", "0.00"],
    "stderr": ["0.00", "0.00", "0.65", "0.71", "0.00", "0.00", "0.00"],
    "entropy": ["0.00", "0.00", "-10.23", "-68.83", "0.00", "-23.03", "0.00"],
    "sum":    ["0.00", "0.00", "10.00", "35.00", "0.00", "10.00", "0.00"],
    "first":  ["0.00", "0.00", "1.00", "5.00", "0.00", "10.00", "0.00"],
    "min":    ["0.00", "0.00", "1.00", "5.00", "0.00", "10.00", "0.00"],
    "last":   ["0.00", "0.00", "4.00", "9.00", "0.00", "10.00", "0.00"],
    "max":    ["0.00", "0.00", "4.00", "9.00", "0.00", "10.00", "0.00"],
    "rss":    ["0.00", "0.00", "5.48", "15.97", "0.00", "10.00", "0.00"],
    "rms":    ["0.00", "0.00", "2.74", "7.14", "0.00", "10.00", "0.00"],
    "rss:LinearRegression":
              ["7.60", "8.46", "5.48", "15.97", "11.06", "10.00", "12.79"],
    "rss:PiecewiseConstant":
              ["5.48", "5.48", "5.48", "15.97", "10.00", "10.00", "10.00"],
    "rss:PiecewiseLinear":
              ["5.48", "5.48", "5.48", "15.97", "12.98", "10.00", "10.00"],
}

TW_TIMES = ["1700256250", "1700256255", "1700256260", "1700256265",
            "1700256270", "1700256275", "1700256280"]


@pytest.mark.parametrize("agg", sorted(TW_EXPECT), ids=sorted(TW_EXPECT))
def test_timewindow_battery(spark, agg):
    """task_test.go:2185-2415 TIMEWINDOW battery — 17 aggregate variants
    incl. the three gap interpolators, expected CSV verbatim."""
    script = f"""
        CSV(payload(),
            field(0, datetimeType("s"), "time"),
            field(1, doubleType(), "value"))
        TIMEWINDOW(
            time(1700256250 * 1000000000),
            time(1700256285 * 1000000000),
            period('5s'),
            nullValue(0),
            'time', '{agg}')
        CSV(timeformat("s"), heading(true), precision(2))
    """
    out = run_script(spark, script, payload=TW_PAYLOAD)
    want = ["time,value"] + [f"{t},{v}" for t, v in zip(TW_TIMES, TW_EXPECT[agg])]
    assert out_lines(out) == want


def test_timewindow_mixed_interpolators(spark):
    """Regression: two DIFFERENT ':Interpolator' colspecs in one
    TIMEWINDOW must each apply to their own column (a shared fill-mode
    variable used to let the last-seen interpolator win for every column).
    Expected values are the single-column battery rows for each mode."""
    payload = "\n".join(
        ln + "," + ln.split(",")[1] for ln in TW_PAYLOAD.splitlines())
    out = run_script(spark, """
        CSV(payload(),
            field(0, datetimeType("s"), "time"),
            field(1, doubleType(), "pwc"),
            field(2, doubleType(), "pwl"))
        TIMEWINDOW(
            time(1700256250 * 1000000000),
            time(1700256285 * 1000000000),
            period('5s'),
            'time', 'rss:PiecewiseConstant', 'rss:PiecewiseLinear')
        CSV(timeformat("s"), heading(true), precision(2))
    """, payload=payload)
    want = ["time,pwc,pwl"] + [
        f"{t},{a},{b}" for t, a, b in zip(
            TW_TIMES, TW_EXPECT["rss:PiecewiseConstant"],
            TW_EXPECT["rss:PiecewiseLinear"])]
    assert out_lines(out) == want


def test_group_timewindow(spark):
    """task_test.go:2162-2181 GROUP(by(t, timewindow(...)), avg, sum, last):
    gap buckets NULL, records outside [from,until) dropped — verbatim."""
    script = """
        CSV(payload(), field(0, datetimeType("s"), "time"), field(1, doubleType(), "value"))
        GROUP( by( value(0), timewindow(
                     time(1700256262 * 1000000000),
                     time(1700256276 * 1000000000),
                     period("4s"))),
              avg(value(1)),
              sum(value(1)),
              last(value(1))
        )
        CSV(timeformat("s"), heading(true), precision(2))
    """
    # TestGroupByTimeWindow's own payload (task_test.go:2087-2102 — note the
    # gap at :65 and :70-75)
    payload = "\n".join([
        "1700256261,1", "1700256262,2", "1700256263,3", "1700256264,4",
        "1700256266,5", "1700256267,6", "1700256268,7", "1700256269,8",
        "1700256276,9",
    ])
    out = run_script(spark, script, payload=payload)
    assert out_lines(out) == [
        "GROUP,AVG,SUM,LAST",
        "1700256264,5.00,15.00,6.00",
        "1700256268,7.50,15.00,8.00",
        "1700256272,NULL,NULL,NULL",
    ]


def test_group_timewindow_per_agg_predict(spark):
    """task_test.go:2104-2135: per-aggregate nullValue()/predict() fills —
    the filler fits progressively, so gap predictions see only preceding
    buckets (leading gaps NULL / nullValue; linearregression is an expanding
    regression; akimaspline clamps to the last fitted value) — verbatim."""
    payload = "\n".join([
        "1700256261,1", "1700256262,2", "1700256263,3", "1700256264,4",
        "1700256266,5", "1700256267,6", "1700256268,7", "1700256269,8",
        "1700256276,9",
    ])
    out = run_script(spark, """
        CSV(payload(), field(0, datetimeType("s"), "time"), field(1, doubleType(), "value"))
        GROUP( by( value(0), timewindow(
                   time(1700256255 * 1000000000),
                   time(1700256282 * 1000000000),
                   period("2s"))),
              avg(value(1)),
              last(value(1), nullValue(0)),
              last(value(1), predict("linearregression"), "PREDICT"),
              last(value(1), predict("akimaspline"), nullValue(100), "PREDICT")
         )
        CSV(timeformat("s"), heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,AVG,LAST,PREDICT,PREDICT",
        "1700256256,NULL,0.00,NULL,100.00",
        "1700256258,NULL,0.00,NULL,100.00",
        "1700256260,1.00,1.00,1.00,1.00",
        "1700256262,2.50,3.00,3.00,3.00",
        "1700256264,4.00,4.00,4.00,4.00",
        "1700256266,5.50,6.00,6.00,6.00",
        "1700256268,7.50,8.00,8.00,8.00",
        "1700256270,NULL,0.00,9.50,8.00",
        "1700256272,NULL,0.00,11.20,8.00",
        "1700256274,NULL,0.00,12.90,8.00",
        "1700256276,9.00,9.00,9.00,9.00",
        "1700256278,NULL,0.00,11.17,9.00",
        "1700256280,NULL,0.00,12.17,9.00",
    ]


def test_datetime_type_ns_precision(spark):
    """Regression: epoch-ns text must survive bit-exact through
    datetimeType('ns') — the old double round-trip corrupted >2^53 epochs
    by up to ~256 ns.  Fractional sub-second 's' inputs still take the
    double path (the fraction carries information there)."""
    out = run_script(spark, """
        CSV(payload(), field(0, datetimeType("ns"), "time"), field(1, doubleType(), "value"))
        CSV(timeformat("ns"))
    """, payload="1692686707380411001,0.1\n1692686707380411002,0.2")
    assert out_lines(out) == ["1692686707380411001,0.1",
                                "1692686707380411002,0.2"]
    out2 = run_script(spark, """
        CSV(payload(), field(0, datetimeType("s"), "time"), field(1, doubleType(), "value"))
        CSV(timeformat("ns"))
    """, payload="1700256261.5,1")
    assert out_lines(out2) == ["1700256261500000000,1"]


def test_group_timewindow_fill_after_quantile(spark):
    """Regression: a quantile-family aggregate BEFORE a filled aggregate
    must not shift the fill onto the wrong __o column (agg_fills used to be
    appended twice for quantile/cdf/moment, so the nullValue(0) below
    targeted a nonexistent column and raised AnalysisException)."""
    payload = "\n".join(["1700256261,1", "1700256263,3", "1700256269,9"])
    out = run_script(spark, """
        CSV(payload(), field(0, datetimeType("s"), "time"), field(1, doubleType(), "value"))
        GROUP( by( value(0), timewindow(
                   time(1700256260 * 1000000000),
                   time(1700256270 * 1000000000),
                   period("2s"))),
              quantile(value(1), 0.5),
              last(value(1), nullValue(0), "LAST")
         )
        CSV(timeformat("s"), heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,QUANTILE,LAST",
        "1700256260,1.00,1.00",
        "1700256262,3.00,3.00",
        "1700256264,NULL,0.00",
        "1700256266,NULL,0.00",
        "1700256268,9.00,9.00",
    ]


def test_review_findings_script_statements(spark, sf_dir, tmp_path):
    """Round-4 review regressions: all-null yield columns, db() '?'
    substitution, parseTime float fractions, SHELL quoted semicolons."""
    from neo_server_spark.tql.script import TqlRunner
    # all-null yielded column must not break schema inference
    out = run_script(spark, """
        FAKE( once(1) )
        SCRIPT("js", { $.yield($.values[0], null) })
        CSV()
    """)
    assert out_lines(out) == ["1,NULL"]
    # '?' inside a substituted string literal must not eat later params
    out = TqlRunner(spark, sf_dir=sf_dir).run("""
        SCRIPT("js", {
            $.db().query(
                "select count(*) as c from events where event_type != ? and user_id >= ?",
                "x?y", 0).forEach(function(r){ $.yield(r[0]); });
        })
        CSV()
    """)
    n_events = run_script(spark, """
        SQL('select count(*) as c from events')
        CSV()
    """, params=None) if False else None
    assert int(out.strip()) > 0
    # parseTime float keeps the fraction
    out = run_script(spark, """
        FAKE( once(1) )
        MAPVALUE(0, parseTime(1.5, "s"))
        CSV(timeformat("ns"))
    """)
    assert out_lines(out) == ["1500000000"]
    # quoted semicolon stays inside its argument
    out = run_script(spark, """
        FAKE( once(1) )
        SHELL("echo 'a;b'")
        CSV()
    """, allow_shell=True)
    assert out_lines(out) == ["a;b"]


def test_round5_advice_fixes(spark, sf_dir):
    """Round-5 review regressions: URL scheme restriction, backslash-safe
    db() param substitution, ns-exact JSDate epochs, jslite negative index
    writes, and the host-object attribute allowlist."""
    from neo_server_spark.tql.script import (_script_col_type,
                                             _split_sql_placeholders,
                                             TqlRunner)
    from neo_server_spark.tql.jslite import JSDate

    # $.request() rejects non-http(s) schemes outright (the reference's Go
    # http client is http/https-only; urllib would read local files)
    with pytest.raises(Exception, match="scheme"):
        run_script(spark, """
            FAKE( once(1) )
            SCRIPT("js", {
                $.request("file:///etc/passwd").do(function(r){});
                $.yield(1);
            })
            CSV()
        """)
    # ...and stmt_HTTP does too
    with pytest.raises(Exception, match="scheme"):
        run_script(spark, """
            FAKE( once(1) )
            HTTP({
                GET file:///etc/passwd
            })
            CSV()
        """)

    # placeholder split skips string literals; backslash-final params
    # cannot swallow the remainder of the query into the literal
    assert _split_sql_placeholders("a=? and b='?' and c=?") == \
        ["a=", " and b='?' and c=", ""]
    assert _split_sql_placeholders(r"x='it''s ?\' ok' and y=?") == \
        [r"x='it''s ?\' ok' and y=", ""]
    out = TqlRunner(spark, sf_dir=sf_dir).run(r"""
        SCRIPT("js", {
            $.db().query(
                "select count(*) as c from events where event_type != ? and user_id >= ?",
                "trailing\\", 0).forEach(function(r){ $.yield(r[0]); });
        })
        CSV()
    """)
    assert int(out.strip()) > 0

    # JSDate -> epoch-ns uses integer field math (float ms*1e6 corrupts
    # modern epochs by up to ~256 ns above 2^53)
    conv, typ, is_time = _script_col_type([JSDate(1787200496123.0)])
    assert (typ, is_time) == ("long", True)
    assert conv(JSDate(1787200496123.0)) == 1787200496123 * 10**6

    # negative index assignment leaves the array untouched (JS sets a
    # '-1' property; Python semantics would overwrite the last element)
    out = run_script(spark, """
        FAKE( once(1) )
        SCRIPT("js", {
            var a = [1, 2, 3];
            a[-1] = 99;
            $.yield(a[0], a[1], a[2]);
        })
        CSV()
    """)
    assert out_lines(out) == ["1,2,3"]

    # function values expose no interpreter internals
    out = run_script(spark, """
        FAKE( once(1) )
        SCRIPT("js", {
            function f(x) { return x; }
            $.yield(f.interp === undefined, f.env === undefined,
                    f._interp === undefined);
        })
        CSV()
    """)
    assert out_lines(out) == ["true,true,true"]


def test_round5_scalar_registry(spark):
    """The round-5 SCALARS completion: trig/hyperbolic, log2/exp2/pow10,
    trunc/mod/remainder, strIndex/strLastIndex, regexp/glob, strTime, tz,
    timeUnix* and the timeYear..timeWeekDay extractors, reachable from .tql
    text (reference registry fx_definitions.go:79-105, fm_time.go:54-394)."""
    out = run_script(spark, """
        FAKE( once(1) )
        MAPVALUE(0, parseTime(1700000000, "s"))
        MAPVALUE(1, timeYear(value(0)))
        MAPVALUE(2, timeMonth(value(0)))
        MAPVALUE(3, timeDay(value(0)))
        MAPVALUE(4, timeHour(value(0)))
        MAPVALUE(5, timeMinute(value(0)))
        MAPVALUE(6, timeSecond(value(0)))
        MAPVALUE(7, timeISOYear(value(0)))
        MAPVALUE(8, timeISOWeek(value(0)))
        MAPVALUE(9, timeYearDay(value(0)))
        MAPVALUE(10, timeWeekDay(value(0)))
        MAPVALUE(11, timeUnix(value(0)))
        MAPVALUE(12, timeUnixMilli(value(0)))
        MAPVALUE(13, timeUnixMicro(value(0)))
        MAPVALUE(14, timeUnixNano(value(0)))
        MAPVALUE(15, timeHour(value(0), tz('Asia/Seoul')))
        MAPVALUE(16, strTime(value(0), 'RFC3339'))
        POPVALUE(0)
        CSV()
    """)
    # 2023-11-14 22:13:20 UTC, a Tuesday (Go Weekday 2), ISO week 46
    assert out_lines(out) == [
        "2023,11,14,22,13,20,2023,46,318,2,"
        "1700000000,1700000000000,1700000000000000,1700000000000000000,"
        "7,2023-11-14T22:13:20Z"]
    out = run_script(spark, """
        FAKE( linspace(0.5, 0.5, 1) )
        MAPVALUE(1, round(asin(value(0)) * 6, 10))
        MAPVALUE(2, round(acos(value(0)) * 3, 10))
        MAPVALUE(3, round(atan(1) * 4, 10))
        MAPVALUE(4, round(cosh(0), 10))
        MAPVALUE(5, round(tanh(0), 10))
        MAPVALUE(6, round(asinh(0), 10))
        MAPVALUE(7, round(atanh(0), 10))
        MAPVALUE(8, log2(8))
        MAPVALUE(9, exp2(10))
        MAPVALUE(10, pow10(3))
        MAPVALUE(11, trunc(-2.7))
        MAPVALUE(12, mod(-7, 3))
        MAPVALUE(13, remainder(7, 4))
        MAPVALUE(14, strIndex('banana', 'an'))
        MAPVALUE(15, strLastIndex('banana', 'an'))
        MAPVALUE(16, regexp('^ba', 'banana'))
        MAPVALUE(17, glob('ba*na', 'banana'))
        POPVALUE(0)
        CSV()
    """)
    # asin(.5)*6 = π = acos(.5)*3 = atan(1)*4; Go math.Mod(-7,3) = -1;
    # IEEE remainder(7,4) = -1; strIndex/strLastIndex are byte indexes
    pi = "3.141593"  # CSV default precision
    assert out_lines(out) == [
        f"{pi},{pi},{pi},1,0,0,0,3,1024,1000,-2,-1,-1,1,3,true,true"]


def test_script_stateless_fast_path(spark):
    """Statically-stateless SCRIPT blocks distribute via mapInPandas —
    byte-identical to the serial VM, with no driver record loop in the
    plan; stateful blocks (VM-global writes, finalize) stay serial."""
    from neo_server_spark.tql.jslite import Interpreter, analyze_stateless
    from neo_server_spark.tql.script import TqlRunner

    script = """
        FAKE( linspace(0, 999, 1000) )
        SCRIPT("js", {
            var v = $.values[0];
            if (v % 3 == 0) { $.yield(v, v * 2, "x" + v); }
        })
        CSV()
    """
    fast = TqlRunner(spark, script_distribute=True).run(script)
    serial = TqlRunner(spark, script_distribute=False).run(script)
    assert fast == serial and len(out_lines(fast)) == 334

    # multi-yield + yieldKey keep emission order
    script2 = """
        FAKE( linspace(1, 300, 300) )
        SCRIPT("js", {
            $.yieldKey($.key * 10, $.values[0]);
            $.yield($.values[0] + 0.5);
        })
        CSV()
    """
    assert TqlRunner(spark, script_distribute=True).run(script2) == \
        TqlRunner(spark, script_distribute=False).run(script2)

    # the distributed plan runs the script in executors, not a driver loop
    df = TqlRunner(spark, script_distribute=True).run("""
        FAKE( linspace(0, 999, 1000) )
        SCRIPT("js", { $.yield($.values[0] * 2) })
    """)
    assert "MapInPandas" in df._jdf.queryExecution().executedPlan().toString()

    # stateful shapes are rejected by the static analyzer
    P = Interpreter.prepare
    assert not analyze_stateless(P("count = count + 1; $.yield(count)"))
    assert not analyze_stateless(P("$.x = 1; $.yield($.x)"))
    assert not analyze_stateless(P("function finalize() {} $.yield(1)"))
    assert not analyze_stateless(P("var d = $; d.yield(1)"))
    assert not analyze_stateless(P("console.log(1); $.yield(1)"))
    assert analyze_stateless(P("var c = 0; c += 1; $.yield(c)"))


def test_sql_bridge_statement(spark):
    """SQL(bridge('name'), 'select ...') (fm_dbsrc.go:338-357) resolves the
    named bridge from the registry.  The sqlite bridge EXECUTES on the
    native stdlib engine (r11 — tests/test_bridge.py covers the data
    paths); a forced-jdbc bridge is asserted up to the JVM's driver
    lookup since no driver jars ship in this container."""
    import pytest as _pytest

    from neo_server_spark.sources.bridge import default_registry
    from neo_server_spark.tql.script import TqlRunner

    with _pytest.raises(KeyError, match="undefined bridge"):
        TqlRunner(spark).run("""
            SQL(bridge('nope'), 'select 1')
            CSV()
        """)
    # native sqlite: the statement runs for real
    default_registry.register("sqlite_t", "sqlite", "jdbc:sqlite::memory:")
    try:
        out = TqlRunner(spark).run("""
            SQL(bridge('sqlite_t'), 'select 1 as one')
            CSV()
        """)
        assert out.strip().splitlines()[-1] == "1"
    finally:
        default_registry.unregister("sqlite_t")
    # forced-jdbc: reaches the JVM driver lookup and fails on the missing
    # org.sqlite class, not on parsing/registry
    default_registry.register("sqlite_j", "sqlite", "jdbc:sqlite::memory:",
                              engine="jdbc")
    try:
        with _pytest.raises(Exception) as ei:
            TqlRunner(spark).run("""
                SQL(bridge('sqlite_j'), 'select 1 as one')
                CSV()
            """)
        assert "sqlite" in str(ei.value).lower()
    finally:
        default_registry.unregister("sqlite_j")
    with _pytest.raises(ValueError, match="Empty SQL"):
        TqlRunner(spark).run("""
            SQL(bridge('nope2'), ';')
            CSV()
        """)


@pytest.mark.parametrize("script,want", [
    (
        """QUERY('value', between('last-10s', 'last'), from("table", "tag", "time"), dump(true))""",
        "SELECT time, value FROM TABLE WHERE name = 'tag' AND time BETWEEN "
        "(SELECT MAX_TIME-10000000000 FROM V$TABLE_STAT WHERE name = 'tag') "
        "AND (SELECT MAX_TIME FROM V$TABLE_STAT WHERE name = 'tag') "
        "LIMIT 0, 1000000",
    ),
    (
        """QUERY('value', from('table', 'tag'), dump(true))""",
        "SELECT time, value FROM TABLE WHERE name = 'tag' AND time BETWEEN "
        "(SELECT MAX_TIME-1000000000 FROM V$TABLE_STAT WHERE name = 'tag') "
        "AND (SELECT MAX_TIME FROM V$TABLE_STAT WHERE name = 'tag') "
        "LIMIT 0, 1000000",
    ),
    (
        """QUERY('val1', 'val2' , from('table', 'tag'), dump(true))""",
        "SELECT time, val1, val2 FROM TABLE WHERE name = 'tag' AND time "
        "BETWEEN (SELECT MAX_TIME-1000000000 FROM V$TABLE_STAT WHERE name = "
        "'tag') AND (SELECT MAX_TIME FROM V$TABLE_STAT WHERE name = 'tag') "
        "LIMIT 0, 1000000",
    ),
    (
        """QUERY('val', from('table', 'tag'), between('now -2.34s', 'now'), limit(5, 100), dump(true))""",
        "SELECT time, val FROM TABLE WHERE name = 'tag' AND time BETWEEN "
        "(now-2340000000) AND now LIMIT 5, 100",
    ),
    (
        """QUERY('value', from('table', 'tag'), between(123456789000-2.34*1000000000, 123456789000), dump(true))""",
        "SELECT time, value FROM TABLE WHERE name = 'tag' AND time BETWEEN "
        "121116789000 AND 123456789000 LIMIT 0, 1000000",
    ),
    (
        """QUERY( 'value', from('example', 'barn'), between('last -1h23m45s', 'last'), dump(true))""",
        "SELECT time, value FROM EXAMPLE WHERE name = 'barn' AND time "
        "BETWEEN (SELECT MAX_TIME-5025000000000 FROM V$EXAMPLE_STAT WHERE "
        "name = 'barn') AND (SELECT MAX_TIME FROM V$EXAMPLE_STAT WHERE name "
        "= 'barn') LIMIT 0, 1000000",
    ),
    (
        """QUERY( 'STDDEV(value)', from('example', 'barn'), between('last -1h23m45s', 'last', '10m'), dump(true))""",
        "SELECT from_timestamp(round(to_timestamp(time)/600000000000)*"
        "600000000000) time, STDDEV(value) FROM EXAMPLE WHERE name = 'barn' "
        "AND time BETWEEN (SELECT MAX_TIME-5025000000000 FROM "
        "V$EXAMPLE_STAT WHERE name = 'barn') AND (SELECT MAX_TIME FROM "
        "V$EXAMPLE_STAT WHERE name = 'barn') GROUP BY time ORDER BY time "
        "LIMIT 0, 1000000",
    ),
    (
        """QUERY('STDDEV(val)', from('table', 'tag'), between(123456789000 - 3.45*1000000000, 123456789000, '1ms'), limit(1, 100), dump(true))""",
        "SELECT from_timestamp(round(to_timestamp(time)/1000000)*1000000) "
        "time, STDDEV(val) FROM TABLE WHERE name = 'tag' AND time BETWEEN "
        "120006789000 AND 123456789000 GROUP BY time ORDER BY time "
        "LIMIT 1, 100",
    ),
])
def test_query_dump_sql_text(spark, script, want):
    """QUERY(..., dump(true)) emits the generated SQL instead of running it
    — byte-equal to the reference's toSql/toSqlGroup output (task_test.go
    TestQuerySql goldens, fm_dbsrc.go:34-50)."""
    import csv as _csv
    import io as _io

    out = run_script(spark, script + "\nCSV()")
    [field] = next(_csv.reader(_io.StringIO(out)))
    assert " ".join(field.split()) == " ".join(want.split())


def test_round5_registry_closure(spark):
    """Remaining fx registry names: linspace50 (fm_fake.go:328),
    escapeParam (fm_context.go:166), sep() source separator alias
    (fm_bytes.go:112), logProgress no-op option (fm_csv.go:309), and the
    pre-execution result cache (tqlcache.go:126-159, task.go:393-418)."""
    out = run_script(spark, """
        FAKE( linspace50(0, 49) )
        CSV()
    """)
    lines = out_lines(out)
    assert len(lines) == 50 and lines[0] == "0" and lines[-1] == "49"
    out = run_script(spark, """
        FAKE( once(1) )
        MAPVALUE(0, escapeParam('a b&c=d'))
        CSV()
    """)
    assert out.strip() == "a+b%26c%3Dd"
    out = run_script(spark, """
        STRING('a|b|c', sep('|'))
        CSV( logProgress() )
    """)
    assert out_lines(out) == ["a", "b", "c"]
    # cache: identical rendered output on hit, no re-execution
    src = """
        FAKE( linspace(0, 9, 10) )
        CSV( cache('closure_k', '10s') )
    """
    import time
    a = run_script(spark, src)
    t0 = time.time()
    b = run_script(spark, src)
    # a cache hit never touches Spark — generous bound to stay unflaky
    # under parallel test load
    assert a == b and time.time() - t0 < 1.0
    with pytest.raises(ValueError, match="cache ttl"):
        run_script(spark, """
            FAKE( once(1) )
            CSV( cache('bad', '500ms') )
        """)


def test_group_weight_option(spark):
    """weight() on GROUP aggregates (fm_monad.go:743-746, newAggregate
    Weight arm 822-828) — goldens from task_test.go TestGroup weighted
    mean/stddev/stderr/quantile/mode cases."""
    payload = "\n".join(["A,1", "A,2", "B,3", "B,4", "B,5",
                         "C,6", "C,7", "C,8", "C,9", ""])
    head = """
        CSV(payload(), field(0, stringType(), "name"),
            field(1, doubleType(), "value"))
    """
    out = run_script(spark, head + """
        GROUP(by(value(0)), mean(value(1)), mean(value(1), weight(value(1))),
              variance(value(1)) )
        CSV(heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,MEAN,MEAN,VARIANCE",
        "A,1.50,1.67,0.50", "B,4.00,4.17,1.00", "C,7.50,7.67,1.67"]
    out = run_script(spark, head + """
        GROUP(by(value(0)), stddev(value(1)),
              stddev(value(1), weight(value(1))) )
        CSV(heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,STDDEV,STDDEV",
        "A,0.71,0.58", "B,1.00,0.83", "C,1.29,1.12"]
    out = run_script(spark, head + """
        GROUP(by(value(0)), stderr(value(1)),
              stderr(value(1), weight(value(1))) )
        CSV(heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,STDERR,STDERR",
        "A,0.50,0.41", "B,0.58,0.48", "C,0.65,0.56"]
    out = run_script(spark, head + """
        GROUP(by(value(0)), quantile(value(1), 0.99, weight(value(1)), "P99"),
              quantile(value(1), 0.5, "P50"), median(value(1), "MEDIAN") )
        CSV(heading(true), precision(2))
    """, payload=payload)
    assert out_lines(out) == [
        "GROUP,P99,P50,MEDIAN",
        "A,2.00,1.00,1.00", "B,5.00,4.00,4.00", "C,9.00,7.00,7.00"]
    payload2 = "\n".join(["A,1.1", "A,1.1", "B,2.1", "B,2.2", "B,2.1",
                          "C,3.1", "C,3.2", "C,3.3", "C,3.3", ""])
    out = run_script(spark, head + """
        GROUP(by(value(0)), mode(value(1)), mode(value(1), weight(value(1))) )
        CSV(heading(true), precision(2))
    """, payload=payload2)
    assert out_lines(out) == [
        "GROUP,MODE,MODE",
        "A,1.10,1.10", "B,2.10,2.10", "C,3.30,3.30"]


def test_insert_tag_and_chart_option(spark, tmp_path):
    """INSERT(tag('T'[, col]), ...) prepends the constant tag-name column
    (fm_dbsink.go:55-57,158-161); CHART option('...') is the string form of
    chartOption (fm_context.go:171)."""
    from neo_server_spark.tql.script import TqlRunner

    out = TqlRunner(spark, fs_root=str(tmp_path)).run("""
        FAKE( json({ [1500000000000000000, 1.1], [1500000001000000000, 2.2] }) )
        INSERT( tag('temp.A'), 'time', 'value', table('mytag') )
    """)
    import json as _json
    assert _json.loads(out)["data"]["message"] == "2 rows inserted."
    df = spark.read.parquet(str(tmp_path / "mytag"))
    assert set(r["name"] for r in df.collect()) == {"temp.A"}

    r = TqlRunner(spark)
    r.run("""
        FAKE( linspace(0, 1, 2) )
        CHART( option('{"series": [{"type": "line"}]}') )
    """)
    assert '"series"' in r.chart_js and "setOption" in r.chart_js


@needs_goldens
def test_loader_qq_structural(spark):
    """TestLoader_qq.tql runs verbatim; the golden embeds a frozen
    time('now') so column 1 can't byte-match — text and strSub columns
    compare exactly, the time column is checked for format."""
    import re

    out = run_golden(spark, "TestLoader_qq")
    want = golden("TestLoader_qq.csv").splitlines()
    got = out_lines(out)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        g0, g1, g2 = g.split(",")
        w0, _, w2 = w.split(",")
        assert (g0, g2) == (w0, w2)
        # DEFAULT = '2006-01-02 15:04:05.999': the .999 fraction DROPS
        # trailing zeros, so a whole-second timestamp has no dot at all
        assert re.fullmatch(
            r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,3})?", g1)


@needs_goldens
def test_loader_simplex_scalar_path():
    """The Python-scalar path of simplex() (all-literal args) agrees with
    the exact generator — the dual-path consistency contract."""
    from neo_server_spark.functions.noisefn import OpenSimplex
    from neo_server_spark.tql.script import _simplex

    g = OpenSimplex(123)
    assert _simplex(123, 0.5, 1.5) == float(g.eval2(0.5, 1.5))
    assert _simplex(123, 2.25) == float(g.eval2(2.25, 2.25))


REF_GEOMAP_DIR = "/root/reference/mods/codec/internal/geomap/test"


def test_geomap_encoder_goldens():
    """geomap_test.go goldens byte-equal: the builder's _opt.js + .js
    concatenation, the JSON envelope, and the trim-per-line HTML page
    (marker/circleMarker case and the 3-object GeoJSON case)."""
    import json as _json
    import os

    from neo_server_spark.codecs.geomap import GeoMapBuilder

    if not os.path.isdir(REF_GEOMAP_DIR):
        pytest.skip("reference geomap goldens not available")

    def build(inputs):
        b = GeoMapBuilder("WejMYXCGcYNL")
        for s in inputs:
            b.add_value(_json.loads(s))
        return b

    def gold(name):
        with open(os.path.join(REF_GEOMAP_DIR, name)) as f:
            return f.read().replace("\r\n", "\n")

    b = build([
        '{"type":"marker","coordinates":[37.497850,127.027756],'
        '"properties":{"popup":{"content":"<b>Gangname</b><br/>'
        'Hello World?","open":true}}}',
        '{"type":"circleMarker","coordinates":[37.503058,127.018666],'
        '"properties":{"radius":100,"popup":{"content":"<b>circle1</b>"}}}',
    ])
    assert b.opt_js() + b.js() == gold("geomap_test.js")
    assert b.envelope() == _json.loads(gold("geomap_test.json"))
    want = [ln.strip() for ln in gold("geomap_test.html").strip().splitlines()]
    got = [ln.strip() for ln in b.html().strip().splitlines()]
    assert got == want

    fc = _json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [102.0, 0.5]},
             "properties": {"prop0": "value0"}},
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[102.0, 0.0], [103.0, 1.0],
                                          [104.0, 0.0], [105.0, 1.0]]},
             "properties": {"prop0": "value0", "prop1": 0.0}},
            {"type": "Feature",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[100.0, 0.0], [101.0, 0.0],
                                           [101.0, 1.0], [100.0, 1.0],
                                           [100.0, 0.0]]]},
             "properties": {"prop0": "value0", "prop1": {"this": "that"}}},
        ],
        "popup": {"content": "<b>GeoJSON</b>", "open": 0},
    })
    feat = _json.dumps({
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [125.6, 10.1]},
        "properties": {"name": "Dinagat Islands",
                       "popup": {"content": "<b>Dinagat Islands</b>",
                                 "open": True}},
    })
    pt = '{"type":"Point","coordinates":[135.7,20.1]}'
    b2 = build([fc, feat, pt])
    assert b2.opt_js() + b2.js() == gold("geomap_test_geojson.js")
    assert b2.envelope() == _json.loads(gold("geomap_test_geojson.json"))


def test_geomap_statement_script_goldens(spark):
    """tql_test.go TestGeoJSON run through the text front-end: SCRIPT-yielded
    GeoJSON dicts (incl. require('mathx/spatial').parseGeoJSON) reach GEOMAP,
    which writes the reference's JS assets byte-equal
    (test/js-geojson-{point,polygon}.js) and the envelope fields."""
    import json as _json
    import os

    from neo_server_spark.tql.script import TqlRunner

    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("reference goldens not available")
    runner = TqlRunner(spark)
    out = runner.run("""
        SCRIPT("js", {
            var lat = 37.497850;
            var lon =  127.027756;
            var name = "Gangnam-cross";
            $.yield({
                type: "Feature",
                geometry: {
                    type: "Point",
                    coordinates: [lon, lat]
                }
            });
        })
        GEOMAP(geomapID("MTY3NzQ2MDY4NzQyNTc4MTc2"), geomapJSON(true))
    """)
    env = _json.loads(out)
    assert env["style"] == {"width": "600px", "height": "600px",
                            "grayscale": 0}
    assert env["jsAssets"] == ["/web/geomap/leaflet.js"]
    assert env["cssAssets"] == ["/web/geomap/leaflet.css"]
    gid = env["geomapID"]
    assert env["jsCodeAssets"] == [f"/web/api/tql-assets/{gid}_opt.js",
                                   f"/web/api/tql-assets/{gid}.js"]
    with open(os.path.join(GOLDEN_DIR, "js-geojson-point.js")) as f:
        want = f.read().replace("\r\n", "\n")
    assert runner.geomap_opt_js + runner.geomap_js == want

    runner = TqlRunner(spark)
    runner.run("""
        SCRIPT("js", {
            m = require("mathx/spatial");
            obj = m.parseGeoJSON({
                type:"Feature",
                geometry: {
                    type: "MultiPolygon",
                    coordinates: [
                        [
                            [ [ 2.291863239086439, 48.8577137262115 ], [ 2.293452085617105, 48.856693553273885 ], [ 2.2968403487010107, 48.85892279314069 ], [ 2.2951175030651143, 48.86006886087142 ], [ 2.291863239086439, 48.8577137262115 ] ]
                        ],
                        [
                            [ [ 2.288226120523035, 48.86156752523257 ], [ 2.2899681088877344, 48.86042149181674 ], [ 2.290810388976098, 48.86063558796482 ], [ 2.2909826735397587, 48.8611015587675 ], [ 2.28947039792655, 48.862234983151495 ], [ 2.288226120523035, 48.86156752523257 ] ]
                        ],
                        [
                            [ [ 2.2912927602678224, 48.85709062155263 ], [ 2.2905402133688426, 48.85661663833349 ], [ 2.291917551492446, 48.855746990243716 ], [ 2.2926328654095016, 48.85624492205244 ], [ 2.2912927602678224, 48.85709062155263 ] ]
                        ]
                    ]
                }
            })
            $.yield(obj)
        })
        GEOMAP(geomapID("MTY3NzQ2MDY4NzQyNTc4MTc2"), geomapJSON(true))
    """)
    with open(os.path.join(GOLDEN_DIR, "js-geojson-polygon.js")) as f:
        want = f.read().replace("\r\n", "\n")
    assert runner.geomap_opt_js + runner.geomap_js == want


def test_geomap_parse_geojson_instanceof(spark):
    """tql_test.go TestGeoJSON js-parse-geojson-point, verbatim: the script
    routes through require('mathx/spatial').parseGeoJSON and an
    `instanceof Error` check; the JS asset matches js-geojson-point.js."""
    import os

    from neo_server_spark.tql.script import TqlRunner

    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("reference goldens not available")
    runner = TqlRunner(spark)
    runner.run("""
        SCRIPT("js", {
            var lat = 37.497850;
            var lon =  127.027756;
            var name = "Gangnam-cross";
            m = require("mathx/spatial");
            var obj = m.parseGeoJSON({
                type: "Feature",
                geometry: {
                    type: "Point",
                    coordinates: [lon, lat]
                }
            });
            if( obj instanceof Error ) {
                $.yield(obj.message);
            } else {
                $.yield(obj);
            }
        })
        GEOMAP(geomapID("MTY3NzQ2MDY4NzQyNTc4MTc2"), geomapJSON(true))
    """)
    with open(os.path.join(GOLDEN_DIR, "js-geojson-point.js")) as f:
        want = f.read().replace("\r\n", "\n")
    assert runner.geomap_opt_js + runner.geomap_js == want
    # the error path yields the message value
    from neo_server_spark.tql.script import run_script
    out = run_script(spark, """
        FAKE( once(1) )
        SCRIPT("js", {
            var m = require("mathx/spatial");
            var obj = m.parseGeoJSON({type: "Nope"});
            $.yield(obj instanceof Error ? obj.message : "unexpected");
        })
        CSV()
    """)
    assert "invalid geojson type" in out


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(src=st.text(max_size=100))
def test_tql_parser_total_on_arbitrary_input(src):
    """Untrusted .tql hardening: parse_script either returns statements or
    raises a clean ValueError/NameError/SyntaxError-family error — never an
    unrelated exception, never a hang."""
    try:
        parse_script(src)
    except (ValueError, NameError, SyntaxError, TypeError, KeyError):
        pass
    except RecursionError:
        pass


def test_scalar_dual_path_consistency(spark):
    """Every SCALARS entry has TWO implementations — a Column expression
    (records) and a Python scalar (literal arguments).  They must agree:
    one DataFrame of probe values runs the column path; the scalar path
    runs per row; cells compare to 1e-9 relative."""
    import math

    from neo_server_spark.tql.script import SCALARS

    class RT:
        now_ns = 1_700_000_000 * 10**9
        params: dict = {}
        payload = None

    rt = RT()
    probes = [0.1, 0.5, 0.9, 1.5, 2.75, 7.25, 100.0, -0.4, -3.5]
    ts_probes = [1_700_000_000_123_456_789, 1_704_067_798_777_000_000,
                 999_000_000_000_000_000]
    import pyspark.sql.functions as SF
    df = spark.createDataFrame([(v,) for v in probes], "x double")
    tdf = spark.createDataFrame([(t,) for t in ts_probes], "t long")

    unary = ["sin", "cos", "tan", "exp", "sqrt", "abs", "floor", "ceil",
             "atan", "sinh", "cosh", "tanh", "asinh", "exp2", "pow10",
             "trunc", "log", "log10", "log2"]
    cols = [SCALARS[f](rt, SF.col("x")).alias(f) for f in unary]
    got = {f: [r[f] for r in df.select(*cols).collect()] for f in unary}
    for f in unary:
        for v, g in zip(probes, got[f]):
            s = SCALARS[f](rt, v)
            if isinstance(s, float) and math.isnan(s):
                # Go math.* NaN on domain errors — both paths agree (the
                # log family is NULL-to-NaN wrapped, _nan_domain)
                assert g is not None and math.isnan(g), (f, v, g, s)
                continue
            assert g == pytest.approx(float(s), rel=1e-9, abs=1e-12), \
                (f, v, g, s)

    timefns = ["timeYear", "timeMonth", "timeDay", "timeHour", "timeMinute",
               "timeSecond", "timeNanosecond", "timeISOYear", "timeISOWeek",
               "timeYearDay", "timeWeekDay", "timeUnix", "timeUnixMilli",
               "timeUnixMicro", "timeUnixNano"]
    tcols = [SCALARS[f](rt, SF.col("t")).alias(f) for f in timefns]
    tgot = {f: [r[f] for r in tdf.select(*tcols).collect()] for f in timefns}
    for f in timefns:
        for t, g in zip(ts_probes, tgot[f]):
            assert int(g) == int(SCALARS[f](rt, t)), (f, t, g)
    # tz-shifted extractors agree across paths too
    for t in ts_probes:
        col = SCALARS["timeHour"](rt, SF.col("t"), ("tz", "Asia/Seoul"))
        g = [r[0] for r in tdf.filter(SF.col("t") == t)
             .select(col).collect()][0]
        assert int(g) == int(SCALARS["timeHour"](rt, t, ("tz", "Asia/Seoul")))
    # strTime named layout
    for t in ts_probes:
        col = SCALARS["strTime"](rt, SF.col("t"), "RFC3339")
        g = [r[0] for r in tdf.filter(SF.col("t") == t)
             .select(col).collect()][0]
        assert g == SCALARS["strTime"](rt, t, "RFC3339"), (t, g)


def test_func_test_go_battery(spark):
    """func_test.go cases run against BOTH SCALARS paths (scalar literal +
    Column over a one-row frame): strSub rune/negative semantics
    (fm_fake.go:592-630), strTime formats, trims, replaces, sprintf,
    escapeParam."""
    import pyspark.sql.functions as SF

    from neo_server_spark.tql.script import SCALARS

    class RT:
        now_ns = 0
        params: dict = {}
        payload = None

    rt = RT()

    def both(fn, s, *args):
        scalar = SCALARS[fn](rt, s, *args)
        df = spark.createDataFrame([(s,)], "s string")
        col = SCALARS[fn](rt, SF.col("s"), *args)
        colres = df.select(col.alias("r")).collect()[0]["r"]
        assert scalar == colres, (fn, s, args, scalar, colres)
        return scalar

    # strSub (func_test.go TestStrSub, all 10 cases)
    assert both("strSub", "HelLo \U0001F600 World") == "HelLo \U0001F600 World"
    assert both("strSub", "\U0001F600HelLo World", 0, 3) == "\U0001F600He"
    assert both("strSub", "HelLo \U0001F600 World", 6, -2) == "\U0001F600 World"
    assert both("strSub", "HelLo \U0001F600 World", -7) == "\U0001F600 World"
    assert both("strSub", "HelLo \U0001F600 World", -7, 3) == "\U0001F600 W"
    assert both("strSub", "HelLo \U0001F600 World", -0) == "HelLo \U0001F600 World"
    assert both("strSub", "HelLo \U0001F600 World", -1) == "d"
    assert both("strSub", "HelLo \U0001F600 World", -30) == ""
    assert both("strSub", "HelLo \U0001F600 World", 0, 30) == "HelLo \U0001F600 World"
    assert both("strSub", "HelLo \U0001F600 World", 30, 30) == ""

    # strIndex/strLastIndex: BYTE indexes (TestStrIndex/TestStrLastIndex)
    assert both("strIndex", "HelLo \U0001F600 World", "\U0001F600") == 6
    assert both("strIndex", "HelLo \U0001F600 World", "o") == 4
    assert both("strIndex", "HelLo \U0001F600 World", "l") == 2
    assert both("strLastIndex", "HelLo \U0001F600 World", "\U0001F600") == 6
    assert both("strLastIndex", "HelLo \U0001F600 World", "o") == 12
    assert both("strLastIndex", "HelLo \U0001F600 World", "H") == 0
    assert both("strLastIndex", "HelLo \U0001F600 World", "l") == 14

    # glob / regexp (TestGlob, TestRegexp — scalar paths)
    from neo_server_spark.tql.script import SCALARS as _S
    assert _S["glob"](rt, "test*me", "test123me") is True
    assert _S["glob"](rt, "test*me", "testme") is True
    assert _S["glob"](rt, "test*me", "test123not") is False
    assert _S["regexp"](rt, r"^test[0-9]{3}$", "test123") is True
    assert _S["regexp"](rt, r"^test[0-9]{3}$", "test12") is False
    assert _S["regexp"](rt, r"^test\d{5}x$", "test12345x") is True

    # trims / replaces (TestStrTrim*, TestStrReplace*)
    assert both("strTrimPrefix", "__text", "_") == "_text"
    assert both("strTrimSuffix", "__text", "text") == "__"
    assert both("strReplace", "apple", "a", "A", 1) == "Apple"
    assert both("strReplace", "apple", "p", "P", 1) == "aPple"
    assert both("strReplace", "apple", "p", "P", -1) == "aPPle"
    assert both("strReplaceAll", "apple", "p", "P") == "aPPle"

    # escapeParam / sprintf (scalar-only paths)
    assert SCALARS["escapeParam"](rt, "a b") == "a+b"
    assert SCALARS["strSprintf"](rt, "hello %s %1.2f",
                                 "world", 3.141592) == "hello world 3.14"

    # strTime (TestStrTime — scalar path; the Column twin is pinned by
    # test_scalar_dual_path_consistency)
    t = 1704871917655327000
    assert SCALARS["strTime"](rt, t, "RFC822", ("tz", "UTC")) == \
        "10 Jan 24 07:31 UTC"
    assert SCALARS["strTime"](rt, t, "2006/01/02 15:04:05.999999",
                              ("tz", "UTC")) == "2024/01/10 07:31:57.655327"
    assert SCALARS["strTime"](rt, t, "ns") == "1704871917655327000"
    assert SCALARS["strTime"](rt, t, "us") == "1704871917655327"
    assert SCALARS["strTime"](rt, t, "ms") == "1704871917655"
    assert SCALARS["strTime"](rt, t, "s") == "1704871917"


def test_parse_time_named_and_tz(spark):
    """func_test.go TestParseTime/tz: named-format parsing as wall clock in
    a zone (both paths), lowercase 'utc'/'local', unknown-zone error."""
    import pyspark.sql.functions as SF

    from neo_server_spark.functions.timefn import resolve_tz
    from neo_server_spark.tql.script import SCALARS

    class RT:
        now_ns = 0
        params: dict = {}
        payload = None

    rt = RT()
    want_utc = 1677679262 * 10**9    # 2023-03-01 14:01:02 UTC
    s = "2023-03-01 14:01:02"
    assert SCALARS["parseTime"](rt, s, "DEFAULT") == want_utc
    assert SCALARS["parseTime"](rt, s, "DEFAULT", ("tz", "UTC")) == want_utc
    assert SCALARS["parseTime"](rt, s, "DEFAULT", ("tz", "Asia/Seoul")) == \
        want_utc - 9 * 3600 * 10**9
    df = spark.createDataFrame([(s,)], "s string")
    col = SCALARS["parseTime"](rt, SF.col("s"), "DEFAULT",
                               ("tz", "Asia/Seoul"))
    got = df.select(col.alias("t")).collect()[0]["t"]
    assert got == want_utc - 9 * 3600 * 10**9
    # tz() name handling
    assert resolve_tz("utc") == "UTC" and resolve_tz("UTC") == "UTC"
    assert isinstance(resolve_tz("local"), str)
    with pytest.raises(ValueError, match="unknown time zone"):
        resolve_tz("wrong/place")


def test_element_and_len(spark):
    """element() picks the idx-th value with float64 number widening
    (func_test.go TestElement); len() returns float64 (TestLen)."""
    from neo_server_spark.tql.script import SCALARS

    class RT:
        now_ns = 0
        params: dict = {}
        payload = None

    rt = RT()
    assert SCALARS["element"](rt, 0.0, 1.0, 2.0, 3.0, 4.0, 1.0) == 1.0
    assert SCALARS["element"](rt, 0.0, 1.0, 2.0, 3.0, 4.0, 4) == 4.0
    assert SCALARS["element"](rt, "abc", "bcd", "cde", "def", "efg", 4) == "efg"
    assert SCALARS["element"](rt, "abc", "bcd", "cde", "def", True, 4) is True
    assert SCALARS["element"](rt, "abc", "bcd", "cde", "def", 123, 4) == 123.0
    with pytest.raises(ValueError, match="out of index 5 / 5"):
        SCALARS["element"](rt, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    with pytest.raises(TypeError, match="should be int"):
        SCALARS["element"](rt, 0.0, 1.0, 2.0, 3.0, 4.0, "4")
    assert SCALARS["len"](rt, "1234") == 4.0
    assert SCALARS["len"](rt, ["1", "2", "3", "4"]) == 4.0
    out = run_script(spark, """
        FAKE( linspace(0, 2, 3) )
        MAPVALUE(1, element('a', 'b', 'c', value(0)))
        CSV()
    """)
    assert out_lines(out) == ["0,a", "1,b", "2,c"]


def test_group_where_and_relation_aggs(spark):
    """Front-end GROUP: per-aggregate where() (fm_monad.go:719 — previously
    silently IGNORED, yielding wrong results) and the two-value relation
    aggregates correlation/covariance (fm_monad.go:926-935)."""
    out = run_script(spark, """
        FAKE( json({
            ["A", 1, 10], ["A", 2, 20], ["A", 3, 28], ["A", 100, 1],
            ["B", 1, 5], ["B", 2, 9], ["B", 3, 13]
        }))
        GROUP(by(value(0)),
              sum(value(1), where(value(1) < 50), "S"),
              count(value(1), where(value(1) < 50), "C"),
              correlation(value(1), value(2), where(value(1) < 50), "CORR"),
              covariance(value(1), value(2), where(value(1) < 50), "COV"))
        CSV(heading(true), precision(3))
    """)
    assert out_lines(out) == [
        "GROUP,S,C,CORR,COV",
        "A,6.000,3,0.998,9.000",
        "B,6.000,3,1.000,4.000"]


def test_geo_constructors(spark):
    """latlon + geo* constructors (fx_definitions.go:112-119,
    nums/geography.go): geometry forms yield GeoJSON Features ([lon,lat]),
    marker forms yield leaflet layers ([lat,lon]) — both flow through the
    JSON record path into GEOMAP."""
    from neo_server_spark.tql.script import TqlRunner

    r = TqlRunner(spark)
    r.run("""
        FAKE( once(1) )
        MAPVALUE(0, geoPoint(latlon(37.497850, 127.027756)))
        MAPVALUE(1, geoLineString(latlon(0, 0), latlon(1, 2)))
        GEOMAP(geomapID('TGEO'), geomapJSON(true))
    """)
    js = r.geomap_js
    assert "L.geoJSON({geometry:{coordinates:[127.027756,37.49785]," \
        'type:"Point"},type:"Feature"},opt.geojson)' in js
    assert "coordinates:[[0,0],[2,1]]" in js and '"LineString"' in js
    r2 = TqlRunner(spark)
    r2.run("""
        FAKE( once(1) )
        MAPVALUE(0, geoCircleMarker(latlon(37.5, 127.0), 100,
                                    '{"color":"red"}'))
        MAPVALUE(1, geoPointMarker(latlon(1.5, 2.5)))
        GEOMAP(geomapID('TGEO2'), geomapJSON(true))
    """)
    js2 = r2.geomap_js
    assert 'L.circleMarker([37.5,127],{color:"red",radius:100})' in js2
    assert "L.marker([1.5,2.5],{})" in js2


def test_dict_json_embedding(spark):
    """task_test.go TestDict: dict('key', value(0)) carries an OBJECT into
    the JSON envelope rows; name/value validation errors match; FAKE
    generator columns carry the reference's 'x'/'y' names."""
    import json as _json

    out = run_script(spark, """
        FAKE( arrange(0, 1, 1) )
        MAPVALUE(0, dict("key", value(0)) )
        JSON(precision(0))
    """)
    d = _json.loads(out)
    assert d["data"]["columns"] == ["x"]
    assert d["data"]["rows"] == [[{"key": 0.0}], [{"key": 1.0}]]
    with pytest.raises(ValueError, match="doesn't match with any value"):
        run_script(spark, """
            FAKE( arrange(0, 1, 1) )
            MAPVALUE(0, dict("key", value(0), "value") )
            JSON()
        """)
    with pytest.raises(TypeError, match="name should be string"):
        run_script(spark, """
            FAKE( arrange(0, 1, 1) )
            MAPVALUE(0, dict(123, value(0)) )
            JSON()
        """)


def test_group_where_verbatim(spark):
    """task_test.go TestGroupWhere, verbatim: per-aggregate where() with a
    roundTime() group key (time-typed, so timeformat('s') renders it) and a
    where-guarded last() that must exclude non-matching rows from the
    ORDER side of max_by.  Third variant: nullValue() on plain groups
    (reference renders the raw alt-value '1'; our typed column coerces to
    1.00 — numeric equality, formatting deviation)."""
    payload = "\n".join([
        "1700256261,dry,1", "1700256262,dry,2", "1700256262,wet,2",
        "1700256263,dry,3", "1700256264,dry,4", "1700256264,wet,4",
        "1700256265,wet,5", "1700256265,dry,5", "1700256266,dry,6",
        "1700256267,dry,7", "1700256268,dry,8", "1700256269,dry,9",
        "1700256276,dry,10", ""])
    script = """
        CSV(payload(), field(0, {typ}, "time"), field(2, {vtyp}, "value"))
        GROUP(
          by( roundTime(value(0), "2s")),
          avg(value(2), where(value(1) == "dry"), "DRY"),
          last(value(2), where(value(1) == "wet"), {extra}"WET") )
        CSV(timeformat("s"), heading(true), precision(2))
    """
    want = ["GROUP,DRY,WET",
            "1700256260,1.00,NULL", "1700256262,2.50,2.00",
            "1700256264,4.50,5.00", "1700256266,6.50,NULL",
            "1700256268,8.50,NULL", "1700256276,10.00,NULL"]
    out = run_script(spark, script.format(typ='datetimeType("s")',
                                          vtyp="doubleType()", extra=""),
                     payload=payload)
    assert out_lines(out) == want
    out = run_script(spark, script.format(typ='timeType("s")',
                                          vtyp="floatType()", extra=""),
                     payload=payload)
    assert out_lines(out) == want
    out = run_script(spark, script.format(typ='datetimeType("s")',
                                          vtyp="doubleType()",
                                          extra='nullValue("1"), '),
                     payload=payload)
    assert out_lines(out) == [
        "GROUP,DRY,WET",
        "1700256260,1.00,1.00", "1700256262,2.50,2.00",
        "1700256264,4.50,5.00", "1700256266,6.50,1.00",
        "1700256268,8.50,1.00", "1700256276,10.00,1.00"]


def test_histogram_edge_bins(spark):
    """fm_stat.go NewBuckets:265-291 bucket structure: -Inf underflow /
    +Inf overflow bins bracket int((max-min)/step) inner bins; an edge bin
    is emitted only when counted (task_test.go TestHistogram bins(80,120,13)
    shape)."""
    out = run_script(spark, """
        FAKE( arrange(1, 100, 1) )
        HISTOGRAM(value(0), bins(80, 120, 13))
        CSV( precision(0), header(true) )
    """)
    # int() truncation toward zero (fm_stat.go:282) folds (min-step, min)
    # = (67, 80) into the FIRST REAL BIN; underflow keeps only v <= 67
    # (pinned by the verbatim TestHistogram bins(80,120,13) case)
    assert out_lines(out) == [
        "low,high,count",
        "-Inf,80,67",
        "80,93,25",
        "93,106,8",
        "106,119,0"]


def test_histogram_unpredicted_bins(spark):
    """HISTOGRAM(v, bins(N)) routes to the streaming merging histogram
    (fm_stat.go:76-79, task_test.go TestHistogramUnpredictedBins): output
    (value, count) centroid rows, counts summing to the input size."""
    out = run_script(spark, """
        FAKE( arrange(1, 100, 1) )
        HISTOGRAM(value(0), bins(10))
        CSV( header(true), precision(0) )
    """)
    lines = out_lines(out)
    assert lines[0] == "value,count"
    rows = [ln.split(",") for ln in lines[1:]]
    assert len(rows) == 10
    assert sum(float(c) for _, c in rows) == 100.0
    xs = [float(x) for x, _ in rows]
    assert xs == sorted(xs)


def test_map_changed_verbatim(spark):
    """task_test.go TestMapChanged, all four cases verbatim: the
    BufferedFilter's exact emissions — init record, hold-crossing record,
    run-first under useFirst (except the stream's first run), per-run last
    under withLast (singles double-emit in the no-retain form)."""
    data = """FAKE(json({
        ["A", 1692329338, 1.0],
        ["A", 1692329339, 2.0],
        ["B", 1692329340, 3.0],
        ["B", 1692329341, 4.0],
        ["B", 1692329342, 5.0],
        ["B", 1692329343, 6.0],
        ["B", 1692329344, 7.0],
        ["B", 1692329345, 8.0],
        ["C", 1692329346, 9.0],
        ["D", 1692329347, 9.1],
        ["D", 1692329348, 9.2],
        ["D", 1692329349, 9.3]
    }))"""
    out = run_script(spark, data + """
        MAPVALUE(1, parseTime(value(1), "s", tz("UTC")))
        FILTER_CHANGED(value(0), retain(value(1), "2s"), useFirstWithLast(false))
        CSV(timeformat("s"))
    """)
    assert out_lines(out) == [
        "A,1692329338,1", "B,1692329340,3", "D,1692329347,9.1"]
    out = run_script(spark, data + """
        MAPVALUE(1, parseTime(value(1), "s", tz("UTC")))
        FILTER_CHANGED(value(0), retain(value(1), "2s"), useFirstWithLast(true))
        CSV(timeformat("s"))
    """)
    assert out_lines(out) == [
        "A,1692329338,1", "A,1692329339,2", "B,1692329340,3",
        "B,1692329345,8", "D,1692329347,9.1", "D,1692329349,9.3"]
    out = run_script(spark, data + """
        MAPVALUE(1, parseTime(value(1), "s", tz("UTC")))
        FILTER_CHANGED(value(0), useFirstWithLast(true))
        CSV(timeformat("s"))
    """)
    assert out_lines(out) == [
        "A,1692329338,1", "A,1692329339,2", "B,1692329340,3",
        "B,1692329345,8", "C,1692329346,9", "C,1692329346,9",
        "D,1692329347,9.1", "D,1692329349,9.3"]
    data2 = """FAKE(json({
        ["A", 1692329338, 1.0],
        ["A", 1692329341, 2.0],
        ["A", 1692329344, 2.0],
        ["B", 1692329339, 1.0],
        ["B", 1692329342, 2.0],
        ["B", 1692329345, 1.0],
        ["C", 1692329340, 1.0],
        ["C", 1692329343, 1.0],
        ["C", 1692329346, 1.0]
    }))"""
    out = run_script(spark, data2 + """
        MAPVALUE(1, parseTime(value(1), "s", tz("UTC")))
        FILTER_CHANGED(strSprintf("%s.%.f", value(0), value(2)), useFirstWithLast(true))
        CSV(timeformat("s"))
    """)
    assert out_lines(out) == [
        "A,1692329338,1", "A,1692329338,1", "A,1692329341,2",
        "A,1692329344,2", "B,1692329339,1", "B,1692329339,1",
        "B,1692329342,2", "B,1692329342,2", "B,1692329345,1",
        "B,1692329345,1", "C,1692329340,1", "C,1692329346,1"]


def test_math_verbatim(spark):
    """task_test.go TestMath, verbatim: PUSHKEY/POPKEY choreography over
    math scalars; Go log domain semantics (log(0) = -Inf, log(<0) = NaN);
    linspace with a negative count is EMPTY (nums.go:75-78)."""
    def run(fn):
        return run_script(spark, f"""
            FAKE( linspace(-2, 2, 5))
            PUSHKEY({fn}(value(0)))
            PUSHKEY(0)
            POPKEY(1)
            POPKEY(1)
            PUSHKEY('test')
            CSV(precision(6))
        """).rstrip("\n").splitlines()

    assert run("exp") == [
        "-2.000000,0.135335", "-1.000000,0.367879", "0.000000,1.000000",
        "1.000000,2.718282", "2.000000,7.389056"]
    assert run("exp2") == [
        "-2.000000,0.250000", "-1.000000,0.500000", "0.000000,1.000000",
        "1.000000,2.000000", "2.000000,4.000000"]
    assert run("log") == [
        "-2.000000,NaN", "-1.000000,NaN", "0.000000,-Inf",
        "1.000000,0.000000", "2.000000,0.693147"]
    assert run("log10") == [
        "-2.000000,NaN", "-1.000000,NaN", "0.000000,-Inf",
        "1.000000,0.000000", "2.000000,0.301030"]
    out = run_script(spark, """
        FAKE( linspace(0, 3.141592/2, 3))
        PUSHKEY(tan(value(0)))
        PUSHKEY(0)
        POPKEY(1)
        POPKEY(1)
        PUSHKEY('test')
        CSV(precision(6))
    """)
    assert out_lines(out) == [
        "0.000000,0.000000", "0.785398,1.000000", "1.570796,3060023.306953"]
    out = run_script(spark, """
        FAKE( linspace(1000, 100, -1) )
        CSV(precision(5), header(true))
    """)
    assert out == "x\n" or out.strip() == "x"
