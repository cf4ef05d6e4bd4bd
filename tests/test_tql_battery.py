"""The reference's TestTql battery (mods/tql/tql_test.go:922-1829) plus the
simplex-driven TestHistogram/TestBoxplot clusters (task_test.go:242-461),
run VERBATIM through the text front-end.

Expected outputs are transcribed from the Go test tables unchanged.  The
two harnesses differ on trailing newlines and both are modeled exactly:

- tql_test.go runTestCase compares the raw task output against
  ``strings.Join(expect, "\\n")`` — the live CSV/NDJSON output ends with
  the per-row newline PLUS the Exporter.Close newline (csv_encode.go:127),
  which the expect lists encode as a final "\\n" element (and goldens via
  loadLines' appended "\\n").
- task_test.go runTest splits on "\\n" and drops ONE trailing empty, so
  its expect lists end with "" and the comparison is
  ``out == join(expect) + "\\n"``.
"""

import os

import pytest

from neo_server_spark.tql.script import run_script

GOLDEN_DIR = "/root/reference/mods/tql/test"

needs_goldens = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available")


def loadlines(name):
    """tql_test.go loadLines: file lines + a final "\\n" element for .csv."""
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return f.read().splitlines() + ["\n"]


PAY5 = "\n".join([
    "NAME,TIME,VALUE,BOOL",
    "wave.sin,1676432361,0.000000,true",
    "wave.cos,1676432361,1.0000000,false",
    "wave.sin,1676432362,0.406736,true",
    "wave.cos,1676432362,0.913546,false",
    "wave.sin,1676432363,0.743144,true"]) + "\n"

PAYM = "\n".join([
    "NAME,TIME,VALUE",
    "wave.sin,1676432361,0.000000",
    "wave.cos,1676432361,1.000000",
    "wave.sin,1676432362,0.406736",
    "wave.cos,1676432362,0.913546",
    "wave.sin,1676432363,0.743144"])

PAYNH = "\n".join([
    "wave.sin,1676432361,0.000000",
    "wave.cos,1676432361,1.000000",
    "wave.sin,1676432362,0.406736",
    "wave.cos,1676432362,0.913546",
    "wave.sin,1676432363,0.743144"])

MD5 = ["|wave.sin|1676432361|0.000000|",
       "|wave.cos|1676432361|1.000000|",
       "|wave.sin|1676432362|0.406736|",
       "|wave.cos|1676432362|0.913546|",
       "|wave.sin|1676432363|0.743144|",
       ""]

FJ = """FAKE(json({
    ["A", 1.0], ["A", 2.0],
    ["B", 3.0], ["B", 4.0], ["B", 5.0],
    ["C", 6.0], ["C", 7.0],
    ["D", 8.0], ["D", 9.0]
}))"""

# (name, script, expect-lines, payload) — tql_test.go runTestCase model
TQL_CASES = [
    ("CSV_payload_CSV_timeformat_precision", """
CSV(payload(), field(0, timeType("s"), "time"), field(2, floatType(), "value"), field(3, boolType(),"flag") )
CSV(timeformat("s"), heading(true), precision(2))
""",
     ["time,column1,value,flag",
      "1700256261,dry,1.00,true",
      "1700256262,dry,2.00,false",
      "1700256262,wet,2.00,true",
      "1700256263,dry,3.00,false",
      "1700256264,dry,4.00,true",
      "1700256264,wet,5.00,false",
      "\n"],
     "1700256261,dry,1,true\n1700256262,dry,2,false\n1700256262,wet,2,TRUE\n"
     "1700256263,dry,3,False\n1700256264,dry,4,1\n1700256264,wet,5,0\n"),
    ("CSV_payload_MAPVALUE_MARKDOWN", """
CSV(payload(), header(false))
MAPVALUE(2, value(2) != "VALUE" ? parseFloat(value(2))*10 : value(2))
MARKDOWN()
""",
     ["|column0|column1|column2|column3|",
      "|:-----|:-----|:-----|:-----|",
      "|NAME|TIME|VALUE|BOOL|",
      "|wave.sin|1676432361|0.000000|true|",
      "|wave.cos|1676432361|10.000000|false|",
      "|wave.sin|1676432362|4.067360|true|",
      "|wave.cos|1676432362|9.135460|false|",
      "|wave.sin|1676432363|7.431440|true|",
      ""],
     PAY5),
    ("CSV_MARKDOWN", """
CSV(payload(), header(true))
MARKDOWN()
""",
     ["|NAME|TIME|VALUE|", "|:-----|:-----|:-----|", *MD5], PAYM),
    ("CSV_payload_MARKDOWN", """
CSV(payload(), header(true))
MARKDOWN()
""",
     ["|NAME|TIME|VALUE|", "|:-----|:-----|:-----|", *MD5], PAYM + "\n\n"),
    ("CSV_header_true_MARKDOWN", """
CSV(payload(),
field(0, stringType(), 'name'),
field(1, datetimeType('s'), 'time'),
field(2, doubleType(), 'value'),
header(true))
MARKDOWN()
""",
     ["|name|time|value|", "|:-----|:-----|:-----|",
      "|wave.sin|1676432361000000000|0.000000|",
      "|wave.cos|1676432361000000000|1.000000|",
      "|wave.sin|1676432362000000000|0.406736|",
      "|wave.cos|1676432362000000000|0.913546|",
      "|wave.sin|1676432363000000000|0.743144|",
      ""], PAYM),
    ("CSV_header_false_MARKDOWN", """
CSV(payload(),
field(0, stringType(), 'NAME'),
field(1, datetimeType('s'), 'TIME'),
field(2, doubleType(), 'VALUE'),
header(false))
MARKDOWN()
""",
     ["|NAME|TIME|VALUE|", "|:-----|:-----|:-----|",
      "|wave.sin|1676432361000000000|0.000000|",
      "|wave.cos|1676432361000000000|1.000000|",
      "|wave.sin|1676432362000000000|0.406736|",
      "|wave.cos|1676432362000000000|0.913546|",
      "|wave.sin|1676432363000000000|0.743144|",
      ""], PAYNH),
    ("CSV_no_header_MARKDOWN", """
CSV(payload())
MARKDOWN()
""",
     ["|column0|column1|column2|", "|:-----|:-----|:-----|", *MD5], PAYNH),
    ("CSV_NDJSON", """
CSV("1,line1\\n2,line2\\n3,\\n4,line4")
NDJSON( rownum(true) )
""",
     ['{"ROWNUM":1,"column0":"1","column1":"line1"}',
      '{"ROWNUM":2,"column0":"2","column1":"line2"}',
      '{"ROWNUM":3,"column0":"3","column1":""}',
      '{"ROWNUM":4,"column0":"4","column1":"line4"}',
      "\n"], None),
    ("MAP_MOVAVG_nowait", """
FAKE( linspace(0, 100, 100) )
MAP_MOVAVG(1, value(0), 10, noWait(true))
CSV( precision(4) )
""", loadlines("movavg_result_nowait.csv"), None),
    ("MAP_LOWPASS", """
FAKE(arrange(1, 10, 1))
MAPVALUE(1, value(0) + simplex(1, value(0))*3)
MAP_LOWPASS(2, value(1), 0.3)
CSV(precision(2))
""",
     ["1.00,1.48,1.48", "2.00,0.40,1.15", "3.00,3.84,1.96",
      "4.00,2.89,2.24", "5.00,5.47,3.21", "6.00,5.29,3.83",
      "7.00,7.22,4.85", "8.00,10.31,6.49", "9.00,8.36,7.05",
      "10.00,8.56,7.50", "\n"], None),
    ("FILTER_CHANGED_bool", """
FAKE(json({
    ["A", true, 1.0],
    ["A", false, 2.0],
    ["B", false, 3.0],
    ["B", true, 4.0]
}))
FILTER_CHANGED(value(1))
CSV()
""", ["A,true,1", "A,false,2", "B,true,4", "\n"], None),
    ("FILTER_CHANGED_time", """
FAKE(json({
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
}))
MAPVALUE(1, parseTime(value(1), "s", tz("UTC")))
FILTER_CHANGED(value(0), retain(value(1), "2s"))
CSV(timeformat("s"))
""", ["A,1692329338,1", "B,1692329342,5", "D,1692329349,9.3", "\n"], None),
    ("FILTER_CHANGED_useFirstWithLast(true)", FJ + """
FILTER_CHANGED(value(0), useFirstWithLast(true))
CSV()
""", ["A,1", "A,2", "B,3", "B,5", "C,6", "C,7", "D,8", "D,9", "\n"], None),
    ("FILTER_CHANGED_useFirstWithLast(false)", FJ + """
FILTER_CHANGED(value(0), useFirstWithLast(false))
CSV()
""", ["A,1", "B,3", "C,6", "D,8", "\n"], None),
    ("FILTER_CHANGED_useFirstWithLast(false)_implicit", FJ + """
FILTER_CHANGED(value(0))
CSV()
""", ["A,1", "B,3", "C,6", "D,8", "\n"], None),
    ("FAKE_sphere_4_4", """
FAKE( sphere(4, 4) )
PUSHKEY('test')
CSV( header(true), precision(6) )
""", loadlines("sphere_4_4.csv"), None),
    ("FAKE_sphere_0_0", """
FAKE( sphere(0, 0) )
PUSHKEY('test')
CSV( header(false), precision(6) )
""", loadlines("sphere_0_0.csv"), None),
    ("FFT_not_enough_samples_0", """
FAKE( linspace(0, 10, 100) )
FFT()
CSV()
""", ["\n"], None),
]


@needs_goldens
@pytest.mark.parametrize("name,script,expect,payload",
                         TQL_CASES, ids=[c[0] for c in TQL_CASES])
def test_tqltest_battery(spark, name, script, expect, payload):
    out = run_script(spark, script, payload=payload)
    assert out == "\n".join(expect)


# task_test.go runTest model: out == join(expect) + "\n"
TASK_CASES = [
    ("TestHistogram_bins_0_200_20", """FAKE( arrange(1, 100, 1) )
MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
HISTOGRAM(value(0), bins(0, 200, 20))
CSV( precision(0) )""",
     ["0,20,0", "20,40,2", "40,60,12", "60,80,19", "80,100,25",
      "100,120,22", "120,140,8", "140,160,8", "160,180,4", "180,200,0", ""]),
    ("TestHistogram_bins_80_120_13", """FAKE( arrange(1, 100, 1) )
MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
HISTOGRAM(value(0), bins(80, 120, 13))
CSV( precision(0), header(true) )""",
     ["low,high,count", "-Inf,80,19", "80,93,28", "93,106,19",
      "106,119,14", "119,+Inf,20", ""]),
    ("TestHistogram_bins_20_180_20", """FAKE( arrange(1, 100, 1) )
MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
HISTOGRAM(value(0), bins(20, 180, 20))
CSV( header(true), precision(0) )""",
     ["low,high,count", "20,40,2", "40,60,12", "60,80,19", "80,100,25",
      "100,120,22", "120,140,8", "140,160,8", "160,180,4", ""]),
    ("TestHistogram_category_order", """FAKE( arrange(1, 100, 1) )
MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
PUSHVALUE(0, key() % 2 == 0 ? "Cat.A" : "Cat.B")
HISTOGRAM(value(1), bins(0, 200, 20), category(value(0)), order("Cat.B", "Cat.A"))
CSV( header(true), precision(0) )""",
     ["low,high,Cat.B,Cat.A", "0,20,0,0", "20,40,1,1", "40,60,5,7",
      "60,80,6,13", "80,100,14,11", "100,120,14,8", "120,140,4,4",
      "140,160,5,3", "160,180,1,3", "180,200,0,0", ""]),
    ("TestHistogramUnpredictedBins", """FAKE( arrange(1, 100, 1) )
MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
HISTOGRAM(value(0), bins(10))
CSV( header(true), precision(0) )""",
     ["value,count", "23,1", "44,6", "59,12", "80,26", "99,20",
      "113,18", "129,5", "141,2", "153,7", "170,3", ""]),
]

BOX_SRC = """
FAKE(json({
    ["A", 850, 740, 900, 1070, 930, 850, 950, 980, 980, 880, 1000, 980, 930, 650, 760, 810, 1000, 1000, 960, 960],
    ["B", 960, 940, 960, 940, 880, 800, 850, 880, 900, 840, 830, 790, 810, 880, 880, 830, 800, 790, 760, 800],
    ["C", 880, 880, 880, 860, 720, 720, 620, 860, 970, 950, 880, 910, 850, 870, 840, 840, 850, 840, 840, 840],
    ["D", 890, 810, 810, 820, 800, 770, 760, 740, 750, 760, 910, 920, 890, 860, 880, 720, 840, 850, 850, 780],
    ["E", 890, 840, 780, 810, 760, 810, 790, 810, 820, 850, 870, 870, 810, 740, 810, 940, 950, 800, 810, 870]
}))"""

TASK_CASES += [
    ("TestBoxplot_standard", BOX_SRC + """
TRANSPOSE(fixed(0))
BOXPLOT(value(1), category(value(0)), order("A", "D","C","B","E"), boxplotInterp(true, false, true))
FILTER(value(0) != "OUTLIER")
CSV( header(true), precision(0) )""",
     ["CATEGORY,A,D,C,B,E", "MIN,650,720,620,760,740",
      "LOWER,655,610,780,680,695", "Q1,850,760,840,800,800",
      "Q2,930,810,850,840,810", "Q3,980,860,880,880,870",
      "UPPER,1175,1010,940,1000,975", "MAX,1070,920,970,960,950",
      "IQR,130,100,40,80,70", ""]),
    ("TestBoxplot_chart", BOX_SRC + """
TRANSPOSE(fixed(0))
BOXPLOT(value(1), category(value(0)), order("A", "D","C","B","E"), boxplotInterp(true, false, true), boxplotOutput("chart"))
CSV(header(true))""",
     ["CATEGORY,BOXPLOT,OUTLIER",
      "A,[]interface {},[]interface {}",
      "D,[]interface {},[]interface {}",
      "C,[]interface {},[]interface {}",
      "B,[]interface {},[]interface {}",
      "E,[]interface {},[]interface {}", ""]),
]


@needs_goldens
@pytest.mark.parametrize("name,script,expect",
                         TASK_CASES, ids=[c[0] for c in TASK_CASES])
def test_tasktest_battery(spark, name, script, expect):
    out = run_script(spark, script)
    assert out == "\n".join(expect) + "\n"


@needs_goldens
def test_markdown_template(spark):
    """CSV_payload_MAPVALUE_MARKDOWN_TEMPLATE — Go-template MARKDOWN with
    IsFirst/IsLast sections and float %v shortest-repr values."""
    out = run_script(spark, """
CSV(payload(), header(false))
MAPVALUE(2, value(2) != "VALUE" ? parseFloat(value(2))*10 : value(2))
MARKDOWN({
{{ if .IsFirst }}## demo
{{ end }}{{ .Value 0 }},{{ .Value 2 }}
{{ if .IsLast }}--------
{{ end }}
})
""", payload=PAY5)
    for want in ("## demo", "NAME,VALUE", "wave.sin,0", "wave.cos,10",
                 "wave.sin,4.067", "wave.cos,9.135", "--------"):
        assert want in out


@needs_goldens
def test_fake_error_messages(spark):
    """FAKE error-message parity, exact text (tql_test.go:1520-1546)."""
    for script, msg in [
        ("FAKE( 123 )\nCSV()",
         "f(FAKE) arg(0) should be fakeSource, but float64"),
        ("FAKE( arrange(10, 30, 0) )\nCSV()",
         'FUNCTION "arrange" step can not be 0'),
        ("FAKE( arrange(10, 10, 10) )\nCSV()",
         'FUNCTION "arrange" start, stop can not be equal'),
        ("FAKE( arrange(10, 30, -10) )\nCSV()",
         'FUNCTION "arrange" step can not be less than 0'),
        ("FAKE( arrange(30, 10, 10) )\nCSV()",
         'FUNCTION "arrange" step can not be greater than 0'),
    ]:
        with pytest.raises(Exception) as ei:
            run_script(spark, script)
        assert msg in str(ei.value)


@needs_goldens
def test_fft_tuple_len_error(spark):
    """FFT over 3-wide tuples raises the reference's exact message
    (fm_fourier.go:63)."""
    with pytest.raises(ValueError,
                       match=r"but len=3"):
        run_script(spark, """
FAKE( meshgrid(linspace(0, 10, 100), linspace(0, 10, 1000)) )
PUSHKEY('sample')
GROUPBYKEY()
FFT()
CSV()
""")


@needs_goldens
def test_shell_battery_case(spark):
    """SHELL_shell-command: combined stdout split on newline keeps the
    final empty record (fm_shell.go:131-135)."""
    out = run_script(spark, """
FAKE( once(1) )
SHELL("echo 'Hello, World!'; echo 123;")
CSV()
""", allow_shell=True)
    assert out == "\n".join(['"Hello, World!"', "123", "", "", ""])
