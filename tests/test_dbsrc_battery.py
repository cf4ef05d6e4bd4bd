"""The reference's fm_dbsrc_test.go battery run VERBATIM through the text
front-end: the wide-type tag_data round-trip (SQL sink with value(n)
params -> CSV/MARKDOWN/JSON/NDJSON), the SHOW catalog family, DESC, and
EXPLAIN routing.

Server-identity SHOW commands (info/license/ports/sessions/statements)
mirror the reference's COLUMN SETS exactly while reporting THIS engine's
values (the Spark session stands in for the server process), so those
cases assert shape + the reference's row regexes where they are
engine-independent.
"""

import json
import re

import pytest

from neo_server_spark.tql.script import run_script


@pytest.fixture()
def db(spark):
    """The reference test server's tables (server_test.go:151-196 DDLs),
    recreated per test through the same DDL surface."""
    from neo_server_spark.sqlx import ddl
    saved = dict(ddl._TABLES)
    ddl._TABLES.clear()
    ddl.exec_sql(spark, """CREATE TABLE LOG_DATA(
        time datetime, short_value short, ushort_value ushort,
        int_value integer, uint_value uinteger, long_value long,
        ulong_value ulong, double_value double, float_value float,
        str_value varchar(400), json_value json, ipv4_value ipv4,
        ipv6_value ipv6, text_value text, bin_value binary)""")
    ddl.exec_sql(spark, """CREATE TAG TABLE TAG_DATA(
        name varchar(100) primary key, time datetime basetime,
        value double summarized, short_value short, ushort_value ushort,
        int_value integer, uint_value uinteger, long_value long,
        ulong_value ulong, str_value varchar(400), json_value json,
        ipv4_value ipv4, ipv6_value ipv6, bin_value binary
        ) TAG_PARTITION_COUNT=1""")
    ddl.exec_sql(spark, """CREATE TAG TABLE TAG_SIMPLE(
        name varchar(40) primary key, time datetime basetime,
        value double summarized)""")
    yield ddl
    ddl._TABLES.clear()
    ddl._TABLES.update(saved)


def r(spark, script, **kw):
    return run_script(spark, script, **kw)


# ---------------------------------------------------------------------------
# TestTqlSql — the wide-type round trip
# ---------------------------------------------------------------------------

INSERT_WIDE = """
    SCRIPT({
        const dt = new Date('2026-07-10T17:10:20');
        $.yield(
            'sql_test', dt, 3.142,
            -123, 123,
            -1234, 1234,
            -12345, 12345,
            'STR', '{"json":true}',
            '192.168.0.1', '2001:db8::1',
            new Uint8Array([1,2,3])
    )})
    SQL('insert into tag_data (name,time,value, '+
        'short_value,ushort_value,int_value,uint_value, '+
        'long_value,ulong_value,str_value,json_value,ipv4_value,ipv6_value,bin_value) '+
        'values(?,?,?,?,?,?,?,?,?,?,?,?,?,?)',
            value(0), value(1), value(2),
            value(3), value(4), value(5), value(6),
            value(7), value(8), value(9), value(10), value(11), value(12), value(13)
    )
"""


def test_sql_sink_wide_insert(spark, db):
    out = r(spark, INSERT_WIDE)
    d = json.loads(out)
    assert d["success"] is True
    assert d["data"]["message"] == "a row inserted."


def test_sql_flush(spark, db):
    out = r(spark, """
        FAKE(once(1))
        SQL('exec table_flush(tag_data)')
    """)
    d = json.loads(out)
    assert d["success"] is True
    assert d["data"]["message"] == "executed."


def test_sql_csv_wide(spark, db):
    r(spark, INSERT_WIDE)
    out = r(spark, """
        SQL('select * from tag_data where name = ?', 'sql_test')
        CSV(header(true), timeformat('default'), tz('Local'))
    """)
    assert out == "\n".join([
        "NAME,TIME,VALUE,SHORT_VALUE,USHORT_VALUE,INT_VALUE,UINT_VALUE,"
        "LONG_VALUE,ULONG_VALUE,STR_VALUE,JSON_VALUE,IPV4_VALUE,"
        "IPV6_VALUE,BIN_VALUE",
        'sql_test,2026-07-10 17:10:20,3.142,-123,123,-1234,1234,-12345,'
        '12345,STR,"{""json"":true}",192.168.0.1,2001:db8::1,0x010203',
        "", ""])


def test_sql_markdown_wide(spark, db):
    r(spark, INSERT_WIDE)
    out = r(spark, """
        SQL('select * from tag_data where name = ?', 'sql_test')
        MARKDOWN(timeformat('default'), tz('Local'))
    """)
    assert out == "\n".join([
        "|NAME|TIME|VALUE|SHORT_VALUE|USHORT_VALUE|INT_VALUE|UINT_VALUE|"
        "LONG_VALUE|ULONG_VALUE|STR_VALUE|JSON_VALUE|IPV4_VALUE|"
        "IPV6_VALUE|BIN_VALUE|",
        "|:-----|:-----|:-----|:-----|:-----|:-----|:-----|:-----|:-----|"
        ":-----|:-----|:-----|:-----|:-----|",
        '|sql_test|2026-07-10 17:10:20|3.142000|-123|123|-1234|1234|'
        '-12345|12345|STR|{"json":true}|192.168.0.1|2001:db8::1|0x010203|',
        ""])


def test_sql_json_wide(spark, db):
    r(spark, INSERT_WIDE)
    out = r(spark, """
        SQL('select * from tag_data where name = ?', 'sql_test')
        JSON(timeformat('default'), tz('Local'))
    """)
    d = json.loads(out)
    assert d["success"] is True and d["reason"] == "success"
    assert d["data"]["columns"] == [
        "NAME", "TIME", "VALUE", "SHORT_VALUE", "USHORT_VALUE",
        "INT_VALUE", "UINT_VALUE", "LONG_VALUE", "ULONG_VALUE",
        "STR_VALUE", "JSON_VALUE", "IPV4_VALUE", "IPV6_VALUE", "BIN_VALUE"]
    assert d["data"]["types"] == [
        "string", "datetime", "double", "int16", "uint16", "int32",
        "uint32", "int64", "uint64", "string", "json", "ipv4", "ipv6",
        "binary"]
    assert d["data"]["rows"] == [[
        "sql_test", "2026-07-10 17:10:20", 3.142, -123, 123, -1234, 1234,
        -12345, 12345, "STR", '{"json":true}', "192.168.0.1",
        "2001:db8::1", "0x010203"]]


def test_sql_ndjson_wide(spark, db):
    r(spark, INSERT_WIDE)
    out = r(spark, """
        SQL('select * from tag_data where name = ?', 'sql_test')
        NDJSON(timeformat('default'), tz('Local'))
    """)
    assert out == (
        '{"NAME":"sql_test","TIME":"2026-07-10 17:10:20","VALUE":3.142,'
        '"SHORT_VALUE":-123,"USHORT_VALUE":123,"INT_VALUE":-1234,'
        '"UINT_VALUE":1234,"LONG_VALUE":-12345,"ULONG_VALUE":12345,'
        '"STR_VALUE":"STR","JSON_VALUE":"{\\"json\\":true}",'
        '"IPV4_VALUE":"192.168.0.1","IPV6_VALUE":"2001:db8::1",'
        '"BIN_VALUE":"0x010203"}' + "\n\n")


# ---------------------------------------------------------------------------
# TestTqlSqlShow* — catalog family
# ---------------------------------------------------------------------------

def csv_lines(spark, q):
    out = r(spark, f"SQL('{q}')\nCSV(header(true))")
    return out.split("\n")[:-2]   # body lines (strip the Close newline)


def test_show_wrong(spark, db):
    with pytest.raises(ValueError,
                       match=r'f\(SQL\) unsupported show command "wrong"'):
        r(spark, "SQL('show wrong')\nCSV(header(true))")


def test_show_info(spark, db):
    lines = csv_lines(spark, "show info")
    assert lines[0] == "NAME,VALUE"
    assert len(lines) >= 2


def test_show_license(spark, db):
    lines = csv_lines(spark, "show license")
    assert len(lines) == 2
    assert lines[0] == ("ID,TYPE,CUSTOMER,PROJECT,COUNTRY_CODE,"
                        "INSTALL_DATE,ISSUE_DATE,STATUS")
    assert re.match(
        r"^[0-9]+,[A-Z]+,[A-Z0-9]+,[A-Z0-9]+,[A-Z]{2},"
        r"[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2},"
        r"[0-9]{8},[A-Za-z]+$", lines[1])


def test_show_ports(spark, db):
    lines = csv_lines(spark, "show ports")
    assert lines[0] == "PORT,ADDRESS"
    assert len(lines) >= 2 and all("tcp://" in ln for ln in lines[1:])


def test_show_users(spark, db):
    assert csv_lines(spark, "show users") == ["USER_ID,NAME", "1,SYS"]


def test_show_tables(spark, db):
    lines = csv_lines(spark, "show tables")
    assert lines[0] == ("DATABASE_NAME,USER_NAME,TABLE_NAME,TABLE_ID,"
                        "TABLE_TYPE,TABLE_FLAG")
    assert re.match(r"^MACHBASEDB,SYS,LOG_DATA,[0-9]+,Log,$", lines[1])
    assert re.match(r"^MACHBASEDB,SYS,TAG_DATA,[0-9]+,Tag,$", lines[2])
    assert re.match(r"^MACHBASEDB,SYS,TAG_SIMPLE,[0-9]+,Tag,$", lines[3])


def test_show_tables_all(spark, db):
    lines = csv_lines(spark, "show tables --all")
    assert re.match(r"^MACHBASEDB,SYS,_TAG_DATA_DATA_0,[0-9]+,KeyValue,Data$",
                    lines[4])
    assert re.match(r"^MACHBASEDB,SYS,_TAG_DATA_META,[0-9]+,Lookup,Meta$",
                    lines[5])
    assert re.match(r"^MACHBASEDB,SYS,_TAG_SIMPLE_DATA_0,[0-9]+,KeyValue,Data$",
                    lines[6])
    assert re.match(r"^MACHBASEDB,SYS,_TAG_SIMPLE_META,[0-9]+,Lookup,Meta$",
                    lines[7])


LOG_DESC = [
    "COLUMN,TYPE,LENGTH,FLAG,INDEX",
    "TIME,datetime,31,,",
    "SHORT_VALUE,short,6,,",
    "USHORT_VALUE,ushort,5,,",
    "INT_VALUE,integer,11,,",
    "UINT_VALUE,uinteger,10,,",
    "LONG_VALUE,long,20,,",
    "ULONG_VALUE,ulong,20,,",
    "DOUBLE_VALUE,double,17,,",
    "FLOAT_VALUE,float,17,,",
    "STR_VALUE,varchar,400,,",
    "JSON_VALUE,json,32767,,",
    "IPV4_VALUE,ipv4,15,,",
    "IPV6_VALUE,ipv6,45,,",
    "TEXT_VALUE,text,67108864,,",
    "BIN_VALUE,binary,67108864,,",
]

TAG_DESC = [
    "COLUMN,TYPE,LENGTH,FLAG,INDEX",
    "NAME,varchar,100,tag name,",
    "TIME,datetime,31,base time,",
    "VALUE,double,17,summarized,",
    "SHORT_VALUE,short,6,,",
    "USHORT_VALUE,ushort,5,,",
    "INT_VALUE,integer,11,,",
    "UINT_VALUE,uinteger,10,,",
    "LONG_VALUE,long,20,,",
    "ULONG_VALUE,ulong,20,,",
    "STR_VALUE,varchar,400,,",
    "JSON_VALUE,json,32767,,",
    "IPV4_VALUE,ipv4,15,,",
    "IPV6_VALUE,ipv6,45,,",
    "BIN_VALUE,binary,32767,,",
]


def test_show_table_log_data(spark, db):
    assert csv_lines(spark, "show table log_data") == LOG_DESC


def test_show_table_log_data_all(spark, db):
    assert csv_lines(spark, "show table log_data --all") == (
        LOG_DESC[:1] + ["_ARRIVAL_TIME,datetime,31,,"] + LOG_DESC[1:]
        + ["_RID,long,20,,"])


def test_desc_tag_data(spark, db):
    assert csv_lines(spark, "desc tag_data") == TAG_DESC


def test_describe_tag_data_all(spark, db):
    assert csv_lines(spark, "describe tag_data --all") == (
        TAG_DESC + ["_RID,long,20,,"])


def test_show_indexes(spark, db):
    lines = csv_lines(spark, "show indexes")
    assert lines[0] == ("ID,DATABASE,USER,TABLE,COLUMN,INDEX_NAME,"
                        "INDEX_TYPE,KEY_COMPRESS,MAX_LEVEL,"
                        "PART_VALUE_COUNT,BITMAP_ENCODE")
    required = {
        "__PK_IDX__TAG_DATA_META_1": ("_TAG_DATA_META", "_ID"),
        "_TAG_DATA_META_NAME": ("_TAG_DATA_META", "NAME"),
        "__PK_IDX__TAG_SIMPLE_META_1": ("_TAG_SIMPLE_META", "_ID"),
        "_TAG_SIMPLE_META_NAME": ("_TAG_SIMPLE_META", "NAME"),
    }
    seen = set()
    for ln in lines[1:]:
        f = ln.split(",")
        assert len(f) >= 11
        if f[5] not in required:
            continue
        table, column = required[f[5]]
        assert f[1] == "MACHBASEDB" and f[2] == "SYS"
        assert f[3] == table and f[4] == column and f[6] == "REDBLACK"
        seen.add(f[5])
    assert seen == set(required)


def test_show_index_single(spark, db):
    lines = csv_lines(spark, "show index _TAG_DATA_META_NAME")
    assert len(lines) == 2
    f = lines[1].split(",")
    assert f[3:7] == ["_TAG_DATA_META", "NAME", "_TAG_DATA_META_NAME",
                      "REDBLACK"]
    assert f[7:] == ["UNCOMPRESSED", "0", "100000", "EQUAL"]


def test_show_indexgap_lsm_headers(spark, db):
    assert csv_lines(spark, "show indexgap") == [
        "INDEX_ID,TABLE_NAME,INDEX_NAME,GAP"]
    assert csv_lines(spark, "show lsm") == [
        "TABLE_NAME,INDEX_NAME,LEVEL,COUNT"]


def test_show_tags_flow(spark, db):
    out = r(spark, """
        SCRIPT({$.yield('show_test', 1.234)})
        SQL('insert into tag_data (name,time,value) values(?,now,?)', value(0), value(1))
    """)
    d = json.loads(out)
    assert d["success"] and d["data"]["message"] == "a row inserted."
    out = r(spark, """
        FAKE(once(1))
        SQL('exec table_flush(tag_data)')
    """)
    assert json.loads(out)["data"]["message"] == "executed."
    lines = csv_lines(spark, "show tags tag_data")
    assert lines[0] == ("ID,NAME,ROW_COUNT,MIN_TIME,MAX_TIME,"
                        "RECENT_ROW_TIME,MIN_VALUE,MIN_VALUE_TIME,"
                        "MAX_VALUE,MAX_VALUE_TIME")
    assert any("show_test" in ln for ln in lines[1:])
    assert any("1.234" in ln for ln in lines[1:])


def test_show_tags_errors(spark, db):
    with pytest.raises(ValueError,
                       match=r"f\(SQL\) show tags expects at least 1 "
                             r"argument, got 0"):
        r(spark, "SQL('show tags')\nCSV(header(true))")
    with pytest.raises(ValueError,
                       match=r"table 'LOG_DATA' is not a tag table"):
        r(spark, "SQL('show tags log_data')\nCSV(header(true))")


def test_show_gap_and_server_views(spark, db):
    assert csv_lines(spark, "show tagindexgap")[0] == (
        "TABLE_ID,TABLE_NAME,STATUS,DISK_GAP,MEMORY_GAP")
    assert csv_lines(spark, "show rollupgap")[0] == (
        "USER_NAME,ROLLUP_NAME,SRC_TABLE,ROLLUP_TABLE,SRC_END_RID,"
        "ROLLUP_END_RID,GAP,RUN_STATE,LAST_ELAPSED_MSEC,LAST_WAKEUP_TIME,"
        "NEXT_WAKEUP_TIME")
    lines = csv_lines(spark, "show sessions")
    assert lines[0] == ("ID,USER_NAME,USER_ID,LOGIN_TIME,TYPE,USER_IP,"
                        "MAX_QPX_MEM")
    assert re.match(r"^[0-9]+,[A-Z]+,[0-9]+,[0-9]+,CLI,.+,"
                    r"[0-9]+([.][0-9]+)?[KMG]?B$", lines[1])
    lines = csv_lines(spark, "show statements")
    assert lines[0] == "ID,SESSION_ID,STATE,RECORD_SIZE,QUERY"
    assert re.match(r"^[0-9]+,[0-9]+,.+,[0-9]+,.+$", lines[1])
    lines = csv_lines(spark, "show storage")
    assert lines[0] == ("DATABASE_NAME,TABLE_NAME,DATA_SIZE,INDEX_SIZE,"
                        "TOTAL_SIZE")
    assert re.search(r"[A-Z_]+,[A-Z0-9_]+,[0-9]+,[0-9]+,[0-9]+$", lines[1])
    lines = csv_lines(spark, "show table-usage")
    assert lines[0] == "DATABASE,USER,TABLE,STORAGE_USAGE"
    assert re.match(r"^.+,.+,.+,[0-9]+$", lines[1])


# ---------------------------------------------------------------------------
# TestTqlSqlExplain
# ---------------------------------------------------------------------------

def test_sql_explain(spark, db):
    out = r(spark, """
        SQL('explain select * from tag_data')
        CSV(header(true))
    """)
    assert len(out) > 50
    assert "Physical Plan" in out      # this engine's native plan text


def test_sql_explain_full(spark, db):
    out = r(spark, """
        SQL('explain full select * from tag_data')
        CSV(header(true))
    """)
    assert len(out) > len(run_script(spark, """
        SQL('explain select * from tag_data')
        CSV(header(true))
    """))
    assert "Parsed Logical Plan" in out and "Physical Plan" in out


# ---------------------------------------------------------------------------
# UPDATE / DELETE on engine tables (VOLATILE/LOOKUP mutable-table surface)
# ---------------------------------------------------------------------------

def test_update_delete_engine_table(spark, db):
    from neo_server_spark.sqlx import ddl
    ddl.exec_sql(spark, "CREATE LOOKUP TABLE CFG("
                        "k varchar(40), v double, note varchar(100))")
    for row in [("'a', 1.5, 'one'"), ("'b', 2.5, 'two'"),
                ("'c', 3.5, NULL")]:
        ddl.exec_sql(spark, f"INSERT INTO cfg VALUES ({row})")
    n = ddl.exec_sql(spark,
                     "UPDATE cfg SET v = v * 2, note = 'upd' WHERE k <> ?",
                     ("a",))
    assert n == 2
    got = {r.k: (r.v, r.note) for r in spark.table("cfg").collect()}
    assert got == {"a": (1.5, "one"), "b": (5.0, "upd"), "c": (7.0, "upd")}
    # NULL predicate rows are not deleted (SQL delete semantics)
    n = ddl.exec_sql(spark, "DELETE FROM cfg WHERE note = 'nope'")
    assert n == 0 and spark.table("cfg").count() == 3
    n = ddl.exec_sql(spark, "DELETE FROM cfg WHERE v > ?", (5.0,))
    assert n == 1
    assert {r.k for r in spark.table("cfg").collect()} == {"a", "b"}


def test_update_delete_through_sql_sink(spark, db):
    from neo_server_spark.sqlx import ddl
    ddl.exec_sql(spark, "CREATE LOOKUP TABLE CFG2(k varchar(40), v long)")
    ddl.exec_sql(spark, "INSERT INTO cfg2 VALUES ('x', 1)")
    ddl.exec_sql(spark, "INSERT INTO cfg2 VALUES ('y', 2)")
    out = r(spark, """
        FAKE(once(1))
        SQL('update cfg2 set v = v + 10 where k = ?', 'x')
    """)
    assert json.loads(out)["data"]["message"] == "a row updated."
    assert {x.k: x.v for x in spark.table("cfg2").collect()} == \
        {"x": 11, "y": 2}
    out = r(spark, """
        FAKE(once(1))
        SQL('delete from cfg2')
    """)
    assert json.loads(out)["data"]["message"] == "2 rows deleted."
    assert spark.table("cfg2").count() == 0


def test_explain_flag_grammar(spark, db):
    """fm_dbsrc_internal_test.go TestSplitExplainSQLText: '--full' flag,
    bare 'full', a '--' delimiter before the statement, and the missing-
    statement error."""
    out = r(spark, "SQL('EXPLAIN --full select * from tag_data')"
                   "\nCSV(header(true))")
    assert "Parsed Logical Plan" in out
    out = r(spark, "SQL('explain -- select * from tag_data')"
                   "\nCSV(header(true))")
    assert "Parsed Logical Plan" not in out and "Physical Plan" in out
    with pytest.raises(ValueError,
                       match=r"f\(SQL\) missing statement after explain "
                             r"options"):
        r(spark, "SQL('explain --full')\nCSV(header(true))")
