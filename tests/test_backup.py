"""BACKUP / MOUNT surface (mods/backup/backupd.go parity): the BACKUP SQL
verbs over the DDL catalog, archive manifests, mounted read-only views,
V$STORAGE_MOUNT_DATABASES, and the /web/api/backup HTTP router."""

import json
import os
import time
import urllib.request

import pytest

from neo_server_spark.sqlx import backup as bk
from neo_server_spark.sqlx import ddl


@pytest.fixture()
def catalog(spark):
    saved = dict(ddl._TABLES)
    ddl._TABLES.clear()
    saved_mounts = dict(bk._MOUNTS)
    bk._MOUNTS.clear()
    ddl.exec_sql(spark, "CREATE TAG TABLE EXAMPLE("
                        "name varchar(40) primary key, "
                        "time datetime basetime, "
                        "value double summarized)")
    for i in range(1, 6):
        ddl.exec_sql(spark, "INSERT INTO example VALUES (?, ?, ?)",
                     (f"tag{i % 2}", i * 10**9, 1.5 * i))
    ddl.exec_sql(spark, "CREATE LOOKUP TABLE DIMS(k varchar(10) primary key,"
                        " v integer)")
    ddl.exec_sql(spark, "INSERT INTO dims VALUES (?, ?)", ("a", 1))
    yield
    for n in list(ddl._TABLES):     # drop views too, not just registry rows
        try:
            ddl.drop_table(spark, n)
        except Exception:
            pass
    ddl._TABLES.clear()
    ddl._TABLES.update(saved)
    for n in ddl._TABLES:
        ddl._refresh_view(spark, n)
    for n in list(bk._MOUNTS):
        try:
            bk.unmount_database(spark, n)
        except Exception:
            pass
    bk._MOUNTS.update(saved_mounts)


def test_backup_database_full_and_restore(spark, catalog, tmp_path):
    p = str(tmp_path / "bk1")
    n = ddl.exec_sql(spark, f"BACKUP DATABASE INTO DISK = '{p}'")
    assert n == 6     # 5 tag rows + 1 lookup row
    assert os.path.exists(os.path.join(p, bk.MANIFEST_NAME))
    man = json.load(open(os.path.join(p, bk.MANIFEST_NAME)))
    assert set(man["tables"]) == {"example", "dims"}
    assert man["tables"]["example"]["max_time_ns"] == 5 * 10**9

    ddl.exec_sql(spark, "DROP TABLE example")
    ddl.exec_sql(spark, "DROP TABLE dims")
    assert not ddl.has_table("example")
    got = ddl.exec_sql(spark, f"RESTORE DATABASE FROM DISK = '{p}'")
    assert got == 6
    assert ddl.has_table("example") and ddl.has_table("dims")
    rows = spark.sql("select count(*) n from example").collect()
    assert rows[0]["n"] == 5


def test_backup_table_time_bounded(spark, catalog, tmp_path):
    p = str(tmp_path / "bk_time")
    # [2s, 4s) — FROM is inclusive, TO exclusive (machbase duration range)
    n = ddl.exec_sql(
        spark, "BACKUP TABLE example FROM FROM_UNIXTIME(2) "
               f"TO FROM_UNIXTIME(4) INTO DISK = '{p}'")
    assert n == 2
    man = json.load(open(os.path.join(p, bk.MANIFEST_NAME)))
    assert man["tables"]["example"]["n_archived"] == 2


def test_backup_incremental_after(spark, catalog, tmp_path):
    full = str(tmp_path / "full")
    ddl.exec_sql(spark, f"BACKUP TABLE example INTO DISK = '{full}'")
    for i in (6, 7):
        ddl.exec_sql(spark, "INSERT INTO example VALUES (?, ?, ?)",
                     ("tagx", i * 10**9, float(i)))
    inc = str(tmp_path / "inc")
    n = ddl.exec_sql(
        spark, f"BACKUP TABLE example AFTER '{full}' INTO DISK = '{inc}'")
    assert n == 2     # only the rows appended since the full backup


def test_mount_query_and_unmount(spark, catalog, tmp_path):
    p = str(tmp_path / "bkm")
    ddl.exec_sql(spark, f"BACKUP DATABASE INTO DISK = '{p}'")
    ddl.exec_sql(spark, f"MOUNT DATABASE '{p}' TO 'arch1'")

    from neo_server_spark.sqlx.dialect import lake_sql
    # machbase mounted-table reference: mount_name.table
    got = lake_sql(spark, "select count(*) n from arch1.example").collect()
    assert got[0]["n"] == 5
    # 3-part form mount_name.user.table
    got = lake_sql(spark, "select v from arch1.sys.dims").collect()
    assert got[0]["v"] == 1
    # the system view the reference's handlers query
    mounts = lake_sql(
        spark, "SELECT NAME, PATH, MOUNTDB FROM "
               "V$STORAGE_MOUNT_DATABASES").collect()
    assert [(m["NAME"], m["MOUNTDB"]) for m in mounts] == [("arch1", "ARCH1")]

    ddl.exec_sql(spark, "UNMOUNT DATABASE 'arch1'")
    assert bk.mounts() == {}
    with pytest.raises(Exception):
        lake_sql(spark, "select count(*) from arch1.example").collect()


def test_mount_rewrite_is_token_aware(spark, catalog, tmp_path):
    """While a mount exists, only table references rewrite: an alias that
    collides with the mount name keeps its column semantics, string
    literals are untouched, and comma lists in FROM rewrite per item."""
    p = str(tmp_path / "bkrw")
    ddl.exec_sql(spark, f"BACKUP DATABASE INTO DISK = '{p}'")
    ddl.exec_sql(spark, f"MOUNT DATABASE '{p}' TO 'arch1'")
    from neo_server_spark.sqlx.dialect import lake_sql

    # alias == mount name, column == archived table name -> must stay a
    # column reference (the r8 blanket rewrite hijacked it)
    got = lake_sql(spark, "select arch1.example as v from "
                          "(select 42 as example) arch1").collect()
    assert got[0]["v"] == 42
    # string literal containing a mount-qualified name stays verbatim
    got = lake_sql(spark, "select 'arch1.example' as s, count(*) n "
                          "from arch1.example group by 1").collect()
    assert (got[0]["s"], got[0]["n"]) == ("arch1.example", 5)
    # comma-separated FROM list rewrites each item
    got = lake_sql(spark, "select count(*) n from arch1.example e, "
                          "arch1.sys.dims d").collect()
    assert got[0]["n"] == 5
    # JOIN after an alias-less table: JOIN must not be eaten as an alias
    got = lake_sql(spark, "select count(*) n from arch1.example "
                          "join arch1.dims on 1=1").collect()
    assert got[0]["n"] == 5
    got = lake_sql(spark, "select count(*) n from (select 1 as z) "
                          "join arch1.example on 1=1").collect()
    assert got[0]["n"] == 5
    ddl.exec_sql(spark, "UNMOUNT DATABASE 'arch1'")


def test_mount_rewrite_property_fuzz(spark, catalog, tmp_path):
    """Property suite (r9 VERDICT #5): 240+ generated queries with
    aliases / CTE names / derived-table names colliding with the mount
    name, JOIN chains with and without aliases, comma lists, string
    literals, and subqueries after FROM.  Ground truth: the same query
    with every ``arch1[.sys].<t>`` reference replaced by its mounted
    view name directly — both must parse and return identical rows."""
    import random

    p = str(tmp_path / "bkfz")
    ddl.exec_sql(spark, f"BACKUP DATABASE INTO DISK = '{p}'")
    ddl.exec_sql(spark, f"MOUNT DATABASE '{p}' TO 'arch1'")
    from neo_server_spark.sqlx.dialect import lake_sql

    view = {"example": bk._mount_view("arch1", "example"),
            "dims": bk._mount_view("arch1", "dims")}
    refs = ["arch1.example", "arch1.sys.example",
            "arch1.dims", "arch1.sys.dims"]
    aliases = ["", " t", " as t", " arch1", " as arch1", " example",
               " e1", " as dims"]
    rng = random.Random(20260815)

    def direct(q):        # ground-truth form: views named outright
        for t, v in view.items():
            q = (q.replace(f"arch1.sys.{t}", v)
                  .replace(f"arch1.{t}", v))
        return q

    def run(q):
        rw = lake_sql(spark, q)
        gt = lake_sql(spark, direct(q))
        assert sorted(map(tuple, rw.collect())) == \
            sorted(map(tuple, gt.collect())), q

    checked = 0
    for _ in range(60):                       # single-table + alias + filter
        r, a = rng.choice(refs), rng.choice(aliases)
        name = (a.replace(" as ", " ").strip() or r)
        q = f"select count(*) as n from {r}{a}"
        if rng.random() < 0.5 and a.strip():
            q += f" where {name.split('.')[0]}.name is not null" \
                if "example" in r else ""
        run(q); checked += 1
    for _ in range(60):                       # two-table JOINs, alias-less ok
        r1, r2 = rng.choice(refs), rng.choice(refs)
        a1, a2 = rng.choice(aliases), rng.choice(aliases)
        if a1.strip() and a1 == a2:
            a2 = " t2"
        jk = rng.choice(["join", "left join", "cross join", "inner join"])
        on = "" if "cross" in jk else " on 1=1"
        run(f"select count(*) as n from {r1}{a1} {jk} {r2}{a2}{on}")
        checked += 1
    for _ in range(40):                       # comma lists of 2-3 items
        items = [rng.choice(refs) + rng.choice(["", " a", " b", " arch1"])
                 for _ in range(rng.randint(2, 3))]
        seen, out = set(), []
        for it in items:                      # dedupe aliases
            parts = it.split()
            if len(parts) > 1 and parts[-1] in seen:
                it = parts[0]
            if len(parts) > 1:
                seen.add(parts[-1])
            out.append(it)
        run("select count(*) as n from " + ", ".join(out)); checked += 1
    for _ in range(40):                       # literals + alias collisions
        r = rng.choice(refs)
        got = lake_sql(spark, f"select 'from {r}' as s, count(*) as n "
                              f"from {r} group by 1").collect()
        assert got[0]["s"] == f"from {r}", r    # literal stays verbatim
        run(f"select arch1.v as v from (select 42 as v) arch1 "
            f"join {r} on 1=1 limit 1")
        checked += 2
    for _ in range(40):                       # CTE shadowing the mount name
        r = rng.choice(refs)
        run(f"with arch1 as (select count(*) as n from {r}) "
            f"select n from arch1")
        checked += 1
    assert checked >= 240
    ddl.exec_sql(spark, "UNMOUNT DATABASE 'arch1'")


def test_mount_errors(spark, catalog, tmp_path):
    with pytest.raises(ddl.DdlError):
        ddl.exec_sql(spark, f"MOUNT DATABASE '{tmp_path}/nope' TO 'm1'")
    with pytest.raises(ddl.DdlError):
        ddl.exec_sql(spark, "UNMOUNT DATABASE 'm1'")


# ----------------------------------------------------------------- HTTP

@pytest.fixture()
def server(spark, catalog, tmp_path):
    from neo_server_spark.server.http_api import EngineHttpServer
    srv = EngineHttpServer(spark, backup_dir=str(tmp_path))
    port = srv.start()
    yield f"http://127.0.0.1:{port}", str(tmp_path)
    srv.stop()


def _req(url, method="GET", body=None):
    req = urllib.request.Request(
        url, data=body, method=method,
        headers={"Content-Type": "application/json"} if body else {})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_http_archive_roundtrip(server, spark):
    base, bdir = server
    # POST /archive — full database backup, relative path rooted at baseDir
    st, rsp = _req(base + "/web/api/backup/archive", "POST", json.dumps(
        {"type": "database", "duration": {"type": "full"},
         "path": "arch_a"}).encode())
    assert st == 200 and rsp["success"]
    for _ in range(100):           # async runner (backupd.go backupManager)
        st, rsp = _req(base + "/web/api/backup/archive/status")
        if st == 200 and not rsp["data"]:
            break
        time.sleep(0.1)
    assert st == 200 and rsp["success"]
    assert os.path.exists(os.path.join(bdir, "arch_a", bk.MANIFEST_NAME))

    # archives listing finds the manifest dir
    st, rsp = _req(base + "/web/api/backup/archives")
    assert st == 200
    assert rsp["data"] == [{"path": "arch_a", "isMount": False}]

    # mount it through the router, then list mounts
    st, rsp = _req(base + "/web/api/backup/mounts/m1", "POST",
                   json.dumps({"path": "arch_a"}).encode())
    assert st == 200 and rsp["success"]
    st, rsp = _req(base + "/web/api/backup/mounts")
    assert st == 200 and [m["name"] for m in rsp["data"]] == ["m1"]
    st, rsp = _req(base + "/web/api/backup/archives")
    assert rsp["data"][0] == {"path": "arch_a", "isMount": True,
                              "mountName": "m1"}

    # unmount via DELETE
    st, rsp = _req(base + "/web/api/backup/mounts/m1", "DELETE")
    assert st == 200 and rsp["success"]
    assert bk.mounts() == {}


def test_http_archive_validation(server):
    base, _ = server
    st, rsp = _req(base + "/web/api/backup/archive", "POST", json.dumps(
        {"type": "table", "duration": {"type": "full"},
         "path": "x"}).encode())
    assert st == 400 and rsp["reason"] == "table name is empty"
    st, rsp = _req(base + "/web/api/backup/archive", "POST", json.dumps(
        {"type": "nope", "duration": {"type": "full"}, "path": "x"}).encode())
    assert st == 400 and "invalid backup" in rsp["reason"]
    st, rsp = _req(base + "/web/api/backup/archive", "POST", json.dumps(
        {"type": "database", "duration": {"type": "weird"},
         "path": "x"}).encode())
    assert st == 400 and "invalid backup type" in rsp["reason"]
