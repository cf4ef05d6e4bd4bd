"""Auth surface (server/auth.py + the http_api middlewares): JWT
login/relogin/logout/check/chpasswd, proxy-login parsing, client API
keys over /web/api/keys, and the two route gates — /web/* behind the
access JWT (handleJwtToken, http.go:393-445), /db|/lakes behind client
tokens or ?token= (handleAuthToken, http.go:458-497)."""

import json
import time
import urllib.error
import urllib.parse
import urllib.request

import pytest

from neo_server_spark.server.auth import (AuthError, Authenticator,
                                          parse_proxy_login)


# ------------------------------------------------------------- unit layer

def test_parse_proxy_login():
    assert parse_proxy_login("sys") == ("sys", "", False)
    assert parse_proxy_login("SYS as Other") == ("other", "sys", True)
    assert parse_proxy_login("alice") == ("alice", "", False)


def test_login_verify_and_rotation():
    a = Authenticator()
    with pytest.raises(AuthError, match="wrong password"):
        a.login("sys", "nope")
    access, refresh = a.login("sys", "manager")
    assert a.verify_access(access)["sub"] == "sys"
    with pytest.raises(AuthError, match="not an access token"):
        a.verify_access(refresh)
    # relogin rotates: the old refresh token is single-use
    a2, r2 = a.relogin(refresh)
    assert a.verify_access(a2)["sub"] == "sys"
    with pytest.raises(AuthError, match="refresh token not found"):
        a.relogin(refresh)
    a.logout(r2)
    with pytest.raises(AuthError, match="refresh token not found"):
        a.relogin(r2)


def test_expired_access_token():
    a = Authenticator(access_ttl_s=-1)
    access, _ = a.login("sys", "manager")
    with pytest.raises(AuthError, match="expired"):
        a.verify_access(access)
    claims = a.verify_access(access, allow_expired=True)
    assert claims["_expired"] and claims["sub"] == "sys"


def test_tampered_token_rejected():
    a = Authenticator()
    access, _ = a.login("sys", "manager")
    h, b, s = access.split(".")
    import base64

    body = json.loads(base64.urlsafe_b64decode(b + "=="))
    body["sub"] = "root"
    forged = base64.urlsafe_b64encode(
        json.dumps(body).encode()).rstrip(b"=").decode()
    with pytest.raises(AuthError, match="signature"):
        a.verify_access(f"{h}.{forged}.{s}")


def test_client_keys():
    a = Authenticator()
    rec = a.gen_key("edge-01")
    assert a.validate_client_token(rec["token"])
    assert not a.validate_client_token("edge-01:b:deadbeef")
    assert not a.validate_client_token(rec["token"] + "0")
    with pytest.raises(AuthError, match="duplicate"):
        a.gen_key("edge-01")
    with pytest.raises(AuthError, match="invalid letter"):
        a.gen_key("9bad id")
    # expired window fails validation
    old = a.gen_key("old-key", not_before=1000, not_after=2000)
    assert not a.validate_client_token(old["token"])
    assert a.del_key("edge-01")
    assert not a.validate_client_token(rec["token"])
    assert [k["id"] for k in a.list_keys()] == ["old-key"]


# -------------------------------------------------------------- http layer

@pytest.fixture()
def auth_server(spark, sf_dir, tmp_path):
    from neo_server_spark.server.http_api import EngineHttpServer
    from neo_server_spark.sqlx import ddl
    saved = dict(ddl._TABLES)
    ddl._TABLES.clear()
    ddl.exec_sql(spark, "CREATE TAG TABLE EXAMPLE("
                        "name varchar(40) primary key, "
                        "time datetime basetime, "
                        "value double summarized)")
    ddl.exec_sql(spark, "INSERT INTO example VALUES (?, ?, ?)",
                 ("tag0", 10**9, 1.5))
    srv = EngineHttpServer(spark, sf_dir=sf_dir, fs_root=str(tmp_path),
                           auth=Authenticator())
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()
    ddl._TABLES.clear()
    ddl._TABLES.update(saved)


def _req(url, body=None, method=None, bearer=None):
    headers = {"Content-Type": "application/json"}
    if bearer:
        headers["Authorization"] = f"Bearer {bearer}"
    req = urllib.request.Request(
        url, data=json.dumps(body).encode() if body is not None else None,
        headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read().decode())


def test_http_login_flow(auth_server):
    # no token -> 401 on a web route, 401 on a db route
    st, rsp = _req(f"{auth_server}/web/api/tables")
    assert st == 401 and "authorization" in rsp["reason"]
    st, rsp = _req(f"{auth_server}/db/query?q=select+1")
    assert st == 401
    # bad password -> 404 (reference status, http.go:706)
    st, rsp = _req(f"{auth_server}/web/api/login",
                   {"loginName": "sys", "password": "x"})
    assert st == 404 and not rsp["success"]
    # missing loginName -> 400
    st, rsp = _req(f"{auth_server}/web/api/login", {"password": "x"})
    assert st == 400
    # good login -> token pair; check + a protected route pass
    st, rsp = _req(f"{auth_server}/web/api/login",
                   {"loginName": "sys", "password": "manager"})
    assert st == 200 and rsp["success"]
    access, refresh = rsp["accessToken"], rsp["refreshToken"]
    st, _ = _req(f"{auth_server}/web/api/check", bearer=access)
    assert st == 200
    st, rsp = _req(f"{auth_server}/web/api/tables", bearer=access)
    assert st == 200
    # the access JWT also opens /db/query (web console behavior)
    q = urllib.parse.quote("select count(*) AS n from example")
    st, rsp = _req(f"{auth_server}/db/query?q={q}&format=json",
                   bearer=access)
    assert st == 200 and rsp["data"]["rows"] == [[1]]
    # relogin rotates; logout kills the new refresh token
    st, rsp = _req(f"{auth_server}/web/api/relogin",
                   {"refreshToken": refresh}, bearer=access)
    assert st == 200 and rsp["success"]
    refresh2 = rsp["refreshToken"]
    st, rsp = _req(f"{auth_server}/web/api/relogin",
                   {"refreshToken": refresh}, bearer=access)
    assert st == 401
    st, rsp = _req(f"{auth_server}/web/api/logout",
                   {"refreshToken": refresh2}, bearer=access)
    assert st == 200
    st, rsp = _req(f"{auth_server}/web/api/relogin",
                   {"refreshToken": refresh2}, bearer=access)
    assert st == 401


def test_http_api_keys_and_db_token(auth_server):
    st, rsp = _req(f"{auth_server}/web/api/login",
                   {"loginName": "sys", "password": "manager"})
    access = rsp["accessToken"]
    # keys demand the JWT
    st, _ = _req(f"{auth_server}/web/api/keys")
    assert st == 401
    st, rsp = _req(f"{auth_server}/web/api/keys",
                   {"name": "sensor-7"}, bearer=access)
    assert st == 200 and rsp["token"].startswith("sensor-7:b:")
    token = rsp["token"]
    st, rsp = _req(f"{auth_server}/web/api/keys", bearer=access)
    assert st == 200 and [k["id"] for k in rsp["data"]] == ["sensor-7"]
    # the client token opens /db and /lakes, as Bearer and as ?token=
    q = urllib.parse.quote("select count(*) AS n from example")
    st, rsp = _req(f"{auth_server}/db/query?q={q}&format=json",
                   bearer=token)
    assert st == 200 and rsp["data"]["rows"] == [[1]]
    tok_qs = urllib.parse.quote(token)
    st, rsp = _req(f"{auth_server}/db/query?q={q}&format=json"
                   f"&token={tok_qs}")
    assert st == 200
    st, rsp = _req(f"{auth_server}/lakes/tags?token={tok_qs}")
    assert st == 200
    # but NOT /web routes (client keys are not web sessions)
    st, rsp = _req(f"{auth_server}/web/api/tables", bearer=token)
    assert st == 401
    # delete closes the door
    st, rsp = _req(f"{auth_server}/web/api/keys/sensor-7",
                   method="DELETE", bearer=access)
    assert st == 200
    st, rsp = _req(f"{auth_server}/db/query?q={q}", bearer=token)
    assert st == 401


def test_http_chpasswd(auth_server):
    st, rsp = _req(f"{auth_server}/web/api/login",
                   {"loginName": "sys", "password": "manager"})
    access = rsp["accessToken"]
    st, rsp = _req(f"{auth_server}/web/api/chpasswd",
                   {"newPassword": "s3cret"}, bearer=access)
    assert st == 200
    st, _ = _req(f"{auth_server}/web/api/login",
                 {"loginName": "sys", "password": "manager"})
    assert st == 404
    st, rsp = _req(f"{auth_server}/web/api/login",
                   {"loginName": "sys", "password": "s3cret"})
    assert st == 200 and rsp["success"]


def test_open_server_unchanged(spark, sf_dir, tmp_path):
    """auth=None (default) leaves every route open — the pre-round-11
    behavior and the reference's enableTokenAuth=false default."""
    from neo_server_spark.server.http_api import EngineHttpServer
    srv = EngineHttpServer(spark, sf_dir=sf_dir, fs_root=str(tmp_path))
    port = srv.start()
    try:
        q = urllib.parse.quote("select 1 AS one")
        st, rsp = _req(f"http://127.0.0.1:{port}/db/query?q={q}"
                       f"&format=json")
        assert st == 200 and rsp["data"]["rows"] == [[1]]
    finally:
        srv.stop()
