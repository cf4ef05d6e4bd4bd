"""Bridge registry tests (mods/bridge/registry.go parity) — option plumbing
only; no JDBC drivers ship in this container."""

import pytest

from neo_server_spark.sources.bridge import BridgeRegistry


def test_bridge_registry_lifecycle():
    reg = BridgeRegistry()
    br = reg.register("pg1", "postgres", "jdbc:postgresql://h/db", user="u")
    assert reg.get("pg1") is br and reg.names() == ["pg1"]
    reg.unregister("pg1")
    with pytest.raises(KeyError, match="undefined bridge"):
        reg.get("pg1")


def test_bridge_rejects_unknown_type():
    reg = BridgeRegistry()
    with pytest.raises(ValueError, match="undefined bridge type"):
        reg.register("x", "nats", "nats://h")


def test_bridge_reader_options(spark):
    reg = BridgeRegistry()
    br = reg.register("lite", "sqlite", "jdbc:sqlite:/tmp/x.db")
    # plan construction works; execution needs the driver jar
    with pytest.raises(Exception):
        br.sql(spark, "select 1").collect()
