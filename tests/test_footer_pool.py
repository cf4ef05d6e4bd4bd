"""Thread-pooled driver footer reads (r15 verdict #4): a wide rewrite
staging thousands of files must not serialize O(files) parquet metadata
opens on the driver.  These tests pin correctness of the pooled helpers
over a 5k-file staged layout (pure pyarrow fixtures — no Spark)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neo_server_spark import txlog


@pytest.fixture(scope="module")
def staged_5k(tmp_path_factory):
    """A txlog-shaped dir with 5,000 tiny staged data files."""
    table = str(tmp_path_factory.mktemp("footer_pool") / "tbl")
    os.makedirs(os.path.join(table, "data"))
    rels = []
    for i in range(5000):
        rel = f"data/f-{i:05d}.parquet"
        pq.write_table(
            pa.table({"event_id": pa.array([i, i + 1], pa.int64())}),
            os.path.join(table, rel))
        rels.append(rel)
    return table, rels


def test_staged_rows_5k(staged_5k):
    table, rels = staged_5k
    assert txlog.staged_rows(table, rels) == 10_000
    # small sets take the serial path — same answer
    assert txlog.staged_rows(table, rels[:3]) == 6


def test_file_stats_5k_order_and_values(staged_5k):
    table, rels = staged_5k
    stats = txlog._file_stats(table, rels, ["event_id"])
    assert len(stats) == 5000
    # order preserved (dict insertion order == rels order)
    assert list(stats)[:3] == rels[:3]
    assert stats[rels[0]]["event_id"] == [0, 1]
    assert stats[rels[4999]]["event_id"] == [4999, 5000]


def test_dv_tomb_rows_missing_file_is_none(staged_5k):
    table, rels = staged_5k
    paths = [os.path.join(table, r) for r in rels[:100]]
    assert txlog._dv_tomb_rows(paths) == 200
    assert txlog._dv_tomb_rows(
        paths + [os.path.join(table, "data/vanished.parquet")]) is None


def test_pmap_meta_preserves_order():
    out = txlog._pmap_meta(lambda x: x * x, range(100))
    assert out == [x * x for x in range(100)]
    # serial small path
    assert txlog._pmap_meta(lambda x: -x, [1, 2, 3]) == [-1, -2, -3]
