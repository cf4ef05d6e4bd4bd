"""The bench driver-tail contract (r15 verdict #2): the compact line the
verification driver records (last 2,000 chars of stdout) must carry the
per-query best for EVERY bench entry — in r15 the A/B payload pushed the
line over the window and the trim evicted the 14 fastest queries, which
PERF then mislabeled "dropped_from_bench"."""

import json

import bench


def _mk_inputs(q_sec: float, n_noise: int = 0):
    timings = {k: q_sec for k in bench.BENCH_QUERIES}
    reps = {k: ([q_sec, q_sec * 3.0] if i < n_noise else [q_sec, q_sec])
            for i, k in enumerate(bench.BENCH_QUERIES)}
    section_stats = {s: {"sum_best_sec": round(q_sec * 8, 3)}
                     for s in ("stable44", "round7", "round8", "round9",
                               "round10", "round11", "round12", "round13",
                               "round15")}
    ingest = {"ingest_3col_rows_per_sec": 2_119_774}
    quiesce = {"loadavg_after": 2.71}
    ab = {"ratio": 1.0555, "stale": True, "measured_at": "6e10d891f539",
          "base_commit": "8410766d0440",
          "sections": {s: {"ratio": 1.01} for s in section_stats}}
    abt = {"q": {k: 0.93 for k in list(bench.BENCH_QUERIES)[:10]},
           "ingest": {}, "pairs": 3, "conv": True,
           "base": "8410766d0440"}
    return timings, reps, section_stats, ingest, quiesce, ab, abt


def test_tail_carries_every_query_worst_case():
    """Slow box (10s/query), every noise flag lit, full A/B payloads:
    the line still fits AND still names all 76 queries."""
    args = _mk_inputs(10.0, n_noise=len(bench.BENCH_QUERIES))
    line = bench._compact_tail(760.0, 0.1, 430.0, *args)
    assert len(line) <= 1950
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["unit"] == "sec"
    assert parsed["metric"] == "headline_queries_total_runtime"


def test_tail_typical_keeps_key_telemetry():
    """Quiet box: all queries present AND the cross-round telemetry
    (sections, ingest rate) fits alongside."""
    args = _mk_inputs(0.6, n_noise=3)
    line = bench._compact_tail(45.6, 0.1, 19.0, *args)
    assert len(line) <= 1950
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert "sections_sec" in parsed
    assert parsed["ingest_rows_per_sec"] == 2_119_774


def test_tail_noise_capped_not_queries():
    """A loaded box flags many spreads: the noise map is capped (count
    preserved) — never the query map."""
    args = _mk_inputs(1.2, n_noise=30)
    line = bench._compact_tail(91.2, 0.1, 50.0, *args)
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    if "noise" in parsed:
        flagged = {k: v for k, v in parsed["noise"].items()
                   if k != "_more"}
        assert len(flagged) <= 4
        assert parsed["noise"].get("_more", 0) >= 26
