"""Property-based tests (hypothesis) — operator invariants on random data.

Complements the golden/oracle tests: these check algebraic laws that must
hold for ANY input, with a sequential Python model as the reference
implementation (the same role the reference's Go row-loop plays).
"""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo_server_spark.operators import maps, series
from neo_server_spark.functions.timefn import round_time

prop = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1, max_size=40,
)


@prop
@given(vs=values)
def test_map_diff_telescopes(spark, vs):
    """Σ diff_i = v_n - v_1 (telescoping), independent of partitioning."""
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    out = series.map_diff(df, "v", out="d", order_by="t")
    total = out.agg(F.sum("d")).first()[0]
    if len(vs) == 1:
        assert total is None
    else:
        assert total == pytest.approx(vs[-1] - vs[0], rel=1e-6, abs=1e-6)


@prop
@given(vs=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40))
def test_filter_changed_matches_sequential_model(spark, vs):
    """FILTER_CHANGED == the obvious sequential scan."""
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    got = [r.v for r in maps.filter_changed(df, "v", order_by="t").orderBy("t").collect()]
    want = [v for i, v in enumerate(vs) if i == 0 or v != vs[i - 1]]
    assert got == want


@prop
@given(
    ts=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30),
    d=st.sampled_from([1_000, 1_000_000_000, 3_600 * 10**9, 86_400 * 10**9]),
)
def test_round_time_is_aligned_floor(spark, ts, d):
    """round_time: result is d-aligned, <= t, within d of t — for ANY 62-bit
    ns timestamp (the double-arithmetic bug broke this near boundaries)."""
    df = spark.createDataFrame([(t,) for t in ts], ["t"])
    rows = df.select("t", round_time("t", d).alias("b")).collect()
    for r in rows:
        assert r.b % d == 0
        assert r.b <= r.t < r.b + d


@prop
@given(vs=values, window=st.integers(min_value=1, max_value=8))
def test_movavg_matches_sequential_model(spark, vs, window):
    df = spark.createDataFrame(list(enumerate(vs)), ["t", "v"]).repartition(4)
    out = series.map_movavg(df, "v", window, out="m", order_by="t", no_wait=True)
    got = [r.m for r in out.orderBy("t").collect()]
    for i, g in enumerate(got):
        lo = max(0, i - window + 1)
        assert g == pytest.approx(sum(vs[lo:i + 1]) / (i - lo + 1), rel=1e-6, abs=1e-6)


@prop
@given(
    lts=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20),
    rts=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20),
)
def test_asof_join_matches_sequential_model(spark, lts, rts):
    """asof_join == 'latest right row with rt <= lt' per key, for any data."""
    from neo_server_spark.operators import joins

    left = spark.createDataFrame([("k", t) for t in sorted(set(lts))], ["k", "time"])
    right = spark.createDataFrame(
        [("k", t, float(t) * 10) for t in sorted(set(rts))], ["k", "time", "rv"])
    out = joins.asof_join(left, right, on=["k"], right_cols=["rv"])
    got = {r.time: r.rv for r in out.collect()}
    rset = sorted(set(rts))
    for lt in set(lts):
        eligible = [rt for rt in rset if rt <= lt]
        want = float(eligible[-1]) * 10 if eligible else None
        assert got[lt] == (pytest.approx(want) if want is not None else None)


@prop
@given(
    ts=st.lists(st.integers(min_value=0, max_value=999), min_size=1, max_size=40),
    period=st.sampled_from([7, 10, 50]),
)
def test_timewindow_conserves_rows(spark, ts, period):
    """Σ bucket counts == rows inside [from,until); calendar covers every
    bucket exactly once."""
    import pyspark.sql.functions as F

    from neo_server_spark.operators.group import timewindow

    df = spark.createDataFrame([("a", t, 1.0) for t in ts], ["name", "time", "value"])
    out = timewindow(df, "time", 0, 1000, period,
                     aggs=[F.count(F.lit(1)).alias("cnt")], series=["name"]).collect()
    n_buckets = (1000 + period - 1) // period
    assert len(out) == n_buckets
    assert sorted({r.time for r in out}) == [i * period for i in range(n_buckets)]
    assert sum(r.cnt or 0 for r in out) == len(ts)


@prop
@given(
    vs=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                          width=32), min_size=1, max_size=30),
    p=st.floats(min_value=0.01, max_value=1.0),
)
def test_quantile_lininterp_matches_gonum_model(spark, vs, p):
    """agg.quantile_lininterp == a direct Python transcription of gonum
    stat.Quantile(LinInterp) with unit weights, for any values and p."""
    from neo_server_spark.operators.group import agg

    def gonum_lininterp(xs, p):
        xs = sorted(xs)
        fidx = p * len(xs)
        cumsum = 0.0
        for i, x in enumerate(xs):
            cumsum += 1.0
            if cumsum >= fidx:
                if i == 0:
                    return xs[0]
                t = fidx - (cumsum - 1.0)
                return xs[i - 1] + t * (xs[i] - xs[i - 1])
        return xs[-1]

    df = spark.createDataFrame([(float(v),) for v in vs], ["v"])
    got = df.agg(agg.quantile_lininterp("v", p, "q")).first()["q"]
    assert got == pytest.approx(gonum_lininterp(vs, p), rel=1e-9, abs=1e-9)


docs_texts = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=30)
    .map(lambda ts: " ".join(ts)),
    min_size=1, max_size=8,
)


@prop
@given(texts=docs_texts)
def test_substring_cut_removes_all_duplicated_kgrams(spark, texts):
    """After remove_duplicate_spans(k), the surviving corpus contains NO
    k-gram with corpus count >= 2 that existed as a duplicated k-gram —
    i.e. the cut step actually clears the detection criterion (the same
    fixpoint property Lee et al.'s apply phase guarantees for the spans
    it removes)."""
    from neo_server_spark.datapipe import dedup
    k = 4
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"])
    cleaned = dedup.remove_duplicate_spans(df, k=k) \
        .withColumnRenamed("clean_text", "text")
    # recompute duplicated spans on the cleaned corpus restricted to
    # grams that were duplicated BEFORE: none of the original duplicated
    # grams may survive in two copies
    def grams(text):
        toks = text.split(" ") if text else []
        return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    before = {}
    for t in texts:
        for g in grams(t):
            before[g] = before.get(g, 0) + 1
    dup_before = {g for g, c in before.items() if c >= 2}
    after = {}
    for r in cleaned.collect():
        for g in grams(r.text):
            after[g] = after.get(g, 0) + 1
    leftover = {g for g, c in after.items() if c >= 2 and g in dup_before}
    assert not leftover, leftover


@prop
@given(sizes=st.lists(st.integers(min_value=1, max_value=40),
                      min_size=1, max_size=10),
       window=st.integers(min_value=4, max_value=16))
def test_pack_sequences_partitions_every_token(spark, sizes, window):
    """The packing plan covers every token of every doc exactly once:
    per-doc chunk ranges are contiguous, sum to the doc's token count,
    and chunk offsets stay inside [0, window)."""
    from neo_server_spark.datapipe import text as dtext
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "s") for i, n in enumerate(sizes)],
        ["doc_id", "text", "source"])
    rows = sorted(dtext.pack_sequences(df, window=window).collect(),
                  key=lambda r: (r.doc_id, r.chunk_id))
    per_doc: dict = {}
    for r in rows:
        assert 0 <= r.chunk_start <= r.chunk_end < window
        per_doc.setdefault(r.doc_id, []).append(r)
    offset = 0
    for i, n in enumerate(sizes):
        chunks = per_doc[i]
        covered = sum(r.chunk_end - r.chunk_start + 1 for r in chunks)
        assert covered == n
        # global contiguity: doc i starts exactly where i-1 ended
        start_global = chunks[0].chunk_id * window + chunks[0].chunk_start
        assert start_global == offset
        offset += n


url_chars = st.text(
    alphabet="abcXYZ019-._~/?&=#:", min_size=0, max_size=30)


@prop
@given(tails=st.lists(url_chars, min_size=1, max_size=6))
def test_normalize_url_idempotent(spark, tails):
    """normalize(normalize(u)) == normalize(u) for arbitrary URL tails —
    the canonicalization is a fixpoint (a second pass through the chain
    must not keep rewriting)."""
    from neo_server_spark.datapipe import web
    urls = [(i, f"HTTPS://Ex{i}.COM:443/{t}") for i, t in enumerate(tails)]
    df = spark.createDataFrame(urls, ["i", "url"])
    once = df.select("i", web.normalize_url("url").alias("u"))
    twice = once.select("i", web.normalize_url("u").alias("u2"))
    got = {r.i: (r.u, r2.u2) for r, r2 in
           zip(once.collect(), twice.collect())}
    for i, (u, u2) in got.items():
        assert u == u2, (tails[i], u, u2)


@prop
@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8),
    min_size=1, max_size=10))
def test_bpe_encode_conserves_characters(spark, words):
    """BPE merging never loses or invents characters: concatenating a
    doc's BPE tokens reproduces the concatenated input words."""
    from neo_server_spark.datapipe import text as dtext
    docs = spark.createDataFrame([(0, " ".join(words), "s")],
                                 ["doc_id", "text", "source"])
    merges = dtext.bpe_train(docs, n_merges=3)
    out = dtext.bpe_encode(docs, merges).first()
    assert "".join(out.bpe_tokens) == "".join(words)


@given(st.integers(min_value=1, max_value=999_999))
@settings(max_examples=60, deadline=None)
def test_sample_threshold_cross_engine_parity(micro):
    """The mixture/sampling keep-decision literal must be bit-identical to
    what the DuckDB oracle computes: python int(frac*16^8)-1 hex-formatted
    == duckdb printf('%08x', cast(floor(frac*2^32) as bigint)-1) for every
    round-6 fraction (the only fractions the operators ever threshold)."""
    import duckdb

    from neo_server_spark.datapipe.sampling import sample_threshold
    frac = micro / 1_000_000.0
    py = sample_threshold(frac)
    db = duckdb.sql(
        "SELECT printf('%08x', CAST(floor(CAST(? AS DOUBLE) * 4294967296.0)"
        " AS BIGINT) - 1)", params=[frac]).fetchone()[0]
    assert py == db


# --------------------------------------------------------- round-8 curation

_words = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                  min_size=0, max_size=30)


@prop
@given(docs=st.lists(_words, min_size=1, max_size=8))
def test_dedup_lines_idempotent_and_first_wins(spark, docs):
    """Corpus-global line dedup: (a) idempotent; (b) the survivor set is
    exactly the sequential first-occurrence model; (c) no line appears
    twice anywhere in the output."""
    from neo_server_spark.datapipe import curate
    rows = [(i, "\n".join(" ".join([w] * 3) for w in ws))
            for i, ws in enumerate(docs) if ws]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = curate.dedup_lines(df)
    twice = curate.dedup_lines(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
    # sequential model
    seen, want = set(), {}
    for i, ws in enumerate(docs):
        kept = []
        for w in ws:
            line = " ".join([w] * 3)
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            want[i] = "\n".join(kept)
    assert a == want
    all_lines = [ln for t in a.values() for ln in t.split("\n")]
    assert len(all_lines) == len(set(all_lines))


@prop
@given(docs=st.lists(_words, min_size=2, max_size=8),
       frac=st.sampled_from([0.25, 0.5, 1.0]))
def test_dsir_selects_exact_fraction(spark, docs, frac):
    """DSIR selection count = ceil(frac * N) over docs with tokens."""
    import math
    from neo_server_spark.datapipe import curate
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs) if ws]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.dsir_select(df, df.limit(1), frac).collect()
    assert sum(r["selected"] for r in out) == math.ceil(frac * len(rows))


@prop
@given(toks=st.lists(st.sampled_from("abcdefg"), min_size=5, max_size=60),
       w=st.sampled_from([2, 4, 7]))
def test_winnow_density_and_coverage_guarantee(spark, toks, w):
    """Winnowing invariants for any token stream: every window of w
    consecutive k-gram hashes contains a selected position (the coverage
    guarantee), and selected positions are distinct grams of the doc."""
    from neo_server_spark.datapipe import curate
    k = 3
    df = spark.createDataFrame([(0, " ".join(toks))], ["doc_id", "text"])
    got = sorted(r["pos"] for r in
                 curate.winnow_fingerprints(df, k=k, w=w).collect())
    n_grams = len(toks) - k + 1
    assert all(1 <= p <= n_grams for p in got)
    if n_grams >= w:
        for s in range(1, n_grams - w + 2):
            assert any(s <= p <= s + w - 1 for p in got), (s, got)


@prop
@given(rows=st.lists(
    st.tuples(st.sampled_from(["x", "y"]),
              st.integers(min_value=0, max_value=10**6)),
    min_size=1, max_size=25))
def test_mad_outlier_never_flags_majority(spark, rows):
    """Modified z-score with MAD: at most half the rows of any group can
    be outliers (the median absolute deviation covers >= 50% by
    definition) — 0.6745 * MAD / MAD = 0.6745 < 3."""
    from neo_server_spark.datapipe import curate
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        ["doc_id", "source", "n_chars"])
    out = curate.mad_outliers(df).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["source"], []).append(r["outlier"])
    for g, flags in by_g.items():
        assert sum(flags) <= len(flags) / 2, (g, flags)


def test_backup_restore_roundtrip_random_rows(spark, tmp_path):
    """restore(backup(catalog)) reproduces the catalog exactly, incl.
    NULLs, negative times and unicode strings."""
    from neo_server_spark.sqlx import backup as bk
    from neo_server_spark.sqlx import ddl
    saved = dict(ddl._TABLES)
    ddl._TABLES.clear()
    try:
        ddl.exec_sql(spark, "CREATE LOOKUP TABLE RT(k varchar(40) primary "
                            "key, t datetime, v double)")
        rows = [("α", -5, 1.25), ("b", 0, None), ("c", None, -0.5)]
        for r in rows:
            ddl.exec_sql(spark, "INSERT INTO rt VALUES (?, ?, ?)", r)
        before = sorted(ddl._TABLES["rt"]["rows"])
        p = str(tmp_path / "rt_bk")
        ddl.exec_sql(spark, f"BACKUP DATABASE INTO DISK = '{p}'")
        ddl.exec_sql(spark, "DROP TABLE rt")
        ddl.exec_sql(spark, f"RESTORE DATABASE FROM DISK = '{p}'")
        assert sorted(ddl._TABLES["rt"]["rows"]) == before
    finally:
        if "rt" in ddl._TABLES:
            ddl.drop_table(spark, "rt")
        ddl._TABLES.clear()
        ddl._TABLES.update(saved)


@prop
@given(soup=st.text(
    alphabet=st.sampled_from(list("ABCdef(),'\"|\\%$.0123456789 \n\t*")),
    min_size=0, max_size=120))
def test_tql_parser_never_hangs_or_crashes_raw(spark, soup):
    """Malformed script text must yield a controlled error (the parser's
    ParseError/ValueError family) or a result — never an internal
    exception type from deep inside lowering, and never a hang."""
    from neo_server_spark.tql.script import TqlRunner
    try:
        TqlRunner(spark, sf_dir=None).run(soup)
    except Exception as ex:
        name = type(ex).__name__
        assert name in ("ParseError", "SyntaxError", "ValueError",
                        "TypeError", "KeyError", "NotImplementedError",
                        "IllegalArgumentException",
                        "AnalysisException", "PySparkValueError",
                        "PySparkTypeError"), (name, str(ex)[:200], soup)
