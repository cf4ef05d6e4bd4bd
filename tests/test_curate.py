"""Unit tests for datapipe/curate.py (round 8): C4 cleaning, corpus-global
line dedup, DSIR selection, winnowing fingerprints, TF-IDF."""

import pyspark.sql.functions as F
import pytest

from neo_server_spark.datapipe import curate


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0: two good sentences + one unterminated + a javascript line
        (0, "the quick brown fox jumps over dogs.\n"
            "no terminal punctuation here at all\n"
            "please enable javascript to continue viewing.\n"
            "a second proper sentence with enough words!"),
        # doc 1: page-level kill — lorem ipsum
        (1, "lorem ipsum dolor sit amet consectetur adipiscing elit."),
        # doc 2: page-level kill — curly brace
        (2, "function f() { return 1; } is code not prose."),
        # doc 3: too few surviving lines (short line + good line)
        (3, "tiny line.\nanother proper sentence with plenty of words here."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_c4_line_stats_rules(docs):
    out = {r["doc_id"]: r for r in
           curate.c4_line_stats(docs, min_words=5, min_lines=2).collect()}
    assert out[0]["n_lines"] == 4
    assert out[0]["n_kept"] == 2           # javascript + unterminated dropped
    assert not out[0]["doc_removed"]
    assert out[1]["reason"] == "lorem_ipsum"
    assert out[2]["reason"] == "curly_brace"
    assert out[3]["reason"] == "too_few_lines"   # only 1 line has >=5 words


def test_c4_clean_rebuilds_text(docs):
    out = {r["doc_id"]: r for r in
           curate.c4_clean(docs, min_words=5, min_lines=2).collect()}
    assert list(out) == [0]
    assert out[0]["text"] == (
        "the quick brown fox jumps over dogs.\n"
        "a second proper sentence with enough words!")


def test_c4_separator_is_literal_not_regex(spark):
    # '|' is a regex metachar; split must treat the separator literally.
    df = spark.createDataFrame(
        [(0, "one good sentence with five words.|short.|x")], ["doc_id", "text"])
    row = curate.c4_line_stats(df, sep="|", min_words=5).collect()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 1


def test_dedup_lines_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(0, "alpha\nbeta\nalpha"),     # in-doc duplicate of alpha
         (1, "beta\ngamma"),            # beta already owned by doc 0
         (2, "gamma\ndelta")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curate.dedup_lines(df).collect()}
    assert out[0]["text"] == "alpha\nbeta"
    assert out[1]["text"] == "gamma"
    assert out[2]["text"] == "delta"
    assert out[2]["n_kept"] == 1


def test_dsir_prefers_target_like_docs(spark):
    tgt_words = " ".join(["alpha beta gamma"] * 5)
    raw_words = " ".join(["delta epsilon zeta"] * 5)
    docs = spark.createDataFrame(
        [(i, tgt_words if i < 3 else raw_words) for i in range(10)],
        ["doc_id", "text"])
    target = spark.createDataFrame([(0, tgt_words)], ["doc_id", "text"])
    out = curate.dsir_select(docs, target, fraction=0.3).collect()
    sel = {r["doc_id"] for r in out if r["selected"]}
    assert sel == {0, 1, 2}
    ws = {r["doc_id"]: r["log_w"] for r in out}
    assert ws[0] > ws[5]


def _py_winnow(tokens, k, w):
    """Reference winnowing (Schleimer et al. fig. 5, rightmost-min)."""
    import hashlib
    n = len(tokens)
    grams = [" ".join(tokens[i:i + k]) for i in range(n - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams]
    if len(hs) < w:
        m = min(hs)
        pos = max(i for i, h in enumerate(hs) if h == m)
        return {(pos + 1, m)}
    out = set()
    for s in range(len(hs) - w + 1):
        window = hs[s:s + w]
        m = min(window)
        j = max(i for i, h in enumerate(window) if h == m)
        out.add((s + j + 1, m))
    return out


@pytest.mark.parametrize("k,w", [(3, 4), (5, 4), (4, 7)])
def test_winnow_matches_reference_algorithm(spark, k, w):
    texts = [
        "a b c d e f g h i j k l m n o p",
        "the cat sat on the mat and the cat ran",
        "x y z " * 6,
        "one two three four five",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = curate.winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        if len(toks) < k:
            assert i not in by_doc
        else:
            assert by_doc[i] == _py_winnow(toks, k, w), f"doc {i}"


def test_winnow_guarantee_shared_fingerprint(spark):
    # any common run of >= w+k-1 tokens must share a fingerprint
    k, w = 5, 4
    common = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    df = spark.createDataFrame(
        [(0, "xx yy " + common + " zz"),
         (1, "aa " + common + " bb cc dd")], ["doc_id", "text"])
    fps = curate.winnow_fingerprints(df, k=k, w=w)
    shared = (fps.filter("doc_id = 0").select("fp")
              .intersect(fps.filter("doc_id = 1").select("fp")))
    assert shared.count() >= 1


def test_winnow_overlap_pairs(spark):
    k, w = 5, 4
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(0, "xx yy " + common), (1, common + " zz ww"),
         (2, "p q r s t u v w x y z")], ["doc_id", "text"])
    pairs = curate.winnow_overlap(df, k=k, w=w, min_shared=1).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry date")],
        ["doc_id", "text"])
    out = curate.tfidf_top_terms(df, top_k=1).collect()
    best = {r["doc_id"]: r["term"] for r in out}
    # 'apple' is doc-0-only and twice; 'banana'/'cherry' shared; 'date' unique
    assert best[0] == "apple"
    assert best[2] == "date"
    r0 = [r for r in out if r["doc_id"] == 0][0]
    assert r0["tf"] == 2 and r0["rank"] == 1


def test_winnow_density(spark, sf_dir):
    from neo_server_spark import io as nio
    docs = nio.load_table(spark, sf_dir, "documents").limit(200)
    prof = curate.winnow_profile(docs, k=5, w=4)
    row = prof.agg(F.avg("density").alias("d")).collect()[0]
    # expected density 2/(w+1) = 0.4; word-soup text stays in a loose band
    assert 0.25 < row["d"] < 0.65


def test_lm_score_bigram_orders_fluency(spark):
    # repeated fluent bigrams score higher than a one-off scramble
    fluent = "the cat sat on the mat " * 4
    df = spark.createDataFrame(
        [(0, fluent.strip()), (1, fluent.strip()), (2, "mat the on sat zz qq")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["lm2_score"]
           for r in curate.lm_score_bigram(df).collect()}
    assert out[0] == out[1] > out[2]


def test_char_entropy_bounds(spark):
    df = spark.createDataFrame(
        [(0, "aaaaaaaa"), (1, "abcdefgh"), (2, "aabb")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curate.char_entropy(df).collect()}
    assert out[0]["entropy"] == 0.0
    import math
    assert abs(out[1]["entropy"] - math.log(8)) < 1e-6
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-6
    assert out[1]["n_distinct_chars"] == 8


def test_mad_outliers_flags_extreme(spark):
    rows = [(i, "s", 100 + i % 5) for i in range(20)] + [(99, "s", 10_000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = {r["doc_id"]: r for r in curate.mad_outliers(df).collect()}
    assert out[99]["outlier"]
    assert not out[0]["outlier"]


def test_dedup_incremental_drops_seen_and_in_batch(spark):
    from neo_server_spark.datapipe import dedup
    old = spark.createDataFrame([(0, "alpha"), (1, "beta")], ["doc_id", "text"])
    idx = dedup.digest_index(old)
    new = spark.createDataFrame(
        [(10, "alpha"),      # already in the index
         (11, "gamma"), (12, "gamma"),   # in-batch dup, min id wins
         (13, "delta")], ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in dedup.dedup_incremental(new, idx).collect())
    assert kept == [11, 13]


def test_gopher_quality_rules(spark):
    stops = "the be to of and that have with"
    good = (" ".join(["solid prose sentence with normal words here"] * 8)
            + " " + stops)                       # 48+8 = 56 words
    df = spark.createDataFrame(
        [(0, good),
         (1, "too short."),                               # word-count rule
         (2, ("# " * 30 + stops + " " + "word " * 30).strip()),   # symbols
         (3, " ".join(["zz"] * 60))],                     # mean len + stops
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curate.gopher_quality(df).collect()}
    assert out[0]["keep"]
    assert not out[1]["ok_words"]
    assert not out[2]["ok_symbols"]
    assert not out[3]["ok_mean_len"] and not out[3]["ok_stops"]
    assert out[0]["n_stop_words"] == 8


def test_gopher_line_rules(spark):
    bullets = "\n".join(["- bullet item here"] * 9 + ["a normal line"])
    df = spark.createDataFrame([(0, bullets)], ["doc_id", "text"])
    r = curate.gopher_quality(df).collect()[0]
    assert r["bullet_frac"] == 0.9 and not r["ok_bullets"]


def test_readability_flesch(spark):
    # "the cat sat." -> 3 words, 1 sentence, 3 syllables
    df = spark.createDataFrame([(0, "the cat sat.")], ["doc_id", "text"])
    r = curate.readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    assert abs(r["flesch"] - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-6
    # polysyllabic text scores lower
    df2 = spark.createDataFrame(
        [(0, "the cat sat."), (1, "extraordinary organizational "
                                  "responsibilities accumulate.")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["flesch"] for r in curate.readability(df2).collect()}
    assert out[1] < out[0]


def test_dataset_card(spark, sf_dir):
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import report
    docs = nio.load_table(spark, sf_dir, "documents")
    card = report.dataset_card(docs, name="sf0.001")
    assert card.startswith("# Dataset card: sf0.001")
    for section in ("## Size", "## Duplication", "## Quality score",
                    "## Sources", "## Languages"):
        assert section in card
    assert "- documents: 500" in card


def test_canonicalize_best_keeps_highest_score(spark):
    from neo_server_spark.datapipe import dedup
    docs = spark.createDataFrame(
        [(0, 10.0), (1, 30.0), (2, 20.0), (9, 5.0)],
        ["doc_id", "quality"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])
    out = {r["doc_id"]: r for r in
           dedup.canonicalize_best(docs, pairs).collect()}
    # cluster {0,1,2}: doc 1 has the highest quality
    assert all(out[i]["canonical_id"] == 1 for i in (0, 1, 2))
    assert out[1]["keep"] and not out[0]["keep"]
    # unpaired doc is its own canonical
    assert out[9]["canonical_id"] == 9 and out[9]["keep"]


def test_y4m_codec_roundtrip_and_frame_stats(spark):
    import numpy as np
    from neo_server_spark.datapipe import multimodal as mm
    frames = [np.arange(24, dtype=np.uint8).reshape(4, 6) + i
              for i in range(3)]
    blob = mm.encode_y4m(frames, fps=30)
    w, h, fps, got = mm.decode_video_y4m(blob)
    assert (w, h, fps, len(got)) == (6, 4, 30, 3)
    for a, b in zip(frames, got):
        assert (a == b).all()
    # C420 header with chroma padding is skipped correctly
    y = frames[0].tobytes()
    c420 = (b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 C420jpeg\n"
            + b"FRAME\n" + y + bytes(2 * (3 * 2)))
    w, h, fps, got = mm.decode_video_y4m(c420)
    assert len(got) == 1 and (got[0] == frames[0]).all()
    # frame sampling: every 2nd frame
    assets = mm.synthesize_y4m_assets(spark, 2)
    out = mm.video_frame_stats(assets, every_n=2).collect()
    assert all(r["frame_no"] % 2 == 0 for r in out)
    assert {r["asset_id"] for r in out} == {0, 1}


def test_simhash_hamming_pairs_pigeonhole(spark):
    """Identical docs -> distance 0; a doc pair differing in one token
    appears iff its signature distance <= max_dist; the pigeonhole
    candidate stage must never DROP a qualifying pair (checked against a
    direct all-pairs model on the signatures)."""
    from neo_server_spark.datapipe import dedup
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog " * 3,   # dup
             "the quick brown fox jumps over the lazy cat " * 3,
             "entirely different words nothing shared here at all"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    d = 12
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_hamming_pairs(df, max_dist=d,
                                                hash_fn="md5").collect()}
    sigs = {r["doc_id"]: r["simhash"] for r in
            dedup.simhash(df, hash_fn="md5").collect()}
    want = {}
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j and bin(sigs[i] ^ sigs[j]).count("1") <= d:
                want[(i, j)] = bin(sigs[i] ^ sigs[j]).count("1")
    assert got == want
    assert got[(0, 1)] == 0          # exact dup
