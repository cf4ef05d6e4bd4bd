"""datapipe operator tests: dedup, similarity, text analysis, multimodal."""

import pyspark.sql.functions as F
import pytest

from neo_server_spark.datapipe import dedup, multimodal, similarity, text


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "a"),
        (1, "the quick brown fox jumps over the lazy dog", "a"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today", "a"),  # near dup
        (3, "completely different words appear in this document here", "b"),
        (4, "der hund und die katze sind nicht da", "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs)
    assert out.count() == 4
    assert 1 not in {r.doc_id for r in out.collect()}


def test_exact_dedup_stats(docs):
    rows = {r.source: r for r in dedup.exact_dedup_stats(docs).collect()}
    assert rows["a"].n_dupes == 1 and rows["b"].n_dupes == 0


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16, shingle_n=2,
                                    jaccard_threshold=0.3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup always collides
    assert (0, 2) in found or (1, 2) in found  # near dup via banding


def test_minhash_params_banding():
    """The derived (num_hashes, bands) schedule meets the recall target at
    the threshold and keeps sub-threshold band collisions rare."""
    from neo_server_spark.datapipe.dedup import minhash_params
    for t in (0.5, 0.7, 0.8, 0.9):
        n, b = minhash_params(t, target_recall=0.95)
        r = n // b
        assert n == r * b and 1 <= b <= 64 and 1 <= r <= 16
        recall_at_t = 1.0 - (1.0 - t ** r) ** b
        assert recall_at_t >= 0.95, (t, n, b)
        # banding separates: a pair at HALF the threshold is rarely
        # even a candidate
        recall_at_half = 1.0 - (1.0 - (0.5 * t) ** r) ** b
        assert recall_at_half <= 0.2, (t, n, b)
    assert minhash_params(0.7) == (408, 51)    # the documented regime


def test_minhash_max_pairs_fence(docs):
    """max_pairs caps the verified output deterministically (strongest
    pairs first) — the exploratory-run fence minhash_params documents."""
    full = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                                   shingle_n=2, jaccard_threshold=0.1)
    n_full = full.count()
    assert n_full >= 2
    capped = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                                     shingle_n=2, jaccard_threshold=0.1,
                                     max_pairs=1).collect()
    assert len(capped) == 1
    top = full.orderBy(F.col("jaccard").desc(), "id_a", "id_b").first()
    assert (capped[0].id_a, capped[0].id_b) == (top.id_a, top.id_b)


def test_ngram_jaccard(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_simhash_dupes(docs):
    out = dedup.simhash_dupes(docs).collect()
    assert len(out) == 1 and sorted(out[0].ids) == [0, 1]


def test_lang_id_deterministic(docs):
    out = {r.doc_id: r.lang_pred for r in text.lang_id(docs).collect()}
    assert out[0] == "en"   # 'the' markers
    assert out[4] == "de"   # 'der'/'und'/'die'/'nicht' markers


def test_quality_score_range(docs):
    out = text.quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in out)


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    row = df.select(text.shingles("text", 2).alias("sh")).first()
    assert row.sh == ["a b", "b c", "c d"]


def test_brute_force_topk(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.9, 0.05], 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.brute_force_topk(emb, 0, k=2).collect()
    assert [r.vec_id for r in out] == [3, 1] or [r.vec_id for r in out] == [1, 3]
    assert out[0].cosine > 0.99


def test_topk_join(spark):
    rows = [(i, [float(i), 1.0], 0) for i in range(10)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.topk_join(emb, emb.limit(2), k=3)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_ivf_roundtrip(spark):
    import random

    random.seed(7)
    rows = [(i, [random.random() for _ in range(4)], 0) for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents, assigned = similarity.ivf_index(emb, n_centroids=4, iters=2)
    assert cents.count() == 4
    assert assigned.count() == 50
    q = rows[5][1]
    res = similarity.ivf_search(assigned, cents, q, k=5, nprobe=4).collect()
    assert res[0].vec_id == 5  # the vector itself is its own nearest neighbor


def test_ivf_high_dim(spark):
    """dim=512: the centroid update must stay a narrow (cid,pos,v) shuffle,
    not 512 aggregate expressions — this test crawls/fails if that regresses."""
    import random

    random.seed(11)
    dim = 512
    rows = [(i, [random.random() for _ in range(dim)], 0) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents, assigned = similarity.ivf_index(emb, n_centroids=4, iters=1)
    got = cents.collect()
    assert len(got) == 4
    assert all(len(r.cv) == dim for r in got)  # positional reassembly kept order
    assert assigned.count() == 40


def test_boilerplate_join_not_broadcast_forced(spark):
    """The digest->is_boiler table is corpus-cardinality: the plan must not
    carry a forced broadcast hint (AQE may still CHOOSE broadcast at small
    scale — only the hint is the scale bug)."""
    docs2 = spark.createDataFrame(
        [(1, "A\nB"), (2, "A\nC")], ["doc_id", "text"])
    for df in (text.boilerplate_stats(docs2), text.remove_boilerplate(docs2)):
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "UnresolvedHint" not in analyzed
        assert "ResolvedHint" not in analyzed


def test_multimodal_features(spark):
    assets = multimodal.synthesize_assets(spark, 12)
    out = multimodal.extract_features(assets).collect()
    assert len(out) == 12
    assert all(len(r.feature) == 64 for r in out)  # sha256 hex digest


def test_frame_sample_plan(spark):
    assets = multimodal.synthesize_assets(spark, 12)
    plan = multimodal.frame_sample_plan(assets, every_ms=500)
    vids = assets.filter(F.col("modality") == "video").count()
    assert plan.count() > vids  # multiple frames per video


# ---------------------------------------------------------------------------
# multimodal: REAL dependency-free decode path (PPM)
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_and_resize():
    import numpy as np
    arr = (np.arange(6 * 4 * 3).reshape(6, 4, 3) % 256).astype(np.uint8)
    payload = multimodal.encode_ppm(arr)
    back = multimodal.decode_image_raw(payload)
    assert (back == arr).all()
    small = multimodal.decode_image_raw(
        multimodal.resize_image_raw(payload, 2, 3))
    assert small.shape == (3, 2, 3)
    # nearest-neighbor picks real source pixels
    assert all((px == arr.reshape(-1, 3)).all(axis=1).any()
               for px in small.reshape(-1, 3))


def test_wav_roundtrip_and_audio_stats(spark):
    import math

    import numpy as np
    samples = [1000 * ((k % 8) - 3) for k in range(256)]
    payload = multimodal.encode_wav(samples, 8000)
    rate, back = multimodal.decode_audio_raw(payload)
    assert rate == 8000 and (back == np.array(samples, dtype="<i2")).all()
    assets = multimodal.synthesize_wav_assets(spark, 3)
    got = {r.asset_id: r for r in multimodal.audio_stats(assets).collect()}
    for i in range(3):
        amp = 1000 * (i + 1)
        r = got[i]
        assert (r.rate, r.n_samples, r.duration_ms, r.peak) == (8000, 256, 32, 4 * amp)
        assert r.rms == f"{amp * math.sqrt(5.5):.4f}"


def test_image_stats_real_decode(spark):
    """mapInPandas decodes REAL PPM payloads and the channel means match
    numpy ground truth computed from the same synthesis."""
    import numpy as np
    assets = multimodal.synthesize_ppm_assets(spark, 6)
    got = {r.asset_id: r for r in multimodal.image_stats(assets).collect()}
    assert len(got) == 6
    for i in range(6):
        w, h = 8 + (i % 5), 6 + (i % 4)
        y, x = np.mgrid[0:h, 0:w]
        arr = np.stack([
            (x * 255 // max(w - 1, 1)),
            (y * 255 // max(h - 1, 1)),
            np.full((h, w), i * 13 % 256),
        ], axis=-1).astype(np.uint8)
        m = arr.reshape(-1, 3).mean(axis=0)
        r = got[i]
        assert (r.width, r.height) == (w, h)
        assert (r.mean_r, r.mean_g, r.mean_b) == \
            (f"{m[0]:.4f}", f"{m[1]:.4f}", f"{m[2]:.4f}")


# ---------------------------------------------------------------------------
# embedding near-dup: multi-band hyperplane LSH
# ---------------------------------------------------------------------------

def test_lsh_params_monotone():
    """Higher thresholds afford more bits (smaller buckets); every derived
    config is within the band/bit caps."""
    from neo_server_spark.datapipe.dedup import lsh_params
    last_bits = 0
    for t in (0.35, 0.5, 0.8, 0.9, 0.95):
        bits, bands = lsh_params(t)
        assert 1 <= bits <= 16 and 1 <= bands <= 16
        assert bits >= last_bits
        last_bits = bits


def test_embedding_dupes_recall_vs_exact(spark):
    """Multi-band LSH recall >= 0.95 against the exact all-pairs baseline
    on TESTDATA embeddings (threshold 0.35 — the worst regime for
    hyperplane LSH; the auto-derived band count carries the recall)."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe.similarity import cosine_expr

    emb = nio.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                cosine_expr(F.col("a.embedding"), F.col("b.embedding")).alias("c"))
        .filter(F.col("c") >= 0.35).collect()
    }
    assert exact, "fixture should contain near pairs"
    got = {(r.id_a, r.id_b)
           for r in dedup.embedding_dupes(emb, threshold=0.35).collect()}
    assert got <= exact                       # every emitted pair verified
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} on {len(exact)} pairs"


def test_embedding_dupes_no_all_pairs_plan(spark):
    """At default (high-threshold) params the candidate join must ride the
    (band, bucket) equi-key — never a cartesian/nested-loop product."""
    from neo_server_spark import io as nio

    emb = nio.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = dedup.embedding_dupes(emb, threshold=0.95)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# sampling: deterministic hash-based sampling / splits
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(spark):
    from neo_server_spark import io as nio
    return nio.load_table(spark, "/root/testdata/sf0.001", "documents")


def test_hash_sample_deterministic_and_nested(corpus):
    from neo_server_spark.datapipe import sampling
    a = {r.doc_id for r in sampling.hash_sample(corpus, 0.5).select("doc_id").collect()}
    b = {r.doc_id for r in sampling.hash_sample(corpus, 0.5).select("doc_id").collect()}
    assert a == b                       # pure function of doc_id
    small = {r.doc_id for r in sampling.hash_sample(corpus, 0.2).select("doc_id").collect()}
    assert small <= a                   # thresholds nest: 0.2-sample ⊂ 0.5-sample
    n = corpus.count()
    assert 0.3 * n < len(a) < 0.7 * n


def test_hash_sample_seed_independence(corpus):
    from neo_server_spark.datapipe import sampling
    a = {r.doc_id for r in sampling.hash_sample(corpus, 0.5, seed="s1").select("doc_id").collect()}
    b = {r.doc_id for r in sampling.hash_sample(corpus, 0.5, seed="s2").select("doc_id").collect()}
    assert a != b


def test_hash_sample_edge_fractions(corpus):
    from neo_server_spark.datapipe import sampling
    assert sampling.hash_sample(corpus, 0.0).count() == 0
    assert sampling.hash_sample(corpus, 1.0).count() == corpus.count()


def test_stratified_sample_respects_strata(corpus):
    from neo_server_spark.datapipe import sampling
    out = sampling.stratified_sample(corpus, {"en": 1.0, "zh": 0.0}, by="lang")
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "zh" not in langs and "en" in langs
    n_en = corpus.filter("lang = 'en'").count()
    assert out.filter("lang = 'en'").count() == n_en   # fraction 1.0 keeps all


def test_split_disjoint_exhaustive(corpus):
    from neo_server_spark.datapipe import sampling
    parts = sampling.split(corpus, {"train": 8, "val": 1, "test": 1})
    ids = [frozenset(r.doc_id for r in p.select("doc_id").collect())
           for p in parts.values()]
    n = corpus.count()
    assert sum(len(s) for s in ids) == n                       # exhaustive
    assert len(ids[0] | ids[1] | ids[2]) == n                  # disjoint
    assert len(ids[0]) > len(ids[1]) and len(ids[0]) > len(ids[2])


def test_scrub_pii_patterns(spark):
    rows = [(0, "mail bob.smith+x@corp.example.org now"),
            (1, "server at 192.168.1.100 port 80"),
            (2, "call +1-555-867-5309 today"),
            (3, "clean text with numbers 12 and 3.4")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in text.scrub_pii(df).collect()}
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "server at <IP> port 80"
    assert out[2] == "call <PHONE> today"
    assert out[3] == "clean text with numbers 12 and 3.4"


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: transitivity must label the
    # whole chain with its minimum even though 1 and 4 never share a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    comp = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_keep(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])
    out = dedup.dedup_clusters(docs, pairs, keep=True)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {0, 3, 4}   # 1,2 collapse into 0; unpaired docs survive


def test_connected_components_matches_union_find(spark):
    import random

    def union_find(n, edges):
        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-id labeling
        comp = {}
        for i in range(n):
            r = find(i)
            comp.setdefault(r, min(i, comp.get(r, i)))
        return {i: comp[find(i)] for i in range(n) if any(i in e for e in edges)}

    rng = random.Random(7)
    n = 40
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(45)})
    want = union_find(n, edges)
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    # union_find covers only nodes on edges, same as the operator
    assert got == {i: want[i] for i in got}


def test_boilerplate_stats_and_removal(spark):
    docs2 = spark.createDataFrame([
        (1, "COOKIE NOTICE\nunique alpha text\nFOOTER"),
        (2, "COOKIE NOTICE\nunique beta text\nFOOTER"),
        (3, "totally original document"),
    ], ["doc_id", "text"])
    stats = {r.doc_id: (r.n_paras, r.n_boiler)
             for r in text.boilerplate_stats(docs2).collect()}
    assert stats == {1: (3, 2), 2: (3, 2), 3: (1, 0)}
    cleaned = {r.doc_id: r.text
               for r in text.remove_boilerplate(docs2).collect()}
    assert cleaned == {1: "unique alpha text", 2: "unique beta text",
                       3: "totally original document"}


def test_repetition_stats_bigrams(spark):
    docs2 = spark.createDataFrame([
        (1, "a b a b a"),          # bigrams: ab ba ab ba -> 2 distinct, all dup
        (2, "w x y z"),            # wx xy yz -> all unique
    ], ["doc_id", "text"])
    got = {r.doc_id: r.asDict() for r in
           text.repetition_stats(docs2, n=2).collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_distinct"] == 2
    assert got[1]["top_gram_frac"] == 0.5 and got[1]["dup_gram_frac"] == 1.0
    assert got[2]["n_grams"] == 3 and got[2]["n_distinct"] == 3
    assert got[2]["dup_gram_frac"] == 0.0
    tri = {r.doc_id: r.asDict() for r in
           text.repetition_stats(docs2, n=3).collect()}
    assert tri[1]["n_grams"] == 3 and tri[1]["n_distinct"] == 2  # aba bab aba
    assert tri[2]["n_grams"] == 2 and tri[2]["n_distinct"] == 2


def test_quantize_int8_roundtrip_and_zero_guard(spark):
    from neo_server_spark.datapipe.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in quantize_int8(emb).collect()}
    assert rows[1].q8 == [127, -64, 32]          # round(±x/scale), scale=1/127
    assert abs(rows[1].q_scale - 1.0 / 127) < 1e-12
    assert rows[2].q8 == [0, 0, 0] and rows[2].q_scale == 0.0
    # reconstruction error bounded by scale/2 per component
    recon = [q * rows[1].q_scale for q in rows[1].q8]
    assert all(abs(a - b) <= rows[1].q_scale / 2 + 1e-12
               for a, b in zip([1.0, -0.5, 0.25], recon))


def test_contamination_screen(spark):
    """Decontamination: a doc copying benchmark text flags, clean docs
    don't; the left-anti survivor set is the training-safe corpus."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every day", "b")],
        ["doc_id", "text", "source"])
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog every day indeed", "a"),
         (1, "completely unrelated words forming a fresh clean document body", "a")],
        ["doc_id", "text", "source"])
    out = {r.doc_id: r for r in text.contamination(
        docs, bench, shingle_n=5, threshold=0.5).collect()}
    assert out[0].contaminated and out[0].overlap > 0.8
    assert not out[1].contaminated and out[1].n_hits == 0


def test_duplicate_spans_merging(spark):
    """duplicate_spans: a shared 8-gram run merges into ONE maximal span;
    unique text contributes none; position bookkeeping is 1-based."""
    shared = "a b c d e f g h i j"            # 10 shared tokens
    docs = spark.createDataFrame(
        [(0, shared + " unique tail zero", "s"),
         (1, "other head one " + shared, "s"),
         (2, "entirely different words with no overlap at all here", "s")],
        ["doc_id", "text", "source"])
    spans = {r.doc_id: r for r in
             dedup.duplicate_spans(docs, k=8).collect()}
    # doc 0: shared run at positions 1..10 -> k-gram starts 1..3 -> one
    # span of 3+8-1 = 10 tokens
    assert spans[0].start_pos == 1 and spans[0].end_pos == 3
    assert spans[0].span_tokens == 10
    # doc 1: the run starts after 3 head tokens
    assert spans[1].start_pos == 4 and spans[1].span_tokens == 10
    assert 2 not in spans
    stats = {r.doc_id: r for r in
             dedup.substring_dedup_stats(docs, k=8).collect()}
    assert stats[0].n_spans == 1 and stats[0].dup_tokens == 10
    assert abs(stats[0].dup_frac - 10 / 13) < 1e-6


def test_normalize_url_rules(spark):
    from neo_server_spark.datapipe import web
    cases = [
        # scheme+host lowercase, path case preserved
        ("HTTP://Example.COM/Path/File", "http://example.com/Path/File"),
        # default ports strip; non-default ports stay
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:80", "http://a.com"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),
        # fragment drops
        ("https://a.com/x#sec", "https://a.com/x"),
        # tracking params strip with correct separator re-anchoring
        ("https://a.com/x?utm_source=1&id=2", "https://a.com/x?id=2"),
        ("https://a.com/x?id=2&utm_source=1", "https://a.com/x?id=2"),
        ("https://a.com/x?utm_source=1", "https://a.com/x"),
        ("https://a.com/x?a=1&gclid=z&b=2", "https://a.com/x?a=1&b=2"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               ["i", "url"])
    out = {r.i: r.n for r in df.select(
        "i", web.normalize_url("url").alias("n")).collect()}
    for i, (u, want) in enumerate(cases):
        assert out[i] == want, (u, out[i], want)


def test_url_host_domain_and_caps(spark):
    from neo_server_spark.datapipe import web
    df = spark.createDataFrame(
        [(i, f"https://www.sub{i % 2}.site.com/p/{i}", f"t{i}")
         for i in range(10)], ["doc_id", "url", "text"])
    got = df.select(web.url_host("url").alias("h"),
                    web.url_domain("url").alias("d")).first()
    assert got.h.startswith("www.sub") and got.d == "site.com"
    capped = web.domain_caps(df, cap=3).collect()
    assert len(capped) == 3      # one domain after www-strip -> cap bites
    # determinism: same rows on rerun
    again = sorted(r.doc_id for r in web.domain_caps(df, cap=3).collect())
    assert sorted(r.doc_id for r in capped) == again


def test_pack_sequences_boundaries(spark):
    """pack_sequences: offsets accumulate in id order; a doc crossing the
    window boundary appears in both chunks with clipped ranges."""
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 300), "s"),
         (1, " ".join(["w"] * 300), "s"),      # crosses 512 at offset 300
         (2, " ".join(["w"] * 100), "s")],
        ["doc_id", "text", "source"])
    rows = sorted(text.pack_sequences(docs, window=512).collect(),
                  key=lambda r: (r.doc_id, r.chunk_id))
    assert [(r.doc_id, r.chunk_id, r.chunk_start, r.chunk_end)
            for r in rows] == [
        (0, 0, 0, 299),
        (1, 0, 300, 511), (1, 1, 0, 87),
        (2, 1, 88, 187)]


def test_pack_sequences_driver_replay(spark, sf_dir):
    """Replay pack_sequences under DRIVER conditions (200 shuffle
    partitions, the correctness harness's default) and against adversarial
    data (duplicate ids, NULL text, empty text): the layout must be
    bit-identical to the DuckDB oracle AND stable across re-evaluation of
    the same returned DataFrame — this is the regression test for the r8
    driver hash mismatch (eager checkpoint + (id, nt) tie-break)."""
    import duckdb

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = text.pack_sequences(docs, window=512)
        got1 = sorted(map(tuple, out.collect()))
        got2 = sorted(map(tuple, out.collect()))   # replay the same DF
        assert got1 == got2, "pack_sequences layout not replay-stable"
        want = duckdb.sql(f"""
            WITH sized AS (
              SELECT doc_id, len(string_split(text, ' ')) AS nt
              FROM '{sf_dir}/documents.parquet'),
            laid AS (
              SELECT doc_id, nt,
                     COALESCE(sum(nt) OVER (ORDER BY doc_id, nt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS off
              FROM sized),
            chunks AS (
              SELECT doc_id, nt, off,
                     CAST(unnest(range(CAST(off // 512 AS BIGINT),
                          CAST((off + nt - 1) // 512 + 1 AS BIGINT)))
                          AS BIGINT) AS chunk_id
              FROM laid)
            SELECT doc_id, chunk_id,
                   greatest(off - chunk_id * 512, 0) AS chunk_start,
                   least(off + nt - chunk_id * 512, 512) - 1 AS chunk_end
            FROM chunks
        """).fetchall()
        assert got1 == sorted(map(tuple, want))

        # adversarial shape: duplicate ids (tied and untied nt), NULL and
        # empty text — multiset determinism must survive the tie-break
        adv = spark.createDataFrame(
            [(5, " ".join(["w"] * 300), "s"),
             (5, " ".join(["w"] * 300), "s"),     # full tie (id, nt)
             (5, " ".join(["w"] * 10), "s"),      # tied id, smaller nt
             (7, None, "s"),                       # NULL text drops out
             (9, "", "s"),                         # 1 token ('' splits to [''])
             (1, " ".join(["w"] * 600), "s")],
            ["doc_id", "text", "source"])
        a1 = sorted(map(tuple, text.pack_sequences(adv, 512).collect()))
        a2 = sorted(map(tuple, text.pack_sequences(adv, 512).collect()))
        assert a1 == a2
        # offsets: doc1 [0,600) -> chunks 0,1; then (5,10) [600,610);
        # (5,300) [610,910); (5,300) [910,1210); (9,1) [1210,1211)
        assert a1 == sorted([
            (1, 0, 0, 511), (1, 1, 0, 87),
            (5, 1, 88, 97),
            (5, 1, 98, 397),
            (5, 1, 398, 511), (5, 2, 0, 185),
            (9, 2, 186, 186)])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_lm_buckets_split(spark):
    docs = spark.createDataFrame(
        [(i, ("common words here" if i % 2 else "rare%d token%d x%d"
              % (i, i, i)), "s") for i in range(12)],
        ["doc_id", "text", "source"])
    prof = {r.bucket: r for r in text.lm_bucket_profile(docs).collect()}
    assert set(prof) == {"head", "middle", "tail"}
    assert sum(r.n_docs for r in prof.values()) == 12
    # equal-frequency: 4 docs per tier
    assert all(r.n_docs == 4 for r in prof.values())
    assert prof["head"].min_score >= prof["tail"].max_score


def test_remove_duplicate_spans(spark):
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(0, shared + " unique tail zero", "s"),
         (1, "other head one " + shared, "s"),
         (2, "entirely different words with no overlap at all here", "s"),
         (3, shared, "s"), (4, shared, "s")],     # fully duplicated docs
        ["doc_id", "text", "source"])
    out = {r.doc_id: r.clean_text for r in
           dedup.remove_duplicate_spans(docs, k=8).collect()}
    assert out[0] == "unique tail zero"
    assert out[1] == "other head one"
    assert out[2].startswith("entirely different")   # untouched passthrough
    assert out[3] == "" and out[4] == ""             # fully covered -> empty


def test_bpe_train_classic(spark):
    """Sennrich et al.'s canonical example: 'low/lower/newest/widest'
    learns es -> est -> lo -> low in order."""
    docs = spark.createDataFrame(
        [(0, "low low low lower lower newest newest newest widest", "s"),
         (1, "newest widest low lowest", "s")],
        ["doc_id", "text", "source"])
    merges = text.bpe_train(docs, n_merges=4)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("e", "s", "es"), ("es", "t", "est"),
        ("l", "o", "lo"), ("lo", "w", "low")]
    assert merges[0][4] == 7     # es appears in newest x4 + widest x2 + lowest


def test_bpe_encode_applies_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(0, "lowest low", "s")], ["doc_id", "text", "source"])
    merges = [(0, "e", "s", "es", 0), (1, "es", "t", "est", 0),
              (2, "l", "o", "lo", 0), (3, "lo", "w", "low", 0)]
    out = text.bpe_encode(docs, merges).first()
    assert out.bpe_tokens == ["low", "est", "low"]
    assert out.n_bpe_tokens == 3


def test_semdedup_prunes_within_cluster_only(spark):
    from neo_server_spark.datapipe import sampling  # noqa: F401  (module import sanity)
    # two well-separated clusters: near-identical pairs are pruned inside
    # their own cluster; cross-cluster pairs are never compared
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # centroid A
        (1, [0.0, 1.0, 0.0, 0.0]),          # centroid B
        (2, [0.99, 0.1, 0.0, 0.0]),         # near v0 -> cluster A, dup of 0
        (3, [0.0, 0.98, 0.2, 0.0]),         # near v1 -> cluster B, dup of 1
        (4, [0.0, 0.0, 0.0, 1.0]),          # far from both, kept
    ]
    emb = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in rows],
                                ["vec_id", "embedding"])
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    out = {r.vec_id: r for r in dedup.semdedup(emb, cents, threshold=0.9).collect()}
    assert out[0].keep and out[1].keep          # lowest id in each cluster wins
    assert not out[2].keep and out[2].cid == 0  # pruned against 0, in cluster A
    assert not out[3].keep and out[3].cid == 1  # pruned against 1, in cluster B
    assert out[4].keep
    assert out[2].max_dup_cos > 0.99


def test_mixture_plan_branches(spark):
    from neo_server_spark.datapipe import sampling
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10), "big" if i < 8 else "small")
         for i in range(10)], ["doc_id", "text", "source"])
    # big: 80 tokens, small: 20 tokens; budget 200: big w=1,small w=9 ->
    # big target 20 (rate .25), small target 180 -> rate 9 clamped to 4
    plan = {r.domain: r for r in sampling.mixture_plan(
        docs, {"big": 1.0, "small": 9.0, "ghost": 1.0}, 220.0,
        by="source").collect()}
    assert plan["big"].epochs == 0 and 0 < plan["big"].frac < 1
    assert plan["small"].epochs == 4 and plan["small"].frac == 0.0  # clamped
    assert plan["ghost"].have_tokens == 0 and plan["ghost"].epochs == 0 \
        and plan["ghost"].frac == 0.0


def test_mixture_sample_epochs_deterministic(spark):
    from neo_server_spark.datapipe import sampling
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10), "s") for i in range(20)],
        ["doc_id", "text", "source"])
    # 200 tokens available, budget 500 -> rate 2.5: every doc twice plus
    # ~half a third time, decided by md5(doc_id#2)
    out = sampling.mixture_sample(docs, {"s": 1.0}, 500.0, by="source")
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
    assert all(sorted(v)[:2] == [0, 1] for v in per_doc.values())
    n_frac = sum(1 for v in per_doc.values() if len(v) == 3)
    assert 0 < n_frac < 20                      # fractional epoch is partial
    again = {(r.doc_id, r.epoch) for r in out.collect()}
    assert again == {(r.doc_id, r.epoch) for r in rows}  # deterministic


def test_classifier_score_matches_sql_fold(spark):
    """The Arrow-kernel margin must be BIT-equal to the former Catalyst
    HOF fold (same sequential order, same float64 ops) — cross-checked
    here by rebuilding the old expression inline, including the NULL /
    empty-string / repeated-space edge cases."""
    import pyspark.sql.functions as F

    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, ""), (2, None), (3, "  double  spaces  "),
            (4, "one"), (5, "répété unicode tökens répété unicode"),
            (6, "a " * 500 + "b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.classifier_score(df).collect()}

    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    blen = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(toks, F.lit(1), blen),
                         F.slice(toks, F.lit(2), blen),
                         lambda x, y: F.concat(x, F.lit("_"), y))
    feats = F.concat(toks, bigrams)
    w = lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                   .cast("double") / F.lit(4294967296.0)) * 2.0 - 1.0
    s = (F.aggregate(feats, F.lit(0.0), lambda a, x: a + w(x))
         / F.size(feats).cast("double"))
    ref = {r.doc_id: r for r in df.select(
        "doc_id", F.round(s, 6).alias("margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), 6).alias("clf_score"),
        (s >= F.lit(0.0)).alias("keep")).collect()}
    for i, _ in rows:
        assert out[i].margin == ref[i].margin, i
        assert out[i].clf_score == ref[i].clf_score, i
        assert out[i].keep == ref[i].keep, i


def test_simhash_kernel_matches_sql_fold(spark):
    """The Arrow vote kernel must be BIT-equal to the former Catalyst
    per-bit F.aggregate fold, for BOTH hash families, including NULL /
    empty-string / repeated-space edges (votes are commutative integer
    sums, so order cannot differ — this pins the hash + mask + threshold
    wiring)."""
    import pyspark.sql.functions as F

    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, ""), (2, None), (3, "  double  spaces  "),
            (4, "one"), (5, "répété unicode tökens répété unicode"),
            (6, "a b c " * 100 + "z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sql_sig(hash_fn, bits):
        toks = F.split(F.col("text"), " ")
        if hash_fn == "md5":
            th = F.transform(toks, lambda t: F.conv(
                F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
        else:
            th = F.transform(toks, lambda t: F.xxhash64(t))

        def mask(i):
            return (1 << i) if i < 63 else -(1 << 63)

        def vote(i):
            m = mask(i)
            return lambda acc, h: acc + F.when(
                h.bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)

        def sig_of(b):
            sig = F.lit(0).cast("long")
            for i in range(bits):
                v = F.aggregate(b, F.lit(0), vote(i))
                sig = sig.bitwiseOR(
                    F.when(v > 0, F.lit(mask(i))).otherwise(F.lit(0))
                    .cast("long"))
            return sig

        return F.element_at(F.transform(F.array(th), sig_of), 1)

    for hash_fn, bits in (("md5", 60), ("xxhash64", 64)):
        got = {r.doc_id: r.simhash for r in
               dedup.simhash(df, "text", hash_fn=hash_fn).collect()}
        ref = {r.doc_id: r.s for r in df.select(
            "doc_id", sql_sig(hash_fn, bits).alias("s")).collect()}
        for i, _ in rows:
            assert got[i] == ref[i], (hash_fn, i, got[i], ref[i])


def test_classifier_score_shape_and_bounds(docs):
    out = {r.doc_id: r for r in text.classifier_score(docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for r in out.values():
        assert 0.0 <= r.clf_score <= 1.0
        assert r.keep == (r.margin >= 0)
    assert out[0].clf_score == out[1].clf_score   # identical text, same score
    assert out[0].clf_score != out[3].clf_score   # different text differs


def _toy_emb(spark, n=40, dim=16, seed=7):
    import random
    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    # vec 1 = tiny perturbation of vec 0: its ADC distance to q=vec0 must win
    rows[1] = (1, [x + 0.01 for x in rows[0][1]])
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pq_encode_codes_shape(spark):
    emb = _toy_emb(spark)
    cb = similarity.pq_train(emb, m=4, k=8, iters=0)
    assert cb.count() == 32                      # 4 subspaces x 8 codes
    codes = similarity.pq_encode(emb, cb, m=4)
    assert codes.count() == 160                  # one code per (vector, sub)
    assert codes.filter((F.col("code") < 0) | (F.col("code") > 7)).count() == 0
    # a seed vector encodes to itself in every subspace (distance 0)
    own = codes.filter(F.col("vec_id") == 3).select("code").collect()
    assert all(r.code == 3 for r in own)


def test_pq_train_lloyd_improves_quantization(spark):
    emb = _toy_emb(spark)
    def sse(cb):
        codes = similarity.pq_encode(emb, cb, m=4)
        sub = emb.select("vec_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("sub"),
                         F.col("embedding").alias("v")) \
                 .select("vec_id", "sub", F.expr("slice(v, sub * 4 + 1, 4)").alias("sv"))
        j = codes.join(sub, ["vec_id", "sub"]).join(cb, ["sub", "code"])
        d2 = F.aggregate(F.zip_with("sv", "cv", lambda x, y: (x - y) ** 2),
                         F.lit(0.0), lambda a, x: a + x)
        return j.agg(F.sum(d2)).first()[0]
    cb0 = similarity.pq_train(emb, m=4, k=8, iters=0)
    cb2 = similarity.pq_train(emb, m=4, k=8, iters=2)
    assert sse(cb2) <= sse(cb0) + 1e-9           # Lloyd rounds never regress SSE


def test_pq_search_ranks_planted_neighbor_first(spark):
    emb = _toy_emb(spark)
    cb = similarity.pq_train(emb, m=4, k=8, iters=1)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    codes = similarity.pq_encode(emb.filter(F.col("vec_id") != 0), cb, m=4)
    top = similarity.pq_search(codes, cb, q, k=5, m=4).collect()
    assert top[0].vec_id == 1                    # the planted near-dup wins
    assert top[0].adc_d2 <= top[-1].adc_d2


def test_ivfpq_allprobe_equals_pq(spark):
    emb = _toy_emb(spark).withColumn("label", F.lit(0))
    cents, assigned = similarity.ivf_index(emb, n_centroids=4, iters=1)
    cb = similarity.pq_train(emb, m=4, k=8, iters=1)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    codes = similarity.pq_encode(emb.filter(F.col("vec_id") != 0), cb, m=4)
    exact = [(r.vec_id, round(r.adc_d2, 9)) for r in
             similarity.pq_search(codes, cb, q, k=8, m=4).collect()]
    probed = [(r.vec_id, round(r.adc_d2, 9)) for r in
              similarity.ivfpq_search(assigned, codes, cents, cb, q,
                                      k=8, nprobe=4, m=4).collect()]
    assert probed == exact                      # all-probe degrades to exact ADC
    top1 = similarity.ivfpq_search(assigned, codes, cents, cb, q,
                                   k=1, nprobe=1, m=4).collect()
    assert top1 and top1[0].vec_id in {v for v, _ in exact[:4]}


def test_normalize_text_rules(spark):
    docs2 = spark.createDataFrame(
        [(0, "Café   du\x07o\ttab  keep\nline"),
         (1, None)],
        ["doc_id", "text"])
    out = {r.doc_id: r.norm_text for r in
           text.normalize_text(docs2).collect()}
    assert out[0] == "Café duo\ttab keep\nline"  # NFC'd, controls gone,
    assert out[1] is None                             # spaces collapsed; null rides


def test_residual_ivfpq_recall(spark):
    emb = _toy_emb(spark, n=60).withColumn("label", F.lit(0))
    cents, assigned, cb, codes = similarity.ivfpq_index(
        emb, n_centroids=4, m=4, k=8, coarse_iters=1, pq_iters=1)
    assert {c for (c,) in codes.select("cid").distinct().collect()} \
        <= {c for (c,) in cents.select("cid").collect()}
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    own = codes.filter(F.col("vec_id") != 0)
    top = similarity.ivfpq_search_residual(cents, own, cb, q, k=3,
                                           nprobe=4, m=4).collect()
    assert top[0].vec_id == 1                   # planted near-dup wins
    # residual ADC of the near-dup must be tiny vs the field
    assert top[0].adc_d2 < top[-1].adc_d2


def test_shard_plan_contiguous_and_budgeted(spark):
    docs2 = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 5))) for i in range(40)],
        ["doc_id", "text"])
    plan = text.shard_plan(docs2, shard_tokens=100).collect()
    by_id = sorted(plan, key=lambda r: r.doc_id)
    # shard ids are non-decreasing in doc order and start at 0
    sids = [r.shard_id for r in by_id]
    assert sids[0] == 0 and all(a <= b for a, b in zip(sids, sids[1:]))
    # every shard holds >= budget tokens once the next shard starts
    tot = {}
    for r in by_id:
        tot[r.shard_id] = tot.get(r.shard_id, 0) + r.n_tokens
    for s in sorted(tot)[:-1]:
        assert tot[s] >= 100 - 14       # within one document of the budget
        assert tot[s] <= 100 + 14


def test_write_shards_layout(spark, tmp_path):
    import os
    docs2 = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(30)],
        ["doc_id", "text"])
    path = str(tmp_path / "shards")
    manifest = {r.shard_id: r for r in
                text.write_shards(docs2, path, shard_tokens=100).collect()}
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert len(dirs) == len(manifest) == 3          # 300 tokens / 100
    back = spark.read.parquet(path)
    assert back.count() == 30
    assert back.select("doc_id").distinct().count() == 30
    assert all(m.n_docs == 10 and m.n_tokens == 100 for m in manifest.values())


def test_semdedup_k_scaling_bounds_cluster_pairs(spark):
    """semdedup_k: k ∝ N (SemDeDup's 50k@440M ratio).  At 10x the rows
    with k scaled accordingly, the expected per-cluster pair count
    (~(N/k)^2) stays flat instead of growing 100x — the property that
    makes the cluster-local quadratic sweep viable at corpus scale."""
    import pyspark.sql.functions as F
    from neo_server_spark.datapipe import dedup as dd

    assert dd.semdedup_k(440_000_000, rows_per_cluster=8_800) == 50_000
    assert dd.semdedup_k(1) == 1 and dd.semdedup_k(0) == 1

    def mean_sq_cluster(n_rows, rows_per_cluster):
        emb = spark.range(n_rows).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.sin(F.col("id") * (i + 1)).cast("double")
                      for i in range(8)]).alias("embedding"))
        k = dd.semdedup_k(n_rows, rows_per_cluster)
        out = dd.semdedup_auto(emb, threshold=2.0,   # sweep only, no prunes
                               rows_per_cluster=rows_per_cluster,
                               kmeans_iters=1)
        sizes = [r["c"] for r in
                 out.groupBy("cid").agg(F.count("*").alias("c")).collect()]
        assert len(sizes) <= k
        return sum(s * s for s in sizes) / len(sizes)

    small = mean_sq_cluster(1_000, rows_per_cluster=100)
    big = mean_sq_cluster(10_000, rows_per_cluster=100)
    # unscaled k would make `big` ~100x `small`; scaled k keeps the mean
    # per-cluster pair work within a small factor (k-means imbalance)
    assert big <= 10 * small, (small, big)


def test_near_dup_hot_bucket_fences(spark):
    """The max_bucket fence must actually ENGAGE: a bucket holding more
    docs than the cap contributes no candidate pairs (over-full buckets
    mean templated text that exact dedup should collapse first), and
    raising the cap restores the pairs — for all three LSH pair miners."""
    docs = spark.createDataFrame(
        [(i, "the same templated text repeated across the corpus body")
         for i in range(8)], ["doc_id", "text"])
    fenced = dedup.simhash_hamming_pairs(docs, max_bucket=5)
    assert fenced.count() == 0
    open_ = dedup.simhash_hamming_pairs(docs, max_bucket=100)
    assert open_.count() == 28                 # C(8,2), all hamming 0
    assert all(r.hamming == 0 for r in open_.collect())

    assert dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.9,
                                   max_bucket=5).count() == 0
    mh = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.9,
                                 max_bucket=100)
    assert mh.count() == 28 and all(r.jaccard == 1.0 for r in mh.collect())

    emb = spark.createDataFrame(
        [(i, [1.0, 0.5, -0.25, 2.0]) for i in range(8)],
        ["vec_id", "embedding"])
    assert dedup.embedding_dupes(emb, threshold=0.99, block_bits=4,
                                 bands=4, max_bucket=5).count() == 0
    ed = dedup.embedding_dupes(emb, threshold=0.99, block_bits=4,
                               bands=4, max_bucket=100)
    assert ed.count() == 28 and all(r.cosine == 1.0 for r in ed.collect())


def test_lsh_kernels_match_bruteforce_on_xxhash_mode(spark):
    """The r9 bucket-kernel rewrites must be EXACTLY the old semantics in
    the production (xxhash64) hash mode too, not just under the md5
    oracles: recompute candidates + verify brute-force in driver python
    from the collected signatures/digest sets and compare pair sets."""
    import numpy as np

    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "completely different words live in this one here",
            "alpha beta gamma delta epsilon zeta eta theta",   # dup of 0
            "numbers one two three four five six seven eight",
            "completely different words live in this one too"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base * 3)], ["doc_id", "text"])

    # --- simhash ---
    got = {(r.id_a, r.id_b, r.hamming) for r in
           dedup.simhash_hamming_pairs(docs, max_dist=3).collect()}
    sigs = {r.doc_id: r.simhash for r in
            dedup.simhash(docs, "text").collect()}
    wb = 64 // 4
    exp = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = np.uint64(sigs[a] & (2**64 - 1)), \
                np.uint64(sigs[b] & (2**64 - 1))
            if not any(((sa >> np.uint64(k * wb)) & np.uint64(2**wb - 1))
                       == ((sb >> np.uint64(k * wb)) & np.uint64(2**wb - 1))
                       for k in range(4)):
                continue
            ham = bin(int(sa) ^ int(sb)).count("1")
            if ham <= 3:
                exp.add((a, b, ham))
    assert got == exp and exp    # non-trivial: the dup pairs exist

    # --- minhash ---
    got = {(r.id_a, r.id_b, r.jaccard) for r in
           dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()}
    sig_rows = dedup.minhash_signature(docs, "text").collect()
    mh = {r.doc_id: list(r.minhash) for r in sig_rows}
    sh_sets = {r.doc_id: set(r.sh) for r in docs.select(
        "doc_id", dedup.shingles("text", 3).alias("sh")).collect()}
    exp = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not any(mh[a][k * 4:(k + 1) * 4] == mh[b][k * 4:(k + 1) * 4]
                       for k in range(16)):
                continue
            inter = len(sh_sets[a] & sh_sets[b])
            union = len(sh_sets[a] | sh_sets[b])
            jac = inter / union if union else 0.0
            if jac >= 0.2:
                exp.add((a, b, round(jac, 6)))
    assert got == exp and exp

    # --- embedding hyperplane LSH ---
    emb = spark.createDataFrame(
        [(i, [float(np.sin(i * 3 + j)) if i % 3 else float(j % 5 - 2)
              for j in range(8)]) for i in range(18)],
        ["vec_id", "embedding"])
    got = {(r.id_a, r.id_b, r.cosine) for r in
           dedup.embedding_dupes(emb, threshold=0.8, block_bits=4,
                                 bands=6).collect()}
    sk = dedup.band_buckets(emb, "embedding", "vec_id", 4, 6)
    buckets = {}
    for r in sk.collect():
        buckets.setdefault((r["__band"], r["__bucket"]), []).append(
            r["vec_id"])
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    exp = set()
    for a, b in cand:
        va, vb = vecs[a], vecs[b]
        cos = float(va @ vb / (np.sqrt(va @ va) * np.sqrt(vb @ vb)))
        if cos >= 0.8:
            exp.add((a, b, round(cos, 6)))
    assert got == exp and exp


def test_ivf_topk_join_allprobe_equals_brute_force(spark):
    """Batch IVF k-NN: probing every centroid degrades to brute force —
    the same pin ivfpq_allprobe uses — so the probe-frame join, the
    self-exclusion, and the per-query ranking are all certified against
    topk_join."""
    import random
    random.seed(13)
    rows = [(i, [random.random() for _ in range(6)], 0) for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents, assigned = similarity.ivf_index(emb, n_centroids=4, iters=2)
    qs = emb.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.vec_id, r.cosine) for r in
             similarity.topk_join(emb, qs, k=5).collect()}
    probed = {(r.query_id, r.vec_id, r.cosine) for r in
              similarity.ivf_topk_join(assigned, cents, qs, k=5,
                                       nprobe=4).collect()}
    assert probed == exact
    # restricted probing returns k rows per query from probed buckets
    part = similarity.ivf_topk_join(assigned, cents, qs, k=5, nprobe=1)
    counts = {r["query_id"]: r["count"]
              for r in part.groupBy("query_id").count().collect()}
    assert all(c == 5 for c in counts.values())


def test_pq_search_rerank_recovers_exact_ranking(spark):
    """Two-stage PQ: with the shortlist covering the corpus, the exact
    re-rank returns brute-force order and brute-force cosines — ADC only
    gates WHICH rows pay the vector fetch, never the final ranking."""
    import random
    random.seed(17)
    rows = [(i, [random.random() for _ in range(8)], 0) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cb = similarity.pq_train(emb, m=4, k=8, iters=1)
    q = rows[0][1]
    rest = emb.filter(F.col("vec_id") != 0)
    codes = similarity.pq_encode(rest, cb, m=4)
    exact = [(r.vec_id, r.cosine) for r in
             similarity.brute_force_topk(emb, 0, k=5).collect()]
    rer = [(r.vec_id, r.cosine) for r in
           similarity.pq_search_rerank(codes, cb, rest, q, k=5,
                                       shortlist=39, m=4).collect()]
    assert rer == exact
    # tight shortlist still returns k exact-cosine-ranked rows
    tight = similarity.pq_search_rerank(codes, cb, rest, q, k=5,
                                        shortlist=10, m=4).collect()
    assert len(tight) == 5
    assert all(tight[i].cosine >= tight[i + 1].cosine
               for i in range(4))


def test_lsh_topk_join_matches_per_query_form(spark):
    """Batch LSH k-NN == the single-query lsh_topk per query (same
    sketch, same candidates, same ranking), and the plan broadcasts the
    query slice rather than going cartesian."""
    import random
    random.seed(19)
    rows = [(i, [random.random() for _ in range(6)], 0) for i in range(80)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    sig = similarity.lsh_index(emb, block_bits=2, bands=8).persist()
    qs = emb.filter(F.col("vec_id") < 3)
    batch = {}
    for r in similarity.lsh_topk_join(emb, qs, k=5, block_bits=2,
                                      bands=8, sig=sig).collect():
        batch.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    for qid in (0, 1, 2):
        single = [(r.vec_id, r.cosine) for r in
                  similarity.lsh_topk(emb, qid, k=5, block_bits=2,
                                      bands=8, sig=sig).collect()]
        assert batch.get(qid, []) == single, qid
    plan = similarity.lsh_topk_join(
        emb, qs, k=5, block_bits=2, bands=8,
        sig=sig)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    sig.unpersist()


def test_minhash_params_unreachable_target_raises():
    """A threshold too low to hit the recall target within max_bands must
    refuse loudly — the old fallback silently returned an r=1,
    quadratic-candidate schedule that MISSED the target (ADVICE r10)."""
    import pytest as _pytest

    from neo_server_spark.datapipe.dedup import minhash_params

    with _pytest.raises(ValueError, match="cannot reach"):
        minhash_params(0.001, target_recall=0.95, max_bands=64)
    # reachable-only-at-r=1 still succeeds (no false refusal)
    n, b = minhash_params(0.15, target_recall=0.95, max_bands=64)
    assert n // b >= 1 and 1.0 - (1.0 - 0.15 ** (n // b)) ** b >= 0.95


def test_topk_join_exclude_self_flag(spark):
    """exclude_self gates the id-equality filter: external query frames
    whose ids coincidentally collide with corpus ids must NOT lose that
    corpus row when exclude_self=False (ADVICE r10); corpus-member
    queries keep the default dedup behavior."""
    import random
    random.seed(23)
    rows = [(i, [random.random() for _ in range(6)], 0) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents, assigned = similarity.ivf_index(emb, n_centroids=3, iters=2)
    # an EXTERNAL query that happens to reuse corpus id 7
    ext = spark.createDataFrame([(7, rows[7][1])], ["vec_id", "embedding"])
    full = similarity.ivf_topk_join(assigned, cents, ext, k=5, nprobe=3,
                                    exclude_self=False).collect()
    got = {(r.query_id, r.vec_id) for r in full}
    # corpus row 7 is this query's own vector -> cosine 1.0, must be kept
    assert (7, 7) in got
    dropped = {(r.query_id, r.vec_id) for r in
               similarity.ivf_topk_join(assigned, cents, ext, k=5,
                                        nprobe=3).collect()}
    assert (7, 7) not in dropped
    # lsh_topk_join: same gate over the sketch join (corpus-member query)
    qs = emb.filter(F.col("vec_id") == 7)
    with_self = similarity.lsh_topk_join(emb, qs, k=5, block_bits=2,
                                         bands=8, exclude_self=False) \
        .collect()
    assert {(r.query_id, r.vec_id) for r in with_self} >= {(7, 7)}
    assert max(r.cosine for r in with_self) == 1.0


def test_ivfpq_search_rerank_degenerate_exact(spark):
    """The documented default IVFPQ read path: with nprobe covering every
    centroid and the shortlist covering the corpus, rerank returns
    brute-force order and brute-force cosines for BOTH code layouts
    (raw pq_encode codes and ivfpq_index residual codes)."""
    import random
    random.seed(29)
    rows = [(i, [random.random() for _ in range(8)], 0) for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = rows[0][1]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = [(r.vec_id, r.cosine) for r in
             similarity.brute_force_topk(emb, 0, k=5).collect()]
    # raw codes
    cents, assigned = similarity.ivf_index(rest, n_centroids=4, iters=2)
    cb = similarity.pq_train(rest, m=4, k=8, iters=1)
    codes = similarity.pq_encode(rest, cb, m=4)
    raw = [(r.vec_id, r.cosine) for r in
           similarity.ivfpq_search_rerank(
               rest, q, k=5, shortlist=49, nprobe=4, m=4,
               assigned=assigned, codes=codes, centroids=cents,
               codebooks=cb).collect()]
    assert raw == exact
    # residual codes (ivfpq_index carries cid alongside each code row)
    rc, _ra, rcb, rcodes = similarity.ivfpq_index(
        rest, n_centroids=4, m=4, k=8, coarse_iters=2, pq_iters=1)
    res = [(r.vec_id, r.cosine) for r in
           similarity.ivfpq_search_rerank(
               rest, q, k=5, shortlist=49, nprobe=4, m=4,
               codes=rcodes, centroids=rc, codebooks=rcb,
               residual=True).collect()]
    assert res == exact
    # tight shortlist still returns k exact-cosine-ranked rows
    tight = similarity.ivfpq_search_rerank(
        rest, q, k=5, shortlist=10, nprobe=2, m=4,
        assigned=assigned, codes=codes, centroids=cents,
        codebooks=cb).collect()
    assert len(tight) == 5
    assert all(tight[i].cosine >= tight[i + 1].cosine for i in range(4))


def test_chunk_documents_overlap_and_coverage(spark):
    """Every token lands in >=1 chunk; consecutive chunks share exactly
    `overlap` tokens; short docs yield one whole-doc chunk; the plan is
    one codegen span (no shuffle, no UDF)."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(23))), (2, "a b")],
        "doc_id long, text string")
    out = (text.chunk_documents(docs, max_tokens=10, overlap=4)
           .orderBy("doc_id", "chunk_id").collect())
    d1 = [r for r in out if r.doc_id == 1]
    # n=23, stride=6 -> 1 + ceil(13/6) = 4 chunks
    assert [r.chunk_id for r in d1] == [0, 1, 2, 3]
    assert [r.chunk_tokens for r in d1] == [10, 10, 10, 5]
    toks = [r.chunk.split(" ") for r in d1]
    for a, b in zip(toks, toks[1:]):
        assert a[-4:] == b[:4]                      # shared context
    covered = set()
    for t in toks:
        covered.update(t)
    assert covered == {f"w{i}" for i in range(23)}  # full coverage
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk == "a b"
    with pytest.raises(ValueError):
        text.chunk_documents(docs, max_tokens=4, overlap=4)
    plan = text.chunk_documents(docs, 10, 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_epoch_shuffle_and_budget_select(spark):
    """epoch_shuffle: reproducible permutation, seed-sensitive, ranks
    are a 0..n-1 bijection; select_until_budget: greedy score-desc cut
    matches a serial cumsum."""
    from neo_server_spark.datapipe import sampling
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in sampling.epoch_shuffle(df, seed=1).collect()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in sampling.epoch_shuffle(df, seed=1).collect()}
    c = {r["doc_id"]: r["shuffle_rank"]
         for r in sampling.epoch_shuffle(df, seed=2).collect()}
    assert a == b                       # reproducible
    assert a != c                       # seed changes the permutation
    assert sorted(a.values()) == list(range(50))    # bijection
    assert [a[i] for i in range(50)] != list(range(50))  # shuffled

    docs = spark.createDataFrame(
        [(i, (i * 7) % 23, 10 + i % 5) for i in range(40)],
        "doc_id long, score long, toks long")
    got = sorted(r["doc_id"] for r in sampling.select_until_budget(
        docs, 120, "score", "toks").collect())
    rows = sorted(docs.collect(),
                  key=lambda r: (-r["score"], r["doc_id"]))
    want, cum = [], 0
    for r in rows:
        cum += r["toks"]
        if cum > 120:
            break
        want.append(r["doc_id"])
    assert got == sorted(want)
