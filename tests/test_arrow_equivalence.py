"""The Arrow fast paths claim BITWISE equality with their SQL/expression
forms — these tests pin that claim against independent references:

- exact_cosine_pairs vs the HOF cosine_expr self-join (same floats)
- ngram_jaccard_pairs vs a direct Python set model (exact rationals)
- _assign fast path vs the distributed crossJoin/window form
- band_buckets vs a per-row expression recomputation of the sign bits
"""

import pyspark.sql.functions as F
import pytest

from neo_server_spark.datapipe import dedup, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from neo_server_spark import io as nio
    return nio.load_table(spark, sf_dir, "embeddings").limit(120)


def test_exact_cosine_pairs_matches_hof_expression(spark, emb):
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dedup.exact_cosine_pairs(emb, threshold=0.3).collect()}
    a, b = emb.alias("a"), emb.alias("b")
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                similarity.cosine_expr(F.col("a.embedding"),
                                       F.col("b.embedding")).alias("c"))
        .filter(F.col("c") >= 0.3)
        .select("id_a", "id_b", F.round("c", 6).alias("cosine"))
    ).collect()}
    assert got == want     # same pairs, same rounded floats, bit for bit


def test_exact_cosine_pairs_size_guard(spark, emb):
    """r13 verdict #5: the O(N^2) oracle collects the full matrix
    driver-side BY DESIGN — but only for oracle-sized inputs.  Above
    max_rows it refuses with a pointer to the scale path instead of
    OOMing the driver; the kwarg overrides deliberately."""
    with pytest.raises(ValueError, match="embedding_dupes"):
        dedup.exact_cosine_pairs(emb, threshold=0.3, max_rows=50)
    n = dedup.exact_cosine_pairs(emb, threshold=0.3,
                                 max_rows=120).count()
    assert n == dedup.exact_cosine_pairs(emb, threshold=0.3).count()


def test_jaccard_kernel_matches_python_sets(spark):
    texts = ["a b c d e", "b c d e f", "x y z", "a b c d e", "c d e f g h",
             "", "a", "a a a b b"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(df, shingle_n=3,
                                              threshold=0.2).collect()}
    # direct model: the exact shingle-set semantics of text.shingles
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 3])
                for i in range(max(len(toks) - 3, 0) + 1)}
    want = {}
    for i, ti in enumerate(texts):
        for j in range(i + 1, len(texts)):
            si, sj = sh(ti), sh(texts[j])
            jac = len(si & sj) / len(si | sj)
            if jac >= 0.2:
                want[(i, j)] = round(jac, 6)
    assert got == want


def test_assign_fast_path_matches_crossjoin_form(spark, emb, monkeypatch):
    cents = emb.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    fast = {r["vec_id"]: r["cid"] for r in
            similarity._assign(emb, cents, "embedding", "vec_id").collect()}
    monkeypatch.setattr(similarity, "_ASSIGN_CLOSURE_CELLS", 0)
    slow = {r["vec_id"]: r["cid"] for r in
            similarity._assign(emb, cents, "embedding", "vec_id").collect()}
    assert fast == slow


def test_band_buckets_matches_expression_recompute(spark, emb):
    bits, bands = 4, 3
    got = {(r["vec_id"], r["__band"]): r["__bucket"] for r in
           dedup.band_buckets(emb.select("vec_id", "embedding"),
                              "embedding", "vec_id", bits, bands,
                              hash_fn="md5").collect()}
    # per-row expression recomputation of the sign bits (the pre-Arrow form)
    def band_bucket(band):
        expr = None
        for b in range(bits):
            bit = F.when(
                F.aggregate(
                    F.zip_with(F.col("embedding"),
                               dedup._hyperplane(F.size("embedding"),
                                                 band * bits + b, "md5"),
                               lambda x, h: x * h),
                    F.lit(0.0), lambda a, x: a + x) > 0,
                F.lit(1 << b)).otherwise(0)
            expr = bit if expr is None else expr + bit
        return expr
    want = {}
    rows = emb.select(
        "vec_id", *[band_bucket(i).alias(f"b{i}") for i in range(bands)]
    ).collect()
    for r in rows:
        for i in range(bands):
            want[(r["vec_id"], i)] = r[f"b{i}"]
    assert got == want


def test_repetition_kernel_matches_sql_fold(spark, sf_dir):
    """repetition_stats' Arrow kernel (r16) must equal the former JVM
    zip_with+explode+aggregate fold EXACTLY — integer counts and the
    round(6) fractions — including the absent-row semantics for NULL
    text and docs shorter than n tokens, and single-0x20 tokenization
    (Spark trim strips spaces only, not all whitespace)."""
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe import text as T

    edge = spark.createDataFrame(
        [(1, "a b a b a"), (2, None), (3, ""), (4, "x"), (5, "  a   b  "),
         (6, "ü ü ü ö"), (7, "a\tb c"), (8, " "),
         (9, "a b")],
        "doc_id long, text string")
    corpus = nio.load_table(spark, sf_dir, "documents")
    for docs in (edge, corpus):
        for n in (1, 2, 3):
            got = sorted(map(tuple, T.repetition_stats(docs, n=n).collect()))
            want = sorted(map(tuple,
                              T._repetition_stats_sql(docs, n=n).collect()))
            assert got == want, (n, got[:3], want[:3])
