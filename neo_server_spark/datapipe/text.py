"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs — so they vectorize over 100 TB of text
the same as any relational scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic.  Deterministic and closed-form so the result is reproducible
#: (and SQL-expressible for oracle checks).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


#: per-task input-bytes target for :func:`widen_narrow_input` — width is
#: sized to the INPUT, not to the core count (r16 probe at sf0.1 /
#: local[32], 0.57MB corpus: width 8-16 beats width 32 by 20-45% on
#: every widened curation op — c4 0.44s@8 vs 0.70s@32, readability
#: 0.38@16 vs 0.57@32, contamination 0.83@8 vs 1.07@32 — because below
#: ~tens of KB per task the exchange fan-out and task overhead outcost
#: the work being parallelized; the r15 fixed-width form showed exactly
#: that as 8-core-beats-32-core scaling ratios).  Ops whose per-row
#: work is much heavier (per-shingle multi-hash minhash: 2.99@32 vs
#: 3.43@16 on the same probe) pass a smaller target.
_WIDEN_TARGET_BYTES = 64 << 10


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated input size, from the optimized LOGICAL
    plan's statistics — unlike ``df.rdd`` this never compiles a
    physical plan (r15 ADVICE: the old partition-count check forced a
    full physical compile per operator invocation).  Returns None when
    the estimate is a sentinel (LogicalRDD / localCheckpoint inputs
    report defaultSizeInBytes ~ Long.Max) or unavailable."""
    try:
        s = int(str(df._jdf.queryExecution().optimizedPlan()
                    .stats().sizeInBytes()))
    except Exception:
        return None
    if s <= 0 or s >= (1 << 60):
        return None
    return s


def widen_narrow_input(df: DataFrame,
                       target_bytes: int = _WIDEN_TARGET_BYTES) -> DataFrame:
    """Round-robin repartition an input that arrives NARROWER than its
    per-row work deserves (scale-adaptive parallelism): heavy per-row
    work (per-gram hashing, per-token lambda folds, per-char kernels)
    otherwise runs at the scan's partition count — a single task for a
    small file.  Width = clamp(input_bytes / target_bytes, 1,
    defaultParallelism), so a trivial input adds NO exchange, a small
    one widens just enough, and at scale the scan is already wider than
    the clamp and this is a no-op.  Apply ONLY where the per-row work is
    measured to dominate the one-time round-robin exchange of the input
    (r15 at sf0.1: winnowing 0.75x, readability 0.64x, gopher 0.76x,
    c4 0.72x, char_entropy 0.87x, repetition 0.84x — while the LIGHT
    per-row ops measured the opposite: text_normalize 1.97x, text_stats
    1.76x, lm_score 1.61x, pii_scrub 1.47x, and stay un-widened)."""
    sc = df.sparkSession.sparkContext
    par = max(1, sc.defaultParallelism)
    size = _plan_size_bytes(df)
    if size is not None:
        width = min(par, -(-size // target_bytes))
        if width <= 1:
            # sub-target input: the exchange costs more than the work
            return df
        # a scan of `size` bytes already yields ~size/maxPartitionBytes
        # partitions; when that's >= width the exchange buys nothing
        try:
            mpb = int(df.sparkSession._jsparkSession.sessionState()
                      .conf().filesMaxPartitionBytes())
        except Exception:
            mpb = 128 * 1024 * 1024
        if size // mpb >= width:
            return df
        return df.repartition(width)
    # no usable size estimate (checkpointed / LogicalRDD inputs): fall
    # back to the physical partition-count check — cheap here, because
    # an RDD-backed frame has no scan to re-plan
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def tokens(text_col: Column | str = "text") -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def token_count(text_col: Column | str = "text") -> Column:
    return F.size(tokens(text_col))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: length, token count, mean token length,
    inverse type-token ratio (repetitiveness)."""
    toks = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("char_len"),
        F.size(toks).alias("n_tokens"),
        F.round(F.length(text_col) / F.size(toks), 6).alias("avg_token_len"),
        F.round(F.size(toks) / F.size(F.array_distinct(toks)), 6).alias("ttr_inv"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: penalize very short/very repetitive
    docs and high punctuation ratios (C4-style heuristic filters)."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    punct = F.length(F.regexp_replace(F.col(text_col), "[^\\.,;:!\\?]", "")).cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct / F.greatest(n_chars, F.lit(1.0)) * 10.0, F.lit(1.0))
    return docs.withColumn(
        "quality", F.round(ttr * 0.4 + len_score * 0.4 + punct_score * 0.2, 6)
    )


def token_count_by(docs: DataFrame, by: str = "lang", text_col: str = "text") -> DataFrame:
    return (
        docs.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).alias("total_tokens"),
            F.round(F.avg(token_count(text_col)), 6).alias("avg_tokens"),
        )
        .orderBy(by)
    )


def lang_id(docs: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: count marker hits per language over the token
    set, predict the argmax (ties → lexicographic language order).

    A real deployment would swap in a trained n-gram model; the operator shape
    (token explode → marker join → argmax) is the part that must scale.
    """
    toks = F.array_distinct(tokens(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, markers)).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by (score, reversed-lang) — array_max picks lexicographically
    # greatest struct; invert lang ordering so ties resolve to the first lang.
    best = F.array_max(F.array(*scores))
    return docs.withColumn(out, best["lang"]).withColumn("lang_score", best["score"])


def fingerprint(docs: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lowercased text.

    (The reference has no doc store; this supports exact-dedup and incremental
    ingest idempotence at the pipeline layer.)
    """
    return docs.withColumn(out, F.md5(F.lower(F.col(text_col))))


#: PII scrub patterns, applied in order (email before phone so the phone
#: pattern never bites into an address's digits; IP before phone likewise).
#: Every pattern is valid in both Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text",
              out: str | None = None) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-like digit runs.

    Pure chained ``regexp_replace`` — JVM-side, codegen'd, no UDF — so it
    runs at scan speed over any corpus size.  Patterns deliberately favor
    recall (a scrubbed-too-much token is cheap; a leaked identifier is not).
    """
    c = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return docs.withColumn(out or text_col, c)


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (input to MinHash / Jaccard dedup)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def vocab(docs: DataFrame, text_col: str = "text", top_k: int | None = None,
          min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: (token, count) by descending frequency.

    explode → hash-agg; partial (map-side) aggregation collapses each
    partition's token stream before the single shuffle on the token, so
    shuffle volume is O(vocabulary), not O(corpus tokens).  ``top_k``
    compiles to TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token").agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("token"))
    )
    return counts.limit(top_k) if top_k else counts


def tokens_re(text_col: Column | str = "text",
              pattern: str = r"\w+|[^\w\s]") -> Column:
    """Regex tokenization (BPE-style pre-tokenizer shape: word runs and
    individual punctuation marks as separate tokens)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def lm_score(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model score per document: mean ln p(token) under the
    corpus's own unigram distribution (a perplexity proxy — gibberish and
    boilerplate both surface as outliers).

    Two passes over the tokens, no driver round-trip: the vocabulary and its
    total are aggregated once and BROADCAST into the per-token join, so the
    big side (every token occurrence) is never shuffled — at 100 TB the
    vocabulary is the only thing that moves.
    """
    tok = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
    )
    v = (
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = v.agg(F.sum("__c").alias("__total"))
    return (
        tok.join(F.broadcast(v), "token")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(F.round(F.avg(F.log(F.col("__c") / F.col("__total"))), 6)
             .alias("lm_score"),
             F.count(F.lit(1)).alias("n_tokens"))
    )


def boilerplate_stats(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", sep: str = "\n",
                      min_dup: int = 2) -> DataFrame:
    """Per-document boilerplate profile: split into paragraphs (``sep``),
    count corpus-wide paragraph duplication by md5, report how many of each
    doc's paragraphs are boilerplate (appear in >= ``min_dup`` docs).

    The corpus-wide counts aggregate 16-byte digests, never paragraph text.
    The digest->is_boilerplate table scales with the number of distinct
    duplicated paragraphs — corpus cardinality, not dimension cardinality —
    so it must NOT be broadcast-hinted: at 100 TB it can exceed driver/executor
    broadcast memory.  No hint; AQE picks broadcast when the filtered side is
    actually small (same reasoning as series.py blocked-op joins).
    (FineWeb/C4-style line-level dedup shape.)
    """
    paras = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), sep)).alias("para"),
    ).filter(F.trim("para") != "").withColumn("ph", F.md5(F.trim("para")))
    counts = (
        paras.groupBy("ph")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_dup)
        .select("ph", F.lit(True).alias("is_boiler"))
    )
    return (
        paras.join(counts, "ph", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_paras"),
             F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boiler"))
    )


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", sep: str = "\n",
                       min_dup: int = 2) -> DataFrame:
    """Drop corpus-duplicated paragraphs from each document and reassemble
    the remainder in original order (posexplode position carries the order
    through the shuffle).  The boiler-digest table is corpus-cardinality, so
    no broadcast hint — AQE decides (see boilerplate_stats)."""
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).filter(F.trim("para") != "").withColumn("ph", F.md5(F.trim("para")))
    boiler = (
        paras.groupBy("ph").agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_dup)
        .select("ph", F.lit(True).alias("is_boiler"))
    )
    kept = paras.join(boiler, "ph", "left").filter(
        F.col("is_boiler").isNull())
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "para"))),
                        lambda s: s["para"]), sep).alias(text_col))
    )
    return docs.select(id_col).join(rebuilt, id_col, "left").withColumn(
        text_col, F.coalesce(text_col, F.lit("")))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher-style per-document repetition signals over word ``n``-grams:
    total/distinct gram counts, the most-frequent gram's share, and the
    share of gram occurrences that are duplicates.
    (Rae et al. 2021 "Gopher" repetition filters.)

    Zero-shuffle Arrow kernel (r16): every signal is per-document, so
    one mapInPandas pass emits the four INTEGER counts and the fractions
    stay JVM ``round(x/y, 6)`` expressions — bit-exactness is integer
    equality plus the identical division (pinned against the SQL fold in
    tests/test_arrow_equivalence.py).  r15 built this kernel, measured
    it SLOWER at sf0.1 and rejected it — under the old full-core-count
    widening, whose tiny per-task Arrow batches drowned the kernel in
    per-batch overhead.  With the size-proportional widen the same
    kernel measures 0.57x (sf0.1) / 0.44x (sf1) / 0.20x (sf10) against
    the JVM zip_with+explode+two-exchange shape, interleaved best-of-3,
    and it eliminates the (doc, gram) shuffle (~2x corpus bytes)
    entirely — the scale argument and the local measurement now agree.

    NULL text and docs with fewer than ``n`` tokens emit NO row, exactly
    like the former explode (split(NULL) -> NULL -> no gram rows).
    Tokenization matches the SQL ``filter(split(text, ' '),
    t -> trim(t) != '')``: Spark's trim strips 0x20 only, hence
    ``strip(" ")``."""
    from pyspark.sql.types import LongType, StructField, StructType

    docs = widen_narrow_input(docs.select(id_col, text_col))
    schema = StructType([
        StructField(id_col, docs.schema[id_col].dataType),
        StructField("__tot", LongType()),
        StructField("__dst", LongType()),
        StructField("__mx", LongType()),
        StructField("__dup", LongType()),
    ])

    def _kern(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            keep, tot, dst, mx, dup = [], [], [], [], []
            for k, txt in enumerate(pdf[text_col]):
                if txt is None:
                    continue
                toks = [t for t in txt.split(" ") if t.strip(" ") != ""]
                if len(toks) < n:
                    continue
                cnt = Counter(" ".join(toks[j:j + n])
                              for j in range(len(toks) - n + 1))
                keep.append(k)
                tot.append(sum(cnt.values()))
                dst.append(len(cnt))
                mx.append(max(cnt.values()))
                dup.append(sum(v for v in cnt.values() if v > 1))
            # id values slice out of the input batch so the column keeps
            # its exact arrow dtype whatever the caller's id type is
            out = pdf.iloc[keep][[id_col]].reset_index(drop=True)
            out["__tot"] = pd.array(tot, dtype="Int64")
            out["__dst"] = pd.array(dst, dtype="Int64")
            out["__mx"] = pd.array(mx, dtype="Int64")
            out["__dup"] = pd.array(dup, dtype="Int64")
            yield out

    return docs.mapInPandas(_kern, schema).select(
        F.col(id_col),
        F.col("__tot").alias("n_grams"),
        F.col("__dst").alias("n_distinct"),
        F.round(F.col("__mx") / F.col("__tot"), 6).alias("top_gram_frac"),
        F.round(F.col("__dup") / F.col("__tot"), 6).alias("dup_gram_frac"))


def _repetition_stats_sql(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """The JVM zip_with+explode+aggregate form of :func:`repetition_stats`
    — kept as the independent recomputation the kernel-equivalence test
    pins against (and as the shape to fall back to if a deployment
    cannot run Python workers)."""
    docs = widen_narrow_input(docs)
    gram_expr = "toks"
    for i in range(1, n):
        gram_expr = (f"filter(zip_with({gram_expr}, slice(toks, {i + 1}, "
                     "size(toks)), (x, y) -> concat(x, ' ', y)), "
                     "g -> g is not null)")
    toks = docs.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), t -> trim(t) != '')").alias("toks"),
    )
    grams = toks.select(id_col, F.explode(F.expr(gram_expr)).alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(F.sum("c").alias("n_grams"),
             F.count(F.lit(1)).alias("n_distinct"),
             F.round(F.max("c") / F.sum("c"), 6).alias("top_gram_frac"),
             F.round(F.coalesce(
                 F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
                 / F.sum("c"), 6).alias("dup_gram_frac"))
    )


def contamination(docs: DataFrame, bench: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 5,
                  threshold: float = 0.5) -> DataFrame:
    """Benchmark-decontamination screen: per document, the fraction of its
    distinct word ``shingle_n``-gram shingles that appear anywhere in the
    ``bench`` corpus, plus a ``contaminated`` flag at ``threshold``.

    The standard pre-training hygiene pass (n-gram overlap against eval
    sets, as in GPT-3/PaLM decontamination): a doc sharing most of its
    shingles with a benchmark leaks that benchmark into training.

    100 TB shape: the corpus explodes to shingles ONCE and meets the
    benchmark's DISTINCT shingle digests in a single broadcast LEFT join
    keyed on the xxhash64 digest — shuffle keys are fixed-width, the raw
    text never shuffles BY KEY (a narrow input is round-robin widened
    first so the shingle explode uses every core — 0.40x at sf0.1, a
    no-op at scale), and the benchmark side (eval sets — tiny by
    definition) broadcasts under AQE.  One aggregation counts total and
    matching shingles together, map-side-combined before the id shuffle.
    (The former totals-agg + semi-join + hits-agg + join shape exploded
    and hashed every corpus shingle TWICE and paid two aggregations —
    r15: one corpus pass, one exchange, identical outputs.)
    """
    d = widen_narrow_input(docs).select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("__s"))
    d = d.select(id_col, F.xxhash64("__s").alias("__h"))
    # the BENCH side shingles+hashes too — widen it as well (r16): a
    # single-file eval set otherwise builds its whole digest set on one
    # task (measured 0.57s of the 1.2s entry at sf0.1, ~the same cost
    # as the 9x larger corpus side); a no-op at scale like every widen
    b = (widen_narrow_input(bench)
         .select(F.explode(shingles(text_col, shingle_n)).alias("__s"))
         .select(F.xxhash64("__s").alias("__h")).distinct()
         .withColumn("__in", F.lit(1)))
    per = (d.join(b, "__h", "left")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.count("__in").alias("n_hits")))
    return per.select(
        id_col,
        "n_shingles",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("overlap"),
        (F.col("n_hits") / F.col("n_shingles")
         >= F.lit(threshold)).alias("contaminated"),
    )


def lm_buckets(docs: DataFrame, n_buckets: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """CCNet-style perplexity bucketing: rank documents by their unigram
    LM score (:func:`lm_score` — the perplexity proxy) and split into
    ``n_buckets`` equal-frequency tiers (head / middle / tail for the
    default 3).  Training pipelines upsample the head tier and drop or
    downsample the tail.

    ntile over a single global ordering: the ranked frame is only
    (id, score, n_tokens) — the text never enters the sort, so the global
    window is O(corpus docs) x 24 bytes.  Ties order by id for a
    deterministic split.  At corpus sizes where even that frame is too
    big for one task, swap the ntile for fixed score cutoffs from
    ``approx_percentile(lm_score, [1/n..])`` + a comparison bucket — the
    CCNet paper's actual procedure (cutoffs from a sample, then a
    scan-side filter); the exact ntile stays the verification path."""
    from pyspark.sql.window import Window
    scored = lm_score(docs, text_col=text_col, id_col=id_col)
    w = Window.orderBy(F.col("lm_score").desc(), F.col(id_col))
    names = {1: "head", 2: "middle", 3: "tail"}
    b = F.ntile(n_buckets).over(w)
    bucket = b if n_buckets != 3 else \
        F.element_at(F.lit(list(names.values())), b)
    return scored.select(
        id_col, "lm_score", "n_tokens",
        bucket.alias("bucket"))


def lm_bucket_profile(docs: DataFrame, n_buckets: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-bucket corpus profile (doc count, token total, LM-score range)
    — the table a curation run reports before choosing per-tier sampling
    rates."""
    b = lm_buckets(docs, n_buckets=n_buckets, text_col=text_col,
                   id_col=id_col)
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.round(F.min("lm_score"), 6).alias("min_score"),
                 F.round(F.max("lm_score"), 6).alias("max_score"))
            .orderBy("bucket"))


def chunk_documents(docs: DataFrame, max_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping token-budgeted chunks — the
    long-document splitting a retrieval / context-window pipeline needs
    (complement of pack_sequences, which packs ACROSS documents).

    Chunk ``k`` covers tokens ``[k*stride, k*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the last chunk is the first one
    whose window reaches the end of the document, so every token lands
    in at least one chunk and consecutive chunks share ``overlap``
    tokens of context.

    Entirely JVM-side (split -> sequence -> explode -> slice ->
    concat_ws inside whole-stage codegen): no UDF, no shuffle — a
    per-row flatMap that scales linearly with the scan.  Output: one
    row per (doc, chunk) with the chunk text and its token count.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        1 + F.ceil((n - max_tokens) / F.lit(stride)))
    out = (docs.select(
        F.col(id_col), toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0),
                             (n_chunks - 1).cast("int"))).alias("chunk_id"))
        .select(
            id_col, "chunk_id",
            F.slice(F.col("__toks"),
                    F.col("chunk_id") * stride + 1,
                    max_tokens).alias("__slice")))
    return out.select(
        id_col, "chunk_id",
        F.size("__slice").alias("chunk_tokens"),
        F.concat_ws(" ", "__slice").alias("chunk"))


def _token_offsets(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __nt, __off) rows: each document's token count and its running
    start offset in the ``(id_col, __nt)``-ordered concatenated token
    stream.

    Distributed prefix sum: range-partition on id, cumulate locally under a
    PARTITIONED window, and broadcast the per-partition totals back as a
    tiny map — no single-partition global window, so the layout scales to
    any corpus.  Text never enters the plan.

    Determinism hardening (the layout must be replayable bit-exact):
    - the checkpoint is EAGER, so the range-partitioner's sampled
      boundaries and every partition id are frozen in one materialization
      before the totals are collected — a lazy checkpoint left a window
      where re-evaluation could re-sample the ranges and shift every
      downstream offset while preserving the row count;
    - the in-partition cumulation orders by ``(id, __nt)``, a total order
      whenever ids are unique and still multiset-deterministic under
      duplicate ids (two docs tied on both id and token count produce
      identical assignment rows either way);
    - the per-partition prefix is ordered by each partition's observed
      ``min(id)`` rather than by trusting the partition-id numbering,
      with a disjoint-range sanity check.
    """
    from pyspark.sql.window import Window
    sized = (docs.select(F.col(id_col),
                         F.size(tokens(text_col)).alias("__nt"))
             .repartitionByRange(F.col(id_col))
             .sortWithinPartitions(id_col, "__nt")
             .withColumn("__pid", F.spark_partition_id())
             .localCheckpoint(eager=True))
    stats = (sized.groupBy("__pid")
             .agg(F.sum("__nt").alias("t"),
                  F.min(id_col).alias("lo"),
                  F.max(id_col).alias("hi"))
             .collect())
    stats.sort(key=lambda r: (r["lo"] is not None, r["lo"]))
    for a, b in zip(stats, stats[1:]):
        if a["hi"] is not None and b["lo"] is not None and a["hi"] > b["lo"]:
            raise RuntimeError(
                "pack_sequences: range partitions overlap "
                f"({a['hi']!r} > {b['lo']!r}) — layout not replayable")
    prefix, acc = {}, 0
    for r in stats:
        prefix[r["__pid"]] = acc
        acc += r["t"]
    pref_col = F.element_at(
        F.create_map(*[F.lit(x) for pid in prefix
                       for x in (pid, prefix[pid])]),
        F.col("__pid")) if prefix else F.lit(0)
    w = (Window.partitionBy("__pid").orderBy(id_col, "__nt")
         .rowsBetween(Window.unboundedPreceding, -1))
    return sized.withColumn(
        "__off", pref_col + F.coalesce(F.sum("__nt").over(w), F.lit(0)))


def pack_sequences(docs: DataFrame, window: int = 512,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Concatenate-and-chunk sequence packing plan: documents are laid out
    in ``id_col`` order into one token stream and cut into fixed
    ``window``-token training sequences (the standard LM pretraining
    packing).  Returns one row per (doc, chunk) assignment with the
    token range the document occupies inside the chunk — the shuffle-free
    plan a writer job can execute partition-parallel.

    The running offset is a distributed prefix sum: (id, n_tokens) rows
    range-partition on id, each partition cumulates locally under a
    PARTITIONED window, and the per-partition totals (one tiny row each)
    come back to the driver to form the broadcast partition-prefix table
    — no single-partition global window, so the layout scales to any
    corpus.  Text never enters the plan.  A document spanning a chunk
    boundary appears once per chunk it crosses.
    """
    laid = _token_offsets(docs, text_col, id_col)
    first = (F.col("__off") / window).cast("long")
    last = ((F.col("__off") + F.col("__nt") - 1) / window).cast("long")
    chunks = laid.select(
        id_col, "__nt", "__off",
        F.explode(F.sequence(first, last)).alias("chunk_id"))
    cstart = F.col("chunk_id") * window
    return chunks.select(
        id_col,
        "chunk_id",
        F.greatest(F.col("__off") - cstart, F.lit(0)).alias("chunk_start"),
        (F.least(F.col("__off") + F.col("__nt") - cstart, F.lit(window))
         - 1).alias("chunk_end"),
    )


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text",
              lowercase: bool = True) -> list[tuple]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) over the
    corpus: learn ``n_merges`` merge rules by repeatedly fusing the most
    frequent adjacent symbol pair.

    Classic BPE trains on the WORD-FREQUENCY table, so the corpus is
    scanned once (distributed explode -> word counts); every merge
    iteration then runs on the compact (word, freq) frame — pair counts
    are a JVM transform + explode + map-side-combined sum, and the merge
    itself is a literal string replace on the space-joined symbol form
    (identical left-to-right non-overlap semantics in Spark, Python and
    DuckDB, which is what makes the whole trainer SQL-certifiable).
    Ties break on the lexicographically smallest pair for determinism.

    Returns [(rank, left, right, merged, count), ...].
    """
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (docs.select(F.explode(F.split(c, " ")).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    # symbol form: characters space-joined, padded for anchored replace
    sym = F.concat(F.lit(" "),
                   F.array_join(F.split(F.col("w"), ""), " "),
                   F.lit(" "))
    # the (word, freq) frame is vocabulary-sized — keep it on a handful of
    # partitions so each merge round pays tasks proportional to the data,
    # not to spark.sql.shuffle.partitions
    state = words.select(sym.alias("s"), "freq").coalesce(4) \
        .localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rank in range(n_merges):
        toks = F.split(F.trim(F.col("s")), " ")
        # guard single-symbol words: sequence(1,0) would DESCEND in Spark
        pairs = F.when(
            F.size(toks) > 1,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                                   F.element_at(toks, i + 1)))
        ).otherwise(F.array().cast("array<string>"))
        top = (state.select(F.explode(pairs).alias("p"), "freq")
               .groupBy("p").agg(F.sum("freq").alias("c"))
               .orderBy(F.col("c").desc(), "p").first())
        if top is None or top["c"] is None:
            break
        left, right = top["p"].split(" ", 1)
        merges.append((rank, left, right, left + right, int(top["c"])))
        state = state.select(
            F.expr("replace(s, ' {} {} ', ' {} ')".format(
                left.replace("'", "\\'"), right.replace("'", "\\'"),
                (left + right).replace("'", "\\'"))).alias("s"),
            "freq").coalesce(4).localCheckpoint(eager=False)
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple],
               text_col: str = "text", id_col: str = "doc_id",
               lowercase: bool = True) -> DataFrame:
    """Apply learned BPE merges (:func:`bpe_train` output, or any ordered
    merge list) to tokenize each document: every word becomes its
    space-joined symbol string, then the merges chain as literal replaces
    in rank order — one scan-side JVM expression chain, no Python.

    Returns (id, bpe_tokens array, n_bpe_tokens).
    """
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    # per word: ' c h a r s ' padded symbol string
    word_syms = F.transform(
        F.filter(F.split(c, " "), lambda w: w != ""),
        lambda w: F.concat(F.lit(" "),
                           F.array_join(F.split(w, ""), " "), F.lit(" ")))

    d = docs.select(F.col(id_col), word_syms.alias("__ws"))
    for m in merges:   # each select rewrites __ws so the replaces CHAIN
        lhs, rhs = m[1], m[2]
        d = d.select(
            F.col(id_col),
            F.expr("transform(__ws, s -> replace(s, ' {0} {1} ', ' {2} '))"
                   .format(lhs.replace("'", "\\'"),
                           rhs.replace("'", "\\'"),
                           (lhs + rhs).replace("'", "\\'")))
            .alias("__ws"))
    toks = F.flatten(F.transform(
        F.col("__ws"), lambda s: F.split(F.trim(s), " ")))
    return d.select(
        F.col(id_col), toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"))


def classifier_score(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Model-based quality filtering: a fastText-architecture linear
    classifier (Joulin et al. 2016 — the model family behind CCNet/LLaMA
    quality filters) scored entirely with JVM expressions.

    Features are hashed unigrams + bigrams; the doc score is
    sigmoid(mean(w[f])), i.e. a bag-of-features linear model.  Weights here
    are derived from the md5 of each feature (uniform in [-1,1)) — a
    deterministic stand-in for trained weights that keeps the whole scoring
    path (feature hashing, bigram construction, mean pooling, sigmoid)
    engine-checkable; production swaps the hash weight for a lookup into a
    broadcast trained-weight map, nothing else changes.

    Scale shape: per-row work only — no shuffle, no vocabulary join.  The
    feature fold runs in an Arrow-batched kernel with a per-task weight
    cache (each distinct feature's md5 is computed once per task, not once
    per occurrence — a cross-row memo the per-row SQL expression could not
    express); the fold itself keeps the identical sequential order
    (unigrams left-to-right, then bigrams left-to-right) and the identical
    float64 operation sequence, so the mean margin is bit-equal to the
    former interpreted ``F.aggregate`` form.  Sigmoid / rounding /
    threshold stay JVM-side expressions over the kernel's raw margin.

    Returns (id, margin, clf_score, keep) with keep <=> margin >= 0.
    """
    id_type = docs.schema[id_col].dataType

    def _score(batches):
        import hashlib

        wcache: dict = {}

        def w(t):
            v = wcache.get(t)
            if v is None:
                h = hashlib.md5(t.encode("utf-8")).hexdigest()[:8]
                v = (int(h, 16) / 4294967296.0) * 2.0 - 1.0
                wcache[t] = v
            return v

        for pdf in batches:
            out = []
            for s in pdf[text_col]:
                if s is None:
                    out.append(None)
                    continue
                toks = s.split(" ")
                acc = 0.0
                for t in toks:          # unigrams, left to right
                    acc += w(t)
                prev = toks[0]
                for t in toks[1:]:      # then bigrams, left to right
                    acc += w(prev + "_" + t)
                    prev = t
                out.append(acc / float(2 * len(toks) - 1))
            pdf = pdf[[id_col]].copy()
            pdf["__s"] = out
            yield pdf

    from pyspark.sql.types import DoubleType, StructField, StructType

    scored = docs.select(id_col, text_col).mapInPandas(
        _score, schema=StructType([StructField(id_col, id_type),
                                   StructField("__s", DoubleType())]))
    s = F.col("__s")
    return scored.select(
        F.col(id_col),
        F.round(s, 6).alias("margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), 6).alias("clf_score"),
        (s >= F.lit(0.0)).alias("keep"),
    )


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", out: str = "norm_text",
                   nfc: bool = True) -> DataFrame:
    """Corpus text normalization — the first stage of every training
    pipeline: Unicode NFC composition, control-character strip (keeping
    \\n and \\t), and horizontal-whitespace collapse with edge trim.

    NFC runs in an Arrow-batched ``mapInPandas`` kernel (Python
    ``unicodedata`` — composition tables aren't expressible as Spark
    built-ins); it is pure per-row, so the stage pipelines into the scan
    with zero shuffle and scales linearly.  The regex cleanup stays
    JVM-side.  DuckDB's ``nfc_normalize`` reproduces the kernel exactly,
    which keeps the whole operator oracle-certifiable.
    """
    cleaned = F.trim(F.regexp_replace(F.regexp_replace(
        F.col(text_col),
        "[\\x00-\\x08\\x0b-\\x1f\\x7f]", ""), " {2,}", " "))
    staged = docs.select(F.col(id_col), cleaned.alias(out))
    if not nfc:
        return staged
    schema = f"{id_col} long, {out} string"

    def _nfc(batches):
        import unicodedata
        for pdf in batches:
            pdf[out] = pdf[out].map(
                lambda s: unicodedata.normalize("NFC", s) if s is not None else None)
            yield pdf

    return staged.mapInPandas(_nfc, schema=schema)


def shard_plan(docs: DataFrame, shard_tokens: int = 1_000_000,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-budgeted shard assignment for training-corpus export: documents
    in ``id_col`` order fill shards of ~``shard_tokens`` tokens; a document
    belongs to the single shard its FIRST token lands in, so shards are
    contiguous in id, within one document of the budget, and a writer can
    materialize each shard independently.

    Same distributed prefix sum as ``pack_sequences`` — no global window,
    text never shuffles.  Returns (id, n_tokens, shard_id).
    """
    laid = _token_offsets(docs, text_col, id_col)
    return laid.select(
        F.col(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        (F.col("__off") / shard_tokens).cast("long").alias("shard_id"))


def write_shards(docs: DataFrame, path: str, shard_tokens: int = 1_000_000,
                 text_col: str = "text", id_col: str = "doc_id",
                 mode: str = "error") -> DataFrame:
    """Materialize the :func:`shard_plan`: parquet partitioned by
    ``shard_id``, one output task per shard (``repartition`` on the shard
    key co-locates a shard's docs so each directory is written by one
    task stream).  Returns the per-shard manifest (shard_id, n_docs,
    n_tokens) the export job logs/validates against.
    """
    plan = shard_plan(docs, shard_tokens, text_col=text_col, id_col=id_col)
    out = docs.join(plan, id_col)
    (out.repartition(F.col("shard_id"))
        .write.mode(mode).partitionBy("shard_id").parquet(path))
    return (plan.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"))
            .orderBy("shard_id"))
