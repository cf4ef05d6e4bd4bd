"""Corpus-curation operators, round 8: C4 heuristic cleaning, corpus-global
line deduplication, DSIR importance resampling, winnowing fingerprints
(MOSS), and per-document TF-IDF keyword extraction.

Like the rest of ``datapipe``, every hot-path expression is a built-in
``pyspark.sql.functions`` call (JVM-side, whole-stage codegen).  Where a
cross-engine-reproducible hash is needed for the DuckDB oracle, the same
md5-prefix technique as ``dedup.minhash_signature`` is used (``hash_fn``
parameter; ``xxhash64`` stays the production default).

References: Raffel et al. 2020 (C4, JMLR 21/140) for the heuristic rules;
Xie et al. 2023 (arXiv:2302.03169) for DSIR; Schleimer, Wilkerson & Aiken
2003 (SIGMOD) for winnowing.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from neo_server_spark.datapipe.text import _plan_size_bytes, widen_narrow_input

#: estimated-input-bytes gate for lm_score_bigram's vocab pin: below it
#: the corpus re-scans are cheaper than materializing the vocab
#: (measured 1.09-1.15x SLOWER pinned at sf0.1 / sf1 / sf10 = up to
#: 1.5GB local); above it the 3 saved corpus scans dominate the
#: vocabulary-sized checkpoint.  Set one decade above the largest
#: measured still-losing point.
_LM2_PIN_MIN_BYTES = 16 << 30

__all__ = [
    "c4_line_stats",
    "c4_clean",
    "dedup_lines",
    "dsir_logratios",
    "dsir_weights",
    "dsir_select",
    "winnow_fingerprints",
    "winnow_profile",
    "winnow_overlap",
    "tfidf_top_terms",
    "lm_score_bigram",
    "char_entropy",
    "mad_outliers",
    "gopher_quality",
    "readability",
    "GOPHER_STOPS",
]


def _sep_lit(s: str) -> str:
    """A Spark-SQL string literal holding a regex that matches ``s``
    LITERALLY (``F.split`` takes a Java regex, so '|' etc. must be quoted)."""
    import re
    quoted = re.escape(s)
    return "'" + (quoted.replace("\\", "\\\\").replace("'", "\\'")
                        .replace("\n", "\\n").replace("\t", "\\t")) + "'"


def _lines(text_col: str, sep: str) -> Column:
    """Non-empty trimmed lines of ``text_col`` as an array column."""
    return F.expr(
        f"filter(transform(split({text_col}, {_sep_lit(sep)}), l -> trim(l)),"
        " l -> l != '')")


# ---------------------------------------------------------------------------
# C4 heuristic cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

_TERMINAL = (".", "!", "?", '"', "'")


def _kept_lines(text_col: str, sep: str, min_words: int) -> Column:
    """Lines that survive C4's line-level rules: terminal punctuation,
    at least ``min_words`` words, and no mention of 'javascript'."""
    term = ("endswith(l, '.') or endswith(l, '!') or endswith(l, '?')"
            " or endswith(l, '\"') or endswith(l, '\\'')")
    return F.expr(
        f"filter(transform(split({text_col}, {_sep_lit(sep)}), l -> trim(l)), l ->"
        f" l != '' and ({term})"
        f" and size(filter(split(l, ' '), w -> w != '')) >= {min_words}"
        f" and lower(l) not like '%javascript%')")


def c4_line_stats(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", sep: str = "\n",
                  min_words: int = 5, min_lines: int = 3) -> DataFrame:
    """Per-document C4 cleaning profile: how many lines survive each of the
    line-level rules, plus the document-level removal flags.

    The C4 rules (Raffel et al. 2020 §2.2), applied verbatim:
      * keep only lines ending in a terminal punctuation mark;
      * keep only lines with >= ``min_words`` words (C4 uses 5);
      * drop any line containing the word "javascript";
      * remove the whole page if it contains "lorem ipsum" or "{", or if
        fewer than ``min_lines`` lines survive (C4: 3 sentences).

    100 TB shape: a single narrow projection — per-row array expressions,
    no keyed shuffle, no UDF; a narrow input is round-robin widened so
    the per-line lambda work uses every core (no-op at scale).
    """
    docs = widen_narrow_input(docs)
    lines = _lines(text_col, sep)
    kept = _kept_lines(text_col, sep, min_words)
    low = F.lower(F.col(text_col))
    n_kept = F.size(kept)
    reason = (
        F.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(low.contains("{"), F.lit("curly_brace"))
        .when(n_kept < min_lines, F.lit("too_few_lines"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        (reason != "").alias("doc_removed"),
        reason.alias("reason"),
    )


def c4_clean(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             sep: str = "\n", min_words: int = 5,
             min_lines: int = 3) -> DataFrame:
    """The cleaning pass itself: documents that survive the C4 page-level
    rules, with their text rebuilt from only the surviving lines.

    Same scan-side shape as :func:`c4_line_stats` (widened when narrow).
    """
    docs = widen_narrow_input(docs)
    kept = _kept_lines(text_col, sep, min_words)
    low = F.lower(F.col(text_col))
    out = docs.withColumn("__kept", kept).filter(
        ~low.contains("lorem ipsum") & ~low.contains("{")
        & (F.size(F.col("__kept")) >= min_lines))
    return out.select(
        F.col(id_col),
        F.array_join("__kept", sep).alias(text_col),
        F.size("__kept").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Corpus-global line deduplication (the C4 "three-sentence span" dedup,
# at line granularity)
# ---------------------------------------------------------------------------

def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Remove every duplicate line across the WHOLE corpus, keeping only its
    first occurrence (lowest (doc, line-position)); documents are rebuilt
    from their surviving lines in order.

    C4 deduplicates three-sentence spans corpus-wide the same way (Raffel
    et al. 2020 §2.2); line granularity is the common variant (CCNet's
    per-shard first pass).

    100 TB shape: the text NEVER shuffles.  Only (digest, doc, pos) —
    16 bytes plus ids per line — leaves the scan; keeper election is a
    groupBy(min) on the digest; the surviving positions collapse to one
    sorted int array per document and join back to the original docs on
    the id (AQE broadcasts the array side when it's small); the document
    is then rebuilt ROW-LOCALLY by indexing its own line array.
    """
    keyed = docs.select(
        F.col(id_col),
        F.posexplode(_lines(text_col, sep)).alias("pos", "line"),
    ).select(id_col, "pos", F.md5("line").alias("__d"))
    keepers = (
        keyed.groupBy("__d")
        .agg(F.min(F.struct(id_col, "pos")).alias("k"))
        .select(F.col(f"k.{id_col}").alias(id_col), F.col("k.pos").alias("pos"))
    )
    kept_pos = (
        keepers.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("__keep"))
    )
    return (
        docs.select(F.col(id_col), _lines(text_col, sep).alias("__l"))
        .join(kept_pos, id_col)
        .select(
            id_col,
            F.array_join(F.expr("transform(__keep, p -> __l[p])"), sep)
            .alias(text_col),
            F.size("__keep").cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def _bucket(tok: Column, n_buckets: int, hash_fn: str) -> Column:
    """Hashed-unigram feature bucket, cross-engine reproducible in md5 mode
    (same construction as dedup.minhash_signature's one-hash family)."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(tok), F.lit(n_buckets))
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return F.pmod(F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long"),
                  F.lit(n_buckets))


def _doc_bucket_counts(docs: DataFrame, text_col: str, id_col: str,
                       n_buckets: int, hash_fn: str) -> DataFrame:
    """(doc, bucket, count) — the per-document hashed-unigram histogram
    both DSIR halves consume.  Map-side combined: each scan task
    collapses its token stream to <= n_buckets rows per document before
    the id shuffle."""
    return (
        docs.select(F.col(id_col),
                    F.explode(F.split(text_col, " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(id_col, _bucket(F.col("tok"), n_buckets, hash_fn).alias("bucket"))
        .groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_logratios(raw: DataFrame, target: DataFrame, text_col: str = "text",
                   n_buckets: int = 64, hash_fn: str = "xxhash64",
                   raw_counts: DataFrame | None = None) -> DataFrame:
    """The DSIR importance model: hashed-unigram bucket distributions for
    the raw corpus and the target domain, Laplace-smoothed, as an O(buckets)
    frame of per-bucket log ratios ln(p_target / p_raw).

    Both distributions are one map-side-combined aggregation each — the
    token stream collapses to ``n_buckets`` rows before any shuffle.
    ``raw_counts`` (a ``_doc_bucket_counts`` frame) lets ``dsir_select``
    fold the raw distribution from the per-document histogram it already
    computes — the corpus is then tokenized and hashed ONCE for the
    whole selection instead of once per half (the per-bucket sums are
    identical by associativity).
    """
    def dist(df: DataFrame, name: str) -> DataFrame:
        t = df.select(F.explode(F.split(text_col, " ")).alias("tok")) \
              .filter(F.col("tok") != "")
        return (t.select(_bucket(F.col("tok"), n_buckets, hash_fn).alias("bucket"))
                 .groupBy("bucket").agg(F.count(F.lit(1)).alias(name)))

    raw_dist = (raw_counts.groupBy("bucket").agg(F.sum("c").alias("c_raw"))
                if raw_counts is not None else dist(raw, "c_raw"))
    grid = raw.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    counts = (grid.join(raw_dist, "bucket", "left")
                  .join(dist(target, "c_tgt"), "bucket", "left")
                  .na.fill(0, ["c_raw", "c_tgt"]))
    tot = counts.agg(F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt"))
    return (
        counts.join(F.broadcast(tot))
        .select("bucket",
                (F.log((F.col("c_tgt") + 1) / (F.col("t_tgt") + n_buckets))
                 - F.log((F.col("c_raw") + 1) / (F.col("t_raw") + n_buckets))
                 ).alias("log_ratio"))
    )


def dsir_weights(docs: DataFrame, logratios: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n_buckets: int = 64,
                 hash_fn: str = "xxhash64",
                 per_bucket: DataFrame | None = None) -> DataFrame:
    """Per-document DSIR importance weight: sum over token occurrences of
    the bucket log ratio (= ln of the ratio of unigram LM likelihoods).

    The corpus explodes to (doc, bucket, count) — map-side combined — and
    joins the BROADCAST O(buckets) ratio table; text never shuffles.
    ``per_bucket`` accepts a precomputed ``_doc_bucket_counts`` frame
    (see ``dsir_select`` — one corpus tokenize for both halves).
    """
    if per_bucket is None:
        per_bucket = _doc_bucket_counts(docs, text_col, id_col,
                                        n_buckets, hash_fn)
    return (
        per_bucket.join(F.broadcast(logratios), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("c") * F.col("log_ratio")), 6).alias("log_w"),
             F.sum("c").alias("n_tokens"))
    )


def dsir_select(docs: DataFrame, target: DataFrame, fraction: float,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """DSIR selection: keep the top ``fraction`` of documents by importance
    weight (ties broken by id for determinism).

    The rank is computed on the O(docs)-row weights frame, not the corpus.
    (At extreme scale you would cut at an approx_percentile threshold
    instead of a global rank — same selection up to ties; the exact rank
    keeps the result reproducible for the oracle.)
    """
    # ONE corpus tokenize+hash pass serves both halves: the per-document
    # histogram is checkpointed (O(docs x buckets) narrow rows — far
    # smaller than the text) and the raw distribution folds from it by
    # associativity; the former shape tokenized and md5/xxhashed the
    # whole corpus once for the distribution AND once for the weights.
    per_bucket = _doc_bucket_counts(docs, text_col, id_col, n_buckets,
                                    hash_fn).localCheckpoint(eager=False)
    lr = dsir_logratios(docs, target, text_col, n_buckets, hash_fn,
                        raw_counts=per_bucket)
    w = dsir_weights(docs, lr, text_col, id_col, n_buckets, hash_fn,
                     per_bucket=per_bucket)
    n = F.count(F.lit(1)).over(Window.partitionBy())
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("log_w"), F.col(id_col)))
    return w.select(
        id_col, "log_w", "n_tokens",
        (rank <= F.ceil(n * F.lit(fraction))).alias("selected"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------

#: position packing for the windowed argmin: key = hash * 2^21 + (2^21-1-pos)
#: so that min(key) picks the smallest hash and, on ties, the RIGHTMOST
#: position — the winnowing tie-break.  2^21 positions caps documents at 2M
#: k-grams per doc (not corpus size); raise the shift for longer documents.
_POS_BITS = 21
_POS_MOD = 1 << _POS_BITS


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints: hash every word ``k``-gram, slide a
    window of ``w`` consecutive hashes, and keep each window's minimum
    (rightmost on ties).  Guarantees every match of length >= w+k-1 tokens
    shares a fingerprint — the MOSS local-fingerprinting scheme.

    Output: (id, pos, fp) — one row per selected k-gram position.

    100 TB shape: the whole selection is per-document ARRAY arithmetic
    (transform/slice/array_min over the packed hash+position key) — zero
    shuffle, zero UDF; only the selected fingerprints (a ~2/(w+1) fraction
    of grams) leave the scan.  The 28-bit md5-prefix hash is cross-engine
    reproducible for the oracle; collisions only make fingerprinting
    slightly more selective, which MOSS tolerates by design.  A narrow
    input is widened first — the per-gram md5 dominates and otherwise
    runs at the scan's partition count (r15: 0.75x at sf0.1; an Arrow
    kernel form was built, proven bit-equal and measured SLOWER than
    the widened SQL form — 1.23 vs 1.02 — so the SQL form stays).
    """
    docs = widen_narrow_input(docs)
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    d = docs.select(F.col(id_col), toks.alias("__t"))
    d = d.withColumn("__n", F.size("__t")).filter(F.col("__n") >= k)
    # packed keys: one per k-gram start position (1-based)
    gram = ("array_join(slice(__t, i, {k}), ' ')").format(k=k)
    keys = F.expr(
        f"transform(sequence(1, __n - {k} + 1), i ->"
        f" cast(conv(substring(md5({gram}), 1, 7), 16, 10) as bigint)"
        f" * {_POS_MOD}L + ({_POS_MOD}L - 1 - i))")
    d = d.withColumn("__keys", keys).withColumn("__g", F.size("__keys"))
    wins = F.expr(
        f"case when __g >= {w} then array_distinct(transform("
        f"sequence(1, __g - {w} + 1), s -> array_min(slice(__keys, s, {w}))))"
        f" else array(array_min(__keys)) end")
    return (
        d.select(F.col(id_col), F.explode(wins).alias("__k"))
        .select(
            id_col,
            (F.lit(_POS_MOD - 1) - F.pmod("__k", F.lit(_POS_MOD))).alias("pos"),
            F.expr(f"__k div {_POS_MOD}L").alias("fp"),
        )
    )


def winnow_profile(docs: DataFrame, k: int = 5, w: int = 4,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document fingerprint profile: how many positions were selected,
    how many distinct fingerprint values, and the density vs gram count."""
    fps = winnow_fingerprints(docs, k, w, text_col, id_col)
    grams = docs.select(
        F.col(id_col),
        (F.size(F.expr(f"filter(split({text_col}, ' '), t -> t != '')"))
         - k + 1).cast("long").alias("n_grams"))
    prof = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.countDistinct("fp").alias("n_distinct"),
        F.min("fp").alias("min_fp"))
    return (
        grams.filter(F.col("n_grams") >= 1)
        .join(prof, id_col, "left")
        .select(id_col, "n_grams",
                F.coalesce("n_fps", F.lit(0)).alias("n_fps"),
                F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
                F.round(F.coalesce("n_fps", F.lit(0)) /
                        F.greatest("n_grams", F.lit(1)), 6).alias("density"),
                "min_fp")
    )


def winnow_overlap(docs: DataFrame, k: int = 5, w: int = 4,
                   min_shared: int = 2, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """MOSS-style overlap report: document pairs sharing >= ``min_shared``
    distinct winnowing fingerprints.

    The join is keyed on the fingerprint VALUE (28-bit int) after a
    per-(doc,fp) distinct — only fingerprint ids shuffle.  Fingerprints
    shared by huge numbers of documents are corpus boilerplate, not
    plagiarism signal, so the pair blow-up is bounded by dropping any fp
    held by more than 1000 documents (same hot-key fence as the LSH
    band-bucket join).
    """
    fps = winnow_fingerprints(docs, k, w, text_col, id_col) \
        .select(id_col, "fp").distinct()
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("c")) \
             .filter(F.col("c") > 1000).select("fp")
    cold = fps.join(hot, "fp", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def tfidf_top_terms(docs: DataFrame, top_k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top ``top_k`` terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the scikit-learn convention), ties broken
    alphabetically for determinism.

    100 TB shape: term frequencies are a (doc, term) map-side-combined
    aggregation; document frequencies collapse to O(vocab) rows and join
    back on the term (vocab frame broadcasts under AQE when small); the
    final top-k is a per-doc window over at most |doc vocab| rows.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
        # tf feeds BOTH the document-frequency fold and the scored join;
        # un-pinned, Catalyst re-tokenizes the corpus for each (r15 plan
        # audit).  The per-doc vocabulary is strictly smaller than the
        # token stream, so pinning it is the cheaper side at any scale.
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(df_, "term").join(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(
            F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1), 6))
    )
    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.col("term")))
    return (
        scored.withColumn("rk", rank).filter(F.col("rk") <= top_k)
        .select(id_col, F.col("rk").cast("long").alias("rank"),
                "term", "tf", "tfidf")
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (interpolated, CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------

def lm_score_bigram(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Interpolated bigram LM score per document: mean over bigram positions
    of ln(lam * p(w2|w1) + (1-lam) * p(w2)), with both distributions
    estimated from the corpus itself (the CCNet/Wikipedia-LM perplexity
    filter, self-trained; ``text.lm_score`` is the unigram special case).

    100 TB shape: the unigram and bigram tables are map-side-combined
    aggregations (O(vocab) / O(distinct bigrams) rows); per-occurrence
    bigrams join them on their text key — equi-joins Catalyst plans as
    hash joins with AQE choosing broadcast when a side is small.  No UDF,
    no driver state.
    """
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    bi = ("filter(zip_with(__t, slice(__t, 2, size(__t)),"
          " (x, y) -> struct(x as w1, y as w2)), s -> s.w2 is not null)")
    occ = (docs.select(F.col(id_col), toks.alias("__t"))
               .select(id_col, F.explode(F.expr(bi)).alias("b"))
               .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")))
    # The unigram table is consumed three times (c1 join, c2 join, tot)
    # and Catalyst does not reuse its exchange across the renames, so
    # the corpus is re-tokenized per consumer.  Pinning the vocab
    # (`uni.localCheckpoint(eager=False)`) cuts the corpus scans 6 -> 3
    # but LOSES below the gate: measured 1.14x (sf0.1), 1.15x (sf1),
    # 1.09x (sf10 = 1.5GB) — local re-scans are cheaper than the
    # checkpoint materialization at every size this box can hold.  At
    # true corpus scale the three extra scans cost O(corpus bytes) each
    # while the pinned frame is vocabulary-sized, so the pin flips; the
    # gate selects it automatically once the estimated input exceeds
    # _LM2_PIN_MIN_BYTES (set above everything measured locally).
    uni = (docs.select(F.explode(toks).alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("cu")))
    size = _plan_size_bytes(docs)
    if size is not None and size >= _LM2_PIN_MIN_BYTES:
        uni = uni.localCheckpoint(eager=False)
    tot = uni.agg(F.sum("cu").alias("t"))
    big = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        occ.join(big, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2"), "w2")
        .join(F.broadcast(tot))
        .select(id_col, F.log(
            F.lit(lam) * F.col("cb") / F.col("c1")
            + F.lit(1.0 - lam) * F.col("c2") / F.col("t")).alias("lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.avg("lp"), 6).alias("lm2_score"),
             F.count(F.lit(1)).alias("n_bigrams"))
    )


# ---------------------------------------------------------------------------
# Character-entropy gibberish filter
# ---------------------------------------------------------------------------

def char_entropy(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy of the per-document character distribution (low
    entropy = repeated junk, high = random bytes/encoding damage; both
    tails are gibberish signals).

    Pure per-row work — zero shuffle — in an Arrow-batched kernel:
    char counts come from RUN LENGTHS over the sorted code-point array
    (numpy sort + diff; code-point order equals the binary order the
    former array_sort-of-single-chars SQL form used), and the entropy
    fold runs SEQUENTIALLY in sorted-char order with the identical
    operation sequence ``acc - (run/n) * ln(run/n)`` — same float64
    result to well below the 6-decimal round.  The former pure-SQL form
    computed the same thing through interpreted higher-order functions
    (split-to-singleton-strings + lambda filter/aggregate per row) and
    was ~5x slower per byte; only (id, text) crosses the Arrow boundary.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    out_schema = StructType([
        StructField(id_col, docs.schema[id_col].dataType),
        StructField("n_chars", LongType()),
        StructField("n_distinct_chars", LongType()),
        StructField("entropy", DoubleType()),
    ])

    def kernel(batches):
        log = math.log
        for pdf in batches:
            nn, nd, hh = [], [], []
            for s in pdf[text_col]:
                if s is None:           # NULL text -> NULL outputs,
                    nn.append(None)     # matching the SQL expression
                    nd.append(None)
                    hh.append(None)
                    continue
                cs = np.frombuffer(s.encode("utf-32-le"),
                                   dtype=np.uint32)
                n = int(cs.size)
                if n == 0:
                    # split('', '') yields [''] — one empty-string
                    # "char", entropy -(1/1)*ln(1) = 0
                    nn.append(0)
                    nd.append(1)
                    hh.append(0.0)
                    continue
                cs = np.sort(cs)
                runs = np.diff(np.flatnonzero(
                    np.r_[True, cs[1:] != cs[:-1], True]))
                acc, dn = 0.0, float(n)
                for r in runs:          # sorted-char order, sequential
                    p = r / dn
                    acc -= p * log(p)
                nn.append(n)
                nd.append(int(runs.size))
                hh.append(acc)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_chars": pd.array(nn, dtype="Int64"),
                "n_distinct_chars": pd.array(nd, dtype="Int64"),
                "entropy": pd.array(hh, dtype="Float64"),
            })

    return (widen_narrow_input(docs.select(id_col, text_col))
            .mapInPandas(kernel, out_schema)
            .select(id_col, "n_chars", "n_distinct_chars",
                    F.round("entropy", 6).alias("entropy")))


# ---------------------------------------------------------------------------
# Robust per-group outlier flags (median/MAD)
# ---------------------------------------------------------------------------

def mad_outliers(docs: DataFrame, value_col: str = "n_chars",
                 by: str = "source", id_col: str = "doc_id",
                 z: float = 3.0) -> DataFrame:
    """Robust outlier detection per group: flag rows whose modified z-score
    0.6745 * |x - median| / MAD exceeds ``z`` (Iglewicz & Hoaglin).  Length
    outliers survive mean/stddev screens because extremes drag both; the
    median/MAD pair doesn't move.

    Two exact-percentile aggregations over the O(groups) key — each is one
    shuffle of (group, value) pairs — then broadcast joins back.
    """
    med = docs.groupBy(by).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"))
    dev = docs.join(F.broadcast(med), by).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("med")))
    mad = dev.groupBy(by).agg(F.expr("percentile(__adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), by)
        .select(
            id_col, by, F.col(value_col).cast("double").alias("value"),
            F.round("med", 6).alias("med"), F.round("mad", 6).alias("mad"),
            F.round(F.lit(0.6745) * F.col("__adev")
                    / F.greatest("mad", F.lit(1e-12)), 6).alias("mod_z"),
            (F.lit(0.6745) * F.col("__adev")
             / F.greatest("mad", F.lit(1e-12)) > z).alias("outlier"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------

#: the 8 Gopher "stop words" — a doc must contain at least 2 of them
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", sep: str = "\n",
                   min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """The full Gopher quality-filter rule set (Rae et al. 2021 Table A1),
    beyond the repetition family in ``text.repetition_stats``:

      * word count in [min_words, max_words]
      * mean word length in [3, 10]
      * symbol-to-word ratio ('#' or '...') <= 0.1
      * < 90% of lines starting with a bullet, < 30% ending with '...'
      * >= 80% of words contain at least one alphabetic character
      * contains >= 2 of the 8 Gopher stop words

    Output: per-document measurements, one boolean per rule, and the
    combined ``keep``.  Everything is per-row array arithmetic — no
    keyed shuffle; a narrow input is widened so the per-word lambda
    folds use every core (no-op at scale).
    """
    docs = widen_narrow_input(docs)
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    d = docs.select(F.col(id_col), toks.alias("__w"),
                    _lines(text_col, sep).alias("__l"))
    n_w = F.size("__w").cast("double")
    mean_len = F.expr(
        "aggregate(__w, 0L, (a, w) -> a + length(w))") / F.greatest(
        n_w, F.lit(1.0))
    symbols = F.expr(
        "aggregate(__w, 0L, (a, w) -> a + length(w) "
        "- length(replace(replace(w, '#', ''), '...', '')))")
    sym_ratio = symbols / F.greatest(n_w, F.lit(1.0))
    n_l = F.size("__l").cast("double")
    bullet_frac = F.expr(
        "size(filter(__l, l -> l like '-%' or l like '*%' or l like '•%'))"
    ) / F.greatest(n_l, F.lit(1.0))
    ellipsis_frac = F.expr(
        "size(filter(__l, l -> l like '%...'))") / F.greatest(n_l, F.lit(1.0))
    alpha_frac = F.expr(
        "size(filter(__w, w -> w rlike '[a-zA-Z]'))") / F.greatest(
        n_w, F.lit(1.0))
    stops = F.expr(
        "size(array_intersect(transform(__w, w -> lower(w)), array("
        + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + ")))")
    m = d.select(
        id_col,
        n_w.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stops.cast("long").alias("n_stop_words"),
    )
    rules = {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_len": (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10),
        "ok_symbols": F.col("symbol_ratio") <= 0.1,
        "ok_bullets": F.col("bullet_frac") < 0.9,
        "ok_ellipsis": F.col("ellipsis_frac") < 0.3,
        "ok_alpha": F.col("alpha_word_frac") >= 0.8,
        "ok_stops": F.col("n_stop_words") >= 2,
    }
    for name, cond in rules.items():
        m = m.withColumn(name, cond)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return m.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# Flesch reading-ease (readability screen)
# ---------------------------------------------------------------------------

def readability(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch reading ease per document:
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``, with
    syllables approximated as vowel groups per word (min 1) and sentences
    as terminal-punctuation runs (min 1) — the standard closed-form
    heuristic, scan-side only (widened when narrow — the per-word vowel
    -group regex dominates; r15: 0.64x at sf0.1).
    """
    docs = widen_narrow_input(docs)
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    d = docs.select(F.col(id_col), F.col(text_col).alias("__t"),
                    toks.alias("__w"))
    n_w = F.greatest(F.size("__w").cast("double"), F.lit(1.0))
    # vowel groups per word (maximal [aeiouy]+ runs), at least 1 per word
    syl = F.expr(
        "aggregate(__w, 0L, (a, w) -> a + greatest(1L, size(filter("
        "split(regexp_replace(lower(w), '[^aeiouy]+', ' '), ' '), "
        "s -> s != ''))))").cast("double")
    sents = F.greatest(
        F.expr("size(filter(split(__t, '[.!?]+'), s -> trim(s) != ''))")
        .cast("double"), F.lit(1.0))
    score = (F.lit(206.835) - F.lit(1.015) * (n_w / sents)
             - F.lit(84.6) * (syl / n_w))
    return d.select(
        id_col,
        n_w.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(score, 6).alias("flesch"),
    )
