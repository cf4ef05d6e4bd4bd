"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is sampled by *content hash*, not RNG: the keep/drop decision
for a row is a pure function of its id (plus a seed salt), so the sample is
reproducible across runs, engines, cluster sizes, and partitionings — and a
re-run after appending data keeps every previously-selected row.  This is the
standard trick for stable train/validation splits at scale.

Mechanism: ``md5(id || seed)`` is uniform over hex strings; keeping rows whose
first 8 hex chars are <= ``floor(fraction * 16^8)`` (as a zero-padded hex
literal, compared lexicographically — identical ordering in any engine) keeps
an expected ``fraction`` of rows.  Everything is a JVM-side expression: the
filter rides the scan, no shuffle, no RNG state.

No reference counterpart (machbase/neo-server has no sampling operator) —
beyond-reference training-data surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: width of the hash prefix used for thresholding (8 hex chars = 32 bits —
#: granularity 2.3e-10, plenty for any practical sampling fraction)
_PREFIX = 8


def sample_threshold(fraction: float) -> str:
    """Zero-padded lowercase hex threshold for ``fraction`` of the 32-bit
    hash-prefix space.  Exposed so oracle SQL can embed the same literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(int(fraction * (16 ** _PREFIX)) - 1, f"0{_PREFIX}x") if fraction > 0 else ""


def _hash_prefix(id_col: Column | str, seed: str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit(seed))), 1, _PREFIX)


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                seed: str = "") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by ``id_col``.

    Different ``seed`` values give independent samples (e.g. train/val/test
    splits from disjoint seeds-and-complements).  The predicate is a scan-side
    filter — zero shuffle at any scale.
    """
    thr = sample_threshold(fraction)
    if not thr:
        return df.filter(F.lit(False))
    return df.filter(_hash_prefix(id_col, seed) <= F.lit(thr))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      by: str = "lang", id_col: str = "doc_id",
                      seed: str = "", default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions[stratum]`` of each
    ``by``-group, e.g. downsample dominant languages while keeping all of a
    rare one.  One CASE expression — still a pure scan-side filter, no
    per-group shuffle or window."""
    prefix = _hash_prefix(id_col, seed)
    thr: Column = F.lit(sample_threshold(default))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(by) == stratum, F.lit(sample_threshold(frac))).otherwise(thr)
    return df.filter((thr != F.lit("")) & (prefix <= thr))


def split(df: DataFrame, weights: dict[str, float], id_col: str = "doc_id",
          seed: str = "") -> dict[str, DataFrame]:
    """Disjoint, exhaustive, deterministic train/val/test split.

    ``weights`` are relative (normalized internally); each row lands in
    exactly one part based on which band of the hash-prefix space it falls
    in.  Stable under appends and re-partitioning.
    """
    total = sum(weights.values())
    prefix = _hash_prefix(id_col, seed)
    out: dict[str, DataFrame] = {}
    cum = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        lo = sample_threshold(cum / total) if cum > 0 else ""
        cum += w
        hi = sample_threshold(1.0 if i == len(items) - 1 else cum / total)
        cond = prefix <= F.lit(hi)
        if lo:
            cond = cond & (prefix > F.lit(lo))
        out[name] = df.filter(cond)
    return out


def mixture_plan(docs: DataFrame, weights: dict[str, float], budget_tokens: float,
                 by: str = "source", text_col: str = "text",
                 max_epochs: float = 4.0) -> DataFrame:
    """Domain-mixture plan for training-data composition (the Pile /
    DoReMi-style recipe): given target mixture ``weights`` per ``by``-domain
    and a total token ``budget_tokens``, derive each domain's sampling RATE
    = target_tokens / available_tokens, clamped to ``max_epochs`` (the
    standard cap on how often a small domain may be repeated before it
    hurts).  rate > 1 means oversampling (whole epochs + a fractional
    hash-sampled remainder — see ``mixture_sample``).

    One token-count aggregate over the corpus (map-side combined, ints) →
    an O(#domains) driver table; every derived number is closed-form from
    (weights, budget, counts), so the plan is engine-checkable and the
    fractional part is rounded to 6 digits BEFORE thresholding to keep the
    keep/drop decision bit-identical across engines.

    Returns (domain, have_tokens, target_tokens, epochs, frac) sorted by
    domain.  No reference counterpart (beyond-reference training surface).
    """
    import pyspark.sql.types as T

    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    have = {
        r["d"]: r["n"]
        for r in docs.groupBy(F.col(by).alias("d"))
        .agg(F.sum(F.size(F.split(F.col(text_col), " "))).alias("n")).collect()
    }
    rows = []
    for d in sorted(weights):
        h = int(have.get(d, 0))
        target = budget_tokens * weights[d] / wsum
        rate = min(max_epochs, target / h) if h else 0.0
        epochs = int(rate)
        frac = round(rate - epochs, 6)
        rows.append((d, h, round(target, 6), epochs, frac))
    schema = T.StructType([
        T.StructField("domain", T.StringType()),
        T.StructField("have_tokens", T.LongType()),
        T.StructField("target_tokens", T.DoubleType()),
        T.StructField("epochs", T.IntegerType()),
        T.StructField("frac", T.DoubleType()),
    ])
    return docs.sparkSession.createDataFrame(rows, schema)


def mixture_sample(docs: DataFrame, weights: dict[str, float], budget_tokens: float,
                   by: str = "source", id_col: str = "doc_id", text_col: str = "text",
                   max_epochs: float = 4.0, seed: str = "") -> DataFrame:
    """Materialize the :func:`mixture_plan`: each row is emitted once per
    whole epoch plus (deterministically, by content hash) with probability
    ``frac`` for the final fractional epoch.  Domains with rate 0 (absent
    from ``weights``, or empty) drop out.

    Shape at scale: the plan is O(#domains) and folds into ONE CASE
    expression, so the sample is a scan-side ``sequence``+``explode`` with a
    hash filter — no shuffle, no RNG state, reproducible across engines,
    partitionings, and appends (the epoch index salts the hash so the
    fractional pick is independent of every whole-epoch copy).

    Returns (id, domain, epoch) rows.
    """
    plan = mixture_plan(docs, weights, budget_tokens, by=by, text_col=text_col,
                        max_epochs=max_epochs).collect()
    ep: Column = F.lit(0)
    thr: Column = F.lit("")
    for r in plan:
        ep = F.when(F.col(by) == r["domain"], F.lit(r["epochs"])).otherwise(ep)
        thr = F.when(F.col(by) == r["domain"],
                     F.lit(sample_threshold(r["frac"]))).otherwise(thr)
    prefix = _hash_prefix(
        F.concat(F.col(id_col).cast("string"), F.lit(seed), F.lit("#"),
                 F.col("__ep").cast("string")), "")
    return (
        docs.select(F.col(id_col), F.col(by).alias("domain"),
                    ep.alias("__full"), thr.alias("__thr"))
        .withColumn("__ep", F.explode(F.sequence(F.lit(0), F.col("__full"))))
        .filter((F.col("__ep") < F.col("__full"))
                | ((F.col("__thr") != F.lit("")) & (prefix <= F.col("__thr"))))
        .select(F.col(id_col), "domain", F.col("__ep").alias("epoch"))
    )


def epoch_shuffle(df: DataFrame, seed: int, id_col: str = "doc_id",
                  out: str = "shuffle_rank") -> DataFrame:
    """Deterministic global training-epoch shuffle: rank every row by
    ``md5(id || seed)`` — a pseudorandom but REPRODUCIBLE permutation
    that is a pure function of (id, seed), so epoch N's order is
    identical across runs, engines, cluster sizes and partitionings
    (rerunning a crashed epoch writer resumes the same permutation).
    Changing the seed gives an independent permutation per epoch.

    Unlike ``ORDER BY rand()``, there is no RNG state to coordinate:
    the sort key is computed scan-side and the single range-partitioned
    sort is the only shuffle — the standard scalable way to globally
    shuffle a corpus for training.  ``out`` carries the 0-based rank
    (= position in the shuffled order) so shard writers can slice it.

    The rank is a DISTRIBUTED prefix count (range-partition on the hash
    key, local row_number, broadcast per-partition counts) — a naked
    global ``row_number() OVER (ORDER BY ...)`` would serialize the
    whole corpus through one partition.
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"),
                         F.lit(f"-{seed}")))
    keyed = (df.withColumn("__k", key)
             .repartitionByRange("__k", id_col)
             .sortWithinPartitions("__k", id_col)
             .withColumn("__pid", F.spark_partition_id())
             .localCheckpoint(eager=True))
    counts = {r["__pid"]: r["n"] for r in
              keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    prefix, acc = {}, 0
    for pid in sorted(counts):
        prefix[pid] = acc
        acc += counts[pid]
    pref = F.element_at(
        F.create_map(*[F.lit(x) for pid in prefix
                       for x in (pid, prefix[pid])]),
        F.col("__pid")) if prefix else F.lit(0)
    w = (Window.partitionBy("__pid").orderBy("__k", id_col))
    return (keyed.withColumn(
        out, (pref + F.row_number().over(w) - 1).cast("long"))
        .drop("__k", "__pid"))


def select_until_budget(docs: DataFrame, budget_tokens: int,
                        score_col: str, tokens_col: str,
                        id_col: str = "doc_id") -> DataFrame:
    """Quality-first corpus selection under a token budget: take rows in
    (score DESC, id) order while the running token total stays within
    ``budget_tokens`` (the greedy data-selection step after quality
    scoring — DSIR/FineWeb-style pipelines pick their training subset
    exactly this way).

    The running total is a DISTRIBUTED prefix sum: range-partition on
    the selection order, cumulate locally under a partitioned window,
    and broadcast the tiny per-partition totals back — no global
    single-partition window, so the cut scales to any corpus.  The
    range partitioner assigns partition ids in sort-key order, which is
    what makes the per-partition prefix well-defined.
    """
    from pyspark.sql.window import Window

    sized = (docs.select(id_col, score_col, tokens_col)
             .repartitionByRange(F.col(score_col).desc(),
                                 F.col(id_col))
             .sortWithinPartitions(F.col(score_col).desc(), id_col)
             .withColumn("__pid", F.spark_partition_id())
             .localCheckpoint(eager=True))
    totals = {r["__pid"]: r["t"] for r in
              sized.groupBy("__pid")
              .agg(F.sum(tokens_col).alias("t")).collect()}
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    pref = F.element_at(
        F.create_map(*[F.lit(x) for pid in prefix
                       for x in (pid, prefix[pid])]),
        F.col("__pid")) if prefix else F.lit(0)
    w = (Window.partitionBy("__pid")
         .orderBy(F.col(score_col).desc(), id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = pref + F.sum(tokens_col).over(w)
    return (sized.withColumn("__cum", cum)
            .filter(F.col("__cum") <= budget_tokens)
            .select(id_col, score_col, tokens_col,
                    F.col("__cum").alias("cum_tokens")))
