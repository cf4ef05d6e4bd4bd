"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes
------------------
- Exact dedup hashes the text once (md5, JVM-side) and groupBys the 128-bit
  digest — shuffle keys are fixed-width, never the raw document.
- MinHash signatures are computed with built-in array functions (xxhash64 per
  shingle x permutation) — no Python in the hot path; LSH banding turns the
  quadratic all-pairs problem into a groupBy on (band, band-hash) buckets, so
  candidate generation is a single shuffle; only candidate pairs (tiny) are
  verified with exact Jaccard.
- SimHash packs 64 weighted bit-votes into one BIGINT per doc; near-dup =
  identical simhash (or Hamming-probe variants at query time).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from neo_server_spark.datapipe.text import (_WIDEN_TARGET_BYTES, shingles,
                                            tokens, widen_narrow_input)


# ---------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc (min id) per exact text digest.

    Losers anti-join (r15): only (id, digest) rows shuffle for the
    per-digest rank, and the re-attach anti-joins the LOSER id set (the
    duplicate tail — small by construction) against the corpus, where
    the former keeper-set semi join shuffled the document text whenever
    the keep set outgrew broadcast.  Kept rows are identical: keeper =
    min id per digest <=> loser = rank > 1."""
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(id_col)
    losers = (docs.select(F.col(id_col),
                          F.md5(F.col(text_col)).alias("__fp"))
              .withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") > 1).select(id_col))
    return docs.join(losers, on=id_col, how="left_anti")


def exact_dedup_stats(docs: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group duplicate accounting (drives dedup dashboards)."""
    fp = F.md5(F.col(text_col))
    return (
        docs.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(fp).alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_dupes"),
        )
        .orderBy(by)
    )


# ---------------------------------------------------------------- minhash + LSH

#: prime modulus and multiplier base for the md5-mode affine hash family
#: (identical integer arithmetic in Spark and DuckDB: all products stay
#: below 2^63, so no JVM wraparound vs DuckDB overflow divergence)
_MH_P = 2147483647           # 2^31 - 1 (Mersenne prime)
_MH_MUL = 2654435761         # Knuth's multiplicative constant
_MH_ADD = 40503 * 65537


def _mh_affine(i: int) -> tuple[int, int]:
    """(a_i, b_i) for permutation i — nonzero a_i since both factors are
    nonzero mod the prime."""
    return ((i + 1) * _MH_MUL) % _MH_P, ((i + 1) * _MH_ADD) % _MH_P


def minhash_signature(docs: DataFrame, text_col: str = "text",
                      num_hashes: int = 64, shingle_n: int = 3,
                      out: str = "minhash", hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash signature per doc: min over shingles of H_i(shingle), for
    ``num_hashes`` family members.  Pure array expressions — Arrow/codegen.

    'xxhash64' (production): H_i = xxhash64(shingle, seed=i), one seeded
    JVM hash per member.  'md5' (SQL-oracle-certifiable): the classic
    one-hash + affine-permutation construction — ONE md5 per shingle
    reduced mod a prime, then H_i = (a_i*m + b_i) mod P; md5 and the
    integer arithmetic are identical in Spark and DuckDB, and only one
    digest is computed per shingle (64 separate md5s were ~7x slower).

    A narrow input is widened first (r15: the per-shingle hash fold ran
    on the scan's single task for a small file — 0.21x at sf0.1).  The
    per-row work here (one md5 + num_hashes affine folds per shingle) is
    several times heavier than the curation ops' — the r16 width probe
    still improved monotonically to full cluster width at 18KB/task
    (2.99s@32 vs 3.43@16 vs 7.63 unwidened), so the widen target is a
    quarter of the default."""
    docs = widen_narrow_input(docs, target_bytes=_WIDEN_TARGET_BYTES // 4)
    sh = shingles(text_col, shingle_n)
    if hash_fn == "xxhash64":
        def sig_of_sh(sh_bound):
            # LET-bound shingle array (transform-of-singleton): without
            # it each of the num_hashes array_min branches carries its
            # own copy of the shingle-construction expression and
            # Catalyst re-evaluates it per member — at the production
            # minhash_params(0.7) schedule (408 hashes) that is 408
            # shingle splits per row instead of one
            return F.array(*[
                F.array_min(F.transform(
                    sh_bound, lambda s: F.xxhash64(s, F.lit(i))))
                for i in range(num_hashes)
            ])

        return docs.withColumn(
            out, F.element_at(F.transform(F.array(sh), sig_of_sh), 1))
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    ms = F.transform(sh, lambda s: F.conv(
        F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(_MH_P))

    def perm(i: int):
        a, b = _mh_affine(i)
        # single-param lambda: a 2-param one would bind Spark's (elem, idx)
        return lambda m: (F.lit(a) * m + F.lit(b)) % F.lit(_MH_P)

    def sig_of(ms_bound):
        # LET-bound via transform-of-singleton: ONE md5 pass per row —
        # a plain withColumn gets projection-collapsed back into all
        # num_hashes branches (md5 re-evaluated 64x per row)
        return F.array(*[
            F.array_min(F.transform(ms_bound, perm(i)))
            for i in range(num_hashes)
        ])

    return docs.withColumn(
        out, F.element_at(F.transform(F.array(ms), sig_of), 1))


def minhash_params(threshold: float, target_recall: float = 0.95,
                   max_bands: int = 64, max_rows: int = 16) -> tuple[int, int]:
    """Derive (num_hashes, bands) for ``minhash_lsh_pairs`` from a Jaccard
    threshold — the production sizing knob (mirrors ``lsh_params`` for the
    hyperplane family).

    One band of r signature rows collides for a pair at Jaccard j with
    probability j**r; B bands recall 1 - (1 - j**r)**B.  At the THRESHOLD
    (the weakest pair that must still surface) we take the LARGEST r whose
    required band count fits ``max_bands`` — candidate mass per band falls
    ~j**r for sub-threshold pairs, so more rows per band always wins while
    the recall target stays reachable (MMDS ch.3 banding analysis).

    Production guidance (measured on the salted 100x replica, COVERAGE.md
    "ANN/LSH recall"): corpus near-dup dedup runs at threshold 0.7-0.8 —
    minhash_params(0.7) -> r=8, B=51 (num_hashes=408) keeps candidate
    volume linear in the corpus because a sub-threshold pair collides
    with probability <= 0.7**8 = 0.058 per band.  The sf0.01 ORACLE entry's
    threshold=0.05 with the default (64, 16) schedule is a verification
    convenience: at 0.05 EVERY band collides for moderately-similar docs
    and the verified output itself is quadratic in each doc's duplicate
    count (24.7M pairs on the unsalted 100x replica) — never run a real
    corpus there.  Verified-pair output is additionally fenced by
    ``max_bucket`` (over-full buckets are skipped) and can be capped
    outright with ``max_pairs`` for exploratory runs."""
    import math

    j = max(1e-9, min(1.0 - 1e-9, threshold))
    for r in range(max_rows, 0, -1):
        p_band = j ** r
        if 1.0 - p_band >= 1.0:        # p_band underflows: unreachable at r
            continue
        bands = math.ceil(math.log(1.0 - target_recall)
                          / math.log(1.0 - p_band))
        if bands <= max_bands:
            return r * bands, bands
    # even r=1 cannot reach target_recall within max_bands: refuse
    # loudly instead of silently returning an under-recall (and, at
    # r=1, quadratic-candidate) schedule
    achievable = 1.0 - (1.0 - j) ** max_bands
    raise ValueError(
        f"minhash_params: threshold={threshold} cannot reach "
        f"target_recall={target_recall} within max_bands={max_bands} "
        f"(best achievable at r=1 is {achievable:.4f}); raise max_bands, "
        f"lower target_recall, or use an exact pass for thresholds this "
        f"low")


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16, shingle_n: int = 3,
                      jaccard_threshold: float = 0.7,
                      hash_fn: str = "xxhash64",
                      max_bucket: int = 10_000,
                      max_pairs: int | None = None) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified with
    exact shingle Jaccard (Broder 1997; the bands×rows schedule of
    Leskovec/Rajaraman/Ullman MMDS ch.3).

    ``num_hashes`` split into ``bands`` bands of ``num_hashes // bands``
    rows; docs sharing any band bucket become candidates.  Output:
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    100 TB shape: ONE shuffle, keyed on (band, bucket), carrying each
    doc's signature-band key plus its distinct shingle-DIGEST array (8
    bytes per shingle — the text itself never shuffles).  Jaccard is
    verified INSIDE the bucket's Arrow kernel (sorted-array
    intersection), so the exchanged volume is O(bands × corpus) and
    independent of the candidate count — the former self-join + per-pair
    raw-shingle join shipped O(candidates × doc_size) and was measured at
    667s on a 100x replica whose docs are mutually ~0.67-Jaccard (LSH
    tuned for 0.7 MUST candidate those; no banding separates 0.67 from
    0.7, so candidate volume is the workload there).  A pair matching in
    several bands re-verifies per band (bounded by ``bands``) and
    collapses in the final distinct on the verified set, which is small
    by definition.  Buckets above ``max_bucket`` are skipped — an
    over-full bucket is boilerplate/templated text that exact/line dedup
    should collapse first (same fence as simhash_hamming_pairs).

    ``hash_fn='md5'`` makes the whole operator exactly reproducible in
    SQL: signatures from the md5 hex prefix (identical in Spark and
    DuckDB), band keys as the raw signature slice, and the verify runs
    on the same md5-derived digests the oracle can compute — a pair is a
    candidate IFF a band's signature rows are equal.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window
    from pyspark.sql.types import DoubleType, StructField, StructType

    rows_per_band = num_hashes // bands
    with_sig = minhash_signature(docs.select(id_col, text_col), text_col,
                                 num_hashes, shingle_n, hash_fn=hash_fn)
    if hash_fn == "md5":
        band_key = lambda b: F.concat_ws(  # noqa: E731 — injective band key
            ",", F.slice(F.col("minhash"),
                         b * rows_per_band + 1,
                         rows_per_band).cast("array<string>"))
        digf = lambda s: F.conv(  # noqa: E731 — SQL-replayable digest
            F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    else:
        band_key = lambda b: F.hash(  # noqa: E731
            F.slice(F.col("minhash"), b * rows_per_band + 1,
                    rows_per_band).cast("array<string>"), F.lit(b))
        digf = lambda s: F.xxhash64(s)  # noqa: E731
    band_cols = F.array(*[band_key(b) for b in range(bands)])
    base = with_sig.withColumn(
        "__dig",
        F.array_distinct(F.transform(shingles(text_col, shingle_n), digf)))
    exploded = base.select(
        id_col, "__dig", F.posexplode(band_cols).alias("band", "bucket"))
    w = Window.partitionBy("band", "bucket")
    sk = (exploded.withColumn("__n", F.count(F.lit(1)).over(w))
          .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
          .drop("__n"))

    id_type = base.schema[id_col].dataType
    out_schema = StructType([
        StructField("id_a", id_type), StructField("id_b", id_type),
        StructField("jaccard", DoubleType()),
    ])

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        digs = [np.sort(np.asarray(x, dtype=np.int64))
                for x in pdf["__dig"].to_numpy()[order]]
        n = len(ids)
        sizes = np.array([d.size for d in digs], dtype=np.int64)
        out_a, out_b, out_j = [], [], []

        def emit(i, row_jac, off):
            hit = np.nonzero(row_jac >= jaccard_threshold)[0]
            if hit.size:
                out_a.append(np.full(hit.size, ids[i]))
                out_b.append(ids[off:][hit])
                out_j.append(row_jac[hit])

        uniq, inv = (np.unique(np.concatenate(digs), return_inverse=True)
                     if n else (np.array([], dtype=np.int64), None))
        if n >= 2 and n * uniq.size <= 100_000_000:
            # membership-matrix intersection: |Di ∩ Dj| = (M M^T)[i,j]
            # with 0/1 rows over the bucket's digest universe — BLAS does
            # the pairwise counting (exact: sums are small integers, well
            # inside float32), and the Jaccard division stays the same
            # int/int float64 op as the per-pair form, so values are
            # bitwise unchanged.  Row-blocked: memory O(blk * n).
            M = np.zeros((n, uniq.size), dtype=np.float32)
            M[np.repeat(np.arange(n), sizes), inv] = 1.0
            blk = 512
            for s in range(0, n, blk):
                e = min(s + blk, n)
                inter = np.rint(M[s:e] @ M.T).astype(np.int64)
                union = sizes[s:e, None] + sizes[None, :] - inter
                jac = inter / np.maximum(union, 1)
                for i in range(s, e):
                    emit(i, jac[i - s, i + 1:], i + 1)
        else:   # giant bucket universe: per-pair sorted intersection
            for i in range(n):
                di = digs[i]
                row = np.empty(n - i - 1)
                for j in range(i + 1, n):
                    inter = np.intersect1d(di, digs[j],
                                           assume_unique=True).size
                    union = di.size + digs[j].size - inter
                    row[j - i - 1] = inter / union if union else 0.0
                emit(i, row, i + 1)
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "jaccard": np.concatenate(out_j)})

    pairs = sk.groupBy("band", "bucket").applyInPandas(verify, out_schema)
    pairs = (pairs.distinct()
             .select("id_a", "id_b",
                     F.round("jaccard", 6).alias("jaccard")))
    if max_pairs is not None:
        # output fence for exploratory/low-threshold runs: the verified
        # set itself is quadratic in per-doc duplicate count when the
        # threshold sits below the corpus's ambient similarity (see
        # minhash_params); keep the strongest pairs, deterministically
        pairs = (pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b")
                 .limit(int(max_pairs)))
    return pairs


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3, threshold: float = 0.5,
                        prefilter_col: str | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Without LSH this is all-pairs — only for small/prefiltered inputs (the
    scale path is :func:`minhash_lsh_pairs`).  ``prefilter_col`` (e.g. lang)
    restricts pairs to equal-key blocks, the classic blocking trick.
    """
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    base = docs.select(
        F.col(id_col),
        (F.col(prefilter_col) if prefilter_col else F.lit(0)).alias("__blk"),
        F.col(text_col).alias("__t"),
    )
    id_field = next(f for f in docs.schema.fields if f.name == id_col)
    out_schema = StructType([
        StructField("id_a", id_field.dataType),
        StructField("id_b", id_field.dataType),
        StructField("jaccard", DoubleType()),
    ])
    n_, thr = shingle_n, threshold
    pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

    def block_pairs(pdf):
        import pandas as pd
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        raw = []
        df_count: dict[str, int] = {}
        for t in pdf["__t"]:
            toks = t.split(" ")           # same as F.split: empties kept
            s = {" ".join(toks[i:i + n_])
                 for i in range(max(len(toks) - n_, 0) + 1)}
            raw.append(s)
            for g in s:
                df_count[g] = df_count.get(g, 0) + 1
        # EXACT pruning: block-singleton shingles can never intersect —
        # only the true set SIZES (kept below) see them via the union
        vocab = {g: i for i, g in enumerate(
            sorted(g for g, c in df_count.items() if c >= 2))}
        sets = [{vocab[g] for g in s if g in vocab} for s in raw]
        n = len(sets)
        words = max((len(vocab) + 63) // 64, 1)
        m = np.zeros((n, words), dtype=np.uint64)
        # union sizes come from the TRUE set sizes (pre-pruning)
        sizes = np.array([len(s) for s in raw], dtype=np.int64)
        for r, s in enumerate(sets):
            for g in s:
                m[r, g >> 6] |= np.uint64(1 << (g & 63))
        ids = pdf[id_col].to_numpy()
        out_a, out_b, out_j = [], [], []
        for i in range(n - 1):
            inter = pop8[(m[i] & m[i + 1:]).view(np.uint8)] \
                .reshape(n - i - 1, -1).sum(axis=1)
            union = sizes[i] + sizes[i + 1:] - inter
            jac = inter / union
            hit = np.nonzero(jac >= thr)[0]
            out_a.extend([ids[i]] * len(hit))
            out_b.extend(ids[i + 1 + hit])
            out_j.extend(jac[hit])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j}
                            ) if out_a else pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")})

    return (
        base.groupBy("__blk").applyInPandas(block_pairs, out_schema)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------- simhash

def simhash(docs: DataFrame, text_col: str = "text", out: str = "simhash",
            bits: int = 64, hash_fn: str = "xxhash64",
            keep: list[str] | None = None) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Each token votes its hash bit pattern; the signature bit is 1 where
    the vote sum is positive.  The vote fold runs in an Arrow kernel
    (``bits`` vectorized shift/mask passes + one segment-sum over the
    flattened token hashes) — the former SQL form paid ``bits``
    INTERPRETED ``F.aggregate`` lambda passes per row (higher-order
    functions do not codegen).  Votes are commutative integer sums, so
    the kernel is bit-exact against the SQL fold regardless of order.

    ``hash_fn='md5'`` switches the token hash to the 60-bit md5 hex
    prefix (identical in Spark and DuckDB, so the whole signature is
    SQL-oracle certifiable) and caps ``bits`` at 60; the hash then runs
    in the kernel too (hashlib), with a per-task {token -> hash} cache —
    each DISTINCT token is hashed once per task, not once per
    occurrence.  xxhash64 stays the production default; its hashes come
    from the codegen'd JVM intrinsic and only the vote fold crosses into
    the kernel.

    Scale note (guide §2): a small corpus that arrives as FEWER scan
    partitions than the cluster has cores is round-robin repartitioned
    first so the signature work uses every core; at scale the input is
    already wider than the cluster and no extra exchange is added.

    ``keep`` narrows the passthrough columns: only those columns (plus
    ``out``) cross the Arrow boundary back out — callers that drop the
    text right after (``simhash_hamming_pairs``, ``simhash_dupes``)
    would otherwise pay a full text serialization JVM<-Python for a
    column they discard.  ``None`` keeps every input column (the public
    append-a-column contract)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    if hash_fn == "md5":
        bits = min(bits, 60)
    elif hash_fn != "xxhash64":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    n_bits = bits

    keep_cols = list(dict.fromkeys(
        [f.name for f in docs.schema.fields] if keep is None
        else list(keep)))
    if out in keep_cols:
        raise ValueError(
            f"out column {out!r} collides with a kept input column; "
            f"rename one (keep={keep_cols})")
    docs = docs.select(*dict.fromkeys(keep_cols + [text_col]))

    # size-proportional widen (same heavier-work target as minhash: the
    # per-row vote kernel dominates the exchange well below the
    # curation ops' crossover)
    docs = widen_narrow_input(docs, target_bytes=_WIDEN_TARGET_BYTES // 4)

    def _sigs(flat: "np.ndarray", lens: "np.ndarray") -> "np.ndarray":
        """Pack signatures from flattened per-row hash runs.  NULL text
        / empty hash arrays keep the SQL fold's value: every vote
        comparison is false, so the signature is 0."""
        u = flat.view(np.uint64)
        nz = lens > 0
        lens_nz = lens[nz]
        starts = np.zeros(lens_nz.size, dtype=np.int64)
        if lens_nz.size > 1:
            np.cumsum(lens_nz[:-1], out=starts[1:])
        sig_nz = np.zeros(lens_nz.size, dtype=np.uint64)
        if lens_nz.size:
            for i in range(n_bits):
                bit = (((u >> np.uint64(i)) & np.uint64(1))
                       .astype(np.int64) * 2 - 1)
                votes = np.add.reduceat(bit, starts)
                sig_nz |= np.where(votes > 0,
                                   np.uint64(1) << np.uint64(i),
                                   np.uint64(0))
        sig = np.zeros(lens.size, dtype=np.uint64)
        sig[nz] = sig_nz
        return sig.view(np.int64)

    schema = StructType([docs.schema[c] for c in keep_cols]
                        + [StructField(out, LongType())])

    if hash_fn == "md5":
        def _kernel(batches):
            import hashlib

            cache: dict = {}

            def h(t):
                v = cache.get(t)
                if v is None:
                    v = int(hashlib.md5(t.encode("utf-8"))
                            .hexdigest()[:15], 16)
                    cache[t] = v
                return v

            for pdf in batches:
                texts = pdf[text_col]
                lens = np.zeros(len(texts), dtype=np.int64)
                runs = []
                for j, s in enumerate(texts):
                    if s is None:
                        continue
                    tk = s.split(" ")
                    lens[j] = len(tk)
                    runs.append(np.array([h(t) for t in tk],
                                         dtype=np.int64))
                flat = (np.concatenate(runs) if runs
                        else np.empty(0, np.int64))
                res = pdf[keep_cols].copy()
                res[out] = _sigs(flat, lens)
                yield res

        return docs.mapInPandas(_kernel, schema=schema)

    th = F.transform(tokens(text_col), lambda t: F.xxhash64(t))

    def _kernel(batches):
        for pdf in batches:
            col = pdf["__th"]
            lens = np.array([0 if a is None else len(a) for a in col],
                            dtype=np.int64)
            runs = [np.asarray(a, dtype=np.int64) for a in col
                    if a is not None and len(a)]
            flat = (np.concatenate(runs) if runs
                    else np.empty(0, np.int64))
            res = pdf.drop(columns=["__th"])
            res[out] = _sigs(flat, lens)
            yield res

    return (docs.withColumn("__th", th).select(*keep_cols, "__th")
            .mapInPandas(_kernel, schema=schema))


def simhash_dupes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical simhash (Hamming distance 0 near-dups)."""
    sh = simhash(docs.select(id_col, text_col), text_col, keep=[id_col])
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list(id_col).alias("ids"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------- embedding near-dup

def lsh_params(threshold: float, target_recall: float = 0.95,
               max_bands: int = 16, max_bits: int = 16) -> tuple[int, int]:
    """Derive (block_bits, bands) for multi-band hyperplane LSH.

    A random hyperplane agrees in sign for a pair at angle θ with
    probability p = 1 - θ/π; one band of ``bits`` planes collides with
    p**bits, and B independent bands recall 1 - (1 - p**bits)**B.  At the
    THRESHOLD cosine (the worst pair we must still find) we pick the
    LARGEST bits whose required band count stays within ``max_bands`` —
    candidate mass per band shrinks ~2**-bits, so more bits always wins
    while the recall target is reachable (Indyk-Motwani banding analysis,
    as used for minhash in ``minhash_lsh_pairs``)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if p <= 0.0:
        return 1, max_bands
    for bits in range(max_bits, 0, -1):
        p_band = p ** bits
        if p_band >= 1.0:
            return bits, 1
        bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
        if bands <= max_bands:
            return bits, max(1, bands)
    return 1, max_bands


def embedding_dupes(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, block_bits: int | None = None,
                    bands: int | None = None,
                    target_recall: float = 0.95,
                    hash_fn: str = "xxhash64",
                    max_bucket: int = 10_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-BAND random-hyperplane
    LSH: ``bands`` independent bucketings of ``block_bits`` sign bits each;
    a pair is a candidate if it collides in ANY band; candidates are
    verified exactly (cos >= threshold).  Defaults auto-derive (bits, bands)
    from the threshold for >= ``target_recall`` at the threshold cosine —
    recall only improves above it (see ``lsh_params``).

    100 TB shape: the signature pass is one scan (Arrow sign kernel, no
    shuffle); then ONE shuffle keyed on (band, bucket) carrying
    (id, bucket, vector), and the exact-cosine verify runs INSIDE each
    bucket's Arrow kernel via blocked per-dimension accumulation — the
    exchanged volume is O(bands × corpus) and independent of the
    candidate count.  The former sketch self-join + per-pair vector
    joins shipped O(candidates × dim) and GC-thrashed on a 100x replica
    where every vector has 99 exact twins (candidate pairs are quadratic
    in the duplication factor by construction).  A pair colliding in
    several bands re-verifies per band (bounded by ``bands``) and
    collapses in the final distinct over the verified set.  Buckets
    above ``max_bucket`` rows are skipped — the boilerplate fence, as in
    simhash_hamming_pairs.  The per-pair float64 operation sequence
    (per-dimension fold, dot/(sqrt·sqrt)) is unchanged, so results stay
    bitwise equal to the SQL form the oracle replays.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window
    from pyspark.sql.types import DoubleType, StructField, StructType

    if block_bits is None or bands is None:
        auto_bits, auto_bands = lsh_params(threshold, target_recall)
        block_bits = block_bits if block_bits is not None else auto_bits
        bands = bands if bands is not None else auto_bands

    base = emb.select(id_col, vec_col)
    sig = band_buckets(base, vec_col, id_col, block_bits, bands, hash_fn,
                       keep_vec=True)
    w = Window.partitionBy("__band", "__bucket")
    sk = (sig.withColumn("__n", F.count(F.lit(1)).over(w))
          .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
          .drop("__n"))

    id_field = next(f for f in base.schema.fields if f.name == id_col)
    out_schema = StructType([
        StructField("id_a", id_field.dataType),
        StructField("id_b", id_field.dataType),
        StructField("cosine", DoubleType()),
    ])
    vec_name, thr = vec_col, threshold

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        x = np.array(pdf[vec_name].tolist(), dtype=np.float64)
        n, d = x.shape
        nrm = np.zeros(n)
        for j in range(d):                    # sequential norm fold
            nrm = nrm + x[:, j] * x[:, j]
        nrm = np.sqrt(nrm)
        out_a, out_b, out_c = [], [], []
        blk = 512
        for s in range(0, n, blk):
            e = min(s + blk, n)
            dots = np.zeros((e - s, n))
            for j in range(d):                # sequential dot fold
                dots = dots + np.outer(x[s:e, j], x[:, j])
            cos = dots / (nrm[s:e, None] * nrm[None, :])
            for i in range(s, e):
                row = cos[i - s, i + 1:]      # id_a < id_b half
                hit = np.nonzero(row >= thr)[0]
                if hit.size:
                    out_a.append(np.full(hit.size, ids[i]))
                    out_b.append(ids[i + 1:][hit])
                    out_c.append(row[hit])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    pairs = sk.groupBy("__band", "__bucket").applyInPandas(verify,
                                                           out_schema)
    return (pairs.distinct()
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))


def band_buckets(base: DataFrame, vec_col: str, id_col: str,
                 block_bits: int, bands: int,
                 hash_fn: str = "xxhash64",
                 keep_vec: bool = False) -> DataFrame:
    """(id, __band, __bucket) hyperplane-LSH sketch: ``bands`` independent
    bucketings of ``block_bits`` sign bits each.  Shared by the near-dup
    pair miner (embedding_dupes) and the ANN query path
    (similarity.lsh_topk).  ``keep_vec`` repeats the vector onto each
    band row so a downstream bucket-local verify needs no join back to
    the corpus (the rows come straight off the scan — still no shuffle
    here).

    The hyperplanes are CONSTANTS (seed-derived ±1 vectors), so they are
    evaluated exactly once — one single-row Spark job over the very
    expression the oracle replays — and the per-vector sign bits run as an
    Arrow kernel with the same sequential-fold float64 order as the SQL
    dot product (bitwise-equal buckets; the expression form recomputed
    bands*bits*dim hash calls per ROW and was ~20x slower)."""
    import numpy as np

    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    spark = base.sparkSession
    first = base.select(vec_col).first()
    if first is None:          # empty input: empty sketch
        return base.select(F.col(id_col), F.lit(0).alias("__band"),
                           F.lit(0).alias("__bucket")).limit(0)
    dim = len(first[0])
    n_h = bands * block_bits
    hp_row = spark.range(1).select(*[
        _hyperplane(F.lit(dim), s, hash_fn).alias(f"h{s}")
        for s in range(n_h)]).first()
    hmat = np.array([list(hp_row[f"h{s}"]) for s in range(n_h)],
                    dtype=np.float64)                 # (bands*bits, dim)
    id_field = next(f for f in base.schema.fields if f.name == id_col)
    fields = [id_field,
              StructField("__band", IntegerType()),
              StructField("__bucket", LongType())]
    if keep_vec:
        fields.append(next(f for f in base.schema.fields
                           if f.name == vec_col))
    out_schema = StructType(fields)
    vec_name, bb, nb, kv = vec_col, block_bits, bands, keep_vec

    def sketch(it):
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_name].tolist(), dtype=np.float64)
            n = len(pdf)
            buckets = np.zeros((n, nb), dtype=np.int64)
            for band in range(nb):
                for b in range(bb):
                    h = hmat[band * bb + b]
                    acc = np.zeros(n)
                    for j in range(x.shape[1]):       # sequential fold
                        acc = acc + x[:, j] * h[j]
                    buckets[:, band] |= (acc > 0).astype(np.int64) << b
            ids = np.repeat(pdf[id_col].to_numpy(), nb)
            out = {
                id_col: ids,
                "__band": np.tile(np.arange(nb, dtype=np.int32), n),
                "__bucket": buckets.reshape(-1),
            }
            if kv:
                out[vec_name] = np.repeat(pdf[vec_name].to_numpy(), nb)
            yield pd.DataFrame(out)

    return base.mapInPandas(sketch, out_schema)


def _hyperplane(dim: Column, seed: int, hash_fn: str = "xxhash64") -> Column:
    """Deterministic ±1 pseudo-random hyperplane of length ``dim``.
    'md5' derives the sign from the md5 hex prefix parity of 'seed|dim'
    (identical in Spark and DuckDB — SQL-oracle certifiable)."""
    if hash_fn == "md5":
        def sign(i):
            h = F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{seed}|"), i.cast("string"))),
                1, 15), 16, 10).cast("long")
            return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    else:
        def sign(i):
            return F.when(F.xxhash64(i, F.lit(seed)) % 2 == 0,
                          F.lit(1.0)).otherwise(F.lit(-1.0))
    return F.transform(F.sequence(F.lit(0), dim - 1), sign)


# ------------------------------------------------- cluster resolution

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iters: int = 25) -> DataFrame:
    """Resolve similarity pairs into duplicate clusters: (id, comp) where
    ``comp`` is the minimum id reachable through the pair graph.

    Distributed min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels (one join + one groupBy per
    round), converging in O(component diameter) rounds — dedup clusters are
    shallow (near-cliques from banding), so 2-4 rounds in practice.  Each
    round is ``localCheckpoint``-ed: iterative self-joins otherwise stack
    lineage and replan from the scan every round.  The driver only ever sees
    a per-round changed-row COUNT, never data.  (For graphs with long chains
    swap in the large-star/small-star round pair; the fixpoint loop and
    checkpointing stay identical.)
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(labels.id,
                    F.least(labels.comp, F.coalesce("nbr_comp", labels.comp))
                    .alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   keep: bool = False) -> DataFrame:
    """Attach a ``canonical_id`` (min id of the duplicate cluster; itself if
    unpaired) to every document.  ``keep=True`` instead returns only cluster
    representatives — the dedup'd corpus."""
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    out = docs.join(comp, id_col, "left").withColumn(
        "canonical_id", F.coalesce("comp", F.col(id_col))).drop("comp")
    if keep:
        out = out.filter(F.col(id_col) == F.col("canonical_id"))
    return out


def duplicate_spans(docs: DataFrame, k: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact substring duplication: every maximal token span whose k-gram
    windows all occur >= 2 times in the corpus (the suffix-array
    train-dedup criterion of Lee et al. 2022, re-expressed as a k-gram
    digest join — the distributed equivalent used when one machine cannot
    hold the suffix array).

    Plan shape: (doc, pos, md5(k-gram digest)) positions explode from the
    scan; ONE shuffle on the 16-byte digest finds grams with corpus count
    >= 2; matched (doc, pos) pairs merge into maximal spans with a
    gaps-and-islands window.  The text itself never shuffles — shuffle
    volume is O(total tokens) x 24 bytes regardless of document size, and
    the digest aggregate map-side combines.  Returns (doc_id, start_pos,
    end_pos, span_tokens) per maximal duplicated span, 1-based token
    positions.  A narrow input is widened first — the per-gram md5
    otherwise runs at the scan's partition count (r15: 0.71x at sf0.1).
    """
    docs = widen_narrow_input(docs)
    toks = docs.select(F.col(id_col), tokens(text_col).alias("__t"))
    npos = F.size("__t") - (k - 1)
    # docs shorter than k tokens contribute no grams; the guard matters
    # because Spark's sequence(1, 0) DESCENDS instead of being empty
    gram_arr = F.when(
        npos >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
            lambda i: F.md5(F.array_join(F.slice("__t", i, k), " ")))
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        F.col(id_col),
        F.posexplode(gram_arr).alias("__p0", "__d")
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "__d")
    # per-digest corpus count as a COUNT window over the digest
    # partition (r16; guide §2.4 "remove shuffles outright").  The
    # former groupBy(__d)+filter + shuffle-hash join back onto `grams`
    # REBUILT the entire md5 gram stream for the join's probe side —
    # the plan carried two Generate+md5 subtrees with no exchange reuse,
    # so every gram was hashed twice and the stream crossed two keyed
    # exchanges.  The window computes the identical per-digest count on
    # ONE build of the stream and one digest-keyed exchange (count over
    # an unordered window = whole-partition count, exactly the join's
    # __n).  Skew parity: a hot digest's rows all hashed to a single
    # join task before and land on a single window task now; the window
    # buffer spills via ExternalAppendOnlyUnsafeRowArray where the join
    # streamed, the price of hashing the corpus once instead of twice.
    from pyspark.sql.window import Window
    wd = Window.partitionBy("__d")
    marked = (grams.withColumn("__n", F.count(F.lit(1)).over(wd))
              .filter(F.col("__n") >= 2)
              .select(id_col, "pos"))
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = marked.withColumn("__grp",
                            F.col("pos") - F.row_number().over(w))
    return (isl.groupBy(id_col, "__grp")
            .agg(F.min("pos").alias("start_pos"),
                 F.max("pos").alias("end_pos"))
            .select(id_col, "start_pos", "end_pos",
                    (F.col("end_pos") - F.col("start_pos") + k)
                    .alias("span_tokens")))


def substring_dedup_stats(docs: DataFrame, k: int = 8,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document duplicated-substring profile over
    :func:`duplicate_spans`: span count, duplicated-token total, and the
    duplicated fraction of the document — the quantity train-dedup
    pipelines threshold on before cutting spans out."""
    spans = duplicate_spans(docs, k=k, text_col=text_col, id_col=id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"))
    return (docs.select(F.col(id_col),
                        F.size(tokens(text_col)).alias("__nt"))
            # per_doc is one row per document — corpus-cardinality, never
            # broadcastable; same shuffle-hash pin as duplicate_spans
            .join(per_doc.hint("shuffle_hash"), id_col)
            .select(id_col, "n_spans", "dup_tokens",
                    F.round(F.col("dup_tokens") / F.col("__nt"), 6)
                    .alias("dup_frac")))


def remove_duplicate_spans(docs: DataFrame, k: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The CUT step of exact substring dedup (Lee et al. 2022 apply
    phase): drop every token covered by a duplicated span
    (:func:`duplicate_spans`) and reassemble the remaining tokens in
    order.  Documents with no duplicated span pass through untouched.

    Reassembly is posexplode -> span anti-range filter -> order-preserving
    array_agg keyed by position — the text column itself still never
    shuffles (only (doc, pos, token) triples of the affected docs do,
    and unaffected docs short-circuit through the left anti join).
    """
    spans = duplicate_spans(docs, k=k, text_col=text_col, id_col=id_col)
    # affected is corpus-cardinality (ids of every doc with a duplicated
    # span) — pin shuffle-hash so no AQE broadcast build at corpus scale
    affected = spans.select(id_col).distinct().hint("shuffle_hash")
    clean = docs.join(affected, id_col, "left_anti") \
        .select(id_col, F.col(text_col).alias("clean_text"))
    toks = (docs.join(affected, id_col, "left_semi")
            .select(id_col, F.posexplode(tokens(text_col))
                    .alias("__p0", "__tok"))
            .select(id_col, (F.col("__p0") + 1).alias("pos"), "__tok"))
    # a token survives when NO span covers its position; explicit aliases
    # — toks and spans share the docs lineage, so unqualified id refs
    # would resolve to ONE attribute and collapse the equality
    t_, s_ = toks.alias("t"), spans.alias("s")
    covered = t_.join(
        s_, (F.col(f"t.{id_col}") == F.col(f"s.{id_col}"))
        & (F.col("t.pos") >= F.col("s.start_pos"))
        & (F.col("t.pos") <= F.col("s.end_pos") + (k - 1)), "left_anti")
    rebuilt = (covered.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(F.array_sort(F.collect_list(
                       F.struct("pos", "__tok"))), lambda s: s["__tok"]),
                   " ").alias("clean_text")))
    # docs whose every token was covered vanish from `rebuilt`; they
    # reappear with empty text (the reference behavior: a fully
    # duplicated document becomes empty, and a later length filter
    # drops it)
    emptied = (docs.join(affected, id_col, "left_semi")
               .join(rebuilt.select(id_col).hint("shuffle_hash"),
                     id_col, "left_anti")
               .select(id_col, F.lit("").alias("clean_text")))
    return clean.unionByName(rebuilt).unionByName(emptied)


def semdedup_k(n_rows: int, rows_per_cluster: int | None = None) -> int:
    """Production centroid count for :func:`semdedup` — k MUST grow with
    the corpus; a fixed k (like the 32-centroid oracle harness in
    __spark_entry__) is a verification config, not a production setting:
    at 10x the rows it does 100x the pair work per cluster.

    Two regimes:
    - ``rows_per_cluster=None`` (default): k = ceil(sqrt(N)), the point
      where assignment cost O(N*k*d) equals sweep cost O(N^2*d/k) — the
      right sizing when the codebook is trained just for dedup (measured
      at a 100x replica: 43.6s vs 125.6s fixed-k / 209.5s oversized-k).
    - explicit ``rows_per_cluster``: k = ceil(N / rows_per_cluster),
      SemDeDup's published fixed-ratio shape (50k clusters @ LAION-440M
      ~= 8,800/cluster) — the right sizing when an IVF index of that
      granularity already exists and assignment is sunk cost.
    """
    n = int(n_rows)
    if rows_per_cluster is None:
        return max(1, math.isqrt(max(n, 0)) + (math.isqrt(max(n, 0)) ** 2 < n))
    return max(1, -(-n // int(rows_per_cluster)))


def semdedup_auto(emb: DataFrame, threshold: float = 0.92,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  rows_per_cluster: int | None = None,
                  kmeans_iters: int = 2) -> DataFrame:
    """:func:`semdedup` with the production codebook: k-means centroids
    sized by :func:`semdedup_k` (sqrt-balanced by default, paper-ratio
    when ``rows_per_cluster`` is given), so cluster sizes — and the
    quadratic cluster-local sweep — stay bounded as the corpus grows.
    One count, an IVF build, then the sweep."""
    from neo_server_spark.datapipe.similarity import ivf_index

    k = semdedup_k(emb.count(), rows_per_cluster)
    centroids, _ = ivf_index(emb, n_centroids=k, iters=kmeans_iters,
                             vec_col=vec_col, id_col=id_col)
    return semdedup(emb, centroids, threshold=threshold,
                    vec_col=vec_col, id_col=id_col)


def semdedup(emb: DataFrame, centroids: DataFrame, threshold: float = 0.92,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings and pruning near-identical pairs WITHIN each
    cluster only — the published trick that turns an O(N^2) cosine sweep
    into k cluster-local sweeps of ~(N/k)^2.

    ``centroids`` is a (cid, cv) frame (e.g. from ``similarity.ivf_index``,
    or any fixed codebook).  Each embedding is assigned to its nearest
    centroid (broadcast argmin — the corpus never shuffles for assignment),
    then a self-join ON cid finds same-cluster pairs with cosine >=
    ``threshold``; the member with the LOWER id is kept, so every dup row
    reports the max cosine against an earlier same-cluster member.

    100 TB notes: the only corpus shuffle is the cid-keyed exchange feeding
    the self-join; the per-cluster quadratic is the algorithm's own design
    knob — scale k with N to bound cluster size (SemDeDup runs 50k clusters
    for LAION-440M).  No reference counterpart (beyond-reference
    training-data surface).

    Returns (id, cid, keep, max_dup_cos) — keep=false rows are the prune set.
    """
    from neo_server_spark.datapipe.similarity import _assign

    assigned = _assign(emb, centroids, vec_col, id_col)

    # Cluster-local sweep as a grouped Arrow kernel: one task per cluster,
    # pairwise cosines built by PER-DIMENSION accumulation (64 outer
    # products instead of n^2 interpreted folds) in the exact float64
    # operation order of the SQL expression dot/(na*nb) — so the result is
    # bitwise identical to the former pair-join form, ~2 orders of
    # magnitude less CPU, and the only exchange is the cid repartition.
    # Row blocks bound memory to O(block * cluster) per task.
    import numpy as np

    from pyspark.sql.types import (DoubleType, BooleanType, StructField,
                                   StructType)

    id_field = next(f for f in assigned.schema.fields if f.name == id_col)
    cid_field = next(f for f in assigned.schema.fields if f.name == "cid")
    out_schema = StructType([
        id_field, cid_field,
        StructField("keep", BooleanType()),
        StructField("max_dup_cos", DoubleType()),
    ])

    def sweep(pdf):
        import pandas as pd
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        n, d = x.shape
        nrm = np.zeros(n)
        for j in range(d):                      # sequential norm fold
            nrm = nrm + x[:, j] * x[:, j]
        nrm = np.sqrt(nrm)
        maxcos = np.full(n, np.nan)
        blk = 1024
        for s in range(0, n, blk):
            e = min(s + blk, n)
            dots = np.zeros((e - s, n))
            for j in range(d):                  # sequential dot fold
                dots = dots + np.outer(x[s:e, j], x[:, j])
            cos = dots / (nrm[s:e, None] * nrm[None, :])
            for i in range(max(s, 1), e):
                row = cos[i - s, :i]
                hit = row[row >= threshold]
                if hit.size:
                    maxcos[i] = hit.max()
        return pd.DataFrame({
            id_col: pdf[id_col],
            "cid": pdf["cid"],
            "keep": np.isnan(maxcos),
            "max_dup_cos": maxcos,
        })

    swept = assigned.select(id_col, "cid", vec_col) \
        .groupBy("cid").applyInPandas(sweep, out_schema)
    return swept.select(
        F.col(id_col), F.col("cid"), F.col("keep"),
        F.round(F.col("max_dup_cos"), 6).alias("max_dup_cos"))


def dedup_incremental(new_docs: DataFrame, seen: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      digest_col: str = "digest") -> DataFrame:
    """Incremental exact dedup for continuous corpus building: drop every
    new document whose text digest already exists in the ``seen`` index
    (a frame with a ``digest_col`` md5 column, e.g. the output of a prior
    round's index), then dedup the batch against itself (min id wins).

    The 100 TB operating mode: the accumulated index is only digests —
    16 bytes/doc — so re-deduping a daily batch never rescans the corpus;
    both the anti-join against the index and the in-batch keeper election
    shuffle on the digest alone.
    """
    d = new_docs.withColumn("__d", F.md5(F.col(text_col)))
    fresh = d.join(seen.select(F.col(digest_col).alias("__d")).distinct(),
                   "__d", "left_anti")
    keep = fresh.groupBy("__d").agg(F.min(id_col).alias(id_col))
    return (fresh.join(keep, [ "__d", id_col], "left_semi")
                 .drop("__d"))


def digest_index(docs: DataFrame, text_col: str = "text",
                 digest_col: str = "digest") -> DataFrame:
    """The persistent index frame for :func:`dedup_incremental`: one row per
    distinct text digest (write this, not the text, between batches)."""
    return docs.select(F.md5(F.col(text_col)).alias(digest_col)).distinct()


def canonicalize_best(docs: DataFrame, pairs: DataFrame,
                      score_col: str = "quality",
                      id_col: str = "doc_id") -> DataFrame:
    """Quality-aware cluster canonicalization: within each duplicate
    cluster (connected components over ``pairs``) keep the HIGHEST-scoring
    member (ties to the lowest id) instead of the arbitrary min-id doc —
    the curation policy when near-duplicates differ in cleanliness.

    One extra shuffle vs :func:`dedup_clusters`: the per-cluster argmax is
    a ``max(struct(score, -id))`` groupBy on the O(clustered docs) frame,
    map-side combinable.  Returns every doc with its cluster id, the
    elected ``canonical_id``, and ``keep``.
    """
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    labeled = docs.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce("comp", F.col(id_col))).drop("comp")
    best = (
        labeled.groupBy("cluster_id")
        .agg(F.max(F.struct(F.col(score_col).alias("s"),
                            (-F.col(id_col)).alias("ni"))).alias("b"))
        .select("cluster_id", (-F.col("b.ni")).alias("canonical_id"))
    )
    return (
        labeled.join(best, "cluster_id")
        .withColumn("keep", F.col(id_col) == F.col("canonical_id"))
    )


def exact_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       max_rows: int = 100_000) -> DataFrame:
    """EXACT all-pairs cosine near-dup pairs — the brute-force ground
    truth the LSH variants approximate.  O(N^2) by definition: the full
    matrix ships to every task (it must fit to be 'exact all-pairs' at
    all — the scale path is :func:`embedding_dupes`); each Arrow batch
    computes its rows against all higher ids with the same per-dimension
    sequential float64 folds as ``cosine_expr``, so results are bitwise
    equal to the SQL self-join form.

    ``max_rows`` guards the driver (r13 verdict #5): the collect below
    is intentional for an ORACLE-sized input, but pointing this at a
    production table would OOM the driver long before the O(N^2) pass
    finished.  Raise the cap explicitly if you truly mean it.
    """
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    n = emb.count()
    if n > max_rows:
        raise ValueError(
            f"exact_cosine_pairs is the O(N^2) ground-truth oracle and "
            f"collects the full matrix driver-side: {n} rows > "
            f"max_rows={max_rows}.  Use embedding_dupes (banded "
            f"hyperplane LSH, one shuffle) at scale, or pass "
            f"max_rows={n} to override deliberately")
    rows = emb.select(id_col, vec_col).orderBy(id_col).collect()
    all_ids = np.array([r[id_col] for r in rows])
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = mat.shape[1]
    nrm = np.zeros(len(rows))
    for j in range(d):                        # sequential norm fold
        nrm = nrm + mat[:, j] * mat[:, j]
    nrm = np.sqrt(nrm)
    id_field = next(f for f in emb.schema.fields if f.name == id_col)
    out_schema = StructType([
        StructField("id_a", id_field.dataType),
        StructField("id_b", id_field.dataType),
        StructField("cosine", DoubleType()),
    ])

    def pairs(it):
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            na = np.zeros(len(pdf))
            for j in range(d):
                na = na + x[:, j] * x[:, j]
            na = np.sqrt(na)
            out_a, out_b, out_c = [], [], []
            for r in range(len(pdf)):
                mask = all_ids > ids[r]
                if not mask.any():
                    continue
                dot = np.zeros(int(mask.sum()))
                sub = mat[mask]
                for j in range(d):            # sequential dot fold
                    dot = dot + x[r, j] * sub[:, j]
                cos = dot / (na[r] * nrm[mask])
                hit = np.nonzero(cos >= threshold)[0]
                out_a.extend([ids[r]] * len(hit))
                out_b.extend(all_ids[mask][hit])
                out_c.extend(cos[hit])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "cosine": out_c})

    return (emb.select(id_col, vec_col).mapInPandas(pairs, out_schema)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))


def simhash_hamming_pairs(docs: DataFrame, max_dist: int = 3,
                          text_col: str = "text", id_col: str = "doc_id",
                          bits: int = 64,
                          hash_fn: str = "xxhash64",
                          max_bucket: int = 10_000) -> DataFrame:
    """Near-duplicate pairs at SimHash Hamming distance <= ``max_dist``
    (Charikar 2002 / the Google near-dup pipeline, Manku et al. 2007):
    the signature splits into ``max_dist + 1`` blocks — by pigeonhole any
    pair within distance d agrees on at least one whole block — so
    candidates exist only inside (block#, block value) buckets and only
    bucket co-members pay the XOR-popcount verify.

    100 TB shape: ONE shuffle, keyed on (block#, block value) over
    (id, signature) rows — 3 fixed-width ints per doc per block.  The
    verify is a per-bucket Arrow kernel (vectorized uint64 XOR + 16-bit
    popcount table, row-blocked so memory is O(block * bucket)) — the
    candidate PAIRS never materialize as exchanged rows.  The former
    bucket self-join + distinct shape was measured materializing 1.3e9
    candidate rows on a 100x corpus whose docs share most tokens; the
    kernel does those popcounts in-place instead.  Buckets larger than
    ``max_bucket`` are skipped (Manku's over-full-table guard): a bucket
    that big means templated/boilerplate text that exact/line dedup
    should collapse first, and its quadratic verify would dominate the
    job; singleton buckets and over-full buckets are both skipped INSIDE
    the kernel off the same run-length slicing that finds exact-value
    buckets — a former count-window pre-filter spent a full extra
    exchange+sort of every sketch row just to drop rows the kernel's
    ``n < 2`` check skips for free (r15: plan went 2 data shuffles -> 1).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    sh = simhash(docs.select(id_col, text_col), text_col,
                 bits=bits, hash_fn=hash_fn, keep=[id_col])
    if hash_fn == "md5":
        bits = min(bits, 60)
    n_blocks = max_dist + 1
    wb = bits // n_blocks
    blocks = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), b * wb)
        .bitwiseAND(F.lit((1 << wb) - 1)).alias(f"b{b}")
        for b in range(n_blocks)])
    # shuffle key COARSENS the block value: one Arrow group per (block,
    # value range) instead of per exact value — the per-group pandas
    # overhead dominates tiny groups (the naive per-value grouping spent
    # more time constructing DataFrames than popcounting), so the group
    # COUNT is sized to the cluster: ~2 groups per core across all
    # blocks (r15 measurement at local[32]: 2048 groups 5.7s -> 64
    # groups 3.6s for identical output).  Exact-value bucketing happens
    # INSIDE the kernel with a numpy sort + run-length slicing, so the
    # grouping granularity never changes the result.
    par = max(1, sh.sparkSession.sparkContext.defaultParallelism)
    per_block = max(1, (2 * par) // n_blocks)
    gbits = min(wb, max(0, (per_block - 1).bit_length()))
    coarse = wb - gbits
    sk = (sh.select(id_col, "simhash",
                    F.posexplode(blocks).alias("__b", "__v"))
          .withColumn("__g", F.shiftrightunsigned(F.col("__v"), coarse)))

    id_type = sh.schema[id_col].dataType
    out_schema = StructType([
        StructField("id_a", id_type), StructField("id_b", id_type),
        StructField("hamming", LongType()),
    ])
    pop16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                     dtype=np.uint8)

    def popcount64(x: "np.ndarray") -> "np.ndarray":
        h = (pop16[x & 0xFFFF].astype(np.int64)
             + pop16[(x >> np.uint64(16)) & np.uint64(0xFFFF)]
             + pop16[(x >> np.uint64(32)) & np.uint64(0xFFFF)]
             + pop16[(x >> np.uint64(48)) & np.uint64(0xFFFF)])
        return h

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        order = np.lexsort((pdf[id_col].to_numpy(),
                            pdf["__v"].to_numpy()))
        ids = pdf[id_col].to_numpy()[order]
        sigs = pdf["simhash"].to_numpy(dtype=np.int64).view(
            np.uint64)[order]
        vals = pdf["__v"].to_numpy()[order]
        bounds = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1], True])
        out_a, out_b, out_h = [], [], []
        blk = 512
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            n = e0 - s0
            # singleton buckets can hold no pair; over-full buckets are
            # Manku's boilerplate guard (see docstring) — both checks
            # ride the run-length bounds, no pre-shuffle count needed
            if n < 2 or n > max_bucket:
                continue
            bids, bsig = ids[s0:e0], sigs[s0:e0]
            for s in range(0, n, blk):
                e = min(s + blk, n)
                ham = popcount64(bsig[s:e, None] ^ bsig[None, :])
                for i in range(s, e):
                    row = ham[i - s, i + 1:]      # id_a < id_b half
                    hit = np.nonzero(row <= max_dist)[0]
                    if hit.size:
                        out_a.append(np.full(hit.size, bids[i]))
                        out_b.append(bids[i + 1:][hit])
                        out_h.append(row[hit])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []},
                                dtype=np.int64)
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h).astype(np.int64),
        })

    pairs = sk.groupBy("__b", "__g").applyInPandas(verify, out_schema)
    # a pair agreeing on several blocks surfaces once per block — the
    # final distinct runs on the (small) verified-pair set only
    return pairs.distinct()
