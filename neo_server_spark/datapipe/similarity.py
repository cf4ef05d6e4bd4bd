"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a single narrow scan with a JVM-side
fold for the dot product (no Python, no shuffle of vectors; TakeOrdered keeps
only k rows per partition).  Scale path: IVF-style coarse quantization — a
one-off k-means-ish centroid table (broadcast), vectors bucketed by nearest
centroid, queries probe only the closest ``nprobe`` buckets, turning a 100 TB
scan into a partition-pruned read.

READ-PATH TIERS (measured, recall_sf01.json / recall_100x.json + COVERAGE.md):

* EXACT — brute_force_topk / topk_join: ground truth, full scan.
* HIGH-RECALL APPROX — lsh_topk(_join) and ivf_search/ivf_topk_join at
  nprobe >= n_centroids/4: recall@10 >= 0.9 at both sf0.1 and the 100x
  replica; these read float vectors only for bucket candidates.
* FILTER TIER — pq_search, ivfpq_search, ivfpq_search_residual
  STANDALONE: 32-bit PQ codes cap ADC resolution at recall@10 ~0.37-0.40
  at 100x (the residual encoding of ivfpq_index recovers only +0.013 —
  measured r11, `--sections resid`), so use them ONLY to produce
  shortlists, never as the final ranking.
* DEFAULT PRODUCTION PATH — pq_search_rerank / ivfpq_search_rerank:
  ADC shortlist (10x k) -> exact cosine re-rank of the shortlist rows
  only.  recall@10 = 1.0 at 100x for both raw and residual codes, with
  vector fetches O(shortlist).  At corpus scales where nprobe covers a
  thin slice of tiny buckets (sf0.1: 2k vectors, 22 centroids) the
  COARSE PROBE is the recall bound, not ADC — raise nprobe before
  raising shortlist.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(emb: DataFrame, query_vec_id: int, k: int = 20,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors of the vector with id ``query_vec_id``.

    The query vector is a broadcast 1-row join (crossJoin of a tiny side);
    ranking compiles to TakeOrderedAndProject — no global sort.
    """
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("__qv"))
    out = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col("label"),
            cosine_expr(F.col(vec_col), F.col("__qv")).alias("__c"),
        )
    )
    # rank on the raw cosine, round only the reported value
    return (
        out.orderBy(F.col("__c").desc(), F.col(id_col)).limit(k)
        .select(id_col, "label", F.round("__c", 6).alias("cosine"))
    )


def topk_join(emb: DataFrame, queries: DataFrame, k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id",
              q_vec_col: str = "embedding", q_id_col: str = "vec_id") -> DataFrame:
    """Batch k-NN: top-k corpus neighbors for EVERY query row.

    Broadcast the query set (must be small enough — typical for dedup probes
    or eval sets); rank per query with a window, keep k.  At 100 TB the corpus
    stays partition-local: no shuffle of the big side until the final
    per-query top-k (k x |queries| rows).
    """
    from pyspark.sql import Window

    joined = emb.crossJoin(
        F.broadcast(queries.select(F.col(q_id_col).alias("__qid"),
                                   F.col(q_vec_col).alias("__qv")))
    ).filter(F.col(id_col) != F.col("__qid")).select(
        F.col("__qid").alias("query_id"),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", id_col, F.round("cosine", 6).alias("cosine"))
    )


def ivf_index(emb: DataFrame, n_centroids: int = 64, iters: int = 5,
              vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42):
    """Build an IVF coarse index: (centroids_df, assigned_df).

    Lloyd's k-means on DataFrames: centroids live in a broadcast table;
    assignment = argmin distance expression; update = posexplode(vec) →
    groupBy(cid, pos).avg → collect_list reassembly.  The update is
    dimension-agnostic: one narrow 3-column shuffle of (cid, pos, v) rows
    instead of one aggregate EXPRESSION per dimension (which blows up the
    plan at dim 384-1536) — and no driver round-trip to discover the
    dimension.  Each pass is one scan + one small agg.
    """
    centroids = (
        emb.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(2**31)))
        .limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col(vec_col).alias("cv"))
    )
    for _ in range(iters):
        rows, centroids = _localize_centroids(centroids)
        assigned = _assign(emb, centroids, vec_col, id_col, rows=rows)
        centroids = _centroid_update(assigned, vec_col)
    rows, centroids = _localize_centroids(centroids)
    assigned = _assign(emb, centroids, vec_col, id_col, rows=rows)
    return centroids, assigned


def _localize_small(df: DataFrame, sort_cols: list[str]):
    """Collect a SMALL codebook-sized frame ONCE and rebuild it as a
    local relation.  One driver action per training round instead of the
    three sizing probes ``_assign`` pays on an unknown frame (count +
    first + collect, EACH re-executing the full training lineage), and
    every downstream consumer — the next round's update agg, the probe
    crossJoin, every broadcast build — reads a LocalTableScan instead of
    replaying the chain of assign-kernel + posexplode aggregations (or,
    for PQ codebooks, re-SCANNING the corpus seed once per consumer).
    Values round-trip bit-exact (float32 -> Python float -> float32).
    Returns (sorted rows, local_df)."""
    spark = df.sparkSession
    rows = sorted(df.collect(), key=lambda r: tuple(r[c] for c in sort_cols))
    return rows, spark.createDataFrame(rows, df.schema)


def _localize_centroids(centroids: DataFrame):
    """See ``_localize_small`` — the k-means centroid instance (frame is
    <= n_centroids rows by construction, so the collect is bounded)."""
    return _localize_small(centroids, ["cid"])


def _centroid_update(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Mean vector per centroid without per-dimension agg columns.

    (cid, pos, value) rows → avg per (cid, pos) → array_sort(collect_list)
    reassembly (struct sort key = pos, so element order is positional and
    deterministic).  Shuffle width is 3 narrow columns regardless of
    embedding dimension; partial aggregation (map-side combine) applies.
    """
    return (
        assigned.select("cid", F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("cv"))
    )


#: centroid matrices up to this many cells ride the Arrow fast path as a
#: task closure; beyond it (huge codebooks) the crossJoin form keeps the
#: centroids distributed
_ASSIGN_CLOSURE_CELLS = 2_000_000


def _assign(emb: DataFrame, centroids: DataFrame, vec_col: str, id_col: str,
            rows: list | None = None) -> DataFrame:
    """Nearest-centroid assignment, bit-identical across both paths.

    d2 is the SEQUENTIAL left-to-right fold Σ_j (x_j - c_j)^2 in float64
    (the oracle replays exactly this), argmin tie-breaks on ascending cid.

    Fast path: centroids collapse to a small driver matrix and each Arrow
    batch computes d2 with a per-DIMENSION accumulation loop — the same
    float64 operation sequence as the SQL fold, vectorized over rows —
    so no join, no N*k row explosion, no window shuffle, and the result
    is bitwise equal to the crossJoin form (which remains for codebooks
    too large to ship as a closure).

    ``rows`` lets a caller that already collected the centroids (e.g.
    ``ivf_index`` via ``_localize_centroids``) skip the three sizing
    probes entirely; they must be sorted ascending by cid.
    """
    if rows is None:
        try:
            k = centroids.count()
            dim = centroids.select(F.size("cv")).first()[0] or 0
            if k * max(dim, 1) <= _ASSIGN_CLOSURE_CELLS:
                rows = centroids.orderBy("cid").collect()
        except Exception:   # unsizeable side (e.g. streaming) -> crossJoin
            rows = None
    elif rows and len(rows) * max(len(rows[0]["cv"]), 1) \
            > _ASSIGN_CLOSURE_CELLS:
        rows = None         # caller-collected but over the closure budget
    if rows:
        import numpy as np

        cids = [r["cid"] for r in rows]
        cmat = np.array([list(r["cv"]) for r in rows], dtype=np.float64)
        from pyspark.sql.types import StructField, StructType

        # NOTE: StructType.add mutates (and would corrupt emb's cached
        # schema) — build a fresh StructType instead
        out_schema = StructType(
            list(emb.schema.fields)
            + [StructField("cid", centroids.schema["cid"].dataType)])
        vec_name, kk, dd = vec_col, len(cids), cmat.shape[1]

        def assign_batches(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                x = np.array(pdf[vec_name].tolist(), dtype=np.float64)
                best = np.full(len(pdf), np.inf)
                bidx = np.zeros(len(pdf), dtype=np.int64)
                for ci in range(kk):        # ascending cid = the tie-break
                    acc = np.zeros(len(pdf))
                    for j in range(dd):     # sequential fold, same order
                        diff = x[:, j] - cmat[ci, j]
                        acc = acc + diff * diff
                    upd = acc < best
                    best[upd] = acc[upd]
                    bidx[upd] = ci
                pdf = pdf.copy()
                pdf["cid"] = [cids[i] for i in bidx]
                yield pdf

        return emb.mapInPandas(assign_batches, out_schema)

    joined = emb.crossJoin(F.broadcast(centroids))
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cv"),
                   lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0), lambda a, x: a + x,
    )
    scored = joined.select(emb["*"], F.col("cid"), d2.alias("__d2"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(), F.col("cid").asc())
    return scored.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1).drop("__rk", "__d2")


def ivf_search(assigned: DataFrame, centroids: DataFrame, query_vec,
               k: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Probe the ``nprobe`` nearest centroid buckets for one query vector."""
    spark = assigned.sparkSession
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.select(
            "cid",
            F.aggregate(F.zip_with(F.col("cv"), qlit,
                                   lambda x, y: (x.cast("double") - y) ** 2),
                        F.lit(0.0), lambda a, x: a + x).alias("d2"),
        )
        .orderBy("d2").limit(nprobe)
    )
    return (
        assigned.join(F.broadcast(probe.select("cid")), "cid")
        .select(id_col, cosine_expr(F.col(vec_col), qlit).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk_join(assigned: DataFrame, centroids: DataFrame,
                  queries: DataFrame, k: int = 10, nprobe: int = 4,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  q_vec_col: str = "embedding",
                  q_id_col: str = "vec_id",
                  exclude_self: bool = True) -> DataFrame:
    """Batch IVF k-NN: top-k corpus neighbors for EVERY query row, the
    production shape for eval sets / dedup probes at scale.

    Plan: queries assign to their ``nprobe`` nearest centroids (broadcast
    centroid matrix — the same kernel as the index build), producing a
    tiny (qid, cid) probe frame; ONE broadcast join of that frame against
    the bucketed corpus replaces |queries| separate jobs, and only
    probed-bucket rows pay the exact cosine.  The corpus never reshuffles
    — it is already keyed by cid from the index build — and the final
    per-query top-k ranks k x |queries| rows.  Contrast ``topk_join``
    (brute force): that scans every (query, corpus) pair; this scans
    ~nprobe/n_centroids of them for the same output schema, so it is the
    drop-in at 100 TB once the IVF index exists.

    ``exclude_self=True`` (default) drops corpus rows whose id equals
    the query id — correct when queries ARE corpus members (dedup
    probes, leave-one-out eval).  Pass ``exclude_self=False`` when the
    query id space is disjoint from the corpus: there an accidental id
    collision would silently drop a legitimate neighbor."""
    from pyspark.sql import Window

    qn = queries.select(F.col(q_id_col).alias("__qid"),
                        F.col(q_vec_col).alias("__qv"))
    # nprobe nearest centroids per query: |queries| x n_centroids is a
    # small frame (both sides broadcastable); fold d2 JVM-side
    d2 = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("cv"),
                   lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0), lambda a, x: a + x)
    wq = Window.partitionBy("__qid").orderBy(F.col("__d2").asc(),
                                             F.col("cid").asc())
    probes = (qn.crossJoin(F.broadcast(centroids))
              .select("__qid", "__qv", "cid", d2.alias("__d2"))
              .withColumn("__rk", F.row_number().over(wq))
              .filter(F.col("__rk") <= nprobe)
              .select("__qid", "__qv", "cid"))
    cand = assigned.join(F.broadcast(probes), "cid")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col("__qid"))
    wk = Window.partitionBy("query_id").orderBy(F.col("__c").desc(),
                                                F.col(id_col))
    return (cand.select(F.col("__qid").alias("query_id"), F.col(id_col),
                        cosine_expr(F.col(vec_col),
                                    F.col("__qv")).alias("__c"))
            .withColumn("__rk", F.row_number().over(wk))
            .filter(F.col("__rk") <= k)
            .select("query_id", id_col, F.round("__c", 6).alias("cosine")))


def lsh_topk_join(emb: DataFrame, queries: DataFrame, k: int = 10,
                  block_bits: int = 3, bands: int = 12,
                  hash_fn: str = "xxhash64", vec_col: str = "embedding",
                  id_col: str = "vec_id", q_id_col: str = "vec_id",
                  sig: DataFrame | None = None,
                  exclude_self: bool = True) -> DataFrame:
    """Batch LSH k-NN: top-k for EVERY query row off one sketch frame —
    the no-training counterpart of ``ivf_topk_join`` (same output
    schema, per-query results identical to ``lsh_topk``, pinned in
    pytest).

    Plan: the queries' (band, bucket) rows (a tiny slice of the sig
    frame) broadcast-join back onto the corpus sketch to produce the
    per-query candidate sets; candidates fetch vectors once and pay the
    exact cosine; a window ranks k per query.  The corpus is touched
    twice (sketch scan at index time + candidate vector fetch), never
    per-query — at 100 TB the sketch is the materialized ``lsh_index``
    and queries are metadata-sized joins against it."""
    from pyspark.sql import Window

    if sig is None:
        sig = lsh_index(emb, block_bits, bands, hash_fn, vec_col, id_col)
    qids = queries.select(F.col(q_id_col).alias("__qid"))
    qsig = (sig.join(F.broadcast(qids),
                     sig[id_col] == qids["__qid"])
            .select("__qid", "__band", "__bucket").distinct())
    cand = sig.join(F.broadcast(qsig), ["__band", "__bucket"])
    if exclude_self:
        # only meaningful when queries are corpus members (dedup /
        # leave-one-out); with a disjoint query id space an accidental
        # id collision would drop a real neighbor — pass False there
        cand = cand.filter(F.col(id_col) != F.col("__qid"))
    cand = cand.select("__qid", id_col).distinct()
    qv = queries.select(F.col(q_id_col).alias("__qid"),
                        F.col(vec_col).alias("__qv"))
    scored = (cand.join(emb.select(id_col, vec_col), id_col)
              .join(F.broadcast(qv), "__qid")
              .select(F.col("__qid").alias("query_id"), F.col(id_col),
                      cosine_expr(F.col(vec_col),
                                  F.col("__qv")).alias("__c")))
    wk = Window.partitionBy("query_id").orderBy(F.col("__c").desc(),
                                                F.col(id_col))
    return (scored.withColumn("__rk", F.row_number().over(wk))
            .filter(F.col("__rk") <= k)
            .select("query_id", id_col,
                    F.round("__c", 6).alias("cosine")))


def pq_search_rerank(codes: DataFrame, codebooks: DataFrame, emb: DataFrame,
                     query_vec, k: int = 10, shortlist: int = 100,
                     m: int = 8, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """PQ with exact re-rank — the production two-stage ANN read path:
    ADC over the compact codes produces a ``shortlist`` (memory-tier
    filter; COVERAGE.md's recall audit measured the 32-bit-code
    resolution floor at recall@10 ~0.37-0.58), then ONLY the shortlist
    rows fetch their float vectors for exact cosine ranking.  Recall
    becomes ADC's recall@shortlist (>= recall@k by construction) while
    the vector fetch stays O(shortlist).

    SIZE THE SHORTLIST TO THE CORPUS GEOMETRY (r15 adversarial audit,
    recall_r15.json): on uniform-ish corpora shortlist = 10x k reads
    ~1.0, but on DUP-DENSE clustered data the ADC shortlist itself
    saturates — with a 19k-member near-dup cluster (pairwise cosine
    ~0.9) recall@10 was 0.16 at shortlist=30, 0.34 at 100, 0.64 at
    1000: thousands of shell members tie within code resolution, so
    recall grows only as shortlist approaches the duplicate-cluster
    size.  For that workload prefer the IVF probe path (0.99 at
    nprobe=16 on the same fixture) or size ``shortlist`` at the
    expected cluster cardinality.

    Returns (id, cosine) like the exact searchers — rank quality of
    brute force at the scan cost of PQ."""
    short = pq_search(codes, codebooks, query_vec, k=shortlist, m=m,
                      id_col=id_col).select(id_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (emb.join(F.broadcast(short), id_col)
            .select(F.col(id_col),
                    cosine_expr(F.col(vec_col), qlit).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col(id_col)).limit(k)
            .select(id_col, F.round("__c", 6).alias("cosine")))


def embedding_stats(emb: DataFrame, vec_col: str = "embedding",
                    by: str | None = None) -> DataFrame:
    """Embedding-quality profile: dim / L2-norm / zero-vector checks,
    optionally per ``by`` group (e.g. label).  One scan, one hash-agg —
    the norms are JVM-side ``aggregate`` folds, never Python.

    Training-data gate: catches truncated vectors (dim drift), collapsed
    (zero) embeddings, and un-normalized batches before they poison ANN
    indexes or contrastive training.
    """
    norm = norm_expr(F.col(vec_col))
    keys = [by] if by else []
    return (
        emb.select(*keys, F.size(vec_col).alias("__d"), norm.alias("__n"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("__d").alias("min_dim"),
            F.max("__d").alias("max_dim"),
            F.round(F.avg("__n"), 6).alias("avg_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
            F.sum(F.when(F.col("__n") == 0, 1).otherwise(0)).alias("n_zero"),
        )
    )


def quantize_int8(emb: DataFrame, vec_col: str = "embedding",
                  out_col: str = "q8", scale_col: str = "q_scale") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = round(x / scale)`` with
    ``scale = max|x| / 127``.  Cuts ANN shuffle/broadcast bytes 4x (vs
    float32) — at 100 TB the candidate-pair exchange is the bottleneck, not
    the arithmetic.  Zero vectors keep scale=0 and quantize to zeros.

    All array math is built-in ``transform``/``aggregate`` (JVM codegen,
    no Python); dequantize is ``q * scale``.
    """
    x = F.col(vec_col)
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(absmax == 0, F.transform(x, lambda v: F.lit(0).cast("tinyint"))) \
         .otherwise(F.transform(
             x, lambda v: F.round(v.cast("double") / scale)
             .cast("tinyint"))).alias(out_col)
    return emb.withColumns({scale_col: scale.alias(scale_col), out_col: q})


def quantization_error(emb: DataFrame, vec_col: str = "embedding",
                       by: str = "label") -> DataFrame:
    """Per-group reconstruction-error profile of int8 quantization: max and
    mean absolute error across all components — the go/no-go gate before
    switching an ANN pipeline to quantized vectors."""
    qd = quantize_int8(emb, vec_col=vec_col)
    err = F.zip_with(
        F.col(vec_col), F.col("q8"),
        lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col("q_scale")))
    keys = [by] if by else []
    return (
        qd.select(*keys,
                  F.array_max(err).alias("__mx"),
                  (F.aggregate(err, F.lit(0.0), lambda a, v: a + v)
                   / F.size(vec_col)).alias("__avg"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.round(F.max("__mx"), 6).alias("max_err"),
             F.round(F.avg("__avg"), 6).alias("avg_err"))
    )


def lsh_index(emb: DataFrame, block_bits: int = 3, bands: int = 12,
              hash_fn: str = "xxhash64", vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Materializable (band, bucket) sketch frame for ``lsh_topk`` — build
    (and persist/write) ONCE, probe many times.  At 100 TB the index is
    the only full-corpus scan; each query afterwards touches ``bands``
    buckets."""
    from neo_server_spark.datapipe.dedup import band_buckets

    return band_buckets(emb.select(id_col, vec_col), vec_col, id_col,
                        block_bits, bands, hash_fn)


def lsh_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
             block_bits: int = 3, bands: int = 12,
             hash_fn: str = "xxhash64", vec_col: str = "embedding",
             id_col: str = "vec_id", sig: DataFrame | None = None) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors: candidates are the
    vectors sharing the query's hyperplane band-bucket in ANY of
    ``bands`` bands (the same multi-band sketch the near-dup miner uses,
    dedup.band_buckets); only candidates pay the exact cosine, ranked to
    top-k.

    100 TB shape vs IVF: no training pass — the index is one scan of sign
    bits; the query probes ``bands`` buckets via a broadcast semi join on
    the (band, bucket) sketch frame, so the corpus vectors are touched
    only for the candidate set.  Recall follows the Indyk-Motwani band
    analysis (dedup.lsh_params picks (bits, bands) from a target cosine).
    """
    if sig is None:     # one-shot: build the sketch inline (``lsh_index``
        sig = lsh_index(emb, block_bits, bands, hash_fn, vec_col, id_col)
    qsig = (sig.filter(F.col(id_col) == query_vec_id)
            .select("__band", "__bucket"))
    cand = (sig.join(F.broadcast(qsig), ["__band", "__bucket"],
                     "left_semi")
            .filter(F.col(id_col) != query_vec_id)
            .select(id_col).distinct())
    q = emb.filter(F.col(id_col) == query_vec_id) \
        .select(F.col(vec_col).alias("__qv"))
    out = (
        cand.join(emb, id_col)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.col("label"),
                cosine_expr(F.col(vec_col), F.col("__qv")).alias("__c"))
    )
    return (out.orderBy(F.col("__c").desc(), F.col(id_col)).limit(k)
            .select(id_col, "label", F.round("__c", 6).alias("cosine")))


def pq_train(emb: DataFrame, m: int = 8, k: int = 16, iters: int = 0,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011) — the memory side
    of IVF-PQ, the canonical billion-vector ANN layout: the d-dim space is
    split into ``m`` subspaces and each gets its own ``k``-entry codebook,
    so a vector stores as m small codes (m bytes at k<=256) instead of d
    floats — a 32x memory cut that keeps the whole index RAM-resident.

    Init is deterministic (the first ``k`` vectors by id supply the seed
    subvectors — SQL-replayable), followed by ``iters`` Lloyd rounds per
    subspace.  Training shuffles only narrow (sub, code, pos, value) rows —
    never whole vectors; each round is one scan + one small agg, same shape
    as ``ivf_index``.

    Returns (sub, code, cv) with cv = the subspace centroid (length d/m).
    """
    dim = F.size(F.col(vec_col))
    seed = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("code"), F.col(vec_col).alias("v"), dim.alias("d"))
    subs = seed.select(
        "code", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"), "v", "d")
    cb = subs.select(
        "sub", "code",
        F.expr(f"slice(v, sub * (d div {m}) + 1, d div {m})").alias("cv"))
    # localize after every TRAINING round: a round's codebook plan
    # replays the whole encode+aggregate lineage once per broadcast
    # consumer (encode join, ADC lookup table, next round) — one bounded
    # collect per round truncates that.  The iters=0 seed is deliberately
    # NOT localized: it is a trivial pushed-down scan of the first k
    # vectors, and an extra collect job there measured as a pure ~1.5x
    # regression on the pq entries (r15 A/B).
    for _ in range(iters):
        enc = pq_encode(emb, cb, m=m, vec_col=vec_col, id_col=id_col)
        sv = (enc.join(emb.select(id_col, vec_col), id_col)
              .select("sub", "code",
                      F.posexplode(F.expr(
                          f"slice({vec_col}, sub * (size({vec_col}) div {m}) + 1,"
                          f" size({vec_col}) div {m})")).alias("pos", "val")))
        cb = (sv.groupBy("sub", "code", "pos")
              .agg(F.avg(F.col("val").cast("double")).alias("mv"))
              .groupBy("sub", "code")
              .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pm"))
              .select("sub", "code",
                      F.transform(F.col("pm"), lambda s: s["mv"].cast("float")).alias("cv")))
        _, cb = _localize_small(cb, ["sub", "code"])
    return cb


def pq_encode(emb: DataFrame, codebooks: DataFrame, m: int = 8,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign each vector's m subvectors to their nearest codebook entry.

    The codebook (m*k rows) broadcasts; the corpus side explodes to
    (id, sub, subvector) — m narrow rows per vector, NOT k*m — and min_by
    picks the code after a broadcast join.  The only shuffle is the
    (id, sub)-keyed exchange, and it runs BEFORE the k-way distance
    expansion: the groupBy would shuffle those keys anyway, so hoisting
    the repartition costs nothing extra while guaranteeing the expensive
    join+fold runs at full cluster width even when the corpus arrives in
    a handful of parquet files (a 1-file 100x replica previously pushed
    the whole 25M-row fold through one task).  Vectors themselves never
    reshuffle — only the (d/m)-wide subvector slices.  Returns
    (id, sub, code).
    """
    sv = emb.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"))
    sv = sv.select(
        id_col, "sub",
        F.expr(f"slice(v, sub * (size(v) div {m}) + 1, size(v) div {m})").alias("sv"))
    sv = sv.repartition(F.col(id_col), F.col("sub"))
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"),
                   lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0), lambda a, x: a + x)
    return (sv.join(F.broadcast(codebooks), "sub")
            .select(id_col, "sub", "code", d2.alias("__d2"))
            .groupBy(id_col, "sub")
            .agg(F.min(F.struct("__d2", "code"))["code"].alias("code")))


def pq_search(codes: DataFrame, codebooks: DataFrame, query_vec, k: int = 10,
              m: int = 8, id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query is split
    into the same m subvectors, a (sub, code) -> partial-d2 lookup table is
    computed from the broadcast codebook (m*k tiny rows), and each vector's
    approximate distance is the sum of m table lookups — no float vectors
    are read at query time at all.

    Returns (id, adc_d2) ascending.  Production composes this under an IVF
    coarse probe (ivf_search) so only nprobe buckets' codes are scanned.
    """
    qsub = [[float(x) for x in query_vec[s * (len(query_vec) // m):
                                         (s + 1) * (len(query_vec) // m)]]
            for s in range(m)]
    qlit = F.element_at(
        F.array(*[F.array(*[F.lit(x) for x in sv]) for sv in qsub]),
        F.col("sub") + 1)
    lut = codebooks.select(
        "sub", "code",
        F.aggregate(F.zip_with(F.col("cv"), qlit,
                               lambda x, y: (x.cast("double") - y) ** 2),
                    F.lit(0.0), lambda a, x: a + x).alias("pd2"))
    return (codes.join(F.broadcast(lut), ["sub", "code"])
            .groupBy(id_col)
            .agg(F.sum("pd2").alias("adc_d2"))
            .orderBy(F.col("adc_d2").asc(), F.col(id_col))
            .limit(k))


def ivfpq_search(assigned: DataFrame, codes: DataFrame, centroids: DataFrame,
                 codebooks: DataFrame, query_vec, k: int = 10, nprobe: int = 4,
                 m: int = 8, id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ composition — the billion-scale ANN query path: the IVF
    coarse index prunes the scan to ``nprobe`` buckets, then ADC scores
    only those buckets' PQ codes.  Both index sides are tiny broadcasts;
    the corpus-side work is a semi-join on the bucket id plus m lookup
    additions per surviving vector — no float vector is touched.

    With ``nprobe >= n_centroids`` this degrades to exact ADC over all
    codes (= ``pq_search``), which is the property the tests pin.
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.select(
            "cid",
            F.aggregate(F.zip_with(F.col("cv"), qlit,
                                   lambda x, y: (x.cast("double") - y) ** 2),
                        F.lit(0.0), lambda a, x: a + x).alias("d2"))
        .orderBy("d2").limit(nprobe))
    cand = assigned.join(F.broadcast(probe.select("cid")), "cid").select(id_col)
    return pq_search(codes.join(cand, id_col, "left_semi"), codebooks,
                     query_vec, k=k, m=m, id_col=id_col)


def ivfpq_index(emb: DataFrame, n_centroids: int = 8, m: int = 8, k: int = 16,
                coarse_iters: int = 2, pq_iters: int = 1,
                vec_col: str = "embedding", id_col: str = "vec_id",
                seed: int = 42):
    """Full residual IVF-PQ index (Jégou et al. 2011 §III): the PQ codebooks
    quantize the RESIDUAL ``v - centroid(v)``, not the raw vector — residual
    energy is much lower, so the same m*k codes carry far more precision.

    Returns (centroids, assigned, codebooks, codes) where ``codes`` carries
    the bucket id alongside each (id, sub, code) row, because ADC tables are
    per-bucket at query time.  All shuffles are the narrow ones of the
    underlying ``ivf_index``/``pq_train`` building blocks.
    """
    centroids, assigned = ivf_index(emb, n_centroids=n_centroids,
                                    iters=coarse_iters, vec_col=vec_col,
                                    id_col=id_col, seed=seed)
    resid = (assigned.join(F.broadcast(centroids), "cid")
             .select(id_col, "cid",
                     F.zip_with(F.col(vec_col), F.col("cv"),
                                lambda x, y: (x.cast("double") - y.cast("double"))
                                .cast("float")).alias(vec_col)))
    cb = pq_train(resid, m=m, k=k, iters=pq_iters,
                  vec_col=vec_col, id_col=id_col)
    codes = (pq_encode(resid, cb, m=m, vec_col=vec_col, id_col=id_col)
             .join(resid.select(id_col, "cid"), id_col))
    return centroids, assigned, cb, codes


def ivfpq_search_residual(centroids: DataFrame, codes: DataFrame,
                          codebooks: DataFrame, query_vec, k: int = 10,
                          nprobe: int = 4, m: int = 8,
                          id_col: str = "vec_id") -> DataFrame:
    """Residual-ADC query: for each probed bucket the lookup table is built
    from the QUERY RESIDUAL ``q - centroid`` (nprobe * m * k tiny rows, all
    broadcast); each candidate's distance is m additions.  Only the probed
    buckets' codes are scanned — the float corpus is never touched.
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    d = len(query_vec) // m
    probe = (centroids.select(
        "cid", "cv",
        F.aggregate(F.zip_with(F.col("cv"), qlit,
                               lambda x, y: (x.cast("double") - y) ** 2),
                    F.lit(0.0), lambda a, x: a + x).alias("__d2"))
        .orderBy("__d2").limit(nprobe)
        .select("cid", F.zip_with(qlit, F.col("cv"),
                                  lambda x, y: x - y.cast("double")).alias("qr")))
    lut = (codebooks.crossJoin(F.broadcast(probe))
           .select("cid", "sub", "code",
                   F.aggregate(
                       F.zip_with(F.col("cv"),
                                  F.expr(f"slice(qr, sub * {d} + 1, {d})"),
                                  lambda x, y: (x.cast("double") - y) ** 2),
                       F.lit(0.0), lambda a, x: a + x).alias("pd2")))
    return (codes.join(F.broadcast(lut), ["cid", "sub", "code"])
            .groupBy(id_col)
            .agg(F.sum("pd2").alias("adc_d2"))
            .orderBy(F.col("adc_d2").asc(), F.col(id_col))
            .limit(k))


def ivfpq_search_rerank(emb: DataFrame, query_vec, k: int = 10,
                        shortlist: int = 100, nprobe: int = 4, m: int = 8,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        assigned: DataFrame | None = None,
                        codes: DataFrame | None = None,
                        centroids: DataFrame | None = None,
                        codebooks: DataFrame | None = None,
                        residual: bool = False) -> DataFrame:
    """IVF-PQ with exact re-rank — the DOCUMENTED default read path for
    IVFPQ indexes (recall audit, COVERAGE.md): standalone IVFPQ at 32-bit
    codes is a filter tier (recall@10 ~0.39 at 100x, code-resolution
    floor), so production takes the ADC ``shortlist`` from the probed
    buckets and re-ranks ONLY those rows with exact cosine — recall@k
    becomes ADC's recall@shortlist (measured 1.0 at shortlist=10k at
    both sf0.1 and 100x) while vector fetches stay O(shortlist).
    Dup-dense caveat: on clustered corpora the ADC shortlist saturates
    near the duplicate-cluster size (see pq_search_rerank's sizing
    note and recall_r15.json) — prefer plain IVF + rerank there.

    ``residual=True`` shortlists through the residual-ADC path
    (ivfpq_index/ivfpq_search_residual; Jégou et al. 2011 §III) —
    ``codes`` must then carry the bucket id, and ``assigned`` is unused.
    Returns (id, cosine) like the exact searchers."""
    if residual:
        short = ivfpq_search_residual(
            centroids, codes, codebooks, query_vec, k=shortlist,
            nprobe=nprobe, m=m, id_col=id_col).select(id_col)
    else:
        short = ivfpq_search(
            assigned, codes, centroids, codebooks, query_vec, k=shortlist,
            nprobe=nprobe, m=m, id_col=id_col).select(id_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (emb.join(F.broadcast(short), id_col)
            .select(F.col(id_col),
                    cosine_expr(F.col(vec_col), qlit).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col(id_col)).limit(k)
            .select(id_col, F.round("__c", 6).alias("cosine")))
