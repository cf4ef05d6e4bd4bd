"""Recall audit for the approximate ANN/LSH family (r9 VERDICT #3).

Correctness oracles pin exact equality at sf0.01; this tool measures the
approximate operators' QUALITY — recall against exact ground truth — at
scales where bucket occupancy actually changes (sf0.1 and the salted 100x
replica):

  * recall@10 for similarity_lsh / similarity_ivf / similarity_pq /
    ivfpq against brute-force cosine top-10, averaged over a
    deterministic query sample;
  * pair-recall for minhash_lsh_pairs / simhash_hamming_pairs /
    embedding_dupes against exact ground truth restricted to a
    deterministic probe sample (exact Jaccard via the same xxhash64
    shingle digests, exact Hamming via bit_count(xor), exact cosine via
    a probe-matrix matmul kernel) — the restriction keeps ground truth
    linear in the corpus while the operator still runs corpus-wide.

Usage:
    python tools/recall_audit.py [sf_dir] [--queries N] [--probes N]
        [--json out.json] [--sections topk,minhash,simhash,embdup]

Prints one markdown table row per measurement (for COVERAGE.md) plus a
JSON blob.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402


def sample_ids(df, id_col, n, seed=7):
    """Deterministic pseudo-random sample of ids (hash order)."""
    return [r[id_col] for r in
            df.select(id_col)
            .orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                            F.lit(2**31)))
            .limit(n).collect()]


def topk_recall(spark, emb, qids, k=10):
    """recall@k per ANN method vs brute-force cosine top-k."""
    from neo_server_spark.datapipe import similarity as sim

    n_vec = emb.count()
    queries = emb.filter(F.col("vec_id").isin(qids))
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in queries.collect()}

    t0 = time.time()
    exact = {}
    for r in sim.topk_join(emb, queries, k=k).collect():
        exact.setdefault(r["query_id"], []).append(r["vec_id"])
    t_exact = time.time() - t0

    out = {"n_vec": n_vec, "k": k, "n_queries": len(qids),
           "exact_sec": round(t_exact, 1), "methods": {}}

    def score(name, fn, note, index_sec=0.0):
        t0 = time.time()
        hits = {qid: [r["vec_id"] for r in fn(qid).collect()]
                for qid in qids}
        rec = float(np.mean([
            len(set(hits[q]) & set(exact[q])) / float(k) for q in qids]))
        out["methods"][name] = {
            "recall_at_k": round(rec, 3),
            "query_sec_total": round(time.time() - t0, 1),
            "index_sec": round(index_sec, 1), "note": note}
        print(f"| {name} | recall@{k} {rec:.3f} | {note} |")

    # --- hyperplane LSH, entry config and the lsh_params-derived config
    from neo_server_spark.datapipe.dedup import lsh_params
    for label, (bits, bands) in (
            ("lsh(3,12)", (3, 12)),
            ("lsh_params(0.7)", lsh_params(0.7)),
            ("lsh_params(0.5)", lsh_params(0.5))):
        t0 = time.time()
        sig = sim.lsh_index(emb, block_bits=bits, bands=bands) \
            .persist()
        sig.count()
        ts = time.time() - t0
        score(label,
              lambda q, s=sig, b=bits, bd=bands: sim.lsh_topk(
                  emb, q, k=k, block_bits=b, bands=bd, sig=s),
              f"bits={bits} bands={bands}", index_sec=ts)
        sig.unpersist()

    # --- IVF coarse index, nprobe sweep
    n_cent = max(8, min(256, int(n_vec ** 0.5 / 2)))
    t0 = time.time()
    centroids, assigned = sim.ivf_index(emb, n_centroids=n_cent, iters=2)
    assigned = assigned.persist()
    centroids = centroids.persist()
    assigned.count()
    t_ivf = time.time() - t0
    for nprobe in sorted({1, max(1, n_cent // 16), max(1, n_cent // 4)}):
        score(f"ivf(nprobe={nprobe})",
              lambda q, np_=nprobe: sim.ivf_search(
                  assigned.filter(F.col("vec_id") != q), centroids,
                  qvecs[q], k=k, nprobe=np_),
              f"n_centroids={n_cent}", index_sec=t_ivf)

    # --- PQ (exhaustive ADC) and IVF-PQ
    t0 = time.time()
    cb = sim.pq_train(emb, m=8, k=16, iters=0).persist()
    codes = sim.pq_encode(emb, cb).persist()
    codes.count()
    t_pq = time.time() - t0
    score("pq(m=8,k=16)",
          lambda q: sim.pq_search(
              codes.filter(F.col("vec_id") != q), cb, qvecs[q], k=k),
          "exhaustive ADC, iters=0 (entry config)", index_sec=t_pq)
    # trained codebooks: iters=0 is the SQL-certifiable entry config;
    # production trains the sub-space k-means
    t0 = time.time()
    cb2 = sim.pq_train(emb, m=8, k=16, iters=3).persist()
    codes2 = sim.pq_encode(emb, cb2).persist()
    codes2.count()
    t_pq2 = time.time() - t0
    score("pq(m=8,k=16,iters=3)",
          lambda q: sim.pq_search(
              codes2.filter(F.col("vec_id") != q), cb2, qvecs[q], k=k),
          "exhaustive ADC, trained", index_sec=t_pq2)
    cb2.unpersist(); codes2.unpersist()
    # two-stage PQ: ADC shortlist (10x k) -> exact re-rank of the
    # shortlist only (the production read path; measures how much of the
    # code-resolution floor the rerank recovers)
    score("pq_rerank(shortlist=100)",
          lambda q: sim.pq_search_rerank(
              codes.filter(F.col("vec_id") != q), cb,
              emb.filter(F.col("vec_id") != q), qvecs[q], k=k,
              shortlist=10 * k),
          "ADC shortlist + exact rerank", index_sec=t_pq)
    # batch IVF: all queries in ONE probe-frame join (vs per-query jobs)
    t0 = time.time()
    hits = {}
    for r in sim.ivf_topk_join(
            assigned, centroids, queries, k=k,
            nprobe=max(1, n_cent // 4)).collect():
        hits.setdefault(r["query_id"], []).append(r["vec_id"])
    rec = float(np.mean([
        len(set(hits.get(q, [])) & set(exact[q])) / float(k)
        for q in qids]))
    out["methods"]["ivf_topk_join(nprobe=n/4)"] = {
        "recall_at_k": round(rec, 3),
        "query_sec_total": round(time.time() - t0, 1),
        "index_sec": round(t_ivf, 1),
        "note": f"ALL {len(qids)} queries in one job"}
    print(f"| ivf_topk_join | recall@{k} {rec:.3f} | one batch job, "
          f"{time.time() - t0:.1f}s total |")
    for nprobe in sorted({max(1, n_cent // 16), max(1, n_cent // 4)}):
        score(f"ivfpq(nprobe={nprobe})",
              lambda q, np_=nprobe: sim.ivfpq_search(
                  assigned.filter(F.col("vec_id") != q),
                  codes.filter(F.col("vec_id") != q),
                  centroids, cb, qvecs[q], k=k, nprobe=np_),
              f"n_centroids={n_cent}", index_sec=t_ivf + t_pq)
    for df in (assigned, centroids, cb, codes):
        df.unpersist()
    return out


def residual_recall(spark, emb, qids, k=10):
    """recall@k for the residual IVF-PQ family (r10 VERDICT #3/#4: the
    residual path's claimed precision benefit was unmeasured) plus the
    rerank-over-IVFPQ read paths — self-contained: builds its own
    ground truth and indexes."""
    from neo_server_spark.datapipe import similarity as sim

    n_vec = emb.count()
    queries = emb.filter(F.col("vec_id").isin(qids))
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in queries.collect()}

    t0 = time.time()
    exact = {}
    for r in sim.topk_join(emb, queries, k=k).collect():
        exact.setdefault(r["query_id"], []).append(r["vec_id"])
    t_exact = time.time() - t0
    out = {"n_vec": n_vec, "k": k, "n_queries": len(qids),
           "exact_sec": round(t_exact, 1), "methods": {}}

    def score(name, fn, note, index_sec=0.0):
        t0 = time.time()
        hits = {qid: [r["vec_id"] for r in fn(qid).collect()]
                for qid in qids}
        rec = float(np.mean([
            len(set(hits[q]) & set(exact[q])) / float(k) for q in qids]))
        out["methods"][name] = {
            "recall_at_k": round(rec, 3),
            "query_sec_total": round(time.time() - t0, 1),
            "index_sec": round(index_sec, 1), "note": note}
        print(f"| {name} | recall@{k} {rec:.3f} | {note} |")

    n_cent = max(8, min(256, int(n_vec ** 0.5 / 2)))
    # residual index (Jégou §III: PQ over v - centroid(v))
    t0 = time.time()
    rc, ra, rcb, rcodes = sim.ivfpq_index(
        emb, n_centroids=n_cent, m=8, k=16, coarse_iters=2, pq_iters=1)
    rc, rcb, rcodes = rc.persist(), rcb.persist(), rcodes.persist()
    rcodes.count()
    t_ridx = time.time() - t0
    for nprobe in sorted({max(1, n_cent // 16), max(1, n_cent // 4)}):
        score(f"ivfpq_residual(nprobe={nprobe})",
              lambda q, np_=nprobe: sim.ivfpq_search_residual(
                  rc, rcodes.filter(F.col("vec_id") != q), rcb,
                  qvecs[q], k=k, nprobe=np_),
              f"n_centroids={n_cent} m=8 k=16 residual codes",
              index_sec=t_ridx)
    score("ivfpq_residual_rerank(shortlist=100)",
          lambda q: sim.ivfpq_search_rerank(
              emb.filter(F.col("vec_id") != q), qvecs[q], k=k,
              shortlist=10 * k, nprobe=max(1, n_cent // 4),
              codes=rcodes.filter(F.col("vec_id") != q),
              centroids=rc, codebooks=rcb, residual=True),
          "residual-ADC shortlist -> exact rerank", index_sec=t_ridx)
    # raw (non-residual) IVFPQ + rerank, same budget, for the comparison
    t0 = time.time()
    centroids, assigned = sim.ivf_index(emb, n_centroids=n_cent, iters=2)
    cb = sim.pq_train(emb, m=8, k=16, iters=1)
    codes = sim.pq_encode(emb, cb)
    assigned, centroids = assigned.persist(), centroids.persist()
    cb, codes = cb.persist(), codes.persist()
    codes.count()
    t_idx = time.time() - t0
    score("ivfpq_rerank(shortlist=100)",
          lambda q: sim.ivfpq_search_rerank(
              emb.filter(F.col("vec_id") != q), qvecs[q], k=k,
              shortlist=10 * k, nprobe=max(1, n_cent // 4),
              assigned=assigned.filter(F.col("vec_id") != q),
              codes=codes.filter(F.col("vec_id") != q),
              centroids=centroids, codebooks=cb),
          "raw-ADC shortlist -> exact rerank", index_sec=t_idx)
    for df in (rc, rcb, rcodes, assigned, centroids, cb, codes):
        df.unpersist()
    _ = ra
    return out


def _digest_frame(docs, shingle_n=3):
    from neo_server_spark.datapipe.text import shingles
    dig = F.array_distinct(F.transform(shingles("text", shingle_n),
                                       lambda s: F.xxhash64(s)))
    return docs.select("doc_id", dig.alias("dig")) \
        .withColumn("nd", F.size("dig"))


def minhash_pair_recall(spark, docs, probe_ids, threshold, num_hashes,
                        bands, label):
    """Pair-recall of minhash_lsh_pairs at (num_hashes, bands) vs exact
    shingle-digest Jaccard, restricted to pairs touching the probes."""
    from neo_server_spark.datapipe import dedup

    base = _digest_frame(docs).persist()
    probe = base.filter(F.col("doc_id").isin(probe_ids)) \
        .select(F.col("doc_id").alias("pid"), F.col("dig").alias("pdig"),
                F.col("nd").alias("pnd"))
    pex = probe.select("pid", "pnd", F.explode("pdig").alias("d"))
    cex = base.select("doc_id", "nd", F.explode("dig").alias("d"))
    inter = (cex.join(F.broadcast(pex), "d")
             .filter(F.col("doc_id") != F.col("pid"))
             .groupBy("pid", "doc_id", "pnd", "nd")
             .agg(F.count(F.lit(1)).alias("i")))
    true_pairs = {
        (min(r["pid"], r["doc_id"]), max(r["pid"], r["doc_id"]))
        for r in inter.filter(
            F.col("i") / (F.col("pnd") + F.col("nd") - F.col("i"))
            >= threshold).collect()}
    t0 = time.time()
    found = dedup.minhash_lsh_pairs(docs, num_hashes=num_hashes,
                                    bands=bands,
                                    jaccard_threshold=threshold)
    pset = set(probe_ids)
    found_pairs = {(r["id_a"], r["id_b"]) for r in
                   found.filter(F.col("id_a").isin(probe_ids)
                                | F.col("id_b").isin(probe_ids)).collect()}
    wall = time.time() - t0
    base.unpersist()
    n_true = len(true_pairs)
    hit = len(true_pairs & found_pairs)
    rec = hit / n_true if n_true else None
    rep = {"label": label, "threshold": threshold,
           "num_hashes": num_hashes, "bands": bands, "n_true": n_true,
           "n_found_probe_side": len(found_pairs),
           "recall": None if rec is None else round(rec, 3),
           "wall_sec": round(wall, 1)}
    print(f"| minhash {label} | t={threshold} (n={num_hashes},b={bands}) "
          f"| true={n_true} recall="
          f"{'n/a' if rec is None else f'{rec:.3f}'} "
          f"| {wall:.0f}s corpus-wide |")
    _ = pset
    return rep


def simhash_pair_recall(spark, docs, probe_ids, max_dist=3):
    """Pair-recall of simhash_hamming_pairs vs exact Hamming<=max_dist
    (probes x corpus, bit_count(xor) JVM-side)."""
    from neo_server_spark.datapipe import dedup

    sh = dedup.simhash(docs.select("doc_id", "text"), "text").persist()
    probe = sh.filter(F.col("doc_id").isin(probe_ids)) \
        .select(F.col("doc_id").alias("pid"), F.col("simhash").alias("ps"))
    exact = (sh.crossJoin(F.broadcast(probe))
             .filter(F.col("doc_id") != F.col("pid"))
             .filter(F.bit_count(F.col("simhash").bitwiseXOR(F.col("ps")))
                     <= max_dist)
             .select("pid", "doc_id").collect())
    true_pairs = {(min(r["pid"], r["doc_id"]), max(r["pid"], r["doc_id"]))
                  for r in exact}
    t0 = time.time()
    found = dedup.simhash_hamming_pairs(docs, max_dist=max_dist)
    found_pairs = {(r["id_a"], r["id_b"]) for r in
                   found.filter(F.col("id_a").isin(probe_ids)
                                | F.col("id_b").isin(probe_ids)).collect()}
    wall = time.time() - t0
    sh.unpersist()
    n_true = len(true_pairs)
    rec = len(true_pairs & found_pairs) / n_true if n_true else None
    rep = {"max_dist": max_dist, "n_true": n_true,
           "recall": None if rec is None else round(rec, 3),
           "wall_sec": round(wall, 1)}
    print(f"| simhash d<={max_dist} | true={n_true} recall="
          f"{'n/a' if rec is None else f'{rec:.3f}'} "
          f"| {wall:.0f}s corpus-wide |")
    return rep


def embdup_pair_recall(spark, emb, probe_ids, threshold=0.95):
    """Pair-recall of embedding_dupes vs exact cosine>=threshold for the
    probe rows (numpy probe-matrix matmul over Arrow batches)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from neo_server_spark.datapipe import dedup

    probes = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
              for r in emb.filter(F.col("vec_id").isin(probe_ids))
              .collect()}
    pids = np.array(sorted(probes), dtype=np.int64)
    P = np.stack([probes[i] for i in pids])
    P = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)

    schema = StructType([StructField("pid", LongType()),
                         StructField("vec_id", LongType())])

    def kern(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["embedding"]])
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                               1e-12)
            sim = M @ P.T
            bi, pj = np.nonzero(sim >= threshold)
            keep = ids[bi] != pids[pj]
            yield pd.DataFrame({"pid": pids[pj][keep],
                                "vec_id": ids[bi][keep]})

    exact = emb.select("vec_id", "embedding").mapInPandas(kern, schema) \
        .collect()
    true_pairs = {(min(r["pid"], r["vec_id"]), max(r["pid"], r["vec_id"]))
                  for r in exact}
    t0 = time.time()
    found = dedup.embedding_dupes(emb, threshold=threshold)
    found_pairs = {(r["id_a"], r["id_b"]) for r in
                   found.filter(F.col("id_a").isin(probe_ids)
                                | F.col("id_b").isin(probe_ids)).collect()}
    wall = time.time() - t0
    n_true = len(true_pairs)
    rec = len(true_pairs & found_pairs) / n_true if n_true else None
    rep = {"threshold": threshold, "n_true": n_true,
           "recall": None if rec is None else round(rec, 3),
           "wall_sec": round(wall, 1)}
    print(f"| embedding_dupes t={threshold} | true={n_true} recall="
          f"{'n/a' if rec is None else f'{rec:.3f}'} "
          f"| {wall:.0f}s corpus-wide |")
    return rep


def main():
    from neo_server_spark import io as nio
    from neo_server_spark.datapipe.dedup import minhash_params
    from neo_server_spark.session import get_spark

    args = sys.argv[1:]
    json_out = None
    n_q, n_p = 24, 200
    secs = {"topk", "minhash", "simhash", "embdup"}
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--queries" in args:
        i = args.index("--queries"); n_q = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--probes" in args:
        i = args.index("--probes"); n_p = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--sections" in args:
        i = args.index("--sections")
        secs = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark(app_name="recall-audit")
    spark.sparkContext.setLogLevel("ERROR")
    emb = nio.load_table(spark, sf_dir, "embeddings")
    docs = nio.load_table(spark, sf_dir, "documents").select("doc_id",
                                                             "text")
    report = {"sf_dir": sf_dir}

    if "topk" in secs:
        qids = sample_ids(emb, "vec_id", n_q)
        print(f"\n### top-k recall ({sf_dir}, {n_q} queries)")
        report["topk"] = topk_recall(spark, emb, qids)
    if "resid" in secs:
        qids = sample_ids(emb, "vec_id", n_q)
        print(f"\n### residual IVF-PQ recall ({sf_dir}, {n_q} queries)")
        report["resid"] = residual_recall(spark, emb, qids)
    if {"minhash", "simhash"} & secs:
        dprobes = sample_ids(docs, "doc_id", n_p)
    if "minhash" in secs:
        print(f"\n### minhash pair recall ({n_p} probes)")
        report["minhash"] = []
        for thr in (0.7, 0.5):
            nh, b = minhash_params(thr)
            report["minhash"].append(minhash_pair_recall(
                spark, docs, dprobes, thr, nh, b,
                f"minhash_params({thr})"))
        # the historical default schedule at the production threshold
        report["minhash"].append(minhash_pair_recall(
            spark, docs, dprobes, 0.7, 64, 16, "default(64,16)"))
    if "simhash" in secs:
        print(f"\n### simhash pair recall ({n_p} probes)")
        report["simhash"] = simhash_pair_recall(spark, docs, dprobes)
    if "embdup" in secs:
        vprobes = sample_ids(emb, "vec_id", n_p, seed=11)
        print(f"\n### embedding near-dup pair recall ({n_p} probes)")
        report["embdup"] = [embdup_pair_recall(spark, emb, vprobes, t)
                            for t in (0.95, 0.8)]
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"\nwrote {json_out}")
    spark.stop()


if __name__ == "__main__":
    main()
