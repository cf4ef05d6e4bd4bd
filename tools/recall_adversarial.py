"""Adversarial ANN recall audit (r14 verdict #7).

The uniform-ish sf fixtures read recall@10 = 1.0 for EVERY method
(recall_100x.json) — a fixture too easy to rank methods.  This builds a
CLUSTERED corpus designed to stress the approximate paths:

  * Zipf cluster sizes (a few huge clusters, a long tail) — coarse
    k-means centroids concentrate in the head, so tail queries lose
    their true neighbors unless nprobe grows;
  * within-cluster noise calibrated to the near-dup threshold
    (eps=0.05 at dim 64 -> member-to-member cosine ~0.86-0.93), so the
    true top-10 sits in a dense shell where 32-bit PQ codes collide.

Published curves (recall_r15.json):
  * ivf:  recall@10 vs nprobe (batch probe-join, production shape)
  * ivfpq: recall@10 vs nprobe (ADC over coarse buckets)
  * pq:   exhaustive ADC floor, then pq_search_rerank vs shortlist —
    measuring the claim in similarity.py:352's docstring (rerank
    recovers the code-resolution floor) instead of believing it.

Usage:
    python tools/recall_adversarial.py [--n 100000] [--dim 64]
        [--clusters 400] [--queries 16] [--json recall_r15.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402


def make_fixture(spark, n_vec, dim, n_clusters, zipf_s=1.1, eps=0.05,
                 seed=17):
    """Clustered unit vectors: cluster of row i drawn from a Zipf
    cumulative via a per-id deterministic RNG, member = unit(center +
    eps * gauss).  Deterministic per (seed, id) — regeneration is
    reproducible across runs and partitionings."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = 1.0 / np.arange(1, n_clusters + 1) ** zipf_s
    bounds = np.cumsum(w) / w.sum()
    bc = spark.sparkContext.broadcast((centers, bounds))

    def gen(batches):
        import pandas as pd
        C, B = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs, cl = [], []
            for i in ids:
                g = np.random.default_rng((seed << 24) + int(i))
                c = int(np.searchsorted(B, g.random()))
                v = C[c] + eps * g.standard_normal(dim)
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
                cl.append(c)
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs,
                                "cluster": cl})

    return (spark.range(n_vec).repartition(32)
            .mapInPandas(gen, "vec_id long, embedding array<float>, "
                              "cluster int"))


def main():
    from neo_server_spark.datapipe import similarity as sim
    from neo_server_spark.session import get_spark

    args = sys.argv[1:]

    def opt(name, default, cast):
        if name in args:
            i = args.index(name)
            v = cast(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    n_vec = opt("--n", 100_000, int)
    dim = opt("--dim", 64, int)
    n_clusters = opt("--clusters", 400, int)
    n_q = opt("--queries", 16, int)
    json_out = opt("--json", "recall_r15.json", str)

    spark = get_spark(app_name="recall-adversarial")
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_fixture(spark, n_vec, dim, n_clusters).persist()
    n = emb.count()
    # cluster-size profile: document how adversarial the fixture is
    prof = (emb.groupBy("cluster").count()
            .agg(F.max("count").alias("mx"),
                 F.expr("percentile(count, 0.5)").alias("med"),
                 F.count(F.lit(1)).alias("nc")).first())
    print(f"fixture: {n} vecs dim={dim}, {prof['nc']} clusters, "
          f"max={prof['mx']} median={prof['med']:.0f} (Zipf)")

    # deterministic query sample: hash order mixes head + tail clusters
    qids = [r["vec_id"] for r in
            emb.select("vec_id")
            .orderBy(F.pmod(F.xxhash64("vec_id", F.lit(7)),
                            F.lit(2 ** 31))).limit(n_q).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids))
    qvecs = {r["vec_id"]: list(r["embedding"])
             for r in queries.collect()}
    k = 10

    t0 = time.time()
    exact = {}
    for r in sim.topk_join(emb, queries, k=k).collect():
        exact.setdefault(r["query_id"], []).append(r["vec_id"])
    t_exact = time.time() - t0
    print(f"exact ground truth: {t_exact:.1f}s")

    report = {"n_vec": n, "dim": dim, "n_clusters": n_clusters,
              "zipf_max": int(prof["mx"]),
              "zipf_median": float(prof["med"]),
              "k": k, "n_queries": n_q,
              "exact_sec": round(t_exact, 1)}

    def recall_of(hits):
        return float(np.mean([
            len(set(hits.get(q, [])) & set(exact[q])) / float(k)
            for q in qids]))

    # ---- IVF: recall vs nprobe (batch probe-join) ------------------
    n_cent = max(8, min(256, int(n ** 0.5 / 2)))
    t0 = time.time()
    centroids, assigned = sim.ivf_index(emb, n_centroids=n_cent,
                                        iters=3)
    assigned = assigned.persist()
    centroids = centroids.persist()
    assigned.count()
    t_ivf = time.time() - t0
    report["ivf"] = {"n_centroids": n_cent,
                     "index_sec": round(t_ivf, 1), "curve": {}}
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.time()
        hits = {}
        for r in sim.ivf_topk_join(assigned, centroids, queries, k=k,
                                   nprobe=nprobe).collect():
            hits.setdefault(r["query_id"], []).append(r["vec_id"])
        rec = recall_of(hits)
        report["ivf"]["curve"][str(nprobe)] = {
            "recall": round(rec, 3),
            "sec": round(time.time() - t0, 1)}
        print(f"| ivf nprobe={nprobe:2d}/{n_cent} "
              f"| recall@10 {rec:.3f} |")

    # ---- PQ: exhaustive-ADC floor, then rerank vs shortlist --------
    t0 = time.time()
    cb = sim.pq_train(emb, m=8, k=16, iters=3).persist()
    codes = sim.pq_encode(emb, cb).persist()
    codes.count()
    t_pq = time.time() - t0
    hits = {q: [r["vec_id"] for r in
                sim.pq_search(codes.filter(F.col("vec_id") != q), cb,
                              qvecs[q], k=k).collect()]
            for q in qids}
    adc_floor = recall_of(hits)
    report["pq"] = {"m": 8, "codebook_k": 16,
                    "index_sec": round(t_pq, 1),
                    "adc_floor_recall": round(adc_floor, 3),
                    "rerank_curve": {}}
    print(f"| pq ADC floor | recall@10 {adc_floor:.3f} |")
    for shortlist in (10, 30, 100, 300, 1000):
        t0 = time.time()
        hits = {q: [r["vec_id"] for r in
                    sim.pq_search_rerank(
                        codes.filter(F.col("vec_id") != q), cb,
                        emb.filter(F.col("vec_id") != q), qvecs[q],
                        k=k, shortlist=shortlist).collect()]
                for q in qids}
        rec = recall_of(hits)
        report["pq"]["rerank_curve"][str(shortlist)] = {
            "recall": round(rec, 3),
            "sec": round(time.time() - t0, 1)}
        print(f"| pq_rerank shortlist={shortlist:3d} "
              f"| recall@10 {rec:.3f} |")

    # ---- IVF-PQ: recall vs nprobe ----------------------------------
    report["ivfpq"] = {"curve": {}}
    for nprobe in (1, 4, 16):
        t0 = time.time()
        hits = {q: [r["vec_id"] for r in
                    sim.ivfpq_search(
                        assigned.filter(F.col("vec_id") != q),
                        codes.filter(F.col("vec_id") != q),
                        centroids, cb, qvecs[q], k=k,
                        nprobe=nprobe).collect()]
                for q in qids}
        rec = recall_of(hits)
        report["ivfpq"]["curve"][str(nprobe)] = {
            "recall": round(rec, 3),
            "sec": round(time.time() - t0, 1)}
        print(f"| ivfpq nprobe={nprobe:2d}/{n_cent} "
              f"| recall@10 {rec:.3f} |")

    # ---- IVF-PQ + rerank: the full production path under pressure --
    report["ivfpq_rerank"] = {"curve": {}}
    for shortlist in (30, 100):
        t0 = time.time()
        hits = {q: [r["vec_id"] for r in
                    sim.ivfpq_search_rerank(
                        emb.filter(F.col("vec_id") != q), qvecs[q],
                        k=k, shortlist=shortlist,
                        nprobe=max(1, n_cent // 4),
                        assigned=assigned.filter(F.col("vec_id") != q),
                        codes=codes.filter(F.col("vec_id") != q),
                        centroids=centroids, codebooks=cb).collect()]
                for q in qids}
        rec = recall_of(hits)
        report["ivfpq_rerank"]["curve"][str(shortlist)] = {
            "recall": round(rec, 3),
            "sec": round(time.time() - t0, 1)}
        print(f"| ivfpq_rerank shortlist={shortlist:3d} "
              f"(nprobe={max(1, n_cent // 4)}) "
              f"| recall@10 {rec:.3f} |")

    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {json_out}")
    spark.stop()


if __name__ == "__main__":
    main()
