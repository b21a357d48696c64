"""Embedding-ANN soak: 1M x 768 vectors through the IVF path — the
embedding axis of the round-7 decade sweeps (url seen-set 100M, image
phash 10M, embeddings 1M x 768 = ~3 GB of vector payload).

Scaled semantics: similarity.build_ivf_centroids (Lloyd steps as
DataFrame jobs, dim-independent plan width) + with_ivf_cluster (numpy
matmul Arrow UDF at 64x768 = 49k terms, far past the expression budget)
+ ivf_topk over a STORED cluster column vs global brute_force_topk.

Exact gates (no tolerance):
1. **Partition invariance** of the matmul assignment UDF: the stored
   cluster column's digest must be identical when computed over 8 vs 64
   input partitions (Arrow batch boundaries move; results must not).
2. **Stored vs fresh parity**: ivf_topk probing the stored column must
   return digest-identical rows to ivf_topk assigning at query time.
3. Determinism: result digest stable across runs (same seeds).

Reported (quality, not gated): global recall@10 of IVF n_probe=8/64 vs
exact brute force per query + mean — with the clustered generator this
sits near 1.0 and measures probe coverage, not correctness.

Usage: PYTHONPATH=/root/repo python tools/soak_ann.py [--n 1000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

DIM = 768
N_CLUSTERS_TRUE = 64  # generator structure
N_CENTROIDS = 64
N_PROBE = 8


def vec_table(spark, n: int, parts: int = 64, id_offset: int = 0):
    """(vec_id, embedding): deterministic clustered vectors. Row i belongs
    to latent cluster i % 64; embedding = 3*center + noise, both derived
    from splitmix64 streams (vectorized numpy, row-deterministic under ANY
    partitioning)."""
    from pyspark.sql import functions as F

    def gen(it):
        import numpy as np
        import pandas as pd

        M = np.uint64(0xFFFFFFFFFFFFFFFF)

        def splitmix(x):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & M
            z = x
            z = ((z ^ (z >> np.uint64(30))) * np.uint64(
                0xBF58476D1CE4E5B9)) & M
            z = ((z ^ (z >> np.uint64(27))) * np.uint64(
                0x94D049BB133111EB)) & M
            return z ^ (z >> np.uint64(31))

        d_idx = np.arange(DIM, dtype=np.uint64)[None, :]

        def unit_noise(keys):  # (rows, DIM) in [-1, 1)
            h = splitmix(keys[:, None] * np.uint64(DIM + 1) + d_idx)
            return (h >> np.uint64(11)).astype(np.float64) / float(
                1 << 53) * 2.0 - 1.0

        for pdf in it:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cid = (ids % N_CLUSTERS_TRUE).astype(np.uint64)
            center = unit_noise(cid + np.uint64(1_000_000_007))
            noise = unit_noise(ids.astype(np.uint64))
            emb = 3.0 * center + noise
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in
                                              np.round(emb, 6)]})

    base = spark.range(id_offset, id_offset + n, 1, parts).select(
        F.col("id").alias("vec_id"))
    return base.mapInPandas(gen, "vec_id long, embedding array<double>")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from archive_query_log_spark.operators import similarity as S
    from archive_query_log_spark.session import get_spark
    from tools.submit_crawl import table_digest

    rec: dict = {"n": args.n, "dim": DIM, "n_centroids": N_CENTROIDS,
                 "n_probe": N_PROBE, "master": args.master, "stages": {}}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        rec["stages"][name] = round(time.perf_counter() - t0, 1)
        print(f"[soak] {name}: {rec['stages'][name]}s", file=sys.stderr)
        return out

    spark = get_spark(app_name="soak-ann", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    vecs = timed("mint_1M_vectors",
                 lambda: vec_table(spark, args.n).localCheckpoint())

    centroids = timed("build_ivf_centroids_2_lloyd", lambda: (
        S.build_ivf_centroids(vecs, DIM, N_CENTROIDS, n_iter=2)))

    # gate 1: assignment partition-invariance (Arrow batch boundaries move)
    def assign_digest(parts):
        df = S.with_ivf_cluster(
            vecs.repartition(parts, "vec_id"), centroids, out_col="ivf")
        return table_digest(df.select("vec_id", "ivf"), ["vec_id", "ivf"])
    d8 = timed("assign_1M_8parts", lambda: assign_digest(8))
    d64 = timed("assign_1M_64parts", lambda: assign_digest(64))
    rec["assign_digest_8p"] = d8
    rec["assign_digest_64p"] = d64
    assert d8 == d64, "assignment is partition-dependent"

    stored = timed("store_cluster_col", lambda: S.with_ivf_cluster(
        vecs, centroids, out_col="ivf").localCheckpoint())

    # queries: fresh vectors from the same generator (held-out ids)
    qrows = vec_table(spark, args.queries, 1, id_offset=args.n).collect()
    recalls, ivf_all, lat_ivf, lat_bf = [], [], [], []
    for r in qrows:
        qv = list(r["embedding"])
        t0 = time.perf_counter()
        ivf = S.ivf_topk(stored, qv, DIM, k=10, n_probe=N_PROBE,
                         centroids=centroids, cluster_col="ivf").collect()
        lat_ivf.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        bf = S.brute_force_topk(vecs, qv, k=10).collect()
        lat_bf.append(round(time.perf_counter() - t0, 2))
        got = {x["vec_id"] for x in ivf}
        recalls.append(len(got & {x["vec_id"] for x in bf}) / 10.0)
        ivf_all.append((int(r["vec_id"]),
                        [(int(x["vec_id"]), float(x["cos_sim"]))
                         for x in ivf]))
        # gate 2 on the first 3 queries: stored-column vs query-time
        # assignment must be digest-identical rows
        if len(recalls) <= 3:
            fresh = S.ivf_topk(vecs, qv, DIM, k=10, n_probe=N_PROBE,
                               centroids=centroids).collect()
            assert [(x["vec_id"], x["cos_sim"]) for x in fresh] == [
                (x["vec_id"], x["cos_sim"]) for x in ivf
            ], f"stored vs fresh mismatch on query {r['vec_id']}"
    rec["stages"]["ivf_query_sec_each"] = lat_ivf
    rec["stages"]["brute_force_sec_each"] = lat_bf
    rec["recall_at_10"] = recalls
    rec["recall_at_10_mean"] = round(sum(recalls) / len(recalls), 3)
    rec["stored_vs_fresh_first3"] = "identical"

    import hashlib
    rec["ivf_results_digest"] = hashlib.md5(
        json.dumps(ivf_all, sort_keys=True).encode()).hexdigest()

    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
