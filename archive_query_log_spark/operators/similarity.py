"""Similarity search over embedding columns (brief requirement).

- brute-force cosine top-k: JVM-side dot product via zip_with + aggregate
  (no Python in the hot path) against a broadcast query vector.
- LSH-bucketed ANN (scale path): random-hyperplane signatures — the query
  probes only its bucket(s), turning O(N) scans into O(N/2^bits) per probe.
  Hyperplanes are derived deterministically (md5 of (plane, dim)) so results
  are reproducible and oracle-checkable without shipping matrices.
- embedding-cosine near-dup: pairs within the same LSH bucket above a cosine
  threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Plan: one scan + map-side partial top-k (Spark's TakeOrderedAndProject) —
    no shuffle of the embedding column itself.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived, reproducible anywhere (incl. the DuckDB oracle)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("hp"), F.lit(plane), F.lit(dim))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(2147483648.0) - F.lit(1.0)


def lsh_signature(
    vec: Column, dim: int, n_planes: int = 8
) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) as a long."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec, d + 1).cast("double") * _hyperplane(p, d)
            proj = term if proj is None else proj + term
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + F.shiftleft(bit, p)
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only rows in the query's LSH bucket (plus exact rerank).

    At 100 TB the signature is a stored, bucketed column (write-time cost);
    probing is a partition-pruned scan of one bucket.
    """
    import numpy as np

    def py_hyperplane(plane: int, d: int) -> float:
        import hashlib

        h = int(hashlib.md5(f"hp:{plane}:{d}".encode()).hexdigest()[:8], 16)
        return h / 2147483648.0 - 1.0

    qsig = 0
    for p in range(n_planes):
        proj = sum(query_vec[d] * py_hyperplane(p, d) for d in range(dim))
        qsig += (1 if proj > 0 else 0) << p
    del np
    sig = lsh_signature(F.col(vec_col), dim, n_planes)
    bucket = embeddings.withColumn("lsh", sig).where(F.col("lsh") == qsig)
    return brute_force_topk(bucket, query_vec, k, id_col, vec_col)


def build_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic mini-k-means: seeds = first n_centroids vectors in
    md5(id) order; `n_iter` Lloyd steps as DataFrame jobs (assign = argmin
    distance over broadcast centroids; update = per-cluster mean).

    Centroid count is small by design (the index is metadata, rows stay
    distributed); at 100 TB the assign step is one map-only pass per
    iteration and the update is one groupBy.
    """
    from archive_query_log_spark.functions.ids import md5_rand

    seeds = (
        embeddings.orderBy(md5_rand(F.col(id_col), seed=5), F.col(id_col))
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(n_iter):
        assigned = embeddings.select(
            F.col(vec_col),
            _nearest_centroid(F.col(vec_col), centroids).alias("c"),
        )
        means = (
            assigned.select(
                "c", *[F.element_at(vec_col, d + 1).alias(f"x{d}") for d in range(dim)]
            )
            .groupBy("c")
            .agg(*[F.avg(f"x{d}").alias(f"x{d}") for d in range(dim)])
            .collect()
        )
        for r in means:
            centroids[int(r["c"])] = [float(r[f"x{d}"]) for d in range(dim)]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_c ||v - c||² as a when-chain over squared distances."""
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec, carr, lambda a, b: (a.cast("double") - b) ** 2)
        dists.append(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    best = F.least(*dists)
    chain = F.when(dists[0] == best, F.lit(0))
    for i in range(1, len(dists)):
        chain = chain.when(dists[i] == best, F.lit(i))
    return chain.cast("int")


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: scan only the n_probe clusters nearest to the query, exact
    cosine rerank inside them. At scale the cluster id is a stored,
    partition-pruning column (write-time assignment)."""
    import numpy as np

    centroids = centroids or build_ivf_centroids(
        embeddings, dim, n_centroids, id_col=id_col, vec_col=vec_col
    )
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = [float(((q - np.asarray(c)) ** 2).sum()) for c in centroids]
    probes = sorted(np.argsort(d2)[:n_probe].tolist())
    assigned = embeddings.withColumn(
        "_c", _nearest_centroid(F.col(vec_col), centroids)
    )
    bucket = assigned.where(F.col("_c").isin(probes)).drop("_c")
    return brute_force_topk(bucket, query_vec, k, id_col, vec_col)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-gated by a shared
    LSH bucket (equi-join, never cross)."""
    sig = lsh_signature(F.col(vec_col), dim, n_planes)
    s = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("lsh")
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, on="lsh")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
