"""Similarity search over embedding columns (brief requirement).

- brute-force cosine top-k: JVM-side dot product via zip_with + aggregate
  (no Python in the hot path) against a broadcast query vector.
- LSH-bucketed ANN (scale path): random-hyperplane signatures — the query
  probes only its bucket(s), turning O(N) scans into O(N/2^bits) per probe.
  Hyperplanes are derived deterministically (md5 of (plane, dim)) so results
  are reproducible and oracle-checkable without shipping matrices.
- IVF ANN: deterministic mini-k-means coarse quantizer; probe the nearest
  clusters, exact rerank inside.
- embedding-cosine near-dup: pairs within the same LSH bucket above a cosine
  threshold, with a hot-bucket cap (see cosine_near_dup_pairs).

Signature computation has TWO equivalent implementations, selected by dim:

- ``method='expr'``: an unrolled Catalyst expression (n_planes × dim multiply
  terms). Great at dim ≤ 64 — whole-stage codegen, zero Python — but the
  expression tree grows as n_planes×dim: at real embedding widths (768-4096)
  codegen falls back to interpreted mode and plan compilation itself blows up.
- ``method='matmul'``: one Arrow-batched pandas UDF doing a single numpy
  matmul per batch — constant-size plan regardless of dim.

``with_lsh_signature`` / ``with_ivf_cluster`` are the STORED-COLUMN writers:
at 100 TB the signature/cluster id is computed once at ingest and written as
a bucketed/partition-pruning column; the probe side then touches only its
bucket. Both paths are equality-tested (tests/test_dedup_search.py).
"""

from __future__ import annotations

import hashlib

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# above this many multiply terms, the unrolled expression plan is a
# compile-time hazard → switch to the matmul UDF
_EXPR_TERM_BUDGET = 1024


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


# --- hyperplanes (shared by the expr and matmul paths, and the oracle) ------


def hyperplane_value(plane: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived, reproducible anywhere (incl. the DuckDB oracle)."""
    h = int(hashlib.md5(f"hp:{plane}:{d}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def hyperplane_matrix(dim: int, n_planes: int):
    """(n_planes, dim) float64 numpy matrix of the same md5 hyperplanes."""
    import numpy as np

    return np.array(
        [[hyperplane_value(p, d) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def _hyperplane(plane: int, dim: int) -> Column:
    return F.lit(hyperplane_value(plane, dim))


def lsh_signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) as a long —
    unrolled-expression path (use only when n_planes*dim is small; see
    with_lsh_signature for the dim-aware dispatcher)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec, d + 1).cast("double") * _hyperplane(p, d)
            proj = term if proj is None else proj + term
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + F.shiftleft(bit, p)
    return sig


def lsh_signature_udf(dim: int, n_planes: int = 8):
    """Arrow-batched signature: ONE numpy matmul per batch. Constant-size
    plan at any dim — the stored-column writer for real embedding widths."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    H = hyperplane_matrix(dim, n_planes)  # captured, shipped once per task
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        # null / wrong-width embeddings must not kill the batch: they map to
        # signature 0, matching the expression path (element_at on a null
        # array → null projection → every bit's when() falls to 0)
        vals = v.tolist()
        X = np.zeros((len(vals), dim), dtype=np.float64)
        for i, row in enumerate(vals):
            if row is not None and len(row) == dim:
                X[i] = row
        bits = (X @ H.T) > 0  # (batch, n_planes)
        return pd.Series(bits.astype(np.int64) @ weights)

    return _sig


def with_lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out_col: str = "lsh",
    method: str = "auto",
) -> DataFrame:
    """Append the LSH bucket column (the write-time stored column at scale).

    method: 'expr' (unrolled Catalyst expression), 'matmul' (Arrow UDF), or
    'auto' (expr while n_planes*dim ≤ 1024, matmul beyond — the expression
    plan explodes at real embedding widths).
    """
    if method == "auto":
        method = "expr" if n_planes * dim <= _EXPR_TERM_BUDGET else "matmul"
    if method == "expr":
        sig = lsh_signature(F.col(vec_col), dim, n_planes)
    elif method == "matmul":
        sig = lsh_signature_udf(dim, n_planes)(F.col(vec_col))
    else:
        raise ValueError(method)
    return df.withColumn(out_col, sig)


def query_lsh_signature(query_vec: list[float], n_planes: int) -> int:
    """Driver-side signature of the query vector (same hyperplanes)."""
    dim = len(query_vec)
    sig = 0
    for p in range(n_planes):
        proj = sum(query_vec[d] * hyperplane_value(p, d) for d in range(dim))
        sig += (1 if proj > 0 else 0) << p
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """ANN: score only rows in the query's LSH bucket (plus exact rerank).

    Pass ``sig_col`` to probe a STORED signature column (written at ingest
    by with_lsh_signature) — then this is a partition-pruned scan of one
    bucket with no signature computation at query time.
    """
    qsig = query_lsh_signature(query_vec, n_planes)
    if sig_col is None:
        embeddings = with_lsh_signature(
            embeddings, dim, n_planes, vec_col, "_lsh", method
        )
        sig_col = "_lsh"
    bucket = embeddings.where(F.col(sig_col) == qsig)
    return brute_force_topk(bucket, query_vec, k, id_col, vec_col)


# --- IVF --------------------------------------------------------------------


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
    iteration and the update is one map-only partial-sum pass.

    The Lloyd update is per-partition partial sums via mapInPandas: each
    task emits at most n_centroids rows of (cluster, Σvec, count) — one
    numpy masked sum per cluster per batch — and the driver merges the
    metadata-sized partials in collected partition order (deterministic:
    collect() preserves partition order, so rebuilds are bit-identical).
    The earlier posexplode(vec) → groupBy(cluster, pos).avg plan shuffled
    rows × dim exploded rows per iteration (768 M rows at the 1M×768
    soak, 167 s for 2 iterations); the partial-sum pass reads each vector
    once and shuffles nothing. Assignment reuses with_ivf_cluster's
    dim-aware dispatcher (unrolled expr under the term budget,
    numpy-matmul Arrow UDF beyond), so the builder works at dim 768
    without a plan blowup on either step."""
    import numpy as np
    import pandas as pd

    from archive_query_log_spark.functions.ids import md5_rand

    seeds = (
        embeddings.orderBy(md5_rand(F.col(id_col), seed=5), F.col(id_col))
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    k = len(centroids)
    for _ in range(n_iter):
        assigned = with_ivf_cluster(
            embeddings.select(vec_col), centroids, vec_col=vec_col, out_col="c"
        )

        def partials(batches):
            sums = np.zeros((k, dim), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                cs = pdf["c"].to_numpy(dtype="float64", na_value=np.nan)
                vals = pdf[vec_col].tolist()
                ok = [
                    i
                    for i in range(len(vals))
                    if not np.isnan(cs[i])
                    and vals[i] is not None
                    and len(vals[i]) == dim
                ]
                if not ok:
                    continue
                X = np.asarray([vals[i] for i in ok], dtype=np.float64)
                cv = cs[np.asarray(ok)].astype(np.int64)
                for c in np.unique(cv):
                    mask = cv == c
                    sums[c] += X[mask].sum(axis=0)
                    counts[c] += int(mask.sum())
            hit = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "c": hit.astype("int32"),
                    "s": [sums[c].tolist() for c in hit],
                    "n": counts[hit],
                }
            )

        rows = assigned.mapInPandas(
            partials, "c int, s array<double>, n long"
        ).collect()
        tot = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:  # collected partition order — deterministic merge
            tot[r["c"]] += np.asarray(r["s"], dtype=np.float64)
            cnt[r["c"]] += r["n"]
        for c in range(k):
            if cnt[c] > 0:  # empty clusters keep their previous centroid
                centroids[c] = [float(x) for x in tot[c] / cnt[c]]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_c ||v - c||² as a when-chain over squared distances —
    unrolled-expression path (n_centroids × dim terms; see with_ivf_cluster
    for the dim-aware dispatcher)."""
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


def nearest_centroid_udf(centroids: list[list[float]]):
    """Arrow-batched cluster assignment: one numpy distance matrix per batch
    (ties → first index, same as the expression path's when-chain)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)  # (k, dim)
    dim = C.shape[1]

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        # null / wrong-width embeddings must not kill the batch: they map to
        # a NULL cluster, matching the expression path (null distances →
        # every when() null → null label)
        vals = v.tolist()
        valid = np.array(
            [row is not None and len(row) == dim for row in vals], dtype=bool
        )
        X = np.zeros((len(vals), dim), dtype=np.float64)
        for i, row in enumerate(vals):
            if valid[i]:
                X[i] = row
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        labels = np.argmin(d2, axis=1).astype(np.float64)
        labels[~valid] = np.nan
        return pd.Series(labels).astype("Int32")

    return _assign


def with_ivf_cluster(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf",
    method: str = "auto",
) -> DataFrame:
    """Append the IVF cluster-id column (the write-time partition column at
    scale). method as in with_lsh_signature."""
    n_terms = len(centroids) * len(centroids[0])
    if method == "auto":
        method = "expr" if n_terms <= _EXPR_TERM_BUDGET else "matmul"
    if method == "expr":
        c = _nearest_centroid(F.col(vec_col), centroids)
    elif method == "matmul":
        c = nearest_centroid_udf(centroids)(F.col(vec_col))
    else:
        raise ValueError(method)
    return df.withColumn(out_col, c)


def query_probes(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """Driver-side probe selection: the n_probe clusters nearest the query.
    Ties break by cluster index — explicitly, with a (d2, index) sort key —
    so the selection matches the oracle's ORDER BY d2, c deterministically
    (np.argsort's default quicksort is NOT stable)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    d2 = [float(((q - np.asarray(c)) ** 2).sum()) for c in centroids]
    order = sorted(range(len(d2)), key=lambda i: (d2[i], i))
    return sorted(order[:n_probe])


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
    cluster_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """IVF ANN: scan only the n_probe clusters nearest to the query, exact
    cosine rerank inside them. Pass ``cluster_col`` to probe a STORED
    cluster-id column (written at ingest by with_ivf_cluster) — then probing
    is a partition-pruned scan with no assignment at query time."""
    centroids = centroids or build_ivf_centroids(
        embeddings, dim, n_centroids, id_col=id_col, vec_col=vec_col
    )
    probes = query_probes(query_vec, centroids, n_probe)
    if cluster_col is None:
        embeddings = with_ivf_cluster(embeddings, centroids, vec_col, "_c", method)
        cluster_col = "_c"
    bucket = embeddings.where(F.col(cluster_col).isin(probes))
    return brute_force_topk(bucket, query_vec, k, id_col, vec_col)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 1000,
    method: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-gated by a shared
    LSH bucket (equi-join, never cross).

    Hot-bucket cap: a bucket with b rows produces b²/2 pair rows — one
    degenerate bucket (all-zero embeddings, n_planes too small for N) turns
    the self-join quadratic. Buckets larger than ``max_bucket`` are DROPPED
    from candidate generation (an explicit recall cut, the standard
    LSH-at-scale guard; count them via ``hot_buckets``). Size n_planes so
    E[N/2^n_planes] ≪ max_bucket at the target scale.
    """
    s = with_lsh_signature(embeddings, dim, n_planes, vec_col, "lsh", method).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh"
    )
    if max_bucket is not None:
        hot = (
            s.groupBy("lsh")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("lsh")
        )
        s = s.join(F.broadcast(hot), "lsh", "left_anti")
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


def hot_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 6,
    vec_col: str = "embedding",
    max_bucket: int = 1000,
    method: str = "auto",
) -> DataFrame:
    """The buckets cosine_near_dup_pairs would drop, with their sizes —
    the dropped-candidate report a pipeline should log/monitor."""
    s = with_lsh_signature(embeddings, dim, n_planes, vec_col, "lsh", method)
    return (
        s.groupBy("lsh")
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") > max_bucket)
    )
