"""Dedup + search operators against small Python oracles."""

import hashlib

from pyspark.sql import functions as F

from archive_query_log_spark.operators import dedup, search, similarity

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different text about spark joins here"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "tiny"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    kept = sorted(
        r["doc_id"] for r in dedup.exact_dedup(_docs(spark)).collect()
    )
    assert kept == [0, 1, 2, 4]  # 3 collapses into 0


def test_minhash_signature_matches_python(spark):
    rows = dedup.minhash_signatures(_docs(spark), num_perm=4).collect()
    for r in rows:
        text = dict(DOCS)[r["doc_id"]]
        toks = text.lower().split()
        shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        for s in range(4):
            exp = min(
                int(hashlib.md5(f"{s}:{sh}".encode()).hexdigest()[:8], 16)
                for sh in shingles
            )
            assert r[f"mh_{s}"] == exp


def test_jaccard_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(_docs(spark), threshold=0.2).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
    assert all(a < b for a, b in pairs)


def test_simhash_near_for_near_docs(spark):
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(_docs(spark)).collect()}
    assert rows[0] == rows[3]
    d_near = bin(rows[0] ^ rows[1]).count("1")
    d_far = bin(rows[0] ^ rows[2]).count("1")
    assert d_near < d_far


def test_advanced_search_compiler(spark):
    d = _docs(spark)
    cases = {
        "quick AND dog": {0, 3},
        "quick OR spark": {0, 1, 2, 3},
        '"lazy cat"': {1},
        "qu?ck": {0, 1, 3},
        "spar*": {2},
        "(dog OR cat) AND quick": {0, 1, 3},
    }
    for q, exp in cases.items():
        pred = search.compile_advanced_query(q, F.col("text"))
        got = {r["doc_id"] for r in d.where(pred).collect()}
        assert got == exp, q


def test_fuzzy_match(spark):
    d = _docs(spark)
    pred = search.match_fuzzy(F.col("text"), "quik")  # dist 1, len 4 → allowed
    got = {r["doc_id"] for r in d.where(pred).collect()}
    assert got == {0, 1, 3}


def test_ivf_topk_recall(spark):
    import numpy as np

    from archive_query_log_spark.operators.similarity import (
        build_ivf_centroids,
        ivf_topk,
    )

    rng = np.random.default_rng(7)
    # two well-separated clusters so IVF probing is meaningful
    vecs = np.vstack(
        [rng.normal(0, 1, (60, 8)) + 8, rng.normal(0, 1, (60, 8)) - 8]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    ).cache()
    q = [float(x) for x in vecs[3]]
    exact = {r["vec_id"] for r in similarity.brute_force_topk(df, q, k=5).collect()}
    cents = build_ivf_centroids(df, dim=8, n_centroids=4)
    approx = {
        r["vec_id"]
        for r in ivf_topk(df, q, dim=8, k=5, n_centroids=4, n_probe=2,
                          centroids=cents).collect()
    }
    assert len(exact & approx) >= 4  # ≥80% recall on separated clusters
    # determinism: same centroids on rebuild
    assert cents == build_ivf_centroids(df, dim=8, n_centroids=4)


def test_cosine_topk_and_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(50, 8)).astype(float)
    vecs[7] = vecs[3] * 2.0  # same direction as 3
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in vecs[3]]
    top = similarity.brute_force_topk(df, q, k=2).collect()
    assert {r["vec_id"] for r in top} == {3, 7}
    # near-dup pairs find the planted duplicate direction
    pairs = similarity.cosine_near_dup_pairs(df, dim=8, threshold=0.99)
    assert (3, 7) in {(r["id_a"], r["id_b"]) for r in pairs.collect()}
