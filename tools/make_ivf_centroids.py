"""Train + freeze the IVF coarse quantizer for the ann_ivf_topk entry.

Runs the deterministic mini-k-means (operators/similarity.py:
build_ivf_centroids — md5-ordered seeds, 2 Lloyd steps) over the sf0.01
embeddings table and freezes the resulting centroids (plus the entry's
query-vector probe selection) to archive_query_log_spark/data/
ivf_centroids.json. Freezing is standard IVF practice — the coarse
quantizer is a trained artifact reused across queries — and it makes the
probe + rerank fully expressible in the DuckDB oracle (centroids become
literals on both sides). Deterministic: rerunning reproduces the file
byte-identically.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
DIM, N_CENTROIDS, N_ITER, N_PROBE, QUERY_VEC_ID = 64, 8, 2, 3, 1


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from archive_query_log_spark.operators.similarity import (
        build_ivf_centroids,
        query_probes,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = build_ivf_centroids(
        e, DIM, N_CENTROIDS, n_iter=N_ITER, id_col="vec_id"
    )
    qv = [
        float(x)
        for x in e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0][0]
    ]
    probes = query_probes(qv, centroids, N_PROBE)
    out = Path(__file__).resolve().parent.parent / (
        "archive_query_log_spark/data/ivf_centroids.json"
    )
    out.write_text(
        json.dumps(
            {
                "source": (
                    "deterministic mini-k-means over sf0.01 embeddings "
                    "(md5-ordered seeds, 2 Lloyd steps); see "
                    "tools/make_ivf_centroids.py"
                ),
                "dim": DIM,
                "n_centroids": N_CENTROIDS,
                "n_iter": N_ITER,
                "n_probe": N_PROBE,
                "query_vec_id": QUERY_VEC_ID,
                "probes_for_query_vec": probes,
                "centroids": centroids,
            },
            indent=0,
        )
        + "\n"
    )
    print(f"wrote {out}: {N_CENTROIDS}x{DIM} centroids, probes={probes}")


if __name__ == "__main__":
    main()
