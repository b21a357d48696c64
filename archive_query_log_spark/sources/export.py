"""Export sinks + legacy scans (SURVEY.md S9-S13).

Reference semantics reproduced:
- S11 sampled JSONL export (export/__init__.py:30-50: RandomScore + islice)
  → deterministic md5-rand order + limit, one gzip JSONL directory.
- S12 distributed export (export/__init__.py:53-81: Ray, 100 blocks)
  → ``repartition(n_blocks).write.json`` — the same physical shape without
  the second framework.
- S13 gzip text sink (scripts/create_corpus.py:301-317 saveAsTextFile+Gzip).
- S9 legacy JSONL.gz scan keyed by uuid5(f"{timestamp}:{url}")
  (legacy/model.py:31-36, scripts/create_corpus.py:66-70).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_query_log_spark.functions.ids import md5_rand, uuid5_from_name

import uuid


def export_jsonl(
    df: DataFrame,
    path: str,
    n_sample: int | None = None,
    seed: int = 42,
    n_blocks: int | None = None,
    dry_run: bool = False,
) -> dict | None:
    """S11/S12/S13: JSONL export, optionally a deterministic random sample,
    optionally repartitioned into n_blocks files, gzip-compressed.

    S15 dry-run (reference config.py:75-107 ``bulk(..., dry_run=...)``):
    ``dry_run=True`` runs the full plan but writes NOTHING — it returns a
    report of what would be written (row count, target path, block count)."""
    out = df
    if n_sample is not None:
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns])
        out = out.orderBy(md5_rand(key, seed)).limit(n_sample)
    if n_blocks is not None:
        out = out.repartition(n_blocks)
    if dry_run:
        return {
            "dry_run": True,
            "would_write_rows": out.count(),
            "path": path,
            "n_blocks": n_blocks,
            "compression": "gzip",
        }
    out.write.mode("overwrite").option("compression", "gzip").json(path)
    return None


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def legacy_record_id(timestamp: Column, url: Column) -> Column:
    """uuid5(NAMESPACE_URL, f"{unix_timestamp}:{url}") — the AQL-22 join key
    (legacy/model.py:31-36). Timestamp is the integer unix seconds."""
    return uuid5_from_name(
        uuid.NAMESPACE_URL, F.concat_ws(":", timestamp.cast("long"), url)
    )


def read_legacy_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S9: archived-urls legacy scan (url, timestamp) + derived join id."""
    df = spark.read.json(path)
    return df.withColumn(
        "record_id", legacy_record_id(F.col("timestamp"), F.col("url"))
    )
