"""Stage 1 — source build: archives × providers → crawl seeds
(SURVEY.md J1; reference /root/reference/archive_query_log/sources/__init__.py:17-109).

Reference semantics reproduced:
- cross product over archives × providers × provider.domains ×
  provider.url_path_prefixes (nested loops there; broadcast crossJoin +
  two explodes here);
- providers with an ``exclusion_reason`` are skipped (F9,
  sources/__init__.py:18-23);
- source id = uuid5(NS_SOURCE, f"{cdx}:{memento}:{domain}:{prefix}")
  (sources/__init__.py:28-37) — minted with the pure-column uuid5;
- create-if-absent write (ES ``create``; here operators/merge.py upsert).

Both dims are tiny (10^2-10^3 rows) → both sides broadcast; the explosion is
the only row growth. One job, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_query_log_spark.functions.ids import source_id
from archive_query_log_spark.operators.merge import upsert_create_if_absent
from archive_query_log_spark.tables import SnapshotTable


def build_sources(archives: DataFrame, providers: DataFrame) -> DataFrame:
    """Emit one source row per (archive, provider-domain, prefix)."""
    prov = (
        providers.where(F.col("exclusion_reason").isNull())
        .select(
            F.col("id").alias("provider_id"),
            F.col("priority").alias("provider_priority"),
            F.explode("domains").alias("domain"),
            F.col("url_path_prefixes"),
        )
        .select(
            "provider_id",
            "provider_priority",
            "domain",
            F.explode("url_path_prefixes").alias("url_path_prefix"),
        )
    )
    arch = archives.select(
        F.col("id").alias("archive_id"),
        "cdx_api_url",
        "memento_api_url",
        F.col("priority").alias("archive_priority"),
    )
    out = F.broadcast(arch).crossJoin(F.broadcast(prov))
    return out.select(
        source_id(
            F.col("cdx_api_url"),
            F.col("memento_api_url"),
            F.col("domain"),
            F.col("url_path_prefix"),
        ).alias("id"),
        F.struct(
            "archive_id", "cdx_api_url", "memento_api_url",
            F.col("archive_priority").alias("priority"),
        ).alias("archive"),
        F.struct(
            F.col("provider_id").alias("id"),
            "domain",
            "url_path_prefix",
            F.col("provider_priority").alias("priority"),
        ).alias("provider"),
        F.lit(None).cast("boolean").alias("should_fetch_captures"),
        F.lit(None).cast("timestamp").alias("last_fetched_captures"),
    )


def build_and_commit_sources(
    spark: SparkSession,
    table: SnapshotTable,
    archives: DataFrame,
    providers: DataFrame,
) -> int:
    """Create-if-absent commit — re-running cannot duplicate sources."""
    return upsert_create_if_absent(spark, table, build_sources(archives, providers), "id")
