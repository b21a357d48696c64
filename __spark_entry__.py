"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  → flagship crawl-scheduler query on /root/testdata/sf0.001.
queries()     → named operators from SURVEY.md §2 + training-data extensions.
oracle_sql()  → DuckDB twins for the hash-compare correctness gate.

Implementation lives in archive_query_log_spark.entry_queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from archive_query_log_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier politeness schedule (seen-set dedup + priority
    scoring + per-host waves) over sf0.001."""
    return entry_queries.flagship_crawl_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
