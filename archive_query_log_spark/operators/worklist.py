"""Worklist semantics — the reference's incremental-state model as column
logic (SURVEY.md §1.4/§2.2).

Reference semantics reproduced:
- pending predicate ``NOT (should_x == false)`` — null counts as pending
  (/root/reference/archive_query_log/parsers/url_query.py:185,
  captures/__init__.py:167).
- 4-week re-fetch window (REFETCH_DELTA, captures/__init__.py:28, 163-176).
- scored worklist scan: pending ∧ fresh, ordered by priority+random, take n
  (captures/__init__.py:163-197) — at scale we process the whole pending
  partition instead of size-10 batches; ``limit`` stays for parity tests.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archive_query_log_spark.functions.ids import worklist_score

REFETCH_WEEKS = 4  # captures/__init__.py:28


def pending(flag: Column) -> Column:
    """null-or-true: a missing flag means never processed → pending."""
    return flag.isNull() | flag


def stale(last_processed: Column, now: datetime | Column) -> Column:
    """Re-poll window: processed but older than REFETCH_DELTA."""
    now_col = now if isinstance(now, Column) else F.lit(now)
    return last_processed.isNull() | (
        last_processed < now_col - F.expr(f"INTERVAL {REFETCH_WEEKS} WEEKS")
    )


def scored_worklist(
    df: DataFrame,
    flag: str,
    id_col: str = "id",
    archive_priority: str = "archive.priority",
    provider_priority: str = "provider.priority",
    seed: int = 42,
    limit: int | None = None,
) -> DataFrame:
    """S1: select pending rows, attach the deterministic queue score, order.

    The ORDER BY is total (score desc, id asc) so batch takes are reproducible
    across parallelism levels — the reference relied on unseeded RandomScore
    plus create-if-absent idempotence instead (captures/__init__.py:177-197).
    """
    out = (
        df.where(pending(F.col(flag)))
        .withColumn(
            "score",
            worklist_score(
                F.col(archive_priority),
                F.col(provider_priority),
                F.col(id_col),
                seed=seed,
            ),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
    )
    if limit is not None:
        out = out.limit(limit)
    return out


def progress(df: DataFrame, flag: str, group: str | None = None) -> DataFrame:
    """A12 progress ratio (monitoring.py:258-288): done/total per group,
    one aggregation pass (two conditional counts, no second scan)."""
    done = F.sum(F.when(F.col(flag) == False, 1).otherwise(0))  # noqa: E712
    total = F.count(F.lit(1))
    agg = [
        done.alias("done"),
        total.alias("total"),
        (done / total).alias("ratio"),
    ]
    return df.groupBy(group).agg(*agg) if group else df.agg(*agg)
