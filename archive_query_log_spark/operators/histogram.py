"""Date histograms (SURVEY.md A4/A5).

Reference semantics: ES date_histogram with calendar intervals day/week/
month/quarter/year (/root/reference/archive_query_log/api/routers/serps.py:371-461,
interval mapping :431-447); auto variant picks the smallest interval that
yields ≤ target buckets (:421-428).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTERVALS = ("day", "week", "month", "quarter", "year")


def date_histogram(
    df: DataFrame, ts_col: str = "ts", interval: str = "week"
) -> DataFrame:
    """Calendar-bucket counts; bucket = date_trunc start (ES convention)."""
    if interval not in INTERVALS:
        raise ValueError(interval)
    return (
        df.groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def auto_date_histogram(
    df: DataFrame, ts_col: str = "ts", target_buckets: int = 20
) -> tuple[str, DataFrame]:
    """A5: pick the smallest interval with ≤ target_buckets buckets (min
    interval day), then run A4. One extra tiny aggregate to read the span."""
    span = df.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    days = max(1, (span["hi"] - span["lo"]).days)
    approx = {"day": days, "week": days / 7, "month": days / 30,
              "quarter": days / 91, "year": days / 365}
    interval = next(
        (i for i in INTERVALS if approx[i] <= target_buckets), "year"
    )
    return interval, date_histogram(df, ts_col, interval)
