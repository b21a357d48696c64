"""Structured-Streaming wrapper for the batch-incremental model
(SURVEY.md §2.11).

The reference has no stream processor — incrementality is worklist flags +
re-fetch windows; our pipeline mirrors that with snapshot commits per round.
This module is the OPTIONAL streaming skin: new frontier files arriving in a
directory are consumed with ``Trigger.AvailableNow`` (process-everything-
then-stop — the exactly-once batch-incremental trigger), deduplicated on the
canonical url_key with a watermark for late captures (the reference's 4-week
re-poll is a coarse watermark, captures/__init__.py:163-173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_new_urls(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    watermark: str = "28 days",
    ts_col: str = "ts",
    key_col: str = "url_key",
) -> DataFrame:
    """readStream over a frontier drop-directory with watermark'd first-seen
    dedup on the canonical key."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    return stream.withWatermark(ts_col, watermark).dropDuplicates([key_col])


def run_available_now(
    deduped: DataFrame, out_dir: str, checkpoint_dir: str
) -> int:
    """Drain everything currently available into parquet, exactly once per
    file (checkpointed), then stop. Returns number of progress batches."""
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(q.recentProgress)
