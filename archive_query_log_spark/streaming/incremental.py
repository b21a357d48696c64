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
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """readStream over a frontier drop-directory with watermark'd first-seen
    dedup on the canonical key."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    # dropDuplicatesWithinWatermark (not plain dropDuplicates) so the dedup
    # state is actually evicted once the watermark passes: with a plain
    # dropDuplicates([key]) the event-time column is outside the dedup subset
    # and Spark keeps every key forever (unbounded state).
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def stateful_politeness_stream(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    t0: str = "2024-01-01 00:00:00",
    delay_s: float = 10.0,
):
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-host politeness emitter whose state is the host's next wave number —
    URLs arriving across micro-batches keep receiving strictly increasing
    waves/dispatch times per host, exactly like the batch scheduler but over
    an unbounded stream. The brief's 'custom stateful operator' slot."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("host", StringType(), False),
            StructField("url_key", StringType(), False),
            StructField("wave", IntegerType(), False),
            StructField("dispatch_ts", TimestampType(), False),
        ]
    )
    state_schema = StructType([StructField("next_wave", LongType(), False)])
    t0_dt = dt.datetime.fromisoformat(t0)

    def emit(key, pdf_iter, state: GroupState):
        (host,) = key
        k = state.get[0] if state.exists else 0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("url_key")
            for uk in pdf["url_key"]:
                out.append(
                    (host, uk, k, t0_dt + dt.timedelta(seconds=k * delay_s))
                )
                k += 1
        state.update((k,))
        yield pd.DataFrame(out, columns=["host", "url_key", "wave", "dispatch_ts"])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            emit, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


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
