"""Fetcher + validator: scheduled frontier rows → fetch results
(SURVEY.md §7.1 'Fetcher/validator'; reference stages S3/S4 re-expressed).

The reference fetches from external archive APIs row-by-row behind a rate
limiter (/root/reference/archive_query_log/downloaders/warc.py:85-118). Here
the "archive" is the images table: the fetch is an equi-join frontier→images
on image_id, and the payload validation (decode, PSNR, caption, phash —
BASELINE.json input_hint) runs in ONE Arrow-batched mapInPandas pass.

Scale notes:
- join strategy: images is the big side at 100 TB → shuffle join
  co-partitioned on image_id (the frontier was minted with image_id, so
  bucketing both on image_id makes this a local join); at test scale AQE
  broadcasts the small side automatically.
- the decode UDF sees only (bytes, ...) columns it needs; Arrow batch size
  is capped in session.py so binary batches fit executor memory.
- per-row fetch/decode errors become status columns, never task failures
  (reference's skip-and-warn semantics, captures/__init__.py:126-150).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from archive_query_log_spark.crawler import codec

_VALIDATION_FIELDS = [
    StructField("fetch_status", IntegerType(), False),
    StructField("psnr_db", DoubleType(), False),
    StructField("psnr_ok", BooleanType(), False),
    StructField("caption_ok", BooleanType(), False),
    StructField("phash_ok", BooleanType(), False),
]


def fetch_and_validate(scheduled: DataFrame, images: DataFrame) -> DataFrame:
    """scheduled (must carry image_id) ⋈ images → decode + validate.

    Returns scheduled columns + fetch_status/psnr_db/psnr_ok/caption_ok/
    phash_ok. Missing image (dead link) → fetch_status 404.
    """
    joined = scheduled.join(
        images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash"),
        on="image_id",
        how="left",
    )
    in_fields = [
        f for f in joined.schema.fields
        if f.name not in ("bytes", "w", "h", "fmt", "caption", "phash")
    ]
    out_schema = StructType(in_fields + _VALIDATION_FIELDS)
    keep = [f.name for f in in_fields]

    def validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            status = [404] * n
            psnr_db = [0.0] * n
            oks = [[False] * n for _ in range(3)]
            bufs = pdf["bytes"]
            for j in range(n):
                buf = bufs.iloc[j]
                if buf is None:
                    continue
                s, p, a, b, c = codec.validate_row(
                    bytes(buf),
                    pdf["image_id"].iloc[j],
                    int(pdf["w"].iloc[j]),
                    int(pdf["h"].iloc[j]),
                    pdf["fmt"].iloc[j],
                    pdf["caption"].iloc[j],
                    int(pdf["phash"].iloc[j]),
                )
                status[j], psnr_db[j] = s, p
                oks[0][j], oks[1][j], oks[2][j] = a, b, c
            out = pdf[keep].copy()
            out["fetch_status"] = pd.array(status, dtype="int32")
            out["psnr_db"] = psnr_db
            out["psnr_ok"] = oks[0]
            out["caption_ok"] = oks[1]
            out["phash_ok"] = oks[2]
            yield out

    return joined.mapInPandas(validate, out_schema)


def validation_summary(fetches: DataFrame) -> DataFrame:
    """Wave-level validation rollup (one aggregation pass)."""
    return fetches.agg(
        F.count("*").alias("fetched"),
        F.sum(F.when(F.col("fetch_status") == 200, 1).otherwise(0)).alias("ok_200"),
        F.sum(F.when(F.col("psnr_ok"), 1).otherwise(0)).alias("psnr_ok"),
        F.sum(F.when(F.col("caption_ok"), 1).otherwise(0)).alias("caption_ok"),
        F.sum(F.when(F.col("phash_ok"), 1).otherwise(0)).alias("phash_ok"),
    )
