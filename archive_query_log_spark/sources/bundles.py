"""Payload bundle store: pack many small binary payloads into few large
objects; random-access read by (file, offset, length) pointer.

Reference semantics reproduced (SURVEY.md S5-S8): the reference packs WARC
records into ≤1 GB S3 objects and reads them back with ranged GETs keyed by
a stored ``WarcLocation(file, offset, length)``
(/root/reference/archive_query_log/downloaders/warc.py:245-292 write,
utils/warc.py:17-31 read; pointer struct orm.py:184-187).

Scale design: bundling is a per-bucket applyInPandas pass — payloads are
hash-bucketed on their id, each bucket task streams its payloads into
rolling files capped at ``max_bytes`` and emits pointer rows. Reads group
pointers by file and issue one open + seeks per file per batch (the ranged-
GET pattern; swap ``open`` for an S3/HDFS client at deployment — the
partitioning, pointer schema, and batch shape are the portable part).
"""

from __future__ import annotations

import os
import uuid as _uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

POINTER_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("file", StringType(), False),
        StructField("offset", LongType(), False),
        StructField("length", LongType(), False),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
    ]
)


def write_bundles(
    payloads: DataFrame,
    out_dir: str,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    n_buckets: int = 16,
    max_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Pack (id, bytes) rows into ≤max_bytes bundle files; returns pointers.

    Deterministic bucketing on the id; rows are packed in id order within a
    bucket so re-runs produce identical layouts."""
    os.makedirs(out_dir, exist_ok=True)
    src = payloads.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")
    ).withColumn("bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)).cast("int"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id")
        bucket = int(pdf["bucket"].iloc[0])
        rows = []
        fh = None
        fname = None
        offset = 0
        for iid, buf in zip(pdf["image_id"], pdf["bytes"]):
            b = bytes(buf)
            if fh is None or offset + len(b) > max_bytes:
                if fh is not None:
                    fh.close()
                fname = os.path.join(
                    out_dir, f"bundle-{bucket:04d}-{_uuid.uuid4().hex[:8]}.bin"
                )
                fh = open(fname, "wb")
                offset = 0
            fh.write(b)
            rows.append((iid, fname, offset, len(b)))
            offset += len(b)
        if fh is not None:
            fh.close()
        return pd.DataFrame(rows, columns=["image_id", "file", "offset", "length"])

    return src.groupBy("bucket").applyInPandas(pack, POINTER_SCHEMA)


def read_ranged(spark: SparkSession, pointers: DataFrame) -> DataFrame:
    """S8: random-access read — one open per (file, batch), a seek+read per
    pointer row; (image_id, bytes) out."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fname, grp in pdf.groupby("file"):
                with open(fname, "rb") as fh:
                    for iid, off, ln in zip(
                        grp["image_id"], grp["offset"], grp["length"]
                    ):
                        fh.seek(int(off))
                        out.append((iid, fh.read(int(ln))))
            yield pd.DataFrame(out, columns=["image_id", "bytes"])

    return pointers.mapInPandas(fetch, PAYLOAD_SCHEMA)
