"""Deterministic fixture synthesis (FIXTURES.md; seed=42; no external data).

Everything is derived from row ids via md5-based column expressions or
id-keyed numpy generators, so the SAME tables materialize at any parallelism
level and any partitioning — a precondition for the reproducible-crawl-order
requirement.

Tables (FIXTURES.md §1-5):
- images(image_id, bytes, w, h, fmt, caption, phash)   [input_hint shape]
- archives / providers dims (orm.py:62-95 shapes)
- frontier (captures-shaped, orm.py:132-166; Zipf hosts, ~5% dup url_keys)
- robots_rules(host, path_prefix, allow, crawl_delay_s)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from archive_query_log_spark.crawler import codec
from archive_query_log_spark.functions.ids import capture_id, md5_rand
from archive_query_log_spark.functions.urls import url_key

N_HOSTS = 50
HOT_HOST_SHARE = 0.30  # FIXTURES.md §4: one hot host ≥ 30% of rows
DUP_SHARE = 0.05
IMG_W = IMG_H = 32
CDX_API = "https://archive.example.org/cdx"
MEMENTO_API = "https://archive.example.org/web"

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)


def image_id_for(i: int) -> str:
    return f"img{i:08d}"


def synth_images(spark: SparkSession, n: int, n_partitions: int = 32) -> DataFrame:
    """The payload table. Pixel/caption content is keyed purely on image_id →
    partition-invariant. Encoded via the deterministic codec; ``phash`` is the
    hash of the *decoded* pixels (what a fetcher must reproduce)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                iid = image_id_for(int(i))
                fmt = "jpeg" if int(i) % 2 else "png"
                pixels = codec.synth_pixels(iid, IMG_W, IMG_H)
                buf = codec.encode(pixels, fmt)
                decoded = codec.decode(buf)[3]
                rows.append(
                    (
                        iid,
                        buf,
                        IMG_W,
                        IMG_H,
                        fmt,
                        codec.synth_caption(iid),
                        codec.phash(decoded),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return spark.range(n, numPartitions=n_partitions).mapInPandas(gen, IMAGES_SCHEMA)


def synth_dims(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """2 archives × 20 providers (FIXTURES.md §2). Provider priority follows
    the reference's rank rule priority = num_services − i
    (/root/reference/archive_query_log/imports/yaml.py:144)."""
    archives = spark.createDataFrame(
        [
            ("archive-a", CDX_API, MEMENTO_API, 10.0),
            ("archive-b", CDX_API + "-b", MEMENTO_API + "-b", 1.0),
        ],
        "id string, cdx_api_url string, memento_api_url string, priority double",
    )
    n_prov = 20
    rows = []
    for i in range(n_prov):
        rows.append(
            (
                f"provider-{i:02d}",
                [f"h{i:02d}.example.com"],
                ["/search", "/img"] if i % 3 == 0 else ["/search"],
                float(n_prov - i),
                "trial" if i == 19 else None,  # F9 exclusion fixture
            )
        )
    providers = spark.createDataFrame(
        rows,
        "id string, domains array<string>, url_path_prefixes array<string>, "
        "priority double, exclusion_reason string",
    )
    return archives, providers


def synth_frontier(
    spark: SparkSession, n: int, n_images: int, n_partitions: int = 32
) -> DataFrame:
    """Captures-shaped frontier, entirely in column expressions.

    - host: Zipf-ish — 30% of rows on h00 (the hot host), rest uniform.
    - ~5% of rows duplicate an earlier row's URL at a later ts (same
      url_key, different capture id → exercises the seen-set).
    - priorities embedded from the dims (archive by row hash, provider=host).
    """
    df = spark.range(n, numPartitions=n_partitions).withColumnRenamed("id", "i")
    # ~5% duplicates: row i>=20 with r_dup<DUP_SHARE re-mints row (i mod 17)'s URL
    r_dup = md5_rand(F.col("i"), seed=2)
    base_i = F.when(
        (r_dup < DUP_SHARE) & (F.col("i") >= 20), F.pmod(F.col("i"), F.lit(17))
    ).otherwise(F.col("i"))
    r_host = md5_rand(base_i, seed=1)
    img_idx = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("img:"), base_i)), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(n_images),
    )
    host_idx = F.when(r_host < HOT_HOST_SHARE, F.lit(0)).otherwise(
        (F.pmod(F.conv(F.substring(F.md5(F.concat(F.lit("h:"), base_i)), 1, 8), 16, 10).cast("long"), F.lit(N_HOSTS - 1)) + 1).cast("int")
    )
    host = F.format_string("h%02d.example.com", host_idx)
    prov_idx = F.pmod(host_idx, F.lit(20))
    prefix = F.when(F.pmod(prov_idx, F.lit(3)) == 0, F.lit("/img")).otherwise(
        F.lit("/search")
    )
    image_id = F.format_string("img%08d", img_idx)
    # query params: the real 'q' param keyed on the base row (so dups share a
    # url_key); tracking params keyed on THIS row (so some dups differ only
    # by utm_* — exercising canonicalization-driven dedup)
    has_q = md5_rand(base_i, seed=3) < 0.3
    has_utm = md5_rand(F.col("i"), seed=31) < 0.2
    qs = (
        F.when(has_q & has_utm, F.lit("?q=1&utm_source=feed"))
        .when(has_q, F.lit("?q=1"))
        .when(has_utm, F.lit("?utm_source=feed"))
        .otherwise(F.lit(""))
    )
    url = F.concat(F.lit("https://"), host, prefix, F.lit("/"), image_id, qs)
    ts = F.timestamp_add(
        "SECOND",
        (md5_rand(F.col("i"), seed=4) * 86400 * 365).cast("long"),
        F.to_timestamp(F.lit("2023-01-01 00:00:00")),
    )
    arch_is_a = md5_rand(F.col("i"), seed=5) < 0.7
    status = F.when(md5_rand(F.col("i"), seed=6) < 0.9, F.lit(200)).otherwise(
        F.lit(404)
    )
    out = df.select(
        F.col("i"),
        url.alias("url"),
        host.alias("host"),
        ts.alias("ts"),
        status.alias("status_code"),
        F.lit(None).cast("string").alias("digest"),
        F.lit("text/html").alias("mimetype"),
        F.struct(
            F.when(arch_is_a, F.lit("archive-a")).otherwise(F.lit("archive-b")).alias("id"),
            F.when(arch_is_a, F.lit(CDX_API)).otherwise(F.lit(CDX_API + "-b")).alias("cdx_api_url"),
            F.when(arch_is_a, F.lit(MEMENTO_API)).otherwise(F.lit(MEMENTO_API + "-b")).alias("memento_api_url"),
            F.when(arch_is_a, F.lit(10.0)).otherwise(F.lit(1.0)).alias("priority"),
        ).alias("archive"),
        F.struct(
            F.format_string("provider-%02d", prov_idx).alias("id"),
            host.alias("domain"),
            prefix.alias("url_path_prefix"),
            (F.lit(20.0) - prov_idx.cast("double")).alias("priority"),
        ).alias("provider"),
        image_id.alias("image_id"),
        F.lit(None).cast("boolean").alias("should_fetch"),
        F.lit(None).cast("timestamp").alias("last_fetched"),
    )
    out = out.withColumn("url_key", url_key(F.col("url"))).withColumn(
        "id", capture_id(F.col("archive.cdx_api_url"), F.col("url"), F.col("ts"))
    )
    return out.drop("i")


def synth_robots(spark: SparkSession) -> DataFrame:
    """Default 10 s delay everywhere (reference parity, config.py:157-164);
    a few hosts get custom delays / disallow prefixes (north_rule)."""
    rows = []
    for i in range(N_HOSTS):
        host = f"h{i:02d}.example.com"
        # one host-wide ruleset per host; h07's replaces the default
        rows.append((host, None, True, 30.0 if i == 7 else 10.0))
    rows += [
        ("h00.example.com", "/img", True, 2.0),       # hot host, fast lane
        ("h04.example.com", "/search", False, 10.0),  # disallowed prefix
    ]
    return spark.createDataFrame(
        rows, "host string, path_prefix string, allow boolean, crawl_delay_s double"
    )
