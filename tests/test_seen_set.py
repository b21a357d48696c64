"""Seen-set invariants: bloom-filtered novelty must equal the exact
anti-join (zero false negatives; false positives resolved exactly)."""

from pyspark.sql import functions as F

from archive_query_log_spark.crawler import synth
from archive_query_log_spark.operators import seen_set


def test_first_seen_in_batch_keeps_earliest(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2024-01-02 00:00:00", "b"),
            ("k1", "2024-01-01 00:00:00", "a"),
            ("k2", "2024-01-01 00:00:00", "c"),
        ],
        "url_key string, ts_s string, id string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    rows = seen_set.first_seen_in_batch(df).select("url_key", "id").collect()
    got = {r["url_key"]: r["id"] for r in rows}
    assert got == {"k1": "a", "k2": "c"}


def test_bloom_path_equals_exact_path(spark):
    frontier = synth.synth_frontier(spark, 3000, 500, 8)
    keys = frontier.select("url_key", "ts", "id")
    seen = keys.orderBy("url_key").limit(800).select("url_key")
    seen.cache()

    exact = seen_set.exact_new(keys, seen, "url_key")
    shards = seen_set.build_bloom_shards(seen, "url_key")
    filt = seen_set.filtered_new(keys, seen, shards, "url_key")

    a = sorted(r["id"] for r in exact.collect())
    b = sorted(r["id"] for r in filt.collect())
    assert a == b
    assert len(a) > 0


def test_bloom_probe_no_false_negatives(spark):
    keys = synth.synth_frontier(spark, 1000, 200, 4).select("url_key").distinct()
    shards = seen_set.build_bloom_shards(keys, "url_key")
    probed = seen_set.bloom_probe(keys, shards, "url_key")
    n_missed = probed.where(~F.col("maybe_seen")).count()
    assert n_missed == 0  # every inserted key must probe positive
