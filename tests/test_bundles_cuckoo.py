"""Bundle store roundtrip (S5-S8) + cuckoo-filter seen-set shards."""

import tempfile

import numpy as np
from pyspark.sql import functions as F

from archive_query_log_spark.crawler import synth
from archive_query_log_spark.operators import seen_set
from archive_query_log_spark.sources import bundles


def test_bundle_roundtrip_and_capping(spark):
    images = synth.synth_images(spark, 100, 4).cache()
    with tempfile.TemporaryDirectory() as d:
        ptrs = bundles.write_bundles(
            images, d, n_buckets=4, max_bytes=8 * 1024
        ).cache()
        assert ptrs.count() == 100
        # multiple bundle files per bucket (cap forces rollover)
        n_files = ptrs.select("file").distinct().count()
        assert n_files > 4
        back = bundles.read_ranged(spark, ptrs)
        a = {r["image_id"]: bytes(r["bytes"]) for r in back.collect()}
        b = {
            r["image_id"]: bytes(r["bytes"])
            for r in images.select("image_id", "bytes").collect()
        }
        assert a == b


def test_cuckoo_shard_basics():
    keys = np.arange(1, 5000, dtype=np.int64) * 2654435761
    shard = seen_set.CuckooShard(len(keys))
    shard.insert_many(keys)
    assert shard.contains_many(keys).all()  # zero false negatives
    other = (np.arange(1, 2000, dtype=np.int64) * 40503 + 17)
    fpp = shard.contains_many(other).mean()
    assert fpp < 0.05
    # delete half; deleted keys must be gone, the rest intact
    shard.delete_many(keys[:2500])
    assert not shard.contains_many(keys[:2500]).all()
    assert shard.contains_many(keys[2500:]).all()
    # serialization roundtrip
    clone = seen_set.CuckooShard.from_bytes(shard.to_bytes(), shard.m)
    assert clone.contains_many(keys[2500:]).all()


def test_cuckoo_probe_and_delete_dataframe(spark):
    keys = synth.synth_frontier(spark, 1200, 300, 4).select("url_key").distinct()
    keys.cache()
    shards = seen_set.build_cuckoo_shards(keys, "url_key", n_buckets=8).cache()
    probed = seen_set.cuckoo_probe(keys, shards, "url_key", 8)
    assert probed.where(~F.col("maybe_seen")).count() == 0
    # retract 100 keys → they must probe negative afterwards
    retract = keys.orderBy("url_key").limit(100).cache()
    updated = seen_set.cuckoo_delete_keys(shards, retract, "url_key", 8)
    reprobed = seen_set.cuckoo_probe(retract, updated, "url_key", 8)
    # cuckoo deletion is exact for inserted keys: all retracted gone unless a
    # colliding fingerprint of ANOTHER live key sits in the same bucket
    still = reprobed.where(F.col("maybe_seen")).count()
    assert still <= 2  # fp-collision tolerance
    kept = keys.join(retract, "url_key", "left_anti")
    kept_probe = seen_set.cuckoo_probe(kept, updated, "url_key", 8)
    assert kept_probe.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_probe_partitioned_path_matches_broadcast(spark):
    """broadcast_shards=False (bucket-cogrouped, the 10^10-key layout where
    26 GB of fingerprint tables outgrow a broadcast) returns exactly the
    broadcast path's verdicts — same parity pin as the Bloom twin,
    including rows whose bucket has NO shard (sparse state)."""
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "url_key string"
    )
    probe_in = spark.createDataFrame(
        [(f"k{i}",) for i in range(200, 700)], "url_key string"
    ).repartition(5)
    # sparse shard table: only buckets 0-3 of 8 exist
    lo = (
        seen_set.with_hashes(keys, "url_key", 8)
        .where(F.col("bucket") < 4)
        .select("url_key")
        .cache()
    )
    shards = seen_set.build_cuckoo_shards(lo, "url_key", n_buckets=8)
    lo_keys = {r["url_key"] for r in lo.collect()}
    results = {}
    for bs in (True, False, None):  # None = auto (selects broadcast here)
        results[bs] = {
            (r["url_key"], r["maybe_seen"])
            for r in seen_set.cuckoo_probe(
                probe_in, shards, "url_key", broadcast_shards=bs
            ).collect()
        }
    assert results[True] == results[False] == results[None]
    a = results[True]
    assert len(a) == 500
    assert all(ms for k, ms in a if k in lo_keys)  # no false negatives
    missing_bucket = {
        (k, ms) for k, ms in a if int(k[1:]) < 400 and k not in lo_keys
    }
    assert missing_bucket and all(not ms for _, ms in missing_bucket)


def test_approx_distinct_tolerance(spark):
    ev = spark.range(50_000).select(
        (F.col("id") % 9173).alias("u")
    )
    approx = ev.agg(F.approx_count_distinct("u", 0.02).alias("a")).collect()[0]["a"]
    assert abs(approx - 9173) / 9173 < 0.05


def test_update_cuckoo_shards_add_and_rebuild(spark):
    """The 4-week-expiry round trip at fixture scale: delete stale keys,
    re-add on re-fetch via update_cuckoo_shards — in-place adds while
    capacity holds, per-bucket rebuild on overflow, adds-only buckets
    routed to the rebuild leg, zero false negatives throughout."""
    base = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "url_key string"
    )
    shards = seen_set.build_cuckoo_shards(base, "url_key", n_buckets=4).cache()

    # expiry wave: retract 150 keys, occupancy decremented
    stale = spark.createDataFrame(
        [(f"k{i}",) for i in range(150)], "url_key string"
    )
    after_del = seen_set.cuckoo_delete_keys(shards, stale, "url_key", 4).cache()
    n0 = {r["bucket"]: r["n"] for r in shards.select("bucket", "n").collect()}
    n1 = {r["bucket"]: r["n"] for r in after_del.select("bucket", "n").collect()}
    assert sum(n0.values()) == 400 and sum(n1.values()) == 250

    # re-fetch wave: re-add the 150 + 50 brand-new keys (fits capacity ->
    # in-place adds, same m everywhere)
    readd = spark.createDataFrame(
        [(f"k{i}",) for i in range(150)] + [(f"x{i}",) for i in range(50)],
        "url_key string",
    )
    all_keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)] + [(f"x{i}",) for i in range(50)],
        "url_key string",
    )
    upd = seen_set.update_cuckoo_shards(after_del, readd, all_keys, "url_key").cache()
    m0 = {r["bucket"]: r["m"] for r in shards.select("bucket", "m").collect()}
    m1 = {r["bucket"]: r["m"] for r in upd.select("bucket", "m").collect()}
    assert m1 == m0  # no rebuild needed at this load
    probe = seen_set.cuckoo_probe(all_keys, upd, "url_key", 4)
    assert probe.where(~F.col("maybe_seen")).count() == 0  # no false negatives
    n2 = {r["bucket"]: r["n"] for r in upd.select("bucket", "n").collect()}
    assert sum(n2.values()) == 450

    # overflow wave: 4000 new keys into the same 4 buckets -> every bucket
    # crosses the 1.3x headroom and is rebuilt at a larger m from all_keys
    big = spark.createDataFrame(
        [(f"y{i}",) for i in range(4000)], "url_key string"
    )
    all2 = all_keys.unionByName(big)
    upd2 = seen_set.update_cuckoo_shards(upd, big, all2, "url_key").cache()
    m2 = {r["bucket"]: r["m"] for r in upd2.select("bucket", "m").collect()}
    assert all(m2[b] > m1[b] for b in m2)
    assert seen_set.cuckoo_probe(all2, upd2, "url_key", 4).where(
        ~F.col("maybe_seen")
    ).count() == 0
    # non-members mostly read unseen (fpp sanity, 16-bit fingerprints)
    other = spark.createDataFrame(
        [(f"z{i}",) for i in range(2000)], "url_key string"
    )
    fp = seen_set.cuckoo_probe(other, upd2, "url_key", 4).where(
        F.col("maybe_seen")
    ).count()
    assert fp < 20


def test_update_cuckoo_shards_adds_only_bucket(spark):
    """A bucket with adds but no existing shard row must be BUILT (the
    m-IS-NULL leg), not dropped — same contract as update_bloom_shards."""
    lo = spark.createDataFrame(
        [(f"k{i}",) for i in range(200)], "url_key string"
    )
    hashed = seen_set.with_hashes(lo, "url_key", 8)
    present = hashed.where(F.col("bucket") < 4).select("url_key").cache()
    shards = seen_set.build_cuckoo_shards(present, "url_key", n_buckets=8)
    # adds hit ALL 8 buckets; 4 of them have no shard yet
    upd = seen_set.update_cuckoo_shards(shards, lo, lo, "url_key")
    assert upd.select("bucket").distinct().count() == 8
    assert seen_set.cuckoo_probe(lo, upd, "url_key", 8).where(
        ~F.col("maybe_seen")
    ).count() == 0
