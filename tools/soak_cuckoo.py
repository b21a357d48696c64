"""Cuckoo seen-set soak: the 4-week-expiry DELETE leg under real load.

Round-6 soaked the Bloom path to 30M keys; this drives the deletion-capable
cuckoo path (the reference's re-fetch-after-REFETCH_DELTA semantics,
captures/__init__.py:28,163-176: stale keys leave the seen set and return
on re-fetch) at ≥10M keys:

  build 12M keys → probe 10M-row batch on BOTH layouts (broadcast vs
  bucket-cogrouped) → DELETE 3M stale keys → gate: every remaining member
  still probes True (zero false negatives), deleted keys read unseen up to
  the 16-bit-fingerprint fpp → RE-ADD the 3M via update_cuckoo_shards
  (in-place adds, no rebuild at this load) → gate: all 12M members True,
  occupancy exact, table sizes unchanged → final layout A/B digest-equal.

Membership ground truth is positional (key ki is a member iff i < bound),
so every gate is an exact count/digest with no joins. All digests via the
order/partition-invariant table_digest (md5-sum in DECIMAL).

Usage:  PYTHONPATH=/root/repo python tools/soak_cuckoo.py [--keys 12000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def key_df(spark, lo: int, hi: int, parts: int = 64):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi, 1, parts)
        .select(F.concat(F.lit("k"), F.col("id")).alias("url_key"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=12_000_000)
    ap.add_argument("--batch", type=int, default=10_000_000)
    ap.add_argument("--stale", type=int, default=3_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from archive_query_log_spark.operators import seen_set
    from archive_query_log_spark.session import get_spark
    from tools.submit_crawl import table_digest

    rec: dict = {
        "keys": args.keys, "batch": args.batch, "stale": args.stale,
        "n_buckets": args.buckets, "master": args.master, "stages": {},
    }

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 1)
        rec["stages"][name] = dt
        print(f"[soak] {name}: {dt}s", flush=True)
        return out

    spark = get_spark(app_name="soak-cuckoo", master=args.master,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    members = key_df(spark, 0, args.keys)

    shards = stage(
        "build_12M",
        lambda: seen_set.build_cuckoo_shards(
            members, "url_key", n_buckets=args.buckets
        ).localCheckpoint(),
    )
    total_bytes = seen_set.shard_total_bytes(shards, "cuckoo")
    rec["shard_total_mb"] = round(total_bytes / 1e6, 1)

    # 10M-row probe batch: half members, half not
    batch = key_df(
        spark, args.keys - args.batch // 2, args.keys + args.batch // 2
    ).localCheckpoint()

    def probe_digest(sh, b, layout: bool):
        out = seen_set.cuckoo_probe(
            b, sh, "url_key", args.buckets, broadcast_shards=layout,
            shard_size_bytes=total_bytes,
        )
        seen = out.where(F.col("maybe_seen"))
        return table_digest(seen, ("url_key",))

    d_bc = stage("probe_10M_broadcast", lambda: probe_digest(shards, batch, True))
    d_cg = stage("probe_10M_cogroup", lambda: probe_digest(shards, batch, False))
    assert d_bc == d_cg, f"layout divergence pre-delete: {d_bc} vs {d_cg}"
    rec["probe_digest_prefix"] = d_bc.split(":")[0]

    # every member row in the batch must probe True (no false negatives)
    n_mem = args.batch // 2
    mem_true = int(
        seen_set.cuckoo_probe(
            key_df(spark, args.keys - n_mem, args.keys), shards, "url_key",
            args.buckets, shard_size_bytes=total_bytes,
        ).where(F.col("maybe_seen")).count()
    )
    assert mem_true == n_mem, (mem_true, n_mem)

    # ---- DELETE leg: 3M stale keys (the 4-week expiry wave) -------------
    stale = key_df(spark, 0, args.stale)
    after_del = stage(
        "delete_3M",
        lambda: seen_set.cuckoo_delete_keys(
            shards, stale, "url_key", args.buckets
        ).localCheckpoint(),
    )
    occ = after_del.agg(F.sum("n").alias("n")).first()["n"]
    assert occ == args.keys - args.stale, occ
    rec["occupancy_after_delete"] = int(occ)

    remaining = key_df(spark, args.stale, args.keys)
    rem_true = stage(
        "gate_remaining_9M_no_false_negatives",
        lambda: int(
            seen_set.cuckoo_probe(
                remaining, after_del, "url_key", args.buckets,
            ).where(F.col("maybe_seen")).count()
        ),
    )
    assert rem_true == args.keys - args.stale, rem_true
    del_true = int(
        seen_set.cuckoo_probe(
            stale, after_del, "url_key", args.buckets
        ).where(F.col("maybe_seen")).count()
    )
    # deleted keys read unseen except residual 16-bit-fp collisions
    # (≈ 8 slots · 2^-16 ≈ 1.2e-4 of 3M ≈ 370 expected)
    rec["deleted_still_seen_fp"] = del_true
    assert del_true < 3000, del_true

    # ---- RE-ADD leg: the 3M return on re-fetch --------------------------
    upd = stage(
        "readd_3M_update_cuckoo_shards",
        lambda: seen_set.update_cuckoo_shards(
            after_del, stale, members, "url_key"
        ).localCheckpoint(),
    )
    occ2 = upd.agg(F.sum("n").alias("n")).first()["n"]
    assert occ2 == args.keys, occ2
    # capacity was sized for 12M — the re-add must be in-place, no rebuild
    m_before = {r["bucket"]: r["m"] for r in shards.select("bucket", "m").collect()}
    m_after = {r["bucket"]: r["m"] for r in upd.select("bucket", "m").collect()}
    assert m_after == m_before, "unexpected rebuild during re-add"
    rec["readd_in_place"] = True

    all_true = stage(
        "gate_all_12M_members_after_roundtrip",
        lambda: int(
            seen_set.cuckoo_probe(
                members, upd, "url_key", args.buckets
            ).where(F.col("maybe_seen")).count()
        ),
    )
    assert all_true == args.keys, all_true

    # ---- final layout A/B on the updated table --------------------------
    total2 = seen_set.shard_total_bytes(upd, "cuckoo")
    d2_bc = stage("final_probe_broadcast", lambda: probe_digest(upd, batch, True))
    d2_cg = stage("final_probe_cogroup", lambda: probe_digest(upd, batch, False))
    assert d2_bc == d2_cg, f"layout divergence post-roundtrip: {d2_bc} vs {d2_cg}"
    assert total2 == total_bytes
    rec["final_probe_digest"] = d2_bc
    rec["pre_delete_probe_digest"] = d_bc
    # the round trip restored every member: the member half of the batch is
    # identical; digests differ only if fp noise on the non-member half
    # changed (possible: re-add may place fingerprints in alternate slots)
    rec["digest_roundtrip_equal"] = d2_bc == d_bc

    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
