"""Image-phash near-dup soak: 10M 64-bit signatures through the
pigeonhole join — the image half of the round-7 "one more decade" item.

Reference semantics being scaled: the image-dedup path (phash →
hamming_near_pairs, the machinery behind the gated `img_phash_near_dup` /
`img_phash_cluster` / `video_near_dup` entries) whose fixtures are ~1k
rows. At 10M rows the interesting physics appear:

1. **Single-chunk keys stop working — by density, not skew.** 64-bit
   sigs / 4 chunks = 16-bit keys → avg bucket n/2^16 ≈ 153 at 10M rows →
   the census predicts ~3e9 candidate pairs. No hot-key cap fixes an
   AVERAGE; the `candidate_budget` guard must refuse in seconds instead
   of attempting a ~100 GB shuffle.
2. **The Manku (WWW'07) multi-chunk key restores tractability.**
   n_chunks=6, combo_k=3 → C(6,3)=20 tables keyed on 30 bits → avg
   bucket ≈ 0.01 → candidates ≈ within-family pairs + ~1M background.
3. **Recall stays EXACT** (pigeonhole: ≤3 dirty chunks leave ≥3 clean →
   an all-clean 3-combo exists), gated here with no tolerance: the
   expected pair set is computed analytically (signatures are minted as
   2.5M families of 4 variants with ≤2-bit jitter; within-family pairwise
   hamming via a per-family self-join) and anti-joined against the
   operator's output — missing MUST be 0.

Usage: PYTHONPATH=/root/repo python tools/soak_phash.py [--n 10000000]
Prints one JSON record; every gate is exact (counts / anti-join zeros /
order-invariant digest).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def sig_table(spark, n: int, parts: int = 64):
    """n rows (id, base_id, sig): families of 4 variants per base.
    base sig = xxhash64('b'||base_id); variant v>0 flips bit
    (base_id*7 + v*13) % 64 — within-family hamming ≤ 2, cross-family
    pairs are uniform-random 64-bit (P(h≤3) ≈ 2.4e-15)."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, parts).select(
        F.col("id"),
        F.expr("id DIV 4").alias("base_id"),
        (F.col("id") % 4).cast("int").alias("v"),
    )
    base = F.xxhash64(F.concat(F.lit("b"), F.col("base_id")))
    # SQL shiftleft takes column args; the pyspark wrapper wants a literal
    flip = F.expr(
        "shiftleft(cast(1 as bigint),"
        " cast((base_id * 7 + v * 13) % 64 as int))"
    )
    sig = F.when(F.col("v") == 0, base).otherwise(
        base.bitwiseXOR(flip)
    )
    return df.select("id", "base_id", sig.alias("sig"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from archive_query_log_spark.operators import dedup
    from archive_query_log_spark.session import get_spark
    from tools.submit_crawl import table_digest

    rec: dict = {"n": args.n, "max_hamming": args.max_hamming,
                 "master": args.master, "stages": {}}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        rec["stages"][name] = round(time.perf_counter() - t0, 1)
        print(f"[soak] {name}: {rec['stages'][name]}s", file=sys.stderr)
        return out

    spark = get_spark(app_name="soak-phash", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    sigs = sig_table(spark, args.n).localCheckpoint()
    timed("mint_sigs", lambda: sigs.count())

    # --- 1. the census that kills single-chunk keys at this decade ------
    c1 = timed("census_single_chunk", lambda: dedup.hamming_candidate_census(
        sigs, sig_col="sig", bits=64, n_chunks=4, combo_k=1,
        max_chunk_df=1000))
    rec["census_single_chunk"] = c1
    # and the guard refusing the infeasible plan in census-time, not
    # shuffle-time (ValueError is the CONTRACT, same as CC non-converge)
    budget = 100_000_000

    def _guarded():
        try:
            dedup.hamming_near_pairs(
                sigs, sig_col="sig", bits=64, max_hamming=3, n_chunks=4,
                combo_k=1, checkpoint=False, candidate_budget=budget)
            return ("NO-RAISE (BUG at this n)"
                    if c1["candidate_pairs"] > budget
                    else f"under budget at n={args.n}, no raise (correct)")
        except ValueError as e:
            return str(e)[:120]
    rec["budget_guard"] = timed("budget_guard_refusal", _guarded)

    # --- 2. the combo census + the actual join --------------------------
    c2 = timed("census_combo_6_3", lambda: dedup.hamming_candidate_census(
        sigs, sig_col="sig", bits=64, n_chunks=6, combo_k=3,
        max_chunk_df=1000))
    rec["census_combo_6_3"] = c2

    # localCheckpoint is EAGER — time construction+materialization as one
    pairs = timed("combo_join_10M", lambda: dedup.hamming_near_pairs(
        sigs, sig_col="sig", bits=64, max_hamming=args.max_hamming,
        n_chunks=6, combo_k=3, max_chunk_df=1000, checkpoint=False,
    ).localCheckpoint())
    rec["pairs_found"] = timed("pairs_count", lambda: pairs.count())

    # --- 3. exact recall gate: analytic within-family expected set ------
    fam = sigs.select("base_id", F.col("id").alias("ida"),
                      F.col("sig").alias("siga"))
    fam2 = sigs.select("base_id", F.col("id").alias("idb"),
                       F.col("sig").alias("sigb"))
    expected = (
        fam.join(fam2, "base_id")
        .where(F.col("ida") < F.col("idb"))
        .select(
            F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
            F.bit_count(F.col("siga").bitwiseXOR(F.col("sigb")))
            .alias("hamming"))
        .where(F.col("hamming") <= args.max_hamming)
    )
    rec["expected_within_family"] = timed(
        "expected_set", lambda: expected.count())
    missing = timed("recall_anti_join", lambda: expected.join(
        pairs, ["id_a", "id_b"], "left_anti").count())
    rec["missing_expected_pairs"] = missing
    assert missing == 0, f"recall gate FAILED: {missing} expected pairs lost"

    # cross-family survivors are precision-filtered to hamming<=3 by the
    # operator itself; count them (expected ~0 for uniform xxhash bases)
    rec["cross_family_pairs"] = rec["pairs_found"] - (
        rec["expected_within_family"])
    rec["pair_digest"] = timed("pair_digest", lambda: table_digest(
        pairs, ["id_a", "id_b", "hamming"]))

    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
