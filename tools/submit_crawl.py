"""spark-submit entry point for the crawl pipeline (north_rule launch shape).

Usage (what a cluster deployment runs; tools/submit_demo.sh wraps it):

    zip -r /tmp/aql_spark.zip archive_query_log_spark
    spark-submit --master <cluster> --py-files /tmp/aql_spark.zip \
        tools/submit_crawl.py --workdir /data/crawl --frontier-size 1000000 \
        --images 100000 --rounds 3 --budget-waves 16

The job synthesizes (or resumes) the frontier state under --workdir and runs
crawl rounds; re-submitting with the same --workdir resumes from the last
committed snapshots (exactly-once, see crawler/pipeline.py).
"""

from __future__ import annotations

import argparse
import json

# fetch-log columns that define the crawl's observable behavior (what the
# hash-gated crawl_digest_3round entry pins). fetched_at is ALWAYS
# excluded from the digest (it is wall-clock when --nows is absent, and
# this parity gate does not cover its stamping either way)
DIGEST_COLS = (
    "round", "id", "url_key", "host", "wave", "crawl_delay_s",
    "is_refresh", "fetch_status", "psnr_ok", "caption_ok", "phash_ok",
)


def table_digest(df, cols) -> str:
    """Order-independent distributed digest: per-row md5 over the
    canonicalized columns, summed as 60-bit ints in DECIMAL(38,0) (exact,
    commutative — no collect, works at any scale)."""
    from pyspark.sql import functions as F

    h = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
                for c in cols
            ],
        )
    )
    row = df.agg(
        F.sum(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)")
        ).alias("d"),
        F.count("*").alias("n"),
    ).first()
    return f"{row['n']}:{row['d']}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--frontier-size", type=int, default=100_000)
    ap.add_argument("--images", type=int, default=10_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--budget-waves", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--nows",
        default=None,
        help="comma-separated 'YYYY-MM-DD HH:MM:SS' re-poll clocks, one per"
        " round — makes the run fully deterministic (goldens-fixture shape)",
    )
    ap.add_argument(
        "--digest",
        action="store_true",
        help="append order-independent digests of the fetch log and the"
        " final seen set to the stats line (bit-for-bit parity evidence"
        " between launch shapes)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from archive_query_log_spark.crawler import pipeline, synth

    builder = SparkSession.builder.appName("aql-spark-crawl")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    images = synth.synth_images(spark, args.images).cache()
    robots = synth.synth_robots(spark)
    state = pipeline.CrawlState(args.workdir)
    if not state.frontier.exists():
        frontier = synth.synth_frontier(spark, args.frontier_size, args.images)
        state = pipeline.init_state(args.workdir, frontier)

    if args.nows:
        nows = [s.strip() for s in args.nows.split(",")]
        # nows is indexed by ABSOLUTE round id (so a resume keeps each
        # round's clock stable) — it must cover every round up to --rounds
        if len(nows) < args.rounds:
            raise SystemExit(
                f"--nows supplies {len(nows)} clocks but --rounds"
                f" {args.rounds} are indexed absolutely (round id ->"
                " clock); pass one clock per round, including already-"
                "completed rounds when resuming"
            )
        stats = []
        start = pipeline.next_round_id(state)
        for rid in range(start, args.rounds):
            stats.append(
                pipeline.run_round(
                    spark, state, images, robots,
                    pipeline.CrawlConfig(
                        budget_waves=args.budget_waves, now=nows[rid]
                    ),
                    rid,
                )
            )
    else:
        cfg = pipeline.CrawlConfig(budget_waves=args.budget_waves)
        stats = pipeline.run(
            spark, state, images, robots, cfg, max_rounds=args.rounds
        )
    out = {"rounds": stats}
    if args.digest:
        out["fetches_digest"] = table_digest(
            state.fetches.read(spark), DIGEST_COLS
        )
        out["seen_digest"] = table_digest(
            state.seen_keys.read(spark), ("url_key",)
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
