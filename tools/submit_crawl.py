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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--frontier-size", type=int, default=100_000)
    ap.add_argument("--images", type=int, default=10_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--budget-waves", type=int, default=16)
    ap.add_argument("--master", default=None)
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

    cfg = pipeline.CrawlConfig(budget_waves=args.budget_waves)
    stats = pipeline.run(spark, state, images, robots, cfg, max_rounds=args.rounds)
    print(json.dumps({"rounds": stats}))
    spark.stop()


if __name__ == "__main__":
    main()
