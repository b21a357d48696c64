"""End-to-end crawl pipeline: convergence, validation, exactly-once resume."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from archive_query_log_spark.crawler import pipeline, synth


@pytest.fixture(scope="module")
def fixtures(spark):
    images = synth.synth_images(spark, 200, 8).cache()
    frontier = synth.synth_frontier(spark, 800, 200, 8).cache()
    robots = synth.synth_robots(spark)
    images.count(), frontier.count()
    return images, frontier, robots


def test_crawl_converges_and_validates(spark, fixtures):
    images, frontier, robots = fixtures
    root = tempfile.mkdtemp(prefix="t_crawl_")
    try:
        state = pipeline.init_state(root, frontier)
        cfg = pipeline.CrawlConfig(budget_waves=32, salt_partitions=4)
        stats = pipeline.run(spark, state, images, robots, cfg, max_rounds=6)
        assert stats and stats[0]["fetched"] > 0
        fetches = state.fetches.read(spark)
        agg = fetches.agg(
            F.count("*").alias("n"),
            F.min(F.col("psnr_ok").cast("int")).alias("psnr"),
            F.min(F.col("caption_ok").cast("int")).alias("cap"),
            F.min(F.col("phash_ok").cast("int")).alias("ph"),
            F.min("psnr_db").alias("minp"),
        ).collect()[0]
        assert agg["psnr"] == 1 and agg["cap"] == 1 and agg["ph"] == 1
        assert agg["minp"] >= 40.0
        # seen set: no duplicates ever fetched
        seen = state.seen_keys.read(spark)
        assert seen.count() == seen.distinct().count()
        assert fetches.select("url_key").distinct().count() == fetches.count()
        # politeness: within each round, per-host waves ≤ budget
        per = fetches.groupBy("host").agg(F.max("wave").alias("mw")).collect()
        assert all(r["mw"] < 32 for r in per)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_crash_resume_exactly_once(spark, fixtures):
    images, frontier, robots = fixtures
    cfg = pipeline.CrawlConfig(budget_waves=16)
    rootA = tempfile.mkdtemp(prefix="t_crashA_")
    rootB = tempfile.mkdtemp(prefix="t_crashB_")
    try:
        stateA = pipeline.init_state(rootA, frontier)
        pipeline.run_round(spark, stateA, images, robots, cfg, 0)
        # simulate a kill before the frontier flag-flip committed
        latest = sorted(stateA.frontier.snap_dir.glob("v*.json"))[-1]
        os.remove(latest)
        pipeline.run_round(spark, stateA, images, robots, cfg, 0)

        stateB = pipeline.init_state(rootB, frontier)
        pipeline.run_round(spark, stateB, images, robots, cfg, 0)

        a = sorted(r["url_key"] for r in stateA.seen_keys.read(spark).collect())
        b = sorted(r["url_key"] for r in stateB.seen_keys.read(spark).collect())
        assert a == b
        assert (
            stateA.fetches.read(spark).count() == stateB.fetches.read(spark).count()
        )
    finally:
        shutil.rmtree(rootA, ignore_errors=True)
        shutil.rmtree(rootB, ignore_errors=True)
