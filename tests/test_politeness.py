"""Politeness scheduler: budget, robots rules, crawl delays, and the
salted-ranking equivalence proof."""

from pyspark.sql import functions as F

from archive_query_log_spark.crawler import synth
from archive_query_log_spark.functions.ids import worklist_score
from archive_query_log_spark.operators import politeness, seen_set


def _scheduled(spark, salt_partitions=1, budget=8):
    frontier = synth.synth_frontier(spark, 2000, 300, 8)
    cand = frontier.withColumn(
        "score",
        worklist_score(
            F.col("archive.priority"), F.col("provider.priority"), F.col("id")
        ),
    )
    cand = seen_set.first_seen_in_batch(cand)
    allowed = politeness.apply_robots(cand, synth.synth_robots(spark), "url", "host")
    return politeness.schedule(
        allowed.withColumn("t0", F.to_timestamp(F.lit("2024-01-01 00:00:00"))),
        budget_waves=budget,
        salt_partitions=salt_partitions,
    )


def test_scored_worklist_order_and_limit(spark):
    """S1: pending-only, score-desc total order, batch take."""
    from archive_query_log_spark.operators.worklist import scored_worklist

    frontier = synth.synth_frontier(spark, 500, 100, 4)
    out = scored_worklist(frontier, flag="should_fetch", limit=50)
    rows = out.select("score", "id").collect()
    assert len(rows) == 50
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # archive-a rows (priority 10 vs 1) must dominate the head of the queue
    head = out.limit(10).select("archive.id").collect()
    assert sum(1 for r in head if r["id"] == "archive-a") >= 8


def test_validation_summary(spark):
    from archive_query_log_spark.crawler.fetch import (
        fetch_and_validate,
        validation_summary,
    )

    images = synth.synth_images(spark, 50, 4)
    sched = images.select("image_id")
    s = validation_summary(fetch_and_validate(sched, images)).collect()[0]
    assert s["fetched"] == 50
    assert s["ok_200"] == s["psnr_ok"] == s["caption_ok"] == s["phash_ok"] == 50


def test_budget_respected_per_host(spark):
    sched = _scheduled(spark)
    over = sched.groupBy("host").count().where(F.col("count") > 8).count()
    assert over == 0
    assert sched.agg(F.max("wave")).collect()[0][0] <= 7


def test_disallowed_prefix_filtered(spark):
    sched = _scheduled(spark)
    # h04 /search is disallowed in the robots fixture; h04's provider only
    # mints /search URLs → no h04 rows at all
    assert sched.where(F.col("host") == "h04.example.com").count() == 0
    assert sched.where(F.col("host") == "h03.example.com").count() > 0


def test_crawl_delay_applied(spark):
    sched = _scheduled(spark)
    rows = sched.where(
        (F.col("host") == "h07.example.com") & (F.col("wave") == 1)
    ).collect()
    for r in rows:  # h07 has a 30 s crawl delay
        assert r["dispatch_ts"].second == 30
    hot = sched.where(
        (F.col("host") == "h00.example.com") & (F.col("wave") == 1)
    ).collect()
    for r in hot:  # hot host fast lane: /img delay 2 s
        assert r["dispatch_ts"].second == 2


def test_salted_schedule_identical_to_unsalted(spark):
    plain = _scheduled(spark, salt_partitions=1)
    salted = _scheduled(spark, salt_partitions=8)
    key = lambda r: (r["host"], r["wave"], r["url_key"])  # noqa: E731
    a = sorted(map(key, plain.select("host", "wave", "url_key").collect()))
    b = sorted(map(key, salted.select("host", "wave", "url_key").collect()))
    assert a == b


def test_host_without_rules_gets_defaults(spark):
    """A host absent from the robots table is allowed with the reference's
    default 10 s delay (config.py:157-164 parity)."""
    frontier = spark.createDataFrame(
        [("id1", "https://unknown.example/x", "unknown.example", "k1")],
        "id string, url string, host string, url_key string",
    )
    robots = spark.createDataFrame(
        [("other.example", None, True, 5.0)],
        "host string, path_prefix string, allow boolean, crawl_delay_s double",
    )
    out = politeness.apply_robots(frontier, robots, "url", "host").collect()
    assert len(out) == 1 and out[0]["crawl_delay_s"] == 10.0


def test_schedule_equals_rate_limiter_simulation(spark):
    """Oracle simulator (SURVEY §7.2.5): replay candidates through a
    per-host 1-request-per-delay limiter (config.py:157-164 semantics, made
    deterministic) — the declarative (wave, dispatch_ts) schedule must equal
    the emission order and times of the imperative limiter."""
    import datetime as dt
    from collections import defaultdict

    sched = _scheduled(spark, budget=5)
    rows = sched.select(
        "host", "url_key", "score", "crawl_delay_s", "wave", "dispatch_ts"
    ).collect()
    t0 = dt.datetime(2024, 1, 1)
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r)
    for host, items in by_host.items():
        # imperative limiter: highest score first, one emission per delay
        items_by_score = sorted(items, key=lambda r: (-r["score"], r["url_key"]))
        for k, r in enumerate(items_by_score):
            assert r["wave"] == k, (host, r["url_key"])
            # limiter emits the k-th request at t0 + k·delay
            expected = t0 + dt.timedelta(seconds=int(k * r["crawl_delay_s"]))
            assert r["dispatch_ts"] == expected, (host, k)


def test_schedule_partitioning_invariant(spark):
    base = _scheduled(spark)
    cols = ["host", "wave", "url_key"]
    a = sorted(map(tuple, base.select(*cols).collect()))
    b = sorted(map(tuple, base.repartition(17).select(*cols).collect()))
    assert a == b
