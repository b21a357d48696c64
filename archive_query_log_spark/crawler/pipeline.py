"""The frontier + fetch scheduler pipeline (the north-star job).

One crawl *round* = one batch job (the reference's own incrementality model,
SURVEY.md §2.11 — worklist flags, not a stream processor):

    frontier ──pending∧valid∧200──▶ seen-filter (bloom shards → exact)
        ──▶ robots join ──▶ politeness schedule (salted per-host waves)
        ──▶ fetch+validate (mapInPandas over images join)
        ──▶ commits: fetches++, seen_keys++, seen_shards (rebuilt),
                     frontier (flags flipped), metrics++

Checkpoint/resume: every table is a SnapshotTable; a round commits in a fixed
order finishing with `frontier` (the worklist). A kill between commits is
safe: re-running the round re-selects still-pending rows and re-derives the
same deterministic IDs — replays are idempotent exactly as the reference's
create-if-absent writes are (SURVEY.md §1.4).

Reproducibility: all ordering derives from md5-based scores + url_key
tiebreaks → the schedule (wave, dispatch_ts per url) is identical at any
parallelism (tested local[8] vs local[32]).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_query_log_spark.crawler.fetch import fetch_and_validate
from archive_query_log_spark.operators import politeness, seen_set, worklist
from archive_query_log_spark.tables import SnapshotTable

T0 = "2024-01-01 00:00:00"


@dataclass
class CrawlConfig:
    budget_waves: int = 8           # per-host dispatch budget per round
    salt_partitions: int = 8        # hot-host window salting
    n_buckets: int = 32             # seen-set shard count
    seed: int = 42
    use_bloom: bool = True


@dataclass
class CrawlState:
    root: Path
    frontier: SnapshotTable = field(init=False)
    fetches: SnapshotTable = field(init=False)
    seen_keys: SnapshotTable = field(init=False)
    seen_shards: SnapshotTable = field(init=False)
    metrics: SnapshotTable = field(init=False)

    def __post_init__(self):
        self.root = Path(self.root)
        for name in ("frontier", "fetches", "seen_keys", "seen_shards", "metrics"):
            setattr(self, name, SnapshotTable(self.root / name))


def init_state(root: str | Path, frontier_df: DataFrame) -> CrawlState:
    state = CrawlState(Path(root))
    state.frontier.commit(frontier_df, op="overwrite", meta={"stage": "init"})
    return state


def candidates(frontier: DataFrame) -> DataFrame:
    """Pending ∧ valid-URL ∧ status-200 gate (F1/F7/F8) + queue score (W1)."""
    from archive_query_log_spark.functions import urls

    return (
        frontier.where(worklist.pending(F.col("should_fetch")))
        .where(urls.valid_url(F.col("url")))
        .where(F.col("status_code") == 200)
    )


def run_round(
    spark: SparkSession,
    state: CrawlState,
    images: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig | None = None,
    round_id: int = 0,
) -> dict:
    """Execute one crawl round; returns its metrics dict."""
    from archive_query_log_spark.functions.ids import worklist_score

    cfg = cfg or CrawlConfig()
    frontier = state.frontier.read(spark)

    cand = candidates(frontier).withColumn(
        "score",
        worklist_score(
            F.col("archive.priority"),
            F.col("provider.priority"),
            F.col("id"),
            seed=cfg.seed,
        ),
    )

    # seen-set filter: within-batch first-seen (A8) + shard/exact novelty
    cand = seen_set.first_seen_in_batch(cand, "url_key", "ts")
    seen = state.seen_keys.read(spark) if state.seen_keys.exists() else None
    shards = (
        state.seen_shards.read(spark)
        if (cfg.use_bloom and state.seen_shards.exists())
        else None
    )
    fresh = seen_set.filtered_new(cand, seen, shards, "url_key", cfg.n_buckets)

    # politeness: robots rules + salted per-host wave ranking
    allowed = politeness.apply_robots(fresh, robots, "url", "host")
    scheduled = politeness.schedule(
        allowed.withColumn("t0", F.to_timestamp(F.lit(T0))),
        budget_waves=cfg.budget_waves,
        salt_partitions=cfg.salt_partitions,
    ).drop("t0")

    # fetch + validate; cache: used for fetches commit, seen update, flags
    results = fetch_and_validate(scheduled, images)
    results.cache()

    state.fetches.commit(results, op="append", meta={"round": round_id})

    # seen-set update: exact keys append + bloom shard rebuild
    new_keys = results.select("url_key").dropDuplicates(["url_key"])
    state.seen_keys.commit(new_keys, op="append", meta={"round": round_id})
    if cfg.use_bloom:
        all_keys = state.seen_keys.read(spark)
        state.seen_shards.commit(
            seen_set.build_bloom_shards(
                all_keys, "url_key",
                seen_set.BloomConfig(n_buckets=cfg.n_buckets),
            ),
            op="overwrite",
            meta={"round": round_id},
        )

    # frontier flag flip (the reference's last_fetched/should_fetch update)
    fetched_ids = results.select("id").withColumn("_fetched", F.lit(True))
    updated = (
        frontier.join(fetched_ids, on="id", how="left")
        .withColumn(
            "should_fetch",
            F.when(F.col("_fetched"), F.lit(False)).otherwise(F.col("should_fetch")),
        )
        .withColumn(
            "last_fetched",
            F.when(F.col("_fetched"), F.current_timestamp()).otherwise(
                F.col("last_fetched")
            ),
        )
        .drop("_fetched")
    )
    state.frontier.commit(updated, op="overwrite", meta={"round": round_id})

    # lineage + metrics per (round, host-bucket partition)
    per_bucket = (
        results.withColumn(
            "bucket", F.pmod(F.xxhash64("host"), F.lit(cfg.n_buckets)).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("fetch_status") == 200, 1).otherwise(0)).alias("ok"),
            F.sum(
                F.when(
                    F.col("psnr_ok") & F.col("caption_ok") & F.col("phash_ok"), 1
                ).otherwise(0)
            ).alias("valid"),
            F.max("wave").alias("max_wave"),
        )
        .withColumn("round", F.lit(round_id))
    )
    state.metrics.commit(per_bucket, op="append", meta={"round": round_id})

    totals = results.agg(
        F.count("*").alias("fetched"),
        F.sum(F.when(F.col("fetch_status") == 200, 1).otherwise(0)).alias("ok"),
    ).collect()[0]
    results.unpersist()
    return {"round": round_id, "fetched": totals["fetched"], "ok": totals["ok"]}


def run(
    spark: SparkSession,
    state: CrawlState,
    images: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig | None = None,
    max_rounds: int = 10,
) -> list[dict]:
    """Drive rounds until the pending worklist is empty (or max_rounds)."""
    stats = []
    for r in range(max_rounds):
        n_pending = candidates(state.frontier.read(spark)).limit(1).count()
        if n_pending == 0:
            break
        stats.append(run_round(spark, state, images, robots, cfg, round_id=r))
        if stats[-1]["fetched"] == 0:
            break
    return stats
