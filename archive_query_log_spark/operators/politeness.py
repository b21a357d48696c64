"""Per-host politeness priority queue (north_rule W2; SURVEY.md §1.5, §2.5).

The reference enforces politeness at runtime — 1 request / 10 s / host via an
in-process rate limiter (/root/reference/archive_query_log/config.py:157-167) —
and orders work by priority+random scoring (captures/__init__.py:177-182).
Here the same contract becomes a *declarative schedule*: every candidate URL
gets a (wave, dispatch_ts) so that per host at most one URL is dispatched per
crawl-delay window, higher-scored URLs first. The north_rule adds robots.txt
rules + per-host crawl delay as a first-class rules table.

Scale design:
- The per-host ranking is a window over ``host`` — a skewed shuffle when one
  host owns 30%+ of the frontier. ``salt_partitions`` > 1 enables a two-phase
  exact top-k: rank within (host, salt) first, keep only ranks ≤ budget, then
  re-rank the survivors per host. The heavy first phase spreads the hot host
  over N partitions; the second phase sees ≤ salt·budget rows per host.
  Semantics are exactly identical to the unsalted plan (proved in tests).
- All ordering keys are deterministic and partition-invariant (md5-based
  score, url_key tiebreak): the schedule is byte-identical at local[8] and
  local[32] — the BASELINE.json reproducibility requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_S = 10.0  # reference parity: 1 req / 10 s (config.py:157-164)


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Join robots rules onto the frontier; drop disallowed URLs; attach
    ``crawl_delay_s``.

    robots schema: host, path_prefix, allow boolean, crawl_delay_s double.
    Longest matching path_prefix wins (standard robots precedence); hosts with
    no rules default to allow + 10 s (reference's flat limiter).
    The rules table is tiny (one row per host×prefix) → broadcast join, no
    shuffle of the frontier.
    """
    rules = robots.select(
        F.col("host").alias("_r_host"),
        F.col("path_prefix").alias("_r_prefix"),
        F.col("allow").alias("_r_allow"),
        F.col("crawl_delay_s").alias("_r_delay"),
    )
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    joined = frontier.withColumn("_path", path).join(
        F.broadcast(rules), on=F.col(host_col) == F.col("_r_host"), how="left"
    )
    matches = joined.where(
        F.col("_r_prefix").isNull() | F.col("_path").startswith(F.col("_r_prefix"))
    )
    # longest matching prefix per frontier row wins (key on the unique id —
    # url_key can repeat across captures of the same URL)
    w = Window.partitionBy("id").orderBy(
        F.desc(F.length(F.coalesce(F.col("_r_prefix"), F.lit("")))),
        F.asc("_r_prefix"),
    )
    best = (
        matches.withColumn("_rule_rank", F.row_number().over(w))
        .where(F.col("_rule_rank") == 1)
        .withColumn(
            "_delay", F.coalesce(F.col("_r_delay"), F.lit(DEFAULT_CRAWL_DELAY_S))
        )
        .withColumn("_allowed", F.coalesce(F.col("_r_allow"), F.lit(True)))
    )
    return (
        best.where(F.col("_allowed"))
        .drop("_r_host", "_r_prefix", "_r_allow", "_r_delay")
        .drop("_rule_rank", "_path", "_allowed")
        .withColumnRenamed("_delay", "crawl_delay_s")
    )


def schedule(
    candidates: DataFrame,
    host_col: str = "host",
    score_col: str = "score",
    key_col: str = "url_key",
    delay_col: str | None = "crawl_delay_s",
    t0_col: str = "t0",
    budget_waves: int | None = None,
    salt_partitions: int = 1,
) -> DataFrame:
    """Assign (wave, dispatch_ts) per candidate: the politeness queue.

    wave k = k-th URL of its host in score order (0-based);
    dispatch_ts = t0 + k · crawl_delay(host).
    """
    order = [F.desc(score_col), F.asc(key_col)]
    df = candidates
    if budget_waves is not None and salt_partitions > 1:
        # phase 1: exact per-(host,salt) top-budget prune, spreads hot hosts
        df = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_partitions))
        )
        w_salt = Window.partitionBy(host_col, "_salt").orderBy(*order)
        df = (
            df.withColumn("_salt_rank", F.row_number().over(w_salt))
            .where(F.col("_salt_rank") <= budget_waves)
            .drop("_salt", "_salt_rank")
        )
    w = Window.partitionBy(host_col).orderBy(*order)
    out = df.withColumn("wave", F.row_number().over(w) - F.lit(1))
    if budget_waves is not None:
        out = out.where(F.col("wave") < budget_waves)
    delay = F.col(delay_col) if delay_col else F.lit(DEFAULT_CRAWL_DELAY_S)
    out = out.withColumn(
        "dispatch_ts",
        F.timestamp_add(
            "SECOND",
            (F.col("wave") * delay).cast("long"),
            F.col(t0_col),
        ),
    )
    return out
