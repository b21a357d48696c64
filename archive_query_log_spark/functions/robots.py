"""robots.txt text → politeness rules table (north_rule: "per-host
politeness priority queue (robots.txt rules + crawl-delay budget)").

The reference never parses robots.txt — it enforces a flat 1-request/10 s
limiter per host (config.py:157-167); the north rule promotes robots to a
first-class input. This module closes the text→rules gap: raw robots.txt
bodies (fetched like any capture) parse into the exact rules schema
``operators/politeness.py:apply_robots`` consumes
(host, path_prefix, allow, crawl_delay_s).

Semantics (RFC 9309 / Google flavor, documented where they diverge from
CPython's urllib.robotparser):

- Groups: consecutive ``User-agent:`` lines open a group; the group chosen
  for an agent is the one with the LONGEST agent token that is a
  case-insensitive prefix of the agent name, falling back to ``*``. All
  groups with that same token are merged (RFC 9309 §2.2.1).
- Rules: ``Allow:`` / ``Disallow:`` path prefixes. An empty ``Disallow:``
  means allow-everything and emits no rule. Precedence is LONGEST MATCHING
  PREFIX, allow/disallow decided by that rule — the RFC/Google rule,
  implemented downstream by apply_robots' longest-prefix pick. (CPython's
  robotparser uses first-match-in-file-order instead; the differential
  test restricts to prefix-free rule sets where both agree.)
- Wildcards: a trailing ``*`` is dropped (prefix-equivalent). Patterns
  with an interior ``*`` or an anchor ``$`` are not expressible as pure
  prefixes: a Disallow is truncated at the first special character
  (crawl-safe: blocks a superset), an Allow with specials is dropped
  (crawl-safe: allows less). Both choices are conservative for a crawler.
- ``Crawl-delay: N`` becomes a host-wide (path_prefix=NULL, allow=TRUE,
  delay) row — NULL prefix matches everything and sorts at the lowest
  precedence in apply_robots, exactly the intended "default for the host".
- Lines are ``key: value`` case-insensitive on the key; ``#`` comments and
  unknown keys (Sitemap, Host, ...) are ignored.

Spark shape: one Arrow-batched UDF (robots.txt bodies are small; parsing
is string work) returning the rules array, exploded into the politeness
schema — map-only, no shuffle; the rules table is then broadcast by
apply_robots as before.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_txt", "robots_rules_udf", "robots_table_from_txt"]


def _clean_pattern(path: str, allow: bool) -> str | None:
    """Reduce a robots path pattern to a pure prefix (see module doc).
    '?' is treated like the wildcards: apply_robots matches the URL PATH
    only (no query), so a query-bearing pattern is un-expressible — a
    Disallow truncates (blocks a superset), an Allow drops (allows less).
    A Disallow that reduces to EMPTY ('*', '$', '*foo') means
    block-everything → prefix '/' (dropping it would flip it to
    allow-everything)."""
    if path.endswith("*"):
        path = path.rstrip("*")
    for special in ("*", "$", "?"):
        if special in path:
            if allow:
                return None  # conservative: drop un-expressible Allow
            path = path.split(special, 1)[0]  # conservative: block superset
    if path == "":
        return None if allow else "/"
    return path


def parse_robots_txt(
    text: str | None, user_agent: str = "*"
) -> list[tuple[str | None, bool, float | None]]:
    """Parse one robots.txt body → [(path_prefix|None, allow, delay|None)]
    for ``user_agent``. Missing/empty body → no rules (allow-all, default
    delay — the reference's flat-limiter behavior)."""
    if not text:
        return []
    agent = user_agent.lower()
    # pass 1: collect groups as (agent_tokens, rules, delay)
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            if value:  # a malformed empty token would prefix-match EVERY
                cur_agents.append(value.lower())  # agent and hijack groups
            continue
        if key in ("allow", "disallow"):
            in_agent_run = False  # only RULE lines end a user-agent run —
            # unknown keys (Sitemap, Host, ...) must not split a group
            # (RFC 9309 §2.2: unrecognized lines are ignored entirely)
            allow = key == "allow"
            if value == "" and not allow:
                continue  # empty Disallow = allow everything, no rule
            prefix = _clean_pattern(value, allow)
            if prefix is not None:
                cur_rules.append((prefix, allow))
        elif key == "crawl-delay":
            in_agent_run = False
            try:
                delay_v = float(value)
            except ValueError:
                continue
            # guard nan/inf/negative — NaN would poison the politeness
            # tie-breaks and dispatch arithmetic downstream
            if math.isfinite(delay_v) and delay_v >= 0:
                cur_delay = delay_v
    flush()

    # pass 2: pick the longest agent token that prefixes user_agent; merge
    # all groups carrying that token (RFC 9309 §2.2.1)
    best_token = None
    for agents, _, _ in groups:
        for tok in agents:
            if tok == "*" or agent.startswith(tok):
                if (
                    best_token is None
                    or (tok != "*" and (best_token == "*" or len(tok) > len(best_token)))
                ):
                    best_token = tok
    if best_token is None:
        return []
    merged: list[tuple[str, bool]] = []
    delay: float | None = None
    for agents, grules, gdelay in groups:
        if best_token in agents:
            merged.extend(grules)
            if gdelay is not None:
                delay = gdelay
    # the group's Crawl-delay rides on EVERY rule row: apply_robots reads
    # the delay off the winning (longest-prefix) rule, so a null there
    # would silently fall back to the 10 s default even though the host
    # declared one; the (None, ...) row covers paths no rule matches
    rules: list[tuple[str | None, bool, float | None]] = [
        (p, a, delay) for p, a in merged
    ]
    if delay is not None:
        rules.append((None, True, delay))
    return rules


_RULES_TYPE = "array<struct<prefix: string, allow: boolean, delay: double>>"


def robots_rules_udf(user_agent: str = "*"):
    """Arrow UDF: robots.txt body → rules array for ``user_agent``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_RULES_TYPE)
    def _parse(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [parse_robots_txt(t, user_agent) for t in texts], dtype=object
        )

    return _parse


def robots_table_from_txt(
    df: DataFrame,
    host: Column | str = "host",
    robots_txt: Column | str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) table → the politeness rules schema
    (host, path_prefix, allow, crawl_delay_s) apply_robots consumes.
    Hosts whose body yields no rules emit no rows — apply_robots already
    defaults them to allow + the reference's 10 s delay. Map-only."""
    h = F.col(host) if isinstance(host, str) else host
    t = F.col(robots_txt) if isinstance(robots_txt, str) else robots_txt
    exploded = df.select(
        h.alias("host"),
        F.explode(robots_rules_udf(user_agent)(t)).alias("_r"),
    )
    return exploded.select(
        "host",
        F.col("_r.prefix").alias("path_prefix"),
        F.col("_r.allow").alias("allow"),
        F.col("_r.delay").alias("crawl_delay_s"),
    )
