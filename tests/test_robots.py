"""robots.txt text parsing → politeness rules (functions/robots.py).

Three derivations: hand fixtures pinning the documented RFC 9309-flavor
semantics, a differential against CPython's urllib.robotparser restricted
to rule sets where first-match-in-file-order and longest-prefix-match
provably agree (prefix-free rule sets), and end-to-end through
apply_robots on Spark.
"""

from __future__ import annotations

import random
import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from archive_query_log_spark.functions.robots import (
    parse_robots_txt,
    robots_table_from_txt,
)

FIXTURE = """
# comment line
User-agent: bigbot
Disallow: /private
Crawl-delay: 30

User-agent: *
Allow: /public/
Disallow: /tmp/
Disallow: /search*
Disallow: /a/*/b
Allow: /cgi*/ok
Crawl-delay: 2.5
Sitemap: https://example.com/sitemap.xml
"""


def test_fixture_semantics_star_agent():
    rules = parse_robots_txt(FIXTURE, "*")
    # trailing-* dropped; interior-* Disallow truncated (crawl-safe);
    # interior-* Allow dropped (crawl-safe); delay rides every row + a
    # host-wide null-prefix row
    assert rules == [
        ("/public/", True, 2.5),
        ("/tmp/", False, 2.5),
        ("/search", False, 2.5),
        ("/a/", False, 2.5),
        (None, True, 2.5),
    ]


def test_fixture_semantics_specific_agent_wins():
    # longest matching agent token beats '*' (RFC 9309 §2.2.1); group merge
    rules = parse_robots_txt(FIXTURE, "BigBot/2.1")
    assert rules == [("/private", False, 30.0), (None, True, 30.0)]


def test_agent_token_specificity_and_merge():
    txt = """
User-agent: a
Disallow: /x
User-agent: ab
Disallow: /y
User-agent: ab
Allow: /y/ok
"""
    # 'ab' is the longer matching token for agent 'abc'; both 'ab' groups merge
    assert parse_robots_txt(txt, "abc") == [
        ("/y", False, None), ("/y/ok", True, None)
    ]
    assert parse_robots_txt(txt, "a9") == [("/x", False, None)]


def test_empty_disallow_and_missing_body():
    assert parse_robots_txt("User-agent: *\nDisallow:", "*") == []
    assert parse_robots_txt(None, "*") == []
    assert parse_robots_txt("", "*") == []
    # no matching group at all
    assert parse_robots_txt("User-agent: other\nDisallow: /", "me") == []


def _decision(rules, path):
    """The downstream longest-prefix decision (apply_robots semantics)."""
    applicable = [r for r in rules if r[0] is None or path.startswith(r[0])]
    if not applicable:
        return True
    best = max(applicable, key=lambda r: -1 if r[0] is None else len(r[0]))
    return best[1]


def test_differential_vs_robotparser_on_prefix_free_sets():
    """On PREFIX-FREE rule sets (no rule path is a prefix of another),
    first-match-in-file-order (urllib.robotparser) and longest-prefix-match
    (this repo / RFC 9309) provably coincide — at most one rule can match
    any URL. 200 random robots files × 50 URLs each must agree exactly."""
    rng = random.Random(7)
    segs = ["alpha", "beta", "gamma", "delta", "x", "y7", "img", "api"]
    for trial in range(200):
        # distinct first segments make the rule set prefix-free
        first = rng.sample(segs, k=rng.randint(1, 5))
        rules = []
        for s in first:
            depth = rng.randint(0, 2)
            path = "/" + s + "".join(
                "/" + rng.choice(segs) for _ in range(depth)
            )
            rules.append((path, rng.random() < 0.5))
        lines = ["User-agent: *"]
        for path, allow in rules:
            lines.append(("Allow: " if allow else "Disallow: ") + path)
        txt = "\n".join(lines)

        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        parsed = parse_robots_txt(txt, "*")
        for _ in range(50):
            s = rng.choice(segs)
            path = "/" + s + "".join(
                "/" + rng.choice(segs) for _ in range(rng.randint(0, 3))
            )
            want = rp.can_fetch("testbot", "https://h/" + path.lstrip("/"))
            got = _decision(parsed, path)
            assert got == want, (trial, txt, path, got, want)


def test_end_to_end_apply_robots(spark):
    """robots.txt bodies → robots_table_from_txt → apply_robots: disallowed
    URLs dropped, declared crawl delay attached, undeclared hosts default."""
    from archive_query_log_spark.operators.politeness import apply_robots

    bodies = [
        ("h1", "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 5"),
        ("h2", "User-agent: *\nAllow: /"),
        # h3 has no robots row at all → default allow + 10 s
    ]
    robots = robots_table_from_txt(
        spark.createDataFrame(bodies, "host string, robots_txt string")
    )
    frontier = spark.createDataFrame(
        [
            ("h1", "https://h1/blocked/a"),
            ("h1", "https://h1/ok"),
            ("h2", "https://h2/anything"),
            ("h3", "https://h3/x"),
        ],
        "host string, url string",
    )
    out = apply_robots(frontier, robots).select("host", "url", "crawl_delay_s")
    got = {(r["host"], r["url"]): r["crawl_delay_s"] for r in out.collect()}
    assert ("h1", "https://h1/blocked/a") not in got
    assert got[("h1", "https://h1/ok")] == 5.0
    assert got[("h2", "https://h2/anything")] == 10.0  # no delay declared
    assert got[("h3", "https://h3/x")] == 10.0  # no robots at all


def test_review_edge_cases_pinned():
    """Edge cases from the round-4 review, each previously a real bug."""
    # Disallow reducing to empty = block-EVERYTHING, not allow-everything
    assert parse_robots_txt("User-agent: *\nDisallow: *", "*") == [
        ("/", False, None)
    ]
    assert parse_robots_txt("User-agent: *\nDisallow: $", "*") == [
        ("/", False, None)
    ]
    # query-bearing Disallow truncates at '?' (apply_robots matches PATH
    # only); query-bearing Allow drops
    assert parse_robots_txt(
        "User-agent: *\nDisallow: /search?q=\nAllow: /a?b", "*"
    ) == [("/search", False, None)]
    # unknown keys (Sitemap, ...) do NOT split a consecutive user-agent run
    assert parse_robots_txt(
        "User-agent: aql\nSitemap: http://x\nUser-agent: googlebot\nDisallow: /",
        "aql",
    ) == [("/", False, None)]
    # nan/inf/negative Crawl-delay rejected (NaN poisons dispatch math)
    assert parse_robots_txt(
        "User-agent: *\nDisallow: /x\nCrawl-delay: nan", "*"
    ) == [("/x", False, None)]
    assert parse_robots_txt(
        "User-agent: *\nCrawl-delay: -5\nDisallow: /x", "*"
    ) == [("/x", False, None)]
    # malformed empty User-agent token cannot hijack group selection
    assert parse_robots_txt(
        "User-agent:\nAllow: /\nUser-agent: *\nDisallow: /", "mybot"
    ) == [("/", False, None)]


def test_text_robots_schedule_equals_structured_schedule(spark):
    """Integration: a schedule computed from TEXT-parsed robots must be
    byte-identical to one computed from the equivalent structured rules
    table — the parser slots into the existing politeness pipeline without
    changing a single (host, wave, url_key, dispatch_ts)."""
    from pyspark.sql import functions as F

    from archive_query_log_spark.operators import politeness

    structured = spark.createDataFrame(
        [
            ("h1", None, True, 4.0),
            ("h1", "/no/", False, 4.0),
            ("h2", None, True, 1.0),
            ("h2", "/ok/", True, 1.0),
        ],
        "host string, path_prefix string, allow boolean, crawl_delay_s double",
    )
    texts = spark.createDataFrame(
        [
            ("h1", "User-agent: *\nDisallow: /no/\nCrawl-delay: 4"),
            ("h2", "User-agent: *\nAllow: /ok/\nCrawl-delay: 1"),
        ],
        "host string, robots_txt string",
    )
    parsed = robots_table_from_txt(texts)

    frontier = spark.createDataFrame(
        [
            (f"h{1 + i % 2}", f"https://h{1 + i % 2}/{'no' if i % 5 == 0 else 'p'}/{i}",
             f"k{i:03d}", float(i % 7))
            for i in range(60)
        ],
        "host string, url string, url_key string, score double",
    )

    def sched(robots):
        allowed = politeness.apply_robots(frontier, robots)
        return politeness.schedule(
            allowed.withColumn(
                "t0", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            ),
            budget_waves=16,
        ).select("host", "url_key", "wave", "dispatch_ts")

    a = sorted(map(tuple, sched(structured).collect()))
    b = sorted(map(tuple, sched(parsed).collect()))
    assert a == b and len(a) > 0
