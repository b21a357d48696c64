"""Data-driven URL parser cascades (SURVEY.md §2.9).

Reference semantics: an ORDERED rule table; per row the first rule that is
(a) applicable — provider matches and URL pattern matches — and (b) whose
parse returns non-null, wins; no-match still yields a progress update
(/root/reference/archive_query_log/parsers/url_query.py:49-59 applicability,
:107-174 cascade; same pattern in url_page.py / url_offset.py).

Spark-first design: the rule table is DATA (a Python list compiled once, or a
broadcast table unrolled), and the whole cascade compiles to ONE ``coalesce``
over per-rule ``when(applicable, extract)`` expressions — the 972-rule
url→query cascade becomes a single whole-stage-codegen projection instead of
a per-row Python loop. Rules here are OUR OWN fixtures; the reference's rule
tables are data files a deployment would import, not code to copy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from archive_query_log_spark.functions import text as T
from archive_query_log_spark.functions import urls as U


@dataclass(frozen=True)
class UrlRule:
    """One parser rule (mirrors the reference's QueryParser model fields,
    parsers/url_query.py:65-104)."""

    rule_type: str  # 'query_param' | 'fragment_param' | 'path_segment'
    argument: str | int
    provider_id: str | None = None  # None = applicable to any provider
    url_pattern: str | None = None  # regex; None = applicable to any URL
    remove_pattern: str | None = None
    space_pattern: str | None = None


def _extract(rule: UrlRule, url: Column) -> Column:
    if rule.rule_type == "query_param":
        return U.parse_url_query_parameter(str(rule.argument), url)
    if rule.rule_type == "fragment_param":
        return U.parse_url_fragment_parameter(str(rule.argument), url)
    if rule.rule_type == "path_segment":
        return U.parse_url_path_segment(int(rule.argument), url)
    raise ValueError(rule.rule_type)


def compile_cascade(
    rules: list[UrlRule],
    url: Column,
    provider: Column | None = None,
    as_int: bool = False,
) -> Column:
    """Rule table → one coalesce(when(applicable, cleaned_extract), ...).

    First applicable rule whose parse yields non-null wins — exactly the
    reference's loop, minus the loop.
    """
    branches: list[Column] = []
    for r in rules:
        applicable = F.lit(True)
        if r.provider_id is not None and provider is not None:
            applicable = applicable & (provider == r.provider_id)
        if r.url_pattern is not None:
            applicable = applicable & url.rlike(r.url_pattern)
        raw = _extract(r, url)
        val = (
            T.clean_int(raw, r.remove_pattern)
            if as_int
            else T.clean_text(raw, r.remove_pattern, r.space_pattern)
        )
        branches.append(F.when(applicable, val))
    if not branches:
        return F.lit(None).cast("bigint" if as_int else "string")
    return F.coalesce(*branches)


# our own fixture rule tables (shape-parity with the reference's url_query /
# url_page / url_offset tables; NOT copies of its 972-rule data file)
FIXTURE_QUERY_RULES = [
    UrlRule("query_param", "q", provider_id="alpha"),
    UrlRule(
        "query_param",
        "query",
        provider_id="beta",
        remove_pattern=r"^\*+",
    ),
    UrlRule("path_segment", 2, provider_id="gamma", url_pattern=r"/find/"),
    UrlRule("fragment_param", "q", provider_id="gamma"),
    UrlRule("query_param", "search"),  # any-provider fallback
]

FIXTURE_PAGE_RULES = [
    UrlRule("query_param", "page", provider_id="alpha"),
    UrlRule("query_param", "p", provider_id="beta", remove_pattern=r"[^0-9]"),
    UrlRule("path_segment", 3, provider_id="gamma", url_pattern=r"/find/"),
]
