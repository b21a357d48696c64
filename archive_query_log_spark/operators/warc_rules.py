"""The reference's REAL WARC parser-rule tables on Spark: HTML payload →
warc_query / result blocks via the xpath_lite engine.

Reference semantics reproduced (engine original, rules imported as data):
- warc_query cascade (parsers/warc_query.py:112-131): first applicable
  parser (provider_id equality + anchored url_pattern on the normalized
  capture URL) whose xpath yields a string that ``clean_text``s to
  non-empty wins; a parser with no surviving string FALLS THROUGH to the
  next (warc_query.py:117-119 ``continue``).
- result-block extraction (warc_web_search_result_blocks.py:118-180):
  first applicable parser whose xpath selects ≥ 1 ELEMENT wins; per
  element, rank = enumeration index, and the FIRST url/title/text string
  of the relative xpaths (url stripped then urljoined against the capture
  URL; title/text stripped). The reference's block id is
  uuid5(ns, serp:parser:hash(content):rank) where ``hash`` is Python's
  process-salted str hash — NOT reproducible across runs even for the
  reference itself — so this module mints the same formula with md5(content)
  in hash's place (deterministic, documented divergence).

Scale shape: the rule tables are constants (74/88/1 rows) carried into the
Arrow UDF closures — a broadcast by construction. Per-row work is one DOM
parse + the applicable rules' xpath evaluations; the job is a map-only
projection (no shuffle), partition-parallel over the SERP table, exactly
like the URL cascade's zero-exchange plan but through the sanctioned
Pandas-UDF slow path (an HTML parse cannot be a Catalyst expression).
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from hashlib import md5
from pathlib import Path
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archive_query_log_spark.functions.xpath_lite import (
    XPathLite,
    parse_html,
    tostring,
)

DATA_DIR = Path(__file__).resolve().parent.parent / "data"


def _clean_text(text: str) -> str | None:
    """parsers/utils/__init__.py:clean_text (no remove/space patterns —
    none of the 74 WARC query rules carry them)."""
    text = " ".join(text.strip().split())
    return text if text else None


@lru_cache(maxsize=None)
def load_warc_rules(table: str) -> tuple[dict, ...]:
    """Raw rule rows for warc_query | warc_wsrb | warc_wscrb."""
    doc = json.loads((DATA_DIR / f"{table}_rules.json").read_text())
    return tuple(doc["rules"])


@lru_cache(maxsize=None)
def _compiled_query_rules():
    return tuple(
        (
            r["rule_order"],
            r["provider_id"],
            re.compile(r["url_pattern"]),
            XPathLite(r["xpath"]),
        )
        for r in load_warc_rules("warc_query")
    )


@lru_cache(maxsize=None)
def _compiled_block_rules(table: str):
    return tuple(
        (
            r["rule_order"],
            r["provider_id"],
            re.compile(r["url_pattern"]),
            XPathLite(r["xpath"]),
            XPathLite(r["url_xpath"]) if r.get("url_xpath") else None,
            XPathLite(r["title_xpath"]) if r.get("title_xpath") else None,
            XPathLite(r["text_xpath"]) if r.get("text_xpath") else None,
        )
        for r in load_warc_rules(table)
    )


class _LazyDoc:
    """One-row lazy DOM: both cascades (query + blocks) over the same SERP
    share a single parse_html — the parse dominates per-row cost on real
    markup (100-420 KB SERPs), so sharing it halves the combined pass."""

    __slots__ = ("html", "doc")

    def __init__(self, html):
        self.html = html
        self.doc = None

    def get(self):
        if self.doc is None:
            self.doc = parse_html(self.html)
        return self.doc


def _parse_query(
    provider_id, url, html, lazy_doc: _LazyDoc | None = None
) -> tuple[str | None, int | None]:
    if html is None or url is None:
        return None, None
    if lazy_doc is None:
        lazy_doc = _LazyDoc(html)
    for order, pid, pattern, xpath in _compiled_query_rules():
        # reference applicability (warc_query.py:34-43): a RULE with
        # provider_id=None applies to every row; a rule with a provider
        # only applies when the row's provider equals it (a null-provider
        # ROW therefore matches no provider-specific rule)
        if pid is not None and pid != provider_id:
            continue
        if not pattern.match(url):
            continue
        for value in xpath.evaluate(lazy_doc.get()):
            cleaned = _clean_text(value)
            if cleaned is not None:
                return cleaned, order
    return None, None


def warc_query_udf():
    """(provider_id, url, html) → struct<warc_query, wq_rule> via the full
    74-rule cascade. The DOM is parsed once per row, lazily — rows with no
    applicable rule never pay the parse."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<warc_query: string, wq_rule: int>")
    def _parse(
        provider_id: pd.Series, url: pd.Series, html: pd.Series
    ) -> pd.DataFrame:
        queries, rules = [], []
        for pid, u, h in zip(provider_id, url, html):
            q, r = _parse_query(pid, u, h)
            queries.append(q)
            rules.append(r)
        return pd.DataFrame({"warc_query": queries, "wq_rule": rules})

    return _parse


_BLOCK_TYPE = (
    "array<struct<rank: int, url: string, title: string, text: string,"
    " content_md5: string, block_rule: int>>"
)


try:  # pydantic is optional at runtime; present wherever the reference runs
    from pydantic import HttpUrl as _HttpUrl
except ImportError:  # pragma: no cover - documented divergence without it
    _HttpUrl = None


def _normalize_block_url(joined: str) -> str | None:
    """The reference wraps the urljoin result in HttpUrl
    (warc_web_search_result_blocks.py:140-141,170) — WHATWG-normalized.
    An invalid URL raises ValidationError there (killing the whole parse);
    per this repo's per-row-errors-never-kill-the-job rule it becomes None
    here instead (documented divergence). pydantic's presence is enforced
    at result_blocks_udf construction — a missing wheel fails fast rather
    than silently emitting raw (environment-dependent) URLs."""
    if _HttpUrl is None:  # pragma: no cover - constructor fails fast first
        raise ImportError(
            "pydantic is required for block-URL normalization; "
            "result_blocks_udf refuses to construct without it"
        )
    try:
        return _HttpUrl(joined).encoded_string()
    except Exception:
        return None


def _extract_blocks(
    provider_id, url, html, rules, lazy_doc: _LazyDoc | None = None
) -> list[dict] | None:
    if html is None or url is None:
        return None
    if lazy_doc is None:
        lazy_doc = _LazyDoc(html)
    for order, pid, pattern, xpath, url_xp, title_xp, text_xp in rules:
        # rule provider None = wildcard (warc_web_search_result_blocks.py:
        # 60-69 — same applicability as the query cascade)
        if pid is not None and pid != provider_id:
            continue
        if not pattern.match(url):
            continue
        doc = lazy_doc.get()
        elements = xpath.evaluate(doc)
        if not elements:
            continue
        blocks = []
        for i, el in enumerate(elements):
            block_url = None
            if url_xp is not None:
                urls = url_xp.evaluate(el, doc)
                if urls:
                    block_url = _normalize_block_url(
                        urljoin(url, urls[0].strip())
                    )
            title = None
            if title_xp is not None:
                titles = title_xp.evaluate(el, doc)
                if titles:
                    title = titles[0].strip()
            text = None
            if text_xp is not None:
                texts = text_xp.evaluate(el, doc)
                if texts:
                    text = texts[0].strip()
            content = tostring(el)
            blocks.append(
                {
                    "rank": i,
                    "url": block_url,
                    "title": title,
                    "text": text,
                    "content_md5": md5(content.encode()).hexdigest(),
                    "block_rule": order,
                }
            )
        return blocks
    return None


def result_blocks_udf(table: str = "warc_wsrb"):
    """(provider_id, url, html) → array of block structs through the real
    88-rule (or 1-rule special-contents) table. Fails fast (ImportError)
    when pydantic is absent — block_url values would otherwise silently
    differ between environments with and without the wheel (mirrors
    normalize_http_url_udf's fail-fast contract)."""
    from pyspark.sql.functions import pandas_udf

    if _HttpUrl is None:
        raise ImportError(
            "pydantic is required: result_blocks_udf normalizes block URLs "
            "with HttpUrl, and running without it would produce "
            "environment-dependent output"
        )
    rules = _compiled_block_rules(table)

    @pandas_udf(_BLOCK_TYPE)
    def _extract(
        provider_id: pd.Series, url: pd.Series, html: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                _extract_blocks(pid, u, h, rules)
                for pid, u, h in zip(provider_id, url, html)
            ]
        )

    return _extract


def parse_warc_queries(
    df: DataFrame,
    provider: Column | str = "provider_id",
    url: Column | str = "url",
    html: Column | str = "html",
) -> DataFrame:
    """Append warc_query + wq_rule columns (map-only, no shuffle)."""
    out = warc_query_udf()(
        F.col(provider) if isinstance(provider, str) else provider,
        F.col(url) if isinstance(url, str) else url,
        F.col(html) if isinstance(html, str) else html,
    )
    return df.withColumn("_wq", out).select(
        "*", F.col("_wq.warc_query").alias("warc_query"),
        F.col("_wq.wq_rule").alias("wq_rule"),
    ).drop("_wq")


def extract_result_blocks(
    df: DataFrame,
    table: str = "warc_wsrb",
    provider: Column | str = "provider_id",
    url: Column | str = "url",
    html: Column | str = "html",
    serp_id: Column | str | None = None,
) -> DataFrame:
    """One row per extracted block (posexplode of the per-SERP array).
    With ``serp_id``, mints the reference's block-id formula with
    md5(content) standing in for the process-salted hash()."""
    arr = result_blocks_udf(table)(
        F.col(provider) if isinstance(provider, str) else provider,
        F.col(url) if isinstance(url, str) else url,
        F.col(html) if isinstance(html, str) else html,
    )
    exploded = df.withColumn("_blocks", arr).select(
        "*", F.explode("_blocks").alias("_b")
    )
    out = exploded.select(
        *df.columns,
        F.col("_b.rank").alias("rank"),
        F.col("_b.url").alias("block_url"),
        F.col("_b.title").alias("title"),
        F.col("_b.text").alias("text"),
        F.col("_b.content_md5").alias("content_md5"),
        F.col("_b.block_rule").alias("block_rule"),
    )
    if serp_id is not None:
        from archive_query_log_spark.functions.ids import (
            NAMESPACE_WEB_SEARCH_RESULT_BLOCK,
            uuid5_from_parts,
        )

        sid = F.col(serp_id) if isinstance(serp_id, str) else serp_id
        out = out.withColumn(
            "block_id",
            uuid5_from_parts(
                NAMESPACE_WEB_SEARCH_RESULT_BLOCK,
                sid,
                F.col("block_rule").cast("string"),
                F.col("content_md5"),
                F.col("rank").cast("string"),
            ),
        )
    return out


def parse_serp_udf(block_table: str = "warc_wsrb"):
    """Combined single-parse SERP extraction: (provider_id, url, html) →
    struct<warc_query, wq_rule, blocks> with BOTH cascades sharing one DOM
    via _LazyDoc. The separate-pass operators cost two parse_html calls per
    document; on real 100-420 KB SERPs the parse dominates, so the combined
    pass is ~2× the separate-pass throughput (bench line
    warc_xpath_real.combined). Results are identical by construction — the
    cascades read, never mutate, the DOM — and pinned by a parity test over
    the real fixture corpus."""
    from pyspark.sql.functions import pandas_udf

    if _HttpUrl is None:
        raise ImportError(
            "pydantic is required: parse_serp_udf normalizes block URLs "
            "with HttpUrl (same fail-fast contract as result_blocks_udf)"
        )
    rules = _compiled_block_rules(block_table)

    @pandas_udf(
        "struct<warc_query: string, wq_rule: int, blocks: " + _BLOCK_TYPE + ">"
    )
    def _parse(
        provider_id: pd.Series, url: pd.Series, html: pd.Series
    ) -> pd.DataFrame:
        queries, qrules, blocks = [], [], []
        for pid, u, h in zip(provider_id, url, html):
            lazy = _LazyDoc(h)
            q, r = _parse_query(pid, u, h, lazy)
            b = _extract_blocks(pid, u, h, rules, lazy)
            queries.append(q)
            qrules.append(r)
            blocks.append(b)
        return pd.DataFrame(
            {"warc_query": queries, "wq_rule": qrules, "blocks": blocks}
        )

    return _parse


def parse_serp(
    df: DataFrame,
    block_table: str = "warc_wsrb",
    provider: Column | str = "provider_id",
    url: Column | str = "url",
    html: Column | str = "html",
) -> DataFrame:
    """Append warc_query + wq_rule + blocks (array) in ONE map-only pass —
    one DOM parse per SERP instead of the two the separate
    parse_warc_queries / extract_result_blocks passes pay. Still
    exchange-free; explode blocks downstream as needed."""
    out = parse_serp_udf(block_table)(
        F.col(provider) if isinstance(provider, str) else provider,
        F.col(url) if isinstance(url, str) else url,
        F.col(html) if isinstance(html, str) else html,
    )
    return df.withColumn("_serp", out).select(
        "*",
        F.col("_serp.warc_query").alias("warc_query"),
        F.col("_serp.wq_rule").alias("wq_rule"),
        F.col("_serp.blocks").alias("blocks"),
    ).drop("_serp")
