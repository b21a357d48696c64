"""Deterministic identity + scoring column functions (pure column exprs).

Reference semantics reproduced:
- uuid5 deterministic IDs over ``":".join(components)``:
  /root/reference/archive_query_log/namespaces.py:1-23, ID formulas at
  sources/__init__.py:28-37 and captures/__init__.py:62-73.
- timestamp14 (``%Y%m%d%H%M%S`` UTC): captures/__init__.py:62-64.
- worklist priority scoring (RankFeature saturation + random tiebreak):
  captures/__init__.py:177-182.

Design notes (Spark-first, scale-first):
- ``uuid5_from_name`` is a *pure column expression* (sha1 + string surgery,
  RFC 4122 version/variant bits), so ID minting stays inside whole-stage
  codegen — no Python UDF on the 10^10-row frontier path. Golden-tested
  against Python ``uuid.uuid5`` in tests/test_ids.py.
- ``md5_rand`` replaces the reference's *unseeded* Elasticsearch RandomScore
  (captures/__init__.py:181) with a deterministic, partition-invariant
  pseudo-random: the same row gets the same score at local[8] and local[32]
  and on any cluster, which makes crawl ordering reproducible (BASELINE.json
  north_rule) — Spark's ``rand(seed)`` is partition-dependent and would not
  be. md5 also exists in DuckDB, so oracle SQL can reproduce it bit-exactly.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference namespace tree (public uuid5 derivation, namespaces.py:1-23).
NAMESPACE_AQL = uuid.uuid5(uuid.NAMESPACE_URL, "aql")
NAMESPACE_SOURCE = uuid.uuid5(NAMESPACE_AQL, "filter")
NAMESPACE_CAPTURE = uuid.uuid5(NAMESPACE_AQL, "capture")
NAMESPACE_SERP = uuid.uuid5(NAMESPACE_AQL, "serp")
NAMESPACE_WEB_SEARCH_RESULT_BLOCK = uuid.uuid5(
    NAMESPACE_AQL, "web_search_result_block"
)
NAMESPACE_WARC_DOWNLOADER = uuid.uuid5(NAMESPACE_AQL, "warc_downloader")

_VARIANT_TRANSLATE = "89ab89ab89ab89ab"  # (nibble & 0x3) | 0x8 for 0..f


def uuid5_from_name(namespace: uuid.UUID, name: Column) -> Column:
    """uuid5(namespace, name) as a pure column expression.

    UUIDv5 = SHA-1(namespace_bytes + name_utf8)[:16] with the version nibble
    forced to 5 (hex char 13) and the variant top bits forced to 10
    (hex char 17 → (x & 0x3) | 0x8).
    """
    h = F.sha1(F.concat(F.lit(namespace.bytes), F.encode(name, "UTF-8")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(
            F.translate(
                F.substring(h, 17, 1), "0123456789abcdef", _VARIANT_TRANSLATE
            ),
            F.substring(h, 18, 3),
        ),
        F.substring(h, 21, 12),
    )


def uuid5_from_parts(namespace: uuid.UUID, *parts: Column | str) -> Column:
    """Reference ID mint: uuid5(ns, ":".join(components)).

    e.g. capture id = uuid5(NS_CAPTURE, f"{cdx_api_url}:{url}:{ts14}")
    (captures/__init__.py:62-73).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    # concat_ws silently SKIPS null components, so (a, NULL, b) and (a, b,
    # NULL) would both mint uuid5(ns, 'a:b') — coalesce each slot to '' so
    # component positions are preserved and distinct entities never collide.
    cols = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return uuid5_from_name(namespace, F.concat_ws(":", *cols))


def source_id(
    cdx_api_url: Column, memento_api_url: Column, domain: Column, prefix: Column
) -> Column:
    """Source ID formula (sources/__init__.py:28-37)."""
    return uuid5_from_parts(
        NAMESPACE_SOURCE, cdx_api_url, memento_api_url, domain, prefix
    )


def capture_id(cdx_api_url: Column, url: Column, ts: Column) -> Column:
    """Capture ID formula (captures/__init__.py:62-73)."""
    return uuid5_from_parts(NAMESPACE_CAPTURE, cdx_api_url, url, timestamp14(ts))


def timestamp14(ts: Column) -> Column:
    """UTC %Y%m%d%H%M%S — capture IDs + memento URLs (captures/__init__.py:62-64)."""
    return F.date_format(ts, "yyyyMMddHHmmss")


def memento_url(memento_api_url: Column, ts: Column, url: Column) -> Column:
    """Computed field (orm.py:153-160)."""
    return F.concat_ws("/", memento_api_url, timestamp14(ts), url)


def reinterpret_tz(ts: Column, wrong_tz: str = "CET") -> Column:
    """C14: CET→UTC reinterpretation — timestamps that were *stored* as if
    UTC but actually carry wall-clock time of `wrong_tz`
    (imports/aql22.py:43-46): shift by the zone offset at that instant."""
    return F.to_utc_timestamp(ts, wrong_tz)


def md5_rand(col: Column, seed: int = 42) -> Column:
    """Deterministic, partition-invariant uniform [0,1) from a key column.

    Portable: DuckDB oracle is
    ``('0x' || substr(md5(seed || ':' || x), 1, 8))::UBIGINT / 4294967296.0``.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def md5_rand_oracle_sql(expr: str, seed: int = 42) -> str:
    """The DuckDB-SQL twin of md5_rand, for oracle queries."""
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, 8))::UBIGINT"
        " / 4294967296.0)"
    )


def saturation(col: Column, pivot: float = 10.0) -> Column:
    """RankFeature saturation x/(x+pivot) (orm.py:47-51 semantics).

    ES computes a default pivot from index stats; we pin it explicitly so the
    score is reproducible (SURVEY.md §2.5 W1). Null priority → 0 contribution.
    """
    return F.coalesce(col / (col + F.lit(float(pivot))), F.lit(0.0))


def worklist_score(
    archive_priority: Column,
    provider_priority: Column,
    id_col: Column,
    seed: int = 42,
    pivot: float = 10.0,
) -> Column:
    """Crawl-queue score: sat(archive) + sat(provider) + deterministic rand.

    Mirrors the reference's should-clause sum of two RankFeature queries and a
    RandomScore (captures/__init__.py:177-182); the random term doubles as the
    work-spreading tiebreak.
    """
    return (
        saturation(archive_priority, pivot)
        + saturation(provider_priority, pivot)
        + md5_rand(id_col, seed)
    )
