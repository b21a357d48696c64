"""Result-block extraction: one SERP payload → N ranked blocks (UDTF shape).

The reference's WARC result-block parsers
(/root/reference/archive_query_log/parsers/warc_web_search_result_blocks.py:78-180)
read a SERP's HTML record from the WARC store, apply the first applicable
rule's XPath, and emit one WebSearchResultBlockData per matched element:
rank = enumerate index over the SELECTED elements (:134), url = urljoin of
the SERP url with the block's relative href (:141), title/text stripped
firsts (:143-152), and a deterministic block id
uuid5(NS, f"{serp_id}:{parser_id}:{content_digest}:{rank}") (:160-168).

This is the image-payload-scope analog over the binary SERP payloads of
``crawler/codec.py:encode_serp_payload``: the extraction rules select blocks
from the decoded payload structure (instead of XPath over an HTML tree —
no HTML libs ship in this container), everything else mirrors the reference:
same applicability (provider + url re.match), same first-non-empty-rule
cascade (:186-230), same rank/urljoin/id semantics. One divergence,
deliberate: the reference digests content with Python ``hash()`` (:162,
process-dependent!); we use md5 so block ids are stable across runs.

Spark shape — the brief's UDTF slot: an Arrow pandas UDF returns
struct<rule, blocks:array<struct>> per SERP; ``posexplode`` fans it out to
one row per block with pos == rank. Payload decode is per-row Python inside
an Arrow batch (same cost model as the fetch decode UDF); everything before
and after the UDF is JVM-side.
"""

from __future__ import annotations

import hashlib
import re
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAMESPACE_RESULT_BLOCK = uuid.UUID("8f164478-31a0-4ec5-9395-0ec5c17e0a6d")

BLOCK_STRUCT = (
    "rank int, url string, title string, fmt string,"
    " content_digest string, block_id string"
)
EXTRACT_SCHEMA = f"rule int, blocks array<struct<{BLOCK_STRUCT}>>"


@dataclass(frozen=True)
class BlockRule:
    """One extraction rule (mirrors XpathWarcWebSearchResultBlocksParser's
    fields; `selector` stands in for the xpath over the payload structure).

    selector: 'all' | 'fmt=png' | 'fmt=jpeg' | 'title~<regex>'
    """

    rule_order: int
    selector: str
    provider_id: str | None = None
    url_pattern: str | None = None


def _compile_selector(selector: str):
    if selector == "all":
        return lambda url, title, fmt: True
    if selector.startswith("fmt="):
        want = selector[4:]
        return lambda url, title, fmt: fmt == want
    if selector.startswith("title~"):
        rx = re.compile(selector[6:])
        return lambda url, title, fmt: rx.search(title) is not None
    raise ValueError(selector)


def _decode_payload(buf) -> list[tuple[str, str, str]]:
    """(url, title, fmt) blocks of one binary SERP payload; a corrupt or
    null payload yields [] — per-row errors must never kill the task."""
    from archive_query_log_spark.crawler.codec import decode, decode_serp_payload

    if buf is None:
        return []
    try:
        return [
            (u, t, decode(img)[0])
            for u, t, img in decode_serp_payload(bytes(buf))
        ]
    except Exception:
        return []


def _applicable(rule_provider, rule_rx, prov, burl) -> bool:
    """Reference applicability (url_query.py:49-58): provider equality +
    url_pattern match. A null URL (no url_pattern can match it) fails any
    patterned rule instead of crashing the batch."""
    if rule_provider is not None and rule_provider != prov:
        return False
    if rule_rx is not None and (burl is None or not rule_rx.match(burl)):
        return False
    return True


def extract_result_blocks(
    serps: DataFrame,
    rules: list[BlockRule],
    id_col: str = "serp_id",
    url_col: str = "url",
    provider_col: str = "provider_id",
    payload_col: str = "payload",
) -> DataFrame:
    """SERP rows → one row per extracted block.

    Output: (id_col, rule, rank, url, title, fmt, content_digest, block_id).
    Rows with a null payload are skipped (reference: serp.warc_location is
    None → no action, :186-192); a payload that decodes to zero selected
    blocks under every applicable rule yields no rows (parse → None, :126).
    """
    from urllib.parse import urljoin

    compiled = [
        (
            r.rule_order,
            r.provider_id,
            re.compile(r.url_pattern) if r.url_pattern else None,
            _compile_selector(r.selector),
        )
        for r in sorted(rules, key=lambda r: r.rule_order)
    ]

    @F.pandas_udf(EXTRACT_SCHEMA)
    def _extract(
        serp_id: pd.Series, base_url: pd.Series, provider: pd.Series,
        payload: pd.Series
    ) -> pd.DataFrame:
        rules_out, blocks_out = [], []
        for sid, burl, prov, buf in zip(serp_id, base_url, provider, payload):
            won_rule, won_blocks = None, None
            decoded = _decode_payload(buf)
            if decoded:
                for order, rp, rx, sel in compiled:
                    if not _applicable(rp, rx, prov, burl):
                        continue
                    picked = [
                        (u, t, fmt) for u, t, fmt in decoded if sel(u, t, fmt)
                    ]
                    if not picked:
                        continue  # parse returned None → next rule
                    blocks = []
                    for rank, (u, t, fmt) in enumerate(picked):
                        digest = hashlib.md5(
                            f"{u}|{t}|{fmt}".encode()
                        ).hexdigest()
                        bid = str(
                            uuid.uuid5(
                                NAMESPACE_RESULT_BLOCK,
                                f"{sid}:{order}:{digest}:{rank}",
                            )
                        )
                        blocks.append(
                            (
                                rank,
                                urljoin(burl, u) if burl is not None else u,
                                t,
                                fmt,
                                digest,
                                bid,
                            )
                        )
                    won_rule, won_blocks = order, blocks
                    break
            rules_out.append(won_rule)
            blocks_out.append(won_blocks)
        return pd.DataFrame({"rule": rules_out, "blocks": blocks_out})

    extracted = serps.select(
        F.col(id_col),
        _extract(
            F.col(id_col).cast("string"),
            F.col(url_col),
            F.col(provider_col),
            F.col(payload_col),
        ).alias("_x"),
    ).where(F.col("_x.rule").isNotNull())
    return extracted.select(
        F.col(id_col),
        F.col("_x.rule").alias("rule"),
        F.posexplode("_x.blocks").alias("pos", "block"),
    ).select(
        F.col(id_col),
        "rule",
        F.col("block.rank").alias("rank"),
        F.col("block.url").alias("url"),
        F.col("block.title").alias("title"),
        F.col("block.fmt").alias("fmt"),
        F.col("block.content_digest").alias("content_digest"),
        F.col("block.block_id").alias("block_id"),
    )


@dataclass(frozen=True)
class PayloadQueryRule:
    """One payload→query rule (mirrors XpathWarcQueryParser,
    warc_query.py:61-89: xpath → candidate strings → first whose clean_text
    is non-null; selector stands in for the xpath)."""

    rule_order: int
    selector: str
    provider_id: str | None = None
    url_pattern: str | None = None
    remove_pattern: str | None = None
    space_pattern: str | None = None


def _clean_text_py(
    text: str, remove_pattern: re.Pattern | None, space_pattern: re.Pattern | None
) -> str | None:
    """parsers/utils/__init__.py:5-18 — the same clean_text the cascade
    oracle re-executes."""
    if remove_pattern is not None:
        text = remove_pattern.sub("", text)
    if space_pattern is not None:
        text = space_pattern.sub(" ", text)
    text = " ".join(text.strip().split())
    return text if text != "" else None


def extract_payload_query(
    serps: DataFrame,
    rules: list[PayloadQueryRule],
    id_col: str = "serp_id",
    url_col: str = "url",
    provider_col: str = "provider_id",
    payload_col: str = "payload",
) -> DataFrame:
    """SERP payload → ONE query string (the warc_query.py:61-117 cascade):
    first applicable rule wins with the first selected candidate whose
    clean_text is non-null; rows with null payloads are skipped. Output:
    (id_col, query, rule) with query/rule null when nothing parsed (the
    reference marks those should_parse=False with no query)."""
    compiled = [
        (
            r.rule_order,
            r.provider_id,
            re.compile(r.url_pattern) if r.url_pattern else None,
            _compile_selector(r.selector),
            re.compile(r.remove_pattern) if r.remove_pattern else None,
            re.compile(r.space_pattern) if r.space_pattern else None,
        )
        for r in sorted(rules, key=lambda r: r.rule_order)
    ]

    @F.pandas_udf("query string, rule int")
    def _extract(
        base_url: pd.Series, provider: pd.Series, payload: pd.Series
    ) -> pd.DataFrame:
        q_out, r_out = [], []
        for burl, prov, buf in zip(base_url, provider, payload):
            query, won = None, None
            decoded = _decode_payload(buf)
            if decoded:
                for order, rp, rx, sel, rm, sp in compiled:
                    if not _applicable(rp, rx, prov, burl):
                        continue
                    for u, t, fmt in decoded:
                        if not sel(u, t, fmt):
                            continue
                        cleaned = _clean_text_py(t, rm, sp)
                        if cleaned is not None:
                            query, won = cleaned, order
                            break
                    if query is not None:
                        break
            q_out.append(query)
            r_out.append(won)
        return pd.DataFrame({"query": q_out, "rule": r_out})

    out = serps.select(
        F.col(id_col),
        _extract(F.col(url_col), F.col(provider_col), F.col(payload_col)).alias(
            "_q"
        ),
    )
    return out.select(
        F.col(id_col),
        F.col("_q.query").alias("query"),
        F.col("_q.rule").alias("rule"),
    )


def build_serp_payloads(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_blocks: int = 5,
) -> DataFrame:
    """Deterministic SERP-payload synthesis over a text table: block j of
    row id = (relative url 'r{j}?d={id}', title = j-th whitespace token,
    image = codec-encoded synth pixels, fmt alternating png/jpeg by
    (id+j) % 2). Rows with no tokens carry a null payload (the
    warc_location-is-None analog)."""
    from archive_query_log_spark.crawler.codec import (
        encode,
        encode_serp_payload,
        synth_pixels,
    )

    @F.pandas_udf("binary")
    def _build(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(doc_id, text):
            toks = (t or "").lower().split()
            if not toks:
                out.append(None)
                continue
            blocks = []
            for j, tok in enumerate(toks[:max_blocks]):
                fmt = "png" if (int(i) + j) % 2 == 0 else "jpeg"
                img = encode(synth_pixels(f"{i}:{j}", 8, 8), fmt)
                blocks.append((f"r{j}?d={i}", tok, img))
            out.append(encode_serp_payload(blocks))
        return pd.Series(out)

    return df.withColumn("payload", _build(F.col(id_col), F.col(text_col)))
