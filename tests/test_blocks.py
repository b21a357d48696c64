"""Result-block extractor (UDTF shape) vs a pure-Python reference twin —
mirrors tests/test_warc_query_parsers.py:71-91 in the reference: known
payloads in, exact block rows out."""

import hashlib
import uuid

from pyspark.sql import functions as F

from archive_query_log_spark.crawler import codec
from archive_query_log_spark.operators import blocks as B

RULES = [
    B.BlockRule(0, "fmt=png", provider_id="p0"),
    B.BlockRule(1, "title~^[a-m]", provider_id="p1", url_pattern=r"^https://h"),
    B.BlockRule(2, "all"),
]


def _serps(spark):
    rows = [
        # p0: mixed fmt blocks → rule 0 selects pngs only, re-ranked 0..
        ("s0", "https://h0.example.com/search?q=a", "p0",
         codec.encode_serp_payload([
             ("r0?d=0", "alpha", codec.encode(codec.synth_pixels("0:0", 8, 8), "png")),
             ("r1?d=0", "zeta", codec.encode(codec.synth_pixels("0:1", 8, 8), "jpeg")),
             ("r2?d=0", "beta", codec.encode(codec.synth_pixels("0:2", 8, 8), "png")),
         ])),
        # p0 but jpeg-only → rule 0 parse empty → falls through to rule 2
        ("s1", "https://h1.example.com/search?q=b", "p0",
         codec.encode_serp_payload([
             ("r0?d=1", "gamma", codec.encode(codec.synth_pixels("1:0", 8, 8), "jpeg")),
         ])),
        # p1: title selector
        ("s2", "https://h2.example.com/search?q=c", "p1",
         codec.encode_serp_payload([
             ("r0?d=2", "delta", codec.encode(codec.synth_pixels("2:0", 8, 8), "png")),
             ("r1?d=2", "zulu", codec.encode(codec.synth_pixels("2:1", 8, 8), "png")),
         ])),
        # null payload → skipped entirely (warc_location None analog)
        ("s3", "https://h3.example.com/search?q=d", "p0", None),
        # corrupt payload → skipped, no task failure
        ("s4", "https://h4.example.com/search?q=e", "p2", b"garbage"),
    ]
    return spark.createDataFrame(
        rows, "serp_id string, url string, provider_id string, payload binary"
    )


def test_extract_blocks_matches_python_twin(spark):
    out = B.extract_result_blocks(_serps(spark), RULES)
    got = {
        (r["serp_id"], r["rank"]): (
            r["rule"], r["url"], r["title"], r["fmt"], r["block_id"]
        )
        for r in out.collect()
    }

    def bid(sid, rule, u, t, fmt, rank):
        digest = hashlib.md5(f"{u}|{t}|{fmt}".encode()).hexdigest()
        return str(
            uuid.uuid5(B.NAMESPACE_RESULT_BLOCK, f"{sid}:{rule}:{digest}:{rank}")
        )

    exp = {
        # s0 via rule 0: pngs re-ranked 0,1; urljoin resolves relative hrefs
        ("s0", 0): (0, "https://h0.example.com/r0?d=0", "alpha", "png",
                    bid("s0", 0, "r0?d=0", "alpha", "png", 0)),
        ("s0", 1): (0, "https://h0.example.com/r2?d=0", "beta", "png",
                    bid("s0", 0, "r2?d=0", "beta", "png", 1)),
        # s1 fell through rule 0 (no pngs) to rule 2
        ("s1", 0): (2, "https://h1.example.com/r0?d=1", "gamma", "jpeg",
                    bid("s1", 2, "r0?d=1", "gamma", "jpeg", 0)),
        # s2 via rule 1: titles matching ^[a-m] only
        ("s2", 0): (1, "https://h2.example.com/r0?d=2", "delta", "png",
                    bid("s2", 1, "r0?d=2", "delta", "png", 0)),
    }
    assert got == exp


def test_build_and_extract_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"), (2, ""), (3, "one")],
        "doc_id long, text string",
    )
    serps = B.build_serp_payloads(docs).select(
        F.col("doc_id").alias("serp_id"),
        F.concat(F.lit("https://h"), F.col("doc_id").cast("string"),
                 F.lit(".example.com/search")).alias("url"),
        F.lit("p2").alias("provider_id"),
        "payload",
    )
    out = B.extract_result_blocks(serps, RULES).collect()
    by_serp = {}
    for r in out:
        by_serp.setdefault(r["serp_id"], []).append(r)
    # doc 1: 5 blocks (max_blocks cap over 7 tokens), ranks 0..4, rule 2
    assert sorted(r["rank"] for r in by_serp[1]) == [0, 1, 2, 3, 4]
    assert {r["title"] for r in by_serp[1]} == {
        "alpha", "beta", "gamma", "delta", "epsilon"
    }
    assert all(r["rule"] == 2 for r in by_serp[1])
    # fmt alternates by (doc_id + j) % 2
    fmts = {r["rank"]: r["fmt"] for r in by_serp[1]}
    assert fmts == {0: "jpeg", 1: "png", 2: "jpeg", 3: "png", 4: "jpeg"}
    # doc 2 (no tokens → null payload) produced nothing
    assert 2 not in by_serp
    # doc 3: single block
    assert len(by_serp[3]) == 1 and by_serp[3][0]["title"] == "one"


def test_extract_payload_query_cascade(spark):
    """warc_query analog: within-rule candidates tried in order (first
    clean_text survivor wins), rules cascade, null payloads skipped."""
    rules = [
        B.PayloadQueryRule(0, "fmt=png", provider_id="p0",
                           remove_pattern=r"^z.*"),
        B.PayloadQueryRule(1, "all"),
    ]
    rows = [
        # p0: first png title 'zulu' is removed entirely by the rule's
        # remove_pattern -> falls to the NEXT candidate 'echo' (same rule)
        ("s0", "https://h.example/s", "p0",
         codec.encode_serp_payload([
             ("r0", "zulu", codec.encode(codec.synth_pixels("a", 8, 8), "png")),
             ("r1", "skip", codec.encode(codec.synth_pixels("b", 8, 8), "jpeg")),
             ("r2", "echo", codec.encode(codec.synth_pixels("c", 8, 8), "png")),
         ])),
        # p0 with ONLY removable png titles -> rule 0 yields nothing ->
        # rule 1 takes the first title overall
        ("s1", "https://h.example/s", "p0",
         codec.encode_serp_payload([
             ("r0", "zeta", codec.encode(codec.synth_pixels("d", 8, 8), "png")),
         ])),
        ("s2", "https://h.example/s", "p9", None),  # null payload -> nulls
    ]
    df = spark.createDataFrame(
        rows, "serp_id string, url string, provider_id string, payload binary"
    )
    got = {r["serp_id"]: (r["query"], r["rule"])
           for r in B.extract_payload_query(df, rules).collect()}
    assert got == {"s0": ("echo", 0), "s1": ("zeta", 1), "s2": (None, None)}
