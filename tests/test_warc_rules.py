"""The reference's REAL WARC XPath rule tables (74 warc_query + 88
result-block + 1 special-contents rules) through the xpath_lite engine,
gated against the frozen corpus goldens.

Golden provenance (tools/make_warc_corpus.py): every corpus document was
synthesized from a rule's own xpath constraints with planted payloads, and
its golden was only frozen when the independent ElementTree-based oracle
(tools/xpath_et_oracle.py — different parser, different text model,
different predicate evaluator) agreed with the planted intent. This test
adds the third derivation: the html.parser + xpath_lite engine the Spark
operators actually run.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from archive_query_log_spark.functions.xpath_lite import (
    XPathLite,
    parse_html,
)
from archive_query_log_spark.operators import warc_rules

DATA = Path(__file__).resolve().parent.parent / "archive_query_log_spark/data"


@pytest.fixture(scope="module")
def corpus():
    return json.loads((DATA / "warc_rule_corpus.json").read_text())


def test_all_reference_xpaths_compile():
    n = 0
    for table in ("warc_query", "warc_wsrb", "warc_wscrb"):
        for r in warc_rules.load_warc_rules(table):
            for f in ("xpath", "url_xpath", "title_xpath", "text_xpath"):
                if r.get(f):
                    XPathLite(r[f])
                    n += 1
    assert n == 392  # every xpath string in the three reference tables


def test_corpus_covers_every_query_rule(corpus):
    winners = {r["wq_rule"] for r in corpus["warc_query"] if r["wq_rule"] is not None}
    assert winners == set(range(74))


# block rules that can never win the reference's first-match cascade: an
# EARLIER rule with the same provider and url_pattern selects a superset of
# their elements, so parse() always returns the earlier rule's blocks.
# (Counterpart of the 3 provably-dead URL rules found in the url_query/
# url_page/url_offset tables.)
DEAD_BLOCK_RULES = {26: 25, 58: 57, 66: 65, 80: 79}


def test_unwon_block_rules_are_provably_dead(corpus):
    """84/88 block rules win a corpus document; the other 4 are
    structurally unreachable IN THE REFERENCE: their url_pattern+provider
    equal an earlier rule's and their block xpath is that rule's xpath
    verbatim (26/58/80 — markup-variant fallbacks whose relative
    url/title/text xpaths can never execute) or one of its union branches
    (66)."""
    rules = {r["rule_order"]: r for r in warc_rules.load_warc_rules("warc_wsrb")}
    winners = {r["wsrb_rule"] for r in corpus["wsrb"]}
    assert set(range(88)) - winners == set(DEAD_BLOCK_RULES)
    for dead, alive in DEAD_BLOCK_RULES.items():
        d, a = rules[dead], rules[alive]
        assert d["provider_id"] == a["provider_id"]
        assert d["url_pattern"] == a["url_pattern"]
        alive_branches = [s.strip() for s in a["xpath"].split("|")]
        dead_branches = [s.strip() for s in d["xpath"].split("|")]
        assert all(b in alive_branches for b in dead_branches), (dead, alive)


def test_warc_query_parity_python(corpus):
    """Engine vs frozen goldens, full 153-row corpus, driver-side (the
    same _parse_query the UDF batches over)."""
    bad = []
    for row in corpus["warc_query"]:
        q, rule = warc_rules._parse_query(
            row["provider_id"], row["url"], row["html"]
        )
        if (q, rule) != (row["warc_query"], row["wq_rule"]):
            bad.append((row["capture_id"], (q, rule),
                        (row["warc_query"], row["wq_rule"])))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


def test_wsrb_parity_python(corpus):
    rules = warc_rules._compiled_block_rules("warc_wsrb")
    bad = []
    for row in corpus["wsrb"]:
        blocks = warc_rules._extract_blocks(
            row["provider_id"], row["url"], row["html"], rules
        )
        got = (
            None
            if blocks is None
            else [
                {k: b[k] for k in ("rank", "url", "title", "text")}
                for b in blocks
            ]
        )
        want = [
            {k: b[k] for k in ("rank", "url", "title", "text")}
            for b in row["blocks"]
        ]
        rule = blocks[0]["block_rule"] if blocks else None
        if got != want or rule != row["wsrb_rule"]:
            bad.append((row["capture_id"], rule, row["wsrb_rule"]))
    assert not bad, f"{len(bad)} mismatches: {bad[:5]}"


def test_wscrb_parity_python(corpus):
    rules = warc_rules._compiled_block_rules("warc_wscrb")
    for row in corpus["wscrb"]:
        blocks = warc_rules._extract_blocks(
            row["provider_id"], row["url"], row["html"], rules
        )
        got = [
            {k: b[k] for k in ("rank", "url", "title", "text")} for b in blocks
        ]
        want = [
            {k: b[k] for k in ("rank", "url", "title", "text")}
            for b in row["blocks"]
        ]
        assert got == want


def test_warc_query_spark_path(spark, corpus):
    """The Arrow-UDF cascade on Spark reproduces the goldens (full corpus)
    and the plan is a map-only projection."""
    rows = [
        (r["capture_id"], r["provider_id"], r["url"], r["html"])
        for r in corpus["warc_query"]
    ]
    df = spark.createDataFrame(
        rows, "capture_id string, provider_id string, url string, html string"
    ).repartition(8)
    out = warc_rules.parse_warc_queries(df)
    got = {
        r["capture_id"]: (r["warc_query"], r["wq_rule"])
        for r in out.select("capture_id", "warc_query", "wq_rule").collect()
    }
    for r in corpus["warc_query"]:
        assert got[r["capture_id"]] == (r["warc_query"], r["wq_rule"]), r[
            "capture_id"
        ]
    plan_df = warc_rules.parse_warc_queries(df.localCheckpoint())
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: scan → Arrow eval → project


def test_block_id_mint_deterministic(spark, corpus):
    """block_id = uuid5(ns, serp:parser:md5(content):rank) — deterministic
    stand-in for the reference's process-salted hash() (which even the
    reference cannot reproduce across runs); stable across repartitions."""
    rows = [
        (r["capture_id"], r["provider_id"], r["url"], r["html"])
        for r in corpus["wsrb"][:10]
    ]
    df = spark.createDataFrame(
        rows, "capture_id string, provider_id string, url string, html string"
    )
    a = warc_rules.extract_result_blocks(df, serp_id="capture_id")
    ids_a = {(r["capture_id"], r["rank"]): r["block_id"] for r in a.collect()}
    b = warc_rules.extract_result_blocks(
        df.repartition(7), serp_id="capture_id"
    )
    ids_b = {(r["capture_id"], r["rank"]): r["block_id"] for r in b.collect()}
    assert ids_a == ids_b and len(ids_a) > 0
    import re as _re

    assert all(
        _re.fullmatch(r"[0-9a-f-]{36}", v) for v in ids_a.values()
    )


def test_provider_wildcard_and_null_row_applicability():
    """Reference applicability (warc_query.py:34-43): a RULE with
    provider_id=None applies to every row; a row with provider_id=None
    matches no provider-specific rule (None != UUID)."""
    html = (
        '<html><body><form id="tsf"><input name="q" value="hi"/></form>'
        "</body></html>"
    )
    url = "https://www.google.com/search?q=hi"
    google = "f205fc44-d918-4b79-9a7f-c1373a6ff9f2"
    q, rule = warc_rules._parse_query(google, url, html)
    assert (q, rule) == ("hi", 0)
    # null-provider row: no provider-specific rule may fire
    assert warc_rules._parse_query(None, url, html) == (None, None)


def test_unsupported_xpath_constructs_fail_at_compile():
    with pytest.raises(ValueError, match="rooted"):
        XPathLite("/html/body/div")
    with pytest.raises(ValueError, match="terminal"):
        XPathLite("//text()/span")
    with pytest.raises(ValueError, match="terminal"):
        XPathLite("//@href/div")
    with pytest.raises(ValueError, match="unsupported predicate"):
        XPathLite("//div[position() > 2]")


def test_invalid_block_url_nulled_not_fatal():
    """An href that is not a valid http URL after urljoin becomes a null
    block_url (the reference's HttpUrl() would raise and kill the parse —
    per-row errors must never kill a 10^10-row job here)."""
    assert warc_rules._normalize_block_url("javascript:void(0)") is None
    assert (
        warc_rules._normalize_block_url("https://Example.COM")
        == "https://example.com/"
    )


def test_dom_recovery_and_entities():
    """html.parser DOM: void elements never swallow siblings, stray end
    tags are ignored, enclosing end tags close unclosed children, char
    references decode in text and attributes."""
    doc = parse_html(
        "<div><input name='q' value='a &amp; b'><span>after</span></div>"
        "</b><ul><li><b>one<li><b>two</ul>"
    )
    assert XPathLite("//input/@value").evaluate(doc) == ["a & b"]
    assert XPathLite("//div//span//text()").evaluate(doc) == ["after"]
    # the second <li> is NOT nested under the first's unclosed <b>: the
    # enclosing </ul> closes everything; li elements stay siblings of ul?
    lis = XPathLite("//ul//li").evaluate(doc)
    assert len(lis) == 2  # both li elements found under ul

    # union document-order + dedup: same node reachable via both branches
    doc2 = parse_html("<a id='x' href='h'><h3>t</h3></a>")
    assert XPathLite("//a/@href | //a[@id = 'x']/@href").evaluate(doc2) == ["h"]
    # class-token vs substring
    doc3 = parse_html("<p class='foo-bar'>no</p><p class='a  foo\tb'>yes</p>")
    assert XPathLite(
        "//p[@class and contains(concat(' ', normalize-space(@class), ' '),"
        " ' foo ')]//text()"
    ).evaluate(doc3) == ["yes"]
    assert XPathLite("//p[contains(@class, 'foo')]//text()").evaluate(
        doc3
    ) == ["no", "yes"]


def test_misnested_markup_recovery_pinned():
    """Pin handle_endtag's misnesting recovery (xpath_lite.py:109-117):
    an end tag closes every open element up to its nearest matching
    ancestor; a stray end tag with no open ancestor is ignored. This
    DIFFERS from libxml2's adoption-style recovery on interleaved inline
    markup (documented in the module docstring); these fixtures freeze the
    chosen behavior so real-SERP rule selections can't drift silently."""
    from archive_query_log_spark.functions.xpath_lite import (
        XPathLite,
        parse_html,
    )

    # classic interleave <b><i></b>text</i>: </b> closes BOTH i and b
    # (nearest matching ancestor is b, everything above it pops), so the
    # trailing text lands in the outer div, and the stray </i> is ignored.
    doc = parse_html("<div><b><i>x</b>tail</i></div>")
    assert XPathLite("//b//i//text()").evaluate(doc) == ["x"]
    assert XPathLite("//div/text()").evaluate(doc) == ["tail"]
    assert XPathLite("//i/text()").evaluate(doc) == ["x"]

    # unclosed <li>s: each new li nests under the previous (html.parser
    # does NOT auto-close li like a browser); </ul> closes the whole chain.
    doc = parse_html("<ul><li>a<li>b</ul><p>after</p>")
    assert XPathLite("//li//li/text()").evaluate(doc) == ["b"]
    assert XPathLite("//p/text()").evaluate(doc) == ["after"]

    # end tag matching a DEEP ancestor pops the entire intermediate chain:
    # </section> from inside span closes span, div, section in one step.
    doc = parse_html(
        "<section><div><span>deep</section><em>out</em>"
    )
    assert XPathLite("//section//span/text()").evaluate(doc) == ["deep"]
    # em is a sibling of section (stack recovered to the root)
    assert XPathLite("//em/text()").evaluate(doc) == ["out"]
    assert XPathLite("//section//em").evaluate(doc) == []

    # stray end tag with NO matching open ancestor: ignored, structure kept
    doc = parse_html("<div>a</table>b<span>c</span></div>")
    assert XPathLite("//div//text()").evaluate(doc) == ["a", "b", "c"]
    assert XPathLite("//div/span/text()").evaluate(doc) == ["c"]

    # nested anchors — the shape real SERP result blocks hit: html.parser
    # does NOT auto-close <a> on a new <a> (browsers do), so a2 nests under
    # a1; the first </a> closes a2 (nearest match), the second closes a1.
    doc = parse_html('<div><a href="u1">t1<a href="u2">t2</a></a></div>')
    assert XPathLite("//a/@href").evaluate(doc) == ["u1", "u2"]
    assert XPathLite("//a//a/@href").evaluate(doc) == ["u2"]


def test_parse_serp_combined_matches_separate_passes():
    """parse_serp (one shared DOM parse per SERP) must produce exactly the
    separate-pass results — _parse_query + _extract_blocks are read-only
    over the DOM, so sharing it cannot change anything; this pins that."""
    import glob
    import gzip
    import io

    from archive_query_log_spark.operators.warc_rules import (
        _LazyDoc,
        _compiled_block_rules,
        _extract_blocks,
        _parse_query,
    )
    from archive_query_log_spark.sources.warc_fixtures import load_fixture_rows

    rules = _compiled_block_rules("warc_wsrb")

    # synthetic corpus rows (all rule families exercised) ...
    corpus_doc = json.loads((DATA / "warc_rule_corpus.json").read_text())
    rows = [
        (r["provider_id"], r["url"], r["html"])
        for r in corpus_doc["warc_query"] + corpus_doc["wsrb"]
    ]
    # ... plus real archived SERPs when the fixture tree is present
    ref = Path("/root/reference/data/tests")
    if ref.exists():
        rows += load_fixture_rows(ref, limit_per_provider=3)

    assert len(rows) > 200
    for pid, url, html in rows:
        lazy = _LazyDoc(html)
        combined_q = _parse_query(pid, url, html, lazy)
        combined_b = _extract_blocks(pid, url, html, rules, lazy)
        assert combined_q == _parse_query(pid, url, html)
        assert combined_b == _extract_blocks(pid, url, html, rules)


def test_parse_serp_dataframe_shape(spark, corpus):
    """The Spark-level combined operator: flat query columns + blocks array
    appended in one pass, map-only."""
    sample = [
        (r["provider_id"], r["url"], r["html"])
        for r in corpus["wsrb"][:40]
    ]
    df = spark.createDataFrame(
        sample, "provider_id string, url string, html string"
    )
    out = warc_rules.parse_serp(df)
    assert {"warc_query", "wq_rule", "blocks"} <= set(out.columns)
    got = out.select(
        F.count("*").alias("n"),
        F.count("blocks").alias("with_blocks"),
        F.sum(F.size("blocks")).alias("total_blocks"),
    ).collect()[0]
    assert got["n"] == 40 and got["with_blocks"] > 0 and got["total_blocks"] > 0
    # exchange-free: no shuffle in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
