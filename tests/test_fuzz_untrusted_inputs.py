"""Hypothesis fuzz over the two parsers that eat UNTRUSTED crawl input —
robots.txt bodies and raw payload bytes/Content-Type headers. A crawler
feeds these adversarial data by construction; the contract is: never
raise, always return well-formed values, and stay deterministic.

(These are driver-side properties of the pure functions the Arrow UDFs
batch over — no Spark session needed, so examples are cheap and plentiful.)
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from archive_query_log_spark.functions.encoding import (
    candidate_encodings,
    detect_decode,
    parse_gate,
)
from archive_query_log_spark.functions.robots import parse_robots_txt

_SET = settings(max_examples=300, deadline=None)

# robots.txt-shaped lines mixed with arbitrary junk
_key = st.sampled_from(
    ["User-agent", "user-AGENT", "Allow", "Disallow", "Crawl-delay",
     "Sitemap", "Host", "Noindex", "x" * 300, ""]
)
_val = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00\r\n"),
    max_size=40,
)
_line = st.one_of(
    st.tuples(_key, _val).map(lambda kv: f"{kv[0]}: {kv[1]}"),
    _val,  # junk line without a colon (or with, if the value has one)
    st.just("#comment"),
)
_robots_body = st.one_of(
    st.none(),
    st.lists(_line, max_size=30).map("\n".join),
)
_agent = st.from_regex(r"[A-Za-z*][A-Za-z0-9/._-]{0,20}", fullmatch=True)


@_SET
@given(_robots_body, _agent)
def test_robots_parser_total_and_well_formed(body, agent):
    rules = parse_robots_txt(body, agent)
    for prefix, allow, delay in rules:
        assert prefix is None or (isinstance(prefix, str) and prefix != "")
        assert isinstance(allow, bool)
        if delay is not None:
            assert math.isfinite(delay) and delay >= 0
        # reduced prefixes are pure prefixes: no wildcard/anchor/query
        # metacharacters survive into the rules table
        if prefix is not None:
            assert not any(c in prefix for c in "*$?")
    # deterministic
    assert parse_robots_txt(body, agent) == rules


@_SET
@given(
    st.one_of(st.none(), st.binary(max_size=200)),
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=60,
        ),
    ),
)
def test_detect_decode_total_and_faithful(buf, content_type):
    got = detect_decode(buf, content_type)
    if buf is None:
        assert got is None
        return
    if got is not None:
        enc, text = got
        # the winning encoding really decodes the payload to that text
        assert buf.decode(enc) == text
        # and it is one of the declared candidates (after the 874 alias)
        cands = [
            "cp874" if c == "windows-874" else c
            for c in candidate_encodings(buf, content_type)
        ]
        assert enc in cands
    # deterministic
    assert detect_decode(buf, content_type) == got


@_SET
@given(
    st.one_of(st.none(), st.text(max_size=300)),
    st.one_of(st.none(), st.text(max_size=60)),
)
def test_parse_gate_total_and_closed(head, content_type):
    parser, reason = parse_gate(head, content_type)
    assert (parser, reason == "ok") in {
        ("xml", True), ("html", True), (None, False),
    }
    assert reason in {"ok", "no-mime", "non-xml", "json-like", "no-parser"}
    assert parse_gate(head, content_type) == (parser, reason)
