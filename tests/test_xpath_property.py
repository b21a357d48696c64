"""Differential property test: xpath_lite (html.parser engine) vs the
independent ElementTree oracle (tools/xpath_et_oracle.py) on RANDOM
well-formed documents × RANDOM grammar-valid xpaths.

The rule-derived corpus only exercises xpath shapes the reference tables
contain; this fuzz sweeps the whole supported grammar (step separators,
node tests, every predicate form, unions, terminals) against arbitrary
trees, so a corner the corpus never hits (empty class attrs, repeated
tags, '*' over mixed content, descendant-vs-child off-by-one, union dedup
across branches selecting the same node) still gets cross-checked between
two implementations that share no code."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

from archive_query_log_spark.functions.xpath_lite import XPathLite, parse_html

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from xpath_et_oracle import Doc, eval_xpath  # noqa: E402

TAGS = ["div", "span", "a", "p", "h3", "li"]
ATTRS = ["class", "id", "href", "value"]
WORDS = ["g", "res", "title", "x1", "main", "sub"]


@st.composite
def elements(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    n_attrs = draw(st.integers(0, 2))
    attrs = {}
    for _ in range(n_attrs):
        a = draw(st.sampled_from(ATTRS))
        attrs[a] = " ".join(
            draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=3))
        )
    n_children = draw(st.integers(0, 3 if depth < 3 else 0))
    children = []
    for _ in range(n_children):
        if draw(st.booleans()):
            children.append(draw(elements(depth=depth + 1)))
        else:
            children.append(draw(st.sampled_from(WORDS)) + " t")
    return (tag, attrs, children)


def serialize(el) -> str:
    tag, attrs, children = el
    a = "".join(f' {k}="{v}"' for k, v in attrs.items())
    inner = "".join(
        serialize(c) if isinstance(c, tuple) else c for c in children
    )
    return f"<{tag}{a}>{inner}</{tag}>"


@st.composite
def predicates(draw, depth=0, standalone=False):
    # pos/haschild are whole-predicate-body forms in the rule grammar
    # (never nested under not()/and) — generate them only standalone
    kinds = ["exists", "eq", "class", "contains", "starts"]
    if depth < 2:
        kinds += ["not", "and"]
    if standalone:
        kinds += ["pos", "haschild"]
    kind = draw(st.sampled_from(kinds))
    attr = draw(st.sampled_from(ATTRS))
    word = draw(st.sampled_from(WORDS))
    if kind == "exists":
        return f"@{attr}"
    if kind == "eq":
        return f"@{attr} = '{word}'"
    if kind == "class":
        return (
            f"@{attr} and contains(concat(' ', normalize-space(@{attr}),"
            f" ' '), ' {word} ')"
        )
    if kind == "contains":
        return f"contains(@{attr}, '{word}')"
    if kind == "starts":
        return f"starts-with(@{attr}, '{word}')"
    if kind == "pos":
        return f"(count(preceding-sibling::*)+1) = {draw(st.integers(1, 3))}"
    if kind == "haschild":
        return f"./{draw(st.sampled_from(TAGS))}"
    if kind == "not":
        return f"not({draw(predicates(depth=depth + 1))})"
    left = draw(predicates(depth=depth + 1))
    right = draw(predicates(depth=depth + 1))
    return f"({left}) and ({right})"


@st.composite
def xpaths(draw):
    branches = []
    for _ in range(draw(st.integers(1, 2))):
        n_steps = draw(st.integers(1, 3))
        parts = []
        for i in range(n_steps):
            sep = draw(st.sampled_from(["/", "//"]))
            if i == 0:
                lead = draw(st.sampled_from(["//", ".//", ""]))
                sep = lead
            test = draw(st.sampled_from(TAGS + ["*"]))
            preds = "".join(
                f"[{draw(predicates(standalone=True))}]"
                for _ in range(draw(st.integers(0, 2)))
            )
            parts.append(f"{sep}{test}{preds}")
        terminal = draw(st.sampled_from(["//text()", "/text()", "/@class", "/@href"]))
        branches.append("".join(parts) + terminal)
    return " | ".join(branches)


@settings(max_examples=300, deadline=None)
@given(doc=elements(), xpath=xpaths())
def test_xpath_lite_matches_et_oracle(doc, xpath):
    xhtml = f"<html><body>{serialize(doc)}</body></html>"
    got = XPathLite(xpath).evaluate(parse_html(xhtml))
    et = Doc(xhtml)
    want = eval_xpath(xpath, et.root, et)
    assert got == want, (xpath, xhtml, got, want)


@st.composite
def relative_xpaths(draw):
    """Context-relative shapes as the block url/title/text xpaths use:
    bare-name first steps and './/'-prefixed descents (no absolute '//',
    which would escape the context back to the document root)."""
    branches = []
    for _ in range(draw(st.integers(1, 2))):
        parts = []
        for i in range(draw(st.integers(1, 2))):
            sep = ".//" if i == 0 and draw(st.booleans()) else (
                "" if i == 0 else draw(st.sampled_from(["/", "//"]))
            )
            test = draw(st.sampled_from(TAGS + ["*"]))
            preds = "".join(
                f"[{draw(predicates(standalone=True))}]"
                for _ in range(draw(st.integers(0, 1)))
            )
            parts.append(f"{sep}{test}{preds}")
        terminal = draw(
            st.sampled_from(["//text()", "/text()", "/@class", "/@href"])
        )
        branches.append("".join(parts) + terminal)
    return " | ".join(branches)


@settings(max_examples=300, deadline=None)
@given(doc=elements(), xpath=relative_xpaths(), pick=st.integers(0, 7))
def test_relative_evaluation_matches_et_oracle(doc, xpath, pick):
    """Relative evaluation from an INNER context element — the exact shape
    the block extractor uses (url/title/text xpaths run against each
    selected block element, not the document)."""
    xhtml = f"<html><body>{serialize(doc)}</body></html>"
    root = parse_html(xhtml)
    et = Doc(xhtml)
    engine_els = XPathLite("//*").evaluate(root)
    oracle_els = eval_xpath("//*", et.root, et)
    assert len(engine_els) == len(oracle_els)
    if not engine_els:
        return
    idx = pick % len(engine_els)
    got = XPathLite(xpath).evaluate(engine_els[idx], root)
    want = eval_xpath(xpath, oracle_els[idx], et)
    assert got == want, (xpath, xhtml, idx, got, want)
