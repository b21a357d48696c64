"""Mint the golden HTML corpus for the WARC rule-table parity gate.

For every rule in data/warc_query_rules.json (74) and
data/warc_wsrb_rules.json (88) + data/warc_wscrb_rules.json (1), this tool
synthesizes well-formed XHTML documents that exercise the rule — elements
built straight from the rule's own xpath constraints (attributes satisfying
each predicate, wrapper chains for descendant steps, planted query/url/
title/text payloads) plus negative variants (a required class token
stripped) — and a capture URL minted from the rule's url_pattern (reusing
make_rule_corpus.expand).

Each document's golden is computed TWICE and must agree before freezing:
1. the planted intent (the generator knows which rule should win and what
   value it planted);
2. the independent ElementTree-based oracle (tools/xpath_et_oracle.py) run
   as a line-faithful re-execution of the reference cascade
   (warc_query.py:112-131 first-applicable-parser-wins;
   warc_web_search_result_blocks.py:118-180 per-element url/title/text
   firsts + urljoin).

Output: archive_query_log_spark/data/warc_rule_corpus.json — consumed by
tests/test_warc_rules.py and the warc_rules_parity / wsrb_rules_parity
entries in entry_queries.py (goldens inlined in the oracle SQL).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path
from urllib.parse import urljoin
from xml.sax.saxutils import escape, quoteattr

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from make_rule_corpus import expand  # noqa: E402 — url_pattern expansion
from xpath_et_oracle import Doc, clean_text, eval_xpath  # noqa: E402

from archive_query_log_spark.functions.xpath_lite import (  # noqa: E402
    _Path,
    _parse_path,
    _split_union,
)

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "archive_query_log_spark/data"

VOID = frozenset("input img br hr meta link".split())


class El:
    def __init__(self, tag: str):
        self.tag = tag if tag != "*" else "div"
        self.attrs: dict[str, str] = {}
        self.children: list[El] = []
        self.text: str | None = None

    def serialize(self) -> str:
        attrs = "".join(f" {k}={quoteattr(v)}" for k, v in self.attrs.items())
        if not self.children and self.text is None:
            return f"<{self.tag}{attrs}/>"
        inner = escape(self.text) if self.text else ""
        inner += "".join(c.serialize() for c in self.children)
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"


def _apply_pred(el: El, pred, parent: El | None, negate: bool = False):
    """Mutate el (and its parent context) so `pred` holds (or fails)."""
    op = pred[0]
    if op == "and":
        _apply_pred(el, pred[1], parent, negate=False)
        _apply_pred(el, pred[2], parent, negate=False)
        return
    if op == "not":
        # ensure the inner predicate FAILS: for the table's only uses
        # (class-token / exists+class-token), simply not adding the token
        # suffices — nothing to do unless a positive constraint added it
        inner = pred[1]
        tokens = _tokens_of(inner)
        for attr, tok in tokens:
            current = el.attrs.get(attr, "")
            if f" {tok} " in f" {current} ":
                raise ValueError(f"conflicting not() constraint: {pred}")
        return
    if op == "exists":
        el.attrs.setdefault(pred[1], "zz")
        return
    if op == "eq":
        el.attrs[pred[1]] = pred[2]
        return
    if op == "contains":
        el.attrs.setdefault(pred[1], f"xx{pred[2]}yy")
        if pred[2] not in el.attrs[pred[1]]:
            el.attrs[pred[1]] += pred[2]
        return
    if op == "starts":
        if not el.attrs.get(pred[1], "").startswith(pred[2]):
            el.attrs[pred[1]] = pred[2] + el.attrs.get(pred[1], "tail")
        return
    if op == "class-token":
        tok = pred[2].strip()
        current = el.attrs.get(pred[1])
        el.attrs[pred[1]] = f"pre {tok} post" if not current else f"{current} {tok}"
        return
    if op == "pos":
        if parent is not None:
            while len(parent.children) < pred[1] - 1:
                parent.children.append(El("i"))
        return
    if op == "haschild":
        if not any(c.tag == pred[1] for c in el.children):
            el.children.append(El(pred[1]))
        return
    raise ValueError(f"cannot apply predicate {pred!r}")


def _tokens_of(pred) -> list[tuple[str, str]]:
    if pred[0] == "class-token":
        return [(pred[1], pred[2].strip())]
    if pred[0] in ("and",):
        return _tokens_of(pred[1]) + _tokens_of(pred[2])
    if pred[0] in ("exists",):
        return []
    if pred[0] in ("eq", "contains", "starts"):
        return [(pred[1], pred[2])]
    return []


def build_branch(path: _Path, payload_attr: str | None, payload: str):
    """Element chain satisfying one parsed xpath branch; returns
    (root_elements, target) where target carries the payload."""
    roots: list[El] = []
    parent: El | None = None
    target: El | None = None
    for step in path.steps:
        if step.test == "text()":
            if parent is None:
                raise ValueError("text() with no parent element")
            parent.text = payload
            return roots, parent
        if step.test.startswith("@"):
            el = parent
            if el is None:
                raise ValueError("@attr with no parent element")
            el.attrs[step.test[1:]] = payload
            return roots, el
        el = El(step.test)
        for pred in step.predicates:
            _apply_pred(el, pred, parent)
        # positional predicates pad preceding siblings in the parent
        pos_preds = [p for p in step.predicates if p[0] == "pos"]
        if parent is None:
            roots.append(el)
        else:
            if pos_preds:
                want = pos_preds[0][1]
                existing = len(parent.children)
                while existing < want - 1:
                    parent.children.append(El("i"))
                    existing += 1
                parent.children.append(el)
            else:
                parent.children.append(el)
        parent = el
        target = el
    if payload_attr is not None and target is not None:
        target.attrs[payload_attr] = payload
    return roots, target


def build_doc(xpath: str, payload_kind: str, payload: str, branch_idx: int = 0):
    """One XHTML document where `xpath`'s branch #branch_idx yields
    `payload` (as text or the terminal attribute)."""
    branches = _split_union(xpath)
    path = _parse_path(branches[branch_idx % len(branches)])
    roots, _ = build_branch(path, None, payload)
    body = El("body")
    body.children.extend(roots)
    html = El("html")
    html.children.append(body)
    return html


def doc_to_xhtml(html: El) -> str:
    return html.serialize()


def strip_token_variant(xhtml: str) -> str:
    """Negative variant: first class token mangled so token-match rules
    fall through."""
    return xhtml.replace("class=", "data-was-class=", 1)


def mint_url(pattern: str, i: int) -> str | None:
    skels = expand(pattern)
    if not skels:
        return None
    return skels[i % len(skels)]


# --- warc_query corpus -------------------------------------------------------


def warc_query_cascade_oracle(rules, provider_id, url, doc: Doc):
    """Line-faithful reference cascade (warc_query.py:112-131): first
    applicable rule whose xpath yields a clean non-empty string wins."""
    for r in rules:
        if r["provider_id"] != provider_id:
            continue
        if not re.match(r["url_pattern"], url):
            continue
        for value in eval_xpath(r["xpath"], doc.root, doc):
            cleaned = clean_text(value)
            if cleaned is not None:
                return cleaned, r["rule_order"]
    return None, None


def build_warc_query_corpus(rules) -> list[dict]:
    corpus = []
    for r in rules:
        url = mint_url(r["url_pattern"], r["rule_order"])
        if url is None:
            raise ValueError(f"unexpandable url_pattern {r['url_pattern']!r}")
        n_branches = len(_split_union(r["xpath"]))
        for bi in range(n_branches):  # every union branch gets a document
            payload = f"query {r['rule_order']}-{bi} tèst"
            try:
                html = build_doc(r["xpath"], "query", payload, bi)
            except ValueError as e:
                raise ValueError(f"rule {r['rule_order']}: {e}") from e
            xhtml = doc_to_xhtml(html)
            corpus.append(
                {
                    "provider_id": r["provider_id"],
                    "url": url,
                    "html": xhtml,
                    "_planted": (payload, r["rule_order"]),
                }
            )
            if bi == 0:
                corpus.append(
                    {
                        "provider_id": r["provider_id"],
                        "url": url,
                        "html": strip_token_variant(xhtml),
                        "_planted": None,  # golden decided by oracle alone
                    }
                )
    # whitespace-mangled payload: clean_text must normalize
    corpus.append(
        {
            "provider_id": rules[0]["provider_id"],
            "url": mint_url(rules[0]["url_pattern"], 0),
            "html": (
                "<html><body><form id='tsf'><input name='q'"
                " value='  spaced\t\tout   query '/></form></body></html>"
            ).replace("'", '"'),
            "_planted": ("spaced out query", 0),
        }
    )
    # finalize goldens via the ET oracle
    out = []
    for i, row in enumerate(corpus):
        doc = Doc(row["html"])
        got_q, got_rule = warc_query_cascade_oracle(
            rules, row["provider_id"], row["url"], doc
        )
        planted = row.pop("_planted")
        if planted is not None:
            # planted rows must win with the planted value via the PLANTED
            # rule or an earlier same-provider rule that also matches (the
            # cascade is first-match; accept the oracle's earlier winner
            # only if it still yields the planted value)
            if got_q != planted[0]:
                raise ValueError(
                    f"corpus row {i}: planted {planted} but oracle says"
                    f" ({got_q!r}, {got_rule})"
                )
        out.append(
            {
                "capture_id": f"wq{i:04d}",
                "provider_id": row["provider_id"],
                "url": row["url"],
                "html": row["html"],
                "warc_query": got_q,
                "wq_rule": got_rule,
            }
        )
    return out


# --- wsrb corpus -------------------------------------------------------------


def build_block_doc(rule, n_blocks: int, branch_idx: int = 0):
    """Document with n_blocks result blocks for one wsrb rule (block
    elements built from xpath union branch #branch_idx; the relative
    url/title/text plants cycle their own branches too); returns
    (xhtml, expected_blocks)."""
    branches = _split_union(rule["xpath"])
    path = _parse_path(branches[branch_idx % len(branches)])
    body = El("body")
    expected = []
    container: El | None = None
    for bi in range(n_blocks):
        roots, block = build_branch(path, None, f"-")
        if block is None:
            raise ValueError("no block element built")
        block.text = None
        # merge the container chain: first block creates it, later blocks
        # append to the SAME container so they are siblings
        if container is None:
            body.children.extend(roots)
            container = block
        else:
            parent = _find_parent(body, container)
            parent.children.append(block)
            container = block
        url_val = None
        if rule.get("url_xpath") and bi != 1:  # block 1: missing url
            _plant_relative(block, rule["url_xpath"], f"/r/{bi}?x=1", bi)
            url_val = f"/r/{bi}?x=1"
        title_val = None
        if rule.get("title_xpath"):
            planted = _plant_relative(
                block, rule["title_xpath"], f"Title {bi} ", bi
            )
            title_val = planted.strip()
        text_val = None
        if rule.get("text_xpath"):
            planted = _plant_relative(
                block, rule["text_xpath"], f"Snippet {bi}.", bi
            )
            text_val = planted.strip()
        expected.append(
            {
                "rank": bi,
                "url": url_val,
                "title": title_val,
                "text": text_val,
            }
        )
    html = El("html")
    html.children.append(body)
    return html.serialize(), expected


def _plant_relative(block: El, xpath: str, payload: str, branch: int = 0) -> str:
    """Plant payload so `xpath` (relative to block) yields it first —
    union branch #branch (mod n) carries it. Returns the planted string."""
    branches = _split_union(xpath)
    path = _parse_path(branches[branch % len(branches)])
    if not path.steps:
        raise ValueError(f"cannot plant on bare '.' xpath {xpath!r}")
    if path.steps[0].test == "text()":
        # './/text()' or 'text()': the block's own text content
        block.text = payload
        return payload
    if path.steps[0].test.startswith("@"):
        # './@href': the block element's own attribute
        block.attrs[path.steps[0].test[1:]] = payload
        return payload
    roots, _ = build_branch(path, None, payload)
    block.children.extend(roots)
    return payload


def _find_parent(root: El, target: El) -> El:
    for child in root.children:
        if child is target:
            return root
        found = _find_parent(child, target)
        if found is not None:
            return found
    return None


def wsrb_oracle(rules, provider_id, url, doc: Doc):
    """Line-faithful reference block extraction
    (warc_web_search_result_blocks.py:118-180): first applicable rule with
    >= 1 element wins; per element the FIRST url/title/text string, url
    urljoined against the capture url."""
    for r in rules:
        if r["provider_id"] != provider_id:
            continue
        if not re.match(r["url_pattern"], url):
            continue
        elements = eval_xpath(r["xpath"], doc.root, doc)
        if not elements:
            continue
        blocks = []
        for i, el in enumerate(elements):
            block_url = None
            if r.get("url_xpath"):
                urls = eval_xpath(r["url_xpath"], el, doc)
                if urls:
                    block_url = urljoin(url, urls[0].strip())
            title = None
            if r.get("title_xpath"):
                titles = eval_xpath(r["title_xpath"], el, doc)
                if titles:
                    title = titles[0].strip()
            text = None
            if r.get("text_xpath"):
                texts = eval_xpath(r["text_xpath"], el, doc)
                if texts:
                    text = texts[0].strip()
            blocks.append(
                {"rank": i, "url": block_url, "title": title, "text": text}
            )
        return blocks, r["rule_order"]
    return None, None


def build_wsrb_corpus(rules) -> list[dict]:
    corpus = []
    for r in rules:
        url = mint_url(r["url_pattern"], r["rule_order"])
        if url is None:
            raise ValueError(f"unexpandable url_pattern {r['url_pattern']!r}")
        for branch_idx in range(len(_split_union(r["xpath"]))):
            xhtml, expected = build_block_doc(r, 3, branch_idx)
            corpus.append(
                {"provider_id": r["provider_id"], "url": url, "html": xhtml,
                 "_expected": expected, "_rule": r["rule_order"]}
            )
    out = []
    for i, row in enumerate(corpus):
        doc = Doc(row["html"])
        blocks, rule = wsrb_oracle(rules, row["provider_id"], row["url"], doc)
        if blocks is None:
            raise ValueError(f"wsrb corpus row {i}: no rule matched")
        expected = row.pop("_expected")
        if rule > row["_rule"]:
            raise ValueError(
                f"wsrb corpus row {i}: rule {row['_rule']} planted but"
                f" oracle picked LATER rule {rule}"
            )
        if rule != row["_rule"]:
            # an earlier same-provider rule with an overlapping url_pattern
            # legitimately wins the first-match cascade; the oracle output
            # IS the golden then (production would parse it the same way)
            out.append(
                {
                    "capture_id": f"wb{i:04d}",
                    "provider_id": row["provider_id"],
                    "url": row["url"],
                    "html": row["html"],
                    "blocks": blocks,
                    "wsrb_rule": rule,
                }
            )
            continue
        base = row["url"]
        want = [
            {**b, "url": urljoin(base, b["url"]) if b["url"] else None}
            for b in expected
        ]
        got_core = [
            {k: b[k] for k in ("rank", "url", "title", "text")} for b in blocks
        ]
        if got_core != want:
            # relaxed check: a relative chain can nest elements that match
            # the block xpath itself (e.g. naver's tr//td//table), shifting
            # ranks — the golden is then the oracle's output, but every
            # planted payload must still have been extracted somewhere
            got_urls = {b["url"] for b in got_core}
            got_titles = {b["title"] for b in got_core}
            got_texts = {b["text"] for b in got_core}
            for b in want:
                if b["url"] is not None and b["url"] not in got_urls:
                    raise ValueError(
                        f"wsrb corpus row {i} (rule {rule}): planted url"
                        f" {b['url']!r} missing from oracle output"
                    )
                if b["title"] is not None and b["title"] not in got_titles:
                    raise ValueError(
                        f"wsrb corpus row {i} (rule {rule}): planted title"
                        f" {b['title']!r} missing from oracle output"
                    )
                if b["text"] is not None and b["text"] not in got_texts:
                    raise ValueError(
                        f"wsrb corpus row {i} (rule {rule}): planted text"
                        f" {b['text']!r} missing from oracle output"
                    )
        out.append(
            {
                "capture_id": f"wb{i:04d}",
                "provider_id": row["provider_id"],
                "url": row["url"],
                "html": row["html"],
                "blocks": blocks,
                "wsrb_rule": rule,
            }
        )
    return out


def main() -> None:
    wq_rules = json.loads((DATA / "warc_query_rules.json").read_text())["rules"]
    wsrb_rules = json.loads((DATA / "warc_wsrb_rules.json").read_text())["rules"]
    wscrb_rules = json.loads((DATA / "warc_wscrb_rules.json").read_text())["rules"]

    wq = build_warc_query_corpus(wq_rules)
    wb = build_wsrb_corpus(wsrb_rules)
    # the single special-contents rule goes through the same block recipe
    wc = build_wsrb_corpus(wscrb_rules)
    for row in wc:
        row["capture_id"] = "wc" + row["capture_id"][2:]

    stats = {
        "_provenance": (
            "Synthesized XHTML parity corpus minted by"
            " tools/make_warc_corpus.py from the rule tables' own xpath"
            " constraints; goldens double-derived (planted intent + the"
            " independent ElementTree oracle in tools/xpath_et_oracle.py)."
        ),
        "n_wq_rows": len(wq),
        "n_wq_rules_won": len({r["wq_rule"] for r in wq if r["wq_rule"] is not None}),
        "n_wsrb_rows": len(wb),
        "n_wsrb_rules_won": len({r["wsrb_rule"] for r in wb}),
        "n_wscrb_rows": len(wc),
    }
    (DATA / "warc_rule_corpus.json").write_text(
        json.dumps(
            {"stats": stats, "warc_query": wq, "wsrb": wb, "wscrb": wc},
            indent=0,
            ensure_ascii=False,
        )
        + "\n"
    )
    print("stats:", stats)


if __name__ == "__main__":
    main()
