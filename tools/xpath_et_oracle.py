"""Independent XPath-subset oracle over xml.etree.ElementTree — mints the
goldens for the WARC rule parity corpus.

This is deliberately a SECOND implementation of the XPath fragment the
reference's WARC rules use, sharing nothing with the engine under test
(archive_query_log_spark/functions/xpath_lite.py): different parser (expat
XML vs html.parser), different text model (ET's .text/.tail vs discrete
text nodes), different predicate evaluator (regex-dispatched, not a
recursive-descent grammar). Corpus documents are well-formed XHTML by
construction, so the XML parser is applicable. A golden is only frozen when
this oracle's result equals the value the corpus generator deliberately
planted — two independent derivations per golden (see
tools/make_warc_corpus.py), with tests/test_warc_rules.py adding the
engine-under-test as the third.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET


class Doc:
    """Parsed document with parent/order indexes (ET has neither)."""

    def __init__(self, xhtml: str):
        self.root = ET.fromstring(xhtml)
        self.parent: dict[ET.Element, ET.Element | None] = {self.root: None}
        self.order: dict[ET.Element, int] = {}
        self.depth: dict[ET.Element, int] = {self.root: 0}
        self.subtree_end: dict[ET.Element, int] = {}
        counter = 0
        stack = [self.root]
        while stack:
            el = stack.pop()
            self.order[el] = counter
            counter += 1
            kids = list(el)
            for child in kids:
                self.parent[child] = el
                self.depth[child] = self.depth[el] + 1
            stack.extend(reversed(kids))

        def _end(el: ET.Element) -> int:
            kids = list(el)
            end = self.order[el]
            for kid in kids:
                end = _end(kid)
            self.subtree_end[el] = end
            return end

        _end(self.root)


def _descendants(el: ET.Element):
    for child in el:
        yield child
        yield from _descendants(child)


def _text_pieces(el: ET.Element, doc: Doc):
    """Descendant text 'nodes' of el in document order, as
    ((order_key, identity), value). ET models text as .text/.tail strings;
    identity is (owner id, slot) so two text nodes whose order keys tie
    (a tail after a leaf last-child shares its parent's subtree_end) are
    still distinct nodes and never dedup together."""
    out = []
    if el.text:
        out.append((((doc.order[el], 2, 0), (id(el), "text")), el.text))
    for child in _descendants(el):
        if child.text:
            out.append(
                (((doc.order[child], 2, 0), (id(child), "text")), child.text)
            )
        if child.tail:
            # the tail follows the child's ENTIRE subtree in document
            # order; nested last-children share subtree_end, and there the
            # DEEPER element's tail comes first — hence the -depth tiebreak
            out.append(
                (
                    (
                        (doc.subtree_end[child], 3, -doc.depth[child]),
                        (id(child), "tail"),
                    ),
                    child.tail,
                )
            )
    out.sort(key=lambda p: p[0][0])
    return out


def _norm_space(v: str) -> str:
    return re.sub(r"\s+", " ", v).strip()


_PRED_CLASS = re.compile(
    r"^contains\(concat\('\s*',\s*normalize-space\(@([\w.:-]+)\),\s*'\s*'\),"
    r"\s*'([^']*)'\)$"
)
_PRED_CONTAINS = re.compile(r"^contains\(@([\w.:-]+),\s*'([^']*)'\)$")
_PRED_STARTS = re.compile(r"^starts-with\(@([\w.:-]+),\s*'([^']*)'\)$")
_PRED_EQ = re.compile(r"^@([\w.:-]+)\s*=\s*'([^']*)'$")
_PRED_EXISTS = re.compile(r"^@([\w.:-]+)$")
_PRED_POS = re.compile(
    r"^\(count\(preceding-sibling::\*\)\+1\)\s*=\s*(\d+)$"
)
_PRED_CHILD = re.compile(r"^\./([\w.:-]+)$")


def _strip_outer_parens(text: str) -> str:
    text = text.strip()
    while text.startswith("(") and text.endswith(")"):
        depth = 0
        for i, c in enumerate(text):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(text) - 1:
                    return text  # parens don't wrap the whole string
        text = text[1:-1].strip()
    return text


def _split_top_and(text: str) -> list[str]:
    parts = []
    depth = 0
    quote = None
    i = 0
    start = 0
    while i < len(text):
        c = text[i]
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and text.startswith(" and ", i):
            parts.append(text[start:i])
            start = i + 5
            i += 4
        i += 1
    parts.append(text[start:])
    return parts


def eval_predicate(pred: str, el: ET.Element, doc: Doc) -> bool:
    pred = _strip_outer_parens(pred)
    parts = _split_top_and(pred)
    if len(parts) > 1:
        return all(eval_predicate(p, el, doc) for p in parts)
    pred = _strip_outer_parens(parts[0])
    if pred.startswith("not(") and pred.endswith(")"):
        return not eval_predicate(pred[4:-1], el, doc)
    if re.sub(r"\s+", "", pred).startswith("(count("):
        m = _PRED_POS.match(re.sub(r"\s+", "", pred))
        if not m:
            raise ValueError(f"oracle: bad positional predicate {pred!r}")
        parent = doc.parent[el]
        if parent is None:
            return int(m.group(1)) == 1
        return list(parent).index(el) + 1 == int(m.group(1))
    m = _PRED_CLASS.match(pred)
    if m:
        attr, lit = m.groups()
        v = el.get(attr) or ""
        return lit in f" {_norm_space(v)} "
    m = _PRED_CONTAINS.match(pred)
    if m:
        v = el.get(m.group(1))
        return v is not None and m.group(2) in v
    m = _PRED_STARTS.match(pred)
    if m:
        v = el.get(m.group(1))
        return v is not None and v.startswith(m.group(2))
    m = _PRED_EQ.match(pred)
    if m:
        return el.get(m.group(1)) == m.group(2)
    m = _PRED_EXISTS.match(pred)
    if m:
        return el.get(m.group(1)) is not None
    m = _PRED_CHILD.match(pred)
    if m:
        return any(child.tag == m.group(1) for child in el)
    raise ValueError(f"oracle: unsupported predicate {pred!r}")


_STEP = re.compile(
    r"(?P<sep>//|/|)(?P<test>@[\w.:-]+|text\(\)|\*|[\w.:-]+)(?P<preds>(?:\[[^\[\]]*(?:\[[^\[\]]*\][^\[\]]*)*\])*)"
)


def _parse_steps(branch: str):
    branch = branch.strip()
    absolute = branch.startswith("//")
    if branch.startswith("."):
        branch = branch[1:]
    steps = []
    i = 0
    while i < len(branch):
        m = _STEP.match(branch, i)
        if m is None or m.end() == i:
            raise ValueError(f"oracle: bad step at {branch[i:]!r}")
        sep = m.group("sep")
        if i == 0 and not absolute and sep == "":
            sep = "/"
        preds_text = m.group("preds")
        preds = re.findall(r"\[([^\[\]]*(?:\[[^\[\]]*\][^\[\]]*)*)\]", preds_text)
        steps.append((sep, m.group("test"), preds))
        i = m.end()
    return absolute, steps


def eval_branch(branch: str, context: ET.Element, doc: Doc):
    absolute, steps = _parse_steps(branch)
    if not steps:
        return [((doc.order[context], 0, 0), ("el", doc.order[context]), context)]
    current = [doc.root if absolute else context]
    for idx, (sep, test, preds) in enumerate(steps):
        terminal = idx == len(steps) - 1
        if test.startswith("@"):
            if not terminal:
                raise ValueError("oracle: non-terminal attribute step")
            attr = test[1:]
            results = []
            owners = []
            for el in current:
                if sep == "//":
                    if absolute and idx == 0:
                        owners.append(el)
                    owners.extend(_descendants(el))
                else:
                    owners.append(el)
            for owner in owners:
                v = owner.get(attr)
                if v is not None:
                    results.append(
                        (
                            (doc.order[owner], 1, 0),
                            ("at", doc.order[owner], attr),
                            v,
                        )
                    )
            return results
        if test == "text()":
            if not terminal:
                raise ValueError("oracle: non-terminal text() step")
            results = []
            for el in current:
                if sep == "//":
                    for (okey, ident), val in _text_pieces(el, doc):
                        results.append((okey, ("tx", ident), val))
                else:
                    # direct child text: el.text + tails of direct children
                    if el.text:
                        results.append(
                            (
                                (doc.order[el], 2, 0),
                                ("tx", (id(el), "text")),
                                el.text,
                            )
                        )
                    for child in el:
                        if child.tail:
                            results.append(
                                (
                                    (
                                        doc.subtree_end[child],
                                        3,
                                        -doc.depth[child],
                                    ),
                                    ("tx", (id(child), "tail")),
                                    child.tail,
                                )
                            )
            return results
        nxt = []
        for el in current:
            if sep == "//":
                # '//x' = /descendant-or-self::node()/child::x. From the
                # DOCUMENT (absolute first step) the root element itself is
                # a candidate — ET has no document node, so include el
                # explicitly there.
                if absolute and idx == 0:
                    pool = iter([el, *_descendants(el)])
                else:
                    pool = _descendants(el)
            else:
                pool = iter(el)
            for cand in pool:
                if test != "*" and cand.tag != test:
                    continue
                if all(eval_predicate(p, cand, doc) for p in preds):
                    nxt.append(cand)
        # dedup preserving order
        seen = set()
        current = []
        for el in nxt:
            if id(el) in seen:
                continue
            seen.add(id(el))
            current.append(el)
        if terminal:
            return [
                ((doc.order[el], 0, 0), ("el", doc.order[el]), el) for el in current
            ]
    return []


def _split_union(expr: str) -> list[str]:
    parts = []
    depth = 0
    quote = None
    start = 0
    for i, c in enumerate(expr):
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "|" and depth == 0:
            parts.append(expr[start:i])
            start = i + 1
    parts.append(expr[start:])
    return parts


def eval_xpath(expr: str, context: ET.Element, doc: Doc) -> list:
    """Evaluate the xpath subset; returns strings (attr/text terminals) or
    ET elements, in document order, union-deduplicated."""
    seen = set()
    results = []
    for branch in _split_union(expr):
        for item in eval_branch(branch, context, doc):
            if item[1] in seen:
                continue
            seen.add(item[1])
            results.append(item)
    results.sort(key=lambda it: it[0])
    return [it[2] for it in results]


def clean_text(text: str) -> str | None:
    """Reference parsers/utils/__init__.py:clean_text with no
    remove/space patterns (none of the WARC rules set them)."""
    text = text.strip()
    text = " ".join(text.split())
    return text if text else None
