"""XPath-subset evaluator over stdlib ``html.parser`` — the engine for the
reference's REAL WARC parser-rule tables (data/warc_*_rules.json).

The reference evaluates its rules with lxml's XPath over an HTMLParser tree
(parsers/utils/xml.py:parse_xml_tree, warc_query.py:66-89). lxml does not
ship in this environment, so this module implements exactly the XPath 1.0
fragment the 163 reference rules actually use (surveyed across all 392
xpath strings in warc_query.py / warc_web_search_result_blocks.py /
warc_special_contents_result_blocks.py):

- top-level union ``a | b`` (results merged in document order, deduplicated
  — XPath union semantics);
- absolute ``//step`` paths, context-relative ``.//step`` / ``.`` paths and
  bare-name relative paths (``h3[...]//text()``), with ``/`` (child) and
  ``//`` (descendant) separators;
- node tests: element name, ``*``, ``text()``; terminal ``@attr``;
- predicates: ``@attr``, ``@attr = 'v'``,
  ``contains(@attr, 'v')``, ``starts-with(@attr, 'v')``,
  ``contains(concat(' ', normalize-space(@attr), ' '), ' v ')``
  (CSS-class token match), ``not(...)``, ``and`` conjunction, parentheses,
  and the cssselect-generated positional test
  ``(count(preceding-sibling::*)+1) = N``.

Anything outside this grammar raises at compile time — a new reference rule
using an unsupported construct fails loudly instead of parsing wrong.

DOM notes vs lxml.etree.HTMLParser: tag and attribute names are lowercased
and character references decoded (both parsers do); HTML void elements
(``<input>`` etc.) never take children; stray end tags are dropped and
unclosed elements are closed by enclosing end tags (simple recovery —
lxml's libxml2 recovery can differ on pathological markup; the parity
corpus uses well-formed markup and the real-HTML goldens pin the observed
behavior). Python's ``html.parser`` is the sanctioned stdlib stand-in; the
evaluator is written against the DOM protocol below, so swapping in an
lxml-backed DOM where lxml is available changes nothing else.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Text:
    __slots__ = ("value", "parent", "order")

    def __init__(self, value: str, parent: "Node", order: int):
        self.value = value
        self.parent = parent
        self.order = order

    def __repr__(self):  # pragma: no cover - debug only
        return f"Text({self.value!r})"


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order", "tagidx")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None", order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | Text] = []
        self.parent = parent
        self.order = order

    def iter_descendants(self):
        # explicit-stack preorder, NOT recursive `yield from`: the nested-
        # generator form pays O(depth) frame hops per yielded node, and the
        # descendant axis is the inner loop of every absolute xpath step
        # (measured 2× on the real-SERP corpus walk)
        stack = [iter(self.children)]
        while stack:
            for child in stack[-1]:
                yield child
                if isinstance(child, Node) and child.children:
                    stack.append(iter(child.children))
                    break
            else:
                stack.pop()

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def __repr__(self):  # pragma: no cover - debug only
        return f"Node(<{self.tag}> order={self.order})"


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None, 0)
        self._stack = [self.root]
        self._order = 1

    def _attrs(self, attrs):
        out = {}
        for k, v in attrs:
            if k not in out:  # first occurrence wins (lxml behavior)
                out[k] = v if v is not None else ""
        return out

    def handle_starttag(self, tag, attrs):
        node = Node(tag, self._attrs(attrs), self._stack[-1], self._order)
        self._order += 1
        self._stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._attrs(attrs), self._stack[-1], self._order)
        self._order += 1
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data):
        if data:
            parent = self._stack[-1]
            parent.children.append(Text(data, parent, self._order))
            self._order += 1


def parse_html(text: str) -> Node:
    """Parse HTML into the lightweight DOM; returns the document node."""
    builder = _DomBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# --- XPath subset compiler ---------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<dslash>//)
      | (?P<slash>/)
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<pipe>\|)
      | (?P<at>@)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<eq>=)
      | (?P<string>'[^']*'|"[^"]*")
      | (?P<number>\d+)
      | (?P<dot>\.)
      | (?P<star>\*)
      | (?P<name>[A-Za-z_][A-Za-z0-9_.:-]*)
    )""",
    re.VERBOSE,
)


class _Scanner:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.kind: str | None = None
        self.value: str | None = None
        self.advance()

    def advance(self):
        rest = self.text[self.pos :]
        if not rest.strip():
            self.kind, self.value = None, None
            self.pos = len(self.text)
            return
        m = _TOKEN.match(self.text, self.pos)
        if m is None:
            raise ValueError(
                f"xpath_lite: cannot tokenize at {self.text[self.pos:]!r}"
            )
        self.pos = m.end()
        self.kind = m.lastgroup
        self.value = m.group(m.lastgroup)

    def accept(self, kind: str, value: str | None = None):
        if self.kind == kind and (value is None or self.value == value):
            v = self.value
            self.advance()
            return v
        return None

    def expect(self, kind: str, value: str | None = None):
        v = self.accept(kind, value)
        if v is None:
            raise ValueError(
                f"xpath_lite: expected {value or kind} at"
                f" {self.text[self.pos:]!r} in {self.text!r}"
            )
        return v


class _Step:
    __slots__ = ("descendant", "test", "predicates")

    def __init__(self, descendant: bool, test: str, predicates: list):
        self.descendant = descendant  # True = '//', False = '/'
        self.test = test  # element name, '*', 'text()', or '@attr'
        self.predicates = predicates


class _Path:
    __slots__ = ("absolute", "steps")

    def __init__(self, absolute: bool, steps: list[_Step]):
        self.absolute = absolute  # leading '//' → start from document root
        self.steps = steps


# predicate AST: ('exists', attr) | ('eq', attr, v) | ('contains', attr, v)
# | ('starts', attr, v) | ('class-token', attr, v) | ('not', p)
# | ('and', p, q) | ('pos', n)


def _parse_predicate(sc: _Scanner):
    return _parse_and(sc)


def _parse_and(sc: _Scanner):
    left = _parse_unary(sc)
    while sc.accept("name", "and"):
        right = _parse_unary(sc)
        left = ("and", left, right)
    return left


def _unquote(s: str) -> str:
    return s[1:-1]


def _parse_unary(sc: _Scanner):
    if sc.accept("name", "not"):
        sc.expect("lparen")
        inner = _parse_predicate(sc)
        sc.expect("rparen")
        return ("not", inner)
    if sc.accept("lparen"):
        # plain parenthesized predicate; the cssselect-generated positional
        # form (count(preceding-sibling::*)+1) = N is always a standalone
        # predicate body and is intercepted by regex in
        # _parse_predicate_text before the grammar runs
        inner = _parse_predicate(sc)
        sc.expect("rparen")
        return inner
    if sc.accept("at"):
        attr = sc.expect("name")
        if sc.accept("eq"):
            return ("eq", attr, _unquote(sc.expect("string")))
        return ("exists", attr)
    if sc.kind == "name" and sc.value in ("contains", "starts-with"):
        fn = sc.value
        sc.advance()
        sc.expect("lparen")
        if sc.accept("name", "concat"):
            # contains(concat(' ', normalize-space(@attr), ' '), ' v ')
            sc.expect("lparen")
            lead = _unquote(sc.expect("string"))
            sc.expect("comma")
            sc.expect("name", "normalize-space")
            sc.expect("lparen")
            sc.expect("at")
            attr = sc.expect("name")
            sc.expect("rparen")
            sc.expect("comma")
            trail = _unquote(sc.expect("string"))
            sc.expect("rparen")
            sc.expect("comma")
            value = _unquote(sc.expect("string"))
            sc.expect("rparen")
            if fn != "contains" or lead != " " or trail != " ":
                raise ValueError(
                    f"xpath_lite: unsupported {fn}/concat form in {sc.text!r}"
                )
            return ("class-token", attr, value)
        sc.expect("at")
        attr = sc.expect("name")
        sc.expect("comma")
        value = _unquote(sc.expect("string"))
        sc.expect("rparen")
        return ("contains" if fn == "contains" else "starts", attr, value)
    raise ValueError(
        f"xpath_lite: unsupported predicate at {sc.text[sc.pos:]!r}"
        f" in {sc.text!r}"
    )


_POSITIONAL = re.compile(
    r"^\(\s*count\(\s*preceding-sibling::\*\s*\)\s*\+\s*1\s*\)\s*=\s*(\d+)$"
)

# path-existence predicate, used once in the reference tables
# (warc_wsrb rule 83: "a[./div][@class and ...]/@href")
_HAS_CHILD = re.compile(r"^\./([A-Za-z_][A-Za-z0-9_.:-]*)$")


def _parse_predicate_text(text: str):
    """One ``[...]`` body: positional / child-existence forms via regex,
    else the grammar."""
    m = _POSITIONAL.match(text.strip())
    if m:
        return ("pos", int(m.group(1)))
    m = _HAS_CHILD.match(text.strip())
    if m:
        return ("haschild", m.group(1))
    sc = _Scanner(text)
    pred = _parse_predicate(sc)
    if sc.kind is not None:
        raise ValueError(f"xpath_lite: trailing tokens in predicate {text!r}")
    return pred


def _split_predicates(text: str, i: int) -> tuple[list, int]:
    """Consume zero or more bracketed predicates starting at text[i]."""
    preds = []
    n = len(text)
    while i < n and text[i] == "[":
        depth = 0
        j = i
        quote = None
        while j < n:
            c = text[j]
            if quote:
                if c == quote:
                    quote = None
            elif c in "'\"":
                quote = c
            elif c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise ValueError(f"xpath_lite: unbalanced predicate in {text!r}")
        preds.append(_parse_predicate_text(text[i + 1 : j]))
        i = j + 1
    return preds, i


_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.:-]*")


def _parse_path(text: str) -> _Path:
    text = text.strip()
    i = 0
    n = len(text)
    absolute = False
    steps: list[_Step] = []
    if text.startswith("//"):
        absolute = True
        i = 0  # the leading '//' is consumed as the first step's separator
    elif text.startswith("/"):
        # rooted single-slash paths ('/html/body/...') are outside the
        # grammar the reference rules use — reject at compile time rather
        # than silently evaluating as a relative child path
        raise ValueError(
            f"xpath_lite: rooted '/' paths unsupported (got {text!r});"
            " only '//'-absolute and relative paths are in the grammar"
        )
    elif text.startswith("."):
        i = 1
        if i == n:  # bare '.' = context node itself
            return _Path(False, [])
    first = True
    while i < n:
        if text.startswith("//", i):
            descendant = True
            i += 2
        elif text.startswith("/", i):
            descendant = False
            i += 1
        elif first and not absolute:
            descendant = False  # bare relative first step = child axis
        else:
            raise ValueError(f"xpath_lite: expected step separator in {text!r} at {i}")
        first = False
        if text.startswith("@", i):
            m = _NAME_RE.match(text, i + 1)
            if m is None:
                raise ValueError(f"xpath_lite: bad attribute step in {text!r}")
            steps.append(_Step(descendant, "@" + m.group(0), []))
            i = m.end()
            continue
        if text.startswith("text()", i):
            steps.append(_Step(descendant, "text()", []))
            i += len("text()")
            continue
        if text.startswith("*", i):
            test = "*"
            i += 1
        else:
            m = _NAME_RE.match(text, i)
            if m is None:
                raise ValueError(
                    f"xpath_lite: bad node test in {text!r} at {i}"
                )
            test = m.group(0)
            i = m.end()
        preds, i = _split_predicates(text, i)
        steps.append(_Step(descendant, test, preds))
    if not steps and not absolute:
        return _Path(False, [])
    for step in steps[:-1]:
        if step.test == "text()" or step.test.startswith("@"):
            raise ValueError(
                f"xpath_lite: {step.test} must be the terminal step"
                f" in {text!r}"
            )
    return _Path(absolute, steps)


def _split_union(text: str) -> list[str]:
    """Split on top-level '|' (none of the rules nest '|' in predicates,
    but quotes are respected anyway)."""
    parts = []
    depth = 0
    quote = None
    start = 0
    for i, c in enumerate(text):
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
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


class XPathLite:
    """Compiled XPath-subset expression.

    ``evaluate(context)`` returns strings (for ``@attr`` / ``text()``
    terminals) or Nodes (element selection), in document order with XPath
    union deduplication.
    """

    def __init__(self, expression: str):
        self.expression = expression
        self.paths = [_parse_path(p) for p in _split_union(expression)]
        kinds = {self._result_kind(p) for p in self.paths}
        if len(kinds) > 1:
            raise ValueError(
                f"xpath_lite: mixed node/string union in {expression!r}"
            )
        self.result_kind = kinds.pop() if kinds else "node"

    @staticmethod
    def _result_kind(path: _Path) -> str:
        if not path.steps:
            return "node"
        last = path.steps[-1].test
        return "string" if last == "text()" or last.startswith("@") else "node"

    def evaluate(self, context: Node, root: Node | None = None):
        root = root if root is not None else _root_of(context)
        # lxml exposes no document node — a context-relative path given the
        # top-level parse_html() result must evaluate from the ROOT ELEMENT
        # (e.g. <html>), exactly like lxml/ElementTree whose fromstring()
        # returns that element. Absolute '//' paths are unaffected (they
        # start from `root` and already include the root element in the
        # walk). Pinned by the differential property test, which caught the
        # one-level-off divergence on bare-relative top-level paths.
        if context.parent is None and context.tag == "#document":
            for c in context.children:
                if isinstance(c, Node):
                    context = c
                    break
        seen = set()
        results = []
        for path in self.paths:
            for item in _eval_path(path, context, root):
                if item[1] in seen:
                    continue
                seen.add(item[1])
                results.append(item)
        results.sort(key=lambda it: it[0])
        return [it[2] for it in results]


def _root_of(node: Node) -> Node:
    while node.parent is not None:
        node = node.parent
    return node


def _tag_index(root: Node) -> dict:
    """tag → [elements in document order] for the whole document, built
    lazily on the root and cached there. A SERP runs ~40+ rule xpaths, and
    each absolute '//name' step was walking every node of a 100-420 KB
    document; with the index the walk happens once per document and each
    step starts from exactly the matching elements. Safe because the
    cascades read, never mutate, the DOM (module contract)."""
    idx = getattr(root, "tagidx", None)
    if idx is None:
        idx = {}
        for n in root.iter_descendants():
            if isinstance(n, Node):
                idx.setdefault(n.tag, []).append(n)
        root.tagidx = idx
    return idx


def _match_test(item, test: str):
    if test == "text()":
        return isinstance(item, Text)
    if not isinstance(item, Node):
        return False
    return test == "*" or item.tag == test


def _attr_of(node: Node, attr: str) -> str | None:
    return node.attrs.get(attr)


_WS = re.compile(r"\s+")


def _eval_pred(pred, node: Node) -> bool:
    op = pred[0]
    if op == "and":
        return _eval_pred(pred[1], node) and _eval_pred(pred[2], node)
    if op == "not":
        return not _eval_pred(pred[1], node)
    if op == "exists":
        return _attr_of(node, pred[1]) is not None
    if op == "eq":
        return _attr_of(node, pred[1]) == pred[2]
    if op == "contains":
        v = _attr_of(node, pred[1])
        return v is not None and pred[2] in v
    if op == "starts":
        v = _attr_of(node, pred[1])
        return v is not None and v.startswith(pred[2])
    if op == "class-token":
        # contains(concat(' ', normalize-space(@a), ' '), <literal>): the
        # literal keeps its own pad spaces (cssselect emits ' token '), and
        # a missing attribute normalizes to '' (the padded string is '  ')
        v = _attr_of(node, pred[1]) or ""
        normalized = _WS.sub(" ", v).strip()
        return pred[2] in f" {normalized} "
    if op == "haschild":
        return any(
            isinstance(c, Node) and c.tag == pred[1] for c in node.children
        )
    if op == "pos":
        parent = node.parent
        if parent is None:
            return pred[1] == 1
        position = 0
        for sibling in parent.children:
            if isinstance(sibling, Node):
                position += 1
                if sibling is node:
                    return position == pred[1]
        return False
    raise AssertionError(f"unknown predicate {pred!r}")


def _eval_path(path: _Path, context: Node, root: Node):
    """Yield (order_key, identity, value) triples for one union branch."""
    current: list[Node] = [root if path.absolute else context]
    if not path.steps:
        node = current[0]
        yield ((node.order, ""), ("n", id(node)), node)
        return
    for si, step in enumerate(path.steps):
        terminal = si == len(path.steps) - 1
        is_attr = step.test.startswith("@")
        out: list = []
        # absolute '//name' first step from the document root: start from
        # the tag index instead of walking the whole tree (same nodes in
        # the same document order — the index is the walk, cached)
        if (
            si == 0
            and step.descendant
            and not is_attr
            and step.test not in ("*", "text()")
            and len(current) == 1
            and current[0].parent is None
        ):
            for item in _tag_index(current[0]).get(step.test, ()):
                if step.predicates and not all(
                    _eval_pred(p, item) for p in step.predicates
                ):
                    continue
                out.append(item)
            current = out
            if terminal:
                for item in current:
                    yield ((item.order, ""), ("n", id(item)), item)
                return
            continue
        for node in current:
            if is_attr:
                # attribute terminal: child axis = the node's own attrs;
                # '//@attr' (descendant) = attrs of all descendants
                owners = (
                    [c for c in node.iter_descendants() if isinstance(c, Node)]
                    if step.descendant
                    else [node]
                )
                for owner in owners:
                    value = _attr_of(owner, step.test[1:])
                    if value is not None:
                        out.append((owner, value))
                continue
            pool = (
                node.iter_descendants()
                if step.descendant
                else iter(node.children)
            )
            for item in pool:
                if not _match_test(item, step.test):
                    continue
                if step.predicates and not all(
                    _eval_pred(p, item) for p in step.predicates
                ):
                    continue
                out.append(item)
        if is_attr:
            if not terminal:
                raise ValueError(
                    f"xpath_lite: @attr must be terminal in {path!r}"
                )
            for owner, value in out:
                yield (
                    (owner.order, step.test),
                    ("a", id(owner), step.test),
                    value,
                )
            return
        # dedup between steps (two '//' steps can reach the same node twice)
        seen = set()
        deduped = []
        for item in out:
            if id(item) in seen:
                continue
            seen.add(id(item))
            deduped.append(item)
        current = deduped
        if terminal:
            for item in current:
                if isinstance(item, Text):
                    yield ((item.order, ""), ("t", id(item)), item.value)
                else:
                    yield ((item.order, ""), ("n", id(item)), item)
            return


def tostring(node: Node) -> str:
    """Serialize an element like lxml's ``tostring(..., method='xml',
    with_tail=True)`` in spirit: XML-escaped, attributes in source order,
    followed by the element's tail text. Deterministic analog — byte parity
    with libxml2 is not claimed (the reference only feeds this into a
    process-salted ``hash()``, which is itself non-reproducible)."""
    out: list[str] = []
    _serialize(node, out)
    # tail: following text siblings up to the next element
    if node.parent is not None:
        children = node.parent.children
        idx = next(i for i, c in enumerate(children) if c is node)
        for sibling in children[idx + 1 :]:
            if isinstance(sibling, Text):
                out.append(_escape_text(sibling.value))
            else:
                break
    return "".join(out)


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return _escape_text(s).replace('"', "&quot;")


def _serialize(node: Node, out: list[str]) -> None:
    attrs = "".join(f' {k}="{_escape_attr(v)}"' for k, v in node.attrs.items())
    if not node.children:
        out.append(f"<{node.tag}{attrs}/>")
        return
    out.append(f"<{node.tag}{attrs}>")
    for child in node.children:
        if isinstance(child, Text):
            out.append(_escape_text(child.value))
        else:
            _serialize(child, out)
    out.append(f"</{node.tag}>")
