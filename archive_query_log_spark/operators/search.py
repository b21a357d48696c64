"""Full-text query surface (SURVEY.md §2.10) — Q1 match, Q2 advanced boolean
query language, Q3 prefix suggestions — compiled to Spark Column trees.

Reference semantics:
- Q1 match w/ optional fuzziness: /root/reference/archive_query_log/api/routers/serps.py:147-154.
- Q2 advanced language: api/utils/advanced_search_parser.py:48-266 —
  recursive descent, AND binds tighter than OR, parentheses, "phrase",
  '*'/'?' wildcards. Re-implemented from the grammar; the *output* here is a
  pyspark Column predicate instead of an ES bool tree, so Catalyst can push
  it into the scan.
- Q3 match-phrase-prefix: serps.py:224-251.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archive_query_log_spark.functions.text import tokenize


def match_any_token(text_col: Column, word: str) -> Column:
    """Token-level match (ES `match` on an analyzed field, no fuzziness)."""
    return F.array_contains(tokenize(text_col), word.lower())


def match_fuzzy(text_col: Column, word: str, max_dist: int | None = None) -> Column:
    """ES fuzziness=AUTO: edit distance 0/1/2 by term length (<3 → 0,
    3-5 → 1, >5 → 2). levenshtein against each token, JVM-side."""
    w = word.lower()
    if max_dist is None:
        max_dist = 0 if len(w) < 3 else (1 if len(w) <= 5 else 2)
    if max_dist == 0:
        return match_any_token(text_col, w)
    return F.exists(
        tokenize(text_col), lambda t: F.levenshtein(t, F.lit(w)) <= max_dist
    )


def phrase_match(text_col: Column, phrase: str) -> Column:
    """Phrase = contiguous token subsequence; normalized-whitespace contains."""
    norm = F.concat(
        F.lit(" "),
        F.array_join(tokenize(text_col), " "),
        F.lit(" "),
    )
    needle = " " + " ".join(phrase.lower().split()) + " "
    return norm.contains(needle)


def wildcard_match(text_col: Column, pattern: str) -> Column:
    """'*' → any run, '?' → one char, applied per token (ES wildcard query)."""
    rx = "^" + re.escape(pattern.lower()).replace(r"\*", ".*").replace(r"\?", ".") + "$"
    return F.exists(tokenize(text_col), lambda t: t.rlike(rx))


def prefix_suggest(
    df: DataFrame, text_col: str, prefix: str, size: int = 100
) -> DataFrame:
    """Q3: distinct values starting with the prefix, capped at `size`."""
    return (
        df.where(F.lower(F.col(text_col)).startswith(prefix.lower()))
        .select(text_col)
        .dropDuplicates([text_col])
        .orderBy(text_col)
        .limit(min(size, 100))
    )


# ---- Q2: advanced boolean query language → Column ------------------------

_TOKEN_RX = re.compile(r'\(|\)|"[^"]*"|[^\s()"]+')


class _Parser:
    """Grammar (advanced_search_parser.py:48-266):
    or_expr   := and_expr (OR and_expr)*
    and_expr  := primary ((AND)? primary)*   # bare juxtaposition = AND
    primary   := '(' or_expr ')' | '"phrase"' | term[*?]
    """

    def __init__(self, query: str, text_col: Column):
        self.toks = _TOKEN_RX.findall(query)
        self.i = 0
        self.col = text_col

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Column:
        c = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens at {self.i}: {self.toks[self.i:]}")
        return c

    def or_expr(self) -> Column:
        c = self.and_expr()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            c = c | self.and_expr()
        return c

    def and_expr(self) -> Column:
        c = self.primary()
        while True:
            t = self.peek()
            if t is None or t == ")" or t.upper() == "OR":
                return c
            if t.upper() == "AND":
                self.next()
                t = self.peek()
                if t is None:
                    raise ValueError("dangling AND")
            c = c & self.primary()

    def primary(self) -> Column:
        t = self.next()
        if t == "(":
            c = self.or_expr()
            if self.next() != ")":
                raise ValueError("unbalanced parens")
            return c
        if t.startswith('"') and t.endswith('"'):
            return phrase_match(self.col, t[1:-1])
        if "*" in t or "?" in t:
            return wildcard_match(self.col, t)
        return match_any_token(self.col, t)


def compile_advanced_query(query: str, text_col: Column) -> Column:
    """Advanced search string → Column predicate (pushdown-friendly)."""
    return _Parser(query, text_col).parse()
