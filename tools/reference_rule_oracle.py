"""Reference URL-parser cascade, re-executed faithfully in plain Python.

This is the PARITY ORACLE for the Spark cascade over the reference's real
rule tables: a line-faithful re-execution of

- rule applicability: provider equality + ``url_pattern.match`` on the
  pydantic-encoded URL string (parsers/url_query.py:49-58),
- extraction: ``parse_url_query_parameter`` / ``parse_url_fragment_parameter``
  / ``parse_url_path_segment`` (parsers/utils/url.py:5-27 — parse_qsl /
  unquote over pydantic's .query/.fragment/.path),
- cleaning: ``clean_text`` / ``clean_int`` (parsers/utils/__init__.py:5-33),
- the first-match cascade: first applicable rule whose cleaned parse is
  non-null wins (parsers/url_query.py:118-126).

The reference package itself is not importable in this sandbox (it needs
elasticsearch_dsl), so the ~40 relevant lines are re-executed here with the
same stdlib/pydantic calls. Used by tools/make_rule_corpus.py to mint the
golden corpus and by tests/test_reference_rules.py to re-verify it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import parse_qsl, unquote

from pydantic import HttpUrl


@dataclass(frozen=True)
class OracleRule:
    rule_order: int
    rule_type: str  # query_param | fragment_param | path_segment
    argument: str
    provider_id: str | None
    url_pattern: re.Pattern | None
    remove_pattern: re.Pattern | None
    space_pattern: re.Pattern | None

    @classmethod
    def from_row(cls, row: dict) -> "OracleRule":
        rc = lambda p: re.compile(p) if p is not None else None  # noqa: E731
        return cls(
            rule_order=row["rule_order"],
            rule_type=row["rule_type"],
            argument=row["argument"],
            provider_id=row["provider_id"],
            url_pattern=rc(row["url_pattern"]),
            remove_pattern=rc(row["remove_pattern"]),
            space_pattern=rc(row["space_pattern"]),
        )


# --- parsers/utils/url.py:5-27, verbatim semantics -------------------------


def parse_url_query_parameter(parameter: str, url: HttpUrl) -> str | None:
    for key, value in parse_qsl(url.query):
        if key == parameter:
            return value
    return None


def parse_url_fragment_parameter(parameter: str, url: HttpUrl) -> str | None:
    for key, value in parse_qsl(url.fragment):
        if key == parameter:
            return value
    return None


def parse_url_path_segment(segment: int, url: HttpUrl) -> str | None:
    path = url.path
    if path is None:
        return None
    path_segments = path.split("/")
    if len(path_segments) <= segment:
        return None
    return unquote(path_segments[segment])


# --- parsers/utils/__init__.py:5-33, verbatim semantics --------------------


def clean_text(
    text: str, remove_pattern: re.Pattern | None, space_pattern: re.Pattern | None
) -> str | None:
    if remove_pattern is not None:
        text = remove_pattern.sub("", text)
    if space_pattern is not None:
        text = space_pattern.sub(" ", text)
    text = text.strip()
    text = " ".join(text.split())
    if text == "":
        return None
    return text


def clean_int(text: str, remove_pattern: re.Pattern | None) -> int | None:
    if remove_pattern is not None:
        text = remove_pattern.sub("", text)
    text = text.strip()
    try:
        return int(text)
    except ValueError:
        return None


# --- the cascade (parsers/url_query.py:49-58 + :118-126) -------------------


def _parse_rule(rule: OracleRule, url: HttpUrl) -> str | int | None:
    if rule.rule_type == "query_param":
        raw = parse_url_query_parameter(rule.argument, url)
    elif rule.rule_type == "fragment_param":
        raw = parse_url_fragment_parameter(rule.argument, url)
    elif rule.rule_type == "path_segment":
        raw = parse_url_path_segment(int(rule.argument), url)
    else:  # pragma: no cover
        raise ValueError(rule.rule_type)
    return raw


def cascade(
    rules: list[OracleRule],
    url_str: str,
    provider_id: str | None,
    as_int: bool = False,
) -> tuple[str | int | None, int | None]:
    """First applicable rule with a non-null cleaned parse wins.

    Returns (value, winning rule_order) — (None, None) if no rule parsed.
    """
    url = HttpUrl(url_str)
    encoded = url.encoded_string()
    for rule in rules:
        if rule.provider_id is not None and rule.provider_id != provider_id:
            continue
        if rule.url_pattern is not None and not rule.url_pattern.match(encoded):
            continue
        raw = _parse_rule(rule, url)
        if raw is None:
            continue
        if as_int:
            value: str | int | None = clean_int(raw, rule.remove_pattern)
        else:
            value = clean_text(raw, rule.remove_pattern, rule.space_pattern)
        if value is None:
            continue
        return value, rule.rule_order
    return None, None


def load_oracle_rules(table: str) -> list[OracleRule]:
    """Rules for one of url_query / url_page / url_offset, in cascade order."""
    import json
    from pathlib import Path

    data_dir = (
        Path(__file__).resolve().parent.parent / "archive_query_log_spark/data"
    )
    doc = json.loads((data_dir / f"{table}_rules.json").read_text())
    return [OracleRule.from_row(r) for r in doc["rules"]]
