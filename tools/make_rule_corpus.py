"""Mint the golden URL corpus for the reference rule-table parity tests.

For every rule in the reference's real url_query / url_page / url_offset
tables (1,463 rules), synthesize URLs that exercise the rule — the
url_pattern is expanded into example URLs by a tiny verified regex sampler
(every candidate is re-checked with ``re.match`` against the original
pattern), the rule's parameter/segment is filled with a rotating pool of
messy values (encoded spaces, '+', encoded '&'/'=', unicode, bad escapes,
blank values, duplicate keys, encoded keys, decoy parameters) — then run the
REFERENCE cascade (tools/reference_rule_oracle.py, a line-faithful
re-execution of parsers/url_query.py:49-126 + utils) for all three tables
over each URL and record the expected (url_query, url_page, url_offset)
plus the winning rule ids as the golden.

Output: archive_query_log_spark/data/rule_corpus.json — consumed by
tests/test_reference_rules.py and the w4_reference_rules driver entry.

Deterministic: no randomness anywhere (variant choice = rule_order mod k).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

from pydantic import HttpUrl

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.reference_rule_oracle import cascade, load_oracle_rules  # noqa: E402

# --- verified regex sampler -------------------------------------------------

import string

_CAND = (
    "xaqbz0379._-"  # preferred representatives, letters first
    + string.ascii_letters
    + string.digits
    + "._-~+!*'(),;:@"
)


def _class_char(spec: str) -> str:
    rx = re.compile("[" + spec + "]")
    for ch in _CAND:
        if rx.match(ch):
            return ch
    raise ValueError(f"no representative char for class [{spec}]")


def _parse_seq(p: str, i: int, depth: int) -> tuple[list[str], int]:
    """Parse a regex alternation at position i, return (alternatives, pos).

    Stops at ')' (when depth>0) or end of string. Alternatives capped at 4.
    """
    alts: list[str] = []
    cur: list[str] = [""]

    def emit(reps: list[str]) -> None:
        nonlocal cur
        cur = [c + r for c in cur for r in reps][:4]

    while i < len(p):
        ch = p[i]
        if ch == ")" and depth > 0:
            break
        if ch == "|":
            alts.extend(cur)
            cur = [""]
            i += 1
            continue
        # --- one atom ---
        if ch == "\\":
            atom = [p[i + 1]]
            i += 2
        elif ch == "[":
            j = i + 1
            if p[j] == "^":
                j += 1
            if p[j] == "]":
                j += 1
            while p[j] != "]":
                j += 2 if p[j] == "\\" else 1
            atom = [_class_char(p[i + 1 : j])]
            i = j + 1
        elif ch == "(":
            j = i + (3 if p[i : i + 3] == "(?:" else 1)
            inner, j = _parse_seq(p, j, depth + 1)
            assert p[j] == ")", p[j:]
            atom = inner[:4]
            i = j + 1
        elif ch == ".":
            atom = ["x"]
            i += 1
        elif ch == "^" and i == 0:
            i += 1
            continue
        elif ch == "$":
            i += 1
            continue
        else:
            atom = [ch]
            i += 1
        # --- quantifier ---
        if i < len(p) and p[i] in "+*?":
            q = p[i]
            i += 1
            if q == "+" and len(atom) == 1 and atom[0].isdigit():
                atom = [atom[0] * 2]  # e.g. [0-9]+ → '33'
        emit(atom)
    alts.extend(cur)
    return alts[:4], i


def expand(pattern: str) -> list[str]:
    """Example strings matching `pattern` under re.match — verified."""
    alts, _ = _parse_seq(pattern, 0, 0)
    rx = re.compile(pattern)
    out = [a for a in dict.fromkeys(alts) if rx.match(a)]
    assert out, f"sampler produced no match for {pattern!r}: {alts!r}"
    return out


# --- value pools (rotated by rule_order so all variants appear often) -------

TEXT_VALUES = [
    "spark+graft%20engine",  # '+' and %20 both decode to space
    "a%26b%3Dc",  # encoded '&' and '='
    "%C3%BCber+cool",  # utf-8 multibyte
    "++deep++space++",  # '+' runs → whitespace collapse
    "100%",  # malformed escape (parse_qsl keeps literal '%')
    "hello",
    "",  # blank value: parse_qsl drops it → rule falls through
    "%e4%b8%ad%e6%96%87",  # lowercase hex escapes
]

INT_VALUES = ["3", "37", "0", "+42", "007", "x9", "-2", ""]

PATH_TEXT = ["blue%20laser", "plain-term", "a+b", "%C3%9Cber", "w%26x"]
PATH_INT = ["37", "005", "0", "9x", "12"]


def _q_variant(key: str, value: str, order: int) -> str:
    """One query/fragment tail exercising parse_qsl edge semantics."""
    enc_key = key
    if order % 4 == 1 and re.search(r"[^\w\-]", key):
        enc_key = re.sub(
            r"[^\w\-]", lambda m: "%%%02X" % ord(m.group(0)), key
        )  # encoded key must still match after parse_qsl key-decoding
    kv = f"{enc_key}={value}"
    if order % 5 == 0:
        kv = f"{enc_key}=&{kv}"  # blank-then-real duplicate key
    if order % 3 == 1:
        kv = f"zz=1&{kv}"
    if order % 3 == 2:
        kv = f"{kv}&aa=2"
    return kv


def _split_top_level(pattern: str) -> list[str]:
    """Split a regex on top-level '|' (paren- and escape-aware)."""
    parts, depth, cur, i = [], 0, "", 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            cur += pattern[i : i + 2]
            i += 2
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            parts.append(cur)
            cur = ""
            i += 1
            continue
        cur += ch
        i += 1
    parts.append(cur)
    return parts


def _decorate(rule, value: str) -> list[str]:
    """Extra value variants exercising the rule's remove_pattern: prepend/
    append strings the remove_pattern itself matches (expanded from it), so
    rules like remove='page:' win with 'page:37' → 37. For patterns with a
    ^-anchored and a $-anchored alternative ('^pfx...|...sfx$'), also mint
    pfx+value+sfx."""
    if rule.remove_pattern is None:
        return []
    try:
        pat = rule.remove_pattern.pattern
        deco = expand(pat)[0]
        out = [deco + value, value + deco]
        branches = _split_top_level(pat)
        pre = [b for b in branches if b.startswith("^")]
        suf = [b for b in branches if b.endswith("$")]
        if pre and suf and pre != suf:
            out.append(expand(pre[0])[0] + value + expand(suf[0])[0])
        return out
    except Exception:
        return []


def _insert_query(skel: str, tail: str) -> str:
    """Insert a query tail BEFORE any fragment the skeleton already has."""
    base, _, frag = skel.partition("#")
    sep = "" if base.endswith("?") else ("&" if "?" in base else "?")
    return base + sep + tail + (("#" + frag) if frag else "")


def _insert_fragment(skel: str, key: str, tail: str) -> str:
    """Append a fragment tail, completing a fragment the skeleton started
    (pattern '...search#q' + arg 'q' → '...search#q=VALUE')."""
    if "#" not in skel:
        return skel + "#" + tail
    frag = skel.split("#", 1)[1]
    started = frag.rsplit("&", 1)[-1]
    if started and key.startswith(started):
        return skel + key[len(started):] + "=" + tail.split("=", 1)[1]
    return skel + "&" + tail


def _rows_for_rule(rule, kind: str) -> list[tuple[str, str]]:
    """(provider_id, url) candidates exercising `rule`."""
    order = rule.rule_order
    pat = rule.url_pattern.pattern
    skeletons = expand(pat)
    is_int = kind in ("url_page", "url_offset")
    urls: list[str] = []
    for si, skel in enumerate(skeletons[:2]):
        if rule.rule_type in ("query_param", "fragment_param"):
            pool = INT_VALUES if is_int else TEXT_VALUES
            vals = [pool[(order + si) % len(pool)], pool[(order + si + 3) % len(pool)]]
            vals += _decorate(rule, vals[0])
            for v in vals:
                tail = _q_variant(rule.argument, v, order)
                if rule.rule_type == "query_param":
                    urls.append(_insert_query(skel, tail))
                else:
                    urls.append(_insert_fragment(skel, rule.argument, tail))
            # a no-match variant: matching URL, parameter absent
            if rule.rule_type == "query_param":
                urls.append(_insert_query(skel, "unrelated=1"))
        else:  # path_segment
            seg = int(rule.argument)
            path_part = skel.split("://", 1)[1]
            host, _, path = path_part.partition("/")
            segments = ("/" + path).split("/") if path else [""]
            pool = PATH_INT if is_int else PATH_TEXT
            val = pool[(order + si) % len(pool)]
            while len(segments) <= seg:
                segments.append(f"s{len(segments)}")
            scheme_host = skel.split("://", 1)[0] + "://" + host
            if segments[seg] in ("", f"s{seg}"):
                segments[seg] = val
                urls.append(scheme_host + "/".join(segments))
            else:
                urls.append(scheme_host + "/".join(segments))
                for deco_val in [segments[seg] + val, val] + _decorate(rule, val):
                    decorated = list(segments)
                    decorated[seg] = deco_val
                    urls.append(scheme_host + "/".join(decorated))
            urls.append(skel)  # bare skeleton (segment may be missing → null)
    out = []
    for u in urls:
        try:
            encoded = HttpUrl(u).encoded_string()
        except Exception:
            continue
        if rule.url_pattern.match(encoded):
            out.append((rule.provider_id, encoded))
    return out


def main() -> None:
    tables = {k: load_oracle_rules(k) for k in ("url_query", "url_page", "url_offset")}
    seen: set[tuple[str | None, str]] = set()
    corpus: list[dict] = []
    for kind, rules in tables.items():
        for rule in rules:
            for provider_id, url in _rows_for_rule(rule, kind):
                if (provider_id, url) in seen:
                    continue
                seen.add((provider_id, url))
                q, q_rule = cascade(tables["url_query"], url, provider_id)
                pg, p_rule = cascade(
                    tables["url_page"], url, provider_id, as_int=True
                )
                off, o_rule = cascade(
                    tables["url_offset"], url, provider_id, as_int=True
                )
                corpus.append(
                    {
                        "capture_id": f"c{len(corpus):05d}",
                        "provider_id": provider_id,
                        "url": url,
                        "url_query": q,
                        "url_page": pg,
                        "url_offset": off,
                        "q_rule": q_rule,
                        "p_rule": p_rule,
                        "o_rule": o_rule,
                    }
                )
    q_winners = {r["q_rule"] for r in corpus if r["q_rule"] is not None}
    p_winners = {r["p_rule"] for r in corpus if r["p_rule"] is not None}
    o_winners = {r["o_rule"] for r in corpus if r["o_rule"] is not None}
    stats = {
        "n_urls": len(corpus),
        "n_query_rules_won": len(q_winners),
        "n_page_rules_won": len(p_winners),
        "n_offset_rules_won": len(o_winners),
        "n_query_rules_total": len(tables["url_query"]),
        "n_page_rules_total": len(tables["url_page"]),
        "n_offset_rules_total": len(tables["url_offset"]),
    }
    out = (
        Path(__file__).resolve().parent.parent
        / "archive_query_log_spark/data/rule_corpus.json"
    )
    out.write_text(
        json.dumps({"stats": stats, "rows": corpus}, indent=0, ensure_ascii=False)
        + "\n"
    )
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
