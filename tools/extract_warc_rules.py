"""Extract the reference's REAL WARC parser-rule tables to JSON data.

Sources (MIT-licensed public code, rule literals only — no logic copied):
- /root/reference/archive_query_log/parsers/warc_query.py:177-586
  (74 XpathWarcQueryParser rules) -> data/warc_query_rules.json
- .../warc_web_search_result_blocks.py:303-1008
  (88 XpathWarcWebSearchResultBlocksParser rules) -> data/warc_wsrb_rules.json
- .../warc_special_contents_result_blocks.py:306
  (1 XpathWarcSpecialContentsResultBlocksParser rule) -> data/warc_wscrb_rules.json

Extraction is by AST (same recipe as tools/extract_reference_rules.py):
each parser constructor call becomes one JSON rule row with rule_order =
table position (the cascade's precedence), provider_id, url_pattern (regex
string as compiled by the reference), and the xpath fields.
"""

from __future__ import annotations

import ast
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/archive_query_log/parsers")
OUT_DIR = REPO / "archive_query_log_spark/data"

TABLES = {
    "warc_query": (
        REF / "warc_query.py",
        "WARC_QUERY_PARSERS",
        ("xpath", "remove_pattern", "space_pattern"),
    ),
    "warc_wsrb": (
        REF / "warc_web_search_result_blocks.py",
        "WARC_WEB_SEARCH_RESULT_BLOCKS_PARSERS",
        ("xpath", "url_xpath", "title_xpath", "text_xpath"),
    ),
    "warc_wscrb": (
        REF / "warc_special_contents_result_blocks.py",
        "WARC_SPECIAL_CONTENTS_RESULT_BLOCKS_PARSERS",
        ("xpath", "url_xpath", "title_xpath", "text_xpath"),
    ),
}


def _const_str(node: ast.AST) -> str | None:
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.Call) and getattr(node.func, "id", "") in (
        "re_compile",
        "UUID",
    ):
        return _const_str(node.args[0])
    return None


def extract(path: Path, table_name: str, fields: tuple[str, ...]) -> list[dict]:
    tree = ast.parse(path.read_text())
    table = None
    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            for t in targets:
                if isinstance(t, ast.Name) and t.id == table_name:
                    table = node.value
    if table is None or not isinstance(table, ast.Tuple):
        raise ValueError(f"table {table_name} not found in {path}")
    rules = []
    for order, call in enumerate(table.elts):
        if not isinstance(call, ast.Call):
            raise ValueError(f"non-call element at {table_name}[{order}]")
        row: dict = {
            "rule_order": order,
            "parser_class": getattr(call.func, "id", None),
            "provider_id": None,
            "url_pattern": None,
        }
        for f in fields:
            row[f] = None
        for kw in call.keywords:
            if kw.arg in ("provider_id", "url_pattern") or kw.arg in fields:
                row[kw.arg] = _const_str(kw.value)
            else:
                raise ValueError(
                    f"unexpected keyword {kw.arg} at {table_name}[{order}]"
                )
        rules.append(row)
    return rules


def main() -> None:
    for name, (path, table_name, fields) in TABLES.items():
        rules = extract(path, table_name, fields)
        out = OUT_DIR / f"{name}_rules.json"
        out.write_text(
            json.dumps(
                {
                    "_provenance": (
                        "Rule literals extracted verbatim by AST from the"
                        f" MIT-licensed reference table {table_name} in"
                        f" {path} (see tools/extract_warc_rules.py);"
                        " evaluation engine is original"
                        " (functions/xpath_lite.py)."
                    ),
                    "n_rules": len(rules),
                    "rules": rules,
                },
                indent=0,
                ensure_ascii=False,
            )
            + "\n"
        )
        classes = {r["parser_class"] for r in rules}
        print(f"wrote {out}: {len(rules)} rules, classes={sorted(classes)}")


if __name__ == "__main__":
    main()
