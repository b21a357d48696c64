"""Extract the reference's REAL provider dimension to
archive_query_log_spark/data/providers.json.

Source: /root/reference/data/selected-services.yaml (1,025 service
definitions, MIT-licensed public data), imported with the exact semantics of
/root/reference/archive_query_log/imports/yaml.py:103-160:

- services without query_parsers are skipped (yaml.py:123 ``continue``) —
  775 providers result;
- priority = num_services - i where i indexes the FULL service list
  (yaml.py:144), so skipped services still consume priority slots;
- domains / url_path_prefixes are de-duplicated sets (yaml.py:142-143;
  stored sorted here for determinism);
- ``excluded`` becomes exclusion_reason (yaml.py:141) — excluded providers
  are kept in the dimension but skipped by the source build
  (sources/__init__.py:18-23).

provider_id recovery: the reference mints uuid4 ids at import time
(providers/__init__.py:88), so ids are not derivable — but the published
url_query rule table (data/url_query_rules.json, extracted from
parsers/url_query.py) carries the production provider UUIDs, one contiguous
rule block per provider in service order. The mapping service -> UUID is
POSITIONAL and SIGNATURE-VERIFIED: for every provider, the ordered
(url_pattern, type, argument, remove_pattern, space_pattern) tuples of its
yaml query_parsers must equal its rule block exactly (775/775 verified;
multi remove/space patterns are '|'-joined as the generated table does).
The tool fails loudly on any signature mismatch rather than guessing.
"""

from __future__ import annotations

import json
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
SERVICES = Path("/root/reference/data/selected-services.yaml")
RULES = REPO / "archive_query_log_spark/data/url_query_rules.json"
OUT = REPO / "archive_query_log_spark/data/providers.json"

TYPE_MAP = {
    "query_parameter": "query_param",
    "fragment_parameter": "fragment_param",
    "path_segment": "path_segment",
}


def _join(patterns: list[str] | None) -> str | None:
    if not patterns:
        return None
    return "|".join(patterns) if len(patterns) > 1 else patterns[0]


def _yaml_signature(service: dict) -> list[tuple]:
    sig = []
    for p in service["query_parsers"]:
        arg = (
            p.get("segment")
            if p["type"] == "path_segment"
            else p.get("parameter")
        )
        sig.append(
            (
                p.get("url_pattern"),
                TYPE_MAP[p["type"]],
                str(arg),
                _join(p.get("remove_patterns")),
                _join(p.get("space_patterns")),
            )
        )
    return sig


def main() -> None:
    services = yaml.safe_load(SERVICES.read_text())
    num_services = len(services)
    rules = json.loads(RULES.read_text())["rules"]

    # contiguous provider blocks in rule_order = service order
    block_pids: list[str] = []
    block_sigs: dict[str, list[tuple]] = {}
    for r in sorted(rules, key=lambda r: r["rule_order"]):
        pid = r["provider_id"]
        if not block_pids or block_pids[-1] != pid:
            if pid in block_sigs:
                raise ValueError(f"non-contiguous provider block: {pid}")
            block_pids.append(pid)
            block_sigs[pid] = []
        block_sigs[pid].append(
            (
                r.get("url_pattern"),
                r["rule_type"],
                str(r.get("argument")),
                r.get("remove_pattern"),
                r.get("space_pattern"),
            )
        )

    providers = []
    with_parsers = [
        (i, s) for i, s in enumerate(services) if s.get("query_parsers")
    ]
    if len(with_parsers) != len(block_pids):
        raise ValueError(
            f"{len(with_parsers)} services with parsers vs"
            f" {len(block_pids)} provider rule blocks"
        )
    for (i, service), pid in zip(with_parsers, block_pids):
        if "domains" not in service:  # yaml.py:118-122
            raise ValueError(f"service #{i} has no domains")
        if _yaml_signature(service) != block_sigs[pid]:
            raise ValueError(
                f"parser-signature mismatch for service #{i}"
                f" ({service['name']}) vs provider {pid}"
            )
        providers.append(
            {
                "provider_id": pid,
                "name": service["name"],
                "priority": num_services - i,  # yaml.py:144
                "domains": sorted(set(service["domains"])),
                "url_path_prefixes": sorted(
                    set(service["focused_url_prefixes"])
                ),
                "exclusion_reason": service.get("excluded"),
            }
        )

    OUT.write_text(
        json.dumps(
            {
                "_provenance": (
                    "Provider dimension extracted verbatim from the"
                    " MIT-licensed reference data"
                    " /root/reference/data/selected-services.yaml with"
                    " imports/yaml.py:103-160 semantics; provider UUIDs"
                    " recovered from the published url_query rule table by"
                    " signature-verified positional mapping (see"
                    " tools/extract_reference_providers.py)."
                ),
                "n_services": num_services,
                "n_providers": len(providers),
                "providers": providers,
            },
            indent=0,
            ensure_ascii=False,
        )
        + "\n"
    )
    n_dom = sum(len(p["domains"]) for p in providers)
    n_pre = sum(len(p["url_path_prefixes"]) for p in providers)
    n_exc = sum(1 for p in providers if p["exclusion_reason"])
    print(
        f"wrote {OUT}: {len(providers)} providers, {n_dom} domains,"
        f" {n_pre} prefixes, {n_exc} excluded"
    )


if __name__ == "__main__":
    main()
