"""The compact bench line MUST fit the driver's ~2000-byte stdout tail.

Rounds 4 and 6 both shipped a line that outgrew the window, leaving the
round's BENCH artifact with ``"parsed": null`` — the driver (and judge)
were blind to the numbers even though they were good. These tests pin the
fix: build_compact() is a pure function of the full record, enforces a
hard byte budget with an ordered degradation list, and the committed
round-6 record (the exact input that broke round 6) must produce a line
that fits and still carries the driver contract + gate evidence.

No Spark session needed — pure JSON shaping.
"""

import copy
import json
from pathlib import Path

import pytest

import bench

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def r6_detail():
    """The round-6 full record, FROZEN as a golden (extracted from the
    round-6 commit) — the real shape and real value magnitudes (129k
    urls/s rates, 19-second queries, 5 sections, full scaling trio) that
    overflowed the window that round. Frozen rather than read from the
    live BENCH_LOCAL.json so a later round committing a smaller record
    cannot silently weaken this overflow-regression pin."""
    return json.loads(
        (REPO / "tests" / "goldens" / "bench_local_r6.json").read_text()
    )


def test_round6_record_fits_budget(r6_detail):
    line = bench.build_compact(r6_detail)
    assert len(line) <= bench.COMPACT_BUDGET
    # and the budget itself leaves slack under the 2000-byte tail window
    assert bench.COMPACT_BUDGET <= 1900


def test_compact_carries_driver_contract_and_gate(r6_detail):
    c = json.loads(bench.build_compact(r6_detail))
    # driver contract
    assert c["metric"] and c["unit"] == "urls/sec"
    assert isinstance(c["value"], (int, float)) and c["value"] > 0
    assert set(c["queries"]) == set(bench.BENCH_QUERIES)
    assert c["sf"] == r6_detail["sf"]
    # scaling gate scalars (the two-cluster-size criterion) survive intact
    s = c["scaling"]
    for k in (
        "t2_urls_per_sec", "t8_urls_per_sec", "t32_urls_per_sec",
        "efficiency_8_vs_4x2", "efficiency_8_vs_4x2_median",
        "efficiency_32_vs_4x8", "efficiency_32_vs_4x8_median",
    ):
        assert isinstance(s[k], (int, float)), k
    # per-query variance evidence (round-7 roadmap item 2): best-of rides
    # the compact line so a contention window is self-evident to the driver
    assert set(c["queries_best"]) == set(c["queries"])
    for name, med in c["queries"].items():
        assert c["queries_best"][name] <= med + 1e-9, name


def test_compact_never_carries_detail_blocks(r6_detail):
    """The blocks that overflowed rounds 4/6 are structurally excluded."""
    c = json.loads(bench.build_compact(r6_detail))
    s = c["scaling"]
    for k in ("stages_sec_median", "stage_efficiency_8_vs_4x2",
              "t2_windows_sec", "t8_windows_sec", "t32_windows_sec",
              "stages_sec_windows", "method"):
        assert k not in s, k
    assert "queries_detail" not in c
    for sect in (c.get("sections") or {}).values():
        if isinstance(sect, dict):
            assert "windows" not in sect


def test_degradation_order_under_inflated_input(r6_detail):
    """If values ever get wider (more queries, longer names), the line
    degrades through the drop list instead of overflowing: queries medians
    and gate scalars are the last things standing."""
    fat = copy.deepcopy(r6_detail)
    # realistic growth: 8 more bench queries with typical entry names
    # (~35 bytes/entry in BOTH medians and best => ~560 extra bytes, well
    # past the headroom — forces several drops)
    for i in range(8):
        name = f"dedup_lsh_candidate_pairs_{i:02d}"
        fat["queries"][name] = 123.456
        fat["queries_detail"]["best"][name] = 120.001
    line = bench.build_compact(fat)
    assert len(line) <= bench.COMPACT_BUDGET
    c = json.loads(line)
    # the driver contract survives every drop
    assert set(fat["queries"]) == set(c["queries"])
    assert c["scaling"]["efficiency_8_vs_4x2"] == (
        r6_detail["scaling"]["efficiency_8_vs_4x2"]
    )


def test_overflow_asserts_rather_than_ships():
    """A record that cannot fit even after all drops must raise — never
    print a truncatable line."""
    detail = {
        "metric": "m", "value": 1.0, "unit": "urls/sec", "sf": 0.1,
        "queries": {f"q{i}" * 40: 1.0 for i in range(60)},
        "queries_detail": {"best": {}},
        "crawl": {
            "n_frontier": 1,
            "per_fetch_decode": {"urls_per_sec": 1.0},
            "fetch_cache": {"urls_per_sec": 1.0},
        },
        "scaling": None,
    }
    with pytest.raises(RuntimeError):
        bench.build_compact(detail)


def test_no_scaling_and_no_sections_still_valid():
    """SPARK_GRAFT_BENCH_SCALING=0 runs and fixture-less sandboxes emit
    scaling=None / sections of None — the line must stay well-formed."""
    detail = {
        "metric": "m", "value": 10.0, "unit": "urls/sec", "sf": 0.01,
        "queries": {"q1": 1.0},
        "queries_detail": {"best": {"q1": 0.9}},
        "crawl": {
            "n_frontier": 100,
            "per_fetch_decode": {"urls_per_sec": 10.0,
                                 "urls_per_sec_median": 9.0},
            "fetch_cache": {"urls_per_sec": 20.0},
        },
        "ann_sig_768": None, "cascade_972": None, "warc_xpath_74": None,
        "warc_xpath_real": None, "scaling": None,
    }
    c = json.loads(bench.build_compact(detail))
    assert c["scaling"] is None
    assert c["queries_best"] == {"q1": 0.9}
