"""Approval tests (FIXTURES.md §8): crawl order, seen-set hash, validation
verdicts — regenerated and diffed against the committed .approved files,
mirroring the reference's ApprovalTests workflow."""

import pathlib
import sys

sys.path.insert(0, ".")

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def test_goldens_match(spark):
    from tools.make_goldens import build_artifacts

    order, seen, val = build_artifacts(spark)
    assert order == (GOLDEN_DIR / "crawl_order.approved.txt").read_text()
    assert seen == (GOLDEN_DIR / "seen_set.approved.txt").read_text()
    assert val == (GOLDEN_DIR / "validation.approved.txt").read_text()
