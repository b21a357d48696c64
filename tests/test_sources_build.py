"""Source-build stage: reference ID formula, exclusion filter,
create-if-absent idempotence."""

import tempfile
import uuid

from archive_query_log_spark.crawler import synth
from archive_query_log_spark.crawler.sources_build import (
    build_and_commit_sources,
    build_sources,
)
from archive_query_log_spark.functions import ids
from archive_query_log_spark.tables import SnapshotTable


def test_source_ids_match_reference_formula(spark):
    archives, providers = synth.synth_dims(spark)
    out = build_sources(archives, providers).collect()
    assert len(out) > 0
    for r in out:
        name = ":".join(
            [
                r["archive"]["cdx_api_url"],
                r["archive"]["memento_api_url"],
                r["provider"]["domain"],
                r["provider"]["url_path_prefix"],
            ]
        )
        assert r["id"] == str(uuid.uuid5(ids.NAMESPACE_SOURCE, name))


def test_excluded_provider_skipped_and_counts(spark):
    archives, providers = synth.synth_dims(spark)
    out = build_sources(archives, providers)
    got_providers = {r["provider"]["id"] for r in out.collect()}
    assert "provider-19" not in got_providers  # exclusion_reason set (F9)
    # 2 archives × Σ(domains × prefixes) over 19 kept providers:
    # every 3rd provider (i%3==0, 7 of 19 kept) has 2 prefixes, rest 1
    expected = 2 * (7 * 2 + 12 * 1)
    assert out.count() == expected


def test_create_if_absent_idempotent(spark):
    archives, providers = synth.synth_dims(spark)
    with tempfile.TemporaryDirectory() as d:
        t = SnapshotTable(d + "/sources")
        build_and_commit_sources(spark, t, archives, providers)
        n1 = t.read(spark).count()
        build_and_commit_sources(spark, t, archives, providers)  # replay
        assert t.read(spark).count() == n1
