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


def test_real_provider_dim_and_source_mint(spark):
    """The REAL 775-provider dimension (selected-services.yaml import):
    shape invariants, the rule-table linkage (every cascade rule's
    provider_id resolves in the dim), and the uuid5 source-id mint over
    real domains matching Python's uuid.uuid5 bit-for-bit."""
    from pyspark.sql import functions as F

    from archive_query_log_spark.operators.rule_tables import (
        load_provider_rows,
        load_rule_rows,
        reference_providers_df,
    )

    rows = load_provider_rows()
    assert len(rows) == 775
    assert len({p["provider_id"] for p in rows}) == 775
    assert all(p["priority"] >= 1 and p["domains"] for p in rows)
    # every rule in all three cascade tables points at a real provider
    pids = {p["provider_id"] for p in rows}
    for table in ("url_query", "url_page", "url_offset"):
        rule_pids = {r["provider_id"] for r in load_rule_rows(table)}
        assert rule_pids <= pids, table
    # google sanity: top-priority-ish, owns google.com
    google = next(p for p in rows if p["name"] == "google")
    assert "google.com" in google["domains"]
    assert google["priority"] == 1025  # num_services - 0

    providers = reference_providers_df(spark).withColumnRenamed(
        "provider_id", "id"
    )
    archives = spark.createDataFrame(
        [("wb", "https://web.archive.org/cdx/search/cdx",
          "https://web.archive.org/web", 10)],
        "id string, cdx_api_url string, memento_api_url string, priority int",
    )
    out = build_sources(archives, providers)
    sample = out.orderBy(F.col("id")).limit(50).collect()
    assert len(sample) == 50
    for r in sample:
        name = ":".join(
            [
                r["archive"]["cdx_api_url"],
                r["archive"]["memento_api_url"],
                r["provider"]["domain"],
                r["provider"]["url_path_prefix"],
            ]
        )
        assert r["id"] == str(uuid.uuid5(ids.NAMESPACE_SOURCE, name))
    # excluded providers are skipped by the source build (F9)
    n_excluded = sum(1 for p in rows if p["exclusion_reason"])
    assert n_excluded == 8
    built_pids = {r["provider"]["id"] for r in out.select("provider").collect()}
    assert len(built_pids) == 775 - 8


def test_create_if_absent_idempotent(spark):
    archives, providers = synth.synth_dims(spark)
    with tempfile.TemporaryDirectory() as d:
        t = SnapshotTable(d + "/sources")
        build_and_commit_sources(spark, t, archives, providers)
        n1 = t.read(spark).count()
        build_and_commit_sources(spark, t, archives, providers)  # replay
        assert t.read(spark).count() == n1
