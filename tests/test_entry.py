"""Driver-contract smoke: entry() runs, queries↔oracles stay in sync."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SQL_FREE = {
    "img_decode_validate",
    "img_multimodal_pipeline",
    "crawl_pipeline_round",
    "a2_approx_distinct",
}


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"host", "wave", "url_key", "dispatch_ts"} <= set(df.columns)


def test_queries_and_oracles_aligned():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) == set(qs) - SQL_FREE
    assert len(qs) >= 30


def test_gate_window_covers_flagship_entries():
    """The driver's correctness gate checks exactly the FIRST 50 entries of
    queries() in iteration order. Pin the invariants: the window is exactly
    the explicit _GATE_ORDER list, every windowed entry is oracle-backed,
    and the round's flagship parity entries sit inside it."""
    from archive_query_log_spark.entry_queries import _GATE_ORDER

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)
    assert len(_GATE_ORDER) == 50
    assert names[:50] == _GATE_ORDER
    assert list(oracles)[: len(_GATE_ORDER)] == [
        n for n in _GATE_ORDER if n in oracles
    ]
    missing_oracle = [n for n in names[:50] if n not in oracles]
    assert not missing_oracle, missing_oracle
    flagship = {
        "flagship_crawl_schedule", "w4_reference_rules", "warc_rules_parity",
        "wsrb_rules_parity", "wsrb_extract", "wq_extract",
        "c18_encoding_waterfall", "q5_compare", "c10_unfurl",
        "w4_first_match_cascade", "q4_completion_suggest",
        "dedup_pipeline_e2e", "j1_real_providers",
    }
    assert flagship <= set(names[:50])


def test_gate_window_has_no_collection_columns(spark):
    """The driver's oracle harness canonicalizes results via pandas
    ``sort_values``, which cannot hash list/dict cells — a gated entry
    returning a top-level Array/Map/Struct column crashes the harness even
    when its answer is correct (this bit c10_unfurl in round 3 and a round-1
    entry before it). Pin it: every _GATE_ORDER entry's schema must be flat.
    Entries that conceptually produce collections serialize them
    (``F.array_join`` / ``to_json``) with a matching serialization in the
    DuckDB oracle."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from archive_query_log_spark.entry_queries import _GATE_ORDER

    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    bad = []
    for name in _GATE_ORDER:
        schema = qs[name](spark, sf).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, bad


def test_spotcheck_three_oracles(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "customer", "region", "nation",
              "lineitem", "embeddings", "supplier", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    for name in ("a3_topk", "a8_minby_dedup", "c17_url_key"):
        sdf = qs[name](spark, sf)
        assert sdf.count() == len(con.execute(oracles[name]).fetchall()), name
