"""Driver-contract smoke: entry() runs, queries↔oracles stay in sync."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SQL_FREE = {"img_decode_validate", "crawl_pipeline_round", "a2_approx_distinct"}


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"host", "wave", "url_key", "dispatch_ts"} <= set(df.columns)


def test_queries_and_oracles_aligned():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) == set(qs) - SQL_FREE
    assert len(qs) >= 30


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
