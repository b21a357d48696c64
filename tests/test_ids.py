"""uuid5 column expr golden-tested against Python uuid.uuid5 (the reference's
ID mint, namespaces.py); md5_rand determinism + range."""

import uuid

from pyspark.sql import functions as F

from archive_query_log_spark.functions import ids

NAMES = [
    "a:b:c",
    "hello world",
    "",
    "https://example.com/?q=1:https://h.example.com/x:20240101000000",
    "üñíçødé ☃ text",
    "x" * 5000,
]


def test_uuid5_matches_python(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "name string")
    for ns in (ids.NAMESPACE_CAPTURE, ids.NAMESPACE_SOURCE, ids.NAMESPACE_SERP):
        rows = df.select(
            "name", ids.uuid5_from_name(ns, F.col("name")).alias("u")
        ).collect()
        for r in rows:
            assert r["u"] == str(uuid.uuid5(ns, r["name"]))


def test_namespace_tree_matches_reference_formula():
    # namespaces.py:1-23 derivation (NAMESPACE_SOURCE uses the string "filter")
    aql = uuid.uuid5(uuid.NAMESPACE_URL, "aql")
    assert ids.NAMESPACE_AQL == aql
    assert ids.NAMESPACE_SOURCE == uuid.uuid5(aql, "filter")
    assert ids.NAMESPACE_CAPTURE == uuid.uuid5(aql, "capture")


def test_capture_id_formula(spark):
    df = spark.createDataFrame(
        [("https://api", "https://u.example/x", "2024-03-04 05:06:07")],
        "cdx string, url string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    got = df.select(
        ids.capture_id(F.col("cdx"), F.col("url"), F.col("ts")).alias("id")
    ).collect()[0]["id"]
    exp = str(
        uuid.uuid5(
            ids.NAMESPACE_CAPTURE, "https://api:https://u.example/x:20240304050607"
        )
    )
    assert got == exp


def test_reinterpret_tz_matches_zoneinfo(spark):
    """C14: CET-stored-as-UTC timestamps shift by the CET offset (incl. DST)."""
    df = spark.createDataFrame(
        [("2023-01-15 12:00:00",), ("2023-07-15 12:00:00",)], "s string"
    ).withColumn("ts", F.to_timestamp("s"))
    rows = df.select("s", ids.reinterpret_tz(F.col("ts")).alias("u")).collect()
    got = {r["s"]: r["u"].strftime("%H:%M") for r in rows}
    assert got["2023-01-15 12:00:00"] == "11:00"  # CET = UTC+1
    assert got["2023-07-15 12:00:00"] == "10:00"  # CEST = UTC+2


def test_md5_rand_range_and_determinism(spark):
    df = spark.range(1000)
    r = df.select(ids.md5_rand(F.col("id")).alias("r"))
    stats = r.agg(F.min("r"), F.max("r"), F.avg("r")).collect()[0]
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.4 < stats[2] < 0.6
    # partition-invariant: same values regardless of layout
    a = sorted(x["r"] for x in r.collect())
    b = sorted(
        x["r"]
        for x in df.repartition(7).select(ids.md5_rand(F.col("id")).alias("r")).collect()
    )
    assert a == b
