"""Text functions vs reference clean_text/clean_int semantics
(parsers/utils/__init__.py:5-33)."""

from pyspark.sql import functions as F

from archive_query_log_spark.functions import text as T

CASES = [
    ("  hello   world  ", None, None, "hello world"),
    ("a1b2c3", r"[0-9]", None, "abc"),
    ("x__y", None, "_+", "x y"),
    ("   ", None, None, None),  # empty after strip → null
    ("123abc", r"[a-z]+", None, "123"),
]


def test_clean_text_matches_reference(spark):
    for raw, rm, sp, exp in CASES:
        df = spark.createDataFrame([(raw,)], "t string")
        got = df.select(T.clean_text(F.col("t"), rm, sp).alias("c")).collect()[0]["c"]
        assert got == exp, (raw, rm, sp)


def test_clean_int(spark):
    df = spark.createDataFrame(
        [("1,234",), ("42",), ("x",), ("  7 ",)], "t string"
    )
    got = [
        r["i"] for r in df.select(T.clean_int(F.col("t"), ",").alias("i")).collect()
    ]
    assert got == [1234, 42, None, 7]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = [r["s"] for r in df.select(T.shingles(F.col("t"), 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is big",),
            ("der hund ist ein tier und das ist gut",),
            ("xyzzy qwerty",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(T.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", None]
