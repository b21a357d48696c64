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


def test_lang_id_udf_slot_matches_column_expr(spark):
    """The pandas-UDF model slot (default heuristic) agrees with the
    JVM-side lang_id() column expression, including new languages."""
    from archive_query_log_spark.functions import text as T

    rows = [
        (0, "the cat sat on the mat and it was happy"),
        (1, "der hund ist ein guter freund und die katze auch"),
        (2, "le chat est dans la maison et il dort pour la nuit"),
        (3, "el perro es un animal y la casa es grande por dentro"),
        (4, "il gatto non è qui ma sono sicuro che anche lui dorme"),
        (5, "de hond is een goed dier en het huis is ook groot maar klein"),
        (6, "yang penting itu dengan ini untuk mereka dan tidak akan"),
        (7, "zzz qqq xxx"),  # no stopword hits → null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col_out = {r["doc_id"]: r["l"] for r in
               df.select("doc_id", T.lang_id("text").alias("l")).collect()}
    udf_out = {r["doc_id"]: r["l"] for r in
               df.select("doc_id", T.lang_id_udf()("text").alias("l")).collect()}
    assert col_out == udf_out
    assert col_out[0] == "en" and col_out[1] == "de" and col_out[2] == "fr"
    assert col_out[4] == "it" and col_out[6] == "id" and col_out[7] is None


def test_encoding_waterfall_semantics():
    """parsers/utils/xml.py:48-95 parity: header charset first, windows-874
    → cp874 mapping, utf-8-sig fallback, first-clean-decode wins."""
    from archive_query_log_spark.functions import encoding as E

    # header charset takes precedence over detection
    buf = "héllo".encode("cp1252")
    assert E.detect_decode(buf, "text/html; charset=cp1252") == ("cp1252", "héllo")
    # windows-874 maps to cp874 (xml.py:75-77)
    thai = "สวัสดี".encode("cp874")
    assert E.detect_decode(thai, "text/html; charset=windows-874") == (
        "cp874", "สวัสดี"
    )
    # invalid header charset is skipped, ladder continues
    assert E.detect_decode(b"plain", "text/html; charset=bogus-enc") == (
        "utf-8", "plain"
    )
    # BOMs detected ahead of the ladder
    assert E.detect_decode("x".encode("utf-8-sig"))[0] == "utf-8-sig"
    assert E.detect_decode("x".encode("utf-16"))[0] == "utf-16"
    # utf-8 tried before cp1252; invalid utf-8 falls through
    assert E.detect_decode("ü".encode("cp1252")) == ("cp1252", "ü")
    assert E.detect_decode(None) is None
    # utf-8-sig appended when header says utf-8 but payload carries a BOM
    bom = "x".encode("utf-8-sig")
    cands = E.candidate_encodings(bom, "text/html; charset=utf-8")
    assert cands.index("utf-8") < cands.index("utf-8-sig")


def test_lang_model_artifact_regenerates_byte_identically():
    """The frozen trigram artifact must be exactly what the trainer emits
    (exact rational arithmetic — no platform float drift); a drifted or
    hand-edited artifact breaks the oracle-parity guarantee."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import train_lang_model as trainer

    committed = trainer.OUT.read_text()
    regenerated = (
        json.dumps(trainer.train(), ensure_ascii=False, indent=1, sort_keys=True)
        + "\n"
    )
    assert regenerated == committed


def test_lang_model_heldout_bank_all_correct():
    """The frozen model must label every held-out evaluation-bank sentence
    (2 per language, disjoint from the training corpus) with its true
    language and the two no-language strings with null."""
    from archive_query_log_spark.entry_queries import _LANG_EVAL_BANK
    from archive_query_log_spark.functions.lang_model import predict_batch

    langs = ["en", "de", "fr", "es", "it", "pt", "nl", "sv", "pl", "tr",
             "id", "ru"]
    expect = [lang for lang in langs for _ in range(2)] + [None, None]
    got = predict_batch(_LANG_EVAL_BANK)
    assert [lang for lang, _ in got] == expect
    assert all(score > 0 for (lang, score) in got if lang is not None)
    assert all(score == 0 for (lang, score) in got if lang is None)


def test_lang_model_plugs_into_lang_id_udf_slot(spark):
    """model_predict drops into lang_id_udf(model_predict=...) unchanged —
    the slot contract the stopword default and any real model share."""
    from archive_query_log_spark.entry_queries import _LANG_EVAL_BANK
    from archive_query_log_spark.functions import lang_model
    from archive_query_log_spark.functions.text import lang_id_udf

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_LANG_EVAL_BANK)], "i int, text string"
    )
    udf = lang_id_udf(model_predict=lang_model.model_predict)
    got = {
        r["i"]: r["pred"]
        for r in df.select("i", udf("text").alias("pred")).collect()
    }
    expect = lang_model.model_predict(_LANG_EVAL_BANK)
    assert [got[i] for i in range(len(_LANG_EVAL_BANK))] == expect
