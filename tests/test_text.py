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


def test_encoding_waterfall_reference_decision_table():
    """Branch-for-branch enumeration of the reference's parse_xml_tree
    waterfall (parsers/utils/xml.py:26-129) against the repo ladder
    (functions/encoding.py). Verdict key per row:
      MATCH            asserted — repo output equals the reference's
                       decision, decidable without the resiliparse wheel
      SNIFF-DEPENDENT  the reference's outcome depends on resiliparse's
                       guess — not verifiable in this container; the repo's
                       chosen behavior is pinned instead and documented
      DIVERGES         intentional, documented divergence (repo is strictly
                       more robust); pinned so it can't drift silently
    """
    from archive_query_log_spark.functions import encoding as E

    # --- candidate-list construction (xml.py:48-70) ---
    # MATCH: header charset honored only when the Content-Type has BOTH a
    # ';' and 'charset=' (xml.py:55-59); a malformed bare "charset=x" header
    # contributes nothing.
    assert E.candidate_encodings(b"abc", "text/html; charset=cp874")[0] == "cp874"
    assert "cp874" not in E.candidate_encodings(b"abc", "charset=cp874")
    # MATCH: multiple charset params are all extracted, header order kept
    multi = E.candidate_encodings(b"abc", "text/html; charset=x-a; charset=x-b")
    assert multi[:2] == ["x-a", "x-b"]
    # MATCH: header charset is lowercased (xml.py:62)
    assert E.candidate_encodings(b"abc", "text/html; charset=CP874")[0] == "cp874"
    # MATCH (structurally): utf-8-sig appended when utf-8 is a candidate and
    # not already present (xml.py:67-69). In the REFERENCE this appendix is
    # provably dead — every utf-8-sig-decodable stream is utf-8-decodable
    # and 'utf-8' always precedes it, so 'utf-8-sig' can never win there.
    cands = E.candidate_encodings(b"abc", None)
    assert "utf-8" in cands and cands.index("utf-8") < cands.index("utf-8-sig")

    # --- waterfall outcomes (xml.py:72-95) ---
    # MATCH: declared charset that decodes wins over everything
    assert E.detect_decode("héllo".encode("cp1252"),
                           "text/html; charset=cp1252") == ("cp1252", "héllo")
    # MATCH: windows-874 → cp874 alias (xml.py:75-77)
    assert E.detect_decode("สวัสดี".encode("cp874"),
                           "text/html; charset=windows-874") == ("cp874", "สวัสดี")
    # MATCH: declared charset that FAILS to decode is skipped and the
    # waterfall continues (xml.py:81-86) — here to utf-8, which both sides
    # reach (resiliparse reports utf-8 for valid utf-8 bytes)
    assert E.detect_decode("día".encode("utf-8"),
                           "text/html; charset=ascii") == ("utf-8", "día")
    # DIVERGES: an UNKNOWN charset NAME crashes the reference — its
    # TextIOWrapper(encoding=...) construction sits OUTSIDE the
    # try/except (xml.py:78-86), so LookupError propagates. The repo
    # catches LookupError and continues the ladder (strictly more robust).
    assert E.detect_decode(b"plain", "text/html; charset=bogus-enc") == (
        "utf-8", "plain")
    # MATCH: plain ASCII/utf-8 with no header decodes as utf-8 on both sides
    assert E.detect_decode(b"<html>hi</html>") == ("utf-8", "<html>hi</html>")
    # MATCH: nothing decodes → None (xml.py:88-95). 0x81/0x9D are unmapped
    # in cp1252, so the repo's total-looking fallback genuinely fails too.
    assert E.detect_decode(b"\x81\x9d\x8f", "text/html; charset=ascii") is None
    # SNIFF-DEPENDENT: BOM'd utf-8 — the reference's winner depends on
    # resiliparse's label for BOM'd input (expected 'utf-8', which KEEPS the
    # U+FEFF in the text); the repo sniffs the BOM first and reports
    # 'utf-8-sig', stripping it — pinned as the repo's chosen behavior.
    assert E.detect_decode("x".encode("utf-8-sig")) == ("utf-8-sig", "x")
    # SNIFF-DEPENDENT: undeclared, BOM-less non-utf8 text (e.g. shift_jis)
    # — the ONE branch unreachable without the wheel: the reference would
    # ask resiliparse; the repo falls through utf-8 to cp1252 and decodes
    # mojibake rather than failing. Pinned: the ladder's answer is cp1252.
    sj = "こんにちは".encode("shift_jis")
    enc, _ = E.detect_decode(sj)
    assert enc == "cp1252"
    # (The 870-SERP real-fixture sweep hits zero documents in this branch —
    # every real capture declares a charset, carries a BOM, or is utf-8.)

    # --- post-decode parse gating (xml.py:28-31,105-119) ---
    # MATCH rows, in the reference's decision ORDER:
    gate = E.parse_gate
    assert gate("<html>", None) == (None, "no-mime")          # xml.py:28-31
    assert gate("plain words only", "text/html") == (None, "non-xml")
    assert gate('{"a": 1}', "text/html") == (None, "non-xml")  # no '<' at all
    assert gate('{"a": "<b>"}', "text/html") == (None, "json-like")
    assert gate('["<x>"]', "application/json") == (None, "json-like")
    # json-like outranks no-parser: rejected before parser selection
    assert gate("<html>", "application/xhtml+xml") == (None, "no-parser")
    assert gate("<r/>", "text/xml") == ("xml", "ok")
    assert gate("<html>", "text/html") == ("html", "ok")
    # mime params stripped at the FIRST ';' only (xml.py:31)
    assert gate("<html>", "text/html; charset=utf-8") == ("html", "ok")
    # faithful quirk: the reference does NOT strip whitespace around the
    # mime, so "text/html " (space before ';') finds no parser
    assert gate("<html>", "text/html ; charset=utf-8") == (None, "no-parser")


def test_charset_sniffer_language_roundtrips():
    """The opt-in statistical sniffer (the branch the fixed ladder cannot
    reach without the reference's compiled sniffer wheel): undeclared,
    BOM-less, non-utf-8 payloads in 8 legacy charsets across 8 scripts
    must be identified and decoded losslessly — raw and HTML-wrapped."""
    from archive_query_log_spark.functions import encoding as E

    texts = {
        "cp1251": "быстрая коричневая лиса прыгает через ленивую собаку у реки",
        "cp1252": "die katze schläft auf dem warmen sofa — größe übung für heute",
        "cp874": "สวัสดีครับ วันนี้อากาศดีมาก เราไปเดินเล่นกันเถอะ",
        "shift_jis": "こんにちは。今日は天気がいいですね。日本語のテキストです。",
        "euc_jp": "こんにちは。今日は天気がいいですね。散歩に行きます。",
        "euc_kr": "안녕하세요 오늘 날씨가 좋네요 우리 공원에 산책하러 갑시다",
        "gb18030": "今天天气很好，我们一起去公园散步吧。这是一段中文文本。",
        "big5": "今天天氣很好，我們一起去公園散步吧。這是一段中文文本。",
    }
    for enc, text in texts.items():
        for payload in (
            text,
            f"<html><body><p>{text}</p><p>{text}</p></body></html>",
        ):
            buf = payload.encode(enc)
            assert E.sniff_encoding(buf) == enc, (enc, payload[:30])
            got = E.detect_decode(buf, None, sniff=True)
            assert got == (enc, payload), enc


def test_charset_sniffer_is_strictly_opt_in():
    """sniff=False (the default) must behave exactly as the fixed ladder —
    every golden and oracle is derived from that path."""
    from archive_query_log_spark.functions import encoding as E

    ru = "текст на русском".encode("cp1251")
    # default: cp1252 mojibake terminal (utf-8 fails, cp1252 decodes)
    assert E.detect_decode(ru) == ("cp1252", ru.decode("cp1252"))
    # opt-in: the sniffer rung fires first
    assert E.detect_decode(ru, sniff=True) == ("cp1251", ru.decode("cp1251"))
    # declared charsets ALWAYS outrank the sniffer, opt-in or not
    assert E.detect_decode(ru, "text/html; charset=cp1252", sniff=True) == (
        "cp1252", ru.decode("cp1252")
    )
    # utf-8-clean payloads never reach the sniffer
    assert E.detect_decode("plain ü".encode("utf-8"), sniff=True) == (
        "utf-8", "plain ü"
    )
    # nothing sniffable → unchanged terminal behavior
    assert E.detect_decode(b"\x81\x9d\x8f", None, sniff=True) is None
