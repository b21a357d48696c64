"""URL functions vs the reference's urllib-based semantics
(parsers/utils/url.py, api/utils/url_cleaner.py)."""

from urllib.parse import parse_qsl, urlsplit

import pytest
from pyspark.sql import functions as F

from archive_query_log_spark.functions import urls

URLS = [
    "https://www.Example.org/A/b/?b=2&utm_source=x&a=1",
    "https://h00.example.com/img/img00000001?q=1&utm_source=feed",
    "https://h00.example.com/img/img00000001?q=1",
    "https://example.com/search?q=foo+bar&page=3",
    "https://example.com/path/seg%20ment/x?z=%C3%BC",
    "http://example.com:8080/p?q=1#frag=2",
    "https://example.com/",
]


def _df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_query_param_matches_parse_qsl(spark):
    rows = _df(spark).select(
        "url", urls.parse_url_query_parameter("q", "url").alias("q")
    ).collect()
    for r in rows:
        qs = urlsplit(r["url"]).query
        exp = next((v for k, v in parse_qsl(qs) if k == "q"), None)
        assert r["q"] == exp, r["url"]


def test_path_segment_matches_reference_indexing(spark):
    rows = _df(spark).select(
        "url", urls.parse_url_path_segment(1, "url").alias("seg")
    ).collect()
    from urllib.parse import unquote

    for r in rows:
        parts = urlsplit(r["url"]).path.split("/")
        exp = unquote(parts[1]) if len(parts) > 1 else None
        exp = exp if exp != "" else ""
        assert (r["seg"] or "") == (exp or ""), r["url"]


def test_url_key_canonicalization(spark):
    rows = dict(
        (r["url"], r["k"])
        for r in _df(spark).select("url", urls.url_key("url").alias("k")).collect()
    )
    assert rows[URLS[0]] == "org,example)/a/b?a=1&b=2"
    # tracking-only difference folds to the same key
    assert rows[URLS[1]] == rows[URLS[2]]
    # host reversal + default path
    assert rows[URLS[6]] == "com,example)"


def test_remove_tracking_parameters(spark):
    out = _df(spark).select(
        urls.remove_tracking_parameters("url").alias("u")
    ).collect()
    assert out[0]["u"] == "https://www.Example.org/A/b/?b=2&a=1"
    assert out[2]["u"] == "https://h00.example.com/img/img00000001?q=1"


def test_malformed_escapes_decode_leniently(spark):
    """Regression: ANSI url_decode would abort the job on '100%'; the
    reference's parse_qsl is lenient and keeps the literal '%'. Parity with
    parse_qsl on messy escapes."""
    cases = ["100%", "a%2Gb", "50%25", "x%", "%e4%b8%ad"]
    df = spark.createDataFrame(
        [(f"https://x.com/s?q={c}",) for c in cases] + [("https://x.com/s?q=ok",)],
        "url string",
    )
    got = [
        r["q"]
        for r in df.select(
            urls.parse_url_query_parameter("q", "url").alias("q")
        ).collect()
    ]
    exp = [
        next(v for k, v in parse_qsl(f"q={c}", keep_blank_values=True) if k == "q")
        for c in cases
    ] + ["ok"]
    assert got == exp


def test_short_path_segment_yields_null(spark):
    """Regression: ANSI element_at would abort on paths with few segments."""
    df = spark.createDataFrame(
        [("https://g.example.com/find",), ("https://g.example.com/a/b/c",)],
        "url string",
    )
    got = [
        r["s"]
        for r in df.select(urls.parse_url_path_segment(3, "url").alias("s")).collect()
    ]
    assert got == [None, "c"]


def test_urljoin_udf(spark):
    from urllib.parse import urljoin

    cases = [
        ("https://a.example/x/y", "z"),
        ("https://a.example/x/y", "/abs"),
        ("https://a.example/x/y", "//other.example/p"),
        ("https://a.example/x/y", "https://full.example/"),
        ("https://a.example/x/", "../up"),
    ]
    df = spark.createDataFrame(cases, "base string, href string")
    fn = urls.urljoin_udf()
    rows = df.select("base", "href", fn("base", "href").alias("j")).collect()
    for r in rows:
        assert r["j"] == urljoin(r["base"], r["href"])


def test_valid_url_gate(spark):
    df = spark.createDataFrame(
        [("https://ok.example/",), ("https://x.example/" + "a" * 40000,)],
        "url string",
    )
    got = df.where(urls.valid_url("url")).count()
    assert got == 1


def test_parse_qsl_first_random_parity(spark):
    """Property-style parity: parse_qsl_first == urllib.parse.parse_qsl
    first-match over 400 seeded adversarial query strings (malformed
    escapes, '+', unicode, brackets, semicolons, blank/duplicate fields)."""
    import random

    from pyspark.sql import functions as F

    random.seed(7)
    alpha = "ab1%+&=-_. ;/?:ü"
    cases = []
    for n in range(400):
        qs = "".join(random.choice(alpha) for _ in range(random.randint(0, 25)))
        key = random.choice(["a", "ab", "a b", "k[1]", "ü"])
        cases.append((n, qs, key))
    df = spark.createDataFrame(cases, "n long, qs string, key string")
    got = {
        r["n"]: r["v"]
        for r in df.select(
            "n",
            urls.parse_qsl_first(
                urls._escape_invalid_pct(F.col("qs")), F.col("key")
            ).alias("v"),
        ).collect()
    }
    for n, qs, key in cases:
        exp = next((v for k, v in parse_qsl(qs) if k == key), None)
        assert got[n] == exp, (qs, key, got[n], exp)


def test_non_utf8_escape_decode_parity(spark):
    """CPython errors='replace' parity: percent_decode must agree with
    urllib.parse.unquote on non-UTF-8 %XX escapes — one U+FFFD per maximal
    invalid subsequence (lone latin-1 bytes, truncated multi-byte prefixes,
    overlongs, surrogates, >U+10FFFF leads), valid sequences untouched."""
    import random

    from urllib.parse import parse_qsl, unquote

    from pyspark.sql import functions as F

    fixed = [
        "caf%E9", "%E9", "a%E9b", "%C3%A9", "%E0%A0", "%E0%A0%80", "%F0%9F",
        "%F0%9F%92", "%F0%9F%92%A9", "%C0%80", "%E9%E9", "%E0%80", "%C2",
        "%F4%90%80%80", "%ED%A0%80", "%F1%80", "%F1%80%80", "%F1%80%80%80",
        "%BF", "%FF", "%C3%A9%E9", "%e9", "%c3%a9", "x%80y", "%41%E9%42",
        "100%", "%2Gb", "%E9%ZZ", "%ED%9F%BF", "%EE%80%80", "%F4%8F%BF%BF",
    ]
    random.seed(13)
    pool = ["%E9", "%C3", "%A9", "%80", "%BF", "%F0", "%9F", "%92", "%ED",
            "%A0", "%E0", "%F4", "%8F", "%C0", "%FF", "a", "Z", "%", "%2G"]
    fuzz = ["".join(random.choice(pool) for _ in range(random.randint(1, 8)))
            for _ in range(300)]
    cases = fixed + fuzz
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "n long, s string")
    got = {
        r["n"]: r["v"]
        for r in df.select(
            "n", urls.percent_decode(F.col("s")).alias("v")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == unquote(c), (c, got[i], unquote(c))

    # and through the full query-param path (parse_qsl uses the same decode)
    qdf = spark.createDataFrame(
        [(i, f"https://x.com/s?q={c}") for i, c in enumerate(fixed)],
        "n long, url string",
    )
    qgot = {
        r["n"]: r["q"]
        for r in qdf.select(
            "n", urls.parse_url_query_parameter("q", "url").alias("q")
        ).collect()
    }
    for i, c in enumerate(fixed):
        exp = next((v for k, v in parse_qsl(f"q={c}") if k == "q"), None)
        assert qgot[i] == exp, (c, qgot[i], exp)


def test_normalize_http_url_matches_pydantic(spark):
    """normalize_http_url (pure columns) and normalize_http_url_udf
    (pydantic-exact) both reproduce HttpUrl.encoded_string() — the form the
    reference cascades match against — inside/beyond the column op's
    ASCII-host precondition respectively."""
    pydantic = pytest.importorskip("pydantic")
    from pydantic import HttpUrl

    column_cases = [
        "https://Google.com?q=x",
        "HTTPS://EXAMPLE.COM/Path/Q?A=b#Frag",
        "https://example.com",
        "https://example.com:443/x",
        "http://example.com:80/",
        "http://example.com:8080/",
        "https://user:pw@Example.com/p",
        "https://example.com/%e9",
        "https://example.com/?q=%E9",
        "https://x.com/?",
        "https://x.com/p#",
        "https://x.com/a//b/",
        "https://x.com/p?a=1&b=2#sec",
        "http://X.com:80?q=1",
    ]
    udf_only_cases = [
        "https://münchen.de/straße?q=ä",  # IDNA punycode host
        "https://example.com/a b/c",  # unencoded space re-encoding
        "https://example.com/./a/../b",  # dot-segment removal
        "not a url",  # unparseable → null
    ]
    df = spark.createDataFrame([(c,) for c in column_cases], "url string")
    for r in df.select("url", urls.normalize_http_url("url").alias("n")).collect():
        assert r["n"] == HttpUrl(r["url"]).encoded_string(), r["url"]

    # outside-precondition authorities must yield NULL (route to the UDF),
    # never a silently-corrupted URL
    tricky = [
        "https://[2001:db8::1]/x",  # bracketed IPv6
        "https://a@b@x.com/",  # multiple '@'
        "https://x.com:0443/",  # non-canonical port
    ]
    tdf = spark.createDataFrame([(c,) for c in tricky], "url string")
    for r in tdf.select("url", urls.normalize_http_url("url").alias("n")).collect():
        assert r["n"] is None, (r["url"], r["n"])

    udf = urls.normalize_http_url_udf()
    df2 = spark.createDataFrame(
        [(c,) for c in column_cases + udf_only_cases], "url string"
    )
    for r in df2.select("url", udf("url").alias("n")).collect():
        try:
            exp = HttpUrl(r["url"]).encoded_string()
        except Exception:
            exp = None
        assert r["n"] == exp, (r["url"], r["n"], exp)
