"""URL functions vs the reference's urllib-based semantics
(parsers/utils/url.py, api/utils/url_cleaner.py)."""

from urllib.parse import parse_qsl, urlsplit

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
