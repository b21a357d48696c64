"""Property-based parity tests (hypothesis): the column-expression
implementations must agree with the Python stdlib semantics they re-express,
on arbitrary inputs — not just the fixtures."""

import uuid
from urllib.parse import parse_qsl, urlsplit

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from archive_query_log_spark.functions import ids, urls

# batched: ONE spark job per property test run, hypothesis drives the data
_SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_name = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=200,
)

_hostlabel = st.from_regex(r"[a-z][a-z0-9]{0,10}", fullmatch=True)
_pathseg = st.from_regex(r"[A-Za-z0-9_.~-]{0,12}", fullmatch=True)
_pkey = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_pval = st.from_regex(r"[A-Za-z0-9_.+*-]{0,12}", fullmatch=True)


@st.composite
def _urls(draw):
    host = ".".join(draw(st.lists(_hostlabel, min_size=1, max_size=4)))
    segs = draw(st.lists(_pathseg, min_size=0, max_size=4))
    params = draw(st.lists(st.tuples(_pkey, _pval), max_size=5))
    q = "&".join(f"{k}={v}" for k, v in params)
    return f"https://{host}/" + "/".join(segs) + (f"?{q}" if q else "")


@given(st.lists(_name, min_size=1, max_size=200))
@_SET
def test_uuid5_property(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select(
        "name", ids.uuid5_from_name(ids.NAMESPACE_CAPTURE, F.col("name")).alias("u")
    ).collect()
    for r in rows:
        assert r["u"] == str(uuid.uuid5(ids.NAMESPACE_CAPTURE, r["name"]))


@given(st.lists(_urls(), min_size=1, max_size=200))
@_SET
def test_query_param_property(spark, urllist):
    df = spark.createDataFrame([(u,) for u in urllist], "url string")
    rows = df.select(
        "url", urls.parse_url_query_parameter("q", "url").alias("q")
    ).collect()
    for r in rows:
        qs = urlsplit(r["url"]).query
        exp = next((v for k, v in parse_qsl(qs) if k == "q"), None)
        got = r["q"]
        assert (got or None) == (exp or None), r["url"]


@given(st.lists(_urls(), min_size=1, max_size=200))
@_SET
def test_url_key_deterministic_and_tracking_invariant(spark, urllist):
    df = spark.createDataFrame([(u,) for u in urllist], "url string")
    base = df.select("url", urls.url_key("url").alias("k"))
    rows = base.collect()
    for r in rows:
        assert r["k"] and ")" in r["k"]
    # appending a tracking param never changes the canonical key
    with_utm = df.select(
        urls.url_key(
            F.concat(
                F.col("url"),
                F.when(F.col("url").contains("?"), F.lit("&")).otherwise(F.lit("?")),
                F.lit("utm_source=x"),
            )
        ).alias("k")
    ).collect()
    assert sorted(r["k"] for r in rows) == sorted(r["k"] for r in with_utm)
