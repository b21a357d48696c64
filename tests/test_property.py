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


# --- hamming_near_pairs vs all-pairs brute force ------------------------
# The sign-extension (shiftright on negative int64) and NULL-drop
# reasoning in the operator docstring is verified here by construction:
# random signature sets built as bit-flips off shared bases (so near
# pairs actually occur), including negative two's-complement values and
# NULLs, across (bits, n_chunks, max_hamming) combos — compared to an
# uncapped all-pairs 64-bit popcount oracle. Recall holds for arbitrary
# int64 sigs even when bits < 64: differing bits outside chunk coverage
# only reduce the in-coverage differences, so pigeonhole still leaves an
# equal chunk; precision is the exact bit_count verify.

_M64 = (1 << 64) - 1


def _to_i64(u: int) -> int:
    u &= _M64
    return u - (1 << 64) if u >= (1 << 63) else u


@st.composite
def _hamming_case(draw):
    bits, n_chunks = draw(
        st.sampled_from([(64, 4), (64, 2), (64, 8), (32, 4), (16, 4), (64, 6)])
    )
    # combo_k=1 is the classic single-chunk table; k≥2 the Manku
    # multi-chunk scheme — same exact output set, verified here
    combo_k = draw(st.integers(1, min(3, n_chunks - 1)))
    max_hamming = draw(st.integers(0, n_chunks - combo_k))
    bases = draw(
        st.lists(
            st.integers(-(1 << 63), (1 << 63) - 1), min_size=1, max_size=3
        )
    )
    n = draw(st.integers(2, 25))
    rows = []
    for i in range(n):
        if draw(st.integers(0, 9)) == 0:
            rows.append((f"d{i:03d}", None))
            continue
        u = draw(st.sampled_from(bases)) & _M64
        for _ in range(draw(st.integers(0, 5))):
            u ^= 1 << draw(st.integers(0, 63))
        rows.append((f"d{i:03d}", _to_i64(u)))
    return bits, n_chunks, combo_k, max_hamming, rows


@given(_hamming_case())
@_SET
def test_hamming_near_pairs_vs_bruteforce(spark, case):
    from archive_query_log_spark.operators.dedup import hamming_near_pairs

    bits, n_chunks, combo_k, max_hamming, rows = case
    df = spark.createDataFrame(rows, "id string, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(
            df,
            bits=bits,
            max_hamming=max_hamming,
            n_chunks=n_chunks,
            combo_k=combo_k,
            max_chunk_df=None,
            checkpoint=False,
        ).collect()
    }
    live = [(i, s) for i, s in rows if s is not None]
    exp = set()
    for ai in range(len(live)):
        for bi in range(ai + 1, len(live)):
            (ia, sa), (ib, sb) = live[ai], live[bi]
            h = bin((sa ^ sb) & _M64).count("1")
            if h <= max_hamming:
                exp.add((min(ia, ib), max(ia, ib), h))
    assert got == exp, (bits, n_chunks, combo_k, max_hamming)
