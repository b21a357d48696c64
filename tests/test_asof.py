"""As-of join vs a brute-force Python oracle (the reference's min-by-distance
scan, captures/__init__.py:207-268)."""

import datetime as dt

from pyspark.sql import functions as F

from archive_query_log_spark.operators.asof import asof_join


def _mk(spark):
    base = dt.datetime(2024, 1, 1)
    left = [(i, i % 3, base + dt.timedelta(minutes=7 * i)) for i in range(30)]
    right = [(100 + j, j % 3, base + dt.timedelta(minutes=5 * j)) for j in range(40)]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp")
    return left, right, ldf, rdf


def _oracle(left, right, direction):
    out = {}
    for lid, k, lts in left:
        cands = [
            (rid, rts)
            for rid, rk, rts in right
            if rk == k
            and (
                (direction == "backward" and rts <= lts)
                or (direction == "forward" and rts >= lts)
                or direction == "nearest"
            )
        ]
        if not cands:
            out[lid] = None
            continue
        if direction == "backward":
            out[lid] = max(cands, key=lambda c: (c[1], c[0]))[1]
        elif direction == "forward":
            out[lid] = min(cands, key=lambda c: (c[1], -c[0]))[1]
        else:
            out[lid] = min(cands, key=lambda c: (abs(c[1] - lts), c[1]))[1]
    return out


def test_backward_and_forward(spark):
    left, right, ldf, rdf = _mk(spark)
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["ts_right"]
            for r in asof_join(
                ldf, rdf, on="k", direction=direction, right_payload=["rid"]
            ).collect()
        }
        exp = _oracle(left, right, direction)
        assert got == exp, direction


def test_nearest_prefers_backward_on_ties(spark):
    left, right, ldf, rdf = _mk(spark)
    got = {
        r["lid"]: r["ts_right"]
        for r in asof_join(
            ldf, rdf, on="k", direction="nearest", right_payload=["rid"]
        ).collect()
    }
    exp = _oracle(left, right, "nearest")
    assert got == exp


def test_nearest_keeps_null_and_duplicate_left_rows(spark):
    """Regression: 'nearest' used to join backward/forward results on all
    left columns — dropping rows with nulls and multiplying duplicates."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = [
        (1, 0, base, None),               # null payload column
        (2, 0, base, "x"),
        (2, 0, base, "x"),                # exact duplicate row
    ]
    right = [(100, 0, base - dt.timedelta(minutes=1))]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp, tag string")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp")
    out = asof_join(ldf, rdf, on="k", direction="nearest",
                    right_payload=["rid"]).collect()
    assert len(out) == 3  # every left row exactly once
    assert all(r["rid_right"] == 100 for r in out)


def test_left_rows_preserved(spark):
    _, _, ldf, rdf = _mk(spark)
    out = asof_join(ldf, rdf, on="k", direction="backward", right_payload=["rid"])
    assert out.count() == ldf.count()
    assert set(out.columns) >= {"lid", "k", "ts", "rid_right", "ts_right"}
