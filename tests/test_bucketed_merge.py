"""Partition-pruned MERGE: on a bucketed SnapshotTable, merge_update /
merge_array_union / upsert_create_if_absent rewrite ONLY the buckets
containing matched keys — untouched buckets' data files are carried forward
byte-identical (same paths, same bytes)."""

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from archive_query_log_spark.operators import merge
from archive_query_log_spark.tables import SnapshotTable, bucket_of

N_BUCKETS = 8


def _file_hashes(dirs):
    out = {}
    for d in dirs:
        for p in sorted(Path(d).rglob("*.parquet")):
            out[str(p)] = hashlib.md5(p.read_bytes()).hexdigest()
    return out


def _mk_table(spark, tmp_path, name):
    t = SnapshotTable(tmp_path / name)
    base = spark.createDataFrame(
        [(i, f"v{i}", ["a"]) for i in range(200)],
        "k long, val string, tags array<string>",
    )
    t.commit_bucketed(base, key="k", n_buckets=N_BUCKETS)
    return t


def test_merge_update_rewrites_only_affected_buckets(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "upd")
    _, _, dirs_before = t.bucket_info()
    # updates all hash into the buckets of keys {3, 7}
    upd = spark.createDataFrame([(3, "X"), (7, "Y")], "k long, val string")
    affected = {
        r["b"]
        for r in upd.select(bucket_of("k", N_BUCKETS).alias("b")).collect()
    }
    before = _file_hashes(
        d for b, ds in dirs_before.items() if b not in affected for d in ds
    )
    merge.merge_update(spark, t, upd, key="k", set_cols=["val"])
    _, _, dirs_after = t.bucket_info()
    # untouched buckets: same dirs, same files, same bytes
    for b, ds in dirs_before.items():
        if b not in affected:
            assert dirs_after[b] == ds
    after = _file_hashes(
        d for b, ds in dirs_after.items() if b not in affected for d in ds
    )
    assert after == before and len(before) > 0
    # affected buckets were rewritten (new dirs)
    for b in affected:
        assert dirs_after[b] != dirs_before[b]
    # and the merged CONTENT equals the full-rewrite semantics
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert len(got) == 200 and got[3] == "X" and got[7] == "Y" and got[5] == "v5"
    assert t._manifest(t.latest_version())["meta"]["rewritten_buckets"] == sorted(
        affected
    )


def test_merge_array_union_pruned_with_inserts(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "arr")
    _, _, dirs_before = t.bucket_info()
    inc = spark.createDataFrame(
        [(3, ["b"]), (999, ["z"])], "k long, tags array<string>"
    )
    affected = {
        r["b"]
        for r in inc.select(bucket_of("k", N_BUCKETS).alias("b")).collect()
    }
    before = _file_hashes(
        d for b, ds in dirs_before.items() if b not in affected for d in ds
    )
    merge.merge_array_union(spark, t, inc, key="k", array_cols=["tags"])
    _, _, dirs_after = t.bucket_info()
    for b, ds in dirs_before.items():
        if b not in affected:
            assert dirs_after[b] == ds
    after = _file_hashes(
        d for b, ds in dirs_after.items() if b not in affected for d in ds
    )
    assert after == before
    got = {r["k"]: (r["tags"], r["val"]) for r in t.read(spark).collect()}
    assert got[3][0] == ["a", "b"]  # matched: union
    assert got[5][0] == ["a"]  # untouched
    assert got[999] == (["z"], None)  # inserted into a rewritten bucket
    assert len(got) == 201


def test_create_if_absent_bucketed_appends_only_probed_buckets(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "ins")
    _, _, dirs_before = t.bucket_info()
    batch = spark.createDataFrame(
        [(3, "dup", ["x"]), (500, "new", ["y"])],
        "k long, val string, tags array<string>",
    )
    merge.upsert_create_if_absent(spark, t, batch, key="k")
    _, _, dirs_after = t.bucket_info()
    # every pre-existing dir is still present (append never rewrites)
    for b, ds in dirs_before.items():
        assert set(ds) <= set(dirs_after[b])
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert got[3] == "v3"  # existing key untouched (create-if-absent)
    assert got[500] == "new" and len(got) == 201
    # idempotent replay: no duplicates AND no new snapshot version
    v_before = t.latest_version()
    v_replay = merge.upsert_create_if_absent(spark, t, batch, key="k")
    assert v_replay == v_before == t.latest_version()
    assert t.read(spark).count() == 201


def test_bucketed_merge_wrong_key_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "wrongkey")
    batch = spark.createDataFrame(
        [(1, "x", ["a"])], "k long, val string, tags array<string>"
    )
    import pytest

    with pytest.raises(ValueError, match="bucketed by"):
        merge.upsert_create_if_absent(spark, t, batch, key="val")
    with pytest.raises(ValueError, match="bucketed by"):
        merge.merge_update(spark, t, batch, key="val", set_cols=["k"])
    with pytest.raises(ValueError, match="bucketed by"):
        merge.merge_array_union(spark, t, batch, key="val", array_cols=["tags"])
