"""Multimodal operators (operators/multimodal.py): resize, feature
extraction, frame sampling — real math + real Spark plumbing over the
deterministic codec (only the byte codec is the documented stand-in)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from archive_query_log_spark.crawler import codec
from archive_query_log_spark.operators.multimodal import (
    N_FEATURES,
    _resize_nn,
    image_features,
    resize_images,
    sample_frames,
)


def test_resize_nn_math():
    # 4x4 gradient → 2x2 picks rows/cols 0 and 2 ((i*4)//2)
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    got = _resize_nn(px, 2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    # upscale 2x2 → 4x4 repeats each pixel 2x2
    small = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = _resize_nn(small, 4, 4)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]


def test_resize_images_spark(spark):
    rows = []
    for i in range(20):
        pid = f"img{i}"
        px = codec.synth_pixels(pid, 32, 16)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append((pid, bytearray(codec.encode(px, fmt)), 32, 16, fmt))
    rows.append(("bad", bytearray(b"garbage"), 32, 16, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    ).repartition(4)
    out = resize_images(df, 8, 8)
    got = {r["image_id"]: r for r in out.collect()}
    assert len(got) == 21
    assert got["bad"]["bytes"] is None and got["bad"]["w"] is None
    r0 = got["img0"]
    assert (r0["w"], r0["h"]) == (8, 8)
    fmt, w, h, px = codec.decode(bytes(r0["bytes"]))
    assert (fmt, w, h) == ("png", 8, 8)
    # png roundtrip is lossless: resized pixels equal the numpy reference
    assert np.array_equal(px, _resize_nn(codec.synth_pixels("img0", 32, 16), 8, 8))
    # plan is map-only (checkpoint first: the test's own repartition(4)
    # would otherwise show as the only Exchange)
    plan_df = resize_images(df.localCheckpoint(), 8, 8)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_image_features_compose_with_ann(spark):
    """Features are a real embedding column: nearest neighbor by cosine
    over image features finds the resized copy of the query image before
    unrelated images (the multimodal similarity path end-to-end)."""
    from archive_query_log_spark.operators.similarity import brute_force_topk

    # STRUCTURED query image (period-4 checkerboard): nearest-neighbor
    # downsampling preserves its mean/std/histogram exactly (same value
    # set, same proportions), so the resized copy stays feature-near.
    # Noise images would NOT work here — features of white noise are
    # statistically identical across images.
    rr, cc = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    base = (100 + 50 * (((rr // 4) + (cc // 4)) % 2)).astype(np.uint8)
    rows = [
        ("query", bytearray(codec.encode(base, "png"))),
        ("query_small", bytearray(codec.encode(_resize_nn(base, 16, 16), "png"))),
    ]
    for i in range(12):  # constant images: distinct means, zero std
        const = np.full((32, 32), 20 * (i + 1), dtype=np.uint8)
        rows.append((f"other{i}", bytearray(codec.encode(const, "png"))))
    for i in range(12, 24):  # noise images: right mean, wrong std/hist
        rows.append(
            (f"other{i}",
             bytearray(codec.encode(codec.synth_pixels(f"o{i}", 32, 32), "png")))
        )
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    emb = df.select(
        "image_id", image_features("bytes").alias("embedding")
    ).cache()
    feats = {r["image_id"]: r["embedding"] for r in emb.collect()}
    assert all(len(v) == N_FEATURES for v in feats.values())
    # deterministic across runs
    feats2 = {r["image_id"]: r["embedding"] for r in emb.collect()}
    assert feats == feats2
    qv = [float(x) for x in feats["query"]]
    top = brute_force_topk(
        emb.where(F.col("image_id") != "query"), qv, k=3,
        id_col="image_id", vec_col="embedding",
    ).collect()
    assert top[0]["image_id"] == "query_small"


def test_video_container_seek_and_sampling(spark):
    frames = [
        codec.encode(codec.synth_pixels(f"f{i}", 8, 8), "png") for i in range(10)
    ]
    video = codec.encode_video(frames)
    # container-level seek: step 3 yields exactly frames 0,3,6,9 bit-exact
    got = list(codec.iter_video_frames(video, step=3))
    assert [i for i, _ in got] == [0, 3, 6, 9]
    assert all(f == frames[i] for i, f in got)

    df = spark.createDataFrame(
        [("v1", bytearray(video)), ("v2", bytearray(codec.encode_video(frames[:4]))),
         ("bad", bytearray(b"junk"))],
        "video_id string, bytes binary",
    )
    out = sample_frames(df, every_k=3)
    rows = out.collect()
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert sorted(per_vid["v1"]) == [0, 3, 6, 9]
    assert sorted(per_vid["v2"]) == [0, 3]
    assert "bad" not in per_vid
    # sampled frame bytes decode to the original pixels
    f3 = next(
        bytes(r["frame_bytes"]) for r in rows
        if r["video_id"] == "v1" and r["frame_idx"] == 3
    )
    assert np.array_equal(codec.decode(f3)[3], codec.synth_pixels("f3", 8, 8))

    with pytest.raises(ValueError):
        sample_frames(df, every_k=0)


def test_truncated_video_containers_yield_no_rows(spark):
    """Review-pinned: a container truncated mid-prefix or mid-payload must
    raise in iter_video_frames (no silently-short frame bytes) and must
    contribute ZERO rows through sample_frames (no partial-row leak from
    the generator)."""
    frames = [
        codec.encode(codec.synth_pixels(f"t{i}", 8, 8), "png") for i in range(6)
    ]
    video = codec.encode_video(frames)
    cut_prefix = video[: len(video) - len(frames[-1]) - 2]  # inside prefix
    cut_payload = video[:-5]  # inside last frame's payload
    for cut in (cut_prefix, cut_payload):
        with pytest.raises(ValueError):
            list(codec.iter_video_frames(cut, step=1))
    df = spark.createDataFrame(
        [("good", bytearray(video)), ("cut1", bytearray(cut_prefix)),
         ("cut2", bytearray(cut_payload))],
        "video_id string, bytes binary",
    )
    rows = sample_frames(df, every_k=1).collect()
    assert {r["video_id"] for r in rows} == {"good"}
    assert len(rows) == 6


def test_resize_rejects_degenerate_dims_and_stale_metadata(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"x"), 1, 1, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    with pytest.raises(ValueError):
        resize_images(df, 0, 8)
    # a schema whose dim columns are named differently must be declared,
    # not silently left stale
    df2 = df.withColumnRenamed("w", "width")
    with pytest.raises(ValueError):
        resize_images(df2, 8, 8)
    out = resize_images(df2, 8, 8, w_col="width", h_col="h")
    assert "width" in out.columns


def test_multimodal_goldens_regenerate_byte_identically():
    """The frozen multimodal goldens (feature-vector md5s, cosines, top-k
    ranks) must be exactly what the generator emits from the shared pure
    math (features_of/_resize_nn + codec) — a drifted or hand-edited
    artifact breaks the img_multimodal_pipeline oracle guarantee."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import make_multimodal_goldens as gen

    committed = gen.OUT_PATH.read_text()
    assert gen.render(gen.compute_goldens()) == committed


def test_sample_frames_keeps_caller_id_column_name(spark):
    """Review-pinned: a differently-named video id column must come out
    under the SAME name, not silently renamed to 'video_id'."""
    video = codec.encode_video(
        [codec.encode(codec.synth_pixels("f0", 4, 4), "png")]
    )
    df = spark.createDataFrame(
        [("clip-1", bytearray(video))], "clip_id string, bytes binary"
    )
    out = sample_frames(df, every_k=1, video_id_col="clip_id")
    assert out.columns == ["clip_id", "frame_idx", "frame_bytes"]
    assert out.collect()[0]["clip_id"] == "clip-1"


def test_phash_near_dup_pairs_classes(spark):
    """hamming_near_pairs over image phash: exact copies land at hamming 0,
    perturbed near-copies within the gate, unrelated images filtered by
    the exact bit_count check even when a 16-bit chunk collides."""
    from archive_query_log_spark.entry_queries import (
        _PHASH_N,
        img_phash_near_dup,
    )

    rows = img_phash_near_dup(spark, "").collect()
    assert rows, "no near-dup pairs found"
    by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    # every exact copy (the every-5th rule of the entry) is found at
    # hamming 0 against its original
    for i in range(0, _PHASH_N, 5):
        a, b = sorted((f"cop{i:08d}", f"img{i:08d}"))
        assert by_pair.get((a, b)) == 0, (a, b)
    # all reported pairs respect the gate
    assert all(0 <= h <= 3 for h in by_pair.values())
    # at least one PERTURBED duplicate survives (non-zero hamming)
    assert any(
        a.startswith("dup") and h > 0 for (a, _), h in by_pair.items()
    )


def test_video_near_dup_overlap_structure(spark):
    """Stride-2 pools with every-2nd-frame sampling: adjacent videos share
    3 sampled frames, distance-2 share 2, distance-3 share 1 (below the
    gate) — and the entry reports exactly the >= 2 pairs."""
    from archive_query_log_spark.entry_queries import video_near_dup

    rows = video_near_dup(spark, "").collect()
    by_pair = {(r["vid_a"], r["vid_b"]): r["shared_frames"] for r in rows}
    assert by_pair[("vid0000", "vid0001")] == 3
    assert by_pair[("vid0000", "vid0002")] == 2
    assert ("vid0000", "vid0003") not in by_pair
    assert all(s >= 2 for s in by_pair.values())


def test_frame_overlap_pairs_operator(spark):
    """Library operator semantics (the video_near_dup entry delegates to
    this): distinct-signature counting, NULL-sig drop, hot-signature cap,
    min_shared gate, custom column names."""
    from archive_query_log_spark.operators.multimodal import (
        frame_overlap_pairs,
    )

    # v1/v2 share sigs 10,11; v1/v3 share only 10; v2 carries a duplicated
    # (id,sig) row that must count once; v4 contributes a NULL sig only
    rows = [
        ("v1", 10), ("v1", 11), ("v1", 12),
        ("v2", 10), ("v2", 11), ("v2", 11), ("v2", 13),
        ("v3", 10), ("v3", 14),
        ("v4", None),
    ]
    df = spark.createDataFrame(rows, "clip string, ph long")
    out = frame_overlap_pairs(
        df, id_col="clip", sig_col="ph", min_shared=2, max_sig_df=100
    )
    got = {(r["id_a"], r["id_b"]): r["shared_frames"] for r in out.collect()}
    assert got == {("v1", "v2"): 2}

    # min_shared=1 surfaces the single-shared pairs too
    out1 = frame_overlap_pairs(
        df, id_col="clip", sig_col="ph", min_shared=1, max_sig_df=100
    )
    got1 = {(r["id_a"], r["id_b"]): r["shared_frames"] for r in out1.collect()}
    assert got1 == {("v1", "v2"): 2, ("v1", "v3"): 1, ("v2", "v3"): 1}

    # hot cap: sig 10 appears in 3 videos; max_sig_df=2 drops it, so the
    # v1/v3 and v2/v3 links (which rode only sig 10) disappear
    outc = frame_overlap_pairs(
        df, id_col="clip", sig_col="ph", min_shared=1, max_sig_df=2
    )
    gotc = {(r["id_a"], r["id_b"]): r["shared_frames"] for r in outc.collect()}
    assert gotc == {("v1", "v2"): 1}
