"""Multimodal column operators: resize, feature-extract, frame-sample
(build-brief first-class components alongside SURVEY §2).

Images/videos are opaque ``binary`` columns with typed metadata
(image_id, bytes, w, h, fmt — the BASELINE.json input_hint schema). Only
the byte-level codec is the documented deterministic stand-in
(crawler/codec.py — no image wheel ships in this container); everything in
THIS module is real math over real pixel arrays and real Spark plumbing:

- ``resize_images``: mapInPandas decode → integer nearest-neighbor index
  mapping (exact, no float resampling ambiguity) → re-encode in the same
  format. Map-only; schema preserved, w/h updated.
- ``image_features``: pandas UDF bytes → 20-dim float vector (mean, std,
  row/col gradient energy, 16-bin normalized histogram). The output is an
  ``array<float>`` embedding column — it composes directly with the ANN
  operators (brute_force_topk / with_lsh_signature / ivf_topk), which is
  the point: image similarity rides the SAME similarity stack as text
  embeddings.
- ``sample_frames``: every-k-th frame from a packed video container
  (codec.encode_video: length-prefixed frames). Sampling SEEKS the
  container — skipped frames are never decoded or copied out — and
  explodes to (video_id, frame_idx, frame_bytes) rows, UDTF-shaped via
  mapInPandas so one input row yields many output rows without a
  collect or shuffle.

All three are map-only (no exchange); partition parallelism is inherited
from the input. Arrow batch shapes carry binary columns; nothing is
row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archive_query_log_spark.crawler import codec

__all__ = [
    "resize_images",
    "image_features",
    "features_of",
    "feature_signature",
    "phash_col",
    "sample_frames",
]


def _resize_nn(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer nearest-neighbor resize: out[i,j] = in[(i*h)//out_h,
    (j*w)//out_w] — exact, deterministic, no float rounding modes."""
    h, w = pixels.shape
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[rows[:, None], cols[None, :]]


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Re-encode every image at (out_w, out_h); the ``w_col``/``h_col``
    dimension columns update when present (they MUST be named — stale
    metadata disagreeing with the payload is an assertion error, not a
    silent pass-through), other columns pass through. Corrupt payloads
    yield NULL bytes (and NULL w/h), never a task failure."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target dims must be >= 1, got {out_w}x{out_h}")
    schema = df.schema
    out_fields = [f.name for f in schema.fields]
    for c in (w_col, h_col):
        if c is not None and c not in out_fields:
            raise ValueError(
                f"dimension column {c!r} not in schema {out_fields} — pass "
                "w_col/h_col (or None to skip) so metadata cannot go stale"
            )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            new_bytes, new_w, new_h = [], [], []
            for buf, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    _, _, _, pixels = codec.decode(bytes(buf))
                    resized = _resize_nn(pixels, out_w, out_h)
                    new_bytes.append(codec.encode(resized, fmt))
                    new_w.append(out_w)
                    new_h.append(out_h)
                except Exception:
                    new_bytes.append(None)
                    new_w.append(None)
                    new_h.append(None)
            out = pdf.copy()
            out[bytes_col] = new_bytes
            if w_col is not None:
                out[w_col] = pd.array(new_w, dtype="Int32")
            if h_col is not None:
                out[h_col] = pd.array(new_h, dtype="Int32")
            yield out[out_fields]

    return df.mapInPandas(_batches, schema)


N_FEATURES = 20  # mean, std, row-grad, col-grad + 16-bin histogram


def features_of(pixels: np.ndarray) -> list[float]:
    """Pure per-image feature math (the single source of truth): decoded
    pixel array → 20-dim float32 vector. Shared by the Spark UDF below and
    by tools/make_multimodal_goldens.py, so the frozen goldens and the
    running pipeline can never drift apart silently — a change here breaks
    the golden byte-identity test."""
    x = pixels.astype(np.float64)
    grad_r = np.abs(np.diff(x, axis=0)).mean() if x.shape[0] > 1 else 0.0
    grad_c = np.abs(np.diff(x, axis=1)).mean() if x.shape[1] > 1 else 0.0
    hist = np.bincount(pixels.ravel() >> 4, minlength=16).astype(np.float64)
    hist /= max(1.0, hist.sum())
    return (
        np.concatenate(([x.mean(), x.std(), grad_r, grad_c], hist))
        .astype(np.float32)
        .tolist()
    )


def image_features(img_bytes: Column | str) -> Column:
    """bytes → array<float> feature vector (length N_FEATURES); NULL on
    corrupt payloads. Real numpy math over decoded pixels."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _feat(bufs: pd.Series) -> pd.Series:
        out = []
        for buf in bufs:
            try:
                _, _, _, px = codec.decode(bytes(buf))
                out.append(features_of(px))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _feat(F.col(img_bytes) if isinstance(img_bytes, str) else img_bytes)


def phash_col(img_bytes: Column | str) -> Column:
    """bytes → 64-bit perceptual hash (the codec's average-hash: 8×8 block
    means vs global mean, signed int64 so it rides a LongType column).
    NULL on corrupt payloads. Feeds ``dedup.hamming_near_pairs`` for
    image near-duplicate detection — the standard phash-dedup layout of a
    training-data image pipeline, riding the same pigeonhole equi-join as
    text simhash (never an all-pairs comparison)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ph(bufs: pd.Series) -> pd.Series:
        out = []
        for buf in bufs:
            try:
                _, _, _, px = codec.decode(bytes(buf))
                out.append(codec.phash(px))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _ph(F.col(img_bytes) if isinstance(img_bytes, str) else img_bytes)


def feature_signature(vec: Column | str) -> Column:
    """array<float> → md5 hex of the vector's little-endian float32 bytes —
    an exact byte-identity fingerprint of the whole embedding, safe to
    hash-gate cross-engine (a raw float column would be at the mercy of each
    engine's float→string rendering). NULL in, NULL out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _sig(vecs: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for v in vecs:
            if v is None:
                out.append(None)
            else:
                out.append(
                    hashlib.md5(
                        np.asarray(v, dtype="<f4").tobytes()
                    ).hexdigest()
                )
        return pd.Series(out, dtype=object)

    return _sig(F.col(vec) if isinstance(vec, str) else vec)


def sample_frames(
    df: DataFrame,
    every_k: int,
    video_id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Every k-th frame of each packed video → (<video_id_col>, frame_idx,
    frame_bytes) rows — the id column keeps the CALLER's name, so a
    differently-named id column is never silently renamed. Container-level
    seek: skipped frames are sliced over, not decoded. UDTF shape (1 row →
    many) via mapInPandas."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids, idxs, frames = [], [], []
            for vid, buf in zip(pdf[video_id_col], pdf[bytes_col]):
                # buffer per-video and commit only on COMPLETE iteration:
                # iter_video_frames is a generator, so a container truncated
                # mid-way yields some frames before raising — those partial
                # rows must not leak into the output
                try:
                    sampled = list(
                        codec.iter_video_frames(bytes(buf), step=every_k)
                    )
                except Exception:
                    continue  # corrupt container: contributes no rows
                for i, frame in sampled:
                    vids.append(vid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {video_id_col: vids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(
        _batches,
        f"{video_id_col} string, frame_idx int, frame_bytes binary",
    )


def frame_overlap_pairs(
    sig_df: DataFrame,
    id_col: str = "video_id",
    sig_col: str = "sig",
    min_shared: int = 2,
    max_sig_df: int | None = 100,
) -> DataFrame:
    """Video near-dup pairs from per-frame signatures: videos sharing
    ``min_shared`` or more DISTINCT frame signatures (typically phash via
    ``sample_frames`` + ``phash_col``). Candidate generation is an exact
    EQUI-join on the signature — never all-pairs — with the hot-signature
    cap of the LSH/pigeonhole family: a degenerate frame shared by
    everything (black frame, test card) would quadratically explode the
    self-join, so signatures appearing in more than ``max_sig_df`` videos
    are dropped with an explicit recall cut (audit the cut with
    ``dedup.hot_key_report`` on the deduped (id, sig) frame).

    Input rows are (id, sig) per sampled frame; duplicates and NULL
    signatures (corrupt frames) are dropped up front. Returns
    (id_a, id_b, shared_frames) with id_a < id_b."""
    from archive_query_log_spark.operators.dedup import _drop_hot_keys

    sig = (
        sig_df.where(F.col(sig_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
        .dropDuplicates(["id", "sig"])
    )
    sig = _drop_hot_keys(sig, "sig", max_sig_df)
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, on="sig")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .agg(F.count_distinct(F.col("sig")).alias("shared_frames"))
        .where(F.col("shared_frames") >= min_shared)
    )
