"""Regenerate archive_query_log_spark/data/multimodal_goldens.json — the
frozen oracle for the img_multimodal_pipeline entry (the lang-model
pattern: deterministic generation tool, VALUES-inlined goldens in the
DuckDB oracle, byte-identity regeneration test).

For each of the 200 synthetic images (the exact set synth_images(spark,
200, 8) produces — content is keyed purely on image_id, so no Spark is
needed here):

  synth pixels → encode(fmt) → decode → nearest-neighbor resize 16x16 →
  re-encode(fmt) → decode → 20-dim float32 feature vector

and freeze per image: the md5 of the vector's little-endian float32 bytes
(exact byte identity, engine-neutral), the cosine similarity against the
img00000000 query vector rounded HALF_UP to 4 places (replicating Spark's
F.round semantics AND its sequential-fold dot product exactly — Python
floats are IEEE doubles, `acc + x*y` left-to-right is the same op order as
F.aggregate), and the top-k rank (k=10, ties broken by image_id asc, like
brute_force_topk).

The feature/resize math is imported from operators/multimodal.py — ONE
source of truth, so a change to the math breaks the byte-identity test
(tests/test_multimodal.py) and a change to the Spark plumbing (schema,
Arrow batching, caching, join, top-k) breaks the oracle gate.

Usage: python tools/make_multimodal_goldens.py [--check]
  --check: regenerate in memory and diff against the committed file
           (exit 1 on any byte difference).
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from archive_query_log_spark.crawler import codec  # noqa: E402
from archive_query_log_spark.crawler.synth import (  # noqa: E402
    IMG_H,
    IMG_W,
    image_id_for,
)
from archive_query_log_spark.operators.multimodal import (  # noqa: E402
    _resize_nn,
    features_of,
)

N_IMAGES = 200
OUT_W = OUT_H = 16
K = 10
QUERY_IMAGE = "img00000000"
OUT_PATH = (
    Path(__file__).resolve().parent.parent
    / "archive_query_log_spark/data/multimodal_goldens.json"
)


def _dot_seq(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right fold — the exact op order of similarity.dot
    (F.aggregate with acc + x*y); float32 elements arrive as exact doubles."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _cos_round4(a: list[float], b: list[float]) -> float:
    c = _dot_seq(a, b) / (
        math.sqrt(_dot_seq(a, a)) * math.sqrt(_dot_seq(b, b))
    )
    # Spark's F.round(double, 4) goes through BigDecimal.valueOf, i.e. the
    # SHORTEST decimal repr of the double (Double.toString), then HALF_UP —
    # so replicate with Decimal(repr(c)), NOT Decimal(c) (the exact binary
    # expansion): for c = 0.00015 the shortest repr rounds to 0.0002 while
    # the exact binary value (0.000149999...) would round to 0.0001.
    # (Review-verified live against Spark.)
    return float(
        Decimal(repr(c)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def compute_goldens() -> dict:
    feats: dict[str, list[float]] = {}
    fmts: dict[str, str] = {}
    for i in range(N_IMAGES):
        iid = image_id_for(i)
        fmt = "jpeg" if i % 2 else "png"  # synth_images' fmt rule
        pixels = codec.synth_pixels(iid, IMG_W, IMG_H)
        buf = codec.encode(pixels, fmt)
        _, _, _, px = codec.decode(buf)
        resized = _resize_nn(px, OUT_W, OUT_H)
        _, _, _, px2 = codec.decode(codec.encode(resized, fmt))
        feats[iid] = features_of(px2)
        fmts[iid] = fmt
    qv = feats[QUERY_IMAGE]
    cos = {iid: _cos_round4(v, qv) for iid, v in feats.items()}
    ranked = sorted(cos, key=lambda iid: (-cos[iid], iid))[:K]
    rank = {iid: r + 1 for r, iid in enumerate(ranked)}
    return {
        "n_images": N_IMAGES,
        "src_w": IMG_W,
        "src_h": IMG_H,
        "out_w": OUT_W,
        "out_h": OUT_H,
        "k": K,
        "query_image": QUERY_IMAGE,
        "images": [
            {
                "image_id": iid,
                "fmt": fmts[iid],
                "feat_sig": hashlib.md5(
                    np.asarray(feats[iid], dtype="<f4").tobytes()
                ).hexdigest(),
                "cos_sim": cos[iid],
                "rank": rank.get(iid),
            }
            for iid in sorted(feats)
        ],
    }


def render(goldens: dict) -> str:
    return json.dumps(goldens, indent=1, sort_keys=True) + "\n"


def main() -> None:
    text = render(compute_goldens())
    if "--check" in sys.argv:
        committed = OUT_PATH.read_text()
        if committed != text:
            print("DIFFERS from committed goldens", file=sys.stderr)
            sys.exit(1)
        print(f"byte-identical: {OUT_PATH}")
        return
    OUT_PATH.write_text(text)
    print(f"wrote {OUT_PATH} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
