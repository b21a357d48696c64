"""Deterministic image codec + validation math (numpy only).

STUB NOTICE (deliberate, per build brief): no real image libraries (PIL /
libjpeg) ship in this container, so "png"/"jpeg" here are a deterministic
fake codec with the *same contract* a real one would have:

- ``png``  : lossless — zlib over raw pixels; decode is bit-exact.
- ``jpeg`` : lossy — 2-bit quantization before zlib, giving a true
  reconstruction error with PSNR ≈ 46 dB (> the 40 dB gate), so the
  PSNR-validation path is exercised with real signal, not a constant.

Swapping in real codecs = replacing ``encode``/``decode`` bodies; every
Spark-side piece (binary columns, Arrow batch shapes, UDF signatures,
partitioning) is real and unchanged.

Validation contract (BASELINE.json input_hint): decoded-pixel allclose
(PSNR ≥ 40 dB for lossy), byte-exact caption equality, phash consistency.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

MAGIC = b"SGIM"
FMT_CODES = {"png": 0, "jpeg": 1}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}
PSNR_GATE_DB = 40.0

_WORDS = (
    "archive query log serp capture crawl frontier host image caption "
    "wayback memento provider search result snippet rank page offset wave"
).split()


_SM1 = np.uint64(0x9E3779B97F4A7C15)
_SM2 = np.uint64(0xBF58476D1CE4E5B9)
_SM3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based splitmix64 — fully vectorized deterministic noise.
    (numpy array integer ops wrap silently — no errstate needed)"""
    z = x + _SM1
    z = (z ^ (z >> np.uint64(30))) * _SM2
    z = (z ^ (z >> np.uint64(27))) * _SM3
    return z ^ (z >> np.uint64(31))


def _orig_pixels_2d(seeds: np.ndarray, arange_wh: np.ndarray) -> np.ndarray:
    """(m, wh) reference pixels for m seeds — bit-identical to
    ``(_splitmix64(seeds[:,None]+arange) & 0xFF).astype(uint8)`` but with
    in-place ops on two buffers instead of a fresh (m × wh) uint64 array
    per step: the expression form allocated ~8 multi-MB temporaries per
    chunk and was memory-bandwidth-bound (measured 12 → 7 µs/row on the
    per-fetch validation's dominant section)."""
    z = np.add(seeds[:, None], arange_wh[None, :])
    z += _SM1
    t = z >> np.uint64(30)
    z ^= t
    z *= _SM2
    np.right_shift(z, np.uint64(27), out=t)
    z ^= t
    z *= _SM3
    np.right_shift(z, np.uint64(31), out=t)
    z ^= t
    z &= np.uint64(0xFF)
    return z.astype(np.uint8)


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-random grayscale pixels keyed by image_id.

    Counter-based (seed + pixel index through splitmix64) so generation is
    3 numpy ops per image — per-row RNG-object construction was the decode
    hot spot at 500k fetches."""
    seed = np.uint64(
        int.from_bytes(hashlib.md5(image_id.encode()).digest()[:8], "big")
    )
    ctr = seed + np.arange(w * h, dtype=np.uint64)
    return (_splitmix64(ctr) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w)


def synth_caption(image_id: str) -> str:
    """Deterministic caption keyed by image_id (byte-exact check target).
    Bytes-slice iteration + list-join: same words as the original
    ``_WORDS[d[1+i] % k] for i in range(n)`` form (d[1:1+n][i] == d[1+i]),
    measured ~1.5 µs/call faster — this runs once per fetch row."""
    d = hashlib.md5((image_id + ":cap").encode()).digest()
    n = 3 + d[0] % 6
    words, k = _WORDS, len(_WORDS)
    return " ".join([words[c % k] for c in d[1 : 1 + n]])


def _quantize(pixels: np.ndarray) -> np.ndarray:
    """The 'lossy' step: clear the 2 LSBs, re-center (+2) — MSE 1.5,
    PSNR = 10·log10(255²/1.5) ≈ 46.4 dB."""
    return ((pixels & 0xFC) | 0x02).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape
    payload = _quantize(pixels) if fmt == "jpeg" else pixels
    return (
        MAGIC
        + struct.pack("<BHH", FMT_CODES[fmt], w, h)
        + zlib.compress(payload.tobytes(), level=1)
    )


def decode(buf: bytes) -> tuple[str, int, int, np.ndarray]:
    if buf[:4] != MAGIC:
        raise ValueError("bad magic")
    fmt_code, w, h = struct.unpack("<BHH", buf[4:9])
    pixels = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8).reshape(h, w)
    return FMT_NAMES[fmt_code], w, h, pixels


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash(pixels: np.ndarray) -> int:
    """64-bit average-hash: 8×8 block means vs global mean (signed int64,
    two's complement, so it round-trips through a Spark LongType column)."""
    h, w = pixels.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    win = pixels[: bh * 8, : bw * 8]
    # integer-exact: block_mean > global_mean ⟺ 64·block_sum > total_sum
    sums = win.reshape(8, bh, 8, bw).sum(axis=(1, 3), dtype=np.int64)
    total = int(sums.sum())
    bits = (sums.ravel() * 64 > total).astype(np.uint64)
    v = int(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))
    return v - (1 << 64) if v >= (1 << 63) else v


def validate_rows(
    bufs: list,
    image_ids: list,
    ws: list,
    hs: list,
    fmts: list,
    captions: list,
    phashes: list,
    chunk: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batched ``validate_row``: same verdicts, vectorized across rows.

    Returns (status, psnr_db, psnr_ok, caption_ok, phash_ok) arrays. Rows
    whose payload decodes to exactly the stored (w, h) shape are validated
    through one numpy pass per ``chunk`` rows (chunked so the (rows × w·h)
    temporaries stay cache-sized — one big batch measured 8× slower cold
    from allocator churn); anything unusual (missing payload, bad magic,
    truncated zlib, shape mismatch) takes the scalar ``validate_row`` path
    so every legacy edge case keeps byte-identical verdicts.

    Exactness notes: pixel values are uint8, so squared-error partial sums
    stay integers < 2^53 — float64 summation is order-independent and the
    vectorized MSE/PSNR equals the scalar path bit-for-bit; rounding uses
    Python's round() per row (np.round differs in rare ties).
    """
    n = len(bufs)
    status = np.full(n, 404, dtype=np.int32)
    psnr_db = np.zeros(n, dtype=np.float64)
    psnr_ok = np.zeros(n, dtype=bool)
    caption_ok = np.zeros(n, dtype=bool)
    phash_ok = np.zeros(n, dtype=bool)
    groups: dict[tuple[int, int], tuple[list, list]] = {}
    magic, unpack, decompress = MAGIC, struct.unpack, zlib.decompress
    for j in range(n):
        b = bufs[j]
        if b is None:
            continue  # stays 404/zeros — the dead-link verdict
        # bytes OR any buffer (memoryview) — zlib/struct accept both
        w, h = int(ws[j]), int(hs[j])
        try:
            if b[:4] != magic:
                raise ValueError("bad magic")
            _fmt_code, dw, dh = unpack("<BHH", b[4:9])
            wh = w * h
            # bufsize=wh: the output size is known exactly — skips the
            # default 16 KB first allocation + shrink per payload
            raw = decompress(b[9:], bufsize=wh)
            if (dw, dh) != (w, h) or len(raw) != wh:
                raise ValueError("shape")
        except Exception:
            # scalar fallback reproduces the legacy verdict exactly (422 on
            # bad payloads, and the odd broadcastable-shape corner cases)
            s, p, a, bb, c = validate_row(
                bytes(b), image_ids[j], w, h, fmts[j], captions[j],
                int(phashes[j]),
            )
            status[j], psnr_db[j] = s, p
            psnr_ok[j], caption_ok[j], phash_ok[j] = a, bb, c
            continue
        grp = groups.setdefault((w, h), ([], []))
        grp[0].append(j)
        grp[1].append(raw)
    for (w, h), (idx_list, raws) in groups.items():
        wh = w * h
        arange_wh = np.arange(wh, dtype=np.uint64)
        bh, bw = max(1, h // 8), max(1, w // 8)
        # ~2 MB of pixels per chunk keeps the (rows × wh) uint64 splitmix
        # buffers cache-sized at EVERY image size (swept 32×32: 2048 rows
        # beats 512 by ~3%; 128×128: 128 rows beats 512 by ~25%; one big
        # batch measured 8× slower cold from allocator churn)
        rows_chunk = chunk or max(16, (2 << 20) // wh)
        for c0 in range(0, len(idx_list), rows_chunk):
            jlist = idx_list[c0 : c0 + rows_chunk]
            idx = np.asarray(jlist)
            m = len(jlist)
            P = np.frombuffer(
                b"".join(raws[c0 : c0 + rows_chunk]), dtype=np.uint8
            ).reshape(m, wh)
            seeds = np.empty(m, dtype=np.uint64)
            jpeg = np.empty(m, dtype=bool)
            md5_, from_bytes = hashlib.md5, int.from_bytes
            for k, j in enumerate(jlist):
                iid = image_ids[j]
                seeds[k] = from_bytes(md5_(iid.encode()).digest()[:8], "big")
                jpeg[k] = fmts[j] == "jpeg"
                caption_ok[j] = captions[j] == synth_caption(iid)
            orig = _orig_pixels_2d(seeds, arange_wh)
            # einsum accumulates the squared diffs in int64 in one pass —
            # no (m × wh) d and d·d temporaries; int16 diffs are exact
            # (|uint8 − uint8| ≤ 255) and the int64 accumulator matches the
            # old int64 sum bit-for-bit
            d = P.astype(np.int16)
            d -= orig
            sq = np.einsum("ij,ij->i", d, d, dtype=np.int64)
            mse = sq / float(wh)
            with np.errstate(divide="ignore"):
                p_arr = np.where(
                    sq == 0, np.inf, 10.0 * np.log10(255.0**2 / np.where(mse == 0, 1.0, mse))
                )
            psnr_ok[idx] = np.where(jpeg, p_arr >= PSNR_GATE_DB, sq == 0)
            # int32 block-sum accumulators halve this pass's bandwidth and
            # are exact when every value they hold fits: block sums are
            # ≤ 255·bh·bw, and the comparison operands (·64, and the total
            # = sum of 64 blocks) stay < 2^31 iff 255·64·bh·bw < 2^31,
            # i.e. bh·bw ≤ 131072 — true for every image this codec can
            # mint short of ~134 MP; larger falls back to int64
            if bh * bw <= 131_072:
                sdtype = np.int32
            else:  # pragma: no cover - >134 MP images
                sdtype = np.int64
            # two-stage block sum (rows-within-block, then cols-within-
            # block): same int accumulator and identical sums as the old
            # one-shot .sum(axis=(2,4)) over the 5-D view, but each stage
            # reduces over ONE axis with the innermost dimension contiguous
            # — measured ~3× faster than the doubly-strided reduction
            s1 = (
                P.reshape(m, h, w)[:, : bh * 8, : bw * 8]
                .reshape(m, 8, bh, bw * 8)
                .sum(axis=2, dtype=sdtype)
            )
            sums = s1.reshape(m, 8, 8, bw).sum(axis=3, dtype=sdtype).reshape(
                m, 64
            )
            total = sums.sum(axis=1, dtype=np.int64)
            bits = sums.astype(np.int64) * 64 > total[:, None]
            # packbits little-endian: byte k holds bits 8k..8k+7 LSB-first,
            # so the 8-byte row viewed as little-endian int64 equals the old
            # Σ bits[i]<<i (uint64) reinterpreted two's-complement
            ph = np.packbits(bits, axis=1, bitorder="little").view(
                np.dtype("<i8")
            )
            phash_ok[idx] = ph.ravel() == np.asarray(
                [phashes[j] for j in jlist], dtype=np.int64
            )
            status[idx] = 200
            psnr_db[idx] = [
                999.0 if x == np.inf else round(float(x), 3) for x in p_arr
            ]
    return status, psnr_db, psnr_ok, caption_ok, phash_ok


def validate_row(
    buf: bytes, image_id: str, w: int, h: int, fmt: str,
    caption: str, stored_phash: int,
) -> tuple[int, float, bool, bool, bool]:
    """(status, psnr_db, psnr_ok, caption_ok, phash_ok) for one fetch."""
    # the whole body is guarded: any per-row corruption (bad magic, stored
    # w/h disagreeing with the payload → shape-mismatch psnr, truncated
    # zlib, ...) must yield a 422 verdict row, never a task failure
    try:
        dec_fmt, dw, dh, pixels = decode(buf)
        orig = synth_pixels(image_id, w, h)
        p = psnr(orig, pixels)
        psnr_ok = bool(p >= PSNR_GATE_DB) if fmt == "jpeg" else bool(
            np.array_equal(orig, pixels)
        )
        caption_ok = caption == synth_caption(image_id)
        phash_ok = phash(pixels) == stored_phash
        return (
            200,
            (999.0 if p == float("inf") else round(p, 3)),
            psnr_ok,
            caption_ok,
            phash_ok,
        )
    except Exception:
        return 422, 0.0, False, False, False


# --- packed video container (frame-sample input) ----------------------------

VIDEO_MAGIC = b"SGVD"


def encode_video(frames: list[bytes]) -> bytes:
    """Pack encoded frames length-prefixed — the video analog of the image
    binary column. A real container (mp4/webm) would replace this layout;
    the seek contract (`iter_video_frames` skips without decoding) is the
    real part."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def iter_video_frames(buf: bytes, step: int = 1):
    """Yield (index, frame_bytes) for every ``step``-th frame, SEEKING over
    the others — skipped frames are never sliced out or decoded (the
    container-level sampling a real demuxer gives you). A container
    truncated mid-prefix or mid-payload raises ValueError rather than
    silently yielding short frame bytes."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("bad video magic")
    (n,) = struct.unpack("<I", buf[4:8])
    pos = 8
    for i in range(n):
        if pos + 4 > len(buf):
            raise ValueError(f"truncated video container at frame {i} prefix")
        (ln,) = struct.unpack("<I", buf[pos : pos + 4])
        pos += 4
        if pos + ln > len(buf):
            raise ValueError(f"truncated video container in frame {i} payload")
        if i % step == 0:
            yield i, buf[pos : pos + ln]
        pos += ln


# --- composite SERP payload (result-block container) ------------------------

SERP_MAGIC = b"SGSP"


def encode_serp_payload(blocks: list[tuple[str, str, bytes]]) -> bytes:
    """Pack N result blocks — (relative url, title, image bytes) — into one
    binary SERP payload: the image-scope analog of a WARC HTML record that a
    result-block extractor walks (see operators/blocks.py)."""
    out = [SERP_MAGIC, struct.pack("<H", len(blocks))]
    for url, title, img in blocks:
        u, t = url.encode(), title.encode()
        out.append(struct.pack("<HHI", len(u), len(t), len(img)))
        out += [u, t, img]
    return b"".join(out)


def decode_serp_payload(buf: bytes) -> list[tuple[str, str, bytes]]:
    if buf[:4] != SERP_MAGIC:
        raise ValueError("bad serp magic")
    (n,) = struct.unpack("<H", buf[4:6])
    pos, blocks = 6, []
    for _ in range(n):
        lu, lt, li = struct.unpack("<HHI", buf[pos : pos + 8])
        pos += 8
        url = buf[pos : pos + lu].decode()
        pos += lu
        title = buf[pos : pos + lt].decode()
        pos += lt
        img = buf[pos : pos + li]
        pos += li
        blocks.append((url, title, img))
    return blocks
