"""Deterministic codec contract: roundtrip, lossy PSNR bounds, phash."""

import numpy as np

from archive_query_log_spark.crawler import codec


def test_png_roundtrip_exact():
    px = codec.synth_pixels("img00000001", 32, 32)
    fmt, w, h, dec = codec.decode(codec.encode(px, "png"))
    assert (fmt, w, h) == ("png", 32, 32)
    assert np.array_equal(px, dec)


def test_jpeg_lossy_psnr_above_gate():
    px = codec.synth_pixels("img00000002", 32, 32)
    _, _, _, dec = codec.decode(codec.encode(px, "jpeg"))
    assert not np.array_equal(px, dec)  # genuinely lossy
    p = codec.psnr(px, dec)
    assert codec.PSNR_GATE_DB < p < 60.0


def test_phash_stability_and_sensitivity():
    px = codec.synth_pixels("img00000003", 32, 32)
    h1 = codec.phash(px)
    assert h1 == codec.phash(px.copy())
    other = codec.synth_pixels("img00000004", 32, 32)
    assert h1 != codec.phash(other)
    # lossy decode keeps the phash (the validation invariant)
    _, _, _, dec = codec.decode(codec.encode(px, "jpeg"))
    assert codec.phash(dec) == codec.phash(codec.decode(codec.encode(px, "jpeg"))[3])


def test_validate_row_verdicts():
    iid = "img00000005"
    px = codec.synth_pixels(iid, 32, 32)
    buf = codec.encode(px, "jpeg")
    dec = codec.decode(buf)[3]
    ok = codec.validate_row(
        buf, iid, 32, 32, "jpeg", codec.synth_caption(iid), codec.phash(dec)
    )
    assert ok[0] == 200 and ok[2] and ok[3] and ok[4]
    bad = codec.validate_row(
        buf, iid, 32, 32, "jpeg", "wrong caption", codec.phash(dec)
    )
    assert bad[0] == 200 and not bad[3]
    garbage = codec.validate_row(b"nope", iid, 32, 32, "png", "c", 0)
    assert garbage[0] == 422
    # regression: stored w/h disagreeing with the payload (shape-mismatch
    # psnr) must be a 422 verdict, never an exception out of the UDF
    mismatched = codec.validate_row(buf, iid, 16, 16, "jpeg", "c", 0)
    assert mismatched[0] == 422
