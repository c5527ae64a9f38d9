"""Real-decode tests for the multimodal path: the PPM/BMP parsers in
operators/multimodal.py must agree with independently-constructed
images (dimensions, channel count, exact fixed-point channel means),
and the Spark pipeline must surface the decoded values."""

from __future__ import annotations

import numpy as np
import pytest

from thrive_spark.operators.multimodal import decode_image, encode_ppm
from thrive_spark.registry import QUERIES


def _make_ppm(px: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = px.shape
    hdr = b"P6\n"
    if comment:
        hdr += b"# synthetic test image\n"
    hdr += b"%d %d\n255\n" % (w, h)
    return hdr + px.tobytes()


def _make_bmp(px: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER), bottom-up
    row order with 4-byte row padding — built here independently of
    the decoder under test."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in px:  # decoder reads raw raster rows; keep same order
        raster += row.tobytes() + b"\x00" * (row_bytes - w * 3)
    offset = 14 + 40
    size = offset + len(raster)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return bytes(header) + bytes(raster)


def _expected_means(px: np.ndarray) -> list[int]:
    ch = px.shape[2]
    return [
        int(v)
        for v in np.floor(
            px.reshape(-1, ch).mean(axis=0) * 10000 + 0.5
        ).astype(np.int64)
    ]


def test_ppm_decode_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    meta = decode_image(_make_ppm(px))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (9, 13, 3)
    assert meta["channel_means"] == _expected_means(px)


def test_ppm_decode_handles_comments():
    px = np.full((2, 3, 3), 128, dtype=np.uint8)
    meta = decode_image(_make_ppm(px, comment=True))
    assert (meta["width"], meta["height"]) == (3, 2)
    assert meta["channel_means"] == [1280000, 1280000, 1280000]


def test_bmp_decode_exact():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)  # w=6 pads
    meta = decode_image(_make_bmp(px))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (6, 5, 3)
    assert meta["channel_means"] == _expected_means(px)


def test_encode_ppm_roundtrip():
    payload = b"the quick brown fox jumps over the lazy dog" * 20
    meta = decode_image(encode_ppm(payload))
    assert meta["width"] >= 1 and meta["height"] >= 1
    assert meta["n_channels"] == 3
    # tiled payload: means must equal the tiled buffer's means exactly
    need = meta["width"] * meta["height"] * 3
    tiled = np.frombuffer(
        (payload * (need // len(payload) + 1))[:need], dtype=np.uint8
    ).reshape(meta["height"], meta["width"], 3)
    assert meta["channel_means"] == _expected_means(tiled)


def test_unknown_codec_is_honest():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_decode_pipeline_surfaces_real_stats(spark, sf_dir):
    out = QUERIES["multimodal_decode_stub"](spark, sf_dir).limit(50).toPandas()
    assert len(out) > 0
    assert (out["n_channels"] == 3).all()
    assert (out["width"] >= 1).all() and (out["height"] >= 1).all()
    # features are the decoded channel means, not a byte histogram:
    # 3 comma-separated fixed-point ints, each within [0, 255*10^4]
    for feat in out["feature"]:
        parts = [int(p) for p in feat.split(",")]
        assert len(parts) == 3
        assert all(0 <= p <= 2550000 for p in parts)


def test_ahash_robust_where_md5_is_not(spark, sf_dir):
    """aHash of a uniformly-brightened image stays close (small
    Hamming — the threshold and the mean move together), while the
    hash space over distinct images is actually used."""
    from thrive_spark.registry import QUERIES

    pdf = QUERIES["multimodal_image_ahash"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["hamming_to_edit"] <= 8).all()  # brightness-invariant
    assert pdf["ahash"].nunique() > len(pdf) // 4  # non-degenerate space
