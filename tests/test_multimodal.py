from __future__ import annotations

import struct

import numpy as np
import pytest

from genome_deduplication_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    decode_image,
    image_feature,
    media_exact_dup_clusters,
)


def _ppm_bytes(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n# test\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _bmp_bytes(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed bottom-up BMP writer."""
    h, w, _ = pixels.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return file_hdr + dib + rows


def _media(spark):
    rows = [
        ("m1", "image", b"\x01\x02\x03" * 100, (10, 10, None, None, "image/png")),
        ("m2", "image", b"\x01\x02\x03" * 100, (10, 10, None, None, "image/png")),
        ("m3", "audio", b"\x09\x08" * 500, (None, None, 16000, 2000, "audio/wav")),
        ("m4", "video", None, (64, 64, None, 9000, "video/mp4")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_featurize_deterministic_and_batched(spark):
    df = _media(spark)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["m1"]["feature"] == out["m2"]["feature"]  # identical payloads
    assert out["m1"]["feature"] != out["m3"]["feature"]
    assert out["m4"]["n_bytes"] == 0
    assert len(out["m1"]["feature"]) == 32


def _test_pixels() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)


def test_decode_ppm_and_bmp_roundtrip():
    px = _test_pixels()
    assert np.array_equal(decode_image(_ppm_bytes(px)), px)
    assert np.array_equal(decode_image(_bmp_bytes(px)), px)
    # same image, two encodings -> identical real feature
    fp = image_feature(decode_image(_ppm_bytes(px)))
    fb = image_feature(decode_image(_bmp_bytes(px)))
    assert np.allclose(fp, fb)
    assert fp.shape == (32,)


def test_decode_unsupported_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")  # compressed codec: stubbed


def test_featurize_real_decode_path(spark):
    px = _test_pixels()
    rows = [
        ("p1", "image", _ppm_bytes(px), (8, 6, None, None, "image/x-ppm")),
        ("b1", "image", _bmp_bytes(px), (8, 6, None, None, "image/bmp")),
        ("j1", "image", b"\xff\xd8\xff\xe0junk", (8, 6, None, None, "image/jpeg")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["p1"]["decoded"] and out["b1"]["decoded"]
    assert not out["j1"]["decoded"]  # fallback feature, flagged
    assert out["p1"]["feature"] == out["b1"]["feature"]  # format-independent
    strict = decode_and_featurize(df, on_unsupported="raise")
    with pytest.raises(Exception, match="unsupported image format"):
        strict.collect()


def test_media_exact_dup(spark):
    df = _media(spark)
    out = {r["media_id"]: r["cluster_id"] for r in media_exact_dup_clusters(df).collect()}
    assert out["m1"] == out["m2"] == "m1"
    assert out["m3"] == "m3"
