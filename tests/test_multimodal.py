from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from genome_deduplication_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    decode_image,
    detect_image_format,
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


def _png_bytes(
    pixels: np.ndarray, filters: list[int] | None = None, alpha: bool = False
) -> bytes:
    """Minimal non-interlaced 8-bit truecolor(+alpha) PNG writer with
    per-row filter control — forward-filters rows per the PNG spec so the
    decoder's unfilter paths (0..4) are each exercised."""
    h, w, _ = pixels.shape
    ch = 4 if alpha else 3
    px = (
        np.dstack([pixels, np.full((h, w), 200, np.uint8)]) if alpha else pixels
    )
    if filters is None:
        filters = [0] * h
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y]
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) & 0xFF
        elif f == 2:
            filt = (cur - prev) & 0xFF
        elif f == 3:
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError(f)
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if alpha else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


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


def test_decode_png_roundtrip_all_filters():
    px = _test_pixels()
    # one row per filter type (+ a repeat) so every unfilter branch runs
    filters = [0, 1, 2, 3, 4, 2]
    assert np.array_equal(decode_image(_png_bytes(px, filters)), px)
    # RGBA: alpha plane is dropped, pixels identical
    assert np.array_equal(decode_image(_png_bytes(px, filters, alpha=True)), px)
    # same image, third encoding -> identical real feature
    fp = image_feature(decode_image(_png_bytes(px, filters)))
    fppm = image_feature(decode_image(_ppm_bytes(px)))
    assert np.allclose(fp, fppm)


def test_decode_png_unsupported_variants():
    px = _test_pixels()
    good = _png_bytes(px)
    # flip interlace byte inside IHDR (offset: 8 sig + 8 chunk hdr + 12)
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_image(bytes(interlaced))
    with pytest.raises(ValueError, match="IHDR/IDAT"):
        decode_image(b"\x89PNG\r\n\x1a\n....")  # signature only, no chunks


def test_decode_png_bounded_inflate():
    """Untrusted-payload guards: a zip-bomb-shaped IDAT (tiny compressed,
    huge decompressed) and implausible header dimensions are both rejected
    without allocating the decoded size."""
    px = _test_pixels()
    good = _png_bytes(px)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # IDAT inflates to far more than the declared 8x6 image needs
    bomb = (
        good[: 8 + 8 + 13 + 4]  # signature + IHDR chunk
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_image(bomb)
    # header-declared dimensions beyond the pixel cap: rejected pre-inflate
    huge_ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    huge = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", huge_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="implausible"):
        decode_image(huge)


def test_decode_unsupported_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0junk")  # JPEG: compressed codec, stubbed


def _bad_bmp_32bpp(px: np.ndarray) -> bytes:
    """Payload that PASSES the bmp sniff but fails decode (bpp=32)."""
    raw = _bmp_bytes(px)
    bad = bytearray(raw)
    struct.pack_into("<H", bad, 28, 32)
    return bytes(bad)


def test_sniff_false_positive_falls_back(spark):
    """ADVICE r4 (high): a payload that sniffs as an image but fails decode
    must degrade to the fallback feature under the default mode, not kill
    the job; strict mode re-raises."""
    px = _test_pixels()
    bad32 = _bad_bmp_32bpp(px)
    assert detect_image_format(bad32) == "bmp"  # sniff false-positive
    truncated = _bmp_bytes(px)[:-20]  # valid header, short pixel data
    assert detect_image_format(truncated) == "bmp"
    # tightened sniff: 'BM' + junk no longer sniffs as bmp at all
    assert detect_image_format(b"BM" + b"\x00" * 10) is None
    rows = [
        ("x32", "image", bad32, (8, 6, None, None, "image/bmp")),
        ("xtr", "image", truncated, (8, 6, None, None, "image/bmp")),
        ("ok", "image", _ppm_bytes(px), (8, 6, None, None, "image/x-ppm")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["ok"]["decoded"]
    assert not out["x32"]["decoded"] and not out["xtr"]["decoded"]
    assert out["x32"]["feature"] is not None and len(out["x32"]["feature"]) == 32
    strict = decode_and_featurize(df, on_unsupported="raise")
    with pytest.raises(Exception, match="BMP"):
        strict.collect()


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
