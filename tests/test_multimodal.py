from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from genome_deduplication_spark.operators.gif import encode_gif
from genome_deduplication_spark.operators.jpeg import encode_jpeg
from genome_deduplication_spark.operators.video import encode_avi_mjpeg
from genome_deduplication_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_feature,
    decode_and_featurize,
    decode_audio,
    decode_image,
    detect_audio_format,
    detect_image_format,
    image_feature,
    media_exact_dup_clusters,
)


def _wav_bytes(
    samples: np.ndarray, rate: int, bits: int = 16, fmt: int = 1, channels: int = 1
) -> bytes:
    """Minimal RIFF/WAVE writer: PCM int (8/16/24/32) or IEEE float
    (32/64), n-channel interleaved — exercises every decoder branch."""
    frames = (
        np.repeat(samples[:, None], channels, axis=1).reshape(-1)
        if channels > 1
        else samples
    )
    if fmt == 1 and bits == 8:
        data = (np.clip(frames, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif fmt == 1 and bits == 16:
        data = (np.clip(frames, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == 1 and bits == 24:
        v = (np.clip(frames, -1, 1) * 8388607).astype(np.int32)
        b = np.zeros((len(v), 3), np.uint8)
        b[:, 0], b[:, 1], b[:, 2] = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
        data = b.tobytes()
    elif fmt == 1 and bits == 32:
        data = (np.clip(frames, -1, 1) * 2147483647).astype("<i4").tobytes()
    elif fmt == 3 and bits == 32:
        data = frames.astype("<f4").tobytes()
    elif fmt == 3 and bits == 64:
        data = frames.astype("<f8").tobytes()
    else:
        raise ValueError((fmt, bits))
    ba = channels * bits // 8
    fmtc = struct.pack("<HHIIHH", fmt, channels, rate, rate * ba, ba, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _test_signal() -> np.ndarray:
    rng = np.random.default_rng(3)
    t = np.arange(8000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t))
    return np.clip(sig, -0.99, 0.99).astype(np.float32)


def test_decode_wav_all_encodings_same_feature():
    """The same signal in six WAV encodings (8/16/24/32-bit PCM, 32/64-bit
    float) and a stereo layout decodes to (nearly) identical samples and an
    encoding-independent feature — the audio twin of the PPM==BMP==PNG
    image-feature equality."""
    sig = _test_signal()
    ref_x, ref_rate = decode_audio(_wav_bytes(sig, 16000, 16, 1))
    assert ref_rate == 16000 and len(ref_x) == len(sig)
    ref = audio_feature(ref_x, ref_rate)
    assert ref.shape == (32,)
    for bits, fmt in [(8, 1), (24, 1), (32, 1), (32, 3), (64, 3)]:
        w = _wav_bytes(sig, 16000, bits, fmt)
        assert detect_audio_format(w) == "wav"
        x, r = decode_audio(w)
        tol = 0.05 if bits == 8 else 1e-3  # 8-bit quantization is coarse
        assert np.abs(audio_feature(x, r) - ref).max() < tol, (bits, fmt)
    stereo, _ = decode_audio(_wav_bytes(sig, 16000, 16, 1, channels=2))
    assert np.abs(stereo - ref_x).max() < 1e-4


def test_decode_wav_rejects_corrupt_and_compressed():
    sig = _test_signal()
    good = _wav_bytes(sig, 16000, 16, 1)
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_audio(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_audio(good[:50])
    adpcm = bytearray(good)
    struct.pack_into("<H", adpcm, 20, 2)  # format_tag = ADPCM
    with pytest.raises(NotImplementedError, match="format_tag=2"):
        decode_audio(bytes(adpcm))
    with pytest.raises(NotImplementedError, match="unsupported audio"):
        decode_audio(b"\xff\xfbmp3 frame junk")
    assert detect_audio_format(b"RIFFxxxxAVI ") is None  # RIFF but not WAVE
    # empty data chunk: decodes to the zero-signal feature, not a crash
    empty = _wav_bytes(sig[:0], 16000, 16, 1)
    x, r = decode_audio(empty)
    assert len(x) == 0 and audio_feature(x, r).shape == (32,)


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
        decode_image(b"II*\x00" + b"\x00" * 32)  # TIFF: stubbed
    # truncated JPEG/GIF: sniff as decodable formats, fail with ValueError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 3)


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
    sig = _test_signal()
    rows = [
        ("p1", "image", _ppm_bytes(px), (8, 6, None, None, "image/x-ppm")),
        ("b1", "image", _bmp_bytes(px), (8, 6, None, None, "image/bmp")),
        ("j1", "image", encode_jpeg(px, 95), (8, 6, None, None, "image/jpeg")),
        ("g1", "image", encode_gif(px[:, :, :1] * np.ones(3, np.uint8)),
         (8, 6, None, None, "image/gif")),
        ("t1", "image", b"II*\x00" + b"\x00" * 32, (8, 6, None, None, "image/tiff")),
        ("w1", "audio", _wav_bytes(sig, 16000), (None, None, 16000, 500, "audio/wav")),
        ("v1", "video", encode_avi_mjpeg([encode_jpeg(px, 92)] * 3, 8, 6),
         (8, 6, None, 300, "video/x-msvideo")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["p1"]["decoded"] and out["b1"]["decoded"]
    assert out["j1"]["decoded"]  # real baseline-JPEG decode (lossy pixels)
    assert out["g1"]["decoded"]  # real GIF-LZW decode (lossless palette)
    assert out["w1"]["decoded"]  # real WAV decode through the Spark path
    assert out["v1"]["decoded"]  # real MJPEG-AVI sampled-frame decode
    assert np.allclose(
        out["w1"]["feature"],
        audio_feature(*decode_audio(_wav_bytes(sig, 16000))),
        atol=1e-6,
    )
    assert not out["t1"]["decoded"]  # fallback feature, flagged
    assert out["p1"]["feature"] == out["b1"]["feature"]  # format-independent
    # lossy codec: feature is close to the lossless one, not identical
    assert np.abs(
        np.array(out["j1"]["feature"]) - np.array(out["p1"]["feature"])
    ).max() < 0.12
    strict = decode_and_featurize(df, on_unsupported="raise")
    with pytest.raises(Exception, match="unsupported image format"):
        strict.collect()


def test_media_exact_dup(spark):
    df = _media(spark)
    out = {r["media_id"]: r["cluster_id"] for r in media_exact_dup_clusters(df).collect()}
    assert out["m1"] == out["m2"] == "m1"
    assert out["m3"] == "m3"


def test_decoders_never_leak_low_level_errors():
    """Untrusted-payload contract: for ANY bytes, every decoder either
    succeeds or raises ValueError/NotImplementedError — never IndexError/
    struct.error/KeyError/RecursionError, which would escape the fallback
    tier's catch and kill a Spark job. Seeded fuzz: random bytes behind
    each format's magic prefix, plus truncations and single-byte
    mutations of valid payloads."""
    from genome_deduplication_spark.operators.video import parse_avi

    rng = np.random.default_rng(99)
    px = _test_pixels()
    sig = _test_signal()
    valid = [
        _ppm_bytes(px), _bmp_bytes(px), _png_bytes(px),
        encode_jpeg(px, 90), encode_gif(px[:, :, :1] * np.ones(3, np.uint8)),
        _wav_bytes(sig, 16000),
        encode_avi_mjpeg([encode_jpeg(px, 90)] * 2, 8, 6),
    ]
    magics = [
        b"P6 ", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a",
        b"GIF87a", b"RIFF\x00\x01\x00\x00WAVE", b"RIFF\x00\x01\x00\x00AVI ",
    ]
    cases: list[bytes] = []
    for m in magics:
        for ln in (0, 4, 40, 400):
            cases.append(m + bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    for v in valid:
        for cut in (7, len(v) // 3, len(v) - 3):
            cases.append(v[:cut])
        for _ in range(20):
            mut = bytearray(v)
            i = int(rng.integers(0, len(v)))
            mut[i] = int(rng.integers(0, 256))
            cases.append(bytes(mut))
    # adversarial deeply-nested AVI LIST chain (recursion guard)
    deep = b"LIST" * 1  # built below: each level declares a huge size
    body = b"movi"
    for _ in range(3000):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"rec " + body
    cases.append(b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body)

    for payload in cases:
        for fn in (decode_image, decode_audio, parse_avi):
            try:
                fn(payload)
            except (ValueError, NotImplementedError):
                pass  # the contract
