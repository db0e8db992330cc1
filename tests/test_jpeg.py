"""Baseline JPEG codec: the decoder is tested against the package's own
standard-table encoder (no codec library exists in this container to
cross-check against, so correctness evidence is (a) round-trip error
bounded by quantization, (b) both ends implement the public T.81 spec
independently enough that an indexing/bit error on either side breaks
the round-trip catastrophically, not subtly)."""

from __future__ import annotations

import numpy as np
import pytest

from genome_deduplication_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ]
    ).astype(np.uint8)


def test_roundtrip_444_quality_ladder():
    img = _gradient(24, 33)  # non-multiple-of-8 on one axis
    for q, tol in [(95, 1.0), (90, 1.2), (75, 2.5)]:
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        d = np.abs(out.astype(int) - img.astype(int))
        assert d.mean() < tol, (q, d.mean())
    # flat block survives exactly (DC-only, quantization exact)
    flat = np.full((16, 16, 3), 137, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)


def test_roundtrip_420_subsampling_and_partial_mcus():
    img = _gradient(19, 21)  # partial 16x16 MCUs on both axes
    out = decode_jpeg(encode_jpeg(img, 90, sampling="420"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_roundtrip_restart_markers():
    img = _gradient(24, 33)
    base = decode_jpeg(encode_jpeg(img, 90))
    for sampling, dri in [("444", 3), ("420", 2), ("444", 1)]:
        out = decode_jpeg(
            encode_jpeg(img, 90, sampling=sampling, restart_interval=dri)
        )
        assert out.shape == img.shape
        # 444 with DRI must be bit-identical to 444 without: restarts only
        # repartition the entropy stream, they do not change coefficients
        if sampling == "444":
            assert np.array_equal(out, base)


def test_roundtrip_grayscale():
    img = _gradient(24, 17)
    out = decode_jpeg(encode_jpeg(img, 90, grayscale=True))
    yref = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert np.abs(out[:, :, 0].astype(float) - yref).mean() < 2


def test_noise_image_bounded_error():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, 98))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 8


def test_rejects_progressive_and_corrupt():
    img = _gradient(16, 16)
    good = bytearray(encode_jpeg(img, 90))
    # rewrite the SOF0 marker (FFC0) to SOF2 (progressive)
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(good))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")  # truncated APP0
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # entropy stream cut mid-scan
    full = encode_jpeg(img, 90)
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) - 40] + b"\xff\xd9")


def test_dimension_cap():
    img = _gradient(16, 16)
    raw = bytearray(encode_jpeg(img, 90))
    i = bytes(raw).index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) H(2) W(2) — declare a 65k x 65k image
    raw[i + 5 : i + 9] = (0xFFFF).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(raw))


def test_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad the space
    before a marker. Identical pixels encoded with and without pad bytes
    must decode identically (the old walk read marker=0xFF and raised on
    a garbage segment length, so padded-but-valid files fell to the
    byte-fallback feature and never deduped against their unpadded twin).
    """
    img = _gradient(16, 16)
    raw = encode_jpeg(img, 90)
    base = decode_jpeg(raw)
    # inject fill bytes before the first DQT (FF DB) and before EOI (FF D9)
    padded = bytearray(raw)
    eoi = padded.rindex(b"\xff\xd9")
    padded[eoi:eoi] = b"\xff" * 3
    dqt = padded.index(b"\xff\xdb")
    padded[dqt:dqt] = b"\xff" * 2
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)
