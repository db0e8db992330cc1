"""GIF codec: unlike JPEG, GIF is lossless for palette images, so the
round-trip contract is exact pixel equality — any LZW width-growth or
interlace-weave misalignment between encoder and decoder fails hard."""

from __future__ import annotations

import numpy as np
import pytest

from genome_deduplication_spark.operators.gif import decode_gif, encode_gif


def _palette_image(n_colors: int, h: int, w: int, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


def test_roundtrip_exact():
    for n, h, w in [(2, 9, 14), (7, 23, 31), (256, 40, 50)]:
        img = _palette_image(n, h, w)
        assert np.array_equal(decode_gif(encode_gif(img)), img), (n, h, w)


def test_roundtrip_interlaced():
    img = _palette_image(7, 23, 31)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_roundtrip_lzw_dictionary_overflow():
    # 150x150 random 8-bit image forces >4096 dictionary entries, so the
    # encoder emits a mid-stream clear and the decoder must resync
    img = _palette_image(256, 150, 150)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_rejects_corrupt():
    img = _palette_image(7, 9, 9)
    good = encode_gif(img)
    with pytest.raises(ValueError, match="missing header"):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(b"GIF89a")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:30])  # cut mid-palette
    with pytest.raises(ValueError, match="truncated GIF data sub-block"):
        decode_gif(good[:-10] + b"\x00\x3b")  # sub-block length overruns
    # well-formed container, LZW stream stops before the frame is full:
    # keep the structure but drop the final data sub-block entirely
    data_start = 13 + 3 * 8 + 10 + 1  # header+palette+descriptor+min_code
    ln = good[data_start]
    short = (
        good[: data_start + 1 + max(ln - 6, 1)]  # truncated LZW bytes
    )
    short = good[:data_start] + bytes([max(ln - 6, 1)]) + short[data_start + 1 :]
    with pytest.raises(ValueError, match="ended early|bad first GIF LZW"):
        decode_gif(short + b"\x00\x3b")
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(good[:13] + good[13 : 13 + 3 * 8] + b"\x3b")


def test_encoder_refuses_truecolor():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(img)
