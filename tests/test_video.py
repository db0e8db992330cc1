"""MJPEG-in-AVI: container walk + sampled-frame JPEG decode. The AVI
writer exists for testability (same pattern as jpeg.py/gif.py); frames
round-trip through the real JPEG codec so pixel tolerance is lossy."""

from __future__ import annotations

import numpy as np
import pytest

from genome_deduplication_spark.operators.jpeg import encode_jpeg
from genome_deduplication_spark.operators.video import (
    decode_video_frames,
    detect_video_format,
    encode_avi_mjpeg,
    parse_avi,
    video_feature,
)


def _frames(n: int, h: int = 24, w: int = 32) -> list[np.ndarray]:
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.dstack(
            [(xx * 8 + t * 16) % 256, (yy * 10) % 256, ((xx + yy) * 4 + t * 8) % 256]
        ).astype(np.uint8)
        for t in range(n)
    ]


def _avi(n: int = 12, **kw) -> tuple[bytes, list[np.ndarray]]:
    px = _frames(n)
    return encode_avi_mjpeg([encode_jpeg(f, 92) for f in px], 32, 24, **kw), px


def test_parse_and_sampled_decode():
    avi, px = _avi(12)
    assert detect_video_format(avi) == "avi"
    meta = parse_avi(avi)
    assert (meta["n_frames"], meta["width"], meta["height"]) == (12, 32, 24)
    frames, _ = decode_video_frames(avi, max_frames=5)
    assert len(frames) == 5 and frames[0].shape == (24, 32, 3)
    # first/last sampled frames match first/last source frames (lossy)
    for got, want in [(frames[0], px[0]), (frames[-1], px[-1])]:
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 3
    # fewer frames than the cap: every frame decoded once
    short, _ = _avi(3)
    assert len(decode_video_frames(short, max_frames=8)[0]) == 3


def test_feature_deterministic_and_motion_sensitive():
    avi, _ = _avi(12)
    f1 = video_feature(*decode_video_frames(avi, max_frames=5))
    f2 = video_feature(*decode_video_frames(avi, max_frames=5))
    assert f1.shape == (32,) and np.array_equal(f1, f2)
    assert (f1[24:29] > 0).any()  # moving content -> nonzero luma deltas
    # a static video (same frame repeated) has zero motion components
    static = encode_avi_mjpeg([encode_jpeg(_frames(1)[0], 92)] * 6, 32, 24)
    fs = video_feature(*decode_video_frames(static, max_frames=5))
    assert not (fs[24:29] > 0).any()


def test_rejects_non_mjpeg_and_corrupt():
    avi, _ = _avi(2)
    with pytest.raises(ValueError, match="not MJPEG"):
        decode_video_frames(encode_avi_mjpeg([b"not a jpeg frame"], 32, 24))
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(avi[:40])
    with pytest.raises(NotImplementedError, match="unsupported video"):
        parse_avi(b"RIFFxxxxWAVEdata")  # a WAV is not a video
    with pytest.raises(NotImplementedError):
        parse_avi(b"\x00\x00\x00\x20ftypmp42")  # MP4: codec absent
