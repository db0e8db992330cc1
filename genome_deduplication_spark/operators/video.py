"""AVI (RIFF) container parsing + MJPEG video decode, stdlib + numpy only.

Completes the multimodal triad: images (ppm/bmp/png/jpeg/gif), audio
(wav), and now video — MJPEG-in-AVI, the one video format decodable
without codec libraries because every frame is a baseline JPEG
(decoded by jpeg.py). Same encoder-for-testability pattern as
jpeg.py/gif.py.

* :func:`parse_avi` — RIFF/LIST walk: 'avih' main header (frame period,
  count, dimensions) + the 'movi' list's '..dc'/'..db' frame chunks as
  (offset, size) spans. No frame bytes are copied until a frame is
  actually sampled.
* :func:`decode_video_frames` — deterministic frame sampling (every
  k-th frame, capped) + per-frame :func:`~.jpeg.decode_jpeg`.
* :func:`video_feature` — mean of sampled frames' image features +
  temporal luma deltas; two videos with identical sampled content get
  identical features regardless of container chunk layout.
"""

from __future__ import annotations

import struct

import numpy as np

from genome_deduplication_spark.operators.jpeg import decode_jpeg

_MAX_AVI_FRAMES = 1 << 20  # header-declared cap for untrusted payloads


def detect_video_format(payload: bytes) -> str | None:
    """'avi' for RIFF containers with the AVI form type, else None."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


def parse_avi(payload: bytes) -> dict:
    """AVI container -> {'width', 'height', 'n_frames', 'frame_us',
    'frames': [(offset, size), ...]} without copying frame bytes.

    Walks RIFF LIST trees for the 'hdrl' (avih) and 'movi' (frame data)
    lists; frame chunks are any '##dc'/'##db' (compressed / DIB) entries
    in stream order. ValueError on corrupt/truncated structure — including
    adversarial deeply-nested LIST chains, whose RecursionError is
    normalized to ValueError so the fallback tier's catch holds."""
    try:
        return _parse_avi_checked(payload)
    except (struct.error, IndexError, RecursionError) as e:
        raise ValueError(f"corrupt AVI structure: {type(e).__name__} {e}") from e


def _parse_avi_checked(payload: bytes) -> dict:
    if detect_video_format(payload) != "avi":
        raise NotImplementedError(
            "unsupported video container (stdlib decoder handles MJPEG-in-AVI)"
        )
    n = len(payload)
    avih = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal avih
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                if ltype in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                avih = payload[body_start : body_start + size]
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append((body_start, size))
            pos = body_start + size + (size & 1)  # word-aligned

    walk(12, n)
    if avih is None or len(avih) < 40:
        raise ValueError("AVI missing avih header")
    frame_us, _rate, _pad, _flags, total = struct.unpack_from("<IIIII", avih, 0)
    width, height = struct.unpack_from("<II", avih, 32)
    if total > _MAX_AVI_FRAMES or len(frames) > _MAX_AVI_FRAMES:
        raise ValueError(f"implausible AVI frame count {max(total, len(frames))}")
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": len(frames),
        "frame_us": int(frame_us),
        "frames": frames,
    }


def decode_video_frames(
    payload: bytes, max_frames: int = 8
) -> tuple[list[np.ndarray], dict]:
    """Sample up to ``max_frames`` frames evenly across the video and
    decode each as baseline JPEG -> list of (H, W, 3) uint8 arrays + the
    container meta. Raises ValueError if a sampled frame isn't a JPEG
    (i.e. the AVI is not MJPEG — the one codec decodable here)."""
    meta = parse_avi(payload)
    spans = meta["frames"]
    if not spans:
        return [], meta
    idx = np.unique(
        np.linspace(0, len(spans) - 1, num=min(max_frames, len(spans)))
        .round()
        .astype(np.int64)
    )
    out = []
    for i in idx:
        off, size = spans[i]
        frame = payload[off : off + size]
        if frame[:3] != b"\xff\xd8\xff":
            raise ValueError(
                f"AVI frame {i} is not MJPEG (no JPEG SOI); other video "
                "codecs need libraries absent in this container"
            )
        out.append(decode_jpeg(frame))
    return out, meta


def video_feature(frames: list[np.ndarray], meta: dict, dim: int = 32) -> np.ndarray:
    """``dim`` floats from sampled frames: [0:16] mean of per-frame
    grayscale 16-bin histograms, [16:24] mean 2x4 pooled-luma grid,
    [24:29] inter-frame mean-abs luma deltas (motion proxy, padded),
    [29:32] log frame count / duration sec / pixel count."""
    out = np.zeros(dim, dtype=np.float32)
    out[29] = np.log1p(np.float32(meta["n_frames"]))
    out[30] = np.log1p(
        np.float32(meta["n_frames"] * meta["frame_us"] / 1e6)
    )
    out[31] = np.log1p(np.float32(meta["width"] * meta["height"]))
    if not frames:
        return out
    hists = []
    grids = []
    lumas = []
    for f in frames:
        gray = f.astype(np.float32).mean(axis=2)
        h = np.histogram(gray, bins=16, range=(0.0, 256.0))[0].astype(np.float32)
        hists.append(h / max(float(h.sum()), 1.0))
        hh, ww = gray.shape
        ys = np.linspace(0, hh, 3).astype(int)
        xs = np.linspace(0, ww, 5).astype(int)
        grids.append(
            np.array(
                [
                    gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                         xs[j] : max(xs[j + 1], xs[j] + 1)].mean() / 255.0
                    for i in range(2)
                    for j in range(4)
                ],
                dtype=np.float32,
            )
        )
        lumas.append(float(gray.mean()))
    out[0:16] = np.mean(hists, axis=0)
    out[16:24] = np.mean(grids, axis=0)
    deltas = np.abs(np.diff(lumas)) / 255.0
    out[24:29] = np.pad(deltas[:5].astype(np.float32), (0, max(0, 5 - len(deltas))))
    return out


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal valid MJPEG AVI writer (RIFF/hdrl/strl/movi) for decoder
    tests: each entry of ``jpeg_frames`` becomes one '00dc' chunk."""
    frame_us = 1_000_000 // max(fps, 1)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII",
        frame_us, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0, width, height,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpeg_frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
