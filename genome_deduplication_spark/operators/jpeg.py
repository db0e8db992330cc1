"""Baseline JPEG (JFIF) codec, stdlib + numpy only.

Closes the last raster-format gap in the multimodal decode tier
(reference treats every payload as opaque bytes; this package decodes
what can be decoded without codec libraries — see multimodal.py).

* :func:`decode_jpeg` — baseline sequential DCT JPEG (SOF0): marker walk,
  DQT/DHT/SOF0/SOS/DRI parse, entropy-coded scan with byte-stuffing and
  restart markers, per-MCU Huffman decode, dequantize + dezigzag +
  orthonormal IDCT (one 8x8 matrix sandwich per block), chroma upsample
  by sample-factor repeat, JFIF YCbCr -> RGB. Progressive (SOF2),
  arithmetic coding, and 12-bit precision raise NotImplementedError.
* :func:`encode_jpeg` — the matching baseline encoder (4:4:4, Annex K
  standard quantization + Huffman tables, quality scaling per the IJG
  convention). Exists so the decoder is testable without any codec
  library: decode(encode(img)) must approximate img to lossy tolerance.

Both ends are deliberately small-image oriented (training-data
thumbnails); the entropy scan is bit-serial python, fast enough for the
mapInPandas batch path where payloads are a few KB each. Dimension cap
mirrors the PNG zip-bomb guard.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_JPEG_PIXELS = 1 << 26  # same untrusted-payload cap as PNG

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: spatial = M.T @ coeffs @ M
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# ITU-T T.81 Annex K.1 — standard luminance / chrominance quant tables
_STD_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_STD_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_huff_decode(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol map per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length), inverse of :func:`_build_huff_decode`."""
    return {v: (c, l) for (l, c), v in _build_huff_decode(bits, huffval).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing
    removed by the caller; byte-aligns at restart boundaries."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, 3) uint8 RGB (grayscale JPEGs
    are replicated across channels). See module docstring for scope;
    unsupported modes raise NotImplementedError, corrupt data ValueError.

    Adversarial-bytes contract: the parser indexes into attacker-shaped
    structures (segment offsets, table ids, component maps), so any
    low-level slip on malformed input (struct.error, IndexError,
    KeyError) is normalized to ValueError here — the multimodal fallback
    tier catches exactly (NotImplementedError, ValueError)."""
    try:
        return _decode_jpeg_checked(payload)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt JPEG structure: {type(e).__name__} {e}") from e


def _decode_jpeg_checked(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (height, width, [(cid, h, v, tq)])
    restart_interval = 0
    scan = None

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so payload[pos + 1] is the marker code
        # (without this, 'FF FF DB' read marker=0xFF and fell into the
        # segment branch, unpacking a garbage length)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[off : off + 64], np.uint8).astype(np.int64)
                    off += 64
                else:
                    tbl = np.frombuffer(seg[off : off + 128], ">u2").astype(np.int64)
                    off += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = [0] + list(seg[off + 1 : off + 17])
                cnt = sum(bits)
                vals = list(seg[off + 17 : off + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff_decode(bits, vals)
                off += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            if width * height > _MAX_JPEG_PIXELS:
                raise ValueError(
                    f"implausible JPEG dimensions {width}x{height} "
                    f"(cap {_MAX_JPEG_PIXELS} pixels)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (height, width, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X} — "
                "progressive/arithmetic/hierarchical) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = struct.unpack_from(">BB", seg, 1 + 2 * c)
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            # collect entropy-coded bytes, un-stuffing 0xFF00 and dropping
            # restart markers (the reader re-aligns per restart interval)
            p = pos + seglen
            out = bytearray()
            rst_positions = []
            while p < n - 1:
                b = payload[p]
                if b == 0xFF:
                    m = payload[p + 1]
                    if m == 0x00:
                        out.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        rst_positions.append(len(out))
                        p += 2
                        continue
                    break  # next real marker (EOI or another segment)
                out.append(b)
                p += 1
            scan = (scan_comps, bytes(out), rst_positions)
            pos = p
            continue
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    height, width, comps = frame
    scan_comps, data, rst_positions = scan
    if len(scan_comps) != len(comps):
        raise NotImplementedError("multi-scan JPEG unsupported")

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # per-component decoded planes at component resolution
    planes = {}
    for cid, h, v, _tq in comps:
        planes[cid] = np.zeros((mcus_y * v * 8, mcus_x * h * 8), np.float64)

    table_for = {cs: (td, ta) for cs, td, ta in scan_comps}
    reader = _BitReader(data)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, h, v, tq in comps:
                td, ta = table_for[cid]
                dct, act = huff_dc[td], huff_ac[ta]
                q = qt[tq]  # DQT is already in zigzag (scan) order
                for by in range(v):
                    for bx in range(h):
                        coeffs = np.zeros(64, np.int64)
                        t = _decode_huff(reader, dct)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        coeffs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_ZIGZAG] = coeffs * q
                        spatial = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample to full resolution, crop, level shift
    full = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width] + 128.0)
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.dstack([g, g, g])
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255)


def _pad_plane(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (bh*8, bw*8) and level-shift."""
    h, w = plane.shape
    p = np.empty((bh * 8, bw * 8))
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p - 128.0


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    sampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes, Annex K standard
    tables scaled by ``quality``. ``sampling`` is '444' or '420' (2x2
    luma / block-mean chroma), ``grayscale`` emits a 1-component scan,
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. Built for decoder testability (see module docstring); output is
    valid baseline JPEG readable by any conformant decoder."""
    if sampling not in ("444", "420"):
        raise ValueError(f"sampling={sampling!r}")
    h, w, _ = pixels.shape
    px = pixels.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = -0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2] + 128
    cr = 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2] + 128
    qly = _quality_scale(_STD_QT_LUMA, quality)
    qlc = _quality_scale(_STD_QT_CHROMA, quality)
    enc_dc = [_build_huff_encode(*_STD_DC_LUMA), _build_huff_encode(*_STD_DC_CHROMA)]
    enc_ac = [_build_huff_encode(*_STD_AC_LUMA), _build_huff_encode(*_STD_AC_CHROMA)]

    lhv = (2, 2) if sampling == "420" and not grayscale else (1, 1)
    if grayscale:
        comps = [(1, 1, 1, 0)]  # (cid, h, v, tq)
    else:
        comps = [(1, lhv[0], lhv[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # component planes at component resolution, padded to the MCU grid
    if hmax == 2:  # downsample chroma by 2x2 block mean over padded extents
        ph, pw = mcus_y * 16, mcus_x * 16
        ypad = _pad_plane(y, mcus_y * 2, mcus_x * 2)

        def half(p):
            full = _pad_plane(p, mcus_y * 2, mcus_x * 2)
            return full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

        planes = [ypad] if grayscale else [ypad, half(cb), half(cr)]
    else:
        planes = [
            _pad_plane(p, mcus_y, mcus_x)
            for p in ((y,) if grayscale else (y, cb, cr))
        ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + qly[_ZIGZAG].astype(np.uint8).tobytes())
    if not grayscale:
        out += seg(0xDB, bytes([0x01]) + qlc[_ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, ch << 4 | cv, tq])
    out += seg(0xC0, sof)
    for tc, tables in ((0, (_STD_DC_LUMA, _STD_DC_CHROMA)),
                       (1, (_STD_AC_LUMA, _STD_AC_CHROMA))):
        for th, (bits, vals) in enumerate(tables[: 1 if grayscale else 2]):
            out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits[1:]) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i, (cid, *_rest) in enumerate(comps):
        ti = 0 if i == 0 else 1
        sos += bytes([cid, ti << 4 | ti])
    out += seg(0xDA, sos + bytes([0, 63, 0]))

    def magnitude(v: int) -> int:
        return int(abs(v)).bit_length()

    bw = _BitWriter()
    pred = [0] * len(comps)

    def emit_block(ci: int, block: np.ndarray) -> None:
        ti = 0 if ci == 0 else 1
        qz = (qly if ci == 0 else qlc)[_ZIGZAG]  # scan-order divisors
        coeffs = _DCT_M @ block @ _DCT_M.T
        zz = np.round(coeffs.reshape(-1)[_ZIGZAG] / qz).astype(int)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = magnitude(diff)
        code, ln = enc_dc[ti][t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ti][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = magnitude(v)
            code, ln = enc_ac[ti][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = enc_ac[ti][0x00]  # EOB
            bw.write(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
            for ci, (_cid, ch, cv, _tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        emit_block(ci, planes[ci][y0 : y0 + 8, x0 : x0 + 8])
            mcu_count += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
