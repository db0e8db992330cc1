"""GIF87a/89a decoder (+ test-grade encoder), stdlib + numpy only.

Same pattern as jpeg.py: the decoder makes GIF payloads real pixels in
the multimodal decode tier; the encoder exists so the decoder is
testable without any codec library (round-trip must be pixel-exact —
GIF is lossless for palette images).

* :func:`decode_gif` — header + logical screen descriptor, global/local
  color tables, extension-block skip, LZW decompression of the first
  image frame (LSB-first code packing, clear/EOI codes, 12-bit
  dictionary cap), interlace de-weaving, palette -> (H, W, 3) uint8 RGB.
  Animated GIFs decode their first frame (the thumbnail/dedup-relevant
  one). Transparency is ignored (the transparent index keeps its palette
  color) — features must not depend on compositing context.
* :func:`encode_gif` — real LZW compression (dictionary growth + clear
  on overflow) over a single full-frame image with a global palette.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_GIF_PIXELS = 1 << 26  # same untrusted-payload cap as PNG/JPEG


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF -> (H, W, 3) uint8 RGB. ValueError on corrupt
    or truncated data; NotImplementedError never — every GIF variant is
    either decodable or malformed (LZW is the only codec GIF has).
    Low-level slips on adversarial bytes (struct.error, IndexError) are
    normalized to ValueError, matching the fallback tier's catch."""
    try:
        return _decode_gif_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF structure: {type(e).__name__} {e}") from e


def _decode_gif_checked(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing header)")
    if len(payload) < 13:
        raise ValueError("truncated GIF screen descriptor")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if sw == 0 or sh == 0 or sw * sh > _MAX_GIF_PIXELS:
        raise ValueError(f"implausible GIF dimensions {sw}x{sh}")
    pos = 13
    global_pal: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        pal = payload[pos : pos + 3 * n]
        if len(pal) != 3 * n:
            raise ValueError("truncated GIF global color table")
        global_pal = np.frombuffer(pal, np.uint8).reshape(n, 3)
        pos += 3 * n

    npay = len(payload)
    while pos < npay:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < npay and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        if pos + 9 > npay:
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or w * h > _MAX_GIF_PIXELS:
            raise ValueError(f"implausible GIF frame {w}x{h}")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            raw = payload[pos : pos + 3 * n]
            if len(raw) != 3 * n:
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(raw, np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= npay:
            raise ValueError("truncated GIF image data")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while pos < npay and payload[pos] != 0:
            ln = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("truncated GIF data sub-block")
            chunks.append(chunk)
            pos += 1 + ln
        pos += 1  # terminator
        indices = _lzw_decode(b"".join(chunks), min_code_size, w * h)
        frame = pal[np.clip(indices, 0, len(pal) - 1)].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: 4-pass row weave
            out = np.empty_like(frame)
            rows = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out[rows] = frame
            frame = out
        # first frame only; composite onto the logical screen if smaller
        if (left, top, w, h) != (0, 0, sw, sh):
            screen = np.zeros((sh, sw, 3), np.uint8)
            screen[top : top + h, left : left + w] = frame[: sh - top, : sw - left]
            return screen
        return frame
    raise ValueError("GIF contains no image frame")


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first code stream, dynamic code width from
    min_code_size+1 up to 12 bits, clear + end-of-information codes."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = np.empty(expect, np.uint8)
    nout = 0
    # dictionary as bytes (entries are short for typical images)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if nout != expect:
                    raise ValueError(
                        f"GIF LZW ended early ({nout}/{expect} pixels)"
                    )
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first GIF LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            if nout + len(entry) > expect:
                raise ValueError("GIF LZW produced too many pixels")
            out[nout : nout + len(entry)] = np.frombuffer(entry, np.uint8)
            nout += len(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    if nout != expect:
        raise ValueError(f"GIF LZW ended early ({nout}/{expect} pixels)")
    return out


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB with <= 256 distinct colors -> GIF89a bytes
    (global palette, single frame, real LZW). Raises ValueError if the
    image needs quantization — this encoder exists for decoder tests and
    deliberately does no lossy palette reduction."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors; palette GIF needs <= 256")
    # palette size = power of two >= max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(colors)] = colors
    min_code_size = max(2, bits)

    idx = indices.reshape(h, w).astype(np.uint8)
    if interlace:
        rows = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[rows]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    lzw = _lzw_encode(idx.reshape(-1).tobytes(), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # widen AFTER emitting, mirroring the decoder's growth rule
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)
