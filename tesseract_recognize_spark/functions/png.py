"""Pure-stdlib PNG codec (zlib + numpy): the engine's `pixRead` analog.

The reference decodes real rasters via Leptonica
(tesseract-recognize.cc:513-531, `pixRead`); this container ships no image
libraries, so the codec is implemented from the public PNG specification
(W3C PNG, RFC 2083): signature, IHDR/PLTE/IDAT/IEND chunk walk, zlib
inflate, and per-scanline unfiltering (None/Sub/Up/Average/Paeth).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), interlace 0. That covers every PNG the engine's
synthetic corpus and tests produce, plus standard tooling output.
tRNS-based palette alpha is ignored (opaque decode), as Leptonica's
default read path effectively does for our purposes.

`png_encode` writes filter-0 scanlines — enough to round-trip any ndarray
through a spec-compliant decoder; decode-side unfiltering of types 1-4 is
exercised by hand-built streams in tests/test_png.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["png_decode", "png_encode", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray: (h, w) for grayscale, (h, w, c) else.

    Palette images are expanded to RGB. Raises ValueError on anything
    outside the supported profile (bit depth != 8, interlaced) AND on any
    malformed stream (truncated IHDR, bad zlib data, out-of-range palette
    indices) — struct/zlib/numpy errors are normalized so the quarantine
    path upstream can key on one exception type.
    """
    try:
        return _png_decode(data)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"malformed PNG stream: {e}") from e


def _png_decode(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG byte stream (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch (truncated?)")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch  # bytes per pixel at depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(
            raw[off + 1 : off + 1 + stride], dtype=np.uint8
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 1:  # Sub — sequential along the row
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
        out[y] = line
        prev = out[y]
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        return palette[out.reshape(height, width)]
    if nch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, nch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """uint8 ndarray — (h, w), (h, w, 1), (h, w, 2), (h, w, 3) or
    (h, w, 4) — → PNG bytes (filter 0, one IDAT chunk)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * c
    flat = arr.reshape(h, stride)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
