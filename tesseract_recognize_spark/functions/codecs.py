"""Pure-stdlib raster codecs beyond PNG: binary PPM/PGM (P6/P5) and
uncompressed BMP, plus container sniffing.

The reference decodes any raster Leptonica knows via `pixRead`
(tesseract-recognize.cc:513-531); this container ships no image
libraries, so the formats that ARE stdlib-decodable get real decoders
(PNG in functions/png.py; baseline-sequential JPEG in
functions/jpeg.py; netpbm, BI_RGB BMP and uncompressed baseline TIFF
here, from the public netpbm man pages, the Windows BMP file-format
spec and the TIFF 6.0 specification) and everything else (progressive
JPEG, TIFF-with-compression, ...) stays behind the injectable-codec
seam in operators/multimodal.py.

All decoders raise ValueError on malformed or unsupported input — never
struct.error/IndexError — so the quarantine path upstream can key on one
exception type.
"""

from __future__ import annotations

import struct

import numpy as np

from tesseract_recognize_spark.functions.png import PNG_SIGNATURE, png_decode

__all__ = [
    "ppm_decode",
    "ppm_encode",
    "bmp_decode",
    "bmp_encode",
    "tiff_decode",
    "tiff_encode",
    "sniff_mime",
    "decode_image",
]


def _pnm_tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integers starting at pos,
    skipping '#' comments (netpbm header grammar)."""
    out: list[int] = []
    ln = len(data)
    while len(out) < n:
        while pos < ln and data[pos : pos + 1].isspace():
            pos += 1
        if pos < ln and data[pos] == 0x23:  # '#' comment to end of line
            while pos < ln and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < ln and data[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed netpbm header")
        out.append(int(data[start:pos]))
    return out, pos


def ppm_decode(data: bytes) -> np.ndarray:
    """Binary netpbm bytes → uint8 ndarray: P5 (graymap) → (h, w),
    P6 (pixmap) → (h, w, 3). maxval must be ≤ 255."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm stream (want P5/P6)")
    nch = 1 if magic == b"P5" else 3
    (w, h, maxval), pos = _pnm_tokens(data, 3, 2)
    if w == 0 or h == 0:
        # digit-only header tokens admit 0; a (h, 0) raster decodes
        # "successfully" and then poisons downstream pooling with NaNs —
        # reject here so it quarantines like every other malformed raster
        raise ValueError(f"bad netpbm dimensions {w}x{h}")
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    pos += 1  # exactly one whitespace byte after maxval, then raster
    need = w * h * nch
    body = data[pos : pos + need]
    if len(body) != need:
        raise ValueError("netpbm raster truncated")
    arr = np.frombuffer(body, dtype=np.uint8)
    return arr.reshape(h, w) if nch == 1 else arr.reshape(h, w, 3)


def ppm_encode(img: np.ndarray) -> bytes:
    """uint8 (h, w) → P5, (h, w, 3) → P6."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        magic, (h, w) = b"P5", arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic, (h, w) = b"P6", arr.shape[:2]
    else:
        raise ValueError("ppm_encode wants (h,w) gray or (h,w,3) RGB")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) BMP bytes → uint8 ndarray.

    Supports 8-bit palette (expanded to RGB), 24-bit BGR → (h, w, 3) RGB
    and 32-bit BGRA → (h, w, 4) RGBA; bottom-up (positive height) and
    top-down (negative height) row order; 4-byte row padding."""
    try:
        if data[:2] != b"BM":
            raise ValueError("not a BMP stream (bad magic)")
        (data_off,) = struct.unpack("<I", data[10:14])
        (hdr_size,) = struct.unpack("<I", data[14:18])
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP header size {hdr_size}")
        w, h_signed = struct.unpack("<ii", data[18:26])
        planes, bpp = struct.unpack("<HH", data[26:30])
        (compression,) = struct.unpack("<I", data[30:34])
        if compression != 0:
            raise ValueError(f"unsupported BMP compression {compression}")
        if bpp not in (8, 24, 32):
            raise ValueError(f"unsupported BMP bit depth {bpp}")
        if w <= 0 or h_signed == 0:
            raise ValueError("bad BMP dimensions")
        top_down = h_signed < 0
        h = abs(h_signed)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        need = stride * h
        body = data[data_off : data_off + need]
        if len(body) != need:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        if bpp == 8:
            (n_colors,) = struct.unpack("<I", data[46:50])
            n_colors = n_colors or 256
            pal_raw = data[14 + hdr_size : 14 + hdr_size + 4 * n_colors]
            if len(pal_raw) != 4 * n_colors:
                raise ValueError("BMP palette truncated")
            pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(-1, 4)
            idx = px.reshape(h, w)
            if idx.max(initial=0) >= n_colors:
                raise ValueError("BMP palette index out of range")
            return pal[idx][:, :, [2, 1, 0]]  # BGRX → RGB
        if bpp == 24:
            return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR → RGB
        return np.ascontiguousarray(px[:, :, [2, 1, 0, 3]])  # BGRA → RGBA
    except struct.error as e:
        raise ValueError(f"malformed BMP header: {e}") from e


def bmp_encode(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit BI_RGB bottom-up BMP (tests/fixtures)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("bmp_encode wants (h,w,3) RGB")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    bgr = arr[::-1][:, :, [2, 1, 0]]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0,
                           14 + 40)
    return file_hdr + info + body


# TIFF 6.0 baseline, uncompressed: tag ids this decoder consumes
_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts",
}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _tiff_values(data, endian, vtype, count, raw) -> list[int]:
    size = _TIFF_TYPE_SIZE.get(vtype)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {vtype}")
    fmt = {1: "B", 3: "H", 4: "I"}[vtype]
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        buf = data[off : off + total]
        if len(buf) != total:
            raise ValueError("TIFF value block truncated")
    return list(struct.unpack(f"{endian}{count}{fmt}", buf))


def tiff_decode(data: bytes) -> np.ndarray:
    """Uncompressed baseline TIFF bytes → uint8 ndarray: (h, w) gray or
    (h, w, spp). Both byte orders; strips concatenated; photometric 0
    (WhiteIsZero) inverted to the usual BlackIsZero convention, as
    Leptonica's read path does. Compressed TIFF raises ValueError (needs
    an injected codec)."""
    try:
        if data[:4] == b"II*\x00":
            endian = "<"
        elif data[:4] == b"MM\x00*":
            endian = ">"
        else:
            raise ValueError("not a TIFF stream (bad byte-order mark)")
        (ifd_off,) = struct.unpack(endian + "I", data[4:8])
        if ifd_off + 2 > len(data):
            raise ValueError("TIFF IFD offset out of range")
        (n_entries,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
        tags: dict[str, list[int]] = {}
        for i in range(n_entries):
            e = ifd_off + 2 + 12 * i
            if e + 12 > len(data):
                raise ValueError("TIFF IFD truncated")
            tag, vtype, count = struct.unpack(endian + "HHI", data[e : e + 8])
            name = _TIFF_TAGS.get(tag)
            if name:
                tags[name] = _tiff_values(
                    data, endian, vtype, count, data[e + 8 : e + 12]
                )
        for req in ("width", "height", "strip_offsets", "strip_counts"):
            if req not in tags:
                raise ValueError(f"TIFF missing required tag {req}")
        comp = tags.get("compression", [1])[0]
        if comp != 1:
            raise ValueError(
                f"unsupported TIFF compression {comp} (only uncompressed; "
                "inject a codec for LZW/JPEG/deflate)"
            )
        w, h = tags["width"][0], tags["height"][0]
        if w == 0 or h == 0:
            raise ValueError(f"bad TIFF dimensions {w}x{h}")
        spp = tags.get("spp", [1])[0]
        bits = tags.get("bits", [8])
        if any(b != 8 for b in bits):
            raise ValueError(f"unsupported TIFF bits-per-sample {bits}")
        photometric = tags.get("photometric", [1])[0]
        if photometric not in (0, 1, 2):
            raise ValueError(f"unsupported TIFF photometric {photometric}")
        raster = bytearray()
        for off, cnt in zip(tags["strip_offsets"], tags["strip_counts"]):
            chunk = data[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF strip truncated")
            raster += chunk
        need = w * h * spp
        if len(raster) < need:
            raise ValueError("TIFF raster data truncated")
        arr = np.frombuffer(bytes(raster[:need]), dtype=np.uint8)
        img = arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, spp)
        if photometric == 0:
            img = 255 - img
        return img
    except struct.error as e:
        raise ValueError(f"malformed TIFF stream: {e}") from e


def tiff_encode(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → little-endian uncompressed
    single-strip baseline TIFF (tests/fixtures)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, spp, photometric = *arr.shape, 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, spp, photometric = *arr.shape[:2], 3, 2
    else:
        raise ValueError("tiff_encode wants (h,w) gray or (h,w,3) RGB")
    body = arr.tobytes()
    # layout: header(8) | IFD | bits values (if rgb) | strip data
    entries = []  # (tag, type, count, value)
    n_entries = 8
    ifd_size = 2 + 12 * n_entries + 4
    bits_off = 8 + ifd_size
    bits_extra = 2 * 3 if spp == 3 else 0
    strip_off = bits_off + bits_extra
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, bits_off if spp == 3 else 8),
        (259, 3, 1, 1),
        (262, 3, 1, photometric),
        (273, 4, 1, strip_off),
        (277, 3, 1, spp),
        (279, 4, 1, len(body)),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n_entries)
    for tag, vtype, count, value in entries:
        out += struct.pack("<HHI", tag, vtype, count)
        out += struct.pack("<I", value) if vtype == 4 else struct.pack(
            "<HH", value, 0
        )
    out += struct.pack("<I", 0)  # next-IFD terminator
    if spp == 3:
        out += struct.pack("<3H", 8, 8, 8)
    out += body
    return bytes(out)


def sniff_mime(payload: bytes) -> str | None:
    """Container detection by magic bytes; None when unrecognized."""
    if payload[:8] == PNG_SIGNATURE:
        return "image/png"
    if payload[:2] == b"P5":
        return "image/x-portable-graymap"
    if payload[:2] == b"P6":
        return "image/x-portable-pixmap"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/x-wav"
    if payload[:4] == b"IMG1":
        return "image/x-synthetic"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Default codec chain: PNG → netpbm → BMP → uncompressed TIFF →
    baseline JPEG; ValueError otherwise (progressive JPEG, compressed
    TIFF, ... need an injected codec in this container)."""
    mime = sniff_mime(payload)
    if mime == "image/png":
        return png_decode(payload)
    if mime in ("image/x-portable-graymap", "image/x-portable-pixmap"):
        return ppm_decode(payload)
    if mime == "image/bmp":
        return bmp_decode(payload)
    if mime == "image/tiff":
        return tiff_decode(payload)
    if mime == "image/jpeg":
        from tesseract_recognize_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(payload)
    raise ValueError(
        "no stdlib codec for payload (supported: PNG, binary PPM/PGM, "
        "uncompressed BMP, uncompressed TIFF, baseline JPEG); inject one "
        "(e.g. PIL.Image.open) or use fake_codec"
    )
