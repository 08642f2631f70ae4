"""Pure-stdlib raster codecs beyond PNG: binary PPM/PGM (P6/P5) and
uncompressed BMP, plus container sniffing.

The reference decodes any raster Leptonica knows via `pixRead`
(tesseract-recognize.cc:513-531); this container ships no image
libraries, so the formats that ARE stdlib-decodable get real decoders
(PNG in functions/png.py; baseline-sequential JPEG in
functions/jpeg.py; netpbm, BI_RGB BMP and baseline TIFF — uncompressed,
LZW, deflate and PackBits strips, horizontal predictor — here, from the
public netpbm man pages, the Windows BMP file-format spec and the TIFF
6.0 specification §13/§9) and everything else (progressive JPEG, JBIG,
CCITT-fax TIFF, ...) stays behind the injectable-codec seam in
operators/multimodal.py.

All decoders raise ValueError on malformed or unsupported input — never
struct.error/IndexError — so the quarantine path upstream can key on one
exception type.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tesseract_recognize_spark.functions.png import PNG_SIGNATURE, png_decode

__all__ = [
    "ppm_decode",
    "ppm_encode",
    "bmp_decode",
    "bmp_encode",
    "tiff_decode",
    "tiff_encode",
    "gif_decode",
    "gif_encode",
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


# TIFF 6.0 baseline: tag ids this decoder consumes
_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    317: "predictor",
}

_LZW_CLEAR, _LZW_EOI = 256, 257


def _tiff_lzw_decode(buf: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9→12-bit codes with the
    "early change" width bump (width grows when the table reaches
    2^width − 1, one code before the strict limit — the de-facto
    standard every TIFF writer uses)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    bitpos, nbits = 0, len(buf) * 8
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(buf[byte0 : byte0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"LZW: non-literal first code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    raise ValueError("LZW: stream ended without EndOfInformation")


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (fixtures/tests): mirrors the early-change
    width schedule of _tiff_lzw_decode."""
    out = bytearray()
    acc = accbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_LZW_CLEAR)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # decoder's table trails the encoder's by one entry (its first
        # data code appends nothing), so its early-change trigger
        # (len == 2^width − 1 after append) lands exactly when next_code
        # reaches 2^width here
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: CLEAR + reset, like libtiff
            emit(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(_LZW_EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(buf: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits run-length decoding."""
    out = bytearray()
    i, ln = 0, len(buf)
    while i < ln:
        n = buf[i]
        i += 1
        if n < 128:
            lit = buf[i : i + n + 1]
            if len(lit) != n + 1:
                raise ValueError("PackBits literal run truncated")
            out += lit
            i += n + 1
        elif n > 128:
            if i >= ln:
                raise ValueError("PackBits repeat run truncated")
            out += bytes([buf[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits encoder (fixtures/tests)."""
    out = bytearray()
    i, ln = 0, len(row)
    while i < ln:
        run = 1
        while i + run < ln and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        j = i + 1  # literal until a ≥3 repeat starts (2-runs stay literal)
        while j < ln and j - i < 128 and not (
            j + 2 < ln and row[j] == row[j + 1] == row[j + 2]
        ):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)
def _gif_lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF89a Appendix F LZW: LSB-first bit packing, variable width
    min_code+1 → 12 bits (no TIFF-style early change), CLEAR = 2^min,
    deferred-clear tolerated (table frozen at 4096 until CLEAR)."""
    clear = 1 << min_code
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = accbits = 0
    for byte in data:
        acc |= byte << accbits
        accbits += 8
        while accbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            accbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= clear:
                    raise ValueError(f"GIF LZW: non-literal first code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"GIF LZW: code {code} beyond table")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    raise ValueError("GIF LZW: stream ended without EndOfInformation")


def _gif_lzw_encode(data: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW encoder (fixtures/tests): mirrors the width
    schedule of _gif_lzw_decode (decoder's table trails by one entry, so
    the encoder bumps at next_code == 2^width + 1)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = accbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # table full: CLEAR + reset
            emit(clear)
            table = fresh()
            next_code = eoi + 1
            width = min_code + 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(eoi)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF interlace passes: (first row, stride) per GIF89a §20
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes → uint8 (h, w, 3) RGB of the FIRST frame
    (Leptonica's pixRead likewise returns one pix per file). Global and
    local color tables, interlacing, and deferred-clear LZW handled;
    transparency is ignored (the palette color shows). Malformed input
    raises ValueError."""
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF stream")
        w, h = struct.unpack("<HH", data[6:10])
        packed = data[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            if pos + 3 * n > len(data):
                raise ValueError("GIF global color table truncated")
            gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            gct = gct.reshape(n, 3)
            pos += 3 * n
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label byte + sub-blocks
                pos += 1
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise ValueError(f"GIF: unknown block 0x{block:02x}")
            _, _, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
            ipacked = data[pos + 8]
            pos += 9
            if iw == 0 or ih == 0:
                raise ValueError(f"bad GIF frame dimensions {iw}x{ih}")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                if pos + 3 * n > len(data):
                    raise ValueError("GIF local color table truncated")
                ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
                ct = ct.reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad GIF LZW minimum code size {min_code}")
            stream = bytearray()
            while data[pos] != 0:
                cnt = data[pos]
                sub = data[pos + 1 : pos + 1 + cnt]
                if len(sub) != cnt:
                    raise ValueError("GIF data sub-block truncated")
                stream += sub
                pos += 1 + cnt
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(stream), min_code), np.uint8
            )
            if idx.size < iw * ih:
                raise ValueError("GIF pixel data truncated")
            idx = idx[: iw * ih].reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: stream rows → display rows
                order = [
                    r for first, step in _GIF_INTERLACE
                    for r in range(first, ih, step)
                ]
                out = np.empty_like(idx)
                out[order] = idx
                idx = out
            if int(idx.max()) >= len(ct):
                raise ValueError("GIF palette index out of range")
            return np.ascontiguousarray(ct[idx])
        raise ValueError("GIF contains no image data")
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed GIF stream: {e}") from e


def gif_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w) gray (256-gray palette) or (h, w, 3) RGB with ≤256
    distinct colors → non-animated GIF89a (tests/fixtures)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        idx = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        colors, inverse = np.unique(
            arr.reshape(-1, 3), axis=0, return_inverse=True
        )
        if len(colors) > 256:
            raise ValueError("gif_encode wants ≤256 distinct RGB colors")
        pad = 2
        while pad < len(colors):
            pad *= 2
        palette = np.zeros((max(pad, 4), 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        idx = inverse.astype(np.uint8).reshape(arr.shape[:2])
    else:
        raise ValueError("gif_encode wants (h,w) gray or (h,w,3) RGB")
    h, w = idx.shape
    gct_bits = max(1, int(len(palette)).bit_length() - 1)
    min_code = max(2, gct_bits)
    if interlace:
        order = [
            r for first, step in _GIF_INTERLACE for r in range(first, h, step)
        ]
        idx = idx[order]
    lzw = _gif_lzw_encode(idx.tobytes(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        sub = lzw[i : i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3b"
    return bytes(out)


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
    """Baseline TIFF bytes → uint8 ndarray: (h, w) gray or (h, w, spp).
    Both byte orders; strips concatenated; compression none/LZW/deflate
    (8 and legacy 32946)/PackBits; horizontal predictor 2 undone;
    photometric 0 (WhiteIsZero) inverted to the usual BlackIsZero
    convention, as Leptonica's read path does. CCITT-fax/JPEG-in-TIFF
    and planar (non-chunky) layouts raise ValueError (injected-codec
    seam)."""
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
        if comp not in (1, 5, 8, 32773, 32946):
            raise ValueError(
                f"unsupported TIFF compression {comp} (none/LZW/deflate/"
                "PackBits here; inject a codec for CCITT/JPEG-in-TIFF)"
            )
        if tags.get("planar", [1])[0] != 1:
            raise ValueError("unsupported TIFF planar configuration")
        predictor = tags.get("predictor", [1])[0]
        if predictor not in (1, 2):
            raise ValueError(f"unsupported TIFF predictor {predictor}")
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
        rows_per_strip = tags.get("rows_per_strip", [h])[0] or h
        raster = bytearray()
        for idx, (off, cnt) in enumerate(
            zip(tags["strip_offsets"], tags["strip_counts"])
        ):
            chunk = data[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF strip truncated")
            if comp == 1:  # raw strips: boundaries carry no framing
                raster += chunk
                continue
            if comp == 5:
                chunk = _tiff_lzw_decode(chunk)
            elif comp in (8, 32946):
                try:
                    chunk = zlib.decompress(chunk)
                except zlib.error as e:
                    raise ValueError(f"bad TIFF deflate strip: {e}") from e
            elif comp == 32773:
                chunk = _packbits_decode(chunk)
            strip_rows = min(rows_per_strip, h - idx * rows_per_strip)
            need_strip = strip_rows * w * spp
            if len(chunk) < need_strip:
                raise ValueError("TIFF strip data truncated")
            raster += chunk[:need_strip]  # writers may pad; spec allows
        need = w * h * spp
        if len(raster) < need:
            raise ValueError("TIFF raster data truncated")
        arr = np.frombuffer(bytes(raster[:need]), dtype=np.uint8)
        img = arr.reshape(h, w, spp)
        if predictor == 2:  # horizontal differencing: undo = mod-256 cumsum
            img = np.cumsum(img, axis=1, dtype=np.uint8)
        img = img[:, :, 0] if spp == 1 else img
        if photometric == 0:
            img = 255 - img
        return np.ascontiguousarray(img)
    except struct.error as e:
        raise ValueError(f"malformed TIFF stream: {e}") from e


_TIFF_COMP_CODE = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def tiff_encode(
    img: np.ndarray, compression: str = "none", predictor: int = 1
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → little-endian single-strip
    baseline TIFF (tests/fixtures). compression: none/lzw/deflate/
    packbits; predictor 2 = horizontal differencing (lzw/deflate)."""
    if compression not in _TIFF_COMP_CODE:
        raise ValueError(f"tiff_encode: unknown compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError("tiff_encode: predictor must be 1 or 2")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, spp, photometric = *arr.shape, 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, spp, photometric = *arr.shape[:2], 3, 2
    else:
        raise ValueError("tiff_encode wants (h,w) gray or (h,w,3) RGB")
    plane = arr.reshape(h, w, spp)
    if predictor == 2:
        plane = plane.copy()
        plane[:, 1:, :] -= plane[:, :-1, :]  # uint8 wraps mod 256
    raw = plane.tobytes()
    if compression == "lzw":
        body = _tiff_lzw_encode(raw)
    elif compression == "deflate":
        body = zlib.compress(raw)
    elif compression == "packbits":
        row_len = w * spp
        body = b"".join(
            _packbits_encode(raw[i : i + row_len])
            for i in range(0, len(raw), row_len)
        )
    else:
        body = raw
    # layout: header(8) | IFD | bits values (if rgb) | strip data
    n_entries = 9 + (1 if predictor == 2 else 0)
    ifd_size = 2 + 12 * n_entries + 4
    bits_off = 8 + ifd_size
    bits_extra = 2 * 3 if spp == 3 else 0
    strip_off = bits_off + bits_extra
    entries = [  # (tag, type, count, value) — ascending tag order per spec
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, bits_off if spp == 3 else 8),
        (259, 3, 1, _TIFF_COMP_CODE[compression]),
        (262, 3, 1, photometric),
        (273, 4, 1, strip_off),
        (277, 3, 1, spp),
        (278, 4, 1, h),
        (279, 4, 1, len(body)),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
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
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/x-wav"
    if payload[:4] == b"IMG1":
        return "image/x-synthetic"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Default codec chain: PNG → netpbm → BMP → baseline TIFF
    (none/LZW/deflate/PackBits strips, horizontal predictor) → GIF →
    baseline JPEG; ValueError otherwise (progressive JPEG, CCITT-fax
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
    if mime == "image/gif":
        return gif_decode(payload)
    if mime == "image/jpeg":
        from tesseract_recognize_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(payload)
    raise ValueError(
        "no stdlib codec for payload (supported: PNG, binary PPM/PGM, "
        "BMP, baseline TIFF, GIF, baseline JPEG); inject one "
        "(e.g. PIL.Image.open) or use fake_codec"
    )
