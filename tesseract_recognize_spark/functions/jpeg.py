"""Pure-stdlib baseline JPEG codec (decode + a test-support encoder).

Completes the `pixRead` parity chain (tesseract-recognize.cc:513-531):
JPEG is the one common web raster the repo previously could not decode
without an injected codec. Scope is BASELINE SEQUENTIAL DCT (SOF0),
8-bit precision, grayscale or YCbCr with any sampling factors, restart
markers honored — i.e. the overwhelming majority of web JPEGs.
Progressive (SOF2), arithmetic coding, hierarchical and 12-bit streams
raise ValueError and flow to the per-row quarantine like every other
unsupported raster; production deployments inject libjpeg-turbo through
the multimodal codec seam and this module is the fallback.

Implementation is from the public ITU-T T.81 specification (Annex F
decode procedures: DECODE, RECEIVE/EXTEND, the zig-zag order of Figure
A.6). Per-block Huffman decoding is plain Python — acceptable because
decode runs inside Arrow batches on executors and test rasters are
small; the IDCT is a vectorized numpy basis multiply.

All malformed input raises ValueError (never struct/Index errors), the
module-wide quarantine contract.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_decode", "jpeg_encode"]

# zig-zag scan order (T.81 Figure A.6): position k in the scan → flat
# index into the row-major 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: _C[u, x] = c(u)/2 · cos((2x+1)uπ/16);
# spatial = _C.T @ coeff @ _C, coeff = _C @ spatial @ _C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _Huff:
    """Canonical Huffman table from a DHT segment: BITS (16 counts) +
    symbols in code order."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(symbols):
                    raise ValueError("JPEG DHT symbol count mismatch")
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        if k != len(symbols):
            raise ValueError("JPEG DHT symbol count mismatch")


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops at any other marker (exposed via .at_marker for RST checks)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data truncated (hit marker)")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated (EOF)")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy data truncated (EOF)")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:           # stuffed 0xFF data byte
                self.pos += 2
            else:                      # a real marker terminates the run
                self.marker = nxt
                raise ValueError("JPEG entropy data truncated (hit marker)")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def next_marker(self) -> int:
        """Byte-align and consume the marker that follows (RST/EOI)."""
        self.buf = 0
        self.n = 0
        if self.marker is not None:
            m, self.marker = self.marker, None
            self.pos += 2
            return m
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("JPEG truncated: expected marker")


def _decode_huff(br: _BitReader, table: _Huff) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG invalid Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 EXTEND: map the s received bits to the signed amplitude
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


_UNSUPPORTED_SOF = {
    0xC1: "extended sequential", 0xC2: "progressive", 0xC3: "lossless",
    0xC5: "differential sequential", 0xC6: "differential progressive",
    0xC7: "differential lossless", 0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive", 0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic", 0xCE: "differential arithmetic",
    0xCF: "differential arithmetic",
}


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 ndarray: (h, w) grayscale or
    (h, w, 3) RGB (JFIF YCbCr convention). ValueError on anything that
    is not a well-formed baseline-sequential 8-bit stream."""
    try:
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG stream (missing SOI)")
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        hdc: dict[int, _Huff] = {}
        hac: dict[int, _Huff] = {}
        frame = None
        restart_interval = 0
        img = None
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("JPEG marker desync")
            m = data[pos + 1]
            pos += 2
            if m == 0xD9:       # EOI
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:
                continue        # standalone markers
            if pos + 2 > len(data):
                raise ValueError("JPEG segment truncated")
            (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
            seg = data[pos + 2:pos + seg_len]
            if len(seg) != seg_len - 2:
                raise ValueError("JPEG segment truncated")
            if m == 0xDB:       # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    if pq != 0:
                        raise ValueError("unsupported 16-bit JPEG qtable")
                    if p + 65 > len(seg):
                        raise ValueError("JPEG DQT truncated")
                    qtabs[tq] = np.frombuffer(
                        seg[p + 1:p + 65], dtype=np.uint8
                    ).astype(np.int32)
                    p += 65
            elif m == 0xC4:     # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    counts = list(seg[p + 1:p + 17])
                    n = sum(counts)
                    syms = seg[p + 17:p + 17 + n]
                    tab = _Huff(counts, syms)
                    (hdc if tc == 0 else hac)[th] = tab
                    p += 17 + n
            elif m == 0xC0:     # SOF0 baseline
                prec, h_img, w_img, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8:
                    raise ValueError(f"unsupported JPEG precision {prec}")
                if nc not in (1, 3):
                    raise ValueError(f"unsupported JPEG component count {nc}")
                if w_img == 0 or h_img == 0:
                    raise ValueError(f"bad JPEG dimensions {w_img}x{h_img}")
                comps = []
                for i in range(nc):
                    cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                    )
                frame = (h_img, w_img, comps)
            elif m in _UNSUPPORTED_SOF:
                raise ValueError(
                    f"unsupported JPEG mode ({_UNSUPPORTED_SOF[m]}; only "
                    "baseline sequential — inject a codec)"
                )
            elif m == 0xDD:     # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif m == 0xDA:     # SOS → entropy-coded data follows
                if frame is None:
                    raise ValueError("JPEG SOS before SOF")
                img = _decode_scan(
                    data, pos + seg_len, frame, seg, qtabs, hdc, hac,
                    restart_interval,
                )
                break
            pos += seg_len
        if img is None:
            raise ValueError("JPEG missing SOS scan")
        return img
    except ValueError:
        raise
    except Exception as e:  # struct/index errors on malformed streams
        raise ValueError(f"malformed JPEG stream: {e}") from e


def _decode_scan(data, pos, frame, sos, qtabs, hdc, hac, restart_interval):
    h_img, w_img, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise ValueError("JPEG multi-scan streams unsupported (baseline)")
    tables = {}
    for i in range(ns):
        cs, tdta = sos[1 + 2 * i], sos[2 + 2 * i]
        tables[cs] = (tdta >> 4, tdta & 15)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qtabs:
            raise ValueError("JPEG references missing qtable")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            m = br.next_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("JPEG missing restart marker")
            br = _BitReader(data, br.pos)
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            if c["id"] not in tables:
                raise ValueError("JPEG scan references unknown component")
            td, ta = tables[c["id"]]
            if td not in hdc or ta not in hac:
                raise ValueError("JPEG references missing Huffman table")
            q = qtabs[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = _decode_huff(br, hdc[td])
                    if s > 11:
                        raise ValueError("JPEG bad DC magnitude category")
                    diff = _extend(br.bits(s), s) if s else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(br, hac[ta])
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        zz[k] = _extend(br.bits(sz), sz)
                        k += 1
                    block = np.zeros(64, dtype=np.int32)
                    block[ZIGZAG] = zz * q
                    spatial = _idct2(block.reshape(8, 8).astype(np.float64))
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255).astype(np.uint8)
        # nearest-neighbor chroma upsample to the full sampling grid
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h_img, :w_img])
    if len(out_planes) == 1:
        return out_planes[0]
    y, cb, cr = (pl.astype(np.float64) for pl in out_planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Test-support encoder: baseline, 4:4:4, flat quantization (all-ones
# table → near-lossless roundtrip, the fixture generator for the decode
# tests). Simple canonical Huffman tables rather than the Annex K
# defaults: DC categories 0..11 at 4 bits, all 256 AC run/size symbols
# at 9 bits — valid prefix-free tables any conforming decoder accepts.
# ---------------------------------------------------------------------------

_ENC_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_SYMS = bytes(range(12))
# 255 symbols at 9 bits + 1 at 10 (a DHT count is a single byte, so a
# full 256-at-one-length table is unrepresentable)
_ENC_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_SYMS = bytes(range(256))


def _enc_codes(counts, syms):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per T.81 F.1.2.3


def _mag(v: int) -> tuple[int, int]:
    """(category s, s-bit code) for a signed amplitude."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def jpeg_encode(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JPEG with flat
    (all-ones) quantization: roundtrips within IDCT rounding error.
    Test-support only — production encodes with an injected codec."""
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        raise ValueError("jpeg_encode wants (h,w) gray or (h,w,3) RGB")
    h_img, w_img = planes[0].shape
    ph, pw = -(-h_img // 8) * 8, -(-w_img // 8) * 8
    padded = []
    for p in planes:
        q = np.empty((ph, pw))
        q[:h_img, :w_img] = p
        q[h_img:, :w_img] = p[-1:, :]          # edge-replicate pad
        q[:, w_img:] = q[:, w_img - 1:w_img]
        padded.append(q)
    nc = len(padded)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h_img,
                                     w_img, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x11, 0])
    for tc, counts, syms in (
        (0, _ENC_DC_COUNTS, _ENC_DC_SYMS),
        (1, _ENC_AC_COUNTS, _ENC_AC_SYMS),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(syms), tc << 4
        ) + bytes(counts) + syms
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00])
    out += bytes([0, 63, 0])
    dc_codes = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMS)
    ac_codes = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMS)
    bw = _BitWriter()
    pred = [0] * nc
    mcux, mcuy = pw // 8, ph // 8
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            block = padded[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            coef = np.round(_dct2(block - 128.0)).astype(np.int64)
            zz = coef.reshape(-1)[ZIGZAG]
            s, code = _mag(int(zz[0]) - pred[ci])
            pred[ci] = int(zz[0])
            length, huff = dc_codes[s]
            bw.write(huff, length)
            if s:
                bw.write(code, s)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, huff = ac_codes[0xF0]   # ZRL
                    bw.write(huff, length)
                    run -= 16
                s, code = _mag(v)
                length, huff = ac_codes[(run << 4) | s]
                bw.write(huff, length)
                bw.write(code, s)
                run = 0
            if run:
                length, huff = ac_codes[0x00]        # EOB
                bw.write(huff, length)
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
