"""Baseline JPEG codec pins (functions/jpeg.py): encoder↔decoder
roundtrips at flat quantization (near-lossless — error bounded by IDCT
rounding), restart-marker handling, a hand-assembled 4:2:0 stream
exercising sampling factors + chroma upsampling, and the quarantine
contract (progressive / truncated / non-JPEG → ValueError)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tesseract_recognize_spark.functions.jpeg import (
    _ENC_AC_COUNTS,
    _ENC_AC_SYMS,
    _ENC_DC_COUNTS,
    _ENC_DC_SYMS,
    _enc_codes,
    jpeg_decode,
    jpeg_encode,
)


def _maxerr(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_gray_roundtrip_exact_within_idct_rounding():
    g = (np.add.outer(np.arange(24), np.arange(40)) * 2 % 256).astype(
        np.uint8
    )
    assert _maxerr(jpeg_decode(jpeg_encode(g)), g) <= 1


def test_rgb_roundtrip():
    g = (np.add.outer(np.arange(24), np.arange(40)) * 3 % 256).astype(
        np.uint8
    )
    rgb = np.stack([g, g[::-1], np.roll(g, 5, axis=1)], axis=-1)
    out = jpeg_decode(jpeg_encode(rgb))
    assert out.shape == rgb.shape
    # YCbCr forward+inverse is lossy by a couple of counts
    assert _maxerr(out, rgb) <= 2


def test_noise_and_odd_dimensions_roundtrip():
    rng = np.random.RandomState(0)
    n = rng.randint(0, 256, (17, 19)).astype(np.uint8)
    assert _maxerr(jpeg_decode(jpeg_encode(n)), n) <= 1


def test_restart_markers_roundtrip():
    g = (np.add.outer(np.arange(32), np.arange(48)) % 256).astype(np.uint8)
    enc = jpeg_encode(g, restart_interval=2)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    assert _maxerr(jpeg_decode(enc), g) <= 1


class _BW:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0)
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def test_420_subsampled_stream_decodes_flat_color():
    """Hand-assembled 16x16 4:2:0 stream, DC-only blocks: Y=200,
    Cb=Cr=128 → a flat (200,200,200) RGB image. Exercises the
    sampling-factor MCU walk and nearest-neighbor chroma upsampling the
    4:4:4 encoder never produces."""
    dc = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMS)
    ac = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0])  # Y: h=2 v=2
    out += bytes([2, 0x11, 0])  # Cb
    out += bytes([3, 0x11, 0])  # Cr
    for tc, counts, syms in (
        (0, _ENC_DC_COUNTS, _ENC_DC_SYMS),
        (1, _ENC_AC_COUNTS, _ENC_AC_SYMS),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(syms), tc << 4
        ) + bytes(counts) + syms
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0, 2, 0, 3, 0, 0, 63, 0])
    bw = _BW()
    # one MCU: 4 Y blocks then Cb, Cr. Constant plane v ← DC coeff 8(v-128)
    d_y = 8 * (200 - 128)  # 576, category 11 (ok: <= 11)
    first = True
    for comp_blocks, d in ((4, d_y), (1, 0), (1, 0)):
        for _ in range(comp_blocks):
            diff = d if first or d == 0 else 0  # DC is differential
            first = False
            s = diff.bit_length() if diff else 0
            length, code = dc[s]
            bw.put(code, length)
            if s:
                bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            length, code = ac[0x00]  # EOB
            bw.put(code, length)
    bw.pad()
    out += bw.out + b"\xff\xd9"
    img = jpeg_decode(bytes(out))
    assert img.shape == (16, 16, 3)
    assert _maxerr(img, np.full((16, 16, 3), 200, dtype=np.uint8)) <= 1


def test_progressive_raises():
    g = np.zeros((8, 8), dtype=np.uint8)
    enc = jpeg_encode(g)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(prog)


def test_truncated_and_garbage_raise():
    g = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    enc = jpeg_encode(g)
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG not a jpeg")


def test_codec_chain_sniffs_and_decodes_jpeg():
    from tesseract_recognize_spark.functions.codecs import (
        decode_image,
        sniff_mime,
    )

    g = (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(
        np.uint8
    )
    enc = jpeg_encode(g)
    assert sniff_mime(enc) == "image/jpeg"
    assert _maxerr(decode_image(enc), g) <= 1


def test_multimodal_chain_decodes_jpeg_and_quarantines_progressive(spark):
    """decode_image_features end-to-end: a baseline JPEG payload decodes
    through the default chain (mime detected, real width/height); a
    progressive JPEG in the same batch quarantines per row."""
    import pytest  # noqa: F811 — spark fixture import side

    from tesseract_recognize_spark.operators.multimodal import (
        decode_image_features,
    )

    g = (np.add.outer(np.arange(16), np.arange(24)) * 5 % 256).astype(
        np.uint8
    )
    enc = jpeg_encode(g)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    df = spark.createDataFrame(
        [("m://jpg", bytearray(enc)), ("m://prog", bytearray(prog))],
        ["media_ref", "payload"],
    )
    out = {r["media_ref"]: r for r in
           decode_image_features(df, resize_to=4).collect()}
    j = out["m://jpg"]
    assert j.mime == "image/jpeg" and j.error is None
    assert (j.width, j.height) == (24, 16)
    p = out["m://prog"]
    assert p.error is not None and "progressive" in p.error
    assert p.features is None
