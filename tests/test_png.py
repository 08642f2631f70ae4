"""PNG codec (functions/png.py): roundtrip, filter unfiltering, palette,
and the Spark decode_image_features end-to-end path over real PNG bytes.

The decoder is the engine's pixRead analog (reference
tesseract-recognize.cc:513-531); these tests pin it against hand-built
spec streams so every filter type (None/Sub/Up/Average/Paeth) is covered
even though our own encoder emits only filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tesseract_recognize_spark.functions.png import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize(
    "shape",
    [(5, 7), (5, 7, 1), (4, 4, 2), (6, 3, 3), (2, 9, 4), (1, 1), (1, 1, 3)],
)
def test_roundtrip(shape):
    img = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(img))
    want = img[:, :, 0] if (img.ndim == 3 and img.shape[2] == 1) else img
    np.testing.assert_array_equal(out, want)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _build(width, height, color_type, raw, palette=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    # split IDAT in two to exercise multi-chunk concatenation
    comp = zlib.compress(raw)
    mid = len(comp) // 2
    out += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    return out + _chunk(b"IEND", b"")


def _ref_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Independent scalar re-implementation of the spec's recon functions."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = list(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = out[y][i - bpp] if i >= bpp else 0
            b = out[y - 1][i] if y > 0 else 0
            c = out[y - 1][i - bpp] if (y > 0 and i >= bpp) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[y][i] = (line[i] + pred) & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("bpp,color_type", [(1, 0), (3, 2), (4, 6)])
def test_all_filter_types(bpp, color_type):
    w, h = 6, 5
    stride = w * bpp
    rng = _rng(bpp)
    rows = []
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        rows.append(
            bytes([ft]) + rng.integers(0, 256, stride, dtype=np.uint8).tobytes()
        )
    raw = b"".join(rows)
    got = png_decode(_build(w, h, color_type, raw))
    want = _ref_unfilter(raw, w, h, bpp).reshape(
        (h, w) if bpp == 1 else (h, w, bpp)
    )
    np.testing.assert_array_equal(got, want)


def test_palette_expansion():
    w, h = 4, 2
    palette = bytes(
        v for i in range(8) for v in (i * 10, i * 10 + 1, i * 10 + 2)
    )
    idx = np.array([[0, 1, 2, 3], [7, 6, 5, 4]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    got = png_decode(_build(w, h, 3, raw, palette=palette))
    assert got.shape == (2, 4, 3)
    assert got[0, 1].tolist() == [10, 11, 12]
    assert got[1, 0].tolist() == [70, 71, 72]


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (
            lambda d: d.replace(
                struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0),
                struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0),
            ),
            "bit depth",
        ),
        (
            lambda d: d.replace(
                struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0),
                struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 1),
            ),
            "interlaced",
        ),
    ],
)
def test_rejects_unsupported(mutate, msg):
    img = _rng(3).integers(0, 256, (4, 5, 3), dtype=np.uint8)
    data = mutate(png_encode(img))
    with pytest.raises(ValueError, match=msg):
        png_decode(data)


def test_spark_decode_image_features_png(spark):
    """End-to-end: PNG bytes through the Arrow feature-extraction stage,
    default codec (no injection) — the codec seam is closed for PNG."""
    from tesseract_recognize_spark.operators.multimodal import (
        decode_image_features,
    )

    def grad(d):
        return np.fromfunction(
            lambda y, x: (x + 2 * y + d) % 256, (16, 16)
        ).astype(np.uint8)

    rows = [(f"m://{d}", bytearray(png_encode(grad(d)))) for d in range(6)]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = decode_image_features(df, resize_to=8).orderBy("media_ref")
    got = out.collect()
    assert len(got) == 6
    for r in got:
        d = int(r["media_ref"].split("//")[1])
        assert (r["mime"], r["width"], r["height"], r["channels"]) == (
            "image/png", 16, 16, 1,
        )
        want = [d + 4 * i + 2 * j + 1.5 for i in range(8) for j in range(8)]
        assert r["features"] == pytest.approx(want, abs=0.0)
