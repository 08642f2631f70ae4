"""Pure-stdlib raster codecs (functions/codecs.py): netpbm + BMP
roundtrips, header edge cases, and the one-exception-type error contract
(everything malformed → ValueError). No Spark session needed."""

import struct

import numpy as np
import pytest

from tesseract_recognize_spark.functions.codecs import (
    bmp_decode,
    bmp_encode,
    decode_image,
    ppm_decode,
    ppm_encode,
    sniff_mime,
)
from tesseract_recognize_spark.functions.png import png_decode, png_encode


def _gray(h=5, w=7):
    return ((np.arange(h * w) * 11) % 256).astype(np.uint8).reshape(h, w)


def _rgb(h=5, w=7):
    g = _gray(h, w)
    return np.dstack([g, (g * 3) % 256, 255 - g])


def test_pgm_roundtrip():
    img = _gray()
    out = ppm_decode(ppm_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_ppm_roundtrip():
    img = _rgb()
    out = ppm_decode(ppm_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_ppm_header_comments_and_whitespace():
    img = _gray(2, 3)
    data = b"P5 # comment\n# another comment\n 3\t2 \n255\n" + img.tobytes()
    assert np.array_equal(ppm_decode(data), img)


def test_ppm_malformed_raises_valueerror():
    for data in (b"P4\n1 1\n255\n\x00", b"P5\nx 2\n255\n", b"P5\n3 2\n255\n\x00",
                 b"P5\n3 2\n70000\n" + b"\x00" * 6):
        with pytest.raises(ValueError):
            ppm_decode(data)


def test_bmp_roundtrip_24bit():
    # width 7 → stride padding exercised (7*3=21 → 24)
    img = _rgb()
    out = bmp_decode(bmp_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_bmp_topdown_negative_height():
    img = _rgb(4, 4)
    # encoder writes bottom-up, so the file's row order is img[::-1];
    # flipping the height sign makes the decoder read rows top-down,
    # yielding the vertically mirrored image
    data = bytearray(bmp_encode(img))
    struct.pack_into("<i", data, 22, -4)
    out = bmp_decode(bytes(data))
    assert np.array_equal(out, img[::-1])


def test_bmp_8bit_palette():
    h, w = 3, 6  # w*1=6 → stride 8, padding exercised
    idx = (np.arange(h * w) % 5).astype(np.uint8).reshape(h, w)
    palette = np.array(
        [[10, 20, 30, 0], [40, 50, 60, 0], [70, 80, 90, 0],
         [100, 110, 120, 0], [130, 140, 150, 0]], dtype=np.uint8
    )  # BGRX entries
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                       0, 0, len(palette), 0)
    hdr = struct.pack("<2sIHHI", b"BM",
                      14 + 40 + palette.nbytes + len(body), 0, 0,
                      14 + 40 + palette.nbytes)
    data = hdr + info + palette.tobytes() + body
    out = bmp_decode(data)
    assert out.shape == (h, w, 3)
    # BGRX palette entry [10,20,30] → RGB [30,20,10]
    assert list(out[0, 0]) == list(palette[idx[0, 0]][[2, 1, 0]])


def test_bmp_malformed_raises_valueerror():
    good = bmp_encode(_rgb(2, 2))
    compressed = bytearray(good)
    struct.pack_into("<I", compressed, 30, 1)  # BI_RLE8
    for data in (b"BM" + b"\x00" * 4, good[:30], bytes(compressed),
                 b"PX" + good[2:]):
        with pytest.raises(ValueError):
            bmp_decode(data)


def test_png_malformed_normalized_to_valueerror():
    good = png_encode(_gray(4, 4))
    truncated_ihdr = good[:20]
    bad_zlib = good[:33] + struct.pack(">I", 4) + b"IDAT\xff\xff\xff\xff" \
        + b"\x00" * 4 + good[-12:]
    for data in (truncated_ihdr, bad_zlib, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4):
        with pytest.raises(ValueError):
            png_decode(data)


def test_sniff_and_decode_chain():
    gray, rgb = _gray(), _rgb()
    cases = [
        (png_encode(gray), "image/png", gray.shape),
        (ppm_encode(gray), "image/x-portable-graymap", gray.shape),
        (ppm_encode(rgb), "image/x-portable-pixmap", rgb.shape),
        (bmp_encode(rgb), "image/bmp", rgb.shape),
    ]
    for payload, mime, shape in cases:
        assert sniff_mime(payload) == mime
        assert decode_image(payload).shape == shape
    assert sniff_mime(b"IMG1xxxx") == "image/x-synthetic"
    # JPEG now sniffs and routes to the stdlib baseline decoder
    # (functions/jpeg.py); a truncated stream still quarantines via
    # ValueError, and truly unknown containers keep the old message.
    assert sniff_mime(b"\xff\xd8\xff\xe0jpeg") == "image/jpeg"
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpeg")
    # GIF now sniffs and routes to the stdlib decoder (round 5); a
    # truncated stream quarantines via ValueError like every codec
    assert sniff_mime(b"GIF89a\x00\x00") == "image/gif"
    with pytest.raises(ValueError):
        decode_image(b"GIF89a\x00\x00")
    assert sniff_mime(b"NOTANIMG") is None
    with pytest.raises(ValueError, match="no stdlib codec"):
        decode_image(b"NOTANIMG")


def test_cross_codec_pixel_equality():
    """The same pixels through PNG, PPM and BMP decode identically — the
    'mirrors pixRead's any-raster intent' contract."""
    rgb = _rgb(6, 6)
    a = png_decode(png_encode(rgb))
    b = ppm_decode(ppm_encode(rgb))
    c = bmp_decode(bmp_encode(rgb))
    assert np.array_equal(a, b) and np.array_equal(b, c)


def test_tiff_roundtrip_gray_and_rgb():
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    for img in (_gray(), _rgb()):
        out = tiff_decode(tiff_encode(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_tiff_big_endian_and_multistrip():
    from tesseract_recognize_spark.functions.codecs import tiff_decode

    # hand-built MM (big-endian) 2x3 gray, two strips of one/two rows
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    strip1, strip2 = px[0].tobytes(), px[1].tobytes()
    entries = [
        (256, 4, 1, 3), (257, 4, 1, 2), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 1 << 16),
        (277, 3, 1, 1 << 16), (278, 4, 1, 1),
    ]
    # strip offsets/counts need value blocks (2 LONGs each > 4 bytes)
    n = len(entries) + 2
    ifd_off = 8
    blocks_off = ifd_off + 2 + 12 * n + 4
    data_off = blocks_off + 16
    entries.insert(5, (273, 4, 2, blocks_off))
    entries.append((279, 4, 2, blocks_off + 8))
    entries.sort()
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", n)
    for tag, vtype, count, value in entries:
        out += struct.pack(">HHII", tag, vtype, count, value)
    out += struct.pack(">I", 0)
    out += struct.pack(">II", data_off, data_off + 3)      # strip offsets
    out += struct.pack(">II", 3, 3)                        # strip counts
    out += strip1 + strip2
    assert np.array_equal(tiff_decode(bytes(out)), px)


def test_tiff_photometric_zero_inverted():
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    img = _gray(3, 3)
    data = bytearray(tiff_encode(img))
    # flip photometric tag (262) value 1 -> 0 (WhiteIsZero)
    i = data.index(struct.pack("<HH", 262, 3))
    struct.pack_into("<HH", data, i + 8, 0, 0)
    assert np.array_equal(tiff_decode(bytes(data)), 255 - img)


def test_tiff_malformed_raises_valueerror():
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    good = tiff_encode(_gray(3, 3))
    lzw = bytearray(good)
    i = lzw.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<HH", lzw, i + 8, 5, 0)  # compression=LZW
    for data in (b"II*\x00" + b"\xff" * 4, good[:30], bytes(lzw),
                 good[:-4], b"XX*\x00"):
        with pytest.raises(ValueError):
            tiff_decode(data)


def test_tiff_in_sniff_and_chain():
    from tesseract_recognize_spark.functions.codecs import tiff_encode

    payload = tiff_encode(_rgb())
    assert sniff_mime(payload) == "image/tiff"
    assert decode_image(payload).shape == _rgb().shape


def test_wav_roundtrip_mono_and_stereo():
    from tesseract_recognize_spark.functions.wav import wav_decode, wav_encode

    mono = ((np.arange(1000) * 37) % 4096 - 2048).astype(np.int16)
    rate, out = wav_decode(wav_encode(mono, 22050))
    assert rate == 22050 and np.array_equal(out, mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, out = wav_decode(wav_encode(stereo, 8000))
    assert rate == 8000 and out.shape == (1000, 2)
    assert np.array_equal(out, stereo)


def test_wav_malformed_raises_valueerror():
    from tesseract_recognize_spark.functions.wav import wav_decode, wav_encode

    good = wav_encode(np.zeros(16, np.int16))
    mulaw = bytearray(good)
    struct.pack_into("<H", mulaw, 20, 7)  # audio format = mu-law
    for data in (b"RIFF1234WAVX", good[:30], bytes(mulaw), b"OggS" + good):
        with pytest.raises(ValueError):
            wav_decode(data)


def test_wav_sniffed():
    from tesseract_recognize_spark.functions.wav import wav_encode

    assert sniff_mime(wav_encode(np.zeros(4, np.int16))) == "audio/x-wav"
    assert sniff_mime(b"RIFF0000AVI ") is None


def test_ppm_zero_dimension_raises():
    # 'P5\n0 5\n255\n' has digit-only tokens but a degenerate raster —
    # must quarantine (ValueError), not decode to a (5,0) array whose
    # mean-pool yields NaN features (round-4 advisor)
    import pytest

    from tesseract_recognize_spark.functions.codecs import ppm_decode

    for hdr in (b"P5\n0 5\n255\n", b"P5\n5 0\n255\n", b"P6\n0 0\n255\n"):
        with pytest.raises(ValueError, match="dimensions"):
            ppm_decode(hdr)


def test_tiff_zero_dimension_raises():
    import pytest

    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    good = tiff_encode(np.arange(12, dtype=np.uint8).reshape(3, 4))
    # patch the width tag's value to 0: find the 4-byte little-endian
    # width (tag 256) value in the IFD — simpler: encode a 0-width image
    # is impossible via numpy, so corrupt by replacing the first
    # occurrence of the width value bytes after the IFD starts
    with pytest.raises(ValueError, match="dimensions|range|truncated"):
        tiff_decode(good.replace((4).to_bytes(4, "little"), (0).to_bytes(4, "little"), 1))


def test_wav_partial_trailing_frame_raises():
    # all-malformed-input-raises contract: a data chunk that is not a
    # whole number of frames is truncation, not tolerance (round-4
    # advisor)
    import pytest

    from tesseract_recognize_spark.functions.wav import wav_decode, wav_encode

    good = wav_encode(np.zeros((8, 2), dtype=np.int16), rate=8000)
    clipped = good[:-1]  # drop one byte of the final stereo frame
    # fix the RIFF/data sizes so only the frame alignment is wrong
    import struct

    body = bytearray(clipped)
    body[4:8] = struct.pack("<I", len(body) - 8)
    data_pos = bytes(body).index(b"data")
    body[data_pos + 4 : data_pos + 8] = struct.pack(
        "<I", len(body) - data_pos - 8
    )
    with pytest.raises(ValueError, match="partial trailing frame"):
        wav_decode(bytes(body))


# ---- compressed TIFF (round 5: LZW / deflate / PackBits + predictor) ----


def _pack9(codes):
    """Pack a 9-bit-code list MSB-first (independent of the encoder under
    test — validates the decoder against TIFF 6.0 §13 directly)."""
    acc = accbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        accbits += 9
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_code_stream_hand_derived():
    """Pin the §13 table dynamics on a hand-traced example.

    data = 7 7 7 8 8 7 7 6 6 encodes (trace in-test) to the code stream
    CLEAR, 7, 258, 8, 8, 258, 6, 6, EOI where 258 = '77' both times it
    is emitted (the second after the decoder has rebuilt it), including
    the code==len(table) self-referential case on the first 258.
    """
    from tesseract_recognize_spark.functions.codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    stream = _pack9([256, 7, 258, 8, 8, 258, 6, 6, 257])
    assert _tiff_lzw_decode(stream) == data
    assert _tiff_lzw_encode(data) == stream


def test_tiff_lzw_width_schedule_and_table_reset():
    # poorly-compressible data long enough to cross the 9->10->11->12 bit
    # early-change boundaries AND the 4094-entry table reset
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    from tesseract_recognize_spark.functions.codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data


def test_tiff_compressed_roundtrips():
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    for img in (_gray(16, 13), _rgb(9, 11)):
        for comp in ("lzw", "deflate", "packbits"):
            out = tiff_decode(tiff_encode(img, compression=comp))
            assert np.array_equal(out, img), comp
        for comp in ("lzw", "deflate"):
            out = tiff_decode(
                tiff_encode(img, compression=comp, predictor=2)
            )
            assert np.array_equal(out, img), f"{comp}+predictor2"


def test_tiff_legacy_deflate_code():
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    img = _gray(6, 6)
    data = bytearray(tiff_encode(img, compression="deflate"))
    i = data.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<I", data, i + 8, 32946)  # old-style Deflate
    assert np.array_equal(tiff_decode(bytes(data)), img)


def test_tiff_packbits_exercises_repeats_and_literals():
    img = np.zeros((4, 64), dtype=np.uint8)
    img[:, :32] = 200            # long repeat run
    img[1, 32:] = np.arange(32)  # literal run
    img[2, 40] = 7               # isolated 2-run boundary
    img[2, 41] = 7
    from tesseract_recognize_spark.functions.codecs import (
        tiff_decode,
        tiff_encode,
    )

    enc = tiff_encode(img, compression="packbits")
    assert len(enc) < img.size + 200  # actually compressed
    assert np.array_equal(tiff_decode(enc), img)


def test_tiff_compressed_malformed_raises():
    from tesseract_recognize_spark.functions.codecs import (
        _packbits_decode,
        tiff_decode,
        tiff_encode,
    )

    img = _gray(8, 8)
    defl = bytearray(tiff_encode(img, compression="deflate"))
    with pytest.raises(ValueError, match="deflate|truncated"):
        tiff_decode(bytes(defl[:-6]))  # truncated zlib stream
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([5, 1, 2]))  # literal run overruns
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([200]))  # repeat run with no byte
    # floating-point predictor (3) is out of scope -> ValueError
    pred = bytearray(tiff_encode(img, compression="lzw", predictor=2))
    j = pred.index(struct.pack("<HH", 317, 3))
    struct.pack_into("<HH", pred, j + 8, 3, 0)
    with pytest.raises(ValueError, match="predictor"):
        tiff_decode(bytes(pred))
    # planar configuration 2 (separate planes) is the injected-codec
    # seam: retag the predictor entry as PlanarConfiguration=2
    planar = bytearray(tiff_encode(img, compression="lzw", predictor=2))
    j = planar.index(struct.pack("<HH", 317, 3))
    struct.pack_into("<HHIHH", planar, j, 284, 3, 1, 2, 0)
    with pytest.raises(ValueError, match="planar"):
        tiff_decode(bytes(planar))


def test_tiff_compressed_through_decode_image_chain():
    from tesseract_recognize_spark.functions.codecs import tiff_encode

    img = _rgb(7, 5)
    payload = tiff_encode(img, compression="lzw", predictor=2)
    assert sniff_mime(payload) == "image/tiff"
    assert np.array_equal(decode_image(payload), img)


# ---- GIF (round 5: LSB-first LZW, palettes, interlace) ----


def _pack_lsb(codes, width):
    """Pack fixed-width codes LSB-first (independent of the encoder under
    test — validates the decoder against GIF89a Appendix F directly)."""
    acc = accbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_code_stream_hand_derived():
    """Pin Appendix F table dynamics on a hand-traced example.

    min_code=2 (CLEAR=4, EOI=5, first free entry 6); data 1 1 1 2
    encodes to CLEAR, 1, 6, 2, EOI — all 3-bit — where 6 is the
    self-referential code==len(table) case ('11').
    """
    from tesseract_recognize_spark.functions.codecs import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    data = bytes([1, 1, 1, 2])
    stream = _pack_lsb([4, 1, 6, 2, 5], 3)
    assert _gif_lzw_decode(stream, 2) == data
    assert _gif_lzw_encode(data, 2) == stream


def test_gif_lzw_width_schedule_and_table_reset():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    from tesseract_recognize_spark.functions.codecs import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8) == data
    small = bytes([0, 1, 2, 3] * 500)  # min_code=2: crosses 3->12 widths
    assert _gif_lzw_decode(_gif_lzw_encode(small, 2), 2) == small


def test_gif_roundtrip_gray_rgb_interlaced():
    from tesseract_recognize_spark.functions.codecs import (
        gif_decode,
        gif_encode,
    )

    gray = _gray(16, 13)
    out = gif_decode(gif_encode(gray))
    assert out.shape == (16, 13, 3)  # palette expansion: gray -> RGB
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)

    rgb = np.zeros((9, 11, 3), dtype=np.uint8)
    rgb[..., 0] = (np.arange(99) % 5).reshape(9, 11) * 50
    rgb[..., 2] = 255 - rgb[..., 0]
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)
    assert np.array_equal(
        gif_decode(gif_encode(rgb, interlace=True)), rgb
    )


def test_gif_interlace_row_order_differs_in_stream():
    # same pixels, interlaced vs not: different byte streams, same decode
    from tesseract_recognize_spark.functions.codecs import (
        gif_decode,
        gif_encode,
    )

    img = (np.arange(64, dtype=np.uint8) % 7).reshape(8, 8) * 30
    plain, laced = gif_encode(img), gif_encode(img, interlace=True)
    assert plain != laced
    assert np.array_equal(gif_decode(plain), gif_decode(laced))


def test_gif_skips_extensions_and_uses_local_palette():
    from tesseract_recognize_spark.functions.codecs import (
        gif_decode,
        gif_encode,
    )

    img = _gray(5, 4)
    data = bytearray(gif_encode(img))
    # splice a graphic-control extension between screen descriptor+GCT
    # and the image descriptor (0x2C)
    at = data.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    data[at:at] = gce
    out = gif_decode(bytes(data))
    assert np.array_equal(out[:, :, 0], img)


def test_gif_malformed_raises_valueerror():
    from tesseract_recognize_spark.functions.codecs import (
        gif_decode,
        gif_encode,
    )

    good = gif_encode(_gray(6, 6))
    for data in (
        b"GIF90a" + good[6:],      # bad version magic
        good[:20],                  # truncated in palette
        good[:-10],                 # truncated pixel data
        good[:13] + good[13 + 768:],  # GCT flag set but table missing
    ):
        with pytest.raises(ValueError):
            gif_decode(data)
    # >256 distinct colors cannot be palettized
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        gif_encode(noisy)


def test_gif_through_decode_image_chain():
    from tesseract_recognize_spark.functions.codecs import gif_encode

    img = _gray(7, 5)
    payload = gif_encode(img)
    assert sniff_mime(payload) == "image/gif"
    assert decode_image(payload).shape == (7, 5, 3)
