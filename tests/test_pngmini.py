"""Byte-level PNG codec tests: the vectorized module implementation
must agree with an INDEPENDENT scalar reference written straight from
the W3C filter definitions (so a shared bug cannot cancel out in a
round-trip), plus chunk/CRC/structure failure modes. Cross-checks
against PIL automatically when it is installed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from deisa_ray_spark.formats.pngmini import (
    PngFormatError,
    decode_png,
    encode_png,
)


# ---- independent scalar reference (spec text, no numpy tricks) ----------
def _ref_paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _ref_decode(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
    w, h, depth, ct, *_ = struct.unpack(">IIBBBBB", ihdr)
    ch = {0: 1, 2: 3}[ct]
    stride = w * ch
    raw = zlib.decompress(idat)
    out = []
    prev = [0] * stride
    p = 0
    for _y in range(h):
        ft = raw[p]
        row_f = list(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        rec = [0] * stride
        for x in range(stride):
            a = rec[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                v = row_f[x]
            elif ft == 1:
                v = row_f[x] + a
            elif ft == 2:
                v = row_f[x] + b
            elif ft == 3:
                v = row_f[x] + (a + b) // 2
            elif ft == 4:
                v = row_f[x] + _ref_paeth(a, b, c)
            rec[x] = v % 256
        out.append(rec)
        prev = rec
    arr = np.array(out, dtype=np.uint8)
    return arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, ch)


def _rand_img(rng, shape):
    return rng.integers(0, 256, size=shape, dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_gray_all_filters(ftype):
    rng = np.random.default_rng(100 + ftype)
    for shape in [(1, 1), (1, 7), (5, 1), (9, 13), (16, 16)]:
        img = _rand_img(rng, shape)
        data = encode_png(img, filter_type=ftype)
        np.testing.assert_array_equal(decode_png(data), img)
        # the independent scalar decoder agrees byte-for-byte
        np.testing.assert_array_equal(_ref_decode(data), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_all_filters(ftype):
    rng = np.random.default_rng(200 + ftype)
    for shape in [(1, 1, 3), (4, 6, 3), (11, 5, 3)]:
        img = _rand_img(rng, shape)
        data = encode_png(img, filter_type=ftype)
        np.testing.assert_array_equal(decode_png(data), img)
        np.testing.assert_array_equal(_ref_decode(data), img)


def test_golden_tiny_filter0():
    """Hand-assembled 2x2 gray PNG, filter 0: decode must return the
    exact pixels (golden vector, no encoder involved)."""
    px = np.array([[1, 2], [3, 254]], dtype=np.uint8)
    raw = bytes([0, 1, 2, 0, 3, 254])  # two scanlines, filter byte 0

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), px)


def test_multiple_idat_chunks_and_ancillary_skipped():
    rng = np.random.default_rng(3)
    img = _rand_img(rng, (6, 6))
    data = encode_png(img, filter_type=2)
    # split the single IDAT into two + insert an ancillary chunk
    pos = 8
    parts = {}
    order = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        parts[tag] = data[pos + 8:pos + 8 + ln]
        order.append(tag)
        pos += 12 + ln

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    idat = parts[b"IDAT"]
    mid = len(idat) // 2
    rebuilt = (
        data[:8]
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"tEXt", b"k\x00v")
        + chunk(b"IDAT", idat[:mid])
        + chunk(b"IDAT", idat[mid:])
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(rebuilt), img)


def test_corruption_raises():
    img = np.zeros((3, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"NOTAPNG!" + bytes(data[8:]))
    bad = bytearray(data)
    bad[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(PngFormatError):
        encode_png(img.astype(np.uint16))
    with pytest.raises(PngFormatError):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA unsupported


def test_pil_crosscheck_if_available():
    pil = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(9)
    for ftype in range(5):
        img = _rand_img(rng, (10, 14))
        data = encode_png(img, filter_type=ftype)
        np.testing.assert_array_equal(
            np.asarray(pil.open(io.BytesIO(data))), img
        )
        buf = io.BytesIO()
        pil.fromarray(img).save(buf, format="PNG")
        np.testing.assert_array_equal(decode_png(buf.getvalue()), img)


def test_decode_image_real_png_path():
    """decode_image_real must decode PNG bytes without PIL and keep the
    NotImplementedError gate for formats with no pure-Python path."""
    from deisa_ray_spark.functions.multimodal import decode_image_real

    rng = np.random.default_rng(21)
    img = _rand_img(rng, (7, 9))
    np.testing.assert_array_equal(
        decode_image_real(encode_png(img, filter_type=4)), img
    )
    try:
        import PIL  # noqa: F401
    except ImportError:
        # JPEG now has a pure-Python path (formats/jpegmini, r12): a
        # malformed FFD8 payload raises the codec's OWN format error,
        # not the not-implemented gate...
        from deisa_ray_spark.formats.jpegmini import JpegFormatError

        with pytest.raises(JpegFormatError):
            decode_image_real(b"\xff\xd8\xff\xe0 not actually jpeg")
        # ...which remains for formats with no pure-Python decoder
        with pytest.raises(NotImplementedError):
            decode_image_real(b"GIF89a not decodable here")
