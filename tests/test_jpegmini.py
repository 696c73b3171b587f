"""Byte-level tests for the pure-Python baseline-JPEG codec
(formats/jpegmini.py) — the pngmini discipline applied to T.81: golden
hand-computed values, structural byte checks, every entropy-coding path
(DC prediction, EOB, ZRL, byte stuffing), and loud failures on
malformed or out-of-subset streams. No Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from deisa_ray_spark.formats.jpegmini import (
    ZIGZAG,
    JpegFormatError,
    _idct_block,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _blocks(vals):
    co = np.zeros((len(vals), 8, 8), dtype=np.int32)
    for b, entries in enumerate(vals):
        for (u, v), c in entries.items():
            co[b, u, v] = c
    return co


def _expected(co):
    n = co.shape[0]
    out = np.zeros((8, 8 * n), dtype=np.uint8)
    for b in range(n):
        px = np.clip(
            np.floor(_idct_block(co[b].astype(np.float64)) + 128.5), 0, 255
        ).astype(np.uint8)
        out[:, b * 8 : (b + 1) * 8] = px
    return out


def test_dc_only_block_is_uniform_golden():
    """Hand-computable golden: an all-AC-zero block with C00 = 80
    decodes to the uniform value 80/8 + 128 = 138 (the IDCT of a pure
    DC block is C00/8 everywhere)."""
    data = encode_jpeg_gray(_blocks([{(0, 0): 80}]), 8, 8)
    img = decode_jpeg_gray(data)
    assert img.shape == (8, 8)
    assert (img == 138).all()


def test_marker_structure():
    data = encode_jpeg_gray(_blocks([{(0, 0): 8}]), 8, 8)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # DQT present with an all-ones 8-bit table
    i = data.index(b"\xff\xdb")
    assert data[i + 5 : i + 5 + 64] == bytes([1] * 64)
    # SOF0 declares 8-bit, 8x8, one component, no subsampling
    j = data.index(b"\xff\xc0")
    assert data[j + 4] == 8 and data[j + 9] == 1 and data[j + 11] == 0x11


def test_multi_block_dc_prediction_and_idct():
    """DC is DIFF-coded across blocks: three blocks with DCs 40, -24, 0
    exercise positive, negative, and zero diffs; AC terms differ per
    block. Decoded pixels must equal the direct IDCT per block."""
    co = _blocks(
        [
            {(0, 0): 40, (1, 2): 7, (3, 0): -5},
            {(0, 0): -24, (0, 1): -3, (5, 5): 9},
            {(0, 0): 0, (7, 7): 11},
        ]
    )
    img = decode_jpeg_gray(encode_jpeg_gray(co, 24, 8))
    assert np.array_equal(img, _expected(co))


def test_zrl_long_zero_run():
    """A nonzero coefficient after a >16-zero run forces ZRL codes."""
    # zigzag index 1 set, then nothing until index 60 — run of 58
    co = np.zeros((1, 8, 8), dtype=np.int32)
    r1, c1 = ZIGZAG[1]
    r2, c2 = ZIGZAG[60]
    co[0, r1, c1] = 4
    co[0, r2, c2] = -6
    img = decode_jpeg_gray(encode_jpeg_gray(co, 8, 8))
    assert np.array_equal(img, _expected(co))


def test_byte_stuffing_round_trips():
    """Find a block whose entropy bytes contain a stuffed 0xFF 0x00 and
    check it decodes exactly — the spec F.1.2.3 rule both directions."""
    for seed in range(64):
        co = _blocks(
            [{(u, v): ((seed * 13 + u * 5 + v * 3) % 15) - 7
              for u in range(8) for v in range(8)}]
        )
        data = encode_jpeg_gray(co, 8, 8)
        scan = data[data.index(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            img = decode_jpeg_gray(data)
            assert np.array_equal(img, _expected(co))
            return
    pytest.fail("no fixture produced a stuffed byte — widen the seed scan")


def test_clamp_both_ends():
    # one block per image: DC diff magnitude stays inside category 11,
    # the largest the spec's DC table carries
    hi = decode_jpeg_gray(encode_jpeg_gray(_blocks([{(0, 0): 1100}]), 8, 8))
    lo = decode_jpeg_gray(encode_jpeg_gray(_blocks([{(0, 0): -1100}]), 8, 8))
    assert (hi == 255).all() and (lo == 0).all()


def test_truncated_stream_raises():
    data = encode_jpeg_gray(_blocks([{(0, 0): 80, (3, 3): 9}]), 8, 8)
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(data[:20])


def test_progressive_sof_rejected():
    data = bytearray(encode_jpeg_gray(_blocks([{(0, 0): 8}]), 8, 8))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(bytes(data))


def test_missing_soi_rejected():
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(b"\x00\x01\x02")


def test_decode_image_real_routes_jpeg():
    from deisa_ray_spark.functions.multimodal import decode_image_real

    co = _blocks([{(0, 0): 80}])
    img = decode_image_real(encode_jpeg_gray(co, 8, 8), fmt="JPEG")
    assert (img == 138).all()


def test_out_of_range_coefficients_raise_cleanly():
    """DC diffs past category 11 / AC past category 10 are outside the
    Annex-K tables — the encoder must say so, not KeyError."""
    with pytest.raises(JpegFormatError):
        encode_jpeg_gray(_blocks([{(0, 0): 2048}]), 8, 8)
    with pytest.raises(JpegFormatError):
        encode_jpeg_gray(_blocks([{(3, 3): 1024}]), 8, 8)


def test_pil_crosscheck_if_available():
    """When PIL exists (not in this container; auto-activates where it
    does), our decoder must agree with it on our own fixture bytes."""
    pytest.importorskip("PIL")
    from PIL import Image

    import io

    co = _blocks([{(0, 0): 40, (1, 2): 7, (5, 5): -9}])
    data = encode_jpeg_gray(co, 8, 8)
    ours = decode_jpeg_gray(data)
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    # PIL's IDCT is integer-approximated (libjpeg); allow 1-off pixels
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def _strip_segment(data: bytes, marker: bytes) -> bytes:
    """Remove one whole marker segment (marker + length + payload)."""
    import struct

    i = data.index(marker)
    ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
    return data[:i] + data[i + 2 + ln :]


def test_missing_dht_is_clean_format_error():
    """A stream whose scan references never-declared Huffman tables must
    raise JpegFormatError, not KeyError (r12 ADVICE: the clean
    format-error contract decode_image_real relies on)."""
    data = encode_jpeg_gray(_blocks([{(0, 0): 8}]), 8, 8)
    with pytest.raises(JpegFormatError, match="Huffman"):
        decode_jpeg_gray(_strip_segment(data, b"\xff\xc4"))


def test_missing_dqt_is_clean_format_error():
    data = encode_jpeg_gray(_blocks([{(0, 0): 8}]), 8, 8)
    with pytest.raises(JpegFormatError, match="quantization"):
        decode_jpeg_gray(_strip_segment(data, b"\xff\xdb"))


def test_truncated_marker_header_is_clean_format_error():
    """Cutting the stream mid marker-length must raise JpegFormatError,
    not struct.error — including a length field that points past EOF."""
    data = encode_jpeg_gray(_blocks([{(0, 0): 8}]), 8, 8)
    i = data.index(b"\xff\xdb")
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(data[: i + 3])  # marker + half its length field
    clipped = bytearray(data)
    clipped[i + 2 : i + 4] = b"\xff\xff"  # length overruns the stream
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(bytes(clipped))
