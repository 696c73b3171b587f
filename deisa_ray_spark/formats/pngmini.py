"""Minimal pure-Python PNG codec (stdlib zlib only) — the real decode
path for ``multimodal.decode_image_real`` when PIL is not installed.

Public spec: the W3C PNG specification (ISO/IEC 15948; RFC 2083) — the
same spec-following discipline as ``formats/hdf5mini.py`` /
``formats/zarr2.py`` / ``formats/netcdf3.py``: the container has no
image libraries, so the format is implemented from its public byte-level
specification and verified by round-trip + hand-computed golden tests
(``tests/test_pngmini.py``); when PIL IS installed,
``decode_image_real`` prefers it and the tests cross-check against it
automatically.

Supported subset (exactly what the multimodal pipeline emits/consumes):
8-bit depth, color types 0 (grayscale) and 2 (RGB), interlace 0, all
five scanline filter types (None/Sub/Up/Average/Paeth) on both encode
and decode, chunk CRC verified on decode. Ancillary chunks are skipped.

Scale note: decode runs INSIDE the Arrow ``mapInPandas`` batch, one
image at a time — the codec is per-executor CPU work with no Spark
semantics; the unfilter hot loop is per-scanline (Sub/Avg/Paeth are
sequential along x by definition; Up/None vectorize).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type (8-bit subset we implement)
_CHANNELS = {0: 1, 2: 3}


class PngFormatError(ValueError):
    """Malformed or unsupported PNG byte stream."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply filter ``ftype`` to one reconstructed scanline (uint8)."""
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    upleft = np.zeros_like(p)
    upleft[bpp:] = p[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - (left + p) // 2
    elif ftype == 4:
        pred = np.array(
            [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, p, upleft)],
            dtype=np.int32,
        )
        out = r - pred
    else:
        raise PngFormatError(f"unknown filter type {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def _unfilter_row(
    ftype: int, filt: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Invert filter ``ftype``: filtered bytes -> reconstructed uint8."""
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return ((filt.astype(np.int32) + prev) % 256).astype(np.uint8)
    n = filt.shape[0]
    out = np.empty(n, dtype=np.uint8)
    if ftype == 1:
        # recon(x) = filt(x) + recon(x-bpp): mod-256 cumsum per stride lane
        for lane in range(bpp):
            out[lane::bpp] = np.cumsum(filt[lane::bpp], dtype=np.int64) % 256
        return out
    f = filt.astype(np.int32)
    p = prev.astype(np.int32)
    if ftype == 3:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (f[x] + (a + int(p[x])) // 2) % 256
        return out
    if ftype == 4:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            c = int(p[x - bpp]) if x >= bpp else 0
            out[x] = (f[x] + _paeth(a, int(p[x]), c)) % 256
        return out
    raise PngFormatError(f"unknown filter type {ftype}")


def encode_png(
    img: np.ndarray, filter_type: "int | None" = None
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array.

    ``filter_type``: fixed scanline filter 0-4, or None for the spec's
    cheap heuristic (filter 0 — optimal compression is not the goal of
    a format-contract codec; the DECODER handles all five)."""
    if img.dtype != np.uint8:
        raise PngFormatError(f"8-bit only, got dtype {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise PngFormatError(f"unsupported shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h, w * channels)
    bpp = channels  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        ft = filter_type if filter_type is not None else 0
        raw.append(ft)
        raw.extend(_filter_row(ft, flat[y], prev, bpp))
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a (h, w) or (h, w, 3) uint8 array.

    Verifies the signature and every chunk CRC; supports bit depth 8,
    color types 0/2, interlace 0; concatenates multiple IDAT chunks."""
    if data[:8] != _SIG:
        raise PngFormatError("bad PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise PngFormatError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngFormatError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngFormatError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        # ancillary chunks: skipped
    if ihdr is None:
        raise PngFormatError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise PngFormatError(
            f"unsupported PNG: depth={depth} comp={comp} "
            f"filter_method={filt} interlace={interlace}"
        )
    if color_type not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color_type}")
    channels = _CHANNELS[color_type]
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.shape[0] != h * (stride + 1):
        raise PngFormatError(
            f"IDAT size {raw.shape[0]} != {h} rows x (1 + {stride})"
        )
    rows = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        out[y] = _unfilter_row(int(rows[y, 0]), rows[y, 1:], prev, channels)
        prev = out[y].astype(np.int32)
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)
