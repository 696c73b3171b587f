"""Minimal zarr v2 directory store, writer + reader (public spec:
https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html).

A zarr v2 array is a directory holding a ``.zarray`` JSON metadata file
plus one file per chunk, keyed ``"i.j.k"`` by chunk-grid position, each
file the raw C-order bytes of that chunk (we write ``compressor: null``,
which the spec allows and every zarr implementation reads).

This maps 1:1 onto the engine's chunk table: each executor writes its
chunk's bytes to its own key — disjoint files, no coordination, no
driver bytes. The installed ``zarr`` library opens these stores
unchanged; the reader here exists so the round-trip contract executes
in environments without it.

Edge chunks: zarr chunk files are always full chunk-shaped; when the
array shape is not a chunk multiple the overhang is padding (we use the
fill value). The engine's grids are chunk-aligned (model.py validation),
so writes never hit the overhang path, but the reader handles it.
"""

from __future__ import annotations

import json
import os

import numpy as np

ZARR_FORMAT = 2


def _dtype_str(dt: np.dtype) -> str:
    # numpy's .str is already the zarr v2 dtype encoding: explicit
    # byte-order char + kind + itemsize, e.g. '<f8', '<i4', '|u1'
    return np.dtype(dt).str


def create_array(
    path: str,
    shape: tuple[int, ...],
    chunks: tuple[int, ...],
    dtype: np.dtype,
    fill_value: float | int | None = 0,
) -> None:
    """Write the ``.zarray`` metadata (driver-side, O(1))."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": ZARR_FORMAT,
        "shape": list(int(s) for s in shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": _dtype_str(np.dtype(dtype)),
        "compressor": None,
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def chunk_key(pos: tuple[int, ...]) -> str:
    return ".".join(str(int(p)) for p in pos)


def write_chunk(
    path: str, pos: tuple[int, ...], block: np.ndarray, suffix: str = ""
) -> None:
    """Raw C-order chunk bytes at the grid key — executor-side, no locks
    needed: distinct positions are distinct files. ``suffix`` writes a
    staged (non-final) key for commit-after-validation protocols; a
    suffixed key is invisible to readers until renamed."""
    data = np.ascontiguousarray(block).tobytes()
    with open(os.path.join(path, chunk_key(pos) + suffix), "wb") as f:
        f.write(data)


def read_array(path: str) -> np.ndarray:
    """Independent spec-following reader: assemble the full array from
    ``.zarray`` + chunk keys. Missing chunks materialize as fill_value
    (spec: an absent key means an unwritten chunk)."""
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"not a zarr v2 array: {meta.get('zarr_format')}")
    if meta.get("compressor") is not None or meta.get("filters"):
        raise NotImplementedError("minimal reader supports uncompressed stores only")
    if meta.get("order") != "C":
        raise NotImplementedError("minimal reader supports C order only")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dt = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    out = np.full(shape, 0 if fill is None else fill, dtype=dt)
    grid = tuple(-(-s // c) for s, c in zip(shape, chunks))
    for pos in np.ndindex(*grid):
        key = os.path.join(path, chunk_key(pos))
        if not os.path.exists(key):
            continue
        raw = np.fromfile(key, dtype=dt).reshape(chunks)
        sl = tuple(
            slice(p * c, min((p + 1) * c, s)) for p, c, s in zip(pos, chunks, shape)
        )
        trim = tuple(slice(0, sl_i.stop - sl_i.start) for sl_i in sl)
        out[sl] = raw[trim]
    return out
