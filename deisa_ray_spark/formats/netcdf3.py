"""Minimal NetCDF classic (CDF-1 / CDF-2) writer + reader — the public
file-format spec ("NetCDF Classic Format Specification", Unidata; the
same grammar scipy.io.netcdf and netcdf-c implement).

Layout (everything big-endian):

    magic 'CDF' + version byte (1 = classic, 2 = 64-bit offset)
    numrecs (4)                        -- 0: we write no record dimension
    dim_list  = NC_DIMENSION tag + count + (name, size)*
    gatt_list = ABSENT (two zero words)
    var_list  = NC_VARIABLE tag + count +
                (name, rank, dimids, ABSENT attrs, nc_type, vsize, begin)*
    ...data: each fixed variable's values at its begin offset, C order,
    padded to a 4-byte boundary.

Fixed-size variables only (no record dimension): the sinks write one
assembled array per (arr, t), which is exactly a fixed variable. int64
does not exist in the classic model — callers cast (the spec's own rule,
not a shortcut here).
"""

from __future__ import annotations

import struct

import numpy as np

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
ABSENT = b"\x00" * 8

# nc_type codes from the spec; (code, itemsize, numpy big-endian dtype)
_NC_TYPES: dict[str, tuple[int, str]] = {
    "int8": (1, ">i1"),
    "S1": (2, "S1"),
    "int16": (3, ">i2"),
    "int32": (4, ">i4"),
    "float32": (5, ">f4"),
    "float64": (6, ">f8"),
}
_CODE_TO_DTYPE = {code: dt for code, dt in _NC_TYPES.values()}


def _nc_type(dt: np.dtype) -> tuple[int, np.dtype]:
    dt = np.dtype(dt)
    # numpy names 'S1' as 'bytes8'; normalize so NC_CHAR is reachable
    name = "S1" if dt.kind == "S" and dt.itemsize == 1 else dt.name
    if name not in _NC_TYPES:
        raise TypeError(
            f"dtype {name} has no NetCDF classic type; cast first "
            f"(supported: {sorted(_NC_TYPES)})"
        )
    code, be = _NC_TYPES[name]
    return code, np.dtype(be)


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def write(
    fname: str,
    variables: dict[str, tuple[np.ndarray, tuple[str, ...]]],
    version: int = 2,
) -> None:
    """Write fixed variables ``{name: (array, dim_names)}``. Dimensions
    with the same name must agree in size across variables (shared dims,
    per the spec's single dim list)."""
    if version not in (1, 2):
        raise ValueError("version must be 1 (CDF-1) or 2 (CDF-2, 64-bit offsets)")
    # single shared dimension list
    dims: dict[str, int] = {}
    for vname, (arr, dnames) in variables.items():
        arr = np.asarray(arr)
        if len(dnames) != arr.ndim:
            raise ValueError(f"{vname}: {len(dnames)} dim names for rank {arr.ndim}")
        for dn, size in zip(dnames, arr.shape):
            if dims.setdefault(dn, int(size)) != int(size):
                raise ValueError(f"dimension {dn!r}: conflicting sizes")
    dim_ids = {dn: i for i, dn in enumerate(dims)}

    header = bytearray()
    header += b"CDF" + bytes([version])
    header += struct.pack(">i", 0)  # numrecs
    if dims:
        header += struct.pack(">ii", NC_DIMENSION, len(dims))
        for dn, size in dims.items():
            header += _name(dn) + struct.pack(">i", size)
    else:
        header += ABSENT
    header += ABSENT  # no global attributes

    begin_fmt = ">i" if version == 1 else ">q"
    begin_size = 4 if version == 1 else 8
    # var_list with placeholder begins, then backpatch
    var_entries: list[tuple[bytes, int, np.ndarray]] = []
    for vname, (arr, dnames) in variables.items():
        arr = np.asarray(arr)
        code, be_dt = _nc_type(arr.dtype)
        vsize = arr.size * be_dt.itemsize
        vsize += -vsize % 4
        entry = bytearray()
        entry += _name(vname)
        entry += struct.pack(">i", arr.ndim)
        for dn in dnames:
            entry += struct.pack(">i", dim_ids[dn])
        entry += ABSENT  # no variable attributes
        entry += struct.pack(">i", code)
        entry += struct.pack(">i", vsize)
        var_entries.append((bytes(entry), vsize, np.ascontiguousarray(arr, dtype=be_dt)))

    header += struct.pack(">ii", NC_VARIABLE, len(var_entries)) if var_entries else ABSENT
    header_len = len(header) + sum(len(e) + begin_size for e, _, _ in var_entries)

    begins = []
    offset = header_len
    for _, vsize, _ in var_entries:
        begins.append(offset)
        offset += vsize

    with open(fname, "wb") as f:
        f.write(header)
        for (entry, _, _), begin in zip(var_entries, begins):
            f.write(entry)
            f.write(struct.pack(begin_fmt, begin))
        for _, vsize, arr in var_entries:
            raw = arr.tobytes()
            f.write(raw + b"\x00" * (vsize - len(raw)))


def read(fname: str) -> dict[str, tuple[np.ndarray, tuple[str, ...]]]:
    """Independent spec-following reader: returns
    ``{name: (array, dim_names)}`` in native byte order."""
    with open(fname, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic file")
    version = buf[3]
    begin_fmt = ">i" if version == 1 else ">q"
    begin_size = 4 if version == 1 else 8
    pos = 4

    def u32() -> int:
        nonlocal pos
        (v,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return v

    def name() -> str:
        nonlocal pos
        n = u32()
        s = buf[pos : pos + n].decode()
        pos += n + (-n % 4)
        return s

    u32()  # numrecs
    tag, count = u32(), u32()
    dims: list[tuple[str, int]] = []
    if tag == NC_DIMENSION:
        dims = [(name(), u32()) for _ in range(count)]
    elif (tag, count) != (0, 0):
        raise ValueError("bad dim_list")
    tag, count = u32(), u32()
    if tag not in (0, 0x0C):
        raise ValueError("bad gatt_list")
    if tag == 0x0C:  # skip global attributes
        for _ in range(count):
            name()
            t, n = u32(), u32()
            width = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}[t]
            pos += n * width + (-(n * width) % 4)
    tag, count = u32(), u32()
    out: dict[str, tuple[np.ndarray, tuple[str, ...]]] = {}
    if tag == 0 and count == 0:
        return out
    if tag != NC_VARIABLE:
        raise ValueError("bad var_list")
    for _ in range(count):
        vname = name()
        rank = u32()
        dimids = [u32() for _ in range(rank)]
        atag, acount = u32(), u32()
        if (atag, acount) != (0, 0):
            raise NotImplementedError("minimal reader: variable attributes unsupported")
        code = u32()
        u32()  # vsize (trust shape * itemsize instead)
        (begin,) = struct.unpack_from(begin_fmt, buf, pos)
        pos += begin_size
        dnames = tuple(dims[i][0] for i in dimids)
        shape = tuple(dims[i][1] for i in dimids)
        dt = np.dtype(_CODE_TO_DTYPE[code])
        n_bytes = int(np.prod(shape)) * dt.itemsize if shape else dt.itemsize
        arr = np.frombuffer(buf[begin : begin + n_bytes], dtype=dt).reshape(shape)
        out[vname] = (arr.astype(arr.dtype.newbyteorder("=")), dnames)
    return out
