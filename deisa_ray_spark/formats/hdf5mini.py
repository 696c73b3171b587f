"""Minimal HDF5 classic-format writer + reader for files holding N
contiguous datasets in the root group — the shape of the per-chunk
hidden files the VDS sink emits (sinks.to_hdf5) and of the reference's
multi-dataset ``to_hdf5(fname, {name: arr})`` form.

Implements the public "HDF5 File Format Specification" (HDF Group),
classic layout only — no checksummed v2 structures:

    superblock v0 (96 bytes, base address 0)
      -> root group object header v1 [Symbol Table message]
           -> group B-tree v1 (one leaf) -> SNOD symbol node
           -> local heap (link names)
      -> per dataset: object header v1
           [Dataspace v1, Datatype v1 (fixed/float), Data Layout v3
            contiguous] -> raw C-order bytes

The reader walks the same structures from the spec (superblock → root
symbol-table entry → B-tree → SNOD → per-dataset messages) rather than
reversing the writer's offsets, so writer and reader verify each other.
The files are designed to be h5py-readable (spec-conformant classic
layout, the same structures h5py itself emits for this shape), but h5py
is not installable in this environment (pip has no network here —
attempted and blocked again 2026-08-14), so that interoperability claim
is pinned only by the independent in-repo reader; run
``pytest tests/test_sinks.py`` in an environment WITH h5py to get the
dual-mode assertions for free (the sink tests branch on the import).

Scope (deliberate): fixed-point and IEEE-float types, contiguous layout,
root-group datasets only, no attributes, no compression. Per-chunk sink
files need exactly this much.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
SIGNATURE = b"\x89HDF\r\n\x1a\n"

# (class, bitfield bytes, properties) per supported numpy dtype; floats
# follow the spec's IEEE descriptions (sign location in bit-field byte 1,
# mantissa-normalization bits 4-5 = 2 "implied MSB").
_FLOAT_PROPS = {
    4: struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127),
    8: struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023),
}
_FLOAT_SIGN_LOC = {4: 31, 8: 63}


def _datatype_message(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.byteorder == ">":
        raise TypeError("big-endian dtypes unsupported (write native LE)")
    if dt.kind in ("i", "u"):
        cls = 0
        bits = 0x08 if dt.kind == "i" else 0x00  # bit 3: signed
        head = bytes([(1 << 4) | cls, bits, 0, 0]) + struct.pack("<I", dt.itemsize)
        props = struct.pack("<HH", 0, dt.itemsize * 8)  # bit offset, precision
        return head + props
    if dt.kind == "f" and dt.itemsize in _FLOAT_PROPS:
        cls = 1
        head = bytes([(1 << 4) | cls, 0x20, _FLOAT_SIGN_LOC[dt.itemsize], 0])
        head += struct.pack("<I", dt.itemsize)
        return head + _FLOAT_PROPS[dt.itemsize]
    raise TypeError(f"unsupported dtype for hdf5mini: {dt}")


def _parse_datatype(data: bytes) -> np.dtype:
    cls = data[0] & 0x0F
    size = struct.unpack_from("<I", data, 4)[0]
    if cls == 0:
        signed = bool(data[1] & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}")
    if cls == 1:
        return np.dtype(f"<f{size}")
    raise TypeError(f"unsupported datatype class {cls}")


def _message(msg_type: int, data: bytes) -> bytes:
    data = data + b"\x00" * (-len(data) % 8)
    return struct.pack("<HHB3x", msg_type, len(data), 0) + data


def _object_header(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return struct.pack("<BxHI I 4x", 1, len(messages), 1, len(body)) + body


def _align(n: int) -> int:
    return n + (-n % 8)


def write(fname: str, datasets: dict[str, np.ndarray]) -> None:
    """Write ``{name: array}`` as contiguous root-group datasets."""
    if not datasets:
        raise ValueError("no datasets to write")
    names = sorted(datasets)  # SNOD entries must be name-ordered
    arrays = {n: np.ascontiguousarray(datasets[n]) for n in names}

    # local heap data: offset 0 holds the empty string (B-tree key 0)
    heap_data = bytearray(b"\x00" * 8)
    name_offsets: dict[str, int] = {}
    for n in names:
        name_offsets[n] = len(heap_data)
        raw = n.encode() + b"\x00"
        heap_data += raw + b"\x00" * (-len(raw) % 8)

    # --- fixed-size pieces, laid out sequentially from address 0 ---
    sb_size = 96
    root_oh_addr = sb_size
    root_oh_placeholder = _object_header([_message(0x0011, struct.pack("<QQ", 0, 0))])
    btree_addr = _align(root_oh_addr + len(root_oh_placeholder))
    btree_size = 24 + 8 + 8 + 8  # header + key0 + child0 + key1
    heap_addr = _align(btree_addr + btree_size)
    heap_hdr_size = 32
    heap_data_addr = heap_addr + heap_hdr_size
    snod_addr = _align(heap_data_addr + len(heap_data))
    snod_size = 8 + 40 * len(names)

    # dataset object headers then data blocks
    addr = _align(snod_addr + snod_size)
    ds_oh_addr: dict[str, int] = {}
    ds_data_addr: dict[str, int] = {}
    ds_oh_bytes: dict[str, bytes] = {}
    for n in names:
        a = arrays[n]
        dataspace = struct.pack("<BBB5x", 1, a.ndim, 0) + b"".join(
            struct.pack("<Q", d) for d in a.shape
        )
        oh = _object_header(
            [
                _message(0x0001, dataspace),
                _message(0x0003, _datatype_message(a.dtype)),
                # layout address backpatched below (place after all headers)
                _message(0x0008, struct.pack("<BBQQ", 3, 1, 0, a.nbytes)),
            ]
        )
        ds_oh_addr[n] = addr
        ds_oh_bytes[n] = oh
        addr = _align(addr + len(oh))
    for n in names:
        ds_data_addr[n] = addr
        addr = _align(addr + arrays[n].nbytes)
    eof = addr

    # backpatch layout data addresses
    for n in names:
        oh = ds_oh_bytes[n]
        layout = _message(0x0008, struct.pack("<BBQQ", 3, 1, ds_data_addr[n], arrays[n].nbytes))
        old = _message(0x0008, struct.pack("<BBQQ", 3, 1, 0, arrays[n].nbytes))
        assert oh.count(old) == 1
        ds_oh_bytes[n] = oh.replace(old, layout)

    superblock = (
        SIGNATURE
        + struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)  # versions, offset/length sizes
        + struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)  # base, freespace, EOF, driver
        # root symbol-table entry: name offset 0, header addr, cached
        # (type 1) btree + heap addresses in scratch
        + struct.pack("<QQII", 0, root_oh_addr, 1, 0)
        + struct.pack("<QQ", btree_addr, heap_addr)
    )
    assert len(superblock) == sb_size

    root_oh = _object_header([_message(0x0011, struct.pack("<QQ", btree_addr, heap_addr))])
    btree = (
        b"TREE"
        + struct.pack("<BBH", 0, 0, 1)  # group node, leaf, 1 entry
        + struct.pack("<QQ", UNDEF, UNDEF)  # siblings
        + struct.pack("<QQQ", 0, snod_addr, name_offsets[names[-1]])
    )
    heap_hdr = (
        b"HEAP"
        + struct.pack("<B3x", 0)
        + struct.pack("<QQQ", len(heap_data), UNDEF, heap_data_addr)
    )
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for n in names:
        snod += struct.pack("<QQII16x", name_offsets[n], ds_oh_addr[n], 0, 0)

    buf = bytearray(eof)
    pieces = [
        (0, superblock),
        (root_oh_addr, root_oh),
        (btree_addr, btree),
        (heap_addr, heap_hdr),
        (heap_data_addr, bytes(heap_data)),
        (snod_addr, snod),
    ]
    pieces += [(ds_oh_addr[n], ds_oh_bytes[n]) for n in names]
    pieces += [(ds_data_addr[n], arrays[n].tobytes()) for n in names]
    for off, b in pieces:
        buf[off : off + len(b)] = b
    with open(fname, "wb") as f:
        f.write(bytes(buf))


# -- reader ----------------------------------------------------------------


def _read_messages(buf: bytes, oh_addr: int) -> list[tuple[int, bytes]]:
    version, n_msgs, _refs, body_size = struct.unpack_from("<BxHII", buf, oh_addr)
    if version != 1:
        raise ValueError(f"object header version {version} unsupported")
    pos = oh_addr + 16
    end = pos + body_size
    out = []
    while len(out) < n_msgs and pos < end:
        mtype, msize, _flags = struct.unpack_from("<HHB3x", buf, pos)
        pos += 8
        out.append((mtype, buf[pos : pos + msize]))
        pos += msize
    return out


def read(fname: str) -> dict[str, np.ndarray]:
    """Spec-following reader: superblock → root entry → B-tree → SNOD →
    per-dataset messages → bytes."""
    with open(fname, "rb") as f:
        buf = f.read()
    if buf[:8] != SIGNATURE:
        raise ValueError("not an HDF5 file")
    sb_ver = buf[8]
    if sb_ver != 0:
        raise ValueError(f"superblock version {sb_ver} unsupported")
    if buf[13] != 8 or buf[14] != 8:
        raise ValueError("only 8-byte offsets/lengths supported")
    # root group symbol-table entry at superblock offset 24 + 32 = 56
    _link_off, root_oh_addr, cache_type = struct.unpack_from("<QQI", buf, 56)
    if cache_type == 1:
        btree_addr, heap_addr = struct.unpack_from("<QQ", buf, 80)
    else:
        msgs = dict(_read_messages(buf, root_oh_addr))
        btree_addr, heap_addr = struct.unpack_from("<QQ", msgs[0x0011], 0)

    heap_data_addr = struct.unpack_from("<Q", buf, heap_addr + 24)[0]

    def heap_name(offset: int) -> str:
        end = buf.index(b"\x00", heap_data_addr + offset)
        return buf[heap_data_addr + offset : end].decode()

    def walk_btree(addr: int) -> list[int]:
        if buf[addr : addr + 4] != b"TREE":
            raise ValueError("bad B-tree signature")
        _ntype, level, n_used = struct.unpack_from("<BBH", buf, addr + 4)
        pos = addr + 24
        children = []
        for i in range(n_used):
            # key_i (8) then child_i (8); trailing key ignored
            child = struct.unpack_from("<Q", buf, pos + 8)[0]
            children.append(child)
            pos += 16
        if level > 0:
            return [c for child in children for c in walk_btree(child)]
        return children

    out: dict[str, np.ndarray] = {}
    for snod_addr in walk_btree(btree_addr):
        if buf[snod_addr : snod_addr + 4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        n_syms = struct.unpack_from("<H", buf, snod_addr + 6)[0]
        pos = snod_addr + 8
        for _ in range(n_syms):
            name_off, oh_addr = struct.unpack_from("<QQ", buf, pos)
            pos += 40
            msgs = dict(_read_messages(buf, oh_addr))
            ds = msgs[0x0001]
            rank = ds[1]
            shape = struct.unpack_from(f"<{rank}Q", ds, 8)
            dt = _parse_datatype(msgs[0x0003])
            lay = msgs[0x0008]
            if lay[0] != 3 or lay[1] != 1:
                raise ValueError("only layout v3 contiguous supported")
            data_addr, nbytes = struct.unpack_from("<QQ", lay, 2)
            a = np.frombuffer(buf[data_addr : data_addr + nbytes], dtype=dt)
            out[heap_name(name_off)] = a.reshape(shape).copy()
    return out
