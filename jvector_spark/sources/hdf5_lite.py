"""Minimal pure-python HDF5 reader/writer for the classic contiguous
layout (SURVEY §2.1 S3 — the last env-blocked source path).

Scope: exactly the subset ann-benchmarks files use and the reference's
``DataSetLoader.java:29-49`` consumes — HDF5 *classic* format (superblock
v0, v1 object headers, v1 group B-trees + symbol nodes + local heaps)
holding 1-D/2-D **contiguous, uncompressed** little-endian float32 /
float64 / int32 / int64 datasets. That is what ``h5py.File(...).
create_dataset(name, data=...)`` emits with the default (earliest)
libver when no chunking/compression is requested, and what the public
ann-benchmarks corpus files (``train`` / ``test`` / ``neighbors``)
contain.

Everything here is written from the public HDF5 File Format
Specification (v3, hdfgroup.org); no HDF5 library code is consulted.
Out-of-scope features fail loudly with the conversion path named:
chunked/compressed datasets, big-endian payloads, v2+ superblocks
(libver="latest" files), and fractal-heap link storage.

Why not a Spark datasource: an HDF5 file is a single local benchmark
artifact (it is not splittable without the chunk B-tree), so the loader
stages on the driver — the same staging role the reference's loader
plays — after which the data lives in Parquet/DataFrames and every
downstream path is distributed.
"""

from __future__ import annotations

import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# dtype <-> datatype-message maps (classes/bit fields per spec section IV)
# ---------------------------------------------------------------------------

_FLOAT_PROPS = {
    4: (0, 32, 23, 8, 0, 23, 127),   # f32: off, prec, eloc, esz, mloc, msz, bias
    8: (0, 64, 52, 11, 0, 52, 1023),  # f64
}


def _datatype_message(dt: np.dtype) -> bytes:
    """Serialize a v1 Datatype message body for a supported numpy dtype."""
    dt = np.dtype(dt)
    if dt.byteorder == ">":
        raise NotImplementedError("big-endian datasets are out of scope")
    if dt.kind == "f" and dt.itemsize in (4, 8):
        off, prec, eloc, esz, mloc, msz, bias = _FLOAT_PROPS[dt.itemsize]
        # class 1 (float), version 1; bit field: LE order, no pad,
        # mantissa normalization = 2 (implied MSB), sign location = prec-1
        head = struct.pack(
            "<B3BI", (1 << 4) | 1, 0x20, prec - 1, 0, dt.itemsize
        )
        props = struct.pack("<HHBBBBI", off, prec, eloc, esz, mloc, msz, bias)
        return head + props
    if dt.kind in "iu" and dt.itemsize in (4, 8):
        signed = 0x08 if dt.kind == "i" else 0x00
        head = struct.pack("<B3BI", (1 << 4) | 0, signed, 0, 0, dt.itemsize)
        props = struct.pack("<HH", 0, dt.itemsize * 8)
        return head + props
    raise NotImplementedError(f"unsupported dtype {dt} (float32/64, int32/64)")


def _parse_datatype(body: bytes) -> np.dtype:
    cls_ver = body[0]
    cls = cls_ver & 0x0F
    bits = body[1:4]
    (size,) = struct.unpack_from("<I", body, 4)
    if bits[0] & 0x01:
        raise NotImplementedError("big-endian datasets are out of scope")
    if cls == 0:  # fixed-point
        signed = bool(bits[0] & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}")
    if cls == 1:  # float
        if size not in (4, 8):
            raise NotImplementedError(f"float size {size} unsupported")
        return np.dtype(f"<f{size}")
    raise NotImplementedError(f"datatype class {cls} unsupported (numeric only)")


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header_v1(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # prefix: ver, reserved, nmsgs, refcount, header size, 4-byte pad so
    # message data is 8-byte aligned
    return (
        struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(blob)) + blob
    )


def write_hdf5(path: str, datasets: dict[str, np.ndarray]) -> None:
    """Write ``{name: array}`` as a classic-format HDF5 file (contiguous,
    uncompressed, little-endian). 1-D and 2-D numeric arrays only —
    the ann-benchmarks shape. Readable by any HDF5 1.x implementation."""
    if not datasets:
        raise ValueError("write_hdf5 needs at least one dataset")
    if len(datasets) > 8:
        raise NotImplementedError(
            "write_hdf5 writes a single symbol-table node sized for at "
            f"most 8 datasets (2*K_LEAF); got {len(datasets)}. Split "
            "across files or extend the B-tree/SNOD layout."
        )
    names = sorted(datasets)  # symbol nodes store entries in name order
    arrays = {}
    for name in names:
        a = np.ascontiguousarray(datasets[name])
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        if a.ndim not in (1, 2):
            raise ValueError(f"dataset {name!r}: only 1-D/2-D supported")
        _datatype_message(a.dtype)  # validate dtype up front
        arrays[name] = a

    K_LEAF, K_INT = 4, 16
    # ---- local heap data: offset 0 = empty string (B-tree "smallest" key)
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for name in names:
        name_off[name] = len(heap_data)
        nb = name.encode() + b"\x00"
        heap_data += nb + b"\x00" * (-len(nb) % 8)
    heap_seg_size = len(heap_data)

    # ---- layout plan (addresses assigned in write order)
    pos = 96  # superblock v0 with 8/8 sizes is 96 bytes incl. root STE
    root_oh_addr = pos
    # root object header: one Symbol Table message (btree addr, heap addr)
    # — addresses patched once known; reserve the fixed size now
    root_oh_size = len(_object_header_v1([_message(0x0011, b"\x00" * 16)]))
    pos += root_oh_size
    btree_addr = pos
    btree_size = 24 + (2 * K_LEAF + 1) * 8 + (2 * K_LEAF) * 8
    pos += btree_size
    heap_hdr_addr = pos
    pos += 32
    heap_seg_addr = pos
    pos += heap_seg_size
    snod_addr = pos
    snod_size = 8 + (2 * K_LEAF) * 40
    pos += snod_size
    oh_addr, data_addr, oh_blobs = {}, {}, {}
    for name in names:
        a = arrays[name]
        dims = a.shape
        space = struct.pack("<BBBB4x", 1, len(dims), 0, 0) + b"".join(
            struct.pack("<Q", d) for d in dims
        )
        layout = struct.pack("<BBQQ", 3, 1, 0, a.nbytes)  # addr patched below
        oh = _object_header_v1(
            [
                _message(0x0001, space),
                _message(0x0003, _datatype_message(a.dtype)),
                _message(0x0008, layout),
            ]
        )
        oh_addr[name] = pos
        oh_blobs[name] = oh
        pos += len(oh)
    for name in names:
        data_addr[name] = pos
        pos += arrays[name].nbytes
    eof = pos

    # ---- superblock v0
    root_ste = struct.pack(
        "<QQII", 0, root_oh_addr, 1, 0
    ) + struct.pack("<QQ", btree_addr, heap_hdr_addr)
    superblock = (
        _SIG
        + struct.pack(
            "<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, K_LEAF, K_INT, 0
        )
        + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
        + root_ste
    )
    assert len(superblock) == 96, len(superblock)

    # ---- root group object header (now with real addresses)
    root_oh = _object_header_v1(
        [_message(0x0011, struct.pack("<QQ", btree_addr, heap_hdr_addr))]
    )
    assert len(root_oh) == root_oh_size

    # ---- group B-tree: single leaf pointing at the one SNOD
    btree = bytearray(btree_size)
    struct.pack_into("<4sBBHQQ", btree, 0, b"TREE", 0, 0, 1, _UNDEF, _UNDEF)
    struct.pack_into("<QQQ", btree, 24, 0, snod_addr, name_off[names[-1]])

    # ---- local heap header + SNOD
    heap_hdr = struct.pack(
        "<4sB3xQQQ", b"HEAP", 0, heap_seg_size, 1, heap_seg_addr
    )
    snod = bytearray(snod_size)
    struct.pack_into("<4sBBH", snod, 0, b"SNOD", 1, 0, len(names))
    for i, name in enumerate(names):
        struct.pack_into(
            "<QQII16x", snod, 8 + i * 40, name_off[name], oh_addr[name], 0, 0
        )

    with open(path, "wb") as f:
        f.write(superblock)
        f.write(root_oh)
        f.write(bytes(btree))
        f.write(heap_hdr)
        f.write(bytes(heap_data))
        f.write(bytes(snod))
        for name in names:
            oh = bytearray(oh_blobs[name])
            # patch the layout message's data address: the layout body is
            # the LAST message (18 bytes padded to 24); addr lives at body
            # offset 2 (after version+class bytes)
            struct.pack_into("<Q", oh, len(oh) - 24 + 2, data_addr[name])
            f.write(bytes(oh))
        for name in names:
            f.write(arrays[name].tobytes())


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _read_messages(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    """Parse a v1 object header (+ continuation blocks) into messages."""
    ver, _, nmsgs, _refs, hsize = struct.unpack_from("<BBHII", buf, addr)
    if ver != 1:
        raise NotImplementedError(
            f"object header version {ver} unsupported (classic v1 only — "
            "re-save the file with h5py libver='earliest' or convert via "
            "tools/hdf5_to_parquet.py on a machine with h5py)"
        )
    spans = [(addr + 16, addr + 16 + hsize)]
    out: list[tuple[int, bytes]] = []
    while spans and len(out) < nmsgs:
        lo, hi = spans.pop(0)
        p = lo
        while p + 8 <= hi and len(out) < nmsgs:
            mtype, msize, _flags = struct.unpack_from("<HHB", buf, p)
            body = buf[p + 8 : p + 8 + msize]
            p += 8 + msize
            if mtype == 0x0010:  # continuation: (offset, length)
                off, length = struct.unpack_from("<QQ", body, 0)
                spans.append((off, off + length))
                out.append((mtype, body))
            else:
                out.append((mtype, body))
    return out


def _group_links(buf: bytes, btree_addr: int, heap_addr: int) -> dict[str, int]:
    """name -> object header address from a v1 group B-tree."""
    sig, _ver, _seg_size, _free, seg_addr = struct.unpack_from(
        "<4sB3xQQQ", buf, heap_addr
    )
    if sig != b"HEAP":
        raise ValueError("corrupt local heap")

    def name_at(off: int) -> str:
        start = seg_addr + off
        end = buf.index(b"\x00", start)
        return buf[start:end].decode()

    links: dict[str, int] = {}

    def walk(node_addr: int) -> None:
        sig2, ntype, level, used = struct.unpack_from("<4sBBH", buf, node_addr)
        if sig2 == b"TREE":
            if ntype != 0:
                raise ValueError("non-group B-tree node in group walk")
            base = node_addr + 24
            for i in range(used):
                (child,) = struct.unpack_from("<Q", buf, base + i * 16 + 8)
                walk(child)
            return
        if sig2 == b"SNOD":
            for i in range(used):
                noff, ohaddr = struct.unpack_from(
                    "<QQ", buf, node_addr + 8 + i * 40
                )
                links[name_at(noff)] = ohaddr
            return
        raise ValueError(f"unexpected node signature {sig2!r}")

    walk(btree_addr)
    return links


def list_hdf5(path: str) -> dict[str, tuple]:
    """{dataset name: shape} for a classic-format HDF5 file."""
    with open(path, "rb") as f:
        buf = f.read()
    return {
        name: _dataset_info(buf, addr)[0]
        for name, addr in _root_links(buf).items()
    }


def _root_links(buf: bytes) -> dict[str, int]:
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    sb_ver = buf[8]
    if sb_ver not in (0, 1):
        raise NotImplementedError(
            f"superblock version {sb_ver} unsupported (classic v0/v1 only — "
            "files written with libver='latest'; convert via "
            "tools/hdf5_to_parquet.py)"
        )
    size_off, size_len = buf[13], buf[14]
    if (size_off, size_len) != (8, 8):
        raise NotImplementedError("non-8-byte offsets/lengths unsupported")
    ste_off = 24 + (4 if sb_ver == 1 else 0) + 32
    _lname, root_oh, cache, _r = struct.unpack_from("<QQII", buf, ste_off)
    if cache == 1:
        btree_addr, heap_addr = struct.unpack_from("<QQ", buf, ste_off + 24)
    else:
        btree_addr = heap_addr = None
        for mtype, body in _read_messages(buf, root_oh):
            if mtype == 0x0011:
                btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
        if btree_addr is None:
            raise NotImplementedError(
                "root group has no symbol table (new-style link storage "
                "unsupported — classic format only)"
            )
    return _group_links(buf, btree_addr, heap_addr)


def _dataset_info(buf: bytes, oh_addr: int):
    dims = dtype = layout = None
    for mtype, body in _read_messages(buf, oh_addr):
        if mtype == 0x0001:  # dataspace
            sver, rank, flags = body[0], body[1], body[2]
            base = 8 if sver == 1 else 4
            dims = struct.unpack_from(f"<{rank}Q", body, base)
        elif mtype == 0x0003:  # datatype
            dtype = _parse_datatype(body)
        elif mtype == 0x0008:  # data layout
            lver = body[0]
            if lver == 3:
                lclass = body[1]
                if lclass != 1:
                    raise NotImplementedError(
                        "chunked/compact dataset layout unsupported "
                        "(contiguous only — ann-benchmarks files are "
                        "contiguous; convert compressed files via "
                        "tools/hdf5_to_parquet.py)"
                    )
                addr, size = struct.unpack_from("<QQ", body, 2)
                layout = (addr, size)
            elif lver in (1, 2):
                rank, lclass = body[1], body[2]
                if lclass != 1:
                    raise NotImplementedError(
                        "chunked/compact dataset layout unsupported"
                    )
                (addr,) = struct.unpack_from("<Q", body, 8)
                layout = (addr, None)
            else:
                raise NotImplementedError(f"layout version {lver}")
    if dims is None or dtype is None or layout is None:
        raise ValueError("dataset object header missing required messages")
    return dims, dtype, layout


def read_hdf5_dataset(path: str, name: str) -> np.ndarray:
    """Read one contiguous dataset from a classic-format HDF5 file."""
    with open(path, "rb") as f:
        buf = f.read()
    links = _root_links(buf)
    if name not in links:
        raise KeyError(f"dataset {name!r} not in {sorted(links)}")
    dims, dtype, (addr, _size) = _dataset_info(buf, links[name])
    n = int(np.prod(dims)) if dims else 0
    if addr == _UNDEF:
        return np.zeros(dims, dtype=dtype)  # never-written dataset
    arr = np.frombuffer(buf, dtype=dtype, count=n, offset=addr)
    return arr.reshape(dims).copy()
