"""Minimal HDF5 writer for positive-space fuzzing of sources/hdf5.py.

Emits exactly the documented subset the in-repo reader supports —
superblock v0, old-style root group (v1 group B-tree + SNOD + local
heap), v1 object headers, and datasets that are contiguous or chunked
via a v1 chunk B-tree with optional shuffle+deflate filters — so
hypothesis can property-test ``read(write(x)) == x`` over random
shapes, dtypes, and chunk grids (tests/test_hdf5_roundtrip.py). This
complements the hostile-bytes negative-space fuzz in tests/test_hdf5.py
with generated POSITIVE coverage the six committed CDS files can't
provide (arbitrary ranks, edge chunks, oversized chunk dims, 2-level
chunk B-trees).

Layout notes mirror sources/hdf5.py's parsers (cited per section); the
writer emits the real on-disk structures (trailing B-tree keys, name
heap with the empty string at offset 0) even where the reader ignores
them, so the files are structurally honest HDF5, not reader-shaped
fixtures.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


class _Buf:
    def __init__(self) -> None:
        self.b = bytearray()

    def align(self, n: int = 8) -> None:
        self.b.extend(b"\x00" * (-len(self.b) % n))

    def tell(self) -> int:
        return len(self.b)

    def put(self, data: bytes) -> int:
        addr = len(self.b)
        self.b.extend(data)
        return addr

    def patch(self, addr: int, data: bytes) -> None:
        self.b[addr : addr + len(data)] = data


def _datatype_msg(dt: np.dtype) -> bytes:
    if dt.kind == "f":
        head = struct.pack(
            "<BBBBI", 0x11, 0x20, 0, 0, dt.itemsize
        )  # ver1|cls1(float), LE
        # bit offset, precision, exp loc/size, man loc/size, exp bias
        if dt.itemsize == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        return head + props
    signed = dt.kind == "i"
    head = struct.pack(
        "<BBBBI", 0x10, 0x08 if signed else 0x00, 0, 0, dt.itemsize
    )  # ver1|cls0(fixed-point)
    props = struct.pack("<HH", 0, dt.itemsize * 8)
    return head + props


def _dataspace_msg(shape: tuple[int, ...]) -> bytes:
    # version 1: ver, rank, flags(no max dims), reserved(5), dims
    return struct.pack("<BBB5x", 1, len(shape), 0) + b"".join(
        struct.pack("<Q", d) for d in shape
    )


def _messages_to_header(msgs: list[tuple[int, bytes]]) -> bytes:
    """v1 object header: prologue + (type, size, flags, body) messages."""
    blob = bytearray()
    for mtype, body in msgs:
        body = bytes(body) + b"\x00" * (-len(body) % 8)
        blob += struct.pack("<HHB3x", mtype, len(body), 0) + body
    return (
        struct.pack("<BxHII4x", 1, len(msgs), 1, len(blob)) + bytes(blob)
    )


def _chunk_btree(
    buf: _Buf, chunks: list[tuple[tuple[int, ...], int, int]], rank: int,
    fanout: int = 8,
) -> int:
    """Write leaf (and one internal level if needed) chunk B-tree nodes.

    ``chunks``: (offsets, stored_size, data_addr) in row-major order.
    Returns the root node address. Mirrors Hdf5File._chunk_btree:
    key = size(4) + mask(4) + offsets 8*(rank+1), child follows each
    key, trailing key after the last child.
    """
    def node(entries, level) -> int:
        blob = bytearray(b"TREE")
        blob += struct.pack("<BBH", 1, level, len(entries))
        blob += struct.pack("<QQ", _UNDEF, _UNDEF)  # left/right siblings
        for offsets, size, addr in entries:
            blob += struct.pack("<II", size, 0)
            blob += b"".join(struct.pack("<Q", o) for o in offsets)
            blob += struct.pack("<Q", 0)  # element-offset slot of the key
            blob += struct.pack("<Q", addr)
        blob += struct.pack("<II", 0, 0) + b"\x00" * 8 * (rank + 1)  # hi key
        buf.align()
        return buf.put(bytes(blob))

    if len(chunks) <= fanout:
        return node(chunks, 0)
    leaves = []
    for i in range(0, len(chunks), fanout):
        group = chunks[i : i + fanout]
        leaves.append((group[0][0], 0, node(group, 0)))
    return node(leaves, 1)


def write_hdf5(
    datasets: dict[str, np.ndarray],
    chunk_dims: dict[str, tuple[int, ...]] | None = None,
    deflate_level: int | None = 6,
    shuffle: bool = False,
    btree_fanout: int = 8,
    superblock_version: int = 0,
) -> bytes:
    """Serialize arrays to HDF5 bytes the in-repo reader can decode.

    Datasets named in ``chunk_dims`` are chunked (v1 B-tree index) with
    the shuffle/deflate pipeline as configured; others are contiguous
    and unfiltered (the filter pipeline applies to chunked layout only,
    as in real HDF5).

    ``superblock_version`` exercises all four prefixes the reader
    parses (sources/hdf5.py:_parse_superblock): v0 (default, 96 B with
    a root SYMBOL-TABLE ENTRY), v1 (v0 plus the indexed-storage K +
    reserved word — 4 extra bytes shift every later field), and v2/v3
    (48 B, a DIRECT root object-header address, no symbol entry —
    the modern prefix real CDS ERA5 downloads ship with).
    """
    if superblock_version not in (0, 1, 2, 3):
        raise ValueError(f"superblock v{superblock_version} unsupported")
    chunk_dims = chunk_dims or {}
    buf = _Buf()
    # reserve the largest prefix any version needs; versions with a
    # shorter superblock leave dead space before the first object,
    # which is legal (all file addresses are absolute)
    buf.put(b"\x00" * 104)  # superblock placeholder, patched last

    # local heap: empty string at offset 0, then link names
    heap_data = bytearray(b"\x00")
    name_off = {}
    for name in datasets:
        name_off[name] = len(heap_data)
        heap_data += name.encode() + b"\x00"
    heap_data += b"\x00" * (-len(heap_data) % 8)
    buf.align()
    heap_data_addr = buf.put(bytes(heap_data))
    buf.align()
    heap_addr = buf.put(
        b"HEAP"
        + struct.pack(
            "<B3xQQQ", 0, len(heap_data), len(heap_data), heap_data_addr
        )
    )

    oh_addrs = {}
    for name, arr in datasets.items():
        arr = np.ascontiguousarray(arr)
        dt = arr.dtype
        msgs: list[tuple[int, bytes]] = [
            (1, _dataspace_msg(arr.shape)),
            (3, _datatype_msg(dt)),
            (5, struct.pack("<BB", 3, 0)),  # fill v3, undefined
        ]
        if name in chunk_dims:
            cdims = chunk_dims[name]
            assert len(cdims) == arr.ndim
            filters: list[tuple[int, list[int]]] = []
            if shuffle:
                filters.append((2, [dt.itemsize]))
            if deflate_level is not None:
                filters.append((1, [deflate_level]))
            chunks = []
            grid = [range(0, max(s, 1), c) for s, c in zip(arr.shape, cdims)]
            for offsets in _rowmajor(grid):
                block = np.zeros(cdims, dtype=dt)
                sel = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offsets, cdims, arr.shape)
                )
                clip = tuple(slice(0, s.stop - s.start) for s in sel)
                block[clip] = arr[sel]
                raw = block.tobytes()
                for fid, cvals in filters:
                    if fid == 2:
                        u8 = np.frombuffer(raw, dtype=np.uint8)
                        raw = (
                            u8.reshape(len(u8) // dt.itemsize, dt.itemsize)
                            .T.tobytes()
                        )
                    elif fid == 1:
                        raw = zlib.compress(raw, cvals[0])
                buf.align()
                chunks.append((tuple(offsets), len(raw), buf.put(raw)))
            btree_addr = _chunk_btree(
                buf, chunks, arr.ndim, fanout=btree_fanout
            )
            layout = (
                struct.pack("<BBB", 3, 2, arr.ndim + 1)
                + struct.pack("<Q", btree_addr)
                + b"".join(struct.pack("<I", c) for c in cdims)
                + struct.pack("<I", dt.itemsize)
            )
            msgs.append((8, layout))
            if filters:
                pipe = bytearray(struct.pack("<BB6x", 1, len(filters)))
                for fid, cvals in filters:
                    pipe += struct.pack("<HHHH", fid, 0, 0, len(cvals))
                    pipe += b"".join(struct.pack("<I", v) for v in cvals)
                    if len(cvals) % 2:
                        pipe += b"\x00" * 4
                msgs.append((11, bytes(pipe)))
        else:
            raw = arr.tobytes()
            buf.align()
            data_addr = buf.put(raw) if raw else _UNDEF
            layout = struct.pack("<BB", 3, 1) + struct.pack(
                "<QQ", data_addr, len(raw)
            )
            msgs.append((8, layout))
        buf.align()
        oh_addrs[name] = buf.put(_messages_to_header(msgs))

    # SNOD with one symbol entry per dataset (sorted by name, as HDF5
    # requires of symbol tables)
    snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(datasets)))
    for name in sorted(datasets):
        snod += struct.pack("<QQI4x16x", name_off[name], oh_addrs[name], 0)
    buf.align()
    snod_addr = buf.put(bytes(snod))

    # group B-tree: one leaf entry pointing at the SNOD
    gbt = bytearray(b"TREE" + struct.pack("<BBH", 0, 0, 1))
    gbt += struct.pack("<QQ", _UNDEF, _UNDEF)
    gbt += struct.pack("<QQQ", 0, snod_addr, 0)  # key0, child0, key1
    buf.align()
    gbt_addr = buf.put(bytes(gbt))

    # root object header: one symbol-table message
    buf.align()
    root_oh = buf.put(
        _messages_to_header([(17, struct.pack("<QQ", gbt_addr, heap_addr))])
    )

    # superblock (patched into the reserved prefix)
    sb = bytearray(_SIG)
    if superblock_version in (2, 3):
        # ver(1) so(1) sl(1) flags(1) base(8) sbext(8) eof(8) root(8) csum(4)
        sb += bytes([superblock_version, 8, 8, 0])
        sb += struct.pack("<QQQQ", 0, _UNDEF, len(buf.b), root_oh)
        sb += struct.pack("<I", 0)  # checksum slot (reader does not verify)
        assert len(sb) == 48
    else:
        sb += bytes([superblock_version, 0, 0, 0, 0, 8, 8, 0])  # vers + sizes
        sb += struct.pack("<HHI", 4, 16, 0)    # group leaf/internal K, flags
        if superblock_version == 1:
            sb += struct.pack("<HH", 32, 0)    # indexed-storage K + reserved
        sb += struct.pack("<QQQQ", 0, _UNDEF, len(buf.b), _UNDEF)
        sb += struct.pack("<QQI4x16x", 0, root_oh, 0)  # root symbol entry
        assert len(sb) == 96 + (4 if superblock_version == 1 else 0)
    buf.patch(0, bytes(sb))
    return bytes(buf.b)


def _rowmajor(ranges):
    """Cartesian product of ranges in row-major order."""
    if not ranges:
        yield ()
        return
    for head in ranges[0]:
        for tail in _rowmajor(ranges[1:]):
            yield (head, *tail)
