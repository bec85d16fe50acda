"""Minimal pure-Python HDF5/NetCDF4 reader for ERA5-style files (S6).

The reference's core decode is ``xr.open_dataset`` over CDS NetCDF4
bytes (``dask_jobs/aggregate_hourly.py:60``). This container ships no
xarray/h5py/netCDF4, so this module implements the subset of the HDF5
file format (format spec v3.0, public) those files actually use — and
the common nearby variants — from scratch:

* superblock v0/v2/v3;
* object headers v1 (unsigned, with continuation blocks) and v2
  (``OHDR`` / ``OCHK``);
* messages: dataspace v1/v2, datatype (fixed-point, IEEE float,
  fixed string), fill value, layout v3 (compact/contiguous/chunked),
  filter pipeline v1/v2, attribute v1/v3, attribute-info (dense
  attribute storage), link / link-info (new-style groups), symbol
  table (old-style groups), continuation;
* group traversal: old-style (B-tree v1 + SNOD symbol nodes + local
  heap) and new-style (fractal heap ``FRHP``/``FHDB``/``FHIB`` walked
  sequentially — write-once files keep managed objects packed);
* chunked datasets via the v1 chunk B-tree; filters: deflate (zlib)
  and byte-shuffle (numpy de-interleave).

Out of scope (raise cleanly): compound/vlen/reference datatypes, big
-endian data, szip/nbit filters, v2 chunk indexes (Single Chunk /
Fixed Array etc. appear only with libhdf5 ≥1.10 "latest" libver,
which CDS does not use).

Scale note: this is the per-file Python island behind
``netcdf.read_raw_grid``'s ``mapInPandas`` — one file per task, the
grid is melted before it crosses into the JVM. The parser reads from
an in-memory bytes object (files arrive via binaryFile), so there is
no seek amplification.
"""

from __future__ import annotations

import math
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


class Hdf5FormatError(ValueError):
    """Structurally invalid or out-of-scope HDF5 construct."""


# ---------------------------------------------------------------------------
# Datatype / dataspace / message models
# ---------------------------------------------------------------------------

@dataclass
class Datatype:
    kind: str          # "int" | "float" | "string"
    size: int          # bytes per element
    signed: bool = True

    @property
    def np_dtype(self) -> np.dtype:
        if self.kind == "float":
            return np.dtype(f"<f{self.size}")
        if self.kind == "int":
            return np.dtype(f"<{'i' if self.signed else 'u'}{self.size}")
        return np.dtype(f"S{self.size}")


@dataclass
class Dataset:
    name: str
    shape: tuple[int, ...]
    dtype: Datatype
    layout_class: int = -1          # 0 compact, 1 contiguous, 2 chunked
    data_addr: int = _UNDEF         # contiguous address / chunk btree root
    data_size: int = 0
    compact: bytes = b""
    chunk_dims: tuple[int, ...] = ()
    filters: list[tuple[int, list[int]]] = field(default_factory=list)
    fill: bytes | None = None
    attrs: dict[str, object] = field(default_factory=dict)


#: Exceptions a malformed-but-signature-valid file can surface from the
#: raw byte plumbing (slicing, struct, zlib, numpy reshapes, UTF-8) —
#: normalized to Hdf5FormatError at the public boundary so callers (and
#: netcdf.default_decoder's xarray fallback) need one except clause.
_PARSE_ERRORS = (
    IndexError,
    struct.error,
    zlib.error,
    UnicodeDecodeError,
    OverflowError,
    ValueError,
    ZeroDivisionError,  # crafted zero record/element sizes
    RecursionError,  # crafted self-referential B-tree nodes
    MemoryError,  # belt-and-braces behind the explicit size guard
)


class Hdf5File:
    """Read-only view over NetCDF4/HDF5 bytes: {name: Dataset} + root attrs."""

    def __init__(self, buf: bytes):
        if buf[: len(_SIG)] != _SIG:
            raise Hdf5FormatError("not an HDF5 file (bad signature)")
        self.buf = buf
        self.root_attrs: dict[str, object] = {}
        self.datasets: dict[str, Dataset] = {}
        self.addr_to_name: dict[int, str] = {}
        try:
            root_addr = self._parse_superblock()
            for name, addr in self._group_links(root_addr, into=self.root_attrs):
                self.addr_to_name[addr] = name
                ds = self._parse_dataset(name, addr)
                if ds is not None:
                    self.datasets[name] = ds
        except _PARSE_ERRORS as exc:
            raise Hdf5FormatError(
                f"malformed HDF5 structure ({type(exc).__name__}: {exc})"
            ) from exc

    def dim_names(self, name: str) -> list[str] | None:
        """Dimension-scale names of a dataset via its DIMENSION_LIST.

        Returns None when the attribute is absent (pure dim-scale vars
        and scalar vars carry none).
        """
        refs = self.datasets[name].attrs.get("DIMENSION_LIST")
        if refs is None:
            return None
        out = []
        for per_dim in refs:
            addrs = per_dim if isinstance(per_dim, list) else [per_dim]
            out.append(self.addr_to_name.get(addrs[0], "?") if addrs else "?")
        return out

    # -- low-level helpers --------------------------------------------------

    def _u(self, off: int, size: int) -> int:
        return int.from_bytes(self.buf[off : off + size], "little")

    @staticmethod
    def _u_bytes(blob: bytes, off: int, size: int = 8) -> int:
        return int.from_bytes(blob[off : off + size], "little")

    def _parse_superblock(self) -> int:
        ver = self.buf[8]
        if ver in (2, 3):
            so, sl = self.buf[9], self.buf[10]
            if (so, sl) != (8, 8):
                raise Hdf5FormatError(f"unsupported offset/length sizes {so}/{sl}")
            (root,) = struct.unpack_from("<Q", self.buf, 12 + 24)
            return root
        if ver in (0, 1):
            # sig(8) sbver(1) fsver(1) rgver(1) res(1) shver(1) so(1) sl(1)
            # res(1) gleaf(2) ginternal(2) flags(4) [+v1: 2+2]
            so, sl = self.buf[13], self.buf[14]
            if (so, sl) != (8, 8):
                raise Hdf5FormatError(f"unsupported offset/length sizes {so}/{sl}")
            p = 24 + (4 if ver == 1 else 0)
            p += 4 * 8  # base, free-space, eof, driver-info addresses
            # root group symbol table entry: link name offset(8) + OH addr(8)
            return self._u(p + 8, 8)
        raise Hdf5FormatError(f"unsupported superblock version {ver}")

    # -- object headers -----------------------------------------------------

    def _header_messages(self, addr: int) -> list[tuple[int, int, int]]:
        """(msg_type, body_offset, body_size) for a v1 or v2 object header."""
        if self.buf[addr : addr + 4] == b"OHDR":
            return self._v2_messages(addr)
        return self._v1_messages(addr)

    def _v2_messages(self, addr: int) -> list[tuple[int, int, int]]:
        flags = self.buf[addr + 5]
        p = addr + 6
        if flags & 0x20:
            p += 16  # four 4-byte timestamps: access/mod/change/birth
        if flags & 0x10:
            p += 4
        size0 = self._u(p, 1 << (flags & 0x3))
        p += 1 << (flags & 0x3)
        msgs: list[tuple[int, int, int]] = []
        blocks = [(p, p + size0)]
        visited = {p}  # continuation cycle guard: offsets already queued
        while blocks:
            start, end = blocks.pop(0)
            p = start
            while p + 4 <= end:
                mtype = self.buf[p]
                msize = self._u(p + 1, 2)
                p += 4
                if flags & 0x4:
                    p += 2
                if mtype == 16:  # continuation -> OCHK block
                    c_off, c_len = struct.unpack_from("<QQ", self.buf, p)
                    if self.buf[c_off : c_off + 4] != b"OCHK":
                        raise Hdf5FormatError("bad OCHK continuation")
                    if c_off in visited or len(visited) > 4096:
                        raise Hdf5FormatError(
                            "OCHK continuation cycle or block-count bound hit"
                        )
                    visited.add(c_off)
                    blocks.append((c_off + 4, c_off + c_len - 4))
                else:
                    msgs.append((mtype, p, msize))
                p += msize
        return msgs

    def _v1_messages(self, addr: int) -> list[tuple[int, int, int]]:
        ver = self.buf[addr]
        if ver != 1:
            raise Hdf5FormatError(f"unknown object header version {ver}")
        nmsgs = self._u(addr + 2, 2)
        size0 = self._u(addr + 8, 4)
        msgs: list[tuple[int, int, int]] = []
        blocks = [(addr + 16, addr + 16 + size0)]
        seen = 0
        while blocks and seen < nmsgs:
            start, end = blocks.pop(0)
            p = start
            while p + 8 <= end and seen < nmsgs:
                mtype = self._u(p, 2)
                msize = self._u(p + 2, 2)
                p += 8
                seen += 1
                if mtype == 16:
                    c_off, c_len = struct.unpack_from("<QQ", self.buf, p)
                    blocks.append((c_off, c_off + c_len))
                else:
                    msgs.append((mtype, p, msize))
                p += msize
        return msgs

    # -- groups -------------------------------------------------------------

    def _group_links(
        self, addr: int, into: dict[str, object] | None = None
    ) -> list[tuple[str, int]]:
        """(name, object header address) children of a group; root attrs
        (inline attribute messages) are collected into ``into``."""
        links: list[tuple[str, int]] = []
        for mtype, p, msize in self._header_messages(addr):
            if mtype == 2:  # link info: fractal-heap-backed links
                flags = self.buf[p + 1]
                q = p + 2 + (8 if flags & 1 else 0)
                heap_addr = self._u(q, 8)
                btree_addr = self._u(q + 8, 8)
                if heap_addr != _UNDEF:
                    for body in self._fractal_heap_objects(
                        heap_addr, btree_addr, "link"
                    ):
                        links.append(self._parse_link_body(body))
            elif mtype == 6:  # inline link message
                links.append(self._parse_link_body(self.buf[p : p + msize]))
            elif mtype == 17:  # old-style symbol table: btree v1 + local heap
                btree, heap = struct.unpack_from("<QQ", self.buf, p)
                links.extend(self._symbol_table_links(btree, heap))
            elif mtype == 12 and into is not None:
                name, val = self._parse_attribute(p)
                into[name] = val
            elif mtype == 21 and into is not None:
                for aname, aval in self._dense_attributes(p):
                    into[aname] = aval
        return links

    def _parse_link_body(self, body: bytes) -> tuple[str, int]:
        ver, flags = body[0], body[1]
        if ver != 1:
            raise Hdf5FormatError(f"unknown link message version {ver}")
        q = 2
        ltype = 0
        if flags & 0x8:
            ltype = body[q]
            q += 1
        if flags & 0x4:
            q += 8
        if flags & 0x10:
            q += 1
        nsize = 1 << (flags & 0x3)
        nlen = int.from_bytes(body[q : q + nsize], "little")
        q += nsize
        name = body[q : q + nlen].decode("utf-8")
        q += nlen
        if ltype != 0:
            raise Hdf5FormatError(f"non-hard link {name!r} unsupported")
        (target,) = struct.unpack_from("<Q", body, q)
        return name, target

    def _symbol_table_links(self, btree: int, heap: int) -> list[tuple[str, int]]:
        if self.buf[heap : heap + 4] != b"HEAP":
            raise Hdf5FormatError("bad local heap")
        heap_data = self._u(heap + 24, 8)
        out: list[tuple[str, int]] = []

        def walk(node: int) -> None:
            sig = self.buf[node : node + 4]
            if sig == b"TREE":
                level = self.buf[node + 5]
                nused = self._u(node + 6, 2)
                p = node + 24 + 8  # skip first key (length 8 for group nodes)
                for _ in range(nused):
                    child = self._u(p, 8)
                    p += 16  # child address + next key
                    if level > 0:
                        walk(child)
                    else:
                        walk_snod(child)
            else:
                walk_snod(node)

        def walk_snod(node: int) -> None:
            if self.buf[node : node + 4] != b"SNOD":
                raise Hdf5FormatError("bad symbol node")
            nsym = self._u(node + 6, 2)
            p = node + 8
            for _ in range(nsym):
                name_off, obj_addr = struct.unpack_from("<QQ", self.buf, p)
                s = heap_data + name_off
                e = self.buf.index(b"\x00", s)
                out.append((self.buf[s:e].decode("utf-8"), obj_addr))
                p += 40  # symbol table entry size

        walk(btree)
        return out

    # -- fractal heap + v2 B-tree (links + dense attributes) ----------------

    def _fractal_heap(self, addr: int) -> "_FractalHeap":
        """Parse an FRHP header into a heap-offset → file-offset mapper."""
        if self.buf[addr : addr + 4] != b"FRHP":
            raise Hdf5FormatError("bad fractal heap header")
        heap_id_len = self._u(addr + 5, 2)
        if self._u(addr + 7, 2):
            raise Hdf5FormatError("filtered fractal heaps unsupported")
        p = addr + 10 + 4 + 12 * 8
        table_width = self._u(p, 2)
        start_block = self._u(p + 2, 8)
        max_direct = self._u(p + 10, 8)
        max_heap_log2 = self._u(p + 18, 2)
        p += 22
        root_block = self._u(p, 8)
        cur_rows = self._u(p + 8, 2)
        off_size = (max_heap_log2 + 7) // 8

        # (heap offset, size, file addr) per existing direct block —
        # heap offsets cover whole blocks (headers included), assigned
        # in doubling-table order: rows of `table_width` blocks, rows 0
        # and 1 at start_block size, row r doubling thereafter.
        blocks: list[tuple[int, int, int]] = []
        if cur_rows * table_width > 1 << 20:  # crafted-count walk bound
            raise Hdf5FormatError(
                f"implausible fractal heap table {cur_rows}x{table_width}"
            )
        if cur_rows == 0:  # root IS a single direct block
            blocks.append((0, start_block, root_block))
        else:
            ib = root_block
            if self.buf[ib : ib + 4] != b"FHIB":
                raise Hdf5FormatError("bad fractal heap indirect block")
            q = ib + 4 + 1 + 8 + off_size
            heap_off = 0
            for row in range(cur_rows):
                size = start_block * (1 << max(0, row - 1))
                if size > max_direct:
                    raise Hdf5FormatError(
                        "nested indirect heap blocks unsupported"
                    )
                for _ in range(table_width):
                    child = self._u(q, 8)
                    q += 8
                    if child != _UNDEF:
                        blocks.append((heap_off, size, child))
                    heap_off += size
        for hoff, size, faddr in blocks:
            if self.buf[faddr : faddr + 4] != b"FHDB":
                raise Hdf5FormatError("bad fractal heap direct block")
        return _FractalHeap(heap_id_len, off_size, blocks)

    def _heap_object(self, heap: "_FractalHeap", heap_id: bytes) -> bytes:
        """Resolve a managed heap ID to the object's bytes."""
        idtype = (heap_id[0] >> 4) & 0x3
        if idtype != 0:
            raise Hdf5FormatError(f"non-managed heap id type {idtype}")
        off = int.from_bytes(heap_id[1 : 1 + heap.off_size], "little")
        length_size = heap.id_len - 1 - heap.off_size
        length = int.from_bytes(
            heap_id[1 + heap.off_size : 1 + heap.off_size + length_size],
            "little",
        )
        for hoff, size, faddr in heap.blocks:
            if hoff <= off < hoff + size:
                return self.buf[faddr + (off - hoff) : faddr + (off - hoff) + length]
        raise Hdf5FormatError(f"heap offset {off} outside any direct block")

    def _btree2_records(self, addr: int) -> list[bytes]:
        """All records of a v2 B-tree, in tree order (depth ≤ 2)."""
        if self.buf[addr : addr + 4] != b"BTHD":
            raise Hdf5FormatError("bad v2 B-tree header")
        node_size = self._u(addr + 6, 4)
        record_size = self._u(addr + 10, 2)
        depth = self._u(addr + 12, 2)
        root = self._u(addr + 16, 8)
        root_nrec = self._u(addr + 24, 2)
        if root == _UNDEF or root_nrec == 0:
            return []
        # child-pointer "number of records" field width: bytes covering
        # the max record count a leaf can hold (spec's size computation)
        max_leaf = (node_size - 10) // record_size
        nrec_size = (max_leaf.bit_length() + 7) // 8

        out: list[bytes] = []

        def leaf(node: int, nrec: int) -> None:
            if self.buf[node : node + 4] != b"BTLF":
                raise Hdf5FormatError("bad v2 B-tree leaf")
            p = node + 6
            for i in range(nrec):
                out.append(self.buf[p + i * record_size : p + (i + 1) * record_size])

        def internal(node: int, nrec: int, level: int) -> None:
            if self.buf[node : node + 4] != b"BTIN":
                raise Hdf5FormatError("bad v2 B-tree internal node")
            if level > 1:
                raise Hdf5FormatError("v2 B-trees deeper than 2 unsupported")
            recs = node + 6
            ptrs = recs + nrec * record_size
            step = 8 + nrec_size
            for i in range(nrec + 1):
                child = self._u(ptrs + i * step, 8)
                child_n = self._u(ptrs + i * step + 8, nrec_size)
                leaf(child, child_n)
                if i < nrec:
                    out.append(
                        self.buf[
                            recs + i * record_size : recs + (i + 1) * record_size
                        ]
                    )

        if depth == 0:
            leaf(root, root_nrec)
        else:
            internal(root, root_nrec, depth)
        return out

    def _fractal_heap_objects(self, heap_addr: int, btree_addr: int,
                              record_kind: str) -> list[bytes]:
        """Managed objects of a fractal heap, located via its name index.

        record_kind 'link' → B-tree record type 5 (hash 4B + heap id 7B);
        'attr' → type 8 (heap id 8B + flags 1B + corder 4B + hash 4B).
        """
        heap = self._fractal_heap(heap_addr)
        out = []
        for rec in self._btree2_records(btree_addr):
            if record_kind == "link":
                heap_id = rec[4 : 4 + heap.id_len]
            else:
                heap_id = rec[0 : heap.id_len]
            out.append(self._heap_object(heap, heap_id))
        return out

    # -- attributes ----------------------------------------------------------

    def _dense_attributes(self, p: int) -> list[tuple[str, object]]:
        flags = self.buf[p + 1]
        q = p + 2 + (2 if flags & 1 else 0)
        heap_addr = self._u(q, 8)
        btree_addr = self._u(q + 8, 8)
        if heap_addr == _UNDEF:
            return []
        out = []
        for body in self._fractal_heap_objects(heap_addr, btree_addr, "attr"):
            name, val, _ = self._parse_attribute(None, raw=body)
            out.append((name, val))
        return out

    def _parse_attribute(
        self, p: int | None, raw: bytes | None = None
    ) -> tuple:
        """Parse an attribute message at buf[p] or from raw bytes.

        Returns (name, value) when reading from the buffer, and
        (name, value, consumed_bytes) when reading from raw (the
        sequential fractal-heap walk needs the length).
        """
        body = self.buf[p:] if raw is None else raw
        ver = body[0]
        if ver == 1:
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            q = 8
            pad = lambda n: (n + 7) & ~7  # noqa: E731 - v1 pads to 8
            name = body[q : q + name_size].split(b"\x00")[0].decode("utf-8")
            q += pad(name_size)
            dtype = self._parse_datatype(body[q : q + dt_size])
            q += pad(dt_size)
            shape = self._parse_dataspace(body[q : q + ds_size])
            q += pad(ds_size)
        elif ver == 3:
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            q = 9  # +1 name character-set encoding
            name = body[q : q + name_size].split(b"\x00")[0].decode("utf-8")
            q += name_size
            dtype = self._parse_datatype(body[q : q + dt_size])
            q += dt_size
            shape = self._parse_dataspace(body[q : q + ds_size])
            q += ds_size
        else:
            raise Hdf5FormatError(f"attribute message version {ver} unsupported")
        n = int(np.prod(shape)) if shape else 1
        if dtype.kind == "vlen":
            # vlen sequence (DIMENSION_LIST shape): per element a
            # (count, gheap addr, gheap index) triple; payload in the
            # global heap — interpreted as 8-byte object references,
            # the only vlen-sequence base these files carry.
            vals = []
            for i in range(n):
                cnt, gaddr, gidx = struct.unpack_from("<IQI", body, q + 16 * i)
                blob = self._global_heap_object(gaddr, gidx)
                vals.append(
                    [self._u_bytes(blob, 8 * j) for j in range(cnt)]
                )
            q += 16 * n
            value: object = vals[0] if n == 1 else vals
            if raw is None:
                return name, value
            return name, value, q
        if dtype.kind == "vlen_string":
            vals = []
            for i in range(n):
                _vlen, gaddr, gidx = struct.unpack_from("<IQI", body, q + 16 * i)
                vals.append(self._global_heap_object(gaddr, gidx).decode(
                    "utf-8", "replace"
                ))
            q += 16 * n
            value: object = vals[0] if n == 1 else vals
        else:
            nbytes = n * dtype.size
            payload = body[q : q + nbytes]
            q += nbytes
            if dtype.kind == "string":
                value = payload.split(b"\x00")[0].decode("utf-8", "replace")
            elif dtype.kind in ("opaque", "reference"):
                value = payload  # raw bytes; length-exact skip
            else:
                arr = np.frombuffer(payload, dtype=dtype.np_dtype)
                value = arr[0].item() if n == 1 else arr.tolist()
        if raw is None:
            return name, value
        return name, value, q

    def _global_heap_object(self, addr: int, index: int) -> bytes:
        """Object ``index`` of the GCOL global-heap collection at addr."""
        if self.buf[addr : addr + 4] != b"GCOL":
            raise Hdf5FormatError("bad global heap collection")
        total = self._u(addr + 8, 8)
        p = addr + 16
        end = addr + total
        while p + 16 <= end:
            oidx = self._u(p, 2)
            osize = self._u(p + 8, 8)
            if oidx == 0:  # free space marker terminates the collection
                break
            if oidx == index:
                return self.buf[p + 16 : p + 16 + osize]
            p += 16 + ((osize + 7) & ~7)
        raise Hdf5FormatError(f"global heap object {index} not found")

    # -- datatype / dataspace -----------------------------------------------

    def _parse_datatype(self, body: bytes) -> Datatype:
        cls = body[0] & 0x0F
        bits0 = body[1]
        size = struct.unpack_from("<I", body, 4)[0]
        if cls == 0:  # fixed-point
            if bits0 & 0x1:
                raise Hdf5FormatError("big-endian integers unsupported")
            return Datatype("int", size, signed=bool(bits0 & 0x8))
        if cls == 1:  # IEEE float
            if bits0 & 0x1:
                raise Hdf5FormatError("big-endian floats unsupported")
            if size not in (4, 8):
                raise Hdf5FormatError(f"float size {size} unsupported")
            return Datatype("float", size)
        if cls == 3:  # fixed-length string
            return Datatype("string", size)
        if cls == 9 and (bits0 & 0x0F) == 1:  # variable-length string
            return Datatype("vlen_string", size)  # element = 4+8+4 ref
        if cls == 9:  # vlen sequence (e.g. DIMENSION_LIST: vlen of refs)
            return Datatype("vlen", 16)
        if cls == 7:  # object reference
            return Datatype("reference", size)
        # Anything else (compound REFERENCE_LIST, opaque, enum…): the
        # size field is still bytes-per-element, so attributes of these
        # types can be SKIPPED exactly; reading a dataset of one raises.
        return Datatype("opaque", size)

    def _parse_dataspace(self, body: bytes) -> tuple[int, ...]:
        ver = body[0]
        rank = body[1]
        if ver == 1:
            q = 8
        elif ver == 2:
            q = 4
        else:
            raise Hdf5FormatError(f"dataspace version {ver} unsupported")
        return tuple(
            struct.unpack_from("<Q", body, q + 8 * i)[0] for i in range(rank)
        )

    # -- datasets ------------------------------------------------------------

    def _parse_dataset(self, name: str, addr: int) -> Dataset | None:
        shape: tuple[int, ...] | None = None
        dtype: Datatype | None = None
        ds = Dataset(name=name, shape=(), dtype=Datatype("int", 1))
        for mtype, p, msize in self._header_messages(addr):
            if mtype == 1:
                shape = self._parse_dataspace(self.buf[p : p + msize])
            elif mtype == 3:
                # Out-of-scope element types (vlen strings like ERA5's
                # `expver`) surface on read(), not on open — the file
                # stays usable for every supported variable.
                try:
                    dtype = self._parse_datatype(self.buf[p : p + msize])
                except Hdf5FormatError:
                    dtype = Datatype("unsupported", 0)
            elif mtype == 5:  # fill value (new)
                ver = self.buf[p]
                if ver in (1, 2):
                    defined = self.buf[p + 3]
                    q = p + 4
                    if ver == 1 or defined:
                        fsize = self._u(q, 4)
                        ds.fill = self.buf[q + 4 : q + 4 + fsize]
                elif ver == 3:
                    flags = self.buf[p + 1]
                    if flags & 0x20:
                        fsize = self._u(p + 2, 4)
                        ds.fill = self.buf[p + 6 : p + 6 + fsize]
            elif mtype == 8:
                self._parse_layout(ds, p)
            elif mtype == 11:
                self._parse_filters(ds, p)
            elif mtype == 12:
                aname, aval = self._parse_attribute(p)
                ds.attrs[aname] = aval
            elif mtype == 21:
                for aname, aval in self._dense_attributes(p):
                    ds.attrs[aname] = aval
            elif mtype == 17 or mtype == 2:
                return None  # a subgroup, not a dataset
        if shape is None or dtype is None:
            return None  # not a dataset (no dataspace/datatype)
        ds.shape = shape
        ds.dtype = dtype
        return ds

    def _parse_layout(self, ds: Dataset, p: int) -> None:
        ver = self.buf[p]
        if ver != 3:
            raise Hdf5FormatError(f"data layout version {ver} unsupported")
        cls = self.buf[p + 1]
        ds.layout_class = cls
        if cls == 0:  # compact
            size = self._u(p + 2, 2)
            ds.compact = self.buf[p + 4 : p + 4 + size]
        elif cls == 1:  # contiguous
            ds.data_addr, ds.data_size = struct.unpack_from("<QQ", self.buf, p + 2)
        elif cls == 2:  # chunked, v1 B-tree index
            rank = self.buf[p + 2]  # = dataset rank + 1
            ds.data_addr = self._u(p + 3, 8)
            ds.chunk_dims = tuple(
                self._u(p + 11 + 4 * i, 4) for i in range(rank - 1)
            )
        else:
            raise Hdf5FormatError(f"layout class {cls} unsupported")

    def _parse_filters(self, ds: Dataset, p: int) -> None:
        ver = self.buf[p]
        nfilters = self.buf[p + 1]
        q = p + 8 if ver == 1 else p + 2
        for _ in range(nfilters):
            fid = self._u(q, 2)
            q += 2
            if ver == 1 or fid >= 256:
                name_len = self._u(q, 2)
                q += 2
            else:
                name_len = 0
            q += 2  # flags
            nvals = self._u(q, 2)
            q += 2
            q += name_len
            if ver == 1 and name_len % 8:
                q += 8 - name_len % 8
            cvals = [self._u(q + 4 * i, 4) for i in range(nvals)]
            q += 4 * nvals
            if ver == 1 and nvals % 2:
                q += 4
            ds.filters.append((fid, cvals))

    # -- data access ----------------------------------------------------------

    def read(self, name: str) -> np.ndarray:
        """Decode a dataset to a numpy array (filters applied, C order)."""
        ds = self.datasets[name]
        if ds.dtype.kind not in ("int", "float", "string"):
            raise Hdf5FormatError(
                f"dataset {name!r} has an unsupported element type "
                f"({ds.dtype.kind})"
            )
        # Allocation sanity bound: a decoded dataset can exceed the file
        # only by filter expansion (deflate tops out near 1032:1); a
        # crafted dataspace claiming exabytes must raise, not malloc.
        nbytes = math.prod(ds.shape) * max(ds.dtype.size, 1)
        if nbytes > max(2048 * len(self.buf), 1 << 27):
            raise Hdf5FormatError(
                f"dataset {name!r} claims implausible size {nbytes} bytes"
            )
        dt = ds.dtype.np_dtype
        try:
            if ds.layout_class == 0:
                return np.frombuffer(ds.compact, dtype=dt).reshape(ds.shape)
            if ds.layout_class == 1:
                if ds.data_addr == _UNDEF:  # never written: all fill
                    return np.full(ds.shape, self._fill_value(ds), dtype=dt)
                raw = self.buf[ds.data_addr : ds.data_addr + ds.data_size]
                return np.frombuffer(raw, dtype=dt).reshape(ds.shape)
            if ds.layout_class == 2:
                return self._read_chunked(ds)
        except Hdf5FormatError:
            raise
        except _PARSE_ERRORS as exc:
            raise Hdf5FormatError(
                f"malformed data for dataset {name!r} "
                f"({type(exc).__name__}: {exc})"
            ) from exc
        raise Hdf5FormatError(f"dataset {name!r} has no layout")

    def _fill_value(self, ds: Dataset):
        if ds.fill:
            return np.frombuffer(ds.fill, dtype=ds.dtype.np_dtype)[0]
        return np.nan if ds.dtype.kind == "float" else 0

    def _read_chunked(self, ds: Dataset) -> np.ndarray:
        dt = ds.dtype.np_dtype
        out = np.full(ds.shape, self._fill_value(ds), dtype=dt)
        if ds.data_addr == _UNDEF:
            return out
        rank = len(ds.shape)
        for offsets, size, _mask, addr in self._chunk_btree(ds.data_addr, rank):
            raw = self.buf[addr : addr + size]
            chunk = self._apply_filters(ds, raw)
            arr = np.frombuffer(chunk, dtype=dt).reshape(ds.chunk_dims)
            sel = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(offsets, ds.chunk_dims, ds.shape)
            )
            clip = tuple(slice(0, s.stop - s.start) for s in sel)
            out[sel] = arr[clip]
        return out

    def _chunk_btree(self, addr: int, rank: int):
        """Yield (chunk offsets, stored size, filter mask, data address)."""
        sig = self.buf[addr : addr + 4]
        if sig != b"TREE":
            raise Hdf5FormatError("chunk index is not a v1 B-tree "
                                  "(v2 chunk indexes unsupported)")
        level = self.buf[addr + 5]
        nused = self._u(addr + 6, 2)
        key_size = 8 + 8 * (rank + 1)  # size(4)+mask(4)+offsets(8*(rank+1))
        p = addr + 24
        for _ in range(nused):
            size = self._u(p, 4)
            mask = self._u(p + 4, 4)
            offsets = tuple(
                self._u(p + 8 + 8 * i, 8) for i in range(rank)
            )
            p += key_size
            child = self._u(p, 8)
            p += 8
            if level > 0:
                yield from self._chunk_btree(child, rank)
            else:
                yield offsets, size, mask, child

    def _apply_filters(self, ds: Dataset, raw: bytes) -> bytes:
        data = raw
        for fid, cvals in reversed(ds.filters):
            if fid == 1:  # deflate — bound output to the declared chunk
                # size so a crafted deflate bomb raises instead of
                # allocating unbounded memory.
                bound = math.prod(ds.chunk_dims or (1,)) * max(
                    ds.dtype.size, 1
                )
                d = zlib.decompressobj()
                data = d.decompress(data, bound)
                # Overflow check must be unconditional: zlib can hold
                # pending OUTPUT with all input consumed (empty
                # unconsumed_tail), so probe for buffered bytes either
                # way; a stream that ends before eof is a truncated or
                # crafted chunk — fail here with the format error, not
                # downstream with a shape mismatch.
                if (
                    d.unconsumed_tail
                    or d.decompress(b"", 1)
                    or not d.eof
                ):
                    raise Hdf5FormatError(
                        "deflate chunk exceeds or undershoots declared "
                        "chunk size"
                    )
            elif fid == 2:  # shuffle
                (esize,) = cvals[:1] or (ds.dtype.size,)
                arr = np.frombuffer(data, dtype=np.uint8)
                data = (
                    arr.reshape(esize, len(arr) // esize).T.tobytes()
                )
            elif fid == 3:  # fletcher32 checksum: payload + 4 bytes
                data = data[:-4]
            else:
                raise Hdf5FormatError(f"filter id {fid} unsupported")
        return data


@dataclass
class _FractalHeap:
    """Heap-ID resolution context: ID width + direct-block map."""

    id_len: int
    off_size: int
    blocks: list[tuple[int, int, int]]  # (heap offset, size, file addr)


# ---------------------------------------------------------------------------
# NetCDF4 (CF) layer: coordinates, time decoding, long-form melt
# ---------------------------------------------------------------------------

_TIME_NAMES = ("valid_time", "time")
_LAT_NAMES = ("latitude", "lat")
_LON_NAMES = ("longitude", "lon")

#: CF "since" units → numpy timedelta unit
_TIME_UNITS = {
    "seconds": "s", "second": "s",
    "minutes": "m", "minute": "m",
    "hours": "h", "hour": "h",
    "days": "D", "day": "D",
}


def decode_cf_time(values: np.ndarray, units: str) -> np.ndarray:
    """CF time decode: '<unit> since <epoch>' → datetime64[ns].

    Handles the epoch spellings CF files actually carry: bare dates,
    'YYYY-MM-DD HH:MM:SS[.f]' (classic ERA5: 'hours since 1900-01-01
    00:00:00.0'), and UTC designators ('Z', '+00:00', ' UTC') — all
    naive-UTC here, matching the reference's TIMESTAMP-not-TIMESTAMPTZ
    convention. Non-UTC offsets are out of scope and raise.

    Integer counts convert exactly; float counts (e.g. climatology
    'days since' with fractional days, or unpacked scale_factor time)
    split into whole + fractional parts so the whole part stays exact
    and only the sub-unit remainder goes through float maths.
    """
    parts = units.split(" since ")
    if len(parts) != 2 or parts[0].strip().lower() not in _TIME_UNITS:
        raise Hdf5FormatError(f"unsupported time units {units!r}")
    unit = _TIME_UNITS[parts[0].strip().lower()]
    epoch = parts[1].strip()
    for suffix in ("Z", "+00:00", "+0000", "+00", "UTC"):
        if epoch.endswith(suffix):
            epoch = epoch[: -len(suffix)].strip()
    if "+" in epoch or epoch.count("-") > 2:  # a non-UTC offset remains
        raise Hdf5FormatError(f"non-UTC time origin {parts[1]!r}")
    origin = np.datetime64(epoch.replace(" ", "T"), "ns")
    if np.issubdtype(values.dtype, np.floating):
        if np.isnan(values).any():
            raise Hdf5FormatError("NaN in CF time coordinate")
        whole = np.floor(values)
        frac = values - whole
        unit_ns = np.timedelta64(1, unit) // np.timedelta64(1, "ns")
        deltas = whole.astype(np.int64).astype(
            f"timedelta64[{unit}]"
        ).astype("timedelta64[ns]") + np.rint(frac * unit_ns).astype(
            np.int64
        ).astype("timedelta64[ns]")
        return origin + deltas
    return origin + values.astype(f"timedelta64[{unit}]").astype("timedelta64[ns]")


def cf_mask_and_scale(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """CF packed-data decode, the twin of xarray's default
    ``open_dataset(..., mask_and_scale=True)`` (reference:
    flows/aggregate_hourly_batch.py xr.open_dataset path).

    Short-packed CDS/ERA5 variants store int16 counts with
    ``scale_factor``/``add_offset`` and a ``_FillValue`` sentinel
    (classically -32767). Masking happens on the RAW packed values
    first (fill → NaN), then ``raw * scale + offset`` unpacks to
    physical units. Without attrs the array passes through untouched,
    so the all-float committed CDS files decode bit-identically to
    before.
    """
    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    fills = [
        attrs[k] for k in ("_FillValue", "missing_value") if k in attrs
    ]
    if scale is None and offset is None and not fills:
        return arr
    out = arr.astype(np.float64)
    for fv in fills:
        for s in np.asarray(fv, dtype=np.float64).ravel():
            if np.isnan(s):
                continue  # NaN fills are already NaN after the cast
            out[out == s] = np.nan  # raw-value compare: out is still packed
    if scale is not None:
        out = out * float(np.asarray(scale).ravel()[0])
    if offset is not None:
        out = out + float(np.asarray(offset).ravel()[0])
    return out


def era5_frame(nc_bytes: bytes, variables: list[str]):
    """Decode ERA5-style NetCDF4 bytes to the long-form decode frame.

    The pure-Python twin of the reference's ``xr.open_dataset(...)
    .to_dataframe().reset_index()`` path (aggregate_hourly.py:60-88):
    columns ``ts, latitude, longitude, <var>...`` with one row per
    grid cell per time step. Variables are presence-gated (S7); data
    dims resolve via DIMENSION_LIST and are transposed to
    (time, lat, lon) whatever their stored order. NaN fills stay NaN
    (→ NULL after Arrow), preserving skipna mean semantics.
    """
    import pandas as pd

    f = Hdf5File(nc_bytes)

    def find(names: tuple[str, ...]) -> str | None:
        return next((n for n in names if n in f.datasets), None)

    time_name = find(_TIME_NAMES)
    lat_name = find(_LAT_NAMES)
    lon_name = find(_LON_NAMES)
    if time_name is None or lat_name is None or lon_name is None:
        raise Hdf5FormatError(
            f"missing coordinate variables (have {sorted(f.datasets)})"
        )
    time_raw = cf_mask_and_scale(
        f.read(time_name), f.datasets[time_name].attrs
    )
    units = str(f.datasets[time_name].attrs.get("units", "seconds since 1970-01-01"))
    ts = decode_cf_time(time_raw, units)
    lat = cf_mask_and_scale(
        f.read(lat_name), f.datasets[lat_name].attrs
    ).astype(np.float64)
    lon = cf_mask_and_scale(
        f.read(lon_name), f.datasets[lon_name].attrs
    ).astype(np.float64)

    present = [v for v in variables if v in f.datasets]
    if not present:
        raise ValueError(
            f"no requested variable of {variables} present "
            f"(file has {sorted(f.datasets)})"
        )

    nt, nlat, nlon = len(ts), len(lat), len(lon)
    cols: dict[str, np.ndarray] = {
        # C-order melt over (time, lat, lon) — identical to xarray's
        # to_dataframe() index order for these dims.
        "ts": np.repeat(ts, nlat * nlon),
        "latitude": np.tile(np.repeat(lat, nlon), nt),
        "longitude": np.tile(lon, nt * nlat),
    }
    want_order = [time_name, lat_name, lon_name]
    for v in present:
        arr = cf_mask_and_scale(f.read(v), f.datasets[v].attrs)
        dims = f.dim_names(v) or want_order[: arr.ndim]
        if sorted(dims) != sorted(want_order):
            raise Hdf5FormatError(
                f"variable {v!r} has dims {dims}, expected a permutation "
                f"of {want_order}"
            )
        arr = np.transpose(arr, [dims.index(d) for d in want_order])
        cols[v] = np.ascontiguousarray(arr, dtype=np.float64).reshape(-1)
    frame = pd.DataFrame(cols)
    frame["ts"] = frame["ts"].astype("datetime64[us]")
    return frame
