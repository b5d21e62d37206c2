"""Minimal from-scratch HDF5 subset — pure python + numpy, no h5py.

Implements exactly the on-disk surface the reference model layout needs
(`/root/reference/tslearn/hdftools/hdftools.py:8-150` stores one group
per nested-dict level, numpy arrays / scalars as datasets, and a
``dtype`` attribute on re-typed string arrays):

* superblock version 0 (offsets/lengths = 8 bytes),
* version-1 object headers,
* old-style groups (local heap + SNOD symbol-table nodes + a single
  v1 B-tree leaf node),
* contiguous datasets (layout message v3) of fixed-point, IEEE-float
  and fixed-length UTF-8 string datatypes (scalar or N-d simple
  dataspaces),
* version-1 attribute messages (used for the ``dtype`` tag).

Deliberate deviations from what h5py would write, all inside valid
HDF5: unicode arrays are stored as FIXED-length null-padded UTF-8
strings (plus the same ``dtype`` attribute the h5py path writes) rather
than variable-length strings — vlen WRITE support needs a global heap
allocator this writer omits; booleans are stored as uint8 with a
``dtype`` tag rather than h5py's enum convention.  Files written by
this module load back losslessly through :func:`load_dict`.

The READER additionally accepts variable-length string datasets and
attributes (datatype class 9 descriptors resolved through GCOL global
heap collections, spec III.E) — the layout h5py/libhdf5 writes for str
data in old (pre-1.8 compatible) format files — so h5py-written model
files load in h5py-less environments.  The vlen round-trip is pinned by
a spec-handcrafted fixture in tests/test_hdftools.py (no h5py exists in
this sandbox to generate a native one; if a cross-env check ever flags
a divergence, compare against a real h5py file first).  h5py remains
preferred at runtime whenever it imports — see
:mod:`tslearn_spark.hdftools`.

Format references: the public HDF5 File Format Specification v2
(superblock v0, object header v1, B-link trees, local heaps, symbol
table nodes) — the same public layout libhdf5 writes for pre-1.8
compatibility mode.
"""

from __future__ import annotations

import os
import struct
from typing import Any

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF

# superblock v0 constants: the K values bound SNOD / B-tree fanout
_LEAF_K = 4          # a SNOD holds up to 2*_LEAF_K = 8 symbols
_INTERNAL_K = 16     # a B-tree node holds up to 2*_INTERNAL_K children
_SNOD_CAP = 2 * _LEAF_K
_BTREE_NODE_SIZE = 24 + (2 * _INTERNAL_K + 1) * 8 + (2 * _INTERNAL_K) * 8
_SNOD_SIZE = 8 + _SNOD_CAP * 40

# object-header message type ids (HDF5 spec IV.A.2)
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_LAYOUT = 0x0008
_MSG_ATTRIBUTE = 0x000C
_MSG_SYMBOL_TABLE = 0x0011


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# ---------------------------------------------------------------- datatypes

def _dt_message(dtype: np.dtype) -> bytes:
    """Datatype message body (version 1) for a numpy dtype."""
    dtype = np.dtype(dtype)
    if dtype.kind in "iu":
        size = dtype.itemsize
        bits = 0x08 if dtype.kind == "i" else 0x00  # bit 3: signed
        head = struct.pack("<B3sI", (1 << 4) | 0,
                           bytes([bits, 0, 0]), size)
        props = struct.pack("<HH", 0, 8 * size)
        return head + props
    if dtype.kind == "f":
        size = dtype.itemsize
        if size == 8:
            sign, exp_loc, exp_sz, man_sz, bias = 63, 52, 11, 52, 1023
        elif size == 4:
            sign, exp_loc, exp_sz, man_sz, bias = 31, 23, 8, 23, 127
        else:
            raise TypeError(f"unsupported float width {size}")
        # bit field: LE order, implied-msb mantissa normalization (0x20),
        # sign-bit location in the second byte
        head = struct.pack("<B3sI", (1 << 4) | 1,
                           bytes([0x20, sign, 0]), size)
        props = struct.pack("<HHBBBBI", 0, 8 * size, exp_loc, exp_sz,
                            0, man_sz, bias)
        return head + props
    if dtype.kind == "S":
        # fixed-length string, null-padded (1), UTF-8 charset (1 << 4)
        return struct.pack("<B3sI", (1 << 4) | 3,
                           bytes([0x11, 0, 0]), max(dtype.itemsize, 1))
    raise TypeError(f"unsupported dtype {dtype}")


def _parse_datatype(body: bytes) -> tuple[str, int]:
    """-> (numpy dtype string | 'str', element size)."""
    cls = body[0] & 0x0F
    bits = body[1]
    size = struct.unpack("<I", body[4:8])[0]
    if cls == 0:  # fixed-point
        kind = "i" if bits & 0x08 else "u"
        return f"<{kind}{size}", size
    if cls == 1:  # float
        return f"<f{size}", size
    if cls == 3:  # string
        return "str", size
    if cls == 9:  # variable-length (read-only support; writer never emits)
        if (bits & 0x0F) != 1:
            raise TypeError("only variable-length STRINGS supported "
                            "(vlen sequences are not)")
        # each element is a 16-byte descriptor: uint32 byte length +
        # 12-byte global heap ID (collection address + object index)
        return "vlen-str", size
    raise TypeError(f"unsupported HDF5 datatype class {cls}")


# ---------------------------------------------------------------- dataspace

def _ds_message(shape: tuple[int, ...]) -> bytes:
    """Simple/scalar dataspace message body (version 1)."""
    body = struct.pack("<BBBB4x", 1, len(shape), 0, 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    version, rank = body[0], body[1]
    if version == 1:
        off = 8
    elif version == 2:
        off = 4
    else:
        raise TypeError(f"unsupported dataspace version {version}")
    return tuple(struct.unpack("<Q", body[off + 8 * i:off + 8 * i + 8])[0]
                 for i in range(rank))


# ---------------------------------------------------------------- writer

class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray(96)  # superblock placeholder, patched last

    def alloc(self, data: bytes) -> int:
        if len(self.buf) % 8:
            self.buf += b"\x00" * (-len(self.buf) % 8)
        addr = len(self.buf)
        self.buf += data
        return addr

    # -- messages -> object header ---------------------------------------
    def _object_header(self, messages: list[tuple[int, bytes]]) -> int:
        blocks = b""
        for mtype, body in messages:
            body = _pad8(body)
            blocks += struct.pack("<HHB3x", mtype, len(body), 0) + body
        head = struct.pack("<BxHII4x", 1, len(messages), 1, len(blocks))
        return self.alloc(head + blocks)

    def _attr_message(self, name: str, value: Any) -> tuple[int, bytes]:
        """Version-1 attribute message holding a scalar string value."""
        raw = str(value).encode("utf-8")
        nameb = name.encode("utf-8") + b"\x00"
        dt = _dt_message(np.dtype(f"S{len(raw)}"))
        ds = _ds_message(())
        body = struct.pack("<BxHHH", 1, len(nameb), len(dt), len(ds))
        body += _pad8(nameb) + _pad8(dt) + _pad8(ds) + raw
        return (_MSG_ATTRIBUTE, body)

    def write_dataset(self, arr: np.ndarray, attrs: dict | None = None) -> int:
        raw = arr.tobytes()
        data_addr = self.alloc(raw) if raw else UNDEF
        messages = [
            (_MSG_DATASPACE, _ds_message(arr.shape)),
            (_MSG_DATATYPE, _dt_message(arr.dtype)),
            (_MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, data_addr, len(raw))),
        ]
        for k, v in (attrs or {}).items():
            messages.append(self._attr_message(k, v))
        return self._object_header(messages)

    def write_group(self, entries: list[tuple[str, int]]) -> int:
        """entries: (name, object header address); returns group OH addr."""
        entries = sorted(entries, key=lambda kv: kv[0].encode("utf-8"))
        # local heap: offset 0 holds the empty string (B-tree key 0)
        heap_data = bytearray(8)
        name_off = {}
        for name, _ in entries:
            name_off[name] = len(heap_data)
            heap_data += _pad8(name.encode("utf-8") + b"\x00")
        heap_data_addr = self.alloc(bytes(heap_data))
        heap_addr = self.alloc(
            b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                  heap_data_addr))
        if not entries:
            btree_addr = UNDEF
        else:
            # symbol-table nodes of <= _SNOD_CAP sorted entries each
            snod_addrs, last_names = [], []
            for i in range(0, len(entries), _SNOD_CAP):
                chunk = entries[i:i + _SNOD_CAP]
                snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(chunk)))
                for name, oh_addr in chunk:
                    snod += struct.pack("<QQI4x16x", name_off[name],
                                        oh_addr, 0)
                snod_addrs.append(self.alloc(
                    bytes(snod.ljust(_SNOD_SIZE, b"\x00"))))
                last_names.append(chunk[-1][0])
            # one B-tree leaf node: key_0 = empty string, key_{i+1} = the
            # largest name in child i (group-node key semantics).  The
            # single-leaf layout holds at most 2*_INTERNAL_K children —
            # beyond that the entry count exceeds the node size the
            # superblock declares, and external libhdf5 readers (which
            # validate K) would reject the file while our own reader
            # happily walks it.  Fail loudly instead of writing such a
            # file; model param dicts are far below the cap in practice.
            if len(snod_addrs) > 2 * _INTERNAL_K:
                raise ValueError(
                    f"purehdf5 group overflow: {len(entries)} links need "
                    f"{len(snod_addrs)} symbol-table nodes, but the "
                    f"single-leaf B-tree layout holds at most "
                    f"{2 * _INTERNAL_K} (={2 * _INTERNAL_K * _SNOD_CAP} "
                    f"links); split the payload or use h5py")
            node = bytearray(b"TREE" + struct.pack(
                "<BBHQQ", 0, 0, len(snod_addrs), UNDEF, UNDEF))
            node += struct.pack("<Q", 0)
            for addr, last in zip(snod_addrs, last_names):
                node += struct.pack("<QQ", addr, name_off[last])
            btree_addr = self.alloc(
                bytes(node.ljust(_BTREE_NODE_SIZE, b"\x00")))
        return self._object_header(
            [(_MSG_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_addr))])

    def finish(self, root_oh_addr: int) -> bytes:
        sb = b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)
        sb += struct.pack("<HHI", _LEAF_K, _INTERNAL_K, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol-table entry: name offset 0, cache type 0
        sb += struct.pack("<QQI4x16x", 0, root_oh_addr, 0)
        assert len(sb) == 96
        self.buf[:96] = sb
        return bytes(self.buf)


def _to_dataset(value: Any) -> tuple[np.ndarray, dict]:
    """Map one leaf value to (storable array, attributes)."""
    if isinstance(value, np.ndarray):
        if value.dtype.kind == "U":
            # fixed-length UTF-8, null-padded; the dtype attr restores
            # the unicode dtype on load (mirrors the h5py path's tag).
            # np.char.encode DEGRADES an empty U-array to float64 —
            # route size-0 arrays through astype so the stored datatype
            # stays a string class and the tag applies on load.
            enc = (np.char.encode(value, "utf-8") if value.size
                   else value.astype("S1"))
            return enc, {"dtype": value.dtype.str}
        if value.dtype.kind in "iuf":
            # the datatype message always declares little-endian, so
            # big-endian arrays must be byte-converted, not raw-copied
            # (silent corruption otherwise)
            if value.dtype.byteorder == ">":
                value = value.astype(value.dtype.newbyteorder("<"))
            return np.ascontiguousarray(value), {}
        if value.dtype.kind == "b":
            return value.astype(np.uint8), {"dtype": "|b1"}
        raise TypeError(f"unsupported array dtype {value.dtype}")
    if isinstance(value, (bool, np.bool_)):
        return np.full((), 1 if value else 0, np.uint8), {"dtype": "|b1"}
    if isinstance(value, (np.integer, np.floating)):
        # numpy scalars keep their width, like h5py stores them
        return np.full((), value, value.dtype), {}
    if isinstance(value, int):
        return np.full((), value, np.int64), {}
    if isinstance(value, float):
        return np.full((), value, np.float64), {}
    if isinstance(value, str):
        # NO tag: a scalar string dataset reads back as bytes -> str in
        # both this reader and hdftools' h5py branch (a private tag like
        # 'scalar-str' would crash h5py-side astype on cross-env reads)
        raw = value.encode("utf-8")
        return np.array(raw, dtype=f"S{max(len(raw), 1)}"), {}
    raise TypeError(f"{type(value).__name__} is not representable")


def _write_tree(w: _Writer, d: dict) -> int:
    entries = []
    for k, v in d.items():
        if isinstance(v, dict):
            entries.append((str(k), _write_tree(w, v)))
        else:
            arr, attrs = _to_dataset(v)
            entries.append((str(k), w.write_dataset(np.asarray(arr), attrs)))
    return w.write_group(entries)


def save_dict(d: dict, filename: str, group: str) -> None:
    """Save a nested dict under ``group`` in a NEW hdf5 file (same
    contract as :func:`tslearn_spark.hdftools.save_dict`)."""
    if os.path.isfile(filename):
        raise FileExistsError(filename)
    w = _Writer()
    root = w.write_group([(group, _write_tree(w, d))])
    payload = w.finish(root)
    with open(filename, "wb") as f:
        f.write(payload)


# ---------------------------------------------------------------- reader

def _gheap_object(buf: bytes, addr: int, index: int) -> bytes:
    """Object ``index`` from the global heap collection at ``addr``
    (HDF5 spec III.E: GCOL signature, version 1).  Collections store
    vlen payloads as (uint16 index, uint16 refcount, 4 reserved,
    uint64 size, data padded to 8); index 0 marks the free-space tail."""
    if buf[addr:addr + 4] != b"GCOL":
        raise ValueError("expected global heap collection (GCOL)")
    if buf[addr + 4] != 1:
        raise ValueError(f"unsupported global heap version {buf[addr + 4]}")
    size = struct.unpack("<Q", buf[addr + 8:addr + 16])[0]
    p, end = addr + 16, addr + size
    while p + 16 <= end:
        idx = struct.unpack("<H", buf[p:p + 2])[0]
        osize = struct.unpack("<Q", buf[p + 8:p + 16])[0]
        if idx == 0:  # free space: nothing after it
            break
        if idx == index:
            return buf[p + 16:p + 16 + osize]
        p += 16 + osize + (-osize % 8)
    raise KeyError(f"global heap object {index} not found at {addr:#x}")


def _vlen_strings(raw: bytes, n: int, buf: bytes) -> list[str]:
    """Decode ``n`` 16-byte vlen-string descriptors by chasing their
    global-heap IDs through ``buf``."""
    out = []
    for i in range(n):
        ln, haddr, hidx = struct.unpack("<IQI", raw[16 * i:16 * i + 16])
        data = b"" if ln == 0 or haddr in (0, UNDEF) \
            else _gheap_object(buf, haddr, hidx)[:ln]
        out.append(data.decode("utf-8"))
    return out


class _Reader:
    def __init__(self, buf: bytes) -> None:
        if buf[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        if buf[8] != 0:
            raise ValueError(f"unsupported superblock version {buf[8]}")
        if buf[13] != 8 or buf[14] != 8:
            raise ValueError("unsupported offset/length size")
        self.buf = buf
        # root symbol-table entry begins at 56 in a v0/8-byte superblock
        self.root_oh = struct.unpack("<Q", buf[64:72])[0]

    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        version, nmsgs, _, hsize = struct.unpack(
            "<BxHII", self.buf[addr:addr + 12])
        if version != 1:
            raise ValueError(f"unsupported object header version {version}")
        out, p, end = [], addr + 16, addr + 16 + hsize
        while len(out) < nmsgs and p < end:
            mtype, msize, _ = struct.unpack("<HHB3x", self.buf[p:p + 8])
            out.append((mtype, self.buf[p + 8:p + 8 + msize]))
            p += 8 + msize
        return out

    def _heap_name(self, heap_addr: int, offset: int) -> str:
        seg_size, _, seg_addr = struct.unpack(
            "<QQQ", self.buf[heap_addr + 8:heap_addr + 32])
        p = seg_addr + offset
        end = self.buf.index(b"\x00", p, seg_addr + seg_size)
        return self.buf[p:end].decode("utf-8")

    def _group_entries(self, btree_addr: int,
                       heap_addr: int) -> list[tuple[str, int]]:
        if btree_addr == UNDEF:
            return []
        sig = self.buf[btree_addr:btree_addr + 4]
        if sig != b"TREE":
            raise ValueError("expected v1 B-tree node")
        level, used = self.buf[btree_addr + 5], struct.unpack(
            "<H", self.buf[btree_addr + 6:btree_addr + 8])[0]
        children = [struct.unpack(
            "<Q", self.buf[btree_addr + 24 + 8 + i * 16:
                           btree_addr + 24 + 16 + i * 16])[0]
            for i in range(used)]
        entries: list[tuple[str, int]] = []
        for child in children:
            if level > 0:
                entries += self._group_entries(child, heap_addr)
                continue
            if self.buf[child:child + 4] != b"SNOD":
                raise ValueError("expected symbol-table node")
            nsym = struct.unpack("<H", self.buf[child + 6:child + 8])[0]
            for i in range(nsym):
                base = child + 8 + i * 40
                name_off, oh_addr = struct.unpack(
                    "<QQ", self.buf[base:base + 16])
                entries.append((self._heap_name(heap_addr, name_off),
                                oh_addr))
        return entries

    def _parse_attr(self, body: bytes) -> tuple[str, str]:
        if body[0] != 1:
            raise ValueError(f"unsupported attribute version {body[0]}")
        name_sz, dt_sz, ds_sz = struct.unpack("<HHH", body[2:8])
        p = 8
        name = body[p:p + name_sz].split(b"\x00")[0].decode("utf-8")
        p += len(_pad8(body[p:p + name_sz]))
        dt = body[p:p + dt_sz]
        p += len(_pad8(dt))
        p += len(_pad8(body[p:p + ds_sz]))
        kind, size = _parse_datatype(dt)
        if kind == "vlen-str":
            # h5py stores str attributes (e.g. the ``dtype`` tag) as
            # vlen strings; chase the descriptor's global-heap ID
            return name, _vlen_strings(body[p:p + 16], 1, self.buf)[0]
        if kind != "str":
            raise ValueError("only string attributes supported")
        return name, body[p:p + size].rstrip(b"\x00").decode("utf-8")

    def read_object(self, addr: int) -> Any:
        msgs = {}
        attrs = {}
        for mtype, body in self._messages(addr):
            if mtype == _MSG_ATTRIBUTE:
                k, v = self._parse_attr(body)
                attrs[k] = v
            else:
                msgs[mtype] = body
        if _MSG_SYMBOL_TABLE in msgs:
            btree_addr, heap_addr = struct.unpack(
                "<QQ", msgs[_MSG_SYMBOL_TABLE][:16])
            return {name: self.read_object(a)
                    for name, a in self._group_entries(btree_addr, heap_addr)}
        shape = _parse_dataspace(msgs[_MSG_DATASPACE])
        kind, elem = _parse_datatype(msgs[_MSG_DATATYPE])
        lay = msgs[_MSG_LAYOUT]
        if lay[0] != 3 or lay[1] != 1:
            raise ValueError("only contiguous layout v3 supported")
        data_addr, nbytes = struct.unpack("<QQ", lay[2:18])
        if data_addr == UNDEF or nbytes == 0:
            raw = b""
        else:
            raw = self.buf[data_addr:data_addr + nbytes]
        return _from_dataset(raw, shape, kind, elem, attrs, self.buf)


def _from_dataset(raw: bytes, shape: tuple[int, ...], kind: str,
                  elem: int, attrs: dict, buf: bytes = b"") -> Any:
    tagged = attrs.get("dtype")
    if kind == "vlen-str":
        n = int(np.prod(shape, dtype=int))
        vals = _vlen_strings(raw, n, buf)
        if shape == ():
            return vals[0]
        dec = np.array(vals, dtype=object).astype(str) if vals \
            else np.empty(0, dtype="U1")
        if tagged:
            dec = dec.astype(tagged)
        return dec.reshape(shape)
    if kind == "str":
        arr = np.frombuffer(raw, dtype=f"S{elem}",
                            count=int(np.prod(shape, dtype=int)))
        if shape == ():
            # scalar string: bytes -> str, mirroring hdftools'
            # h5py-branch decode (no private tag involved)
            return arr[0].rstrip(b"\x00").decode("utf-8")
        dec = np.array([x.rstrip(b"\x00").decode("utf-8")
                        for x in arr.ravel()])
        if tagged:
            dec = dec.astype(tagged)
        return dec.reshape(shape)
    arr = np.frombuffer(raw, dtype=kind,
                        count=int(np.prod(shape, dtype=int))).reshape(shape)
    if tagged == "|b1":
        if shape == ():
            return bool(arr[()])
        return arr.astype(bool)
    if shape == ():
        return arr[()]  # numpy scalar, mirroring h5py's item[()]
    return arr.copy()


def load_dict(filename: str, group: str) -> dict:
    """Load a nested dict saved by :func:`save_dict`."""
    with open(filename, "rb") as f:
        r = _Reader(f.read())
    root = r.read_object(r.root_oh)
    if not isinstance(root, dict) or group not in root:
        raise KeyError(group)
    return root[group]
