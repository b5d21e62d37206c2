"""Unit tests for the from-scratch pure-python HDF5 subset backend
(tslearn_spark.purehdf5) that backs hdftools where h5py is absent.

Reference layout under test: tslearn/hdftools/hdftools.py:8-150 (one
group per nested-dict level, arrays/scalars as datasets, ``dtype`` attr
on re-typed string arrays).  No Spark needed — the codec is pure
python + numpy.
"""

import os

import numpy as np
import pytest

from tslearn_spark import hdftools, purehdf5


def _payload():
    return {
        "hyper": {"n_segments": 3, "scale": True, "alpha": 0.25,
                  "name": "sax", "neg": -7},
        "fitted": {
            "breakpoints_": np.linspace(-2.0, 2.0, 7),
            "codes_": np.arange(12, dtype=np.int32).reshape(3, 4),
            "classes_": np.array(["aa", "b", "cécé"], dtype="U5"),
            "flags_": np.array([True, False, True]),
            "empty_": np.zeros((0, 3)),
            "deep": {"x": np.float32(1.5), "s": "héllo wörld"},
        },
        "emptygrp": {},
    }


class TestPureHdf5:
    def test_roundtrip_matrix(self, tmp_path):
        p = str(tmp_path / "m.h5")
        purehdf5.save_dict(_payload(), p, "data")
        back = purehdf5.load_dict(p, "data")
        d = _payload()
        assert int(back["hyper"]["n_segments"]) == 3
        assert back["hyper"]["scale"] is True
        assert back["hyper"]["name"] == "sax"
        assert int(back["hyper"]["neg"]) == -7
        assert float(back["hyper"]["alpha"]) == 0.25
        np.testing.assert_array_equal(back["fitted"]["breakpoints_"],
                                      d["fitted"]["breakpoints_"])
        assert back["fitted"]["codes_"].dtype == np.int32
        np.testing.assert_array_equal(back["fitted"]["codes_"],
                                      d["fitted"]["codes_"])
        # unicode arrays restore their exact dtype via the attr tag
        assert back["fitted"]["classes_"].dtype.str == "<U5"
        np.testing.assert_array_equal(back["fitted"]["classes_"],
                                      d["fitted"]["classes_"])
        np.testing.assert_array_equal(back["fitted"]["flags_"],
                                      d["fitted"]["flags_"])
        assert back["fitted"]["empty_"].shape == (0, 3)
        assert back["fitted"]["deep"]["s"] == "héllo wörld"
        assert back["fitted"]["deep"]["x"].dtype == np.float32
        assert back["emptygrp"] == {}

    def test_empty_and_scalar_edge_types(self, tmp_path):
        """Size-0 unicode arrays keep their dtype (np.char.encode
        degrades them to float64 — regression), numpy scalars keep
        their width, and extreme values survive."""
        d = {"g": {"empty_u": np.array([], dtype="U4"),
                   "i32": np.int32(-5), "u8": np.uint8(200),
                   "big": 2 ** 52, "tiny": -1.5e-300}}
        p = str(tmp_path / "e.h5")
        purehdf5.save_dict(d, p, "data")
        b = purehdf5.load_dict(p, "data")["g"]
        assert b["empty_u"].shape == (0,) and b["empty_u"].dtype.str == "<U4"
        assert b["i32"].dtype == np.int32 and int(b["i32"]) == -5
        assert b["u8"].dtype == np.uint8 and int(b["u8"]) == 200
        assert int(b["big"]) == 2 ** 52
        assert float(b["tiny"]) == -1.5e-300

    def test_existing_file_raises(self, tmp_path):
        p = str(tmp_path / "m.h5")
        purehdf5.save_dict({"a": 1}, p, "data")
        with pytest.raises(FileExistsError):
            purehdf5.save_dict({"a": 1}, p, "data")

    def test_multi_snod_group(self, tmp_path):
        """>8 links per group spills across symbol-table nodes (the
        SNOD capacity is 2*leaf_k = 8)."""
        big = {f"k{i:03d}": np.arange(i + 1.0) for i in range(25)}
        p = str(tmp_path / "big.h5")
        purehdf5.save_dict({"big": big}, p, "data")
        back = purehdf5.load_dict(p, "data")["big"]
        assert sorted(back) == sorted(big)
        for k in big:
            np.testing.assert_array_equal(back[k], big[k])

    def test_unrepresentable_rejected(self, tmp_path):
        with pytest.raises(TypeError):
            purehdf5.save_dict({"bad": [1, 2, 3]}, str(tmp_path / "x.h5"),
                               "data")
        with pytest.raises(TypeError):
            purehdf5.save_dict({"bad": np.zeros(2, dtype=complex)},
                               str(tmp_path / "y.h5"), "data")

    def test_signature_and_superblock(self, tmp_path):
        """The written file is genuine HDF5: magic signature, superblock
        v0, 8-byte offsets."""
        p = str(tmp_path / "m.h5")
        purehdf5.save_dict({"a": np.arange(3.0)}, p, "data")
        raw = open(p, "rb").read()
        assert raw[:8] == b"\x89HDF\r\n\x1a\n"
        assert raw[8] == 0 and raw[13] == 8 and raw[14] == 8
        # recorded EOF matches the actual file size
        import struct
        eof = struct.unpack("<Q", raw[40:48])[0]
        assert eof == os.path.getsize(p)

    def test_hdftools_dispatch(self, tmp_path):
        """hdftools routes through purehdf5 when h5py is absent and
        keeps its accept/reject matrix either way."""
        assert hdftools.HDF5_AVAILABLE
        p = str(tmp_path / "m.h5")
        hdftools.save_dict(_payload(), p, "data")
        back = hdftools.load_dict(p, "data")
        assert back["hyper"]["name"] == "sax"
        with pytest.raises(FileExistsError):
            hdftools.save_dict({"a": 1}, p, "data")
        with pytest.raises(TypeError, match="not.*representable|encode"):
            hdftools.save_dict({"bad": (1, 2)}, str(tmp_path / "t.h5"),
                               "data")


# -------------------------------------------------------- vlen READ support

def _write_vlen_fixture(path: str) -> None:
    """Handcraft an HDF5 file whose string data uses the VARIABLE-LENGTH
    layout h5py/libhdf5 writes (datatype class 9 descriptors resolved
    through a GCOL global heap collection, spec III.E) — the one layout
    purehdf5's own writer never emits.  Built directly from the public
    File Format Spec (independent of the reader under test; the writer
    has no vlen code to be circular with).  No h5py exists in this
    sandbox to generate a native fixture; the byte layout follows the
    same spec sections libhdf5 implements."""
    import struct

    from tslearn_spark.purehdf5 import (
        _MSG_ATTRIBUTE, _MSG_DATASPACE, _MSG_DATATYPE, _MSG_LAYOUT,
        _Writer, _ds_message, _pad8,
    )

    strings = ["aa", "b", "cécé", ""]          # incl. an empty element
    w = _Writer()

    # --- global heap collection: payload objects + index-0 free tail
    objs = b""
    heap_ids = []                              # (length, index)
    next_idx = 1
    for s in strings + ["<U4", "solo-héllo"]:  # data + attr + scalar ds
        raw = s.encode("utf-8")
        if raw:
            objs += struct.pack("<HH4xQ", next_idx, 1, len(raw)) + _pad8(raw)
            heap_ids.append((len(raw), next_idx))
            next_idx += 1
        else:
            heap_ids.append((0, 0))            # empty: null heap ID
    tail = struct.pack("<HH4xQ", 0, 0, 0)
    coll = objs + tail
    gcol_addr = w.alloc(b"GCOL" + struct.pack("<B3xQ", 1, 16 + len(coll))
                        + coll)

    # --- vlen-string datatype message: class 9 v1; bit field byte 0 =
    # type (1 = string), byte 1 = charset (1 = UTF-8); size 16 = the
    # in-file descriptor width; base type = 1-byte string (as h5py does)
    vdt = struct.pack("<B3sI", (1 << 4) | 9, bytes([0x01, 0x01, 0]), 16)
    vdt += struct.pack("<B3sI", (1 << 4) | 3, bytes([0x10, 0, 0]), 1)

    def desc(lid):
        ln, idx = lid
        return struct.pack("<IQI", ln, gcol_addr if idx else 0, idx)

    # --- array dataset "classes_" with a vlen "dtype" attribute
    data = b"".join(desc(h) for h in heap_ids[:4])
    data_addr = w.alloc(data)
    nameb = b"dtype\x00"
    attr = struct.pack("<BxHHH", 1, len(nameb), len(vdt),
                       len(_ds_message(())))
    attr += _pad8(nameb) + _pad8(vdt) + _pad8(_ds_message(()))
    attr += desc(heap_ids[4])
    arr_oh = w._object_header([
        (_MSG_DATASPACE, _ds_message((4,))),
        (_MSG_DATATYPE, vdt),
        (_MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, data_addr, len(data))),
        (_MSG_ATTRIBUTE, attr),
    ])

    # --- scalar vlen-string dataset "s"
    sdata = desc(heap_ids[5])
    sdata_addr = w.alloc(sdata)
    s_oh = w._object_header([
        (_MSG_DATASPACE, _ds_message(())),
        (_MSG_DATATYPE, vdt),
        (_MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, sdata_addr, len(sdata))),
    ])

    grp = w.write_group([("classes_", arr_oh), ("s", s_oh)])
    root = w.write_group([("data", grp)])
    with open(path, "wb") as f:
        f.write(w.finish(root))


class TestVlenRead:
    def test_vlen_dataset_and_attr(self, tmp_path):
        p = str(tmp_path / "vlen.h5")
        _write_vlen_fixture(p)
        back = purehdf5.load_dict(p, "data")
        # the vlen dtype attr restores the exact unicode dtype
        assert back["classes_"].dtype.str == "<U4"
        np.testing.assert_array_equal(
            back["classes_"], np.array(["aa", "b", "cécé", ""], dtype="U4"))
        assert back["s"] == "solo-héllo"

    def test_vlen_via_hdftools(self, tmp_path):
        """hdftools' loader (purehdf5 branch in this env) accepts the
        h5py-style vlen layout end-to-end."""
        p = str(tmp_path / "vlen2.h5")
        _write_vlen_fixture(p)
        back = hdftools.load_dict(p, "data")
        assert list(back["classes_"]) == ["aa", "b", "cécé", ""]

    def test_vlen_sequence_rejected(self):
        """vlen SEQUENCES (class 9 type 0) are outside the subset and
        fail loudly, not silently misread."""
        import struct

        from tslearn_spark.purehdf5 import _parse_datatype
        body = struct.pack("<B3sI", (1 << 4) | 9, bytes([0x00, 0, 0]), 16)
        with pytest.raises(TypeError, match="vlen sequences"):
            _parse_datatype(body)
