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
