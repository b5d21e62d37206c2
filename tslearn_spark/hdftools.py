"""HDF5 (de)serialization of nested param dicts — import-guarded.

Writes the reference's on-disk layout (tslearn/hdftools/hdftools.py:8-150):
one HDF5 group per nested dict level under a root group, numpy arrays and
scalars as datasets, unicode string arrays tagged with a ``dtype`` attr so
they round-trip.  Structures HDF5 cannot express (lists/tuples, None,
helper objects) must be pre-tagged with ``model_io._encode_h5`` — unlike
the reference, which flattens arbitrary objects via ``__dict__`` and then
silently restores them as plain dicts.  The implementation here is a
fresh recursive walk over that layout, not a copy.

Everything is gated on ``HDF5_INSTALLED``: in environments without h5py
the callers (bases.BaseModelPackage.to_hdf5 / model_io.save_model) raise
a loud NotImplementedError instead of silently writing JSON.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - absent in the test container
    h5py = None

HDF5_INSTALLED = h5py is not None

H5PY_MSG = (
    "HDF5 persistence requires h5py, which is not installed in this "
    "environment — save with a .json path instead (the HDF5 payload is "
    "the same hyper/fitted-param dict JSON stores), or install h5py: "
    "http://docs.h5py.org/"
)

_SCALARS = (str, bool, int, float, np.integer, np.floating, np.bool_)


def _require_h5py() -> None:
    if not HDF5_INSTALLED:
        raise NotImplementedError(H5PY_MSG)


def _write_entry(grp, key: str, value: Any) -> None:
    if isinstance(value, np.ndarray):
        if value.dtype.kind == "U":
            # unicode arrays need vlen-str storage; remember the original
            # dtype so load restores it (reference hdftools.py:72-76)
            ds = grp.create_dataset(
                key, data=value.astype(h5py.special_dtype(vlen=str))
            )
            ds.attrs["dtype"] = value.dtype.str
        else:
            grp[key] = value
    elif isinstance(value, _SCALARS):
        grp[key] = value
    elif isinstance(value, dict):
        sub = grp.create_group(key)
        for k, v in value.items():
            _write_entry(sub, str(k), v)
    else:
        # deliberate deviation from the reference (hdftools.py:96-103
        # flattens arbitrary objects via __dict__, whose loader then
        # restores them as plain dicts — silent round-trip corruption):
        # callers tag helper objects via model_io._encode_h5; anything
        # else fails loudly here instead
        raise TypeError(
            f"{type(value).__name__} value for key {key!r} is not "
            "representable in the HDF5 model layout (encode it with "
            "model_io._encode_h5 first)"
        )


def save_dict(d: dict, filename: str, group: str) -> None:
    """Save a nested dict under ``group`` in a NEW hdf5 file
    (reference hdftools.py:8-46: existing paths are a FileExistsError)."""
    _require_h5py()
    if os.path.isfile(filename):
        raise FileExistsError(filename)
    with h5py.File(filename, "w") as f:
        root = f.create_group(group)
        for k, v in d.items():
            _write_entry(root, str(k), v)


def _read_entry(item: Any) -> Any:
    if isinstance(item, h5py.Group):
        return {k: _read_entry(v) for k, v in item.items()}
    value = item[()]
    if "dtype" in item.attrs:
        # vlen-str array back to its original unicode dtype
        arr = np.array([x.decode() if isinstance(x, bytes) else x
                        for x in np.ravel(value)])
        return arr.astype(item.attrs["dtype"]).reshape(np.shape(value))
    if isinstance(value, bytes):
        return value.decode("utf-8")
    return value


def load_dict(filename: str, group: str) -> dict:
    """Load a nested dict saved by save_dict (reference hdftools.py:116-150)."""
    _require_h5py()
    with h5py.File(filename, "r") as f:
        return {k: _read_entry(v) for k, v in f[group].items()}
