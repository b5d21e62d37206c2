"""Ecosystem converters — numpy/pandas bridges to other TS libraries.

Reference: tslearn/utils/cast.py:15-760.  Every converter is a pure
shape/layout transform, so all of them work without the target library
installed — except cesium, whose row type is a library object (gated
behind an import).  The Spark side composes through
``dataset.df_to_dataset`` / ``dataset.dataset_to_df``: DataFrame ->
padded numpy dataset -> any ecosystem layout, and back.

Layouts (d = dimensionality, sz_i = length of series i, NaN-padded
tslearn datasets are trimmed per series):

==========  ========================================================
sklearn     (n, sz * d) 2-D matrix (equal length required)
pyts        (n, sz) if d == 1 else (n, d, sz)
seglearn    object array of n arrays, each (sz_i, d)
stumpy      list of n arrays, each (sz_i,) if d == 1 else (d, sz_i)
sktime      nested DataFrame: columns dim_k, cells pd.Series(sz_i)
pyflux      single-series DataFrame (sz, d), columns dim_k
tsfresh     flat DataFrame (id, time, dim_0..dim_{d-1})
cesium      list of cesium.TimeSeries (requires cesium)
==========  ========================================================
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _as_dataset(X) -> np.ndarray:
    """Coerce to a (n, sz, d) float array (NaN padding allowed).

    Ragged inputs (series of different lengths) NaN-pad to the longest,
    exactly like the reference, whose converters run everything through
    to_time_series_dataset first (cast.py:15-55 doctests pass
    ``[[1, 2], [1, 4, 3]]``)."""
    try:
        arr = np.asarray(X, dtype=np.float64)
    except ValueError:  # ragged -> pad
        from tslearn_spark.utils import to_time_series_dataset

        return to_time_series_dataset(X)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1, 1)
    elif arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _trim(Xi: np.ndarray) -> np.ndarray:
    """Drop the trailing all-NaN padding rows of one (sz, d) series."""
    keep = ~np.all(np.isnan(Xi), axis=1)
    n = int(np.max(np.nonzero(keep)[0])) + 1 if keep.any() else 0
    return Xi[:n]


def _pad_dataset(series: list[np.ndarray]) -> np.ndarray:
    n = len(series)
    sz = max(s.shape[0] for s in series)
    d = series[0].shape[1]
    out = np.full((n, sz, d), np.nan)
    for i, s in enumerate(series):
        out[i, : s.shape[0]] = s
    return out


def to_sklearn_dataset(dataset, dtype=float, return_dim: bool = False):
    """(n, sz, d) -> (n, sz * d) flat matrix (cast.py:15-55)."""
    X = _as_dataset(dataset)
    n, sz, d = X.shape
    out = X.reshape(n, sz * d).astype(dtype)
    return (out, d) if return_dim else out


def to_pyts_dataset(X) -> np.ndarray:
    """(n, sz, d) -> (n, sz) if d == 1 else (n, d, sz) (cast.py:58-105)."""
    X_ = _as_dataset(X)
    if np.isnan(X_).any():
        raise ValueError("pyts does not support variable-length series")
    if X_.shape[2] == 1:
        return X_[:, :, 0]
    return X_.transpose(0, 2, 1)


def from_pyts_dataset(X) -> np.ndarray:
    arr = np.asarray(X, dtype=np.float64)
    if arr.ndim == 2:
        return arr[:, :, None]
    if arr.ndim == 3:
        return arr.transpose(0, 2, 1)
    raise ValueError(f"pyts datasets are 2-D or 3-D, got ndim={arr.ndim}")


def to_seglearn_dataset(X) -> np.ndarray:
    """(n, sz, d) -> array of per-series (sz_i, d) (cast.py:135-173).

    Equal-length input stacks to a dense (n, sz, d) array — the
    reference returns ``numpy.array([Xi[:ts_size(Xi)] ...])``, which
    stacks when homogeneous; ragged input degrades to an object array.
    """
    X_ = _as_dataset(X)
    series = [_trim(Xi) for Xi in X_]
    try:
        return np.array(series)
    except ValueError:  # ragged lengths
        out = np.empty(len(series), dtype=object)
        for i, s in enumerate(series):
            out[i] = s
        return out


def from_seglearn_dataset(X) -> np.ndarray:
    series = [np.asarray(s, dtype=np.float64).reshape(len(s), -1) for s in X]
    return _pad_dataset(series)


def to_stumpy_dataset(X) -> list:
    """(n, sz, d) -> list of (sz_i,) [d=1] or (d, sz_i) (cast.py:204-244)."""
    X_ = _as_dataset(X)
    out = []
    for Xi in X_:
        t = _trim(Xi)
        out.append(t[:, 0] if X_.shape[2] == 1 else t.T)
    return out


def from_stumpy_dataset(X) -> np.ndarray:
    series = []
    for s in X:
        arr = np.asarray(s, dtype=np.float64)
        series.append(arr.reshape(-1, 1) if arr.ndim == 1 else arr.T)
    return _pad_dataset(series)


def to_sktime_dataset(X) -> pd.DataFrame:
    """(n, sz, d) -> nested frame: columns dim_k, cells pd.Series
    (cast.py:275-318)."""
    X_ = _as_dataset(X)
    out = pd.DataFrame(dtype=np.float32)
    for dim in range(X_.shape[2]):
        out[f"dim_{dim}"] = [pd.Series(data=_trim(Xi)[:, dim]) for Xi in X_]
    return out


def from_sktime_dataset(X) -> np.ndarray:
    if not isinstance(X, pd.DataFrame):
        raise ValueError("sktime datasets are pandas DataFrames")
    dims = sorted(c for c in X.columns if c.startswith("dim_"))
    series = []
    for _, row in X.iterrows():
        cols = [np.asarray(row[c], dtype=np.float64) for c in dims]
        series.append(np.stack(cols, axis=1))
    return _pad_dataset(series)


def to_pyflux_dataset(X) -> pd.DataFrame:
    """Single-series (1, sz, d) -> (sz, d) frame, columns dim_k
    (cast.py:395-445)."""
    X_ = _as_dataset(X)
    if X_.shape[0] != 1:
        raise ValueError(
            f"Array should be made of a single time series ({X_.shape[0]} here)"
        )
    out = pd.DataFrame(_trim(X_[0]), dtype=np.float32)
    out.columns = [f"dim_{di}" for di in range(X_.shape[2])]
    return out


def from_pyflux_dataset(X) -> np.ndarray:
    if not isinstance(X, pd.DataFrame):
        raise ValueError("pyflux datasets are pandas DataFrames")
    return np.asarray(X, dtype=np.float64)[None, :, :]


def to_tsfresh_dataset(X) -> pd.DataFrame:
    """(n, sz, d) -> flat frame (id, time, dim_k) (cast.py:514-560)."""
    X_ = _as_dataset(X)
    d = X_.shape[2]
    frames = []
    for i, Xi in enumerate(X_):
        t = _trim(Xi)
        df = pd.DataFrame({
            "id": np.full(t.shape[0], i, dtype=np.int32),
            "time": np.arange(t.shape[0]),
        })
        for di in range(d):
            df[f"dim_{di}"] = t[:, di]
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def from_tsfresh_dataset(X) -> np.ndarray:
    if not isinstance(X, pd.DataFrame):
        raise ValueError("X is not a valid input tsfresh array.")
    # value columns = everything but (id, time), ORIGINAL column order
    # kept (reference cast.py:564-603 — names are arbitrary, not dim_*)
    dims = [c for c in X.columns if c not in ("id", "time")]
    series = []
    for _, grp in X.sort_values(["id", "time"]).groupby("id", sort=True):
        series.append(grp[dims].to_numpy(dtype=np.float64))
    return _pad_dataset(series)


def to_cesium_dataset(X) -> list:
    """(n, sz, d) -> list of cesium TimeSeries (cast.py:636-694).
    Requires the cesium library (not in this container)."""
    try:
        from cesium.time_series import TimeSeries
    except ImportError as exc:  # pragma: no cover - library absent by design
        raise ImportError(
            "Conversion from/to cesium requires the cesium library"
        ) from exc
    X_ = _as_dataset(X)
    out = []
    for Xi in X_:
        t = _trim(Xi)
        m = t[:, 0] if t.shape[1] == 1 else [t[:, di] for di in range(t.shape[1])]
        out.append(TimeSeries(t=np.arange(t.shape[0]), m=m))
    return out


def from_cesium_dataset(X) -> np.ndarray:
    series = []
    for ts in X:
        m = ts.measurement
        arr = np.asarray(m, dtype=np.float64)
        series.append(arr.reshape(-1, 1) if arr.ndim == 1 else arr.T)
    return _pad_dataset(series)
