"""numpy-level utility parity — `from tslearn.utils import X` ports
verbatim to `from tslearn_spark.utils import X`.

Reference: tslearn/utils/utils.py (coercion 111-216, text codec
219-353, validation 24-108/356-424/454-525) and utils/cast.py.  These
are the reference's DRIVER-side numpy helpers; the engine's distributed
twins live in `dataset` (column expressions), `sources` (DataFrame
validation + distributed scans), and `cast` (DataFrame bridges), which
this module re-exports under the reference names where the surface is
shared (LabelCategorizer, ts_zeros, the ecosystem converters).
"""

from __future__ import annotations

import numpy as np

from tslearn_spark.cast import (  # noqa: F401  (re-exports)
    from_cesium_dataset,
    from_pyflux_dataset,
    from_pyts_dataset,
    from_seglearn_dataset,
    from_sktime_dataset,
    from_stumpy_dataset,
    from_tsfresh_dataset,
    to_cesium_dataset,
    to_pyflux_dataset,
    to_pyts_dataset,
    to_seglearn_dataset,
    to_sklearn_dataset,
    to_sktime_dataset,
    to_stumpy_dataset,
    to_tsfresh_dataset,
)
from tslearn_spark.dataset import ts_zeros  # noqa: F401
from tslearn_spark.labels import LabelCategorizer  # noqa: F401


def to_time_series(ts, remove_nans: bool = False) -> np.ndarray:
    """Coerce to a (sz, d) float64 series (utils.py:111-153); 1-D input
    becomes (sz, 1); remove_nans trims trailing all-NaN rows."""
    ts_out = np.array(ts, copy=True)
    if ts_out.ndim <= 1:
        ts_out = ts_out.reshape((-1, 1))
    if ts_out.dtype != np.float64:
        ts_out = ts_out.astype(np.float64)
    if remove_nans:
        ts_out = ts_out[: ts_size(ts_out)]
    return ts_out


def to_time_series_dataset(dataset, dtype=float) -> np.ndarray:
    """Coerce a list of series to the dense NaN-padded (n_ts, max_sz, d)
    tensor (utils.py:156-216)."""
    try:
        import pandas as pd

        if isinstance(dataset, pd.DataFrame):
            return to_time_series_dataset(np.array(dataset))
    except ImportError:
        pass
    if len(dataset) == 0:
        return np.zeros((0, 0, 0))
    if np.array(dataset[0]).ndim == 0:
        dataset = [dataset]
    n_ts = len(dataset)
    series = [to_time_series(ts, remove_nans=True) for ts in dataset]
    max_sz = max(ts.shape[0] for ts in series)
    d = series[0].shape[1]
    out = np.full((n_ts, max_sz, d), np.nan, dtype=dtype)
    for i, ts in enumerate(series):
        out[i, : ts.shape[0]] = ts
    return out


def ts_size(ts) -> int:
    """Logical length: trailing all-NaN rows trimmed (utils.py:386-424)."""
    ts_ = to_time_series(ts)
    sz = ts_.shape[0]
    while sz > 0 and np.all(np.isnan(ts_[sz - 1])):
        sz -= 1
    return sz


def check_equal_size(dataset) -> bool:
    """True iff every series has the same logical size (utils.py:356-383)."""
    dataset_ = to_time_series_dataset(dataset)
    if dataset_.shape[0] == 0:
        return True
    sizes = [ts_size(ts) for ts in dataset_]
    return all(s == sizes[0] for s in sizes)


def check_dataset(X, force_univariate: bool = False,
                  force_equal_length: bool = False,
                  force_single_time_series: bool = False) -> np.ndarray:
    """Dataset constraint checks (utils.py:454-525), numpy level; the
    DataFrame twin is sources.check_dataset."""
    X_ = to_time_series_dataset(X)
    if force_univariate and X_.shape[2] != 1:
        raise ValueError(
            f"Array of shape {X_.shape} is not a univariate dataset"
        )
    if force_equal_length and not check_equal_size(X_):
        raise ValueError(
            "All the time series in the array should be of equal lengths"
        )
    if force_single_time_series and X_.shape[0] != 1:
        raise ValueError(
            f"Array of shape {X_.shape} is not a single time series"
        )
    return X_


def check_dims(X, X_fit_dims=None, extend: bool = True,
               check_n_features_only: bool = False) -> np.ndarray:
    """Transform-time shape validation (utils.py:24-108), numpy level;
    the DataFrame twin is sources.check_dims."""
    if X is None:
        raise ValueError("X is equal to None!")
    X_ = np.asarray(X)
    if extend and X_.ndim == 2:
        X_ = X_.reshape((X_.shape + (1,)))
    if X_fit_dims is not None:
        if check_n_features_only:
            if X_fit_dims[2] != X_.shape[2]:
                raise ValueError(
                    f"Number of features of the provided timeseries "
                    f"{X_.shape[2]} (last dimension) must match the one "
                    f"of the fitted data {X_fit_dims[2]}"
                )
        elif X_fit_dims[1:] != X_.shape[1:]:
            raise ValueError(
                f"Dimensions of the provided timeseries {X_.shape[1:]} "
                f"must match the one of the fitted data {X_fit_dims[1:]}"
            )
    return X_


def time_series_to_str(ts, fmt: str = "%.18e") -> str:
    """Series -> 'v v v|w w w' string, one '|'-separated block per dim
    (utils.py:219-251)."""
    ts_ = to_time_series(ts)
    return "|".join(
        " ".join(fmt % v for v in ts_[:, dim]) for dim in range(ts_.shape[1])
    )


timeseries_to_str = time_series_to_str  # legacy alias (utils.py:254)


def str_to_time_series(ts_str: str) -> np.ndarray:
    """Inverse of time_series_to_str (utils.py:256-291)."""
    dims = ts_str.split("|")
    return to_time_series(
        np.array([[float(v) for v in dim.split()] for dim in dims]).T
    )


str_to_timeseries = str_to_time_series  # legacy alias (utils.py:294)


def save_time_series_txt(fname: str, dataset, fmt: str = "%.18e") -> None:
    """One series per line in the text codec (utils.py:294-318); the
    distributed sink is dataset.save_time_series_txt."""
    with open(fname, "w") as f:
        for ts in dataset:
            f.write(time_series_to_str(ts, fmt=fmt) + "\n")


save_timeseries_txt = save_time_series_txt  # legacy alias


def load_time_series_txt(fname: str) -> np.ndarray:
    """Load the text codec into the dense tensor (utils.py:323-353); the
    distributed scan is dataset.load_time_series_txt."""
    with open(fname) as f:
        return to_time_series_dataset(
            [str_to_time_series(line) for line in f if line.strip()]
        )


load_timeseries_txt = load_time_series_txt  # legacy alias
