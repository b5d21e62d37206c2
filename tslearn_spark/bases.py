"""Estimator base classes — `tslearn.bases` parity.

Reference: tslearn/bases/bases.py:13-287.  BaseModelPackage provides the
instance-level persistence protocol (`model.to_json(path)`,
`Class.from_json(path)`, `_to_dict`, `_get_model_params`, `_is_fitted`)
over the SAME hyper/fitted-param dict that `model_io` serializes;
to_pickle shares that dict payload, and to_hdf5 works on either HDF5
backend — h5py when importable, tslearn_spark.purehdf5 otherwise
(codec matrix in the model_io module docstring).
TimeSeriesBaseEstimator supplies the
sklearn get_params/set_params protocol via __init__ introspection
(the reference inherits sklearn's BaseEstimator; sklearn is absent
here, so the protocol is implemented directly).
"""

from __future__ import annotations

import inspect
from typing import Any


def as_ts_df(X, y=None, y_col: str = "label", y_numeric: bool = False):
    """Reference-compat input adapter: array-like datasets (the numpy
    protocol every reference estimator speaks) become ts DataFrames on
    the active session; DataFrames pass through untouched.

    Returns (df, was_array) — estimator methods use was_array to hand
    numpy results back for numpy inputs, so reference scripts like
    ``TimeSeriesKMeans().fit(X).predict(X2)`` run unchanged.
    """
    from pyspark.sql import DataFrame as _DF

    if X is None or isinstance(X, _DF):
        if y is not None:
            # silently training on the DataFrame's own label column while
            # discarding a passed y would be a trap; so would a legacy
            # positional call like fit(df, "label2") binding the column
            # name to y
            if isinstance(y, str):
                raise TypeError(
                    f"got string {y!r} for y — with a DataFrame input, "
                    "pass the column name as a keyword "
                    "(label_col=/target_col=), not positionally"
                )
            raise ValueError(
                "y was passed alongside a DataFrame input; DataFrame "
                "labels/targets come from a column (label_col=/"
                "target_col=) — pass y only with array-like X"
            )
        return X, False
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "array-like input requires an active SparkSession — call "
            "tslearn_spark.get_spark() first"
        )
    from tslearn_spark.dataset import dataset_to_df
    from tslearn_spark.utils import to_time_series

    try:
        import pandas as _pd

        if isinstance(X, _pd.DataFrame):
            # reference convention (utils.py:156-216): each ROW is one
            # univariate series; plain iteration would yield column names
            import numpy as _np

            X = _np.asarray(X)
    except ImportError:
        pass
    series = [to_time_series(ts, remove_nans=True) for ts in X]
    df = dataset_to_df(spark, series)
    if y is not None:
        y = _validate_y(y, len(series), y_numeric)
        if y_numeric:
            lab = spark.createDataFrame(
                [(int(i), float(v)) for i, v in enumerate(y)],
                f"series_id long, {y_col} double",
            )
        else:
            lab = spark.createDataFrame(
                [(int(i), str(v)) for i, v in enumerate(y)],
                f"series_id long, {y_col} string",
            )
        df = df.join(lab, "series_id")
    return df, True


def query_d(X):
    """Per-timestamp dimension of an array-like dataset (None for
    DataFrames / undecidable input)."""
    if X is None:
        return None
    try:
        from pyspark.sql import DataFrame as _DF

        if isinstance(X, _DF):
            return None
        import numpy as np

        first = np.asarray(X[0], dtype=np.float64)
    except Exception:
        return None
    return first.shape[-1] if first.ndim >= 2 else 1


def check_query_dims(X, d_fit) -> None:
    """Predict-time twin of the reference's check_dims (utils.py raises
    ValueError when X_new.shape[-1] != X_fit.shape[-1], wired through
    every estimator's predict/transform via _preprocess_*): array-like
    queries whose per-timestamp dimension differs from the fitted one
    raise a driver-side ValueError instead of an opaque executor reshape
    failure.  DataFrame queries and unknown fitted dims pass through."""
    if d_fit is None:
        return
    d = query_d(X)
    if d is not None and d != int(d_fit):
        raise ValueError(
            f"Dimension of the provided time series (d={d}) does not "
            f"match the one of the fitted data (d={int(d_fit)})")


class DataConversionWarning(UserWarning):
    """sklearn.exceptions.DataConversionWarning twin — raised when fit
    silently converts input (column-vector y -> 1d).  The reference
    inherits this behavior from sklearn's check_array/column_or_1d
    (sklearn_patches.py check_supervised_y_2d asserts the warning)."""


def _validate_y(y, n_samples: int, y_numeric: bool):
    """sklearn column_or_1d + type_of_target contract on array-ingest
    targets (the reference gets these from sklearn's fit validation):

    * length must match X (check_classifiers_train: fit(X, y[:-1]) must
      raise);
    * a column-vector (n, 1) y is ravelled with a DataConversionWarning
      (check_supervised_y_2d); wider 2-D y is rejected;
    * classifiers (y_numeric=False) reject continuous targets with
      sklearn's "Unknown label type" message
      (check_classifiers_cont_target) — float labels are fine when they
      are all integral (sklearn calls that multiclass).
    """
    import warnings

    import numpy as np

    arr = np.asarray(y)
    if arr.ndim == 2 and arr.shape[1] == 1:
        warnings.warn(
            "A column-vector y was passed when a 1d array was expected. "
            "Please change the shape of y to (n_samples, ), for example "
            "using ravel().", DataConversionWarning, stacklevel=3)
        arr = arr.ravel()
    elif arr.ndim != 1:
        raise ValueError(
            f"y should be a 1d array, got an array of shape {arr.shape} "
            "instead.")
    if len(arr) != n_samples:
        raise ValueError(
            f"Found input variables with inconsistent numbers of samples: "
            f"[{n_samples}, {len(arr)}]")
    if not y_numeric and arr.dtype.kind == "f":
        with np.errstate(invalid="ignore"):
            integral = np.isfinite(arr) & (arr % 1 == 0)
        if not np.all(integral):
            raise ValueError(
                "Unknown label type: continuous. Maybe you are trying "
                "to fit a classifier, which expects discrete classes on "
                "a regression target with continuous values.")
    return arr.tolist()


def _smart_labels(values: list):
    """String labels back to ints/floats ONLY when they round-trip cleanly —
    numpy-input predictions should come back in the dtype the user's y
    had (the engine stores labels as strings).  Labels like '007' or
    '1e3' parse as numbers but don't round-trip, so they stay strings
    (the reference preserves fitted label values verbatim)."""
    import numpy as np

    arr = np.asarray(values)
    try:
        f = arr.astype(np.float64)
    except (TypeError, ValueError):
        return arr
    if arr.dtype.kind in "biufc":  # already numeric (object/str arrays
        # of digit-strings must round-trip-check below, not coerce)
        return f.astype(np.int64) if np.all(f % 1 == 0) else f
    strs = [str(v) for v in arr.tolist()]
    if np.all(f % 1 == 0):
        as_int = f.astype(np.int64)
        if all(str(c) == o for c, o in zip(as_int.tolist(), strs)):
            return as_int
    if all(str(c) == o for c, o in zip(f.tolist(), strs)):
        return f
    return arr


def collect_col(out_df, was_array: bool, col: str, id_col: str = "series_id",
                labels: bool = False):
    """DataFrame-in -> DataFrame-out; array-in -> numpy-out, ordered by
    the id column (dataset_to_df ids are positional, so this restores
    the caller's row order).  ``labels`` controls numeric restoration:
    classifiers pass their fit-time y numeric-ness so string labels
    like '007' come back as the user gave them, not as ints."""
    if not was_array:
        return out_df
    import numpy as np

    # driver-side sort, NOT .orderBy: the result is array-input-sized by
    # definition, and a distributed orderBy range-partitions — whose
    # sampling sketch can try to interpret an upstream pandas UDF outside
    # an execution plan (Spark INTERNAL_ERROR "Cannot evaluate
    # expression", seen on the KShape z-norm + assignment plan)
    rows = sorted(out_df.select(id_col, col).collect(),
                  key=lambda r: r[id_col])
    vals = [r[col] for r in rows]
    if labels:
        return _smart_labels(vals)
    return np.array(vals)




def transform_compat(df, build, out_col: str, int_out: bool = False):
    """Transform-estimator input adapter: DataFrame-in -> DataFrame-out;
    array-in -> dense numpy tensor out (NaN-padded, reference shape)."""
    df2, was_array = as_ts_df(df)
    out = build(df2)
    if not was_array:
        return out
    import numpy as np

    rows = out.select("series_id", out_col).orderBy("series_id").collect()
    vals = [r[out_col] for r in rows]
    if int_out:
        return np.array(vals)
    from tslearn_spark.utils import to_time_series_dataset

    return to_time_series_dataset(vals)


# sklearn-style default estimator tags (reference bases.py:21-28 layers
# {'allow_variable_length': False} over sklearn's own defaults; the two
# keys below are the ones the reference's accept/reject matrix reads)
_DEFAULT_TAGS = {
    "allow_nan": False,
    "allow_variable_length": False,
}


class ClassifierScoreMixin:
    """sklearn ClassifierMixin.score twin: mean accuracy over an
    array-protocol dataset (the reference inherits it from sklearn;
    cross-validation loops call it).  Distributed pipelines score by
    comparing prediction DataFrames directly instead."""

    def score(self, X, y) -> float:
        import numpy as np

        preds = np.asarray(self.predict(X))
        y = np.asarray(y)
        if preds.dtype.kind in "US" or y.dtype.kind in "US":
            preds = preds.astype(str)
            y = y.astype(str)
        return float(np.mean(preds == y))


class RegressorScoreMixin:
    """sklearn RegressorMixin.score twin: R^2 on array input."""

    def score(self, X, y) -> float:
        import numpy as np

        preds = np.asarray(self.predict(X), dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        ss_res = float(np.sum((y - preds) ** 2))
        ss_tot = float(np.sum((y - np.mean(y)) ** 2))
        # sklearn r2_score: perfect predictions score 1.0 even when y is
        # constant (ss_tot == 0); only imperfect-on-constant scores 0.0
        if ss_res == 0.0:
            return 1.0
        return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0


class TimeSeriesBaseEstimator:
    """sklearn BaseEstimator protocol (get_params/set_params/tags)."""

    def _more_tags(self) -> dict:
        """Reference bases.py:27-28 — subclasses override to declare
        variable-length / NaN acceptance (kmeans.py:858-859 etc.)."""
        return dict(_DEFAULT_TAGS)

    def _get_tags(self) -> dict:
        """Merge ``_more_tags`` across the MRO, most-derived last —
        sklearn's collection order, so subclass declarations win."""
        tags = dict(_DEFAULT_TAGS)
        for klass in reversed(type(self).__mro__):
            if "_more_tags" in vars(klass):
                tags.update(vars(klass)["_more_tags"](self))
        return tags

    @classmethod
    def _param_names(cls) -> list[str]:
        sig = inspect.signature(cls.__init__)
        return [
            p.name for p in sig.parameters.values()
            if p.name != "self"
            and p.kind not in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
        ]

    def get_params(self, deep: bool = True) -> dict:
        return {n: getattr(self, n) for n in self._param_names()
                if hasattr(self, n)}

    def set_params(self, **params) -> "TimeSeriesBaseEstimator":
        valid = set(self._param_names())
        for k, v in params.items():
            if k not in valid:
                raise ValueError(
                    f"Invalid parameter {k!r} for estimator "
                    f"{type(self).__name__}. Valid parameters: {sorted(valid)}"
                )
            setattr(self, k, v)
        return self

    def __repr__(self) -> str:
        """sklearn BaseEstimator-style repr — ``ClassName(param=value)``
        listing only non-default constructor params, so ``est.fit(X)``
        echoes like the reference in doctests/REPLs."""
        sig = inspect.signature(type(self).__init__)
        parts = []
        for name in self._param_names():
            if not hasattr(self, name):
                continue
            default = sig.parameters[name].default
            val = getattr(self, name)
            try:
                if val is default or bool(val == default):
                    continue
            except Exception:
                pass  # incomparable (arrays etc.) -> show it
            parts.append(f"{name}={val!r}")
        return f"{type(self).__name__}({', '.join(parts)})"


class BaseModelPackage:
    """Instance persistence protocol (bases.py:31-287)."""

    def _is_fitted(self) -> bool:
        """Fitted iff a trailing-underscore attribute holds substantive
        model state.  The reference leaves this abstract and each
        estimator calls check_is_fitted on its key attrs; the generic
        default here skips None placeholders and plain numeric
        counters/inertia defaults that engine estimators pre-set in
        __init__, so only arrays/objects/dicts (centroids, breakpoints,
        solver duals, ...) count.  Estimators may override."""
        return any(
            k.endswith("_") and not k.startswith("_")
            and v is not None and not isinstance(v, (bool, int, float))
            for k, v in vars(self).items()
        )

    def _get_model_params(self) -> dict:
        """Trailing-underscore fitted params (bases.py:49-61)."""
        return {
            k: v for k, v in vars(self).items()
            if k.endswith("_") and not k.startswith("_") and not callable(v)
        }

    def _to_dict(self, output=None, hyper_parameters_only: bool = False) -> dict:
        from tslearn_spark import model_io

        if not self._is_fitted():
            # reference raises sklearn's NotFittedError (bases.py:74-75)
            raise ValueError("Model must be fit before it can be packaged")
        d = model_io.model_to_dict(self)
        if hyper_parameters_only:
            d["model_params"] = {}
        return d

    def to_dict(self, **kwargs) -> dict:
        return self._to_dict(**kwargs)

    @classmethod
    def from_dict(cls, d: dict) -> Any:
        from tslearn_spark import model_io

        model = model_io.model_from_dict(d)
        if not isinstance(model, cls):
            raise TypeError(
                f"dict encodes a {type(model).__name__}, not a {cls.__name__}"
            )
        return model

    def to_json(self, path: str) -> None:
        """Save hyper + fitted params as JSON (bases.py:212-224);
        routes through _to_dict so the not-fitted guard applies."""
        import json

        with open(path, "w") as f:
            json.dump(self._to_dict(output="json"), f)

    @classmethod
    def from_json(cls, path: str) -> Any:
        """Load an instance saved by to_json (bases.py:226-244)."""
        from tslearn_spark import model_io

        model = model_io.load_model(path, fmt="json")
        if not isinstance(model, cls):
            raise TypeError(
                f"{path} encodes a {type(model).__name__}, not a {cls.__name__}"
            )
        return model

    def to_hdf5(self, path: str) -> None:
        """Reference HDF5 layout (bases.py:164-183, hdftools.py:8-46) —
        h5py when importable, the from-scratch purehdf5 subset writer
        otherwise (round 12), so the codec needs no dependency.  State
        HDF5 cannot express natively (lists/tuples, None, helper
        objects) goes through model_io._encode_h5's tagged groups, with
        the same recursive MLlib rejection as the JSON codec."""
        from tslearn_spark import model_io
        from tslearn_spark import hdftools

        if not self._is_fitted():
            raise ValueError("Model must be fit before it can be packaged")
        d = {
            "class": type(self).__name__,
            # reference stores None hyper-params as the string 'None'
            # (bases.py:94-101) and restores them on load
            "hyper_params": model_io._encode_h5({
                k: "None" if v is None else v
                for k, v in self.get_params().items()
            }),
            "model_params": model_io._encode_h5({
                k: v for k, v in self._get_model_params().items()
                if v is not None and not model_io._is_spark_df(v)
            }),
        }
        hdftools.save_dict(d, path, "data")

    @classmethod
    def from_hdf5(cls, path: str) -> Any:
        """Load an instance saved by to_hdf5 (bases.py:186-210).  The
        stored class name drives construction — loading a file that
        encodes a different class raises, like from_json."""
        from tslearn_spark import hdftools, model_io

        return model_io._model_from_h5_dict(
            hdftools.load_dict(path, "data"), expected=cls, path=path
        )

    def to_pickle(self, path: str) -> None:
        """Protocol-2 pickle of the param dict (bases.py:257-268) — the
        engine pickles the encoded (JSON-shaped) dict so the stream
        holds only stdlib types; routes through _to_dict so the
        not-fitted guard applies."""
        from tslearn_spark import model_io

        if not self._is_fitted():
            # same guard/message as _to_dict, without encoding twice
            raise ValueError("Model must be fit before it can be packaged")
        model_io.save_model(self, path, fmt="pickle")

    @classmethod
    def from_pickle(cls, path: str) -> Any:
        """Load an instance saved by to_pickle (bases.py:271-287).
        pickle.load executes arbitrary code on crafted files — only
        load trusted artifacts (the reference shares this caveat)."""
        from tslearn_spark import model_io

        model = model_io.load_model(path, fmt="pickle")
        if not isinstance(model, cls):
            raise TypeError(
                f"{path} encodes a {type(model).__name__}, not a {cls.__name__}"
            )
        return model
