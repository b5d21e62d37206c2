"""Model persistence — JSON twin of the reference's BaseModelPackage.

Reference: tslearn/bases/bases.py:31-287 (to_json/from_json persist
hyper-parameters + trailing-underscore fitted params; HDF5/pickle are
alternate codecs of the same dict).  The engine persists the same
two-part dict as JSON; numpy arrays round-trip via nested lists with a
dtype tag.

Codec accept/reject matrix (reference: to_hdf5/to_json/to_pickle at
bases.py:164-287 — all three serialize the SAME param dict):

=======================  =======  ==================================
codec                    here     why
=======================  =======  ==================================
JSON                     yes      portable, diff-able, replayable
HDF5                     yes      reference layout via
                                  tslearn_spark.hdftools — h5py
                                  when importable, the from-scratch
                                  purehdf5 subset writer otherwise
                                  (r12), so the codec needs no
                                  dependency
pickle                   yes      reference protocol-2 dump of the
                                  param dict (bases.py:257-287) — but
                                  of the ENCODED dict (the JSON
                                  payload), so the stream holds only
                                  stdlib types: no numpy objects ⇒
                                  stable across numpy versions.
                                  pickle.load still executes
                                  arbitrary code on crafted files
                                  (true of the reference too) — never
                                  load untrusted artifacts; prefer
                                  JSON for sharing
=======================  =======  ==================================

Per-estimator matrix (reference: each estimator inherits all three
codecs from BaseModelPackage; json/pickle share one dict payload here,
so the rows below apply to both — hdf5 likewise, on either backend):

=========================  =========  ==============================
estimator                  json       notes
=========================  =========  ==============================
TimeSeriesKMeans           yes        cluster_centers_, inertia_
KShape                     yes        cluster_centers_, inertia_
KernelKMeans               partial    numpy side only; labels_ is a
                                      DataFrame — re-derive via fit
SAX / OneDSAX              yes        breakpoints + segment params
TimeSeriesSVC/SVR          partial    dual state (alphas, b, classes)
                                      round-trips; the training series
                                      live in _-prefixed attrs and are
                                      never serialized — re-attach them
                                      (set _train_ids/_train_values or
                                      refit) before predict
TimeSeriesMLPClassifier    no         MLlib model — _encode raises,
                                      pointing at model_.save()
                                      (Spark-native persistence)
TimeSeriesMLPRegressor     yes        nested _MLP object codec
LearningShapelets          yes        shapelet array + weights
NonMyopicEarlyClassifier   yes        per-prefix tensors
KNeighbors*                partial    hyper-params only; the index IS
                                      the training DataFrame — refit
=========================  =========  ==============================

DataFrame-shaped state is never serialized, mirroring the reference's
refusal to persist raw training data (bases.py:conv_blacklist).

``save_model``/``load_model`` accept an explicit ``fmt`` or infer it
from the extension; an hdf5 request routes through whichever backend
hdftools resolved (h5py or purehdf5) — never silently JSON.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np


_HELPER_REGISTRY: dict[str, type] = {}


def _helper_registry() -> dict[str, type]:
    """Nested non-estimator objects that appear in fitted state (solver
    duals, numpy MLP) — encoded as {"__object__": cls, "state": vars}."""
    if not _HELPER_REGISTRY:
        from tslearn_spark.neural_network import _MLP
        from tslearn_spark.svm_solver import BinarySVC, KernelSVR, MulticlassSVC

        for cls in (_MLP, BinarySVC, MulticlassSVC, KernelSVR):
            _HELPER_REGISTRY[cls.__name__] = cls
    return _HELPER_REGISTRY


def _reject_mllib(obj: Any) -> None:
    """MLlib-backed model state has Spark-native persistence; both codecs
    reject it loudly and point there."""
    cls = type(obj).__module__ or ""
    if cls.startswith("pyspark.ml"):
        raise NotImplementedError(
            f"{type(obj).__name__} is an MLlib model — persist it with its "
            "own .save(path) (Spark-native persistence), not model_io."
        )


def _encode(obj: Any):
    if isinstance(obj, np.ndarray):
        if obj.dtype == object:
            # object ndarrays (e.g. shapelets_: ragged per-shapelet
            # series, reference shapelets.py:364-378) encode element-wise
            return {"__ndarray_object__": [_encode(x) for x in obj]}
        return {"__ndarray__": obj.tolist(), "dtype": str(obj.dtype)}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (list, tuple)):
        return [_encode(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    _reject_mllib(obj)
    if type(obj).__name__ in _helper_registry():
        return {"__object__": type(obj).__name__, "state": _encode(vars(obj))}
    return obj


def _decode(obj: Any):
    if isinstance(obj, dict):
        if "__ndarray_object__" in obj:
            items = [_decode(x) for x in obj["__ndarray_object__"]]
            out = np.empty(len(items), dtype=object)
            for i, x in enumerate(items):
                out[i] = x
            return out
        if "__ndarray__" in obj:
            return np.array(obj["__ndarray__"], dtype=obj.get("dtype", "float64"))
        if "__object__" in obj:
            cls = _helper_registry()[obj["__object__"]]
            inst = cls.__new__(cls)
            for k, v in _decode(obj["state"]).items():
                setattr(inst, k, v)
            return inst
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(x) for x in obj]
    return obj


def _encode_h5(obj: Any):
    """HDF5-friendly twin of _encode: numpy arrays stay RAW (hdftools
    stores them as datasets), while the structures HDF5 cannot express
    natively get small tagged groups — lists/tuples as order-keyed
    groups, None as a sentinel group, helper objects as
    {'__object__', 'state'} like the JSON codec.  MLlib state is
    rejected at any depth, same as _encode."""
    if isinstance(obj, np.ndarray) or isinstance(
            obj, (str, bool, int, float, np.integer, np.floating, np.bool_)):
        return obj
    if obj is None:
        return {"__none__": True}
    if isinstance(obj, (list, tuple)):
        return {
            "__seq__": "tuple" if isinstance(obj, tuple) else "list",
            "items": {f"{i:06d}": _encode_h5(x) for i, x in enumerate(obj)},
        }
    if isinstance(obj, dict):
        return {k: _encode_h5(v) for k, v in obj.items()}
    _reject_mllib(obj)
    if type(obj).__name__ in _helper_registry():
        return {"__object__": type(obj).__name__,
                "state": _encode_h5(vars(obj))}
    return obj


def _decode_h5(obj: Any):
    if isinstance(obj, dict):
        if "__none__" in obj:
            return None
        if "__seq__" in obj:
            seq = str(obj["__seq__"])
            items = [ _decode_h5(v) for _, v in
                      sorted(obj.get("items", {}).items()) ]
            return tuple(items) if seq == "tuple" else items
        if "__object__" in obj:
            cls = _helper_registry()[str(obj["__object__"])]
            inst = cls.__new__(cls)
            for k, v in _decode_h5(obj["state"]).items():
                setattr(inst, k, v)
            return inst
        return {k: _decode_h5(v) for k, v in obj.items()}
    if isinstance(obj, bytes):
        return obj.decode("utf-8")
    return obj


def _is_spark_df(v: Any) -> bool:
    """DataFrame-shaped state (lazy plans over training data, e.g. the
    clusterers' labels_) is never serialized — it mirrors the reference's
    refusal to persist raw training data (bases.py conv_blacklist);
    re-derive it by refitting or predicting on the training set."""
    return (type(v).__module__ or "").startswith("pyspark.sql")


def model_to_dict(model: Any) -> dict:
    """hyper-params (get_params / __init__ attrs) + fitted params.

    Fitted params come from the estimator's ``_get_model_params`` when it
    defines one — classes whose fitted state lives under leading
    underscores (KNN's _ts_fit training data, piecewise _X_fit_dims_,
    KernelKMeans _X_fit) override it exactly like the reference
    (neighbors.py:251-255, piecewise.py:118-120, kmeans.py:257-260) —
    else from the default trailing-underscore vars scan.
    DataFrame-valued state is skipped either way (see _is_spark_df)."""
    if hasattr(model, "get_params"):
        hyper_src = model.get_params()
    else:
        hyper_src = {k: v for k, v in vars(model).items()
                     if not k.startswith("_") and not k.endswith("_")}
    if hasattr(model, "_get_model_params"):
        fitted_src = model._get_model_params()
    else:
        fitted_src = {k: v for k, v in vars(model).items()
                      if k.endswith("_") and not k.startswith("_")}
    return {
        "class": type(model).__name__,
        "hyper_params": {k: _encode(v) for k, v in hyper_src.items()
                         if not _is_spark_df(v)},
        "model_params": {k: _encode(v) for k, v in fitted_src.items()
                         if not _is_spark_df(v)},
    }


def _resolve_fmt(path: str, fmt: str | None) -> str:
    """Map (path, fmt) to a codec, failing loudly on unsupported ones
    (reference exposes to_json/to_hdf5/to_pickle at bases.py:164-287)."""
    if fmt is None:
        ext = path.rsplit(".", 1)[-1].lower() if "." in path else "json"
        fmt = {"h5": "hdf5", "hdf5": "hdf5", "pkl": "pickle",
               "pickle": "pickle"}.get(ext, "json")
    fmt = fmt.lower()
    if fmt == "hdf5":
        # reference layout via tslearn_spark.hdftools — h5py when
        # importable, the purehdf5 subset writer otherwise (round 12)
        return fmt
    if fmt not in ("json", "pickle"):
        raise ValueError(
            f"unknown model format: {fmt!r} "
            "(supported: 'json', 'pickle', 'hdf5')"
        )
    return fmt


def save_model(model: Any, path: str, fmt: str | None = None) -> None:
    fmt = _resolve_fmt(path, fmt)
    if fmt == "hdf5":
        model.to_hdf5(path)
        return
    if fmt == "pickle":
        # reference pickles the param dict at protocol 2
        # (bases.py:257-268); the engine pickles the ENCODED dict — the
        # exact JSON payload — so the stream carries only stdlib types
        # (no numpy objects, stable across numpy versions)
        import pickle

        with open(path, "wb") as f:
            pickle.dump(model_to_dict(model), f, protocol=2)
        return
    with open(path, "w") as f:
        json.dump(model_to_dict(model), f)


_REGISTRY: dict[str, type] = {}


def register_model(cls: type) -> type:
    _REGISTRY[cls.__name__] = cls
    return cls


def _registry() -> dict[str, type]:
    if not _REGISTRY:
        from tslearn_spark.clustering import (
            GlobalAlignmentKernelKMeans, KernelKMeans, KShape, TimeSeriesKMeans,
        )
        from tslearn_spark.early_classification import NonMyopicEarlyClassifier
        from tslearn_spark.labels import LabelCategorizer
        from tslearn_spark.matrix_profile import MatrixProfile
        from tslearn_spark.neighbors import (
            KNeighborsTimeSeries,
            KNeighborsTimeSeriesClassifier,
            KNeighborsTimeSeriesRegressor,
        )
        from tslearn_spark.neural_network import (
            TimeSeriesMLPClassifier,
            TimeSeriesMLPRegressor,
        )
        from tslearn_spark.piecewise import (
            OneDSAX, PiecewiseAggregateApproximation, SAX,
        )
        from tslearn_spark.shapelets import LearningShapelets
        from tslearn_spark.svm import TimeSeriesSVC, TimeSeriesSVR

        for cls in (
            TimeSeriesKMeans, KShape, KernelKMeans, GlobalAlignmentKernelKMeans,
            SAX, OneDSAX, PiecewiseAggregateApproximation, MatrixProfile,
            TimeSeriesSVC, TimeSeriesSVR, TimeSeriesMLPClassifier,
            TimeSeriesMLPRegressor, LearningShapelets,
            NonMyopicEarlyClassifier, LabelCategorizer,
            KNeighborsTimeSeries, KNeighborsTimeSeriesClassifier,
            KNeighborsTimeSeriesRegressor,
        ):
            _REGISTRY[cls.__name__] = cls
    return _REGISTRY


def model_from_dict(d: dict) -> Any:
    cls = _registry()[d["class"]]
    hyper = _decode(d["hyper_params"])
    try:
        model = cls(**hyper)
    except TypeError:
        model = cls.__new__(cls)
        for k, v in hyper.items():
            setattr(model, k, v)
    for k, v in _decode(d["model_params"]).items():
        setattr(model, k, v)
    # estimators whose fitted state embeds training data (reference KNN
    # _ts_fit, KernelKMeans _X_fit) rebuild their engine-side structures
    # (index DataFrame, Gram) from the restored arrays
    if hasattr(model, "_post_restore"):
        model._post_restore()
    return model


def _model_from_h5_dict(d: dict, expected: type | None = None,
                        path: str = "<hdf5>") -> Any:
    """Build a model from a load_dict payload (one file read — shared by
    Class.from_hdf5 and load_model).  Dispatch follows the STORED class
    name; ``expected`` enforces the from_json-style type check."""
    stored = str(d.get("class", ""))
    cls = _registry().get(stored)
    if cls is None:
        raise KeyError(f"{path} encodes unknown model class {stored!r}")
    if expected is not None and not issubclass(cls, expected):
        raise TypeError(
            f"{path} encodes a {stored}, not a {expected.__name__}"
        )
    hyper = {
        k: None if (isinstance(v, str) and v == "None") else v
        for k, v in _decode_h5(d.get("hyper_params", {})).items()
    }
    try:
        model = cls(**hyper)
    except TypeError:
        model = cls.__new__(cls)
        for k, v in hyper.items():
            setattr(model, k, v)
    for k, v in _decode_h5(d.get("model_params", {})).items():
        setattr(model, k, v)
    if hasattr(model, "_post_restore"):  # see model_from_dict
        model._post_restore()
    return model


def load_model(path: str, fmt: str | None = None) -> Any:
    fmt = _resolve_fmt(path, fmt)
    if fmt == "hdf5":
        from tslearn_spark import hdftools

        return _model_from_h5_dict(hdftools.load_dict(path, "data"),
                                   path=path)
    if fmt == "pickle":
        # pickle.load runs arbitrary code on crafted input (as in the
        # reference, bases.py:271-287) — only load trusted artifacts
        import pickle

        with open(path, "rb") as f:
            return model_from_dict(pickle.load(f))
    with open(path) as f:
        return model_from_dict(json.load(f))
