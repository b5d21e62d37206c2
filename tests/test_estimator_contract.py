"""Generic estimator-contract battery.

Mirrors the intent of the reference's sklearn ``check_estimator`` sweep
(tslearn/tests/test_estimators.py:62-207) for the Spark estimators:

* predict before fit raises;
* fit returns self (chainable);
* re-fit with the same seed is deterministic (same predictions);
* predict output carries series_id + the estimator's output column.

Variable-length acceptance (the reference's ALLOW_VARIABLE_LENGTH tag)
is asserted for the elastic-metric paths and checked as a clean error
for rigid ones.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tslearn_spark import dataset as DS


def _blobs_df(spark, seed=0, n_per=4, sz=8):
    rs = np.random.RandomState(seed)
    xs = [rs.randn(sz) * 0.2 + c for c in (0.0, 5.0) for _ in range(n_per)]
    y = ["a"] * n_per + ["b"] * n_per
    return DS.dataset_to_df(spark, [x.tolist() for x in xs], labels=y).cache()


def _estimators():
    from tslearn_spark.clustering import KernelKMeans, KShape, TimeSeriesKMeans
    from tslearn_spark.neural_network import (
        TimeSeriesMLPClassifier,
        TimeSeriesMLPRegressor,
    )
    from tslearn_spark.svm import TimeSeriesSVC, TimeSeriesSVR

    # (name, factory, fit_kwargs, predict_attr, out_col)
    return [
        ("kmeans", lambda: TimeSeriesKMeans(n_clusters=2, metric="euclidean",
                                            max_iter=5, random_state=0),
         {}, "predict", "cluster"),
        ("kshape", lambda: KShape(n_clusters=2, max_iter=3, random_state=0),
         {}, "predict", "cluster"),
        ("kernel_kmeans", lambda: KernelKMeans(n_clusters=2, kernel="gak",
                                               max_iter=5, random_state=0,
                                               kernel_params={"sigma": 2.0}),
         {}, "predict", "cluster"),
        ("svc", lambda: TimeSeriesSVC(gamma=8.0, C=1.0),
         {"label_col": "label"}, "predict", "prediction"),
        ("svr", None, {}, "predict", "prediction"),  # built in the test (needs y)
        ("mlp_clf", lambda: TimeSeriesMLPClassifier(hidden_layer_sizes=(8,),
                                                    max_iter=30, random_state=0),
         {"label_col": "label"}, "predict", "prediction"),
        ("mlp_reg", None, {}, "predict", "prediction"),
    ]


class TestEstimatorContract:
    @pytest.mark.parametrize("name", [e[0] for e in _estimators()
                                      if e[1] is not None])
    def test_predict_before_fit_raises(self, spark, name):
        est = dict((e[0], e) for e in _estimators())[name][1]()
        df = _blobs_df(spark, seed=1)
        with pytest.raises((AssertionError, AttributeError, ValueError)):
            est.predict(df).collect()

    @pytest.mark.parametrize("name", [e[0] for e in _estimators()
                                      if e[1] is not None])
    def test_fit_returns_self_and_refit_deterministic(self, spark, name):
        _, factory, kw, pred_attr, out_col = dict(
            (e[0], e) for e in _estimators()
        )[name]
        df = _blobs_df(spark, seed=2)
        runs = []
        for _ in range(2):
            est = factory()
            fitted = est.fit(df, **kw)
            assert fitted is est  # chainable, like the reference
            out = getattr(est, pred_attr)(df)
            assert "series_id" in out.columns and out_col in out.columns
            runs.append(tuple(sorted(
                (r["series_id"], r[out_col]) for r in out.collect()
            )))
        assert runs[0] == runs[1]

    def test_svr_contract(self, spark):
        from tslearn_spark.svm import TimeSeriesSVR

        df = _blobs_df(spark, seed=3).withColumn(
            "y", F.col("series_id").cast("double")
        )
        est = TimeSeriesSVR(gamma=8.0, C=1.0)
        with pytest.raises((AssertionError, AttributeError, ValueError)):
            est.predict(df).collect()
        assert est.fit(df, target_col="y") is est
        out = est.predict(df)
        assert {"series_id", "prediction"} <= set(out.columns)
        assert out.count() == df.count()

    def test_mlp_regressor_contract(self, spark):
        from tslearn_spark.neural_network import TimeSeriesMLPRegressor

        df = _blobs_df(spark, seed=4).withColumn(
            "y", F.col("series_id").cast("double")
        )
        est = TimeSeriesMLPRegressor(hidden_layer_sizes=(8,), max_iter=30,
                                     random_state=0)
        assert est.fit(df, target_col="y") is est
        out = est.predict(df)
        assert out.count() == df.count()

    def test_variable_length_accepted_by_elastic_knn(self, spark):
        # reference tags kNN-DTW ALLOW_VARIABLE_LENGTH (bases.py:21-28)
        from tslearn_spark.neighbors import knn_classify

        X = [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0], [9.0, 8.0, 7.0, 6.0, 5.0],
             [8.0, 7.0, 6.0, 5.0, 4.0, 3.0]]
        y = ["0", "0", "1", "1"]
        df = DS.dataset_to_df(spark, X, labels=y)
        got = {r["series_id"]: r["prediction"]
               for r in knn_classify(df, df, k=1, metric="dtw").collect()}
        assert got == {0: "0", 1: "0", 2: "1", 3: "1"}

    def test_variable_length_rejected_by_rigid_mlp(self, spark):
        # flatten -> fixed-width vectors: ragged input must fail loudly,
        # not silently truncate (reference: check_dims at transform time)
        from tslearn_spark.neural_network import TimeSeriesMLPClassifier

        X = [[1.0, 2.0, 3.0], [1.0, 2.0, 3.0, 4.0]]
        df = DS.dataset_to_df(spark, X, labels=["a", "b"])
        est = TimeSeriesMLPClassifier(hidden_layer_sizes=(4,), max_iter=5,
                                      random_state=0)
        with pytest.raises(Exception):
            est.fit(df).predict(df).collect()


def _all_estimator_classes():
    """Every public estimator class, like the reference's pkgutil walk
    (tslearn/tests/test_estimators.py:62-207)."""
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
    from tslearn_spark.preprocessing import (
        TimeSeriesResampler,
        TimeSeriesScalerMeanVariance,
        TimeSeriesScalerMinMax,
    )
    from tslearn_spark.shapelets import LearningShapelets
    from tslearn_spark.svm import TimeSeriesSVC, TimeSeriesSVR

    return [
        TimeSeriesKMeans, KShape, KernelKMeans, GlobalAlignmentKernelKMeans,
        KNeighborsTimeSeries, KNeighborsTimeSeriesClassifier,
        KNeighborsTimeSeriesRegressor, TimeSeriesSVC, TimeSeriesSVR,
        TimeSeriesMLPClassifier, TimeSeriesMLPRegressor, LearningShapelets,
        SAX, OneDSAX, PiecewiseAggregateApproximation, MatrixProfile,
        TimeSeriesResampler, TimeSeriesScalerMinMax,
        TimeSeriesScalerMeanVariance, NonMyopicEarlyClassifier,
        LabelCategorizer,
    ]


# The reference's variable-length / NaN accept-reject matrix, pinned
# class by class (tags declared via _more_tags at bases.py:21-28,
# kmeans.py:456-457,858-859, neighbors.py:561-562,716-717,
# svm.py:369-371,567-569, shapelets.py:881-887, piecewise.py:257-258,
# matrix_profile.py:252-253, preprocessing.py:200-201,297-298,
# early_classification.py:576-582, utils.py:633-634).  Key -> the two
# core tags; extra tags asserted separately where declared.
_EXPECTED_TAGS = {
    "TimeSeriesKMeans": (True, True),
    "KShape": (False, False),            # rigid: equal-size required
    "KernelKMeans": (True, True),
    "GlobalAlignmentKernelKMeans": (True, True),   # inherits KernelKMeans
    "KNeighborsTimeSeries": (True, True),
    "KNeighborsTimeSeriesClassifier": (True, True),
    "KNeighborsTimeSeriesRegressor": (True, True),
    "TimeSeriesSVC": (True, True),
    "TimeSeriesSVR": (True, True),
    "TimeSeriesMLPClassifier": (False, False),     # flat fixed-width input
    "TimeSeriesMLPRegressor": (False, False),
    "LearningShapelets": (True, True),
    "SAX": (True, True),
    "OneDSAX": (True, True),
    "PiecewiseAggregateApproximation": (True, True),
    "MatrixProfile": (True, True),
    "TimeSeriesResampler": (False, False),         # no _more_tags upstream
    "TimeSeriesScalerMinMax": (True, False),
    "TimeSeriesScalerMeanVariance": (True, False),
    "NonMyopicEarlyClassifier": (False, False),
    "LabelCategorizer": (False, False),
}


class TestEstimatorBattery:
    """Parametrized contract sweep over every estimator class —
    the engine's analogue of the reference's patched check_estimator
    battery (sklearn_patches.py:1-645)."""

    @pytest.mark.parametrize("cls", _all_estimator_classes(),
                             ids=lambda c: c.__name__)
    def test_tag_matrix(self, cls):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            tags = cls()._get_tags()
        allow_nan, allow_vl = _EXPECTED_TAGS[cls.__name__]
        assert tags["allow_nan"] is allow_nan, cls.__name__
        assert tags["allow_variable_length"] is allow_vl, cls.__name__
        # per-class extra declarations
        if cls.__name__ in ("TimeSeriesSVC", "TimeSeriesSVR"):
            assert tags["non_deterministic"] is True
        if cls.__name__ == "NonMyopicEarlyClassifier":
            assert tags["no_validation"] is True
        if cls.__name__ == "LabelCategorizer":
            assert tags["X_types"] == ["1dlabels"]

    @pytest.mark.parametrize("cls", _all_estimator_classes(),
                             ids=lambda c: c.__name__)
    def test_clone_roundtrip(self, cls):
        """sklearn clone contract: get_params of a fresh instance fully
        reconstructs an equivalent instance, and every __init__ param is
        stored verbatim under its own name (no renaming in __init__)."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            est = cls()
            params = est.get_params()
            # every declared __init__ param must be gettable (stored as-is)
            assert set(params) == set(cls._param_names()), cls.__name__
            clone = cls(**params)
        assert clone.get_params() == params

    @pytest.mark.parametrize("cls", _all_estimator_classes(),
                             ids=lambda c: c.__name__)
    def test_set_params_rejects_unknown(self, cls):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            est = cls()
        with pytest.raises(ValueError):
            est.set_params(definitely_not_a_param=1)

    @pytest.mark.parametrize("cls", _all_estimator_classes(),
                             ids=lambda c: c.__name__)
    def test_unfitted_has_no_trailing_underscore_state(self, cls):
        """Fitted attributes are trailing-underscore by sklearn naming;
        a fresh instance must not claim to be fitted."""
        import warnings

        from tslearn_spark.bases import BaseModelPackage

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            est = cls()
        if isinstance(est, BaseModelPackage):
            assert not est._is_fitted(), cls.__name__

    def test_variable_length_matrix_behavior(self, spark):
        """The tags are live contracts, not labels: a tagged-True
        transformer must run on ragged input end-to-end; the rigid MLP
        must raise (asserted in test_variable_length_rejected_by_rigid_mlp)."""
        from tslearn_spark.piecewise import SAX
        from tslearn_spark.matrix_profile import MatrixProfile

        X = [[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
             [5.0, 4.0, 3.0, 2.0, 1.0, 0.0],
             [2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 14.0]]
        df = DS.dataset_to_df(spark, X)
        sax_out = SAX(n_segments=2, alphabet_size_avg=4).fit(df).transform(df)
        assert sax_out.count() == 3
        mp_out = MatrixProfile(subsequence_length=3).fit(df).transform(df)
        assert mp_out.select("series_id").distinct().count() == 3

    def test_variable_length_fit_matrix_clustering_models(self, spark):
        """Tag-True estimators FIT on ragged input end-to-end; KShape
        (tag False, reference requires equal sizes) raises."""
        from tslearn_spark.clustering import KernelKMeans, KShape, TimeSeriesKMeans
        from tslearn_spark.svm import TimeSeriesSVC

        X = [[1.0, 2.0, 3.0, 4.0], [1.1, 2.1, 3.2],
             [9.0, 8.0, 7.0, 6.0, 5.0], [8.8, 7.7, 6.6, 5.5]]
        df = DS.dataset_to_df(spark, X, labels=["a", "a", "b", "b"])
        km = TimeSeriesKMeans(n_clusters=2, metric="dtw", max_iter=3,
                              random_state=0).fit(df)
        assert km.predict(df).count() == 4
        kk = KernelKMeans(n_clusters=2, kernel="gak", max_iter=3,
                          random_state=0,
                          kernel_params={"sigma": 2.0}).fit(df)
        assert kk.predict(df).count() == 4
        svc = TimeSeriesSVC(gamma=2.0, C=1.0).fit(df, label_col="label")
        assert svc.predict(df).count() == 4
        with pytest.raises(Exception):
            KShape(n_clusters=2, max_iter=2, random_state=0).fit(df)\
                .predict(df).collect()

    def test_fitted_attribute_naming(self, spark):
        """After fit, model state lands in trailing-underscore attrs and
        _is_fitted flips (the reference's check_is_fitted contract)."""
        from tslearn_spark.clustering import TimeSeriesKMeans
        from tslearn_spark.labels import LabelCategorizer

        df = _blobs_df(spark, seed=6)
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean", max_iter=3,
                              random_state=0).fit(df)
        assert km._is_fitted()
        fitted_attrs = {k for k in vars(km)
                        if k.endswith("_") and not k.startswith("_")}
        assert "cluster_centers_" in fitted_attrs
        lc = LabelCategorizer()
        y = np.array(["a", "b", "a"])
        lc.fit(y)
        assert lc._is_fitted()


_REF_ROOT = "/root/reference/tslearn"

# our class name -> (reference class name, reference file)
_REF_SIGNATURES = {
    "TimeSeriesKMeans": ("TimeSeriesKMeans", "clustering/kmeans.py"),
    "KernelKMeans": ("KernelKMeans", "clustering/kmeans.py"),
    "KShape": ("KShape", "clustering/kshape.py"),
    "KNeighborsTimeSeries": ("KNeighborsTimeSeries", "neighbors/neighbors.py"),
    "KNeighborsTimeSeriesClassifier":
        ("KNeighborsTimeSeriesClassifier", "neighbors/neighbors.py"),
    "KNeighborsTimeSeriesRegressor":
        ("KNeighborsTimeSeriesRegressor", "neighbors/neighbors.py"),
    "TimeSeriesSVC": ("TimeSeriesSVC", "svm/svm.py"),
    "TimeSeriesSVR": ("TimeSeriesSVR", "svm/svm.py"),
    "LearningShapelets": ("LearningShapelets", "shapelets/shapelets.py"),
    "SAX": ("SymbolicAggregateApproximation", "piecewise/piecewise.py"),
    "OneDSAX":
        ("OneD_SymbolicAggregateApproximation", "piecewise/piecewise.py"),
    "PiecewiseAggregateApproximation":
        ("PiecewiseAggregateApproximation", "piecewise/piecewise.py"),
    "MatrixProfile": ("MatrixProfile", "matrix_profile/matrix_profile.py"),
    "TimeSeriesResampler":
        ("TimeSeriesResampler", "preprocessing/preprocessing.py"),
    "TimeSeriesScalerMinMax":
        ("TimeSeriesScalerMinMax", "preprocessing/preprocessing.py"),
    "TimeSeriesScalerMeanVariance":
        ("TimeSeriesScalerMeanVariance", "preprocessing/preprocessing.py"),
    "NonMyopicEarlyClassifier":
        ("NonMyopicEarlyClassifier",
         "early_classification/early_classification.py"),
    "LabelCategorizer": ("LabelCategorizer", "utils/utils.py"),
}


def _ref_init_args(cls_name: str, rel_path: str):
    import ast
    import os

    path = os.path.join(_REF_ROOT, rel_path)
    if not os.path.exists(path):
        return None
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls_name:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "__init__":
                    args = [a.arg for a in item.args.args if a.arg != "self"]
                    return args + [a.arg for a in item.args.kwonlyargs]
    return None


def _ref_init_defaults(cls_name: str, rel_path: str) -> dict:
    """{param: literal default} for literal-expressible defaults."""
    import ast
    import os

    path = os.path.join(_REF_ROOT, rel_path)
    if not os.path.exists(path):
        return {}
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls_name:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "__init__":
                    args = [a.arg for a in item.args.args if a.arg != "self"]
                    defaults = item.args.defaults
                    out = {}
                    for name, d in zip(args[len(args) - len(defaults):],
                                       defaults):
                        try:
                            out[name] = ast.literal_eval(d)
                        except (ValueError, SyntaxError):
                            pass  # computed default — skip
                    return out
    return {}


class TestSignatureParity:
    """Constructor signatures match the reference POSITIONALLY: the
    reference's __init__ parameters, in the reference's order, form a
    prefix of ours — so reference scripts constructing estimators with
    positional args bind identically.  Engine-only knobs (documented)
    may only trail.  Signatures are AST-parsed from the reference
    source, so a reference upgrade re-checks automatically."""

    @pytest.mark.parametrize("ours", sorted(_REF_SIGNATURES),
                             ids=lambda n: n)
    def test_init_order_is_reference_prefix(self, ours):
        ref_name, rel = _REF_SIGNATURES[ours]
        ref_args = _ref_init_args(ref_name, rel)
        if ref_args is None:
            pytest.skip("reference source unavailable or inherited __init__")
        cls = {c.__name__: c for c in _all_estimator_classes()}[ours]
        mine = cls._param_names()
        assert mine[: len(ref_args)] == ref_args, (
            f"{ours}: reference order {ref_args}, engine order {mine}"
        )
        extras = mine[len(ref_args):]
        # engine-only knobs must be explicitly accounted for here
        allowed_extras = {
            "KShape": ["sz_stats_cap"],
            "LearningShapelets": ["lr"],
            # r10 scale paths: opt-in landmark approximations (Nystroem
            # Gram / landmark-feature LinearSVC), default None = exact
            # r12: explicit landmark ids (curated sets override the
            # seeded hash sample; Rand-vs-exact is spectrum-bounded —
            # see the KernelKMeans.__init__ note)
            "KernelKMeans": ["n_landmarks", "landmarks"],
            "TimeSeriesSVC": ["n_landmarks"],
            "TimeSeriesSVR": ["n_landmarks"],
        }.get(ours, [])
        assert extras == allowed_extras, (
            f"{ours}: undeclared engine-only params {extras}"
        )

    @pytest.mark.parametrize("ours", sorted(_REF_SIGNATURES),
                             ids=lambda n: n)
    def test_init_defaults_match_reference(self, ours):
        """A default-constructed estimator configures like the
        reference's: literal default values are compared one by one."""
        import inspect

        ref_name, rel = _REF_SIGNATURES[ours]
        ref_defaults = _ref_init_defaults(ref_name, rel)
        if not ref_defaults:
            pytest.skip("reference source unavailable or inherited __init__")
        cls = {c.__name__: c for c in _all_estimator_classes()}[ours]
        sig = inspect.signature(cls.__init__)
        mismatches = {
            name: (refv, sig.parameters[name].default)
            for name, refv in ref_defaults.items()
            if name in sig.parameters
            and sig.parameters[name].default != refv
            and not (sig.parameters[name].default is None and refv is None)
        }
        assert not mismatches, f"{ours}: (ref, ours) = {mismatches}"


# module-level public functions: our module -> reference files whose
# top-level functions must exist here with reference-prefix signatures
_REF_FUNC_FILES = {
    "metrics": ["metrics/dtw_variants.py", "metrics/softdtw_variants.py",
                "metrics/ctw.py", "metrics/cycc.py", "metrics/sax.py"],
    "barycenters": ["barycenters/euclidean.py", "barycenters/dba.py",
                    "barycenters/softdtw.py"],
    "utils": ["utils/utils.py"],
    "dataset": ["generators/generators.py"],
    "clustering": ["clustering/utils.py"],
}


def _ref_module_funcs(rel_path: str) -> dict:
    import ast
    import os

    path = os.path.join(_REF_ROOT, rel_path)
    if not os.path.exists(path):
        return {}
    tree = ast.parse(open(path).read())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
            args = [a.arg for a in node.args.args]
            defaults = {}
            for name, d in zip(args[len(args) - len(node.args.defaults):],
                               node.args.defaults):
                try:
                    defaults[name] = ast.literal_eval(d)
                except (ValueError, SyntaxError):
                    pass
            out[node.name] = (args, defaults)
    return out


class TestFunctionSignatureParity:
    """Module-level metric/barycenter functions: names, positional
    order, and literal defaults AST-checked against the reference —
    a reference script calling `dtw_path_from_metric(s1, s2, 'cityblock',
    'sakoe_chiba')` or `dtw_barycenter_averaging(X, 10, None, 30, 1e-5,
    w)` positionally must bind identically.  njit_* numba internals are
    exempt (engine kernels are vectorized numpy, SURVEY §2.4)."""

    @pytest.mark.parametrize("mod", sorted(_REF_FUNC_FILES), ids=lambda m: m)
    def test_function_signatures(self, mod):
        import importlib
        import inspect

        ours_mod = importlib.import_module(f"tslearn_spark.{mod}")
        problems = []
        checked = 0
        for rel in _REF_FUNC_FILES[mod]:
            for name, (args, defaults) in _ref_module_funcs(rel).items():
                if name.startswith("njit_"):
                    continue  # numba internals, not user API
                ours = getattr(ours_mod, name, None)
                if ours is None or not callable(ours):
                    problems.append(f"missing {name}")
                    continue
                try:
                    sig = inspect.signature(ours)
                except (TypeError, ValueError):
                    continue
                mine = [p for p in sig.parameters
                        if sig.parameters[p].kind not in
                        (inspect.Parameter.VAR_POSITIONAL,
                         inspect.Parameter.VAR_KEYWORD)]
                if mine[: len(args)] != args:
                    problems.append(f"order {name}: ref={args} ours={mine}")
                    continue
                checked += 1
                for pname, refv in defaults.items():
                    mv = sig.parameters[pname].default
                    if mv != refv and not (mv is None and refv is None):
                        problems.append(
                            f"default {name}.{pname}: ref={refv!r} ours={mv!r}")
        if checked == 0:
            pytest.skip("reference source unavailable")
        assert not problems, problems


class TestDeprecatedAliases:
    def test_aliases_warn_and_subclass(self):
        import warnings

        from tslearn_spark.clustering import GlobalAlignmentKernelKMeans, KernelKMeans
        from tslearn_spark.shapelets import LearningShapelets, SerializableShapeletModel

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            g = GlobalAlignmentKernelKMeans(n_clusters=2)
            g_pos = GlobalAlignmentKernelKMeans(2)  # reference positional form
            s = SerializableShapeletModel(n_shapelets_per_size={4: 2})
        assert [x.category for x in w] == [DeprecationWarning] * 3
        assert isinstance(g, KernelKMeans) and g.kernel == "gak"
        assert g_pos.n_clusters == 2
        assert isinstance(s, LearningShapelets)
        # like the reference alias, a kernel=... kwarg is a TypeError
        # (kmeans.py:460-473 has no such parameter)
        with pytest.raises(TypeError):
            GlobalAlignmentKernelKMeans(n_clusters=2, kernel="rbf")
        with pytest.raises(TypeError):
            GlobalAlignmentKernelKMeans(n_clusters=2, kernel="gak")
