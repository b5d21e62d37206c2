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
