"""Reference numpy-protocol compatibility.

Reference users call every estimator with numpy arrays
(`TimeSeriesKMeans().fit(X).predict(X2)`); these tests run exactly
those call shapes against the engine — array in, numpy out — with the
DataFrame path untouched (covered everywhere else).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture()
def blobs(spark):  # spark fixture activates the session the adapter needs
    rs = np.random.RandomState(0)
    X = np.concatenate([
        rs.randn(5, 8, 1) * 0.2,
        rs.randn(5, 8, 1) * 0.2 + 5.0,
    ])
    y = np.array([0] * 5 + [1] * 5)
    return X, y


class TestClusteringCompat:
    def test_kmeans_fit_predict(self, blobs):
        from tslearn_spark.clustering import TimeSeriesKMeans

        X, _ = blobs
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean", random_state=0)
        labels = km.fit_predict(X)
        assert isinstance(labels, np.ndarray) and labels.shape == (10,)
        assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
        assert labels[0] != labels[9]
        again = km.predict(X)
        np.testing.assert_array_equal(again, labels)

    def test_kshape_arrays(self, blobs):
        from tslearn_spark.clustering import KShape

        X, _ = blobs
        labels = KShape(n_clusters=2, random_state=0).fit_predict(X)
        assert labels.shape == (10,)

    def test_kernel_kmeans_arrays(self, blobs):
        from tslearn_spark.clustering import KernelKMeans

        X, _ = blobs
        labels = KernelKMeans(n_clusters=2, kernel="gak",
                              random_state=0).fit_predict(X)
        assert labels.shape == (10,)


class TestSupervisedCompat:
    def test_knn_classifier_fit_X_y(self, blobs):
        from tslearn_spark.neighbors import KNeighborsTimeSeriesClassifier

        X, y = blobs
        clf = KNeighborsTimeSeriesClassifier(n_neighbors=1,
                                             metric="euclidean").fit(X, y)
        pred = clf.predict(X)
        assert isinstance(pred, np.ndarray)
        np.testing.assert_array_equal(pred, y)  # int labels back as ints

    def test_kneighbors_tuple_output(self, blobs):
        from tslearn_spark.neighbors import KNeighborsTimeSeries

        X, _ = blobs
        nn = KNeighborsTimeSeries(n_neighbors=3, metric="euclidean").fit(X)
        dists, inds = nn.kneighbors(X)
        assert dists.shape == (10, 3) and inds.shape == (10, 3)
        # nearest neighbor of each series is itself at distance 0
        np.testing.assert_array_equal(inds[:, 0], np.arange(10))
        # BLAS-form euclidean (ssq1+ssq2-2dot) leaves ~1e-8 cancellation
        # noise on self-distances
        np.testing.assert_allclose(dists[:, 0], 0.0, atol=1e-6)
        assert np.all(np.diff(dists, axis=1) >= -1e-12)  # rank-ordered

    def test_label_categorizer_arrays(self, spark):
        from tslearn_spark.labels import LabelCategorizer

        y = np.array([1, 0, 2, 1])
        oh = LabelCategorizer().fit_transform(y)
        assert isinstance(oh, np.ndarray) and oh.shape == (4, 3)
        np.testing.assert_array_equal(oh.argmax(axis=1), y)
        np.testing.assert_allclose(oh.sum(axis=1), 1.0)

    def test_label_categorizer_inverse_arrays(self, spark):
        from tslearn_spark.labels import LabelCategorizer

        y = np.array([2, 0, 1])
        lc = LabelCategorizer().fit(y)
        oh = lc.transform(y)
        back = lc.inverse_transform(oh)
        np.testing.assert_array_equal(back, y)

    def test_early_classifier_arrays(self, blobs):
        from tslearn_spark.early_classification import NonMyopicEarlyClassifier

        X, y = blobs
        ec = NonMyopicEarlyClassifier(n_clusters=2, lamb=100.0,
                                      cost_time_parameter=0.01,
                                      random_state=0).fit(X, y)
        preds, times = ec.predict_class_and_earliness(X)
        assert preds.shape == (10,) and times.shape == (10,)
        assert np.all((times >= 1) & (times <= 8))
        only = ec.predict(X)
        np.testing.assert_array_equal(only, preds)

    def test_knn_regressor_fit_X_y(self, blobs):
        from tslearn_spark.neighbors import KNeighborsTimeSeriesRegressor

        X, _ = blobs
        yr = X[:, :, 0].mean(axis=1)
        reg = KNeighborsTimeSeriesRegressor(n_neighbors=1,
                                            metric="euclidean").fit(X, yr)
        pred = reg.predict(X)
        np.testing.assert_allclose(pred, yr, atol=1e-9)

    def test_svc_fit_X_y(self, blobs):
        from tslearn_spark.svm import TimeSeriesSVC

        X, y = blobs
        clf = TimeSeriesSVC(kernel="linear", C=10.0).fit(X, y)
        np.testing.assert_array_equal(clf.predict(X), y)

    def test_mlp_regressor_fit_X_y(self, blobs):
        from tslearn_spark.neural_network import TimeSeriesMLPRegressor

        X, _ = blobs
        yr = X[:, :, 0].mean(axis=1)
        reg = TimeSeriesMLPRegressor(hidden_layer_sizes=(16,), max_iter=150,
                                     lr=2e-2, random_state=0).fit(X, yr)
        pred = reg.predict(X)
        assert isinstance(pred, np.ndarray)
        assert np.mean((pred - yr) ** 2) < np.var(yr)

    def test_shapelets_fit_X_y(self, blobs):
        from tslearn_spark.shapelets import LearningShapelets

        X, y = blobs
        clf = LearningShapelets(n_shapelets_per_size={4: 2}, max_iter=50,
                                random_state=0).fit(X, y)
        tr = clf.transform(X)
        assert isinstance(tr, np.ndarray) and tr.shape[0] == 10
        pred = clf.predict(X)
        assert set(np.asarray(pred).tolist()) <= {0, 1}


class TestTransformCompat:
    def test_scaler_tensor_in_out(self, blobs):
        from tslearn_spark.preprocessing import TimeSeriesScalerMeanVariance

        X, _ = blobs
        out = TimeSeriesScalerMeanVariance().fit_transform(X)
        assert isinstance(out, np.ndarray) and out.shape == X.shape
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-9)

    def test_resampler(self, blobs):
        from tslearn_spark.preprocessing import TimeSeriesResampler

        X, _ = blobs
        out = TimeSeriesResampler(sz=4).fit_transform(X)
        assert out.shape == (10, 4, 1)

    def test_paa_and_sax(self, blobs):
        from tslearn_spark.piecewise import (
            PiecewiseAggregateApproximation, SymbolicAggregateApproximation,
        )

        X, _ = blobs
        paa = PiecewiseAggregateApproximation(n_segments=4).fit_transform(X)
        assert paa.shape == (10, 4, 1)
        sax = SymbolicAggregateApproximation(
            n_segments=4, alphabet_size_avg=5).fit(X).transform(X)
        sax = np.asarray(sax)
        assert sax.shape[0] == 10
        assert sax.min() >= 0 and sax.max() <= 4

    def test_matrix_profile(self, blobs):
        from tslearn_spark.matrix_profile import MatrixProfile

        X, _ = blobs
        prof = MatrixProfile(subsequence_length=3).fit_transform(X)
        assert isinstance(prof, np.ndarray) and prof.shape[0] == 10

    def test_barycenters_and_silhouette(self, blobs):
        from tslearn_spark.barycenters import (
            dtw_barycenter_averaging, euclidean_barycenter, softdtw_barycenter,
        )
        from tslearn_spark.clustering import silhouette_score

        X, y = blobs
        eb = euclidean_barycenter(X)
        assert eb.shape == (8, 1)
        np.testing.assert_allclose(eb[:, 0], X[:, :, 0].mean(axis=0))
        dba = dtw_barycenter_averaging(X, barycenter_size=8, max_iter=2)
        assert dba.shape == (8, 1)
        sb = softdtw_barycenter(X, gamma=1.0, max_iter=3)
        assert sb.shape == (8, 1)
        s = silhouette_score(X, y, metric="euclidean")
        assert 0.5 < s <= 1.0  # well-separated blobs

    def test_no_active_session_raises(self):
        from pyspark.sql import SparkSession

        from tslearn_spark.bases import as_ts_df

        if SparkSession.getActiveSession() is not None:
            pytest.skip("session active in this worker")
        with pytest.raises(RuntimeError):
            as_ts_df(np.zeros((2, 4, 1)))


class TestReviewRegressions:
    """Regressions from the round-5 code review of the numpy protocol."""

    def test_dataframe_plus_y_rejected(self, spark, blobs):
        from tslearn_spark import dataset as DS
        from tslearn_spark.neighbors import KNeighborsTimeSeriesClassifier

        X, y = blobs
        df = DS.dataset_to_df(spark, [x[:, 0] for x in X],
                              labels=[str(v) for v in y])
        with pytest.raises(ValueError):
            KNeighborsTimeSeriesClassifier().fit(df, y)
        with pytest.raises(TypeError):
            KNeighborsTimeSeriesClassifier().fit(df, "label")

    def test_class_weight_int_keys_numpy_fit(self, blobs):
        from tslearn_spark.svm import TimeSeriesSVC

        X, y = blobs
        # C small enough that the box constraint binds — otherwise the
        # separable fixture's interior optimum hides the weights
        weighted = TimeSeriesSVC(kernel="linear", C=0.005,
                                 class_weight={0: 10.0}).fit(X, y)
        uniform = TimeSeriesSVC(kernel="linear", C=0.005).fit(X, y)
        a_w = weighted.model_.machines_[0][2].alpha_
        a_u = uniform.model_.machines_[0][2].alpha_
        assert not np.allclose(a_w, a_u)  # int-keyed dict must take effect
        assert a_w.max() > a_u.max()      # class-0 cap lifted to 10*C

    def test_string_digit_labels_preserved(self, blobs):
        from tslearn_spark.neighbors import KNeighborsTimeSeriesClassifier

        X, _ = blobs
        y = np.array(["007", "007", "007", "007", "007",
                      "1", "1", "1", "1", "1"])
        pred = KNeighborsTimeSeriesClassifier(
            n_neighbors=1, metric="euclidean").fit(X, y).predict(X)
        np.testing.assert_array_equal(pred, y)  # strings stay strings

    def test_smart_labels_round_trip_guard(self):
        # round-6 ADVICE: '007' / '1e3' parse as numbers but must not be
        # coerced — only clean round-trips come back numeric
        from tslearn_spark.bases import _smart_labels

        np.testing.assert_array_equal(_smart_labels(["1", "2"]), [1, 2])
        np.testing.assert_array_equal(_smart_labels(["1.5", "2.5"]), [1.5, 2.5])
        np.testing.assert_array_equal(_smart_labels(["7.0", "8.0"]), [7.0, 8.0])
        assert _smart_labels(["7.0", "8.0"]).dtype.kind == "f"
        np.testing.assert_array_equal(_smart_labels(["007", "1"]), ["007", "1"])
        np.testing.assert_array_equal(_smart_labels(["1e3", "2"]), ["1e3", "2"])
        np.testing.assert_array_equal(_smart_labels(["a", "b"]), ["a", "b"])
        # object-dtype arrays (pandas string columns) take the same
        # round-trip path as str arrays, not the numeric fast path
        obj = np.array(["007", "1"], dtype=object)
        np.testing.assert_array_equal(_smart_labels(obj), ["007", "1"])
        np.testing.assert_array_equal(
            _smart_labels(np.array([1, 2], dtype=object)), [1, 2])

    def test_label_categorizer_string_digit_labels(self, spark):
        from tslearn_spark.labels import LabelCategorizer

        lc = LabelCategorizer()
        one_hot = lc.fit_transform(np.array(["007", "1", "007"]))
        back = lc.inverse_transform(one_hot)
        np.testing.assert_array_equal(back, ["007", "1", "007"])

    def test_unsupervised_fit_accepts_y(self, blobs):
        from tslearn_spark.clustering import KernelKMeans, KShape, TimeSeriesKMeans

        X, y = blobs
        for cls in (TimeSeriesKMeans, KShape, KernelKMeans):
            kw = {"metric": "euclidean"} if cls is TimeSeriesKMeans else {}
            est = cls(n_clusters=2, random_state=0, **kw)
            assert est.fit(X, y) is est  # sklearn-style ignored y

    def test_early_classification_cost_arrays(self, blobs):
        from tslearn_spark.early_classification import NonMyopicEarlyClassifier

        X, y = blobs
        ec = NonMyopicEarlyClassifier(n_clusters=2, lamb=100.0,
                                      cost_time_parameter=0.01,
                                      random_state=0).fit(X, y)
        cost = ec.early_classification_cost(X, y)
        assert isinstance(cost, float) and cost >= 0.0

    def test_archive_injected_baseline_multivariate_raises(self, tmp_path):
        from tslearn_spark.sources import UCR_UEA_datasets

        p = tmp_path / "singleTrainTest.csv"
        p.write_text(",C45\nAdiac,0.5\n")
        u = UCR_UEA_datasets(baseline_scores_file=str(p))
        assert u.list_univariate_datasets() == ["Adiac"]
        with pytest.raises(ValueError):
            u.list_multivariate_datasets()

    def test_extract_zip_default_target(self, tmp_path):
        import zipfile

        from tslearn_spark.sources import extract_from_zip_url

        z = tmp_path / "d.zip"
        with zipfile.ZipFile(z, "w") as zf:
            zf.writestr("f.txt", "hi")
        out = extract_from_zip_url(z.as_uri())  # target_dir omitted
        assert out is not None
        import os
        assert os.path.exists(os.path.join(out, "f.txt"))
