"""Model layer: GAK-SVM, shapelets, MLP, label categorizer, model IO
(FIXTURES.md §2.8)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tslearn_spark import dataset as DS


class TestSVM:
    def test_svc_variablelength_golden(self, spark):
        # tests/test_variablelength.py:36-45: exact train predictions
        from tslearn_spark.svm import TimeSeriesSVC

        X = [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0],
             [2.0, 5.0, 6.0, 7.0, 8.0, 9.0], [3.0, 5.0, 6.0, 7.0, 8.0]]
        y = ["0", "0", "1", "1"]
        df = DS.dataset_to_df(spark, X, labels=y)
        clf = TimeSeriesSVC(C=1.0, gamma="auto").fit(df)
        pred = {r["series_id"]: r["prediction"] for r in clf.predict(df).collect()}
        assert pred == {0: "0", 1: "0", 2: "1", 3: "1"}

    def test_platt_sigmoid_properties(self):
        """Platt fit on a cleanly separated decision set: monotone
        decreasing in f (A < 0), near 1 for strong positives, near 0
        for strong negatives, and the Newton fit reduces the NLL vs
        the (0, log(N-+1/N++1)) start."""
        from tslearn_spark.svm_solver import platt_fit, platt_predict

        rs = np.random.RandomState(3)
        f = np.concatenate([rs.randn(50) + 2.0, rs.randn(50) - 2.0])
        y = np.concatenate([np.ones(50), -np.ones(50)])
        A, B = platt_fit(f, y)
        assert A < 0
        p = platt_predict(np.array([-4.0, 0.0, 4.0]), A, B)
        assert p[0] < 0.1 and p[2] > 0.9
        assert np.all(np.diff(platt_predict(np.linspace(-5, 5, 20), A, B)) > 0)

    def test_pairwise_coupling_consistency(self):
        """Coupling of mutually consistent pairwise probabilities must
        recover the underlying class ranking; rows sum to 1."""
        from tslearn_spark.svm_solver import pairwise_coupling

        # true p = (0.6, 0.3, 0.1) -> r_ab = p_a/(p_a+p_b)
        p = np.array([0.6, 0.3, 0.1])
        pairs = [(0, 1), (0, 2), (1, 2)]
        R = np.array([[p[a] / (p[a] + p[b]) for a, b in pairs]])
        out = pairwise_coupling(R, 3, pairs)
        assert out.shape == (1, 3)
        assert out[0].sum() == pytest.approx(1.0, abs=1e-9)
        np.testing.assert_allclose(out[0], p, atol=1e-3)

    def test_svc_predict_proba(self, spark):
        """probability=True end to end: rows sum to 1, the max-prob
        class agrees with predict on this cleanly separable fixture."""
        from tslearn_spark.svm import TimeSeriesSVC

        X = [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0], [1.5, 2.5, 3.5],
             [12.0, 15.0, 16.0, 17.0], [13.0, 15.0, 16.0], [12.5, 14.0, 16.5],
             [30.0, 34.0, 36.0], [31.0, 33.0, 35.0, 36.0], [29.0, 33.0, 37.0]]
        y = ["a", "a", "a", "b", "b", "b", "c", "c", "c"]
        df = DS.dataset_to_df(spark, X, labels=y)
        clf = TimeSeriesSVC(C=1.0, gamma="auto", probability=True,
                            random_state=0).fit(df)
        pred = {r["series_id"]: r["prediction"] for r in clf.predict(df).collect()}
        proba = {r["series_id"]: np.array(r["probabilities"])
                 for r in clf.predict_proba(df).collect()}
        classes = [str(c) for c in clf.classes_]
        for sid, p in proba.items():
            assert p.shape == (3,)
            assert p.sum() == pytest.approx(1.0, abs=1e-6)
            assert np.all(p >= 0)
            assert classes[int(np.argmax(p))] == pred[sid]

    def test_svc_decision_function_shapes(self, spark):
        from tslearn_spark.svm import TimeSeriesSVC

        X = [[1.0, 2.0, 3.0], [2.0, 3.0, 4.0],
             [10.0, 12.0, 14.0], [11.0, 12.0, 15.0],
             [30.0, 31.0, 33.0], [29.0, 32.0, 33.0]]
        y = ["a", "a", "b", "b", "c", "c"]
        df = DS.dataset_to_df(spark, X, labels=y)
        ovr = TimeSeriesSVC(gamma="auto").fit(df)
        d = {r["series_id"]: r["decision"]
             for r in ovr.decision_function(df).collect()}
        assert all(len(v) == 3 for v in d.values())  # ovr: one per class
        classes = [str(c) for c in ovr.classes_]
        pred = {r["series_id"]: r["prediction"] for r in ovr.predict(df).collect()}
        for sid, vals in d.items():
            assert classes[int(np.argmax(vals))] == pred[sid]
        ovo = TimeSeriesSVC(gamma="auto", decision_function_shape="ovo").fit(df)
        d2 = ovo.decision_function(df).first()["decision"]
        assert len(d2) == 3  # C(3,2) pair decisions

    def test_svc_class_weight_balanced(self, spark):
        """An 8:2 imbalanced fixture with overlapping classes: balanced
        per-sample C must not leave the minority class unrecallable,
        and per-sample C changes the fitted duals vs uniform C."""
        from tslearn_spark.svm import TimeSeriesSVC

        rs = np.random.RandomState(5)
        X = [list(np.cumsum(rs.randn(6)) + 0.0) for _ in range(8)] + \
            [list(np.cumsum(rs.randn(6)) + 3.0) for _ in range(2)]
        y = ["maj"] * 8 + ["min"] * 2
        df = DS.dataset_to_df(spark, X, labels=y)
        bal = TimeSeriesSVC(C=1.0, gamma="auto",
                            class_weight="balanced").fit(df)
        pred = {r["series_id"]: r["prediction"]
                for r in bal.predict(df).collect()}
        assert pred[8] == "min" and pred[9] == "min"
        uni = TimeSeriesSVC(C=1.0, gamma="auto").fit(df)
        a_bal = bal.model_.machines_[0][2].alpha_
        a_uni = uni.model_.machines_[0][2].alpha_
        assert not np.allclose(a_bal, a_uni)

    def test_flat_kernels(self, spark):
        """linear/rbf/poly/sigmoid on equal-length series (the
        reference's sklearn route): train predictions separate the
        fixture; gamma='auto' resolves to 1/n_features; ragged input is
        rejected for flat kernels only."""
        from tslearn_spark.svm import TimeSeriesSVC

        X = [[1.0, 2.0, 3.0], [2.0, 3.0, 4.0], [1.5, 2.0, 3.5],
             [10.0, 12.0, 14.0], [11.0, 12.0, 15.0], [10.5, 13.0, 14.5]]
        y = ["a", "a", "a", "b", "b", "b"]
        df = DS.dataset_to_df(spark, X, labels=y)
        for kern in ("linear", "rbf", "poly", "sigmoid"):
            clf = TimeSeriesSVC(C=10.0, kernel=kern).fit(df)
            pred = {r["series_id"]: r["prediction"]
                    for r in clf.predict(df).collect()}
            if kern != "sigmoid":  # tanh saturates on this un-scaled fixture
                assert pred == dict(enumerate(["a"] * 3 + ["b"] * 3)), kern
            assert clf.gamma_ == pytest.approx(1.0 / 3.0)
        ragged = DS.dataset_to_df(spark, [[1.0, 2.0], [1.0, 2.0, 3.0]],
                                  labels=["a", "b"])
        with pytest.raises(ValueError):
            TimeSeriesSVC(kernel="rbf").fit(ragged)
        with pytest.raises(NotImplementedError):
            TimeSeriesSVC(kernel="cosine")

    def test_flat_kernel_svr(self, spark):
        from tslearn_spark.svm import TimeSeriesSVR

        X = [[float(i), float(i + 1), float(i + 2)] for i in range(6)]
        yr = [2.0 * i for i in range(6)]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(map(float, yr))),
                                  "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesSVR(C=100.0, kernel="linear", epsilon=0.01).fit(df)
        pred = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        for i in range(6):
            assert pred[i] == pytest.approx(2.0 * i, abs=0.5)

    def test_svr_sign(self, spark):
        # tests/test_variablelength.py:47-51: predictions correlate with sign
        from tslearn_spark.svm import TimeSeriesSVR

        X = [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0],
             [2.0, 5.0, 6.0, 7.0, 8.0, 9.0], [3.0, 5.0, 6.0, 7.0, 8.0]]
        yr = [-1.0, -1.3, 3.2, 4.1]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(yr)), "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesSVR(C=10.0, gamma="auto", epsilon=0.1).fit(df)
        pred = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        assert pred[0] < 0 and pred[1] < 0
        assert pred[2] > 0 and pred[3] > 0


class TestShapelets:
    def test_transform_locate_predict(self, spark):
        from tslearn_spark.shapelets import LearningShapelets

        df = DS.random_walk_blobs(spark=spark, n_ts_per_blob=10, sz=16, d=2, n_blobs=3,
                                  random_state=0)
        clf = LearningShapelets(n_shapelets_per_size={5: 5}, max_iter=100,
                                random_state=0).fit(df)
        t = clf.transform(df).collect()
        assert len(t) == 30 and len(t[0]["shapelet_dists"]) == 5
        locs = clf.locate(df).collect()
        assert all(0 <= p <= 11 for r in locs for p in r["shapelet_locs"])
        pred = clf.predict(df).join(df.select("series_id", "label"), "series_id")
        acc = pred.where(F.col("prediction") == F.col("label")).count() / 30
        assert acc >= 0.8  # separable blobs

    def test_size_heuristic(self):
        from tslearn_spark.shapelets import grabocka_params_to_shapelet_size_dict

        d = grabocka_params_to_shapelet_size_dict(n_ts=100, ts_sz=32, n_classes=3,
                                                  l=0.1, r=2)
        assert set(d) == {3, 6} and all(v >= 1 for v in d.values())

    def test_reference_signature_options(self, spark):
        """scale min-max normalizes every path identically; max_size and
        too-long-shapelet misfits raise like the reference
        (shapelets.py:585-626); optimizer='sgd' trains; non-relu-style
        optimizer values raise."""
        import pytest as _pytest

        from tslearn_spark.shapelets import LearningShapelets

        df = DS.random_walk_blobs(spark=spark, n_ts_per_blob=5, sz=12, d=1, n_blobs=2,
                                  random_state=1)
        # scale=True: transform distances computed on min-max'd series
        clf = LearningShapelets(n_shapelets_per_size={4: 2}, max_iter=20,
                                random_state=0, scale=True).fit(df)
        dists = clf.transform(df).collect()[0]["shapelet_dists"]
        assert all(np.isfinite(x) for x in dists)
        # series longer than max_size rejected at fit
        with _pytest.raises(ValueError, match="max_size"):
            LearningShapelets(n_shapelets_per_size={4: 2}, max_size=8).fit(df)
        # shapelet longer than the shortest series rejected
        with _pytest.raises(ValueError, match="shapelet size"):
            LearningShapelets(n_shapelets_per_size={99: 1}).fit(df)
        # sgd optimizer runs end-to-end
        sgd = LearningShapelets(n_shapelets_per_size={4: 2}, max_iter=10,
                                optimizer="sgd", random_state=0).fit(df)
        assert len(sgd.shapelets_) == 2
        with _pytest.raises(NotImplementedError):
            LearningShapelets(optimizer="rmsprop")
        # auto sizing uses the class-level shapelet_length/total_lengths
        auto = LearningShapelets(max_iter=1, shapelet_length=0.25,
                                 total_lengths=2, random_state=0).fit(df)
        assert set(auto.n_shapelets_per_size) == {3, 6}


class TestMLP:
    def test_classifier(self, spark):
        from tslearn_spark.neural_network import TimeSeriesMLPClassifier

        rs = np.random.RandomState(0)
        X = [rs.randn(8) * 0.2 for _ in range(10)] + \
            [rs.randn(8) * 0.2 + 3 for _ in range(10)]
        y = ["a"] * 10 + ["b"] * 10
        df = DS.dataset_to_df(spark, X, labels=y)
        clf = TimeSeriesMLPClassifier(hidden_layer_sizes=(16,), max_iter=300,
                                      lr=1e-2, random_state=0).fit(df)
        pred = clf.predict(df).join(df.select("series_id", "label"), "series_id")
        acc = pred.where(F.col("prediction") == F.col("label")).count() / 20
        assert acc == 1.0

    def test_regressor(self, spark):
        from tslearn_spark.neural_network import TimeSeriesMLPRegressor

        rs = np.random.RandomState(1)
        X = [rs.randn(6) for _ in range(30)]
        ys = [float(np.mean(x)) for x in X]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(ys)), "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesMLPRegressor(hidden_layer_sizes=(32,), max_iter=200,
                                     lr=2e-2, random_state=0).fit(df)
        pred = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        err = np.mean([(pred[i] - ys[i]) ** 2 for i in range(30)])
        assert err < np.var(ys)  # beats predicting the mean

    def test_regressor_activations(self, spark):
        """tanh/logistic/identity hidden activations train end to end
        and beat the mean predictor; unknown activations raise."""
        from tslearn_spark.neural_network import TimeSeriesMLPRegressor

        rs = np.random.RandomState(2)
        X = [rs.randn(6) for _ in range(30)]
        ys = [float(np.mean(x)) for x in X]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(ys)), "series_id long, y double"),
            "series_id",
        )
        for act in ("tanh", "logistic", "identity"):
            reg = TimeSeriesMLPRegressor(hidden_layer_sizes=(16,),
                                         activation=act, max_iter=200,
                                         lr=2e-2, random_state=0).fit(df)
            pred = {r["series_id"]: r["prediction"]
                    for r in reg.predict(df).collect()}
            err = np.mean([(pred[i] - ys[i]) ** 2 for i in range(30)])
            assert err < np.var(ys), act
        with pytest.raises(NotImplementedError):
            TimeSeriesMLPRegressor(activation="gelu")

    def test_regressor_distributed_parity(self, spark):
        """The distributed full-batch Adam fit matches a driver-side
        full-batch loop built from the same grad/Adam helpers — i.e. no
        trainset collect, same math (float-association drift only)."""
        from tslearn_spark.neural_network import _MLP, TimeSeriesMLPRegressor

        rs = np.random.RandomState(7)
        X = [rs.randn(5) for _ in range(24)]
        ys = [float(x[0] - 2 * x[3]) for x in X]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(ys)), "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesMLPRegressor(hidden_layer_sizes=(8,), max_iter=40,
                                     lr=1e-2, random_state=0).fit(df)

        Xm = np.array(X)
        yarr = np.array(ys)
        mu, sd = yarr.mean(), yarr.std()
        yn = (yarr - mu) / sd
        local = _MLP([5, 8, 1], classifier=False, lr=1e-2, max_iter=40, seed=0)
        local.init()
        state = local.adam_init()
        for step in range(1, 41):
            gWs, gbs = _MLP.grad_sums(local.Ws, local.bs, Xm, yn, classifier=False)
            local.adam_step([g / 24 for g in gWs], [g / 24 for g in gbs], step, state)
        expected = local.predict_raw(Xm).ravel() * sd + mu

        pred = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        got = np.array([pred[i] for i in range(24)])
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


class TestLabelCategorizer:
    def test_roundtrip(self, spark):
        from tslearn_spark.labels import LabelCategorizer

        labels = spark.createDataFrame(
            [(0, "x"), (1, "y"), (2, "x"), (3, "z")], "series_id long, label string"
        )
        lc = LabelCategorizer().fit(labels)
        assert lc.classes_ == ["x", "y", "z"]
        oh = lc.transform(labels)
        got = {r["series_id"]: r["onehot"] for r in oh.collect()}
        assert got[0] == [1.0, 0.0, 0.0] and got[3] == [0.0, 0.0, 1.0]
        back = lc.inverse_transform(oh.drop("label"))
        rt = {r["series_id"]: r["label"] for r in back.collect()}
        assert rt == {0: "x", 1: "y", 2: "x", 3: "z"}

    def test_binary_single_column(self, spark):
        from tslearn_spark.labels import LabelCategorizer

        labels = spark.createDataFrame(
            [(0, "n"), (1, "p")], "series_id long, label string"
        )
        lc = LabelCategorizer(single_column_if_binary=True).fit(labels)
        got = {r["series_id"]: r["onehot"] for r in lc.transform(labels).collect()}
        assert got == {0: [1.0], 1: [-1.0]}


class TestModelIO:
    def test_sax_roundtrip(self, spark, tmp_path):
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.piecewise import SAX

        df = DS.dataset_to_df(spark, [[-1.0, 2.0, 0.1, -1.0, 1.0, -1.0]])
        sax = SAX(n_segments=3, alphabet_size_avg=4).fit(df)
        path = str(tmp_path / "sax.json")
        save_model(sax, path)
        sax2 = load_model(path)
        assert sax2.n_segments == 3
        np.testing.assert_allclose(sax2.breakpoints_avg_, sax.breakpoints_avg_)
        a = [r["sax"] for r in sax.transform(df).collect()]
        b = [r["sax"] for r in sax2.transform(df).collect()]
        assert a == b

    def test_kmeans_roundtrip(self, spark, tmp_path):
        from tslearn_spark.clustering import TimeSeriesKMeans
        from tslearn_spark.model_io import load_model, save_model

        rs = np.random.RandomState(0)
        df = DS.dataset_to_df(
            spark,
            [rs.randn(8) * 0.1 for _ in range(4)]
            + [rs.randn(8) * 0.1 + 9 for _ in range(4)],
        )
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean", max_iter=5,
                              random_state=0).fit(df)
        path = str(tmp_path / "km.json")
        save_model(km, path)
        km2 = load_model(path)
        p1 = {r["series_id"]: r["cluster"] for r in km.predict(df).collect()}
        p2 = {r["series_id"]: r["cluster"] for r in km2.predict(df).collect()}
        assert p1 == p2

    def test_mlp_regressor_roundtrip(self, spark, tmp_path):
        """Nested _MLP object codec: reloaded regressor predicts
        identically (weights round-trip via the __object__ envelope)."""
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.neural_network import TimeSeriesMLPRegressor

        rs = np.random.RandomState(5)
        X = [rs.randn(6) for _ in range(12)]
        ys = [float(np.mean(x)) for x in X]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(ys)), "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesMLPRegressor(hidden_layer_sizes=(4,), max_iter=10,
                                     random_state=0).fit(df)
        path = str(tmp_path / "reg.json")
        save_model(reg, path)
        reg2 = load_model(path)
        p1 = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        p2 = {r["series_id"]: r["prediction"] for r in reg2.predict(df).collect()}
        for i in p1:
            assert p1[i] == pytest.approx(p2[i], abs=1e-12)

    def test_svc_dual_state_roundtrip(self, spark, tmp_path):
        """SVC persists its dual state (per the documented partial row):
        solver machines, classes, and support indices survive; the
        _-prefixed training series are deliberately absent."""
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.svm import TimeSeriesSVC

        rs = np.random.RandomState(6)
        X = [rs.randn(8) * 0.2 for _ in range(6)] + \
            [rs.randn(8) * 0.2 + 3 for _ in range(6)]
        df = DS.dataset_to_df(spark, X, labels=[str(i // 6) for i in range(12)])
        clf = TimeSeriesSVC(C=1.0, gamma=1.0).fit(df)
        path = str(tmp_path / "svc.json")
        save_model(clf, path)
        clf2 = load_model(path)
        assert list(clf2.classes_) == list(clf.classes_)
        np.testing.assert_array_equal(clf2.support_, clf.support_)
        for (a1, b1, m1, i1), (a2, b2, m2, i2) in zip(
            clf.model_.machines_, clf2.model_.machines_
        ):
            assert (a1, b1) == (a2, b2)
            np.testing.assert_allclose(m2.dual_coef_, m1.dual_coef_)
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
        assert not hasattr(clf2, "_train_values")  # never serialized

    def test_mllib_model_rejected(self, spark, tmp_path):
        """TimeSeriesMLPClassifier wraps an MLlib model: model_io must
        refuse with a pointer to Spark-native persistence."""
        import pytest as _pytest

        from tslearn_spark.model_io import save_model
        from tslearn_spark.neural_network import TimeSeriesMLPClassifier

        rs = np.random.RandomState(7)
        X = [rs.randn(6) * 0.2 for _ in range(6)] + \
            [rs.randn(6) * 0.2 + 3 for _ in range(6)]
        df = DS.dataset_to_df(spark, X, labels=[str(i // 6) for i in range(12)])
        clf = TimeSeriesMLPClassifier(hidden_layer_sizes=(4,), max_iter=5,
                                      random_state=0).fit(df)
        with _pytest.raises(NotImplementedError, match="MLlib"):
            save_model(clf, str(tmp_path / "clf.json"))

    def test_unsupported_formats_fail_loudly(self, tmp_path):
        """pickle is always rejected with the documented reason; hdf5 is
        rejected loudly only where h5py is absent (reference exposes all
        three at bases.py:164-287; hdf5 gated like its HDF5_INSTALLED)."""
        import pytest

        from tslearn_spark.hdftools import HDF5_INSTALLED
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.piecewise import SAX

        sax = SAX(n_segments=3, alphabet_size_avg=4)
        if not HDF5_INSTALLED:
            with pytest.raises(NotImplementedError, match="HDF5"):
                save_model(sax, str(tmp_path / "m.h5"))
            with pytest.raises(NotImplementedError, match="HDF5"):
                save_model(sax, str(tmp_path / "m.json"), fmt="hdf5")
        with pytest.raises(ValueError, match="pickle.*rejected"):
            save_model(sax, str(tmp_path / "m.pkl"))
        with pytest.raises(ValueError, match="unknown model format"):
            save_model(sax, str(tmp_path / "m.json"), fmt="msgpack")
        # load side enforces the same matrix
        save_model(sax, str(tmp_path / "m.json"))
        if not HDF5_INSTALLED:
            with pytest.raises(NotImplementedError, match="HDF5"):
                load_model(str(tmp_path / "m.json"), fmt="hdf5")
        assert load_model(str(tmp_path / "m.json")).n_segments == 3

    def test_h5_codec_dict_roundtrip(self):
        """_encode_h5/_decode_h5 round-trip the structures HDF5 cannot
        express natively — lists/tuples (incl. lists of arrays), None,
        registered helper objects — without needing h5py."""
        from tslearn_spark.model_io import _decode_h5, _encode_h5
        from tslearn_spark.svm_solver import KernelSVR

        helper = KernelSVR.__new__(KernelSVR)
        helper.C = 2.0
        helper.beta_ = np.arange(4.0)
        payload = {
            "classes_": ["a", "b"],
            "weights": [np.ones(3), np.zeros(2)],
            "shape": (4, 2),
            "maybe": None,
            "model_": helper,
            "arr": np.eye(2),
            "nested": {"xs": (1, 2.5, "z")},
        }
        out = _decode_h5(_encode_h5(payload))
        assert out["classes_"] == ["a", "b"]
        np.testing.assert_array_equal(out["weights"][0], np.ones(3))
        assert out["shape"] == (4, 2)
        assert out["maybe"] is None
        assert isinstance(out["model_"], KernelSVR)
        assert out["model_"].C == 2.0
        np.testing.assert_array_equal(out["model_"].beta_, np.arange(4.0))
        np.testing.assert_array_equal(out["arr"], np.eye(2))
        assert out["nested"]["xs"] == (1, 2.5, "z")

    def test_hdf5_roundtrip_when_h5py_present(self, spark, tmp_path):
        """Reference HDF5 layout round-trip (bases.py:164-210,
        hdftools.py:8-150) — runs wherever h5py exists."""
        import pytest

        pytest.importorskip("h5py")
        from tslearn_spark.clustering import TimeSeriesKMeans
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.piecewise import SAX

        df = DS.dataset_to_df(spark, [[-1.0, 2.0, 0.1, -1.0, 1.0, -1.0],
                                      [0.5, 0.5, -0.5, -0.5, 1.0, 0.0]])
        sax = SAX(n_segments=3, alphabet_size_avg=4).fit(df)
        path = str(tmp_path / "sax.h5")
        sax.to_hdf5(path)
        sax2 = SAX.from_hdf5(path)
        assert int(sax2.n_segments) == 3
        np.testing.assert_allclose(sax2.breakpoints_avg_, sax.breakpoints_avg_)
        a = [r["sax"] for r in sax.transform(df).orderBy("series_id").collect()]
        b = [r["sax"] for r in sax2.transform(df).orderBy("series_id").collect()]
        assert a == b
        # existing file -> FileExistsError, like the reference
        with pytest.raises(FileExistsError):
            sax.to_hdf5(path)
        # save_model/load_model route .h5 through the same codec
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean", max_iter=3,
                              random_state=0).fit(df)
        kpath = str(tmp_path / "km.h5")
        save_model(km, kpath)
        km2 = load_model(kpath)
        np.testing.assert_allclose(km2.cluster_centers_, km.cluster_centers_)


class TestBasesProtocol:
    """tslearn.bases parity: instance-level to_json/from_json +
    sklearn get_params/set_params on the estimator surface."""

    def test_get_set_params(self):
        from tslearn_spark.clustering import TimeSeriesKMeans

        km = TimeSeriesKMeans(n_clusters=4, metric="euclidean")
        p = km.get_params()
        assert p["n_clusters"] == 4 and p["metric"] == "euclidean"
        km.set_params(n_clusters=7)
        assert km.n_clusters == 7
        with pytest.raises(ValueError):
            km.set_params(bogus=1)

    def test_unfitted_to_json_raises(self, tmp_path):
        from tslearn_spark.clustering import TimeSeriesKMeans

        with pytest.raises(ValueError):
            TimeSeriesKMeans().to_json(str(tmp_path / "m.json"))

    def test_fit_to_json_from_json_roundtrip(self, spark, tmp_path):
        from tslearn_spark.clustering import TimeSeriesKMeans
        from tslearn_spark.piecewise import SAX

        X = [[1.0, 1.1, 1.0], [0.9, 1.0, 1.1],
             [8.0, 8.2, 8.1], [8.1, 8.0, 7.9]]
        df = DS.dataset_to_df(spark, X)
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean",
                              random_state=0).fit(df)
        path = str(tmp_path / "km.json")
        km.to_json(path)
        back = TimeSeriesKMeans.from_json(path)
        np.testing.assert_allclose(back.cluster_centers_, km.cluster_centers_)
        assert back.n_clusters == 2
        # wrong-class load fails loudly
        with pytest.raises(TypeError):
            SAX.from_json(path)

    def test_rejected_codecs(self, tmp_path):
        from tslearn_spark.clustering import TimeSeriesKMeans

        km = TimeSeriesKMeans()
        with pytest.raises(NotImplementedError):
            km.to_hdf5(str(tmp_path / "m.h5"))
        with pytest.raises(ValueError):
            km.to_pickle(str(tmp_path / "m.pkl"))

    def test_scalers_have_params_not_package(self):
        from tslearn_spark.preprocessing import TimeSeriesScalerMeanVariance

        sc = TimeSeriesScalerMeanVariance()
        assert "mu" in sc.get_params() and "std" in sc.get_params()
        # reference scalers do not inherit BaseModelPackage
        assert not hasattr(sc, "to_json")
