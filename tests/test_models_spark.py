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

    def test_svc_landmark_scale_path(self, spark):
        """n_landmarks: distributed landmark-feature fit (MLlib
        LinearSVC / OneVsRest on k(x, l_j) features) matches the exact
        SMO on separable data — binary, 3-class, and a flat kernel —
        and predict stays a distributed DataFrame plan."""
        from tslearn_spark.svm import TimeSeriesSVC

        rs = np.random.RandomState(5)
        X = [list(rs.randn(12) * 0.3 + (0 if i < 15 else 4))
             for i in range(30)]
        y = ["a"] * 15 + ["b"] * 15
        df = DS.dataset_to_df(spark, X, labels=y).cache()
        df.count()
        exact = TimeSeriesSVC(kernel="gak", random_state=0).fit(df)
        lm = TimeSeriesSVC(kernel="gak", random_state=0,
                           n_landmarks=8).fit(df)
        pe = {r["series_id"]: r["prediction"]
              for r in exact.predict(df).collect()}
        pl = {r["series_id"]: r["prediction"]
              for r in lm.predict(df).collect()}
        assert pe == pl == {i: y[i] for i in range(30)}
        assert list(lm.classes_) == ["a", "b"]
        # 3-class goes through OneVsRest
        X3 = X + [list(rs.randn(12) * 0.3 - 4) for _ in range(10)]
        y3 = y + ["c"] * 10
        df3 = DS.dataset_to_df(spark, X3, labels=y3).cache()
        df3.count()
        lm3 = TimeSeriesSVC(kernel="gak", random_state=0,
                            n_landmarks=10).fit(df3)
        p3 = {r["series_id"]: r["prediction"]
              for r in lm3.predict(df3).collect()}
        assert p3 == {i: y3[i] for i in range(40)}
        # flat kernel landmark features (broadcast BLAS pass, no cdist)
        lmr = TimeSeriesSVC(kernel="rbf", random_state=0,
                            n_landmarks=8).fit(df)
        pr = {r["series_id"]: r["prediction"]
              for r in lmr.predict(df).collect()}
        assert pr == {i: y[i] for i in range(30)}

    def test_landmark_dual_surface_raises(self, spark):
        """The landmark path never computes the libsvm dual surface:
        support_/dual_coef_/n_support_ must raise a clear
        NotImplementedError naming n_landmarks (NOT return a
        legit-looking empty array), while the estimator still reads as
        fitted for serialization guards."""
        from tslearn_spark.svm import TimeSeriesSVC, TimeSeriesSVR

        rs = np.random.RandomState(2)
        X = [list(rs.randn(8) * 0.3 + (0 if i < 8 else 4))
             for i in range(16)]
        df = DS.dataset_to_df(spark, X, labels=["a"] * 8 + ["b"] * 8)
        lm = TimeSeriesSVC(kernel="rbf", random_state=0,
                           n_landmarks=6).fit(df)
        assert lm._is_fitted()
        for attr in ("support_", "n_support_", "dual_coef_", "intercept_",
                     "support_vectors_", "svm_estimator_"):
            with pytest.raises(NotImplementedError, match="n_landmarks"):
                getattr(lm, attr)
        dfr = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(
                [(i, float(i)) for i in range(16)],
                "series_id long, y double"), "series_id")
        lmr = TimeSeriesSVR(kernel="rbf", n_landmarks=6).fit(dfr)
        assert lmr._is_fitted()
        with pytest.raises(NotImplementedError, match="n_landmarks"):
            lmr.support_
        # the error ALSO subclasses AttributeError, so generic
        # introspection (hasattr, getattr-with-default — sklearn meta-
        # estimators, serializers) takes the absent-attribute fallback
        # instead of crashing mid-probe
        assert not hasattr(lm, "support_")
        assert getattr(lm, "dual_coef_", None) is None
        # unfitted estimators still raise plain AttributeError
        with pytest.raises(AttributeError):
            TimeSeriesSVC().support_

    def test_svr_landmark_scale_path(self, spark):
        """TimeSeriesSVR(n_landmarks=m): kernel ridge on landmark
        features (MLlib has no epsilon-insensitive solver) tracks the
        exact epsilon-SVR closely on a smooth target, for gak and a
        flat kernel."""
        from tslearn_spark.svm import TimeSeriesSVR

        rs = np.random.RandomState(9)
        X, y = [], []
        for i in range(30):
            lvl = rs.uniform(-2, 2)
            X.append(list(lvl + rs.randn(10) * 0.05))
            y.append(2.0 * lvl + 1.0)
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(y)],
                "series_id long, y double"), "series_id").cache()
        df.count()
        y_arr = np.asarray(y)
        for kernel in ("gak", "rbf"):
            exact = TimeSeriesSVR(kernel=kernel).fit(df)
            lm = TimeSeriesSVR(kernel=kernel, n_landmarks=10).fit(df)
            pe = {r["series_id"]: r["prediction"]
                  for r in exact.predict(df).collect()}
            pl = {r["series_id"]: r["prediction"]
                  for r in lm.predict(df).collect()}
            var = float(((y_arr - y_arr.mean()) ** 2).sum())
            r2e = 1.0 - sum((pe[i] - y[i]) ** 2 for i in range(30)) / var
            r2l = 1.0 - sum((pl[i] - y[i]) ** 2 for i in range(30)) / var
            assert r2e > 0.9, (kernel, r2e)
            assert r2l > 0.9, (kernel, r2l)

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

    def test_svc_libsvm_attribute_surface(self, spark):
        """Reference fitted-attr surface (svm.py:155-196): n_support_ /
        support_ / dual_coef_ / intercept_ / support_vectors_ /
        svm_estimator_ in libsvm layout.  Self-consistency: each ovo
        machine's decision function is reproducible from the PACKED
        dual_coef_ columns, and support_ is class-grouped so that
        support_vectors_ slicing by n_support_ is valid."""
        from tslearn_spark.svm import TimeSeriesSVC, _flat_kernel_matrix

        rs = np.random.RandomState(9)
        X = ([rs.randn(6) * 0.3 for _ in range(5)]
             + [rs.randn(6) * 0.3 + 3 for _ in range(5)]
             + [rs.randn(6) * 0.3 - 3 for _ in range(5)])
        labels = [str(i // 5) for i in range(15)]
        df = DS.dataset_to_df(spark, X, labels=labels)
        clf = TimeSeriesSVC(C=1.0, kernel="rbf", gamma=0.5).fit(df)
        k = len(clf.classes_)
        assert k == 3
        # shape contracts
        n_sv = clf.n_support_
        assert n_sv.shape == (k,) and n_sv.dtype == np.int32
        assert int(n_sv.sum()) == len(clf.support_) == clf.dual_coef_.shape[1]
        assert clf.dual_coef_.shape[0] == k - 1
        assert clf.intercept_.shape == (k * (k - 1) // 2,)
        assert clf.svm_estimator_ is clf.model_
        # doctest contract (reference svm.py:190-196)
        sv = clf.support_vectors_
        assert sum(len(s) for s in sv) == int(clf.svm_estimator_.n_support_.sum())
        for c, s in enumerate(sv):
            assert s.shape == (int(n_sv[c]), 6, 1)
        # support_ is grouped by class, ascending within each class
        y_idx = np.array([int(l) for l in labels])
        start = 0
        for c in range(k):
            seg = clf.support_[start:start + int(n_sv[c])]
            assert (y_idx[seg] == c).all()
            assert (np.diff(seg) > 0).all()
            start += int(n_sv[c])
        # decision functions reconstruct from the packed duals
        Xf = np.stack([np.asarray(x, dtype=np.float64) for x in X])
        Kmat = _flat_kernel_matrix(Xf, Xf, "rbf", clf.gamma_, 3, 0.0)
        pos = {int(t): j for j, t in enumerate(clf.support_)}
        for mi, (a, b, m, idx) in enumerate(clf.model_.machines_):
            want = m.decision_function(Kmat[:, idx])
            got = np.full(len(X), clf.intercept_[mi])
            for t in idx:
                j = pos.get(int(t))
                if j is None:
                    continue
                c = int(y_idx[t])
                o = b if c == a else a
                got += clf.dual_coef_[o - (o > c), j] * Kmat[:, t]
            np.testing.assert_allclose(got, want, atol=1e-9)
        # deprecated alias warns and stacks all SVs
        with pytest.warns(DeprecationWarning):
            all_sv = clf.support_vectors_time_series_()
        assert all_sv.shape == (int(n_sv.sum()), 6, 1)
        # coef_ is linear-kernel-only (sklearn semantics)
        with pytest.raises(AttributeError, match="linear"):
            clf.coef_
        lin = TimeSeriesSVC(C=1.0, kernel="linear").fit(df)
        # sklearn's _one_vs_one_coef: one hyperplane per ovo machine
        assert lin.coef_.shape == (k * (k - 1) // 2, 6)
        # each row IS that machine's hyperplane: w @ x + b == decision
        for mi, (a, b, m, idx) in enumerate(lin.model_.machines_):
            want = m.decision_function(Xf @ Xf[idx].T)  # linear K(query, sub)
            got = Xf @ lin.coef_[mi] + lin.intercept_[mi]
            np.testing.assert_allclose(got, want, atol=1e-9)

    def test_svr_libsvm_attribute_surface(self, spark):
        """SVR twin: support_ / dual_coef_ (1, n_SV) / intercept_ (1,) /
        support_vectors_ (n_SV, sz, d); prediction reconstructs from the
        dual surface."""
        from tslearn_spark.svm import TimeSeriesSVR, _flat_kernel_matrix

        rs = np.random.RandomState(4)
        X = [rs.randn(6) for _ in range(12)]
        ys = [float(np.sum(x)) for x in X]
        df = DS.dataset_to_df(spark, X).join(
            spark.createDataFrame(list(enumerate(ys)), "series_id long, y double"),
            "series_id",
        )
        reg = TimeSeriesSVR(C=1.0, kernel="rbf", gamma=0.5, epsilon=0.1).fit(df)
        n_sv = len(reg.support_)
        assert reg.dual_coef_.shape == (1, n_sv)
        assert reg.intercept_.shape == (1,)
        assert reg.support_vectors_.shape == (n_sv, 6, 1)
        assert reg.svm_estimator_ is reg.model_
        # dual reconstruction == the engine's distributed prediction
        Xf = np.stack([np.asarray(x, dtype=np.float64) for x in X])
        Kmat = _flat_kernel_matrix(Xf, Xf, "rbf", reg.gamma_, 3, 0.0)
        want = {r["series_id"]: r["prediction"] for r in reg.predict(df).collect()}
        got = Kmat[:, reg.support_] @ reg.dual_coef_[0] + reg.intercept_[0]
        for i in range(len(X)):
            assert got[i] == pytest.approx(want[i], abs=1e-9)

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

    def test_reference_attribute_surface(self, spark):
        """Reference fitted attrs (shapelets.py:291-306): NaN-padded
        shapelets_as_time_series_, history_ loss curve, n_iter_, and the
        three submodel handles whose .predict agrees with the
        distributed transform/locate/predict paths."""
        import pytest as _pytest

        from tslearn_spark.shapelets import LearningShapelets

        df = DS.random_walk_blobs(spark=spark, n_ts_per_blob=6, sz=16, d=1,
                                  n_blobs=2, random_state=2)
        clf = LearningShapelets(n_shapelets_per_size={3: 2, 4: 1},
                                max_iter=15, random_state=0)
        # unfitted: the reference probes fitted state via hasattr
        assert not hasattr(clf, "model_")
        clf.fit(df)
        # doctest shape contract (shapelets.py:392-393)
        sts = clf.shapelets_as_time_series_
        assert sts.shape == (3, 4, 1)
        assert np.isnan(sts[0, 3, 0]) and np.isnan(sts[1, 3, 0])
        assert not np.isnan(sts[2]).any()
        # history/n_iter (shapelets.py:445-451)
        assert clf.n_iter_ == 15 and len(clf.history_["loss"]) == 15
        assert all(np.isfinite(v) for v in clf.history_["loss"])
        # submodels agree with the distributed paths
        rows = df.select("series_id", "values").orderBy("series_id").collect()
        X = np.array([[ [float(x) for x in r] for r in row["values"]]
                      for row in rows])
        td = {r["series_id"]: r["shapelet_dists"]
              for r in clf.transform(df).collect()}
        np.testing.assert_allclose(
            clf.transformer_model_.predict(X),
            np.array([td[r["series_id"]] for r in rows]), atol=1e-9)
        tl = {r["series_id"]: r["shapelet_locs"]
              for r in clf.locate(df).collect()}
        np.testing.assert_array_equal(
            clf.locator_model_.predict(X),
            np.array([tl[r["series_id"]] for r in rows]))
        probas = clf.model_.predict(X)
        assert probas.shape == (12, 2)
        np.testing.assert_allclose(probas.sum(axis=1), 1.0, atol=1e-12)
        tp = {r["series_id"]: r["prediction"]
              for r in clf.predict(df).collect()}
        for i, row in enumerate(rows):
            assert str(clf.classes_[int(np.argmax(probas[i]))]) \
                == tp[row["series_id"]]

    def test_weights_api_and_predict_proba(self, spark):
        """get_weights/set_weights keras-layer layout (reference
        shapelets.py:750-825, doctests pinned) and the distributed
        predict_proba softmax head."""
        from tslearn_spark.shapelets import LearningShapelets

        df = DS.random_walk_blobs(spark=spark, n_ts_per_blob=6, sz=16, d=1,
                                  n_blobs=3, random_state=1)
        clf = LearningShapelets(n_shapelets_per_size={10: 5}, max_iter=5,
                                random_state=0).fit(df)
        # doctest: classification layer (n_shp_total, n_classes); one
        # shapelet layer per (size-group, dim) of shape (n_shp_i, size_i)
        assert clf.get_weights("classification")[0].shape == (5, 3)
        assert clf.get_weights("shapelets_0_0")[0].shape == (5, 10)
        assert len(clf.get_weights("shapelets_0_0")) == 1
        assert len(clf.get_weights()) == 3  # 1 shapelet layer + W + b
        # set_weights doctest: overwrite one shapelet group, read it back
        clf2 = LearningShapelets(n_shapelets_per_size={3: 1}, max_iter=5,
                                 random_state=0).fit(df)
        clf2.set_weights([np.array([[1.0, 2.0, 3.0]])],
                         layer_name="shapelets_0_0")
        np.testing.assert_allclose(clf2.shapelets_as_time_series_,
                                   [[[1.0], [2.0], [3.0]]])
        # full-model round trip: get -> perturb -> set -> get
        w = clf.get_weights()
        w[0] = w[0] + 1.0
        clf.set_weights(w)
        np.testing.assert_allclose(clf.get_weights()[0], w[0])
        # predict_proba: rows sum to 1, argmax == predict
        probs = {r["series_id"]: r["probabilities"]
                 for r in clf.predict_proba(df).collect()}
        preds = {r["series_id"]: r["prediction"]
                 for r in clf.predict(df).collect()}
        classes = [str(c) for c in clf.classes_]
        for i, p in probs.items():
            assert sum(p) == pytest.approx(1.0, abs=1e-9)
            assert classes[int(np.argmax(p))] == preds[i]

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
        # auto sizing lands in the FITTED attribute and leaves the
        # hyper-parameter untouched (reference shapelets.py:433-441;
        # sklearn check_dont_overwrite_parameters)
        auto = LearningShapelets(max_iter=1, shapelet_length=0.25,
                                 total_lengths=2, random_state=0).fit(df)
        assert set(auto.n_shapelets_per_size_) == {3, 6}
        assert auto.n_shapelets_per_size is None


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
        # sklearn MLP surface: probabilities ordered by classes_, summing
        # to 1, argmax agreeing with predict; log twin is its ln
        probs = {r["series_id"]: r["probabilities"]
                 for r in clf.predict_proba(df).collect()}
        preds = {r["series_id"]: r["prediction"]
                 for r in clf.predict(df).collect()}
        lps = {r["series_id"]: r["log_probabilities"]
               for r in clf.predict_log_proba(df).collect()}
        classes = [str(c) for c in clf.classes_]
        for i in probs:
            assert sum(probs[i]) == pytest.approx(1.0, abs=1e-9)
            assert classes[int(np.argmax(probs[i]))] == preds[i]
            np.testing.assert_allclose(lps[i], np.log(probs[i]), atol=1e-9)
        # numpy-in -> (n, n_classes) matrix
        mat = clf.predict_proba(np.array([x.reshape(-1, 1) for x in X[:3]]))
        assert mat.shape == (3, 2)

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
        # reference semantics (utils.py:598-600): column 0 of the one-hot
        # matrix, i.e. 1/0 — caught by the doctest replay in round 8
        assert got == {0: [1.0], 1: [0.0]}
        back = lc.inverse_transform(lc.transform(labels).drop("label"))
        assert {r["series_id"]: r["label"] for r in back.collect()} == \
            {0: "n", 1: "p"}


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
        """Unknown formats always raise; hdf5 is always available since
        r12 (reference exposes all three codecs at bases.py:164-287 —
        h5py where importable, the purehdf5 subset writer otherwise)."""
        import pytest

        from tslearn_spark.hdftools import HDF5_AVAILABLE
        from tslearn_spark.model_io import load_model, save_model
        from tslearn_spark.piecewise import SAX

        assert HDF5_AVAILABLE
        sax = SAX(n_segments=3, alphabet_size_avg=4)
        with pytest.raises(ValueError, match="unknown model format"):
            save_model(sax, str(tmp_path / "m.json"), fmt="msgpack")
        save_model(sax, str(tmp_path / "m.json"))
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

    def test_hdf5_roundtrip(self, spark, tmp_path):
        """Reference HDF5 layout round-trip (bases.py:164-210,
        hdftools.py:8-150) — h5py where importable, the from-scratch
        purehdf5 subset backend otherwise (r12: un-skipped)."""
        import pytest

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

    def test_unfitted_codecs_raise(self, tmp_path):
        from tslearn_spark.clustering import TimeSeriesKMeans

        km = TimeSeriesKMeans()
        # hdf5 shares the not-fitted guard now that the codec is always
        # available (r12 purehdf5 backend)
        with pytest.raises(ValueError, match="fit"):
            km.to_hdf5(str(tmp_path / "m.h5"))
        # pickle shares to_json's not-fitted guard (bases.py:257-268
        # pickles the same dict _to_dict builds)
        with pytest.raises(ValueError, match="fit"):
            km.to_pickle(str(tmp_path / "m.pkl"))

    def test_fit_to_pickle_from_pickle_roundtrip(self, spark, tmp_path):
        """Reference to_pickle/from_pickle (bases.py:257-287): protocol-2
        dump of the param dict; here the encoded dict, so the stream
        holds only stdlib types."""
        import pickle

        from tslearn_spark.clustering import TimeSeriesKMeans
        from tslearn_spark.piecewise import SAX

        X = [[1.0, 1.1, 1.0], [0.9, 1.0, 1.1],
             [8.0, 8.2, 8.1], [8.1, 8.0, 7.9]]
        df = DS.dataset_to_df(spark, X)
        km = TimeSeriesKMeans(n_clusters=2, metric="euclidean",
                              random_state=0).fit(df)
        path = str(tmp_path / "km.pkl")
        km.to_pickle(path)
        back = TimeSeriesKMeans.from_pickle(path)
        np.testing.assert_allclose(back.cluster_centers_, km.cluster_centers_)
        assert back.n_clusters == 2
        # wrong-class load fails loudly, like from_json
        with pytest.raises(TypeError):
            SAX.from_pickle(path)
        # the stream carries only stdlib types — no numpy objects, so
        # artifacts survive numpy major-version changes
        with open(path, "rb") as f:
            payload = pickle.load(f)

        def only_stdlib(o):
            if isinstance(o, dict):
                return all(only_stdlib(v) for v in o.values())
            if isinstance(o, (list, tuple)):
                return all(only_stdlib(v) for v in o)
            return isinstance(o, (str, int, float, bool, type(None)))

        assert only_stdlib(payload)
        # save_model/load_model infer pickle from the .pkl extension
        from tslearn_spark.model_io import load_model, save_model

        save_model(km, str(tmp_path / "m2.pickle"))
        assert load_model(str(tmp_path / "m2.pickle")).n_clusters == 2

    def test_scalers_have_params_not_package(self):
        from tslearn_spark.preprocessing import TimeSeriesScalerMeanVariance

        sc = TimeSeriesScalerMeanVariance()
        assert "mu" in sc.get_params() and "std" in sc.get_params()
        # reference scalers do not inherit BaseModelPackage
        assert not hasattr(sc, "to_json")

    def test_array_fit_roundtrip_restores_labels(self, spark, tmp_path):
        """The reference checkpoint persists labels_ as a plain ndarray
        attribute (kmeans.py:696) — a round-tripped array-fit model here
        must answer .labels_ too (labels_ lives behind a property, so
        the base vars() scan alone would drop it)."""
        from tslearn_spark.clustering import KShape, TimeSeriesKMeans

        X = np.array([[1.0, 1.1, 1.0], [0.9, 1.0, 1.1],
                      [8.0, 8.2, 8.1], [8.1, 8.0, 7.9]])
        for cls, kw in [
            (TimeSeriesKMeans, dict(n_clusters=2, metric="euclidean")),
            (KShape, dict(n_clusters=2)),
        ]:
            m = cls(random_state=0, **kw).fit(X)
            path = str(tmp_path / f"{cls.__name__}.json")
            m.to_json(path)
            back = cls.from_json(path)
            np.testing.assert_array_equal(back.labels_, m.labels_)
            # second round-trip keeps them (no _fit_was_array on `back`)
            path2 = str(tmp_path / f"{cls.__name__}_2.json")
            back.to_json(path2)
            np.testing.assert_array_equal(
                cls.from_json(path2).labels_, m.labels_)

    def test_regressor_score_constant_y_perfect_fit(self):
        """sklearn r2_score: ss_res == 0 scores 1.0 even for constant y."""
        from tslearn_spark.bases import RegressorScoreMixin

        class Echo(RegressorScoreMixin):
            def __init__(self, out):
                self._out = out

            def predict(self, X):
                return self._out

        assert Echo([2.0, 2.0, 2.0]).score(None, [2.0, 2.0, 2.0]) == 1.0
        assert Echo([2.0, 2.0, 2.1]).score(None, [2.0, 2.0, 2.0]) == 0.0

    def test_kernel_kmeans_gamma_resolved_at_fit(self, spark):
        """sklearn default gamma (1/n_features) must come from the TRAIN
        series at fit time and be reused at predict; ragged inputs to
        the sklearn-style kernels raise like pairwise_kernels does."""
        from tslearn_spark.clustering import (KernelKMeans,
                                              _pairwise_kernel_edges)

        rs = np.random.RandomState(3)
        X = np.vstack([rs.randn(6, 8) + 5, rs.randn(6, 8) - 5])
        km = KernelKMeans(n_clusters=2, kernel="rbf", random_state=0).fit(X)
        assert km._kernel_gamma_ == pytest.approx(1.0 / 8)
        # predict agrees with train-side assignment regardless of
        # what gamma the query side would have resolved to
        np.testing.assert_array_equal(km.predict(X), np.asarray(km.labels_))
        # ragged input -> loud ValueError, not silent NULL Grams
        ragged = DS.dataset_to_df(
            spark, [[1.0, 2.0, 3.0], [1.0, 2.0, 3.0, 4.0]])
        with pytest.raises(ValueError, match="equal-length"):
            _pairwise_kernel_edges(ragged, ragged, "rbf", {}).collect()
