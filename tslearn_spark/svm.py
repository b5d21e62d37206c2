"""TimeSeriesSVC / TimeSeriesSVR — GAK-kernel SVMs.

Reference: tslearn/svm/svm.py:18-568.  fit: GAK Gram (sigma =
sqrt(gamma/2), gamma auto via gamma_soft_dtw on the training set) ->
dual solve; predict: distributed query x train Gram join -> broadcast
dual coefficients -> weighted-sum aggregate.

Scale contract (SURVEY.md §7): the Gram is computed as a distributed
edge DataFrame; only the n x n float matrix is collected for the
driver-side dual solve (~20k-series ceiling).  Prediction never
collects series: the cross-Gram stays distributed and the reduction is
a grouped aggregate against broadcast duals.  Past the ceiling,
TimeSeriesSVC(n_landmarks=m) switches to landmark kernel features +
MLlib LinearSVC — no n x n Gram, no driver solve, linear in n (the
engine's scale path; the reference has no equivalent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tslearn_spark import kernels as K
from tslearn_spark import metrics as M
from tslearn_spark.svm_solver import KernelSVR, MulticlassSVC
from tslearn_spark.bases import (BaseModelPackage, ClassifierScoreMixin,
                                 RegressorScoreMixin, TimeSeriesBaseEstimator)


def _collect_gram(edges: DataFrame, ids1: list[int], ids2: list[int]) -> np.ndarray:
    pos1 = {v: i for i, v in enumerate(ids1)}
    pos2 = {v: i for i, v in enumerate(ids2)}
    G = np.zeros((len(ids1), len(ids2)))
    for r in edges.collect():
        G[pos1[r["id1"]], pos2[r["id2"]]] = r["dist"]
    return G


_FLAT_KERNELS = ("linear", "rbf", "poly", "sigmoid")


def _flat_kernel_matrix(X: np.ndarray, Y: np.ndarray, kernel: str,
                        gamma: float, degree: int, coef0: float) -> np.ndarray:
    """sklearn/libsvm kernel matrices on flattened series (the
    reference's non-gak path runs sklearn SVC on to_sklearn_dataset
    output, svm.py:59,279-280)."""
    dot = X @ Y.T
    if kernel == "linear":
        return dot
    if kernel == "rbf":
        d2 = (X * X).sum(1)[:, None] + (Y * Y).sum(1)[None, :] - 2.0 * dot
        return np.exp(-gamma * np.maximum(d2, 0.0))
    if kernel == "poly":
        return (gamma * dot + coef0) ** degree
    return np.tanh(gamma * dot + coef0)  # sigmoid


def _pad_stack(arrs: list) -> np.ndarray:
    """Stack (sz_i, d) series into (n, max_sz, d), NaN-padded — the
    reference returns padded tslearn datasets for support_vectors_ on
    variable-length fits (gak accepts ragged input)."""
    if not arrs:
        return np.empty((0, 0, 0))
    sz = max(a.shape[0] for a in arrs)
    d = arrs[0].shape[1]
    out = np.full((len(arrs), sz, d), np.nan)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0], :] = a
    return out


class LandmarkDualUnavailableError(NotImplementedError, AttributeError):
    """The libsvm dual surface is absent on the landmark scale path.

    Subclasses BOTH NotImplementedError (explicit access gets the loud,
    actionable message) and AttributeError (so hasattr()/getattr(obj,
    name, default) and generic fitted-attribute probes — sklearn meta-
    estimators, serializers — take their normal absent-attribute
    fallback instead of crashing on introspection)."""


class _GakSVMBase(BaseModelPackage, TimeSeriesBaseEstimator):
    """Shared init carries the full reference signature (svm.py:211-214,
    485-487) for drop-in parity: gak-irrelevant kernel shape params
    (degree, coef0) and libsvm tuning knobs (shrinking, cache_size) are
    accepted and unused exactly as the reference's gak path leaves them
    unused.  probability=True (CV-Platt sigmoids + Wu-Lin-Weng
    coupling), class_weight (per-sample C in the SMO), and the sklearn
    flat kernels (linear/rbf/poly/sigmoid on flattened equal-length
    series, the reference's non-gak route) are implemented from
    scratch; only kernels outside that set are rejected."""

    def _more_tags(self):
        # reference svm.py:369-371 / 567-569
        return {"non_deterministic": True, "allow_nan": True,
                "allow_variable_length": True}

    # libsvm-dual surface that the landmark scale path does NOT compute
    _DUAL_SURFACE = ("support_", "n_support_", "dual_coef_", "intercept_",
                     "coef_", "support_vectors_", "svm_estimator_", "model_")

    def _is_fitted(self) -> bool:
        # the landmark path's fitted state is the MLlib model (leading
        # underscore, invisible to the generic trailing-underscore scan)
        if self.__dict__.get("_mllib_model") is not None:
            return True
        return super()._is_fitted()

    def __getattr__(self, name: str):
        # Reached only when normal lookup fails (the exact SMO path sets
        # support_/model_ as instance attrs).  On the landmark path the
        # dual surface is genuinely absent — say so loudly instead of
        # leaking a bare AttributeError or a legit-looking empty array.
        if (name in _GakSVMBase._DUAL_SURFACE
                and self.__dict__.get("_mllib_model") is not None):
            raise LandmarkDualUnavailableError(
                f"{name} is unavailable on the landmark scale path "
                f"(fitted with n_landmarks={self.__dict__.get('n_landmarks')}): "
                "the libsvm dual surface is not computed there. Refit with "
                "n_landmarks=None for exact support vectors and duals."
            )
        # A property getter that raised AttributeError lands here too
        # (Python's fallback protocol) — re-run it so its OWN message
        # propagates (e.g. coef_'s "linear kernel only") instead of a
        # generic no-such-attribute error
        desc = getattr(type(self), name, None)
        if isinstance(desc, property):
            return desc.__get__(self, type(self))
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}")

    def __init__(self, C: float = 1.0, kernel: str = "gak", degree: int = 3,
                 gamma: str | float = "auto", coef0: float = 0.0,
                 shrinking: bool = True, tol: float = 0.001,
                 cache_size: float = 200, n_jobs: int | None = None,
                 verbose: int = 0, max_iter: int = -1,
                 random_state: int | None = None):
        if kernel != "gak" and kernel not in _FLAT_KERNELS:
            raise NotImplementedError(
                f"unsupported kernel {kernel!r}: 'gak' or one of "
                f"{_FLAT_KERNELS} (the reference accepts the same set, "
                "routing non-gak kernels through sklearn SVC on "
                "flattened series)"
            )
        self.C = C
        self.kernel = kernel
        self.degree = degree
        self.gamma = gamma
        self.coef0 = coef0
        self.shrinking = shrinking
        self.tol = tol
        self.cache_size = cache_size
        self.n_jobs = n_jobs
        self.verbose = verbose
        self.max_iter = max_iter
        self.random_state = random_state

    def _flat_train(self) -> np.ndarray:
        szs = {v.shape for v in self._train_values}
        if len(szs) > 1:
            raise ValueError(
                f"kernel={self.kernel!r} requires equal-length series "
                "(the reference flattens to a fixed sklearn feature "
                "matrix); only 'gak' handles variable lengths"
            )
        return np.stack([v.reshape(-1) for v in self._train_values])

    def _fit_gram(self, df: DataFrame):
        rows = df.select("series_id", "values").orderBy("series_id").collect()
        self._train_ids = [r["series_id"] for r in rows]
        self._train_values = [np.asarray(r["values"], dtype=np.float64) for r in rows]
        if self.kernel in _FLAT_KERNELS:
            X = self._flat_train()
            # gamma='auto' -> 1/n_features for non-gak (svm.py:88-94)
            self.gamma_ = (1.0 / X.shape[1] if self.gamma == "auto"
                           else float(self.gamma))
            return _flat_kernel_matrix(X, X, self.kernel, self.gamma_,
                                       self.degree, self.coef0)
        if self.gamma == "auto":
            # svm.py:30-33; seeded from the estimator's own random_state
            # (0 when unset) so gamma='auto' fits are reproducible — the
            # reference leaves the sample unseeded and is not
            rs = getattr(self, "random_state", None)
            self.gamma_ = K.gamma_soft_dtw(
                self._train_values, random_state=0 if rs is None else rs
            )
        else:
            self.gamma_ = float(self.gamma)
        self.sigma_ = float(np.sqrt(self.gamma_ / 2.0))  # svm.py:49
        edges = M.cdist(df, metric="gak", sigma=self.sigma_)
        return _collect_gram(edges, self._train_ids, self._train_ids)

    def _preprocess_sklearn(self, X, y=None, fit_time=False):
        """Reference internal (svm.py:18-68): the matrix the reference
        hands sklearn's SVC/SVR — the precomputed GAK Gram
        (sigma = sqrt(gamma_/2), gamma 'auto' via gamma_soft_dtw) for
        kernel='gak', the flattened dataset otherwise — plus y.  Compat
        shim for reference scripts/tests that call it directly (e.g.
        tests/test_svm.py:9-25 asserts the gamma->sigma mapping); the
        engine's actual fit builds the same Gram distributively
        (_fit_gram).  numpy in / numpy out."""
        from tslearn_spark.utils import to_time_series_dataset

        X = to_time_series_dataset(X)
        if fit_time:
            self._X_fit = X
            if self.gamma == "auto":
                if self.kernel == "gak":
                    rs = getattr(self, "random_state", None)
                    self.gamma_ = K.gamma_soft_dtw(
                        X, random_state=0 if rs is None else rs)
                else:
                    self.gamma_ = 1.0 / (X.shape[1] * X.shape[2])
            else:
                self.gamma_ = float(self.gamma)
            if y is not None:
                self.classes_ = np.unique(y)
        if self.kernel == "gak":
            self.estimator_kernel_ = "precomputed"
            from tslearn_spark.metrics import cdist_gak

            sigma = float(np.sqrt(self.gamma_ / 2.0))
            if fit_time:
                sklearn_X = cdist_gak(X, sigma=sigma)
            else:
                sklearn_X = cdist_gak(X, self._X_fit, sigma=sigma)
        else:
            self.estimator_kernel_ = self.kernel
            sklearn_X = X.reshape((X.shape[0], -1))
        return sklearn_X if y is None else (sklearn_X, y)

    def _query_gram_df(self, queries: DataFrame) -> DataFrame:
        """Distributed query x train kernel edges (id1, id2, dist).

        gak: the pair-join cdist machinery.  Flat kernels: broadcast
        the flattened train matrix, one BLAS kernel-row per query in
        mapInPandas — each query ships once, edges are scalars.
        """
        spark = queries.sparkSession
        if self.kernel in _FLAT_KERNELS:
            Xt = self._flat_train()
            bc = spark.sparkContext.broadcast(
                (np.asarray(self._train_ids, dtype=np.int64), Xt,
                 self.kernel, self.gamma_, self.degree, self.coef0)
            )

            def gen(batches):
                tids, T, kern, gam, deg, c0 = bc.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    qids = pdf["series_id"].to_numpy(dtype=np.int64)
                    Q = np.stack([
                        np.asarray(v, dtype=np.float64).reshape(-1)
                        for v in pdf["values"]
                    ])
                    Kq = _flat_kernel_matrix(Q, T, kern, gam, deg, c0)
                    n_q, n_t = Kq.shape
                    yield pd.DataFrame({
                        "id1": np.repeat(qids, n_t),
                        "id2": np.tile(tids, n_q),
                        "dist": Kq.reshape(-1),
                    })

            return queries.select("series_id", "values").mapInPandas(
                gen, "id1 long, id2 long, dist double"
            )
        train_df = spark.createDataFrame(
            [(int(i), [[float(x) for x in row] for row in v])
             for i, v in zip(self._train_ids, self._train_values)],
            "series_id long, values array<array<double>>",
        )
        return M.cdist(queries, train_df, metric="gak", sigma=self.sigma_)

    # -- landmark machinery shared by the SVC / SVR scale paths ----------
    def _prepare_landmarks(self, df: DataFrame) -> None:
        """Seeded landmark sample + kernel-parameter resolution: sets
        _lm_df / _lm_pos_df (and _lm_flat_ for flat kernels), gamma_ /
        sigma_.  Hash order is partition-invariant, so the landmark set
        is a pure function of (seed, ids) at any scale."""
        spark = df.sparkSession
        m = int(self.n_landmarks)
        seed = 0 if getattr(self, "random_state", None) is None \
            else int(self.random_state)
        self._lm_df = (
            df.select("series_id", "values")
            .orderBy(F.xxhash64(F.lit(seed), "series_id"), "series_id")
            .limit(m)
            .localCheckpoint()
        )
        lm_rows = sorted(
            self._lm_df.select("series_id", "values").collect(),
            key=lambda r: r["series_id"])
        self._lm_pos_df = spark.createDataFrame(
            [(int(r["series_id"]), p) for p, r in enumerate(lm_rows)],
            "id2 long, pos int").localCheckpoint()
        if self.kernel in _FLAT_KERNELS:
            lm_vals = [np.asarray(r["values"], dtype=np.float64)
                       for r in lm_rows]
            szs = {v.shape for v in lm_vals}
            if len(szs) > 1:
                raise ValueError(
                    f"kernel={self.kernel!r} requires equal-length series")
            self._lm_flat_ = np.stack([v.reshape(-1) for v in lm_vals])
            self.gamma_ = (1.0 / self._lm_flat_.shape[1]
                           if self.gamma == "auto" else float(self.gamma))
        elif self.gamma == "auto":
            # gamma_soft_dtw over a seeded ~200-series sample instead of
            # the full training set (the reference samples internally
            # anyway; a full collect is exactly what this path avoids)
            sample = [
                np.asarray(r["values"], dtype=np.float64)
                for r in df.select("values")
                .orderBy(F.xxhash64(F.lit(seed + 1),
                                    F.hash("values")))
                .limit(200).collect()
            ]
            self.gamma_ = K.gamma_soft_dtw(sample, random_state=seed)
            self.sigma_ = float(np.sqrt(self.gamma_ / 2.0))
        else:
            self.gamma_ = float(self.gamma)
            self.sigma_ = float(np.sqrt(self.gamma_ / 2.0))

    def _landmark_features(self, d1: DataFrame) -> DataFrame:
        """(series_id, kvec array<double>): the m landmark-kernel values
        per series, ordered by landmark position — n x m edges through
        the cdist pair join (gak) or one broadcast BLAS pass (flat
        kernels), never an n x n Gram."""
        if self.kernel in _FLAT_KERNELS:
            spark = d1.sparkSession
            bcl = spark.sparkContext.broadcast(
                (self._lm_flat_, self.kernel, self.gamma_, self.degree,
                 self.coef0))

            def gen(batches):
                L, kern, gam, deg, c0 = bcl.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    Q = np.stack([
                        np.asarray(v, dtype=np.float64).reshape(-1)
                        for v in pdf["values"]
                    ])
                    Kq = _flat_kernel_matrix(Q, L, kern, gam, deg, c0)
                    yield pd.DataFrame({
                        "series_id": pdf["series_id"],
                        "kvec": list(Kq),
                    })

            return d1.select("series_id", "values").mapInPandas(
                gen, "series_id long, kvec array<double>")
        edges = M.cdist(d1, self._lm_df, metric="gak", sigma=self.sigma_)
        return (
            edges.join(F.broadcast(self._lm_pos_df), "id2")
            .groupBy("id1")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "dist")))
                 .alias("kv"))
            .select(F.col("id1").alias("series_id"),
                    F.expr("transform(kv, x -> x.dist)").alias("kvec"))
        )


class TimeSeriesSVC(ClassifierScoreMixin, _GakSVMBase):
    """GAK-kernel SVC (svm.py:68-371); one-vs-one multiclass like libsvm."""

    def __init__(self, C: float = 1.0, kernel: str = "gak", degree: int = 3,
                 gamma: str | float = "auto", coef0: float = 0.0,
                 shrinking: bool = True, probability: bool = False,
                 tol: float = 0.001, cache_size: float = 200,
                 class_weight=None, n_jobs: int | None = None,
                 verbose: int = 0, max_iter: int = -1,
                 decision_function_shape: str = "ovr",
                 random_state: int | None = None,
                 n_landmarks: int | None = None):
        super().__init__(C=C, kernel=kernel, degree=degree, gamma=gamma,
                         coef0=coef0, shrinking=shrinking, tol=tol,
                         cache_size=cache_size, n_jobs=n_jobs,
                         verbose=verbose, max_iter=max_iter,
                         random_state=random_state)
        self.probability = probability
        self.class_weight = class_weight
        self.decision_function_shape = decision_function_shape
        # scale path (engine extension, no reference equivalent): with
        # n_landmarks = m set, fit skips the n x n Gram + driver SMO
        # (the documented ~20k ceiling above) and instead maps every
        # series to its m landmark-kernel features k(x, l_j), training
        # MLlib LinearSVC (OneVsRest for multiclass) on them — fit and
        # predict stay distributed end-to-end, linear in n.  predict /
        # score work; the libsvm dual surface (support_, dual_coef_,
        # decision_function, probability) is exact-path only.
        self.n_landmarks = n_landmarks

    def _sample_C(self, y: np.ndarray) -> np.ndarray | None:
        """class_weight -> per-sample box constraints C_i = C * w[class]
        (libsvm's weighted C; 'balanced' = n / (k * bincount))."""
        if self.class_weight is None:
            return None
        classes, counts = np.unique(y, return_counts=True)
        if self.class_weight == "balanced":
            w = {c: len(y) / (len(classes) * n) for c, n in zip(classes, counts)}
        else:
            # numpy-protocol fits stringify labels, so a {0: 10.0} dict
            # must still match class '0' — try the raw key, then its
            # string form, then a numeric parse of a string class
            def _lookup(c):
                cw = self.class_weight
                if c in cw:
                    return float(cw[c])
                if str(c) in cw:
                    return float(cw[str(c)])
                try:
                    f = float(c)
                    if f in cw:
                        return float(cw[f])
                    if f == int(f) and int(f) in cw:
                        return float(cw[int(f)])
                except (TypeError, ValueError):
                    pass
                return 1.0

            w = {c: _lookup(c) for c in classes}
        return np.array([self.C * w[c] for c in y])

    def fit(self, df: DataFrame, y=None,
            label_col: str = "label") -> "TimeSeriesSVC":
        from tslearn_spark.bases import as_ts_df

        from tslearn_spark.bases import query_d

        self._d_fit = query_d(df)
        df, _ = as_ts_df(df, y=y, y_col=label_col)
        if y is not None:
            self._y_numeric = np.asarray(y).dtype.kind in "iufb"
        if self.n_landmarks is not None:
            return self._fit_landmark(df, label_col)
        Gram = self._fit_gram(df)
        lab = {r["series_id"]: r[label_col]
               for r in df.select("series_id", label_col).collect()}
        y = np.array([lab[i] for i in self._train_ids])
        self.model_ = MulticlassSVC(self.C, sample_C=self._sample_C(y)).fit(Gram, y)
        if self.probability:
            # libsvm's svm_binary_svc_probability: per-machine Platt
            # sigmoids on 5-fold CV decision values (svm.py:103-106)
            self.model_.fit_platt(Gram, y, random_state=self.random_state)
        self.classes_ = self.model_.classes_
        # libsvm layout: SV indices grouped by class (sklearn SVC.support_;
        # the reference's support_vectors_ property slices this ordering
        # by n_support_, svm.py:249-258)
        self.support_ = self.model_.support_
        return self

    # -- landmark scale path ---------------------------------------------
    def _fit_landmark(self, df: DataFrame, label_col: str) -> "TimeSeriesSVC":
        from pyspark.ml.classification import LinearSVC, OneVsRest
        from pyspark.ml.functions import array_to_vector

        self._prepare_landmarks(df)
        self.classes_ = np.array(sorted(
            r[0] for r in df.select(label_col).distinct().collect()))
        idx_map = F.create_map(*[
            x for i, c in enumerate(self.classes_.tolist())
            for x in (F.lit(c), F.lit(float(i)))
        ])
        feats = (
            self._landmark_features(df)
            .join(df.select("series_id", label_col), "series_id")
            .select("series_id",
                    array_to_vector("kvec").alias("features"),
                    idx_map[F.col(label_col)].alias("_yidx"))
            .localCheckpoint()
        )
        n = feats.count()
        # libsvm C-SVM objective ~ MLlib hinge + regParam * ||w||^2 / 2
        # with regParam = 1 / (C * n)
        reg = 1.0 / (self.C * max(n, 1))
        iters = 100 if self.max_iter == -1 else int(self.max_iter)
        base = LinearSVC(maxIter=iters, regParam=reg, tol=self.tol,
                         featuresCol="features", labelCol="_yidx")
        est = base if len(self.classes_) == 2 else OneVsRest(
            classifier=base, featuresCol="features", labelCol="_yidx")
        self._mllib_model = est.fit(feats)
        # no support_ marker: _is_fitted reads _mllib_model, and the dual
        # surface raises NotImplementedError via __getattr__ on this path
        return self

    def _predict_landmark(self, queries: DataFrame, was_array: bool):
        from pyspark.ml.functions import array_to_vector

        from tslearn_spark.bases import collect_col

        feats = self._landmark_features(queries).select(
            "series_id", array_to_vector("kvec").alias("features"))
        classes = [str(c) for c in self.classes_.tolist()]
        pred = self._mllib_model.transform(feats).select(
            "series_id",
            F.element_at(
                F.array(*[F.lit(c) for c in classes]),
                F.col("prediction").cast("int") + 1
            ).alias("prediction"),
        )
        return collect_col(pred, was_array, "prediction",
                           labels=getattr(self, "_y_numeric", True))

    # -- fitted attributes the reference reads off svm_estimator_
    # (svm.py:155-196 docstring + doctest) ------------------------------
    @property
    def svm_estimator_(self):
        """The underlying fitted solver (reference svm.py:180: the
        sklearn SVC; here the from-scratch ovo SMO twin, exposing the
        same support_/n_support_/dual_coef_/intercept_ surface)."""
        return self.model_

    @property
    def n_support_(self) -> np.ndarray:
        return self.model_.n_support_

    @property
    def dual_coef_(self) -> np.ndarray:
        return self.model_.dual_coef_

    @property
    def intercept_(self) -> np.ndarray:
        return self.model_.intercept_

    @property
    def support_vectors_(self) -> list:
        """List of (n_SV_c, sz, d) arrays, one per class (svm.py:249-258)."""
        X = [K.to_2d(v) for v in self._train_values]
        out, start = [], 0
        for n in self.n_support_:
            ids = self.support_[start:start + int(n)]
            out.append(_pad_stack([X[i] for i in ids]))
            start += int(n)
        return out

    @property
    def coef_(self) -> np.ndarray:
        """Readonly, linear kernel only — derived from dual_coef_ and the
        flattened support vectors (sklearn SVC semantics; svm.py:171-175)."""
        if self.kernel != "linear":
            raise AttributeError(
                "coef_ is only available when using a linear kernel"
            )
        X = self._flat_train()
        # one hyperplane per ovo machine, (n_pairs, n_features) in
        # (a, b) a<b order — sklearn's _one_vs_one_coef (the reference
        # docstring's [n_class-1, ...] note is sklearn's doc typo);
        # binary case degenerates to one row
        return np.stack([m.dual_coef_ @ X[idx]
                         for _, _, m, idx in self.model_.machines_])

    def support_vectors_time_series_(self, X=None):
        """Deprecated alias (reference svm.py:236-247)."""
        import warnings

        warnings.warn(
            "The use of `support_vectors_time_series_` is deprecated; "
            "use `support_vectors_` property instead.", DeprecationWarning)
        Xs = [K.to_2d(v) for v in self._train_values]
        return _pad_stack([Xs[i] for i in self.support_])

    def predict(self, queries: DataFrame) -> DataFrame:
        """Distributed: cross-Gram edges -> pivot to rows -> OVO vote.

        The per-query Gram row (n_train floats) is assembled with a
        grouped collect and voted on in a pandas UDF with broadcast
        duals — no series data leaves the executors.
        """
        from tslearn_spark.bases import (as_ts_df, check_query_dims,
                                         collect_col)

        check_query_dims(queries, getattr(self, "_d_fit", None))
        queries, was_array = as_ts_df(queries)
        if getattr(self, "_mllib_model", None) is not None:
            return self._predict_landmark(queries, was_array)
        train_ids = self._train_ids
        model = self.model_
        spark = queries.sparkSession
        bc = spark.sparkContext.broadcast((train_ids, model))

        rows = self._krow_frame(queries)

        @F.pandas_udf("string")
        def vote(krows: pd.Series) -> pd.Series:
            tids, m = bc.value
            out = []
            for kr in krows:
                vec = np.array([kr[t] for t in tids])[None, :]
                out.append(str(m.predict(vec)[0]))
            return pd.Series(out)

        out = rows.select(F.col("id1").alias("series_id"),
                          vote("krow").alias("prediction"))
        return collect_col(out, was_array, "prediction",
                           labels=getattr(self, "_y_numeric", True))

    def _krow_frame(self, queries: DataFrame):
        edges = self._query_gram_df(queries)
        return (
            edges.groupBy("id1")
            .agg(F.map_from_arrays(F.collect_list("id2"),
                                   F.collect_list("dist")).alias("krow"))
        )

    @property
    def n_iter_(self) -> int:
        """Reference parity (svm.py:232-235): always 1, with the same
        warning — the underlying solver's iteration counts are not part
        of the public contract there."""
        import warnings

        warnings.warn('n_iter_ is always set to 1 for TimeSeriesSVC, since '
                      'it is non-trivial to access the underlying libsvm')
        return 1

    def predict_log_proba(self, queries: DataFrame):
        """log of predict_proba (svm.py:327-346); same distributed plan
        with a ln() transform on top, -inf at exact zeros like numpy."""
        proba = self.predict_proba(queries)
        if isinstance(proba, np.ndarray):
            with np.errstate(divide="ignore"):
                return np.log(proba)
        return proba.select(
            "series_id",
            F.expr(
                "transform(probabilities, x -> CASE WHEN x <= 0.0D THEN "
                "double('-Infinity') ELSE ln(x) END)"
            ).alias("log_probabilities"),
        )

    def predict_proba(self, queries: DataFrame) -> DataFrame:
        """Per-class probabilities (svm.py:331-352 predict_proba).

        Distributed like predict: cross-Gram edges -> per-query kernel
        row -> broadcast Platt sigmoids + Wu-Lin-Weng coupling in a
        pandas UDF.  Returns (series_id, probabilities array<double>)
        ordered by ``classes_``.  Like the reference (which inherits
        libsvm's caveat), the coupling argmax may disagree with
        predict's ovo vote on boundary queries.
        """
        from tslearn_spark.bases import (as_ts_df, check_query_dims,
                                         collect_col)

        if not self.probability:
            raise ValueError(
                "predict_proba requires probability=True at fit time"
            )
        check_query_dims(queries, getattr(self, "_d_fit", None))
        queries, was_array = as_ts_df(queries)
        train_ids = self._train_ids
        model = self.model_
        spark = queries.sparkSession
        bc = spark.sparkContext.broadcast((train_ids, model))

        @F.pandas_udf("array<double>")
        def proba(krows: pd.Series) -> pd.Series:
            tids, m = bc.value
            out = []
            for kr in krows:
                vec = np.array([kr[t] for t in tids])[None, :]
                out.append([float(p) for p in m.predict_proba(vec)[0]])
            return pd.Series(out)

        out = self._krow_frame(queries).select(
            F.col("id1").alias("series_id"), proba("krow").alias("probabilities")
        )
        return collect_col(out, was_array, "probabilities")

    def decision_function(self, queries: DataFrame) -> DataFrame:
        """Raw decision values (svm.py:306-328): ovo pair decisions, or
        the standard vote-tiebreak ovr aggregation of them when
        decision_function_shape='ovr'.  Returns (series_id, decision
        array<double>)."""
        from tslearn_spark.bases import (as_ts_df, check_query_dims,
                                         collect_col)

        check_query_dims(queries, getattr(self, "_d_fit", None))
        queries, was_array = as_ts_df(queries)
        train_ids = self._train_ids
        model = self.model_
        shape = self.decision_function_shape
        n_cls = len(model.classes_)
        pairs = [(a, b) for a, b, _, _ in model.machines_]
        spark = queries.sparkSession
        bc = spark.sparkContext.broadcast((train_ids, model))

        if n_cls == 2:
            # sklearn collapses binary to ONE value per sample — shape
            # (n,), positive -> classes_[1] (the svm.py:198 doctest
            # checks the shape); our ovo pair machine scores positive
            # for classes_[0], hence the sign flip
            @F.pandas_udf("double")
            def dec2(krows: pd.Series) -> pd.Series:
                tids, m = bc.value
                vals = []
                for kr in krows:
                    vec = np.array([kr[t] for t in tids])[None, :]
                    vals.append(float(-m.decision_function_ovo(vec)[0][0]))
                return pd.Series(vals)

            out = self._krow_frame(queries).select(
                F.col("id1").alias("series_id"), dec2("krow").alias("decision")
            )
            return collect_col(out, was_array, "decision")

        @F.pandas_udf("array<double>")
        def dec(krows: pd.Series) -> pd.Series:
            tids, m = bc.value
            out = []
            for kr in krows:
                vec = np.array([kr[t] for t in tids])[None, :]
                d = m.decision_function_ovo(vec)[0]
                if shape == "ovr":
                    # sklearn's _ovr_decision_function: votes plus a
                    # bounded sum-of-confidences tiebreak
                    votes = np.zeros(n_cls)
                    conf = np.zeros(n_cls)
                    for k, (a, b) in enumerate(pairs):
                        votes[a if d[k] > 0 else b] += 1
                        conf[a] += d[k]
                        conf[b] -= d[k]
                    # sklearn _ovr_decision_function: element-wise bound
                    tie = conf / (3.0 * (np.abs(conf) + 1.0))
                    d = votes + tie
                out.append([float(x) for x in d])
            return pd.Series(out)

        out = self._krow_frame(queries).select(
            F.col("id1").alias("series_id"), dec("krow").alias("decision")
        )
        return collect_col(out, was_array, "decision")


class TimeSeriesSVR(RegressorScoreMixin, _GakSVMBase):
    """GAK-kernel epsilon-SVR (svm.py:374-568)."""

    def __init__(self, C: float = 1.0, kernel: str = "gak", degree: int = 3,
                 gamma: str | float = "auto", coef0: float = 0.0,
                 tol: float = 0.001, epsilon: float = 0.1,
                 shrinking: bool = True, cache_size: float = 200,
                 n_jobs: int | None = None, verbose: int = 0,
                 max_iter: int = -1, n_landmarks: int | None = None):
        super().__init__(C=C, kernel=kernel, degree=degree, gamma=gamma,
                         coef0=coef0, shrinking=shrinking, tol=tol,
                         cache_size=cache_size, n_jobs=n_jobs,
                         verbose=verbose, max_iter=max_iter)
        self.epsilon = epsilon
        # scale path (engine extension): kernel RIDGE on m landmark
        # features via MLlib LinearRegression — MLlib has no
        # epsilon-insensitive solver, so past the Gram ceiling the
        # squared loss stands in for the epsilon tube (documented
        # approximation; epsilon is ignored on this path).  Fit and
        # predict stay distributed end-to-end, linear in n.
        self.n_landmarks = n_landmarks

    def fit(self, df: DataFrame, y=None,
            target_col: str = "y") -> "TimeSeriesSVR":
        from tslearn_spark.bases import as_ts_df

        from tslearn_spark.bases import query_d

        self._d_fit = query_d(df)
        df, _ = as_ts_df(df, y=y, y_col=target_col, y_numeric=True)
        if self.n_landmarks is not None:
            return self._fit_landmark_svr(df, target_col)
        Gram = self._fit_gram(df)
        tgt = {r["series_id"]: r[target_col]
               for r in df.select("series_id", target_col).collect()}
        y = np.array([tgt[i] for i in self._train_ids], dtype=np.float64)
        self.model_ = KernelSVR(self.C, self.epsilon).fit(Gram, y)
        # sklearn SVR surface (reference svm.py:360-381 docstring)
        self.support_ = self.model_.support_
        return self

    def _fit_landmark_svr(self, df: DataFrame,
                          target_col: str) -> "TimeSeriesSVR":
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.regression import LinearRegression

        self._prepare_landmarks(df)
        feats = (
            self._landmark_features(df)
            .join(df.select("series_id",
                            F.col(target_col).cast("double").alias("_yt")),
                  "series_id")
            .select("series_id",
                    array_to_vector("kvec").alias("features"), "_yt")
            .localCheckpoint()
        )
        n = feats.count()
        reg = 1.0 / (self.C * max(n, 1))  # ridge twin of the SVC mapping
        iters = 100 if self.max_iter == -1 else int(self.max_iter)
        self._mllib_model = LinearRegression(
            maxIter=iters, regParam=reg, elasticNetParam=0.0,
            tol=self.tol, featuresCol="features", labelCol="_yt",
        ).fit(feats)
        # no support_ marker: _is_fitted reads _mllib_model, and the dual
        # surface raises NotImplementedError via __getattr__ on this path
        return self

    def _predict_landmark_svr(self, queries: DataFrame, was_array: bool):
        from pyspark.ml.functions import array_to_vector

        from tslearn_spark.bases import collect_col

        feats = self._landmark_features(queries).select(
            "series_id", array_to_vector("kvec").alias("features"))
        out = self._mllib_model.transform(feats).select(
            "series_id", "prediction")
        return collect_col(out, was_array, "prediction")

    @property
    def svm_estimator_(self):
        """Underlying fitted solver (reference svm.py: sklearn SVR; here
        the from-scratch epsilon-SVR twin with the same dual surface)."""
        return self.model_

    @property
    def n_iter_(self) -> int:
        """Reference parity (svm.py:129-132): always 1, same warning."""
        import warnings

        warnings.warn('n_iter_ is always set to 1 for TimeSeriesSVR, since '
                      'it is non-trivial to access the underlying libsvm')
        return 1

    @property
    def dual_coef_(self) -> np.ndarray:
        return self.model_.dual_coef_

    @property
    def intercept_(self) -> np.ndarray:
        return self.model_.intercept_

    @property
    def support_vectors_(self) -> np.ndarray:
        """(n_SV, sz, d) — the reference indexes _X_fit by support_
        (svm.py TimeSeriesSVR.support_vectors_)."""
        X = [K.to_2d(v) for v in self._train_values]
        return _pad_stack([X[i] for i in self.support_])

    @property
    def coef_(self) -> np.ndarray:
        """Readonly, linear kernel only (sklearn SVR semantics)."""
        if self.kernel != "linear":
            raise AttributeError(
                "coef_ is only available when using a linear kernel"
            )
        X = self._flat_train()
        return self.dual_coef_ @ X[self.support_]

    def support_vectors_time_series_(self, X=None):
        """Deprecated alias (reference svm.py:133-145)."""
        import warnings

        warnings.warn(
            "The use of `support_vectors_time_series_` is deprecated; "
            "use `support_vectors_` property instead.", DeprecationWarning)
        Xs = [K.to_2d(v) for v in self._train_values]
        return _pad_stack([Xs[i] for i in self.support_])

    def predict(self, queries: DataFrame) -> DataFrame:
        """Pure SQL reduction: edges join broadcast duals -> sum + b."""
        from tslearn_spark.bases import (as_ts_df, check_query_dims,
                                         collect_col)

        check_query_dims(queries, getattr(self, "_d_fit", None))
        queries, was_array = as_ts_df(queries)
        if getattr(self, "_mllib_model", None) is not None:
            return self._predict_landmark_svr(queries, was_array)
        edges = self._query_gram_df(queries)
        spark = queries.sparkSession
        duals = spark.createDataFrame(
            [(int(i), float(b)) for i, b in zip(self._train_ids, self.model_.beta_)],
            "id2 long, beta double",
        )
        out = (
            edges.join(F.broadcast(duals), "id2")
            .groupBy("id1")
            .agg((F.sum(F.col("dist") * F.col("beta")) + F.lit(self.model_.b_))
                 .alias("prediction"))
            .select(F.col("id1").alias("series_id"), "prediction")
        )
        return collect_col(out, was_array, "prediction")


# reference import parity (svm.py:17-66): the shared-SVM mixin role is
# played by _GakSVMBase in this engine
TimeSeriesSVMMixin = _GakSVMBase
