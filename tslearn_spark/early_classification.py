"""Non-myopic early classification (Dachraoui et al. 2015).

Reference: tslearn/early_classification/early_classification.py:16-580.
Faithful numpy re-implementation of the fitted state:

* ``cluster_``: euclidean k-means on the full-length series;
* per-prefix-length classifiers (default: 1-NN euclidean on prefixes,
  the reference default at early_classification.py:156-160);
* ``pyck_``: P(y | c_k) from cluster/label co-occurrence;
* ``pyhatyck_``: per (t, cluster) confusion matrices with zeroed
  diagonal, estimated on a held-out half (stratified by cluster);
* prediction: scan growing prefixes, stop at the first t whose expected
  cost (cluster-probability-weighted misclassification + alpha*t) is
  minimized at horizon 0 (early_classification.py:285-359).

Fit is driver-side over a collected sample (the reference is equally
in-memory); predict is a distributed pandas UDF with the broadcast model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


def _kmeans_euclidean(X: np.ndarray, k: int, seed: int, n_iter: int = 50):
    """Lloyd's with empty-cluster repair: an empty cluster is re-seeded at
    the point farthest from its assigned center (mirrors the reference's
    empty-cluster retry, clustering/utils.py:13-44)."""
    rs = np.random.RandomState(seed)
    centers = X[rs.choice(len(X), size=k, replace=False)].copy()
    lab = np.zeros(len(X), dtype=int)
    for _ in range(n_iter):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(axis=1)
        for j in range(k):
            if not (lab == j).any():
                far = int(np.argmax(d[np.arange(len(X)), lab]))
                centers[j] = X[far]
                lab[far] = j
                d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
                lab = d.argmin(axis=1)
        new = np.array([X[lab == j].mean(axis=0) for j in range(k)])
        if np.allclose(new, centers):
            break
        centers = new
    return centers, lab


class _OneNN:
    """1-NN euclidean on flattened prefixes (reference default base)."""

    def fit(self, X: np.ndarray, y: np.ndarray):
        self.X_, self.y_ = X, y
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        d = ((X[:, None, :] - self.X_[None, :, :]) ** 2).sum(-1)
        return self.y_[d.argmin(axis=1)]


class NonMyopicEarlyClassifier:
    def __init__(self, n_clusters: int = 2, min_t: int = 1, lamb: float = 1.0,
                 cost_time_parameter: float = 1.0, random_state: int = 0):
        self.n_clusters = n_clusters
        self.min_t = min_t
        self.lamb = lamb
        self.cost_time_parameter = cost_time_parameter
        self.random_state = random_state

    # -- fit (driver-side) --------------------------------------------------
    def fit(self, df: DataFrame, label_col: str = "label") -> "NonMyopicEarlyClassifier":
        rows = df.select("series_id", "values", label_col).orderBy("series_id").collect()
        X3 = np.array([np.asarray(r["values"], dtype=np.float64) for r in rows])
        n, sz, d = X3.shape
        X = X3.reshape(n, sz * d)
        y_raw = np.array([r[label_col] for r in rows])
        self.classes_ = np.unique(y_raw)
        y = np.searchsorted(self.classes_, y_raw)
        n_classes = len(self.classes_)
        self._sz, self._d = sz, d
        self.centers_, c_k = _kmeans_euclidean(X, self.n_clusters, self.random_state)
        # P(y | c_k) (early_classification.py:181-186)
        self.pyck_ = np.zeros((n_classes, self.n_clusters))
        for yi, ck in zip(y, c_k):
            self.pyck_[yi, ck] += 1
        denom = self.pyck_.sum(axis=0, keepdims=True)
        denom[denom == 0] = 1
        self.pyck_ /= denom
        # stratified half split by cluster (early_classification.py:170-176)
        rs = np.random.RandomState(self.random_state)
        idx1, idx2 = [], []
        for ck in range(self.n_clusters):
            members = np.where(c_k == ck)[0]
            rs.shuffle(members)
            half = len(members) // 2
            idx1.extend(members[:half])
            idx2.extend(members[half:])
        idx1, idx2 = np.array(idx1, dtype=int), np.array(idx2, dtype=int)
        if len(idx1) == 0 or len(idx2) == 0:
            idx1 = idx2 = np.arange(n)
        self.classifiers_ = {}
        self.pyhatyck_ = np.zeros(
            (sz - self.min_t + 1, self.n_clusters, n_classes, n_classes)
        )
        for t in range(self.min_t, sz + 1):
            clf = _OneNN().fit(X3[idx1, :t].reshape(len(idx1), -1), y[idx1])
            self.classifiers_[t] = clf
            for ck in range(self.n_clusters):
                mask = c_k[idx2] == ck
                if not mask.any():
                    continue
                Xc = X3[idx2][mask, :t].reshape(mask.sum(), -1)
                yc = y[idx2][mask]
                yhat = clf.predict(Xc)
                conf = np.zeros((n_classes, n_classes))
                for a, b in zip(yc, yhat):
                    conf[a, b] += 1
                norm = conf.sum(axis=0, keepdims=True)
                norm[norm == 0] = 1
                conf = conf / norm
                np.fill_diagonal(conf, 0.0)  # delta_{y != yhat}
                self.pyhatyck_[t - self.min_t, ck] = conf
        return self

    # -- cost machinery (early_classification.py:213-359) -------------------
    def get_cluster_probas(self, Xi: np.ndarray) -> np.ndarray:
        t = Xi.shape[0]
        centers3 = self.centers_.reshape(self.n_clusters, self._sz, self._d)
        diffs = Xi[None, :, :] - centers3[:, :t]
        dist = np.sqrt((diffs ** 2).sum(axis=(1, 2)))
        avg = dist.mean()
        delta = 1.0 - dist / (avg if avg > 0 else 1.0)
        s = 1.0 / (1.0 + np.exp(np.clip(-self.lamb * delta, -500, 500)))
        return s / s.sum()

    def _expected_costs(self, Xi: np.ndarray) -> np.ndarray:
        t = max(Xi.shape[0], self.min_t)
        probas = self.get_cluster_probas(Xi)
        # sum over yhat of pyhatyck[tau, k, y, yhat] -> (n_tau, k, y)
        sum_yhat = self.pyhatyck_[t - self.min_t:].sum(axis=-1)
        # weight by P(y|c_k) then sum over y -> (n_tau, k)
        sum_y = (sum_yhat * self.pyck_.T[None, :, :]).sum(axis=-1)
        cost = sum_y @ probas
        return cost + self.cost_time_parameter * np.arange(t, self._sz + 1)

    def _predict_single(self, Xi: np.ndarray) -> tuple[str, int]:
        for t in range(self.min_t, self._sz + 1):
            tau_star = int(np.argmin(self._expected_costs(Xi[:t])))
            if t == self._sz or tau_star == 0:
                pred = self.classifiers_[t].predict(
                    Xi[:t].reshape(1, -1)
                )[0]
                return str(self.classes_[pred]), t
        raise AssertionError("unreachable")

    # -- distributed predict ------------------------------------------------
    def predict_class_and_earliness(self, df: DataFrame) -> DataFrame:
        model = self

        schema = StructType([
            StructField("prediction", StringType()),
            StructField("pred_time", IntegerType()),
        ])

        @F.pandas_udf(schema)
        def _udf(values: pd.Series) -> pd.DataFrame:
            preds, times = [], []
            for v in values:
                Xi = np.asarray([np.asarray(r, dtype=np.float64) for r in v])
                p, t = model._predict_single(Xi)
                preds.append(p)
                times.append(t)
            return pd.DataFrame({"prediction": preds, "pred_time": times})

        return df.select(
            "series_id", _udf("values").alias("_r")
        ).select("series_id", F.col("_r.prediction").alias("prediction"),
                 F.col("_r.pred_time").alias("pred_time"))

    def early_classification_cost(self, df: DataFrame, label_col: str = "label") -> float:
        """(1 - acc) + alpha * mean(t) (early_classification.py:519-574)."""
        pred = self.predict_class_and_earliness(df).join(
            df.select("series_id", label_col), "series_id"
        )
        row = pred.select(
            F.avg((F.col("prediction") != F.col(label_col)).cast("double")).alias("err"),
            F.avg("pred_time").alias("mean_t"),
        ).first()
        return float(row["err"] + self.cost_time_parameter * row["mean_t"])
