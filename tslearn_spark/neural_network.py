"""TimeSeriesMLPClassifier / Regressor — flatten + MLP.

Reference: tslearn/neural_network/neural_network.py:9-168 (verbatim
sklearn MLP on flattened (sz*d,) features).  No sklearn here, so a
compact numpy MLP (ReLU hidden layers, Adam, softmax-CE / MSE loss)
trains driver-side on collected features; inference is a distributed
pandas UDF with broadcast weights — same split as the reference
(sklearn trains in memory; prediction vectorizes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _MLP:
    def __init__(self, sizes: list[int], classifier: bool, lr: float = 1e-3,
                 max_iter: int = 300, batch_size: int = 64, seed: int = 0):
        self.sizes = sizes
        self.classifier = classifier
        self.lr = lr
        self.max_iter = max_iter
        self.batch_size = batch_size
        self.seed = seed

    def init(self):
        rs = np.random.RandomState(self.seed)
        self.Ws = [rs.randn(a, b) * np.sqrt(2.0 / a)
                   for a, b in zip(self.sizes[:-1], self.sizes[1:])]
        self.bs = [np.zeros(b) for b in self.sizes[1:]]

    def forward(self, X):
        acts = [X]
        h = X
        for i, (W, b) in enumerate(zip(self.Ws, self.bs)):
            z = h @ W + b
            h = np.maximum(z, 0.0) if i < len(self.Ws) - 1 else z
            acts.append(h)
        return acts

    def fit(self, X, y):
        self.init()
        n = len(X)
        rs = np.random.RandomState(self.seed + 1)
        ms = [np.zeros_like(W) for W in self.Ws]; vs = [np.zeros_like(W) for W in self.Ws]
        mbs = [np.zeros_like(b) for b in self.bs]; vbs = [np.zeros_like(b) for b in self.bs]
        b1, b2, eps = 0.9, 0.999, 1e-8
        for step in range(1, self.max_iter + 1):
            sel = rs.choice(n, size=min(self.batch_size, n), replace=False)
            acts = self.forward(X[sel])
            out = acts[-1]
            if self.classifier:
                p = np.exp(out - out.max(axis=1, keepdims=True))
                p /= p.sum(axis=1, keepdims=True)
                delta = p
                delta[np.arange(len(sel)), y[sel]] -= 1.0
            else:
                delta = out - y[sel][:, None]
            delta /= len(sel)
            for i in range(len(self.Ws) - 1, -1, -1):
                gW = acts[i].T @ delta
                gb = delta.sum(axis=0)
                if i > 0:
                    delta = (delta @ self.Ws[i].T) * (acts[i] > 0)
                for g, m_, v_, t in ((gW, ms[i], vs[i], self.Ws[i]),
                                     (gb, mbs[i], vbs[i], self.bs[i])):
                    m_ *= b1; m_ += (1 - b1) * g
                    v_ *= b2; v_ += (1 - b2) * g * g
                    t -= self.lr * (m_ / (1 - b1 ** step)) / (
                        np.sqrt(v_ / (1 - b2 ** step)) + eps)
        return self

    def predict_raw(self, X):
        return self.forward(X)[-1]


class _MLPBase:
    def __init__(self, hidden_layer_sizes=(100,), max_iter: int = 300,
                 lr: float = 1e-3, random_state: int = 0):
        self.hidden_layer_sizes = tuple(hidden_layer_sizes)
        self.max_iter = max_iter
        self.lr = lr
        self.random_state = random_state

    @staticmethod
    def _flatten(rows) -> np.ndarray:
        # flatten (sz, d) -> (sz*d,) like to_sklearn_dataset (cast.py)
        return np.array([
            np.asarray(r["values"], dtype=np.float64).ravel() for r in rows
        ])


class TimeSeriesMLPClassifier(_MLPBase):
    """neural_network.py:9-105 twin, delegated to MLlib.

    The reference runs sklearn's MLPClassifier on flattened (sz*d,)
    features; the Spark-first mapping (SURVEY.md §2.9) is MLlib's
    MultilayerPerceptronClassifier on a vector column — fit is
    distributed (L-BFGS on executors), nothing is collected to the
    driver.  Flattening is a JVM-side ``flatten`` + array_to_vector.
    """

    def fit(self, df: DataFrame, label_col: str = "label") -> "TimeSeriesMLPClassifier":
        from pyspark.ml.classification import MultilayerPerceptronClassifier
        from pyspark.ml.functions import array_to_vector

        classes = [
            r[0] for r in df.select(label_col).distinct().orderBy(label_col).collect()
        ]
        self.classes_ = np.array(classes)
        idx = F.lit(None)
        for i, c in enumerate(classes):
            cond = F.col(label_col) == F.lit(c)
            idx = F.when(cond, float(i)) if i == 0 else idx.when(cond, float(i))
        feats = df.select(
            "series_id",
            array_to_vector(F.flatten("values")).alias("features"),
            idx.alias("_label_idx"),
        )
        # L-BFGS runs ONE job per iteration over these partitions; size
        # them to the data (~50k rows/partition) so maxIter x n_partitions
        # task overhead doesn't dominate on small inputs, then cache —
        # every iteration re-reads the features otherwise
        n_rows = df.count()
        n_par = max(1, min(df.sparkSession.sparkContext.defaultParallelism,
                           n_rows // 50_000 + 1))
        feats = feats.repartition(n_par).cache()
        n_feat = int(df.select(F.size(F.flatten("values")).alias("n")).first()["n"])
        layers = [n_feat, *self.hidden_layer_sizes, len(classes)]
        clf = MultilayerPerceptronClassifier(
            layers=layers,
            maxIter=self.max_iter,
            seed=self.random_state,
            featuresCol="features",
            labelCol="_label_idx",
        )
        self.model_ = clf.fit(feats)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        feats = df.select(
            "series_id", array_to_vector(F.flatten("values")).alias("features")
        )
        out = self.model_.transform(feats)
        class_arr = F.array(*[F.lit(str(c)) for c in self.classes_])
        return out.select(
            "series_id",
            F.element_at(class_arr, F.col("prediction").cast("int") + 1).alias(
                "prediction"
            ),
        )


class TimeSeriesMLPRegressor(_MLPBase):
    """neural_network.py:108-168 twin."""

    def fit(self, df: DataFrame, target_col: str = "y") -> "TimeSeriesMLPRegressor":
        rows = df.select("series_id", "values", target_col).collect()
        X = self._flatten(rows)
        y = np.array([r[target_col] for r in rows], dtype=np.float64)
        self._y_mean, self._y_std = float(y.mean()), float(y.std() or 1.0)
        yn = (y - self._y_mean) / self._y_std
        sizes = [X.shape[1], *self.hidden_layer_sizes, 1]
        self.mlp_ = _MLP(sizes, classifier=False, lr=self.lr,
                         max_iter=self.max_iter, seed=self.random_state).fit(X, yn)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        mlp, mu, sd = self.mlp_, self._y_mean, self._y_std

        @F.pandas_udf("double")
        def _udf(values: pd.Series) -> pd.Series:
            X = np.array([np.asarray([np.asarray(r, dtype=np.float64) for r in v]).ravel() for v in values])
            return pd.Series(mlp.predict_raw(X).ravel() * sd + mu)

        return df.select("series_id", _udf("values").alias("prediction"))
