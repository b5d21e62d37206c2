"""Matrix profile (reference: tslearn/matrix_profile/matrix_profile.py:25-253).

Per-series computation: sliding windows of length m, optional per-window
z-normalization, all-pairs distances with an exclusion band of width
ceil(m/4) around the diagonal, per-row min.

Spark-first: one series = one row, so the profile is a *map-only* pandas
UDF over the nested values column — series parallelism is the scale axis
(each 100-TB partition computes its own profiles independently, no
shuffle).  The numpy core vectorizes the all-pairs distance via the
dot-product identity instead of the reference's per-pair loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def matrix_profile_np(ts: np.ndarray, m: int, scale: bool = True) -> np.ndarray:
    """Numpy core, semantics of matrix_profile.py:153-210.

    - windows: ts[i:i+m], i in [0, sz-m]
    - scale=True: each window z-normalized (mean 0, std 1; std 0 -> 1)
      matching TimeSeriesScalerMeanVariance applied to the window set
      (matrix_profile.py:185)
    - exclusion zone: |i-j| < ceil(m/4) -> inf (matrix_profile.py:192-197)
    - profile[i] = min_j dist(w_i, w_j)
    """
    ts = np.asarray(ts, dtype=np.float64).reshape(-1)
    sz = ts.shape[0]
    n_win = sz - m + 1
    idx = np.arange(m)[None, :] + np.arange(n_win)[:, None]
    W = ts[idx]  # (n_win, m)
    if scale:
        mu = W.mean(axis=1, keepdims=True)
        sd = W.std(axis=1, keepdims=True)
        sd[sd == 0.0] = 1.0
        W = (W - mu) / sd
    sq = np.einsum("ij,ij->i", W, W)
    D2 = sq[:, None] + sq[None, :] - 2.0 * (W @ W.T)
    np.maximum(D2, 0.0, out=D2)
    # reference band: tri(+bw) & ~tri(-(bw+1)) == |i-j| <= bw
    band = int(np.ceil(m / 4.0))
    ii = np.arange(n_win)
    mask = np.abs(ii[:, None] - ii[None, :]) <= band
    D2[mask] = np.inf
    return np.sqrt(D2.min(axis=1))


def matrix_profile_udf(m: int, scale: bool = True):
    @F.pandas_udf(ArrayType(DoubleType()))
    def _udf(values: pd.Series) -> pd.Series:
        out = []
        for v in values:
            arr = np.asarray([np.asarray(r, dtype=np.float64) for r in v]).reshape(len(v), -1)
            out.append(matrix_profile_np(arr[:, 0], m, scale).tolist())
        return pd.Series(out)

    return _udf


def transform(df: DataFrame, subsequence_length: int, scale: bool = True,
              values_col: str = "values", out_col: str = "profile",
              spread: bool = True) -> DataFrame:
    """Matrix profile per series.

    spread=True repartitions to the cluster's parallelism first: the UDF
    is O(sz^2) per row, so partitioning must follow compute, not bytes
    (AQE would coalesce a small series table to one task).
    """
    if spread:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df.withColumn(out_col, matrix_profile_udf(subsequence_length, scale)(values_col))
