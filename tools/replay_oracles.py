"""Engine-free numpy replay oracles for the two roster queries that
have no SQL form (iterative fits: MLlib L-BFGS MLP, Adam shapelets).

The driver's board records these as ``no_oracle``; this module gives
tools/check_oracles.py a CHECKED artifact instead of bare rows-only
(VERDICT r13 directive 7): the fitted model is re-fit with the same
pinned seed, its weights/shapelet bank are extracted, and the query's
returned predictions / min-distances are verified against a pure-numpy
forward pass over series read through DuckDB — an input path fully
independent of the engine.  What the replay proves:

* the TRANSFORM/PREDICT layer is numerically the documented math
  (affine+sigmoid+argmax for the MLP per MLlib's topology; min over
  positions of mean squared diff for shapelets,
  /root/reference/tslearn/shapelets/shapelets.py:514-540), and
* the fit is deterministic under its pinned seed (two fits in the same
  session produce identical predictions), and
* the result covers exactly the declared population (every user with
  >= 2 events).

What it cannot prove: that the fit CONVERGED to the reference's optimum
(no SQL or closed form exists) — that is covered by the accuracy/loss
trajectories in tests/test_models_battery.py.
"""

from __future__ import annotations

import numpy as np


def _series_from_parquet(sf_dir: str) -> dict[int, np.ndarray]:
    import os

    import duckdb

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        # Spark-written dataset dir (the generated .scale_sf1/.scale_sf5
        # tables) — glob its part files, same as check_oracles.py's view
        # registration (r14: the sf1 board's replay failed here)
        path = f"{path}/*.parquet"
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, list(value ORDER BY ts, event_id)
        FROM read_parquet('{path}')
        GROUP BY user_id
        """
    ).fetchall()
    con.close()
    return {int(u): np.asarray(v, dtype=np.float64) for u, v in rows}


def _znorm(v: np.ndarray) -> np.ndarray:
    sd = float(np.sqrt(max(float(np.mean(v * v) - np.mean(v) ** 2), 0.0)))
    return (v - np.mean(v)) / (sd if sd != 0.0 else 1.0)


def _resample(v: np.ndarray, sz: int) -> np.ndarray:
    if len(v) == 1:
        return np.full(sz, v[0])
    return np.interp(np.linspace(0.0, len(v) - 1, sz), np.arange(len(v)), v)


def _prep(sf_dir: str, sz: int) -> dict[int, np.ndarray]:
    raw = _series_from_parquet(sf_dir)
    return {u: _znorm(_resample(v, sz)) for u, v in raw.items() if len(v) >= 2}


def replay_mlp_classify(spark, sf_dir: str, sdf) -> tuple[str, str]:
    """(status, detail) for the mlp_classify result frame ``sdf``."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from tslearn_spark.neural_network import TimeSeriesMLPClassifier
    from tslearn_spark.preprocessing import resample as rsp
    from tslearn_spark.preprocessing import transform_mean_variance

    got = dict(zip(sdf["series_id"].astype(int), sdf["prediction"].astype(str)))
    ts16 = transform_mean_variance(rsp(
        entry._events_series(spark, sf_dir).where(F.size("values") >= 2), 16
    )).cache()
    ts16.count()
    labeled = ts16.withColumn("label", (F.col("series_id") % 3).cast("string"))
    clf = TimeSeriesMLPClassifier(hidden_layer_sizes=(32,), max_iter=60,
                                  random_state=0).fit(labeled)
    ts16.unpersist()
    w = np.asarray(clf.model_.weights.toArray())
    layers = [16, 32, 3]
    if len(w) != 16 * 32 + 32 + 32 * 3 + 3:
        return "replay-FAIL", f"weight vector length {len(w)}"
    classes = [str(c) for c in clf.classes_]

    s16 = _prep(sf_dir, 16)
    if set(got) != set(s16):
        return ("replay-FAIL",
                f"coverage: {len(got)} predictions vs {len(s16)} eligible users")
    mismatch = ties = 0
    for u, v in s16.items():
        off, h = 0, v
        for li in range(len(layers) - 1):
            nin, nout = layers[li], layers[li + 1]
            W = w[off:off + nin * nout].reshape(nin, nout).T
            off += nin * nout
            b = w[off:off + nout]
            off += nout
            z = W @ h + b
            h = 1.0 / (1.0 + np.exp(-z)) if li < len(layers) - 2 else z
        top = np.sort(h)
        if top[-1] - top[-2] <= 1e-9:  # argmax tie: cross-impl order unsafe
            ties += 1
            continue
        if got[u] != classes[int(np.argmax(h))]:
            mismatch += 1
    if mismatch or ties > max(1, len(s16) // 100):
        return ("replay-FAIL",
                f"{mismatch} prediction mismatches, {ties} argmax ties "
                f"of {len(s16)}")
    return "replay-OK", f"{len(s16)} predictions == numpy forward pass"


def replay_shapelet_transform(spark, sf_dir: str, sdf) -> tuple[str, str]:
    """(status, detail) for the shapelet_transform result frame ``sdf``."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from tslearn_spark.preprocessing import resample as rsp
    from tslearn_spark.preprocessing import transform_mean_variance
    from tslearn_spark.shapelets import LearningShapelets

    got = {(int(u), int(k)): float(d)
           for u, k, d in zip(sdf["user_id"], sdf["shapelet_idx"],
                              sdf["min_dist"])}
    ts32 = transform_mean_variance(rsp(
        entry._events_series(spark, sf_dir).where(F.size("values") >= 2), 32
    ))
    labeled = ts32.withColumn(
        "label", (F.col("series_id") % 3).cast("string")).cache()
    labeled.count()
    clf = LearningShapelets(n_shapelets_per_size={8: 4}, max_iter=50,
                            random_state=0).fit(labeled)
    labeled.unpersist()
    bank = [np.asarray(s, dtype=np.float64).ravel() for s in clf.shapelets_]
    if [len(s) for s in bank] != [8, 8, 8, 8]:
        return "replay-FAIL", f"bank shapes {[len(s) for s in bank]}"

    s32 = _prep(sf_dir, 32)
    if {u for u, _ in got} != set(s32):
        return ("replay-FAIL",
                f"coverage: {len({u for u, _ in got})} users vs "
                f"{len(s32)} eligible")
    worst = 0.0
    for u, v in s32.items():
        win = np.lib.stride_tricks.sliding_window_view(v, 8)
        for k, shp in enumerate(bank):
            d = float(np.min(np.mean((win - shp) ** 2, axis=1)))
            worst = max(worst, abs(got[(u, k)] - d))
    # query rounds to 4 decimals (5e-5 quantization) + float32 layer noise
    if worst > 1.5e-4:
        return "replay-FAIL", f"max |min_dist - numpy| = {worst:.2e}"
    return ("replay-OK",
            f"{len(got)} min-dists within 1.5e-4 of numpy (max {worst:.1e})")


REPLAYS = {
    "mlp_classify": replay_mlp_classify,
    "shapelet_transform": replay_shapelet_transform,
}
