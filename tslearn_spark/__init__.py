"""tslearn_spark — a PySpark-native time-series analytics engine.

Re-implements the query/data-processing capabilities of the reference
time-series toolkit (rtavenar/tslearn) on Apache Spark, Spark-first:

* the primary representation is a DataFrame with one row per series and a
  nested ``array<array<double>>`` ``values`` column (SURVEY.md §1.5) —
  per-series transforms (scaling, PAA, SAX, resampling, envelopes) are
  shuffle-free higher-order-function expressions that stay inside
  whole-stage codegen;
* cross-series similarity (DTW family, GAK, soft-DTW, LCSS, NCC) runs as
  vectorized-numpy kernels inside Arrow-batched pandas UDFs over pair
  joins with symmetry pruning and LB_Keogh pre-filtering;
* iterative algorithms (k-means, DBA, KShape) are driver-orchestrated
  sequences of Spark jobs with broadcast of the (tiny) model state.
"""

__version__ = "0.1.0"

from tslearn_spark.session import get_spark, load_tables

# lazy re-exports of the estimator/operator surface: a reference user's
# `from tslearn.clustering import TimeSeriesKMeans` becomes
# `from tslearn_spark import TimeSeriesKMeans` (Spark DataFrames in/out)
_LAZY = {
    "TimeSeriesKMeans": "tslearn_spark.clustering",
    "KShape": "tslearn_spark.clustering",
    "KernelKMeans": "tslearn_spark.clustering",
    "GlobalAlignmentKernelKMeans": "tslearn_spark.clustering",
    "SerializableShapeletModel": "tslearn_spark.shapelets",
    "GlobalMinPooling1D": "tslearn_spark.shapelets",
    "GlobalArgminPooling1D": "tslearn_spark.shapelets",
    "KMeansShapeletInitializer": "tslearn_spark.shapelets",
    "LocalSquaredDistanceLayer": "tslearn_spark.shapelets",
    "KNeighborsTimeSeriesMixin": "tslearn_spark.neighbors",
    "silhouette_score": "tslearn_spark.clustering",
    "kneighbors": "tslearn_spark.neighbors",
    "knn_classify": "tslearn_spark.neighbors",
    "knn_regress": "tslearn_spark.neighbors",
    "KNeighborsTimeSeries": "tslearn_spark.neighbors",
    "KNeighborsTimeSeriesClassifier": "tslearn_spark.neighbors",
    "KNeighborsTimeSeriesRegressor": "tslearn_spark.neighbors",
    "UCR_UEA_datasets": "tslearn_spark.sources",
    "CachedDatasets": "tslearn_spark.sources",
    "TimeSeriesSVC": "tslearn_spark.svm",
    "TimeSeriesSVR": "tslearn_spark.svm",
    "TimeSeriesMLPClassifier": "tslearn_spark.neural_network",
    "TimeSeriesMLPRegressor": "tslearn_spark.neural_network",
    "LearningShapelets": "tslearn_spark.shapelets",
    "NonMyopicEarlyClassifier": "tslearn_spark.early_classification",
    "SAX": "tslearn_spark.piecewise",
    "OneDSAX": "tslearn_spark.piecewise",
    "PiecewiseAggregateApproximation": "tslearn_spark.piecewise",
    "SymbolicAggregateApproximation": "tslearn_spark.piecewise",
    "OneD_SymbolicAggregateApproximation": "tslearn_spark.piecewise",
    "TimeSeriesResampler": "tslearn_spark.preprocessing",
    "TimeSeriesScalerMinMax": "tslearn_spark.preprocessing",
    "TimeSeriesScalerMeanVariance": "tslearn_spark.preprocessing",
    "MatrixProfile": "tslearn_spark.matrix_profile",
    "LabelCategorizer": "tslearn_spark.labels",
    "cdist": "tslearn_spark.metrics",
    "dtw_barycenter_averaging": "tslearn_spark.barycenters",
    "softdtw_barycenter": "tslearn_spark.barycenters",
    "euclidean_barycenter": "tslearn_spark.barycenters",
    "save_model": "tslearn_spark.model_io",
    "load_model": "tslearn_spark.model_io",
    "dtw_barycenter_averaging_petitjean": "tslearn_spark.barycenters",
    "dtw_barycenter_averaging_subgradient": "tslearn_spark.barycenters",
    "SoftDTW": "tslearn_spark.kernels",
    "SquaredEuclidean": "tslearn_spark.kernels",
    "ts_zeros": "tslearn_spark.dataset",
    "to_sklearn_dataset": "tslearn_spark.cast",
    "to_pyts_dataset": "tslearn_spark.cast",
    "from_pyts_dataset": "tslearn_spark.cast",
    "to_seglearn_dataset": "tslearn_spark.cast",
    "from_seglearn_dataset": "tslearn_spark.cast",
    "to_stumpy_dataset": "tslearn_spark.cast",
    "from_stumpy_dataset": "tslearn_spark.cast",
    "to_sktime_dataset": "tslearn_spark.cast",
    "from_sktime_dataset": "tslearn_spark.cast",
    "to_pyflux_dataset": "tslearn_spark.cast",
    "from_pyflux_dataset": "tslearn_spark.cast",
    "to_tsfresh_dataset": "tslearn_spark.cast",
    "from_tsfresh_dataset": "tslearn_spark.cast",
    "to_cesium_dataset": "tslearn_spark.cast",
    "from_cesium_dataset": "tslearn_spark.cast",
    "TSLEARN_VALID_METRICS": "tslearn_spark.metrics",
    "VARIABLE_LENGTH_METRICS": "tslearn_spark.metrics",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'tslearn_spark' has no attribute {name!r}")


__all__ = ["get_spark", "load_tables", "__version__", *sorted(_LAZY)]
