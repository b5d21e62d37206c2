"""Ecosystem converters + small reference-API parity additions.

Reference: tslearn/utils/cast.py round-trips, softdtw_variants.py:608-728
class API, dba.py:607-741 subgradient variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tslearn_spark import cast as C
from tslearn_spark import kernels as K


def ragged_dataset():
    X = np.full((3, 5, 2), np.nan)
    X[0, :5] = np.arange(10).reshape(5, 2)
    X[1, :3] = np.arange(6).reshape(3, 2)
    X[2, :4] = np.arange(8).reshape(4, 2)
    return X


class TestConverters:
    def test_sklearn_flat(self):
        X = np.random.RandomState(0).randn(4, 6, 2)
        out, d = C.to_sklearn_dataset(X, return_dim=True)
        assert out.shape == (4, 12) and d == 2
        np.testing.assert_allclose(out[1], X[1].ravel())

    def test_pyts_roundtrip(self):
        X = np.random.RandomState(1).randn(4, 6, 2)
        np.testing.assert_allclose(C.from_pyts_dataset(C.to_pyts_dataset(X)), X)
        U = np.random.RandomState(2).randn(4, 6, 1)
        assert C.to_pyts_dataset(U).shape == (4, 6)
        np.testing.assert_allclose(C.from_pyts_dataset(C.to_pyts_dataset(U)), U)

    def test_seglearn_roundtrip_ragged(self):
        X = ragged_dataset()
        seg = C.to_seglearn_dataset(X)
        assert seg[1].shape == (3, 2)
        np.testing.assert_allclose(C.from_seglearn_dataset(seg), X)

    def test_stumpy_roundtrip_ragged(self):
        X = ragged_dataset()
        st = C.to_stumpy_dataset(X)
        assert st[2].shape == (2, 4)  # (d, sz_i)
        np.testing.assert_allclose(C.from_stumpy_dataset(st), X)
        U = np.random.RandomState(3).randn(2, 5, 1)
        assert C.to_stumpy_dataset(U)[0].shape == (5,)

    def test_sktime_roundtrip_ragged(self):
        X = ragged_dataset()
        skt = C.to_sktime_dataset(X)
        assert list(skt.columns) == ["dim_0", "dim_1"]
        assert skt["dim_0"][1].shape == (3,)
        np.testing.assert_allclose(C.from_sktime_dataset(skt), X)

    def test_pyflux_single_series(self):
        U = np.random.RandomState(4).randn(1, 7, 2)
        pf = C.to_pyflux_dataset(U)
        assert pf.shape == (7, 2) and list(pf.columns) == ["dim_0", "dim_1"]
        np.testing.assert_allclose(C.from_pyflux_dataset(pf), U, atol=1e-6)
        with pytest.raises(ValueError):
            C.to_pyflux_dataset(np.zeros((2, 4, 1)))

    def test_tsfresh_roundtrip_ragged(self):
        X = ragged_dataset()
        tf = C.to_tsfresh_dataset(X)
        assert list(tf.columns) == ["id", "time", "dim_0", "dim_1"]
        assert len(tf) == 5 + 3 + 4
        np.testing.assert_allclose(C.from_tsfresh_dataset(tf), X)

    def test_cesium_requires_library(self):
        with pytest.raises(ImportError):
            C.to_cesium_dataset(np.zeros((1, 4, 1)))


class TestSoftDTWClassAPI:
    def test_matches_function(self):
        rs = np.random.RandomState(5)
        x, y = rs.randn(8, 2), rs.randn(6, 2)
        sdtw = K.SoftDTW(K.SquaredEuclidean(x, y), gamma=0.5)
        assert sdtw.compute() == pytest.approx(K.soft_dtw(x, y, gamma=0.5))

    def test_grad_matches_alignment(self):
        rs = np.random.RandomState(6)
        x, y = rs.randn(7, 1), rs.randn(7, 1)
        sdtw = K.SoftDTW(K.SquaredEuclidean(x, y), gamma=1.0)
        sdtw.compute()
        E_ref, _ = K.soft_dtw_alignment(x, y, gamma=1.0)
        np.testing.assert_allclose(sdtw.grad(), E_ref, atol=1e-12)

    def test_grad_requires_compute(self):
        with pytest.raises(ValueError):
            K.SoftDTW(np.ones((3, 3))).grad()

    def test_jacobian_product_is_softdtw_grad(self):
        rs = np.random.RandomState(7)
        x, y = rs.randn(6, 2), rs.randn(5, 2)
        se = K.SquaredEuclidean(x, y)
        sdtw = K.SoftDTW(se, gamma=1.0)
        sdtw.compute()
        G = se.jacobian_product(sdtw.grad())
        _, G_ref = K.soft_dtw_grad(x, y, gamma=1.0)
        np.testing.assert_allclose(G, G_ref, atol=1e-12)

    def test_raw_cost_matrix_accepted(self):
        D = np.array([[0.0, 1.0], [1.0, 0.0]])
        v = K.SoftDTW(D, gamma=0.0).compute()
        assert v == pytest.approx(0.0)


class TestMetricRegistries:
    def test_constants(self):
        from tslearn_spark.metrics import (
            TSLEARN_VALID_METRICS, VARIABLE_LENGTH_METRICS,
        )

        assert TSLEARN_VALID_METRICS == ["ctw", "dtw", "gak", "sax",
                                         "softdtw", "lcss"]
        assert VARIABLE_LENGTH_METRICS == TSLEARN_VALID_METRICS

    def test_ts_zeros(self):
        from tslearn_spark.dataset import ts_zeros

        assert ts_zeros(4).shape == (4, 1)
        assert ts_zeros(3, 2).sum() == 0.0


class TestSubgradientDBA:
    def test_reference_doctest_shape(self, spark):
        # dba.py:676-687 doctest: [[1,2,3,4],[1,2,4,5]] at max_iter=10
        # converges near [1, 2, 3.5, 4.5]
        from tslearn_spark.barycenters import (
            dtw_barycenter_averaging_subgradient,
        )
        from tslearn_spark.dataset import dataset_to_df

        df = dataset_to_df(spark, [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 4.0, 5.0]])
        bar = dtw_barycenter_averaging_subgradient(df, max_iter=10,
                                                   random_state=0)
        assert bar.shape == (4, 1)
        np.testing.assert_allclose(
            bar.ravel(), [1.0, 2.0, 3.5, 4.5], atol=0.35
        )

    def test_petitjean_alias(self):
        from tslearn_spark import barycenters as B

        assert B.dtw_barycenter_averaging_petitjean is B.dtw_barycenter_averaging


class TestUtilsImportParity:
    """tslearn.utils call sites port verbatim to tslearn_spark.utils
    (reference utils.py doctests pinned)."""

    def test_coercion_and_size(self):
        from tslearn_spark.utils import (
            check_equal_size, to_time_series, to_time_series_dataset, ts_size,
        )

        ts = to_time_series([1, 2, 3, 4])
        assert ts.shape == (4, 1) and ts.dtype == np.float64
        d = to_time_series_dataset([[1, 2, 3, 4], [1, 2, 3]])
        assert d.shape == (2, 4, 1)
        assert np.isnan(d[1, 3, 0])
        assert ts_size(d[1]) == 3
        assert not check_equal_size(d)
        assert check_equal_size(to_time_series_dataset([[1, 2], [3, 4]]))

    def test_text_codec_roundtrip(self, tmp_path):
        from tslearn_spark.utils import (
            load_time_series_txt, save_time_series_txt, str_to_time_series,
            time_series_to_str,
        )

        # utils.py:237-240 doctests
        assert time_series_to_str([1, 2, 3, 4], fmt="%.1f") == "1.0 2.0 3.0 4.0"
        assert time_series_to_str([[1, 3], [2, 4]], fmt="%.1f") == "1.0 2.0|3.0 4.0"
        np.testing.assert_array_equal(
            str_to_time_series("1 2|3 4"), [[1.0, 3.0], [2.0, 4.0]]
        )
        p = str(tmp_path / "codec.txt")
        data = [[1.0, 2.0, 3.0], [4.0, 5.0]]
        save_time_series_txt(p, data)
        back = load_time_series_txt(p)
        assert back.shape == (2, 3, 1)
        np.testing.assert_allclose(back[0, :, 0], [1, 2, 3])
        assert np.isnan(back[1, 2, 0])

    def test_validation(self):
        from tslearn_spark.utils import check_dataset, check_dims

        with pytest.raises(ValueError):
            check_dataset([[[1.0, 2.0], [3.0, 4.0]]], force_univariate=True)
        with pytest.raises(ValueError):
            check_dataset([[1.0, 2.0], [1.0, 2.0, 3.0]], force_equal_length=True)
        X = check_dims(np.zeros((2, 5)), extend=True)
        assert X.shape == (2, 5, 1)
        with pytest.raises(ValueError):
            check_dims(np.zeros((2, 5, 1)), X_fit_dims=(9, 4, 1))
        check_dims(np.zeros((2, 5, 1)), X_fit_dims=(9, 4, 1),
                   check_n_features_only=True)

    def test_class_aliases(self):
        from tslearn_spark.clustering import TimeSeriesCentroidBasedClusteringMixin
        from tslearn_spark.shapelets import LearningShapelets, ShapeletModel
        from tslearn_spark.svm import TimeSeriesSVMMixin, _GakSVMBase

        assert ShapeletModel is LearningShapelets
        assert TimeSeriesSVMMixin is _GakSVMBase
        assert hasattr(TimeSeriesCentroidBasedClusteringMixin, "_post_fit")
