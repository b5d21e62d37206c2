"""Canonical Time Warping (reference: tslearn/metrics/ctw.py:39-261).

Alternates CCA feature alignment and DTW until the warping path reaches a
fixpoint.  The reference delegates CCA to sklearn; the container has no
sklearn, so classical CCA is implemented via whitened-covariance SVD in
numpy (same optimum; iteration counts may differ, the fixpoint criterion
is identical).  Runs per-pair inside the metric UDFs.
"""

from __future__ import annotations

import numpy as np

from tslearn_spark import kernels as K


def _warp_matrices(path, sz1: int, sz2: int) -> tuple[np.ndarray, np.ndarray]:
    """Binary selection matrices W1 (len(path) x sz1), W2 (... x sz2)
    (reference ctw.py:7-36 _get_warp_matrices)."""
    L = len(path)
    W1 = np.zeros((L, sz1))
    W2 = np.zeros((L, sz2))
    for k, (i, j) in enumerate(path):
        W1[k, i] = 1.0
        W2[k, j] = 1.0
    return W1, W2


def _cca_project(X: np.ndarray, Y: np.ndarray, n_components: int):
    """Classical CCA: project both views onto their canonical directions."""
    Xc = X - X.mean(axis=0)
    Yc = Y - Y.mean(axis=0)
    reg = 1e-9
    Sxx = Xc.T @ Xc / len(Xc) + reg * np.eye(Xc.shape[1])
    Syy = Yc.T @ Yc / len(Yc) + reg * np.eye(Yc.shape[1])
    Sxy = Xc.T @ Yc / len(Xc)

    def inv_sqrt(S):
        w, V = np.linalg.eigh(S)
        w = np.maximum(w, 1e-12)
        return V @ np.diag(1.0 / np.sqrt(w)) @ V.T

    Wx = inv_sqrt(Sxx)
    Wy = inv_sqrt(Syy)
    U, _, Vt = np.linalg.svd(Wx @ Sxy @ Wy)
    A = Wx @ U[:, :n_components]
    B = Wy @ Vt.T[:, :n_components]
    return Xc @ A, Yc @ B, A, B


def ctw_path(s1, s2, max_iter: int = 100, n_components: int | None = None,
             global_constraint=None, sakoe_chiba_radius=None,
             itakura_max_slope=None, verbose: bool = False,
             iterate: bool = False):
    """CTW path + score (reference ctw.py:39-176).

    Default (iterate=False) replicates the RELEASED reference behavior
    exactly: iteration 0 runs DTW on the inputs projected by identity
    matrices truncated to n_components (ctw.py:141-150), then ONE CCA
    refit refines the PATH — the reference's fixpoint test at
    ctw.py:168 compares the new path to itself, so it always breaks
    immediately and the returned SCORE stays the iteration-0 DTW score
    (hence the reference's cdist_ctw doctests equal cdist_dtw).

    iterate=True runs the intended Zhou & De la Torre alternation to a
    real path fixpoint, returning the score in the aligned CCA
    subspace (the variant the linear-map-invariance property tests
    exercise).

    Handles different feature dims d1 != d2 via the shared CCA
    subspace; returns (path, A, B, score) with the two projection
    matrices in place of the reference's sklearn CCA object.
    """
    X = K.to_2d(s1)
    Y = K.to_2d(s2)
    if n_components is None:
        n_components = min(X.shape[1], Y.shape[1])
    dtw_kw = dict(global_constraint=global_constraint,
                  sakoe_chiba_radius=sakoe_chiba_radius,
                  itakura_max_slope=itakura_max_slope)

    if not iterate:
        seq1 = X @ np.eye(X.shape[1], n_components)
        seq2 = Y @ np.eye(Y.shape[1], n_components)
        path, score = K.dtw_path(seq1, seq2, **dtw_kw)
        W1, W2 = _warp_matrices(path, X.shape[0], Y.shape[0])
        Xw, Yw = W1 @ X, W2 @ Y
        _, _, A, B = _cca_project(Xw, Yw, n_components)
        Xp = (X - Xw.mean(axis=0)) @ A
        Yp = (Y - Yw.mean(axis=0)) @ B
        path, _ = K.dtw_path(Xp, Yp, **dtw_kw)
        return path, A, B, float(score)

    path = [(i, int(round(i * (Y.shape[0] - 1) / max(X.shape[0] - 1, 1))))
            for i in range(X.shape[0])]
    prev_path = None
    score = np.inf
    A = B = None
    for _ in range(max_iter):
        W1, W2 = _warp_matrices(path, X.shape[0], Y.shape[0])
        Xw = W1 @ X
        Yw = W2 @ Y
        _, _, A, B = _cca_project(Xw, Yw, n_components)
        Xp = (X - Xw.mean(axis=0)) @ A
        Yp = (Y - Yw.mean(axis=0)) @ B
        path, score = K.dtw_path(Xp, Yp, **dtw_kw)
        if prev_path is not None and path == prev_path:
            break
        prev_path = path
    return path, A, B, float(score)


def ctw(s1, s2, max_iter: int = 100, n_components: int | None = None,
        global_constraint=None, sakoe_chiba_radius=None,
        itakura_max_slope=None, verbose: bool = False,
        iterate: bool = False) -> float:
    """CTW score (reference ctw.py:178-261 semantics — see ctw_path).
    Parameter order matches the reference (verbose before the engine's
    trailing ``iterate``)."""
    return ctw_path(s1, s2, max_iter=max_iter, n_components=n_components,
                    global_constraint=global_constraint,
                    sakoe_chiba_radius=sakoe_chiba_radius,
                    itakura_max_slope=itakura_max_slope,
                    verbose=verbose, iterate=iterate)[3]
