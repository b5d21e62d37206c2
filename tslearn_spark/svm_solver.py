"""Minimal SMO solvers for kernel SVC/SVR on precomputed Gram matrices.

The reference delegates to sklearn/libsvm (tslearn/svm/svm.py:68-568);
this container has neither, so the dual problems are solved directly:

* SVC: Platt's SMO with second-order working-set selection (the
  standard max-violating-pair heuristic used by libsvm).
* SVR: SMO on the epsilon-insensitive dual in the beta = alpha - alpha*
  parameterization (Smola & Schoelkopf 2004 update rules).

Driver-side numpy on an n x n Gram (the documented ~20k-series ceiling,
SURVEY.md §7); the Gram itself is computed distributed.
"""

from __future__ import annotations

import numpy as np


def smo_svc(K: np.ndarray, y: np.ndarray, C: float = 1.0, tol: float = 1e-3,
            max_passes: int = 200) -> tuple[np.ndarray, float]:
    """Binary SVC dual; y in {-1, +1}.  Returns (alpha, b)."""
    n = len(y)
    alpha = np.zeros(n)
    b = 0.0
    # E_i = f(x_i) - y_i, maintained incrementally
    E = -y.astype(np.float64)
    passes = 0
    it = 0
    max_iter = 200 * n
    while passes < max_passes and it < max_iter:
        it += 1
        # max-violating pair (libsvm WSS): with E = f - y, the optimality
        # gap is max_{I_low} E - min_{I_up} E
        i_up = (alpha < C - 1e-12) & (y > 0) | (alpha > 1e-12) & (y < 0)
        i_lo = (alpha < C - 1e-12) & (y < 0) | (alpha > 1e-12) & (y > 0)
        if not i_up.any() or not i_lo.any():
            break
        i = int(np.argmin(np.where(i_up, E, np.inf)))
        j = int(np.argmax(np.where(i_lo, E, -np.inf)))
        if E[j] - E[i] < tol:
            break
        ai_old, aj_old = alpha[i], alpha[j]
        if y[i] != y[j]:
            L = max(0.0, aj_old - ai_old)
            H = min(C, C + aj_old - ai_old)
        else:
            L = max(0.0, ai_old + aj_old - C)
            H = min(C, ai_old + aj_old)
        if H - L < 1e-12:
            passes += 1
            continue
        eta = K[i, i] + K[j, j] - 2.0 * K[i, j]
        if eta <= 1e-12:
            passes += 1
            continue
        aj = aj_old + y[j] * (E[i] - E[j]) / eta
        aj = min(max(aj, L), H)
        ai = ai_old + y[i] * y[j] * (aj_old - aj)
        alpha[i], alpha[j] = ai, aj
        dE = y[i] * (ai - ai_old) * K[i] + y[j] * (aj - aj_old) * K[j]
        E += dE
        # recompute b from free SVs
        free = (alpha > 1e-8) & (alpha < C - 1e-8)
        if free.any():
            b_new = float(np.mean(y[free] - (E[free] + y[free] - b)))
        else:
            b_new = b
        E += b_new - b
        b = b_new
        passes = 0
    return alpha, b


class BinarySVC:
    def __init__(self, C: float = 1.0):
        self.C = C

    def fit(self, K: np.ndarray, y: np.ndarray) -> "BinarySVC":
        y = np.where(y > 0, 1.0, -1.0)
        self.y_ = y
        self.alpha_, self.b_ = smo_svc(K, y, self.C)
        self.dual_coef_ = self.alpha_ * y
        return self

    def decision_function(self, K_query: np.ndarray) -> np.ndarray:
        """K_query: (n_query, n_train)."""
        return K_query @ self.dual_coef_ + self.b_


class MulticlassSVC:
    """One-vs-one voting like libsvm (sklearn SVC default)."""

    def __init__(self, C: float = 1.0):
        self.C = C
        self.classes_: np.ndarray | None = None
        self.machines_: list[tuple[int, int, BinarySVC, np.ndarray]] = []

    def fit(self, K: np.ndarray, y: np.ndarray) -> "MulticlassSVC":
        self.classes_ = np.unique(y)
        self.machines_ = []
        for a in range(len(self.classes_)):
            for bb in range(a + 1, len(self.classes_)):
                mask = (y == self.classes_[a]) | (y == self.classes_[bb])
                idx = np.where(mask)[0]
                ysub = np.where(y[idx] == self.classes_[a], 1.0, -1.0)
                m = BinarySVC(self.C).fit(K[np.ix_(idx, idx)], ysub)
                self.machines_.append((a, bb, m, idx))
        return self

    def predict(self, K_query: np.ndarray) -> np.ndarray:
        votes = np.zeros((K_query.shape[0], len(self.classes_)))
        for a, bb, m, idx in self.machines_:
            d = m.decision_function(K_query[:, idx])
            votes[d > 0, a] += 1
            votes[d <= 0, bb] += 1
        return self.classes_[np.argmax(votes, axis=1)]


def smo_svr(K: np.ndarray, y: np.ndarray, C: float = 1.0, epsilon: float = 0.1,
            tol: float = 1e-3, max_iter: int | None = None) -> tuple[np.ndarray, float]:
    """epsilon-SVR dual in beta = alpha - alpha^*; returns (beta, b).

    Pairwise coordinate ascent maintaining sum(beta) = 0: pick the
    max-gradient-violating pair, solve the 1-D piecewise-quadratic
    subproblem exactly (the epsilon term is piecewise-linear in delta).
    """
    n = len(y)
    beta = np.zeros(n)
    # f_i = sum_j beta_j K_ij (no b inside the dual)
    f = np.zeros(n)
    max_iter = max_iter or 200 * n
    for _ in range(max_iter):
        # dual gradient wrt beta_i: y_i - f_i - eps*sign(beta_i) (subgrad)
        g_up = y - f - epsilon      # gradient if beta_i increases
        g_dn = y - f + epsilon      # gradient if beta_i decreases
        can_up = beta < C - 1e-12
        can_dn = beta > -C + 1e-12
        i = int(np.argmax(np.where(can_up, g_up, -np.inf)))
        j = int(np.argmin(np.where(can_dn, g_dn, np.inf)))
        viol = g_up[i] - g_dn[j]
        if viol < tol:
            break
        eta = K[i, i] + K[j, j] - 2.0 * K[i, j]
        if eta <= 1e-12:
            eta = 1e-12
        # move delta along (e_i - e_j); objective is piecewise quadratic in
        # delta with kinks where beta_i or beta_j crosses 0
        def seg_opt(lo: float, hi: float, si: float, sj: float) -> tuple[float, float]:
            # on a segment, d(obj)/d(delta) = (y_i - y_j) - (f_i - f_j)
            #   - eta*delta - eps*(si - sj)
            num = (y[i] - y[j]) - (f[i] - f[j]) - epsilon * (si - sj)
            d = num / eta
            d = min(max(d, lo), hi)
            val = num * d - 0.5 * eta * d * d
            return d, val
        # segment breakpoints for beta_i + delta and beta_j - delta crossing 0
        lo = max(-C - beta[i], beta[j] - C)
        hi = min(C - beta[i], beta[j] + C)
        kinks = sorted({lo, hi, min(max(-beta[i], lo), hi), min(max(beta[j], lo), hi)})
        best = (0.0, -np.inf)
        for a, bnd in zip(kinks[:-1], kinks[1:]):
            if bnd - a < 1e-15:
                continue
            mid = 0.5 * (a + bnd)
            si = np.sign(beta[i] + mid) or 1.0
            sj = np.sign(beta[j] - mid) or -1.0
            d, val = seg_opt(a, bnd, si, sj)
            if val > best[1]:
                best = (d, val)
        delta = best[0]
        if abs(delta) < 1e-14:
            break
        beta[i] += delta
        beta[j] -= delta
        f += delta * (K[i] - K[j])
    # b from points strictly inside the tube boundaries
    on_up = (beta > 1e-8) & (beta < C - 1e-8)
    on_dn = (beta < -1e-8) & (beta > -C + 1e-8)
    bs = []
    if on_up.any():
        bs.extend(y[on_up] - f[on_up] - epsilon)
    if on_dn.any():
        bs.extend(y[on_dn] - f[on_dn] + epsilon)
    b = float(np.mean(bs)) if bs else float(np.mean(y - f))
    return beta, b


class KernelSVR:
    def __init__(self, C: float = 1.0, epsilon: float = 0.1):
        self.C = C
        self.epsilon = epsilon

    def fit(self, K: np.ndarray, y: np.ndarray) -> "KernelSVR":
        self.beta_, self.b_ = smo_svr(K, np.asarray(y, dtype=np.float64),
                                      self.C, self.epsilon)
        return self

    def predict(self, K_query: np.ndarray) -> np.ndarray:
        return K_query @ self.beta_ + self.b_
