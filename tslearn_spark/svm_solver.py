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


def smo_svc(K: np.ndarray, y: np.ndarray, C=1.0, tol: float = 1e-3,
            max_passes: int = 200) -> tuple[np.ndarray, float]:
    """Binary SVC dual; y in {-1, +1}.  Returns (alpha, b).

    ``C`` may be a scalar or a per-sample array (class_weight support:
    libsvm's C_i = C * weight[class_i] box constraints; the pairwise
    L/H bounds generalize to the two samples' own caps)."""
    n = len(y)
    Cs = np.full(n, float(C)) if np.isscalar(C) else np.asarray(C, dtype=np.float64)
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
        i_up = (alpha < Cs - 1e-12) & (y > 0) | (alpha > 1e-12) & (y < 0)
        i_lo = (alpha < Cs - 1e-12) & (y < 0) | (alpha > 1e-12) & (y > 0)
        if not i_up.any() or not i_lo.any():
            break
        i = int(np.argmin(np.where(i_up, E, np.inf)))
        j = int(np.argmax(np.where(i_lo, E, -np.inf)))
        if E[j] - E[i] < tol:
            break
        ai_old, aj_old = alpha[i], alpha[j]
        if y[i] != y[j]:
            L = max(0.0, aj_old - ai_old)
            H = min(Cs[j], Cs[i] + aj_old - ai_old)
        else:
            L = max(0.0, ai_old + aj_old - Cs[i])
            H = min(Cs[j], ai_old + aj_old)
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
        free = (alpha > 1e-8) & (alpha < Cs - 1e-8)
        if free.any():
            b_new = float(np.mean(y[free] - (E[free] + y[free] - b)))
        else:
            b_new = b
        E += b_new - b
        b = b_new
        passes = 0
    return alpha, b


def platt_fit(decisions: np.ndarray, y: np.ndarray,
              max_iter: int = 100) -> tuple[float, float]:
    """Fit sigmoid P(y=1|f) = 1/(1+exp(A f + B)) to (decision, label)
    pairs — Platt 1999 with the numerically robust Newton iteration of
    Lin, Lin & Weng 2007 ("A note on Platt's probabilistic outputs"),
    including the regularized targets t+ = (N+ + 1)/(N+ + 2)."""
    y = np.asarray(y, dtype=np.float64)
    f = np.asarray(decisions, dtype=np.float64)
    n_pos = float(np.sum(y > 0))
    n_neg = float(len(y) - n_pos)
    t = np.where(y > 0, (n_pos + 1.0) / (n_pos + 2.0), 1.0 / (n_neg + 2.0))
    A, B = 0.0, np.log((n_neg + 1.0) / (n_pos + 1.0))
    sigma = 1e-12  # Hessian ridge

    def nll(A, B):
        z = A * f + B
        # log(1 + e^z) stable in both tails
        return float(np.sum(np.where(
            z >= 0, t * z + np.log1p(np.exp(-z)),
            (t - 1.0) * z + np.log1p(np.exp(z)))))

    best = nll(A, B)
    for _ in range(max_iter):
        z = A * f + B
        p = np.where(z >= 0, np.exp(-z) / (1.0 + np.exp(-z)),
                     1.0 / (1.0 + np.exp(z)))  # P(y=1)
        d1 = t - p
        d2 = p * (1.0 - p)
        g_A = float(np.sum(f * d1))
        g_B = float(np.sum(d1))
        if abs(g_A) < 1e-5 and abs(g_B) < 1e-5:
            break
        h11 = float(np.sum(f * f * d2)) + sigma
        h22 = float(np.sum(d2)) + sigma
        h12 = float(np.sum(f * d2))
        det = h11 * h22 - h12 * h12
        dA = -(h22 * g_A - h12 * g_B) / det
        dB = -(-h12 * g_A + h11 * g_B) / det
        # backtracking line search on the negative log-likelihood
        step = 1.0
        while step >= 1e-10:
            nA, nB = A + step * dA, B + step * dB
            val = nll(nA, nB)
            if val < best + 1e-10:
                A, B, best = nA, nB, val
                break
            step *= 0.5
        else:
            break
    return A, B


def platt_predict(decisions: np.ndarray, A: float, B: float) -> np.ndarray:
    z = A * np.asarray(decisions, dtype=np.float64) + B
    return np.where(z >= 0, np.exp(-z) / (1.0 + np.exp(-z)),
                    1.0 / (1.0 + np.exp(z)))


def pairwise_coupling(R: np.ndarray, n_classes: int,
                      pairs: list[tuple[int, int]],
                      max_iter: int = 100) -> np.ndarray:
    """Multiclass probabilities from pairwise ones — Wu, Lin & Weng 2004
    (JMLR 5), the second method (libsvm's multiclass_probability).

    R: (n_query, n_pairs) with R[:, m] = P(class a | a-vs-b) for
    pairs[m] = (a, b).  Returns (n_query, n_classes), rows sum to 1.
    """
    nq = R.shape[0]
    out = np.full((nq, n_classes), 1.0 / n_classes)
    eps = 1e-12
    for q in range(nq):
        r = {}
        for m, (a, b) in enumerate(pairs):
            r[(a, b)] = min(max(R[q, m], eps), 1.0 - eps)
            r[(b, a)] = 1.0 - r[(a, b)]
        Q = np.zeros((n_classes, n_classes))
        for a in range(n_classes):
            for b in range(n_classes):
                if a == b:
                    Q[a, a] = sum(r[(bb, a)] ** 2 for bb in range(n_classes)
                                  if bb != a)
                else:
                    Q[a, b] = -r[(a, b)] * r[(b, a)]
        p = np.full(n_classes, 1.0 / n_classes)
        for _ in range(max_iter):
            Qp = Q @ p
            pQp = float(p @ Qp)
            stop = True
            for a in range(n_classes):
                diff = abs(Qp[a] - pQp)
                if diff > 1e-10:
                    stop = False
                    p[a] += (-Qp[a] + pQp) / max(Q[a, a], eps)
                    p = np.maximum(p, 0.0)
                    p /= p.sum()
                    Qp = Q @ p
                    pQp = float(p @ Qp)
            if stop:
                break
        out[q] = p
    return out


class BinarySVC:
    def __init__(self, C=1.0):
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

    def fit_platt(self, K: np.ndarray, y: np.ndarray, n_folds: int = 5,
                  random_state: int | None = None) -> "BinarySVC":
        """Platt sigmoid on CROSS-VALIDATED decision values (libsvm's
        svm_binary_svc_probability: 5-fold CV so the sigmoid is not fit
        on resubstitution decisions)."""
        y = np.where(y > 0, 1.0, -1.0)
        n = len(y)
        rs = np.random.RandomState(random_state if random_state is not None else 0)
        order = rs.permutation(n)
        folds = np.array_split(order, min(n_folds, n))
        dec = np.zeros(n)
        for held in folds:
            tr = np.setdiff1d(np.arange(n), held)
            if len(np.unique(y[tr])) < 2:
                dec[held] = 0.0
                continue
            Ci = self.C if np.isscalar(self.C) else np.asarray(self.C)[tr]
            m = BinarySVC(Ci).fit(K[np.ix_(tr, tr)], y[tr])
            dec[held] = m.decision_function(K[np.ix_(held, tr)])
        self.platt_A_, self.platt_B_ = platt_fit(dec, y)
        return self

    def predict_proba_pos(self, K_query: np.ndarray) -> np.ndarray:
        """P(positive class) via the fitted sigmoid."""
        return platt_predict(self.decision_function(K_query),
                             self.platt_A_, self.platt_B_)


class MulticlassSVC:
    """One-vs-one voting like libsvm (sklearn SVC default).

    ``sample_C`` (per-sample box constraints) implements class_weight;
    ``fit_platt`` + ``predict_proba`` add libsvm-style probability
    estimates (per-machine CV Platt sigmoids, Wu-Lin-Weng coupling).
    """

    def __init__(self, C: float = 1.0, sample_C: np.ndarray | None = None):
        self.C = C
        self.sample_C = sample_C
        self.classes_: np.ndarray | None = None
        self.machines_: list[tuple[int, int, BinarySVC, np.ndarray]] = []

    def _sub_C(self, idx: np.ndarray):
        return self.C if self.sample_C is None else self.sample_C[idx]

    def fit(self, K: np.ndarray, y: np.ndarray) -> "MulticlassSVC":
        self.classes_ = np.unique(y)
        # class index per training point, kept for the libsvm-layout
        # support_/n_support_/dual_coef_ properties below
        self._y_idx = np.searchsorted(self.classes_, y)
        self.machines_ = []
        for a in range(len(self.classes_)):
            for bb in range(a + 1, len(self.classes_)):
                mask = (y == self.classes_[a]) | (y == self.classes_[bb])
                idx = np.where(mask)[0]
                ysub = np.where(y[idx] == self.classes_[a], 1.0, -1.0)
                m = BinarySVC(self._sub_C(idx)).fit(K[np.ix_(idx, idx)], ysub)
                self.machines_.append((a, bb, m, idx))
        return self

    # -- libsvm-layout fitted attributes (sklearn SVC surface; the
    # reference reads these off svm_estimator_, e.g. svm.py:190-196
    # doctest sums n_support_ and svm.py:249-258 slices support_) ------
    _SV_TOL = 1e-8

    def _sv_mask(self) -> np.ndarray:
        sv = np.zeros(len(self._y_idx), dtype=bool)
        for _, _, m, idx in self.machines_:
            sv[idx[np.abs(m.dual_coef_) > self._SV_TOL]] = True
        return sv

    @property
    def support_(self) -> np.ndarray:
        """SV training indices GROUPED BY CLASS (classes_ order),
        ascending within a class — libsvm's ordering, which the
        reference's support_vectors_ property relies on when it slices
        support_ by n_support_ (svm.py:249-258)."""
        sv = self._sv_mask()
        return np.concatenate(
            [np.where(sv & (self._y_idx == c))[0]
             for c in range(len(self.classes_))]
        ).astype(np.int32)

    @property
    def n_support_(self) -> np.ndarray:
        sv = self._sv_mask()
        return np.array(
            [int((sv & (self._y_idx == c)).sum())
             for c in range(len(self.classes_))], dtype=np.int32)

    @property
    def dual_coef_(self) -> np.ndarray:
        """(n_class-1, n_SV): the column for SV t of class c holds its
        alpha*y in each machine (c vs o), at row o - (o > c) — libsvm's
        packing of the ovo duals."""
        support = self.support_
        pos = {int(t): j for j, t in enumerate(support)}
        out = np.zeros((max(len(self.classes_) - 1, 1), len(support)))
        for a, b, m, idx in self.machines_:
            for p, t in enumerate(idx):
                j = pos.get(int(t))
                if j is None:
                    continue
                c = int(self._y_idx[t])
                o = b if c == a else a
                out[o - (o > c), j] = m.dual_coef_[p]
        return out

    @property
    def intercept_(self) -> np.ndarray:
        """Per ovo machine, in (a, b) a<b order — decision_function is
        dual_coef @ K + intercept, matching sklearn's sign."""
        return np.array([m.b_ for _, _, m, _ in self.machines_])

    def fit_platt(self, K: np.ndarray, y: np.ndarray,
                  random_state: int | None = None) -> "MulticlassSVC":
        for a, bb, m, idx in self.machines_:
            ysub = np.where(y[idx] == self.classes_[a], 1.0, -1.0)
            m.fit_platt(K[np.ix_(idx, idx)], ysub, random_state=random_state)
        return self

    def predict(self, K_query: np.ndarray) -> np.ndarray:
        votes = np.zeros((K_query.shape[0], len(self.classes_)))
        for a, bb, m, idx in self.machines_:
            d = m.decision_function(K_query[:, idx])
            votes[d > 0, a] += 1
            votes[d <= 0, bb] += 1
        return self.classes_[np.argmax(votes, axis=1)]

    def decision_function_ovo(self, K_query: np.ndarray) -> np.ndarray:
        """(n_query, n_pairs) raw ovo decisions, machine order."""
        return np.stack(
            [m.decision_function(K_query[:, idx])
             for _, _, m, idx in self.machines_], axis=1)

    def predict_proba(self, K_query: np.ndarray) -> np.ndarray:
        R = np.stack(
            [m.predict_proba_pos(K_query[:, idx])
             for _, _, m, idx in self.machines_], axis=1)
        pairs = [(a, bb) for a, bb, _, _ in self.machines_]
        return pairwise_coupling(R, len(self.classes_), pairs)


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
    """Fitted attrs mirror sklearn SVR's libsvm surface: support_ (SV
    indices), dual_coef_ (1, n_SV), intercept_ (1,) — derived from the
    full beta_ vector the solver stores."""

    _SV_TOL = 1e-8

    @property
    def support_(self) -> np.ndarray:
        return np.where(np.abs(self.beta_) > self._SV_TOL)[0].astype(np.int32)

    @property
    def dual_coef_(self) -> np.ndarray:
        return self.beta_[self.support_][None, :]

    @property
    def intercept_(self) -> np.ndarray:
        return np.array([self.b_])

    def __init__(self, C: float = 1.0, epsilon: float = 0.1):
        self.C = C
        self.epsilon = epsilon

    def fit(self, K: np.ndarray, y: np.ndarray) -> "KernelSVR":
        self.beta_, self.b_ = smo_svr(K, np.asarray(y, dtype=np.float64),
                                      self.C, self.epsilon)
        return self

    def predict(self, K_query: np.ndarray) -> np.ndarray:
        return K_query @ self.beta_ + self.b_
