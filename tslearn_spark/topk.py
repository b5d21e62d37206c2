"""Tie-aware map-side partial top-k selection.

Every broadcast/mapInPandas kNN path in the engine emits a per-batch
partial top-k and lets a final window (``score, id``) produce the global
ranking.  ``np.argpartition`` alone picks an ARBITRARY subset of rows
tied at the cutoff value, so a tied candidate with a smaller id can be
dropped map-side and the final window never sees it — violating the
declared (score, id ASC) tie-break even though every emitted row is
ranked correctly.  Continuous scores never tie, which is why hash gates
on random data pass; duplicate vectors/series tie exactly and expose it
(caught by the exact-tie ANN fixture in tests/test_pipeline.py).

``topk_rows_tiebreak`` keeps argpartition's O(n) selection for the rows
strictly better than the cutoff and resolves the cutoff ties by smallest
id — the same total order the final window applies, so the map-side
partial is always a superset of the global top-k's contributors.
"""

from __future__ import annotations

import numpy as np


def topk_matrix_tiebreak(scores: np.ndarray, ids: np.ndarray, kk: int,
                         largest: bool = False) -> np.ndarray:
    """Column-wise ``topk_rows_tiebreak`` over a (n, m) score matrix —
    returns (kk, m) row indices.

    Ties are rare on continuous scores, so the hot path stays ONE
    vectorized argpartition; only columns whose cutoff value is tied
    across the selection boundary (cutoff count inside the selection <
    cutoff count overall) pay the per-column id-ordered fix.
    """
    n, m = scores.shape
    if n <= kk:
        return np.tile(np.arange(n)[:, None], (1, m))
    c = -scores if largest else scores
    sel = np.argpartition(c, kk - 1, axis=0)[:kk]           # (kk, m)
    cols = np.arange(m)[None, :]
    cutoff = c[sel, cols].max(axis=0)                       # (m,)
    with np.errstate(invalid="ignore"):
        eq_all = (c == cutoff[None, :]).sum(axis=0)
        eq_sel = (c[sel, cols] == cutoff[None, :]).sum(axis=0)
    for qi in np.nonzero(eq_all > eq_sel)[0]:
        sel[:, qi] = topk_rows_tiebreak(scores[:, qi], ids, kk, largest)
    return sel


def topk_rows_tiebreak(scores: np.ndarray, ids: np.ndarray, kk: int,
                       largest: bool = False) -> np.ndarray:
    """Indices of the ``kk`` best entries of ``scores`` (smallest when
    ``largest=False``), ties at the cutoff broken by smallest ``ids``.

    Cost is O(n) (argpartition) plus O(t log t) over the t cutoff ties —
    t is O(1) for continuous scores and never exceeds n.
    """
    n = len(scores)
    if n <= kk:
        return np.arange(n)
    c = -scores if largest else scores
    top = np.argpartition(c, kk - 1)[:kk]
    cutoff = c[top].max()
    if np.isnan(cutoff):
        # kk-th best is already NaN -> fewer than kk comparable scores;
        # argpartition's pick is as good as any (NaN order is undefined
        # in the final window too, which filters them via inf guards)
        return top
    better = np.nonzero(c < cutoff)[0]
    tied = np.nonzero(c == cutoff)[0]
    need = kk - len(better)
    tied_sel = tied[np.argsort(ids[tied], kind="stable")[:need]]
    return np.concatenate([better, tied_sel])
