"""No-Spark unit tests for bench.py's r12 regression-baseline policy:
per-query MEDIAN over the last k CLEAN history entries (not the single
freshest one), the clean-window bar for confirming a regression, and
the stdout compaction fallback guarantee.

Background (VERDICT r11): a single super-clean entry (ambient 0.991)
made the next run's ordinary noise read as two machine-"confirmed"
regressions, and the confirming re-measure window was itself contended
(ambient 1.236).
"""

import json
import os

import pytest

import bench


@pytest.fixture
def hist_file(monkeypatch):
    """Point bench's history at a throwaway file in the repo root (the
    module resolves it relative to its own directory)."""
    name = ".test_bench_history_r12.json"
    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        name)
    monkeypatch.setattr(bench, "_HISTORY_FILE", name)
    yield path
    if os.path.exists(path):
        os.remove(path)


def _write(path, entries):
    with open(path, "w") as f:
        json.dump(entries, f)


class TestSf1BaselinePolicy:
    def test_median_of_clean_entries(self, hist_file):
        """The r11 failure shape: one outlier-low clean entry must not
        drag the baseline to itself — the median of the last 3 clean
        entries rules."""
        _write(hist_file, [
            {"sf": 0.1, "sf1_queries": {"q": 3.54}, "sf1_ambient": 1.0},
            {"sf": 0.1, "sf1_queries": {"q": 11.15}, "sf1_ambient": 1.4},
            {"sf": 0.1, "sf1_queries": {"q": 3.26}, "sf1_ambient": 0.99},
            {"sf": 0.1, "sf1_queries": {"q": 5.59}, "sf1_ambient": 1.1},
        ])
        # clean = ambients 1.0 / 0.99 / 1.1 (the 1.4 entry is dropped);
        # median of the last 3 clean -> median(3.54, 3.26, 5.59) = 3.54
        assert bench._prior_sf1_medians() == {"q": 3.54}

    def test_contended_fallback(self, hist_file):
        """With no clean entry at all, fall back to the last k entries
        unfiltered — a noisy baseline beats none."""
        _write(hist_file, [
            {"sf": 0.1, "sf1_queries": {"q": 10.0}, "sf1_ambient": 1.5},
            {"sf": 0.1, "sf1_queries": {"q": 12.0}, "sf1_ambient": 1.4},
        ])
        assert bench._prior_sf1_medians() == {"q": 11.0}

    def test_legacy_entries_use_ambient_factor(self, hist_file):
        """Entries predating sf1_ambient filter on ambient_factor."""
        _write(hist_file, [
            {"sf": 0.1, "sf1_queries": {"q": 4.0}, "ambient_factor": 1.0},
            {"sf": 0.1, "sf1_queries": {"q": 9.0}, "ambient_factor": 1.3},
        ])
        assert bench._prior_sf1_medians() == {"q": 4.0}

    def test_missing_file_empty(self, hist_file):
        assert bench._prior_sf1_medians() == {}


class TestSf01BaselinePolicy:
    def test_median_of_clean_same_sf(self, hist_file):
        _write(hist_file, [
            {"sf": 0.1, "queries": {"q": 1.0},
             "queries_normalized": {"q": 1.0}, "ambient_factor": 1.0},
            {"sf": 0.001, "queries": {"q": 99.0},
             "queries_normalized": {"q": 99.0}, "ambient_factor": 1.0},
            {"sf": 0.1, "queries": {"q": 2.0},
             "queries_normalized": {"q": 2.0}, "ambient_factor": 1.05},
            {"sf": 0.1, "queries": {"q": 9.0},
             "queries_normalized": {"q": 9.0}, "ambient_factor": 1.4},
            {"sf": 0.1, "queries": {"q": 3.0},
             "queries_normalized": {"q": 3.0}, "ambient_factor": 1.1},
        ])
        med, src = bench._prior_medians(0.1)
        # clean same-sf normalized values: 1.0, 2.0, 3.0 -> median 2.0;
        # the other-sf and contended entries are excluded
        assert med == {"q": 2.0}
        assert src == bench._HISTORY_FILE


class TestGate:
    def test_gate_requires_ratio_and_margin(self):
        assert bench._gate(3.2, 2.0)           # 1.6x and +1.2s
        assert not bench._gate(2.9, 2.0)       # <1.5x
        assert not bench._gate(0.9, 0.5)       # 1.8x but +0.4s only
        assert not bench._gate(1.0, 0.0)       # no baseline


class TestClassAmbient:
    """r15: per-class contention split (sql-only vs python-worker) —
    contention on the bench box is non-uniform across the two classes
    (r14: py-worker queries slowed ~2x while controls slowed ~1.5x), so
    the committed artifact carries a median ratio per class."""

    def test_split_medians(self):
        timings = {"nation_order_rollup": 2.0,      # sql
                   "q1_pricing_summary": 3.0,       # sql
                   "ann_ivf_topk": 4.0,             # py
                   "cdist_dtw_tiny": 6.0}           # py
        prior = {"nation_order_rollup": 1.0, "q1_pricing_summary": 2.0,
                 "ann_ivf_topk": 1.0, "cdist_dtw_tiny": 3.0}
        out = bench._class_ambient(timings, prior)
        assert out["sql"] == pytest.approx(1.75)   # median(2.0, 1.5)
        assert out["py"] == pytest.approx(3.0)     # median(4.0, 2.0)

    def test_no_prior_is_none(self):
        assert bench._class_ambient({"ann_ivf_topk": 1.0}, {}) == {
            "sql": None, "py": None}

    def test_py_worker_set_is_benched_subset(self):
        # the classification must not drift from the bench roster
        assert bench.PY_WORKER_BENCH <= set(bench.BENCH_QUERIES)


class TestDispersionPolicy:
    """r13 statistical-ambient policy: per-query dispersion (median +
    MAD over history) and z-scores in units of each query's own spread
    gate the regression flags alongside the ratio conjunction."""

    def test_dispersion_needs_three_samples(self, hist_file):
        _write(hist_file, [
            {"sf": 0.1, "queries_normalized": {"q": 1.0, "r": 1.0}},
            {"sf": 0.1, "queries_normalized": {"q": 1.2}},
            {"sf": 0.1, "queries_normalized": {"q": 1.1}},
        ])
        d = bench._prior_dispersion(0.1)
        assert d["q"] == {"med": 1.1, "mad": 0.1, "n": 3}
        assert "r" not in d  # only 2 samples

    def test_z_score_units_of_own_spread(self):
        # history med 2.0, mad 0.4 -> sigma = 0.5930; a 1.4x drift
        # (2.8s) is only z ~ 1.35 for this historically-noisy query
        d = {"med": 2.0, "mad": 0.4, "n": 5}
        assert abs(bench._z_score(2.8, d) - 1.35) < 0.02
        # a tight-history query: sigma floors at 7% of med
        d2 = {"med": 2.0, "mad": 0.0, "n": 5}
        assert bench._z_score(2.8, d2) == pytest.approx(
            0.8 / 0.14, abs=0.05)
        assert bench._z_score(2.8, None) is None

    def test_z_floor_absolute(self):
        # sub-0.05s sigma floors at 0.05 so micro-noise cannot explode
        d = {"med": 0.2, "mad": 0.0, "n": 4}
        assert bench._z_score(0.3, d) == pytest.approx(2.0)

    def test_sf1_dispersion(self, hist_file):
        _write(hist_file, [
            {"sf": 0.1, "sf1_queries": {"q": 3.0}},
            {"sf": 0.1, "sf1_queries": {"q": 4.0}},
            {"sf": 0.1, "sf1_queries": {"q": 5.0}},
        ])
        assert bench._prior_sf1_dispersion() == {
            "q": {"med": 4.0, "mad": 1.0, "n": 3}}
