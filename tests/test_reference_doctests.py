"""Systematic replay of the reference docstring examples (SURVEY.md §5.1
calls the doctest corpus the densest correctness source).

Collection is pure-AST over /root/reference/tslearn/**.py docstrings —
the reference package is never imported.  Each docstring's example block
runs as one doctest against a shim that maps ``tslearn.*`` imports to
the ``tslearn_spark`` twins, with a numeric-tolerant output checker
(float-accumulation orders differ between the engines, and numpy repr
formatting is version-dependent).

Outcomes are three-way and every non-pass carries a reason:
* pass — output matches (tolerantly) after running on the Spark engine;
* xfail — the id is in XFAIL with a documented, category-level reason
  (RNG stream differences, environment gaps, repr-only drift);
* fail — an UNEXPLAINED mismatch; the build treats this as a bug.
"""

from __future__ import annotations

import ast
import doctest
import os
import re
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference/tslearn"

# ---------------------------------------------------------------------------
# explained non-passes.  Keys are "<relpath>::<qualname>"; a key may also be
# a whole-file "<relpath>" to cover every docstring in it.  Prefix the reason
# with "skip:" to skip (environment can't run it at all) instead of xfail.
# ---------------------------------------------------------------------------
XFAIL: dict[str, str] = {
    # -- environment: the data/packages behind these do not exist here ------
    "datasets/ucr_uea.py": "skip: downloads UCR/UEA archives from the "
    "network; offline mirrors are exercised in test_sources_early.py",
    "datasets/cached.py": "skip: needs the bundled Trace npz, which is not "
    "redistributed (VERDICT r7 missing #3)",
    "utils/cast.py::to_pyflux_dataset": "skip: pyflux not installed",
    "utils/cast.py::from_pyflux_dataset": "skip: pyflux not installed",
    "utils/cast.py::to_cesium_dataset": "skip: cesium not installed",
    "utils/cast.py::from_cesium_dataset": "skip: cesium not installed",
    "shapelets/shapelets.py::GlobalMinPooling1D": "skip: tensorflow/keras "
    "layer example (tf absent; the engine has no keras backend by design)",
    "shapelets/shapelets.py::GlobalMaxPooling1D": "skip: tensorflow/keras "
    "layer example (tf absent)",
    "svm/svm.py::TimeSeriesSVR": "skip: the example itself calls the "
    "numpy.float alias removed in numpy 1.24 — unrunnable on modern numpy",
    "metrics/dtw_variants.py::dtw_path_from_metric":
        "skip: example imports sklearn.metrics.pairwise (sklearn absent); "
        "the precomputed-metric path is unit-tested in test_kernels.py",
    "metrics/dtw_variants.py::lcss_path_from_metric":
        "skip: example imports sklearn.metrics.pairwise (sklearn absent)",
    # -- documented API deviation --------------------------------------
    "metrics/ctw.py::ctw_path": "engine returns (path, A, B, score): the "
    "reference's middle value is a fitted sklearn CCA object; the engine "
    "implements CCA from scratch and exposes the two projection matrices "
    "(ctw.py:51-110 docstring), and sklearn is absent for the type check",
    # -- reference-private implementation helpers the engine does not
    #    have (the equivalent work is a SQL expression / fit dataflow) --
    "clustering/utils.py::_compute_inertia": "private helper: the engine "
    "computes inertia as a grouped SQL aggregate inside fit, not a "
    "driver-side matrix helper",
    "matrix_profile/matrix_profile.py::_series_to_segments": "private "
    "strided-view helper: segmentation is a SQL window/slice expression "
    "in the engine (matrix_profile.py:24-124)",
    "piecewise/piecewise.py::_paa_to_symbols": "private helper: "
    "symbolization is the symbols_col SQL expression "
    "(tslearn_spark/piecewise.py:105); breakpoint math is replayed via "
    "the mapped _breakpoints/_bin_medians twins",
    # -- algorithm-internal trajectories -------------------------------
    "barycenters/softdtw.py::softdtw_barycenter": "prints a NON-converged "
    "iterate (max_iter=5): the from-scratch distributed L-BFGS takes a "
    "different 5-step trajectory than scipy's; converged barycenters "
    "match the reference goldens (tests/test_transforms_spark.py)",
}


def _collect():
    parser = doctest.DocTestParser()
    cases = []
    for dirpath, _, files in sorted(os.walk(REF_ROOT)):
        if "tests" in dirpath:
            continue
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, REF_ROOT)
            try:
                tree = ast.parse(open(path).read())
            except (SyntaxError, OSError):
                continue

            def qual(node, prefix=""):
                out = []
                for child in ast.iter_child_nodes(node):
                    if isinstance(child, (ast.ClassDef, ast.FunctionDef,
                                          ast.AsyncFunctionDef)):
                        name = prefix + child.name
                        ds = ast.get_docstring(child)
                        if ds and parser.get_examples(ds):
                            out.append((name, ds))
                        out.extend(qual(child, name + "."))
                return out

            mod_ds = ast.get_docstring(tree)
            if mod_ds and parser.get_examples(mod_ds):
                cases.append((rel, "<module>", mod_ds))
            for name, ds in qual(tree):
                cases.append((rel, name, ds))
    return cases


CASES = _collect()


class TolerantChecker(doctest.OutputChecker):
    """Exact doctest match first; else numeric comparison: every float in
    want/got pairs up within tolerance AND the non-numeric skeleton is
    identical.  Catches accumulation-order drift without accepting
    structurally different output.

    Tolerance rules:
    * plain float: rtol=1e-3 / atol=1e-5 (summation-order drift);
    * float truncated by an ellipsis (``0.089...``): the written digits
      only bound the value, so compare within 1.5 units of the LAST
      written decimal place — e.g. the reference's ``0.089...`` (its
      dot-product cost association rounds to 0.0899999999999981) accepts
      the direct (x-y)^2 association's 0.0900000000000002."""

    _num = re.compile(r"(-?\d+\.?\d*(?:[eE][+-]?\d+)?|-?inf|nan)(\.\.\.)?")

    def check_output(self, want, got, optionflags):
        if super().check_output(want, got, optionflags):
            return True
        wtok = self._num.findall(want)
        gtok = self._num.findall(got)
        if not wtok or len(wtok) != len(gtok):
            return False
        try:
            for (w, dots), (g, _) in zip(wtok, gtok):
                wv, gv = float(w), float(g)
                if dots and "." in w and "e" not in w.lower():
                    tol = 1.5 * 10.0 ** -len(w.split(".")[1])
                    if not (abs(gv - wv) <= tol
                            or (np.isnan(wv) and np.isnan(gv))):
                        return False
                elif not (np.isclose(gv, wv, rtol=1e-3, atol=1e-5)
                          or (np.isnan(wv) and np.isnan(gv))):
                    return False
        except ValueError:
            return False
        # whitespace-insensitive skeleton: numpy pads columns differently
        # when magnitudes differ (e.g. "0. ]" vs "#e-218])")
        skel_w = "".join(self._num.sub("#", want).split())
        skel_g = "".join(self._num.sub("#", got).split())
        return skel_w == skel_g


# ---------------------------------------------------------------------------
# Harness-side numpy twins of the reference GENERATORS (the documented
# model: ts[t] = ts[t-1] + N(mu, std); blobs = repeated base walks + noise,
# generators.py:7-112).  The engine's own generators are Spark DataFrames
# with partition-invariant seeding (dataset.py:203) — a documented
# deviation — so seeded reference examples can only replay value-exactly
# against twins that draw the same RandomState stream.  These exist ONLY
# inside this harness; they are the doctests' data oracle, like the numpy
# replay oracles in test_driver_queries.py.
# ---------------------------------------------------------------------------


def _check_rs(random_state):
    if random_state is None:
        return np.random.mtrand._rand  # global state, like sklearn's helper
    if isinstance(random_state, np.random.RandomState):
        return random_state
    return np.random.RandomState(random_state)


def _ref_random_walks(n_ts=100, sz=256, d=1, mu=0., std=1.,
                      random_state=None):
    rs = _check_rs(random_state)
    steps = rs.randn(n_ts, sz, d) * std + mu
    return np.cumsum(steps, axis=1)


def _ref_random_walk_blobs(n_ts_per_blob=100, sz=256, d=1, n_blobs=2,
                           noise_level=1., random_state=None):
    rs = _check_rs(random_state)
    base = _ref_random_walks(n_ts=n_blobs, sz=sz, d=d, std=1.0,
                             random_state=rs)
    noise = rs.randn(n_ts_per_blob * n_blobs, sz, d) * noise_level
    X = np.repeat(base, repeats=n_ts_per_blob, axis=0) + noise
    y = np.repeat(range(n_blobs), repeats=n_ts_per_blob)
    return X, y


_SHIM = {
    "tslearn.metrics": "tslearn_spark.metrics",
    "tslearn.metrics.dtw_variants": "tslearn_spark.metrics",
    "tslearn.metrics.softdtw_variants": "tslearn_spark.metrics",
    "tslearn.utils": "tslearn_spark.utils",
    "tslearn.clustering": "tslearn_spark.clustering",
    "tslearn.clustering.utils": "tslearn_spark.clustering",
    "tslearn.piecewise": "tslearn_spark.piecewise",
    "tslearn.barycenters": "tslearn_spark.barycenters",
    "tslearn.neighbors": "tslearn_spark.neighbors",
    "tslearn.preprocessing": "tslearn_spark.preprocessing",
    "tslearn.svm": "tslearn_spark.svm",
    "tslearn.shapelets": "tslearn_spark.shapelets",
    "tslearn.neural_network": "tslearn_spark.neural_network",
    "tslearn.matrix_profile": "tslearn_spark.matrix_profile",
    "tslearn.early_classification": "tslearn_spark.early_classification",
    "tslearn.generators": None,  # synthetic: reference-RNG numpy twins
    "tslearn.datasets": "tslearn_spark.sources",
    "tslearn.hdftools": "tslearn_spark.hdftools",
    "tslearn.bases": "tslearn_spark.bases",
}


@pytest.fixture(scope="module")
def tslearn_shim(spark):
    """Map ``tslearn.*`` imports to the Spark twins for the doctest run
    (spark fixture dependency: the numpy-compat estimator surface needs
    an active session)."""
    import importlib
    import types

    saved = {k: sys.modules.get(k) for k in ["tslearn", *_SHIM]}
    root = types.ModuleType("tslearn")
    root.__path__ = []  # mark as package so "import tslearn.metrics" works
    sys.modules["tslearn"] = root
    gen = types.ModuleType("tslearn.generators")
    gen.random_walks = _ref_random_walks
    gen.random_walk_blobs = _ref_random_walk_blobs
    added_attrs = []  # (owner_module, attr) set on REAL modules -> undo
    for ref, ours in _SHIM.items():
        mod = gen if ours is None else importlib.import_module(ours)
        sys.modules[ref] = mod
        parts = ref.split(".")
        if len(parts) == 2:
            setattr(root, parts[1], mod)
        else:
            # nested submodule (tslearn.metrics.dtw_variants, ...): the
            # parent mapping is a REAL tslearn_spark module, so attach
            # the leaf as an attribute for `parent.leaf` access and
            # remember to detach it afterwards
            parent = sys.modules[".".join(parts[:-1])]
            if not hasattr(parent, parts[-1]):
                setattr(parent, parts[-1], mod)
                added_attrs.append((parent, parts[-1]))
    yield
    for owner, attr in added_attrs:
        delattr(owner, attr)
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _reason_for(rel, name):
    for key in (f"{rel}::{name}", rel):
        if key in XFAIL:
            return XFAIL[key]
    return None


# reference file -> the tslearn_spark module whose namespace plays the
# defining-module globals (real doctest runs with module __dict__, so
# examples reference module-level names like ``ts_size`` or ``numpy``
# without importing them)
_FILE_MODULE = {
    "utils/utils.py": "tslearn_spark.utils",
    "utils/cast.py": "tslearn_spark.cast",
    "metrics/dtw_variants.py": "tslearn_spark.metrics",
    "metrics/softdtw_variants.py": "tslearn_spark.metrics",
    "metrics/ctw.py": "tslearn_spark.metrics",
    "metrics/sax.py": "tslearn_spark.metrics",
    "metrics/cycc.py": "tslearn_spark.metrics",
    "clustering/kmeans.py": "tslearn_spark.clustering",
    "clustering/kshape.py": "tslearn_spark.clustering",
    "clustering/utils.py": "tslearn_spark.clustering",
    "piecewise/piecewise.py": "tslearn_spark.piecewise",
    "barycenters/dba.py": "tslearn_spark.barycenters",
    "barycenters/euclidean.py": "tslearn_spark.barycenters",
    "barycenters/softdtw.py": "tslearn_spark.barycenters",
    "neighbors/neighbors.py": "tslearn_spark.neighbors",
    "preprocessing/preprocessing.py": "tslearn_spark.preprocessing",
    "svm/svm.py": "tslearn_spark.svm",
    "shapelets/shapelets.py": "tslearn_spark.shapelets",
    "neural_network/neural_network.py": "tslearn_spark.neural_network",
    "matrix_profile/matrix_profile.py": "tslearn_spark.matrix_profile",
    "early_classification/early_classification.py":
        "tslearn_spark.early_classification",
    "generators/generators.py": "tslearn_spark.dataset",
    "datasets/ucr_uea.py": "tslearn_spark.sources",
    "datasets/cached.py": "tslearn_spark.sources",
}


# reference-private helper names whose ENGINE twin lives under a
# different public name — mapped so the doctests exercise real engine
# code (never harness stand-ins)
def _extra_globs(rel):
    if rel == "piecewise/piecewise.py":
        from tslearn_spark import stats

        return {"_breakpoints": stats.sax_breakpoints,
                "_bin_medians": stats.sax_bin_medians}
    return {}


def _globs_for(rel):
    import importlib

    g = {"np": np, "numpy": np}
    # every reference module does `from tslearn.utils import ...` (and
    # the clustering ones `from tslearn.preprocessing import ...`) at the
    # top, so those names (to_time_series_dataset, ts_size, the scalers)
    # are in scope in its doctests — mirror that baseline for all files
    g.update(vars(importlib.import_module("tslearn_spark.utils")))
    g.update(vars(importlib.import_module("tslearn_spark.preprocessing")))
    mod = _FILE_MODULE.get(rel)
    if mod is not None:
        g.update(vars(importlib.import_module(mod)))
    g["numpy"] = np  # twin modules import numpy as np only
    # generator names resolve to the reference-RNG numpy twins (see
    # their definition above) whether referenced bare or re-imported
    g["random_walks"] = _ref_random_walks
    g["random_walk_blobs"] = _ref_random_walk_blobs
    g.update(_extra_globs(rel))
    return g


@pytest.mark.parametrize(
    "rel,name,docstring",
    CASES,
    ids=[f"{rel}::{name}" for rel, name, _ in CASES],
)
def test_reference_doctest(rel, name, docstring, tslearn_shim, tmp_path,
                           monkeypatch):
    reason = _reason_for(rel, name)
    if reason and reason.startswith("skip:"):
        pytest.skip(reason[5:].strip())
    # examples that write files (save_time_series_txt) use relative
    # paths — sandbox them away from the repo root
    monkeypatch.chdir(tmp_path)
    parser = doctest.DocTestParser()
    test = parser.get_doctest(
        docstring, _globs_for(rel), f"{rel}::{name}", rel, 0)
    runner = doctest.DocTestRunner(
        checker=TolerantChecker(),
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS,
        verbose=False,
    )
    log: list[str] = []
    runner.run(test, out=log.append, clear_globs=True)
    if runner.failures or runner.tries == 0:
        detail = "".join(log)[-4000:]
        if reason:
            pytest.xfail(f"{reason}\n{detail}")
        pytest.fail(
            f"{runner.failures}/{runner.tries} examples failed "
            f"(unexplained)\n{detail}")
    elif reason:
        pytest.fail(f"XPASS: {rel}::{name} passes but is marked xfail "
                    f"({reason}) — remove the entry")
