"""Physical-plan shape locks for the hot operators.

tools/explain_audit.py audits the full driver-query roster and writes
PLANS.md; these tests pin the subset of plan properties that a future
refactor could silently regress — the 100-TB-critical shapes:

* broadcast joins where a small side must never shuffle,
* no CartesianProduct outside declared all-pairs operators,
* scalar-only shuffles (vectors/series payloads projected away before
  the exchange),
* Python stages vectorized (ArrowEvalPython / MapInPandas, never
  BatchEvalPython row-at-a-time UDFs).

Each test builds the SAME DataFrame the operator builds in production
on tiny in-memory inputs — plan shape is data-size independent for the
properties asserted here (strategy-affecting gates like the broadcast
byte budgets are forced through their intended branch explicitly).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def series_df(spark, n=12, sz=16, seed=0):
    rs = np.random.RandomState(seed)
    rows = [
        (i, [[float(x)] for x in rs.randn(sz)], int(i % 2)) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "series_id long, values array<array<double>>, label int"
    )


def embeddings_df(spark, n=20, d=8, seed=1):
    rs = np.random.RandomState(seed)
    return spark.createDataFrame(
        [(i, [float(x) for x in rs.randn(d)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


class TestNoRowAtATimePython:
    def test_knn_generic_pair_join_is_arrow(self, spark):
        """The elastic-metric kernel must be an Arrow-batched pandas UDF
        (ArrowEvalPython), never a pickled row-at-a-time one."""
        from tslearn_spark.neighbors import kneighbors

        df = series_df(spark)
        nn = kneighbors(df, df, k=3, metric="softdtw", drop_self=True)
        plan = plan_of(nn)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan


class TestBroadcastShapes:
    def test_knn_classify_label_join_broadcast(self, spark):
        """The (tiny) train-label join must be a BroadcastHashJoin — a
        shuffle join here would move every scored pair for a dim table."""
        from tslearn_spark.neighbors import knn_classify

        df = series_df(spark)
        pred = knn_classify(df, df, k=3, metric="euclidean")
        plan = plan_of(pred)
        assert "BroadcastHashJoin" in plan

    def test_euclidean_gate_falls_back_past_byte_budget(self, spark, monkeypatch):
        """Past the broadcast values budget the euclidean path must use
        the generic distributed pair join, not a driver collect."""
        import tslearn_spark.neighbors as N

        df = series_df(spark, n=10, sz=16)
        monkeypatch.setattr(N, "_EUCLIDEAN_BROADCAST_LIMIT_VALUES", 10)
        nn = N.kneighbors(df, df, k=2, metric="euclidean", drop_self=True)
        plan = plan_of(nn)
        # generic path: no MapInPandas partial-top-k stage (that is the
        # broadcast fast path's signature); still exact
        assert "MapInPandas" not in plan
        got = {r["id1"] for r in nn.collect()}
        assert got == set(range(10))

    def test_euclidean_gate_uses_broadcast_under_budget(self, spark):
        from tslearn_spark.neighbors import kneighbors

        df = series_df(spark, n=10, sz=16)
        nn = kneighbors(df, df, k=2, metric="euclidean", drop_self=True)
        assert "MapInPandas" in plan_of(nn)


class TestNoCartesianProduct:
    @pytest.mark.parametrize("builder", ["lsh_topk", "ivf_topk", "minhash"])
    def test_bucketed_operators_never_cross_join(self, spark, builder):
        """Every near-dup / ANN generator must pair through an equi-join
        on bucket keys — a CartesianProduct or BroadcastNestedLoopJoin
        means the bucketing silently degenerated to all-pairs."""
        docs = spark.createDataFrame(
            [(i, f"doc number {i} common words here") for i in range(10)],
            "doc_id long, text string",
        )
        if builder == "lsh_topk":
            from tslearn_spark.pipeline import lsh_topk

            df = lsh_topk(embeddings_df(spark), embeddings_df(spark), k=3,
                          bits=4, n_tables=2, dim=8)
        elif builder == "ivf_topk":
            from tslearn_spark.pipeline import ivf_topk

            df = ivf_topk(embeddings_df(spark), embeddings_df(spark), k=3,
                          n_lists=4, n_probe=2)
        else:
            from tslearn_spark.pipeline import minhash_lsh_candidates

            df = minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                                        verify_threshold=0.3)
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestScalarOnlyShuffles:
    def test_lsh_topk_dedup_shuffle_carries_no_vectors(self, spark):
        """The cross-table dedup aggregate must shuffle (id, id, cosine)
        scalars — the embedding arrays stay on the map side of the
        bucket join (the r5 '!partial_first(qv)' check)."""
        from tslearn_spark.pipeline import lsh_topk

        df = lsh_topk(embeddings_df(spark), embeddings_df(spark), k=3,
                      bits=4, n_tables=2, dim=8)
        plan = plan_of(df)
        assert "partial_max(cosine" in plan
        assert "partial_first(qv" not in plan
        assert "partial_first(cv" not in plan

    def test_knn_topk_shuffle_carries_no_series(self, spark):
        """kneighbors projects the series payloads away before the
        top-k window shuffle: the exchange below the Window must move
        only (id1, id2, dist)."""
        from tslearn_spark.neighbors import kneighbors

        df = series_df(spark)
        nn = kneighbors(df, df, k=3, metric="softdtw", drop_self=True)
        plan = plan_of(nn)
        # the Window input exchange hashes id1; 'values' must not appear
        # in any Exchange's output attribute list
        import re

        for m in re.finditer(r"\(\d+\) Exchange[^\n]*\n((?:   [^\n]*\n)*)", plan):
            assert "values" not in m.group(1), m.group(0)


class TestPushdownAndPruning:
    def test_parquet_filter_and_column_pushdown(self, spark, tmp_path):
        """A filtered 2-column projection over parquet must reach the
        scan: PushedFilters non-empty and ReadSchema pruned."""
        path = str(tmp_path / "t.parquet")
        spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("k"),
            F.lit("payload").alias("junk1"), F.lit(1.5).alias("junk2"),
        ).write.parquet(path)
        df = spark.read.parquet(path).where(F.col("k") > 3).select("id", "k")
        plan = plan_of(df)
        assert "PushedFilters: [IsNotNull(k), GreaterThan(k,3)]" in plan
        assert "junk1" not in plan.split("ReadSchema")[1].splitlines()[0]


class TestDeclaredAllPairs:
    def test_cdist_triangle_is_declared_all_pairs(self, spark):
        """cdist_* IS all-pairs by reference semantics — the triangle
        builds through a broadcast nested-loop on id1 < id2.  Locked
        here so the exemption list in TestNoCartesianProduct stays
        explicit and auditable."""
        from tslearn_spark.metrics import self_pairs

        df = series_df(spark, n=6)
        edges = self_pairs(df)
        plan = plan_of(edges)
        assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


class TestFitLaziness:
    def test_sax_fit_triggers_no_jobs(self, spark):
        """SAX/PAA fit is plan-only (scale=False): the _X_fit_dims_ probe
        the numpy instance methods need is a LAZY plan, so Spark
        pipelines (ts_paa_sax, knn_sax_classify) never pay an extra
        upstream scan at fit time.  Regression lock for the round-7
        eager-dims slip."""
        from tslearn_spark import dataset as DS
        from tslearn_spark.piecewise import PiecewiseAggregateApproximation, SAX

        df = DS.dataset_to_df(spark, [[1.0, 2.0, 3.0, 4.0],
                                      [4.0, 3.0, 2.0, 1.0]])
        df.count()  # warm the input so fit-time jobs are attributable
        st = spark.sparkContext.statusTracker()
        before = len(st.getJobIdsForGroup(None) or [])
        sax = SAX(n_segments=2, alphabet_size_avg=4).fit(df)
        paa = PiecewiseAggregateApproximation(n_segments=2).fit(df)
        after = len(st.getJobIdsForGroup(None) or [])
        assert after - before == 0
        # the numpy surface still works — dims materialize on demand
        assert sax.distance([1.0, 2.0, 3.0, 4.0],
                            [4.0, 3.0, 2.0, 1.0]) >= 0.0
        assert paa.distance([1.0, 2.0, 3.0, 4.0],
                            [4.0, 3.0, 2.0, 1.0]) > 0.0
