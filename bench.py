"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced through the noop sink so the full plan (including
projections Catalyst would prune under count()) executes.

Median protocol: each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3),
with the runs INTERLEAVED (full pass over all queries, repeated) so a
transient ambient blip — a co-tenant I/O window, a GC storm — lands on at
most one sample per query instead of all samples of one query.  The
reported per-query time is the median across passes; "value" is the sum of
medians.  Round 4 recorded a contiguous block of four window queries at
3.8-4.9x their round-1 single-shot times with byte-identical plans — a
single-sample protocol cannot distinguish that from a regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # module-level: pandas_udf type hints resolve via globals

import __spark_entry__ as entrymod
from tslearn_spark import get_spark

BENCH_QUERIES = [
    # relational core
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "events_hourly_stats",
    "top_customers_per_segment",
    # time-series operators (SQL-native path)
    "ts_scale",
    "ts_paa_sax",
    "ts_envelope",
    "ts_barycenter",
    "ts_resample",
    # similarity joins + relational extensions
    "ts_sax_dist_pairs",
    "ts_lb_keogh_pairs",
    "events_sessionize",
    "events_asof_orders",
    "events_cumulative",
    "revenue_grouping_sets",
    "knn_euclidean_16",
    # data-pipeline operators
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_minhash_verified",
    "text_quality",
    "ann_cosine_topk",
    "ann_ivf_topk",
    # UDF kernel path.  r11: knn_dtw_classify became the hash-gated
    # scale-invariant sample (its timings drop vs prior rounds by
    # construction); knn_dtw_classify_full carries the full-population
    # quadratic banded-DTW measurement the old name used to record.
    "kernel_kmeans_assign_tiny",
    "matrix_profile_events",
    "knn_dtw_classify",
    "knn_dtw_classify_full",
    # round-6: previously unbenched oracled queries — full perf trail
    "part_brand_stats",
    "nation_order_rollup",
    "orders_priority_dist",
    "ts_paa_dist_pairs",
    "events_running_zscore",
    "dedup_simhash",
    "dedup_canonical",
    "dedup_embedding_cosine",
    "ann_lsh_topk",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_video_metadata",
    "silhouette_euclidean_16",
    "knn_sax_classify",
    "cdist_dtw_tiny",
    "shapelet_score_fixed",
]


def _warmup(spark) -> None:
    """Standard bench warmup: spin up the Python UDF workers and JIT the
    JVM before the timed loop.  A session's FIRST pandas-UDF stage pays
    for forking local[N] workers that each import numpy/pandas/pyarrow —
    ~20s on a cold page cache in this environment — which is session
    setup cost, not query cost."""
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _w(x: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(x, dtype=np.float64))

    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, n * 4, 1, n).select(_w(F.col("id").cast("double")).alias("v"))
    df.agg(F.sum("v")).collect()


# Scale-validation suite: run at ~10x sf0.1 rows (tools/gen_scale_data.py)
# to check the 100-TB claims against measured growth, not plan reading.
# "expect" is the operator's asymptotic in ROW COUNT n on this data:
#   linear    — one scan / one uniform shuffle / per-row or per-series work
#   n*cand    — inverted-index or bucket join; candidates scale linearly
#               here BY CONSTRUCTION (copy-salted tokens / axis-split
#               embeddings keep cross-copy collisions at zero)
#   quadratic — declared all-pairs semantics (self-kNN, brute-force ANN,
#               self-join ANN at FIXED index parameters): pair count
#               grows ~100x at 10x rows; the scale knob is the index
#               (bits/n_lists grow with log n to hold bucket occupancy,
#               LB-pruning for kNN), not the join plan
# ann_lsh_topk is excluded: a self-join LSH at fixed bits=6 measured
# 164 s at 10x rows (~60x — bucket occupancy up 10x on both sides), the
# expected fixed-parameter quadratic; re-measuring that every round
# buys nothing.  ann_ivf_topk carries the same asymptotic but its
# per-list BLAS absorbs the constant, so it stays measurable.
# The quadratic queries run LAST so their executor pressure (GC after
# a 100x-pair stage) cannot pollute the linear measurements.
SCALE_QUERIES = [
    ("text_quality", "linear"),
    ("dedup_exact", "linear"),
    ("dedup_simhash", "linear"),
    ("dedup_minhash_verified", "n*cand"),
    ("dedup_ngram_jaccard", "n*cand"),
    ("dedup_canonical", "n*cand"),
    ("matrix_profile_events", "linear"),
    ("events_running_zscore", "linear"),
    ("ann_ivf_topk", "quadratic"),
    ("ann_cosine_topk", "quadratic"),
    ("knn_sax_classify", "quadratic"),
]


def _time_controls(spark, qs, sf01_dir: str, n_passes: int = 2) -> dict:
    """Cold-cache medians of the sf0.1 control queries, timed NOW —
    the contention probe for whatever section calls it."""
    samples: dict[str, list[float]] = {n: [] for n in CONTROL_QUERIES}
    for _ in range(n_passes):
        spark.catalog.clearCache()
        for n in CONTROL_QUERIES:
            t0 = time.perf_counter()
            qs[n](spark, sf01_dir).write.mode("overwrite").format(
                "noop").save()
            samples[n].append(time.perf_counter() - t0)
    return {n: round(statistics.median(ts), 3) for n, ts in samples.items()}


def _history_entries() -> list:
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, _HISTORY_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return []


def _dispersion(series: dict) -> dict:
    """Per-query robust location/spread over historical samples:
    {name: {med, mad, n}} for every query with >= 3 recorded values."""
    out = {}
    for name, vals in series.items():
        vals = [v for v in vals if v is not None]
        if len(vals) >= 3:
            med = statistics.median(vals)
            mad = statistics.median([abs(v - med) for v in vals])
            out[name] = {"med": round(med, 3), "mad": round(mad, 3),
                         "n": len(vals)}
    return out


def _prior_dispersion(sf: float) -> dict:
    """r13 statistical-ambient policy: each query's median + MAD across
    ALL retained same-sf history entries (control-normalized values).
    Drift is then quoted as a z-score in units of that query's OWN
    historical spread — the day-long r12 record showed the three
    control ratios within one run disagreeing by 20%, so a single
    scalar ambient factor is too coarse to adjudicate 1.2-1.4x
    per-query drifts; a query whose history already swings that much
    must not flag on it."""
    entries = [e for e in _history_entries() if e.get("sf") == sf
               and (e.get("queries_normalized") or e.get("queries"))]
    names = {n for e in entries
             for n in (e.get("queries_normalized") or e["queries"])}
    return _dispersion({
        n: [(e.get("queries_normalized") or e["queries"]).get(n)
            for e in entries]
        for n in names})


def _prior_sf1_dispersion() -> dict:
    entries = [e for e in _history_entries() if e.get("sf1_queries")]
    names = {n for e in entries for n in e["sf1_queries"]}
    return _dispersion(
        {n: [e["sf1_queries"].get(n) for e in entries] for n in names})


def _z_score(now: float, d: dict | None) -> float | None:
    """(now - historical median) / sigma, sigma = 1.4826*MAD with floors
    at 7% of the median and 0.05 s — three near-identical history
    samples must not turn micro-noise into a huge z."""
    if not d:
        return None
    sigma = max(1.4826 * d["mad"], 0.07 * d["med"], 0.05)
    return round((now - d["med"]) / sigma, 2)


def _prior_sf1_medians(k: int = 3) -> dict:
    """Per-query MEDIAN of the last ``k`` clean sf1_queries (normalized)
    history entries — the round-12 baseline policy.

    The r11 policy (single freshest entry) let one super-clean run turn
    ordinary noise on the next run into a machine-"confirmed" regression
    (history: dedup_canonical 3.54 -> 11.15 -> 3.26 -> 5.59; the 3.26
    entry at ambient 0.991 made 5.59 read as 1.71x).  A median over the
    last few CLEAN entries (recorded sf1-window ambient <= 1.15 —
    values are already control-normalized, the filter only drops windows
    contended enough that normalization itself is unreliable) is robust
    to a single outlier in either direction.  Entries predating the
    ``sf1_ambient`` field fall back to their sf0.1-window
    ``ambient_factor``; if no entry passes the filter the last ``k``
    entries are used unfiltered (a noisy baseline beats none)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, _HISTORY_FILE)) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        return {}
    entries = [e for e in hist if e.get("sf1_queries")]
    clean = [e for e in entries
             if e.get("sf1_ambient", e.get("ambient_factor", 1.0)) <= 1.15]
    pool = (clean or entries)[-k:]
    out: dict = {}
    for name in {n for e in pool for n in e["sf1_queries"]}:
        vals = [e["sf1_queries"][name] for e in pool
                if e["sf1_queries"].get(name) is not None]
        if vals:
            out[name] = round(statistics.median(vals), 3)
    return out


def _scale_section(spark, qs, cold_base: dict, ambient: float = 1.0,
                   sf01_dir: str | None = None,
                   norm01: dict | None = None) -> dict | None:
    """One cold pass of SCALE_QUERIES at the generated sf1 dir; ratios
    against this run's sf0.1 COLD (pass-1) samples — the sf1 pass is
    cold, so cold-vs-cold is the like-for-like comparison (vs the warm
    3-pass median the growth of e.g. matrix_profile reads 29x when the
    cold-cold ratio is ~10x).  10x rows -> a 'linear'/'n*cand' query
    growing >>10x is a scale bug; 'quadratic' ones are expected near
    100x pair counts and carry their own scale-path note.

    Contention adjudication (r10, closing the r9 watch item): the sf0.1
    control queries are RE-TIMED inside this section's own window and
    rated against this run's control-NORMALIZED sf0.1 medians
    (``norm01``), giving an sf1-LOCAL ambient factor — the factor the
    earlier sf0.1 passes measured (``ambient``) describes a window that
    may be minutes stale by now.  Each entry records sec_normalized =
    sec / max(local ambient, 1); entries whose normalized AND raw
    values both trip the regression gate against the history's prior
    sf1_queries baseline are re-measured once warm in-section, so an
    sf1 one-shot is never recorded as a regression on a single
    contended sample (round 8: ann_cosine_topk 42.5 s vs a true
    ~24 s)."""
    if os.environ.get("SPARK_GRAFT_SCALE_SF1", "1") == "0":
        return None
    from tools.gen_scale_data import ensure_sf1

    t_gen0 = time.perf_counter()
    sf1_dir = ensure_sf1(spark)
    gen_s = round(time.perf_counter() - t_gen0, 3)
    spark.catalog.clearCache()
    # hard time budget: the section must never endanger the whole bench
    # run (a regressed quadratic query could otherwise add minutes);
    # once exceeded, remaining queries record skipped_over_budget —
    # visible truncation, not silent
    budget = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET", "240"))
    t_suite0 = time.perf_counter()
    local_ambient, control_local = ambient, None
    if sf01_dir and norm01:
        meds = _time_controls(spark, qs, sf01_dir)
        local_ambient, control_local = _ambient_factor(meds, norm01)
        print(f"[bench] sf1 local ambient: {local_ambient:.2f} "
              f"(controls {control_local})", file=sys.stderr)
    prior_sf1 = _prior_sf1_medians()
    disp_sf1 = _prior_sf1_dispersion()
    out = {}
    for name, expect in SCALE_QUERIES:
        if time.perf_counter() - t_suite0 > budget:
            out[name] = {"sec": None, "vs_sf01_cold": None,
                         "expect": expect, "skipped_over_budget": True}
            print(f"[bench] sf1 {name}: skipped (budget {budget}s)",
                  file=sys.stderr)
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf1_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        base = cold_base.get(name)
        prior = prior_sf1.get(name)
        norm = round(dt / max(local_ambient, 1.0), 3)
        out[name] = {
            "sec": dt,
            # clamp like the sf0.1 recording: divide contention out,
            # never re-inflate a clean run to a contended baseline scale
            "sec_normalized": norm,
            "vs_sf01_cold": round(dt / base, 1) if base else None,
            "expect": expect,
        }
        if prior:
            out[name]["vs_prior_sf1"] = round(norm / prior, 2)
        z1 = _z_score(norm, disp_sf1.get(name))
        if z1 is not None:
            # drift in units of this query's own sf1 historical spread
            out[name]["z_vs_history"] = z1
        print(f"[bench] sf1 {name}: {dt}s ({out[name]['vs_sf01_cold']}x"
              f"{'' if z1 is None else f', z={z1}'})",
              file=sys.stderr)
    # warm re-measure of flagged entries: same conjunction gate as the
    # sf0.1 flags (normalized AND raw vs the prior sf1 baseline)
    flagged = [n for n, v in out.items()
               if v.get("sec") is not None and prior_sf1.get(n)
               and _gate(v["sec_normalized"], prior_sf1[n])
               and _gate(v["sec"], prior_sf1[n])
               and (v.get("z_vs_history") is None
                    or v["z_vs_history"] >= 3.0)]
    if flagged and sf01_dir and norm01:
        # the local ambient above was measured BEFORE the whole sf1 query
        # pass — minutes stale by re-measure time, the exact staleness
        # this section exists to fix.  Re-time the controls in the
        # re-measure's own window and normalize the warm samples by the
        # fresher factor.
        # a SEPARATE variable: local_ambient must keep describing the
        # first window, whose factor produced every recorded
        # sec_normalized above — clobbering it would make the summary's
        # ambient_factor_local inconsistent with the values it explains
        meds = _time_controls(spark, qs, sf01_dir, n_passes=1)
        remeasure_ambient, ratios = _ambient_factor(meds, norm01)
        print(f"[bench] sf1 re-measure-window ambient: "
              f"{remeasure_ambient:.2f} (controls {ratios})", file=sys.stderr)
    else:
        remeasure_ambient = local_ambient
    for name in flagged:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf1_dir).write.mode("overwrite").format(
            "noop").save()
        warm = round(time.perf_counter() - t0, 3)
        out[name]["warm_remeasure_sec"] = warm
        out[name]["warm_remeasure_ambient"] = round(remeasure_ambient, 3)
        still = _gate(warm / max(remeasure_ambient, 1.0), prior_sf1[name])
        # r12 policy: a confirmation is only valid from a CLEAN re-measure
        # window (control ambient <= 1.1).  The r11 record "confirmed" two
        # regressions from a window at ambient 1.236 that an idle re-run
        # contradicted — a contended window can neither confirm nor fully
        # clear, so the flag is recorded as unadjudicated (None), never
        # as a confirmed regression.
        if still and remeasure_ambient > 1.1:
            out[name]["regression_confirmed"] = None
            out[name]["remeasure_window_contended"] = True
            verdict = "UNADJUDICATED (window contended)"
        else:
            out[name]["regression_confirmed"] = bool(still)
            verdict = "CONFIRMED" if still else "cleared"
        if not still:  # record the cleaner sample like the sf0.1 path
            out[name]["sec_normalized"] = min(
                out[name]["sec_normalized"],
                round(warm / max(remeasure_ambient, 1.0), 3))
        print(f"[bench] sf1 warm re-measure {name}: {warm}s -> "
              f"{verdict}", file=sys.stderr)
    recall = _ann_recall_section(spark, sf1_dir)
    fits = _fits_section(spark, sf1_dir)
    stream = _streaming_soak_section(spark, sf1_dir)
    bucketed = _bucketed_layout_section(spark, sf1_dir)
    sf5 = _sf5_linear_section(spark, qs, out)
    return {"dir": sf1_dir, "rows_ratio": 10, "gen_sec": gen_s,
            "budget_sec": budget, "ambient_factor": round(ambient, 3),
            "ambient_factor_local": round(local_ambient, 3),
            "control_ratios_local": control_local,
            "queries": out, "ann_recall": recall, "fits": fits,
            "streaming_state": stream, "bucketed_layout": bucketed,
            "sf5_linear": sf5}


def _sf5_linear_section(spark, qs, sf1_out: dict | None) -> dict | None:
    """One genuinely big linear pass (r13 directive 6): the three
    cheapest linear documents-only ops at 50x sf0.1 rows (250k docs =
    5x the sf1 documents).  All other scale evidence tops out at sf1;
    a 5x step on top of it catches an accidental O(n log n) shuffle or
    a super-linear constant the 10x sf0.1 -> sf1 step is too short to
    expose.  Expectation: sec(sf5) / sec(sf1) ~ 5 for a truly linear
    op (cold cache both sides; generous ok bar at 8x for scheduling
    noise on sub-second baselines)."""
    if os.environ.get("SPARK_GRAFT_SCALE_SF5", "1") == "0":
        return None
    from tools.gen_scale_data import ensure_sf5_documents

    t0 = time.perf_counter()
    sf5_dir = ensure_sf5_documents(spark)
    gen_s = round(time.perf_counter() - t0, 3)
    budget = float(os.environ.get("SPARK_GRAFT_SF5_BUDGET", "180"))
    t_s0 = time.perf_counter()
    out: dict = {"gen_sec": gen_s, "rows_vs_sf1": 5}
    for name in ("dedup_exact", "text_quality", "dedup_simhash"):
        if time.perf_counter() - t_s0 > budget:
            out[name] = {"sec": None, "skipped_over_budget": True}
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf5_dir).write.mode("overwrite").format(
            "noop").save()
        dt = round(time.perf_counter() - t0, 3)
        base = ((sf1_out or {}).get(name) or {}).get("sec")
        out[name] = {
            "sec": dt,
            "vs_sf1": round(dt / base, 2) if base else None,
            "linear_ok": (dt / base <= 8.0) if base else None,
        }
        print(f"[bench] sf5 {name}: {dt}s "
              f"({out[name]['vs_sf1']}x vs sf1)", file=sys.stderr)
    return out


def _shuffle_totals(spark) -> tuple[int, int]:
    """(read, write) shuffle bytes summed over every stage the status
    store retains — deltas around a query measure ITS shuffle volume.
    Reaches AppStatusStore via py4j (private[spark] compiles public)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    stages = store.stageList(
        empty,
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    tr = tw = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        tr += s.shuffleReadBytes()
        tw += s.shuffleWriteBytes()
    return int(tr), int(tw)


def _bucketed_layout_section(spark, sf1_dir: str) -> dict | None:
    """The bucketed-layout claim made MEASURABLE (not just plan-locked):
    the sf1 series table and a per-series feature table are written once
    bucketed by series_id (write_bucketed), then a repeated per-series
    equi-join + aggregate runs against both layouts with broadcast joins
    disabled (at 100 TB neither side is broadcastable — that is the
    regime bucketing exists for).  Records per-run shuffle READ bytes
    from the status store: plain parquet shuffles BOTH sides every run;
    the bucketed tables SortMergeJoin with zero Exchange, so the
    one-time bucketed write amortizes across every later join."""
    if os.environ.get("SPARK_GRAFT_SCALE_BUCKETED", "1") == "0":
        return None
    from pyspark.sql import functions as F

    from __spark_entry__ import _events_series
    from tslearn_spark.preprocessing import resample
    from tslearn_spark.sources import write_bucketed

    base = resample(_events_series(spark, sf1_dir), 16)
    vals = base.select("series_id", F.flatten("values").alias("v"))
    # stand-in per-series feature vector produced by "another pipeline"
    feats = base.select(
        "series_id", F.reverse(F.flatten("values")).alias("f"))
    out: dict = {"n_rows": vals.count(), "runs": 3}

    t0 = time.perf_counter()
    vals.write.mode("overwrite").parquet(os.path.join(sf1_dir, "lay_vals"))
    feats.write.mode("overwrite").parquet(os.path.join(sf1_dir, "lay_feats"))
    out["plain_write_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    write_bucketed(vals, "bench_bkt_vals", ["series_id"], 16,
                   path=os.path.join(sf1_dir, "bkt_vals"))
    write_bucketed(feats, "bench_bkt_feats", ["series_id"], 16,
                   path=os.path.join(sf1_dir, "bkt_feats"))
    out["bucketed_write_sec"] = round(time.perf_counter() - t0, 3)

    def workload(v, f):
        j = v.join(f, "series_id")
        return j.select(
            F.aggregate(F.zip_with("v", "f", lambda a, b: a * b),
                        F.lit(0.0), lambda s, x: s + x).alias("dot")
        ).agg(F.sum("dot").alias("s"))

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for layout in ("plain", "bucketed"):
            if layout == "plain":
                v = spark.read.parquet(os.path.join(sf1_dir, "lay_vals"))
                f = spark.read.parquet(os.path.join(sf1_dir, "lay_feats"))
            else:
                v = spark.table("bench_bkt_vals")
                f = spark.table("bench_bkt_feats")
            plan = workload(v, f)._jdf.queryExecution().executedPlan().toString()
            secs, bytes_r = [], []
            for _ in range(3):
                spark.catalog.clearCache()
                r0, _w0 = _shuffle_totals(spark)
                t0 = time.perf_counter()
                workload(v, f).first()
                secs.append(round(time.perf_counter() - t0, 3))
                r1, _w1 = _shuffle_totals(spark)
                # clamp: the status store only retains
                # spark.ui.retainedStages stages, so eviction between
                # snapshots late in a long session can shrink the total
                # below the pre-snapshot and fake a negative delta
                bytes_r.append(max(0, int(r1 - r0)))
            out[layout] = {
                "sec_median": round(statistics.median(secs), 3),
                "shuffle_read_bytes_median": int(statistics.median(bytes_r)),
                "exchange_nodes": plan.count("Exchange hashpartitioning"),
            }
            print(f"[bench] bucketed layout {layout}: {out[layout]}",
                  file=sys.stderr)
    finally:
        for k, old in saved.items():
            if old is None:
                conf.unset(k)
            else:
                conf.set(k, old)
    return out


# ANN speed/recall tradeoff at sf1 — recall@10 of the scale paths
# (hyperplane LSH grid, trained-centroid IVF) against the brute-force
# oracle, measured on a ~1k-query sample (recall is a per-query average,
# so query sampling estimates it soundly while cutting the ground-truth
# cost 20x; the CANDIDATE side is always the full corpus).  Context for
# reading the numbers: the synthetic embeddings are near-uniform, where
# top-10 neighbors are barely closer than the bulk — hyperplane LSH
# recall is intrinsically low there, while IVF's trained coarse
# quantizer still buys a real speed/recall curve.  Clustered real
# corpora sit far above these floors (tests/test_pipeline.py measures
# recall ~1.0 on clustered fixtures).
def _ann_recall_section(spark, sf1_dir: str) -> dict | None:
    if os.environ.get("SPARK_GRAFT_SCALE_RECALL", "1") == "0":
        return None
    from pyspark.sql import functions as F

    from __spark_entry__ import load_tables
    from tslearn_spark.pipeline import (
        brute_force_topk, ivf_topk, lsh_topk, train_ivf_centroids,
    )

    budget = float(os.environ.get("SPARK_GRAFT_RECALL_BUDGET", "180"))
    t_suite0 = time.perf_counter()
    k = 10
    emb = load_tables(spark, sf1_dir)["embeddings"]
    qsample = emb.where(F.col("vec_id") % 20 == 0).localCheckpoint()
    n_q = qsample.count()
    t0 = time.perf_counter()
    exact = brute_force_topk(qsample, emb, k=k).select(
        "query_id", "neighbor_id").localCheckpoint()
    total = exact.count()
    exact_sec = round(time.perf_counter() - t0, 3)
    out: dict = {"n_queries": n_q, "k": k, "exact_sec": exact_sec}

    def run(name, thunk):
        if time.perf_counter() - t_suite0 > budget:
            out[name] = {"sec": None, "recall_at_10": None,
                         "skipped_over_budget": True}
            print(f"[bench] sf1 recall {name}: skipped (budget {budget}s)",
                  file=sys.stderr)
            return
        t0 = time.perf_counter()
        approx = thunk().select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
        out[name] = {"sec": round(time.perf_counter() - t0, 3),
                     "recall_at_10": round(hits / total, 3)}
        print(f"[bench] sf1 recall {name}: {out[name]}", file=sys.stderr)

    for bits, n_tables in ((10, 8), (12, 8)):
        run(f"lsh_b{bits}_t{n_tables}",
            lambda b=bits, t=n_tables: lsh_topk(
                qsample, emb, k=k, bits=b, n_tables=t))
    t0 = time.perf_counter()
    # max_iter=5: the coarse quantizer's recall curve saturates early and
    # the bench pays the training cost every round
    cen = train_ivf_centroids(emb, n_lists=64, max_iter=5)
    out["ivf_train_sec"] = round(time.perf_counter() - t0, 3)
    for n_probe in (8, 16):
        run(f"ivf_l64_p{n_probe}",
            lambda p=n_probe: ivf_topk(
                qsample, emb, k=k, n_lists=64, n_probe=p, centroids=cen))
    qsample.unpersist()
    exact.unpersist()
    out["clustered"] = _ann_recall_clustered(spark)
    return out


# Clustered-corpus recall — the subsection a user can act on.  The
# uniform sf1 numbers above measure the intrinsic floor of hyperplane
# LSH on near-uniform synthetic embeddings (recall 0.04-0.09 with
# clustered-fixture recall ~1.0 — bench round 8); real embedding spaces
# are clustered, so the speed/recall tradeoff is measured on the
# deterministic 100k-row Gaussian-mixture corpus from
# tools/gen_scale_data.ensure_sf1_clustered, including the auto-tuned
# IVF defaults (auto_ivf_params) shipping as the no-hand-tuning path.
def _ann_recall_clustered(spark) -> dict | None:
    if os.environ.get("SPARK_GRAFT_SCALE_RECALL_CLUSTERED", "1") == "0":
        return None
    from pyspark.sql import functions as F

    from tools.gen_scale_data import N_CLUSTERED, ensure_sf1_clustered
    from tslearn_spark.pipeline import (
        auto_ivf_params, brute_force_topk, ivf_topk, lsh_topk,
        train_ivf_centroids,
    )

    budget = float(os.environ.get("SPARK_GRAFT_RECALL_CLUSTERED_BUDGET",
                                  "240"))
    t_suite0 = time.perf_counter()
    k = 10
    t0 = time.perf_counter()
    emb = spark.read.parquet(ensure_sf1_clustered(spark)).localCheckpoint()
    gen_s = round(time.perf_counter() - t0, 3)
    # 2000 queries: enough that the exact pass is scoring-bound, so the
    # speedup column reflects the scored-pair reduction rather than the
    # index's fixed assignment cost (which amortizes over queries)
    qsample = emb.where(F.col("vec_id") % 50 == 0).localCheckpoint()
    n_q = qsample.count()
    t0 = time.perf_counter()
    exact = brute_force_topk(qsample, emb, k=k).select(
        "query_id", "neighbor_id").localCheckpoint()
    total = exact.count()
    exact_sec = round(time.perf_counter() - t0, 3)
    out: dict = {"n_rows": N_CLUSTERED, "n_queries": n_q, "k": k,
                 "exact_sec": exact_sec, "gen_sec": gen_s}

    def run(name, thunk):
        if time.perf_counter() - t_suite0 > budget:
            out[name] = {"sec": None, "recall_at_10": None,
                         "skipped_over_budget": True}
            print(f"[bench] clustered recall {name}: skipped "
                  f"(budget {budget}s)", file=sys.stderr)
            return
        t0 = time.perf_counter()
        approx = thunk().select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
        out[name] = {"sec": round(time.perf_counter() - t0, 3),
                     "recall_at_10": round(hits / total, 3),
                     "speedup_vs_exact": round(
                         exact_sec / max(time.perf_counter() - t0, 1e-9), 1)}
        print(f"[bench] clustered recall {name}: {out[name]}",
              file=sys.stderr)

    # LSH grid: auto-sized bits plus one step sparser, 4/8 tables
    from tslearn_spark.pipeline import auto_lsh_bits
    ab = auto_lsh_bits(N_CLUSTERED)
    for bits, n_tables in ((ab, 4), (ab, 8), (ab - 2, 8)):
        run(f"lsh_b{bits}_t{n_tables}",
            lambda b=bits, t=n_tables: lsh_topk(
                qsample, emb, k=k, bits=b, n_tables=t))
    # multi-probe (r10): the no-trained-quantizer scale path — recall
    # from probing nearest bit-flip buckets instead of replicating the
    # index across more tables; sparser index (higher bits) + probes
    for bits, n_tables, n_probes in ((ab, 4, 8), (ab + 2, 4, 16)):
        run(f"lsh_b{bits}_t{n_tables}_p{n_probes}",
            lambda b=bits, t=n_tables, p=n_probes: lsh_topk(
                qsample, emb, k=k, bits=b, n_tables=t, n_probes=p))
    # IVF with the shipped auto defaults (trained quantizer) + probe sweep
    n_lists, n_probe = auto_ivf_params(N_CLUSTERED)
    out["auto_params"] = {"n_lists": n_lists, "n_probe": n_probe}
    t0 = time.perf_counter()
    cen = train_ivf_centroids(emb, n_lists=n_lists, max_iter=5)
    out["ivf_train_sec"] = round(time.perf_counter() - t0, 3)
    # r14 (VERDICT r13 directive 4): the build-cost contract behind
    # "IVF is the batch default" — train the SAME index shape (the full
    # corpus's auto n_lists, same max_iter) on a 1-in-5 row sample, so
    # the 20k -> 100k pair isolates corpus size.  MLlib Lloyd is
    # O(n x k x iters): slope_vs_linear ~ 1 is the contract; >> 1 would
    # mean build cost super-linear in corpus and the r13 sf5 board's
    # 79.9 s ann_ivf entry could not be amortized away by probe reuse.
    t0 = time.perf_counter()
    train_ivf_centroids(emb.where(F.col("vec_id") % 5 == 0),
                        n_lists=n_lists, max_iter=5)
    sec_small = round(time.perf_counter() - t0, 3)
    out["ivf_build_scaling"] = {
        "n_small": N_CLUSTERED // 5, "sec_small": sec_small,
        "n_full": N_CLUSTERED, "sec_full": out["ivf_train_sec"],
        "slope_vs_linear": round(
            (out["ivf_train_sec"] / max(sec_small, 1e-9)) / 5.0, 2),
    }
    print(f"[bench] ivf build scaling: {out['ivf_build_scaling']}",
          file=sys.stderr)
    for p in (max(n_probe // 2, 1), n_probe, n_probe * 2):
        run(f"ivf_l{n_lists}_p{p}",
            lambda pp=p: ivf_topk(qsample, emb, k=k, n_lists=n_lists,
                                  n_probe=pp, centroids=cen))
    qsample.unpersist()
    exact.unpersist()
    emb.unpersist()
    return out


# Iterative-estimator fits at sf1 — the surface the one-shot scale
# queries never touch: convergence loops are where lineage growth,
# empty-cluster retries, and per-iteration shuffle cost live.  Each fit
# records total seconds, iteration count, per-iteration wall times, and
# a tail ratio (last iter / median iter) — creep across iterations
# (a growing plan/lineage) shows up as a rising tail, not in totals.
# Quadratic-by-design fits (the kernel-kmeans Gram, the early
# classifier's all-pairs prefix join) run on a fixed-size sample so
# the section stays inside its budget; their per-iteration loops are
# measured at full fidelity (the Gram is localCheckpoint'd once, so
# iteration cost is edges-bound either way).
def _fits_section(spark, sf1_dir: str) -> dict | None:
    if os.environ.get("SPARK_GRAFT_SCALE_FITS", "1") == "0":
        return None
    from pyspark.sql import functions as F

    from __spark_entry__ import _events_series
    from tslearn_spark.clustering import KernelKMeans, KShape, TimeSeriesKMeans
    from tslearn_spark.early_classification import NonMyopicEarlyClassifier
    from tslearn_spark.preprocessing import resample, transform_mean_variance

    budget = float(os.environ.get("SPARK_GRAFT_FITS_BUDGET", "360"))
    t_suite0 = time.perf_counter()
    base = _events_series(spark, sf1_dir)
    ts16 = transform_mean_variance(resample(base, 16)).localCheckpoint()
    ts32 = resample(base.where(F.size("values") >= 2), 32).localCheckpoint()
    # quadratic-by-design fits get a FIXED-size sample (~300 series):
    # their scale story is per-iteration flatness over the checkpointed
    # edge set, not Gram growth — a proportional sample would square the
    # Gram into the whole budget
    n_series = ts16.count()
    mod = max(1, round(n_series / 300))
    capped = ts16.where(F.col("series_id") % mod == 0).localCheckpoint()

    def _labels_count(est):
        lab = getattr(est, "labels_", None)
        if lab is None or not hasattr(lab, "select"):
            return None
        return lab.select("cluster").distinct().count()

    out: dict = {}

    def run(name, thunk, note):
        if time.perf_counter() - t_suite0 > budget:
            out[name] = {"sec": None, "skipped_over_budget": True, "note": note}
            print(f"[bench] sf1 fit {name}: skipped (budget {budget}s)",
                  file=sys.stderr)
            return None
        t0 = time.perf_counter()
        est = thunk()
        n_found = _labels_count(est)
        dt = round(time.perf_counter() - t0, 3)
        iters = [round(x, 3) for x in getattr(est, "_iter_seconds_", [])]
        med = statistics.median(iters) if iters else None
        out[name] = {
            "sec": dt,
            "n_iter": int(getattr(est, "n_iter_", len(iters)) or len(iters)),
            "iter_secs": iters,
            # lineage creep shows as a RISING tail (last iter vs median);
            # the first iteration legitimately carries UDF-worker warmup
            "iter_tail_ratio": round(iters[-1] / med, 2) if med else None,
            "clusters_found": n_found,
            "note": note,
        }
        print(f"[bench] sf1 fit {name}: {dt}s iters={iters}", file=sys.stderr)
        return est

    def _rand_index_dfs(lab_a, lab_b) -> float | None:
        """Pairwise co-membership agreement (Rand index) of two labels_
        DataFrames — O(n + k^2) via contingency pair counting, NOT the
        O(n^2) triu materialization (15000 sf1 series would allocate
        ~2.5 GB of index/bool arrays on the driver)."""
        import numpy as np

        la = {r["series_id"]: r["cluster"] for r in lab_a.collect()}
        lb = {r["series_id"]: r["cluster"] for r in lab_b.collect()}
        ids = sorted(set(la) & set(lb))
        n = len(ids)
        if n < 2:
            return None
        _, ai = np.unique([la[i] for i in ids], return_inverse=True)
        _, bi = np.unique([lb[i] for i in ids], return_inverse=True)

        def c2(x):
            return x * (x - 1) / 2.0

        nij = np.bincount(ai * (bi.max() + 1) + bi)
        total = c2(float(n))
        agree = (total + 2.0 * c2(nij.astype(float)).sum()
                 - c2(np.bincount(ai).astype(float)).sum()
                 - c2(np.bincount(bi).astype(float)).sum())
        return float(agree / total)

    def _quality_cols(name, est, refit):
        """r12: fit-quality columns next to the seconds — a perf round
        must not be able to degrade fit quality silently.  Records the
        criterion value (inertia) and label stability (Rand index of
        the recorded fit vs an independent second-seed fit)."""
        if est is None or time.perf_counter() - t_suite0 > budget:
            return
        out[name]["inertia"] = round(float(est.inertia_), 6)
        t0 = time.perf_counter()
        est2 = refit()
        out[name]["seed1_inertia"] = round(float(est2.inertia_), 6)
        ri = _rand_index_dfs(est.labels_, est2.labels_)
        out[name]["label_stability_rand_2seeds"] = \
            round(ri, 4) if ri is not None else None
        out[name]["stability_refit_sec"] = round(
            time.perf_counter() - t0, 3)
        print(f"[bench] sf1 fit {name} quality: inertia="
              f"{out[name]['inertia']} seed1={out[name]['seed1_inertia']} "
              f"rand={out[name]['label_stability_rand_2seeds']}",
              file=sys.stderr)

    km = run("kmeans_dtw",
        lambda: TimeSeriesKMeans(
            n_clusters=3, metric="dtw", max_iter=3, max_iter_barycenter=3,
            n_init=1, random_state=0).fit(ts16),
        "full sf1 input; DTW assign + DBA update per iteration")
    _quality_cols("kmeans_dtw", km,
                  lambda: TimeSeriesKMeans(
                      n_clusters=3, metric="dtw", max_iter=3,
                      max_iter_barycenter=3, n_init=1,
                      random_state=1).fit(ts16))
    ks = run("kshape",
        lambda: KShape(n_clusters=3, max_iter=3, random_state=0).fit(ts32),
        "full sf1 input; map-side sufficient stats per iteration")
    _quality_cols("kshape", ks,
                  lambda: KShape(n_clusters=3, max_iter=3,
                                 random_state=1).fit(ts32))
    kk_exact = run("kernel_kmeans",
        lambda: KernelKMeans(
            n_clusters=3, kernel="gak", max_iter=5, random_state=0,
            kernel_params={"sigma": 2.0}).fit(capped),
        "fixed ~300-series sample (exact Gram is quadratic by design); "
        "iterations aggregate the checkpointed Gram edges")
    kk_ny = run("kernel_kmeans_nystroem",
        lambda: KernelKMeans(
            n_clusters=3, kernel="gak", max_iter=5, random_state=0,
            kernel_params={"sigma": 2.0}, n_landmarks=128).fit(ts16),
        "FULL sf1 input (r10 scale path): 128-landmark Nystroem Gram — "
        "n x m kernel edges + map-only Lloyd on the phi features, "
        "linear in n (m sweep: 64/128/256 -> fro 0.46/0.36/0.26 at "
        "10/9/18 s; the z-normed GAK Gram is near-diagonal, so the "
        "residual is spectral, not a bug)")
    if kk_exact is not None and kk_ny is not None:
        import numpy as np

        # approximation error vs the exact fit: pairwise co-membership
        # agreement (Rand index) on the exact run's 300-series sample —
        # inertias are not comparable (the Nystroem criterion is the
        # approximate kernel's), partitions are
        el = {r["series_id"]: r["cluster"]
              for r in kk_exact.labels_.collect()}
        ids = sorted(el)
        rand = _rand_index_dfs(kk_exact.labels_, kk_ny.labels_)
        out["kernel_kmeans_nystroem"]["rand_index_vs_exact_sample"] = \
            round(rand, 4) if rand is not None else None
        # pure approximation error, decoupled from local-optimum drift:
        # relative Frobenius error of the Nystroem Gram phi phi^T vs the
        # exact Gram on the 300-series sample (the exact fit already
        # materialized its edges)
        pos = {i: p for p, i in enumerate(ids)}
        Kx = np.zeros((len(ids), len(ids)))
        for r in kk_exact._gram.collect():
            if r["id1"] in pos and r["id2"] in pos:
                Kx[pos[r["id1"]], pos[r["id2"]]] = r["dist"]
        phi_rows = {
            r["series_id"]: np.asarray(r["phi"])
            for r in kk_ny._phi_features(capped, kk_ny._kp_fit_).collect()
        }
        Phi = np.stack([phi_rows[i] for i in ids])
        fro = float(np.linalg.norm(Phi @ Phi.T - Kx)
                    / max(np.linalg.norm(Kx), 1e-300))
        out["kernel_kmeans_nystroem"]["gram_rel_frobenius_err"] = \
            round(fro, 4)
        print(f"[bench] sf1 fit kernel_kmeans_nystroem rand-vs-exact: "
              f"{'n/a' if rand is None else format(rand, '.4f')} "
              f"gram-err: {fro:.4f}", file=sys.stderr)
    def _early():
        lab = ts16.withColumn(
            "label", (F.col("series_id") % 3).cast("string"))
        return NonMyopicEarlyClassifier(
            n_clusters=3, random_state=0).fit(lab)
    run("early_classifier", _early,
        "FULL sf1 input (round-9): the prefix-confusion pass is now a "
        "map-only plan — broadcast classifier half, vectorized per-"
        "partition cumsum+argmin, tiny partial-count shuffle — instead "
        "of the posexplode+window pair join that forced a ~300-series "
        "cap")
    # r11: silhouette at sf1 via the sample_size="auto" scale path —
    # the O(n^2) score runs on the seeded ~2000-series hash sample
    # instead of the full 15k x 15k edge set (225M pairs)
    if time.perf_counter() - t_suite0 <= budget:
        from tslearn_spark.clustering import (_SILHOUETTE_AUTO_CEIL,
                                              silhouette_score)
        sil_lab = ts16.select(
            "series_id",
            (F.col("series_id") % 3).cast("int").alias("cluster"))
        t0 = time.perf_counter()
        sil = silhouette_score(ts16, sil_lab, metric="euclidean",
                               sample_size="auto", random_state=0)
        out["silhouette_auto"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "score": round(float(sil), 6),
            "n_input": n_series,
            "n_scored": min(n_series, _SILHOUETTE_AUTO_CEIL),
            "note": "sample_size='auto' seeded hash-order cap — the "
                    "silhouette scale path (full-input silhouette is "
                    "O(n^2) by definition)",
        }
        print(f"[bench] sf1 fit silhouette_auto: "
              f"{out['silhouette_auto']}", file=sys.stderr)
    # SVC scale path (r10): landmark GAK features -> MLlib LinearSVC on
    # the FULL sf1 train split vs exact SMO on the documented ~300-series
    # ceiling sample; both evaluated on the same held-out 20%.  The label
    # is learnable from the series (sign of the first-half mean of the
    # z-normed values), so accuracy is meaningful, not a coin flip.
    svc_lab = ts16.withColumn(
        "label",
        (F.expr("aggregate(slice(flatten(values), 1, 8), 0.0D, "
                "(s, v) -> s + v)") > 0).cast("string"))
    svc_train = svc_lab.where(F.col("series_id") % 5 != 0).localCheckpoint()
    svc_test = svc_lab.where(F.col("series_id") % 5 == 0).localCheckpoint()
    from tslearn_spark.svm import TimeSeriesSVC
    svc_lm = run("svc_landmark",
        lambda: TimeSeriesSVC(kernel="gak", random_state=0,
                              n_landmarks=64).fit(svc_train),
        "FULL sf1 train split (r10 scale path): 64 landmark GAK "
        "features + distributed LinearSVC — no n^2 Gram, no driver SMO")
    if svc_lm is not None:
        # hash-sampled (NOT series_id % m: train already excludes the
        # % 5 == 0 test ids, and a multiple-of-5 modulus intersects to
        # the empty set)
        mod_svc = max(1, round(svc_train.count() / 300))
        svc_exact = TimeSeriesSVC(kernel="gak", random_state=0).fit(
            svc_train.where(
                F.pmod(F.xxhash64("series_id"), F.lit(mod_svc)) == 0))
        truth = {r["series_id"]: r["label"]
                 for r in svc_test.select("series_id", "label").collect()}
        pl = {r["series_id"]: r["prediction"]
              for r in svc_lm.predict(svc_test).collect()}
        pe = {r["series_id"]: r["prediction"]
              for r in svc_exact.predict(svc_test).collect()}
        n_t = len(truth)
        out["svc_landmark"]["n_train_full"] = svc_train.count()
        out["svc_landmark"]["acc_landmark_full"] = round(
            sum(pl[i] == truth[i] for i in truth) / n_t, 4)
        out["svc_landmark"]["acc_exact_300sample"] = round(
            sum(pe[i] == truth[i] for i in truth) / n_t, 4)
        out["svc_landmark"]["pred_agreement"] = round(
            sum(pl[i] == pe[i] for i in truth) / n_t, 4)
        print(f"[bench] sf1 fit svc_landmark acc full/exact300/agree: "
              f"{out['svc_landmark']['acc_landmark_full']}/"
              f"{out['svc_landmark']['acc_exact_300sample']}/"
              f"{out['svc_landmark']['pred_agreement']}", file=sys.stderr)
    svc_train.unpersist()
    svc_test.unpersist()
    # r13 directive 4: kshape seed instability (r12 two-seed Rand 0.565)
    # — sweep n_init best-of-inertia restarts (the reference's own
    # mitigation, clustering/kshape.py n_init) and record whether
    # restarts buy label stability.  Runs LAST on its own small budget
    # so it can never starve the standing fit entries above.
    if "kshape" in out and out["kshape"].get("sec") is not None:
        sweep_budget = float(os.environ.get(
            "SPARK_GRAFT_KSHAPE_SWEEP_BUDGET", "240"))
        t_sw0 = time.perf_counter()
        sweep = {}
        for ni in (2, 5):
            if time.perf_counter() - t_sw0 > sweep_budget:
                sweep[f"n_init_{ni}"] = {"skipped_over_budget": True}
                continue
            t0 = time.perf_counter()
            a = KShape(n_clusters=3, max_iter=3, n_init=ni,
                       random_state=0).fit(ts32)
            b = KShape(n_clusters=3, max_iter=3, n_init=ni,
                       random_state=1).fit(ts32)
            ri = _rand_index_dfs(a.labels_, b.labels_)
            sweep[f"n_init_{ni}"] = {
                "sec_2fits": round(time.perf_counter() - t0, 3),
                "inertia_seed0": round(float(a.inertia_), 6),
                "inertia_seed1": round(float(b.inertia_), 6),
                "label_stability_rand_2seeds":
                    round(ri, 4) if ri is not None else None,
            }
            print(f"[bench] sf1 fit kshape n_init={ni}: "
                  f"{sweep[f'n_init_{ni}']}", file=sys.stderr)
        out["kshape"]["n_init_sweep"] = sweep
    for df in (ts16, ts32, capped):
        df.unpersist()
    return {"budget_sec": budget, "fits": out}


# Streaming state-size soak at sf1 — the 100-TB streaming concern the
# micro watermark tests cannot measure: does the state store PLATEAU
# over a sustained multi-batch run, or creep?  The sf1 events (~1M rows)
# and documents stream through ~20 availableNow micro-batches
# (maxFilesPerTrigger=1 over 20 parquet files); per-batch
# stateOperators.numRowsTotal is recorded from recentProgress.
#   * stream_running_zscore: state = one Welford row per user key, so
#     the curve must flatten at the distinct-key population ("flat"
#     asserts the last batches add no state).
#   * stream_exact_dedup (ttl on): state = one row per distinct content
#     hash with idle-TTL eviction, so the curve stays bounded below the
#     distinct-hash total instead of growing with every batch.
def _streaming_soak_section(spark, sf1_dir: str) -> dict | None:
    if os.environ.get("SPARK_GRAFT_SCALE_STREAM", "1") == "0":
        return None
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from __spark_entry__ import load_tables
    from tslearn_spark.streaming import (
        stream_exact_dedup, stream_lsh_candidates, stream_running_zscore,
        stream_session_stats,
    )

    # r11: two more soaks (matrix_profile, ann_lsh_multiprobe) + the
    # clustered recall measurement joined the section — 300 s was
    # measured flush against the six-soak total.  r14: +150 s headroom
    # for the 50k-vector soak + recall (directive 6).
    budget = float(os.environ.get("SPARK_GRAFT_STREAM_BUDGET", "600"))
    t_suite0 = time.perf_counter()
    t = load_tables(spark, sf1_dir)
    work = tempfile.mkdtemp(prefix="stream_soak_")
    out: dict = {"n_batches_target": 20}

    def soak(name, src_df, cols, op, distinct_expr, by_range=None,
             bound_frac=None):
        if time.perf_counter() - t_suite0 > budget:
            out[name] = {"skipped_over_budget": True}
            return
        src = os.path.join(work, name, "src")
        ckpt = os.path.join(work, name, "ckpt")
        os.makedirs(src, exist_ok=True)
        part = (src_df.select(*cols).repartitionByRange(20, by_range)
                if by_range is not None
                else src_df.select(*cols).repartition(20))
        part.write.mode("overwrite").parquet(src)
        schema = src_df.select(*cols).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        t0 = time.perf_counter()
        q = (op(stream).writeStream.format("noop")
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        # a stateful op with ProcessingTimeTimeout keeps an availableNow
        # query alive firing empty batches until every registered
        # timeout has expired — stop explicitly once the DATA batches
        # are done (3 consecutive empty-input batches) or budget is hit
        seen_empty = 0
        while q.isActive and seen_empty < 3 and \
                time.perf_counter() - t_suite0 < budget:
            time.sleep(1.0)
            prog = q.recentProgress
            if prog and prog[-1]["numInputRows"] == 0:
                seen_empty += 1
            elif prog:
                seen_empty = 0
        if q.isActive:
            q.stop()
            q.awaitTermination(30)
        curve = [p["stateOperators"][0]["numRowsTotal"]
                 for p in q.recentProgress
                 if p.get("numInputRows", 0) > 0
                 and p.get("stateOperators") and p["stateOperators"]]
        dt = round(time.perf_counter() - t0, 3)
        n_distinct = src_df.select(distinct_expr).distinct().count()
        tail = curve[-5:]
        if bound_frac is not None:
            # TTL-evicting / session state OSCILLATES with batch timing
            # (an eviction dip followed by recovery reads as "tail
            # growth" to a flat-tail test while the level is plainly
            # bounded) — the designed property is that state never
            # approaches the unbounded axis (the cumulative key
            # population), so test the curve MAX against that
            ok = bool(curve and max(curve) <= bound_frac * max(n_distinct, 1))
        else:
            # grow-to-population state (one row per live key): the tail
            # must be flat — the last 5 batches add (nearly) no state
            ok = bool(len(tail) >= 2
                      and tail[-1] - tail[0] <=
                      max(0.01 * max(tail[-1], 1), 2))
        out[name] = {
            "sec": dt,
            "n_batches": len(curve),
            "state_rows_curve": curve,
            "n_distinct_keys": n_distinct,
            "tail_growth_rows": (tail[-1] - tail[0]) if len(tail) >= 2
            else None,
            "bound_frac": bound_frac,
            "plateaued": ok,
            "final_vs_distinct": round(curve[-1] / max(n_distinct, 1), 3)
            if curve else None,
        }
        print(f"[bench] stream soak {name}: {out[name]['sec']}s "
              f"batches={out[name]['n_batches']} curve={curve}",
              file=sys.stderr)

    soak("running_zscore",
         t["events"], ["user_id", "ts", "value"],
         lambda s: stream_running_zscore(s),
         F.col("user_id"))
    # ttl ~ 4-5 batch durations: state holds the trailing batches' hashes
    # and evicts older ones mid-run, so the curve rises then caps well
    # below the distinct-hash total (a ttl shorter than one batch would
    # trivially evict everything; no ttl would grow without bound)
    soak("exact_dedup_ttl",
         t["documents"], ["doc_id", "text"],
         lambda s: stream_exact_dedup(s, ttl_ms=10_000),
         F.md5(F.lower(F.trim(F.col("text")))), bound_frac=0.6)
    # r10: the two remaining stateful ops, whose keys grow differently
    # from per-series/per-hash keys.
    #   * lsh_candidates_ttl: state = (band, band-signature) BUCKETS,
    #     each capped at bucket_cap ids; distinct is counted per DOC, so
    #     final_vs_distinct reads as buckets-per-distinct-doc (bounded
    #     by bands=8; TTL eviction keeps it below that)
    soak("lsh_candidates_ttl",
         t["documents"], ["doc_id", "text"],
         lambda s: stream_lsh_candidates(s, ttl_ms=10_000),
         F.md5(F.lower(F.trim(F.col("text")))), bound_frac=0.6)
    #   * session_stats: state = OPEN session windows per user; the
    #     source is range-partitioned on ts so batches arrive in rough
    #     time order and the watermark closes sessions as it advances —
    #     the curve must plateau at the concurrently-open population,
    #     far below users x sessions (distinct counts users)
    soak("session_stats",
         t["events"].select(
             "user_id",
             # withWatermark requires TIMESTAMP; the loaded events carry
             # TIMESTAMP_NTZ (nanos conversion)
             F.col("ts").cast("timestamp").alias("ts"),
             "value"),
         ["user_id", "ts", "value"],
         lambda s: stream_session_stats(s),
         # open-session state bursts to ~3 concurrently-open windows per
         # user inside the watermark lag, then collapses — bound the
         # BURST, the quantity that would grow if sessions never closed
         F.col("user_id"), by_range=F.col("ts"), bound_frac=5.0)
    # r11: the last stateful op without a soak curve — per-key state is
    # ONE row holding the bounded trailing buffer (horizon + m - 1
    # values), so the curve must plateau at the sampled key population
    from tslearn_spark.streaming import stream_matrix_profile
    soak("matrix_profile",
         t["events"].where(F.col("user_id") % 5 == 0)
         .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                 "value"),
         ["user_id", "ts", "value"],
         lambda s: stream_matrix_profile(s, subsequence_length=8,
                                         horizon=64),
         F.col("user_id"), by_range=F.col("ts"))
    # r11: streaming hyperplane-LSH ANN candidates with multi-probe —
    # state rows are (table, bucket) BUCKETS, hard-capped at
    # n_tables x 2^bits by construction (probes never insert), so the
    # bound is absolute, not population-relative
    from tslearn_spark.pipeline.simsearch import auto_lsh_bits
    from tslearn_spark.streaming import stream_ann_lsh_candidates
    emb = t["embeddings"]
    n_emb = emb.count()
    dim_emb = len(emb.select("embedding").first()["embedding"])
    bits_emb = auto_lsh_bits(n_emb)
    # r13: soak at the op's DEFAULT parameters (n_tables=4,
    # n_probes="auto" ~ 8*bits/3 — the measured high-recall recipe);
    # the absolute state bound is n_tables x 2^bits buckets either way
    soak("ann_lsh_multiprobe_ttl",
         emb, ["vec_id", "embedding"],
         lambda s: stream_ann_lsh_candidates(
             s, dim=dim_emb, bits=bits_emb, ttl_ms=10_000),
         F.col("vec_id"),
         bound_frac=min(1.0, 4.0 * (1 << bits_emb) / max(n_emb, 1)))
    # r14 (VERDICT r13 directive 6): the same soak at sf5-scale stream
    # length — 50k clustered vectors (2.5x the sf1 embeddings, 10x the
    # r12 recall sweep's sample) at the op's SIGNATURE recipe
    # (bits = auto_lsh_bits(n)+2, t4, p=auto).  The state bound is
    # n_tables x 2^bits BUCKETS regardless of corpus size (probes never
    # insert; bucket rows cap at bucket_cap ids), so the curve must
    # stay under the bucket-count axis while the streamed population
    # grows past it — the corpus-size-independence claim, measured.
    from tools.gen_scale_data import ensure_sf1_clustered
    clus = spark.read.parquet(ensure_sf1_clustered(spark)).where(
        F.col("vec_id") % 2 == 0)
    n_clus = clus.count()
    dim_clus = len(clus.select("embedding").first()["embedding"])
    bits_clus = auto_lsh_bits(n_clus) + 2
    soak("ann_lsh_multiprobe_ttl_50k",
         clus, ["vec_id", "embedding"],
         lambda s: stream_ann_lsh_candidates(
             s, dim=dim_clus, bits=bits_clus, ttl_ms=10_000),
         F.col("vec_id"),
         bound_frac=min(1.0, 4.0 * (1 << bits_clus) / max(n_clus, 1)))
    out["stream_ann_recall"] = _stream_ann_recall(spark)
    shutil.rmtree(work, ignore_errors=True)
    return {"budget_sec": budget, "ops": out}


def _stream_ann_recall(spark) -> dict:
    """Candidate recall of the streaming LSH contract on the CLUSTERED
    corpus (the actionable number — on the near-uniform sf1 embeddings
    hyperplane LSH sits at its documented recall floor: measured
    0.031/0.176 single/multi there): fraction of brute-force
    earlier-neighbor top-10 pairs covered by the operator's candidates
    (batch twin — identical contract to the stream, unit-locked),
    single-probe vs multi-probe at the SAME stored index (probes never
    insert, so state is byte-identical)."""
    from pyspark.sql import functions as F

    from tools.gen_scale_data import ensure_sf1_clustered
    from tslearn_spark.pipeline import brute_force_topk
    from tslearn_spark.pipeline.simsearch import auto_lsh_bits
    from tslearn_spark.streaming import stream_ann_lsh_candidates

    import time as _t
    emb = spark.read.parquet(ensure_sf1_clustered(spark))
    sample = emb.where(F.col("vec_id") % 20 == 0).localCheckpoint()
    n = sample.count()
    dim = len(sample.select("embedding").first()["embedding"])
    bits = auto_lsh_bits(n)
    exact = {
        (r["neighbor_id"], r["query_id"])
        for r in brute_force_topk(sample, sample, k=10).collect()
        if r["neighbor_id"] < r["query_id"]
    }
    out = {"n_vectors": n, "bits": bits, "n_true_pairs": len(exact)}
    # r12 sweep: the r11 record stopped at 0.714 (b=auto, t=2, p=8);
    # batch multi-probe reaches 0.997 with more tables x probes, and the
    # state stays hard-bounded at n_tables x 2^bits buckets either way
    # (probes never insert) — so richer configs cost probe-time, not
    # state.  Each row records the recall/state tradeoff; the two r11
    # configs stay first for round-over-round continuity.  r13: the
    # last row IS the op's signature default (n_tables=4,
    # n_probes=auto_lsh_probes) at bits+2 — the promoted recipe.
    from tslearn_spark.pipeline.simsearch import auto_lsh_probes
    p_def = auto_lsh_probes(bits + 2)
    out["default_config"] = f"b{bits + 2}_t4_p{p_def}"
    for b, t_tables, probes, cap in (
            (bits, 2, 1, 64), (bits, 2, 8, 64),
            (bits, 4, 16, 64), (bits + 2, 4, p_def, 64)):
        t0 = _t.perf_counter()
        got = {(r["id1"], r["id2"])
               for r in stream_ann_lsh_candidates(
                   sample, dim=dim, bits=b, n_tables=t_tables,
                   n_probes=probes, bucket_cap=cap).collect()}
        out[f"b{b}_t{t_tables}_p{probes}"] = {
            "sec": round(_t.perf_counter() - t0, 3),
            "candidate_pairs": len(got),
            "state_rows_bound": t_tables * (1 << b),
            "recall_of_top10": round(
                len(exact & got) / max(len(exact), 1), 3),
        }
    print(f"[bench] stream ann recall (clustered): {out}", file=sys.stderr)
    sample.unpersist()
    # r14 (VERDICT r13 directive 6): the identical contract at
    # sf5-scale corpus volume — 50k clustered vectors, 10x the sweep
    # sample — at the signature recipe (auto_lsh_bits(n)+2, t4,
    # p=auto).  Ground truth stays exact but query-sampled: brute-force
    # top-10 for 1-in-100 query ids against the FULL 50k corpus (recall
    # is a per-query average, so a 500-query sample estimates it
    # unbiased at 1/100 the quadratic cost); the candidate set is
    # filtered to the sampled query side BEFORE collect so the driver
    # never holds the full pair stream.
    big = emb.where(F.col("vec_id") % 2 == 0).localCheckpoint()
    n_big = big.count()
    bits_big = auto_lsh_bits(n_big) + 2
    p_big = auto_lsh_probes(bits_big)
    qmod = 100
    t0 = _t.perf_counter()
    exact_big = {
        (r["neighbor_id"], r["query_id"])
        for r in brute_force_topk(
            big.where(F.col("vec_id") % qmod == 0), big, k=10).collect()
        if r["neighbor_id"] < r["query_id"]
    }
    exact_sec = round(_t.perf_counter() - t0, 3)
    t0 = _t.perf_counter()
    got_big = {
        (r["id1"], r["id2"])
        for r in stream_ann_lsh_candidates(
            big, dim=dim, bits=bits_big, n_tables=4,
            n_probes=p_big, bucket_cap=64)
        .where(F.col("id2") % qmod == 0).collect()
    }
    out["at_50k"] = {
        "n_vectors": n_big,
        "config": f"b{bits_big}_t4_p{p_big}",
        "n_query_sample": n_big // qmod,
        "n_true_pairs": len(exact_big),
        "exact_sec": exact_sec,
        "sec": round(_t.perf_counter() - t0, 3),
        "state_rows_bound": 4 * (1 << bits_big),
        "recall_of_top10": round(
            len(exact_big & got_big) / max(len(exact_big), 1), 3),
    }
    print(f"[bench] stream ann recall at_50k: {out['at_50k']}",
          file=sys.stderr)
    big.unpersist()
    return out


_HISTORY_FILE = ".bench_history.json"  # gitignored self-record

# Ambient-load controls: pure Spark SQL queries untouched since round 4
# whose plans never change round-over-round — their ratio vs the prior
# recorded run measures co-tenant contention, not code.  Round 8 recorded
# a uniform 1.24-1.48x inflation across these exact queries with ZERO
# code change (co-tenant load 4-6 during the driver's bench window); a
# raw-median comparison cannot distinguish that from a regression.
CONTROL_QUERIES = ("nation_order_rollup", "part_brand_stats",
                   "orders_priority_dist")

# Benched queries whose timed plan contains a Python-worker stage
# (ArrowEvalPython / MapInPandas / PythonMapInArrow in the committed
# plans/rNN/<q>_after.txt captures — mechanically derived, r15).  The
# r14 verdict showed contention on this box slows python-worker stages
# MORE than the uniform SQL factor (8-core runs BEAT 32-core on these
# at sf0.1), so a single scalar ambient under-corrects them; the
# per-class ratio split below lets a judge adjudicate cross-window
# round-over-round deltas per class instead of with one scalar.
PY_WORKER_BENCH = frozenset({
    "ann_cosine_topk", "ann_ivf_topk", "cdist_dtw_tiny",
    "dedup_embedding_cosine", "kernel_kmeans_assign_tiny",
    "knn_dtw_classify", "knn_dtw_classify_full", "knn_euclidean_16",
    "matrix_profile_events", "multimodal_features",
    "multimodal_video_metadata", "shapelet_score_fixed",
})


def _class_ambient(timings: dict, prior: dict) -> dict:
    """Median now/prior ratio per query class (sql-only vs python-worker)
    over ALL benched queries with a prior — a coarser but class-aware
    companion to the 3-query control ambient.  Diagnostic only: the
    normalization applied to history stays the control-based scalar."""
    out = {}
    for cls, names in (
        ("sql", [n for n in timings if n not in PY_WORKER_BENCH]),
        ("py", [n for n in timings if n in PY_WORKER_BENCH]),
    ):
        ratios = [timings[n] / prior[n] for n in names
                  if timings.get(n) and prior.get(n)]
        out[cls] = round(statistics.median(ratios), 3) if ratios else None
    return out


def _ambient_factor(timings: dict, prior: dict) -> tuple[float, list]:
    """Median control-query ratio vs the prior baseline, clamped to
    [0.5, 4] (outside that the controls themselves changed — fall back
    toward raw comparison rather than over-normalize)."""
    ratios = [timings[c] / prior[c] for c in CONTROL_QUERIES
              if timings.get(c) and prior.get(c)]
    if not ratios:
        return 1.0, []
    f = statistics.median(ratios)
    return min(max(f, 0.5), 4.0), [round(r, 2) for r in sorted(ratios)]


def _prior_medians(sf: float) -> tuple[dict, str | None]:
    """Freshest prior medians AT THE SAME SF for round-over-round
    regression flags (cross-sf ratios are meaningless).

    Prefers the self-recorded history (bench.py appends every run,
    including the driver's own, so it is always at least as fresh) and
    falls back to the driver's BENCH_r*.json — whose "parsed" field the
    driver sometimes truncates to null, which used to silently disable
    the check.  History entries carry control-NORMALIZED medians when
    present (ambient load divided out), so a contended run does not
    poison the baseline the next run compares against."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, _HISTORY_FILE)) as f:
            hist = json.load(f)
        # r12 policy (same as _prior_sf1_medians): per-query median over
        # the last 3 CLEAN same-sf entries, not the single freshest one —
        # one super-clean entry must not turn the next run's ordinary
        # noise into a "regression"
        entries = [e for e in hist if e.get("sf") == sf
                   and (e.get("queries_normalized") or e.get("queries"))]
        clean = [e for e in entries if e.get("ambient_factor", 1.0) <= 1.15]
        pool = (clean or entries)[-3:]
        if pool:
            med: dict = {}
            for name in {n for e in pool
                         for n in (e.get("queries_normalized")
                                   or e["queries"])}:
                vals = [(e.get("queries_normalized") or e["queries"]).get(name)
                        for e in pool]
                vals = [v for v in vals if v is not None]
                if vals:
                    med[name] = round(statistics.median(vals), 3)
            return med, _HISTORY_FILE
    except (OSError, ValueError):
        pass
    best = (-1, None, {})
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m or int(m.group(1)) <= best[0]:
            continue
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if "queries" not in data:  # driver format wraps under "parsed"
            data = data.get("parsed", {}) or {}
        if data.get("sf") == sf:
            best = (int(m.group(1)), os.path.basename(p),
                    data.get("queries", {}) or {})
    return best[2], best[1]


def _record_history(sf: float, timings: dict, normalized: dict | None = None,
                    ambient: float | None = None,
                    sf1_queries: dict | None = None,
                    sf1_ambient: float | None = None) -> None:
    """Append this run's medians (last 10 per file) for the next run's
    regression baseline; best-effort, never fails the bench.  Both raw
    and control-normalized medians are stored — the normalized ones are
    what the next run baselines against."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, _HISTORY_FILE)
    try:
        try:
            with open(path) as f:
                hist = json.load(f)
        except (OSError, ValueError):
            hist = []
        entry = {"sf": sf, "queries": timings, "at": time.time()}
        if normalized is not None:
            entry["queries_normalized"] = normalized
        if ambient is not None:
            entry["ambient_factor"] = round(ambient, 3)
        if sf1_queries is not None:
            entry["sf1_queries"] = sf1_queries
        if sf1_ambient is not None:
            # the sf1 section's own control-window ambient — the r12
            # baseline policy filters history on THIS (the sf0.1-window
            # ambient above can be minutes stale by sf1 time)
            entry["sf1_ambient"] = round(sf1_ambient, 3)
        hist.append(entry)
        with open(path, "w") as f:
            json.dump(hist[-10:], f)
    except OSError:
        pass


def _gate(now: float, prev: float) -> bool:
    """Regression gate: >1.5x the baseline AND slower by a non-noise
    absolute margin."""
    return prev > 0 and now > 1.5 * prev and now - prev > 0.5


def _warm_remeasure(spark, qs, sf_dir: str, flagged: list,
                    prior: dict) -> tuple[dict, dict]:
    """The round-8 manual adjudication protocol, automated: re-run each
    flagged query 3 warm passes alongside the controls, re-derive the
    ambient factor from the SAME window, and confirm or clear the flag
    on the warm normalized median.  A co-tenant blip that inflated the
    main passes rarely spans this extra window too; a real regression
    survives it."""
    names = list(dict.fromkeys(list(CONTROL_QUERIES) + flagged))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        spark.catalog.clearCache()
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[n].append(round(time.perf_counter() - t0, 3))
    warm_med = {n: round(statistics.median(ts), 3)
                for n, ts in samples.items()}
    warm_ambient, warm_ratios = _ambient_factor(warm_med, prior)
    confirmed = {}
    detail = {"ambient_factor": round(warm_ambient, 3),
              "control_ratios": warm_ratios, "medians": warm_med,
              "unadjudicated": []}
    for n in flagged:
        # clamp like every other normalization site: ambient < 1 means
        # the BASELINE was slower than this window — dividing by it
        # would re-inflate the warm sample (r12: a 0.587 warm window
        # turned 2.447 s raw into a fictitious 4.172 s "normalized")
        now_norm = round(warm_med[n] / max(warm_ambient, 1.0), 3)
        # same conjunction as the cold flag: normalized AND raw
        if n in prior and _gate(now_norm, prior[n]) \
                and _gate(warm_med[n], prior[n]):
            # r12 policy: only a CLEAN window (control ambient <= 1.1)
            # can confirm — a contended window's "confirmation" is
            # recorded as unadjudicated, not as a regression
            if warm_ambient > 1.1:
                detail["unadjudicated"].append(
                    {"query": n, "prev": prior[n],
                     "now_warm_normalized": now_norm,
                     "now_warm_raw": warm_med[n],
                     "window_ambient": round(warm_ambient, 3)})
                verdict = "UNADJUDICATED (window contended)"
            else:
                confirmed[n] = {"prev": prior[n],
                                "now_warm_normalized": now_norm,
                                "now_warm_raw": warm_med[n],
                                "ratio": round(now_norm / prior[n], 2)}
                verdict = "CONFIRMED"
        else:
            verdict = "cleared (ambient)"
        print(f"[bench] warm re-measure {n}: {warm_med[n]}s raw, "
              f"{now_norm}s normalized vs prior {prior.get(n)} -> "
              f"{verdict}", file=sys.stderr)
    return confirmed, detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    qs = entrymod.queries()
    # perf twins that live outside the 50-query gated roster
    qs["knn_dtw_classify_full"] = entrymod.knn_dtw_classify_full
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for pass_no in range(n_runs):
        # Spark's CacheManager matches logically-identical plans, so a query
        # that .cache()s an intermediate would reuse pass-1 data in later
        # passes and under-report.  Every sample must be a cold-cache run.
        spark.catalog.clearCache()
        for name in BENCH_QUERIES:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            print(f"[bench] pass {pass_no + 1}/{n_runs} {name}: {dt}s", file=sys.stderr)
    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    # round-over-round flags on control-NORMALIZED medians: a query is a
    # regression candidate only if it is >1.5x its prior baseline AFTER
    # dividing out the ambient factor the control queries measured;
    # candidates are then re-measured warm in-session and recorded as
    # regressions only if the warm normalized median still exceeds the
    # gate.  Raw-median flags under co-tenant load are pure noise
    # (round 8: uniform 1.24-1.48x on untouched pure-SQL queries).
    prior, prior_file = _prior_medians(float(sf))
    ambient, control_ratios = _ambient_factor(timings, prior)
    ambient_by_class = _class_ambient(timings, prior)
    # Recorded history must converge to the CLEAN (idle-machine) scale:
    # ambient > 1 divides contention out; ambient < 1 (the baseline
    # itself was contended, this run is cleaner) records raw — dividing
    # by a sub-1 ambient would re-inflate a clean run back to the old
    # contended scale and propagate the contamination forever.
    normalized = {name: round(t / max(ambient, 1.0), 3)
                  for name, t in timings.items()}
    # r13: per-query dispersion across history + z-scores — drift
    # quoted in units of each query's own historical spread, not just
    # a raw ratio one scalar ambient factor must explain
    disp = _prior_dispersion(float(sf))
    z_scores = {name: _z_score(t, disp.get(name))
                for name, t in normalized.items()}
    z_scores = {n: z for n, z in z_scores.items() if z is not None}
    # Flag only when ALL views trip: the ambient-compensated ratio
    # (clears contended-now vs clean-baseline false positives), the
    # raw ratio (clears clean-now vs contended-baseline false positives
    # — controls and non-controls never inflate perfectly uniformly),
    # AND — when history is deep enough to know the query's own spread
    # — a z-score >= 3 (a query whose history already swings 1.4x must
    # not flag on a 1.4x drift).
    flagged = [name for name, t in timings.items()
               if name in prior
               and _gate(t / ambient, prior[name])
               and _gate(t, prior[name])
               and (z_scores.get(name) is None or z_scores[name] >= 3.0)]
    if flagged:
        print(f"[bench] flagged after normalization (ambient {ambient:.2f}): "
              f"{flagged} -> warm re-measure", file=sys.stderr)
        regressions, rerun_detail = _warm_remeasure(
            spark, qs, sf_dir, flagged, prior)
        # record the cleaner of cold-normalized and warm-normalized for
        # flagged queries so one contended window cannot poison the
        # baseline the next run compares against
        wa = max(rerun_detail["ambient_factor"], 1.0)
        for n in flagged:
            warm_norm = round(rerun_detail["medians"][n] / wa, 3)
            normalized[n] = min(normalized[n], warm_norm)
    else:
        regressions, rerun_detail = {}, None
    # scale validation rides the standard sf0.1 bench run only (a smoke
    # run at sf0.001 would produce meaningless ratios)
    cold_base = {name: ts[0] for name, ts in samples.items() if ts}
    scale = _scale_section(spark, qs, cold_base, ambient, sf_dir,
                           normalized) \
        if float(sf) == 0.1 else None
    sf1_queries, sf1_ambient = None, None
    if scale and scale.get("queries"):
        sf1_queries = {n: v.get("sec_normalized")
                       for n, v in scale["queries"].items()
                       if v.get("sec_normalized") is not None}
        sf1_ambient = scale.get("ambient_factor_local")
    _record_history(float(sf), timings, normalized, ambient, sf1_queries,
                    sf1_ambient)
    full = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": normalized,
        "ambient_factor": round(ambient, 3),
        "ambient_by_class": ambient_by_class,
        "control_ratios": control_ratios,
        "queries_dispersion": disp,
        "z_scores": z_scores,
        "sf": float(sf),
        "runs": n_runs,
        "samples": {name: ts for name, ts in samples.items()},
        "regressions": regressions,
        "regressions_rerun": rerun_detail,
        "regressions_baseline": prior_file,
        "sf1": scale,
    }
    # The FULL record (sf1 sections, per-pass samples, soak curves) is
    # multi-KB — far bigger than the 2 KB stdout tail the driver keeps,
    # which used to truncate the one JSON line mid-string and leave the
    # official BENCH artifact with "parsed": null every round.  Ship the
    # full record on stderr + a local file, and keep stdout's final line
    # COMPACT (headline + per-query medians + ambient context) so the
    # driver's tail always contains one complete parseable JSON line.
    print(json.dumps(full), file=sys.stderr)
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, ".bench_full.json"), "w") as f:
            json.dump(full, f)
    except OSError:
        pass
    top_z = sorted(z_scores.items(), key=lambda kv: -abs(kv[1]))[:1]
    # normalized per-query values ride the compact line BY RULE, not by
    # a second 44-entry map (which would blow the 2000-char stdout tail):
    # queries_normalized[q] == queries[q] / max(ambient_factor, 1.0)
    # EXCEPT the queries listed in norm_exc (flagged + warm-re-measured,
    # where the cleaner of cold/warm normalized is recorded).  norm_exc
    # is usually empty; the full maps are in .bench_full.json.
    norm_exc = {n: normalized[n] for n in normalized
                if normalized[n] != round(
                    timings[n] / max(ambient, 1.0), 3)}
    compact = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs": n_runs,
        "ambient_factor": round(ambient, 3),
        # per-class contention split (sql-only vs python-worker benched
        # queries): contention on this box is non-uniform across the
        # two classes, so cross-window adjudication needs both ratios
        "ambient_by_class": ambient_by_class,
        "norm_rule": "q/max(ambient_factor,1) except norm_exc",
        "norm_exc": norm_exc,
        # headline drift summary in spread units (full map + dispersion
        # in .bench_full.json); |z| <~ 3 across the board = no drift
        # beyond each query's own historical noise
        "max_z": {"query": top_z[0][0], "z": top_z[0][1]} if top_z else None,
        "regressions": sorted(regressions),
    }
    # hard cap: the driver keeps a 2000-char stdout tail, and a line
    # that exceeds it truncates mid-string ("parsed": null).  Shrink in
    # stages until the line genuinely fits — one shrink step is not a
    # cap when e.g. a long regression list survives the first drop.
    # The r15 additions (norm_exc, ambient_by_class) are dropped FIRST;
    # the queries map itself is the last resort, per the bench contract
    # (existing entries are never removed while the line fits).
    line = json.dumps(compact, separators=(",", ":"))
    for victim, note in (("norm_exc", ".bench_full.json"),
                         ("ambient_by_class", ".bench_full.json"),
                         ("queries", ".bench_full.json"),
                         ("regressions", "n_regressions")):
        if len(line) <= 1900:
            break
        dropped = compact.pop(victim)
        compact[f"{victim}_in"] = note
        if victim == "regressions":
            compact["n_regressions"] = len(dropped)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # last-resort guarantee (the staged drops above are not a cap if
        # some future field balloons): a minimal always-parseable stub
        # pointing at the full on-disk record
        line = json.dumps(
            {"metric": "bench_total", "value": total, "unit": "sec",
             "sf": float(sf), "runs": n_runs, "queries": {},
             "bench_in": ".bench_full.json"}, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
