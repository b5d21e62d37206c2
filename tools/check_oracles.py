"""Local replica of the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, compares row count, column names, and order-insensitive
values (NaN-safe, string-normalized).  Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from tslearn_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# queries whose QUERY side honors --sample-mod (recorded on the board
# so a sampled run is distinguishable from a full one).  Two waves:
# the all-pairs/top-k family (query side restricted, build side full)
# and the per-key-independent linear family (key-sampled output ==
# key-sampled input; shrinks the 5M-row per-event result sets the
# hash compare cannot afford at generated scale).
_SAMPLED_QUERIES = {
    "ts_paa_dist_pairs", "ts_sax_dist_pairs", "ts_lb_keogh_pairs",
    "knn_euclidean_16", "silhouette_euclidean_16",
    "dedup_embedding_cosine",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "ts_scale", "ts_envelope", "ts_resample",
    "events_running_zscore", "events_sessionize", "events_cumulative",
    "stream_tumbling_paa_batch", "matrix_profile_events",
    "knn_sax_classify",
    # r14 wave 3: whole-component sampling — the full distributed
    # near-dup graph + connected components still run; only the
    # recursive-CTE oracle closure (infeasible at 250k docs) shrinks
    "dedup_canonical",
}


def is_vacuous(sample_mod: int | None, name: str, n_rows: int) -> bool:
    """A SAMPLED query that returns 0 rows is a board bug (the sampling
    predicate missed the query's key space — r13's knn_sax_classify
    defect: odd-id test side x even mod), never evidence: empty vs
    empty hash-compares OK while proving nothing.  Unsampled runs (the
    driver's gates) are untouched — 0 rows there is a legitimate
    result to be hash-compared."""
    return bool(sample_mod) and name in _SAMPLED_QUERIES and n_rows == 0


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def exact_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-hash emulation: every cell stringized, exact compare.
    Catches what allclose hides — type surface diffs (BIGINT vs INT128
    rendering '1' vs '1.0') and last-digit rounding ties."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"SCHEMA cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"ROWS spark={len(sdf)} oracle={len(odf)}"
    a, b = norm_frame(sdf), norm_frame(odf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            idx = next(
                i for i in range(len(av))
                if not (str(av[i]) == str(bv[i]) or (
                    isinstance(av[i], float) and abs(float(av[i]) - float(bv[i])) < 1e-9))
            )
            return f"VALUES col={c} row{idx}: spark={av[idx]!r} oracle={bv[idx]!r}"
    # allclose passed -> run the strict driver-style check too
    ea, eb = exact_frame(sdf), exact_frame(odf)
    neq = (ea.values != eb.values)
    if neq.any():
        r, c = np.argwhere(neq)[0]
        col = ea.columns[c]
        return (f"HASH col={col} row{r}: spark={ea.values[r, c]!r} "
                f"oracle={eb.values[r, c]!r} (allclose passed — type/rounding tie)")
    return "OK"


def _replay_check(spark, name: str, sdf: pd.DataFrame,
                  sf_dir: str) -> tuple[str, str] | None:
    """Board-level numpy replay for the two no-SQL-form queries
    (tools/replay_oracles.py) so the board records a CHECKED artifact
    instead of bare rows-only.  None -> no replay exists (keep the
    rows-only status); replay crashes are reported as replay-ERR, not
    swallowed."""
    from tools.replay_oracles import REPLAYS

    fn = REPLAYS.get(name)
    if fn is None:
        return None
    try:
        return fn(spark, sf_dir, sdf)
    except Exception as e:  # a crashed replay is a failed check
        return "replay-ERR", str(e)[:200]


def main() -> None:
    import json
    import time

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sample_mod = None
    if "--sample-mod" in args:
        # Query-side sampling for big generated-scale boards: the nine
        # all-pairs/brute-top-k queries restrict their QUERY side to
        # key % N == 0 (build/corpus side stays full) and oracle_sql()
        # emits the same predicate, keeping the DuckDB oracle linear.
        # MUST be set before entrymod.queries()/oracle_sql() run — both
        # read the env at call time.
        i = args.index("--sample-mod")
        sample_mod = int(args[i + 1])
        os.environ["SPARK_GRAFT_ORACLE_SAMPLE_MOD"] = str(sample_mod)
        args = args[:i] + args[i + 2:]
    skip: dict[str, str] = {}
    if "--skip" in args:
        # --skip name=reason,name=reason — recorded on the board as an
        # explicit skipped_<reason> status (used for the generated-sf1
        # board, where the declared-quadratic all-pairs queries exceed
        # the driver-result/oracle budget BY DESIGN; silently omitting
        # them would read as coverage)
        i = args.index("--skip")
        for tok in args[i + 1].split(","):
            n, _, r = tok.partition("=")
            skip[n] = r or "declared"
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    board: dict = {}
    spark = get_spark("check_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.basename(sf_dir.rstrip("/")) == ".scale_sf1":
        # pointing the board at the generated scale dir self-provisions
        # it (documents/embeddings/events + the r12 10x TPC-H tables),
        # so `python tools/check_oracles.py /root/repo/.scale_sf1` is a
        # one-command full-roster sf1 board.  The ensure_* calls are
        # unconditional BY DESIGN: they gate on their own _COMPLETE
        # markers, so a generation that crashed mid-write (tables
        # present, marker absent) heals here instead of failing on
        # missing views — probing for one table file would not.
        from tools.gen_scale_data import ensure_sf1, ensure_sf1_tpch
        ensure_sf1(spark, dest_dir=sf_dir)
        ensure_sf1_tpch(spark, dest_dir=sf_dir)
    elif os.path.basename(sf_dir.rstrip("/")) == ".scale_sf5":
        # the sf5 dir self-provisions all four table families the same
        # way (markers gate regeneration); TPC-H joined in r14, so the
        # relational passthroughs are gated past sf1 too
        from tools.gen_scale_data import (ensure_sf5_documents,
                                          ensure_sf5_embeddings,
                                          ensure_sf5_events,
                                          ensure_sf5_tpch)
        ensure_sf5_documents(spark, dest_dir=sf_dir)
        ensure_sf5_embeddings(spark, dest_dir=sf_dir)
        ensure_sf5_events(spark, dest_dir=sf_dir)
        ensure_sf5_tpch(spark, dest_dir=sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written dataset dir (e.g. the generated .scale_sf1
            # tables): point DuckDB at the part files
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"{name:28s} SKIP ({skip[name]})")
            board[name] = {"status": "skipped", "reason": skip[name]}
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERR {str(e)[:200]}")
            board[name] = {"status": "SPARK-ERR", "err": str(e)[:200]}
            n_bad += 1
            continue
        spark_sec = time.perf_counter() - t0
        if is_vacuous(sample_mod, name, len(sdf)):
            # r14 vacuity guard (VERDICT r13 directive 2): a sampling
            # predicate that empties a query's result would otherwise
            # hash-compare empty-to-empty and count as coverage (the
            # r13 knn_sax_classify defect: odd-id test side x even
            # sample-mod).  An empty SAMPLED result is always a board
            # bug, never evidence — fail loudly.
            print(f"{name:28s} FAIL VACUOUS sampled result is empty "
                  f"(sample-mod {sample_mod})")
            board[name] = {"status": "FAIL", "rows": 0,
                           "detail": f"VACUOUS: 0 rows under "
                                     f"sample-mod {sample_mod}"}
            n_bad += 1
            continue
        if name not in oracles:
            out = _replay_check(spark, name, sdf, sf_dir)
            if out is None:
                print(f"{name:28s} rows-only: {len(sdf)} rows, "
                      f"cols={list(sdf.columns)}")
                board[name] = {"status": "rows-only", "rows": len(sdf),
                               "spark_sec": round(spark_sec, 3)}
            else:
                status, detail = out
                print(f"{name:28s} {status} {detail}")
                board[name] = {"status": status, "rows": len(sdf),
                               "spark_sec": round(spark_sec, 3),
                               "replay": detail}
                if status == "replay-OK":
                    n_ok += 1
                else:
                    n_bad += 1
            continue
        t1 = time.perf_counter()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERR {str(e)[:200]}")
            board[name] = {"status": "ORACLE-ERR", "err": str(e)[:200]}
            n_bad += 1
            continue
        oracle_sec = time.perf_counter() - t1
        verdict = compare(name, sdf, odf)
        status = "OK " if verdict == "OK" else "FAIL"
        if verdict == "OK":
            n_ok += 1
        else:
            n_bad += 1
        board[name] = {"status": status.strip(), "rows": len(sdf),
                       "sec": round(time.perf_counter() - t0, 3),
                       # engine/oracle attribution (r13 directive 4):
                       # "sec" mixes Spark + DuckDB + compare; these
                       # two split it so a slow board entry is
                       # attributable without re-running
                       "spark_sec": round(spark_sec, 3),
                       "oracle_sec": round(oracle_sec, 3)}
        if verdict != "OK":
            board[name]["detail"] = verdict
        print(f"{name:28s} {status} {'' if verdict == 'OK' else verdict}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    if json_path:
        rec = {"sf_dir": sf_dir, "n_ok": n_ok, "n_bad": n_bad,
               "at": time.time(), "queries": board}
        if sample_mod:
            rec["sample_mod"] = sample_mod
            rec["sample_mod_queries"] = sorted(
                n for n in board if n in _SAMPLED_QUERIES)
        with open(json_path, "w") as f:
            json.dump(rec, f, indent=1)
    spark.stop()
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
