"""Dump .explain("formatted") for declared queries to plans/<round>/ (SPARK_GRAFT_PLANS_ROUND, default r15).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

Writes plans/r14/<query>_<tag>.txt for each query (default: all declared
queries plus the knn_dtw_classify_full perf twin).  Uses the sf0.1
testdata dir so plan shapes match what bench.py times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tslearn_spark import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["knn_dtw_classify_full"] = entrymod.knn_dtw_classify_full
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"[plans] wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
