"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the configs below are the ones that
matter at cluster scale too: AQE for runtime re-planning/skew handling,
Arrow for the pandas-UDF kernel path, and a shuffle-partition count sized
to the input rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "tslearn_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes: every config here is what we would set on a 1000-executor
    cluster as well — AQE coalesces the post-shuffle partition count at
    runtime so ``spark.sql.shuffle.partitions`` is an upper bound, skewed
    join keys are split by AQE, and Arrow batches keep the Python kernel
    path amortized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long and convert in load_tables
        # (DuckDB likewise truncates ns -> us on read, so both engines
        # see identical microsecond values)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes size(child)>0 filters under
        # every explode; predicate pushdown then drags the generator's
        # child expression below our compute-spreading repartitions, so
        # md5/regex/HOF tokenization chains run TWICE — once single-task
        # on the scan side.  Generate already skips empty arrays; the
        # filter buys nothing for this engine's operators (measured 12x
        # on the shingle explode: 5.0s -> 0.4s at sf0.1).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = builder.master(master)
    return builder.getOrCreate()


# columns stored as TIMESTAMP(NANOS) in the driver parquet — surfaced as
# long (nanos) under nanosAsLong and converted to microsecond timestamps
_NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _dir_fingerprint(sf_dir: str):
    """Cheap staleness key for the load_tables memo: (name, mtime_ns, size)
    of every top-level entry in sf_dir.  ~10 stat calls — far cheaper than
    the footer reads the memo avoids — and changes whenever the parquet
    data is regenerated.  Non-local / unreadable paths fingerprint as
    None (memo then behaves as before: keyed on sf_dir only)."""
    try:
        with os.scandir(sf_dir) as it:
            return tuple(sorted(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size) for e in it
            ))
    except OSError:
        return None


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's parquet tables and register them as temp views.

    Parquet scans get predicate pushdown + column pruning for free once the
    plan is declarative; no DATA is cached here — callers cache hot tables.
    The lazy DataFrame handles (and their schema reads: ~10 footer
    listings per call otherwise) ARE memoized per (session, sf_dir);
    switching sf_dir on the same session re-registers the temp views from
    the memo without re-reading footers.
    """
    from pyspark.sql.types import LongType

    memo = getattr(spark, "_tslearn_tables_memo", None)
    if memo is None:
        memo = {}
        try:
            spark._tslearn_tables_memo = memo
        except Exception:
            memo = None
    fp = _dir_fingerprint(sf_dir)
    if memo is not None and sf_dir in memo:
        memo_fp, out = memo[sf_dir]
        if memo_fp != fp:
            # sf_dir contents were regenerated since the memo was taken:
            # the parquet DataFrames captured the OLD file listing at
            # creation and would serve stale data (or FileNotFound on
            # deleted parts) — drop the entry and re-read below
            del memo[sf_dir]
        else:
            if getattr(spark, "_tslearn_tables_sf", None) != sf_dir:
                for name in TPCH_TABLES:
                    if name in out:
                        out[name].createOrReplaceTempView(name)
                    else:
                        spark.catalog.dropTempView(name)
                try:
                    spark._tslearn_tables_sf = sf_dir
                except Exception:
                    pass
            return out

    # The driver harness passes its OWN SparkSession (not get_spark()'s), so
    # set the nanos conf here too — events.parquet stores TIMESTAMP(NANOS)
    # which Spark can't read natively. This is a dynamic SQL conf in
    # PySpark 4.x, safe to set at runtime on any session.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable on some builds; get_spark() sessions already have it

    # Performance confs for harness-owned sessions (all dynamic SQL confs,
    # scoped to this session, semantics-neutral).  A vanilla session runs
    # 200 shuffle partitions — at local[32] on sf-scale data that is pure
    # scheduling overhead (iterative ops like kshape pay it per round);
    # Arrow keeps the pandas-UDF kernel path batched instead of pickled.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for key, val in (
        ("spark.sql.shuffle.partitions", cpus if cpus.isdigit() else "32"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "2048"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        # see get_spark: the inferred size()>0 filter under explode drags
        # heavy tokenization chains below the compute-spread repartition
        ("spark.sql.optimizer.excludedRules",
         "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass

    out: dict[str, DataFrame] = {}
    errors: dict[str, Exception] = {}
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            try:
                df = spark.read.parquet(path)
            except Exception as exc:  # noqa: BLE001 — isolate per-table failures
                # One unreadable file must not take down queries that never
                # touch it; drop any stale view so users of THIS table still
                # fail loudly at resolution time.
                errors[name] = exc
                spark.catalog.dropTempView(name)
                continue
            for col in _NANO_TS_COLS.get(name, ()):
                if col in df.columns and isinstance(df.schema[col].dataType, LongType):
                    # integer div, not float div: float rounding can flip the
                    # last microsecond vs DuckDB's truncating ns->us cast
                    df = df.withColumn(
                        col, F.timestamp_micros(F.expr(f"{col} div 1000"))
                    )
            df.createOrReplaceTempView(name)
            out[name] = df
        else:
            # drop any stale view from a previous sf_dir — a query against
            # a bad path must fail loudly, not silently read old data
            spark.catalog.dropTempView(name)
    if memo is not None and not errors:  # only memoize fully-clean loads
        memo[sf_dir] = (fp, out)
    # the registered views now belong to THIS sf_dir even when some tables
    # failed — the marker must say so, or a later memo hit for the previous
    # dir would see marker == its own sf_dir, skip re-registration, and
    # silently read this dir's partially-registered views
    try:
        spark._tslearn_tables_sf = sf_dir
    except Exception:
        pass
    return out
