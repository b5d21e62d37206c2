"""Data model + ingest for time-series DataFrames (SURVEY.md §1.5).

Primary representation: one row per series —

    ts(series_id: long, values: array<array<double>>)

outer array = timestamps (variable length — no NaN tail padding needed),
inner array = dims.  Per-series transforms on this layout are narrow
(map-only) operations: no shuffle, whole-stage codegen, scale linearly
with data volume.  The exploded ``ts_long`` view exists only for
cross-series positionwise aggregates.

Reference semantics: tslearn/utils/utils.py:111-424 (coercion, NaN
trimming, text codec), tslearn/generators/generators.py (random walks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TS_SCHEMA = StructType(
    [
        StructField("series_id", LongType(), False),
        StructField("values", ArrayType(ArrayType(DoubleType())), False),
    ]
)

LABELS_SCHEMA = StructType(
    [StructField("series_id", LongType(), False), StructField("label", StringType(), True)]
)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _coerce_series(ts) -> list[list[float]]:
    """1-D -> (sz,1); trim trailing all-NaN rows (utils.py:111-153, 386-424)."""
    arr = np.asarray(ts, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape((-1, 1))
    last = arr.shape[0]
    while last > 0 and np.isnan(arr[last - 1]).all():
        last -= 1
    return [[float(v) for v in row] for row in arr[:last]]


def dataset_to_df(spark: SparkSession, dataset, labels=None) -> DataFrame:
    """Build a ``ts`` DataFrame from a list/array of series.

    Spark analog of to_time_series_dataset (utils.py:156-216): instead of
    NaN-padding to a dense tensor, each row keeps its natural length.
    """
    rows = [(int(i), _coerce_series(ts)) for i, ts in enumerate(dataset)]
    df = spark.createDataFrame(rows, TS_SCHEMA)
    if labels is not None:
        lab = spark.createDataFrame(
            [(int(i), str(y)) for i, y in enumerate(labels)], LABELS_SCHEMA
        )
        df = df.join(lab, "series_id")
    return df


def df_to_dataset(df: DataFrame) -> list[np.ndarray]:
    """Collect a ``ts`` DataFrame back to a list of (sz, d) arrays (tests only)."""
    rows = df.select("series_id", "values").orderBy("series_id").collect()
    return [np.asarray(r["values"], dtype=np.float64) for r in rows]


# ---------------------------------------------------------------------------
# nested <-> long views
# ---------------------------------------------------------------------------

def to_long(df: DataFrame, values_col: str = "values") -> DataFrame:
    """Explode to ts_long(series_id, t, dim, value).

    Used only when an operator genuinely needs cross-series alignment by
    position (barycenters); everything per-series stays nested.
    """
    step1 = df.select(
        "series_id", F.posexplode(values_col).alias("t", "point")
    )
    return step1.select(
        "series_id", "t", F.posexplode("point").alias("dim", "value")
    )


def from_long(df_long: DataFrame) -> DataFrame:
    """Reassemble nested values from ts_long, ordering by (t, dim).

    array_agg over a sorted struct avoids a per-series window sort: we
    aggregate structs and sort_array once — a single shuffle by series_id.
    """
    per_t = (
        df_long.groupBy("series_id", "t")
        .agg(F.sort_array(F.collect_list(F.struct("dim", "value"))).alias("pts"))
        .select(
            "series_id",
            "t",
            F.expr("transform(pts, p -> p.value)").alias("point"),
        )
    )
    return (
        per_t.groupBy("series_id")
        .agg(F.sort_array(F.collect_list(F.struct("t", "point"))).alias("tp"))
        .select("series_id", F.expr("transform(tp, x -> x.point)").alias("values"))
    )


def ts_size_col(values_col: str = "values") -> Column:
    """Logical length — trailing-NaN rows were trimmed at ingest."""
    return F.size(values_col)


# ---------------------------------------------------------------------------
# text codec (reference: utils/utils.py:219-353)
# ---------------------------------------------------------------------------

def series_to_str_col(values_col: str = "values") -> Column:
    """values -> "v v v|v v v" with dims separated by '|' (utils.py:219-254).

    Note the reference writes one *dimension* per '|' group (column-major).
    """
    return F.expr(
        f"""
        array_join(
          transform(
            sequence(0, size({values_col}[0]) - 1),
            d -> array_join(transform({values_col}, row -> cast(row[d] as string)), ' ')
          ),
          '|'
        )
        """
    )


def str_to_series_col(str_col: str) -> Column:
    """Inverse codec: "v v v|v v v" -> array<array<double>> (utils.py:256-291)."""
    return F.expr(
        f"""
        transform(
          sequence(0, size(split(trim(split({str_col}, '\\\\|')[0]), ' ')) - 1),
          t -> transform(split({str_col}, '\\\\|'),
                         dimstr -> cast(split(trim(dimstr), ' ')[t] as double))
        )
        """
    )


def save_time_series_txt(df: DataFrame, path: str) -> None:
    """Text sink, one series per line (utils.py:294-321)."""
    df.orderBy("series_id").select(series_to_str_col().alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def load_time_series_txt(spark: SparkSession, path: str) -> DataFrame:
    """Text source -> ts DataFrame (utils.py:323-353)."""
    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    return lines.select(
        (F.row_number().over(w) - 1).cast("long").alias("series_id"),
        str_to_series_col("value").alias("values"),
    )


def ts_zeros(sz: int, d: int = 1) -> np.ndarray:
    """All-zero (sz, d) series (utils/utils.py:427-452)."""
    return np.zeros((sz, d))


# ---------------------------------------------------------------------------
# generators (reference: generators/generators.py:7-112)
# ---------------------------------------------------------------------------

def _session_or_active(spark: SparkSession | None) -> SparkSession:
    """Generators follow the reference positional signature
    (generators.py:7-112), so the session rides as a trailing optional:
    None resolves to the active session, matching how reference scripts
    call random_walks(n_ts=..., sz=...) with no session in sight."""
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is None:
        raise RuntimeError(
            "random_walks/random_walk_blobs need an active SparkSession "
            "(start one, or pass spark=...)"
        )
    return active


def random_walks(
    n_ts: int = 100,
    sz: int = 256,
    d: int = 1,
    mu: float = 0.0,
    std: float = 1.0,
    random_state: int | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Cumulative-sum Gaussian walks, distributed (generators.py:7-54).

    Spark-first: `spark.range(n_ts)` seeds one row per series, and an
    Arrow-batched pandas UDF generates the cumsum walks — the whole
    generator is a narrow map over `range`, embarrassingly parallel, no
    shuffle.  For test determinism a seed pins numpy per-series RNG
    (seed is per series_id, so partitioning cannot change outputs).
    """
    spark = _session_or_active(spark)
    seed = 0 if random_state is None else int(random_state)

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def make_udf(sids: pd.Series) -> pd.Series:
        out = []
        for sid in sids:
            rs = np.random.RandomState(seed + 100003 * int(sid))
            steps = mu + std * rs.randn(sz, d)
            out.append(np.cumsum(steps, axis=0).tolist())
        return pd.Series(out)
    return (
        spark.range(n_ts)
        .withColumnRenamed("id", "series_id")
        .select("series_id", make_udf(F.col("series_id")).alias("values"))
    )


def random_walk_blobs(
    n_ts_per_blob: int = 100,
    sz: int = 256,
    d: int = 1,
    n_blobs: int = 2,
    noise_level: float = 1.0,
    random_state: int | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """k seed walks + per-blob white noise; returns ts + label (generators.py:57-112)."""
    spark = _session_or_active(spark)
    seed = 0 if random_state is None else int(random_state)
    rs = np.random.RandomState(seed)
    base = np.cumsum(rs.randn(n_blobs, sz, d), axis=1)

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def make_udf(sids: pd.Series) -> pd.Series:
        out = []
        for sid in sids:
            blob = int(sid) // n_ts_per_blob
            rs2 = np.random.RandomState(seed + 13 + 100003 * int(sid))
            out.append((base[blob] + noise_level * rs2.randn(sz, d)).tolist())
        return pd.Series(out)
    return (
        spark.range(n_blobs * n_ts_per_blob)
        .withColumnRenamed("id", "series_id")
        .select(
            "series_id",
            make_udf(F.col("series_id")).alias("values"),
            (F.col("series_id") / n_ts_per_blob).cast("int").cast("string").alias("label"),
        )
    )


def events_to_ts(events: DataFrame, id_col: str = "user_id", order_cols=("ts", "event_id"),
                 value_col: str = "value") -> DataFrame:
    """Build a univariate ``ts`` DataFrame from an event log.

    One shuffle by the series key; sort_array on (order..., value) structs
    instead of a window sort keeps it a single aggregate.  order_cols
    should be a deterministic total order (e.g. ts + a unique id).
    """
    order_cols = list(order_cols)
    return (
        events.groupBy(F.col(id_col).cast("long").alias("series_id"))
        .agg(F.sort_array(F.collect_list(F.struct(*order_cols, value_col))).alias("ev"))
        .select(
            "series_id",
            F.expr(f"transform(ev, e -> array(cast(e.{value_col} as double)))").alias("values"),
        )
    )
