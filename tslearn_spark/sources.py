"""UCR/UEA archive sources + dataset validation.

Reference: tslearn/utils/utils.py:637-714 (_load_txt_uea/_load_arff_uea),
tslearn/datasets/ucr_uea.py:211-310 (loader), utils.py:24-108/454-525
(check_dims / check_dataset).

Spark-first: both archive formats are line-oriented, so the scan is
``spark.read.text`` + expression parsing — fully distributed and
pushdown-friendly; no driver-side parsing of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _stable_line_ids(df: DataFrame) -> DataFrame:
    """Assign dense 0-based ids following the file's line order WITHOUT a
    global single-task window.

    zipWithIndex-style two-pass: rank within each partition (cheap local
    sort over monotonically_increasing_id, which encodes (partition,
    line#) and is file-order-monotone for text scans), count rows per
    partition, then add the exclusive prefix offset — a large archive
    scan stays parallel instead of serializing on one window task.
    """
    with_pid = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    w_local = Window.partitionBy("_pid").orderBy("_mid")
    local = with_pid.withColumn("_rn", F.row_number().over(w_local) - 1)
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = (
        local.groupBy("_pid").count()
        .select("_pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("series_id", (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_mid", "_rn", "_off")
    )


def load_ucr_txt(spark: SparkSession, path: str) -> DataFrame:
    """UCR .txt scan: whitespace-separated, label in column 0
    (utils.py:691-714).  Returns ts(series_id, values, label).
    """
    lines = spark.read.text(path)
    parsed = _stable_line_ids(lines).select(
        "series_id",
        F.expr(r"filter(split(trim(value), '\\s+|,'), x -> x != '')").alias("toks"),
    )
    return parsed.select(
        "series_id",
        F.expr(
            "transform(slice(toks, 2, size(toks) - 1), x -> array(cast(x as double)))"
        ).alias("values"),
        F.col("toks")[0].alias("label"),
    )


def load_arff_uea(spark: SparkSession, path: str) -> DataFrame:
    """Minimal univariate .arff scan (utils.py:637-688): skips the header
    (@-lines / comments), data rows are comma-separated with the class
    label last.  Returns ts(series_id, values, label)."""
    lines = spark.read.text(path)
    data = _stable_line_ids(
        lines.select(F.trim("value").alias("line")).where(
            (F.length("line") > 0)
            & ~F.col("line").startswith("@")
            & ~F.col("line").startswith("%")
        )
    ).select("series_id", F.split("line", ",").alias("toks"))
    return data.select(
        "series_id",
        F.expr(
            "transform(slice(toks, 1, size(toks) - 1), x -> array(cast(trim(x) as double)))"
        ).alias("values"),
        F.expr("trim(element_at(toks, -1))").alias("label"),
    )


# ---------------------------------------------------------------------------
# validation (check_dims / check_dataset twins)
# ---------------------------------------------------------------------------

class DatasetValidationError(ValueError):
    pass


def check_dataset(
    df: DataFrame,
    force_univariate: bool = False,
    force_equal_length: bool = False,
    force_single_time_series: bool = False,
    values_col: str = "values",
) -> DataFrame:
    """Constraint checks of utils.py:454-525, evaluated in one aggregate."""
    row = df.select(
        F.countDistinct(F.size(F.col(values_col))).alias("n_lengths"),
        F.max(F.size(F.col(values_col)[0])).alias("max_d"),
        F.count("*").alias("n"),
    ).first()
    if force_univariate and (row["max_d"] or 0) > 1:
        raise DatasetValidationError(
            "Dataset is multivariate but a univariate dataset is required"
        )
    if force_equal_length and (row["n_lengths"] or 0) > 1:
        raise DatasetValidationError(
            "Dataset has variable-length series but equal length is required"
        )
    if force_single_time_series and row["n"] != 1:
        raise DatasetValidationError(
            f"Expected a single time series, got {row['n']}"
        )
    return df


def check_dims(df: DataFrame, fit_dims: tuple[int | None, int],
               check_n_features_only: bool = False,
               values_col: str = "values") -> DataFrame:
    """Transform-time shape check (utils.py:24-108): d must match the
    fit-time d; rigid estimators also require the fit-time sz."""
    fit_sz, fit_d = fit_dims
    row = df.select(
        F.countDistinct(F.size(F.col(values_col)[0])).alias("n_ds"),
        F.max(F.size(F.col(values_col)[0])).alias("d"),
        F.countDistinct(F.size(F.col(values_col))).alias("n_szs"),
        F.max(F.size(F.col(values_col))).alias("sz"),
    ).first()
    if row["d"] != fit_d:
        raise DatasetValidationError(
            f"Number of features {row['d']} != fit-time {fit_d}"
        )
    if not check_n_features_only and fit_sz is not None:
        if row["n_szs"] > 1 or row["sz"] != fit_sz:
            raise DatasetValidationError(
                f"Series length {row['sz']} != fit-time {fit_sz}"
            )
    return df


class UCR_UEA_datasets:
    """UCR/UEA archive helper (tslearn/datasets/ucr_uea.py:45-210).

    The reference downloads the archive's summary CSVs from
    timeseriesclassification.com; this container has no network, so the
    CSV paths are injected instead (``baseline_scores_file``).  Dataset
    loading itself maps to load_ucr_txt / load_arff_uea.
    """

    def __init__(self, baseline_scores_file: str | None = None):
        self._baseline_scores_filename = baseline_scores_file

    def baseline_accuracy(self, list_datasets=None, list_methods=None) -> dict:
        """Baseline accuracies per dataset/method from the archive CSV
        (ucr_uea.py:85-133): first (unnamed) column = dataset name, other
        columns = method scores; unparseable scores are skipped.
        """
        import csv

        if self._baseline_scores_filename is None:
            raise ValueError(
                "no baseline_scores_file configured (the reference downloads "
                "singleTrainTest.csv; pass a local copy)"
            )
        with open(self._baseline_scores_filename, "r") as f:
            d_out: dict = {}
            for perfs_dict in csv.DictReader(f, delimiter=","):
                dataset_name = perfs_dict[""]
                if list_datasets is None or dataset_name in list_datasets:
                    d_out[dataset_name] = {}
                    for m in perfs_dict.keys():
                        if m != "" and (list_methods is None or m in list_methods):
                            try:
                                d_out[dataset_name][m] = float(perfs_dict[m])
                            except ValueError:  # missing score (== "")
                                pass
            return d_out


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   n_buckets: int, path: str | None = None,
                   sort_cols: list[str] | None = None) -> None:
    """Persist a DataFrame bucketed (and bucket-sorted) on join keys.

    The 100-TB co-location pattern: two tables bucketed on the same key
    with the same bucket count join WITHOUT a shuffle — each task zips
    bucket i with bucket i (SortMergeJoin with no Exchange under it).
    For repeated joins (fact-to-fact, iterative self-joins) this
    amortizes the one-time bucketed write across every later query.

    Bucketing requires the session catalog (saveAsTable); plain
    ``.parquet(path)`` writes cannot carry bucket metadata.
    """
    w = df.write.format("parquet").mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols).sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table_name)
