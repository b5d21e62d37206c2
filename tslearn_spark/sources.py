"""UCR/UEA archive sources + dataset validation.

Reference: tslearn/utils/utils.py:637-714 (_load_txt_uea/_load_arff_uea),
tslearn/datasets/ucr_uea.py:211-310 (loader), utils.py:24-108/454-525
(check_dims / check_dataset).

Spark-first: both archive formats are line-oriented, so the scan is
``spark.read.text`` + expression parsing — fully distributed and
pushdown-friendly; no driver-side parsing of data rows.
"""

from __future__ import annotations

import os

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


def in_file_string_replace(filename: str, old_string: str, new_string: str) -> None:
    """Fix known typos inside a downloaded text file in place
    (tslearn/datasets/datasets.py:56-76)."""
    from pathlib import Path

    p = Path(filename)
    p.write_text(p.read_text().replace(old_string, new_string))


def extract_from_zip_url(url: str, target_dir: str | None = None,
                         verbose: bool = False) -> str | None:
    """Download a zip (http(s):// or file://) and extract it into
    ``target_dir`` (tslearn/datasets/datasets.py:16-53).

    Returns the extraction directory, or None (with a RuntimeWarning) if
    the payload is missing/corrupt.  Driver-side by design: archive zips
    are a few MB of bootstrap data, not the distributed hot path — the
    extracted files are then scanned by the distributed text loaders.
    """
    import shutil
    import tempfile
    import warnings
    import zipfile
    from urllib.request import urlopen

    if target_dir is None:
        target_dir = tempfile.mkdtemp()
    try:
        os.makedirs(target_dir, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".zip") as tmp:
            # bounded timeout: an offline environment must fail fast
            with urlopen(url, timeout=30) as resp:
                shutil.copyfileobj(resp, tmp)
            tmp.flush()
            with zipfile.ZipFile(tmp.name) as zf:
                zf.extractall(path=target_dir)
        if verbose:
            print(f"Extracted {url} into {target_dir}")
        return target_dir
    except (zipfile.BadZipFile, OSError) as exc:
        warnings.warn(
            f"could not download/extract {url}: {exc}",
            category=RuntimeWarning,
        )
        return None


def _parse_txt_uea(path: str):
    """Driver-side numpy twin of load_ucr_txt (utils.py:691-714): label
    in column 0, whitespace/comma separated; ragged rows NaN-padded to
    the max length.  Returns (X (n, sz, 1), y (n,))."""
    import numpy as np

    values, labels = [], []
    with open(path) as f:
        for line in f:
            toks = [t for t in line.replace(",", " ").split() if t]
            if not toks:
                continue
            labels.append(toks[0])
            values.append(np.array([float(t) for t in toks[1:]]))
    sz = max(len(v) for v in values)
    X = np.full((len(values), sz, 1), np.nan)
    for i, v in enumerate(values):
        X[i, : len(v), 0] = v
    y = np.array(labels)
    try:
        y = y.astype(float).astype(int) if np.all(y.astype(float) % 1 == 0) \
            else y.astype(float)
    except ValueError:
        pass  # string labels stay strings
    return X, y


def _parse_arff_uea(path: str):
    """Driver-side numpy twin of load_arff_uea (utils.py:637-688):
    univariate rows, comma separated, class label last."""
    import numpy as np

    values, labels = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("@", "%")):
                continue
            toks = line.split(",")
            labels.append(toks[-1].strip())
            values.append(np.array([float(t) for t in toks[:-1]]))
    sz = max(len(v) for v in values)
    X = np.full((len(values), sz, 1), np.nan)
    for i, v in enumerate(values):
        X[i, : len(v), 0] = v
    return X, np.array(labels)


_TSC_BASE_URL = "https://www.timeseriesclassification.com"


class UCR_UEA_datasets:
    """UCR/UEA archive accessor (tslearn/datasets/ucr_uea.py:45-349).

    Full reference surface: summary-CSV bootstrap, zip download +
    extract, a local per-dataset cache, txt-preferred/arff-fallback
    parsing, and the known-misnamed-file recovery map.  ``base_url``
    accepts any URL scheme ``urllib`` understands, so an offline
    deployment (or the test suite) can point it at a ``file://`` mirror
    of the archive; when the summary CSVs cannot be fetched the instance
    degrades exactly like the reference (list/baseline methods
    unavailable, ``load_dataset`` still works against the cache).
    ``baseline_scores_file`` injects a local singleTrainTest.csv
    directly, skipping the bootstrap fetch.
    """

    def __init__(self, use_cache: bool = True, data_dir: str | None = None,
                 base_url: str | None = None,
                 baseline_scores_file: str | None = None):
        self.use_cache = use_cache
        self.base_url = (base_url or _TSC_BASE_URL).rstrip("/")
        self._data_dir = data_dir or os.path.expanduser(
            os.path.join("~", ".tslearn_spark", "datasets", "UCR_UEA")
        )
        os.makedirs(self._data_dir, exist_ok=True)
        self._ignore_list = ["Data Descriptions"]
        # archive zip name -> canonical dataset name (ucr_uea.py:76-83)
        self._filenames = {
            "AtrialFibrillation": "AtrialFibrilation",
            "CinCECGtorso": "CinCECGTorso",
            "MixedShapes": "MixedShapesRegularTrain",
            "NonInvasiveFetalECGThorax1": "NonInvasiveFatalECGThorax1",
            "NonInvasiveFetalECGThorax2": "NonInvasiveFatalECGThorax2",
            "StarlightCurves": "StarLightCurves",
        }
        self._list_multivariate_filename: str | None = None
        if baseline_scores_file is not None:
            self._baseline_scores_filename: str | None = baseline_scores_file
            return
        try:
            self._list_multivariate_filename = self._fetch(
                "/Downloads/Archives/summaryMultivariate.csv"
            )
            self._baseline_scores_filename = self._fetch("/singleTrainTest.csv")
            # typos in the archive CSV vs the download links (ucr_uea.py:65-69)
            in_file_string_replace(self._baseline_scores_filename,
                                   "CinCECGtorso", "CinCECGTorso")
            in_file_string_replace(self._baseline_scores_filename,
                                   "StarlightCurves", "StarLightCurves")
        except Exception:
            # no network (or no mirror): lists/baselines unavailable,
            # cache-backed load_dataset still works
            self._baseline_scores_filename = None

    def _fetch(self, rel_path: str) -> str:
        import shutil
        from urllib.request import urlopen

        dest = os.path.join(self._data_dir, os.path.basename(rel_path))
        # urlopen with a bounded timeout (urlretrieve has none): an
        # offline environment degrades in seconds, not a hung socket
        with urlopen(self.base_url + rel_path, timeout=10) as resp, \
                open(dest, "wb") as f:
            shutil.copyfileobj(resp, f)
        return dest

    def _require_lists(self) -> None:
        if self._baseline_scores_filename is None:
            raise ValueError(
                "archive summary CSVs unavailable — no network access and no "
                "local mirror (pass base_url='file:///...' or "
                "baseline_scores_file=...)"
            )

    def baseline_accuracy(self, list_datasets=None, list_methods=None) -> dict:
        """Baseline accuracies per dataset/method from the archive CSV
        (ucr_uea.py:85-133): first (unnamed) column = dataset name, other
        columns = method scores; unparseable scores are skipped.
        """
        import csv

        self._require_lists()
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

    def list_univariate_datasets(self) -> list[str]:
        """Univariate archive datasets (ucr_uea.py:135-153)."""
        import csv

        self._require_lists()
        with open(self._baseline_scores_filename, "r") as f:
            return [row[""] for row in csv.DictReader(f, delimiter=",")]

    def list_multivariate_datasets(self) -> list[str]:
        """Multivariate archive datasets (ucr_uea.py:155-173)."""
        import csv

        if self._list_multivariate_filename is None:
            # either no mirror at all, or only baseline_scores_file was
            # injected — in both cases there is no multivariate CSV
            raise ValueError(
                "summaryMultivariate.csv unavailable — construct with "
                "base_url pointing at an archive mirror to list "
                "multivariate datasets"
            )
        with open(self._list_multivariate_filename, "r") as f:
            return [row["Problem"] for row in csv.DictReader(f, delimiter=",")]

    def list_datasets(self) -> list[str]:
        """All archive datasets (ucr_uea.py:175-195)."""
        return self.list_univariate_datasets() + self.list_multivariate_datasets()

    def list_cached_datasets(self) -> list[str]:
        """Locally cached (downloaded + extracted) datasets
        (ucr_uea.py:197-209)."""
        return [
            d for d in os.listdir(self._data_dir)
            if os.path.isdir(os.path.join(self._data_dir, d))
            and d not in self._ignore_list
        ]

    def _has_files(self, dataset_name: str, ext: str | None = None) -> bool:
        """Both TRAIN and TEST files present in the cache for ``ext``
        (ucr_uea.py:312-339)."""
        if ext is None:
            return (self._has_files(dataset_name, "txt")
                    or self._has_files(dataset_name, "arff"))
        dataset_name = self._filenames.get(dataset_name, dataset_name)
        base = os.path.join(self._data_dir, dataset_name, dataset_name)
        return (os.path.exists(f"{base}_TRAIN.{ext}")
                and os.path.exists(f"{base}_TEST.{ext}"))

    def load_dataset(self, dataset_name: str):
        """Fetch (or reuse the cache), extract, and parse one dataset
        (ucr_uea.py:211-310).  Returns (X_train, y_train, X_test,
        y_test) numpy arrays, or four Nones + RuntimeWarning on failure.
        """
        import shutil
        import warnings

        dataset_name = self._filenames.get(dataset_name, dataset_name)
        full_path = os.path.join(self._data_dir, dataset_name)
        if not self._has_files(dataset_name) or not self.use_cache:
            shutil.rmtree(full_path, ignore_errors=True)
            url = f"{self.base_url}/Downloads/{dataset_name}.zip"
            if extract_from_zip_url(url, target_dir=full_path) is None:
                warnings.warn(
                    f'dataset "{dataset_name}" could not be downloaded or '
                    "extracted", category=RuntimeWarning, stacklevel=2,
                )
                return None, None, None, None
        try:
            base = os.path.join(full_path, dataset_name)
            if self._has_files(dataset_name, ext="txt"):
                X_train, y_train = _parse_txt_uea(f"{base}_TRAIN.txt")
                X_test, y_test = _parse_txt_uea(f"{base}_TEST.txt")
            elif self._has_files(dataset_name, ext="arff"):
                X_train, y_train = _parse_arff_uea(f"{base}_TRAIN.arff")
                X_test, y_test = _parse_arff_uea(f"{base}_TEST.arff")
            else:
                warnings.warn(
                    f'dataset "{dataset_name}" has neither TXT nor ARFF '
                    "files", category=RuntimeWarning, stacklevel=2,
                )
                return None, None, None, None
            return X_train, y_train, X_test, y_test
        except Exception as exc:
            warnings.warn(
                f'dataset "{dataset_name}" downloaded but not parsed: {exc}',
                category=RuntimeWarning, stacklevel=2,
            )
            return None, None, None, None

    def load_dataset_spark(self, spark: SparkSession, dataset_name: str):
        """Spark-first variant: same fetch/cache flow, but the extracted
        files are scanned by the DISTRIBUTED text loaders — returns
        (train_df, test_df) ts DataFrames, or (None, None).  This is the
        path a 100-TB deployment uses: the driver only bootstraps the
        cache; parsing parallelizes across the cluster."""
        import shutil
        import warnings

        dataset_name = self._filenames.get(dataset_name, dataset_name)
        # availability only: download/extract if needed, but skip
        # load_dataset's full driver-side numpy parse of both splits
        if not self._has_files(dataset_name) or not self.use_cache:
            full_path = os.path.join(self._data_dir, dataset_name)
            shutil.rmtree(full_path, ignore_errors=True)
            url = f"{self.base_url}/Downloads/{dataset_name}.zip"
            if extract_from_zip_url(url, target_dir=full_path) is None:
                warnings.warn(
                    f'dataset "{dataset_name}" could not be downloaded or '
                    "extracted", category=RuntimeWarning, stacklevel=2,
                )
                return None, None
        if not self._has_files(dataset_name):
            warnings.warn(
                f'dataset "{dataset_name}" has neither TXT nor ARFF files',
                category=RuntimeWarning, stacklevel=2,
            )
            return None, None
        base = os.path.join(self._data_dir, dataset_name, dataset_name)
        loader = load_ucr_txt if self._has_files(dataset_name, "txt") \
            else load_arff_uea
        ext = "txt" if self._has_files(dataset_name, "txt") else "arff"
        return (loader(spark, f"{base}_TRAIN.{ext}"),
                loader(spark, f"{base}_TEST.{ext}"))

    def cache_all(self) -> None:
        """Prefetch every archive dataset (ucr_uea.py:341-349)."""
        import warnings

        for name in self.list_datasets():
            try:
                self.load_dataset(name)
            except Exception as exc:
                warnings.warn(f'could not cache "{name}": {exc}',
                              category=RuntimeWarning, stacklevel=2)


class CachedDatasets:
    """Statically cached datasets (tslearn/datasets/cached.py:4-87).

    The reference bundles the Trace dataset as an .npz inside its
    package; this repo does not redistribute that data, so the default
    cache directory is empty — ``path`` points the accessor at any
    directory of ``<name>.npz`` files with X_train/y_train/X_test/y_test
    arrays (the reference's exact on-disk format).
    """

    def __init__(self, path: str | None = None):
        self.path = path or os.path.join(
            os.path.dirname(__file__), ".cached_datasets"
        )

    def list_datasets(self) -> list[str]:
        """Names of available .npz datasets (cached.py:26-45)."""
        if not os.path.isdir(self.path):
            return []
        return [f[: f.rfind(".")] for f in os.listdir(self.path)
                if f.endswith(".npz")]

    def load_dataset(self, dataset_name: str):
        """Load (X_train, y_train, X_test, y_test) from the npz
        (cached.py:47-87); IOError if absent, like the reference."""
        import numpy as np

        fname = os.path.join(self.path, dataset_name + ".npz")
        if not os.path.exists(fname):
            raise IOError(
                f"no cached dataset {dataset_name!r} under {self.path} "
                "(this package does not redistribute the reference's "
                "bundled data; drop compatible .npz files there or pass "
                "path=...)"
            )
        npz = np.load(fname)
        return (npz["X_train"], npz["y_train"],
                npz["X_test"], npz["y_test"])


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
