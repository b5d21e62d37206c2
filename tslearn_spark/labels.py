"""LabelCategorizer twin — label <-> one-hot, invertible.

Reference: tslearn/utils/utils.py:528-634.  Implemented as pure
DataFrame ops (distinct + broadcast join + pivot-style array), no MLlib
dependency: categories are the sorted distinct labels (sorted(set(y)),
utils.py:585); single_column mode emits +1/-1 for binary problems.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from tslearn_spark.bases import BaseModelPackage, TimeSeriesBaseEstimator


class LabelCategorizer(BaseModelPackage, TimeSeriesBaseEstimator):
    def _more_tags(self):
        # reference utils.py:633-634
        return {"X_types": ["1dlabels"]}

    def __init__(self, single_column_if_binary: bool = False,
                 forward_match: dict | None = None,
                 backward_match=None):
        # forward/backward_match are the reference's fitted mapping
        # exposed as constructor params (utils.py:572-580) so sklearn
        # clone(get_params()) reconstructs a fitted instance; passing
        # them pre-fits the categorizer
        self.single_column_if_binary = single_column_if_binary
        self.forward_match = forward_match
        self.backward_match = backward_match
        self.classes_: list[str] | None = (
            [str(c) for c in backward_match] if backward_match is not None
            else None
        )

    def _labels_df(self, labels, label_col):
        """Array-like y (the reference's protocol, utils.py:528-634) ->
        (series_id, label) DataFrame on the active session."""
        if isinstance(labels, DataFrame):
            return labels, False
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "array-like labels require an active SparkSession"
            )
        df = spark.createDataFrame(
            [(int(i), str(v)) for i, v in enumerate(labels)],
            f"series_id long, {label_col} string",
        )
        return df, True

    def fit(self, labels, label_col: str = "label") -> "LabelCategorizer":
        labels, _ = self._labels_df(labels, label_col)
        self.classes_ = [
            r[label_col]
            for r in labels.select(label_col).distinct().orderBy(label_col).collect()
        ]
        # reference fit resets then rebuilds the mapping (utils.py:578-588)
        self.forward_match = {c: i for i, c in enumerate(self.classes_)}
        self.backward_match = list(self.classes_)
        return self

    def transform(self, labels, label_col: str = "label") -> DataFrame:
        assert self.classes_ is not None
        labels, was_array = self._labels_df(labels, label_col)
        from tslearn_spark.bases import collect_col

        if was_array:
            return collect_col(self._transform_df(labels, label_col),
                               True, "onehot")
        return self._transform_df(labels, label_col)

    def fit_transform(self, labels, label_col: str = "label"):
        return self.fit(labels, label_col).transform(labels, label_col)

    def _transform_df(self, labels: DataFrame, label_col: str) -> DataFrame:
        if self.single_column_if_binary and len(self.classes_) == 2:
            # reference transform keeps COLUMN 0 of the one-hot matrix
            # (utils.py:598-600): 1.0 for the first class, 0.0 for the
            # other — not a +/-1 encoding
            return labels.withColumn(
                "onehot",
                F.array(
                    F.when(F.col(label_col) == self.classes_[0], 1.0).otherwise(0.0)
                ),
            )
        arr = F.array(*[
            F.when(F.col(label_col) == c, 1.0).otherwise(0.0) for c in self.classes_
        ])
        return labels.withColumn("onehot", arr)

    def inverse_transform(self, df, onehot_col: str = "onehot") -> DataFrame:
        assert self.classes_ is not None
        if not isinstance(df, DataFrame):
            # reference protocol: one-hot array in -> label array out
            from pyspark.sql import SparkSession

            from tslearn_spark.bases import _smart_labels

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "array-like input requires an active SparkSession"
                )
            arr_df = spark.createDataFrame(
                [(int(i), [float(v) for v in row]) for i, row in enumerate(df)],
                f"series_id long, {onehot_col} array<double>",
            )
            out = self.inverse_transform(arr_df, onehot_col)
            rows = out.orderBy("series_id").collect()
            return _smart_labels([r["label"] for r in rows])
        classes = self.classes_
        if self.single_column_if_binary and len(classes) == 2:
            # reference inverse hstacks (y, 1-y) then argmaxes
            # (utils.py:607-609): class 0 wins iff y >= 0.5 (numpy argmax
            # takes the FIRST index on the y == 0.5 tie)
            return df.withColumn(
                "label",
                F.when(F.col(onehot_col)[0] >= 0.5, classes[0]).otherwise(classes[1]),
            )
        cases = F.array(*[F.lit(c) for c in classes])
        return df.withColumn(
            "label",
            cases[
                F.expr(
                    f"array_position({onehot_col}, array_max({onehot_col})) - 1"
                ).cast("int")
            ],
        )
