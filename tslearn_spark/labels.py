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
    def __init__(self, single_column_if_binary: bool = False):
        self.single_column_if_binary = single_column_if_binary
        self.classes_: list[str] | None = None

    def fit(self, labels: DataFrame, label_col: str = "label") -> "LabelCategorizer":
        self.classes_ = [
            r[label_col]
            for r in labels.select(label_col).distinct().orderBy(label_col).collect()
        ]
        return self

    def transform(self, labels: DataFrame, label_col: str = "label") -> DataFrame:
        assert self.classes_ is not None
        if self.single_column_if_binary and len(self.classes_) == 2:
            return labels.withColumn(
                "onehot",
                F.array(
                    F.when(F.col(label_col) == self.classes_[0], 1.0).otherwise(-1.0)
                ),
            )
        arr = F.array(*[
            F.when(F.col(label_col) == c, 1.0).otherwise(0.0) for c in self.classes_
        ])
        return labels.withColumn("onehot", arr)

    def inverse_transform(self, df: DataFrame, onehot_col: str = "onehot") -> DataFrame:
        assert self.classes_ is not None
        classes = self.classes_
        if self.single_column_if_binary and len(classes) == 2:
            return df.withColumn(
                "label",
                F.when(F.col(onehot_col)[0] > 0, classes[0]).otherwise(classes[1]),
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
