"""Per-series scalers + resampler as native Spark SQL expressions.

Reference semantics: tslearn/preprocessing/preprocessing.py:15-298.

Spark-first design: each transform is a *map-only* higher-order-function
expression over the nested ``values`` column — zero shuffle, whole-stage
codegen, embarrassingly parallel at any scale.  The reference iterates
over a dense 3-D tensor; we never materialize one.

Expression-duplication note (matters at scale AND locally): Catalyst's
CollapseProject inlines a computed column into every reference site, so
naively referencing per-series stats inside a per-element lambda
re-evaluates the whole stats aggregate once *per element* — and chained
transforms (scale -> PAA -> SAX) compound multiplicatively.  Every
expression here therefore **let-binds** shared subexpressions via the
``transform(array(<expr>), x -> ...)[0]`` idiom: the bound value is
evaluated exactly once per row no matter how the projection collapses.

All stats are NaN-aware like the reference (numpy nanmean/nanstd/nanmin):
NaN values are excluded from the statistics and pass through unscaled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from tslearn_spark.bases import TimeSeriesBaseEstimator

_NDIMS = "size({v}[0])"


def _stats_expr(v: str) -> str:
    """Per-dim struct(mean, var, mn, mx), each aggregate evaluated once.

    Population variance (numpy nanstd default, preprocessing.py:276-281).
    """
    ndims = _NDIMS.format(v=v)
    return f"""
      transform(sequence(0, {ndims} - 1), d ->
        transform(array(filter(transform({v}, r -> r[d]), x -> NOT isnan(x))), dv ->
          transform(array(named_struct(
              's',  aggregate(dv, 0.0D, (a, x) -> a + x),
              'ss', aggregate(dv, 0.0D, (a, x) -> a + x * x),
              'n',  cast(size(dv) as double),
              'mn', array_min(dv),
              'mx', array_max(dv))), t ->
            named_struct(
              'mean', t.s / t.n,
              'var',  t.ss / t.n - (t.s / t.n) * (t.s / t.n),
              'mn',   t.mn,
              'mx',   t.mx)
          )[0]
        )[0]
      )
    """


def scaler_mean_variance(values_col: str = "values", mu: float = 0.0, std: float = 1.0) -> Column:
    """z-normalize each series per dim to mean ``mu`` / std ``std``.

    Reference: TimeSeriesScalerMeanVariance (preprocessing.py:204-298);
    zero std -> 1 guard at preprocessing.py:281.  Stats are let-bound:
    one evaluation per row regardless of series length.
    """
    v = values_col
    return F.expr(
        f"""
        transform(array({_stats_expr(v)}), st ->
          transform({v}, row ->
            transform(row, (x, d) ->
              transform(array(CASE WHEN sqrt(greatest(st[d].var, 0.0D)) = 0.0D THEN 1.0D
                                   ELSE sqrt(greatest(st[d].var, 0.0D)) END), sd ->
                {mu}D + ({std}D * (x - st[d].mean)) / sd
              )[0]
            )
          )
        )[0]
        """
    )


def scaler_min_max(values_col: str = "values",
                   value_range: tuple[float, float] = (0.0, 1.0)) -> Column:
    """Per-series per-dim min-max scaling to [lo, hi].

    Reference: TimeSeriesScalerMinMax (preprocessing.py:103-201); zero
    range -> 1 guard.
    """
    lo, hi = value_range
    v = values_col
    return F.expr(
        f"""
        transform(array({_stats_expr(v)}), st ->
          transform({v}, row ->
            transform(row, (x, d) ->
              {lo}D + ({hi - lo}D * (x - st[d].mn))
                    / (CASE WHEN st[d].mx - st[d].mn = 0.0D THEN 1.0D
                            ELSE st[d].mx - st[d].mn END)
            )
          )
        )[0]
        """
    )


def transform_mean_variance(df: DataFrame, values_col: str = "values", mu: float = 0.0,
                            std: float = 1.0, out_col: str | None = None) -> DataFrame:
    out = out_col or values_col
    return df.withColumn(out, scaler_mean_variance(values_col, mu, std))


def transform_min_max(df: DataFrame, values_col: str = "values",
                      value_range: tuple[float, float] = (0.0, 1.0),
                      out_col: str | None = None) -> DataFrame:
    out = out_col or values_col
    return df.withColumn(out, scaler_min_max(values_col, value_range))


def resample(df: DataFrame, sz: int, values_col: str = "values",
             out_col: str | None = None) -> DataFrame:
    """Linear interpolation of each series to ``sz`` equally spaced points.

    Reference: TimeSeriesResampler (preprocessing.py:15-100) — interp1d
    'slinear' on a normalized [0,1] axis; sz=1 degenerates to nanmean.
    The source array is let-bound so chained upstream transforms are
    evaluated once, not once per output point.
    """
    v = values_col
    out = out_col or values_col
    if sz == 1:
        expr = f"""
          transform(array({v}), src ->
            array(transform(sequence(0, size(src[0]) - 1), d ->
              transform(array(filter(transform(src, r -> r[d]), x -> NOT isnan(x))), dv ->
                aggregate(dv, 0.0D, (a, x) -> a + x) / size(dv)
              )[0]
            ))
          )[0]
        """
    else:
        expr = f"""
          transform(array({v}), src ->
            transform(sequence(0, {sz - 1}), i ->
              transform(sequence(0, size(src[0]) - 1), d ->
                transform(array(i * (size(src) - 1) / {sz - 1.0}D), p ->
                  CASE WHEN size(src) = 1 THEN src[0][d]
                  ELSE src[cast(floor(p) as int)][d] * (1.0D - (p - floor(p)))
                     + src[cast(ceil(p) as int)][d] * (p - floor(p))
                  END
                )[0]
              )
            )
          )[0]
        """
    return df.withColumn(out, F.expr(expr))


# ---------------------------------------------------------------------------
# reference-named estimator classes (drop-in import parity): thin
# stateless wrappers over the expression layer above — fit() is a no-op
# because the scalers/resampler are per-series (no dataset-level state),
# exactly like the reference classes
# ---------------------------------------------------------------------------

class TimeSeriesResampler(TimeSeriesBaseEstimator):
    """Estimator twin of the reference TimeSeriesResampler
    (preprocessing.py:15-100): resample each series to ``sz`` points."""

    def __init__(self, sz: int = -1):
        self.sz = sz
        self.sz_ = sz  # reference attribute name

    def fit(self, df: DataFrame = None, y=None) -> "TimeSeriesResampler":
        return self

    def transform(self, df: DataFrame, values_col: str = "values",
                  out_col: str | None = None) -> DataFrame:
        from tslearn_spark.bases import transform_compat

        return transform_compat(
            df, lambda d: resample(d, self.sz_, values_col, out_col),
            out_col or values_col)

    def fit_transform(self, df: DataFrame, y=None, **kw) -> DataFrame:
        return self.transform(df, **kw)


class TimeSeriesScalerMinMax(TimeSeriesBaseEstimator):
    """Estimator twin of TimeSeriesScalerMinMax (preprocessing.py:103-201)."""

    def _more_tags(self):
        # reference preprocessing.py:200-201
        return {"allow_nan": True}

    def __init__(self, value_range: tuple[float, float] = (0.0, 1.0)):
        self.value_range = tuple(value_range)

    def fit(self, df: DataFrame = None, y=None) -> "TimeSeriesScalerMinMax":
        return self

    def transform(self, df: DataFrame, values_col: str = "values",
                  out_col: str | None = None) -> DataFrame:
        from tslearn_spark.bases import transform_compat

        return transform_compat(
            df, lambda d: transform_min_max(d, values_col, self.value_range,
                                            out_col),
            out_col or values_col)

    def fit_transform(self, df: DataFrame, y=None, **kw) -> DataFrame:
        return self.transform(df, **kw)


class TimeSeriesScalerMeanVariance(TimeSeriesBaseEstimator):
    """Estimator twin of TimeSeriesScalerMeanVariance
    (preprocessing.py:204-298)."""

    def _more_tags(self):
        # reference preprocessing.py:297-298
        return {"allow_nan": True}

    def __init__(self, mu: float = 0.0, std: float = 1.0):
        self.mu = mu
        self.std = std

    def fit(self, df: DataFrame = None, y=None) -> "TimeSeriesScalerMeanVariance":
        return self

    def transform(self, df: DataFrame, values_col: str = "values",
                  out_col: str | None = None) -> DataFrame:
        from tslearn_spark.bases import transform_compat

        return transform_compat(
            df, lambda d: transform_mean_variance(d, values_col, self.mu,
                                                  self.std, out_col),
            out_col or values_col)

    def fit_transform(self, df: DataFrame, y=None, **kw) -> DataFrame:
        return self.transform(df, **kw)
