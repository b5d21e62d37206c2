"""tslearn_spark — a PySpark-native time-series analytics engine.

Re-implements the query/data-processing capabilities of the reference
time-series toolkit (rtavenar/tslearn) on Apache Spark, Spark-first:

* the primary representation is a DataFrame with one row per series and a
  nested ``array<array<double>>`` ``values`` column (SURVEY.md §1.5) —
  per-series transforms (scaling, PAA, SAX, resampling, envelopes) are
  shuffle-free higher-order-function expressions that stay inside
  whole-stage codegen;
* cross-series similarity (DTW family, GAK, soft-DTW, LCSS, NCC) runs as
  vectorized-numpy kernels inside Arrow-batched pandas UDFs over pair
  joins with symmetry pruning and LB_Keogh pre-filtering;
* iterative algorithms (k-means, DBA, KShape) are driver-orchestrated
  sequences of Spark jobs with broadcast of the (tiny) model state.
"""

__version__ = "0.1.0"

from tslearn_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables", "__version__"]
