"""Unified batch/streaming windowed aggregation builders.

Each builder accepts EITHER a batch or a streaming DataFrame and returns
the same logical shape -- Spark's unified model makes the streaming
variant a watermark away from the batch one.  The batch expressions of
these shapes (with DuckDB oracles) live in ``workloads/timeseries.py``;
these builders are the incremental versions.

Semantics:
 * watermarks bound state: late rows beyond ``watermark`` are dropped
   and window state older than the watermark is evicted -- mandatory for
   unbounded streams (append output mode requires it)
 * ``session_stats`` uses the native ``session_window`` (gap-merged,
   state-backed) -- the streaming twin of the batch gap-sessionize
   (operators/temporal.py)

Scale notes (100 TB/day posture):
 * state lives in the state store keyed by (window, keys); key
   cardinality = windows x group keys, so state is bounded by watermark
   horizon, not stream length
 * aggregations are partial (pre-shuffle) + final, same as batch; one
   shuffle per micro-batch on the grouping key
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark)
    return df


def _window_bounds(w: Column) -> list[Column]:
    return [w.start.alias("window_start"), w.end.alias("window_end")]


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    width: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Non-overlapping fixed windows: count + distinct users per key."""
    w = F.window(F.col(ts_col), width)
    return (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w, *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(*_window_bounds(F.col("window")), *keys, "n_events")
    )


def hopping_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = (),
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Overlapping (sliding) windows; each row lands in width/slide windows."""
    w = F.window(F.col(ts_col), width, slide)
    return (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w, *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(*_window_bounds(F.col("window")), *keys, "n_events")
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Native session windows: activity periods separated by ``gap`` of
    silence, merged incrementally in the state store when streaming."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w, *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(*_window_bounds(F.col("session_window")), *keys, "n_events")
    )
