"""Windowed / watermarked streaming aggregation over ``events``.

The reference has no windows (SURVEY.md §2.8) — its only time
semantics are a 2 s staleness filter (P4) and a 10 s healing cadence
(R4). These operators are the idiomatic Spark generalization the
north star asks for: tumbling and sliding event-time windows with
late-data watermarks, runnable identically over a batch DataFrame or
a stream (same function, same plan semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _with_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Watermark-ready source: ``withWatermark`` requires TIMESTAMP,
    so a TIMESTAMP_NTZ event-time column (parquet timestamp[us]) is
    cast — wall clock is preserved (cast + date_format round-trip in
    the same session timezone)."""
    if isinstance(events.schema[col].dataType, TimestampNTZType):
        events = events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Tumbling event-time window counts per event_type. On a
    streaming frame the watermark bounds state (late rows beyond it
    are dropped — the generalization of the reference's 2 s staleness
    cutoff, raft/raft.go:88)."""
    src = (
        _with_event_time(events).withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    return (
        src.groupBy(F.window("ts", window_len), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Sliding event-time windows (each row lands in
    window_len/slide overlapping windows)."""
    src = (
        _with_event_time(events).withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    return (
        src.groupBy(F.window("ts", window_len, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based). Batch analog of
    ``F.session_window``; also works on streams with a watermark."""
    src = (
        _with_event_time(events).withWatermark("ts", "2 seconds")
        if events.isStreaming
        else events
    )
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "user_id",
            "n_events",
        )
    )
