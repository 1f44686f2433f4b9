"""Streaming windowed aggregations over event streams (SURVEY §2.12
extension tier): tumbling, sliding, session windows with watermarked
late-data handling. Batch twins live in operators/sessions.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..derive import dsum


def tumbling_counts(events: DataFrame, size: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling window per event_type; append-mode-compatible (the
    window closes when the watermark passes its end)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", size), "event_type")
            .agg(F.count("*").alias("n_events"),
                 dsum(F.col("value")).cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n_events", "sum_value"))


def sliding_value_avg(events: DataFrame, size: str = "1 hour",
                      slide: str = "15 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Sliding window mean value per event_type."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", size, slide), "event_type")
            .agg(F.avg("value").alias("avg_value"))
            .select(F.col("window.start").alias("win_start"),
                    "event_type", "avg_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: merge events with gaps ≤ `gap`
    (streaming twin of operators/sessions.sessionize)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .select("user_id", "session_start", "session_end", "n_events"))
