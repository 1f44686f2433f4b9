"""Event-stream batch analytics over the harness `events` table:
tumbling windows, session windows, JSON props extraction
(SURVEY §2.12 extension tier; streaming variants in streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..derive import dsum


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact value sum.
    Batch form of `window(ts, '1 hour')` — date_trunc is the same
    bucketing and stays in whole-stage codegen."""
    return (events
            .groupBy(F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
                     "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(dsum(F.col("value")), 2).cast("double").alias("sum_value")))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events are ≤ gap apart (gaps-and-islands; batch twin of
    Structured Streaming's session_window).

    Single shuffle on user_id; the two windows share one sort — the
    classic scalable sessionization plan.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    prev_ts = F.lag("ts").over(w)
    is_new = (prev_ts.isNull() |
              (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > gap_s))
    sess = F.sum(is_new.cast("long")).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (events
            .withColumn("session_id", sess)
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events")))


def props_extract(events: DataFrame) -> DataFrame:
    """JSON extraction from the props string column
    (get_json_object — stays JVM-side, no Python UDF)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (events
            .select(F.col("event_id"), k.alias("k"))
            .groupBy((F.col("k") % 10).alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))
