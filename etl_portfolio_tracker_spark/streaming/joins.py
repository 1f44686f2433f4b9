"""Stream-stream joins (SURVEY §2.12 extension tier).

The reference's closest analog is the driver-side price lookup per
trade (2_Trades.py:115-117: fetch last close when a trade is
entered). In a streaming engine that lookup is a stream-stream
interval join: trades arrive on one stream, price ticks on another,
and each trade picks up the ticks for its ticker within a bounded
look-back window.

Scale shape: both sides are watermarked, so the join state store
keeps only `watermark + tolerance` of history per key — bounded
memory per executor regardless of stream length. The equality key
(ticker) hash-partitions both sides to the same tasks; the time-range
predicate prunes within the partition. Without BOTH the watermarks
and the time bound, a stream-stream join's state grows forever —
that is the failure mode this module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_trades_with_ticks(trades: DataFrame, ticks: DataFrame,
                             tolerance: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Inner stream-stream join: each trade × the price ticks of the
    same ticker in [trade_ts − tolerance, trade_ts].

    Inner join: append-mode output as soon as both sides arrive.
    (A left-outer variant only needs the same watermarks — Spark
    emits unmatched trades after `watermark + tolerance` passes.)
    Downstream, the batch as-of semantics (latest tick ≤ trade) is a
    max_by over (ticker, trade_ts) of this join's output."""
    t = trades.withWatermark("ts", watermark).alias("t")
    p = ticks.withWatermark("ts", watermark).alias("p")
    cond = F.expr(
        "t.ticker = p.ticker"
        f" AND p.ts >= t.ts - INTERVAL {tolerance}"
        " AND p.ts <= t.ts")
    return (t.join(p, cond, "inner")
            .select(F.col("t.ticker").alias("ticker"),
                    F.col("t.ts").alias("trade_ts"),
                    F.col("t.qty").alias("qty"),
                    F.col("p.ts").alias("tick_ts"),
                    F.col("p.close").alias("tick_close")))


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame,
                           key: str = "ticker") -> DataFrame:
    """Stream-static join: every micro-batch probes a broadcast of
    the (batch) dimension — no state store at all, because the static
    side is re-resolved per micro-batch (so a dim refresh between
    batches is picked up automatically). The streaming twin of the J6
    dict-lookup enrichment."""
    return stream.join(F.broadcast(dim), key, "left")
