"""Ordered/windowed analytics — SURVEY §2.5 (W1-W5, W8, W11) and the
TWR pipeline of the reference Dashboard (1_Dashboard.py:302-356).

Long-format + window functions everywhere: the reference pivots to a
wide ts×ticker matrix only because pandas lacks partitionBy; in Spark
the long form keeps the data partitionable by key at any scale (a
window partitioned by ticker shuffles once and parallelizes across
tickers; a wide matrix would serialize on one node).

Float determinism: daily group-sums go through DECIMAL (order-
insensitive); running/prefix sums accumulate in frame order, which is
identical in any engine given the same total ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..derive import DEC, dsum
from .relational import START_CASH, signed_qty


def daily_position_series(trades: DataFrame) -> DataFrame:
    """W1/A5 — running share count per (user, ticker) over trade days
    (1_Dashboard.py:115-116: pivot_table sum + cumsum, kept long).
    qty is integer-valued → prefix sums are exact in double."""
    daily = (trades
             .groupBy("user", "ticker", F.to_date("ts").alias("d"))
             .agg(F.sum(signed_qty()).alias("qty_delta")))
    w = (W.partitionBy("user", "ticker").orderBy("d")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return daily.select("user", "ticker", "d",
                        F.sum("qty_delta").over(w).alias("cum_qty"))


def cash_series(trades: DataFrame, start_cash: float = START_CASH) -> DataFrame:
    """W2/A6 — daily net cash flow per user + running cash
    (1_Dashboard.py:94-127). Daily flow is an order-insensitive decimal
    sum; the running sum then accumulates decimals in date order."""
    flow = (F.when(F.col("side") == "SELL", F.col("qty") * F.col("price"))
            .otherwise(-F.col("qty") * F.col("price")) - F.col("fee"))
    daily = (trades
             .groupBy("user", F.to_date("ts").alias("d"))
             .agg(dsum(flow).alias("flow_dec")))
    w = (W.partitionBy("user").orderBy("d")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return daily.select(
        "user", "d",
        F.col("flow_dec").cast("double").alias("cash_flow"),
        (F.lit(start_cash).cast(DEC) + F.sum("flow_dec").over(w))
        .cast("double").alias("cash"))


def daily_returns(prices: DataFrame) -> DataFrame:
    """W3/W4 — lag + pct-change per ticker with ±inf/NaN→0 cleanup
    (1_Dashboard.py:312: pct_change().replace([inf,-inf],nan).fillna(0))."""
    w = W.partitionBy("ticker").orderBy("ts")
    prev = F.lag("close", 1).over(w)
    ret = F.when(prev.isNull() | (prev == 0), F.lit(0.0)) \
           .otherwise(F.col("close") / prev - 1)
    return prices.select("ticker", "ts",
                         prev.alias("prev_close"),
                         ret.alias("ret"))


def twr_index(prices: DataFrame) -> DataFrame:
    """W5 — time-weighted-return index per ticker:
    cumprod(1+ret)·100 via exp(sum(ln(1+ret))) (no native cumprod;
    1_Dashboard.py:329). Rounded to 6dp — ln/exp may differ in the
    last ulp across libm implementations."""
    rets = daily_returns(prices)
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    # guard ret <= -1 (total loss) → ln undefined → treat as -100%
    safe = F.when(F.col("ret") <= -1, F.lit(None)).otherwise(F.log(F.lit(1.0) + F.col("ret")))
    return rets.select(
        "ticker", "ts", "ret",
        F.round(F.exp(F.sum(safe).over(w)) * 100, 6).alias("twr_index"))


def normalize_to_100(prices: DataFrame) -> DataFrame:
    """W11 — series / first value · 100 (1_Dashboard.py:24-25, 341)."""
    w = W.partitionBy("ticker").orderBy("ts") \
         .rowsBetween(W.unboundedPreceding, W.currentRow)
    base = F.first("close", ignorenulls=True).over(w)
    return prices.select(
        "ticker", "ts",
        F.when(base == 0, F.lit(None))
         .otherwise(F.round(F.col("close") / base * 100, 6)).alias("idx"))


def first_holding_day(trades: DataFrame) -> DataFrame:
    """W8 — first day any holdings exist per user
    (1_Dashboard.py:316-324: have_any.idxmax())."""
    daily = (trades
             .groupBy("user", F.to_date("ts").alias("d"))
             .agg(F.sum(signed_qty()).alias("qty_delta")))
    w = (W.partitionBy("user").orderBy("d")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = daily.select("user", "d", F.sum("qty_delta").over(w).alias("cum"))
    return (cum.filter(F.col("cum") > 0)
            .groupBy("user").agg(F.min("d").alias("first_day")))


def benchmark_overlay(port: DataFrame, bench: DataFrame) -> DataFrame:
    """J4 + W9 + W11 — the Dashboard's OMXSPI overlay
    (1_Dashboard.py:349-356): left-join a benchmark close series onto
    the portfolio calendar, forward-fill the benchmark's gaps, and
    normalize BOTH series to 100 at their first observation.

    Inputs are single series (ts, close) — the Dashboard overlays one
    portfolio against one index. At scale this runs per portfolio: add
    the key to both sides and swap the global orderBy windows for
    partitionBy(key).orderBy(ts) — every expression below is already
    key-local. Normalization is close/first·100 in one IEEE divide +
    multiply; the benchmark index stays null before its first
    observation (the reference's NaN rows)."""
    b = bench.select(F.col("ts").alias("b_ts"),
                     F.col("close").alias("bench_close"))
    joined = port.join(b, port.ts == b.b_ts, "left").drop("b_ts")
    w = W.orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    filled = F.last("bench_close", ignorenulls=True).over(w)
    port_base = F.first("close", ignorenulls=True).over(w)
    bench_base = F.first("bench_close", ignorenulls=True).over(
        W.orderBy("ts").rowsBetween(W.unboundedPreceding,
                                    W.unboundedFollowing))
    # bench_base uses the FULL frame first: rows before the benchmark's
    # first print still normalize against it once filled is non-null
    return joined.select(
        "ts",
        F.round(F.col("close") / port_base * 100, 6).alias("port_idx"),
        F.when(filled.isNotNull(),
               F.round(filled / bench_base * 100, 6)).alias("bench_idx"))


def price_with_fallback(primary: DataFrame, fallback: DataFrame) -> DataFrame:
    """§2.11 source-fallback chain (2_Trades.py:30-42, 115-117:
    yfinance → yf.download → DB-latest) as a relation: per-ticker
    latest close from the primary source COALESCEd with the fallback
    source's latest, with provenance. Full-outer join of two tiny
    per-ticker aggregates — broadcast-able both ways; at 100 TB each
    side is one map-side-combined aggregate of its fact."""
    p = primary.groupBy("ticker").agg(
        F.max_by("close", "ts").alias("p_close"), F.max("ts").alias("p_ts"))
    fb = fallback.groupBy("ticker").agg(
        F.max_by("close", "ts").alias("f_close"), F.max("ts").alias("f_ts"))
    return (p.join(fb, "ticker", "full_outer")
            .select("ticker",
                    F.coalesce("p_close", "f_close").alias("close"),
                    F.coalesce("p_ts", "f_ts").alias("ts"),
                    F.when(F.col("p_close").isNotNull(), F.lit("primary"))
                     .otherwise(F.lit("fallback")).alias("source")))
