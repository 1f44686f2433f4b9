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
