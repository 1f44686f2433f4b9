"""W6/W7 — the stateful ordered fold: running weighted-average cost
(GAV) with clamped sells + realized PnL (reference
app/services/portfolio.py:18-41 `running_avg_costs` and :74-110
`realized_pnl_avgcost`, shared as one kernel per SURVEY §7 tier D).

Semantics per (user, ticker), trades scanned in (ts, id) order
(portfolio.py:23,87), state (q, avg, realized) starting (0, 0, 0):
  BUY:  avg ← (q·avg + qty·price + fee) / (q + qty);  q ← q + qty
  SELL: if q ≤ 0 → skipped entirely (portfolio.py:104-105)
        else sell = min(qty, q) (clamp, portfolio.py:37,106);
             realized ← realized + (price − avg)·sell;  q ← q − sell

Not expressible as closed-form window algebra (the sell clamp makes
the recurrence non-linear) → grouped-map Pandas UDF (`applyInPandas`):
one Arrow batch per key, a tight Python loop inside, parallel across
keys — the one legitimate Python-side operator in the engine
(SURVEY §2.10 U3). Each key's fold is a single task → float order is
sequential and deterministic, which keeps results bit-identical to
the reference's Python loop AND to the DuckDB recursive-CTE oracle
(all three evaluate the same left-associated IEEE expressions).

Scale: one shuffle on (user, ticker); state is O(1) per key; keys are
independent so 1000 executors fold 1000s of keys concurrently. Skewed
key (one user-ticker with billions of trades) is the only hazard —
that's inherent to ordered folds; mitigate upstream by ledger
compaction (checkpointing state per epoch), see streaming/stateful.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FOLD_SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("ticker", T.StringType()),
    T.StructField("qty", T.DoubleType()),
    T.StructField("avg_cost", T.DoubleType()),
    T.StructField("realized", T.DoubleType()),
])


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
    q = 0.0
    avg = 0.0
    realized = 0.0
    for side, qty, price, fee in zip(pdf["side"].values, pdf["qty"].values,
                                     pdf["price"].values, pdf["fee"].values):
        qty = float(qty)
        price = float(price)
        fee = float(fee)
        if side == "BUY":
            avg = (q * avg + qty * price + fee) / (q + qty)
            q = q + qty
        else:  # SELL
            if q <= 0:
                continue  # sell-when-flat is skipped (portfolio.py:104-105)
            sell = qty if qty < q else q  # min(qty, q) clamp
            realized = realized + (price - avg) * sell
            q = q - sell
    return pd.DataFrame({"user": [pdf["user"].iloc[0]],
                         "ticker": [pdf["ticker"].iloc[0]],
                         "qty": [q], "avg_cost": [avg], "realized": [realized]})


def portfolio_fold(trades: DataFrame) -> DataFrame:
    """Final (qty, avg_cost, realized) per (user, ticker)."""
    return (trades
            .select("user", "ticker", "ts", "id", "side", "qty", "price", "fee")
            .groupBy("user", "ticker")
            .applyInPandas(_fold_group, schema=FOLD_SCHEMA))


def avg_costs(trades: DataFrame) -> DataFrame:
    """W6 emission — reference `running_avg_costs` keeps qty > 0
    (portfolio.py:40)."""
    from pyspark.sql import functions as F
    return (portfolio_fold(trades)
            .filter(F.col("qty") > 0)
            .select("user", "ticker", "qty",
                    F.col("avg_cost").alias("avg_buy_price")))


def overview_full(trades: DataFrame, prices: DataFrame) -> DataFrame:
    """The flagship domain query (portfolio.py:113-127): positions (A1)
    ⟕ avg_costs (fold) ⟕ latest_prices (J1) + market_value / invested /
    unreal_pnl / pnl_pct with division guard (F13/F14).

    Join inputs are all bounded by |users|×|tickers| → broadcast joins;
    the only fact-sized work is the two upstream aggregations.
    """
    from pyspark.sql import functions as F
    from .relational import latest_prices, positions
    pos = positions(trades)
    costs = avg_costs(trades)
    last = latest_prices(prices)
    invested = F.col("qty") * F.col("avg_buy_price")
    unreal = (F.col("last_close") - F.col("avg_buy_price")) * F.col("qty")
    return (pos.join(costs.select("user", "ticker", "avg_buy_price"),
                     ["user", "ticker"], "left")
            .join(last, "ticker", "left")
            .withColumn("market_value", F.col("qty") * F.col("last_close"))
            .withColumn("invested", invested)
            .withColumn("unreal_pnl", unreal)
            .withColumn("pnl_pct",
                        F.when(invested > 0, unreal / invested * 100))
            .select("user", "ticker", "qty", "avg_buy_price", "last_close",
                    "market_value", "invested", "unreal_pnl", "pnl_pct"))


def realized_pnl(trades: DataFrame) -> DataFrame:
    """W7 emission — per-user total realized PnL (portfolio.py:74-110).
    Per-ticker finals are deterministic doubles; the cross-ticker sum
    goes through DECIMAL for order-insensitivity, rounded to 4dp
    because double→decimal conversion itself carries 1-ulp noise at
    scale 10 across engines."""
    from pyspark.sql import functions as F
    from ..derive import dsum
    return (portfolio_fold(trades)
            .groupBy("user")
            .agg(F.round(dsum(F.col("realized")), 4)
                 .cast("double").alias("realized_pnl")))
