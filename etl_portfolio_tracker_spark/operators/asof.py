"""General as-of join (SURVEY J2's general form): enrich each left
row with the most recent right-side value at or before its timestamp.

Spark has no native ASOF join; the scalable formulation is the
union-and-window trick:
  1. tag price rows (is_price=1) and probe rows (is_price=0),
  2. union on (key, ts), sort each key by (ts, is_price DESC) so a
     same-day price precedes the probe,
  3. `last(close, ignorenulls)` over the preceding frame,
  4. keep probe rows.
One shuffle on the key, one in-partition sort — same cost as a single
window, regardless of how asymmetric the two sides are. (The naive
range-join alternative is O(probes × prices-per-key).)

The DuckDB oracle uses its native ASOF LEFT JOIN — an independent
implementation agreeing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(probes: DataFrame, prices: DataFrame,
              key: str = "ticker", ts_col: str = "ts",
              value_col: str = "close",
              out_col: str = "asof_close") -> DataFrame:
    """probes(key, ts, …) ⟕ most recent prices(key, ts, value) ≤ ts."""
    probe_cols = probes.columns
    left = probes.select(
        *probe_cols,
        F.lit(None).cast("double").alias(value_col),
        F.lit(0).alias("_is_price"))
    right = prices.select(
        F.col(key),
        F.col(ts_col),
        *[F.lit(None).cast(dict(probes.dtypes)[c]).alias(c)
          for c in probe_cols if c not in (key, ts_col)],
        F.col(value_col),
        F.lit(1).alias("_is_price"))
    unioned = left.unionByName(right.select(left.columns))
    w = (W.partitionBy(key)
         .orderBy(F.col(ts_col).asc(), F.col("_is_price").desc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (unioned
            .withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))
            .filter(F.col("_is_price") == 0)
            .select(*probe_cols, out_col))
