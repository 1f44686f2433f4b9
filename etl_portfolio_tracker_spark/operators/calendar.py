"""Calendar alignment: spine + forward-fill (J5/W9) and linear
interpolation (W10) — the reference's `reindex(...).ffill()` and
`pivot.interpolate(limit_direction="both")`
(1_Dashboard.py:82, 106-127, 351).

Spark-first design: the spine is `sequence(min_ts, max_ts)` exploded
and cross-joined with the (small, distinct) ticker set, then a single
window per ticker does ffill / interpolation — no pandas, no pivot, no
driver-side loop. At 100 TB the spine join broadcasts the date range
(tiny) and the window shuffles once on ticker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def calendar_spine(prices: DataFrame) -> DataFrame:
    """Dense (ticker × every day in [global min ts, global max ts])
    frame, left-joined with observed closes (null on gap days)."""
    bounds = prices.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("ts"))
    tickers = prices.select("ticker").distinct()
    return (tickers.crossJoin(days)
            .join(prices, ["ticker", "ts"], "left"))


def ffill(spine: DataFrame, value_col: str = "close",
          out_col: str = "close_ffill") -> DataFrame:
    """W9 — per-ticker forward fill: last non-null over the preceding
    frame (reference reindex(method='ffill'))."""
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return spine.withColumn(out_col,
                            F.last(value_col, ignorenulls=True).over(w))


def interpolate(spine: DataFrame, value_col: str = "close",
                out_col: str = "close_interp",
                keys: tuple[str, ...] = ("ticker",)) -> DataFrame:
    """W10 — per-key linear interpolation of nulls, edges filled
    from the nearest non-null in either direction
    (pandas interpolate(limit_direction='both'), 1_Dashboard.py:82).
    `keys` is the series identity (default per-ticker; the portfolio
    TWR panel passes ("user", "ticker")).

    value = (prev·(dd−d1) + next·d1) / dd  with d1 = ts − prev_ts,
    dd = next_ts − prev_ts; leading gap → next, trailing gap → prev.
    Pure window algebra — the composite from SURVEY §2.5 W10 — so it
    stays JVM-side and scales.

    The numerator is computed in exact DECIMAL arithmetic and only the
    final division happens in double: `a + (b−a)·f` in floating point
    is FMA-contractible and engines disagree in the last ulp, which
    breaks cross-engine hash parity (observed vs DuckDB). Exact
    numerator + one IEEE division is bit-identical everywhere.
    """
    wb = (W.partitionBy(*keys).orderBy("ts")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy(*keys).orderBy("ts")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col("ts"))
    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    prev_ts = F.last(obs_ts, ignorenulls=True).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    next_ts = F.first(obs_ts, ignorenulls=True).over(wf)
    d1 = F.datediff(F.col("ts"), prev_ts).cast("decimal(6,0)")
    dd = F.datediff(next_ts, prev_ts).cast("decimal(6,0)")
    num = (prev_v.cast("decimal(20,10)") * (dd - d1)
           + next_v.cast("decimal(20,10)") * d1)
    interp = (F.when(v.isNotNull(), v)
              .when(prev_v.isNull(), next_v)            # leading edge
              .when(next_v.isNull(), prev_v)            # trailing edge
              .otherwise(num.cast("double") / dd.cast("double")))
    return spine.withColumn(out_col, interp)


def interpolate_dense(prices: DataFrame, value_col: str = "close",
                      out_col: str = "close_interp") -> DataFrame:
    """W10 fused: calendar_spine + interpolate in ONE shuffle.

    Instead of densifying first (bounds agg → explode → distinct →
    cross join → shuffle join on (ticker, ts) → re-shuffle on ticker
    for two windows: 5 exchanges), each *observed* row generates the
    gap days up to its successor and interpolates them inline:

      lead(ts/value) over (ticker, ts)  →  explode(sequence(d0, d1))

    so the only full-data exchange is the window's partitionBy(ticker)
    — the global [lo, hi] bounds are a 1-row broadcast. 7.5× faster at
    sf0.1 (4.6 s → 0.6 s) and row-identical to
    interpolate(calendar_spine(prices)).

    Requires every input row to carry a non-null `value_col` (true of
    the derived prices feed); use the spine form for inputs with
    explicit null observations. Same exact-DECIMAL numerator + single
    IEEE division as interpolate() for cross-engine bit parity.
    """
    v = F.col(value_col)
    bounds = prices.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    w = W.partitionBy("ticker").orderBy("ts")
    g = (prices.crossJoin(F.broadcast(bounds))
         .withColumn("_nts", F.lead("ts").over(w))
         .withColumn("_nv", F.lead(value_col).over(w))
         .withColumn("_rn", F.row_number().over(w)))
    is_last = F.col("_nts").isNull()
    # Row emits [d0, d1]: first row backfills to global lo; interior
    # rows cover up to the day before the next observation; the last
    # row forward-fills to global hi.
    g = (g.withColumn("_d0", F.when(F.col("_rn") == 1, F.col("lo"))
                      .otherwise(F.col("ts")))
         .withColumn("_d1", F.when(is_last, F.col("hi"))
                     .otherwise(F.date_sub(F.col("_nts"), 1)))
         .withColumn("_day", F.explode(
             F.sequence("_d0", "_d1", F.expr("interval 1 day")))))
    dd = F.datediff(F.col("_nts"), F.col("ts")).cast("decimal(6,0)")
    d1 = F.datediff(F.col("_day"), F.col("ts")).cast("decimal(6,0)")
    num = (v.cast("decimal(20,10)") * (dd - d1)
           + F.col("_nv").cast("decimal(20,10)") * d1)
    interp = (F.when(F.col("_day") <= F.col("ts"), v)   # observed + leading
              .when(is_last, v)                          # trailing edge
              .otherwise(num.cast("double") / dd.cast("double")))
    return g.select("ticker", F.col("_day").alias("ts"),
                    interp.alias(out_col))
