"""Deterministic derivation of the reference domain tables
(prices / trades / universe — SURVEY §1.1, FIXTURES.md §3) from the
driver's harness tables.

Every derivation here has a character-for-character-specified SQL twin
in `oracle.py`; the two must stay in lock-step because the driver
hash-compares Spark output against the DuckDB oracle.

Float-determinism rules (apply to every query in this engine):
  * per-row arithmetic stays in DOUBLE — IEEE ops on identical inputs
    are bit-identical across engines;
  * any SUM/AVG whose result is emitted goes through
    CAST(x AS DECIMAL(38,10)) first — decimal addition is exact and
    order-insensitive, so Spark's parallel partial aggregation and
    DuckDB's sequential sum produce identical results;
  * emitted decimals are rounded and cast back to DOUBLE so the output
    schema is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .io import read_table

DEC = "decimal(38,10)"


def dsum(col):
    """Order-insensitive exact sum of a double expression (see module
    docstring). Returns a decimal column — caller rounds + casts."""
    return F.sum(col.cast(DEC))


def prices(spark: SparkSession, sf_dir: str,
           max_partkey: int | None = None) -> DataFrame:
    """prices(ticker, ts, close) from lineitem.

    ticker = 'P' || l_partkey, ts = date(l_shipdate),
    close = min(l_extendedprice) per (ticker, ts)  [min: exact,
    order-insensitive — no float accumulation].
    Sparse per ticker by construction → exercises ffill/interpolation
    (reference 1_Dashboard.py:82,117).
    """
    li = read_table(spark, sf_dir, "lineitem")
    if max_partkey is not None:
        # filter on the physical column BEFORE deriving ticker so the
        # predicate reaches the parquet scan (a filter on the derived
        # 'P'||key string cannot push down)
        li = li.filter((F.col("l_partkey") >= 1)
                       & (F.col("l_partkey") <= max_partkey))
    return (li.select(
                F.concat(F.lit("P"), F.col("l_partkey")).alias("ticker"),
                F.to_date("l_shipdate").alias("ts"),
                F.col("l_extendedprice"))
            .groupBy("ticker", "ts")
            .agg(F.min("l_extendedprice").alias("close")))


def trades_projection(ev: DataFrame) -> DataFrame:
    """The events→trades per-row mapping, applicable to a batch OR
    streaming events frame (pure projection, no aggregation)."""
    return ev.select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("u"), F.col("user_id")).alias("user"),
        F.col("event_type").alias("ticker"),
        F.col("ts"),
        F.when(F.col("event_id") % 3 == 0, F.lit("SELL"))
         .otherwise(F.lit("BUY")).alias("side"),
        (F.lit(1.0) + (F.col("event_id") % 10).cast("double")).alias("qty"),
        (F.abs(F.col("value")) + F.lit(1.0)).alias("price"),
        ((F.col("event_id") % 5).cast("double") * F.lit(0.25)).alias("fee"),
    )


def trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trades(id, user, ticker, ts, side, qty, price, fee) from events.

    Deterministic per-row mapping (no aggregation → bit-exact):
      id = event_id (monotone, replay tiebreak — SURVEY §2.9)
      user = 'u' || user_id, ticker = event_type
      side = SELL when event_id % 3 = 0 else BUY
      qty = 1 + (event_id % 10), price = abs(value) + 1, fee = (event_id % 5) * 0.25
    The ledger may oversell — the reference fold clamps sells
    (portfolio.py:37,106), so any ledger is valid fold input.
    """
    return trades_projection(read_table(spark, sf_dir, "events"))


def raw_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deliberately dirty trade batch (validation-rule fixture):
    qty can be 0, side can be 'HOLD', price/fee can go non-positive,
    user can be blank — exercises every P9 constraint
    (trades.py:14-26)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("id"),
        F.when(F.col("user_id") % 50 == 0, F.lit(""))
         .otherwise(F.concat(F.lit("u"), F.col("user_id"))).alias("user"),
        F.col("event_type").alias("ticker"),
        F.col("ts"),
        F.when(F.col("event_id") % 3 == 0, F.lit("SELL"))
         .when(F.col("event_id") % 3 == 1, F.lit("BUY"))
         .otherwise(F.lit("HOLD")).alias("side"),
        (F.col("event_id") % 10).cast("double").alias("qty"),
        (F.col("value") - F.lit(50.0)).alias("price"),
        (F.col("value") - F.lit(100.0)).alias("fee"),
    )


def tick_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily close series for the *traded* tickers (event types), so
    trades ⟕ prices joins have matching keys: close = min(value) per
    (event_type, date). min: exact, order-insensitive."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.select(F.col("event_type").alias("ticker"),
                      F.to_date("ts").alias("ts"),
                      F.col("value"))
            .groupBy("ticker", "ts")
            .agg(F.min("value").alias("close")))


def universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """universe(name_display, yf_symbol, segment, search_blob, display)
    from part — the searchable securities master
    (app/services/universe.py:25-60).

    search_blob = lower(name ' ' symbol ' ' symbol-without-'.ST');
    display = name || ' (' || symbol || ')' — mirrors universe.py:50-57.
    """
    part = read_table(spark, sf_dir, "part")
    name = F.regexp_replace(F.trim(F.col("p_name")), r"\s+", " ")
    sym = F.col("p_brand")
    return part.select(
        name.alias("name_display"),
        sym.alias("yf_symbol"),
        F.col("p_type").alias("segment"),
        F.lower(F.concat_ws(" ", name, sym,
                            F.regexp_replace(sym, r"\.ST$", ""))).alias("search_blob"),
        F.concat(name, F.lit(" ("), sym, F.lit(")")).alias("display"),
    )
