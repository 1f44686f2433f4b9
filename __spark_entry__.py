"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_portfolio_tracker_spark/``; this module
only wires operators to the contract. Float-determinism strategy (why
hashes match despite parallel aggregation): see derive.py docstring —
per-row math in DOUBLE, emitted sums via DECIMAL(38,10), rounded and
cast back to DOUBLE on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_portfolio_tracker_spark import derive
from etl_portfolio_tracker_spark.io import read_table
from etl_portfolio_tracker_spark.oracle import (
    PRICES_CTE, TICK_PRICES_CTE, TRADES_CTE, UNIVERSE_CTE, with_domain,
)
from etl_portfolio_tracker_spark.operators import relational as R

SF0001 = "/root/testdata/sf0.001"

# shared literals (must match between Spark queries and oracle SQL)
ASOF_ANCHOR = "1998-06-30"
RANGE_START, RANGE_END = "1996-01-01", "1996-12-31"
DEMO_USER = "u3"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary over lineitem —
    scan → pushed filter → grouped conditional aggs → sort, the same
    shape as the reference's positions/cash pipeline at warehouse
    scale."""
    return _q_pricing_summary(spark, SF0001)


# --- query implementations --------------------------------------------

def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(derive.dsum(F.col("l_quantity")), 2).cast("double").alias("sum_qty"),
                 F.round(derive.dsum(F.col("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
                 F.round(derive.dsum(disc_price), 2).cast("double").alias("sum_disc_price"),
                 F.round(derive.dsum(charge), 2).cast("double").alias("sum_charge"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def _q_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.positions(derive.trades(spark, sf_dir))


def _q_current_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.current_qty(derive.trades(spark, sf_dir), DEMO_USER, "click")


def _q_cash_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.cash_balance(derive.trades(spark, sf_dir))


def _q_latest_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.latest_prices(derive.prices(spark, sf_dir))


def _q_asof_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.asof_prices(derive.prices(spark, sf_dir), ASOF_ANCHOR)


def _q_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.overview(derive.trades(spark, sf_dir), derive.tick_prices(spark, sf_dir))


def _q_trades_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.trades_list(derive.trades(spark, sf_dir), DEMO_USER)


def _q_price_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.price_range_scan(derive.prices(spark, sf_dir), RANGE_START, RANGE_END)


def _q_max_ts_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.max_ts_anchor(derive.prices(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": _q_pricing_summary,
        "positions": _q_positions,
        "current_qty": _q_current_qty,
        "cash_balance": _q_cash_balance,
        "latest_prices": _q_latest_prices,
        "asof_prices": _q_asof_prices,
        "overview": _q_overview,
        "trades_list": _q_trades_list,
        "price_range_scan": _q_price_range_scan,
        "max_ts_anchor": _q_max_ts_anchor,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_disc_price,
                   CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "positions": with_domain("""
            SELECT "user", ticker,
                   SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) AS qty
            FROM trades
            GROUP BY "user", ticker
            HAVING SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) <> 0
        """, TRADES_CTE),
        "current_qty": with_domain(f"""
            SELECT COALESCE(SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END), 0.0) AS qty
            FROM trades WHERE "user" = '{DEMO_USER}' AND ticker = 'click'
        """, TRADES_CTE),
        "cash_balance": with_domain(f"""
            SELECT "user",
                   CAST({R.START_CASH}
                        + COALESCE(SUM(CAST(CASE WHEN side = 'SELL' THEN qty * price ELSE 0.0 END AS DECIMAL(38,10))), 0)
                        - COALESCE(SUM(CAST(CASE WHEN side = 'BUY' THEN qty * price ELSE 0.0 END AS DECIMAL(38,10))), 0)
                        - COALESCE(SUM(CAST(fee AS DECIMAL(38,10))), 0)
                    AS DOUBLE) AS cash
            FROM trades GROUP BY "user"
        """, TRADES_CTE),
        "latest_prices": with_domain("""
            SELECT ticker,
                   arg_max(close, ts) AS last_close,
                   MAX(ts) AS last_ts
            FROM prices GROUP BY ticker
        """, PRICES_CTE),
        "asof_prices": with_domain(f"""
            SELECT ticker,
                   arg_max(close, ts) AS last_close,
                   MAX(ts) AS last_ts
            FROM prices WHERE ts <= DATE '{ASOF_ANCHOR}'
            GROUP BY ticker
        """, PRICES_CTE),
        "overview": with_domain("""
            SELECT p."user", p.ticker, p.qty, lp.last_close, lp.last_ts,
                   CAST(p.qty * lp.last_close AS DOUBLE) AS market_value
            FROM (SELECT "user", ticker,
                         SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) AS qty
                  FROM trades GROUP BY "user", ticker
                  HAVING SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) <> 0) p
            LEFT JOIN (SELECT ticker, arg_max(close, ts) AS last_close, MAX(ts) AS last_ts
                       FROM tick_prices GROUP BY ticker) lp
            USING (ticker)
        """, TRADES_CTE, TICK_PRICES_CTE),
        "trades_list": with_domain(f"""
            SELECT id, ticker, ts, side, qty, price, fee
            FROM trades WHERE "user" = '{DEMO_USER}'
            ORDER BY ts, id
        """, TRADES_CTE),
        "price_range_scan": with_domain(f"""
            SELECT ticker, COUNT(*) AS n_days,
                   MIN(close) AS min_close, MAX(close) AS max_close
            FROM prices
            WHERE ts >= DATE '{RANGE_START}' AND ts <= DATE '{RANGE_END}'
            GROUP BY ticker
        """, PRICES_CTE),
        "max_ts_anchor": with_domain(
            "SELECT MAX(ts) AS anchor FROM prices", PRICES_CTE),
    }
