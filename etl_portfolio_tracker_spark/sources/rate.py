"""Synthetic tick source over Spark's rate stream.

`rate` emits (timestamp, value) at a configured rows/sec; we shape it
into the engine's price-tick schema deterministically (ticker cycles
over a fixed universe, price is a pure function of the row value), so
downstream streaming operators (dedup ingest, windowed aggs, stateful
folds) can be demoed and load-tested with no files and no network —
the stand-in for the reference's live quote poll (2_Trades.py:24-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_TICKERS = ("AAPL", "MSFT", "VOLV-B", "ERIC-B", "INVE-B")


def tick_stream(spark: SparkSession, rows_per_second: int = 100,
                tickers: tuple[str, ...] = DEFAULT_TICKERS) -> DataFrame:
    """Unbounded (ticker, ts, close) tick stream.

    close = 100 + (value mod 1000)/100 + ticker_idx — deterministic in
    the rate counter, so tests can assert exact values; at cluster
    scale `rate-micro-batch` + numPartitions spreads generation.
    """
    n = len(tickers)
    raw = (spark.readStream.format("rate")
           .option("rowsPerSecond", str(rows_per_second)).load())
    ticker = F.element_at(
        F.array(*[F.lit(t) for t in tickers]),
        (F.col("value") % n + 1).cast("int"))
    close = (100.0 + (F.col("value") % 1000) / 100.0
             + (F.col("value") % n).cast("double"))
    return raw.select(ticker.alias("ticker"),
                      F.col("timestamp").alias("ts"),
                      close.alias("close"))
