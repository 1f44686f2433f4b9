"""Explicit schemas for every table the engine touches.

Reference analog: eager `CREATE TABLE IF NOT EXISTS` DDL
(`app/services/db.py:32-59`, `src/etl.py:51-58`) and the CSV
alias-validation in `app/services/universe.py:11-42`.  Never
`inferSchema` on a correctness path (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- domain tables (reference data model, SURVEY §1.1) -----------------

# prices: append-only daily close series; unique key (ticker, ts).
# Reference DDL src/etl.py:51-58 (id autoincrement dropped — dedup key
# replaces it, SURVEY §1.1).
PRICES = T.StructType([
    T.StructField("ticker", T.StringType(), False),
    T.StructField("ts", T.DateType(), False),
    T.StructField("close", T.DoubleType(), False),
])

# trades: ledger with explicit monotone id for deterministic replay
# (ORDER BY ts, id — app/services/trades.py:76, portfolio.py:23).
TRADES = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("user", T.StringType(), False),
    T.StructField("ticker", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("side", T.StringType(), False),   # BUY | SELL
    T.StructField("qty", T.DoubleType(), False),
    T.StructField("price", T.DoubleType(), False),
    T.StructField("fee", T.DoubleType(), False),
])

# universe: securities master (reference data/omx_securities.csv via
# app/services/universe.py:25-60).
UNIVERSE = T.StructType([
    T.StructField("name_display", T.StringType(), False),
    T.StructField("yf_symbol", T.StringType(), False),
    T.StructField("segment", T.StringType(), True),
    T.StructField("search_blob", T.StringType(), True),
    T.StructField("display", T.StringType(), True),
])

WATCHLIST = T.StructType([
    T.StructField("user", T.StringType(), False),
    T.StructField("ticker", T.StringType(), False),
])

# --- harness tables (/root/testdata, TESTDATA.md) ----------------------

HARNESS_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), False),
    T.StructField("l_partkey", T.LongType(), False),
    T.StructField("l_suppkey", T.LongType(), False),
    T.StructField("l_linenumber", T.IntegerType(), False),
    T.StructField("l_quantity", T.DoubleType(), False),
    T.StructField("l_extendedprice", T.DoubleType(), False),
    T.StructField("l_discount", T.DoubleType(), False),
    T.StructField("l_tax", T.DoubleType(), False),
    T.StructField("l_returnflag", T.StringType(), False),
    T.StructField("l_linestatus", T.StringType(), False),
    T.StructField("l_shipdate", T.TimestampType(), False),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),   # JSON string
])

# The harness parquet stores ts as TIMESTAMP(MICROS, isAdjustedToUTC=0)
# → Spark reads timestamp_ntz; streaming scans need the schema
# declared explicitly (readStream has no inference on a fixed dir).
EVENTS_NTZ = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampNTZType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),   # JSON string
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    T.StructField("label", T.IntegerType(), True),
])
