"""Cross-implementation parity tests:

1. Window-algebra interpolation (calendar.interpolate) vs pandas
   `Series.interpolate(limit_direction='both')` on the dense daily
   spine — on uniform spacing pandas' positional linear interpolation
   coincides with time-weighted, so the engine must match the
   reference's kernel (1_Dashboard.py:82) exactly.
2. Batch fold (operators/fold.py) vs streaming stateful fold
   (streaming/stateful.py) on oversell-free ledgers — the two tiers
   must agree on (qty, avg_cost, realized).
"""

import datetime as dt
import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import calendar as C
from etl_portfolio_tracker_spark.operators import fold as FD


@settings(max_examples=10, deadline=None)
@given(st.dictionaries(
    st.integers(min_value=1, max_value=20),          # day-of-month
    st.floats(min_value=1.0, max_value=1e4, allow_nan=False),
    min_size=1, max_size=10))
def test_interpolate_matches_pandas(spark, obs):
    prices = spark.createDataFrame(
        [("A", dt.date(2025, 1, d), float(v)) for d, v in obs.items()],
        schema=schemas.PRICES)
    got = {r["ts"]: r["close_interp"]
           for r in C.interpolate(C.calendar_spine(prices)).collect()}

    lo, hi = min(obs), max(obs)
    idx = pd.date_range(f"2025-01-{lo:02d}", f"2025-01-{hi:02d}", freq="D")
    s = pd.Series({pd.Timestamp(2025, 1, d): v for d, v in obs.items()},
                  index=None).reindex(idx)
    want = s.interpolate(limit_direction="both")
    for ts_, v in want.items():
        g = got[ts_.date()]
        assert g is not None and math.isclose(g, v, rel_tol=1e-9), \
            f"{ts_.date()}: engine {g} != pandas {v}"


def test_batch_and_streaming_folds_agree(spark, tmp_path):
    from pyspark.sql import functions as F
    from etl_portfolio_tracker_spark.streaming import stateful

    schema = ("id long, user string, ticker string, ts timestamp, "
              "side string, qty double, price double, fee double")
    t0 = dt.datetime(2025, 1, 1)
    rows = [(1, "u", "T", t0, "BUY", 10.0, 100.0, 2.0),
            (2, "u", "T", t0 + dt.timedelta(days=1), "SELL", 3.0, 120.0, 0.0),
            (3, "u", "T", t0 + dt.timedelta(days=2), "BUY", 5.0, 90.0, 1.0),
            (4, "u", "T", t0 + dt.timedelta(days=3), "SELL", 6.0, 110.0, 0.0),
            (5, "v", "T", t0, "BUY", 1.0, 50.0, 0.0)]
    df = spark.createDataFrame(rows, schema)

    batch = {(r["user"], r["ticker"]): (r["qty"], r["avg_cost"], r["realized"])
             for r in FD.portfolio_fold(df).collect()}

    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stateful.streaming_portfolio_state(stream)
         .writeStream.format("memory").queryName("parity_state")
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streaming = {(r["user"], r["ticker"]): (r["qty"], r["avg_cost"], r["realized"])
                 for r in spark.sql("select * from parity_state").collect()}

    assert batch == streaming


def test_canonical_docs_keeps_longest_per_cluster(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    # doc0/doc1 near-identical (doc1 longer), doc2 unrelated
    t0 = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, t0, 60), (1, t0 + " extra", 66),
            (2, "completely different content with nothing shared here", 53)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = DD.canonical_docs(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "cluster_id"] == out.loc[1, "cluster_id"]
    assert not out.loc[0, "kept"] and out.loc[1, "kept"]   # longest wins
    assert out.loc[2, "kept"] and out.loc[2, "cluster_size"] == 1


def test_corpus_prune_reason_priority(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    t0 = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, t0, 60), (1, t0, 60),       # exact dup pair
            (2, "x", 1)]                    # fails gopher length floor
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = DD.corpus_prune(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "reason"] == "exact_dup" and not out.loc[1, "kept"]
    assert out.loc[2, "reason"] == "quality" and not out.loc[2, "kept"]


def test_pagerank_centrality_orders_hub_first(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    # doc0 near-identical to doc1 AND doc2 (hub); doc3 unrelated
    t = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, t), (1, t + " one"), (2, t + " two"),
            (3, "entirely different text with no shared shingles at all")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = DD.pagerank(docs).toPandas().set_index("doc_id")
    # connected docs outrank the isolate; every rank positive
    assert out.loc[3, "degree"] == 0
    assert out.loc[0, "rank"] > out.loc[3, "rank"]
    assert (out["rank"] > 0).all()
    # deterministic across runs
    again = DD.pagerank(docs).toPandas().set_index("doc_id")
    assert out.equals(again)
