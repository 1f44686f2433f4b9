"""Golden tests for windowed/calendar/search/session operators on tiny
in-memory frames (reference behaviors from 1_Dashboard.py and
universe.py — see SURVEY §2.5/§2.6)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import calendar as C
from etl_portfolio_tracker_spark.operators import search as S
from etl_portfolio_tracker_spark.operators import sessions as SE
from etl_portfolio_tracker_spark.operators import windowed as WD


def prices_df(spark, rows):
    return spark.createDataFrame(
        [(t, dt.date(2025, 1, d), float(c)) for t, d, c in rows],
        schema=schemas.PRICES)


def test_ffill_and_interpolate(spark):
    # A: days 1,4 observed (10 → 16): interp day2=12, day3=14; ffill 10,10,10,16
    p = prices_df(spark, [("A", 1, 10), ("A", 4, 16)])
    spine = C.calendar_spine(p)
    ff = {r["ts"].day: r["close_ffill"] for r in C.ffill(spine).collect()}
    assert ff == {1: 10.0, 2: 10.0, 3: 10.0, 4: 16.0}
    it = {r["ts"].day: r["close_interp"] for r in C.interpolate(spine).collect()}
    assert it == {1: 10.0, 2: 12.0, 3: 14.0, 4: 16.0}


def test_interpolate_edges_both_directions(spark):
    # B observed only day 3 within global bounds 1..4 → edges take nearest
    p = prices_df(spark, [("A", 1, 5), ("A", 4, 5), ("B", 3, 7)])
    it = {(r["ticker"], r["ts"].day): r["close_interp"]
          for r in C.interpolate(C.calendar_spine(p)).collect()}
    assert it[("B", 1)] == 7.0 and it[("B", 2)] == 7.0 and it[("B", 4)] == 7.0


def test_interpolate_dense_matches_spine_form(spark):
    # Fused gap-explode must be row-identical to spine + window form,
    # including multi-ticker edges and single-observation tickers.
    p = prices_df(spark, [("A", 1, 10), ("A", 4, 16), ("A", 9, 1),
                          ("B", 3, 7), ("C", 5, 2), ("C", 6, 3)])
    spine_form = C.interpolate(C.calendar_spine(p)).select(
        "ticker", "ts", "close_interp")
    dense_form = C.interpolate_dense(p)
    assert spine_form.exceptAll(dense_form).count() == 0
    assert dense_form.exceptAll(spine_form).count() == 0


def test_daily_returns_and_twr(spark):
    p = prices_df(spark, [("A", 1, 100), ("A", 2, 110), ("A", 3, 99)])
    rets = {r["ts"].day: r["ret"] for r in WD.daily_returns(p).collect()}
    assert rets[1] == 0.0
    assert abs(rets[2] - 0.10) < 1e-12
    assert abs(rets[3] - (-0.10)) < 1e-12
    twr = {r["ts"].day: r["twr_index"] for r in WD.twr_index(p).collect()}
    assert abs(twr[3] - 99.0) < 1e-6  # 100·1.1·0.9 = 99


def test_normalize_to_100(spark):
    p = prices_df(spark, [("A", 1, 50), ("A", 2, 75)])
    idx = {r["ts"].day: r["idx"] for r in WD.normalize_to_100(p).collect()}
    assert idx == {1: 100.0, 2: 150.0}


def test_search_ranking(spark):
    uni = spark.createDataFrame(
        [("Red Widget", "RW", "Large", "rw", "Red Widget (RW)"),
         ("Green Widget", "RED", "Mid", "gw", "Green Widget (RED)"),
         ("Bored Ape", "BA", "Small", "ba", "Bored Ape (BA)")],
        schema=schemas.UNIVERSE)
    uni = uni.withColumn("search_blob", F.lower(F.concat_ws(" ", "name_display", "yf_symbol")))
    got = [r["name_display"] for r in S.search_universe(uni, "red").collect()]
    # name-startswith beats symbol-startswith beats in-blob position
    assert got == ["Red Widget", "Green Widget", "Bored Ape"]


def test_sessionize_gap(spark):
    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    rows = [(1, base, 7, "click", 1.0, None),
            (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, None),
            (3, base + dt.timedelta(minutes=50), 7, "click", 1.0, None)]
    ev = spark.createDataFrame(rows, schema=schemas.EVENTS)
    sess = SE.sessionize(ev).collect()
    assert sorted(r["n_events"] for r in sess) == [1, 2]


def test_funnel_ordering_strict(spark):
    import datetime as dt
    t = lambda m: dt.datetime(2025, 1, 1, 10, m)
    rows = [
        # u1: view -> click -> purchase (full funnel)
        (1, t(0), 1, "view", 0.0, None), (2, t(5), 1, "click", 0.0, None),
        (3, t(9), 1, "purchase", 0.0, None),
        # u2: click BEFORE view, purchase after view but no click after view
        (4, t(0), 2, "click", 0.0, None), (5, t(5), 2, "view", 0.0, None),
        (6, t(9), 2, "purchase", 0.0, None),
        # u3: view only
        (7, t(0), 3, "view", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    r = SE.funnel(ev).collect()[0]
    assert (r["n_view"], r["n_click"], r["n_purchase"]) == (3, 1, 1)
