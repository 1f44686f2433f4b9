"""Unit tests for operators/finance.py against hand-computed /
pandas-computed expectations on tiny synthetic series."""

import datetime as dt
import math

import pandas as pd
import pytest

from etl_portfolio_tracker_spark.operators import finance as FIN


def _prices(spark, closes_by_ticker):
    rows = []
    for tkr, closes in closes_by_ticker.items():
        for i, c in enumerate(closes):
            rows.append((tkr, dt.date(2024, 1, 1) + dt.timedelta(days=i),
                         float(c)))
    return spark.createDataFrame(rows, "ticker string, ts date, close double")


CLOSES = [100.0, 110.0, 99.0, 99.0, 120.0, 90.0, 135.0]


def test_rolling_volatility_matches_pandas(spark):
    tp = _prices(spark, {"A": CLOSES})
    out = (FIN.rolling_volatility(tp, n=3)
           .orderBy("ts").toPandas())
    s = pd.Series(CLOSES)
    rets = s.pct_change().fillna(0.0)
    expect = rets.rolling(3, min_periods=2).std()
    for got, exp in zip(out["vol"], expect):
        if pd.isna(exp):
            assert got is None or pd.isna(got)
        else:
            assert got == pytest.approx(exp, abs=1e-6)


def test_drawdown_and_max_drawdown(spark):
    tp = _prices(spark, {"A": CLOSES})
    dd = FIN.drawdown(tp).orderBy("ts").toPandas()
    s = pd.Series(CLOSES)
    expect = (s / s.cummax() - 1).round(6)
    assert list(dd["dd"]) == pytest.approx(list(expect))
    mdd = FIN.max_drawdown(tp).toPandas()
    assert mdd.loc[0, "max_dd"] == pytest.approx(expect.min())
    assert mdd.loc[0, "n_obs"] == len(CLOSES)


def test_ema_matches_pandas_adjust_false(spark):
    tp = _prices(spark, {"A": CLOSES, "B": [50.0, 60.0]})
    out = FIN.ema_final(tp, alpha=0.2).toPandas().set_index("ticker")
    expect_a = pd.Series(CLOSES).ewm(alpha=0.2, adjust=False).mean().iloc[-1]
    assert out.loc["A", "ema"] == pytest.approx(expect_a, abs=1e-6)
    assert out.loc["A", "n_obs"] == len(CLOSES)
    # two-point series: 0.2*60 + 0.8*50 = 52
    assert out.loc["B", "ema"] == pytest.approx(52.0)


def test_vwap_hand_computed(spark):
    trades = spark.createDataFrame(
        [("X", dt.datetime(2024, 1, 1, 10), 10.0, 2.0),
         ("X", dt.datetime(2024, 1, 1, 14), 20.0, 6.0),
         ("X", dt.datetime(2024, 1, 2, 10), 30.0, 1.0)],
        "ticker string, ts timestamp, price double, qty double")
    out = FIN.vwap(trades).orderBy("d").toPandas()
    # day1: (10*2 + 20*6) / 8 = 17.5 ; day2: 30
    assert list(out["vwap"]) == pytest.approx([17.5, 30.0])
    assert list(out["volume"]) == pytest.approx([8.0, 1.0])


def test_rolling_beta_of_benchmark_is_one(spark):
    tp = _prices(spark, {"A": CLOSES, "B": [2 * c for c in CLOSES]})
    out = FIN.rolling_beta(tp, benchmark="A", n=4).orderBy(
        "ticker", "ts").toPandas()
    a = out[out.ticker == "A"]["beta"].dropna()
    # beta of the benchmark against itself is exactly 1
    assert all(b == pytest.approx(1.0) for b in a)
    # B has identical returns (2x price scale) -> beta 1 as well
    b = out[out.ticker == "B"]["beta"].dropna()
    assert all(x == pytest.approx(1.0) for x in b)


def test_corr_matrix_sign_and_bounds(spark):
    inv = [200.0 - c for c in CLOSES]          # anti-correlated
    tp = _prices(spark, {"A": CLOSES, "B": [c * 3 for c in CLOSES],
                         "C": inv})
    out = FIN.corr_matrix(tp).toPandas().set_index(["t1", "t2"])
    # A and B move identically -> corr 1
    assert out.loc[("A", "B"), "corr"] == pytest.approx(1.0)
    # A vs C strongly negative
    assert out.loc[("A", "C"), "corr"] < -0.9
    assert all(abs(c) <= 1.0 + 1e-9 for c in out["corr"])
    assert all(out["n_obs"] == len(CLOSES))


def test_rolling_vol_plan_single_shuffle(spark):
    tp = _prices(spark, {"A": CLOSES})
    plan = FIN.rolling_volatility(tp, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # one exchange for the ticker window, nothing else
    assert plan.count("Exchange") <= 1


def test_hist_var_rank_selection_and_es(spark):
    import datetime as dt
    from etl_portfolio_tracker_spark.operators import finance as FIN
    # build a price series whose returns are known: 20 days, one
    # ticker; k = ceil(0.05*20) = 1 -> VaR = worst return, ES = same.
    base = dt.date(2024, 1, 1)
    prices = [100.0]
    for r in [0.01] * 10 + [-0.10] + [0.005] * 8:   # one crash day
        prices.append(round(prices[-1] * (1 + r), 8))
    rows = [("A", dt.datetime.combine(base + dt.timedelta(days=i),
                                      dt.time()), p)
            for i, p in enumerate(prices)]
    tp = spark.createDataFrame(rows, "ticker string, ts timestamp,"
                                     " close double")
    out = FIN.hist_var(tp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 20
    # worst return is the crash day (~ -10%)
    assert abs(r["var_tail"] - (-0.10)) < 1e-6
    assert r["es_tail"] == round(r["var_tail"], 6)


def test_ema_final_history_bound_guard(spark):
    import datetime as dt
    import pytest
    from etl_portfolio_tracker_spark.operators import finance as FIN
    rows = [("A", dt.datetime(2024, 1, 1 + i), 10.0 + i)
            for i in range(5)]
    tp = spark.createDataFrame(rows, "ticker string, ts timestamp_ntz,"
                                     " close double")
    # within bound: normal result
    assert FIN.ema_final(tp).count() == 1
    # violating the per-key bound fails loudly instead of building an
    # unbounded in-row array
    with pytest.raises(Exception, match="per-ticker history exceeds"):
        FIN.ema_final(tp, max_obs=3).collect()
