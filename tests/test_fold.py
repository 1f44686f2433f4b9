"""Tier-D fold tests: golden scenarios from FIXTURES.md §2 plus a
hypothesis property test against an independent pure-Python oracle of
the reference algorithm (portfolio.py:27-38, 93-108)."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import fold as FD


def py_oracle(rows):
    """Independent re-statement of the reference fold (SURVEY §2.5 W6/W7):
    rows = [(side, qty, price, fee)] already in (ts, id) order."""
    q = avg = realized = 0.0
    for side, qty, price, fee in rows:
        if side == "BUY":
            avg = (q * avg + qty * price + fee) / (q + qty)
            q += qty
        elif q > 0:
            sell = min(qty, q)
            realized += (price - avg) * sell
            q -= sell
    return q, avg, realized


def ledger_df(spark, rows, user="demo", ticker="TICK"):
    data = [(i + 1, user, ticker,
             dt.datetime(2025, 1, 1) + dt.timedelta(minutes=i),
             side, float(qty), float(price), float(fee))
            for i, (side, qty, price, fee) in enumerate(rows)]
    return spark.createDataFrame(data, schema=schemas.TRADES)


def run_fold(spark, rows):
    out = FD.portfolio_fold(ledger_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    return r["qty"], r["avg_cost"], r["realized"]


def test_golden_scenario_a(spark):
    # FIXTURES §2.1: BUY 10@200, SELL 4@220, BUY 6@210
    qty, avg, realized = run_fold(spark, [("BUY", 10, 200, 0),
                                          ("SELL", 4, 220, 0),
                                          ("BUY", 6, 210, 0)])
    assert qty == 12.0 and avg == 205.0 and realized == 80.0


def test_golden_scenario_b(spark):
    # FIXTURES §2.2: BUY 10@200 → SELL 5@210 → qty 5, GAV 200, realized +50
    qty, avg, realized = run_fold(spark, [("BUY", 10, 200, 0),
                                          ("SELL", 5, 210, 0)])
    assert qty == 5.0 and avg == 200.0 and realized == 50.0


def test_sell_when_flat_skipped(spark):
    # FIXTURES §2.3: SELL with no holdings is a no-op
    qty, avg, realized = run_fold(spark, [("SELL", 5, 100, 0),
                                          ("BUY", 2, 50, 0)])
    assert qty == 2.0 and avg == 50.0 and realized == 0.0


def test_oversell_clamps(spark):
    # SELL 15 of 10 held: clamp to 10, realized on 10 only
    qty, avg, realized = run_fold(spark, [("BUY", 10, 100, 0),
                                          ("SELL", 15, 110, 0)])
    assert qty == 0.0 and realized == 100.0


def test_fee_in_avg_cost(spark):
    # BUY 10@100 fee 10 → avg 101
    qty, avg, _ = run_fold(spark, [("BUY", 10, 100, 10)])
    assert qty == 10.0 and avg == 101.0


trade_strategy = st.tuples(
    st.sampled_from(["BUY", "SELL"]),
    st.floats(min_value=0.001, max_value=1e4, allow_nan=False),
    st.floats(min_value=0.01, max_value=1e5, allow_nan=False),
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(trade_strategy, min_size=1, max_size=25))
def test_fold_matches_python_oracle(spark, rows):
    got = run_fold(spark, rows)
    want = py_oracle(rows)
    assert got == want, f"fold mismatch: {got} != {want}"
