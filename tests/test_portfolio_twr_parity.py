"""Reference-parity property test: portfolio_twr must reproduce a
LITERAL pandas replication of the reference Dashboard pipeline
(1_Dashboard.py:312-329 — pct_change → shifted holding values →
weights → weighted return → trim → cumprod) on arbitrary BUY-only
ledgers over dense price panels.

Dense panels keep pandas' positional interpolation out of play (no
missing cells) and BUY-only ledgers keep tot_val > 0 after the first
holding day, so two documented divergences (date-based interpolation,
tot_val = 0 guard) cannot trigger.

The THIRD documented divergence is deliberately normalized away here:
the reference's `_positions_qty_panel` (1_Dashboard.py:115-117) does
`pivot_table(...).cumsum().reindex(ffill).fillna(0)`, and the
pivot_table leaves NaN holes on days where SOME OTHER ticker traded —
cumsum propagates the hole, reindex-ffill copies it, fillna ZEROES it,
so a multi-ticker ledger's running position silently resets on
interleaved trade days. The reference's own comment states the intent
("kumulera ... fyll sedan framåt" — running count, forward filled);
this replication adds the `.ffill()` that realizes that intent, which
is what the Spark side (and the repo's externally-green
daily_position_series) computes.
"""

import datetime as dt
import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark.operators import windowed as WD

TICKERS = ["A", "B", "C"]
D0 = dt.date(2024, 1, 1)


def pandas_reference(trades_rows, price_rows, n_days):
    """1_Dashboard.py:106-118 + 311-331, verbatim in pandas."""
    idx = pd.to_datetime([D0 + dt.timedelta(days=i) for i in range(n_days)])
    price_panel = (pd.DataFrame(price_rows, columns=["ticker", "ts", "close"])
                   .assign(ts=lambda d: pd.to_datetime(d.ts))
                   .pivot(index="ts", columns="ticker", values="close")
                   .sort_index())
    tr = pd.DataFrame(trades_rows,
                      columns=["user", "ticker", "ts", "side", "qty"])
    tr["ts"] = pd.to_datetime(tr["ts"].map(lambda t: t.date()))
    tr["qty_signed"] = tr["qty"].where(tr["side"] == "BUY", -tr["qty"])
    qty = (tr.pivot_table(index="ts", columns="ticker",
                          values="qty_signed", aggfunc="sum")
           .sort_index().cumsum()
           .ffill()   # realize the reference's stated intent (see module docstring)
           .reindex(price_panel.index, method="ffill").fillna(0.0)
           .reindex(columns=price_panel.columns, fill_value=0.0))
    ret = (price_panel.pct_change()
           .replace([np.inf, -np.inf], np.nan).fillna(0.0))
    hold_val = qty.shift(1) * price_panel.shift(1)
    tot_val = hold_val.sum(axis=1)
    have_any = tot_val.gt(0)
    if not have_any.any():
        return {}
    fh = have_any.idxmax()
    hold_val, ret, tot_val = (hold_val.loc[fh:], ret.loc[fh:],
                              tot_val.loc[fh:])
    weights = hold_val.div(tot_val, axis=0).fillna(0.0)
    port_ret = (weights * ret).sum(axis=1)
    idx100 = (1.0 + port_ret).cumprod() * 100.0
    return {ts.date().isoformat(): (pr, ix)
            for ts, pr, ix in zip(port_ret.index, port_ret, idx100)}


trade = st.tuples(
    st.sampled_from(TICKERS),            # ticker
    st.integers(min_value=0, max_value=5),   # day
    st.integers(min_value=1, max_value=9))   # qty
case = st.tuples(
    st.integers(min_value=3, max_value=6),   # n_days
    st.lists(trade, min_size=1, max_size=6),
    st.lists(st.integers(min_value=100, max_value=99999),  # price cents
             min_size=18, max_size=18))


@settings(max_examples=6, deadline=None)
@given(case)
def test_portfolio_twr_matches_pandas_reference(spark, c):
    n_days, trades, cents = c
    traded = sorted({t for t, _, _ in trades})
    price_rows = [(tk, (D0 + dt.timedelta(days=d)).isoformat(),
                   cents[(i * n_days + d) % len(cents)] / 100.0)
                  for i, tk in enumerate(traded) for d in range(n_days)]
    trades_rows = [("u1", tk, dt.datetime.combine(
        D0 + dt.timedelta(days=min(d, n_days - 1)), dt.time(10)),
        "BUY", float(q)) for tk, d, q in trades]
    want = pandas_reference(trades_rows, price_rows, n_days)

    tr_df = spark.createDataFrame(
        [(i, u, tk, ts, side, q, 1.0, 0.0)
         for i, (u, tk, ts, side, q) in enumerate(trades_rows)],
        "id long, user string, ticker string, ts timestamp, "
        "side string, qty double, price double, fee double")
    px_df = (spark.createDataFrame(price_rows,
                                   "ticker string, ts string, close double")
             .withColumn("ts", F.to_date("ts")))
    got = {r["d"].isoformat(): (r["port_ret"], r["twr_idx"])
           for r in WD.portfolio_twr(tr_df, px_df).collect()}

    assert sorted(got) == sorted(want)
    for day, (pr, ix) in want.items():
        assert math.isclose(got[day][0], pr, abs_tol=2e-6), (day, "ret")
        assert math.isclose(got[day][1], ix,
                            rel_tol=1e-6, abs_tol=1e-4), (day, "idx")
