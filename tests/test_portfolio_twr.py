"""Reference-parity tests for the Dashboard's portfolio-level TWR
composite and its static-basket fallback (1_Dashboard.py:311-346),
on constructed ledgers where the expected series is hand-derivable,
plus candidate-bounded hard-negative-mining agreement checks.

The sf0.01 cross-engine check is tools/check.py (oracle twins); these
tests pin the SEMANTICS — weights, trim, interpolation, as-of qty —
against values computed independently below.
"""

import math

import pytest
from pyspark.sql import functions as F

from etl_portfolio_tracker_spark.operators import windowed as WD


def _trades(spark, rows):
    return spark.createDataFrame(
        rows, "id long, user string, ticker string, ts timestamp, "
              "side string, qty double, price double, fee double")


def _prices(spark, rows):
    return (spark.createDataFrame(rows, "ticker string, ts string, close double")
            .withColumn("ts", F.to_date("ts")))


def test_portfolio_twr_two_ticker_hand_case(spark):
    # u1 buys 1 A and 2 B on day 1; prices move on days 2 and 3.
    # Dense panel → no interpolation; weights are prior-day values.
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 10)
    tr = _trades(spark, [
        (1, "u1", "A", t0, "BUY", 1.0, 10.0, 0.0),
        (2, "u1", "B", t0, "BUY", 2.0, 5.0, 0.0),
    ])
    px = _prices(spark, [
        ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 12.0), ("A", "2024-01-03", 9.0),
        ("B", "2024-01-01", 5.0),  ("B", "2024-01-02", 5.0),  ("B", "2024-01-03", 10.0),
    ])
    out = {r["d"].isoformat(): r for r in
           WD.portfolio_twr(tr, px).collect()}
    # day1: hold_val null (no prior day) -> trimmed (tot not > 0)
    assert "2024-01-01" not in out
    # day2: hv_A = 1*10, hv_B = 2*5 -> tot 20; ret_A = .2, ret_B = 0
    #   port_ret = (10*.2 + 10*0)/20 = .1
    assert out["2024-01-02"]["port_ret"] == pytest.approx(0.1)
    assert out["2024-01-02"]["twr_idx"] == pytest.approx(110.0)
    # day3: hv_A = 1*12, hv_B = 2*5 -> tot 22
    #   ret_A = 9/12-1 = -.25, ret_B = 10/5-1 = 1
    #   port_ret = (12*-.25 + 10*1)/22 = 7/22
    pr3 = 7.0 / 22.0
    assert out["2024-01-03"]["port_ret"] == pytest.approx(pr3, abs=1e-6)
    assert out["2024-01-03"]["twr_idx"] == pytest.approx(
        110.0 * (1 + pr3), abs=1e-3)


def test_portfolio_twr_trim_and_asof_qty(spark):
    # Ticker A prints prices on days 1-4, but u1 first buys mid-day 2:
    # day 2's hold value (qty.shift * price.shift) is 0 -> first day
    # with tot_val > 0 is day 3; the series starts there.
    import datetime as dt
    tr = _trades(spark, [
        (1, "u1", "A", dt.datetime(2024, 1, 2, 12), "BUY", 2.0, 10.0, 0.0),
    ])
    px = _prices(spark, [
        ("A", "2024-01-01", 8.0), ("A", "2024-01-02", 10.0),
        ("A", "2024-01-03", 11.0), ("A", "2024-01-04", 22.0),
    ])
    out = {r["d"].isoformat(): r for r in
           WD.portfolio_twr(tr, px).collect()}
    assert sorted(out) == ["2024-01-03", "2024-01-04"]
    # day3: hv = 2*10 -> ret = .1 -> idx 110
    assert out["2024-01-03"]["port_ret"] == pytest.approx(0.1)
    # day4: hv = 2*11, ret = 1.0 -> idx 220
    assert out["2024-01-04"]["port_ret"] == pytest.approx(1.0)
    assert out["2024-01-04"]["twr_idx"] == pytest.approx(220.0)


def test_portfolio_twr_interpolates_missing_cell(spark):
    # The user trades A and B; day 2 is on the grid via A's print, but
    # B has no day-2 print: its close_i is the date-linear midpoint
    # (4 -> 6 over two days = 5), so B's day-2 return is 0.25 and
    # day 3's uses the interpolated base. (A ticker the user never
    # traded contributes no grid dates — reference panel semantics.)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 9)
    tr = _trades(spark, [
        (1, "u1", "A", t0, "BUY", 1.0, 1.0, 0.0),
        (2, "u1", "B", t0, "BUY", 1.0, 4.0, 0.0),
    ])
    px = _prices(spark, [
        ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 1.0), ("A", "2024-01-03", 1.0),
        ("B", "2024-01-01", 4.0), ("B", "2024-01-03", 6.0),
    ])
    out = {r["d"].isoformat(): r for r in
           WD.portfolio_twr(tr, px).collect()}
    # day2: hv = (1*1, 1*4), tot 5; ret = (0, .25) -> (4*.25)/5 = .2
    assert out["2024-01-02"]["port_ret"] == pytest.approx(0.2)
    # day3: hv = (1*1, 1*5), tot 6; ret = (0, 6/5-1) -> (5*.2)/6 = 1/6
    assert out["2024-01-03"]["port_ret"] == pytest.approx(1.0 / 6.0, abs=1e-6)
    assert out["2024-01-03"]["twr_idx"] == pytest.approx(140.0, abs=1e-3)


def test_basket_index_normalizes_current_holdings(spark):
    import datetime as dt
    tr = _trades(spark, [
        (1, "u1", "A", dt.datetime(2024, 1, 1, 9), "BUY", 3.0, 10.0, 0.0),
    ])
    px = _prices(spark, [
        ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 15.0),
    ])
    qty_now = spark.createDataFrame(
        [("u1", "A", 3.0)], "user string, ticker string, qty double")
    out = {r["d"].isoformat(): r for r in
           WD.basket_index(tr, px, qty_now).collect()}
    assert out["2024-01-01"]["pv"] == pytest.approx(30.0)
    assert out["2024-01-01"]["basket_idx"] == pytest.approx(100.0)
    assert out["2024-01-02"]["basket_idx"] == pytest.approx(150.0)


def test_portfolio_value_series_is_unshifted_holdings_value(spark):
    import datetime as dt
    tr = _trades(spark, [
        (1, "u1", "A", dt.datetime(2024, 1, 1, 9), "BUY", 2.0, 10.0, 0.0),
        (2, "u1", "A", dt.datetime(2024, 1, 2, 9), "BUY", 1.0, 12.0, 0.0),
    ])
    px = _prices(spark, [
        ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 12.0),
    ])
    out = {r["d"].isoformat(): r["market_value"] for r in
           WD.portfolio_value_series(tr, px).collect()}
    # end-of-day quantities: day1 holds 2 (MV 20), day2 holds 3 (MV 36)
    assert out == {"2024-01-01": 20.0, "2024-01-02": 36.0}


def test_hnm_lsh_single_cell_equals_exact_baseline(spark, sf_dir):
    # with ONE cell every vector is every other's candidate, so the
    # candidate-bounded miner must reproduce the exact N² baseline
    # bit-for-bit (same kernel, same tie rule)
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import similarity as SIM
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 60)
    exact = SIM.hard_negative_mining(emb).collect()
    lsh = SIM.hard_negative_mining_lsh(emb, n_cells=1).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in lsh]


def test_hnm_lsh_recall_on_real_cells(spark, sf_dir):
    # on real √N cells, every mined negative must be label-valid and
    # its cosine can only be <= the exact baseline's (candidate subset)
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import similarity as SIM
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 120)
    exact = {r["vec_id"]: r for r in
             SIM.hard_negative_mining(emb).collect()}
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    lsh_rows = SIM.hard_negative_mining_lsh(emb).collect()
    assert len(lsh_rows) == len(exact)
    hits = total = 0
    for r in lsh_rows:
        if r["hn_id"] is None:
            continue
        total += 1
        assert labels[r["hn_id"]] != r["label"]
        assert r["hn_cos"] <= exact[r["vec_id"]]["hn_cos"] + 1e-9
        if r["hn_id"] == exact[r["vec_id"]]["hn_id"]:
            hits += 1
    assert total > 0
    # cells group by dot-similarity: recall of the true hardest
    # negative should be well above chance (loose floor, not flaky)
    assert hits / total > 0.2
