"""Property tests for the two-pass distributed rank/sweep helpers —
the round-6 scale-killer replacements must be BIT-IDENTICAL to the
single-window forms they replaced, for arbitrary value sets including
duplicates, negatives, and single rows.

One Spark job per hypothesis example (small example counts — each
example is a full Spark round trip).
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

from etl_portfolio_tracker_spark.operators.packing import (
    ranged_cumsum, ranged_prefix_max)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long")


vals = st.lists(st.integers(min_value=-50, max_value=50),
                min_size=1, max_size=40)


@settings(max_examples=8, deadline=None)
@given(vals)
def test_ranged_cumsum_equals_global_window(spark, xs):
    df = _df(spark, xs)
    got = {r["id"]: r["_cum"] for r in
           ranged_cumsum(df.withColumn("_one", F.lit(1).cast("long")),
                         "_one", [F.asc("v"), F.asc("id")],
                         n_parts=4).collect()}
    w = (W.orderBy(F.asc("v"), F.asc("id"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    want = {r["id"]: r["rk"] for r in
            df.select("id", F.sum(F.lit(1).cast("long")).over(w)
                      .alias("rk")).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(vals)
def test_ranged_prefix_max_equals_global_window(spark, xs):
    df = _df(spark, xs)
    got = {r["id"]: r["_pmax"] for r in
           ranged_prefix_max(df, "v", [F.asc("v"), F.asc("id")],
                             n_parts=4).collect()}
    w = (W.orderBy(F.asc("v"), F.asc("id"))
         .rowsBetween(W.unboundedPreceding, -1))
    want = {r["id"]: r["mx"] for r in
            df.select("id", F.max("v").over(w).alias("mx")).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(vals)
def test_ranged_prefix_max_skyline_order(spark, xs):
    # the skyline's actual ordering shape: DESC secondary key + the
    # sweep value equal to one of the order keys
    df = _df(spark, xs)
    order = [F.asc("v"), F.desc("id")]
    got = {r["id"]: r["_pmax"] for r in
           ranged_prefix_max(df, "id", order, n_parts=4).collect()}
    w = (W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1))
    want = {r["id"]: r["mx"] for r in
            df.select("id", F.max("id").over(w).alias("mx")).collect()}
    assert got == want
