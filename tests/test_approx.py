"""Approximate-aggregate error bounds vs exact (no cross-engine
oracle exists for sketches — this is the correctness check)."""

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark.io import read_table
from etl_portfolio_tracker_spark.operators import headline as HL


def test_approx_stats_bounds(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50")).collect()[0]
    approx = HL.approx_stats(spark, sf_dir).collect()[0]
    # HLL++ with rsd=2% → allow 5x the target rsd as hard bound
    assert abs(approx["approx_parts"] - exact["parts"]) <= 0.10 * exact["parts"]
    assert abs(approx["approx_orders"] - exact["orders"]) <= 0.10 * exact["orders"]
    q50 = approx["price_q50"]
    assert abs(q50 - exact["p50"]) <= 0.05 * exact["p50"]


def test_approx_stats_bounds_per_group(spark, sf_dir):
    # per-group tightening (round-4): the global bound can hide a
    # sketch that is wildly off inside one group and compensating in
    # another; HLL++ and the quantile sketch are MERGEABLE, so the
    # same rsd must hold inside every partial — check it per
    # l_returnflag group with the exact same sketch parameters
    # approx_stats uses.
    li = read_table(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()}
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
        F.percentile_approx("l_extendedprice", [0.5], 10_000)
         .alias("q")).collect()
    assert len(approx) == len(exact) >= 2          # real multi-group
    for row in approx:
        ex = exact[row["l_returnflag"]]
        assert abs(row["a_parts"] - ex["parts"]) <= 0.10 * ex["parts"]
        assert abs(row["a_orders"] - ex["orders"]) <= 0.10 * ex["orders"]
        assert abs(row["q"][0] - ex["p50"]) <= 0.05 * ex["p50"]
