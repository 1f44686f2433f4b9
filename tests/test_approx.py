"""Approximate-aggregate error bounds vs exact (no cross-engine
oracle exists for sketches — this is the correctness check)."""

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark.io import read_table
from etl_portfolio_tracker_spark.operators import headline as HL


def test_approx_stats_bounds(spark, sf_dir):
    # r8: approx_stats emits engine-agnostic exact values plus
    # within-guarantee booleans (3·rsd / rank ±10/accuracy — tighter
    # than this test's historical 5·rsd bound); the booleans ARE the
    # sketch-error check, and the exact columns must match a direct
    # recompute.
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6)
         .alias("p50")).collect()[0]
    approx = HL.approx_stats(spark, sf_dir).collect()[0]
    assert approx["exact_parts"] == exact["parts"]
    assert approx["exact_orders"] == exact["orders"]
    assert approx["q50_exact"] == exact["p50"]
    assert approx["parts_ok"] and approx["orders_ok"]
    assert approx["q50_ok"] and approx["q95_ok"] and approx["q99_ok"]


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
