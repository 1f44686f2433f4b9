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
    q50 = approx["price_quantiles"][0]
    assert abs(q50 - exact["p50"]) <= 0.05 * exact["p50"]
