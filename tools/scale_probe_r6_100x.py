"""100× probe for the round-6 rank/sweep rewrites — the operators
whose round-5 forms were literal SinglePartition scale-killers. The
rewrites' claim is that the two-pass distributed rank keeps growth
at-or-below data growth two decades up; this measures it at 100×
(orders: 15M rows, part: 2M, lineitem: 60M at sf0.1×100).

Same materialized-parquet approach as scale_probe_r6 (the queries are
(spark, sf_dir)-shaped); keys shifted and prices deterministically
jittered per copy so the rank order is 100× distinct values, not
replicas.

Usage: python tools/scale_probe_r6_100x.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench  # noqa: E402

TMP100 = "/tmp/sf100x_r6"
BIG = 100_000_000


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r6_100x")

    shutil.rmtree(TMP100, ignore_errors=True)
    os.makedirs(TMP100, exist_ok=True)

    def hundredx(name, build):
        t0 = time.time()
        base = read_table(spark, sf, name)
        parts = [build(base, i) for i in range(100)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{TMP100}/{name}.parquet")
        print(f"built {name} 100x [{time.time()-t0:.1f}s]", flush=True)

    hundredx("orders", lambda o, i: o.select(
        (F.col("o_orderkey") + i * BIG).alias("o_orderkey"),
        (F.col("o_custkey") + i * BIG).alias("o_custkey"),
        "o_orderstatus",
        (F.col("o_totalprice") + i * 0.0131).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority"))
    hundredx("part", lambda p, i: p.select(
        (F.col("p_partkey") + i * BIG).alias("p_partkey"),
        "p_name", "p_brand", "p_type", "p_size",
        (F.col("p_retailprice") + i * 0.0131).alias("p_retailprice")))
    hundredx("lineitem", lambda li, i: li.withColumn(
        "l_orderkey", F.col("l_orderkey") + i * BIG))

    import __spark_entry__ as E  # noqa: E402
    qs = E.queries()
    for q in ("equi_depth_histogram", "skyline_parts",
              "customer_spend_percentile"):
        bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        bench(f"{q} 100x", lambda q=q: qs[q](spark, TMP100))

    shutil.rmtree(TMP100, ignore_errors=True)


if __name__ == "__main__":
    main()
