"""1×/10× probe for the round-6 operators. The (spark, sf_dir)-shaped
warehouse/portfolio queries read tables internally, so the 10× frames
are MATERIALIZED as a parquet sf-dir in /tmp and the queries run
against it unmodified — the probe measures the same code path the
registry runs.

Growth directions are the realistic 100 TB ones, decorrelated (not
replicas):
  events   — 10× USERS (user_id shifted per copy; tickers/dates stay
             bounded): portfolios scale horizontally, panels stay
             per-user sized. event_ids shifted too, so sides/qty/fee
             mappings differ per copy.
  orders   — 10× orders (o_orderkey/o_custkey shifted; prices jittered
             deterministically per copy so rank cuts move).
  lineitem — matches the orders shift (joins stay 1:1 valid).
  part     — 10× parts (p_partkey shifted, retailprice jittered).
  embeddings — 10× vectors with rotated positions (scale_probe rule)
             keeping label, vec_ids dense 0-based (hnm_lsh codebook).

Results feed SCALING.md.

Usage: python tools/scale_probe_r6.py [sf_dir]
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

TMP10 = "/tmp/sf10x_r6"
BIG = 10_000_000


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r6")

    shutil.rmtree(TMP10, ignore_errors=True)
    os.makedirs(TMP10, exist_ok=True)

    def tenx(name, build):
        t0 = time.time()
        parts = [build(read_table(spark, sf, name), i) for i in range(10)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{TMP10}/{name}.parquet")
        print(f"built {name} 10x [{time.time()-t0:.1f}s]", flush=True)

    tenx("events", lambda ev, i: ev.select(
        (F.col("event_id") + i * BIG).alias("event_id"),
        (F.col("user_id") + i * BIG).alias("user_id"),
        "event_type", "ts", "value", "props"))
    tenx("orders", lambda o, i: o.select(
        (F.col("o_orderkey") + i * BIG).alias("o_orderkey"),
        (F.col("o_custkey") + i * BIG).alias("o_custkey"),
        "o_orderstatus",
        (F.col("o_totalprice") + i * 0.07).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority"))
    tenx("lineitem", lambda li, i: li.withColumn(
        "l_orderkey", F.col("l_orderkey") + i * BIG))
    tenx("part", lambda p, i: p.select(
        (F.col("p_partkey") + i * BIG).alias("p_partkey"),
        "p_name", "p_brand", "p_type", "p_size",
        (F.col("p_retailprice") + i * 0.07).alias("p_retailprice")))
    n_emb = read_table(spark, sf, "embeddings").count()
    tenx("embeddings", lambda e, i: e.select(
        (F.col("vec_id") + i * n_emb).alias("vec_id"),
        F.expr(f"concat(slice(embedding, {i + 1}, size(embedding) - {i}),"
               f" slice(embedding, 1, {i}))").alias("embedding"),
        "label"))

    import __spark_entry__ as E  # noqa: E402
    QS = ["portfolio_twr", "basket_index", "hard_negative_mining_lsh",
          "equi_depth_histogram", "customer_spend_percentile",
          "skyline_parts"]
    qs = E.queries()
    for q in QS:
        bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        bench(f"{q} 10x", lambda q=q: qs[q](spark, TMP10))

    shutil.rmtree(TMP10, ignore_errors=True)


if __name__ == "__main__":
    main()
