"""1×/10× probe for the round-6 continuation operators
(ewma_prices, prefix_filter_pairs, the evaluation tier,
waiting_suppliers, logit_quality_fit). Same
materialize-a-tmp-sf-dir method as scale_probe_r6.py; growth
directions are the realistic ones:

  documents — 10× docs with per-copy consonant rotation
              (scale_probe.docs_10x): within-copy near-dups survive,
              copies don't pair with each other — the prefix join's
              candidate space grows with the corpus, not trivially.
  events    — 10× TICKERS (event_type suffixed per copy; dates and
              users untouched): the EWMA recursion is sequential per
              ticker, so the scale direction is MORE series in
              parallel, each the same length — at 1000 executors the
              fold spreads across tickers.

Results feed SCALING.md.

Usage: python tools/scale_probe_r6b.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench, docs_10x  # noqa: E402

TMP10 = "/tmp/sf10x_r6b"
BIG = 10_000_000


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r6b")

    shutil.rmtree(TMP10, ignore_errors=True)
    os.makedirs(TMP10, exist_ok=True)

    docs_10x(read_table(spark, sf, "documents")) \
        .write.mode("overwrite").parquet(f"{TMP10}/documents.parquet")

    ev = read_table(spark, sf, "events")
    parts = [ev.select(
        (F.col("event_id") + i * BIG).alias("event_id"),
        "user_id",
        F.concat("event_type", F.lit(f"_{i}")).alias("event_type"),
        "ts", "value", "props") for i in range(10)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{TMP10}/events.parquet")

    # orders/lineitem 10x with shifted keys (waiting_suppliers joins
    # them on the order key); supplier stays 1x — the realistic
    # direction (dimension bounded, fact grows)
    o = read_table(spark, sf, "orders")
    op = [o.withColumn("o_orderkey", F.col("o_orderkey") + i * BIG)
          for i in range(10)]
    oo = op[0]
    for p in op[1:]:
        oo = oo.unionByName(p)
    oo.write.mode("overwrite").parquet(f"{TMP10}/orders.parquet")
    li = read_table(spark, sf, "lineitem")
    lp = [li.withColumn("l_orderkey", F.col("l_orderkey") + i * BIG)
          for i in range(10)]
    ll = lp[0]
    for p in lp[1:]:
        ll = ll.unionByName(p)
    ll.write.mode("overwrite").parquet(f"{TMP10}/lineitem.parquet")
    read_table(spark, sf, "supplier").write.mode("overwrite") \
        .parquet(f"{TMP10}/supplier.parquet")
    print("built 10x documents + events + orders/lineitem", flush=True)

    import __spark_entry__ as E  # noqa: E402
    qs = E.queries()
    for q in ("ewma_prices", "prefix_filter_pairs", "score_auc",
              "pr_curve", "score_ks", "chi2_lang_source",
              "waiting_suppliers", "logit_quality_fit"):
        bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        bench(f"{q} 10x", lambda q=q: qs[q](spark, TMP10))

    shutil.rmtree(TMP10, ignore_errors=True)


if __name__ == "__main__":
    main()
