"""1x/10x scaling probe for the warehouse query family (Q7/Q13/Q14/
Q15/Q18/Q22 analogs) and the text repetition score.

Unlike tools/scale_probe.py (which unions shifted copies in-memory per
operator), this builds a full key-shifted 10x STAR SCHEMA on disk under
/tmp so the probed functions run unmodified via their (spark, sf_dir)
signature: orderkey/custkey/suppkey/partkey all shift by i*max per
copy, so join fan-outs and key cardinalities scale with volume (10x
customers each with their own orders — not 10 duplicates of each key).
Dimension tables nation/region stay 1x (they are genuinely fixed-size
dims). Document texts get a per-copy consonant rotation so bigram
content decorrelates.

Timing: noop sink (full execution, no fetch), min-of-2, warm JVM.

Usage: python tools/scale_probe_warehouse.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.operators import warehouse as WH  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

CONS = "tnsrhldcm"
ROT = {c: CONS[(i + 1) % len(CONS)] for i, c in enumerate(CONS)}

SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
}
COPY_1X = ["nation", "region"]


def build_10x(spark, sf_dir: str, out_dir: str) -> None:
    maxes = {}
    for t, cols in SHIFT_COLS.items():
        df = read_table(spark, sf_dir, t)
        maxes[t] = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in cols}
    # one shared offset space per key family so FKs stay consistent
    off = {
        "orderkey": maxes["orders"]["o_orderkey"],
        "custkey": maxes["customer"]["c_custkey"],
        "suppkey": maxes["supplier"]["s_suppkey"],
        "partkey": maxes["part"]["p_partkey"],
        "doc_id": maxes["documents"]["doc_id"],
        "event_id": maxes["events"]["event_id"],
        "user_id": maxes["events"]["user_id"],
    }
    fam = lambda c: (c if c in off                       # noqa: E731
                     else c.split("_", 1)[1])

    for t, cols in SHIFT_COLS.items():
        base = read_table(spark, sf_dir, t)
        parts = []
        for i in range(10):
            d = base
            for c in cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * off[fam(c)]))
            if t == "documents" and i > 0:
                rot = "".join(CONS[(j + i) % len(CONS)] for j in range(len(CONS)))
                d = d.withColumn("text", F.translate("text", CONS, rot))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in COPY_1X:
        read_table(spark, sf_dir, t).write.mode("overwrite") \
            .parquet(f"{out_dir}/{t}.parquet")


PROBES = {
    "nation_trade_volume": WH.nation_trade_volume,
    "cust_order_histogram": WH.cust_order_histogram,
    "promo_revenue_share": WH.promo_revenue_share,
    "top_supplier": WH.top_supplier,
    "big_orders": WH.big_orders,
    "idle_rich_customers": WH.idle_rich_customers,
    "repetition_score": lambda s, d: TX.repetition_score(
        read_table(s, d, "documents")),
    # late-r2 additions: the blocked fuzzy matcher (pair volume is
    # Σ|block|² — brand count is FIXED, so 10× parts → 100× pairs:
    # the honest blocked-matcher envelope), the SCD2 island build
    # (linear, window-dominated), and the two zero-shuffle text-index
    # kernels (linear maps + tiny aggs)
    "fuzzy_name_pairs": WH.fuzzy_name_pairs,
    "scd2_history": WH.scd2_history,
    "bm25_search": lambda s, d: TX.bm25_search(
        read_table(s, d, "documents")),
    "posting_lists": lambda s, d: TX.posting_lists(
        read_table(s, d, "documents")),
}


def timed(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf01_10x_star"
    spark = get_spark("scale_probe_warehouse")
    if not os.path.exists(f"{out}/lineitem.parquet"):
        print("building 10x star schema at", out, flush=True)
        build_10x(spark, sf, out)
    print("| operator | 1x | 10x | ratio |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name, fn in PROBES.items():
        t1 = timed(fn, spark, sf)
        t10 = timed(fn, spark, out)
        r = t10 / t1 if t1 > 0 else float("nan")
        print(f"| {name} | {t1:.1f} s | {t10:.1f} s | {r:.1f} |", flush=True)


if __name__ == "__main__":
    main()
