"""Round-9 probes (VERDICT r8 Next items 1, 4, 8).

probe1: weighted_jaccard_pairs spread attribution at sf0.1 — one
    timed run per invocation (fresh JVM each time: run the script N
    times), printing the wall plus the POST-execution adaptive plan's
    Exchange / ReusedExchange / Window / SortMergeJoin counts. The
    kn_lm_score lesson (r8): DataFrame branches do NOT share
    subplans, and AQE's exchange-reuse is a lottery — a multi-
    consumer frame that is not checkpointed may compute once on a
    lucky run and twice on an unlucky one, which is exactly a
    same-code 2-3x spread. The suspect here is `pref` (the ranked
    weighted-prefix frame), consumed by BOTH sides of the self-join.

probe2: semantic_clusters attribution — per-phase walls (cell
    assignment / intra-cell edges / CC iterations) and the CC
    iteration count, the _curation_build attribution pattern.

probe3: streaming_twr_replay 100x-users probe (r8 measured 10x ->
    4.4x wall, panel-build dominated; confirm at 100x the state path
    stays user-parallel and panel build remains the growth term).

Usage: python tools/scale_probe_r9.py [probe1|probe2|probe3] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402


def _executed_counts(df) -> dict:
    s = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": s.count("Exchange") - s.count("ReusedExchange"),
        "reused_exchanges": s.count("ReusedExchange"),
        "windows": s.count("Window"),
        "smj": s.count("SortMergeJoin"),
        "plan_lines": s.count("\n"),
    }


def probe1(sf: str) -> None:
    from etl_portfolio_tracker_spark.operators import dedup as DD
    spark = get_spark("probe_r9_wjp")
    docs = read_table(spark, sf, "documents")
    t0 = time.time()
    out = DD.weighted_jaccard_pairs(docs)
    n = out.count()
    wall = time.time() - t0
    print({"probe": "weighted_jaccard_pairs", "sf": sf,
           "rows": n, "wall_sec": round(wall, 2),
           **_executed_counts(out)})


def probe2(sf: str) -> None:
    from etl_portfolio_tracker_spark.operators import similarity as SS
    spark = get_spark("probe_r9_semc")
    emb = read_table(spark, sf, "embeddings")
    t0 = time.time()
    out = SS.semantic_clusters(emb)
    n = out.count()
    wall = time.time() - t0
    print({"probe": "semantic_clusters", "sf": sf, "rows": n,
           "wall_sec": round(wall, 2), **_executed_counts(out)})


def probe3(sf: str) -> None:
    """100x USERS for streaming_twr_replay (VERDICT r8 item 8): the
    r8b convention — user_id/event_id shifted per copy, tickers and
    dates fixed (prices are per-ticker market data, identical at any
    user count), so per-user work is constant and growth is purely
    the state-partitioning dimension. r8 measured 10x users -> 4.4x
    wall, panel-build dominated; this confirms the state path stays
    user-parallel at 100x."""
    import os
    import shutil

    import __spark_entry__ as E
    spark = get_spark("probe_r9_stwr")
    tmp = "/tmp/sf_100x_users_r9"
    # a multiple of lcm(3,10,5)=30: derive.trades maps side/qty/fee
    # from event_id % 3 / % 10 / % 5, so a shift that is NOT a
    # multiple of 30 changes each copy's trade pattern — fine for a
    # wall probe, but it breaks the exact per-copy invariant
    # (out_rows_100x == 100 x out_rows_1x) this probe pins
    big = 30_000_000_000
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ev = read_table(spark, sf, "events")
    eparts = [ev.select((F.col("event_id") + i * big).alias("event_id"),
                        (F.col("user_id") + i * big).alias("user_id"),
                        "event_type", "ts", "value", "props")
              for i in range(100)]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(64).write.mode("overwrite") \
        .parquet(f"{tmp}/events.parquet")
    shutil.copy(os.path.join(sf, "lineitem.parquet"),
                os.path.join(tmp, "lineitem.parquet"))
    n_in = spark.read.parquet(f"{tmp}/events.parquet").count()
    qs = E.queries()
    t0 = time.time()
    n1 = qs["streaming_twr_replay"](spark, sf).count()
    t1 = time.time() - t0
    t0 = time.time()
    n100 = qs["streaming_twr_replay"](spark, tmp).count()
    t100 = time.time() - t0
    print({"probe": "streaming_twr_replay_100x_users", "base_sf": sf,
           "events_rows_100x": n_in, "out_rows_1x": n1,
           "out_rows_100x": n100, "wall_1x_sec": round(t1, 2),
           "wall_100x_sec": round(t100, 2),
           "growth": round(t100 / t1, 1)})
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "probe1"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    {"probe1": probe1, "probe2": probe2, "probe3": probe3}[which](sf)
