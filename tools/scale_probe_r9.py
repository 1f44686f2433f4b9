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
    """100x users for streaming_twr_replay: replicate the events table
    100x with shifted user ids (same convention as the r8 10x probe)."""
    from etl_portfolio_tracker_spark.streaming import replay as R
    spark = get_spark("probe_r9_stwr")
    ev = read_table(spark, sf, "events").cache()
    nu = ev.agg(F.max("user_id")).collect()[0][0] + 1
    copies = 100
    parts = [ev]
    for i in range(1, copies):
        parts.append(ev.withColumn(
            "user_id", F.col("user_id") + F.lit(i * nu)))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp = "/tmp/events_100x_r9"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    big.repartition(64).write.parquet(tmp)
    ev.unpersist()
    n_in = spark.read.parquet(tmp).count()
    t0 = time.time()
    out = R.streaming_twr_replay_from_events(spark, tmp) \
        if hasattr(R, "streaming_twr_replay_from_events") else None
    if out is None:
        # fall back to the registered query against a synthetic sf dir
        import os
        sfdir = "/tmp/sf_100x_users_r9"
        shutil.rmtree(sfdir, ignore_errors=True)
        os.makedirs(sfdir)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            os.symlink(f"{sf}/{t}.parquet", f"{sfdir}/{t}.parquet")
        spark.read.parquet(tmp).coalesce(8).write.parquet(
            f"{sfdir}/events.parquet")
        import __spark_entry__ as E
        t0 = time.time()
        out = E.queries()["streaming_twr_replay"](spark, sfdir)
    n = out.count()
    wall = time.time() - t0
    print({"probe": "streaming_twr_replay_100x_users", "base_sf": sf,
           "events_rows": n_in, "out_rows": n,
           "wall_sec": round(wall, 2)})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "probe1"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    {"probe1": probe1, "probe2": probe2, "probe3": probe3}[which](sf)
