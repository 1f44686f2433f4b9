"""Round-8b 1x/10x probes for the round's NEW operators plus the
post-fix kn_lm_score re-probe.

Directions (established conventions):
  documents — 10x via per-copy substitution ciphers (bijective on
    fixed-width shingles: per-copy structure preserved, vocabulary
    grows ~10x) — zipf_fit / source_js_divergence / qlm_search /
    rrf_fusion / kn_lm_score.
  events — 10x USERS (user_id/event_id shifted per copy; tickers and
    dates stay fixed, so per-user work is constant and the growth is
    purely in the partitioning dimension) — streaming_twr_replay.

Usage: python tools/scale_probe_r8b.py [sf_dir]
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench  # noqa: E402

TMP = "/tmp/sf10x_r8b"
ALPHA = string.ascii_lowercase
BIG = 10_000_000


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r8b")
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)

    docs = read_table(spark, sf, "documents")
    n = docs.count()
    parts = []
    for i in range(10):
        perm = list(ALPHA)
        random.Random(i).shuffle(perm)
        parts.append(docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.translate("text", ALPHA, "".join(perm)).alias("text"),
            "lang",
            # sources shifted per copy too: source_js_divergence's
            # pair fan-out is |sources|² per shared word — the honest
            # growth direction is more FEEDS, not heavier feeds
            F.concat(F.col("source"), F.lit(f"_c{i}")).alias("source"),
            "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
       .parquet(f"{TMP}/documents.parquet")
    print(f"built 10x documents ({n * 10} docs)", flush=True)

    ev = read_table(spark, sf, "events")
    eparts = [ev.select((F.col("event_id") + i * BIG).alias("event_id"),
                        (F.col("user_id") + i * BIG).alias("user_id"),
                        "event_type", "ts", "value", "props")
              for i in range(10)]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite") \
        .parquet(f"{TMP}/events.parquet")
    # prices are per-ticker market data — identical at any user count
    shutil.copy(os.path.join(sf, "lineitem.parquet"),
                os.path.join(TMP, "lineitem.parquet"))
    print("built 10x-users events", flush=True)

    import __spark_entry__ as E  # noqa: E402
    qs = E.queries()
    for q in ("zipf_fit", "source_js_divergence", "qlm_search",
              "rrf_fusion", "kn_lm_score", "streaming_twr_replay"):
        t1 = bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        t2 = bench(f"{q} 10x", lambda q=q: qs[q](spark, TMP), runs=1)
        print(f"{q}: growth {t2 / t1:.1f}x wall for 10x", flush=True)

    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
