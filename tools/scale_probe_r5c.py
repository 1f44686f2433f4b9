"""1×/10× probe for the round-5 sketch-tier batch (hll_distinct,
cms_heavy_hitters, bloom_chunk_probe, winsorized_stats,
ivf_balance_report). Same harness as scale_probe.py: decorrelated
10× builders (rotated consonants / rotated vector positions, so the
bigger corpus is NEW content, not replicas), min-of-2 noop-sink
timings. Sketch expectation: build time grows ~linearly with input
(one scan), while SKETCH STATE stays constant (64 registers / 512
counters / m bits) — the probe measures the former; the latter is
structural. Results feed SCALING.md.

Usage: python tools/scale_probe_r5c.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import similarity as SIM  # noqa: E402
from etl_portfolio_tracker_spark.operators import sketches as SK  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench, docs_10x, emb_10x, fact_10x  # noqa: E402


def events_10x(ev):
    """10× events with 10× distinct users (shifted user ids per copy
    — the growth direction that matters for a cardinality sketch)."""
    n = 10_000_000
    parts = [ev.select(
        (F.col("event_id") + i * n).alias("event_id"), "ts",
        (F.col("user_id") + i * n).alias("user_id"),
        "event_type", "value", "props") for i in range(10)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r5c")
    docs1 = read_table(spark, sf, "documents")
    docs10 = docs_10x(docs1).localCheckpoint(eager=True)
    emb1 = read_table(spark, sf, "embeddings")
    emb10 = emb_10x(emb1).localCheckpoint(eager=True)
    ev1 = read_table(spark, sf, "events")
    ev10 = events_10x(ev1).localCheckpoint(eager=True)

    bench("hll_distinct 1x", lambda: SK.hll_distinct(ev1))
    bench("hll_distinct 10x", lambda: SK.hll_distinct(ev10))
    bench("cms_heavy_hitters 1x", lambda: SK.cms_heavy_hitters(docs1))
    bench("cms_heavy_hitters 10x", lambda: SK.cms_heavy_hitters(docs10))
    bench("bloom_chunk_probe 1x", lambda: SK.bloom_chunk_probe(docs1))
    bench("bloom_chunk_probe 10x", lambda: SK.bloom_chunk_probe(docs10))
    bench("winsorized_stats 1x", lambda: TX.winsorized_stats(docs1))
    bench("winsorized_stats 10x", lambda: TX.winsorized_stats(docs10))
    bench("ivf_balance_report 1x", lambda: SIM.ivf_balance_report(emb1))
    bench("ivf_balance_report 10x", lambda: SIM.ivf_balance_report(emb10))
    bench("hll_set_ops 1x", lambda: SK.hll_set_ops(ev1))
    bench("hll_set_ops 10x", lambda: SK.hll_set_ops(ev10))
    li1 = read_table(spark, sf, "lineitem")
    li10 = fact_10x(li1, "l_orderkey").localCheckpoint(eager=True)
    bench("join_size_estimate 1x", lambda: SK.join_size_estimate(li1))
    bench("join_size_estimate 10x", lambda: SK.join_size_estimate(li10))
    bench("histogram_quantiles 1x", lambda: SK.histogram_quantiles(li1))
    bench("histogram_quantiles 10x", lambda: SK.histogram_quantiles(li10))


if __name__ == "__main__":
    main()
