"""1×/10× probe for the round-5 batch-2 operators (ngram_novelty,
rouge's verified-pair bound, sales_cube_gid, ohlc_bars, knn_classify,
image phash). Same decorrelated 10× builders as scale_probe_r5;
lineitem/events-backed ops use a 10× union-with-shifted-keys replica
(cube/ohlc costs are content-independent). Results feed SCALING.md.

Usage: python tools/scale_probe_r5b.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import multimodal as MM  # noqa: E402
from etl_portfolio_tracker_spark.operators import sessions as SE  # noqa: E402
from etl_portfolio_tracker_spark.operators import similarity as SIM  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench, docs_10x, emb_10x  # noqa: E402


def events_10x(ev):
    reps = [ev.select((F.col("event_id") + F.lit(i * 10_000_000))
                      .alias("event_id"),
                      (F.col("ts") + F.expr(f"INTERVAL {i * 7} DAYS"))
                      .alias("ts"),
                      (F.col("user_id") + F.lit(i * 1_000_000))
                      .alias("user_id"),
                      "event_type",
                      (F.col("value") + F.lit(float(i))).alias("value"),
                      "props")
            for i in range(10)]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r5b")
    docs1 = read_table(spark, sf, "documents")
    docs10 = docs_10x(docs1).localCheckpoint(eager=True)
    emb1 = read_table(spark, sf, "embeddings")
    # emb_10x drops `label` (the similarity builders don't need it);
    # knn votes on labels, so re-attach a deterministic one
    emb10 = (emb_10x(emb1)
             .withColumn("label", (F.col("vec_id") % 8).cast("int"))
             .localCheckpoint(eager=True))
    ev1 = read_table(spark, sf, "events")
    ev10 = events_10x(ev1).localCheckpoint(eager=True)

    bench("ngram_novelty 1x", lambda: TX.ngram_novelty(docs1))
    bench("ngram_novelty 10x", lambda: TX.ngram_novelty(docs10))
    bench("ohlc_bars 1x", lambda: SE.ohlc_bars(ev1))
    bench("ohlc_bars 10x", lambda: SE.ohlc_bars(ev10))
    bench("image_phash 1x",
          lambda: MM.image_phash(MM.text_to_images(docs1)))
    bench("image_phash 10x",
          lambda: MM.image_phash(MM.text_to_images(docs10)))
    bench("image_phash_pairs 1x", lambda: MM.image_phash_pairs(docs1))
    bench("image_phash_pairs 10x", lambda: MM.image_phash_pairs(docs10))
    # knn_classify's query set is |corpus|/KNN_QUERY_MOD, so the pair
    # scan grows ~100× across a 10× corpus (Q and N both 10×): probe
    # the registered bound at 1× and the SAME query-count at 10× to
    # separate the corpus axis (linear) from the query axis (linear).
    bench("knn_classify 1x", lambda: SIM.knn_classify(emb1))
    bench("knn_classify 10x corpus, same Q",
          lambda: SIM.knn_classify(emb10,
                                   query_mod=SIM.KNN_QUERY_MOD * 10))


if __name__ == "__main__":
    main()
