"""1×/10× probe for the round-5 operators. Reuses scale_probe's
decorrelated 10× builders (10× distinct content, not replicas) for
docs/embeddings; events/lineitem-backed ops scale with their source
tables, so their growth is read from the committed bench instead.
Results feed SCALING.md.

Usage: python tools/scale_probe_r5.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import similarity as SIM  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench, docs_10x, emb_10x  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r5")
    docs1 = read_table(spark, sf, "documents")
    docs10 = docs_10x(docs1).localCheckpoint(eager=True)
    emb1 = read_table(spark, sf, "embeddings")
    emb10 = emb_10x(emb1).localCheckpoint(eager=True)

    bench("winnowing_fingerprints 1x",
          lambda: TX.winnowing_fingerprints(docs1))
    bench("winnowing_fingerprints 10x",
          lambda: TX.winnowing_fingerprints(docs10))
    bench("char_entropy 1x", lambda: TX.char_entropy(docs1))
    bench("char_entropy 10x", lambda: TX.char_entropy(docs10))
    bench("readability 1x", lambda: TX.readability_scores(docs1))
    bench("readability 10x", lambda: TX.readability_scores(docs10))
    bench("unigram_perplexity 1x", lambda: TX.unigram_perplexity(docs1))
    bench("unigram_perplexity 10x", lambda: TX.unigram_perplexity(docs10))
    bench("normalized_dedup 1x", lambda: TX.normalized_dedup(docs1))
    bench("normalized_dedup 10x", lambda: TX.normalized_dedup(docs10))
    bench("hapax_ratio 1x", lambda: TX.hapax_ratio(docs1))
    bench("hapax_ratio 10x", lambda: TX.hapax_ratio(docs10))
    bench("balanced_downsample 1x", lambda: TX.balanced_downsample(docs1))
    bench("balanced_downsample 10x", lambda: TX.balanced_downsample(docs10))
    bench("lang_id_confusion 1x", lambda: TX.lang_id_confusion(docs1))
    bench("lang_id_confusion 10x", lambda: TX.lang_id_confusion(docs10))
    bench("quantize_int8 1x", lambda: SIM.embedding_quantize_int8(emb1))
    bench("quantize_int8 10x", lambda: SIM.embedding_quantize_int8(emb10))
    bench("pca_power_iter 1x", lambda: SIM.pca_power_iteration(emb1))
    bench("pca_power_iter 10x", lambda: SIM.pca_power_iteration(emb10))
    # hard_negative_mining is N² BY DESIGN (exact baseline): probe the
    # bounded form the registered query uses at 1× and 2× the bound to
    # show the quadratic axis explicitly rather than hiding it.
    from pyspark.sql import functions as F
    bench("hard_negative_mining n=300",
          lambda: SIM.hard_negative_mining(
              emb1.filter(F.col("vec_id") < 300)))
    bench("hard_negative_mining n=600",
          lambda: SIM.hard_negative_mining(
              emb1.filter(F.col("vec_id") < 600)))


if __name__ == "__main__":
    main()
