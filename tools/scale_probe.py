"""1×/10× scaling probe: times representative operators on sf0.1 and
on a synthetic 10× built by unioning ten key-shifted copies, so key
cardinalities scale with volume (10× docs/vectors/orders, not 10
duplicates of each key). Results feed SCALING.md.

Copies are decorrelated where the operator is sensitive to content:
document texts get a per-copy consonant rotation (translate) so the
10× corpus has 10× distinct shingle families rather than ten
byte-identical replicas collapsing into one giant near-dup cluster.

Timing sinks to the `noop` format (full execution, no fetch).

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import dedup as DD  # noqa: E402
from etl_portfolio_tracker_spark.operators import headline as HL  # noqa: E402
from etl_portfolio_tracker_spark.operators import similarity as SIM  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

CONS = "tnsrhldcm"


def docs_10x(docs: DataFrame) -> DataFrame:
    n = docs.count()
    extra = [c for c in docs.columns if c not in ("doc_id", "text")]
    parts = []
    for i in range(10):
        rot = CONS[i:] + CONS[:i]
        parts.append(docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.translate("text", CONS, rot).alias("text"),
            # sources/lang survive unchanged: the 10× corpus means 10×
            # docs per source, which is the realistic skew direction
            *extra))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def emb_10x(emb: DataFrame) -> DataFrame:
    n = emb.count()
    parts = []
    for i in range(10):
        # rotate the vector positions per copy so copies land in
        # different buckets/cells
        parts.append(emb.select(
            (F.col("vec_id") + i * n).alias("vec_id"),
            F.expr(f"concat(slice(embedding, {i + 1}, size(embedding) - {i}),"
                   f" slice(embedding, 1, {i}))").alias("embedding")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fact_10x(df: DataFrame, key: str) -> DataFrame:
    n = 10_000_000
    parts = [df.withColumn(key, F.col(key) + i * n) for i in range(10)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bench(label: str, fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    docs1 = read_table(spark, sf, "documents")
    docs10 = docs_10x(docs1).localCheckpoint(eager=True)
    emb1 = read_table(spark, sf, "embeddings")
    emb10 = emb_10x(emb1).localCheckpoint(eager=True)
    li1 = read_table(spark, sf, "lineitem")
    li10 = fact_10x(li1, "l_partkey").localCheckpoint(eager=True)

    bench("minhash_lsh 1x", lambda: DD.minhash_lsh_candidates(docs1))
    bench("minhash_lsh 10x", lambda: DD.minhash_lsh_candidates(docs10))
    bench("simhash 1x", lambda: DD.simhash(docs1))
    bench("simhash 10x", lambda: DD.simhash(docs10))
    bench("lsh_buckets 1x", lambda: SIM.lsh_buckets(emb1))
    bench("lsh_buckets 10x", lambda: SIM.lsh_buckets(emb10))
    bench("ivf_assign 1x", lambda: SIM.ivf_assign(emb1))
    bench("ivf_assign 10x", lambda: SIM.ivf_assign(emb10))

    # iterative CC materializes during construction — time end-to-end
    for label, d in (("dedup_clusters 1x", docs1),
                     ("dedup_clusters 10x", docs10)):
        t0 = time.time()
        DD.dedup_clusters(d).write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)

    # near-dup candidate growth: banded LSH + bucket cap must keep the
    # pair count growing ~linearly (per-bucket density flat) as the
    # corpus scales 10× — the r1 single-band formulation grew it
    # quadratically (VERDICT r1 #6)
    for label, e in (("embedding_near_dup 1x", emb1),
                     ("embedding_near_dup 10x", emb10)):
        t0 = time.time()
        n_pairs = SIM.embedding_near_dup_pairs(e).count()
        bp = SIM.adaptive_band_planes(e.count())
        print(f"{label}: {time.time() - t0:.2f}s  pairs={n_pairs} "
              f"(band_planes={bp}, cap={SIM.NEAR_DUP_BUCKET_CAP})",
              flush=True)

    # band-only probe for the quantity range join needs no shifted keys
    def qty_fn(li):
        bands = spark.createDataFrame(
            HL.QTY_BANDS, "band_id long, band string, lo double, hi double")
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        from etl_portfolio_tracker_spark.derive import dsum
        return (li.join(F.broadcast(bands),
                        (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
                .groupBy("band")
                .agg(F.round(dsum(rev), 2).cast("double").alias("revenue")))
    bench("qty_band 1x", lambda: qty_fn(li1))
    bench("qty_band 10x", lambda: qty_fn(li10))

    # round-2 additions: sequence packing, chunk dedup, PQ — all
    # should scale ~linearly (packing: one shuffle on the bin key;
    # chunk_dedup: one shuffle on chunk text; PQ: broadcast + map)
    from etl_portfolio_tracker_spark.operators import packing as PK
    bench("pack_sequences 1x", lambda: PK.pack_sequences(docs1))
    bench("pack_sequences 10x", lambda: PK.pack_sequences(docs10))
    bench("chunk_dedup 1x", lambda: PK.chunk_dedup(docs1))
    bench("chunk_dedup 10x", lambda: PK.chunk_dedup(docs10))
    bench("pq_codes 1x", lambda: SIM.pq_codes(emb1))
    bench("pq_codes 10x", lambda: SIM.pq_codes(emb10))

    # round-2 late additions: epoch shuffle (hash-bucket + in-bucket
    # rank — one uniform shuffle), token-budget mix (source shuffle +
    # cumsum window), ANN recall (one scan + one qid window)
    bench("epoch_shuffle 1x", lambda: PK.epoch_shuffle(docs1))
    bench("epoch_shuffle 10x", lambda: PK.epoch_shuffle(docs10))
    bench("token_budget_mix 1x", lambda: PK.token_budget_mix(docs1))
    bench("token_budget_mix 10x", lambda: PK.token_budget_mix(docs10))
    bench("ann_recall 1x", lambda: SIM.ann_recall(emb1))
    bench("ann_recall 10x", lambda: SIM.ann_recall(emb10))
    bench("bigram_lm_score 1x", lambda: TX.bigram_lm_score(docs1))
    bench("bigram_lm_score 10x", lambda: TX.bigram_lm_score(docs10))
    bench("pagerank 1x", lambda: DD.pagerank(docs1))
    bench("pagerank 10x", lambda: DD.pagerank(docs10))
    bench("corpus_prune 1x", lambda: DD.corpus_prune(docs1))
    bench("corpus_prune 10x", lambda: DD.corpus_prune(docs10))

    # round-3 additions: delta-vs-corpus index join (linear in delta +
    # index size), substring anchors (linear map + DF-capped join),
    # per-source quantile rank (two-pass distributed rank — no stage
    # bounded by the largest source)
    bench("delta_dedup 1x", lambda: DD.delta_dedup(docs1))
    bench("delta_dedup 10x", lambda: DD.delta_dedup(docs10))
    bench("common_substring_pairs 1x",
          lambda: DD.common_substring_pairs(docs1))
    bench("common_substring_pairs 10x",
          lambda: DD.common_substring_pairs(docs10))
    bench("quality_quantile_cut 1x",
          lambda: TX.quality_quantile_cut(docs1))
    bench("quality_quantile_cut 10x",
          lambda: TX.quality_quantile_cut(docs10))
    bench("simhash_pairs 1x", lambda: DD.simhash_pairs(docs1))
    bench("simhash_pairs 10x", lambda: DD.simhash_pairs(docs10))

    # BPE trains through driver-coordinated rounds with collects —
    # time end-to-end like the CC probes
    from etl_portfolio_tracker_spark.operators import bpe as BP
    for label, d in (("bpe_train 1x", docs1), ("bpe_train 10x", docs10)):
        t0 = time.time()
        BP.bpe_train(d).write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
