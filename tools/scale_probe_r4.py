"""1×/10× probe for the round-4 operators (word_entropy,
pmi_top_pairs, ngram_dup_spans, doc_chunks, stratified_kfold,
semantic_dedup). Reuses scale_probe's decorrelated 10× builders so
the 10× corpus has 10× distinct content, not ten replicas. Results
feed SCALING.md.

Usage: python tools/scale_probe_r4.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import packing as PK  # noqa: E402
from etl_portfolio_tracker_spark.operators import similarity as SIM  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench, docs_10x, emb_10x  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r4")
    docs1 = read_table(spark, sf, "documents")
    docs10 = docs_10x(docs1).localCheckpoint(eager=True)
    emb1 = read_table(spark, sf, "embeddings")
    emb10 = emb_10x(emb1).localCheckpoint(eager=True)

    bench("word_entropy 1x", lambda: TX.word_entropy(docs1))
    bench("word_entropy 10x", lambda: TX.word_entropy(docs10))
    bench("pmi_top_pairs 1x", lambda: TX.pmi_top_pairs(docs1))
    bench("pmi_top_pairs 10x", lambda: TX.pmi_top_pairs(docs10))
    bench("doc_chunks 1x", lambda: PK.doc_chunks(docs1))
    bench("doc_chunks 10x", lambda: PK.doc_chunks(docs10))
    bench("stratified_kfold 1x", lambda: PK.stratified_kfold(docs1))
    bench("stratified_kfold 10x", lambda: PK.stratified_kfold(docs10))
    bench("ngram_dup_spans 1x", lambda: TX.ngram_dup_spans(docs1))
    bench("ngram_dup_spans 10x", lambda: TX.ngram_dup_spans(docs10))

    # cardinality check: duplicated grams should NOT grow
    # quadratically (translate-rotation decorrelates copies, so only
    # within-copy duplicate families remain shared)
    for label, d in (("ngram_dup_spans 1x", docs1),
                     ("ngram_dup_spans 10x", docs10)):
        row = (TX.ngram_dup_spans(d)
               .groupBy()
               .sum("n_grams", "n_dup_grams", "covered_words")
               .collect()[0])
        print(f"{label} cardinality: grams={row[0]} dup={row[1]} "
              f"covered={row[2]}", flush=True)

    # semantic_dedup: the √N cell rule must keep intra-cell pair work
    # ~N^1.5 — report cells and candidate pair count alongside time
    for label, e in (("semantic_dedup 1x", emb1),
                     ("semantic_dedup 10x", emb10)):
        n = e.count()
        cells = SIM.semantic_cells(n)
        t0 = time.time()
        out = SIM.semantic_dedup(e)
        n_dup = out.filter("is_dup").count()
        print(f"{label}: {time.time() - t0:.2f}s  n={n} cells={cells} "
              f"dups={n_dup}", flush=True)


if __name__ == "__main__":
    main()
