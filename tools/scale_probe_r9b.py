"""Round-9b 1x/10x probes for the six new r9 operators, each grown
along its HONEST dimension (the r8b convention):

- documents 10x via per-copy substitution ciphers (shared structure,
  disjoint vocabularies; doc_ids shifted) -> dsir_weights (langs kept,
  so the en-target slice grows 10x with the corpus) and curation_serve
  (the band-key index is built at 10x UNTIMED - it is the nightly
  artifact - then the serve path is timed).
- events 10x TICKERS (event_type suffixed per copy, event_id shifted
  by a multiple of 30 to keep derive.trades' modulo mapping
  copy-invariant, user_id kept) -> holt_winters /
  streaming_holt_replay: the recursion is per-ticker, so more tickers
  is the growth axis that must stay key-parallel.
- lineitem 10x via sf0.01 -> sf0.1 (the TPC-H axis) -> adamic_adar.
- embeddings 10x via vec_id-shifted COPIES -> kcenter_coreset: the
  10x point set is 10 coincident copies of the 1x set, so the greedy
  trajectory's min_sq_dist SEQUENCE must be IDENTICAL to 1x (ties to
  the lowest vec_id pick the copy-0 points) - an exact invariant on
  top of the wall measurement.

Usage: python tools/scale_probe_r9b.py [sf_dir]
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

TMP = "/tmp/sf10x_r9b"
ALPHA = string.ascii_lowercase
BIG = 30_000_000  # multiple of lcm(3,10,5): trades modulos invariant


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_small = sf.replace("sf0.1", "sf0.01")
    spark = get_spark("scale_probe_r9b")
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
            "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
       .parquet(f"{TMP}/documents.parquet")
    print(f"built 10x documents ({n * 10} docs)", flush=True)

    ev = read_table(spark, sf, "events")
    eparts = [ev.select((F.col("event_id") + i * BIG).alias("event_id"),
                        "user_id",
                        F.concat(F.col("event_type"),
                                 F.lit(f"_c{i}")).alias("event_type"),
                        "ts", "value", "props")
              for i in range(10)]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite") \
        .parquet(f"{TMP}/events.parquet")
    print("built 10x-tickers events", flush=True)

    emb = read_table(spark, sf, "embeddings")
    m = emb.count()
    mparts = [emb.select((F.col("vec_id") + i * m).alias("vec_id"),
                         "embedding") for i in range(10)]
    mout = mparts[0]
    for p in mparts[1:]:
        mout = mout.unionByName(p)
    mout.repartition(32).write.mode("overwrite") \
        .parquet(f"{TMP}/embeddings.parquet")
    shutil.copy(os.path.join(sf, "lineitem.parquet"),
                os.path.join(TMP, "lineitem.parquet"))
    print(f"built 10x embeddings ({m * 10} vecs)", flush=True)

    import __spark_entry__ as E  # noqa: E402
    from etl_portfolio_tracker_spark.operators import dedup as DD
    from etl_portfolio_tracker_spark.operators import similarity as SIM
    qs = E.queries()

    for q in ("dsir_weights", "streaming_dsir_replay", "holt_winters",
              "streaming_holt_replay"):
        t1 = bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        t2 = bench(f"{q} 10x", lambda q=q: qs[q](spark, TMP), runs=1)
        print(f"{q}: growth {t2 / t1:.1f}x wall for 10x", flush=True)

    # adamic_adar along the TPC-H axis
    t1 = bench("adamic_adar sf0.01",
               lambda: qs["adamic_adar"](spark, sf_small))
    t2 = bench("adamic_adar sf0.1",
               lambda: qs["adamic_adar"](spark, sf), runs=1)
    print(f"adamic_adar: growth {t2 / t1:.1f}x wall for 10x lineitem",
          flush=True)

    # kcenter: wall + the exact coincident-copies invariant
    t0 = time.time()
    r1 = SIM.kcenter_coreset(read_table(spark, sf, "embeddings")).collect()
    t1 = time.time() - t0
    t0 = time.time()
    r10 = SIM.kcenter_coreset(read_table(spark, TMP, "embeddings")).collect()
    t2 = time.time() - t0
    d1 = [r["min_sq_dist"] for r in r1]
    d10 = [r["min_sq_dist"] for r in r10]
    assert d1 == d10, (d1, d10)
    print(f"kcenter_coreset 1x: {t1:.2f}s  10x: {t2:.2f}s "
          f"(growth {t2 / t1:.1f}x; min_sq_dist sequence IDENTICAL "
          f"across coincident copies)", flush=True)

    # curation_serve: index built at 10x untimed (the nightly
    # artifact), serve path timed
    idx = f"{TMP}/_bandkey_index_10x"
    docs10 = read_table(spark, TMP, "documents")
    t0 = time.time()
    DD.minhash_band_keys(docs10).write.mode("overwrite").parquet(idx)
    t_build = time.time() - t0
    t0 = time.time()
    n_pairs = DD.curation_serve(docs10, idx).count()
    t_serve10 = time.time() - t0
    idx1 = f"{TMP}/_bandkey_index_1x"
    DD.minhash_band_keys(docs).write.mode("overwrite").parquet(idx1)
    t0 = time.time()
    n_pairs1 = DD.curation_serve(docs, idx1).count()
    t_serve1 = time.time() - t0
    print(f"curation_serve 1x: {t_serve1:.2f}s ({n_pairs1} pairs)  "
          f"10x: {t_serve10:.2f}s ({n_pairs} pairs; index build "
          f"{t_build:.2f}s untimed-in-serve) growth "
          f"{t_serve10 / t_serve1:.1f}x", flush=True)

    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
