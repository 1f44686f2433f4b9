"""Round-8 scale probes (VERDICT r7 Next items 5 + 8):

1. weighted_jaccard_pairs at 100x documents (substitution-cipher
   copies, the scale_probe_prefix_100x convention). EXACT invariant
   (ADVICE r7 item 3): the 100x union changes N from n to 100n, which
   shifts every idf by ~ln(100), so threshold-adjacent pairs MAY cross
   tau — the total need not be 100x the 1x-base count. What IS exact:
   every copy sees the identical weighted structure (same per-copy df,
   same global N, bijective shingle rename), so each copy's LOCAL pair
   set must be identical across all 100 copies and the total must be
   100 x the per-copy count, with zero cross-copy pairs.

2. _curation_build attribution at 1x/10x: per-component walls
   (signature/band keys -> LSH candidates -> CC clusters -> prune
   verdict -> verified pairs), plus the PERSISTED-INDEX variant: with
   the band-key index already on parquet (the delta_dedup operational
   stance), what does a fresh session pay to serve candidates?

Usage: python tools/scale_probe_r8.py [sf_dir] [probe1|probe2]
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
from etl_portfolio_tracker_spark.operators import dedup as DD  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

TMP100 = "/tmp/sf100x_r8"
TMP10 = "/tmp/sf10x_r8"
IDX = "/tmp/bandkeys_idx_r8"
ALPHA = string.ascii_lowercase


def _build_copies(spark, sf: str, copies: int, tmp: str) -> int:
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    docs = read_table(spark, sf, "documents")
    n = docs.count()
    parts = []
    for i in range(copies):
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
       .parquet(f"{tmp}/documents.parquet")
    print(f"built {copies}x documents ({n * copies} docs)", flush=True)
    return n


def probe_weighted_100x(spark, sf: str) -> None:
    n = _build_copies(spark, sf, 100, TMP100)
    docs1 = read_table(spark, sf, "documents")
    t0 = time.time()
    base = DD.weighted_jaccard_pairs(docs1).count()
    t1x = time.time() - t0
    print(f"weighted 1x: {base} pairs, {t1x:.1f}s", flush=True)

    docs100 = read_table(spark, TMP100, "documents")
    t0 = time.time()
    pairs = (DD.weighted_jaccard_pairs(docs100)
             .select((F.col("doc_a") / n).cast("int").alias("ca"),
                     (F.col("doc_b") / n).cast("int").alias("cb"),
                     (F.col("doc_a") % n).alias("la"),
                     (F.col("doc_b") % n).alias("lb"))
             .collect())
    t100x = time.time() - t0
    cross = sum(1 for r in pairs if r["ca"] != r["cb"])
    per_copy: dict[int, set] = {}
    for r in pairs:
        per_copy.setdefault(r["ca"], set()).add((r["la"], r["lb"]))
    sets = list(per_copy.values())
    identical = all(s == sets[0] for s in sets)
    print(f"weighted 100x: {len(pairs)} pairs, {t100x:.1f}s "
          f"({t100x / t1x:.1f}x wall for 100x docs)", flush=True)
    print(f"  cross-copy pairs: {cross} (expect 0); copies seen: "
          f"{len(per_copy)} (expect 100); per-copy set identical "
          f"across copies: {identical}; per-copy count: "
          f"{len(sets[0]) if sets else 0} x 100 = "
          f"{100 * len(sets[0]) if sets else 0} "
          f"(matches total: {100 * len(sets[0]) == len(pairs) if sets else False})",
          flush=True)
    print(f"  (1x-base count {base} is NOT the invariant: the union's "
          f"N=100n shifts idf by ln(100) — ADVICE r7 item 3)", flush=True)
    shutil.rmtree(TMP100, ignore_errors=True)


def _attribute_curation(spark, sf_dir: str, tag: str) -> None:
    docs = read_table(spark, sf_dir, "documents")
    t = {}
    t0 = time.time()
    band_keys = DD.minhash_band_keys(docs).persist()
    band_keys.count()
    t["signature+band_keys"] = time.time() - t0
    t0 = time.time()
    cands = DD.minhash_lsh_candidates(docs, band_keys=band_keys).persist()
    cands.count()
    t["lsh_candidates"] = time.time() - t0
    t0 = time.time()
    clusters = DD.dedup_clusters(docs, band_keys=band_keys).persist()
    clusters.count()
    t["cc_clusters"] = time.time() - t0
    t0 = time.time()
    verdict = DD.corpus_prune(docs, clusters=clusters).persist()
    verdict.count()
    t["prune_verdict"] = time.time() - t0
    t0 = time.time()
    verified = DD.minhash_verified(docs, cands=cands).persist()
    verified.count()
    t["verified_pairs"] = time.time() - t0
    total = sum(t.values())
    print(f"_curation_build attribution [{tag}]: total {total:.1f}s — "
          + ", ".join(f"{k} {v:.1f}s" for k, v in t.items()), flush=True)
    for fr in (band_keys, cands, clusters, verdict, verified):
        fr.unpersist()


def probe_curation(spark, sf: str) -> None:
    _attribute_curation(spark, sf, "1x sf0.1")
    _build_copies(spark, sf, 10, TMP10)
    _attribute_curation(spark, TMP10, "10x")

    # persisted-index variant (the delta_dedup operational stance):
    # the band-key index is already on disk; a fresh consumer pays
    # only the index scan + bucket join to serve candidates.
    docs = read_table(spark, sf, "documents")
    shutil.rmtree(IDX, ignore_errors=True)
    t0 = time.time()
    DD.minhash_band_keys(docs).write.mode("overwrite").parquet(IDX)
    t_write = time.time() - t0
    t0 = time.time()
    idx = spark.read.parquet(IDX)
    n_cand = DD.minhash_lsh_candidates(docs, band_keys=idx).count()
    t_serve = time.time() - t0
    print(f"persisted-index variant [1x]: index write {t_write:.1f}s "
          f"(one-time); serve candidates from disk index "
          f"{t_serve:.1f}s for {n_cand} candidate pairs "
          f"(vs rebuild-from-text above)", flush=True)
    shutil.rmtree(TMP10, ignore_errors=True)
    shutil.rmtree(IDX, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf = next((a for a in args if "/" in a), "/root/testdata/sf0.1")
    which = next((a for a in args if "/" not in a), "all")
    spark = get_spark("scale_probe_r8")
    if which in ("probe2", "all"):
        probe_curation(spark, sf)
    if which in ("probe1", "all"):
        probe_weighted_100x(spark, sf)


if __name__ == "__main__":
    main()
