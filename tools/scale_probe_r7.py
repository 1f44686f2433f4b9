"""Round-7 1x/10x probe: weighted_jaccard_pairs and kn_lm_score on
sf0.1 and on a 10x decorrelated corpus (per-copy substitution cipher,
the scale_probe_prefix_100x convention: a cipher is a bijection on
fixed-width shingles, so each copy preserves the base near-dup
structure exactly while sharing no shingles with other copies — pair
work grows linearly, the token/trigram dictionary grows ~10x).

Usage: python tools/scale_probe_r7.py [sf_dir]
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402

from scale_probe import bench  # noqa: E402

TMP = "/tmp/sf10x_r7"
ALPHA = string.ascii_lowercase
COPIES = 10


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r7")

    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)

    docs = read_table(spark, sf, "documents")
    n = docs.count()
    parts = []
    for i in range(COPIES):
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
    print(f"built {COPIES}x documents ({n * COPIES} docs)", flush=True)

    import __spark_entry__ as E  # noqa: E402
    qs = E.queries()
    for q in ("weighted_jaccard_pairs", "kn_lm_score"):
        t1 = bench(f"{q} 1x", lambda q=q: qs[q](spark, sf))
        t2 = bench(f"{q} 10x", lambda q=q: qs[q](spark, TMP), runs=1)
        print(f"{q}: growth {t2 / t1:.1f}x wall for 10x docs",
              flush=True)
    n_pairs = qs["weighted_jaccard_pairs"](spark, TMP).count()
    n_base = qs["weighted_jaccard_pairs"](spark, sf).count()
    # ADVICE r7 item 3: the 10x union changes N from n to 10n, which
    # shifts every idf by ~ln(10) — threshold-adjacent pairs may cross
    # tau, so the count is APPROXIMATELY 10x base, not exactly. The
    # exact invariant (identical per-copy pair sets) is checked by
    # tools/scale_probe_r8.py's 100x probe.
    print(f"weighted pairs: base {n_base}, 10x {n_pairs} "
          f"(~10x base expected; exact only per-copy — see "
          f"scale_probe_r8)", flush=True)

    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
