"""100× documents probe for prefix_filter_pairs (sf0.1 base →
500k docs). Growth direction: 100 copies of the corpus, each pushed
through a DISTINCT deterministic substitution cipher over a-z
(random.Random(i) permutation). A substitution cipher is a bijection
on fixed-width shingles, so every copy preserves the base corpus's
near-dup structure EXACTLY (same pair count per copy, same Jaccard
values) while copies share essentially no shingles with each other —
the honest decorrelated direction: pair work grows linearly with
copies, the global token dictionary grows ~100×, and the df-ordered
prefix rule has to cope with a 100× wider universe.

Usage: python tools/scale_probe_prefix_100x.py [sf_dir]
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

TMP = "/tmp/sf100x_prefix"
ALPHA = string.ascii_lowercase
COPIES = 100


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_prefix_100x")

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
    t1 = bench("prefix_filter_pairs 1x", lambda: qs["prefix_filter_pairs"](spark, sf))
    t2 = bench("prefix_filter_pairs 100x",
               lambda: qs["prefix_filter_pairs"](spark, TMP), runs=1)
    n_pairs = qs["prefix_filter_pairs"](spark, TMP).count()
    print(f"100x pairs: {n_pairs} (base x100 expected if structure "
          f"preserved); growth {t2 / t1:.1f}x wall for 100x docs",
          flush=True)

    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
