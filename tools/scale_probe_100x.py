"""100× scaling probe for the dedup spine: builds a decorrelated
100× corpus (10 consonant rotations × 10 word-reversal variants of
the sf0.1 documents — 500k docs, ~100× distinct shingle families) and
times the pipeline stages that dominate a curation run. Evidence for
SCALING.md that the LSH/CC path's growth stays at-or-below data
growth two decades up, not just one.

Usage: python tools/scale_probe_100x.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import dedup as DD  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402
from tools.scale_probe import docs_10x  # noqa: E402


def docs_100x(docs: DataFrame) -> DataFrame:
    """10 rotations × 10 structural variants: variant j reverses the
    first j+2 whitespace tokens of each text, so each copy's shingle
    set diverges from every other copy's."""
    ten = docs_10x(docs)
    n = ten.count()
    extra = [c for c in ten.columns if c not in ("doc_id", "text")]
    parts = []
    for j in range(10):
        toks = F.split("text", " ")
        head = F.slice(toks, 1, j + 2)
        tail = F.slice(toks, j + 3,
                       F.greatest(F.size(toks) - (j + 2), F.lit(0)))
        parts.append(ten.select(
            (F.col("doc_id") + j * n).alias("doc_id"),
            F.concat_ws(" ", F.concat(F.reverse(head), tail))
             .alias("text"),
            *extra))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_100x")
    docs1 = read_table(spark, sf, "documents")
    docs100 = docs_100x(docs1).localCheckpoint(eager=True)
    print(f"corpus: {docs1.count()} -> {docs100.count()} docs", flush=True)

    def run(label, thunk):
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)

    for label, d in (("1x", docs1), ("100x", docs100)):
        run(f"minhash_lsh {label}",
            lambda d=d: DD.minhash_lsh_candidates(d))
    for label, d in (("1x", docs1), ("100x", docs100)):
        t0 = time.time()
        DD.dedup_clusters(d).write.format("noop").mode("overwrite").save()
        print(f"dedup_clusters {label}: {time.time() - t0:.2f}s",
              flush=True)
    for label, d in (("1x", docs1), ("100x", docs100)):
        run(f"delta_dedup {label}", lambda d=d: DD.delta_dedup(d))


if __name__ == "__main__":
    main()
