"""100× scaling probe for the round-4 text operators: reuses the
decorrelated 100× corpus builder (10 consonant rotations × 10
word-reversal variants, ~500k docs) and times word_entropy,
pmi_top_pairs, and ngram_dup_spans two decades up. Evidence for
SCALING.md that the map/model-reduction shapes hold at 100×, not
just 10×.

Usage: python tools/scale_probe_100x_r4.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from etl_portfolio_tracker_spark.io import read_table  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402
from tools.scale_probe_100x import docs_100x  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_100x_r4")
    docs1 = read_table(spark, sf, "documents")
    docs100 = docs_100x(docs1).localCheckpoint(eager=True)
    print(f"corpus: {docs1.count()} -> {docs100.count()} docs", flush=True)

    def run(label, thunk):
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)

    for label, d in (("1x", docs1), ("100x", docs100)):
        run(f"word_entropy {label}", lambda d=d: TX.word_entropy(d))
    for label, d in (("1x", docs1), ("100x", docs100)):
        run(f"pmi_top_pairs {label}", lambda d=d: TX.pmi_top_pairs(d))
    for label, d in (("1x", docs1), ("100x", docs100)):
        t0 = time.time()
        row = (TX.ngram_dup_spans(d).groupBy()
               .sum("n_grams", "n_dup_grams").collect()[0])
        print(f"ngram_dup_spans {label}: {time.time() - t0:.2f}s  "
              f"grams={row[0]} dup={row[1]}", flush=True)


if __name__ == "__main__":
    main()
