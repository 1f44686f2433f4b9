"""Generator-driven scale probe: uses the docgen custom DataSource to
run text/dedup kernels at 50k and 500k docs (≈10×/100× the sf0.1
corpus) with ZERO disk input — the scan is CPU, partition-parallel by
construction, so these numbers isolate operator cost from I/O.

Usage: python tools/scale_probe_docgen.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from etl_portfolio_tracker_spark.operators import dedup as DD  # noqa: E402
from etl_portfolio_tracker_spark.operators import packing as PK  # noqa: E402
from etl_portfolio_tracker_spark.operators import text as TX  # noqa: E402
from etl_portfolio_tracker_spark.session import get_spark  # noqa: E402
from etl_portfolio_tracker_spark.sources.docgen import register  # noqa: E402


def bench(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"{label}: {best:.2f}s", flush=True)


def main():
    spark = get_spark("docgen_probe")
    register(spark)

    def gen(n):
        return (spark.read.format("docgen")
                .option("rows", n).option("numPartitions", 32).load())

    for n in (50_000, 500_000):
        docs = gen(n)
        tag = f"{n // 1000}k"
        bench(f"token_stats {tag}", lambda: TX.token_stats(docs))
        bench(f"quality_score {tag}", lambda: TX.quality_score(docs))
        bench(f"exact_dedup {tag}", lambda: DD.exact_dedup(docs))
        bench(f"epoch_shuffle {tag}", lambda: PK.epoch_shuffle(docs))
        bench(f"minhash_bands {tag}", lambda: DD.minhash_band_keys(docs))
        bench(f"simhash {tag}", lambda: DD.simhash(docs))


if __name__ == "__main__":
    main()
