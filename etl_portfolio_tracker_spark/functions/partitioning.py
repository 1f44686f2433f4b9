"""Parallelism guard for explode-heavy stages.

A stage whose input is tiny but whose output is huge (shingle
explode ~300×, embedding pos-explode ~64×) inherits the INPUT's
partitioning: locally a single parquet split — and AQE's coalescing
keeps keyed-repartition outputs at one partition too, because it only
sees the small pre-explode row count. The result is a hot loop
(hashing, codegen aggs) pinned to one core.

`spread()` repartitions ONLY when the frame has fewer partitions than
the cluster has slots — on a real cluster a 100 TB table already
arrives in thousands of splits and the call is a no-op, so it never
adds a full-table shuffle at scale; locally it unlocks all cores for
the downstream explode. The explicit numPartitions pins AQE (a bare
keyed repartition is fair game for coalescing; a numbered one is
honored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *by: str) -> DataFrame:
    """Ensure `df` has at least defaultParallelism partitions,
    optionally hash-partitioned by `by` (so a later groupBy on the
    same keys needs no second exchange)."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *by) if by else df.repartition(n)
