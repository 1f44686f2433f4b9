"""Checkpoint boundary for iterative / multi-consumer plans.

Iterative operators (connected components, PageRank, k-core) and
multi-consumer pipeline stages need a materialization point that (a)
truncates lineage so the plan does not grow per round and (b) lets two
downstream branches reuse one execution. Locally `localCheckpoint()`
does both — but its blocks live only in executor storage, so on a real
cluster a lost executor loses the partition and the job dies (lineage
was truncated, so Spark cannot recompute it).

`iter_checkpoint` picks the right boundary for the session: when a
checkpoint directory is configured (`sc.setCheckpointDir(...)` — on a
cluster that is durable storage like HDFS/S3), it uses reliable
`checkpoint()`, which survives executor loss; otherwise it falls back
to `localCheckpoint()` (single-JVM local mode, where executor loss is
process death anyway). Same plan either way — only the storage of the
materialized partitions differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_checkpoint_dir(df: DataFrame) -> bool:
    """True when the session has a reliable checkpoint directory set."""
    sc = df.sparkSession.sparkContext
    try:
        return sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # pragma: no cover - py4j surface drift
        return False


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize `df` and truncate lineage: reliable `checkpoint()`
    when the session has a checkpoint dir (cluster-durable, survives
    executor loss), else `localCheckpoint()` (local mode)."""
    if has_checkpoint_dir(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
