"""SparkSession factory.

Reference analog: the cached SQLite connection singleton
(`app/services/db.py:14-30`, `app/streamlit_app.py:9-13`).  Here the
session is the engine: AQE enabled so runtime statistics re-plan joins
and coalesce shuffle partitions — the knob that matters most when the
same code moves from local[32] to a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "etl_portfolio_tracker_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or fetch) the singleton SparkSession.

    Scale posture: every config here is also correct on a real cluster —
    AQE coalesces the 32 local shuffle partitions down when maps are
    small and would instead *split* skewed partitions at 100 TB; Arrow
    is on because the stateful folds (SURVEY §2.5 W6/W7) cross the
    JVM↔Python boundary in columnar batches, never row-at-a-time.
    """
    n = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r10 (guide §2.6): the shared curation build materializes
        # independent stages from a thread pool; under FIFO the CC
        # loop's many SMALL sequential jobs (the build's critical
        # path) queue behind the big concurrent scans submitted
        # earlier, amplifying per-round latency. FAIR gives each
        # concurrent job a share so the tiny rounds schedule
        # immediately; with a single running job (every ordinary
        # query) FAIR and FIFO behave identically.
        .config("spark.scheduler.mode", os.environ.get(
            "SPARK_GRAFT_SCHEDULER", "FAIR"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.ui.enabled", "false")
    )
    if SparkSession.getActiveSession() is None:
        # master/memory only apply when we are the one creating the JVM
        # (the driver harness passes its own session into queries()).
        builder = (
            builder.master(os.environ.get("SPARK_GRAFT_MASTER",
                                          f"local[{DEFAULT_SHUFFLE_PARTITIONS}]"))
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
