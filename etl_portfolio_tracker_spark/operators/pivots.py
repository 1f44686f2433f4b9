"""Pivot / unpivot (F18/F19 — reference wide↔long reshapes,
src/etl.py:33-35, 1_Dashboard.py:81, 384).

The pivot values are pinned explicitly: with an enumerated value list
Spark skips the extra distinct-scan job AND the plan is stable at any
scale (an unpinned pivot on a high-cardinality column is a driver OOM
at 100 TB — enumerate or stay long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RETURNFLAGS = ["A", "N", "R"]


def price_panel(lineitem: DataFrame) -> DataFrame:
    """F19 — ts × returnflag matrix of min extendedprice (the
    reference's ts × ticker close panel, 1_Dashboard.py:81). min: no
    float accumulation → exact under any parallelism."""
    return (lineitem
            .select(F.to_date("l_shipdate").alias("ts"),
                    "l_returnflag", "l_extendedprice")
            .groupBy("ts")
            .pivot("l_returnflag", RETURNFLAGS)
            .agg(F.min("l_extendedprice")))


def unpivot_panel(panel: DataFrame) -> DataFrame:
    """F18 — wide→long melt of the panel back to (ts, flag, close),
    dropping null cells (etl.py:33-35 melt + dropna)."""
    return (panel.unpivot("ts", RETURNFLAGS, "flag", "close")
            .filter(F.col("close").isNotNull()))
