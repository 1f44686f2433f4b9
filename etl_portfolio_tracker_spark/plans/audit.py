"""Plan-string extractors used by tests and the PLANS.md audit.

All functions take a DataFrame and parse the *executed* (adaptive-
final where applicable) physical plan. String parsing is the only
stable public surface for this in PySpark; each regex targets the
formatted-plan vocabulary that has been stable across Spark 3.x/4.x
(`PushedFilters:`, `PartitionFilters:`, `ReadSchema:`, `Exchange`,
`BroadcastHashJoin`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as text (pre-execution: the initial
    adaptive plan; after an action: the final one)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates on the scan."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column names each scan actually reads (column pruning): one
    list per scan in plan order."""
    plans = re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df))
    return [[c.split(":")[0].strip() for c in p.split(",") if c.strip()]
            for p in plans]


def exchanges(df: DataFrame, key: str | None = None) -> list[str]:
    """Exchange (shuffle) lines in the plan; optionally only those
    whose partitioning mentions `key`."""
    lines = [ln.strip() for ln in physical_plan(df).splitlines()
             if "Exchange" in ln and "BroadcastExchange" not in ln]
    if key is not None:
        lines = [ln for ln in lines if key in ln]
    return lines


def broadcast_joins(df: DataFrame) -> int:
    """Number of broadcast hash joins in the plan."""
    return len(re.findall(r"BroadcastHashJoin", physical_plan(df)))
