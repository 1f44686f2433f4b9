"""Universe search — relevance-ranked substring search with top-k
(reference app/services/universe.py:63-102: P7, O3, O4, F3-F8).

Catalyst turns orderBy+limit into TakeOrderedAndProject — a per-
partition top-k then a k-row merge on the driver, no global sort —
exactly what you want for "search 100M securities, return 50".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MISSING_POS = 9999  # universe.py:87: pandas find() == -1 → 9999


def search_universe(universe: DataFrame, query: str, limit: int = 50) -> DataFrame:
    """Rank: name-startswith first, then symbol-startswith, then match
    position in the blob, then name asc (universe.py:80-91), with
    symbol as a final total-order tiebreak so top-k is deterministic.

    pandas `find` is 0-based with −1→9999; Spark `locate` is 1-based
    with 0 for missing → subtract 1 and map 0→MISSING_POS (SURVEY F7).
    """
    q = query.strip().lower()
    pos1 = F.locate(q, F.col("search_blob"))       # 1-based, 0 = missing
    return (universe
            .filter(F.col("search_blob").contains(q))
            .withColumn("_name_sw",
                        F.lower(F.col("name_display")).startswith(q).cast("int"))
            .withColumn("_sym_sw",
                        F.lower(F.col("yf_symbol")).startswith(q).cast("int"))
            .withColumn("_pos", F.when(pos1 == 0, F.lit(MISSING_POS))
                        .otherwise(pos1 - 1))
            .orderBy(F.desc("_name_sw"), F.desc("_sym_sw"), F.asc("_pos"),
                     F.asc("name_display"), F.asc("yf_symbol"), F.asc("segment"))
            .limit(limit)
            .select("name_display", "yf_symbol", "segment", "display"))


def segment_filter(universe: DataFrame, segments: list[str]) -> DataFrame:
    """P8 — set membership on a derived column (universe.py:93-96)."""
    lowered = [s.lower() for s in segments]
    return universe.filter(F.lower(F.col("segment")).isin(lowered))
