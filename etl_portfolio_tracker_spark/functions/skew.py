"""Skew mitigation: salted two-phase aggregation.

When one group key holds a disproportionate share of rows (one ticker
with billions of trades), a single hash aggregation funnels that key
through one task. Salting splits each key into `n_salts` subkeys for
the partial aggregate, then combines — the hot key's rows spread over
n_salts tasks and the second shuffle only carries n_salts rows per key.

AQE's skew-join handling covers joins; this covers aggregations, where
the decomposition must be algebraic (sum/count/min/max — anything with
a commutative monoid). Results are identical to the unsalted plan
(the registered `positions_salted` query reuses the plain `positions`
oracle to prove it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum(df: DataFrame, keys: list[str], value: Column,
               out_col: str, n_salts: int = 16) -> DataFrame:
    """Two-phase sum of `value` grouped by `keys` with an `n_salts`-way
    salt on the partial phase. The value is cast to DECIMAL(38,10) so
    the two-phase regrouping cannot change the result (exact,
    order-insensitive addition)."""
    salt = (F.rand(seed=7) * n_salts).cast("int")  # seed: deterministic plan
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt")
               .agg(F.sum(value.cast("decimal(38,10)")).alias("_part")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_part").cast("double").alias(out_col)))
