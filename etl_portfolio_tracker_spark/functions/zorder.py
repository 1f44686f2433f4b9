"""Z-order (Morton) curve utilities — the multi-dimensional
data-clustering layout behind lakehouse OPTIMIZE ZORDER BY: rows
sorted by interleaved key bits land near their neighbors in EVERY
keyed dimension, so parquet min/max stats skip files for predicates
on either column (a single-column sort only skips for its own
column).

The z-value is pure bit arithmetic (shiftleft/AND/OR over the
quantized key bits) — engine-portable and oracle-checkable, unlike
hash-based clustering. `zorder_layout` is the write-path: range-
partition + sort by z so each output file owns a compact z-range
(= a small hyper-rectangle of the key space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 16   # bits kept per dimension → 32-bit z-value for 2-D


def _bits_interleaved(col: Column, offset: int, n_bits: int) -> Column:
    """Σ_i bit_i(col) << (2i + offset) — col's bits spread to even
    (offset 0) or odd (offset 1) positions."""
    out = F.lit(0).cast("bigint")
    for i in range(n_bits):
        bit = F.shiftright(col, i).bitwiseAND(F.lit(1)).cast("bigint")
        out = out + F.shiftleft(bit, 2 * i + offset)
    return out


def zvalue(a: Column, b: Column, n_bits: int = Z_BITS) -> Column:
    """Morton interleave of two non-negative integer keys (low n_bits
    of each): z = ...b1 a1 b0 a0. Monotone in the hyper-rectangle
    order both engines agree on — pure integer ops, bit-exact."""
    return (_bits_interleaved(a.cast("bigint"), 0, n_bits)
            + _bits_interleaved(b.cast("bigint"), 1, n_bits))


def zorder_layout(df: DataFrame, a: str, b: str,
                  n_files: int = 32, n_bits: int = Z_BITS) -> DataFrame:
    """Write-path clustering: append the z-value and range-partition +
    sort by it, so each output file covers one compact z-range. The
    range exchange samples z (uniform enough in practice — z inherits
    the keys' distribution); at 100 TB this is exactly the
    OPTIMIZE ZORDER rewrite, expressed with stock operators."""
    z = zvalue(F.col(a), F.col(b), n_bits).alias("_z")
    return (df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z"))
