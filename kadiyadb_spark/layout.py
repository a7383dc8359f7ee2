"""Data layout optimization: Z-order (Morton) clustering for multi-column
data skipping.

Parquet scans skip row groups / files whose footer min-max ranges exclude the
predicate. Sorting by ONE column makes only that column's ranges narrow; a
filter on any other column still reads everything. Interleaving the bits of
several columns (the Z-order / Morton key) and sorting by the interleaved key
keeps EVERY participating column's per-file range narrow, so filters on any
of them prune — the same technique behind Delta OPTIMIZE ZORDER BY and
Iceberg's sort orders, built here from plain Spark expressions (shift/mask/or
— whole-stage codegen, no UDF).

Usage shape at 100 TB: quantize each cluster column to ``bits`` buckets,
interleave, ``repartitionByRange`` on the key (range partitioning puts
adjacent Z-values in the same file), sort within partitions, write. One
shuffle, amortized over every subsequent pruned scan.

Reference note: kadiyadb's analog is its epoch directory layout (time-only
pruning, SURVEY §4); Z-order extends pruning to the dimension columns the
reference could only pattern-match post-read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into [0, 2^bits) integer buckets over [lo, hi]
    (values outside clamp). Statically supplied bounds keep the expression
    deterministic and shuffle-free; compute them in a prior pass or from
    table stats."""
    n_buckets = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_buckets
    return F.greatest(F.least(scaled.cast("long"), F.lit(n_buckets)), F.lit(0))


def zorder_key_expr(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already-quantized,
    non-negative) column: bit b of column i lands at position b*len(cols)+i.
    Pure shift/mask/or expression tree — codegen-friendly, 64-bit budget
    (bits * len(cols) must be <= 63)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key_expr needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*ncols = {bits * n} exceeds the int64 budget")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    num_files: int,
    bits: int = 8,
) -> DataFrame:
    """Re-layout ``df`` so each output file covers a narrow range of EVERY
    cluster column: range-partition by the interleaved key (adjacent
    Z-values co-locate), then sort within partitions. Write the result with
    ``.write.parquet`` — footer min-max stats then prune on any cluster
    column. ``cols`` must already be quantized (see quantize_expr)."""
    key = zorder_key_expr(cols, bits)
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
