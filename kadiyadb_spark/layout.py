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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    table: rows are hash-distributed into ``num_buckets`` files per
    partition by ``bucket_cols``, and the bucket spec is recorded in the
    catalog.

    Payoff at 100 TB: a join or aggregation keyed on the bucket columns
    between tables bucketed the same way needs NO Exchange — the scan
    itself reports hash partitioning, so the most expensive repeated
    operation in a warehouse (the big-fact shuffle) is paid ONCE at write
    time and amortized over every subsequent query. ``sort_cols`` keeps each
    bucket file internally sorted (better row-group stats + faster in-bucket
    sorts); note Spark >= 3.0 does not report that order from scans by
    default (spark.sql.legacy.bucketedTableScan.outputOrdering), so
    SortMergeJoin still sorts WITHIN buckets — cheap and shuffle-free. The
    repartition below guarantees one file per (partition, bucket) so bucket
    pruning and the legacy ordering path both stay available.

    Bucketing requires the table catalog (``saveAsTable``): bucket metadata
    lives in the catalog, not in parquet footers. Plan effects asserted in
    tests/test_layout.py.
    """
    out = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    w = out.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


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
