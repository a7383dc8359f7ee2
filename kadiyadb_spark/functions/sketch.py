"""Mergeable-sketch rollups: pre-aggregated DISTINCT counts.

The cube's (total, cnt) Point works because sum/count are decomposable —
partials fold exactly (SURVEY §1.1). COUNT(DISTINCT) is not: the reference
has no answer for it, and at 100 TB re-scanning raw events per distinct
query is the single most common analytics cost sink. The standard fix is a
MERGEABLE sketch: store one Apache DataSketches HLL per (bucket, group) at
write time; any rollup (day→month, one group→all groups) is a lossless
union of sketches — the same write-time-rollup philosophy as the cube's
prefix sums, extended to the one aggregate that cannot be pre-summed.

Error model: relative standard error ≈ 1.04 / sqrt(2^lgk) (~1.6% at the
lgk=12 default, ~1 KB per sketch). Sketches are deterministic functions of
the input SET (register maxima — order-independent), so rollup reads are
reproducible; they are NOT bit-portable to other HLL implementations, so
the correctness entry (`hll_distinct_rollup`) gates a TOLERANCE contract
instead: exact counts + a within-3×RSE flag the SQL oracle pins TRUE, and
merge losslessness is pinned by pytest (day→month union estimate equals
the direct whole-range sketch exactly).

All three ops are one Spark aggregation each: partial sketches build
map-side and merge in the reduce — a distinct-count rollup never shuffles
raw keys, only ~KB sketches per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``key_col`` per group — the write-time form a
    deployment persists next to the cube (binary column, ~2^lgk bytes).
    Map-side partial sketches; only sketches reach the shuffle."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col),
        F.count("*").cast("long").alias("n_rows"),
    )


def hll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    lgk: int = 12,
) -> DataFrame:
    """Union persisted sketches up a hierarchy (day→month, type→all):
    lossless — the merged sketch equals the sketch of the unioned inputs,
    so rollup estimates never degrade with the number of merge levels."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_sketches"),
    )


def hll_estimate(sketch: Column) -> Column:
    """Distinct-count estimate of a sketch column (long)."""
    return F.hll_sketch_estimate(sketch).cast("long")
