"""Table profiling — the data-quality census a pipeline runs before and
after every curation stage (row counts, null counts, exact distinct
cardinality, min/max per column).

Single-pass design: ONE aggregation job computes every column's metrics
(Catalyst plans the multiple DISTINCT aggregates with one Expand — a
constant small blow-up factor, still one scan + one reduce), then a
``stack`` unpivot reshapes the 1-row wide result into the long
(col_name, metrics) form tooling consumes. The unpivot runs on ONE row —
free.

At 100 TB exact ``countDistinct`` on a high-cardinality key is the one
expensive term (the Expand row for that column shuffles per distinct
value); ``approx=True`` swaps in HyperLogLog ``approx_count_distinct``
(fixed 2^p-register sketch per column, pure map-side merge) — the form a
routine scheduled census should run. Exact is the default because the
cross-engine oracle gate needs bit-equal answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """Per-column profile of ``cols``: (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) with min/max rendered as strings (profile
    output is heterogeneous by nature; values are computed in the native
    type first, so ordering is numeric/temporal, not lexical)."""
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "_n_rows",
        f"stack({len(cols)}, {stacked}) AS (col_name, _nn, n_distinct, min_val, max_val)",
    ).select(
        "col_name",
        F.col("_n_rows").cast("long").alias("n_rows"),
        (F.col("_n_rows") - F.col("_nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )
