"""Skew mitigation helpers: salted two-phase aggregation and salted joins.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins at
runtime; these helpers cover the cases AQE can't re-plan — a groupBy whose
hot key overwhelms one reducer, and a shuffled join against a skewed build
side — using the classic salting decomposition:

  phase 1: shuffle on (key, salt) — the hot key spreads over S reducers
  phase 2: tiny shuffle on key to combine the S partials

Exact for decomposable aggregates (sum/count/min/max — everything the cube
needs). The salt is derived from a hash of a row-unique column, keeping
plans deterministic (no rand(), which breaks retried-task idempotency).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salt_expr(unique_col: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of a row-unique column.
    Deterministic salts keep speculative/retried tasks idempotent, unlike
    rand()-based salting."""
    return F.pmod(F.hash(unique_col), F.lit(buckets))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(value) AS total, count(*) AS cnt) computed via
    the two-phase salted decomposition. Identical results; the hot key's
    rows spread across ``buckets`` reducers in the wide first shuffle."""
    partial = (
        df.withColumn(SALT, salt_expr(F.col(unique_col), buckets))
        .groupBy(*keys, SALT)
        .agg(F.sum(value_col).alias("_pt"), F.count("*").alias("_pc"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pt").alias("total"), F.sum("_pc").cast("double").alias("cnt")
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large frame against ``other`` on column ``on`` without
    one reducer receiving the whole hot key: the skewed side salts each row
    into one of ``buckets``; ``other`` is replicated once per bucket via a
    generated salt array, so the shuffle keys become (on, salt).

    Only joins whose OUTPUT is driven by the skewed side are valid: since
    ``other`` is replicated ``buckets`` times, any join type that emits
    unmatched ``other`` rows ('right'/'full' outer) would emit them once per
    bucket — silently corrupt results — so those are rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports skewed-side-driven joins only {sorted(allowed)}; "
            f"'{how}' would duplicate unmatched rows of the replicated side {buckets}x"
        )
    uc = F.col(unique_col) if unique_col else F.spark_partition_id() + F.monotonically_increasing_id()
    s = skewed.withColumn(SALT, salt_expr(uc, buckets))
    replicated = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = s.join(replicated, on=[on, SALT], how=how)
    return out.drop(SALT)
