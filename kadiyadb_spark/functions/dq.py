"""Declarative data-quality expectations (great-expectations-style audit).

A warehouse/training-data pipeline gates every ingest batch on a constraint
audit: null rates, domain membership, value ranges, referential integrity.
The engine form is ONE aggregation over ONE scan for all row-level checks —
each expectation compiles to `sum((NOT cond)::long)` inside a single agg, so
adding a check adds a column to the projection, never a pass over the data.
Referential checks are the only joins, and each one is an aggregate-only
left-anti whose output is a single count.

Scale shape: the row-level audit is map-side partial aggregation into a
1-row frame (bytes over the wire regardless of corpus size), unpivoted to
(check, n_violations, n_rows, violation_rate) rows at the end. At 100 TB
the audit costs exactly one corpus scan; RI checks shuffle only the key
column (and Catalyst may plan them as broadcast/bloom-pruned joins when the
dimension is small).

Reference parity: the reference validates per-point writes only
(database.go Track arg checks); batch constraint auditing is north-star
warehouse surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OUT = ("check", "n_violations", "n_rows", "violation_rate")


def expect(df: DataFrame, checks: "dict[str, Column]") -> DataFrame:
    """Audit ``df`` against named row-level expectations. ``checks`` maps
    check name -> boolean Column that should be TRUE for a healthy row
    (NULL counts as a violation — an unevaluable expectation is a failed
    one, the conservative reading). Returns one row per check:
    (check, n_violations, n_rows, violation_rate 4dp)."""
    if not checks:
        raise ValueError("expect() needs at least one check")
    import re

    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in checks.items():
        # "_n" is the internal count alias in the 1-row agg below — a check
        # with that literal name would duplicate the column and surface as
        # an ambiguous-reference AnalysisException instead of this error
        if name in _OUT or name == "_n":
            raise ValueError(f"check name {name!r} collides with output column")
        # names are interpolated into the stack() expression below — keep
        # them identifier-shaped so a quote/backtick can't break (or worse,
        # rewrite) the SQL string
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"check name must be identifier-shaped: {name!r}")
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(name)
        )
    row = df.agg(*aggs)
    # unpivot the 1-row frame: stack(n, 'name', name, ...)
    pairs = ", ".join(f"'{n}', `{n}`" for n in checks)
    out = row.select(
        F.col("_n"),
        F.expr(f"stack({len(checks)}, {pairs}) as (check, n_violations)"),
    )
    return out.select(
        "check",
        "n_violations",
        F.col("_n").alias("n_rows"),
        F.expr(
            "CASE WHEN _n = 0 THEN CAST(0.0 AS DOUBLE) "
            "ELSE floor(n_violations * 1e4 / _n + 0.5) / 1e4 END"
        ).alias("violation_rate"),
    )


def expect_ref(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity expectation: every non-null ``fact_col`` value
    must exist in ``dim.dim_col``. Output has the same schema as
    ``expect`` (one row), so audits union cleanly. The violation count is
    a left-anti join folded to a single count — the only shuffle is the
    key column, and small dims broadcast."""
    name = name or f"{fact_col}_in_{dim_col}"
    keys = fact.select(F.col(fact_col)).filter(F.col(fact_col).isNotNull())
    miss = (
        keys.join(
            dim.select(F.col(dim_col).alias(fact_col)).distinct(),
            fact_col,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_violations"))
    )
    tot = fact.agg(F.count(F.lit(1)).alias("n_rows"))
    # two 1-row aggregates cross-joined (broadcast, trivially) — the whole
    # expectation stays one lazy plan, no driver-side actions
    return miss.crossJoin(tot).select(
        F.lit(name).alias("check"),
        "n_violations",
        "n_rows",
        F.expr(
            "CASE WHEN n_rows = 0 THEN CAST(0.0 AS DOUBLE) "
            "ELSE floor(n_violations * 1e4 / n_rows + 0.5) / 1e4 END"
        ).alias("violation_rate"),
    )
