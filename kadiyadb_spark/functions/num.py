"""Cross-engine numeric helpers.

``round4_expr`` exists because Spark's ``round(double, 4)`` rounds the
SHORTEST DECIMAL REPR of the double (java BigDecimal HALF_UP on
Double.toString), while DuckDB rounds the binary value — on bit-identical
inputs the two can disagree at a .00005 tie (e.g. a ratio whose double
prints as 0.54175 but is binarily just below it). ``floor(x*1e4 + 0.5)/1e4``
is pure IEEE arithmetic, bit-identical in any engine, so Spark queries and
their SQL oracles always agree given equal inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4_expr(c: Column) -> Column:
    """Deterministic half-up 4dp rounding: floor(x*10000 + 0.5)/10000."""
    return F.floor(c.cast("double") * 10000 + F.lit(0.5)) / 10000


def round4_sql(expr: str) -> str:
    """The identical computation as ANSI/DuckDB SQL text."""
    return f"floor(({expr}) * 10000 + 0.5) / 10000"
