"""Canonical schemas for the engine.

The cube is the Spark materialization of the reference's storage: one row per
(epoch, bucket, series-prefix) holding the pre-aggregated Point
(total, cnt) — SURVEY §1.6. Field paths are null-padded fixed-depth string
columns f1..fN plus an explicit ``depth`` (exact-depth matching, SURVEY §2
fine-print #6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPOCH = "epoch"  # ns, floor(ts/duration)*duration — the partition column
BUCKET = "bucket"  # ns, floor(ts/resolution)*resolution
DEPTH = "depth"
TOTAL = "total"
CNT = "cnt"


def field_col(i: int) -> str:
    """1-based dimension column name."""
    return f"f{i}"


def field_cols(n: int) -> list[str]:
    return [field_col(i) for i in range(1, n + 1)]


def series_field_cols(columns: list[str]) -> list[str]:
    """The series-key (f1..fN) columns present in a fetch/cube frame —
    the ONE definition of "which columns are dimension fields" (a loose
    startswith('f') would swallow any future column like 'flags')."""
    return [c for c in columns if c[:1] == "f" and c[1:].isdigit()]


def cube_schema(max_depth: int) -> T.StructType:
    fields = [
        T.StructField(EPOCH, T.LongType(), False),
        T.StructField(BUCKET, T.LongType(), False),
    ]
    fields += [T.StructField(field_col(i), T.StringType(), True) for i in range(1, max_depth + 1)]
    fields += [
        T.StructField(DEPTH, T.IntegerType(), False),
        T.StructField(TOTAL, T.DoubleType(), False),
        T.StructField(CNT, T.DoubleType(), False),
    ]
    return T.StructType(fields)


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # long-ns AFTER normalize_ts (engine convention)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# --------------------------------------------------------------------------
# Event-time normalization boundary.
#
# The engine's internal convention is int64 UTC NANOseconds (the reference
# keys everything on uint64 ns, database.go:153-171). Input tables, however,
# arrive however the producer wrote them: int64 ns (TIMESTAMP(NANOS) parquet
# read via nanosAsLong), TIMESTAMP / TIMESTAMP_NTZ (µs), or DATE. Every
# ingest path MUST pass event time through ts_ns_expr()/normalize_ts() so
# the rest of the engine never sees anything but long-ns. Never pin a
# LongType schema over a parquet timestamp column: the reader will hand back
# the raw int64 MICROseconds without error and every ns-denominated constant
# downstream is silently 1000x off.
# --------------------------------------------------------------------------

_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)


def ts_ns_expr(dtype: T.DataType, col: str | Column) -> Column:
    """Column expression converting an event-time column of ``dtype`` to the
    engine's long-ns convention.

    Integral input is assumed to already be ns and passes through (cast to
    long). TIMESTAMP_NTZ is interpreted as UTC wall-clock: the session
    timezone is pinned to UTC (session.py), so the NTZ->TIMESTAMP cast is
    deterministic and matches DuckDB's epoch_ns() on naive timestamps —
    the two sides of the correctness gate agree by construction.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dtype, _INTEGRAL):
        return c.cast("long")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return (F.unix_micros(c.cast("timestamp")) * F.lit(1000)).cast("long")
    if isinstance(dtype, T.StringType):
        # ISO-8601 wall-clock strings (a CSV/JSON ingest reality); parsed in
        # the pinned UTC session tz. try_to_timestamp, not to_timestamp:
        # under ANSI mode (Spark 4 default) the latter ABORTS the job on the
        # first malformed string — one poison row killing a 100 TB ingest.
        # Unparseable values become NULL instead, and every write path
        # filters on this converted expression, so they are dropped like
        # null event times.
        return (F.unix_micros(F.try_to_timestamp(c)) * F.lit(1000)).cast("long")
    raise TypeError(f"cannot normalize event-time column of type {dtype.simpleString()} to long-ns")


def ts_us_expr(ts: Column) -> Column:
    """long-ns -> long-µs with EXACT arithmetic. ``ts / 1000`` in Spark is
    double division, and ns epochs (~1.7e18) exceed double's 53-bit mantissa
    — the quotient can land on the adjacent microsecond, silently moving
    boundary events across a window edge. Decimal division keeps all digits;
    floor matches integral-div semantics for the engine's non-negative ts."""
    return F.floor(ts.cast("decimal(20,0)") / F.lit(1000)).cast("long")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace ``col`` with its long-ns form (no-op projection if already
    long). Works on batch and streaming DataFrames alike — it is a plain
    projection, so it keeps whole-stage codegen and pushes through to scans."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return df
    return df.withColumn(col, ts_ns_expr(dtype, col))


def ts_range_pred(
    dtype: T.DataType, col: str | Column, lo_ns: int | None = None, hi_ns: int | None = None
) -> Column:
    """Half-open ``[lo_ns, hi_ns)`` event-time predicate expressed against the
    column's SOURCE type.

    Filtering ``ts_ns_expr(...) >= lo`` wraps the column in a conversion, and
    Catalyst cannot push an expression through to parquet row-group min/max
    stats — at 100 TB that is the difference between pruning a month-long
    table down to one day and scanning all of it. This helper converts the
    CONSTANTS instead (ns bound -> µs bound via ceil, exact because
    normalized ns values are whole multiples of 1000), leaving a bare
    ``col >= literal`` comparison that lands in PushedFilters
    (plan-asserted in tests/test_plans.py). Timestamp literals are built
    with constant-folded casts, so NTZ columns compare against NTZ
    literals under the engine's pinned UTC session tz."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dtype, _INTEGRAL):
        lo_lit = None if lo_ns is None else F.lit(int(lo_ns))
        hi_lit = None if hi_ns is None else F.lit(int(hi_ns))
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # ns in [lo, hi) on the normalized value (us*1000) is equivalent to
        # us in [ceil(lo/1000), ceil(hi/1000)) on the raw column.
        def us_lit(ns: int) -> Column:
            return F.timestamp_micros(F.lit(-(-int(ns) // 1000))).cast(dtype)

        lo_lit = None if lo_ns is None else us_lit(lo_ns)
        hi_lit = None if hi_ns is None else us_lit(hi_ns)
    elif isinstance(dtype, T.DateType):
        # normalized DATE = UTC midnight -> ns = days * 86400e9; ns in
        # [lo, hi) is days in [ceil(lo/day), ceil(hi/day)) — exact day
        # literals, still a bare pushdown comparison (code-review r12:
        # DATE ingests through ts_ns_expr, so fetches must not crash on it)
        day_ns = 86_400 * 10**9

        def day_lit(ns: int) -> Column:
            return F.date_from_unix_date(F.lit(-(-int(ns) // day_ns)))

        lo_lit = None if lo_ns is None else day_lit(lo_ns)
        hi_lit = None if hi_ns is None else day_lit(hi_ns)
    elif isinstance(dtype, T.StringType):
        # ISO strings have no comparable typed literal — degrade to the
        # CORRECT non-pushdown predicate on the converted expression (a
        # full scan beats the previous hard TypeError on a source type
        # ts_ns_expr advertises as ingestable; code-review r12)
        conv = ts_ns_expr(dtype, c)
        pred = F.lit(True)
        if lo_ns is not None:
            pred = pred & (conv >= F.lit(int(lo_ns)))
        if hi_ns is not None:
            pred = pred & (conv < F.lit(int(hi_ns)))
        return pred
    else:
        raise TypeError(
            f"cannot build a pushdown time-range over type {dtype.simpleString()}"
        )
    pred = F.lit(True)
    if lo_lit is not None:
        pred = pred & (c >= lo_lit)
    if hi_lit is not None:
        pred = pred & (c < hi_lit)
    return pred
