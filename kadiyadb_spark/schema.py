"""Canonical schemas for the engine.

The cube is the Spark materialization of the reference's storage: one row per
(epoch, bucket, series-prefix) holding the pre-aggregated Point
(total, cnt) — SURVEY §1.6. Field paths are null-padded fixed-depth string
columns f1..fN plus an explicit ``depth`` (exact-depth matching, SURVEY §2
fine-print #6).
"""

from __future__ import annotations

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
        T.StructField("ts", T.LongType()),  # ns (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
