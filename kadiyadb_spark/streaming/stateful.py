"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming constructs at all (SURVEY §2: ingestion is
synchronous RPC-style Track calls); these are the Spark-native stateful
operators a metrics/training pipeline layers on top of the event stream.

- ``stream_sessionize``: per-user session assembly with an inactivity gap —
  the canonical custom-state example. State per user = (session start, last
  event ts, event count, value sum). A session closes on the DATA path when
  a later event of the same user arrives past the gap, and on the WATERMARK
  path (event-time timeout) when the watermark passes session_end + gap — so
  closure is decided entirely by event time, never wall clock. A stalled or
  slow source cannot close sessions early, and a drained source flushes
  exactly the sessions whose gap the data itself has passed: output is a
  deterministic function of the input events.

Scale notes: state is keyed by user and lives in the state store (RocksDB
on a real cluster); each micro-batch touches only keys present in the batch
plus watermark-expired keys. The Arrow boundary batches whole key-groups, so
the Python kernel sees one pandas frame per user per batch — vectorized,
never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SEC = 1_000_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # ns
        T.StructField("session_end", T.LongType()),  # ns
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ]
)


def _session_fn(gap_ns: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # Watermark passed session_end + gap: the open session is closed
            # BY EVENT TIME — no later event can extend it (any in-gap event
            # would be behind the watermark, i.e. dropped as late anyway).
            start, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start, last, n, vsum = state.get
        else:
            # Column-first indexing: rows.iloc[0]["ts"] would select the ROW
            # first, coercing int64 ts into the row's common float64 dtype
            # and corrupting ns timestamps (53-bit mantissa).
            start = last = int(rows["ts"].iloc[0])
            n, vsum = 0, 0.0
        for ts, value in zip(rows["ts"], rows["value"]):
            ts = int(ts)
            if n > 0 and ts - last > gap_ns:
                closed.append((start, last, n, vsum))
                start, n, vsum = ts, 0, 0.0
            # an in-watermark straggler from a LATER micro-batch may predate
            # the open session's first seen event — session_start must move
            # down with it (code-review r12; within-batch rows are sorted,
            # so this only fires across batches)
            start = min(start, ts)
            last = max(last, ts)
            n += 1
            # SQL sum semantics: a NULL value contributes nothing (it must
            # not NaN-poison the running sum) while n_events still counts
            # the row — matches the batch path's F.sum/F.count split
            if pd.notna(value):
                vsum += float(value)
        state.update((start, last, n, vsum))
        # Event-time closure for the open session: fire when the watermark
        # passes session_end + gap. Spark requires the timeout to sit above
        # the current watermark; the max() guard covers a batch whose events
        # were already close to it (fires on the next watermark advance).
        timeout_ms = (last + gap_ns) // 1_000_000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_ns: int = 30 * 60 * SEC,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Assemble per-user sessions from a STREAMING events frame; emits a
    session row when its inactivity gap elapses IN EVENT TIME (watermark-
    driven, ``GroupStateTimeout.EventTimeTimeout``). Returns the streaming
    DataFrame of finalized sessions (append semantics).

    ``watermark_delay`` is the out-of-orderness bound: events later than the
    watermark are dropped by the engine before they can reopen a closed
    session, which is exactly what makes the timeout sound."""
    from pyspark.sql import functions as F

    from kadiyadb_spark.schema import ts_ns_expr, ts_us_expr

    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        ts_ns_expr(events.schema[ts_col].dataType, ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("ts").isNotNull())  # null/unparseable: no event-time position
    # Watermarks need a TimestampType column; ns -> micros loses nothing at
    # our resolutions (the engine truncates to µs at streaming boundaries).
    src = src.withColumn("_event_time", F.timestamp_micros(ts_us_expr(F.col("ts"))))
    src = src.withWatermark("_event_time", watermark_delay)
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ns),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
