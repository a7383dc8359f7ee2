"""Time-series join operators Spark lacks natively.

``range_join_bucketed`` — equi-key + time-range join, expressed so Catalyst
executes a plain HASH join instead of the nested-loop plan a raw
``l.key = r.key AND r.ts BETWEEN l.ts+a AND l.ts+b`` condition degrades to
per hot key. The standard bucketing decomposition (same trick behind
databricks' range-join hints and Flink's interval joins):

  bucket width w = window span; each RIGHT row maps to bucket ts div w;
  each LEFT row's window [ts+lower, ts+upper) overlaps at most TWO buckets,
  so it explodes into <= 2 copies keyed by bucket. The join becomes an
  equi-join on (key, bucket) — hash-partitionable, skew-bounded by actual
  time overlap rather than per-key row counts — plus the exact residual
  range predicate.

Each right row lives in exactly one bucket, so a matching pair is produced
exactly once (no dedup step needed). At 100 TB: one shuffle keyed by
(key, bucket) on each side; without bucketing, a key-only join fans out
|left_k| x |right_k| per key before filtering.

Reference parity note: kadiyadb has no joins at all (SURVEY §2); this is
north-star surface for event-stream analytics over the cube's source events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lower: int,
    upper: int,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``left[on] == right[on]`` and
    ``right[right_ts] ∈ [left[left_ts] + lower, left[left_ts] + upper)``.

    Timestamps are int64 (ns by engine convention); ``lower < upper``.
    ``left_ts`` and ``right_ts`` must be distinct column names (rename
    before calling when both sides share a schema). Only ``inner`` is
    supported: left rows are exploded per overlapped bucket, so an outer
    form would emit unmatched copies twice — aggregate-then-left-join the
    result instead (see the ``range_join_counts`` entry pattern)."""
    if lower >= upper:
        raise ValueError(f"need lower < upper, got [{lower}, {upper})")
    if how != "inner":
        raise ValueError(
            "range_join_bucketed is inner-only (exploded left copies would "
            "duplicate outer rows); aggregate then left-join for outer semantics"
        )
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    w = upper - lower
    # int64 `div` keeps full precision on ns timestamps (float division
    # loses bits above 2^53)
    rb = right.withColumn("_bucket", F.expr(f"{right_ts} div {w}"))
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"({left_ts} + {lower}) div {w}"),
                F.expr(f"({left_ts} + {upper} - 1) div {w}"),
            )
        ),
    )
    residual = (F.col(right_ts) >= F.col(left_ts) + F.lit(lower)) & (
        F.col(right_ts) < F.col(left_ts) + F.lit(upper)
    )
    return lb.join(rb, on=[*on, "_bucket"], how="inner").filter(residual).drop("_bucket")


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    right_cols: list[str],
    tolerance: int | None = None,
    direction: str = "backward",
    left_order_col: str | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` semantics as a Spark operator (Spark has no
    native as-of join): for every left row, attach the ``right_cols`` of
    the single right row with the largest ts <= left.ts (``backward``) or
    smallest ts >= left.ts (``forward``) within the same ``by_cols``
    group, optionally within ``tolerance`` (same units as ``ts_col``).
    The time-series enrichment primitive: trades x quotes, events x
    most-recent model score, metrics x last deploy.

    Shape — the union-timeline trick, NOT a range join: tag both inputs,
    union them, and run ONE by-keyed window ordered by (ts, side): a
    last_value(ignorenulls) over the preceding frame carries the most
    recent right payload onto each left row (forward mirrors it with a
    following frame). One shuffle total, O(1)/row window state, no
    pairwise expansion — a range join here would be |left| x |right|
    within group before filtering. Left rows tie-break AFTER right rows
    at equal ts (asof takes a simultaneous quote), deterministically via
    the side tag; ``left_order_col`` keeps the left side itself a total
    order for engine-exact layouts.

    Tolerance is applied by also carrying the matched right ts and
    null-ing the payload where the gap exceeds it — the match is still
    the nearest one (pandas semantics: a too-far nearest match yields
    NaN, it does not fall through to an older row).

    Contract: the right side is UNIQUE per (by_cols, ts) — at a duplicate
    right timestamp "the" as-of row is undefined and any engine would
    pick by layout; pre-fold duplicates (e.g. max_by) upstream. Output:
    every left column + ``right_cols`` (null where no match) +
    ``asof_ts`` (the matched right row's ts, null where none).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")
    # the operator's internal scratch columns and the 'asof_ts' output are
    # RESERVED: a left frame already carrying one would be silently
    # overwritten by withColumn, corrupting the side tag / match payload
    # (r10 ADVICE — mirrors the right_cols overlap check above)
    reserved = {"_side", "_asof_ts", "asof_ts"} | {f"_m_{c}" for c in right_cols}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"input columns collide with merge_asof reserved names: "
            f"{sorted(clash)} (rename them upstream)"
        )
    from pyspark.sql import Window

    lt = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *by_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(lt.columns))
    # backward: right rows (side 0) sort BEFORE left rows at equal ts, so
    # the preceding frame includes simultaneous quotes; forward mirrors.
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if left_order_col is not None:
        order.append(F.col(left_order_col).asc_nulls_first())
    w = Window.partitionBy(*by_cols).orderBy(*order)
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, -1)
        pick = lambda c: F.last(c, ignorenulls=True).over(frame)  # noqa: E731
    else:
        order = [F.col(ts_col).desc(), F.col("_side").asc()]
        if left_order_col is not None:
            order.append(F.col(left_order_col).asc_nulls_first())
        w = Window.partitionBy(*by_cols).orderBy(*order)
        frame = w.rowsBetween(Window.unboundedPreceding, -1)
        pick = lambda c: F.last(c, ignorenulls=True).over(frame)  # noqa: E731
    rts = F.when(F.col("_side") == 0, F.col(ts_col))
    matched = u.withColumn("_asof_ts", pick(rts))
    for c in right_cols:
        matched = matched.withColumn(
            "_m_" + c, pick(F.when(F.col("_side") == 0, F.col(c)))
        )
    gap_ok = (
        F.lit(True)
        if tolerance is None
        else (
            F.abs(F.col(ts_col) - F.col("_asof_ts")) <= F.lit(int(tolerance))
        )
    )
    out = matched.filter(F.col("_side") == 1).select(
        *left.columns,
        *[
            F.when(F.col("_asof_ts").isNotNull() & gap_ok, F.col("_m_" + c))
            .alias(c)
            for c in right_cols
        ],
        F.when(F.col("_asof_ts").isNotNull() & gap_ok, F.col("_asof_ts")).alias(
            "asof_ts"
        ),
    )
    return out
