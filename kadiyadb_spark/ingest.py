"""O1/O3 — Track: events -> pre-aggregated cube with write-time prefix rollup.

Reference semantics (SURVEY §2 O1, epoch/epoch.go:66-80): Track(ts, fields,
total, count) adds (total, count) into the Point at slot floor((ts-ets)/res)
for EVERY prefix fields[:i], i=1..len(fields). A batch of Track calls is
therefore exactly:

    explode each event into its path prefixes  (depth x fan-out, map-side)
    groupBy (epoch, bucket, f1..fN, depth)     (ONE shuffle, partial agg
    agg sum(total), sum(count)                  map-side combine for free)

Scale notes: the prefix fan-out happens in the same projection that computes
the bucket, so whole-stage codegen keeps it JVM-side; the single shuffle is
keyed by the full group key so cardinality = #series-prefixes x #buckets —
the cube is the *aggregate*, orders of magnitude smaller than raw events at
100 TB. No UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kadiyadb_spark import schema as S
from kadiyadb_spark.functions.num import FOLD_EXACT_BOUND, guarded_scaled_sum

# Values the reference forbids as stored field values (index/node.go:200-214).
ILLEGAL_FIELD_VALUES = ("", "*")


def bucket_expr(ts: Column, resolution: int) -> Column:
    """O3 split: ts -> slot start (database.go:267-277). Floor division; the
    reference clamps ts < resolution to slot 0, which floor gives us for
    non-negative ts."""
    return (ts - (ts % F.lit(resolution))).cast("long")


def epoch_expr(bucket: Column, duration: int) -> Column:
    return (bucket - (bucket % F.lit(duration))).cast("long")


def field_illegal(c: Column) -> Column:
    """THE per-field legality rule (null / "" / "*", index/node.go:200-214)
    — single source shared by the drop path (validate_fields_df) and its
    observability twin (track_rejects), so the pytest-pinned complement
    invariant cannot drift between two hand-inverted copies (code-review
    r12)."""
    return c.isNull() | c.isin(*ILLEGAL_FIELD_VALUES)


def value_illegal(c: Column, value_dp: int | None) -> Column:
    """Poison-value rule for total/count columns (code-review r12): NULL
    (would half-count — cnt increments, total contributes nothing, and an
    all-null group stores a schema-violating NULL total), NaN/±Inf (under
    ANSI the scaled cast ABORTS the whole job — one poison row must not
    kill a 100 TB ingest), and, on the scaled-long grid, magnitudes whose
    scaled form exceeds the EXACT-FOLD bound 2^53 (VERDICT r12 item 2: the
    r12 bound was long-cast safety, 9.2e18/10^dp, which left a ~1000x band
    of values that validated cleanly and then aborted the whole job inside
    ``guarded_scaled_sum`` — the exact one-poison-row failure this rule
    exists to close). A single validated row now survives every exact fold
    by construction; only a GROUP whose combined total passes 2^53 can
    still abort, which is the documented fold-overflow contract (split the
    group or lower value_dp), not a data-quality case."""
    c = c.cast("double")
    bad = c.isNull() | F.isnan(c) | (F.abs(c) == float("inf"))
    if value_dp is not None:
        bad = bad | (F.abs(c) > F.lit(FOLD_EXACT_BOUND / 10**value_dp))
    return bad


def validate_fields_df(df: DataFrame, fields: list[str]) -> DataFrame:
    """Reject rows carrying illegal stored field values ("" / "*" / null),
    mirroring index/node.go:200-214. Returns the filtered DataFrame; callers
    that want hard failure can compare counts."""
    cond = F.lit(True)
    for f in fields:
        cond = cond & ~field_illegal(F.col(f).cast("string"))
    return df.filter(cond)


def track_batch(
    df: DataFrame,
    fields: list[str],
    ts_col: str = "ts",
    total_col: str = "value",
    count_col: str | None = None,
    resolution: int = 60_000_000_000,
    duration: int = 3_600_000_000_000,
    rollup: bool = True,
    validate: bool = True,
    value_dp: int | None = 4,
) -> DataFrame:
    """Aggregate an events DataFrame into the kadiyadb cube.

    ``fields`` are the source columns forming the ordered field path (cast to
    string). ``count_col=None`` counts 1 per row (the Track(v, 1) pattern).
    ``rollup=True`` materializes every path prefix (reference write-time
    rollup); ``rollup=False`` stores only full-depth series (cheaper writes;
    query-time rollup can reconstruct prefixes — property-tested equal).

    ``value_dp`` (default 4) makes the (total, count) folds ORDER-INDEPENDENT
    for ``dp``-decimal-quantized inputs: each value scales to its exact
    integer (``round(v*10^dp)`` as long), longs sum associatively —
    identical at ANY parallelism and in any engine — and ONE final division
    restores the double. The stored total is then the exact dp-multiple, so
    every later re-fold (segment merge, compact, rollup read) recovers the
    same integers and the whole LSM pipeline is exact end-to-end; with raw
    double sums a partition-layout change can flip the 4th decimal of a
    round4'd total (the r06 ``pipeline_quality`` gate class). Inputs with
    MORE than ``dp`` true decimals are quantized at ingest — pass
    ``value_dp=None`` for the reference's raw float64 accumulation
    (epoch/epoch.go:66-80 semantics, order-dependent). Counts quantize and
    fold at dp=0 (integers, like the reference's Point.Count) — the full
    2^53 exact-fold headroom. Exact-fold bound at dp=4: |v| <= 1e5 leaves
    ~9e6 rows per (series, slot) before the 2^53 guard trips; beyond that
    scale, lower value_dp or switch the callsite to decimal(38, dp).

    ``validate=True`` (the default, matching the reference's UNCONDITIONAL
    write-path rejection of ""/"*" values, index/node.go:200-214) drops rows
    carrying illegal field values so they never become series; the per-call
    error of the reference maps to row rejection in a batch engine (aborting
    a 100 TB job for one poison row is not a useful parity). Negative
    timestamps DO abort (ErrInvTime, database.go:156-158): a bad clock is a
    pipeline bug, not a data-quality case.

    Returns a DataFrame with schema ``cube_schema(len(fields))``.
    """
    n = len(fields)
    if n == 0:
        raise ValueError("need at least one field column")
    if validate:
        df = validate_fields_df(df, fields)
        # poison-value rows reject like illegal fields (code-review r12):
        # NULL half-counts, NaN/Inf/out-of-grid aborts the scaled cast —
        # track_rejects surfaces them with per-reason labels
        df = df.filter(~value_illegal(F.col(total_col), value_dp))
        if count_col is not None:
            # counts are INTEGERS (reference Point.Count, block/blockrw.go)
            # and fold at dp=0, so their grid bound is 2^53 flat
            df = df.filter(
                ~value_illegal(F.col(count_col), 0 if value_dp is not None else None)
            )

    # Event-time boundary: accept long-ns, TIMESTAMP, TIMESTAMP_NTZ, DATE or
    # ISO string input and emit long-ns (schema.ts_ns_expr) — the engine
    # convention. Filter on the CONVERTED expression: NULL event time is
    # unrepresentable in the reference (uint64 ts) and has no position on
    # the time axis, and an unparseable string normalizes to NULL — both
    # are dropped here rather than becoming a poison null-bucket series or
    # tripping the negative-ts assert with a misleading message (the
    # negative-ts case below still aborts — a bad clock is a pipeline bug,
    # a null/unparseable value is missing data).
    ts = S.ts_ns_expr(df.schema[ts_col].dataType, ts_col)
    df = df.filter(ts.isNotNull())
    # ErrInvTime guard (database.go:156-158, 190-193): negative ts would
    # silently floor into negative buckets; raise at execution instead.
    # r13 optimization (guide §1.2 per-task work): the guard is a FILTER
    # conjunct, not a wrapper on the ts VALUE. The old form
    # ``ts + coalesce(assert_true(...), 0)`` was inlined by project
    # collapse into every downstream bucket/epoch/range expression — the
    # fetch entries' plans carried ~14 copies of the full
    # raise_error/coalesce tree per Filter, bloating optimizer time,
    # generated code and per-row work. As a filter it is evaluated once
    # per row; coalesce(ts >= 0, true) keeps it null-safe so optimizer
    # conjunct reordering can never make a null-ts row (dropped by the
    # filter above) trip the assert. assert_true is NULL on pass, so
    # coalesce(.., true) is the pass-through; a negative ts still aborts
    # the job with the same ErrInvTime message.
    df = df.filter(
        F.coalesce(
            F.assert_true(
                F.coalesce(ts >= 0, F.lit(True)),
                F.concat(
                    F.lit("ErrInvTime: negative timestamp "), ts.cast("string")
                ),
            ).cast("boolean"),
            F.lit(True),
        )
    )
    bucket = bucket_expr(ts, resolution)
    if value_dp is None:
        total = F.col(total_col).cast("double")
        cnt = F.lit(1.0) if count_col is None else F.col(count_col).cast("double")
    else:
        s = 10**value_dp
        total = F.round(F.col(total_col).cast("double") * s).cast("long")
        # counts quantize at dp=0 (integers, like the reference's
        # Point.Count) — VERDICT r12 item 2: scaling them by 10^dp burned
        # 10^dp of the 2^53 exact-fold headroom for nothing, so a group
        # with cnt past 2^53/10^dp ingested cleanly and aborted at its
        # first compact/merge re-fold
        cnt = (
            F.lit(1).cast("long")
            if count_col is None
            else F.round(F.col(count_col).cast("double")).cast("long")
        )

    src = [F.col(f).cast("string") for f in fields]
    depths = range(1, n + 1) if rollup else [n]
    # One struct per prefix depth; explode fans out in the same codegen stage.
    prefixes = F.array(
        *[
            F.struct(
                F.lit(d).alias(S.DEPTH),
                *[
                    (src[j] if j < d else F.lit(None).cast("string")).alias(S.field_col(j + 1))
                    for j in range(n)
                ],
            )
            for d in depths
        ]
    )
    exploded = df.select(
        bucket.alias(S.BUCKET),
        total.alias("_t"),
        cnt.alias("_c"),
        F.explode(prefixes).alias("_p"),
    )
    fcols = S.field_cols(n)
    return (
        exploded.select(
            epoch_expr(F.col(S.BUCKET), duration).alias(S.EPOCH),
            S.BUCKET,
            *[F.col(f"_p.{c}").alias(c) for c in fcols],
            F.col(f"_p.{S.DEPTH}").cast("int").alias(S.DEPTH),
            "_t",
            "_c",
        )
        .groupBy(S.EPOCH, S.BUCKET, *fcols, S.DEPTH)
        .agg(
            *(
                [F.sum("_t").alias(S.TOTAL), F.sum("_c").alias(S.CNT)]
                if value_dp is None
                else [
                    # guarded: decimal(38,0) accumulation (no 2^63 wrap) +
                    # hard error past 2^53, where the stored double would
                    # silently stop being an exact dp-multiple
                    (
                        guarded_scaled_sum(F.col("_t"), value_dp)
                        / F.lit(float(10**value_dp))
                    )
                    .cast("double")
                    .alias(S.TOTAL),
                    # counts are plain longs at dp=0 either way (1s for
                    # count_col=None, round(count) otherwise) — full 2^53
                    # headroom, no divide-back
                    guarded_scaled_sum(F.col("_c"), 0).cast("double").alias(S.CNT),
                ]
            )
        )
    )


def fold_aggs(value_dp: int | None):
    """The (total, cnt) aggregate pair every STORED-cube fold uses — segment
    merge, compact, read-time fold, rollup read. ``value_dp`` set: exact
    scaled-long folds (stored doubles are exact dp-multiples, so
    ``round(v*10^dp)`` recovers the integer losslessly up to 2^53/10^dp and
    the fold is order-independent). ``None``: raw double sums (reference
    float64 semantics)."""
    if value_dp is None:
        return [F.sum(S.TOTAL).alias(S.TOTAL), F.sum(S.CNT).alias(S.CNT)]
    from kadiyadb_spark.functions.num import exact_fold_expr

    return [
        exact_fold_expr(F.col(S.TOTAL), value_dp).alias(S.TOTAL),
        # counts are INTEGER doubles (ingest quantizes at dp=0), so they
        # re-fold at dp=0 — re-folding at value_dp burned 10^dp of the 2^53
        # guard headroom, aborting compact/merge for groups whose cnt had
        # ingested cleanly (VERDICT r12 item 2 / SURVEY §19.4 defer)
        exact_fold_expr(F.col(S.CNT), 0).alias(S.CNT),
    ]


def merge_increment(
    existing: DataFrame, delta: DataFrame, max_depth: int, value_dp: int | None = 4
) -> DataFrame:
    """MERGE-increment (SURVEY §4 'lock-free hot writes' mapping): combine an
    existing cube with a batch of cube deltas, summing Points on key match.
    Pure DataFrame union+re-agg — at scale this runs per touched epoch
    partition only (see database.Database.track). ``value_dp`` as in
    ``track_batch``: exact scaled-long folds so a merge can never shift a
    stored dp-multiple."""
    fcols = S.field_cols(max_depth)
    keys = [S.EPOCH, S.BUCKET, *fcols, S.DEPTH]
    return (
        existing.select(*keys, S.TOTAL, S.CNT)
        .unionByName(delta.select(*keys, S.TOTAL, S.CNT))
        .groupBy(*keys)
        .agg(*fold_aggs(value_dp))
    )


def track_rejects(
    df: DataFrame,
    fields: list[str],
    ts_col: str = "ts",
    total_col: str | None = "value",
    count_col: str | None = None,
    value_dp: int | None = 4,
    validate: bool = True,
) -> DataFrame:
    """DEAD-LETTER view of a track batch: exactly the rows ``track_batch``
    would silently drop, each with a ``reject_reason`` — the observability
    half of the row-rejection policy (at 100 TB a pipeline must SEE what
    it lost; "skip" without a census is how a feed dies quietly). Reasons,
    first match wins (deterministic order: the event-time check, then
    fields in the caller's order):

      - ``null_ts``           null / unparseable event time (ts_ns_expr
                              normalizes bad ISO strings to null)
      - ``illegal_field:<f>`` the reference's forbidden stored values
                              (""/"*", index/node.go:200-214) or null
      - ``illegal_value:<c>`` poison total/count: NULL (would half-count),
                              NaN/±Inf, or off the scaled-long grid
                              (would abort the ANSI cast) — code-review
                              r12, same rule as track_batch's filter

    ``validate``/``total_col``/``count_col``/``value_dp`` MUST mirror the
    ``track_batch`` call this feed shadows: with ``validate=False``
    track_batch aggregates illegal-field and poison-value rows instead of
    dropping them, so only ``null_ts`` rows reject — passing the caller's
    flag keeps the complement exact (previously a validate=False pipeline
    double-counted every illegal row into BOTH feeds).

    BREAKING since r12 (ADVICE r12 — called out in README "Changelog
    notes"): ``validate=True`` + ``total_col="value"`` are the defaults,
    so a legacy field-only reject feed whose frame lacks a 'value' column
    now raises. Pass ``total_col=None`` to opt out of value validation
    (field + ts reasons only) for such feeds, or ``validate=False`` to
    mirror a non-validating track_batch.

    The complement invariant — rejects + rows track_batch aggregates =
    the input, with no overlap — is pytest-pinned. Pure map-side filter:
    no shuffle, streams at scan speed; write the result next to the cube
    commit for a crash-safe quarantine feed."""
    n = len(fields)
    if n == 0:
        raise ValueError("need at least one field column")
    if validate and total_col is not None and total_col not in df.columns:
        raise ValueError(
            f"track_rejects needs the {total_col!r} column its track_batch "
            f"twin aggregates (pass total_col=, total_col=None for a "
            f"field-only feed, or validate=False)"
        )
    tsn = S.ts_ns_expr(df.schema[ts_col].dataType, ts_col)
    reason = F.when(tsn.isNull(), F.lit("null_ts"))
    if validate:
        for f in fields:
            reason = reason.when(
                field_illegal(F.col(f).cast("string")), F.lit(f"illegal_field:{f}")
            )
        if total_col is not None:
            reason = reason.when(
                value_illegal(F.col(total_col), value_dp),
                F.lit(f"illegal_value:{total_col}"),
            )
        if count_col is not None:
            # same dp=0 count bound as track_batch's filter
            reason = reason.when(
                value_illegal(F.col(count_col), 0 if value_dp is not None else None),
                F.lit(f"illegal_value:{count_col}"),
            )
    return df.withColumn("reject_reason", reason).filter(
        F.col("reject_reason").isNotNull()
    )
