"""Product-analytics operators over the event stream the cube ingests:
ordered funnels and cohort retention — the two queries every APM /
product-analytics deployment of a store like the reference runs beside
its time-series fetches (the reference's own host product is an APM;
readme.md positions the engine under exactly this workload).

Reference parity note: kadiyadb itself has no multi-event operators
(SURVEY §2) — like the join family, this is north-star surface over the
cube's SOURCE events, kept engine-default-free so it gates cross-engine.

Scale shapes:

``funnel_counts`` — ONE shuffle keyed by user (collect each user's
events once, sorted in-array), then a JVM ``aggregate`` fold runs the
greedy stage scan per user — no per-stage join cascade, no Python. The
greedy first-occurrence scan over ts-sorted events is equivalent to the
textbook "min ts of step_i strictly after t_{i-1}" chain (induction on
stages), which is what the DuckDB oracle computes via k min-filter CTEs
— same numbers, two very different algorithms, so the gate is a real
cross-check. Per-user event lists are bounded by the caller's time-range
filter (funnel windows are days/weeks, not all history); the stage
census that ships off each executor is k rows.

``cohort_retention`` — activity de-dups to (user, day) FIRST (the only
wide shuffle, collapsing raw event volume to at most users x days),
cohort assignment reuses the same user-keyed partitioning, and the final
(cohort, offset) census is tiny. Ratios are one long/long division
(identical IEEE in any engine) rounded at 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kadiyadb_spark.functions.num import round4_expr
from kadiyadb_spark.schema import ts_ns_expr


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    within: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion over an event frame: a user reaches
    stage i when an event of type ``steps[i]`` occurs STRICTLY after the
    event that completed stage i-1 (first stage: any occurrence). Output
    is one row per stage: ``stage`` (1-based), ``step``, ``users``
    reached, ``conv_from_prev`` and ``conv_from_first`` (4dp; stage 1
    reads 1.0; an empty previous stage yields null).

    ``within``: optional conversion window (same units as ``ts_col``) —
    later stages must complete at ``ts <= t1 + within`` where t1 is the
    user's FIRST stage-1 event. The anchor is deliberately the earliest
    stage-1 occurrence, never re-anchored to a later one (a user whose
    second signup would admit more stages still converts from the
    first): fixed-anchor semantics keep the greedy scan equal to the
    min-ts chain and are what the SQL twin computes.

    ``ts_col`` may be a numeric (epoch) timestamp or a TIMESTAMP/
    TIMESTAMP_NTZ column — schema.ts_ns_expr normalizes either to
    long-ns, so ordering, strict-inequality and ``within`` (always ns
    for non-numeric input) are integer comparisons on both engines."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within is not None and within <= 0:
        raise ValueError(f"conversion window must be positive, got {within}")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            F.struct(
                ts_ns_expr(events.schema[ts_col].dataType, ts_col).alias("ts"),
                F.col(type_col).alias("et"),
            ).alias("_e"),
        )
        # null-ts rows (ingest artifacts / unparseable timestamps) carry no
        # event-time and must not anchor or advance any stage
        .filter(F.col("_e.ts").isNotNull() & F.col("_e.et").isin(*steps))
        .groupBy("_u")
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    )
    # greedy stage scan, JVM-side: state = (stage reached, ts completing
    # it, ts of the stage-1 anchor for the conversion window)
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(-1).cast("long").alias("t"),
        F.lit(-1).cast("long").alias("t1"),
    )
    in_window = (
        F.lit(True)
        if within is None
        else (lambda st, e: (st["stage"] == 0) | (e["ts"] <= st["t1"] + F.lit(within)))
    )
    fold = F.aggregate(
        F.col("_evs"),
        init,
        lambda st, e: F.when(
            (st["stage"] < F.lit(k))
            & (e["et"] == F.element_at(steps_arr, st["stage"] + F.lit(1)))
            & (e["ts"] > st["t"])
            & (in_window if within is None else in_window(st, e)),
            F.struct(
                (st["stage"] + F.lit(1)).alias("stage"),
                e["ts"].alias("t"),
                F.when(st["stage"] == 0, e["ts"]).otherwise(st["t1"]).alias("t1"),
            ),
        ).otherwise(st),
    )
    reached = per_user.select(fold["stage"].alias("_reached")).filter(
        F.col("_reached") > 0
    )
    # census: users at stage s = users whose scan reached >= s
    stages = reached.groupBy("_reached").agg(F.count(F.lit(1)).alias("_n"))
    spark = events.sparkSession
    axis = spark.range(1, k + 1).select(F.col("id").cast("int").alias("stage"))
    cum = (
        axis.join(stages, stages["_reached"] >= axis["stage"], "left")
        .groupBy("stage")
        .agg(F.sum(F.coalesce(F.col("_n"), F.lit(0))).alias("users"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("stage")
    prev = F.lag("users").over(w)
    first = F.first("users").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return cum.select(
        "stage",
        F.element_at(steps_arr, F.col("stage")).alias("step"),
        "users",
        round4_expr(
            F.when(F.col("stage") == 1, F.lit(1.0)).otherwise(
                F.when(prev > 0, F.col("users").cast("double") / prev.cast("double"))
            )
        ).alias("conv_from_prev"),
        round4_expr(
            F.when(first > 0, F.col("users").cast("double") / first.cast("double"))
        ).alias("conv_from_first"),
    )


def funnel_time_stats(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    within: int | None = None,
) -> DataFrame:
    """TIME-TO-CONVERT between consecutive funnel stages — the question
    right after funnel_counts' "how many": how LONG users take from each
    stage to the next (median checkout latency, p75 activation lag). Uses
    the identical greedy first-occurrence semantics as funnel_counts (the
    fold additionally records each stage's completing timestamp; by the
    same induction those equal the min-ts chain's t_i), so the two
    operators always describe the same cohort.

    Per stage i >= 2, over users who reached it: the count, the exact mean
    and the type-7 p25/p50/p75 of (t_i - t_{i-1}), reported in seconds at
    4dp. Engine-default-free: deltas are exact integer ns (hours-scale —
    far inside double's 2^53 window, unlike absolute epoch-ns), DYADIC
    phis make every interpolation term exactly representable (the
    series_quantile_over_time argument), the mean folds a long sum with
    ONE division, and /1e9 + round4 are identical IEEE ops both engines.

    Scale shape: the same ONE user-keyed shuffle as funnel_counts; the
    stage census that aggregates the deltas is k-1 groups whose per-group
    percentile state is bounded by converted-user count.

    Output: (stage, from_step, to_step, n_converted, mean_s, p25_s,
    p50_s, p75_s), one row per stage 2..k that any user reached."""
    if len(steps) < 2:
        raise ValueError("time-to-convert needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within is not None and within <= 0:
        raise ValueError(f"conversion window must be positive, got {within}")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            F.struct(
                ts_ns_expr(events.schema[ts_col].dataType, ts_col).alias("ts"),
                F.col(type_col).alias("et"),
            ).alias("_e"),
        )
        .filter(F.col("_e.ts").isNotNull() & F.col("_e.et").isin(*steps))
        .groupBy("_u")
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(-1).cast("long").alias("t"),
        F.lit(-1).cast("long").alias("t1"),
        F.array().cast("array<long>").alias("tss"),
    )
    fold = F.aggregate(
        F.col("_evs"),
        init,
        lambda st, e: F.when(
            (st["stage"] < F.lit(k))
            & (e["et"] == F.element_at(steps_arr, st["stage"] + F.lit(1)))
            & (e["ts"] > st["t"])
            & (
                F.lit(True)
                if within is None
                else (st["stage"] == 0) | (e["ts"] <= st["t1"] + F.lit(within))
            ),
            F.struct(
                (st["stage"] + F.lit(1)).alias("stage"),
                e["ts"].alias("t"),
                F.when(st["stage"] == 0, e["ts"]).otherwise(st["t1"]).alias("t1"),
                F.concat(st["tss"], F.array(e["ts"])).alias("tss"),
            ),
        ).otherwise(st),
    )
    # sequence(2, stage) DESCENDS when stage < 2 — filter first
    deltas = (
        per_user.select(fold.alias("_st"))
        .filter(F.col("_st.stage") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(2), F.col("_st.stage")),
                    lambda i: F.struct(
                        i.cast("long").alias("stage"),
                        (
                            F.element_at(F.col("_st.tss"), i)
                            - F.element_at(F.col("_st.tss"), i - F.lit(1))
                        ).alias("d"),
                    ),
                )
            ).alias("_x")
        )
        .select(F.col("_x.stage").alias("stage"), F.col("_x.d").alias("d"))
    )
    ns = F.lit(1e9)
    agg = deltas.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_converted"),
        round4_expr(
            F.sum("d").cast("double") / (F.count(F.lit(1)).cast("double") * ns)
        ).alias("mean_s"),
        round4_expr(F.percentile("d", F.lit(0.25)) / ns).alias("p25_s"),
        round4_expr(F.percentile("d", F.lit(0.5)) / ns).alias("p50_s"),
        round4_expr(F.percentile("d", F.lit(0.75)) / ns).alias("p75_s"),
    )
    return agg.select(
        "stage",
        F.element_at(steps_arr, (F.col("stage") - 1).cast("int")).alias("from_step"),
        F.element_at(steps_arr, F.col("stage").cast("int")).alias("to_step"),
        "n_converted",
        "mean_s",
        "p25_s",
        "p50_s",
        "p75_s",
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    day_ns: int = 86_400 * 10**9,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: users are cohorted by their FIRST active day;
    for each (cohort_day, day_offset) the output counts users active
    again ``day_offset`` days later and the retention ratio against the
    cohort's size. ``day_offset`` 0 is the cohort itself (ratio 1.0).
    Day arithmetic is integer DIV on the numeric timestamp — no calendar
    functions, no timezone, identical in any engine.

    Output: cohort_day (day index since epoch), day_offset, active_users,
    cohort_size, retention (4dp)."""
    # integer DIV, never float division: /​ on ns-scale longs routes through
    # double and corrupts above 2^53
    ts_ns = ts_ns_expr(events.schema[ts_col].dataType, ts_col)
    activity = (
        events.select(F.col(user_col).alias("_u"), ts_ns.alias("_tsn"))
        .filter(F.col("_tsn").isNotNull())
        .select("_u", F.expr(f"CAST(_tsn DIV {day_ns} AS LONG)").alias("_day"))
        .distinct()
    )
    firsts = activity.groupBy("_u").agg(F.min("_day").alias("_cohort"))
    sizes = firsts.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    joined = activity.join(firsts, "_u").select(
        F.col("_cohort"), (F.col("_day") - F.col("_cohort")).alias("day_offset"), "_u"
    )
    if max_offset is not None:
        joined = joined.filter(F.col("day_offset") <= max_offset)
    counts = joined.groupBy("_cohort", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    return (
        counts.join(F.broadcast(sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort_day"),
            "day_offset",
            "active_users",
            "cohort_size",
            round4_expr(
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def path_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Event-path transition census (the Markov/Sankey view beside the
    funnel): for every consecutive pair of events within a user's
    timeline, count how often ``from_event`` is immediately followed by
    ``to_event`` and how many distinct users ever make that hop. The
    funnel answers "how far along MY ordered steps"; this answers "where
    do users actually go next" — the discovery query that picks the
    funnel's steps in the first place.

    Scale shape: ONE user-keyed window Exchange orders each user's
    timeline (per-user event counts bound window state, the same
    cardinality argument as funnel_counts), then the (from, to) census
    is a tiny event-type-squared aggregation with map-side combine.

    Determinism: consecutive-ness depends on a TOTAL order, so ties on
    the timestamp break on ``id_col`` (data, not engine semantics) —
    equal-ts events would otherwise make the transition multiset
    layout-dependent. The timestamp normalizes to long-ns via
    schema.ts_ns_expr (numeric passes through; TIMESTAMP/NTZ convert),
    so ordering is integer comparison in any engine.

    Output: from_event, to_event, transitions, users."""
    from pyspark.sql import Window

    # project the aliased key FIRST and window on it: a window keyed on
    # the pre-alias column loses its output partitioning the moment that
    # column is projected away, forcing a redundant Exchange before the
    # per-user census below (seen in the formatted plan; aliasing here
    # keeps hash(_u) alive downstream)
    timeline = events.select(
        F.col(user_col).alias("_u"),
        ts_ns_expr(events.schema[ts_col].dataType, ts_col).alias("_tsn"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("to_event"),
    ).filter(
        # a null-ts row would sort to the head of every user's timeline
        # and fabricate a bogus first hop
        F.col("_tsn").isNotNull()
    )
    w = Window.partitionBy("_u").orderBy(F.col("_tsn").asc(), F.col("_id").asc())
    hops = (
        timeline.select(
            "_u",
            "to_event",
            F.lag("to_event").over(w).alias("from_event"),
        )
        .filter(F.col("from_event").isNotNull())
    )
    # per-user pre-census first: its keys (u, from, to) ⊇ the window's
    # user partitioning, so Catalyst adds NO exchange for it, and the
    # distinct-user count becomes a plain row count — two Exchanges total
    # where groupBy+countDistinct would cost three (window + Expand +
    # final census)
    per_user = hops.groupBy("_u", "from_event", "to_event").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        per_user.groupBy("from_event", "to_event")
        .agg(
            F.sum("_n").alias("transitions"),
            F.count(F.lit(1)).alias("users"),
        )
    )


def rfm_segments(
    events: DataFrame,
    now_ts: int,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    value_col: str = "value",
    n_bins: int = 5,
) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quintile scores
    per user, the classic lifecycle-marketing census (5-5-5 champions,
    5-1-1 fresh signups, 1-5-5 lapsing whales). ``now_ts`` is an explicit
    parameter (same units as the normalized ts: ns), never an engine
    clock — wall-clock calls are non-reproducible and gate-hostile.

    Per user: ``recency_days`` = integer days since their last event
    (ns DIV 86400e9 — integer division; epoch-ns exceeds double's exact
    range), ``frequency`` = event count, ``monetary`` = exact scaled-long
    fold of ``value_col`` (4dp). Scores are ``ntile(n_bins)`` with HIGHER
    = better: ordered so the most recent / most frequent / highest-spend
    users land in tile ``n_bins``. Every ORDER BY carries the user id as
    the final key — a total order, so tile boundaries are deterministic
    in any engine (SQL-standard ntile: the first n%k tiles take the extra
    row). ``segment`` packs the three digits (r*100 + f*10 + m).

    Scale shape: ONE user-keyed aggregation over the event stream, then
    three rank windows over USER-cardinality rows. The windows are
    single-partition (a global ranking is inherently so); for web-scale
    user populations swap ntile for a two-pass quantile-threshold join —
    the census here is the exact, gateable form.

    Output: (user_col, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment)."""
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    from pyspark.sql import Window

    from kadiyadb_spark.functions.num import round4_expr

    tsn = ts_ns_expr(events.schema[ts_col].dataType, ts_col)
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            tsn.alias("_tsn"),
            F.col(value_col).alias("_v"),
        )
        .filter(F.col("_tsn").isNotNull())
        .groupBy("_u")
        .agg(
            F.max("_tsn").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("_v").cast("double") * 10000).cast("long")).alias(
                "_m4i"
            ),
        )
        .select(
            "_u",
            F.expr(f"CAST(({now_ts} - _last) DIV {86400 * 10**9} AS LONG)").alias(
                "recency_days"
            ),
            "frequency",
            "_m4i",
        )
    )
    u = F.col("_u")
    r_w = Window.orderBy(F.col("recency_days").desc(), u.desc())
    f_w = Window.orderBy(F.col("frequency").asc(), u.asc())
    m_w = Window.orderBy(F.col("_m4i").asc(), u.asc())
    scored = per_user.select(
        u.alias(user_col),
        "recency_days",
        "frequency",
        round4_expr(F.col("_m4i") / F.lit(10000.0)).alias("monetary"),
        F.ntile(n_bins).over(r_w).cast("long").alias("r_score"),
        F.ntile(n_bins).over(f_w).cast("long").alias("f_score"),
        F.ntile(n_bins).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "long"
        ),
    )


def active_user_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    window_days: int = 7,
    day_ns: int = 86_400 * 10**9,
) -> DataFrame:
    """Daily engagement census: per calendar day, DAU (distinct active
    users), the trailing-window active users (WAU at ``window_days=7``,
    MAU at 30) and the stickiness ratio DAU/WAU — the health metric every
    product dashboard opens with. Days are integer DIV on the normalized
    event time (timezone-free, no calendar functions).

    The sliding distinct count is computed EXACTLY without a per-day
    re-scan: each (user, active-day) pair — already deduplicated, the
    cohort_retention shuffle — contributes coverage to the ``window_days``
    days it keeps the user "active", via one generated integer sequence;
    a second distinct collapses overlapping contributions from nearby
    active days. Engine-free throughout: integer day math, integer
    counts, ONE division for the ratio. Cost bound: coverage explodes
    user-days x window_days rows — linear in activity, never
    days x users; output days are restricted to days with any activity.

    Output: (day, dau, window_active, stickiness), day = epoch-day index.
    """
    if window_days < 1:
        raise ValueError(f"need window_days >= 1, got {window_days}")
    from kadiyadb_spark.functions.num import round4_expr

    tsn = ts_ns_expr(events.schema[ts_col].dataType, ts_col)
    from pyspark import StorageLevel

    # (user, day) feeds both the DAU census and the coverage explosion —
    # persist so the distinct shuffle runs once
    act = (
        events.select(F.col(user_col).alias("_u"), tsn.alias("_tsn"))
        .filter(F.col("_tsn").isNotNull())
        .select("_u", F.expr(f"CAST(_tsn DIV {day_ns} AS LONG)").alias("_day"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dau = act.groupBy("_day").agg(F.count(F.lit(1)).alias("dau"))
    cov = (
        act.select(
            "_u",
            F.explode(
                F.sequence(F.col("_day"), F.col("_day") + F.lit(window_days - 1))
            ).alias("_day"),
        )
        .distinct()
        .groupBy("_day")
        .agg(F.count(F.lit(1)).alias("window_active"))
    )
    return (
        dau.join(cov, "_day")
        .select(
            F.col("_day").alias("day"),
            "dau",
            "window_active",
            round4_expr(
                F.col("dau").cast("double") / F.col("window_active").cast("double")
            ).alias("stickiness"),
        )
    )


def attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    model: str = "last",
    lookback: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Marketing attribution census: credit each CONVERSION event to the
    user's ``model="last"`` (most recent strictly-earlier) or
    ``model="first"`` (earliest) touch event — which channel gets the
    purchase. ``lookback`` (same units as the normalized ts; last-touch
    only) voids credit when the carried touch is older than the window:
    if the LAST touch is stale, every earlier one is too, so the carried
    value is exactly the right thing to test — the identity that lets
    last-touch-with-lookback ride the same single window. First-touch
    means first EVER (a lookback would contradict it; combining raises).

    One user-keyed window over the totally-ordered timeline (ts, then
    ``id_col`` — equal-ts determinism, the path_transitions device) with
    a strictly-before frame (rows up to -1): the carried touch is a
    positional ignore-nulls pick, never a join — the asof-join shape
    collapsed into the timeline scan. The oracle cross-checks with a
    correlated argmax subquery: two algorithms, one answer. Conversions
    with no prior touch credit '(none)'.

    Output: (touch, conversions, share), share = one long/long division
    at 4dp."""
    if model not in ("last", "first"):
        raise ValueError(f"model must be 'last' or 'first', got {model!r}")
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError("conversion_type must not be a touch type")
    if lookback is not None:
        if model != "last":
            raise ValueError("lookback applies to last-touch only")
        if lookback <= 0:
            raise ValueError(f"lookback must be positive, got {lookback}")
    from pyspark.sql import Window

    from kadiyadb_spark.functions.num import round4_expr

    tsn = ts_ns_expr(events.schema[ts_col].dataType, ts_col)
    tl = events.select(
        F.col(user_col).alias("_u"),
        tsn.alias("_tsn"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_et"),
    ).filter(
        F.col("_tsn").isNotNull()
        & F.col("_et").isin(*touch_types, conversion_type)
    )
    w = (
        Window.partitionBy("_u")
        .orderBy(F.col("_tsn").asc(), F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("_et").isin(*touch_types),
        F.struct(F.col("_tsn").alias("ts"), F.col("_et").alias("et")),
    )
    carried = (
        F.last(touch, ignorenulls=True).over(w)
        if model == "last"
        else F.first(touch, ignorenulls=True).over(w)
    )
    conv = tl.select("_et", "_tsn", carried.alias("_t")).filter(
        F.col("_et") == conversion_type
    )
    credit = F.col("_t.et")
    if lookback is not None:
        credit = F.when(F.col("_tsn") - F.col("_t.ts") <= lookback, credit)
    per_touch = (
        conv.select(F.coalesce(credit, F.lit("(none)")).alias("touch"))
        .groupBy("touch")
        .agg(F.count(F.lit(1)).alias("conversions"))
    )
    total = per_touch.agg(F.sum("conversions").alias("_total"))
    return per_touch.crossJoin(F.broadcast(total)).select(
        "touch",
        "conversions",
        round4_expr(
            F.col("conversions").cast("double") / F.col("_total").cast("double")
        ).alias("share"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each key's
    timeline into validity intervals over ``attr_col`` — one row per
    consecutive RUN of the same attribute value, carrying
    ``[valid_from, valid_to)`` and a 1-based ``version``; the current run
    has ``valid_to`` NULL. The warehouse primitive that turns an event/CDC
    stream into a dimension history you can as-of join against.

    This is the VALUE-CHANGE islands problem (sessionize is the TIME-GAP
    variant): change flag = attr differs from lag(attr), version = running
    sum of flags, then one fold per (key, version) and lead(valid_from)
    closes each interval. Ties in ``ts_col`` order break on
    ``order_cols`` (give the event id; a non-total order would make runs
    engine-dependent).

    Scale shape: ONE key-partitioned window Exchange; the (key, version)
    groupBy and the closing lead() window are both sub-partitionings of
    the same key distribution, so Catalyst adds no further shuffle
    (HashPartitioning(key) satisfies their clustering). Per-key window
    state is O(1)/row (lag + running sum). Output is runs, not rows —
    at most the input size, typically far smaller.

    Output: (key_col, attr_col, version, valid_from, valid_to, n_rows).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    # NULL-SAFE change test (r10 ADVICE): `lag.isNull() | (lag != attr)` is
    # NULL->0 when attr goes non-null -> NULL, silently merging NULL-attr
    # rows into the preceding run while NULL -> value DOES open one —
    # asymmetric and diverging from the oracle's IS DISTINCT FROM. A run is
    # now any maximal stretch of eqNullSafe-equal attrs (all-NULL runs are
    # first-class versions); row 1 opens its run explicitly since
    # eqNullSafe(NULL lag, NULL attr) would otherwise swallow it.
    chg = (
        (F.row_number().over(w) == 1)
        | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    ).cast("long")
    runs = (
        df.withColumn("_chg", chg)
        .withColumn("version", F.sum("_chg").over(w).cast("long"))
        .groupBy(key_col, "version")
        .agg(
            F.min(attr_col).alias(attr_col),  # constant within a run
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return runs.select(
        key_col,
        attr_col,
        "version",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_rows",
    )
