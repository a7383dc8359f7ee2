"""funnel_counts / cohort_retention — hand-computed goldens + plan shape."""

import pytest
from pyspark.sql import Row

from kadiyadb_spark.functions.analytics import cohort_retention, funnel_counts


def _r4(x):
    return None if x is None else round(x, 4)


def test_funnel_strictly_after_semantics(spark):
    """A completes the whole funnel; B's only view precedes their signup
    (order matters); C's view shares the signup's timestamp (strict >
    fails); D never signs up (excluded entirely)."""
    rows = [
        ("A", 1, "signup"), ("A", 2, "view"), ("A", 3, "click"), ("A", 4, "purchase"),
        ("B", 1, "view"), ("B", 2, "signup"),
        ("C", 5, "signup"), ("C", 5, "view"),
        ("D", 1, "view"), ("D", 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_type=e) for u, t, e in rows]
    )
    got = {
        r.stage: r
        for r in funnel_counts(ev, ["signup", "view", "click", "purchase"]).collect()
    }
    assert [got[s].users for s in (1, 2, 3, 4)] == [3, 1, 1, 1]
    assert got[1].conv_from_prev == 1.0
    assert _r4(got[2].conv_from_prev) == 0.3333  # 1/3
    assert got[3].conv_from_prev == 1.0 and got[4].conv_from_prev == 1.0
    assert _r4(got[4].conv_from_first) == 0.3333
    assert [got[s].step for s in (1, 2, 3, 4)] == [
        "signup", "view", "click", "purchase"
    ]

    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(ev, ["view", "view"])
    with pytest.raises(ValueError, match="at least one"):
        funnel_counts(ev, [])


def test_funnel_reuses_min_ts_chain_semantics(spark):
    """The greedy array scan equals the min-ts chain: a user with TWO
    signups takes the EARLIEST, maximizing later-stage eligibility."""
    rows = [
        ("X", 10, "signup"), ("X", 20, "signup"), ("X", 15, "view"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_type=e) for u, t, e in rows]
    )
    got = {r.stage: r.users for r in funnel_counts(ev, ["signup", "view"]).collect()}
    # view@15 is after the FIRST signup@10 -> stage 2 reached
    assert got == {1: 1, 2: 1}


def test_cohort_retention_day_math(spark):
    """Cohorts keyed by first active day (integer DIV); offsets count
    distinct users; retention = users/cohort_size."""
    rows = [("u1", 5), ("u1", 12), ("u1", 31), ("u2", 7), ("u3", 11), ("u3", 39)]
    ev = spark.createDataFrame([Row(user_id=u, ts_ns=t) for u, t in rows])
    got = {
        (r.cohort_day, r.day_offset): r
        for r in cohort_retention(ev, ts_col="ts_ns", day_ns=10).collect()
    }
    assert got[(0, 0)].active_users == 2 and got[(0, 0)].cohort_size == 2
    assert got[(0, 1)].active_users == 1 and got[(0, 1)].retention == 0.5
    assert got[(0, 3)].active_users == 1
    assert got[(1, 0)].active_users == 1 and got[(1, 0)].retention == 1.0
    assert got[(1, 2)].active_users == 1
    assert len(got) == 5
    # max_offset trims the tail
    trimmed = cohort_retention(ev, ts_col="ts_ns", day_ns=10, max_offset=1).collect()
    assert {(r.cohort_day, r.day_offset) for r in trimmed} == {(0, 0), (0, 1), (1, 0)}


def test_funnel_single_user_shuffle_plan(spark):
    """The per-user event collection is the only wide shuffle over event
    volume; everything after operates on the k-row stage census."""
    import re

    from tests.test_plans import n_shuffles, plan_str

    ev = spark.createDataFrame(
        [Row(user_id=f"u{i % 7}", ts_ns=i, event_type="signup") for i in range(50)]
    )
    plan = plan_str(funnel_counts(ev, ["signup", "view"]))
    # wide data passes exactly one Exchange before the census; the
    # stage-axis join/window add small exchanges over <= k rows only
    first_ex = re.search(r"\(\d+\) Exchange", plan)
    assert first_ex is not None
    assert "SortMergeJoin" not in plan  # census joins stay broadcast/tiny


def test_funnel_conversion_window_fixed_anchor(spark):
    """within: later stages must land within W of the FIRST stage-1
    event; the anchor never re-anchors to a later stage-1 occurrence."""
    rows = [
        # A converts inside the window
        ("A", 0, "signup"), ("A", 5, "view"),
        # B's view misses the window
        ("B", 0, "signup"), ("B", 20, "view"),
        # C has a second signup@30 that WOULD admit view@35, but the
        # anchor stays at the first signup@0 -> stage 1 only
        ("C", 0, "signup"), ("C", 30, "signup"), ("C", 35, "view"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_type=e) for u, t, e in rows]
    )
    got = {
        r.stage: r.users
        for r in funnel_counts(ev, ["signup", "view"], within=10).collect()
    }
    assert got == {1: 3, 2: 1}
    # without the window all three convert... except C: view@35 is after
    # signup@0, so C converts too
    got2 = {
        r.stage: r.users for r in funnel_counts(ev, ["signup", "view"]).collect()
    }
    assert got2 == {1: 3, 2: 3}

    with pytest.raises(ValueError, match="window"):
        funnel_counts(ev, ["signup", "view"], within=0)


def test_path_transitions_golden(spark):
    """Hand-computed hop census: consecutive pairs per user timeline,
    ts ties broken by event_id (total order)."""
    from kadiyadb_spark.functions.analytics import path_transitions

    rows = [
        # user A: view -> click -> purchase
        ("A", 1, 10, "view"), ("A", 2, 20, "click"), ("A", 3, 30, "purchase"),
        # user B: view -> click
        ("B", 1, 40, "view"), ("B", 2, 50, "click"),
        # user C: equal ts — event_id orders click(60) before view(61)
        ("C", 5, 60, "click"), ("C", 5, 61, "view"),
        # user D: single event, no hop
        ("D", 9, 70, "signup"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_id=i, event_type=e) for u, t, i, e in rows]
    )
    got = {
        (r.from_event, r.to_event): (r.transitions, r.users)
        for r in path_transitions(ev).collect()
    }
    assert got == {
        ("view", "click"): (2, 2),
        ("click", "purchase"): (1, 1),
        ("click", "view"): (1, 1),
    }


def test_path_transitions_two_exchange_plan(spark):
    """Exactly TWO Exchanges: the user-keyed window + the tiny final
    census. The per-user pre-census must reuse the window's hash(_u)
    partitioning (keys ⊇ partitioning), and the distinct-user count is a
    row count, never an Expand — windowing on a pre-aliased key is what
    keeps the partitioning alive once the raw column is projected away."""
    from tests.test_plans import n_shuffles, plan_str
    from kadiyadb_spark.functions.analytics import path_transitions

    ev = spark.createDataFrame(
        [
            Row(user_id=f"u{i % 5}", ts_ns=i, event_id=i, event_type=("view", "click")[i % 2])
            for i in range(40)
        ]
    )
    assert n_shuffles(plan_str(path_transitions(ev))) == 2


def test_funnel_time_stats_golden(spark):
    """Three users convert signup->view at deltas 1s, 2s, 4s (ns); one
    continues view->click at 10s. Greedy first-occurrence: the user with a
    second, earlier-gap view pair still measures from the FIRST chain."""
    from kadiyadb_spark.functions.analytics import funnel_time_stats

    S = 10**9
    rows = [
        ("A", 0, "signup"), ("A", 1 * S, "view"), ("A", 11 * S, "click"),
        ("B", 0, "signup"), ("B", 2 * S, "view"),
        ("C", 0, "signup"), ("C", 4 * S, "view"),
        # D views before signing up: never converts, contributes nothing
        ("D", 0, "view"), ("D", 1 * S, "signup"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_type=e) for u, t, e in rows]
    )
    got = {
        r.stage: r
        for r in funnel_time_stats(ev, ["signup", "view", "click"]).collect()
    }
    s2 = got[2]
    assert (s2.from_step, s2.to_step, s2.n_converted) == ("signup", "view", 3)
    # deltas 1,2,4: mean 7/3 s, type-7 p25=1.5 p50=2 p75=3
    assert s2.mean_s == round(7 / 3, 4)
    assert (s2.p25_s, s2.p50_s, s2.p75_s) == (1.5, 2.0, 3.0)
    s3 = got[3]
    assert (s3.n_converted, s3.p50_s, s3.mean_s) == (1, 10.0, 10.0)
    assert 4 not in got  # nobody purchased... and no stage-4 row appears

    with pytest.raises(ValueError):
        funnel_time_stats(ev, ["signup"])


def test_rfm_segments_golden(spark):
    """4 users, 2 bins: ntile splits 2/2 on each total-ordered metric;
    higher score = more recent / more frequent / higher spend."""
    from kadiyadb_spark.functions.analytics import rfm_segments

    D = 86400 * 10**9
    rows = [
        # user A: recent, frequent, big spender
        ("A", 9 * D, 100.0), ("A", 9 * D + 1, 100.0), ("A", 9 * D + 2, 100.0),
        # user B: recent-ish, 2 events, medium spend
        ("B", 8 * D, 50.0), ("B", 8 * D + 1, 10.0),
        # user C: stale, 2 events, small spend
        ("C", 1 * D, 5.0), ("C", 2 * D, 5.0),
        # user D: stale, single tiny event
        ("D", 0, 1.0),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, value=v) for u, t, v in rows]
    )
    got = {
        r.user_id: r
        for r in rfm_segments(ev, now_ts=10 * D, n_bins=2).collect()
    }
    assert got["A"].recency_days == 0 and got["D"].recency_days == 10
    assert (got["A"].frequency, got["A"].monetary) == (3, 300.0)
    assert (got["A"].r_score, got["A"].f_score, got["A"].m_score) == (2, 2, 2)
    assert got["A"].segment == 222
    assert (got["B"].r_score, got["B"].m_score) == (2, 2)  # 60 > C's 10, D's 1
    # freq ties B=C=2: ASC order (freq, id) puts D,B in tile 1 and C,A in 2
    assert (got["C"].r_score, got["C"].f_score) == (1, 2)
    assert got["B"].f_score == 1
    assert got["D"].segment == 111

    with pytest.raises(ValueError):
        rfm_segments(ev, now_ts=10 * D, n_bins=1)


def test_active_user_stats_sliding_distinct(spark):
    """Hand-computed coverage: A active days 0 and 2, B active day 2 only
    (two events — distinct first). With a 3-day window: WAU(0)={A},
    WAU(1)={A}, WAU(2)={A,B} (A's day-0 coverage still live), and A's two
    active days never double-count."""
    from kadiyadb_spark.functions.analytics import active_user_stats

    D = 86400 * 10**9
    ev = spark.createDataFrame(
        [
            Row(user_id="A", ts_ns=0),
            Row(user_id="A", ts_ns=2 * D + 5),
            Row(user_id="B", ts_ns=2 * D),
            Row(user_id="B", ts_ns=2 * D + 99),
        ]
    )
    got = {
        r.day: r
        for r in active_user_stats(ev, window_days=3).collect()
    }
    # only days WITH activity appear (0 and 2)
    assert set(got) == {0, 2}
    assert (got[0].dau, got[0].window_active, got[0].stickiness) == (1, 1, 1.0)
    assert (got[2].dau, got[2].window_active) == (2, 2)
    assert got[2].stickiness == 1.0

    import pytest as _pt

    with _pt.raises(ValueError, match="window_days"):
        active_user_stats(ev, window_days=0)


def test_attribution_last_and_first_touch(spark):
    """Last-touch: purchase credits the most recent strictly-earlier
    touch; equal-ts touches with a LOWER event_id still count (total
    order); stale carries void under lookback; first-touch credits the
    earliest ever."""
    from kadiyadb_spark.functions.analytics import attribution

    rows = [
        # user A: view@1, click@5, purchase@6 -> last=click, first=view
        ("A", 1, 1, "view"), ("A", 5, 2, "click"), ("A", 6, 3, "purchase"),
        # user B: click@10 then purchase@10 with HIGHER id -> credited
        ("B", 10, 4, "click"), ("B", 10, 5, "purchase"),
        # user C: purchase with no prior touch -> (none)
        ("C", 7, 6, "purchase"),
        # user D: view@0, purchase@100 -> voided by lookback=50
        ("D", 0, 7, "view"), ("D", 100, 8, "purchase"),
    ]
    ev = spark.createDataFrame(
        [Row(user_id=u, ts_ns=t, event_id=i, event_type=e) for u, t, i, e in rows]
    )
    last = {
        r.touch: (r.conversions, r.share)
        for r in attribution(ev, ["view", "click"], "purchase", lookback=50).collect()
    }
    assert last == {"click": (2, 0.5), "(none)": (2, 0.5)}
    first = {
        r.touch: r.conversions
        for r in attribution(ev, ["view", "click"], "purchase", model="first").collect()
    }
    assert first == {"view": (2), "click": 1, "(none)": 1}

    with pytest.raises(ValueError, match="lookback"):
        attribution(ev, ["view"], "purchase", model="first", lookback=5)
    with pytest.raises(ValueError, match="touch type"):
        attribution(ev, ["purchase"], "purchase")


def test_scd2_intervals_golden(spark):
    from kadiyadb_spark.functions.analytics import scd2_intervals

    rows = [
        # user 1: A A B A  -> 3 runs
        (1, 10, "A", 100), (1, 11, "A", 200), (1, 12, "B", 300), (1, 13, "A", 400),
        # user 2: single run, stays current
        (2, 20, "X", 150), (2, 21, "X", 250),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, attr string, ts long")
    got = {
        (r["user_id"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["n_rows"])
        for r in scd2_intervals(df, "user_id", "attr", "ts", order_cols=["event_id"]).collect()
    }
    assert got[(1, 1)] == ("A", 100, 300, 2)
    assert got[(1, 2)] == ("B", 300, 400, 1)
    assert got[(1, 3)] == ("A", 400, None, 1)   # current run: open interval
    assert got[(2, 1)] == ("X", 150, None, 2)
    assert len(got) == 4


def test_scd2_intervals_tie_break_total_order(spark):
    from kadiyadb_spark.functions.analytics import scd2_intervals

    # same ts: event_id orders the run boundaries deterministically
    rows = [(1, 2, "B", 100), (1, 1, "A", 100), (1, 3, "A", 100)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, attr string, ts long")
    out = scd2_intervals(df, "user_id", "attr", "ts", order_cols=["event_id"]).collect()
    seq = [(r["version"], r["attr"], r["n_rows"]) for r in sorted(out, key=lambda r: r["version"])]
    assert seq == [(1, "A", 1), (2, "B", 1), (3, "A", 1)]


def test_scd2_single_exchange_plan(spark):
    from kadiyadb_spark.functions.analytics import scd2_intervals

    df = spark.createDataFrame([(1, 1, "A", 1)], "user_id long, event_id long, attr string, ts long")
    plan = (
        scd2_intervals(df, "user_id", "attr", "ts", order_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the run fold and interval-closing window reuse the user_id
    # distribution: exactly ONE hash-partition Exchange in the plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_intervals_null_attr_runs_null_safe(spark):
    """r10 ADVICE: NULL-attr rows form first-class runs under eqNullSafe
    semantics — value -> NULL opens a run (previously swallowed) and
    NULL -> value opens one, symmetrically; an all-NULL leading run
    survives as version 1 with attr NULL."""
    from kadiyadb_spark.functions.analytics import scd2_intervals

    rows = [
        (1, 10, "A", 100), (1, 11, None, 200), (1, 12, None, 300), (1, 13, "A", 400),
        (2, 20, None, 150), (2, 21, "X", 250),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, attr string, ts long")
    got = {
        (r["user_id"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["n_rows"])
        for r in scd2_intervals(df, "user_id", "attr", "ts", order_cols=["event_id"]).collect()
    }
    assert got[(1, 1)] == ("A", 100, 200, 1)
    assert got[(1, 2)] == (None, 200, 400, 2)   # NULL run is its own version
    assert got[(1, 3)] == ("A", 400, None, 1)
    assert got[(2, 1)] == (None, 150, 250, 1)   # leading NULL run = version 1
    assert got[(2, 2)] == ("X", 250, None, 1)
    assert len(got) == 5
