"""DuckDB oracle SQL for the driver correctness gate — series reads: range fetch, rates, windows, anomaly bands, binops, agg_by.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    SEC,
    DUR,
    RES,
    T0,
    T_END,
    WEEK0,
    WEEK1,
    _EV_CUBE,
    _fetch_oracle,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["fetch_exact"] = _fetch_oracle("click", "7", T0, T_END, 2)
    o["fetch_wildcard"] = _fetch_oracle("click", "*", WEEK0, WEEK1, 2)
    o["fetch_rollup_prefix"] = _fetch_oracle("purchase", None, WEEK0, WEEK1, 1)
    o["fetch_rate"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, total FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
d AS (
  SELECT f1, f2, bucket, total,
         total - lag(total) OVER (PARTITION BY f1, f2 ORDER BY bucket) AS delta
  FROM base
)
SELECT f1, f2, bucket, total,
       floor((delta) * 10000 + 0.5) / 10000 AS delta,
       floor((delta / 60.0) * 10000 + 0.5) / 10000 AS rate_per_sec
FROM d
"""
    o["fetch_in"] = _fetch_oracle(["click", "error"], "*", WEEK0, WEEK1, 2)

    # PromQL absent(): slots in the 1-day window where (error, user 7) has
    # no point — dense generated spine anti-joined against present buckets
    _abs_to = WEEK0 + 24 * 3600 * SEC
    o["fetch_absent"] = f"""
WITH present AS (
  SELECT DISTINCT (epoch_ns(ts) // {RES}) * {RES} AS bucket
  FROM events
  WHERE event_type = 'error' AND CAST(user_id AS VARCHAR) = '7'
    AND epoch_ns(ts) >= {WEEK0} AND epoch_ns(ts) < {_abs_to}
)
SELECT CAST(g AS BIGINT) AS bucket, CAST(1 AS INT) AS absent
FROM generate_series({WEEK0}, {_abs_to - RES}, {RES}) t(g)
WHERE g NOT IN (SELECT bucket FROM present)
"""
    # anchored Re matcher: regexp_full_match twins Spark's ^(?:…)$ rlike
    o["fetch_regex"] = _fetch_oracle({"re": "cl.*|sign.*"}, "*", WEEK0, WEEK1, 2)

    # rule-evaluation batch: sparse per-pattern selects UNION ALL'd with a
    # query label — the Spark side answers all three from ONE shared scan
    _mq = (
        "SELECT '{name}' AS query, epoch, f1, f2, bucket,"
        " floor(total * 10000 + 0.5) / 10000 AS total, cnt"
        " FROM cube2 WHERE {cond}"
        f" AND bucket >= {WEEK0} AND bucket < {WEEK1}"
    )
    o["fetch_multi"] = f"""
WITH {_EV_CUBE}
{_mq.format(name="clicks", cond="f1 = 'click'")}
UNION ALL
{_mq.format(name="errs", cond="f1 = 'error'")}
UNION ALL
{_mq.format(name="c_or_s", cond="regexp_full_match(f1, 'c.*|sign.*')")}
"""

    # mixed-depth batch (VERDICT r09 item 7): the depth-1 query reads
    # cube1 with f2 NULL-cast — rectangular schema at the batch max depth
    _mq1 = (
        "SELECT '{name}' AS query, epoch, f1, CAST(NULL AS VARCHAR) AS f2,"
        " bucket, floor(total * 10000 + 0.5) / 10000 AS total, cnt"
        " FROM cube1 WHERE {cond}"
        f" AND bucket >= {WEEK0} AND bucket < {WEEK1}"
    )
    o["fetch_multi_mixed"] = f"""
WITH {_EV_CUBE}
{_mq1.format(name="all_clicks", cond="f1 = 'click'")}
UNION ALL
{_mq.format(name="clicks_by_user", cond="f1 = 'click'")}
UNION ALL
{_mq.format(name="err_user_7", cond="f1 = 'error' AND f2 = '7'")}
"""

    # Rule-group replay: one islands CTE per rule over its sparse cube
    # slice (absent slots cannot breach an above-threshold rule, so run
    # consecutiveness over observed buckets equals the dense evaluation),
    # UNION ALL'd with the rule name as the query label.
    _rg2 = """
SELECT '{name}' AS query, f1, f2,
       min(bucket) AS pending_start,
       min(bucket) + {fm1} * {res} AS firing_start,
       max(bucket) + {res} AS run_end,
       CAST(count(*) AS BIGINT) AS n_slots,
       max(t4) / 10000.0 AS peak
FROM (
  SELECT f1, f2, bucket, t4,
         bucket // {res} - row_number() OVER (PARTITION BY f1, f2 ORDER BY bucket) AS run
  FROM (
    SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
    FROM cube2
    WHERE {cond} AND bucket >= {lo} AND bucket < {hi}
  ) WHERE t4 >= {thr4}
) GROUP BY f1, f2, run HAVING count(*) >= {fs}"""
    _rg1 = """
SELECT '{name}' AS query, f1, CAST(NULL AS VARCHAR) AS f2,
       min(bucket) AS pending_start,
       min(bucket) + {fm1} * {res} AS firing_start,
       max(bucket) + {res} AS run_end,
       CAST(count(*) AS BIGINT) AS n_slots,
       max(t4) / 10000.0 AS peak
FROM (
  SELECT f1, bucket, t4,
         bucket // {res} - row_number() OVER (PARTITION BY f1 ORDER BY bucket) AS run
  FROM (
    SELECT f1, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
    FROM cube1
    WHERE {cond} AND bucket >= {lo} AND bucket < {hi}
  ) WHERE t4 >= {thr4}
) GROUP BY f1, run HAVING count(*) >= {fs}"""
    o["fetch_rule_group"] = f"""
WITH {_EV_CUBE}
{_rg2.format(name="hot_clicks", cond="f1 = 'click'", thr4=500000, fs=1, fm1=0, res=RES, lo=WEEK0, hi=WEEK1)}
UNION ALL
{_rg2.format(name="hot_purchase", cond="f1 = 'purchase'", thr4=1000000, fs=1, fm1=0, res=RES, lo=WEEK0, hi=WEEK1)}
UNION ALL
{_rg1.format(name="view_surge", cond="f1 = 'view'", thr4=600000, fs=2, fm1=1, res=RES, lo=WEEK0, hi=WEEK1)}
"""

    # sql_rule_group: the SAME rule-group evaluation (identical fragments)
    # wrapped in the BI-style per-(query, f1) summary the SQL-view entry
    # computes on top of the registered view.
    o["sql_rule_group"] = f"""
WITH {_EV_CUBE},
rg AS (
{_rg2.format(name="hot_clicks", cond="f1 = 'click'", thr4=500000, fs=1, fm1=0, res=RES, lo=WEEK0, hi=WEEK1)}
UNION ALL
{_rg2.format(name="hot_purchase", cond="f1 = 'purchase'", thr4=1000000, fs=1, fm1=0, res=RES, lo=WEEK0, hi=WEEK1)}
UNION ALL
{_rg1.format(name="view_surge", cond="f1 = 'view'", thr4=600000, fs=2, fm1=1, res=RES, lo=WEEK0, hi=WEEK1)}
)
SELECT query, f1,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(n_slots) AS BIGINT) AS total_slots,
       max(peak) AS max_peak
FROM rg GROUP BY query, f1
"""

    # fetch_rule_group_low: the below + absent rule kinds (r13). Below
    # evaluates on the DENSE grid (zero-fill breaches t4 <= thr4); absent
    # fires where NO series matched the pattern (NULL series/peak).
    o["fetch_rule_group_low"] = f"""
WITH {_EV_CUBE}
SELECT 'quiet_views' AS query, f1, CAST(NULL AS VARCHAR) AS f2,
       min(bucket) AS pending_start,
       min(bucket) + 1 * {RES} AS firing_start,
       max(bucket) + {RES} AS run_end,
       CAST(count(*) AS BIGINT) AS n_slots,
       max(t4) / 10000.0 AS peak
FROM (
  SELECT f1, bucket, t4,
         bucket // {RES} - row_number() OVER (PARTITION BY f1 ORDER BY bucket) AS run
  FROM (
    -- per-EPOCH membership, fetch's densify rule (O2): a series
    -- zero-fills only over epochs where it was tracked
    SELECT g.f1 AS f1, g.b AS bucket, coalesce(c.t4, 0) AS t4
    FROM (SELECT f1, unnest(range(greatest(epoch, {WEEK0}),
                                  least(epoch + {DUR}, {WEEK1}), {RES})) AS b
          FROM (SELECT DISTINCT f1, epoch FROM cube1
                WHERE f1 = 'view' AND bucket >= {WEEK0} AND bucket < {WEEK1}) m) g
    LEFT JOIN (SELECT f1, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
               FROM cube1
               WHERE f1 = 'view' AND bucket >= {WEEK0} AND bucket < {WEEK1}) c
      ON c.f1 = g.f1 AND c.bucket = g.b
  ) WHERE t4 <= 400000
) GROUP BY f1, run HAVING count(*) >= 2
UNION ALL
SELECT 'missing_user7_clicks' AS query,
       CAST(NULL AS VARCHAR) AS f1, CAST(NULL AS VARCHAR) AS f2,
       min(b) AS pending_start,
       min(b) + 2 * {RES} AS firing_start,
       max(b) + {RES} AS run_end,
       CAST(count(*) AS BIGINT) AS n_slots,
       CAST(NULL AS DOUBLE) AS peak
FROM (
  SELECT b, b // {RES} - row_number() OVER (ORDER BY b) AS run
  FROM (SELECT unnest(range({WEEK0}, {WEEK1}, {RES})) AS b) g
  WHERE NOT EXISTS (SELECT 1 FROM cube2
                    WHERE f1 = 'click' AND f2 = '7' AND bucket = g.b)
) GROUP BY run HAVING count(*) >= 3
"""

    o["fetch_offset"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, total FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, bucket, total,
       floor((lag(total, 1440) OVER w) * 10000 + 0.5) / 10000 AS baseline,
       floor((total - lag(total, 1440) OVER w) * 10000 + 0.5) / 10000 AS offset_delta,
       floor((CASE WHEN lag(total, 1440) OVER w != 0
              THEN total / lag(total, 1440) OVER w END) * 10000 + 0.5) / 10000 AS offset_ratio
FROM base
WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
"""

    # group_left replay: depth-2 rows join their STORED depth-1 rollup
    # row on (f1, bucket) — write-time rollup exactness means the
    # denominator equals sum(children) exactly; one long/long division.
    o["fetch_group_share"] = f"""
WITH {_EV_CUBE}
SELECT c2.f1, c2.f2, c2.bucket,
       CAST(round(c2.total * 10000) AS BIGINT) / 10000.0 AS total,
       CAST(round(c1.total * 10000) AS BIGINT) / 10000.0 AS group_total,
       CASE WHEN CAST(round(c1.total * 10000) AS BIGINT) != 0 THEN
         floor((CAST(round(c2.total * 10000) AS BIGINT)
                / CAST(round(c1.total * 10000) AS BIGINT)::DOUBLE) * 10000 + 0.5) / 10000
       END AS group_share
FROM cube2 c2
JOIN cube1 c1 ON c1.f1 = c2.f1 AND c1.bucket = c2.bucket
WHERE c2.f1 = 'click' AND c2.bucket >= {WEEK0} AND c2.bucket < {WEEK1}
"""

    # irate replay: OBSERVED slots only (cnt > 0), reset-adjusted delta
    # against the previous observed slot, one fixed-order double division
    # chain (adj4/1e4 then /gap_sec) rounded 4dp; gap_slots by integer div.
    o["fetch_irate"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
  WHERE cnt > 0
),
d AS (
  SELECT f1, f2, bucket, t4,
         lag(t4) OVER w AS prev4, lag(bucket) OVER w AS pb
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
adj AS (
  SELECT f1, f2, bucket, t4, pb,
         CASE WHEN prev4 IS NULL THEN NULL
              WHEN t4 - prev4 < 0 THEN t4 ELSE t4 - prev4 END AS adj4
  FROM d
)
SELECT f1, f2, bucket,
       t4 / 10000.0 AS total,
       adj4 / 10000.0 AS idelta,
       floor((CAST(adj4 AS DOUBLE) / 10000.0
              / (CAST(bucket - pb AS DOUBLE) / 1000000000.0)) * 10000 + 0.5) / 10000
         AS irate_per_sec,
       (bucket - pb) // {RES} AS gap_slots
FROM adj
"""

    # Subquery replay: same reset-adjusted increase CTEs as
    # fetch_increase (baseline-less first slot folds as 0), step fold by
    # integer bucket arithmetic, trailing-window max over exact longs.
    o["fetch_subquery"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
d AS (
  SELECT f1, f2, bucket, t4, lag(t4) OVER w AS prev4
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
adj AS (
  SELECT f1, f2, bucket,
         CASE WHEN prev4 IS NULL THEN 0
              WHEN t4 - prev4 < 0 THEN t4 ELSE t4 - prev4 END AS adj4
  FROM d
),
st AS (
  SELECT f1, f2, bucket - bucket % {5 * RES} AS step,
         CAST(sum(adj4) AS BIGINT) AS inc4
  FROM adj GROUP BY 1, 2, 3
)
SELECT f1, f2, step AS bucket,
       inc4 / 10000.0 AS step_increase,
       max(inc4) OVER wr / 10000.0 AS subquery_max,
       CAST(count(*) OVER wr AS BIGINT) AS steps_in_range
FROM st
WINDOW wr AS (PARTITION BY f1, f2 ORDER BY step
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
"""

    o["fetch_increase"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
d AS (
  SELECT f1, f2, bucket, t4,
         lag(t4) OVER w AS prev4,
         t4 - lag(t4) OVER w AS d4
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
adj AS (
  SELECT f1, f2, bucket, t4, prev4,
         CASE WHEN prev4 IS NULL THEN NULL
              WHEN d4 < 0 THEN t4 ELSE d4 END AS adj4,
         prev4 IS NOT NULL AND d4 < 0 AS reset
  FROM d
)
SELECT f1, f2, bucket,
       t4 / 10000.0 AS total,
       adj4 / 10000.0 AS increase,
       sum(coalesce(adj4, 0)) OVER (PARTITION BY f1, f2 ORDER BY bucket) / 10000.0 AS cum_increase,
       reset
FROM adj
"""

    o["fetch_predict_linear"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, total, CAST(round(total * 10000) AS BIGINT) AS y4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
r0 AS (
  SELECT f1, f2, bucket, total, y4,
         CAST(row_number() OVER (PARTITION BY f1, f2 ORDER BY bucket) AS BIGINT) AS rn
  FROM base
),
r1 AS (
  SELECT f1, f2, bucket, total, rn,
         count(y4) OVER wf AS n,
         sum(y4) OVER wf AS sy,
         sum(rn * y4) OVER wf AS srny
  FROM r0
  WINDOW wf AS (PARTITION BY f1, f2 ORDER BY bucket
                ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT f1, f2, bucket, total, n, sy,
         srny - (rn - (n - 1)) * sy AS sxy,
         n * (n - 1) / 2 AS sx,
         n * (n - 1) * (2 * n - 1) / 6 AS sxx
  FROM r1
),
s AS (
  SELECT f1, f2, bucket, total, n, sy, sx,
         CASE WHEN n = 30 AND (n * sxx - sx * sx) != 0
              THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                   / (n * sxx - sx * sx) END AS slope4
  FROM c
)
SELECT f1, f2, bucket,
       floor(total * 10000 + 0.5) / 10000 AS total,
       floor((slope4 / 600000.0) * 10000 + 0.5) / 10000 AS deriv_per_sec,
       floor(((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               + slope4 * ((CAST(n - 1 AS DOUBLE) + 60.0) - sx / CAST(n AS DOUBLE)))
              / 10000.0) * 10000 + 0.5) / 10000 AS predicted
FROM s
"""

    o["fetch_resets"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
d AS (
  SELECT f1, f2, bucket, t4, lag(t4) OVER w AS prev4
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
e AS (
  SELECT f1, f2, bucket, t4,
         CASE WHEN prev4 IS NOT NULL AND t4 < prev4 THEN 1 ELSE 0 END AS is_reset,
         CASE WHEN prev4 IS NOT NULL AND t4 != prev4 THEN 1 ELSE 0 END AS is_change
  FROM d
)
SELECT f1, f2, bucket, t4 / 10000.0 AS total,
       CAST(sum(is_reset) OVER wf AS BIGINT) AS resets,
       CAST(sum(is_change) OVER wf AS BIGINT) AS changes
FROM e
WINDOW wf AS (PARTITION BY f1, f2 ORDER BY bucket
              ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
"""

    o["fetch_last_write"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4, cnt,
         CAST(row_number() OVER (PARTITION BY f1, f2 ORDER BY bucket) AS BIGINT) AS rn
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
c AS (
  SELECT f1, f2, bucket, t4, rn,
         last_value(CASE WHEN cnt > 0 THEN t4 END IGNORE NULLS) OVER wf AS l4,
         last_value(CASE WHEN cnt > 0 THEN rn END IGNORE NULLS) OVER wf AS lrn
  FROM base
  WINDOW wf AS (PARTITION BY f1, f2 ORDER BY bucket
                ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
)
SELECT f1, f2, bucket, t4 / 10000.0 AS total,
       l4 / 10000.0 AS last_total,
       rn - lrn AS slots_since_write
FROM c
"""

    o["fetch_gaps"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(bucket // {RES} AS BIGINT) AS slot
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
  WHERE cnt = 0
),
r AS (
  SELECT f1, f2, bucket, slot,
         slot - row_number() OVER (PARTITION BY f1, f2 ORDER BY bucket) AS run
  FROM base
)
SELECT f1, f2,
       min(bucket) AS gap_start,
       max(bucket) + {RES} AS gap_end,
       CAST(count(*) AS BIGINT) AS n_slots
FROM r
GROUP BY f1, f2, run
"""

    day1_hw = WEEK0 + 24 * 3600 * SEC
    o["fetch_holt_winters"] = f"""
WITH RECURSIVE base AS (
  SELECT f1, f2, bucket,
         CAST(floor(total * 10000 + 0.5) AS BIGINT) AS y4,
         CAST(row_number() OVER (PARTITION BY f1, f2 ORDER BY bucket) AS BIGINT) AS rn
  FROM ({_fetch_oracle("click", "*", WEEK0, day1_hw, 2)}) t
),
rec AS (
  SELECT b.f1, b.f2, b.rn, b.bucket, b.y4,
         b.y4 AS s4,
         coalesce(b2.y4 - b.y4, 0) AS b4
  FROM base b
  LEFT JOIN base b2 ON b2.f1 = b.f1 AND b2.f2 = b.f2 AND b2.rn = 2
  WHERE b.rn = 1
  UNION ALL
  -- every literal cast to DOUBLE: bare decimal literals are DECIMAL in
  -- DuckDB, whose exact arithmetic diverges from the kernel's float64 at
  -- floor(+0.5) boundaries
  SELECT f1, f2, rn, bucket, y4, s4_new,
         CAST(floor(0.1::DOUBLE * (s4_new - s4_prev)
                    + (1.0::DOUBLE - 0.1::DOUBLE) * b4_prev
                    + 0.5::DOUBLE) AS BIGINT) AS b4
  FROM (
    SELECT nb.f1, nb.f2, nb.rn, nb.bucket, nb.y4,
           r.s4 AS s4_prev, r.b4 AS b4_prev,
           CAST(floor(0.3::DOUBLE * nb.y4
                      + (1.0::DOUBLE - 0.3::DOUBLE) * (r.s4 + r.b4)
                      + 0.5::DOUBLE) AS BIGINT) AS s4_new
    FROM rec r
    JOIN base nb ON nb.f1 = r.f1 AND nb.f2 = r.f2 AND nb.rn = r.rn + 1
  ) step
)
SELECT f1, f2, bucket,
       y4 / 10000.0 AS total,
       s4 / 10000.0 AS smoothed,
       b4 / 10000.0 AS trend
FROM rec
"""

    o["fetch_quantile_window"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, bucket,
       t4 / 10000.0 AS total,
       quantile_cont(t4, 0.75) OVER wf / 10000.0 AS quantile,
       min(t4) OVER wf / 10000.0 AS min_total,
       max(t4) OVER wf / 10000.0 AS max_total
FROM base
WINDOW wf AS (PARTITION BY f1, f2 ORDER BY bucket
              ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
"""

    day6_sa = WEEK0 + 6 * 86400 * SEC
    o["fetch_seasonal_anomaly"] = f"""
WITH bl AS (
  SELECT f1, f2, CAST((bucket // {RES}) % 1440 AS BIGINT) AS slot_of_period,
         CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, day6_sa, 2)}) t
),
prof AS (
  SELECT f1, f2, slot_of_period,
         CAST(count(*) AS BIGINT) AS n,
         sum(x4) AS s1, sum(x4 * x4) AS s2, min(x4) AS m
  FROM bl GROUP BY f1, f2, slot_of_period
),
cur AS (
  SELECT f1, f2, bucket, CAST((bucket // {RES}) % 1440 AS BIGINT) AS slot_of_period,
         CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", day6_sa, WEEK1, 2)}) t
),
j AS (
  SELECT c.f1, c.f2, c.bucket, c.slot_of_period, c.x4, p.n, p.s1, p.s2, p.m
  FROM cur c LEFT JOIN prof p USING (f1, f2, slot_of_period)
),
e AS (
  SELECT f1, f2, bucket, slot_of_period, x4, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean4,
         (CAST(n AS DOUBLE) * CAST(s2 - 2 * m * s1 + n * m * m AS DOUBLE)
          - CAST(s1 - n * m AS DOUBLE) * CAST(s1 - n * m AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0::DOUBLE)) AS var4
  FROM j
),
z AS (
  SELECT f1, f2, bucket, slot_of_period, x4, n, mean4,
         CASE WHEN n >= 2 AND var4 > 0
              THEN floor(((CAST(x4 AS DOUBLE) - mean4) / sqrt(var4)) * 10000 + 0.5) / 10000
         END AS zr
  FROM e
)
SELECT f1, f2, bucket, x4 / 10000.0 AS total, slot_of_period,
       floor((CASE WHEN n >= 2 THEN mean4 / 10000.0 END) * 10000 + 0.5) / 10000 AS expected,
       zr AS zscore,
       coalesce(abs(zr) >= 3.0::DOUBLE, false) AS is_anomaly
FROM z
"""

    o["fetch_outlier_fences"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
c AS (
  SELECT f1, f2, bucket, x4,
         quantile_cont(x4, 0.25) OVER wf AS q1,
         quantile_cont(x4, 0.75) OVER wf AS q3,
         count(x4) OVER wf AS n
  FROM base
  WINDOW wf AS (PARTITION BY f1, f2 ORDER BY bucket
                ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
),
e AS (
  SELECT f1, f2, bucket, x4, q1, q3,
         CASE WHEN n = 60 THEN q1 - 1.5::DOUBLE * (q3 - q1) END AS lo,
         CASE WHEN n = 60 THEN q3 + 1.5::DOUBLE * (q3 - q1) END AS hi
  FROM c
)
SELECT f1, f2, bucket, x4 / 10000.0 AS total,
       floor((q1 / 10000.0) * 10000 + 0.5) / 10000 AS q1,
       floor((q3 / 10000.0) * 10000 + 0.5) / 10000 AS q3,
       floor((lo / 10000.0) * 10000 + 0.5) / 10000 AS lo_fence,
       floor((hi / 10000.0) * 10000 + 0.5) / 10000 AS hi_fence,
       coalesce(CAST(x4 AS DOUBLE) < lo OR CAST(x4 AS DOUBLE) > hi, false) AS is_outlier
FROM e
"""

    # MAD anomaly: n=60 -> middle 1-based positions 30/31; every median is
    # (a+b)/2.0 over exact operands (dyadic-halves); 0.6745 is the same
    # repr'd literal both engines; 3.5::DOUBLE (bare 3.5 parses DECIMAL)
    o["fetch_mad_anomaly"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
c AS (
  SELECT f1, f2, bucket, x4,
         list(x4) OVER (PARTITION BY f1, f2 ORDER BY bucket
                        ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING) AS arr
  FROM base
),
e AS (SELECT f1, f2, bucket, x4, len(arr) AS nn, list_sort(arr) AS s FROM c),
m AS (SELECT *, CAST(s[30] + s[31] AS DOUBLE) / 2.0::DOUBLE AS med FROM e),
d AS (SELECT *,
             list_sort(list_transform(s, v -> abs(CAST(v AS DOUBLE) - med))) AS ds
      FROM m),
f AS (SELECT *, (ds[30] + ds[31]) / 2.0::DOUBLE AS mad FROM d),
z AS (
  SELECT *,
         CASE WHEN nn = 60 AND mad > 0
              THEN floor((CAST('0.6745' AS DOUBLE)
                          * (CAST(x4 AS DOUBLE) - med) / mad) * 10000 + 0.5) / 10000
         END AS zr
  FROM f
)
SELECT f1, f2, bucket, x4 / 10000.0 AS total,
       floor((CASE WHEN nn = 60 THEN med / 10000.0 END) * 10000 + 0.5) / 10000 AS baseline_median,
       floor((CASE WHEN nn = 60 THEN mad / 10000.0 END) * 10000 + 0.5) / 10000 AS mad,
       zr AS rzscore,
       coalesce(abs(zr) >= 3.5::DOUBLE, false) AS is_anomaly
FROM z
"""

    o["fetch_seasonal"] = f"""
WITH base AS (
  SELECT f1, f2, CAST((bucket // {RES}) % 1440 AS BIGINT) AS slot_of_period, total
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, slot_of_period,
       count(*) AS n_periods,
       floor((sum(CAST(round(total * 10000) AS BIGINT)) / (10000.0 * count(total))) * 10000 + 0.5) / 10000 AS mean_total,
       floor((min(total)) * 10000 + 0.5) / 10000 AS min_total,
       floor((max(total)) * 10000 + 0.5) / 10000 AS max_total
FROM base
GROUP BY f1, f2, slot_of_period
"""

    o["histogram_quantile"] = f"""
WITH b AS (
  SELECT event_type, (epoch_ns(ts) // {24 * 3600 * SEC}) * {24 * 3600 * SEC} AS day,
         CASE WHEN value <= 1.0 THEN 1.0 WHEN value <= 5.0 THEN 5.0
              WHEN value <= 10.0 THEN 10.0 WHEN value <= 50.0 THEN 50.0
              WHEN value <= 100.0 THEN 100.0
              ELSE CAST('infinity' AS DOUBLE) END AS le,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
),
w AS (
  SELECT event_type, day, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type, day ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, day) AS tot,
         coalesce(lag(le) OVER (PARTITION BY event_type, day ORDER BY le), 0.0) AS prev_le
  FROM b
),
sel AS (
  SELECT event_type, day, le, cnt, tot, prev_le, cum - cnt AS prev_cum,
         row_number() OVER (PARTITION BY event_type, day ORDER BY le ASC) AS rn
  FROM w
  WHERE tot > 0 AND CAST(cum AS DOUBLE) >= CAST(0.9 AS DOUBLE) * CAST(tot AS DOUBLE)
    AND cnt > 0
)
SELECT event_type, day, CAST(tot AS BIGINT) AS n_obs,
       floor((CASE WHEN isinf(le) THEN prev_le
              ELSE prev_le + (le - prev_le)
                   * (CAST(0.9 AS DOUBLE) * CAST(tot AS DOUBLE) - CAST(prev_cum AS DOUBLE))
                   / CAST(cnt AS DOUBLE) END) * 10000 + 0.5) / 10000 AS quantile
FROM sel WHERE rn = 1
"""

    # histogram_fraction: per-bucket overlap contribution, one double
    # expression over exact counts quantized at 4dp, scaled-long fold,
    # one final division — mirrors query.histogram_fraction exactly
    o["fetch_histogram_fraction"] = f"""
WITH b AS (
  SELECT event_type, (epoch_ns(ts) // {24 * 3600 * SEC}) * {24 * 3600 * SEC} AS day,
         CASE WHEN value <= 1.0 THEN 1.0 WHEN value <= 5.0 THEN 5.0
              WHEN value <= 10.0 THEN 10.0 WHEN value <= 50.0 THEN 50.0
              WHEN value <= 100.0 THEN 100.0
              ELSE CAST('infinity' AS DOUBLE) END AS le,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
),
w AS (
  SELECT event_type, day, le, cnt,
         lag(le) OVER (PARTITION BY event_type, day ORDER BY le) AS prev_le,
         coalesce(lag(le) OVER (PARTITION BY event_type, day ORDER BY le), 0.0) AS lower
  FROM b
),
c AS (
  SELECT event_type, day, cnt,
         CASE WHEN prev_le IS NULL AND le <= 0
              -- point mass at le (histogram_quantile's non-positive-first
              -- rule; the 0-lower width would be negative)
              THEN CASE WHEN le >= 5.0::DOUBLE AND le <= 50.0::DOUBLE
                        THEN CAST(floor(CAST(cnt AS DOUBLE) * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
                        ELSE 0 END
              WHEN NOT isinf(le) AND le - lower > 0
              THEN CAST(floor(CAST(cnt AS DOUBLE)
                    * (greatest(0.0::DOUBLE,
                                least(50.0::DOUBLE, le) - greatest(5.0::DOUBLE, lower))
                       / (le - lower))
                    * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
              ELSE 0 END AS c4
  FROM w
)
SELECT event_type, day, CAST(sum(cnt) AS BIGINT) AS n_obs,
       floor(((CAST(sum(c4) AS BIGINT) / 10000.0) / CAST(sum(cnt) AS DOUBLE)) * 10000 + 0.5) / 10000 AS fraction
FROM c GROUP BY 1, 2 HAVING sum(cnt) > 0
"""

    o["fetch_smooth"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, total FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, bucket, total,
       floor((sum(CAST(round((total) * 10000) AS BIGINT)) OVER w
              / (10000.0 * count(total) OVER w)) * 10000 + 0.5) / 10000 AS smoothed
FROM base
WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""

    o["fetch_topk_series"] = f"""
WITH {_EV_CUBE}
SELECT f1, f2,
       floor((sum(CAST(round((total) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS range_total,
       sum(cnt) AS range_cnt
FROM cube2
WHERE f1 = 'click' AND bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY f1, f2
ORDER BY range_total DESC, f1 ASC, f2 ASC
LIMIT 10
"""

    o["fetch_binop"] = f"""
WITH {_EV_CUBE}
SELECT bucket,
       sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS a_total,
       sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS b_total,
       (sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END)
        - sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END)) / 10000.0 AS value
FROM cube1
WHERE f1 IN ('click', 'error') AND bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY bucket
"""

    o["fetch_ratio"] = f"""
WITH {_EV_CUBE}
SELECT bucket,
       sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS num_total,
       sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS den_total,
       floor((CASE WHEN sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) != 0
              THEN sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END)
                   / sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) END) * 10000 + 0.5) / 10000 AS ratio
FROM cube1
WHERE f1 IN ('error', 'click') AND bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY bucket
"""

    o["fetch_ratio_wildcard"] = f"""
WITH {_EV_CUBE}
SELECT f2, bucket,
       sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS num_total,
       sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) / 10000.0 AS den_total,
       floor((CASE WHEN sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) != 0
              THEN sum(CASE WHEN f1 = 'error' THEN CAST(round((total) * 10000) AS BIGINT) END)
                   / sum(CASE WHEN f1 = 'click' THEN CAST(round((total) * 10000) AS BIGINT) END) END) * 10000 + 0.5) / 10000 AS ratio
FROM cube2
WHERE f1 IN ('error', 'click') AND bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY f2, bucket
"""

    o["fetch_downsample"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, floor(total * 10000 + 0.5) / 10000 AS total, cnt
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, bucket - bucket % {10 * RES} AS bucket,
       floor((sum(CAST(round((total) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total,
       floor((CAST(sum(CAST(round(cnt) AS BIGINT)) AS BIGINT) / 1.0) * 10000 + 0.5) / 10000 AS cnt,
       floor((min(total)) * 10000 + 0.5) / 10000 AS min_total,
       floor((max(total)) * 10000 + 0.5) / 10000 AS max_total,
       CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_observed
FROM base
GROUP BY f1, f2, 3
"""

    # mirror of series_alerts: scaled-long condition + integer
    # gaps-and-islands (slot - per-series rank constant within a run)
    o["fetch_alerts"] = f"""
WITH base AS (
  SELECT f1, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", None, WEEK0, WEEK1, 1)}) t
),
br AS (
  SELECT f1, bucket, t4, bucket // {RES} AS slot
  FROM base WHERE t4 >= 100
),
r AS (
  SELECT f1, bucket, t4,
         slot - row_number() OVER (PARTITION BY f1 ORDER BY bucket) AS run
  FROM br
)
SELECT f1,
       min(bucket) AS pending_start,
       min(bucket) + {RES} AS firing_start,
       max(bucket) + {RES} AS run_end,
       CAST(count(*) AS BIGINT) AS n_slots,
       max(t4) / 10000.0 AS peak
FROM r GROUP BY f1, run
HAVING count(*) >= 2
"""

    # the streaming drain's final alert state must equal the batch rule
    # evaluation — same gaps-and-islands SQL as fetch_alerts
    o["streaming_alerts"] = o["fetch_alerts"]

    # engine-default-free mirror of series_stddev_over_time: population
    # variance over the trailing window INCLUDING the current slot
    o["fetch_stddev_window"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
st AS (
  SELECT f1, f2, bucket, x4,
         sum(x4)      OVER w AS s1,
         sum(x4 * x4) OVER w AS s2,
         lag(x4, 11)  OVER (PARTITION BY f1, f2 ORDER BY bucket) AS m,
         count(x4)    OVER w AS n
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
),
v AS (
  SELECT f1, f2, bucket, x4, n, s1,
         (CAST(n AS DOUBLE) * CAST(s2 - 2 * m * s1 + n * m * m AS DOUBLE)
          - CAST(s1 - n * m AS DOUBLE) * CAST(s1 - n * m AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var4
  FROM st
)
SELECT f1, f2, bucket,
       x4 / 10000.0 AS total,
       CASE WHEN n = 12
            THEN floor((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) * 10000 + 0.5) / 10000 END AS win_mean,
       CASE WHEN n = 12
            THEN floor((var4 / 100000000.0) * 10000 + 0.5) / 10000 END AS win_stdvar,
       CASE WHEN n = 12
            THEN floor((sqrt(var4) / 10000.0) * 10000 + 0.5) / 10000 END AS win_stddev
FROM v
"""

    # engine-default-free mirror of series_anomaly: exact long window sums
    # (S1, S2) re-centered about the window minimum via exact long
    # identities (flat -> exactly 0; conditioned on spread, not level),
    # then ONE double expression — z = (x4 - S1/n)/sqrt(var4)
    # CUSUM replay: same integers via the running-minimum identity —
    # HUGEINT window folds, q-scaled deviations (mu0 never a float), ONE
    # ::DOUBLE division at the end (bare-literal DECIMAL trap)
    o["fetch_cusum"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
st AS (
  SELECT f1, f2, bucket, x4,
         row_number() OVER w AS rn,
         sum(x4) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
sb AS (
  SELECT *, max(CASE WHEN rn = 12 THEN c1 END) OVER (PARTITION BY f1, f2) AS s1b
  FROM st
),
cp AS (
  SELECT f1, f2, bucket, x4, rn,
         CASE WHEN rn > 12 THEN 12 * (c1 - s1b) - (rn - 12) * s1b END AS cpos,
         CASE WHEN rn > 12 THEN -(12 * (c1 - s1b) - (rn - 12) * s1b) END AS cneg
  FROM sb
),
s AS (
  SELECT f1, f2, bucket, x4,
         cpos - least(0, min(cpos) OVER w) AS sp,
         cneg - least(0, min(cneg) OVER w) AS sn
  FROM cp
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT f1, f2, bucket, x4 / 10000.0 AS total,
       floor((CAST(sp AS DOUBLE) / 120000.0::DOUBLE) * 10000 + 0.5) / 10000 AS cusum_pos,
       floor((CAST(sn AS DOUBLE) / 120000.0::DOUBLE) * 10000 + 0.5) / 10000 AS cusum_neg,
       coalesce(sp > {12 * 50000} OR sn > {12 * 50000}, false) AS is_change
FROM s
"""

    o["fetch_anomaly"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS x4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
st AS (
  SELECT f1, f2, bucket, x4,
         sum(x4)      OVER w AS s1,
         sum(x4 * x4) OVER w AS s2,
         lag(x4, 12)  OVER (PARTITION BY f1, f2 ORDER BY bucket) AS m,
         count(x4)    OVER w AS n
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
),
v AS (
  SELECT f1, f2, bucket, x4, n, s1,
         (CAST(n AS DOUBLE) * CAST(s2 - 2 * m * s1 + n * m * m AS DOUBLE)
          - CAST(s1 - n * m AS DOUBLE) * CAST(s1 - n * m AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))) AS var4
  FROM st
),
z AS (
  SELECT f1, f2, bucket,
         x4 / 10000.0 AS total,
         CASE WHEN n = 12
              THEN floor((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) * 10000 + 0.5) / 10000 END AS baseline_mean,
         CASE WHEN n = 12 AND var4 > 0
              THEN floor(((CAST(x4 AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / sqrt(var4)) * 10000 + 0.5) / 10000 END AS zscore
  FROM v
)
SELECT f1, f2, bucket, total, baseline_mean, zscore,
       coalesce(abs(zscore) >= 2.0, false) AS is_anomaly
FROM z
"""

    o["fetch_interpolate"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, total, cnt FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
anch AS (
  SELECT f1, f2, bucket, cnt, total,
         last_value(CASE WHEN cnt > 0 THEN bucket END IGNORE NULLS)
           OVER (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
         last_value(CASE WHEN cnt > 0 THEN total END IGNORE NULLS)
           OVER (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         first_value(CASE WHEN cnt > 0 THEN bucket END IGNORE NULLS)
           OVER (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb,
         first_value(CASE WHEN cnt > 0 THEN total END IGNORE NULLS)
           OVER (PARTITION BY f1, f2 ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM base
)
SELECT f1, f2, bucket, cnt,
       floor((total) * 10000 + 0.5) / 10000 AS total,
       floor((CASE WHEN cnt > 0 THEN total
                   WHEN pb IS NOT NULL AND nb IS NOT NULL
                        THEN pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
                   ELSE total END) * 10000 + 0.5) / 10000 AS interpolated,
       (cnt = 0) AS was_gap
FROM anch
"""
    b = T0 + 3600 * SEC
    o["fetch_boundary"] = _fetch_oracle("click", "*", b - RES, b + RES, 2)
    o["fetch_sum_by"] = f"""
WITH {_EV_CUBE}
SELECT f2, bucket,
       floor((sum(CAST(round((total) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total,
       sum(cnt) AS cnt
FROM cube2
WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY f2, bucket
"""

    # stdvar/stddev mirror series_agg_by's exact-operand construction:
    # integer S1/S2 folds, then one double expression (n*S2 - S1^2)/n^2
    o["fetch_agg_by"] = f"""
WITH {_EV_CUBE},
g AS (
  SELECT f1, bucket,
         sum(CAST(round((total) * 10000) AS BIGINT)) AS s1,
         sum(CAST(round((total) * 10000) AS BIGINT)
             * CAST(round((total) * 10000) AS BIGINT)) AS s2,
         min(CAST(round((total) * 10000) AS BIGINT)) AS m4,
         min(total) AS mn, max(total) AS mx,
         count(total) AS cn,
         CAST(count(*) AS BIGINT) AS n_series,
         sum(cnt) AS cnt
  FROM cube2
  WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
  GROUP BY f1, bucket
),
v AS (
  SELECT *,
         (CAST(n_series AS DOUBLE) * CAST(s2 - 2 * m4 * s1 + n_series * m4 * m4 AS DOUBLE)
          - CAST(s1 - n_series * m4 AS DOUBLE) * CAST(s1 - n_series * m4 AS DOUBLE))
           / (CAST(n_series AS DOUBLE) * CAST(n_series AS DOUBLE)) AS var4
  FROM g
)
SELECT f1, bucket,
       floor((s1 / 10000.0) * 10000 + 0.5) / 10000 AS sum_total,
       floor((s1 / (10000.0 * cn)) * 10000 + 0.5) / 10000 AS avg_total,
       floor((mn) * 10000 + 0.5) / 10000 AS min_total,
       floor((mx) * 10000 + 0.5) / 10000 AS max_total,
       floor((var4 / 100000000.0) * 10000 + 0.5) / 10000 AS stdvar_total,
       floor((sqrt(var4) / 10000.0) * 10000 + 0.5) / 10000 AS stddev_total,
       n_series,
       cnt
FROM v
"""

    # burn-rate mirror: the (1 - slo) budget is the PYTHON-computed double
    # repr'd into both engines (DuckDB would parse a bare 0.01 as DECIMAL,
    # and 1 - 0.99 in double is not the decimal 0.01)
    o["fetch_burn_rate"] = f"""
WITH {_EV_CUBE},
g AS (
  SELECT bucket,
         sum(CASE WHEN f1 = 'error' THEN CAST(round(total * 10000) AS BIGINT) END) AS e4,
         sum(CASE WHEN f1 = 'click' THEN CAST(round(total * 10000) AS BIGINT) END) AS t4
  FROM cube1
  WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
  GROUP BY bucket
),
axis AS (SELECT unnest(range({WEEK0}, {WEEK1}, {RES})) AS bucket),
dense AS (
  SELECT a.bucket, coalesce(e4, 0) AS e4, coalesce(t4, 0) AS t4
  FROM axis a LEFT JOIN g USING (bucket)
),
w AS (
  SELECT bucket, e4, t4,
         sum(e4) OVER ws AS es, sum(t4) OVER ws AS ts, count(e4) OVER ws AS ns,
         sum(e4) OVER wl AS el, sum(t4) OVER wl AS tl, count(e4) OVER wl AS nl
  FROM dense
  WINDOW ws AS (ORDER BY bucket ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wl AS (ORDER BY bucket ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT bucket, e4, t4,
         CASE WHEN ns = 5 AND ts > 0
              THEN (CAST(es AS DOUBLE) / CAST(ts AS DOUBLE)) / CAST('{1.0 - 0.99!r}' AS DOUBLE) END AS bs,
         CASE WHEN nl = 60 AND tl > 0
              THEN (CAST(el AS DOUBLE) / CAST(tl AS DOUBLE)) / CAST('{1.0 - 0.99!r}' AS DOUBLE) END AS bl
  FROM w
)
SELECT bucket,
       e4 / 10000.0 AS err_total,
       t4 / 10000.0 AS req_total,
       floor(bs * 10000 + 0.5) / 10000 AS burn_short,
       floor(bl * 10000 + 0.5) / 10000 AS burn_long,
       coalesce(bs >= 100.0 AND bl >= 100.0, false) AS firing
FROM b
"""

    o["fetch_share"] = f"""
WITH {_EV_CUBE},
s AS (
  SELECT f1, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM cube1
  WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
),
t AS (
  SELECT f1, bucket, t4, sum(t4) OVER (PARTITION BY bucket) AS s4 FROM s
)
SELECT bucket, f1,
       t4 / 10000.0 AS total,
       s4 / 10000.0 AS slot_total,
       CASE WHEN s4 != 0
            THEN floor((CAST(t4 AS DOUBLE) / CAST(s4 AS DOUBLE)) * 10000 + 0.5) / 10000 END AS share
FROM t
"""

    o["fetch_remap"] = f"""
WITH {_EV_CUBE}
SELECT CASE WHEN f1 IN ('click', 'view') THEN 'engagement' ELSE f1 END AS f1,
       f2, bucket,
       floor((sum(CAST(round((total) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total,
       sum(cnt) AS cnt
FROM cube2
WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY 1, 2, 3
"""

    o["fetch_quantile_by"] = f"""
WITH {_EV_CUBE},
s AS (
  SELECT f1, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM cube2
  WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
)
SELECT f1, bucket,
       quantile_cont(t4, 0.5) / 10000.0 AS quantile,
       CAST(count(*) AS BIGINT) AS n_series
FROM s GROUP BY f1, bucket
"""

    o["fetch_topk_instant"] = f"""
WITH {_EV_CUBE},
s AS (
  SELECT bucket, f1, f2, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM cube2
  WHERE bucket >= {WEEK0} AND bucket < {WEEK0 + 6 * 3600 * SEC}
),
r AS (
  SELECT bucket, f1, f2, t4,
         row_number() OVER (PARTITION BY bucket ORDER BY t4 DESC, f1 ASC, f2 ASC) AS rk
  FROM s
)
SELECT bucket, CAST(rk AS BIGINT) AS rk, f1, f2, t4 / 10000.0 AS total
FROM r WHERE rk <= 3
"""

    o["fetch_count_values"] = f"""
WITH {_EV_CUBE},
s AS (
  SELECT bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM cube1
  WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
)
SELECT bucket, t4 / 10000.0 AS value, CAST(count(*) AS BIGINT) AS n_series
FROM s GROUP BY bucket, t4
"""

    # fetch_clamp: exact scaled-long least/greatest + per-bound flags,
    # mirroring series_clamp (lo=2.0 -> 20000, hi=50.0 -> 500000)
    o["fetch_clamp"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
)
SELECT f1, f2, bucket, t4 / 10000.0 AS total,
       least(greatest(t4, 20000), 500000) / 10000.0 AS clamped,
       CAST(CASE WHEN t4 < 20000 THEN 1 ELSE 0 END AS BIGINT) AS clamped_low,
       CAST(CASE WHEN t4 > 500000 THEN 1 ELSE 0 END AS BIGINT) AS clamped_high
FROM base
"""

    # fetch_backtest: identical lag construction; MAEs as floor(sum/n+0.5)
    # on exact BIGINT error sums; winner by integer sum comparison.
    o["fetch_backtest"] = f"""
WITH base AS (
  SELECT f1, f2, bucket, CAST(round(total * 10000) AS BIGINT) AS t4
  FROM ({_fetch_oracle("click", "*", WEEK0, WEEK1, 2)}) t
),
lags AS (
  SELECT f1, f2, t4,
         lag(t4, 1) OVER w AS l1,
         lag(t4, 60) OVER w AS lp
  FROM base
  WINDOW w AS (PARTITION BY f1, f2 ORDER BY bucket)
),
agg AS (
  SELECT f1, f2,
         CAST(count(*) FILTER (WHERE l1 IS NOT NULL AND lp IS NOT NULL)
              AS BIGINT) AS n_evals,
         CAST(sum(abs(t4 - l1)) FILTER (WHERE l1 IS NOT NULL AND lp IS NOT NULL)
              AS BIGINT) AS e1,
         CAST(sum(abs(t4 - lp)) FILTER (WHERE l1 IS NOT NULL AND lp IS NOT NULL)
              AS BIGINT) AS ep
  FROM lags GROUP BY f1, f2)
SELECT f1, f2, n_evals,
       CASE WHEN n_evals > 0
            THEN floor(e1 / CAST(n_evals AS DOUBLE) + 0.5) / 1e4 END AS mae_naive,
       CASE WHEN n_evals > 0
            THEN floor(ep / CAST(n_evals AS DOUBLE) + 0.5) / 1e4 END AS mae_seasonal,
       CASE WHEN n_evals = 0 THEN 'insufficient_history'
            WHEN ep < e1 THEN 'seasonal_naive' ELSE 'naive' END AS best_model
FROM agg
"""
    return o
