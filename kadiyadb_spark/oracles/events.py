"""DuckDB oracle SQL for the driver correctness gate — event analytics: funnels, cohorts, attribution, RFM, sessions, paths.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    SEC,
    _RFM_NOW,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # funnel time-to-convert: the SAME min-filter chain as funnel_counts,
    # extended with per-user deltas; quantile_cont over integer-ns deltas
    # at dyadic phis mirrors F.percentile bit-identically
    o["funnel_time"] = """
WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
u1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN u1 ON e.user_id = u1.user_id
       WHERE e.event_type = 'view' AND e.ts > u1.t1 GROUP BY e.user_id),
u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN u2 ON e.user_id = u2.user_id
       WHERE e.event_type = 'click' AND e.ts > u2.t2 GROUP BY e.user_id),
u4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM ev e JOIN u3 ON e.user_id = u3.user_id
       WHERE e.event_type = 'purchase' AND e.ts > u3.t3 GROUP BY e.user_id),
d AS (
  SELECT 2 AS stage, 'signup' AS from_step, 'view' AS to_step, u2.t2 - u1.t1 AS d
  FROM u2 JOIN u1 USING (user_id)
  UNION ALL
  SELECT 3, 'view', 'click', u3.t3 - u2.t2 FROM u3 JOIN u2 USING (user_id)
  UNION ALL
  SELECT 4, 'click', 'purchase', u4.t4 - u3.t3 FROM u4 JOIN u3 USING (user_id)
)
SELECT CAST(stage AS BIGINT) AS stage, from_step, to_step,
       CAST(count(*) AS BIGINT) AS n_converted,
       floor((CAST(sum(d) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000000.0::DOUBLE)) * 10000 + 0.5) / 10000 AS mean_s,
       floor((quantile_cont(d, 0.25) / 1000000000.0::DOUBLE) * 10000 + 0.5) / 10000 AS p25_s,
       floor((quantile_cont(d, 0.5) / 1000000000.0::DOUBLE) * 10000 + 0.5) / 10000 AS p50_s,
       floor((quantile_cont(d, 0.75) / 1000000000.0::DOUBLE) * 10000 + 0.5) / 10000 AS p75_s
FROM d GROUP BY stage, from_step, to_step
"""

    # attribution: the oracle is a CORRELATED ARGMAX (latest qualifying
    # touch per conversion) — a different algorithm than Spark's carried
    # window pick; equality is a real cross-check. Predecessor order is
    # lexicographic (tsn, event_id), mirroring the rows frame.
    o["attribution_last_touch"] = f"""
WITH ev AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn
            FROM events WHERE ts IS NOT NULL),
conv AS (SELECT user_id, event_id, tsn FROM ev WHERE event_type = 'purchase'),
cred AS (
  SELECT c.user_id, c.event_id,
         (SELECT t.event_type FROM ev t
          WHERE t.user_id = c.user_id
            AND t.event_type IN ('click', 'signup', 'view')
            AND (t.tsn < c.tsn OR (t.tsn = c.tsn AND t.event_id < c.event_id))
            AND c.tsn - t.tsn <= {24 * 3600 * SEC}
          ORDER BY t.tsn DESC, t.event_id DESC LIMIT 1) AS touch
  FROM conv c
),
pt AS (SELECT coalesce(touch, '(none)') AS touch,
              CAST(count(*) AS BIGINT) AS conversions
       FROM cred GROUP BY 1),
t AS (SELECT sum(conversions) AS total FROM pt)
SELECT touch, conversions,
       floor((CAST(conversions AS DOUBLE) / CAST(total AS DOUBLE)) * 10000 + 0.5) / 10000 AS share
FROM pt CROSS JOIN t
"""

    o["active_users"] = """
WITH act AS (
  SELECT DISTINCT user_id AS u,
         CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
  FROM events WHERE ts IS NOT NULL
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM act GROUP BY day),
cov AS (
  SELECT cday AS day, CAST(count(*) AS BIGINT) AS window_active
  FROM (SELECT DISTINCT u, unnest(range(day, day + 7)) AS cday FROM act)
  GROUP BY cday
)
SELECT dau.day, dau.dau, cov.window_active,
       floor((CAST(dau.dau AS DOUBLE) / CAST(cov.window_active AS DOUBLE))
             * 10000 + 0.5) / 10000 AS stickiness
FROM dau JOIN cov USING (day)
"""

    o["rfm_segments"] = f"""
WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, value FROM events
            WHERE ts IS NOT NULL),
pu AS (SELECT user_id, max(tsn) AS last_ts, CAST(count(*) AS BIGINT) AS frequency,
              sum(CAST(round(value * 10000) AS BIGINT)) AS m4i
       FROM ev GROUP BY user_id),
s AS (SELECT user_id,
             CAST(({_RFM_NOW} - last_ts) // {86400 * SEC} AS BIGINT) AS recency_days,
             frequency, m4i
      FROM pu),
t AS (SELECT user_id, recency_days, frequency, m4i,
             CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id DESC) AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY m4i ASC, user_id ASC) AS BIGINT) AS m_score
      FROM s)
SELECT user_id, recency_days, frequency,
       floor((m4i / 10000.0) * 10000 + 0.5) / 10000 AS monetary,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS segment
FROM t
"""

    o["funnel_counts"] = """
WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
u1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN u1 ON e.user_id = u1.user_id
       WHERE e.event_type = 'view' AND e.ts > u1.t1 GROUP BY e.user_id),
u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN u2 ON e.user_id = u2.user_id
       WHERE e.event_type = 'click' AND e.ts > u2.t2 GROUP BY e.user_id),
u4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM ev e JOIN u3 ON e.user_id = u3.user_id
       WHERE e.event_type = 'purchase' AND e.ts > u3.t3 GROUP BY e.user_id),
c AS (SELECT (SELECT count(*) FROM u1) AS c1, (SELECT count(*) FROM u2) AS c2,
             (SELECT count(*) FROM u3) AS c3, (SELECT count(*) FROM u4) AS c4)
SELECT 1 AS stage, 'signup' AS step, c1 AS users,
       CAST(1.0 AS DOUBLE) AS conv_from_prev,
       CASE WHEN c1 > 0 THEN floor((CAST(c1 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END AS conv_from_first
FROM c
UNION ALL
SELECT 2, 'view', c2,
       CASE WHEN c1 > 0 THEN floor((CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
UNION ALL
SELECT 3, 'click', c3,
       CASE WHEN c2 > 0 THEN floor((CAST(c3 AS DOUBLE) / CAST(c2 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c3 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
UNION ALL
SELECT 4, 'purchase', c4,
       CASE WHEN c3 > 0 THEN floor((CAST(c4 AS DOUBLE) / CAST(c3 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c4 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
"""

    o["funnel_windowed"] = """
WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
u1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
u2 AS (SELECT e.user_id, u1.t1, min(e.ts) AS t2 FROM ev e JOIN u1 ON e.user_id = u1.user_id
       WHERE e.event_type = 'view' AND e.ts > u1.t1 AND e.ts <= u1.t1 + 86400000000000
       GROUP BY e.user_id, u1.t1),
u3 AS (SELECT e.user_id, u2.t1, min(e.ts) AS t3 FROM ev e JOIN u2 ON e.user_id = u2.user_id
       WHERE e.event_type = 'click' AND e.ts > u2.t2 AND e.ts <= u2.t1 + 86400000000000
       GROUP BY e.user_id, u2.t1),
u4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM ev e JOIN u3 ON e.user_id = u3.user_id
       WHERE e.event_type = 'purchase' AND e.ts > u3.t3 AND e.ts <= u3.t1 + 86400000000000
       GROUP BY e.user_id),
c AS (SELECT (SELECT count(*) FROM u1) AS c1, (SELECT count(*) FROM u2) AS c2,
             (SELECT count(*) FROM u3) AS c3, (SELECT count(*) FROM u4) AS c4)
SELECT 1 AS stage, 'signup' AS step, c1 AS users,
       CAST(1.0 AS DOUBLE) AS conv_from_prev,
       CASE WHEN c1 > 0 THEN floor((CAST(c1 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END AS conv_from_first
FROM c
UNION ALL
SELECT 2, 'view', c2,
       CASE WHEN c1 > 0 THEN floor((CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
UNION ALL
SELECT 3, 'click', c3,
       CASE WHEN c2 > 0 THEN floor((CAST(c3 AS DOUBLE) / CAST(c2 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c3 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
UNION ALL
SELECT 4, 'purchase', c4,
       CASE WHEN c3 > 0 THEN floor((CAST(c4 AS DOUBLE) / CAST(c3 AS DOUBLE)) * 10000 + 0.5) / 10000 END,
       CASE WHEN c1 > 0 THEN floor((CAST(c4 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 10000 + 0.5) / 10000 END
FROM c
"""

    o["cohort_retention"] = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
  FROM events
),
fc AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id),
sz AS (SELECT cohort, count(*) AS cohort_size FROM fc GROUP BY cohort),
j AS (
  SELECT f.cohort, a.day - f.cohort AS day_offset, a.user_id
  FROM act a JOIN fc f ON a.user_id = f.user_id
  WHERE a.day - f.cohort <= 14
),
cnt AS (SELECT cohort, day_offset, count(*) AS active_users FROM j GROUP BY cohort, day_offset)
SELECT c.cohort AS cohort_day, c.day_offset, c.active_users, s.cohort_size,
       floor((CAST(c.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)) * 10000 + 0.5) / 10000 AS retention
FROM cnt c JOIN sz s ON c.cohort = s.cohort
"""

    o["topk_users"] = """
SELECT user_id,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value,
       count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id ASC LIMIT 20
"""

    day_ns = 24 * 3600 * SEC
    o["window_daily_running"] = f"""
WITH daily AS (
  SELECT user_id, (epoch_ns(ts) // {day_ns}) * {day_ns} AS day,
         sum(CAST(round((value) * 10000) AS BIGINT)) AS dv4
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, dv4 / 10000.0 AS day_value,
       sum(dv4) OVER (PARTITION BY user_id ORDER BY day) / 10000.0 AS running_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS day_rank
FROM daily
"""

    o["distinct_users"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""

    gap_ns = 30 * 60 * SEC
    o["sessionize"] = f"""
WITH t AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ts FROM events
),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > {gap_ns}
              THEN 1 ELSE 0 END AS new_f
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start,
       CAST((max(ts) - min(ts)) // {SEC} AS BIGINT) AS duration_s
FROM sess GROUP BY user_id, session_id
"""

    _pv = ",\n       ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN CAST(round((value) * 10000) AS BIGINT) END)"
        f" / 10000.0 AS {t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    o["pivot_event_matrix"] = f"""
SELECT (epoch_ns(ts) // {day_ns}) * {day_ns} AS day,
       {_pv}
FROM events GROUP BY 1
"""

    o["path_transitions"] = """
WITH h AS (
  SELECT user_id AS u, event_type AS to_event,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_event
  FROM events
)
SELECT from_event, to_event,
       CAST(count(*) AS BIGINT) AS transitions,
       CAST(count(DISTINCT u) AS BIGINT) AS users
FROM h WHERE from_event IS NOT NULL
GROUP BY from_event, to_event
"""

    # merge_asof gate: DuckDB's NATIVE ASOF JOIN (independent
    # implementation of the backward semantics), tolerance applied as the
    # pandas nearest-or-null rule on top.
    o["asof_tolerance"] = f"""
WITH v AS (
  SELECT user_id, epoch_ns(ts) AS ts, arg_max(value, event_id) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
p AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.event_id, p.user_id, p.ts, p.value, v.view_value, v.ts AS asof_ts
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT event_id, user_id, ts,
       floor(value * 10000 + 0.5) / 10000 AS value,
       CASE WHEN asof_ts IS NOT NULL AND ts - asof_ts <= {3600 * SEC}
            THEN floor(view_value * 10000 + 0.5) / 10000 END AS view_value,
       CASE WHEN asof_ts IS NOT NULL AND ts - asof_ts <= {3600 * SEC}
            THEN asof_ts END AS asof_ts
FROM j
"""

    # SCD2: value-change islands (IS DISTINCT FROM == Spark's
    # isNull-or-!= for never-null event_type); running sum cast back to
    # BIGINT per the HUGEINT doctrine. epoch_ns(ts) is already micros-
    # precise, matching the entry's % 1000 truncation.
    o["scd2_history"] = """
WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id FROM events),
f AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
v AS (
  SELECT user_id, event_type, ts,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM f
),
g AS (
  SELECT user_id, version, min(event_type) AS event_type,
         min(ts) AS valid_from, count(*) AS n_rows
  FROM v GROUP BY user_id, version
)
SELECT user_id, event_type, version, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       n_rows
FROM g
"""
    return o
