"""DuckDB oracle SQL for the driver correctness gate — cube construction, streaming ingest, storage lifecycle (track/clone/expire/changes/catalog/rollup-refresh).

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    SEC,
    RES,
    T0,
    WEEK0,
    WEEK1,
    _EV_CUBE,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["track_cube"] = f"""
WITH {_EV_CUBE}
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
"""

    # a clone must hold exactly the snapshot's cube — track_cube's oracle
    # at the entry's DAILY epoch width
    _DAY = 24 * 3600 * SEC
    o["db_clone"] = f"""
WITH ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events
),
cube2 AS (
    SELECT (bucket // {_DAY}) * {_DAY} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cube1 AS (
    SELECT (bucket // {_DAY}) * {_DAY} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
)
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
"""

    # forget = the clone oracle over events EXCLUDING the forgotten user:
    # 'as if never tracked' at every depth (rollups re-fold from survivors)
    o["db_forget"] = f"""
WITH ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events WHERE CAST(user_id AS VARCHAR) <> '7'
),
cube2 AS (
    SELECT (bucket // {_DAY}) * {_DAY} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cube1 AS (
    SELECT (bucket // {_DAY}) * {_DAY} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
)
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
"""

    # SQL-view read: the temp view wraps the same manifest-consistent
    # fold, so one GROUP BY over the depth-2 slice must equal the event
    # aggregation directly; the long-sum/one-division pattern mirrors the
    # entry's SQL string token for token.
    o["sql_over_cube"] = f"""
WITH ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events
),
cube2 AS (
    SELECT bucket, f1, f2,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS t4,
           CAST(count(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2, 3
)
SELECT f1,
       CAST(SUM(t4) AS BIGINT) / 10000.0 AS total,
       CAST(SUM(cnt) AS BIGINT) AS points,
       CAST(COUNT(DISTINCT f2) AS BIGINT) AS n_users
FROM cube2
WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY f1
"""

    # Streaming ingestion must land on exactly the batch-track values —
    # both strategies (raw increment-merge and watermarked agg replace-merge).
    # The streaming entries persist with DAILY epochs (layout, not values):
    # same cube, day-floored epoch column.
    day_ns0 = 24 * 3600 * SEC
    _day_cube = f"""
ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events
),
cube2 AS (
    SELECT (bucket // {day_ns0}) * {day_ns0} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cube1 AS (
    SELECT (bucket // {day_ns0}) * {day_ns0} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
)"""
    o["streaming_ingest"] = f"""
WITH {_day_cube}
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
"""
    o["streaming_agg"] = o["streaming_ingest"]

    # Strategy 3 (append mode): only windows the FINAL watermark closed are
    # emitted — watermark = max event time (delay 0, ms precision), a window
    # is final when its end <= watermark. The tail windows stay in state.
    _wm_ms_ns = "(SELECT (max(epoch_ns(ts)) // 1000000) * 1000000 FROM events)"
    o["streaming_agg_append"] = f"""
WITH {_day_cube}
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
 WHERE bucket + {RES} <= {_wm_ms_ns}
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
 WHERE bucket + {RES} <= {_wm_ms_ns}
"""

    # Exactly-once under double delivery: the aggregate of what survives the
    # streaming dedup must equal the aggregate of the ORIGINAL table.
    o["streaming_dedup"] = """
SELECT event_type, count(*) AS n_events,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value,
       min(event_id) AS first_event
FROM events GROUP BY event_type
"""

    # Compare at integer MICROSECONDS: the operator's interval condition
    # runs on ts_us_expr-truncated event times, so a pair exactly at the
    # lookback boundary with sub-us ns components must resolve identically
    # here (ns-typed TIMESTAMP comparison could flip it).
    o["streaming_join"] = f"""
SELECT l.user_id, count(*) AS n_pairs,
       count(DISTINCT l.event_id) AS n_purchases,
       count(DISTINCT r.event_id) AS n_clicks
FROM events l
JOIN events r ON l.user_id = r.user_id
            AND epoch_ns(r.ts) // 1000 >= epoch_ns(l.ts) // 1000 - {30 * 60 * 1000000}
            AND epoch_ns(r.ts) // 1000 <= epoch_ns(l.ts) // 1000
WHERE l.event_type = 'purchase' AND r.event_type = 'click'
GROUP BY l.user_id
"""

    # Closed sessions only: the batch gaps-and-islands sessionization minus
    # the islands whose end+gap the FINAL watermark (max event time minus
    # the 24h delay, at the engine's ms resolution) has not passed — those
    # stay open in state when the source drains. The island-state kernel
    # reconstructs exactly the batch islands regardless of arrival order
    # (the fixture's straggler batch included), so admission is total and
    # no per-batch modeling is needed here. The kernel sorts by ts alone;
    # ts ties land in one session either way, so no event_id tiebreak is
    # needed for any output column.
    gap = 30 * 60 * SEC
    delay_ms = 24 * 3600 * 1000
    o["streaming_sessionize"] = f"""
WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, value FROM events),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > {gap}
              THEN 1 ELSE 0 END AS nf
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(nf) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM flagged
),
agg AS (
  SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events, sum(value) AS vsum
  FROM sess GROUP BY user_id, sid
),
mx AS (SELECT max(ts) AS max_ts FROM ev)
SELECT a.user_id, a.session_start, a.session_end, a.n_events,
       floor(a.vsum * 10000 + 0.5) / 10000 AS value_sum
FROM agg a, mx
WHERE (a.session_end + {gap}) // 1000000 < mx.max_ts // 1000000 - {delay_ms}
"""

    # O11: only rows in epochs >= the cutoff survive an expire. The entry
    # uses DAILY epochs (see q_expire_retention), so the epoch floor here is
    # a day, not _EV_CUBE's hour.
    day_ns = 24 * 3600 * SEC
    cutoff = T0 + 15 * day_ns
    o["expire_retention"] = f"""
WITH ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events
),
cube2 AS (
    SELECT (bucket // {day_ns}) * {day_ns} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cube1 AS (
    SELECT (bucket // {day_ns}) * {day_ns} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
)
SELECT * FROM (
  SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
         floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
  UNION ALL
  SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
         floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
) WHERE epoch >= {cutoff}
"""

    # Changes = the cube aggregation over ONLY the second batch's events
    # (daily epochs, same shape as expire_retention's oracle).
    changes_cut = T0 + 15 * day_ns
    o["cube_changes"] = f"""
WITH ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events WHERE epoch_ns(ts) >= {changes_cut}
),
cube2 AS (
    SELECT (bucket // {day_ns}) * {day_ns} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cube1 AS (
    SELECT (bucket // {day_ns}) * {day_ns} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
)
SELECT epoch, bucket, f1, CAST(NULL AS VARCHAR) AS f2, CAST(1 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube1
UNION ALL
SELECT epoch, bucket, f1, f2, CAST(2 AS BIGINT) AS depth,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM cube2
"""

    # O13: statically expected catalog after skipping the invalid databases.
    o["catalog_load"] = f"""
SELECT * FROM (VALUES
  ('metrics_1h', CAST({3600 * SEC} AS BIGINT), CAST({60 * SEC} AS BIGINT),
   CAST({720 * 3600 * SEC} AS BIGINT), CAST(60 AS BIGINT), CAST(2 AS BIGINT)),
  ('metrics_1s', CAST({60 * SEC} AS BIGINT), CAST({SEC} AS BIGINT),
   CAST({3600 * SEC} AS BIGINT), CAST(60 AS BIGINT), CAST(1 AS BIGINT))
) AS t(db_name, duration, resolution, retention, rsize, n_fields)
"""

    # Read-time rollup of depth-2 series == write-time depth-1 records.
    o["rollup_read_equivalence"] = f"""
WITH {_EV_CUBE}
SELECT epoch, bucket, f1,
       floor((total) * 10000 + 0.5) / 10000 AS total, cnt
FROM cube1
"""

    o["track_rejects"] = """
WITH dirty AS (
  SELECT event_id,
         CASE WHEN event_id % 17 = 0 THEN NULL ELSE epoch_ns(ts) END AS tsn,
         CASE WHEN event_id % 11 = 0 THEN '*' ELSE event_type END AS f1,
         CASE WHEN event_id % 13 = 0 THEN NULL
              ELSE CAST(user_id AS VARCHAR) END AS f2
  FROM events
),
r AS (
  SELECT event_id,
         CASE WHEN tsn IS NULL THEN 'null_ts'
              WHEN f1 IS NULL OR f1 IN ('', '*') THEN 'illegal_field:event_type'
              WHEN f2 IS NULL OR f2 IN ('', '*') THEN 'illegal_field:user_id'
         END AS reject_reason
  FROM dirty
)
SELECT event_id, reject_reason FROM r WHERE reject_reason IS NOT NULL
"""

    # the streaming quarantine must equal the batch dead-letter census:
    # same dirty construction, same SQL
    o["streaming_rejects"] = o["track_rejects"]

    day_ns = 24 * 3600 * SEC
    o["rollup_cascade"] = f"""
WITH ev10 AS (
  SELECT (epoch_ns(ts) // {10 * RES}) * {10 * RES} AS bucket,
         event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
  FROM events
  WHERE event_type = 'click'
)
SELECT (bucket // {day_ns}) * {day_ns} AS epoch, f1, f2, bucket,
       floor(((CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0)) * 10000 + 0.5) / 10000 AS total,
       CAST(count(*) AS DOUBLE) AS cnt
FROM ev10
WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY 1, 2, 3, 4
"""

    # Same coarse aggregation as rollup_cascade plus the router's stamped
    # grid: the week at max_points=2000 must land on the 10m tier.
    o["fetch_routed"] = f"""
WITH ev10 AS (
  SELECT (epoch_ns(ts) // {10 * RES}) * {10 * RES} AS bucket,
         event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
  FROM events
  WHERE event_type = 'click'
)
SELECT (bucket // {day_ns}) * {day_ns} AS epoch, f1, f2, bucket,
       floor(((CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0)) * 10000 + 0.5) / 10000 AS total,
       CAST(count(*) AS DOUBLE) AS cnt,
       CAST({10 * RES} AS BIGINT) AS res_ns
FROM ev10
WHERE bucket >= {WEEK0} AND bucket < {WEEK1}
GROUP BY 1, 2, 3, 4
"""
    return o
