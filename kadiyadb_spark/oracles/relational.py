"""DuckDB oracle SQL for the driver correctness gate — relational engine surface: joins, subqueries, grouping sets, sources, skew.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    SEC,
    T0,
    _TOKENS,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    day_ns = 24 * 3600 * SEC

    # PageRank replay: ranks are scaled longs and every update is integer
    # arithmetic (quantized edge shares w*10^4 // W_out, contributions
    # r*share4 // 10^4, damping base + 85*sum // 100), so the 3 damped
    # iterations unroll as CTEs and the final vector value-hash gates.
    # DuckDB sum(BIGINT) is HUGEINT — every fold is CAST back.
    _pr_iter = """
it{k} AS (
  SELECT n.node, 150000 + (CAST(coalesce(s.i, 0) AS BIGINT) * 85) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e4.dst AS node, CAST(sum((p.r * e4.share4) // 10000) AS BIGINT) AS i
    FROM it{km1} p JOIN e4 ON p.node = e4.src GROUP BY e4.dst
  ) s ON n.node = s.node
)"""
    o["graph_pagerank"] = f"""
WITH e AS (
  SELECT ns.n_name AS src, nc.n_name AS dst, CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  GROUP BY 1, 2
),
e4 AS (
  SELECT src, dst,
         (w * 10000) // CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS share4
  FROM e
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
{_pr_iter.format(k=1, km1=0)},
{_pr_iter.format(k=2, km1=1)},
{_pr_iter.format(k=3, km1=2)}
SELECT node, CAST(r AS BIGINT) AS rank FROM it3
"""

    o["semi_join"] = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""

    o["anti_join"] = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01')
"""

    day1 = T0 + 24 * 3600 * SEC
    o["set_ops"] = f"""
WITH d1 AS (SELECT user_id, event_type FROM events
            WHERE epoch_ns(ts) >= {T0} AND epoch_ns(ts) < {day1})
(SELECT user_id FROM d1 WHERE event_type = 'click'
 INTERSECT
 SELECT user_id FROM d1 WHERE event_type = 'purchase')
EXCEPT
SELECT user_id FROM d1 WHERE event_type = 'error'
"""

    o["rollup_revenue"] = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       floor((sum(CAST(round((o_totalprice) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

    o["asof_join"] = f"""
WITH tl AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ts, event_type,
         max(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM events WHERE event_type IN ('purchase', 'view')
)
SELECT event_id, user_id, ts, last_view_ts,
       CAST((ts - last_view_ts) // {SEC} AS BIGINT) AS gap_s
FROM tl WHERE event_type = 'purchase'
"""

    o["json_extract"] = """
SELECT event_type,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       floor((sum(json_extract(props, '$.k')::BIGINT)
              / count(json_extract(props, '$.k')::BIGINT)) * 10000 + 0.5) / 10000 AS avg_k,
       max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type
"""

    # Residue (c) closed: no quantile_cont — the (n-1)*p rank definition is
    # replayed in exact scaled-long integer arithmetic (pos=(n-1)*num,
    # k=pos//den, rem=pos%den; order statistics at ranks k+1/k+2; the
    # interpolated value is the exact integer (den-rem)*lo + rem*hi with ONE
    # double division by den*1e4) — the same construction as
    # functions/profile.py:exact_quantiles on the Spark side.
    o["percentiles"] = """
WITH rk AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 10000) AS BIGINT) AS x4,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(round(l_extendedprice * 10000) AS BIGINT)) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
ag AS (
  SELECT l_returnflag, max(n) AS n,
         max(CASE WHEN rn = ((n-1)*1) // 4 + 1 THEN x4 END) AS lo25,
         max(CASE WHEN rn = ((n-1)*1) // 4 + 2 THEN x4 END) AS hi25,
         max(CASE WHEN rn = ((n-1)*1) // 2 + 1 THEN x4 END) AS lo50,
         max(CASE WHEN rn = ((n-1)*1) // 2 + 2 THEN x4 END) AS hi50,
         max(CASE WHEN rn = ((n-1)*3) // 4 + 1 THEN x4 END) AS lo75,
         max(CASE WHEN rn = ((n-1)*3) // 4 + 2 THEN x4 END) AS hi75
  FROM rk GROUP BY l_returnflag
)
SELECT l_returnflag,
       floor((CAST((4 - ((n-1)*1) % 4) * lo25 + (((n-1)*1) % 4) * coalesce(hi25, lo25) AS DOUBLE) / 40000.0) * 10000 + 0.5) / 10000 AS p25,
       floor((CAST((2 - ((n-1)*1) % 2) * lo50 + (((n-1)*1) % 2) * coalesce(hi50, lo50) AS DOUBLE) / 20000.0) * 10000 + 0.5) / 10000 AS p50,
       floor((CAST((4 - ((n-1)*3) % 4) * lo75 + (((n-1)*3) % 4) * coalesce(hi75, lo75) AS DOUBLE) / 40000.0) * 10000 + 0.5) / 10000 AS p75,
       CAST(n AS BIGINT) AS n
FROM ag
"""

    o["date_extract"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       count(*) AS n_orders,
       floor((sum(CAST(round((o_totalprice) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       min(o_orderkey) AS first_orderkey
FROM orders GROUP BY 1, 2
"""

    o["topk_per_group"] = """
WITH per AS (
  SELECT event_type, user_id, sum(CAST(round((value) * 10000) AS BIGINT)) AS v4
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, user_id, v4,
         row_number() OVER (PARTITION BY event_type ORDER BY v4 DESC, user_id ASC) AS rnk
  FROM per
)
SELECT event_type, user_id, CAST(rnk AS BIGINT) AS rnk,
       v4 / 10000.0 AS total_value
FROM ranked WHERE rnk <= 3
"""

    o["null_semantics"] = """
WITH d AS (
  SELECT event_type,
         nullif(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5, 0) AS n
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       count(n) AS n_nonnull,
       CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(coalesce(n, -1)) AS BIGINT) AS sum_coalesced,
       CAST(sum(CASE WHEN n IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null
FROM d GROUP BY event_type
"""

    o["correlated_subquery"] = """
SELECT o_orderkey, o_custkey,
       floor(o_totalprice * 10000 + 0.5) / 10000 AS totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
    SELECT sum(CAST(round(o2.o_totalprice * 10000) AS BIGINT))
           / (10000.0 * count(o2.o_totalprice))
    FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""

    o["grouping_sets_mixed"] = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       floor((sum(CAST(round((o_totalprice) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (n_name), ())
"""

    o["exists_subquery"] = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(epoch_us(l.l_shipdate) AS BIGINT)
          - CAST(epoch_us(o.o_orderdate) AS BIGINT) > 60 * 86400000000)
GROUP BY o_orderpriority
"""

    week_ns = 7 * 24 * 3600 * SEC
    o["cube_grouping"] = f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(dow, -1) AS dow,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value,
       count(*) AS n_events
FROM (SELECT event_type, (epoch_ns(ts) % {week_ns}) // {day_ns} AS dow, value FROM events)
GROUP BY CUBE (event_type, dow)
"""

    o["window_frames"] = f"""
WITH daily AS (
  SELECT event_type, (epoch_ns(ts) // {day_ns}) * {day_ns} AS day,
         sum(CAST(round((value) * 10000) AS BIGINT)) AS dv4
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       dv4 / 10000.0 AS day_value,
       floor((sum(dv4) OVER wma / (10000.0 * count(dv4) OVER wma)) * 10000 + 0.5) / 10000 AS ma3,
       (dv4 - lag(dv4, 1, 0) OVER w) / 10000.0 AS delta_prev,
       lead(dv4, 1, 0) OVER w / 10000.0 AS next_value,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day),
       wma AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""

    o["explode_tokens"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents WHERE doc_id < 50)
SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS token FROM t
"""

    o["array_collect"] = """
WITH per_user AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
  FROM events GROUP BY user_id
)
SELECT user_id,
       array_to_string(types, ',') AS types_csv,
       CAST(len(types) AS BIGINT) AS n_types,
       types[1] AS first_type,
       list_contains(types, 'purchase') AS has_purchase
FROM per_user
"""

    o["string_funcs"] = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS cust_num,
       substr(c_mktsegment, 1, 3) AS seg3,
       translate(c_name, '0123456789', '##########') AS masked,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
       CAST(length(c_name) AS BIGINT) AS name_len,
       lower(c_mktsegment) || '|' || CAST(c_custkey AS VARCHAR) AS seg_key
FROM customer
"""

    o["range_join_counts"] = f"""
WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts FROM events),
err AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
clk AS (SELECT user_id, ts FROM ev WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       CAST(count(c.ts) AS BIGINT) AS n_prior_clicks
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - {5 * 60 * SEC} AND c.ts < e.ts
GROUP BY e.event_id, e.user_id
"""

    # Source round-trips: the oracle reads the ORIGINAL parquet — any value
    # drift introduced by the JSON/CSV writer+reader fails the hash.
    _src_agg_sql = """
SELECT event_type, count(*) AS n_events,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value,
       min(event_id) AS first_event
FROM events GROUP BY event_type
"""
    o["json_source_agg"] = _src_agg_sql
    o["csv_source_agg"] = _src_agg_sql
    o["orc_source_agg"] = _src_agg_sql

    # Layout change only — values must round-trip bit-exactly.
    o["zorder_layout"] = """
SELECT event_type, count(*) AS n_events,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value
FROM events GROUP BY event_type
"""

    # Bucketed re-layout is content-preserving: oracle joins the originals.
    o["bucketed_join"] = """
SELECT c_mktsegment, count(*) AS n_orders,
       floor((sum(CAST(round((o_totalprice) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

    o["skew_salted_agg"] = """
SELECT event_type,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total,
       count(*) AS cnt
FROM events GROUP BY event_type
"""

    o["skew_salted_join"] = """
SELECT c_mktsegment,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value,
       count(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""

    # The Bloom pre-filter is invisible to the result (no false negatives;
    # false positives die in the real join), so the oracle is the PLAIN
    # join — the gate proves the reduction is lossless.
    o["bloom_join_prune"] = """
SELECT CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       count(*) AS n_items,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY 1
"""

    # MERGE INTO replay: same change-set construction, same latest-wins
    # dedup, same full-outer resolution (I/U overwrite, D drop).
    o["cdc_merge_apply"] = """
WITH ch AS (
  SELECT CASE WHEN o_custkey % 23 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS k,
         o_orderkey AS seq,
         CASE WHEN (CASE WHEN o_custkey % 23 = 0 THEN o_custkey + 1000000 ELSE o_custkey END) % 17 = 0
              THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS acct
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
latest AS (
  SELECT k, op, acct FROM (
    SELECT ch.*, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM ch)
  WHERE rn = 1),
m AS (
  SELECT coalesce(c.c_custkey, l.k) AS c_custkey,
         c.c_name,
         CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
         CASE WHEN l.op IS NOT NULL THEN l.acct ELSE c.c_acctbal END AS c_acctbal,
         c.c_mktsegment, l.op
  FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k)
SELECT c_custkey, c_name, c_nationkey,
       floor(c_acctbal * 10000 + 0.5) / 10000 AS c_acctbal,
       c_mktsegment
FROM m WHERE op IS NULL OR op <> 'D'
"""

    # triangle_count: identical normalization (least/greatest distinct,
    # no loops), identical (degree, id) orientation, wedge join + closing
    # edge semi-join — all exact integers
    o["graph_triangles"] = """
WITH raw AS (
  SELECT CAST(s_nationkey AS BIGINT) AS src, CAST(c_nationkey AS BIGINT) AS dst
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und) GROUP BY n
),
oriented AS (
  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS u,
         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS v
  FROM und JOIN deg da ON da.n = a JOIN deg db ON db.n = b
),
wedges AS (
  SELECT e1.u, e1.v AS x, e2.v AS y
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
),
tri AS (
  SELECT w.u, w.x, w.y FROM wedges w
  WHERE EXISTS (SELECT 1 FROM und WHERE a = w.x AND b = w.y)
),
nodes AS (
  SELECT u AS node FROM tri UNION ALL SELECT x FROM tri UNION ALL SELECT y FROM tri
)
SELECT node, count(*) AS n_triangles FROM nodes GROUP BY node
"""

    o["privacy_k_anonymity"] = """
SELECT c_custkey,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       c_mktsegment,
       CAST(count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS BIGINT) AS k_group_size,
       CASE WHEN count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) < 10
            THEN 1 ELSE 0 END AS suppressed
FROM customer
"""

    o["privacy_pseudonymize"] = """
SELECT substr(md5('r10:' || CAST(user_id AS VARCHAR)), 1, 16) AS user_id,
       event_type,
       count(*) AS n_events,
       floor((sum(CAST(round((value) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_value
FROM events
GROUP BY 1, 2
"""

    # dq_expectations: the same six row-level checks folded in ONE scan
    # (NULL condition = violation, the conservative reading) + the RI
    # check as a NOT EXISTS count; rates 4dp-floored like the engine.
    o["dq_expectations"] = """
WITH agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN COALESCE(o_custkey IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS custkey_not_null,
         sum(CASE WHEN COALESCE(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END) AS totalprice_positive,
         sum(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 0 ELSE 1 END) AS status_in_domain,
         sum(CASE WHEN COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) THEN 0 ELSE 1 END) AS priority_format,
         sum(CASE WHEN COALESCE(o_orderdate >= TIMESTAMP '1995-01-01'
                            AND o_orderdate <  TIMESTAMP '2000-01-01', FALSE) THEN 0 ELSE 1 END) AS date_in_range,
         sum(CASE WHEN COALESCE(o_totalprice <= 300000.0::DOUBLE, FALSE) THEN 0 ELSE 1 END) AS totalprice_under_cap
  FROM orders),
rows_checks AS (
  SELECT 'custkey_not_null' AS "check", CAST(custkey_not_null AS BIGINT) AS n_violations, CAST(n AS BIGINT) AS n_rows FROM agg
  UNION ALL SELECT 'totalprice_positive', CAST(totalprice_positive AS BIGINT), CAST(n AS BIGINT) FROM agg
  UNION ALL SELECT 'status_in_domain', CAST(status_in_domain AS BIGINT), CAST(n AS BIGINT) FROM agg
  UNION ALL SELECT 'priority_format', CAST(priority_format AS BIGINT), CAST(n AS BIGINT) FROM agg
  UNION ALL SELECT 'date_in_range', CAST(date_in_range AS BIGINT), CAST(n AS BIGINT) FROM agg
  UNION ALL SELECT 'totalprice_under_cap', CAST(totalprice_under_cap AS BIGINT), CAST(n AS BIGINT) FROM agg
  UNION ALL
  SELECT 'o_custkey_in_c_custkey',
         CAST((SELECT count(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
         CAST((SELECT count(*) FROM orders) AS BIGINT))
SELECT "check", n_violations, n_rows,
       CASE WHEN n_rows = 0 THEN 0.0::DOUBLE
            ELSE floor(n_violations * 1e4 / n_rows + 0.5) / 1e4 END AS violation_rate
FROM rows_checks
"""

    # window_ranks: standard-SQL rank family under the identical total
    # order; 4dp floors mirror round4_expr.
    o["window_ranks"] = """
SELECT o_orderkey, o_custkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pct_rank,
       floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""

    # snapshot_diff: identical derived snapshots; full-outer key join +
    # per-column IS NOT DISTINCT FROM change test (null-safe, no hashes).
    o["snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
kept AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0::DOUBLE
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM old WHERE o_orderkey % 13 != 0),
added AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'),
new AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_totalprice AS old_o_totalprice, o.o_orderstatus AS old_o_orderstatus,
         n.o_totalprice AS new_o_totalprice, n.o_orderstatus AS new_o_orderstatus
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            ELSE 'changed' END AS change,
       old_o_totalprice, old_o_orderstatus,
       new_o_totalprice, new_o_orderstatus
FROM j
WHERE NOT in_old OR NOT in_new
   OR NOT (old_o_totalprice IS NOT DISTINCT FROM new_o_totalprice
           AND old_o_orderstatus IS NOT DISTINCT FROM new_o_orderstatus)
"""
    return o
