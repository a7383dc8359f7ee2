"""DuckDB oracle SQL for the driver correctness gate — sketches and data profiling: quantiles, heavy hitters, HLL, drift, correlations.

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
    b = T0 + 3600 * SEC

    # Tolerance oracle: the GK percentile sketch must land inside the exact
    # [p45, p55] value band (flag computed Spark-side, pinned TRUE here).
    # p50_exact is the exact scaled-long interpolation (residue (c) closed):
    # pos=(n-1), k=pos//2, rem=pos%2 — same construction as
    # functions/profile.py:exact_quantiles.
    o["approx_quantile"] = """
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
         max(CASE WHEN rn = (n-1) // 2 + 1 THEN x4 END) AS lo50,
         max(CASE WHEN rn = (n-1) // 2 + 2 THEN x4 END) AS hi50
  FROM rk GROUP BY l_returnflag
)
SELECT l_returnflag,
       floor((CAST((2 - (n-1) % 2) * lo50 + ((n-1) % 2) * coalesce(hi50, lo50) AS DOUBLE) / 20000.0) * 10000 + 0.5) / 10000 AS p50_exact,
       TRUE AS within_band
FROM ag
"""

    # Tolerance oracle: asserts the HLL++ estimate landed within 3*rsd of the
    # exact count (the flag is computed Spark-side; the oracle pins it TRUE).
    o["approx_distinct"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""

    # KMV set-op replay: min-k of the cross-engine md5 hash is a pure
    # order statistic, so the FULL construction (sketches, union merge,
    # bottom-k estimator (k-1)*2^60/h_k, intersection fraction) is
    # deterministic — replayed here verbatim; the estimator numerator is
    # the exactly-representable double 63*2^60 on both engines.
    _kmv_est = (
        "CASE WHEN len({s}) >= 64 THEN "
        "(63.0::DOUBLE * 1152921504606846976.0::DOUBLE) / CAST({s}[64] AS DOUBLE) "
        "ELSE CAST(len({s}) AS DOUBLE) END"
    )
    o["sketch_kmv_setops"] = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5('kmv' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
mk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
sk AS (
  SELECT event_type, list(h ORDER BY h) AS s
  FROM mk WHERE rn <= 64 GROUP BY event_type
),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.s AS sa, b.s AS sb,
         list_sort(list_distinct(list_concat(a.s, b.s)))[1:64] AS m
  FROM sk a JOIN sk b ON a.event_type < b.event_type
),
e AS (
  SELECT type_a, type_b,
         len(m) AS km,
         len(list_intersect(list_intersect(m, sa), sb)) AS matches,
         {_kmv_est.format(s="sa")} AS est_a,
         {_kmv_est.format(s="sb")} AS est_b,
         {_kmv_est.format(s="m")} AS est_union
  FROM pr
)
SELECT type_a, type_b,
       floor(est_a * 10000 + 0.5) / 10000 AS est_a,
       floor(est_b * 10000 + 0.5) / 10000 AS est_b,
       floor(est_union * 10000 + 0.5) / 10000 AS est_union,
       floor((CASE WHEN km > 0 THEN CAST(matches AS DOUBLE) * est_union / CAST(km AS DOUBLE)
                   ELSE 0.0::DOUBLE END) * 10000 + 0.5) / 10000 AS est_intersect,
       floor((CASE WHEN km > 0 THEN CAST(matches AS DOUBLE) / CAST(km AS DOUBLE)
                   ELSE 0.0::DOUBLE END) * 10000 + 0.5) / 10000 AS est_jaccard,
       CAST(matches AS BIGINT) AS matches
FROM e
"""

    # Count-Min replay: the bucket hash is the established cross-engine
    # 60-bit md5 (positive, so % == pmod), counters are exact longs, and
    # the order-weighted checksum gates the FULL 4x32 matrix counter for
    # counter. Spark builds per-day and merges (monoid fold); this oracle
    # builds the whole range directly — hash equality proves the merge
    # lossless, the same device as histogram_rollup_merge.
    o["sketch_countmin"] = """
WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
cells AS (
  SELECT event_type, js.j,
         CAST(('0x' || substr(md5('cm' || CAST(js.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 32 AS b,
         count(*) AS c
  FROM events CROSS JOIN js
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2, 3
),
chk AS (
  SELECT event_type, CAST(sum(c * (j * 32 + b + 1)) AS BIGINT) AS sketch_checksum
  FROM cells GROUP BY event_type
),
probes AS (
  SELECT user_id FROM (
    SELECT user_id, row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
  ) WHERE rn <= 10
),
pj AS (
  SELECT p.user_id, t.event_type
  FROM probes p CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
est AS (
  SELECT pj.event_type, pj.user_id, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_cnt
  FROM pj CROSS JOIN js
  LEFT JOIN cells c ON c.event_type = pj.event_type AND c.j = js.j
    AND c.b = CAST(('0x' || substr(md5('cm' || CAST(js.j AS VARCHAR) || ':' || CAST(pj.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 32
  GROUP BY 1, 2
),
ex AS (
  SELECT event_type, user_id, count(*) AS exact_cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
)
SELECT e.event_type, e.user_id, e.est_cnt,
       CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS exact_cnt,
       e.est_cnt >= coalesce(x.exact_cnt, 0) AS never_under,
       k.sketch_checksum
FROM est e
LEFT JOIN ex x ON x.event_type = e.event_type AND x.user_id = e.user_id
JOIN chk k ON k.event_type = e.event_type
"""

    # CM join-size replay: per (pair, depth-row) bucket-counter dot
    # products over a pair x j GRID (a row with no shared buckets is a
    # zero dot — min must see it), min over rows = the estimate; exact
    # side is the per-user count-product fold. All exact longs.
    o["sketch_cm_joinsize"] = """
WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
cells AS (
  SELECT event_type, js.j,
         CAST(('0x' || substr(md5('cm' || CAST(js.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM events CROSS JOIN js
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2, 3
),
tpairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM events) a
  JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type
),
dots AS (
  SELECT p.type_a, p.type_b, js.j,
         CAST(coalesce(sum(ca.c * cb.c), 0) AS BIGINT) AS dot
  FROM tpairs p CROSS JOIN js
  LEFT JOIN cells ca ON ca.event_type = p.type_a AND ca.j = js.j
  LEFT JOIN cells cb ON cb.event_type = p.type_b AND cb.j = ca.j AND cb.b = ca.b
  GROUP BY 1, 2, 3
),
est AS (
  SELECT type_a, type_b, min(dot) AS est_join FROM dots GROUP BY 1, 2
),
cnts AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
ex AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(sum(x.n * y.n) AS BIGINT) AS exact_join
  FROM cnts x JOIN cnts y ON x.user_id = y.user_id
  WHERE x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT e.type_a, e.type_b, e.est_join,
       CAST(coalesce(x.exact_join, 0) AS BIGINT) AS exact_join,
       e.est_join >= coalesce(x.exact_join, 0) AS never_under
FROM est e
LEFT JOIN ex x ON x.type_a = e.type_a AND x.type_b = e.type_b
"""

    # Direct computation at the same ladder — equality with the Spark
    # side's day->type merge path proves the histogram merge is lossless.
    o["histogram_rollup_merge"] = """
WITH b AS (
  SELECT event_type,
         CASE WHEN value <= 1.0 THEN 1.0 WHEN value <= 5.0 THEN 5.0
              WHEN value <= 10.0 THEN 10.0 WHEN value <= 50.0 THEN 50.0
              WHEN value <= 100.0 THEN 100.0
              ELSE CAST('infinity' AS DOUBLE) END AS le,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS tot,
         coalesce(lag(le) OVER (PARTITION BY event_type ORDER BY le), 0.0) AS prev_le
  FROM b
),
sel AS (
  SELECT event_type, le, cnt, tot, prev_le, cum - cnt AS prev_cum,
         row_number() OVER (PARTITION BY event_type ORDER BY le ASC) AS rn
  FROM w
  WHERE tot > 0 AND CAST(cum AS DOUBLE) >= CAST(0.9 AS DOUBLE) * CAST(tot AS DOUBLE)
    AND cnt > 0
)
SELECT event_type, CAST(tot AS BIGINT) AS n_obs,
       floor((CASE WHEN isinf(le) THEN prev_le
              ELSE prev_le + (le - prev_le)
                   * (CAST(0.9 AS DOUBLE) * CAST(tot AS DOUBLE) - CAST(prev_cum AS DOUBLE))
                   / CAST(cnt AS DOUBLE) END) * 10000 + 0.5) / 10000 AS quantile
FROM sel WHERE rn = 1
"""

    o["heavy_hitters"] = """
WITH n AS (SELECT count(*) AS c FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
       floor((count(*) / (SELECT CAST(c AS DOUBLE) FROM n)) * 10000 + 0.5) / 10000 AS frac
FROM events GROUP BY user_id
HAVING count(*) > (SELECT CAST(floor(c * 0.001953125) AS BIGINT) FROM n)
"""

    # gram heavy hitters: same GROUP BY/HAVING truth over exploded grams;
    # 1/1024 is dyadic (exact floor in any engine)
    o["ngram_heavy_hitters"] = f"""
WITH g AS (SELECT unnest(x) AS gram
           FROM (SELECT list_transform(range(1, greatest(len(toks), 1)),
                        i -> array_to_string(toks[CAST(i AS INT) : CAST(i AS INT) + 1], ' ')) AS x
                 FROM (SELECT {_TOKENS} AS toks FROM documents)
                 WHERE len(toks) >= 2)),
n AS (SELECT count(*) AS c FROM g)
SELECT gram, CAST(count(*) AS BIGINT) AS cnt,
       floor((count(*) / (SELECT CAST(c AS DOUBLE) FROM n)) * 10000 + 0.5) / 10000 AS frac
FROM g GROUP BY gram
HAVING count(*) > (SELECT CAST(floor(c * 0.0009765625) AS BIGINT) FROM n)
"""

    o["hll_distinct_rollup"] = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(DISTINCT (epoch_ns(ts) // 86400000000000)) AS n_days,
       true AS within_tol
FROM events
GROUP BY event_type
"""

    # correlations: HUGEINT sums mirror Spark's DECIMAL(38,0) folds (both
    # exact integers; the ->DOUBLE cast is correctly rounded in both
    # engines), min-recentering mirrors the long subtraction
    _CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
    _corr_pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    _corr_sel = ", ".join(
        f"CAST(round({c} * 10000) AS BIGINT) - m.m_{c} AS d_{c}" for c in _CORR_COLS
    )
    _corr_mins = ", ".join(
        f"min(CAST(round({c} * 10000) AS BIGINT)) AS m_{c}" for c in _CORR_COLS
    )
    _corr_aggs = ", ".join(
        f"CAST(count(*) AS BIGINT) AS n_{a}__{b}, "
        f"sum(CAST(d_{a} AS HUGEINT)) AS sx_{a}__{b}, "
        f"sum(CAST(d_{b} AS HUGEINT)) AS sy_{a}__{b}, "
        f"sum(CAST(d_{a} * d_{a} AS HUGEINT)) AS sxx_{a}__{b}, "
        f"sum(CAST(d_{b} * d_{b} AS HUGEINT)) AS syy_{a}__{b}, "
        f"sum(CAST(d_{a} * d_{b} AS HUGEINT)) AS sxy_{a}__{b}"
        for a, b in _corr_pairs
    )
    _corr_rows = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n_{a}__{b} AS n,
       CASE WHEN n_{a}__{b} >= 2
             AND CAST(n_{a}__{b} AS DOUBLE) * CAST(sxx_{a}__{b} AS DOUBLE)
                 - CAST(sx_{a}__{b} AS DOUBLE) * CAST(sx_{a}__{b} AS DOUBLE) > 0
             AND CAST(n_{a}__{b} AS DOUBLE) * CAST(syy_{a}__{b} AS DOUBLE)
                 - CAST(sy_{a}__{b} AS DOUBLE) * CAST(sy_{a}__{b} AS DOUBLE) > 0
            THEN floor(((CAST(n_{a}__{b} AS DOUBLE) * CAST(sxy_{a}__{b} AS DOUBLE)
                         - CAST(sx_{a}__{b} AS DOUBLE) * CAST(sy_{a}__{b} AS DOUBLE))
                        / (sqrt(CAST(n_{a}__{b} AS DOUBLE) * CAST(sxx_{a}__{b} AS DOUBLE)
                                - CAST(sx_{a}__{b} AS DOUBLE) * CAST(sx_{a}__{b} AS DOUBLE))
                           * sqrt(CAST(n_{a}__{b} AS DOUBLE) * CAST(syy_{a}__{b} AS DOUBLE)
                                  - CAST(sy_{a}__{b} AS DOUBLE) * CAST(sy_{a}__{b} AS DOUBLE))))
                       * 10000 + 0.5) / 10000 END AS corr
FROM s"""
        for a, b in _corr_pairs
    )
    o["profile_correlations"] = f"""
WITH m AS (SELECT {_corr_mins} FROM lineitem),
b AS (SELECT {_corr_sel} FROM lineitem CROSS JOIN m),
s AS (SELECT {_corr_aggs} FROM b)
{_corr_rows}
"""

    # PSI drift: 7 buckets (6 bounds + inf), add-one smoothing keeps every
    # operand integral; k=7 appears in the denominators
    o["drift_psi"] = """
WITH led AS (
  SELECT doc_id,
         CASE WHEN n_chars <= 128.0 THEN 128.0 WHEN n_chars <= 192.0 THEN 192.0
              WHEN n_chars <= 256.0 THEN 256.0 WHEN n_chars <= 320.0 THEN 320.0
              WHEN n_chars <= 384.0 THEN 384.0 WHEN n_chars <= 448.0 THEN 448.0
              ELSE CAST('infinity' AS DOUBLE) END AS le
  FROM documents
),
axis AS (SELECT unnest([128.0, 192.0, 256.0, 320.0, 384.0, 448.0,
                        CAST('infinity' AS DOUBLE)]) AS le),
ha AS (SELECT le, CAST(count(*) AS BIGINT) AS cnt_a FROM led
       WHERE doc_id % 2 = 0 GROUP BY le),
hb AS (SELECT le, CAST(count(*) AS BIGINT) AS cnt_b FROM led
       WHERE doc_id % 2 = 1 GROUP BY le),
j AS (
  SELECT a.le, coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
  FROM axis a LEFT JOIN ha USING (le) LEFT JOIN hb USING (le)
),
t AS (SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb FROM j),
e AS (
  SELECT j.le, j.cnt_a, j.cnt_b,
         CAST(j.cnt_a + 1 AS DOUBLE) / CAST(t.na + 7 AS DOUBLE) AS p,
         CAST(j.cnt_b + 1 AS DOUBLE) / CAST(t.nb + 7 AS DOUBLE) AS q
  FROM j CROSS JOIN t
),
terms AS (
  SELECT le, cnt_a, cnt_b,
         floor(p * 10000 + 0.5) / 10000 AS p_a,
         floor(q * 10000 + 0.5) / 10000 AS p_b,
         floor(((p - q) * ln(p / q)) * 10000 + 0.5) / 10000 AS psi_term
  FROM e
),
tot AS (
  SELECT floor((sum(CAST(round(psi_term * 10000) AS BIGINT)) / 10000.0)
               * 10000 + 0.5) / 10000 AS psi_total
  FROM terms
)
SELECT terms.*, tot.psi_total FROM terms CROSS JOIN tot
"""

    _prof = """
SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({e}) AS n_nulls,
       CAST(count(DISTINCT {e}) AS BIGINT) AS n_distinct,
       CAST(min({e}) AS VARCHAR) AS min_val,
       CAST(max({e}) AS VARCHAR) AS max_val
FROM lineitem"""
    o["profile_columns"] = "\nUNION ALL\n".join(
        _prof.format(c=c, e=e)
        for c, e in [
            ("l_orderkey", "l_orderkey"),
            ("l_linenumber", "l_linenumber"),
            ("l_returnflag", "l_returnflag"),
            ("l_linestatus", "l_linestatus"),
            ("l_shipdate", "CAST(l_shipdate AS DATE)"),
        ]
    )
    return o
