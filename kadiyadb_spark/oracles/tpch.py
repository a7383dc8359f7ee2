"""DuckDB oracle SQL for the driver correctness gate — the 22 TPC-H relational benchmark queries.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations



def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       floor((sum(CAST(round((l_quantity) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS sum_qty,
       floor((sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS sum_base_price,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS sum_disc_price,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000) AS BIGINT)) / 1000000.0) * 10000 + 0.5) / 10000 AS sum_charge,
       floor((sum(CAST(round(l_quantity * 10000) AS BIGINT))
              / (10000.0 * count(l_quantity))) * 10000 + 0.5) / 10000 AS avg_qty,
       floor((sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
              / (10000.0 * count(l_extendedprice))) * 10000 + 0.5) / 10000 AS avg_price,
       floor((sum(CAST(round(l_discount * 10000) AS BIGINT))
              / (10000.0 * count(l_discount))) * 10000 + 0.5) / 10000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    o["q3_top_revenue_orders"] = """
SELECT o_orderkey,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       strftime(any_value(o_orderdate), '%Y-%m-%d') AS orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

    o["q5_local_supplier_volume"] = """
SELECT n_name,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

    o["q6_selective_scan"] = """
SELECT floor((sum(CAST(round((l_extendedprice * l_discount) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

    o["q14_promo_ratio"] = """
SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)
                               ELSE 0 END)
              / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT))) * 10000 + 0.5) / 10000 AS promo_pct,
       sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS total_revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""

    o["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sq FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       floor(o_totalprice * 10000 + 0.5) / 10000 AS totalprice,
       floor(sq * 10000 + 0.5) / 10000 AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""

    o["q19_disjunctive"] = """
SELECT floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

    o["q7_nation_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""

    o["q10_returned_items"] = """
SELECT c_custkey, c_name,
       sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS revenue,
       floor(c_acctbal * 10000 + 0.5) / 10000 AS acctbal,
       n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) DESC, c_custkey ASC
LIMIT 20
"""

    o["q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       floor((sum(CASE WHEN n2.n_name = 'NATION_3'
                       THEN CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)
                       ELSE 0 END)
              / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT))) * 10000 + 0.5) / 10000 AS mkt_share,
       sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS total_vol
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""

    o["q13_order_distribution"] = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
"""

    o["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""

    o["q17_small_quantity"] = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
thresh AS (
  SELECT l_partkey AS ak,
         floor((sum(CAST(round(l_quantity * 10000) AS BIGINT))
                / (10000.0 * count(l_quantity)) * 0.2) * 10000 + 0.5) / 10000 AS q_thresh
  FROM lp GROUP BY l_partkey
)
SELECT floor((sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) / 70000.0) * 10000 + 0.5) / 10000 AS avg_yearly
FROM lp JOIN thresh ON l_partkey = ak
WHERE l_quantity < q_thresh
"""

    o["q22_waiting_customers"] = """
WITH ab AS (
  SELECT floor((sum(CAST(round(c_acctbal * 10000) AS BIGINT))
                / (10000.0 * count(c_acctbal))) * 10000 + 0.5) / 10000 AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS numcust,
       floor((sum(CAST(round((c_acctbal) * 10000) AS BIGINT)) / 10000.0) * 10000 + 0.5) / 10000 AS totacctbal
FROM customer, ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""

    o["q2_min_cost_supplier"] = """
WITH cost AS (
  SELECT p_partkey, l_suppkey,
         floor((min(l_extendedprice / l_quantity)) * 10000 + 0.5) / 10000 AS unit_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
  GROUP BY p_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM cost c
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE unit_cost = (SELECT min(unit_cost) FROM cost c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

    o["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(epoch_us(l.l_shipdate) AS BIGINT)
                    - CAST(epoch_us(o.o_orderdate) AS BIGINT) >= 30 * 86400000000)
GROUP BY o_orderpriority
"""

    o["q9_product_profit"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       floor((sum(CAST(round((l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)
                             * 10000) AS BIGINT)) / 10000.0)
             * 10000 + 0.5) / 10000 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""

    o["q11_important_stock"] = """
WITH per AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS _cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, _cents / 100.0 AS value
FROM per
WHERE _cents * 1000 > (SELECT sum(_cents) FROM per)
"""

    o["q12_shipmode"] = """
SELECT CASE WHEN CAST(epoch_us(l_shipdate) AS BIGINT) - CAST(epoch_us(o_orderdate) AS BIGINT)
                 > 90 * 86400000000 THEN 'SLOW'
            WHEN CAST(epoch_us(l_shipdate) AS BIGINT) - CAST(epoch_us(o_orderdate) AS BIGINT)
                 > 30 * 86400000000 THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""

    o["q16_supplier_relation"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

    o["q20_potential_promotion"] = """
WITH per AS (
  SELECT l_suppkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, n_name, sum_qty
FROM per
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * sum_qty * (SELECT count(*) FROM per) > 3 * (SELECT sum(sum_qty) FROM per)
"""

    o["q21_waiting_suppliers"] = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND CAST(epoch_us(l_shipdate) AS BIGINT)
        - CAST(epoch_us(o_orderdate) AS BIGINT) >= 60 * 86400000000
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""
    return o
