"""Driver-checkable queries: the ANSI-SQL surface, as passthrough.

Each entry is ONE SQL string in the Spark∩DuckDB common dialect, executed
by ``spark.sql`` over the registered fixture views AND verbatim by the
DuckDB oracle. This demonstrates the engine's full standard-SQL surface
(SURVEY §2.2 'free wins': outer joins, set ops, subqueries, CTEs, rollup,
window functions, date/string functions) with zero translation layer —
`spark.sql(text)` → Catalyst is the whole execution story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import register_views
from hash_db_spark.queries import Query


def _passthrough(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


PASSTHROUGH: dict[str, str] = {
    # TPC-H Q6 shape: pure filter + single agg.
    "ansi_q6_filtered_agg": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    # LEFT JOIN preserving unmatched rows (NULL right side).
    "ansi_left_join": """
        SELECT c_custkey, o_orderkey
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        WHERE c_custkey <= 50
    """,
    # FULL OUTER JOIN across unrelated key spaces.
    "ansi_full_outer_join": """
        SELECT c.c_custkey, e.user_id, e.event_id
        FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 20) c
        FULL JOIN (SELECT user_id, event_id FROM events WHERE event_id <= 30) e
          ON c.c_custkey = e.user_id
    """,
    # Correlated EXISTS subquery.
    "ansi_exists_subquery": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity >= 49
        )
    """,
    # CTE + window function (lead/lag).
    "ansi_cte_window": """
        WITH daily AS (
          -- TIMESTAMP not DATE: Spark DATE reaches pandas as a date
          -- object while DuckDB DATE arrives as datetime64 — the
          -- driver's canonical forms then differ ('1995-01-01' vs
          -- '1995-01-01T00:00:00').
          SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
                 round(sum(o_totalprice), 2) AS total
          FROM orders
          WHERE o_orderdate < TIMESTAMP '1995-03-01'
          GROUP BY 1
        )
        SELECT d, total,
               lag(total) OVER (ORDER BY d) AS prev_total,
               round(sum(total) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total
        FROM daily
    """,
    # ROLLUP with grouping-set NULL rows.
    "ansi_rollup": """
        SELECT r_name, n_name, round(sum(s_acctbal), 2) AS total_bal,
               count(*) AS n_sup
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    # GROUPING() markers distinguish data-NULL from subtotal-NULL rows.
    "ansi_grouping_flags": """
        SELECT r_name, n_name,
               CAST(grouping(r_name) AS INT) AS g_r,
               CAST(grouping(n_name) AS INT) AS g_n,
               count(*) AS n_sup
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    # CUBE: all 2^k grouping sets (ROLLUP's big sibling).
    "ansi_cube": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    # INTERSECT / EXCEPT set operators.
    "ansi_intersect": """
        SELECT c_custkey AS k FROM customer
        INTERSECT
        SELECT user_id FROM events
    """,
    # customers ≤300 with no events (event user_ids top out around 150).
    "ansi_except": """
        SELECT c_custkey AS k FROM customer WHERE c_custkey <= 300
        EXCEPT
        SELECT user_id FROM events
    """,
    # Scalar subquery + CASE buckets.
    "ansi_case_buckets": """
        SELECT o_orderpriority,
               CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS bucket,
               count(*) AS n
        FROM orders
        GROUP BY 1, 2
    """,
    # Date/string function sampler.
    "ansi_date_string_funcs": """
        SELECT o_orderkey,
               CAST(extract(year FROM o_orderdate) AS INT) AS y,
               CAST(extract(month FROM o_orderdate) AS INT) AS m,
               CAST(extract(day FROM o_orderdate) AS INT) AS d,
               substr(o_orderpriority, 1, 1) AS prio_digit,
               upper(o_orderstatus) || '-' || o_orderpriority AS tag,
               CAST(length(o_orderpriority) AS INT) AS plen
        FROM orders WHERE o_orderkey <= 300
    """,
    # NTILE + dense_rank windows. Both are GLOBAL (unpartitioned) windows
    # by the operator's own semantics — a total ordering of the whole
    # input is what ntile/dense_rank mean here, so Spark necessarily
    # funnels the rows through one task. The c_custkey <= 200 predicate
    # bounds that single-task sort; at scale the pattern is to pre-bucket
    # (range-partition + per-bucket rank + offset, as insert_rows does)
    # or to accept the documented single-partition cost for small inputs.
    "ansi_ntile": """
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
                    AS INT) AS quartile,
               CAST(dense_rank() OVER (ORDER BY c_nationkey ASC) AS INT)
                    AS nation_rank
        FROM customer WHERE c_custkey <= 200
    """,
    # TPC-H Q4 shape: EXISTS-correlated priority count.
    "ansi_q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 48
          )
        GROUP BY o_orderpriority
    """,
    # TPC-H Q12 shape: CASE-split counts after a join.
    "ansi_q12_priority_split": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
                        '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    # TPC-H Q14 shape: conditional revenue share (single-row ratio).
    "ansi_q14_promo_share": """
        SELECT round(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    # Self-join: same-customer order pairs placed within 10 days.
    "ansi_self_join_pairs": """
        SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND b.o_orderkey > a.o_orderkey
         AND b.o_orderdate >= a.o_orderdate
         AND b.o_orderdate < a.o_orderdate + INTERVAL 10 DAY
        WHERE a.o_custkey <= 100
    """,
    # HAVING over a join + IN-list predicate.
    "ansi_having_in": """
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY n_name
        HAVING count(*) >= 10
    """,
    # lead/lag with deterministic ordering + defaults.
    "ansi_lead_lag": """
        SELECT o_custkey, o_orderkey,
               lag(o_orderkey, 1, -1)  OVER w AS prev_key,
               lead(o_orderkey, 1, -1) OVER w AS next_key
        FROM orders
        WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    # Explicit ROWS frame: trailing-3 moving sum per customer.
    "ansi_window_frames": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 2) AS trailing3
        FROM orders
        WHERE o_custkey <= 50
    """,
    # Correlated scalar subquery in the projection.
    "ansi_scalar_subquery": """
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
                 AS n_orders
        FROM customer
        WHERE c_custkey <= 200
    """,
    # TPC-H Q10 shape: returned-item revenue, top-20 customers (stable
    # tiebreak on the key so LIMIT is deterministic cross-engine).
    "ansi_q10_returned_items": """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    # TPC-H Q18 shape: large-volume orders via HAVING over a join.
    "ansi_q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(l_quantity) > 150
    """,
    # TPC-H Q19 shape: disjunction of conjunctive predicates across the
    # join (exercises OR-pushdown / CNF conversion).
    "ansi_q19_disjunctive_preds": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """,
    # Distribution window functions over groups.
    "ansi_percent_rank": """
        SELECT c_custkey, c_mktsegment,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM customer
        WHERE c_custkey <= 300
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC,
                     c_custkey ASC)
    """,
    # Fixed-bound histogram via explicit bucket arithmetic (DuckDB has no
    # width_bucket; floor math is engine-identical and exact).
    "ansi_value_histogram": """
        SELECT event_type,
               CAST(least(greatest(floor(value / 10.0), 0), 9) AS INT)
                 AS bucket,
               count(*) AS n
        FROM events
        GROUP BY event_type, bucket
    """,
    # TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    "ansi_q7_nation_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    # TPC-H Q2 shape: min-cost supplier per part via correlated scalar
    # subquery (no partsupp table in the fixture; lineitem price stands in).
    "ansi_q2_min_cost_supplier": """
        SELECT p_partkey, p_name, s_suppkey, s_name,
               round(l_extendedprice, 2) AS min_price
        FROM part
        JOIN lineitem ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size = 15 AND p_brand = 'Brand#3'
          AND l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
    """,
    # TPC-H Q8 shape: one nation's market share within a region by year
    # (conditional aggregation ratio).
    "ansi_q8_market_share": """
        SELECT o_year,
               round(sum(CASE WHEN nat = 'NATION_3' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nat
          FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s_nationkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON n1.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n1.n_regionkey
          WHERE r_name = 'ASIA'
        ) t
        GROUP BY o_year
    """,
    # TPC-H Q9 shape: profit by supplier nation and year for a part family.
    "ansi_q9_product_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.4 * l_quantity * p_retailprice), 2) AS profit
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)
    """,
    # TPC-H Q11 shape: HAVING against a global scalar-subquery threshold.
    "ansi_q11_important_stock": """
        SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
        HAVING sum(l_extendedprice) > (
          SELECT sum(l_extendedprice) * 0.0015
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          WHERE n_name = 'NATION_7')
    """,
    # TPC-H Q13 shape: order-count distribution including zero-order
    # customers; LEFT JOIN with a compound ON predicate.
    "ansi_q13_custdist": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON o_custkey = c_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    # TPC-H Q15 shape: CTE revenue view + max() scalar subquery.
    "ansi_q15_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    # TPC-H Q16 shape: count(DISTINCT) per part attrs with NOT IN subquery.
    "ansi_q16_supplier_cnt": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 4, 9, 14, 19, 23)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    # TPC-H Q17 shape: correlated per-part average quantity threshold.
    "ansi_q17_small_qty_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
    """,
    # TPC-H Q20 shape: IN over a grouped-HAVING subquery.
    "ansi_q20_excess_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 120)
    """,
    # TPC-H Q21 shape: EXISTS + NOT EXISTS against sibling lines of the
    # same order (adapted: latest-shipping supplier of multi-supplier 'F'
    # orders that shipped >75 days after the order date).
    "ansi_q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
    """,
    # TPC-H Q22 shape: NOT EXISTS anti-join + global avg scalar subquery,
    # grouped by a derived code column.
    "ansi_q22_idle_customers": """
        SELECT code, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT substring(c_name, length(c_name), 1) AS code,
                 c_acctbal, c_custkey
          FROM customer
          WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        ) hot
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY code
    """,
}


QUERIES = {
    name: Query(_passthrough(sql), sql) for name, sql in PASSTHROUGH.items()
}
