"""SQL passthrough series: engine-portable ANSI SQL executed VERBATIM by
both Spark SQL and the DuckDB oracle — the strongest form of the parity
claim (one query text, two engines, identical results).

Restricted to the portable ANSI subset (no engine-specific date formatting
or list functions).  TPC-H-shaped composites over the testdata star schema.
"""

from __future__ import annotations

from social_warner_spark.catalog import register_views

SQL_QUERIES: dict[str, str] = {
    # TPC-H Q1 shape (pricing summary report)
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    # TPC-H Q3 shape (shipping priority, top-10 revenue orders)
    "q3_shipping_priority": """
        SELECT o_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    # TPC-H Q6 shape (forecast revenue change: tight scan-side filters)
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    # TPC-H Q10 shape (returned-item reporting: top-20 customers by lost revenue)
    "q10_returned_items": """
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # TPC-H Q14 shape (promotion effect: conditional aggregation)
    "q14_promo_effect": """
        SELECT ROUND(
                 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                       / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    # TPC-H Q4 shape (order priority checking: EXISTS subquery)
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o.o_orderkey
                  AND l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    # TPC-H Q17 shape (small-quantity revenue: correlated scalar subquery)
    "q17_small_quantity_revenue": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = (SELECT MIN(p_brand) FROM part)
          AND l_quantity < (
                SELECT 0.2 * AVG(l_quantity) FROM lineitem
                WHERE l_partkey = l.l_partkey
          )
    """,
    # TPC-H Q5 shape (local supplier volume by nation)
    "q5_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey   = o_custkey
        JOIN lineitem ON l_orderkey  = o_orderkey
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    # TPC-H Q2 shape (min-cost supplier: correlated MIN subquery over a
    # 4-way join; no partsupp in the testdata so unit price from lineitem
    # stands in for ps_supplycost — same correlated-scalar plan shape).
    # The equality on a float is safe cross-engine: both sides evaluate the
    # identical division on identical inputs and MIN selects (not sums).
    "q2_min_price_supplier": """
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM part
        JOIN lineitem ON p_partkey   = l_partkey
        JOIN supplier ON s_suppkey   = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_type = 'LARGE'
          AND p_size BETWEEN 20 AND 30
          AND r_name = 'EUROPE'
          AND l_extendedprice / l_quantity = (
                SELECT MIN(l2.l_extendedprice / l2.l_quantity)
                FROM lineitem l2
                JOIN supplier s2 ON s2.s_suppkey   = l2.l_suppkey
                JOIN nation   n2 ON s2.s_nationkey = n2.n_nationkey
                JOIN region   r2 ON n2.n_regionkey = r2.r_regionkey
                WHERE l2.l_partkey = p_partkey
                  AND r2.r_name = 'EUROPE'
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    # TPC-H Q7 shape (volume shipping: nation-pair OR predicate, year rollup)
    "q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey   = l_suppkey
            JOIN orders   ON o_orderkey  = l_orderkey
            JOIN customer ON c_custkey   = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    # TPC-H Q8 shape (national market share: CASE-guarded share of volume)
    "q8_market_share": """
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey   = l_partkey
            JOIN supplier ON s_suppkey   = l_suppkey
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN customer ON o_custkey   = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    # TPC-H Q9 shape (product-type profit by nation and year; retail price
    # stands in for ps_supplycost as the cost leg)
    "q9_product_profit": """
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey   = l_partkey
            JOIN supplier ON s_suppkey   = l_suppkey
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    # TPC-H Q11 shape (important stock: HAVING against a scalar subquery).
    # Threshold on SUM(l_quantity): quantities are integer-valued doubles so
    # both engines sum them exactly — no float-boundary flakiness.
    "q11_important_parts": """
        SELECT l_partkey,
               ROUND(SUM(l_quantity), 2) AS part_qty
        FROM lineitem
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
        GROUP BY l_partkey
        HAVING SUM(l_quantity) > (
            SELECT 0.0005 * SUM(l_quantity)
            FROM lineitem
            JOIN supplier ON l_suppkey   = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
        )
        ORDER BY part_qty DESC, l_partkey
    """,
    # TPC-H Q12 shape (shipping-priority line counts via CASE aggregation;
    # returnflag stands in for shipmode)
    "q12_priority_shipping": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    # TPC-H Q13 shape (customer order-count distribution: filtered LEFT
    # JOIN under a two-level aggregation)
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    # TPC-H Q15 shape (top supplier: CTE + scalar MAX equality). Revenue is
    # rounded to cents INSIDE the CTE so the equality compares stable values
    # even if the CTE is recomputed with a different partial-agg order.
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    # TPC-H Q16 shape (supplier breadth per brand/type/size: COUNT DISTINCT
    # with a NOT IN exclusion subquery)
    "q16_supplier_breadth": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    # TPC-H Q18 shape (large-volume orders: IN over a grouped HAVING).
    # Quantity sums are exact (integer-valued doubles) so the >300 cut is
    # deterministic in both engines.
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey  = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    # TPC-H Q19 shape (discounted revenue: disjunction of banded predicates
    # that must still push the part filter into the join)
    "q19_banded_revenue": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    # TPC-H Q20 shape (promotion-part suppliers: nested IN subqueries with a
    # grouped quantity threshold)
    "q20_part_promotion_suppliers": """
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
                )
                GROUP BY l_suppkey, l_partkey
                HAVING SUM(l_quantity) > 50
          )
        ORDER BY s_name
    """,
    # TPC-H Q21 shape (waiting suppliers: EXISTS + NOT EXISTS against the
    # same fact table; returnflag stands in for the late-receipt predicate)
    "q21_sole_returned_supplier": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey   = l1.l_suppkey
        JOIN orders      ON o_orderkey  = l1.l_orderkey
        JOIN nation      ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_4'
          AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    # TPC-H Q22 shape (sales opportunity: substring country code, scalar AVG
    # threshold, anti-join on a filtered order subset — every customer has
    # orders in the testdata so the NOT EXISTS filters on priority instead)
    "q22_dormant_customers": """
        SELECT cntrycode, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM (
            SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
            FROM customer
            WHERE c_acctbal > (
                    SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
              )
              AND NOT EXISTS (
                    SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT'
              )
        ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
}


def _make_query(sql: str):
    def run(spark, sf_dir):
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES = {name: _make_query(sql) for name, sql in SQL_QUERIES.items()}
#: the oracle IS the same SQL text — executed verbatim by DuckDB
ORACLES = dict(SQL_QUERIES)
