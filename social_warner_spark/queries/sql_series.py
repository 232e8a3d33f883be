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
}


def _make_query(sql: str):
    def run(spark, sf_dir):
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES = {name: _make_query(sql) for name, sql in SQL_QUERIES.items()}
#: the oracle IS the same SQL text — executed verbatim by DuckDB
ORACLES = dict(SQL_QUERIES)
