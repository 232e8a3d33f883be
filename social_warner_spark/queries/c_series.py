"""C-series — core relational operator inventory (SURVEY.md §2.d C1-C25).

All built-in DataFrame API; comments note the expected physical plan so the
bench/EXPLAIN pass can assert it (broadcast vs shuffle, pushed filters).
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import ANCHOR_DATE, T, r2, r6


# --- scans / filters / joins -------------------------------------------------

def c1_scan_filter(spark, sf_dir):
    """Conjunctive predicate → pushed to parquet scan (PushedFilters)."""
    li = T(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def c2_inner_join(spark, sf_dir):
    """orders ⋈ customer — no explicit broadcast hint: customer scales
    with SF, so the side choice belongs to AQE/autoBroadcastJoinThreshold
    (an explicit hint is honored regardless of size and would OOM at
    100 TB — r05 verdict)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


def c3_star_join(spark, sf_dir):
    """Star join: fact ⋈ three dims; revenue by region.  nation/region
    are constant-size (25/5 rows) → hinted; customer scales with SF →
    hint left to AQE (r05 verdict)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def c4_left_outer(spark, sf_dir):
    """customer ⟕ orders; count(o_orderkey) counts non-null → zero for
    order-less customers."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


def c5_semi_join(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def c6_anti_join(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


def c7_range_join(spark, sf_dir):
    """Non-equi self join: equi key (user_id) + range predicate on ts.
    Plans as SMJ on user_id with the range as a join condition residual."""
    e = T(spark, sf_dir, "events")
    e1 = e.select(
        F.col("user_id"), F.col("ts").alias("ts1"), F.col("event_id").alias("a_id")
    )
    e2 = e.select(
        F.col("user_id"), F.col("ts").alias("ts2"), F.col("event_id").alias("b_id")
    )
    return (
        e1.join(
            e2,
            ["user_id"],
        )
        .where(
            (F.col("ts2") >= F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("a_id") < F.col("b_id"))
        )
        .select("user_id", "a_id", "b_id")
    )


# --- aggregation -------------------------------------------------------------

def c8_hash_agg(spark, sf_dir):
    """TPC-H Q1 shape: partial+final hash aggregate, map-side combine."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
        r6(F.avg("l_quantity")).alias("avg_qty"),
        r6(F.avg("l_extendedprice")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


def c9_count_distinct(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("cust_cnt")
    )


def c10_rollup(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        r2(F.sum("o_totalprice")).alias("sum_totalprice")
    )


def c11_cube(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


def c12_having(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("_avg"))
        .where(F.col("_avg") > 150000)
        .select("o_orderstatus", r6(F.col("_avg")).alias("avg_price"))
    )


# --- windows -----------------------------------------------------------------

def c13_ranking_windows(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


def c14_lag_lead(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


def c15_frame_windows(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    centered = w.rowsBetween(-2, 2)
    return e.select(
        "event_id",
        "user_id",
        r6(F.sum("value").over(running)).alias("running_sum"),
        r6(F.avg("value").over(centered)).alias("moving_avg"),
    )


# --- sort / limit / set ops --------------------------------------------------

def c16_topk(spark, sf_dir):
    """Sort+limit → TakeOrderedAndProject (no full sort materialization)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def _status_keys(spark, sf_dir, status):
    return (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == status)
        .select("o_custkey")
    )


def c17a_union(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").union(_status_keys(spark, sf_dir, "O")).distinct()


def c17b_intersect(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").intersect(_status_keys(spark, sf_dir, "O"))


def c17c_except(spark, sf_dir):
    # subtract == SQL EXCEPT (set difference with distinct), unlike exceptAll
    return _status_keys(spark, sf_dir, "F").subtract(_status_keys(spark, sf_dir, "O"))


# --- scalar functions --------------------------------------------------------

def c18_string_fns(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.regexp_replace("p_name", "a", "X").alias("name_repl"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


def c19_date_fns(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
    )


def c20_math_fns(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        r6(F.abs(F.col("l_discount") - 0.03)).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
        r6(F.pow("l_quantity", 2)).alias("qty_sq"),
    )


# --- arrays / maps / json / explode ------------------------------------------

def c21_array_fns(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws("|", F.array_sort(F.slice(toks, 1, 5))).alias("first5_sorted"),
    )


def c22_map_json_fns(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.concat_ws("|", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.get_json_object("props", "$.k").alias("k_str"),
        m.getItem("k").alias("k_val"),
    )


def c23_explode_wordcount(spark, sf_dir):
    """explode → groupBy count → top 20.  Generator + partial agg; the
    explode happens before the shuffle so only (word, partial count) moves."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


# --- subquery / UDF ----------------------------------------------------------

def c24_decorrelated_subquery(spark, sf_dir):
    """Orders above their customer's average — the decorrelated join-agg
    form of a correlated scalar subquery (Catalyst's rewrite, written out)."""
    o = T(spark, sf_dir, "orders")
    avg_by_cust = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(avg_by_cust, "o_custkey")
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey")
    )


def c25_pandas_udf(spark, sf_dir):
    """Vectorized (Arrow) pandas UDF parity: parse {{nDaysAgo N}} macro
    strings (reference data_extract.py:109-126) and resolve against the
    fixed anchor.  Oracled by the equivalent SQL date arithmetic."""
    import pandas as pd  # noqa: F811

    @F.pandas_udf("int")
    def macro_days(s: pd.Series) -> pd.Series:
        return s.str.extract(r"\{\{\s*nDaysAgo\s+(\d+)\s*\}\}", expand=False).astype("Int64")

    o = T(spark, sf_dir, "orders")
    macro = F.concat(F.lit("{{nDaysAgo "), (F.col("o_orderkey") % 400).cast("string"), F.lit("}}"))
    days = macro_days(macro)
    return o.select(
        "o_orderkey",
        days.alias("n_days"),
        F.date_format(
            F.date_sub(F.lit(ANCHOR_DATE).cast("date"), days), "yyyy-MM-dd"
        ).alias("resolved_date"),
    )


QUERIES = {
    "c1_scan_filter": c1_scan_filter,
    "c2_inner_join": c2_inner_join,
    "c3_star_join": c3_star_join,
    "c4_left_outer": c4_left_outer,
    "c5_semi_join": c5_semi_join,
    "c6_anti_join": c6_anti_join,
    "c7_range_join": c7_range_join,
    "c8_hash_agg": c8_hash_agg,
    "c9_count_distinct": c9_count_distinct,
    "c10_rollup": c10_rollup,
    "c11_cube": c11_cube,
    "c12_having": c12_having,
    "c13_ranking_windows": c13_ranking_windows,
    "c14_lag_lead": c14_lag_lead,
    "c15_frame_windows": c15_frame_windows,
    "c16_topk": c16_topk,
    "c17a_union": c17a_union,
    "c17b_intersect": c17b_intersect,
    "c17c_except": c17c_except,
    "c18_string_fns": c18_string_fns,
    "c19_date_fns": c19_date_fns,
    "c20_math_fns": c20_math_fns,
    "c21_array_fns": c21_array_fns,
    "c22_map_json_fns": c22_map_json_fns,
    "c23_explode_wordcount": c23_explode_wordcount,
    "c24_decorrelated_subquery": c24_decorrelated_subquery,
    "c25_pandas_udf": c25_pandas_udf,
}

ORACLES = {
    "c1_scan_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06
    """,
    "c2_inner_join": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "c3_star_join": """
        SELECT r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "c4_left_outer": """
        SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "c5_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    "c6_anti_join": """
        SELECT p_partkey, p_name FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey)
    """,
    "c7_range_join": """
        SELECT e1.user_id AS user_id, e1.event_id AS a_id, e2.event_id AS b_id
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
         AND e1.event_id < e2.event_id
    """,
    "c8_hash_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "c9_count_distinct": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS cust_cnt
        FROM orders GROUP BY o_orderstatus
    """,
    "c10_rollup": """
        SELECT o_orderstatus, o_orderpriority, ROUND(SUM(o_totalprice), 2) AS sum_totalprice
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "c11_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "c12_having": """
        SELECT o_orderstatus, ROUND(AVG(o_totalprice), 6) AS avg_price
        FROM orders GROUP BY o_orderstatus
        HAVING AVG(o_totalprice) > 150000
    """,
    "c13_ranking_windows": """
        SELECT o_orderkey, o_custkey,
               CAST(ROW_NUMBER() OVER w AS INT) AS rn,
               CAST(RANK() OVER w AS INT) AS rk,
               CAST(DENSE_RANK() OVER w AS INT) AS drk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "c14_lag_lead": """
        SELECT event_id, user_id,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "c15_frame_windows": """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_sum,
               ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS moving_avg
        FROM events
    """,
    "c16_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "c17a_union": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "c17b_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "c17c_except": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "c18_string_fns": """
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               SUBSTR(p_name, 1, 5) AS name_pfx,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               TRIM('  x  ') AS trimmed,
               REGEXP_REPLACE(p_name, 'a', 'X', 'g') AS name_repl,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word
        FROM part
    """,
    "c19_date_fns": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT) AS yr,
               CAST(MONTH(o_orderdate) AS INT) AS mo,
               CAST(DAY(o_orderdate) AS INT) AS dom,
               strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
               CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
        FROM orders
    """,
    "c20_math_fns": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 1) AS price_r1,
               ROUND(ABS(l_discount - 0.03), 6) AS disc_dev,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               l_linenumber % 3 AS ln_mod3,
               ROUND(POWER(l_quantity, 2), 6) AS qty_sq
        FROM lineitem
    """,
    "c21_array_fns": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               array_to_string(list_sort(string_split(text, ' ')[1:5]), '|') AS first5_sorted
        FROM documents
    """,
    "c22_map_json_fns": """
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), '|') AS keys_sorted,
               json_extract_string(props, '$.k') AS k_str,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    "c23_explode_wordcount": """
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY cnt DESC, word LIMIT 20
    """,
    "c24_decorrelated_subquery": """
        SELECT o_orderkey FROM orders o
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i
                              WHERE i.o_custkey = o.o_custkey)
    """,
    "c25_pandas_udf": f"""
        SELECT o_orderkey,
               CAST(o_orderkey % 400 AS INT) AS n_days,
               strftime(DATE '{ANCHOR_DATE}' - CAST(o_orderkey % 400 AS INT) * INTERVAL 1 DAY,
                        '%Y-%m-%d') AS resolved_date
        FROM orders
    """,
}
