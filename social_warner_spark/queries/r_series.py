"""R-series — reference-semantics parity queries (SURVEY.md §2.d).

Each query exercises the transform operators that re-express the reference's
pandas pipeline (A-series) and its pushed-down analytic-query semantics
(B-series).  Oracles are DuckDB SQL over the same parquet views.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from social_warner_spark.operators import (
    scrub_sentinel_rows,
    project_columns,
    union_pages,
)
from social_warner_spark.operators.datemacro import eval_date_macro
from social_warner_spark.operators.nested import dynamic_pivot_map
from social_warner_spark.queries.common import ANCHOR_DATE, ISO_FMT_DUCK, ISO_FMT_SPARK, T, r2


def r1_scrub_project(spark, sf_dir):
    """A5 any-column scrub + A6 projection (reference data_transform.py:24,31)."""
    ev = T(spark, sf_dir, "events")
    return project_columns(
        scrub_sentinel_rows(ev, sentinel="error"), ["event_id", "event_type", "value"]
    )


def r2_cast_fill(spark, sf_dir):
    """A7 typed cast with null-fill (reference data_transform.py:34-44)."""
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        F.coalesce(k.try_cast("long"), F.lit(0)).alias("k_int"),
        F.coalesce(F.col("value").try_cast("double"), F.lit(0.0)).alias("value_filled"),
    )


def r3_pivot(spark, sf_dir):
    """A8/A9 nested map pivot + A12 sanitize (data_transform.py:50-59,152-173).

    props is JSON → map; dynamic pivot to `props.k` column; rename `.`→`&`.
    """
    ev = T(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        F.from_json("props", "map<string,bigint>").alias("props_map"),
    )
    pivoted = dynamic_pivot_map(m, "props_map")
    # pivoted columns are the bare keys; qualify + sanitize: k → props&k
    keys = [c for c in pivoted.columns if c != "event_id"]
    return pivoted.select(
        "event_id", *[F.col(f"`{k}`").alias(f"props&{k}") for k in keys]
    )


def r4_datefmt(spark, sf_dir):
    """A10 date→string + A11 timestamp→ISO (data_transform.py:71-76)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_str"),
        F.date_format("o_orderdate", ISO_FMT_SPARK).alias("o_date_iso"),
    )


def r5_datemacro(spark, sf_dir):
    """A4 macro eval feeding a partition-prunable date filter (B6)."""
    cutoff = eval_date_macro(
        "{{nDaysAgo 365}}", anchor=dt.date.fromisoformat(ANCHOR_DATE)
    )
    o = T(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp_ntz"))
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
    )


def r6_in_between_agg(spark, sf_dir):
    """B4 IN + B5 BETWEEN + B1/B2 grouped metric aggregation."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_shipdate").between("1997-01-01", "1998-12-31 23:59:59")
        )
        .groupBy("l_returnflag")
        .agg(r2(F.sum("l_extendedprice")).alias("sum_extprice"), F.count("*").alias("cnt"))
    )


def r7_meta_dimensions(spark, sf_dir):
    """B1-B3: metrics + group_by + meta-dimension attach (broadcast join)."""
    o = T(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        r2(F.sum("o_totalprice")).alias("sum_totalprice"), F.count("*").alias("cnt")
    )
    dim = (
        o.select("o_orderstatus").distinct()
        .withColumn("status_desc", F.concat(F.lit("status_"), F.col("o_orderstatus")))
    )
    return agg.join(F.broadcast(dim), "o_orderstatus").select(
        "o_orderpriority", "o_orderstatus", "sum_totalprice", "cnt", "status_desc"
    )


def r8_union_pages(spark, sf_dir):
    """A2 union-all of 'pages' (pd.concat parity, data_extract.py:94)."""
    o = T(spark, sf_dir, "orders")
    pages = [o.where(F.col("o_orderkey") % 3 == i) for i in range(3)]
    return union_pages(pages).agg(
        F.count("*").alias("cnt"), r2(F.sum("o_totalprice")).alias("total")
    )


QUERIES = {
    "r1_scrub_project": r1_scrub_project,
    "r2_cast_fill": r2_cast_fill,
    "r3_pivot": r3_pivot,
    "r4_datefmt": r4_datefmt,
    "r5_datemacro": r5_datemacro,
    "r6_in_between_agg": r6_in_between_agg,
    "r7_meta_dimensions": r7_meta_dimensions,
    "r8_union_pages": r8_union_pages,
}

ORACLES = {
    "r1_scrub_project": """
        SELECT event_id, event_type, value FROM events
        WHERE NOT (coalesce(event_type = 'error', FALSE) OR coalesce(props = 'error', FALSE))
    """,
    "r2_cast_fill": """
        SELECT event_id,
               coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_int,
               coalesce(value, 0.0) AS value_filled
        FROM events
    """,
    "r3_pivot": """
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS "props&k"
        FROM events
    """,
    "r4_datefmt": f"""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
               strftime(o_orderdate, '{ISO_FMT_DUCK}') AS o_date_iso
        FROM orders
    """,
    "r5_datemacro": f"""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{ANCHOR_DATE} 00:00:00' - INTERVAL 365 DAY
    """,
    "r6_in_between_agg": """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice), 2) AS sum_extprice,
               COUNT(*) AS cnt
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1998-12-31 23:59:59'
        GROUP BY l_returnflag
    """,
    "r7_meta_dimensions": """
        SELECT o_orderpriority, o_orderstatus,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
               COUNT(*) AS cnt,
               'status_' || o_orderstatus AS status_desc
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    """,
    "r8_union_pages": """
        SELECT COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total FROM orders
    """,
}
