"""Second extension batch: as-of join, UDAF surface, exact percentiles.

Split from x_series.py only to keep modules reviewable; registered through
queries/__init__ like every other series.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F

from social_warner_spark.operators.asof import asof_join
from social_warner_spark.queries.common import T, TS_FMT_MICRO_DUCK, TS_FMT_MICRO_SPARK, r6


def x10_asof_join(spark, sf_dir):
    """As-of join: for each 'click' event, the most recent 'purchase' value
    by the same user at or before the click (union-and-carry-forward plan;
    see operators/asof.py).  Oracle: DuckDB's native ASOF JOIN."""
    e = T(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(clicks, purchases, on="user_id", value_cols=["purchase_value"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_MICRO_SPARK).alias("click_ts"),
        F.col("purchase_value_asof").alias("last_purchase_value"),
    )


def x11_grouped_pandas_udaf(spark, sf_dir):
    """UDAF surface: quantity-weighted average price per return flag as an
    Arrow grouped-agg pandas UDF (the sanctioned custom-aggregate path —
    partial aggregation is not available to Python UDAFs, so groups ship
    whole; keep cardinality high / groups bounded at scale)."""

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(wavg("l_extendedprice", "l_quantity")).alias("weighted_avg_price")
    )


def x12_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (the anchor for approx_percentile,
    which is tolerance-tested in tests/test_approx.py)."""
    li = T(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.groupBy("l_returnflag").agg(
        r6(F.element_at(pct, 1)).alias("p25"),
        r6(F.element_at(pct, 2)).alias("p50"),
        r6(F.element_at(pct, 3)).alias("p75"),
    )


def x13_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): totals by status, by
    priority, and overall, in one aggregation pass (SQL surface)."""
    from social_warner_spark.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
               COUNT(*) AS cnt
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def x14_time_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup (continuous-aggregate
    pattern): hour and day buckets in one result, tagged by granularity.
    At scale each granularity materializes incrementally from the finer
    one; here both derive from the same scan and union cheaply."""
    e = T(spark, sf_dir, "events")

    def bucketed(gran: str, trunc_unit: str):
        return (
            e.groupBy(F.date_trunc(trunc_unit, "ts").alias("bucket"), "event_type")
            .agg(r6(F.sum("value")).alias("sum_value"), F.count("*").alias("cnt"))
            .select(
                F.lit(gran).alias("granularity"),
                F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
                "event_type",
                "sum_value",
                "cnt",
            )
        )

    return bucketed("hour", "hour").unionByName(bucketed("day", "day"))


QUERIES = {
    "x10_asof_join": x10_asof_join,
    "x11_grouped_pandas_udaf": x11_grouped_pandas_udaf,
    "x12_percentiles": x12_percentiles,
    "x13_grouping_sets": x13_grouping_sets,
    "x14_time_rollup": x14_time_rollup,
}

ORACLES = {
    "x10_asof_join": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
            SELECT user_id, ts, value AS purchase_value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT c.event_id, c.user_id,
               strftime(c.ts, '{TS_FMT_MICRO_DUCK}') AS click_ts,
               p.purchase_value AS last_purchase_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    "x11_grouped_pandas_udaf": """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
                   AS weighted_avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "x12_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "x13_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
               COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "x14_time_rollup": """
        SELECT 'hour' AS granularity,
               strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type, ROUND(SUM(value), 6) AS sum_value, COUNT(*) AS cnt
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'day' AS granularity,
               strftime(DATE_TRUNC('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type, ROUND(SUM(value), 6) AS sum_value, COUNT(*) AS cnt
        FROM events GROUP BY 2, 3
    """,
}
