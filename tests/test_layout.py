"""Bucketing removes the shuffle from fact-fact joins — the core 100 TB
layout claim, asserted on the physical plan."""

from __future__ import annotations

import contextlib
import io

import pytest

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table
from social_warner_spark.layout import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    l = spark.table(lt)
    r = spark.table(rt)
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, l.o_orderkey == r.l_orderkey).groupBy("o_orderstatus").count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # co-located buckets: no Exchange below the join
        assert "Exchange" not in join_section, join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    # and the result is correct
    total = joined.agg(F.sum("count")).first()[0]
    assert total == spark.table(rt).join(
        spark.table(lt), spark.table(rt).l_orderkey == spark.table(lt).o_orderkey
    ).count()
