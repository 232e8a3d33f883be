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


def test_date_partitioned_facts_prune(spark, sf_smoke, tmp_path):
    """The r5/r6/c19 filter shapes (date BETWEEN / range) must become
    PartitionFilters — directory-level pruning, zero data bytes for
    excluded dates — when facts are laid out date-partitioned."""
    from social_warner_spark.layout import write_partitioned

    ev = load_table(spark, sf_smoke, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    target = str(tmp_path / "events_by_date")
    write_partitioned(ev, target, ["event_date"])
    part = spark.read.parquet(target)

    n_days = part.select("event_date").distinct().count()
    assert n_days > 3, "fixture must span multiple partitions"

    lo, hi = "2024-01-03", "2024-01-04"
    q = part.where(F.col("event_date").between(lo, hi))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the BETWEEN lands in PartitionFilters (directory pruning), NOT as a
    # data filter the scan has to evaluate per row
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0], plan
    assert "2024-01-03" in pf[0] and "2024-01-04" in pf[0], pf[0]
    # pruned result matches the unpartitioned filter exactly
    expected = ev.where(F.to_date("ts").between(lo, hi)).count()
    assert q.count() == expected > 0


def test_date_partitioned_lineitem_prunes_ship_month(spark, sf_smoke, tmp_path):
    """Month-partitioned lineitem: an r6-style date range prunes to the
    covering months at plan time."""
    from social_warner_spark.layout import write_partitioned

    li = load_table(spark, sf_smoke, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    target = str(tmp_path / "lineitem_by_month")
    write_partitioned(li, target, ["ship_month"])
    part = spark.read.parquet(target)

    q = part.where(F.col("ship_month") == "1994-03").agg(
        F.sum("l_quantity").alias("qty")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "ship_month" in pf[0] and "1994-03" in pf[0], plan
    got = q.first()["qty"]
    want = li.where(F.date_format("l_shipdate", "yyyy-MM") == "1994-03").agg(
        F.sum("l_quantity")
    ).first()[0]
    assert got == want
