"""Sixth extension batch: warehouse-maintenance CDC (merge upsert,
snapshot diff) and robust-statistics operators (winsorization, fixed-bin
histograms)."""

from __future__ import annotations

import pyspark.sql.functions as F

from social_warner_spark.queries.common import T, r6

#: x45/x46 — deterministic synthetic change set over orders:
#: every 10th key gets a price bump (update), every 100th key spawns a
#: shifted new key (insert).
UPD_MOD = 10
INS_MOD = 100
INS_SHIFT = 10_000_000
#: x47 — winsorization clip quantiles.
WINSOR_LO = 0.05
WINSOR_HI = 0.95
#: x48 — fixed histogram geometry over events.value.
BIN_WIDTH = 0.5
N_BINS = 20


def _updates(orders):
    upd = orders.where(F.col("o_orderkey") % UPD_MOD == 0).select(
        "o_orderkey",
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        r6(F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    ins = orders.where(F.col("o_orderkey") % INS_MOD == 0).select(
        (F.col("o_orderkey") + INS_SHIFT).alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        r6(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return upd.unionByName(ins)


def x45_merge_upsert(spark, sf_dir):
    """MERGE-style upsert (operators/merge.py): apply a deterministic
    change set (price updates + shifted-key inserts) to the orders
    snapshot; updates win on key match, inserts append.  One
    co-partitioned full-outer join."""
    from social_warner_spark.operators.merge import merge_upsert

    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        r6(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(orders, _updates(orders), keys=["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def x46_snapshot_diff(spark, sf_dir):
    """Snapshot diff / change feed (operators/merge.py): diff the orders
    snapshot against its post-merge state from x45 — every changed key
    labeled I/U (deletes can't arise from an upsert, but the operator
    emits them for general inputs); unchanged keys drop out."""
    from social_warner_spark.operators.merge import merge_upsert, snapshot_diff

    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        r6(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(orders, _updates(orders), keys=["o_orderkey"])
    return snapshot_diff(
        orders, merged, keys=["o_orderkey"], compare_cols=["o_totalprice"]
    )


def x47_winsorize(spark, sf_dir):
    """Winsorized per-group statistics: clip events.value to its group's
    [p5, p95] (exact interpolated percentiles, rounded to the shared 6dp
    grid BEFORE clipping so both engines clip against identical bounds),
    then aggregate.  The robust-mean shape used to de-spike metrics."""
    e = T(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        r6(F.percentile("value", WINSOR_LO)).alias("p_lo"),
        r6(F.percentile("value", WINSOR_HI)).alias("p_hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            r6(F.avg(clipped)).alias("winsor_mean"),
            F.count("*").alias("cnt"),
        )
    )


def x48_histogram(spark, sf_dir):
    """Fixed-bin histogram of events.value per event_type: bucket =
    min(floor(value / 0.5), 19) — a pure integer formula any engine
    reproduces exactly (data-derived bin edges would put float
    equality on the bucket boundary; fixed geometry doesn't)."""
    e = T(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / BIN_WIDTH), F.lit(N_BINS - 1)
    ).cast("long")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


QUERIES = {
    "x45_merge_upsert": x45_merge_upsert,
    "x46_snapshot_diff": x46_snapshot_diff,
    "x47_winsorize": x47_winsorize,
    "x48_histogram": x48_histogram,
}

_CHANGESET = f"""
        base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   ROUND(o_totalprice, 6) AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders
        ), upd AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   ROUND(o_totalprice + 1000.0, 6) AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM base WHERE o_orderkey % {UPD_MOD} = 0
            UNION ALL
            SELECT o_orderkey + {INS_SHIFT}, o_custkey, 'N',
                   o_totalprice, o_orderdate, o_orderpriority
            FROM base WHERE o_orderkey % {INS_MOD} = 0
        ), merged AS (
            SELECT COALESCE(u.o_orderkey, e.o_orderkey) AS o_orderkey,
                   COALESCE(u.o_custkey, e.o_custkey) AS o_custkey,
                   COALESCE(u.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
                   COALESCE(u.o_totalprice, e.o_totalprice) AS o_totalprice
            FROM base e FULL OUTER JOIN upd u ON e.o_orderkey = u.o_orderkey
        )
"""

ORACLES = {
    "x45_merge_upsert": f"""
        WITH {_CHANGESET}
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM merged
    """,
    "x46_snapshot_diff": f"""
        WITH {_CHANGESET}
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'I'
                    WHEN n.o_orderkey IS NULL THEN 'D'
                    WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'U'
               END AS op,
               o.o_totalprice AS old_o_totalprice,
               n.o_totalprice AS new_o_totalprice
        FROM base o FULL OUTER JOIN merged n ON o.o_orderkey = n.o_orderkey
        WHERE CASE WHEN o.o_orderkey IS NULL THEN 'I'
                   WHEN n.o_orderkey IS NULL THEN 'D'
                   WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'U'
              END IS NOT NULL
    """,
    "x47_winsorize": f"""
        WITH bounds AS (
            SELECT event_type,
                   ROUND(quantile_cont(value, {WINSOR_LO}), 6) AS p_lo,
                   ROUND(quantile_cont(value, {WINSOR_HI}), 6) AS p_hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               MIN(p_lo) AS p_lo,
               MIN(p_hi) AS p_hi,
               ROUND(AVG(LEAST(GREATEST(value, p_lo), p_hi)), 6) AS winsor_mean,
               COUNT(*) AS cnt
        FROM events e JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
    """,
    "x48_histogram": f"""
        SELECT event_type,
               LEAST(CAST(FLOOR(value / {BIN_WIDTH}) AS BIGINT), {N_BINS - 1}) AS bucket,
               COUNT(*) AS cnt
        FROM events
        GROUP BY event_type, LEAST(CAST(FLOOR(value / {BIN_WIDTH}) AS BIGINT), {N_BINS - 1})
    """,
}
