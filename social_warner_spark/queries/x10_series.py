"""Tenth extension batch: product-analytics over the event stream — the
reference's own domain (social-media engagement analytics) generalized
to the distributed event-funnel toolkit.

- x93 ordered funnel: view → click → purchase with strict ordering
  (each stage's first timestamp must follow the previous stage's).
- x94 cohort retention: first-activity-day cohorts × day offset.
- x95 last-touch attribution: every purchase credited to the user's
  most recent preceding non-purchase event type.

All are single-key (user_id) shuffles; stage tables and cohort matrices
are |users|- or |days²|-sized, never event-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import T, r6

#: x93 — the ordered stages.
FUNNEL_STAGES = ("view", "click", "purchase")
#: x94 — cohort epoch (the testdata's first event day).
COHORT_EPOCH = "2024-01-01"


def x93_funnel(spark, sf_dir):
    """Strictly-ordered three-stage funnel: per user the first 'view',
    the first 'click' AFTER that view, the first 'purchase' AFTER that
    click; one summary row with per-stage user counts and conversion
    rates.  Three co-partitioned user_id aggregations/joins — each stage
    table is |users| rows, so the chain costs user-keyed shuffles of
    shrinking relations, never an event-level self-join."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(stage: str, prev):
        s = e.where(F.col("event_type") == stage)
        if prev is None:
            return s.groupBy("user_id").agg(F.min("ts").alias("t"))
        return (
            s.join(prev.withColumnsRenamed({"t": "_pt"}), "user_id")
            .where(F.col("ts") > F.col("_pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    s1 = first_after(FUNNEL_STAGES[0], None)
    s2 = first_after(FUNNEL_STAGES[1], s1)
    s3 = first_after(FUNNEL_STAGES[2], s2)
    c1 = s1.agg(F.count("*").alias("n_stage1"))
    c2 = s2.agg(F.count("*").alias("n_stage2"))
    c3 = s3.agg(F.count("*").alias("n_stage3"))
    return c1.crossJoin(c2).crossJoin(c3).select(
        "n_stage1",
        "n_stage2",
        "n_stage3",
        r6(F.col("n_stage2") / F.col("n_stage1").cast("double")).alias("conv_1_2"),
        r6(F.col("n_stage3") / F.col("n_stage2").cast("double")).alias("conv_2_3"),
    )


def x94_cohort_retention(spark, sf_dir):
    """Day-grain cohort retention matrix: users grouped by their first
    active day, counted per (cohort_day, day_offset) of later activity.
    The cohort label is a |users|-row aggregate broadcast back onto the
    distinct (user, day) activity relation; the matrix itself is
    |days²|-bounded."""
    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(COHORT_EPOCH).cast("date")).alias("d"),
    )
    active = e.distinct()
    cohort = active.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        active.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count("*").alias("n_users"))
    )


def x95_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRECEDING non-purchase event type (carry-forward via
    last(..., ignorenulls) over the user's timeline; purchases with no
    preceding touch report '(none)').  One user_id shuffle whose sort
    the carry-forward window rides; the result is a per-channel count."""
    e = T(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    attributed = e.withColumn(
        "channel", F.last(touch, ignorenulls=True).over(w)
    ).where(F.col("event_type") == "purchase")
    return attributed.groupBy(
        F.coalesce(F.col("channel"), F.lit("(none)")).alias("channel")
    ).agg(F.count("*").alias("n_purchases"))


QUERIES = {
    "x93_funnel": x93_funnel,
    "x94_cohort_retention": x94_cohort_retention,
    "x95_last_touch_attribution": x95_last_touch_attribution,
}

ORACLES = {
    "x93_funnel": f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
            WHERE e.event_type = '{FUNNEL_STAGES[1]}' GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
            WHERE e.event_type = '{FUNNEL_STAGES[2]}' GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM s1) AS n_stage1,
               (SELECT COUNT(*) FROM s2) AS n_stage2,
               (SELECT COUNT(*) FROM s3) AS n_stage3,
               ROUND((SELECT COUNT(*) FROM s2)
                     / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE), 6) AS conv_1_2,
               ROUND((SELECT COUNT(*) FROM s3)
                     / CAST((SELECT COUNT(*) FROM s2) AS DOUBLE), 6) AS conv_2_3
    """,
    "x94_cohort_retention": f"""
        WITH active AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '{COHORT_EPOCH}', CAST(ts AS DATE)) AS d
            FROM events
        ), cohort AS (
            SELECT user_id, MIN(d) AS cohort_day FROM active GROUP BY user_id
        )
        SELECT cohort_day, d - cohort_day AS day_offset, COUNT(*) AS n_users
        FROM active JOIN cohort USING (user_id)
        GROUP BY cohort_day, day_offset
    """,
    "x95_last_touch_attribution": """
        WITH marked AS (
            SELECT user_id, event_id, event_type, ts,
                   last_value(CASE WHEN event_type != 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS channel
            FROM events
        )
        SELECT COALESCE(channel, '(none)') AS channel,
               COUNT(*) AS n_purchases
        FROM marked WHERE event_type = 'purchase'
        GROUP BY 1
    """,
}
