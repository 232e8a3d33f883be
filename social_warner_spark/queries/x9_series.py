"""Ninth extension batch: interval algebra, cluster-aware canonical
selection, character-level quality signals, and a declarative
data-quality constraint suite.

- x76 coalesces overlapping per-user activity intervals (gaps-and-
  islands with a running-max frame — the availability/retention shape).
- x77 picks the canonical survivor per transitive near-dup cluster
  (keep-the-longest policy), composing x27's connected components with
  a per-cluster window rank — the step that turns dedup CLUSTERS into a
  kept CORPUS.
- x78 profiles documents at the character level (Shannon entropy +
  digit/upper/space ratios): the cheap junk detectors for number dumps,
  ascii art, and shouty boilerplate.
- x79 runs a Deequ-style expectations suite over ``orders`` in ONE
  aggregation pass: completeness, uniqueness, domain, and format rules
  as long-format (rule, metric, threshold, passed) rows.

All follow the determinism protocol (6dp rounding, aliased columns on
both engines, order-pinned float folds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import (
    T,
    TS_FMT_MICRO_DUCK,
    TS_FMT_MICRO_SPARK,
    r6,
)
from social_warner_spark.queries.x3_series import NEARDUP_CLUSTERS_CTE

#: x76 — each event opens a fixed activity window of this many minutes;
#: overlapping windows coalesce into availability intervals.
INTERVAL_MINUTES = 10


def x76_interval_coalesce(spark, sf_dir):
    """Per-user coalesced activity intervals: every event opens a
    10-minute window; overlapping/nested windows merge into islands
    (operators/timeseries.py:coalesce_intervals — running-max frame, not
    lag-1, so nested intervals can't split an island).  One shuffle on
    user_id; the island flag, island id, and the final aggregate all
    reuse that single sort."""
    from social_warner_spark.operators.timeseries import coalesce_intervals

    e = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("_start"),
        (F.col("ts") + F.expr(f"INTERVAL {INTERVAL_MINUTES} MINUTES")).alias("_end"),
    )
    isl = coalesce_intervals(e, "user_id", "_start", "_end", ("_start", "event_id"))
    return isl.groupBy("user_id", F.col("_island").alias("interval_seq")).agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("_start"), TS_FMT_MICRO_SPARK).alias("start_ts"),
        F.date_format(F.max("_end"), TS_FMT_MICRO_SPARK).alias("end_ts"),
    )


def x77_cluster_survivors(spark, sf_dir):
    """Canonical-document selection per near-dup cluster: within each
    transitive cluster (x27's min-label components) keep the LONGEST
    document (tiebreak min doc_id) — the keep-best policy real dedup
    pipelines apply instead of blind min-id.  The rank and the cluster
    size share one hash partition on cluster_id (rank sorts, size is
    frame-free), so selection costs one shuffle past clustering."""
    from social_warner_spark.operators.dedup import neardup_clusters

    docs = T(spark, sf_dir, "documents")
    clusters = neardup_clusters(docs, threshold=0.5)
    j = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    wrank = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wsize = Window.partitionBy("cluster_id")
    ranked = j.select(
        "cluster_id",
        F.col("doc_id"),
        "n_chars",
        F.row_number().over(wrank).alias("_rn"),
        F.count("*").over(wsize).alias("cluster_size"),
    )
    return ranked.where(F.col("_rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("survivor_doc_id"),
        "n_chars",
        "cluster_size",
    )


def x78_char_profile(spark, sf_dir):
    """Character-level document profile: Shannon entropy over the char
    distribution plus digit/upper/space composition ratios
    (functions/text.py:char_entropy, char_class_profile).  Entirely
    JVM-side narrow-map string arithmetic — no explode, no shuffle, no
    Python — the scan parallelizes embarrassingly at any corpus size."""
    from social_warner_spark.functions.text import char_class_profile, char_entropy

    d = T(spark, sf_dir, "documents").where(F.length("text") > 0)
    prof = char_class_profile(F.col("text"))
    return d.select(
        "doc_id",
        r6(char_entropy(F.col("text"))).alias("char_entropy"),
        prof["digit_ratio"].alias("digit_ratio"),
        prof["upper_ratio"].alias("upper_ratio"),
        prof["space_ratio"].alias("space_ratio"),
    )


#: x79 — the declared constraint suite over ``orders``: (rule name,
#: threshold).  Metrics are built in x79 so the rule list stays literal
#: for the SQL oracle.
EXPECTATION_THRESHOLDS = {
    "completeness_custkey": 1.0,
    "uniqueness_orderkey": 1.0,
    "nonneg_totalprice": 1.0,
    "priority_format": 0.99,
    "status_domain": 1.0,
}


def x79_expectations(spark, sf_dir):
    """Declarative data-quality gate (operators/audit.py:expectations —
    the Deequ/Great-Expectations shape): five constraints over orders
    evaluated in ONE aggregation pass (single scan; the distinct-based
    uniqueness metric adds an Expand, not a second job), unpivoted to
    long-format rule rows a publish step can gate on."""
    from social_warner_spark.operators.audit import expectations

    o = T(spark, sf_dir, "orders")
    thr = EXPECTATION_THRESHOLDS
    rules = [
        (
            "completeness_custkey",
            F.avg(F.col("o_custkey").isNotNull().cast("double")),
            thr["completeness_custkey"],
        ),
        (
            "uniqueness_orderkey",
            F.count_distinct(F.col("o_orderkey")) / F.count(F.lit(1)),
            thr["uniqueness_orderkey"],
        ),
        (
            "nonneg_totalprice",
            F.avg((F.col("o_totalprice") >= 0).cast("double")),
            thr["nonneg_totalprice"],
        ),
        (
            "priority_format",
            F.avg(F.col("o_orderpriority").rlike("^[1-5]-").cast("double")),
            thr["priority_format"],
        ),
        (
            "status_domain",
            F.avg(F.col("o_orderstatus").isin("O", "F", "P").cast("double")),
            thr["status_domain"],
        ),
    ]
    return expectations(o, rules)


QUERIES = {
    "x76_interval_coalesce": x76_interval_coalesce,
    "x77_cluster_survivors": x77_cluster_survivors,
    "x78_char_profile": x78_char_profile,
    "x79_expectations": x79_expectations,
}

ORACLES = {
    "x76_interval_coalesce": f"""
        WITH iv AS (
            SELECT user_id, event_id, ts AS s,
                   ts + INTERVAL {INTERVAL_MINUTES} MINUTE AS e
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, s, e,
                   CASE WHEN s > COALESCE(
                            MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            s - INTERVAL 1 SECOND)
                        THEN 1 ELSE 0 END AS nf
            FROM iv
        ), isl AS (
            SELECT user_id, s, e,
                   CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS interval_seq
            FROM flagged
        )
        SELECT user_id, interval_seq, COUNT(*) AS n_events,
               strftime(MIN(s), '{TS_FMT_MICRO_DUCK}') AS start_ts,
               strftime(MAX(e), '{TS_FMT_MICRO_DUCK}') AS end_ts
        FROM isl GROUP BY user_id, interval_seq
    """,
    "x77_cluster_survivors": NEARDUP_CLUSTERS_CTE
    + """
        , j AS (
            SELECT c.cluster_id, d.doc_id, d.n_chars
            FROM clusters c JOIN documents d USING (doc_id)
        ), ranked AS (
            SELECT cluster_id, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY cluster_id
                                      ORDER BY n_chars DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM j
        )
        SELECT cluster_id, doc_id AS survivor_doc_id, n_chars, cluster_size
        FROM ranked WHERE rn = 1
    """,
    "x78_char_profile": """
        SELECT doc_id,
               ROUND(0.0 - list_sum(list_transform(
                   list_sort(list_distinct(string_split(text, ''))),
                   ch -> ((len(text) - len(replace(text, ch, '')))
                          / CAST(len(text) AS DOUBLE))
                         * ln((len(text) - len(replace(text, ch, '')))
                              / CAST(len(text) AS DOUBLE)))), 6) AS char_entropy,
               ROUND(len(regexp_replace(text, '[^0-9]', '', 'g'))
                     / CAST(len(text) AS DOUBLE), 6) AS digit_ratio,
               ROUND(len(regexp_replace(text, '[^A-Z]', '', 'g'))
                     / CAST(len(text) AS DOUBLE), 6) AS upper_ratio,
               ROUND(len(regexp_replace(text, '[^ ]', '', 'g'))
                     / CAST(len(text) AS DOUBLE), 6) AS space_ratio
        FROM documents WHERE len(text) > 0
    """,
    "x79_expectations": """
        WITH m AS (
            SELECT
                ROUND(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
                    AS completeness_custkey,
                ROUND(COUNT(DISTINCT o_orderkey) / CAST(COUNT(*) AS DOUBLE), 6)
                    AS uniqueness_orderkey,
                ROUND(AVG(CASE WHEN o_totalprice >= 0 THEN 1.0 ELSE 0.0 END), 6)
                    AS nonneg_totalprice,
                ROUND(AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                          THEN 1.0 ELSE 0.0 END), 6) AS priority_format,
                ROUND(AVG(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                          THEN 1.0 ELSE 0.0 END), 6) AS status_domain
            FROM orders
        )
        SELECT 'completeness_custkey' AS rule, completeness_custkey AS metric_value,
               1.0 AS threshold, completeness_custkey >= 1.0 AS passed FROM m
        UNION ALL
        SELECT 'uniqueness_orderkey', uniqueness_orderkey, 1.0,
               uniqueness_orderkey >= 1.0 FROM m
        UNION ALL
        SELECT 'nonneg_totalprice', nonneg_totalprice, 1.0,
               nonneg_totalprice >= 1.0 FROM m
        UNION ALL
        SELECT 'priority_format', priority_format, 0.99,
               priority_format >= 0.99 FROM m
        UNION ALL
        SELECT 'status_domain', status_domain, 1.0,
               status_domain >= 1.0 FROM m
    """,
}
