"""x18 series — round-3 widening batch (x272–x276): curation
filter-waterfall auditing, item-item collaborative filtering, and the
classical rank-based nonparametric test family (Kruskal–Wallis,
Brown–Forsythe, Friedman).

Like every other series, each query is a pure DataFrame program over
the driver's parquet tables with an independently-written DuckDB
oracle.  The corpus-wide rank statistics reuse the x257 discipline:
Spark derives average ranks from the DISTINCT-VALUE cumulative
relation (bounded support), the oracle from the classic
RANK()+tie-count formulation — two independent routes.

Literature grounding (public):
- Rae et al., "Scaling language models" (Gopher, arXiv 2112.11446)
  §A1 — sequential quality-filter attrition reporting.
- Sarwar et al., "Item-based collaborative filtering recommendation
  algorithms" (WWW 2001) — cosine item-item CF.
- Kruskal & Wallis, "Use of ranks in one-criterion variance analysis"
  (JASA 1952), tie correction per Siegel & Castellan.
- Brown & Forsythe, "Robust tests for the equality of variances"
  (JASA 1974).
- Friedman, "The use of ranks to avoid the assumption of normality"
  (JASA 1937).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import repetition_ratio, tokens
from social_warner_spark.queries.common import T, r6
from social_warner_spark.queries.x15_series import _avg_ranks

#: x272 — the four curation rules, applied in this order for the
#: sequential-attrition column (thresholds chosen to bite on the
#: driver corpus; each rule also reports its solo and unique reach).
WF_MIN_TOKENS = 40
WF_LANG = "en"
WF_MAX_REP = 0.6
WF_MIN_ALPHA = 0.81
#: x273 — catalog slice whose recommendations are materialized, rank
#: depth, and the minimum co-occurrence support.
CF_MAX_ITEM = 200
CF_TOPK = 5
#: x276 — Friedman runs on days where every event type is present
#: (complete blocks).
FRIEDMAN_K = 5


def x272_filter_waterfall(spark, sf_dir):
    """Curation filter waterfall (the Gopher-style attrition table):
    four quality rules — min token count, language keep-list, max
    repetition ratio, min alpha-character ratio — each reported with
    its SOLO reach (docs it flags), its SEQUENTIAL removals (docs it
    removes after earlier rules already fired), and its UNIQUE reach
    (docs no other rule catches), plus the survivor count after each
    stage.  The three views together expose redundant rules (high
    solo, zero unique) before anyone spends a full pipeline run on
    them.

    Scale: one narrow map computes all four flags per document; the
    waterfall is a single aggregation unpivoted to four rows — no
    joins, no repeated scans."""
    d = T(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "lang",
        "text",
        tokens(F.col("text")).alias("_toks"),
    ).select(
        (F.size("_toks") < WF_MIN_TOKENS).alias("f1"),
        (F.col("lang") != WF_LANG).alias("f2"),
        (repetition_ratio(F.col("_toks")) > WF_MAX_REP).alias("f3"),
        (
            F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
            / F.length(F.col("text"))
            < WF_MIN_ALPHA
        ).alias("f4"),
    )
    f = [F.col(f"f{i}") for i in range(1, 5)]
    agg = staged.agg(
        F.count("*").alias("n_docs"),
        *[F.sum(f[i].cast("long")).alias(f"solo_{i}") for i in range(4)],
        F.sum(f[0].cast("long")).alias("seq_0"),
        F.sum((f[1] & ~f[0]).cast("long")).alias("seq_1"),
        F.sum((f[2] & ~f[0] & ~f[1]).cast("long")).alias("seq_2"),
        F.sum((f[3] & ~f[0] & ~f[1] & ~f[2]).cast("long")).alias("seq_3"),
        *[
            F.sum(
                (
                    f[i]
                    & ~sum(
                        (f[j].cast("int") for j in range(4) if j != i),
                        F.lit(0),
                    ).cast("boolean")
                ).cast("long")
            ).alias(f"uniq_{i}")
            for i in range(4)
        ],
    )
    names = ["min_tokens", "lang_keep", "max_repetition", "min_alpha_ratio"]
    stack = ", ".join(
        f"{i + 1}, '{names[i]}', solo_{i}, seq_{i}, uniq_{i}"
        for i in range(4)
    )
    out = agg.selectExpr(
        "n_docs",
        f"stack(4, {stack}) as (stage, rule, n_flagged, n_removed_seq,"
        " n_unique)",
    )
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "stage",
        "rule",
        "n_flagged",
        "n_removed_seq",
        "n_unique",
        (F.col("n_docs") - F.sum("n_removed_seq").over(w)).alias(
            "survivors_after"
        ),
    ).orderBy("stage")


def x273_item_item_cf(spark, sf_dir):
    """Item-item cosine collaborative filtering (Sarwar et al.): for
    every catalog item in the probe slice (partkey < 200), the top-5
    co-purchased items by cos(i,j) = co(i,j)/sqrt(n_i * n_j) over the
    order-part incidence — the neighborhood recommender that x123's
    popularity baseline and x209's rank-1 ALS bracket.

    Scale: candidate pairs come from the per-order self-join, so the
    blowup is sum of order-size^2 (order sizes are naturally bounded),
    never catalog^2; item supports join back on the item keys and the
    per-item top-k is a bounded rank window."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    from social_warner_spark.caching import register_persisted

    li = register_persisted(li.persist())
    supp = li.groupBy("pk").agg(F.count("*").alias("n"))
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") != F.col("b.pk"))
            & (F.col("a.pk") < CF_MAX_ITEM),
        )
        .groupBy(F.col("a.pk").alias("i"), F.col("b.pk").alias("j"))
        .agg(F.count("*").alias("co"))
    )
    si = supp.select(F.col("pk").alias("i"), F.col("n").alias("ni"))
    sj = supp.select(F.col("pk").alias("j"), F.col("n").alias("nj"))
    scored = (
        co.join(si, "i")
        .join(sj, "j")
        .select(
            "i",
            "j",
            "co",
            r6(F.col("co") / F.sqrt(F.col("ni") * F.col("nj"))).alias("cos"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("cos"), F.asc("j"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= CF_TOPK)
        .select("i", "j", "co", "cos", "rk")
    )


def x274_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis H across event types on the event value: global
    average ranks, H = 12/(N(N+1)) * sum n_g rbar_g^2 - 3(N+1), with
    the tie correction C = 1 - sum(t^3 - t)/(N^3 - N) — the rank-based
    one-way ANOVA that backs x248's Welch t when normality is off the
    table.

    Scale: ranks come from the x257 distinct-value cumulative relation
    (support-bounded, broadcast join-back); the corpus contributes one
    scan plus one per-group aggregation."""
    ev = T(spark, sf_dir, "events").select("event_type", F.col("value").alias("v"))
    ranked = _avg_ranks(ev, "v", "r")
    n = ev.agg(F.count("*").alias("n"))
    grp = ranked.groupBy("event_type").agg(
        F.count("*").alias("ng"), F.avg("r").alias("rbar")
    )
    ties = (
        ev.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    h = (
        12.0
        / (F.max("n") * (F.max("n") + 1))
        * F.sum(F.col("ng") * F.col("rbar") * F.col("rbar"))
        - 3.0 * (F.max("n") + 1)
    )
    c = 1.0 - F.max("tsum") / (
        F.max("n").cast("double") * F.max("n") * F.max("n") - F.max("n")
    )
    return (
        grp.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .agg(
            F.max("n").alias("n"),
            F.count("*").alias("k_groups"),
            r6(h).alias("h"),
            r6(h / c).alias("h_adjusted"),
            (F.count("*") - 1).alias("df"),
        )
    )


def x275_brown_forsythe(spark, sf_dir):
    """Brown–Forsythe robust variance-homogeneity test across event
    types: one-way ANOVA F on the median-centered absolute deviations
    z = |value - median_g| — the heteroscedasticity gate consulted
    before trusting x248's pooled-variance cousin (Welch sidesteps it;
    this measures it).

    Scale: per-group medians are one `percentile` aggregation
    broadcast back; the F statistic needs two more passes over the
    narrow (type, z) projection."""
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("md")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("md")).alias("z")
    )
    from social_warner_spark.caching import register_persisted

    z = register_persisted(z.persist())
    g = z.groupBy("event_type").agg(
        F.count("*").alias("ng"), F.avg("z").alias("zg")
    )
    tot = z.agg(F.count("*").alias("n"), F.avg("z").alias("zbar"))
    within = (
        z.join(F.broadcast(g), "event_type")
        .agg(
            F.sum(
                (F.col("z") - F.col("zg")) * (F.col("z") - F.col("zg"))
            ).alias("ssw")
        )
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.count("*").alias("k_groups"),
            F.sum(
                F.col("ng")
                * (F.col("zg") - F.col("zbar"))
                * (F.col("zg") - F.col("zbar"))
            ).alias("ssb"),
            (F.count("*") - 1).alias("df1"),
            (F.max("n") - F.count("*")).alias("df2"),
        )
        .crossJoin(F.broadcast(within))
        .select(
            "n",
            "k_groups",
            "df1",
            "df2",
            r6(
                (F.col("ssb") / F.col("df1"))
                / (F.col("ssw") / F.col("df2"))
            ).alias("f_stat"),
        )
    )


def x276_friedman(spark, sf_dir):
    """Friedman test on day-blocked event types: within each complete
    day (all 5 types present) the types are average-ranked by their
    daily mean value; chi2_F = 12n/(k(k+1)) * sum_j (Rbar_j -
    (k+1)/2)^2 — "does any event type systematically run hot across
    days", the repeated-measures twin of x274.

    Scale: the corpus collapses to the (day x type) grid in one
    aggregation; ranks are windows over k-row day partitions."""
    ev = T(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    full = (
        cell.groupBy("day")
        .agg(F.count("*").alias("kk"))
        .where(F.col("kk") == FRIEDMAN_K)
        .select("day")
    )
    blocks = cell.join(full, "day")
    rw = Window.partitionBy("day").orderBy("m")
    tw = Window.partitionBy("day", "m")
    ranked = blocks.select(
        "day",
        "event_type",
        (
            F.rank().over(rw)
            + (F.count("*").over(tw) - 1) / 2.0
        ).alias("r"),
    )
    per = ranked.groupBy("event_type").agg(
        F.count("*").alias("n_blocks"), r6(F.avg("r")).alias("mean_rank")
    )
    nb = per.agg(F.max("n_blocks").alias("nb"))
    chi = per.crossJoin(F.broadcast(nb)).agg(
        r6(
            12.0
            * F.max("nb")
            / (FRIEDMAN_K * (FRIEDMAN_K + 1))
            * F.sum(
                (F.col("mean_rank") - (FRIEDMAN_K + 1) / 2.0)
                * (F.col("mean_rank") - (FRIEDMAN_K + 1) / 2.0)
            )
        ).alias("chi2"),
    )
    return (
        per.crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            "n_blocks",
            "mean_rank",
            "chi2",
            F.lit(FRIEDMAN_K - 1).alias("df"),
        )
        .orderBy("event_type")
    )


ORACLES = {
    "x272_filter_waterfall": f"""
        WITH staged AS (
            SELECT len(string_split(trim(text), ' ')) < {WF_MIN_TOKENS}
                       AS f1,
                   lang != '{WF_LANG}' AS f2,
                   1.0 - len(list_distinct(string_split(trim(text), ' ')))
                         * 1.0 / len(string_split(trim(text), ' '))
                       > {WF_MAX_REP} AS f3,
                   len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                       / len(text) < {WF_MIN_ALPHA} AS f4
            FROM documents
        ), agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS solo_0,
                   CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS solo_1,
                   CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS solo_2,
                   CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS solo_3,
                   CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS seq_0,
                   CAST(SUM(CASE WHEN f2 AND NOT f1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS seq_1,
                   CAST(SUM(CASE WHEN f3 AND NOT f1 AND NOT f2
                                 THEN 1 ELSE 0 END) AS BIGINT) AS seq_2,
                   CAST(SUM(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3
                                 THEN 1 ELSE 0 END) AS BIGINT) AS seq_3,
                   CAST(SUM(CASE WHEN f1 AND NOT f2 AND NOT f3 AND NOT f4
                                 THEN 1 ELSE 0 END) AS BIGINT) AS uniq_0,
                   CAST(SUM(CASE WHEN f2 AND NOT f1 AND NOT f3 AND NOT f4
                                 THEN 1 ELSE 0 END) AS BIGINT) AS uniq_1,
                   CAST(SUM(CASE WHEN f3 AND NOT f1 AND NOT f2 AND NOT f4
                                 THEN 1 ELSE 0 END) AS BIGINT) AS uniq_2,
                   CAST(SUM(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3
                                 THEN 1 ELSE 0 END) AS BIGINT) AS uniq_3
            FROM staged
        ), rows_ AS (
            SELECT 1 AS stage, 'min_tokens' AS rule, solo_0 AS n_flagged,
                   seq_0 AS n_removed_seq, uniq_0 AS n_unique, n_docs
            FROM agg
            UNION ALL
            SELECT 2, 'lang_keep', solo_1, seq_1, uniq_1, n_docs FROM agg
            UNION ALL
            SELECT 3, 'max_repetition', solo_2, seq_2, uniq_2, n_docs
            FROM agg
            UNION ALL
            SELECT 4, 'min_alpha_ratio', solo_3, seq_3, uniq_3, n_docs
            FROM agg
        )
        SELECT stage, rule, n_flagged, n_removed_seq, n_unique,
               CAST(n_docs - SUM(n_removed_seq) OVER (ORDER BY stage
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS survivors_after
        FROM rows_
        ORDER BY stage
    """,
    "x273_item_item_cf": f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), supp AS (
            SELECT pk, COUNT(*) AS n FROM li GROUP BY pk
        ), co AS (
            SELECT a.pk AS i, b.pk AS j, CAST(COUNT(*) AS BIGINT) AS co
            FROM li a JOIN li b
              ON a.ok = b.ok AND a.pk != b.pk AND a.pk < {CF_MAX_ITEM}
            GROUP BY 1, 2
        ), scored AS (
            SELECT c.i, c.j, c.co,
                   ROUND(c.co / sqrt(CAST(si.n AS DOUBLE) * sj.n), 6) AS cos
            FROM co c
            JOIN supp si ON si.pk = c.i
            JOIN supp sj ON sj.pk = c.j
        )
        SELECT i, j, co, cos, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                       PARTITION BY i ORDER BY cos DESC, j) AS INT) AS rk
            FROM scored
        ) WHERE rk <= {CF_TOPK}
    """,
    "x274_kruskal_wallis": """
        WITH ev AS (
            SELECT event_type, value AS v FROM events
        ), ranked AS (
            SELECT event_type,
                   RANK() OVER (ORDER BY v)
                     + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS r
            FROM ev
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev
        ), grp AS (
            SELECT event_type, COUNT(*) AS ng, AVG(r) AS rbar
            FROM ranked GROUP BY 1
        ), ties AS (
            SELECT SUM(t * t * t - t) AS tsum
            FROM (SELECT COUNT(*) AS t FROM ev GROUP BY v)
        )
        SELECT n, CAST(COUNT(*) AS BIGINT) AS k_groups,
               ROUND(12.0 / (n * (n + 1)) * SUM(ng * rbar * rbar)
                     - 3.0 * (n + 1), 6) AS h,
               ROUND((12.0 / (n * (n + 1)) * SUM(ng * rbar * rbar)
                      - 3.0 * (n + 1))
                     / (1.0 - tsum / (CAST(n AS DOUBLE) * n * n - n)), 6)
                   AS h_adjusted,
               CAST(COUNT(*) - 1 AS BIGINT) AS df
        FROM grp CROSS JOIN nn CROSS JOIN ties
        GROUP BY n, tsum
    """,
    "x275_brown_forsythe": """
        WITH med AS (
            SELECT event_type, ROUND(median(value), 6) AS md
            FROM events GROUP BY 1
        ), z AS (
            SELECT e.event_type, ABS(e.value - m.md) AS z
            FROM events e JOIN med m USING (event_type)
        ), g AS (
            SELECT event_type, COUNT(*) AS ng, AVG(z) AS zg
            FROM z GROUP BY 1
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(z) AS zbar FROM z
        ), within AS (
            SELECT SUM((z.z - g.zg) * (z.z - g.zg)) AS ssw
            FROM z JOIN g USING (event_type)
        )
        SELECT n, CAST(COUNT(*) AS BIGINT) AS k_groups,
               CAST(COUNT(*) - 1 AS BIGINT) AS df1,
               CAST(n - COUNT(*) AS BIGINT) AS df2,
               ROUND((SUM(ng * (zg - zbar) * (zg - zbar)) / (COUNT(*) - 1))
                     / (ssw / (n - COUNT(*))), 6) AS f_stat
        FROM g CROSS JOIN tot CROSS JOIN within
        GROUP BY n, ssw
    """,
    "x276_friedman": f"""
        WITH cell AS (
            SELECT date_trunc('day', ts) AS day, event_type,
                   ROUND(AVG(value), 6) AS m
            FROM events GROUP BY 1, 2
        ), full_ AS (
            SELECT day FROM cell GROUP BY day
            HAVING COUNT(*) = {FRIEDMAN_K}
        ), ranked AS (
            SELECT c.day, c.event_type,
                   RANK() OVER (PARTITION BY c.day ORDER BY c.m)
                     + (COUNT(*) OVER (PARTITION BY c.day, c.m) - 1) / 2.0
                       AS r
            FROM cell c JOIN full_ USING (day)
        ), per AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   ROUND(AVG(r), 6) AS mean_rank
            FROM ranked GROUP BY 1
        ), chi AS (
            SELECT ROUND(12.0 * MAX(n_blocks)
                         / ({FRIEDMAN_K} * ({FRIEDMAN_K} + 1))
                         * SUM((mean_rank - ({FRIEDMAN_K} + 1) / 2.0)
                               * (mean_rank - ({FRIEDMAN_K} + 1) / 2.0)),
                         6) AS chi2
            FROM per
        )
        SELECT event_type, n_blocks, mean_rank, chi2,
               CAST({FRIEDMAN_K - 1} AS INT) AS df
        FROM per CROSS JOIN chi
        ORDER BY event_type
    """,
}

QUERIES = {
    "x272_filter_waterfall": x272_filter_waterfall,
    "x273_item_item_cf": x273_item_item_cf,
    "x274_kruskal_wallis": x274_kruskal_wallis,
    "x275_brown_forsythe": x275_brown_forsythe,
    "x276_friedman": x276_friedman,
}
