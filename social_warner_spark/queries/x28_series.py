"""x28 series — round-3 widening batch (x322–x326): multi-changepoint
segmentation, experiment power planning, species-richness estimation,
Merkle snapshot integrity, and order-statistic quantile intervals.

Like every other series, each query is a pure DataFrame program over
the driver's parquet tables with an independently-written DuckDB
oracle.  x322 extends x263 to depth-2 binary segmentation using only
the global prefix sums (segment SSEs are differences of prefixes, so
no per-segment rescan); x323 is the x312-style planner shape (the
engine sizing its own experiments from observed variance).

Literature grounding (public):
- Scott & Knott (1974) / Truong et al. (2020) — binary segmentation.
- Standard two-sample power algebra (e.g. van Belle, "Statistical
  rules of thumb" ch. 2).
- Chao (Scand. J. Stat. 1984) — the Chao1 richness estimator.
- Merkle (CRYPTO '87) — hash trees.
- Conover, "Practical nonparametric statistics" — distribution-free
  order-statistic quantile intervals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import tokens
from social_warner_spark.queries.common import T, r6, r6t
from social_warner_spark.queries.x16_series import CP_MIN_SEG

#: x322 — a child split must remove at least this share of its
#: segment's SSE to be kept.
CP2_MIN_GAIN = 0.1
#: x323 — two-sided alpha=0.05 / power=0.8 normal quantiles and the
#: relative-MDE grid planned for.
PW_Z_ALPHA = 1.959964
PW_Z_BETA = 0.841621
PW_MDES = (0.01, 0.02, 0.05, 0.10)
#: x325 — leaf chunk width (doc_ids per leaf) and fan-in per level.
MK_LEAF = 100
MK_FAN = 10
#: x326 — quantile whose rank interval is reported.
QCI_P = 0.95
QCI_Z = 1.959964


def _daily_idx(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("s"),
        F.sum("y").over(w).alias("s1"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("s2"),
    )


def x322_multi_changepoint(spark, sf_dir):
    """Depth-2 binary segmentation of the daily total event value: the
    x263 best split first, then each side splits again if its child
    split removes >= 10% of the side's SSE — up to three changepoints,
    each reported with its segment bounds and SSE reduction.  Segment
    SSEs are PREFIX-SUM DIFFERENCES (SSE(a..b] = (S2_b - S2_a) -
    (S1_b - S1_a)^2/(b - a)), so the recursion never rescans the
    series.

    Scale: everything runs on the bounded daily grid; each level is a
    candidate walk + orderBy/limit argmin, with the level-1 split row
    broadcast into level 2."""
    idx = _daily_idx(spark, sf_dir).localCheckpoint(eager=True)
    tot = idx.agg(
        F.max("s").alias("n"),
        F.max_by("s1", "s").alias("g1"),
        F.max_by("s2", "s").alias("g2"),
    )

    def seg_cost(sa_s1, sa_s2, sa_s, sb_s1, sb_s2, sb_s):
        """SSE of the segment (a..b] from prefixes at a and b."""
        return (sb_s2 - sa_s2) - (sb_s1 - sa_s1) * (sb_s1 - sa_s1) / (
            sb_s - sa_s
        )

    zero1 = F.lit(0.0)
    # level 1: same walk as x263
    cand1 = idx.crossJoin(F.broadcast(tot)).where(
        (F.col("s") >= CP_MIN_SEG) & (F.col("s") <= F.col("n") - CP_MIN_SEG)
    )
    cost1 = F.round(
        seg_cost(zero1, zero1, F.lit(0), F.col("s1"), F.col("s2"), F.col("s"))
        + seg_cost(
            F.col("s1"), F.col("s2"), F.col("s"),
            F.col("g1"), F.col("g2"), F.col("n"),
        ),
        6,
    )
    best1 = (
        cand1.select(
            F.col("s").alias("b1"),
            F.col("s1").alias("b1s1"),
            F.col("s2").alias("b1s2"),
            "n",
            "g1",
            "g2",
            cost1.alias("c1"),
        )
        .orderBy("c1", "b1")
        .limit(1)
        .localCheckpoint(eager=True)
    )

    def child(lo_s, lo_s1, lo_s2, hi_s, hi_s1, hi_s2, tag):
        """Best split of the segment (lo..hi]; returns a 1-row
        relation with the split s, gain share, and keep flag."""
        c = idx.crossJoin(F.broadcast(best1)).where(
            (F.col("s") >= lo_s + CP_MIN_SEG)
            & (F.col("s") <= hi_s - CP_MIN_SEG)
        )
        parent_sse = F.round(
            seg_cost(lo_s1, lo_s2, lo_s, hi_s1, hi_s2, hi_s), 6
        )
        split_sse = F.round(
            seg_cost(lo_s1, lo_s2, lo_s, F.col("s1"), F.col("s2"), F.col("s"))
            + seg_cost(
                F.col("s1"), F.col("s2"), F.col("s"), hi_s1, hi_s2, hi_s
            ),
            6,
        )
        return (
            c.select(
                F.lit(tag).alias("segment"),
                F.col("s").alias("split_idx"),
                parent_sse.alias("parent_sse"),
                split_sse.alias("split_sse"),
            )
            .orderBy("split_sse", "split_idx")
            .limit(1)
            .select(
                "segment",
                "split_idx",
                "parent_sse",
                "split_sse",
                r6(
                    (F.col("parent_sse") - F.col("split_sse"))
                    / F.col("parent_sse")
                ).alias("gain_share"),
            )
        )

    left = child(
        F.lit(0), zero1, zero1,
        F.col("b1"), F.col("b1s1"), F.col("b1s2"),
        "left_of_cp1",
    )
    right = child(
        F.col("b1"), F.col("b1s1"), F.col("b1s2"),
        F.col("n"), F.col("g1"), F.col("g2"),
        "right_of_cp1",
    )
    l1row = best1.select(
        F.lit("full_series").alias("segment"),
        F.col("b1").alias("split_idx"),
        F.round(
            F.col("g2") - F.col("g1") * F.col("g1") / F.col("n"), 6
        ).alias("parent_sse"),
        F.col("c1").alias("split_sse"),
        r6(
            (
                (F.col("g2") - F.col("g1") * F.col("g1") / F.col("n"))
                - F.col("c1")
            )
            / (F.col("g2") - F.col("g1") * F.col("g1") / F.col("n"))
        ).alias("gain_share"),
    )
    out = l1row.unionAll(left).unionAll(right)
    return out.select(
        "segment",
        "split_idx",
        "parent_sse",
        "split_sse",
        "gain_share",
        (F.col("gain_share") >= CP2_MIN_GAIN).alias("kept"),
    ).orderBy("segment")


def x323_power_planner(spark, sf_dir):
    """A/B sample-size planning from the metric's OWN observed
    variance: for relative MDEs of 1/2/5/10% of the mean event value,
    the per-arm n = 2 (z_a + z_b)^2 sigma^2 / delta^2, alongside how
    many days of current traffic that needs — the x312 planner shape
    pointed at experimentation (x106's A/B test assumes a sample; this
    says how long to wait for one).

    Scale: one moment aggregation and one day count; the plan is a
    4-row grid."""
    ev = T(spark, sf_dir, "events")
    st = ev.agg(
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("var"),
        F.count("*").alias("n_events"),
        F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("n_days"),
    )
    mdes = spark.createDataFrame([(m,) for m in PW_MDES], ["mde"])
    k = (PW_Z_ALPHA + PW_Z_BETA) ** 2
    j = mdes.crossJoin(F.broadcast(st))
    need = 2.0 * k * F.col("var") / F.pow(F.col("mde") * F.col("mu"), 2)
    per_day = F.col("n_events") / F.col("n_days") / 2.0
    return j.select(
        "mde",
        # r6t (r08): mde·mu and ceil/per_day are exact rationals (value
        # is 2dp, counts are ints) that can land on the 6dp half-grid —
        # the sf0.001 sweep caught abs_delta 2.5025095 rendering
        # .50251/.502509 across engines; nudges mirrored in the oracle.
        r6t(F.col("mde") * F.col("mu")).alias("abs_delta"),
        F.ceil(need).cast("long").alias("n_per_arm"),
        r6t(F.ceil(need) / per_day).alias("days_needed"),
    ).orderBy("mde")


def x324_chao1_richness(spark, sf_dir):
    """Chao1 vocabulary-richness estimate per source: V_est = V +
    F1^2/(2 F2) from the hapax (F1) and dis legomena (F2) counts, with
    the observed-coverage ratio V/V_est — how much vocabulary each
    crawl is still hiding (x191's Heaps law fits growth; Chao1 bounds
    the asymptote; x199 does the same trick on users).

    Scale: one (source, token) count, one frequency-of-frequency
    reduction."""
    d = T(spark, sf_dir, "documents")
    freq = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("f"))
    )
    return (
        freq.groupBy("source")
        .agg(
            F.count("*").alias("vocab"),
            F.sum((F.col("f") == 1).cast("long")).alias("f1"),
            F.sum((F.col("f") == 2).cast("long")).alias("f2"),
        )
        .select(
            "source",
            "vocab",
            "f1",
            "f2",
            r6(
                F.col("vocab")
                + F.col("f1")
                * F.col("f1")
                / (2.0 * F.greatest(F.col("f2"), F.lit(1)))
            ).alias("chao1"),
            r6(
                F.col("vocab")
                / (
                    F.col("vocab")
                    + F.col("f1")
                    * F.col("f1")
                    / (2.0 * F.greatest(F.col("f2"), F.lit(1)))
                )
            ).alias("coverage"),
        )
        .orderBy("source")
    )


def x325_merkle_root(spark, sf_dir):
    """Merkle snapshot of the documents table: md5 leaf hashes over
    100-doc_id chunks (hash of ordered per-row content hashes),
    10-way-fanned internal level, and the root — the integrity
    structure that lets two replicas find a diverging chunk in
    O(log n) hash comparisons instead of a full x102-style
    reconciliation scan.

    Scale: per-row hashing is a narrow map; each level is one
    aggregation with ordered string_agg inside the (bounded) group —
    chunk width caps group size."""
    d = T(spark, sf_dir, "documents")
    rows = d.select(
        (F.col("doc_id") / MK_LEAF).cast("long").alias("leaf"),
        "doc_id",
        F.md5(
            F.concat_ws("|", F.col("doc_id"), F.col("text"), F.col("lang"))
        ).alias("h"),
    )
    leaves = rows.groupBy("leaf").agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "h"))),
                    lambda e: e["h"],
                ),
            )
        ).alias("h")
    )
    from social_warner_spark.caching import register_persisted

    leaves = register_persisted(leaves.persist())
    mids = leaves.groupBy(
        (F.col("leaf") / MK_FAN).cast("long").alias("mid")
    ).agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("leaf", "h"))),
                    lambda e: e["h"],
                ),
            )
        ).alias("h")
    )
    mids = register_persisted(mids.persist())
    root = mids.groupBy().agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("mid", "h"))),
                    lambda e: e["h"],
                ),
            )
        ).alias("root_hash")
    )
    nl = leaves.agg(F.count("*").alias("n_leaves"))
    nm = mids.agg(F.count("*").alias("n_mid_nodes"))
    return (
        root.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(nm))
        .select("root_hash", "n_leaves", "n_mid_nodes")
    )


def x326_quantile_ci(spark, sf_dir):
    """Distribution-free order-statistic confidence interval for the
    p95 of the event value, per event type: the p95 point estimate
    plus the values at ranks np +/- z sqrt(np(1-p)) — the binomial
    rank interval that needs no distributional assumption (and that
    x68's sketch error bound should live inside).

    Scale: ranks resolve through the distinct-value cumulative
    relation per type — no global row window."""
    ev = T(spark, sf_dir, "events").select("event_type", F.col("value").alias("v"))
    vals = ev.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    tot = vals.groupBy("event_type").agg(F.sum("c").alias("n"))
    cw = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = vals.join(tot, "event_type").select(
        "event_type",
        "v",
        "n",
        F.sum("c").over(cw).alias("cum"),
    )
    ranks = tot.select(
        "event_type",
        "n",
        F.ceil(QCI_P * F.col("n")).cast("long").alias("r_pt"),
        F.greatest(
            F.lit(1),
            F.ceil(
                QCI_P * F.col("n")
                - QCI_Z
                * F.sqrt(F.col("n") * QCI_P * (1 - QCI_P))
            ).cast("long"),
        ).alias("r_lo"),
        F.least(
            F.col("n"),
            F.ceil(
                QCI_P * F.col("n")
                + QCI_Z
                * F.sqrt(F.col("n") * QCI_P * (1 - QCI_P))
            ).cast("long"),
        ).alias("r_hi"),
    )
    j = walk.join(ranks.select("event_type", "r_pt", "r_lo", "r_hi"), "event_type")
    pick = j.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.col("r_pt"), F.col("v"))).alias(
            "p95"
        ),
        F.min(F.when(F.col("cum") >= F.col("r_lo"), F.col("v"))).alias(
            "ci_lo"
        ),
        F.min(F.when(F.col("cum") >= F.col("r_hi"), F.col("v"))).alias(
            "ci_hi"
        ),
    )
    return (
        pick.join(tot, "event_type")
        .select("event_type", "n", "p95", "ci_lo", "ci_hi")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_IDX_SQL = """daily AS (
            SELECT date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS y
            FROM events GROUP BY 1
        ), idx AS MATERIALIZED (
            SELECT day,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS INT) AS s,
                   SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                       AS s1,
                   SUM(y * y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                       AS s2
            FROM daily
        ), tot AS (
            SELECT MAX(s) AS n, MAX_BY(s1, s) AS g1, MAX_BY(s2, s) AS g2
            FROM idx
        )"""


def _seg(a1, a2, a0, b1, b2, b0):
    return f"(({b2}) - ({a2})) - pow(({b1}) - ({a1}), 2) / (({b0}) - ({a0}))"


ORACLES = {
    "x322_multi_changepoint": f"""
        WITH {_IDX_SQL}, best1 AS MATERIALIZED (
            SELECT s AS b1, s1 AS b1s1, s2 AS b1s2, n, g1, g2,
                   ROUND({_seg("0.0", "0.0", "0", "s1", "s2", "s")}
                         + {_seg("s1", "s2", "s", "g1", "g2", "n")}, 6)
                       AS c1
            FROM idx CROSS JOIN tot
            WHERE s >= {CP_MIN_SEG} AND s <= n - {CP_MIN_SEG}
            ORDER BY c1, b1 LIMIT 1
        ), lvl1 AS (
            SELECT 'full_series' AS segment, b1 AS split_idx,
                   ROUND(g2 - g1 * g1 / n, 6) AS parent_sse,
                   c1 AS split_sse,
                   ROUND((ROUND(g2 - g1 * g1 / n, 6) - c1)
                         / ROUND(g2 - g1 * g1 / n, 6), 6) AS gain_share
            FROM best1
        ), lft AS (
            SELECT 'left_of_cp1' AS segment, split_idx, parent_sse,
                   split_sse,
                   ROUND((parent_sse - split_sse) / parent_sse, 6)
                       AS gain_share
            FROM (
                SELECT i.s AS split_idx,
                       ROUND({_seg("0.0", "0.0", "0",
                                   "b.b1s1", "b.b1s2", "b.b1")}, 6)
                           AS parent_sse,
                       ROUND({_seg("0.0", "0.0", "0",
                                   "i.s1", "i.s2", "i.s")}
                             + {_seg("i.s1", "i.s2", "i.s",
                                     "b.b1s1", "b.b1s2", "b.b1")}, 6)
                           AS split_sse
                FROM idx i CROSS JOIN best1 b
                WHERE i.s >= {CP_MIN_SEG} AND i.s <= b.b1 - {CP_MIN_SEG}
                ORDER BY split_sse, split_idx LIMIT 1
            )
        ), rgt AS (
            SELECT 'right_of_cp1' AS segment, split_idx, parent_sse,
                   split_sse,
                   ROUND((parent_sse - split_sse) / parent_sse, 6)
                       AS gain_share
            FROM (
                SELECT i.s AS split_idx,
                       ROUND({_seg("b.b1s1", "b.b1s2", "b.b1",
                                   "b.g1", "b.g2", "b.n")}, 6)
                           AS parent_sse,
                       ROUND({_seg("b.b1s1", "b.b1s2", "b.b1",
                                   "i.s1", "i.s2", "i.s")}
                             + {_seg("i.s1", "i.s2", "i.s",
                                     "b.g1", "b.g2", "b.n")}, 6)
                           AS split_sse
                FROM idx i CROSS JOIN best1 b
                WHERE i.s >= b.b1 + {CP_MIN_SEG}
                  AND i.s <= b.n - {CP_MIN_SEG}
                ORDER BY split_sse, split_idx LIMIT 1
            )
        )
        SELECT segment, split_idx, parent_sse, split_sse, gain_share,
               gain_share >= {CP2_MIN_GAIN} AS kept
        FROM (SELECT * FROM lvl1 UNION ALL SELECT * FROM lft
              UNION ALL SELECT * FROM rgt)
        ORDER BY segment
    """,
    "x323_power_planner": f"""
        WITH st AS (
            SELECT AVG(value) AS mu, var_samp(value) AS var,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT date_trunc('day', ts)) AS n_days
            FROM events
        ), mdes AS (
            SELECT UNNEST([{", ".join(str(m) for m in PW_MDES)}]) AS mde
        )
        SELECT mde,
               ROUND(mde * mu + 1e-9, 6) AS abs_delta,
               CAST(ceil(2.0 * {(PW_Z_ALPHA + PW_Z_BETA) ** 2!r} * var
                         / pow(mde * mu, 2)) AS BIGINT) AS n_per_arm,
               ROUND(ceil(2.0 * {(PW_Z_ALPHA + PW_Z_BETA) ** 2!r} * var
                          / pow(mde * mu, 2))
                     / (n_events * 1.0 / n_days / 2.0) + 1e-9, 6) AS days_needed
        FROM mdes CROSS JOIN st
        ORDER BY mde
    """,
    "x324_chao1_richness": """
        WITH freq AS (
            SELECT source, tok, COUNT(*) AS f
            FROM (SELECT source,
                         UNNEST(string_split(trim(text), ' ')) AS tok
                  FROM documents)
            GROUP BY 1, 2
        ), agg AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
                   CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f1,
                   CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f2
            FROM freq GROUP BY source
        )
        SELECT source, vocab, f1, f2,
               ROUND(vocab + f1 * f1 * 1.0 / (2.0 * GREATEST(f2, 1)), 6)
                   AS chao1,
               ROUND(vocab / (vocab + f1 * f1 * 1.0
                              / (2.0 * GREATEST(f2, 1))), 6) AS coverage
        FROM agg ORDER BY source
    """,
    "x325_merkle_root": f"""
        WITH rows_ AS (
            SELECT CAST(doc_id // {MK_LEAF} AS BIGINT) AS leaf, doc_id,
                   md5(CAST(doc_id AS VARCHAR) || '|' || text || '|'
                       || lang) AS h
            FROM documents
        ), leaves AS MATERIALIZED (
            SELECT leaf, md5(string_agg(h, '' ORDER BY doc_id)) AS h
            FROM rows_ GROUP BY leaf
        ), mids AS MATERIALIZED (
            SELECT CAST(leaf // {MK_FAN} AS BIGINT) AS mid,
                   md5(string_agg(h, '' ORDER BY leaf)) AS h
            FROM leaves GROUP BY 1
        )
        SELECT (SELECT md5(string_agg(h, '' ORDER BY mid)) FROM mids)
                   AS root_hash,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM leaves) AS n_leaves,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM mids) AS n_mid_nodes
    """,
    "x326_quantile_ci": f"""
        WITH vals AS (
            SELECT event_type, value AS v, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, SUM(c) AS n FROM vals GROUP BY 1
        ), walk AS (
            SELECT v.event_type, v.v,
                   SUM(v.c) OVER (PARTITION BY v.event_type ORDER BY v.v
                        ROWS UNBOUNDED PRECEDING) AS cum
            FROM vals v
        ), ranks AS (
            SELECT event_type, n,
                   CAST(ceil({QCI_P} * n) AS BIGINT) AS r_pt,
                   GREATEST(1, CAST(ceil({QCI_P} * n
                       - {QCI_Z} * sqrt(n * {QCI_P} * (1 - {QCI_P})))
                       AS BIGINT)) AS r_lo,
                   LEAST(n, CAST(ceil({QCI_P} * n
                       + {QCI_Z} * sqrt(n * {QCI_P} * (1 - {QCI_P})))
                       AS BIGINT)) AS r_hi
            FROM tot
        )
        SELECT r.event_type, CAST(r.n AS BIGINT) AS n,
               MIN(CASE WHEN w.cum >= r.r_pt THEN w.v END) AS p95,
               MIN(CASE WHEN w.cum >= r.r_lo THEN w.v END) AS ci_lo,
               MIN(CASE WHEN w.cum >= r.r_hi THEN w.v END) AS ci_hi
        FROM walk w JOIN ranks r USING (event_type)
        GROUP BY r.event_type, r.n
        ORDER BY r.event_type
    """,
}

QUERIES = {
    "x322_multi_changepoint": x322_multi_changepoint,
    "x323_power_planner": x323_power_planner,
    "x324_chao1_richness": x324_chao1_richness,
    "x325_merkle_root": x325_merkle_root,
    "x326_quantile_ci": x326_quantile_ci,
}
