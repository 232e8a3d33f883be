"""x29 series — round-3 widening batch (x327–x331): hierarchical
forecast reconciliation, seasonal-hybrid ESD anomaly screening,
leave-one-out target encoding, medoid canonical selection, and group
fairness auditing.

Like every other series, each query is a pure DataFrame program over
the driver's parquet tables with an independently-written DuckDB
oracle.  x330 and x331 continue the audit-pairing discipline (x330
re-scores the x27 clustering's canonical policy; x331 audits the x298
stump across sources).

Literature grounding (public):
- Hyndman et al., "Optimal combination forecasts for hierarchical
  time series" (CSDA 2011) — bottom-up/top-down coherence.
- Hochenbaum, Vallis & Kejariwal (arXiv 1704.07706) — seasonal-hybrid
  ESD.
- Micci-Barreca (SIGKDD Expl. 2001) — target encoding; leave-one-out
  form per common Kaggle practice writeups.
- Kaufman & Rousseeuw — PAM medoids.
- Hardt, Price & Srebro (NeurIPS 2016) — equalized odds; demographic
  parity per Dwork et al. (ITCS 2012).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import T, r6

#: x327 — look-back window (days) for the base forecasts.
FR_LOOKBACK = 14
#: x328 — robust-z parameters (the x82 MAD convention).
SH_Z = 3.5
SH_SCALE = 0.6745
SH_TOP = 5
#: x329 — encoded target and category.
TE_LANG = "en"
#: x330 — cluster threshold (x27's) and the pair-sample floor; pairs
#: absent from the sample count as similarity 0 (distance 1).
MED_THRESHOLD = 0.5
MED_SAMPLE_MIN = 0.3
#: x331 — fairness positive label.
FA_LANG = "en"


def x327_forecast_reconcile(spark, sf_dir):
    """Hierarchical forecast coherence: per-event-type base forecasts
    (14-day look-back means) vs the total-series base forecast —
    bottom-up (sum the children) and top-down (share out the parent)
    reconciliations side by side, with the incoherence the raw base
    forecasts carry — the roll-up consistency problem every
    metrics-warehouse forecast hits.

    Scale: the corpus collapses to the (day x type) grid; the
    look-back filter anchors on the observed max day (broadcast)."""
    ev = T(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    from social_warner_spark.caching import register_persisted

    cell = register_persisted(cell.persist())
    mx = cell.agg(F.max("day").alias("mx"))
    lb = cell.crossJoin(F.broadcast(mx)).where(
        F.datediff(F.col("mx"), F.col("day")) < FR_LOOKBACK
    )
    lb = register_persisted(lb.persist())
    per = lb.groupBy("event_type").agg(
        r6(F.avg("c")).alias("base_fc"),
        F.sum("c").alias("lb_total"),
    )
    totals = lb.groupBy("day").agg(F.sum("c").alias("ct")).agg(
        r6(F.avg("ct")).alias("total_base_fc")
    )
    gt = per.agg(
        r6(F.sum("base_fc")).alias("bottom_up_total"),
        F.sum("lb_total").alias("lb_grand"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(gt))
        .select(
            "event_type",
            "base_fc",
            r6(
                F.col("total_base_fc")
                * F.col("lb_total")
                / F.col("lb_grand")
            ).alias("top_down_fc"),
            "total_base_fc",
            "bottom_up_total",
            r6(
                F.abs(F.col("bottom_up_total") - F.col("total_base_fc"))
            ).alias("incoherence"),
        )
        .orderBy("event_type")
    )


def x328_shesd_anomalies(spark, sf_dir):
    """Seasonal-hybrid ESD-style anomaly screen on the daily total
    value: remove the x301 trend (centered 7-day MA) and day-of-week
    seasonal means, then robust-z the residuals (median/MAD, the x82
    convention) and report the top-5 most anomalous days with the
    |z| > 3.5 flag — the production anomaly detector layout (detrend +
    deseasonalize + robust tail test).

    Scale: bounded daily grid; medians via percentile on the residual
    relation."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    half = 3
    mw = Window.orderBy("day").rowsBetween(-half, half)
    cnt = F.count("*").over(mw)
    trended = daily.select(
        "day",
        "y",
        F.when(cnt == 7, F.round(F.avg("y").over(mw), 6)).alias("t"),
        F.dayofweek("day").alias("dow"),
    ).where(F.col("t").isNotNull())
    from social_warner_spark.caching import register_persisted

    trended = register_persisted(trended.persist())
    seas = trended.groupBy("dow").agg(
        F.round(F.avg(F.col("y") - F.col("t")), 6).alias("s")
    )
    resid = trended.join(F.broadcast(seas), "dow").select(
        "day", "y", (F.col("y") - F.col("t") - F.col("s")).alias("r")
    )
    resid = register_persisted(resid.persist())
    med = resid.agg(
        F.round(F.expr("percentile(r, 0.5)"), 6).alias("med")
    )
    absdev = resid.crossJoin(F.broadcast(med)).select(
        "day", "y", "r", F.abs(F.col("r") - F.col("med")).alias("ad"),
        "med",
    )
    mad = absdev.agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad")
    )
    z = SH_SCALE * (F.col("r") - F.col("med")) / F.col("mad")
    scored = absdev.crossJoin(F.broadcast(mad)).select(
        "day", "y", r6(F.col("r")).alias("residual"), r6(z).alias("z")
    )
    w = Window.orderBy(F.desc(F.abs(F.col("z"))), F.asc("day"))
    return (
        scored.orderBy(F.desc(F.abs(F.col("z"))), F.asc("day"))
        .limit(SH_TOP)
        .withColumn("rk", F.row_number().over(w))
        .withColumn("is_anomaly", F.abs(F.col("z")) > SH_Z)
    )


def x329_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding of source against lang='en': the
    naive per-source mean (which leaks each row's own label) beside
    the LOO form (sum - y)/(n - 1), with the GLOBAL corr(y, encoding)
    under both — the leakage gap is the number that explains why naive
    target encoding overfits (LOO group means coincide with naive by
    algebra; the per-row spread and the correlation do not).

    Scale: one per-source aggregation broadcast back over a narrow
    map; correlations are two corpus aggregates."""
    d = T(spark, sf_dir, "documents").select(
        "source", (F.col("lang") == TE_LANG).cast("double").alias("y")
    )
    grp = d.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("y").alias("sy")
    )
    enc = d.join(F.broadcast(grp), "source").select(
        "source",
        "y",
        (F.col("sy") / F.col("n")).alias("naive"),
        ((F.col("sy") - F.col("y")) / (F.col("n") - 1)).alias("loo"),
    )
    from social_warner_spark.caching import register_persisted

    enc = register_persisted(enc.persist())
    g = enc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        r6(F.max("naive")).alias("naive_enc"),
        r6(F.stddev_samp("loo")).alias("loo_std"),
    )
    cors = enc.agg(
        r6(F.corr("y", "naive")).alias("corr_naive"),
        r6(F.corr("y", "loo")).alias("corr_loo"),
    )
    return (
        g.crossJoin(F.broadcast(cors))
        .select(
            "source", "n_docs", "naive_enc", "loo_std",
            "corr_naive", "corr_loo",
        )
        .orderBy("source")
    )


def x330_medoid_canonicals(spark, sf_dir):
    """Canonical-selection policy audit for the x27 near-dup clusters:
    the medoid (member minimizing total intra-cluster distance, 1 -
    sampled Jaccard with absent pairs at distance 1) versus the min-id
    canonical x77's keep-policy uses — reporting both policies' mean
    intra-cluster distance and the medoid's improvement.  Multi-member
    clusters only.

    Scale: clustering and the pair sample are the bounded dedup
    outputs; the per-candidate sums run on cluster-sized relations."""
    from social_warner_spark.operators.dedup import (
        exact_jaccard_pairs,
        neardup_clusters,
    )
    from social_warner_spark.caching import register_persisted

    d = T(spark, sf_dir, "documents")
    labels = register_persisted(
        neardup_clusters(d, threshold=MED_THRESHOLD)
        .select("doc_id", "cluster_id")
        .persist()
    )
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    multi = sizes.where(F.col("sz") >= 2)
    # multi is cluster-count-scaled (grows with |docs|) → no hint
    mem = labels.join(multi, "cluster_id")
    pairs = exact_jaccard_pairs(d, MED_SAMPLE_MIN).select(
        F.col("doc_id_a").alias("a"),
        F.col("doc_id_b").alias("b"),
        "jaccard",
    )
    sym = pairs.union(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "jaccard"
        )
    )
    la = mem.select(
        F.col("cluster_id"), F.col("doc_id").alias("a"), F.col("sz")
    )
    lb = mem.select(F.col("cluster_id"), F.col("doc_id").alias("b"))
    known = (
        la.join(lb, "cluster_id")
        .where(F.col("a") != F.col("b"))
        .join(sym, ["a", "b"], "left")
        .groupBy("cluster_id", "a", "sz")
        .agg(
            F.sum(
                1.0 - F.coalesce(F.col("jaccard"), F.lit(0.0))
            ).alias("dsum")
        )
    )
    med = known.groupBy("cluster_id").agg(
        F.min_by("a", F.struct("dsum", "a")).alias("medoid"),
        F.min("dsum").alias("med_dsum"),
        F.max("sz").alias("sz"),
    )
    minid = known.groupBy("cluster_id").agg(
        F.min("a").alias("minid"),
        F.min_by("dsum", "a").alias("minid_dsum"),
    )
    j = med.join(minid, "cluster_id").select(
        "cluster_id",
        "sz",
        (F.col("med_dsum") / (F.col("sz") - 1)).alias("mean_d_medoid"),
        (F.col("minid_dsum") / (F.col("sz") - 1)).alias("mean_d_minid"),
        (F.col("medoid") != F.col("minid")).cast("long").alias("differs"),
    )
    return j.agg(
        F.count("*").alias("n_multi_clusters"),
        F.sum("differs").alias("n_policy_differs"),
        r6(F.avg("mean_d_medoid")).alias("avg_d_medoid"),
        r6(F.avg("mean_d_minid")).alias("avg_d_minid"),
        r6(
            (F.avg("mean_d_minid") - F.avg("mean_d_medoid"))
            / F.greatest(F.avg("mean_d_minid"), F.lit(1e-12))
        ).alias("improvement"),
    )


def x331_fairness_audit(spark, sf_dir):
    """Group fairness audit of the x298 decision stump across sources:
    per source, the positive-prediction rate (demographic parity), the
    TPR (equal opportunity) and FPR; global gaps (max - min) ride
    along — the release-gate fairness readout applied to the stump the
    corpus actually induces (the x256/x269/x307/x315 audit-pairing
    discipline).

    Scale: the stump threshold is the x298 argmax (a broadcast 1-row
    relation); the audit is one per-source aggregation."""
    from social_warner_spark.queries.x23_series import x298_decision_stump

    thr = x298_decision_stump(spark, sf_dir).select(
        "threshold"
    ).localCheckpoint(eager=True)
    d = T(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        (F.col("lang") == FA_LANG).cast("long").alias("y"),
    )
    scored = d.crossJoin(F.broadcast(thr)).select(
        "source",
        "y",
        (F.col("n_chars") <= F.col("threshold")).cast("long").alias("pred"),
    )
    per = scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        r6(F.avg("pred")).alias("pos_rate"),
        F.when(
            F.sum("y") > 0,
            r6(F.sum(F.col("pred") * F.col("y")) / F.sum("y")),
        ).alias("tpr"),
        F.when(
            F.sum(1 - F.col("y")) > 0,
            r6(
                F.sum(F.col("pred") * (1 - F.col("y")))
                / F.sum(1 - F.col("y"))
            ),
        ).alias("fpr"),
    )
    gaps = per.agg(
        r6(F.max("pos_rate") - F.min("pos_rate")).alias("dp_gap"),
        r6(F.max("tpr") - F.min("tpr")).alias("eo_gap"),
    )
    return (
        per.crossJoin(F.broadcast(gaps))
        .select(
            "source", "n_docs", "pos_rate", "tpr", "fpr",
            "dp_gap", "eo_gap",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

from social_warner_spark.queries.x23_series import (  # noqa: E402
    STUMP_LANG as _STUMP_LANG,
)

#: the x298 stump-threshold CTE chain, reused verbatim so x331 audits
#: exactly the stump x298 declares.
_STUMP_THRESH_SQL = f"""sd AS (
            SELECT n_chars AS x,
                   CASE WHEN lang = '{_STUMP_LANG}' THEN 1 ELSE 0 END AS y
            FROM documents
        ), svals AS (
            SELECT x, COUNT(*) AS c, SUM(y) AS p FROM sd GROUP BY x
        ), stot AS (
            SELECT SUM(c) AS n, SUM(p) AS np FROM svals
        ), swalk AS (
            SELECT x, stot.n, stot.np,
                   SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                       AS nl,
                   SUM(p) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                       AS pl
            FROM svals CROSS JOIN stot
        ), sscored AS (
            SELECT x AS threshold,
                   ROUND(
                       -(CASE WHEN np * 1.0 / n > 0
                              THEN np * 1.0 / n * log2(np * 1.0 / n)
                              ELSE 0 END
                         + CASE WHEN np * 1.0 / n < 1
                                THEN (1 - np * 1.0 / n)
                                     * log2(1 - np * 1.0 / n)
                                ELSE 0 END)
                       - (nl * 1.0 / n
                          * -(CASE WHEN pl * 1.0 / nl > 0
                                   THEN pl * 1.0 / nl
                                        * log2(pl * 1.0 / nl)
                                   ELSE 0 END
                              + CASE WHEN pl * 1.0 / nl < 1
                                     THEN (1 - pl * 1.0 / nl)
                                          * log2(1 - pl * 1.0 / nl)
                                     ELSE 0 END)
                          + (n - nl) * 1.0 / n
                          * -(CASE WHEN (np - pl) * 1.0 / (n - nl) > 0
                                   THEN (np - pl) * 1.0 / (n - nl)
                                        * log2((np - pl) * 1.0 / (n - nl))
                                   ELSE 0 END
                              + CASE WHEN (np - pl) * 1.0 / (n - nl) < 1
                                     THEN (1 - (np - pl) * 1.0 / (n - nl))
                                          * log2(1 - (np - pl) * 1.0
                                                 / (n - nl))
                                     ELSE 0 END)), 6) AS info_gain
            FROM swalk WHERE nl < n
        ), thr AS MATERIALIZED (
            SELECT threshold FROM sscored
            ORDER BY info_gain DESC, threshold LIMIT 1
        )"""


ORACLES = {
    "x327_forecast_reconcile": f"""
        WITH cell AS (
            SELECT date_trunc('day', ts) AS day, event_type,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ), mx AS (
            SELECT MAX(day) AS mx FROM cell
        ), lb AS MATERIALIZED (
            SELECT c.* FROM cell c CROSS JOIN mx
            WHERE date_diff('day', c.day, mx.mx) < {FR_LOOKBACK}
        ), per AS (
            SELECT event_type, ROUND(AVG(c), 6) AS base_fc,
                   SUM(c) AS lb_total
            FROM lb GROUP BY 1
        ), totals AS (
            SELECT ROUND(AVG(ct), 6) AS total_base_fc
            FROM (SELECT day, SUM(c) AS ct FROM lb GROUP BY day)
        ), gt AS (
            SELECT ROUND(SUM(base_fc), 6) AS bottom_up_total,
                   SUM(lb_total) AS lb_grand
            FROM per
        )
        SELECT p.event_type, p.base_fc,
               ROUND(t.total_base_fc * p.lb_total / g.lb_grand, 6)
                   AS top_down_fc,
               t.total_base_fc, g.bottom_up_total,
               ROUND(ABS(g.bottom_up_total - t.total_base_fc), 6)
                   AS incoherence
        FROM per p CROSS JOIN totals t CROSS JOIN gt g
        ORDER BY p.event_type
    """,
    "x328_shesd_anomalies": f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS y
            FROM events GROUP BY 1
        ), trended AS (
            SELECT day, y,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN ROUND(AVG(y) OVER w, 6) END AS t,
                   dayofweek(day) + 1 AS dow
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ), tf AS MATERIALIZED (
            SELECT * FROM trended WHERE t IS NOT NULL
        ), seas AS (
            SELECT dow, ROUND(AVG(y - t), 6) AS s FROM tf GROUP BY dow
        ), resid AS MATERIALIZED (
            SELECT tf.day, tf.y, tf.y - tf.t - seas.s AS r
            FROM tf JOIN seas USING (dow)
        ), med AS (
            SELECT ROUND(median(r), 6) AS med FROM resid
        ), mad AS (
            SELECT ROUND(median(ABS(r - med)), 6) AS mad
            FROM resid CROSS JOIN med
        )
        SELECT day, y, ROUND(r, 6) AS residual,
               ROUND({SH_SCALE} * (r - med) / mad, 6) AS z,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ABS(ROUND({SH_SCALE} * (r - med) / mad, 6))
                            DESC, day) AS INT) AS rk,
               ABS(ROUND({SH_SCALE} * (r - med) / mad, 6)) > {SH_Z}
                   AS is_anomaly
        FROM resid CROSS JOIN med CROSS JOIN mad
        ORDER BY ABS(ROUND({SH_SCALE} * (r - med) / mad, 6)) DESC, day
        LIMIT {SH_TOP}
    """,
    "x329_target_encoding": f"""
        WITH d AS (
            SELECT source,
                   CASE WHEN lang = '{TE_LANG}' THEN 1.0 ELSE 0.0 END AS y
            FROM documents
        ), grp AS (
            SELECT source, COUNT(*) AS n, SUM(y) AS sy FROM d GROUP BY 1
        ), enc AS MATERIALIZED (
            SELECT d.source, d.y, grp.sy / grp.n AS naive,
                   (grp.sy - d.y) / (grp.n - 1) AS loo
            FROM d JOIN grp USING (source)
        ), g AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND(MAX(naive), 6) AS naive_enc,
                   ROUND(stddev_samp(loo), 6) AS loo_std
            FROM enc GROUP BY source
        ), cors AS (
            SELECT ROUND(corr(y, naive), 6) AS corr_naive,
                   ROUND(corr(y, loo), 6) AS corr_loo
            FROM enc
        )
        SELECT g.source, g.n_docs, g.naive_enc, g.loo_std,
               cors.corr_naive, cors.corr_loo
        FROM g CROSS JOIN cors
        ORDER BY g.source
    """,
    "x330_medoid_canonicals": f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 3
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), spairs AS MATERIALIZED (
            SELECT a, b, ROUND(c * 1.0 / (sa.sz + sb.sz - c), 6)
                       AS jaccard
            FROM shared
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE ROUND(c * 1.0 / (sa.sz + sb.sz - c), 6)
                  >= {MED_SAMPLE_MIN}
        ), cpairs AS (
            SELECT a, b FROM spairs WHERE jaccard >= {MED_THRESHOLD}
        ), edges AS (
            SELECT a AS src, b AS dst FROM cpairs
            UNION ALL SELECT b, a FROM cpairs
        ), reach(id, lab) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, r.lab FROM reach r JOIN edges e ON e.dst = r.id
        ), clusters AS MATERIALIZED (
            SELECT id AS doc_id, MIN(lab) AS cluster_id
            FROM reach GROUP BY id
        ), csz AS (
            SELECT cluster_id, COUNT(*) AS sz FROM clusters GROUP BY 1
        ), mem AS (
            SELECT c.doc_id, c.cluster_id, s.sz
            FROM clusters c JOIN csz s USING (cluster_id)
            WHERE s.sz >= 2
        ), sym AS (
            SELECT a, b, jaccard FROM spairs
            UNION ALL SELECT b, a, jaccard FROM spairs
        ), known AS MATERIALIZED (
            SELECT la.cluster_id, la.doc_id AS a, la.sz,
                   SUM(1.0 - COALESCE(sy.jaccard, 0.0)) AS dsum
            FROM mem la
            JOIN mem lb ON la.cluster_id = lb.cluster_id
                       AND la.doc_id != lb.doc_id
            LEFT JOIN sym sy ON sy.a = la.doc_id AND sy.b = lb.doc_id
            GROUP BY 1, 2, 3
        ), medo AS (
            SELECT cluster_id, a AS medoid, dsum AS med_dsum, sz
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY cluster_id ORDER BY dsum, a) AS rn
                  FROM known)
            WHERE rn = 1
        ), mid AS (
            SELECT cluster_id, MIN(a) AS minid,
                   MIN_BY(dsum, a) AS minid_dsum
            FROM known GROUP BY 1
        ), j AS (
            SELECT m.cluster_id, m.sz,
                   m.med_dsum / (m.sz - 1) AS mean_d_medoid,
                   i.minid_dsum / (m.sz - 1) AS mean_d_minid,
                   CASE WHEN m.medoid != i.minid THEN 1 ELSE 0 END
                       AS differs
            FROM medo m JOIN mid i USING (cluster_id)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_clusters,
               CAST(SUM(differs) AS BIGINT) AS n_policy_differs,
               ROUND(AVG(mean_d_medoid), 6) AS avg_d_medoid,
               ROUND(AVG(mean_d_minid), 6) AS avg_d_minid,
               ROUND((AVG(mean_d_minid) - AVG(mean_d_medoid))
                     / GREATEST(AVG(mean_d_minid), 1e-12), 6)
                   AS improvement
        FROM j
    """,
    "x331_fairness_audit": f"""
        WITH {_STUMP_THRESH_SQL}, d AS (
            SELECT source, n_chars,
                   CASE WHEN lang = '{FA_LANG}' THEN 1 ELSE 0 END AS y
            FROM documents
        ), scored AS (
            SELECT d.source, d.y,
                   CASE WHEN d.n_chars <= thr.threshold
                        THEN 1 ELSE 0 END AS pred
            FROM d CROSS JOIN thr
        ), per AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND(AVG(pred), 6) AS pos_rate,
                   CASE WHEN SUM(y) > 0
                        THEN ROUND(SUM(pred * y) * 1.0 / SUM(y), 6)
                   END AS tpr,
                   CASE WHEN SUM(1 - y) > 0
                        THEN ROUND(SUM(pred * (1 - y)) * 1.0
                                   / SUM(1 - y), 6)
                   END AS fpr
            FROM scored GROUP BY source
        ), gaps AS (
            SELECT ROUND(MAX(pos_rate) - MIN(pos_rate), 6) AS dp_gap,
                   ROUND(MAX(tpr) - MIN(tpr), 6) AS eo_gap
            FROM per
        )
        SELECT per.source, per.n_docs, per.pos_rate, per.tpr, per.fpr,
               gaps.dp_gap, gaps.eo_gap
        FROM per CROSS JOIN gaps
        ORDER BY per.source
    """,
}

QUERIES = {
    "x327_forecast_reconcile": x327_forecast_reconcile,
    "x328_shesd_anomalies": x328_shesd_anomalies,
    "x329_target_encoding": x329_target_encoding,
    "x330_medoid_canonicals": x330_medoid_canonicals,
    "x331_fairness_audit": x331_fairness_audit,
}
