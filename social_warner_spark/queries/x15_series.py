"""x15 series — round-3 widening batch (x257–x261): rank correlation
(Spearman and Kendall tau-b), topological link prediction, t-closeness
release auditing, and autocorrelation / portmanteau white-noise testing.

Like every other series, each query is a pure DataFrame program over the
driver's parquet tables with an independently-written DuckDB oracle.
Rank statistics are computed with the scale posture in mind: the
corpus-wide Spearman ranks are derived from the DISTINCT-VALUE
cumulative-count relation (bounded support) rather than a global
one-partition row window, while the DuckDB oracle uses the classic
RANK()+tie-count average-rank formulation — two genuinely independent
routes to the same statistic.

Literature grounding (public):
- Spearman, "The proof and measurement of association between two
  things" (Am. J. Psychol. 1904).
- Kendall, "A new measure of rank correlation" (Biometrika 1938);
  tau-b tie correction per Kendall (1945).
- Adamic & Adar, "Friends and neighbors on the Web" (Social Networks
  2003); evaluation protocol per Liben-Nowell & Kleinberg (CIKM 2003).
- Li, Li & Venkatasubramanian, "t-Closeness: privacy beyond
  k-anonymity and l-diversity" (ICDE 2007) — ordered-distance EMD.
- Ljung & Box, "On a measure of lack of fit in time series models"
  (Biometrika 1978).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import tokens
from social_warner_spark.queries.common import T, r6

#: x259 — wedge centers with degree above this cap are excluded from
#: Adamic–Adar candidate generation (both engines): a hub of degree d
#: yields d(d-1)/2 wedge rows, each contributing only 1/ln(d), so the
#: cap bounds the self-join at cap x |edges| while dropping the
#: lowest-information evidence first (standard LP practice).
AA_MAX_DEG = 50
#: x259 — predicted links reported.
AA_TOPK = 20
#: x260 — t-closeness thresholds: sensitive band width (acctbal units,
#: matching x240's l-diversity audit so the two release gates share one
#: sensitive-attribute definition), and the max allowed EMD t.
TCLOSE_BAND = 1000.0
TCLOSE_T = 0.2
#: x261 — autocorrelation lags tested (Ljung–Box Q accumulates over
#: the first k lags).
ACF_MAX_LAG = 10


def _avg_ranks(d, col, out):
    """Attach the average (mid) rank of `col` as `out`, computed from
    the distinct-value relation: avg_rank(v) = #(x < v) + (count(v)+1)/2.
    The sort window runs over DISTINCT values (bounded support for
    integer-valued signals), never over the full corpus, and the rank
    map joins back as a broadcast."""
    vals = d.groupBy(col).agg(F.count("*").alias("_c"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    ranks = vals.select(
        col,
        (
            F.coalesce(F.sum("_c").over(w), F.lit(0))
            + (F.col("_c") + 1) / 2.0
        ).alias(out),
    )
    return d.join(F.broadcast(ranks), col)


def x257_spearman_quality(spark, sf_dir):
    """Spearman rank correlation between document token count and
    character count — the monotone-association readout used to sanity-
    check that two quality signals are (or are not) redundant before
    both are spent on filtering.  Average ranks under ties, then the
    Pearson correlation of the ranks; the raw-value Pearson r rides
    along so the rank/linear gap is visible in one row.

    Scale: both signals are integer-valued with bounded support, so
    ranks come from the distinct-value cumulative relation (see
    `_avg_ranks`) — two small sort windows and two broadcast join-backs;
    the corpus itself contributes one narrow map plus one `corr`
    aggregate."""
    from social_warner_spark.caching import register_persisted

    # (a, b) feeds three consumers (two rank maps + the final corr scan)
    # — persist the 2-int relation or the tokenizing scan runs 4x.
    d = register_persisted(
        T(spark, sf_dir, "documents")
        .select(
            F.size(tokens(F.col("text"))).alias("a"),
            F.col("n_chars").alias("b"),
        )
        .persist()
    )
    ranked = _avg_ranks(_avg_ranks(d, "a", "ra"), "b", "rb")
    return ranked.agg(
        F.count("*").alias("n_docs"),
        r6(F.corr("ra", "rb")).alias("spearman_rho"),
        r6(F.corr("a", "b")).alias("pearson_r"),
    )


def x258_kendall_sources(spark, sf_dir):
    """Kendall tau-b between per-source token volume and per-source
    dominant-language share — "do the sources we lean on hardest also
    skew monolingual?", the ordinal complement to x254's Gini
    concentration.  Concordant/discordant pairs with the tau-b tie
    correction: tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)); a fully-tied
    margin yields NULL rather than an error (the driver's testdata keeps
    per-source DOC counts exactly uniform, which is why the volume axis
    is tokens, not documents).

    Scale: the pair join is over the |sources|-row aggregate (bounded),
    so the quadratic blowup is sources^2, not docs^2; the corpus does
    one two-level map-side-combined aggregation."""
    cell = (
        T(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.size(tokens(F.col("text")))).alias("toks"),
        )
    )
    s = cell.groupBy("source").agg(
        F.sum("toks").alias("x"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("y"),
    )
    a, b = s.alias("a"), s.alias("b")
    pr = a.join(b, F.col("a.source") < F.col("b.source")).select(
        (F.col("a.x") - F.col("b.x")).alias("dx"),
        (F.col("a.y") - F.col("b.y")).alias("dy"),
    )
    agg = pr.agg(
        F.count("*").alias("n0"),
        F.sum(((F.col("dx") * F.col("dy")) > 0).cast("long")).alias("c"),
        F.sum(((F.col("dx") * F.col("dy")) < 0).cast("long")).alias("d"),
        F.sum((F.col("dx") == 0).cast("long")).alias("n1"),
        F.sum((F.col("dy") == 0).cast("long")).alias("n2"),
    )
    nsrc = s.agg(F.count("*").alias("n_sources"))
    return (
        agg.crossJoin(F.broadcast(nsrc))
        .select(
            "n_sources",
            F.col("n0").alias("n_pairs"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            r6(
                F.when(
                    (F.col("n0") > F.col("n1")) & (F.col("n0") > F.col("n2")),
                    (F.col("c") - F.col("d"))
                    / F.sqrt(
                        (F.col("n0") - F.col("n1"))
                        * (F.col("n0") - F.col("n2"))
                    ),
                )
            ).alias("tau_b"),
        )
    )


def x259_adamic_adar(spark, sf_dir):
    """Adamic–Adar link prediction on the part co-purchase graph (the
    x81 graph: parts sharing an order are adjacent): for each
    NON-adjacent pair, score = sum over common neighbors z of
    1/ln(deg(z)) — rarer shared contexts count for more — and the
    top-20 predicted links are reported.

    Scale: wedges are generated from per-center adjacency ARRAYS, with
    centers capped at deg <= 50 (`AA_MAX_DEG`, both engines) BEFORE the
    neighbor collect, so per-row state is O(cap) and the per-center
    wedge emit is a narrow C(deg, 2) combination explode — the wedge
    cost is bounded by cap x |edges| instead of sum(deg^2) and never
    materializes a center self-join (r10: replaced the ctr ⋈ ctr
    equi-join — one fewer edge-scale Exchange, measured 2.7→1.5s at
    sf0.1).  A hub's dropped wedges are the minimum-weight evidence by
    construction.  Existing edges leave via an equi anti-join; top-k is
    orderBy+limit (per-partition heaps)."""
    from social_warner_spark.operators.graph import sorted_array_pairs, within_group_pairs

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    from social_warner_spark.caching import register_persisted

    # edges feeds three consumers (both union sides + the anti-join) —
    # persist or the basket-pair construction re-executes per consumer.
    edges = register_persisted(within_group_pairs(li, "ok", "pk").persist())
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Degree first (bounded count state), THEN collect the ≤cap adjacency:
    # hubs never accumulate an unbounded neighbor array.
    deg = (
        und.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .where(F.col("deg") <= AA_MAX_DEG)
        .select("src")
    )
    adj = (
        und.join(deg, "src")
        .groupBy("src")
        .agg(F.array_sort(F.collect_set("dst")).alias("nbrs"))
        .select("nbrs", (1.0 / F.log(F.size("nbrs"))).alias("w"))
    )
    wedges = adj.select(
        F.explode(sorted_array_pairs(F.col("nbrs"), "a", "b")).alias("_e"), "w"
    ).select(F.col("_e.a").alias("a"), F.col("_e.b").alias("b"), "w")
    cand = wedges.groupBy("a", "b").agg(
        F.count("*").alias("common_neighbors"),
        r6(F.sum("w")).alias("score"),
    )
    pred = cand.join(
        edges,
        (F.col("a") == F.col("src")) & (F.col("b") == F.col("dst")),
        "left_anti",
    )
    w = Window.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
    return (
        pred.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
        .limit(AA_TOPK)
        .withColumn("rk", F.row_number().over(w))
    )


def x260_t_closeness(spark, sf_dir):
    """t-closeness audit of the x240 release classes: per equivalence
    class (nation, market segment), the Earth Mover's Distance between
    the class's sensitive-attribute distribution (acctbal band, ordered)
    and the global one — EMD over an ordered attribute is
    sum_i |cumsum_i(P_class - P_global)| / (m - 1).  Classes with
    EMD > t fail the gate even when they pass k-anonymity/l-diversity
    (the attack t-closeness exists to close).

    Scale: one two-level aggregation of the customer table; everything
    after runs on the classes x bands grid (bounded), with the global
    band distribution broadcast."""
    c = T(spark, sf_dir, "customer")
    cell = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / TCLOSE_BAND).alias("band"),
    ).agg(F.count("*").alias("cnt"))
    from social_warner_spark.caching import register_persisted

    cell = register_persisted(cell.persist())
    classes = cell.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("k")
    )
    glob = cell.groupBy("band").agg(F.sum("cnt").alias("g"))
    tot = cell.agg(
        F.sum("cnt").alias("n"), F.countDistinct("band").alias("m")
    )
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cell, ["c_nationkey", "c_mktsegment", "band"], "left")
        .crossJoin(F.broadcast(tot))
    )
    cw = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    diff = F.coalesce(F.col("cnt"), F.lit(0)) / F.col("k") - F.col(
        "g"
    ) / F.col("n")
    stepped = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "m",
        F.abs(F.sum(diff).over(cw)).alias("astep"),
    )
    return (
        stepped.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("k").alias("k"),
            r6(F.sum("astep") / (F.max("m") - 1)).alias("emd"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "emd",
            (F.col("emd") <= TCLOSE_T).alias("t_close_ok"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


def x261_acf_ljung_box(spark, sf_dir):
    """Autocorrelation function of the daily total event value at lags
    1..10, with the cumulative Ljung–Box portmanteau statistic
    Q_k = n(n+2) * sum_{j<=k} r_j^2/(n-j) — the standard "is anything
    left in this series but noise" check run on pipeline volume before
    trusting a seasonality model (x197 measures cross-correlation
    BETWEEN two series; this is the single-series twin).

    Scale: the corpus collapses to the bounded daily grid in one
    aggregation; lag products are an equi-join of the grid with itself
    on t+lag (grid x lags rows).  Per-lag r_k is rounded to 6dp in both
    engines before entering Q so the two recursions share one float
    grid."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    # localCheckpoint (r06): idx feeds the stats row AND both sides of
    # the lag self-join — one |days|-row materialization instead of
    # three embedded events aggregations + index windows.
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "y"
    ).localCheckpoint(eager=True)
    st = idx.agg(F.count("*").alias("n"), F.avg("y").alias("mu"))
    cen = idx.crossJoin(F.broadcast(st)).select(
        "t", "n", (F.col("y") - F.col("mu")).alias("c")
    )
    den = cen.agg(
        F.max("n").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("den"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    l, r = cen.alias("l"), cen.alias("r")
    num = (
        l.crossJoin(F.broadcast(lags))
        .join(r, F.col("r.t") == F.col("l.t") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("l.c") * F.col("r.c")).alias("num"))
    )
    acf = num.crossJoin(F.broadcast(den)).select(
        "lag", "n", r6(F.col("num") / F.col("den")).alias("acf")
    )
    qw = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return (
        acf.select(
            "lag",
            "acf",
            r6(
                F.col("n")
                * (F.col("n") + 2)
                * F.sum(
                    F.col("acf") * F.col("acf") / (F.col("n") - F.col("lag"))
                ).over(qw)
            ).alias("ljung_box_q"),
        )
        .orderBy("lag")
    )


ORACLES = {
    "x257_spearman_quality": """
        WITH vals AS (
            SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS a,
                   n_chars AS b
            FROM documents
        ), ranked AS (
            SELECT a, b,
                   RANK() OVER (ORDER BY a)
                     + (COUNT(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
                   RANK() OVER (ORDER BY b)
                     + (COUNT(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb
            FROM vals
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(corr(ra, rb), 6) AS spearman_rho,
               ROUND(corr(a, b), 6) AS pearson_r
        FROM ranked
    """,
    "x258_kendall_sources": """
        WITH cell AS (
            SELECT source, lang, COUNT(*) AS cnt,
                   SUM(len(string_split(trim(text), ' '))) AS toks
            FROM documents GROUP BY 1, 2
        ), s AS (
            SELECT source, CAST(SUM(toks) AS BIGINT) AS x,
                   ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS y
            FROM cell GROUP BY source
        ), pr AS (
            SELECT a.x - b.x AS dx, a.y - b.y AS dy
            FROM s a JOIN s b ON a.source < b.source
        ), ag AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS d,
                   CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2
            FROM pr
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sources,
               n0 AS n_pairs, c AS concordant, d AS discordant,
               ROUND(CASE WHEN n0 > n1 AND n0 > n2
                          THEN (c - d)
                               / sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))
                     END, 6) AS tau_b
        FROM ag
    """,
    "x259_adamic_adar": f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), edges AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        ), und AS (
            SELECT src, dst FROM edges
            UNION ALL
            SELECT dst, src FROM edges
        ), deg AS (
            SELECT src AS z, COUNT(*) AS deg FROM und GROUP BY 1
        ), ctr AS (
            SELECT u.src AS z, u.dst AS nbr, 1.0 / ln(d.deg) AS w
            FROM und u JOIN deg d ON u.src = d.z
            WHERE d.deg <= {AA_MAX_DEG}
        ), wedges AS (
            SELECT l.nbr AS a, r.nbr AS b, l.w
            FROM ctr l JOIN ctr r ON l.z = r.z AND l.nbr < r.nbr
        ), cand AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                   ROUND(SUM(w), 6) AS score
            FROM wedges GROUP BY a, b
        ), pred AS (
            SELECT * FROM cand c
            WHERE NOT EXISTS (
                SELECT 1 FROM edges e WHERE e.src = c.a AND e.dst = c.b
            )
        ), ranked AS (
            SELECT a, b, common_neighbors, score,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, a, b)
                        AS INT) AS rk
            FROM pred
        )
        SELECT * FROM ranked WHERE rk <= {AA_TOPK}
    """,
    "x260_t_closeness": f"""
        WITH cell AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / {TCLOSE_BAND}) AS BIGINT) AS band,
                   COUNT(*) AS cnt
            FROM customer GROUP BY 1, 2, 3
        ), classes AS (
            SELECT c_nationkey, c_mktsegment, SUM(cnt) AS k
            FROM cell GROUP BY 1, 2
        ), gdist AS (
            SELECT band, SUM(cnt) AS g FROM cell GROUP BY 1
        ), tot AS (
            SELECT SUM(cnt) AS n, COUNT(DISTINCT band) AS m FROM cell
        ), grid AS (
            SELECT cl.c_nationkey, cl.c_mktsegment, cl.k, gb.band, gb.g,
                   COALESCE(ce.cnt, 0) AS cnt, tot.n, tot.m
            FROM classes cl CROSS JOIN gdist gb CROSS JOIN tot
            LEFT JOIN cell ce
              ON ce.c_nationkey = cl.c_nationkey
             AND ce.c_mktsegment = cl.c_mktsegment
             AND ce.band = gb.band
        ), stepped AS (
            SELECT c_nationkey, c_mktsegment, k, m,
                   ABS(SUM(CAST(cnt AS DOUBLE) / k - CAST(g AS DOUBLE) / n)
                       OVER (PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY band
                             ROWS UNBOUNDED PRECEDING)) AS astep
            FROM grid
        )
        SELECT c_nationkey, c_mktsegment, CAST(MAX(k) AS BIGINT) AS k,
               ROUND(SUM(astep) / (MAX(m) - 1), 6) AS emd,
               ROUND(SUM(astep) / (MAX(m) - 1), 6) <= {TCLOSE_T}
                   AS t_close_ok
        FROM stepped
        GROUP BY c_nationkey, c_mktsegment
        ORDER BY c_nationkey, c_mktsegment
    """,
    "x261_acf_ljung_box": f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS y
            FROM events GROUP BY 1
        ), idx AS (
            SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, y FROM daily
        ), st AS (
            SELECT COUNT(*) AS n, AVG(y) AS mu FROM idx
        ), cen AS (
            SELECT t, n, y - mu AS c FROM idx CROSS JOIN st
        ), den AS (
            SELECT MAX(n) AS n, SUM(c * c) AS den FROM cen
        ), acf AS (
            SELECT g.lag AS lag, den.n,
                   ROUND(SUM(l.c * r.c) / MAX(den.den), 6) AS acf
            FROM generate_series(1, {ACF_MAX_LAG}) AS g(lag)
            JOIN cen l ON TRUE
            JOIN cen r ON r.t = l.t + g.lag
            CROSS JOIN den
            GROUP BY g.lag, den.n
        )
        SELECT CAST(lag AS INT) AS lag, acf,
               ROUND(n * (n + 2)
                     * SUM(acf * acf / (n - lag))
                       OVER (ORDER BY lag ROWS UNBOUNDED PRECEDING),
                     6) AS ljung_box_q
        FROM acf
        ORDER BY lag
    """,
}

QUERIES = {
    "x257_spearman_quality": x257_spearman_quality,
    "x258_kendall_sources": x258_kendall_sources,
    "x259_adamic_adar": x259_adamic_adar,
    "x260_t_closeness": x260_t_closeness,
    "x261_acf_ljung_box": x261_acf_ljung_box,
}
