"""x22 series — round-3 widening batch (x292–x296): readability
scoring, absorbing-chain expected steps, burstiness classification,
Weibull inter-arrival fitting, and power-law goodness-of-fit.

Like every other series, each query is a pure DataFrame program over
the driver's parquet tables with an independently-written DuckDB
oracle; the x293 value iteration reuses x270's journey/transition
definitions verbatim (the two queries audit the same chain) with the
same fixed-round 6dp pinning.

Literature grounding (public):
- Flesch (1948) / Kincaid et al. (1975) — readability formulas.
- Kemeny & Snell, "Finite Markov chains" (1960) — fundamental-matrix
  expected absorption steps.
- Fano (1947) — index of dispersion; burstiness classification per
  Goh & Barabási (EPL 2008).
- Weibull plotting via the linearized CCDF (standard reliability
  practice, e.g. Abernethy, "The New Weibull Handbook").
- Clauset, Shalizi & Newman (SIAM Rev. 2009) §3.3 — KS distance for
  power-law fits (continuous approximation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import tokens
from social_warner_spark.queries.common import T, r6
from social_warner_spark.queries.x16_series import PL_XMIN
from social_warner_spark.queries.x17_series import (
    MKV_CHANNELS,
    MKV_CONV,
    MKV_ROUNDS,
)
from social_warner_spark.queries.x20_series import KS_US

#: x294 — dispersion-class boundaries (variance/mean of daily counts).
FANO_HI = 1.5
FANO_LO = 0.67


def x292_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per source: words,
    sentence-terminator counts, and vowel-group syllable estimates
    (vowelless tokens count one syllable) — the classic curation
    feature family x4's length/punct quality score does not cover.

    Scale: one narrow map per document (regexp counts — no explode),
    one aggregation per source."""
    d = T(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    staged = d.select(
        "source",
        F.size(toks).cast("double").alias("w"),
        F.greatest(
            F.lit(1),
            F.length(F.regexp_replace(F.col("text"), "[^.!?]", "")),
        )
        .cast("double")
        .alias("s"),
        (
            F.size(
                F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
            )
            + F.size(
                F.filter(toks, lambda t: ~t.rlike("[aeiouyAEIOUY]"))
            )
        )
        .cast("double")
        .alias("syl"),
    )
    fre = (
        206.835
        - 1.015 * (F.col("w") / F.col("s"))
        - 84.6 * (F.col("syl") / F.col("w"))
    )
    fkg = (
        0.39 * (F.col("w") / F.col("s"))
        + 11.8 * (F.col("syl") / F.col("w"))
        - 15.59
    )
    return (
        staged.where(F.col("w") > 0)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            r6(F.avg(fre)).alias("avg_flesch"),
            r6(F.avg(fkg)).alias("avg_grade"),
            r6(F.avg(F.col("syl") / F.col("w"))).alias("syl_per_word"),
        )
        .orderBy("source")
    )


def x293_expected_steps(spark, sf_dir):
    """Expected transitions to absorption (CONV or NOCONV) from every
    chain state, on x270's exact journey transition matrix:
    t = 1 + M t iterated MKV_ROUNDS times with 6dp pinning — "how many
    touches does a journey starting at X still take", the
    time-to-absorb companion of x270's absorption probability.

    Scale: identical to x270 — two journey shuffles, then a broadcast
    1-row matrix and one bounded fold."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    from social_warner_spark.caching import register_persisted

    seq = register_persisted(seq.persist())
    prn = (
        seq.where(F.col("event_type") == MKV_CONV)
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    touches = (
        seq.join(prn, "user_id", "left")
        .where(
            (F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
            & (F.col("event_type") != MKV_CONV)
        )
        .select("user_id", "event_type", "rn")
    )
    touches = register_persisted(touches.persist())
    tw = Window.partitionBy("user_id").orderBy("rn")
    steps = touches.select(
        F.coalesce(F.lag("event_type").over(tw), F.lit("START")).alias(
            "src"
        ),
        F.col("event_type").alias("dst"),
    )
    last = touches.groupBy("user_id").agg(
        F.max_by("event_type", "rn").alias("lastt")
    )
    finals = (
        ev.select("user_id")
        .distinct()
        .join(last, "user_id", "left")
        .join(prn, "user_id", "left")
        .select(
            F.coalesce(F.col("lastt"), F.lit("START")).alias("src"),
            F.when(F.col("prn").isNotNull(), F.lit("CONV"))
            .otherwise(F.lit("NOCONV"))
            .alias("dst"),
        )
    )
    cnt = steps.union(finals).groupBy("src", "dst").agg(
        F.count("*").alias("c")
    )
    tot = cnt.groupBy("src").agg(F.sum("c").alias("ct"))
    prob = cnt.join(tot, "src").select(
        "src", "dst", F.round(F.col("c") / F.col("ct"), 6).alias("w")
    )
    states = list(MKV_CHANNELS) + ["START"]
    aggs = []
    for i, s in enumerate(states):
        for j, c in enumerate(MKV_CHANNELS):
            aggs.append(
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("src") == s) & (F.col("dst") == c),
                            F.col("w"),
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"m_{i}_{j}")
            )
    mat = prob.agg(*aggs).select(
        F.array(
            *[
                F.array(
                    *[
                        F.col(f"m_{i}_{j}")
                        for j in range(len(MKV_CHANNELS))
                    ]
                )
                for i in range(len(states))
            ]
        ).alias("M")
    )
    ns = len(states)
    nch = len(MKV_CHANNELS)
    t = F.aggregate(
        F.sequence(F.lit(1), F.lit(MKV_ROUNDS)),
        F.array_repeat(F.lit(0.0), ns),
        lambda acc, itr: F.transform(
            F.sequence(F.lit(0), F.lit(ns - 1)),
            lambda i: F.round(
                1.0
                + F.aggregate(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(nch - 1)),
                        lambda j: F.element_at(
                            F.element_at(F.col("M"), (i + 1).cast("int")),
                            (j + 1).cast("int"),
                        )
                        * F.element_at(acc, (j + 1).cast("int")),
                    ),
                    F.lit(0.0),
                    lambda s2, x: s2 + x,
                ),
                6,
            ),
        ),
    )
    solved = mat.select(t.alias("t"))
    names = F.array(*[F.lit(s) for s in states])
    return (
        solved.select(
            F.posexplode("t").alias("p", "expected_steps")
        )
        .select(
            F.element_at(names, F.col("p") + 1).alias("state"),
            F.col("expected_steps"),
        )
        .orderBy("state")
    )


def x294_fano_burstiness(spark, sf_dir):
    """Fano-factor (index of dispersion) burstiness classification:
    per user, variance/mean of DAILY event counts over the user's own
    active span (zero days included via the count algebra — the grid
    is never materialized); users classify as bursty (F > 1.5),
    poisson_like, or regular (F < 0.67), reported per class with the
    class-average Fano — the arrival-pattern screen x286 runs at the
    stream level, here per entity.

    Scale: one (user, day) aggregation, one user-level reduction;
    span statistics come from min/max days, never a calendar join."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    per = daily.groupBy("user_id").agg(
        (
            F.datediff(F.max("day"), F.min("day")) + 1
        ).cast("double").alias("span"),
        F.sum("c").cast("double").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("sq"),
    )
    fano = per.select(
        "user_id",
        "span",
        r6(
            (
                F.col("sq") / F.col("span")
                - (F.col("tot") / F.col("span"))
                * (F.col("tot") / F.col("span"))
            )
            / (F.col("tot") / F.col("span"))
        ).alias("fano"),
    )
    cls = F.when(F.col("fano") > FANO_HI, F.lit("bursty")).when(
        F.col("fano") < FANO_LO, F.lit("regular")
    ).otherwise(F.lit("poisson_like"))
    return (
        fano.groupBy(cls.alias("dispersion_class"))
        .agg(
            F.count("*").alias("n_users"),
            r6(F.avg("fano")).alias("avg_fano"),
            r6(F.avg("span")).alias("avg_span_days"),
        )
        .orderBy("dispersion_class")
    )


def x295_weibull_fit(spark, sf_dir):
    """Weibull shape/scale fit of the global event inter-arrival times
    via the linearized CCDF (Weibull plot): regress
    y = ln(-ln(1 - F(x))) on ln(x) over the distinct-value empirical
    CDF (final F = 1 step excluded); shape k < 1 reads as bursty,
    k = 1 recovers x286's exponential — with the plot R^2 saying how
    Weibull the stream actually is.

    Scale: same lag + distinct-value grid as x286; the regression is
    one aggregation over the grid with 6dp-pinned regressors."""
    ev = T(spark, sf_dir, "events")
    ia = (
        ev.select(
            F.expr(
                "timestampdiff(MICROSECOND, lag(ts) OVER "
                "(ORDER BY ts, event_id), ts)"
            ).alias("us")
        )
        .where(F.col("us").isNotNull() & (F.col("us") > 0))
        .select((F.col("us") / KS_US).alias("x"))
    )
    from social_warner_spark.caching import register_persisted

    ia = register_persisted(ia.persist())
    n = ia.agg(F.count("*").alias("n"))
    vals = ia.groupBy("x").agg(F.count("*").alias("c"))
    cw = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        vals.crossJoin(F.broadcast(n))
        .select(
            "x",
            (F.sum("c").over(cw) / F.col("n")).alias("fx"),
        )
        .where(F.col("fx") < 1.0)
        .select(
            F.round(F.log("x"), 6).alias("lx"),
            F.round(F.log(-F.log(1.0 - F.col("fx"))), 6).alias("ly"),
        )
    )
    reg = pts.agg(
        F.count("*").cast("double").alias("m"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    k = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    b = (F.col("sy") - k * F.col("sx")) / F.col("m")
    r2 = (
        F.pow(F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
        / (
            (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return reg.crossJoin(
        F.broadcast(n.select(F.col("n").alias("n_intervals")))
    ).select(
        "n_intervals",
        F.col("m").cast("long").alias("n_grid_points"),
        r6(k).alias("shape_k"),
        r6(F.exp(-b / k)).alias("scale_lambda"),
        r6(r2).alias("r2"),
    )


def x296_powerlaw_gof(spark, sf_dir):
    """Kolmogorov–Smirnov goodness-of-fit for x265's power-law degree
    MLE (Clauset §3.3, continuous approximation): D = max over tail
    degrees of |empirical CCDF - (d/(xmin - 1/2))^{-(alpha-1)}| — the
    number that says whether the co-purchase graph's alpha is a fit or
    a fantasy.

    Scale: degree counting as in x265; the CCDF walk runs on the
    |distinct degrees| grid."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    a, b2 = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b2,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    from social_warner_spark.caching import register_persisted

    edges = register_persisted(edges.persist())
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    tail = deg.where(F.col("deg") >= PL_XMIN).select("deg")
    tail = register_persisted(tail.persist())
    fit = tail.agg(
        F.count("*").alias("n_tail"),
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("deg") / (PL_XMIN - 0.5))),
            6,
        ).alias("alpha"),
    )
    cells = tail.groupBy("deg").agg(F.count("*").alias("c"))
    cw = (
        Window.orderBy("deg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    walk = cells.crossJoin(F.broadcast(fit)).select(
        "deg",
        "n_tail",
        "alpha",
        (
            (F.col("n_tail") - F.coalesce(F.sum("c").over(cw), F.lit(0)))
            / F.col("n_tail")
        ).alias("emp_ccdf"),
        F.pow(
            F.col("deg") / (PL_XMIN - 0.5), -(F.col("alpha") - 1.0)
        ).alias("fit_ccdf"),
    )
    return walk.agg(
        F.max("n_tail").alias("n_tail"),
        F.max("alpha").alias("alpha"),
        r6(F.max(F.abs(F.col("emp_ccdf") - F.col("fit_ccdf")))).alias(
            "ks_d"
        ),
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------


def _expected_steps_oracle() -> str:
    states = list(MKV_CHANNELS) + ["START"]
    nch = len(MKV_CHANNELS)
    ns = len(states)
    mcols = []
    for i, s in enumerate(states):
        for j, c in enumerate(MKV_CHANNELS):
            mcols.append(
                f"COALESCE(MAX(CASE WHEN src = '{s}' AND dst = '{c}'"
                f" THEN w END), 0.0) AS m_{i}_{j}"
            )
    t0 = ", ".join(f"CAST(0.0 AS DOUBLE) AS t{i}" for i in range(ns))
    step = ", ".join(
        "ROUND(1.0 + %s, 6)"
        % " + ".join(f"m_{i}_{j} * t{j}" for j in range(nch))
        for i in range(ns)
    )
    outs = " UNION ALL ".join(
        f"SELECT '{s}' AS state, t{i} AS expected_steps FROM fin"
        for i, s in enumerate(states)
    )
    return f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_type,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS INT)
                       AS rn
            FROM events
        ), prn AS (
            SELECT user_id, MIN(rn) AS prn FROM seq
            WHERE event_type = '{MKV_CONV}' GROUP BY 1
        ), touches AS (
            SELECT s.user_id, s.event_type, s.rn
            FROM seq s LEFT JOIN prn USING (user_id)
            WHERE (prn IS NULL OR s.rn < prn)
              AND s.event_type != '{MKV_CONV}'
        ), steps AS (
            SELECT COALESCE(LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY rn), 'START') AS src,
                   event_type AS dst
            FROM touches
        ), lastt AS (
            SELECT user_id, MAX_BY(event_type, rn) AS lt
            FROM touches GROUP BY 1
        ), finals AS (
            SELECT COALESCE(l.lt, 'START') AS src,
                   CASE WHEN p.prn IS NOT NULL THEN 'CONV'
                        ELSE 'NOCONV' END AS dst
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN lastt l USING (user_id)
            LEFT JOIN prn p USING (user_id)
        ), edges AS (
            SELECT src, dst FROM steps
            UNION ALL
            SELECT src, dst FROM finals
        ), prob AS (
            SELECT src, dst,
                   ROUND(CAST(COUNT(*) AS DOUBLE)
                         / SUM(COUNT(*)) OVER (PARTITION BY src), 6) AS w
            FROM edges GROUP BY src, dst
        ), mat AS (
            SELECT {", ".join(mcols)} FROM prob
        ), rec AS (
            SELECT 0 AS iter, {t0} FROM mat
            UNION ALL
            SELECT r.iter + 1, {step}
            FROM rec r CROSS JOIN mat
            WHERE r.iter < {MKV_ROUNDS}
        ), fin AS (
            SELECT * FROM rec WHERE iter = {MKV_ROUNDS}
        )
        SELECT * FROM ({outs}) ORDER BY state
    """


ORACLES = {
    "x292_readability": """
        WITH staged AS (
            SELECT source,
                   CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS w,
                   CAST(GREATEST(1, len(regexp_replace(
                       text, '[^.!?]', '', 'g'))) AS DOUBLE) AS s,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        + len(list_filter(
                              string_split(trim(text), ' '),
                              t -> NOT regexp_matches(
                                  t, '[aeiouyAEIOUY]')))
                        AS DOUBLE) AS syl
            FROM documents
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(206.835 - 1.015 * (w / s)
                         - 84.6 * (syl / w)), 6) AS avg_flesch,
               ROUND(AVG(0.39 * (w / s) + 11.8 * (syl / w) - 15.59), 6)
                   AS avg_grade,
               ROUND(AVG(syl / w), 6) AS syl_per_word
        FROM staged WHERE w > 0
        GROUP BY source ORDER BY source
    """,
    "x293_expected_steps": _expected_steps_oracle(),
    "x294_fano_burstiness": f"""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ), per AS (
            SELECT user_id,
                   CAST(date_diff('day', MIN(day), MAX(day)) + 1
                        AS DOUBLE) AS span,
                   CAST(SUM(c) AS DOUBLE) AS tot,
                   CAST(SUM(c * c) AS DOUBLE) AS sq
            FROM daily GROUP BY 1
        ), fano AS (
            SELECT user_id, span,
                   ROUND((sq / span - (tot / span) * (tot / span))
                         / (tot / span), 6) AS fano
            FROM per
        )
        SELECT CASE WHEN fano > {FANO_HI} THEN 'bursty'
                    WHEN fano < {FANO_LO} THEN 'regular'
                    ELSE 'poisson_like' END AS dispersion_class,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(AVG(fano), 6) AS avg_fano,
               ROUND(AVG(span), 6) AS avg_span_days
        FROM fano
        GROUP BY 1 ORDER BY 1
    """,
    "x295_weibull_fit": f"""
        WITH ia AS (
            SELECT datediff('microsecond',
                            lag(ts) OVER (ORDER BY ts, event_id), ts)
                       / {KS_US} AS x
            FROM events
        ), iaf AS (
            SELECT x FROM ia WHERE x IS NOT NULL AND x > 0
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM iaf
        ), vals AS (
            SELECT x, COUNT(*) AS c FROM iaf GROUP BY x
        ), pts AS (
            SELECT ROUND(ln(x), 6) AS lx,
                   ROUND(ln(-ln(1.0 - fx)), 6) AS ly
            FROM (
                SELECT v.x,
                       SUM(v.c) OVER (ORDER BY v.x
                           ROWS UNBOUNDED PRECEDING) * 1.0 / nn.n AS fx
                FROM vals v CROSS JOIN nn
            ) WHERE fx < 1.0
        ), reg AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                   SUM(lx) AS sx, SUM(ly) AS sy,
                   SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy,
                   SUM(ly * ly) AS syy
            FROM pts
        )
        SELECT nn.n AS n_intervals,
               CAST(m AS BIGINT) AS n_grid_points,
               ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
                   AS shape_k,
               ROUND(exp(-((sy - (m * sxy - sx * sy)
                            / (m * sxx - sx * sx) * sx) / m)
                         / ((m * sxy - sx * sy) / (m * sxx - sx * sx))),
                     6) AS scale_lambda,
               ROUND(pow(m * sxy - sx * sy, 2)
                     / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6)
                   AS r2
        FROM reg CROSS JOIN nn
    """,
    "x296_powerlaw_gof": f"""
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
            SELECT src, COUNT(*) AS deg FROM und GROUP BY 1
        ), tail AS (
            SELECT deg FROM deg WHERE deg >= {PL_XMIN}
        ), fit AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                   ROUND(1.0 + COUNT(*)
                         / SUM(ln(deg / ({PL_XMIN} - 0.5))), 6) AS alpha
            FROM tail
        ), cells AS (
            SELECT deg, COUNT(*) AS c FROM tail GROUP BY 1
        ), walk AS (
            SELECT cells.deg, fit.n_tail, fit.alpha,
                   (fit.n_tail - COALESCE(SUM(cells.c) OVER (
                        ORDER BY cells.deg
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0)) * 1.0
                       / fit.n_tail AS emp_ccdf,
                   pow(cells.deg / ({PL_XMIN} - 0.5),
                       -(fit.alpha - 1.0)) AS fit_ccdf
            FROM cells CROSS JOIN fit
        )
        SELECT MAX(n_tail) AS n_tail, MAX(alpha) AS alpha,
               ROUND(MAX(ABS(emp_ccdf - fit_ccdf)), 6) AS ks_d
        FROM walk
    """,
}

QUERIES = {
    "x292_readability": x292_readability,
    "x293_expected_steps": x293_expected_steps,
    "x294_fano_burstiness": x294_fano_burstiness,
    "x295_weibull_fit": x295_weibull_fit,
    "x296_powerlaw_gof": x296_powerlaw_gof,
}
