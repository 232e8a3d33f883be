"""x36 series — round-3 widening batch (x362–x366): dedup yield
accounting, RAG chunking planning, temperature-scaling calibration,
behavioral unicity (re-identification risk), and winnowing density
auditing.

Like every other series, each query is a pure DataFrame program over
the driver's parquet tables with an independently-written DuckDB
oracle.  x362 and x366 audit this repo's own dedup machinery end to
end; x365 extends the privacy family (x186/x240/x260/x357) with the
unicity measure; x363 extends the planner family.

Literature grounding (public):
- Lee et al., "Deduplicating training data makes language models
  better" (ACL 2022) — stage-wise dedup yield accounting.
- RAG chunking size/stride trade-offs (standard retrieval-augmented
  generation practice writeups).
- Guo et al., "On calibration of modern neural networks" (ICML 2017)
  — temperature scaling.
- de Montjoye et al., "Unique in the crowd" (Sci. Rep. 2013) —
  behavioral unicity.
- Schleimer, Wilkerson & Aiken (SIGMOD 2003) — winnowing density
  2/(w+1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import T, r6
from social_warner_spark.queries.x16_series import WIN_W

#: x362 — near-dup threshold for the cluster stage (x27's).
DW_THRESHOLD = 0.5
#: x363 — chunk sizes (tokens) at 50% stride.
CK_SIZES = (64, 128, 256)
#: x364 — temperature grid and the reliability-bin count.
TS_GRID = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)
TS_BINS = 10
TS_LANG = "en"
#: x365 — n-gram granularities of the behavioral fingerprint.
BU_NS = (1, 2, 3)
#: x365 — per-user state cap: each user's fingerprint stream is the
#: FIRST BU_CAP events by (ts, event_id).  Part of the query contract
#: (mirrored in the oracle), not an approximation knob: it bounds the
#: collect_list buffer so a bot-grade power user on a 100 TB corpus
#: cannot inflate one grouped row to hundreds of MB (r9 verdict item 2).
#: 512 events is far above the human traces the measure is about (the
#: driver testdata maxes at 99 events/user at sf0.1, so results are
#: unchanged at every test scale).
BU_CAP = 512


def x362_dedup_waterfall(spark, sf_dir):
    """Dedup yield waterfall: corpus tokens surviving after (1) exact
    dedup (min-id per lower-trimmed text) and (2) near-dup clustering
    at the x27 threshold (min-id canonical per cluster) — each stage
    reports documents and tokens removed and the running survivor
    share, the Lee-et-al-style accounting that turns "we deduped" into
    a number.

    Scale: the stages are the repo's own dedup plans; the accounting
    is one token-count aggregation joined against each survivor set."""
    from social_warner_spark.operators.dedup import neardup_clusters
    from social_warner_spark.functions.text import tokens
    from social_warner_spark.caching import register_persisted

    d = T(spark, sf_dir, "documents")
    toks = register_persisted(
        d.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("nt")
        ).persist()
    )
    tot = toks.agg(
        F.count("*").alias("n0"), F.sum("nt").alias("t0")
    )
    exact_keep = (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_keep = register_persisted(exact_keep.persist())
    s1 = toks.join(exact_keep, "doc_id", "left_semi").agg(
        F.count("*").alias("n1"), F.sum("nt").alias("t1")
    )
    clusters = neardup_clusters(d, threshold=DW_THRESHOLD).select(
        "doc_id", "cluster_id"
    )
    near_keep = (
        clusters.join(exact_keep, "doc_id", "left_semi")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = toks.join(near_keep, "doc_id", "left_semi").agg(
        F.count("*").alias("n2"), F.sum("nt").alias("t2")
    )
    j = tot.crossJoin(F.broadcast(s1)).crossJoin(F.broadcast(s2))
    rows = j.select(
        F.lit(1).alias("stage"),
        F.lit("exact_dedup").alias("rule"),
        (F.col("n0") - F.col("n1")).alias("docs_removed"),
        (F.col("t0") - F.col("t1")).alias("tokens_removed"),
        F.col("n1").alias("docs_surviving"),
        r6(F.col("t1") / F.col("t0")).alias("token_survival"),
    ).unionAll(
        j.select(
            F.lit(2).alias("stage"),
            F.lit("neardup_canonical").alias("rule"),
            (F.col("n1") - F.col("n2")).alias("docs_removed"),
            (F.col("t1") - F.col("t2")).alias("tokens_removed"),
            F.col("n2").alias("docs_surviving"),
            r6(F.col("t2") / F.col("t0")).alias("token_survival"),
        )
    )
    return rows.orderBy("stage")


def x363_chunking_planner(spark, sf_dir):
    """RAG chunking planner: for chunk sizes of 64/128/256 tokens at
    50% stride, the chunk count, the token redundancy factor (tokens
    emitted / corpus tokens — overlap is paid twice), and the tail
    waste (share of final chunks under half-full) — the size/stride
    trade-off measured on the corpus the retriever will actually
    index (x41 chunks at one setting; this prices the alternatives).

    Scale: per-doc chunk counts are closed-form from token counts —
    the corpus is scanned once for lengths, never exploded."""
    from social_warner_spark.functions.text import tokens

    d = T(spark, sf_dir, "documents")
    lens = d.select(F.size(tokens(F.col("text"))).alias("nt"))
    from social_warner_spark.caching import register_persisted

    lens = register_persisted(lens.persist())
    outs = None
    for cs in CK_SIZES:
        stride = cs // 2
        # chunks = 1 + max(0, ceil((nt - cs) / stride)); emitted
        # tokens = min(nt, cs) + (chunks-1)*cs truncated by doc end —
        # closed form below counts actual emitted tokens per chunk.
        nchunks = F.when(
            F.col("nt") <= cs, F.lit(1)
        ).otherwise(
            1 + F.ceil((F.col("nt") - cs) / stride).cast("int")
        )
        # last chunk length = nt - stride*(nchunks-1)
        last_len = F.col("nt") - stride * (nchunks - 1)
        emitted = (nchunks - 1) * cs + last_len
        one = lens.agg(
            F.lit(cs).alias("chunk_size"),
            F.lit(stride).alias("stride"),
            F.sum(nchunks).alias("n_chunks"),
            F.sum("nt").alias("corpus_tokens"),
            F.sum(emitted).alias("emitted_tokens"),
            r6(F.sum(emitted) / F.sum("nt")).alias("redundancy"),
            r6(
                F.sum((last_len < cs / 2).cast("long"))
                / F.count("*")
            ).alias("tail_waste_share"),
        )
        outs = one if outs is None else outs.unionAll(one)
    return outs.orderBy("chunk_size")


def x364_temperature_scaling(spark, sf_dir):
    """Temperature-scaling calibration of the min-max n_chars score
    for lang='en': probabilities p_T = sigmoid(logit(p)/T) over a
    temperature grid; each T reports NLL and 10-bin ECE, and the
    NLL-argmin T is flagged — Guo et al.'s one-parameter fix, fit by
    grid search (no solver) on the same score x299 decomposes.

    Scale: the score map is narrow; each T is one aggregation; ECE
    uses the x299 binning."""
    d = T(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("s"),
        (F.col("lang") == TS_LANG).cast("double").alias("y"),
    )
    mm = d.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    eps = 1e-6
    p0 = (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    p0c = F.least(F.lit(1 - eps), F.greatest(F.lit(eps), p0))
    base = d.crossJoin(F.broadcast(mm)).select(
        F.log(p0c / (1 - p0c)).alias("z"), "y"
    )
    from social_warner_spark.caching import register_persisted

    base = register_persisted(base.persist())
    outs = None
    for tt in TS_GRID:
        p = 1.0 / (1.0 + F.exp(-F.col("z") / tt))
        b = F.least(
            F.lit(TS_BINS - 1), F.floor(p * TS_BINS).cast("int")
        )
        per = base.select(p.alias("p"), "y", b.alias("b"))
        binned = per.groupBy("b").agg(
            F.count("*").alias("nk"),
            F.avg("p").alias("pk"),
            F.avg("y").alias("yk"),
        )
        nll = per.agg(
            F.count("*").alias("n"),
            r6(
                -F.avg(
                    F.col("y") * F.log(F.col("p"))
                    + (1 - F.col("y")) * F.log(1 - F.col("p"))
                )
            ).alias("nll"),
        )
        ece = binned.crossJoin(F.broadcast(nll)).agg(
            F.max("n").alias("n"),
            F.max("nll").alias("nll"),
            r6(
                F.sum(
                    F.col("nk") * F.abs(F.col("pk") - F.col("yk"))
                )
                / F.max("n")
            ).alias("ece"),
        )
        one = ece.select(
            F.lit(tt).alias("temperature"), "nll", "ece"
        )
        outs = one if outs is None else outs.unionAll(one)
    w = Window.orderBy()
    best = outs.agg(F.min("nll").alias("best_nll"))
    return (
        outs.crossJoin(F.broadcast(best))
        .select(
            "temperature",
            "nll",
            "ece",
            (F.col("nll") == F.col("best_nll")).alias("is_best"),
        )
        .orderBy("temperature")
    )


def x365_behavioral_unicity(spark, sf_dir):
    """Behavioral unicity (de Montjoye): at event-type n-gram
    granularities 1/2/3, the share of users whose behavioral
    fingerprint (the md5 of their ordered distinct n-gram set) is
    UNIQUE in the population — how re-identifiable "anonymized"
    event traces actually are, rising with granularity — the privacy
    readout k-anonymity (x240) gives for static attributes, here for
    sequences.

    Scale: per-user n-gram sets via one ordered collect per
    granularity; uniqueness is a fingerprint histogram.  Per-user state
    is BOUNDED: a row_number pre-filter keeps only each user's first
    BU_CAP events (by ts, event_id — a total order), so the
    collect_list buffer and the fingerprint string are capped BEFORE
    the aggregate, not truncated after it (r10; contract mirrored in
    the oracle's rn <= BU_CAP filter)."""
    ev = T(spark, sf_dir, "events")
    wcap = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.row_number().over(wcap).alias("_rn"),
        )
        .where(F.col("_rn") <= BU_CAP)
    )
    seq = capped.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda e: F.substring(e["event_type"], 1, 1),
            ),
        ).alias("s")
    )
    from social_warner_spark.caching import register_persisted

    seq = register_persisted(seq.persist())
    outs = None
    for n in BU_NS:
        grams = F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length("s") - (n - 1)
                    ),
                    lambda i: F.col("s").substr(i, F.lit(n)),
                )
            )
        )
        fp = seq.where(F.length("s") >= n).select(
            F.md5(F.concat_ws("|", grams)).alias("fp")
        )
        hist = fp.groupBy("fp").agg(F.count("*").alias("c"))
        one = hist.agg(
            F.lit(n).alias("ngram"),
            F.sum("c").alias("n_users"),
            F.sum((F.col("c") == 1).cast("long")).alias("n_unique"),
            r6(
                F.sum((F.col("c") == 1).cast("long")) / F.sum("c")
            ).alias("unicity"),
        )
        outs = one if outs is None else outs.unionAll(one)
    return outs.orderBy("ngram")


def x366_winnowing_density(spark, sf_dir):
    """Winnowing density audit: the observed fingerprint density
    (selected fingerprints / gram positions) per document against the
    theoretical expectation 2/(w+1) for window w — the guarantee audit
    for x262's fingerprinting (a density far off theory means the
    hash stream is pathological).

    Scale: the fingerprint relation is x262's plan; densities are one
    per-doc aggregation plus a corpus summary."""
    from social_warner_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )
    from social_warner_spark.caching import register_persisted

    d = T(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= 2 + WIN_W
    )
    grams = tk.select(
        "doc_id",
        (F.size("t") - 2).alias("n_g"),
        F.posexplode(shingles_from_tokens(F.col("t"))).alias("pos", "g"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WIN_W - 1)
    )
    fps = (
        grams.select(
            "doc_id",
            "pos",
            "n_g",
            F.min(F.md5("g")).over(win).alias("fp"),
        )
        .where(F.col("pos") <= F.col("n_g") - WIN_W)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("nfp"),
            F.max("n_g").alias("n_g"),
        )
    )
    per = fps.select(
        "doc_id", (F.col("nfp") / F.col("n_g")).alias("density")
    )
    theory = 2.0 / (WIN_W + 1)
    return per.agg(
        F.count("*").alias("n_docs"),
        r6(F.avg("density")).alias("observed_density"),
        F.lit(round(theory, 6)).alias("theoretical_density"),
        r6(F.avg("density") / theory).alias("ratio"),
        r6(F.stddev_samp("density")).alias("density_sd"),
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

from social_warner_spark.queries.x14_series import (  # noqa: E402
    _X27_CLUSTERS_SQL,
)

_CK_ROWS = " UNION ALL ".join(
    f"""SELECT {cs} AS chunk_size, {cs // 2} AS stride,
               CAST(SUM(CASE WHEN nt <= {cs} THEN 1
                             ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                               / {cs // 2}) AS INT)
                        END) AS BIGINT) AS n_chunks,
               CAST(SUM(nt) AS BIGINT) AS corpus_tokens,
               CAST(SUM((CASE WHEN nt <= {cs} THEN 1
                              ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                                 / {cs // 2}) AS INT)
                         END - 1) * {cs}
                        + nt - {cs // 2}
                          * (CASE WHEN nt <= {cs} THEN 1
                                  ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                                     / {cs // 2}) AS INT)
                             END - 1)) AS BIGINT) AS emitted_tokens,
               ROUND(SUM((CASE WHEN nt <= {cs} THEN 1
                               ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                                  / {cs // 2}) AS INT)
                          END - 1) * {cs}
                         + nt - {cs // 2}
                           * (CASE WHEN nt <= {cs} THEN 1
                                   ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                                      / {cs // 2}) AS INT)
                              END - 1)) * 1.0 / SUM(nt), 6)
                   AS redundancy,
               ROUND(SUM(CASE WHEN nt - {cs // 2}
                              * (CASE WHEN nt <= {cs} THEN 1
                                      ELSE 1 + CAST(ceil((nt - {cs}) * 1.0
                                                         / {cs // 2})
                                               AS INT)
                                 END - 1) < {cs} / 2
                              THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                   AS tail_waste_share
        FROM lens"""
    for cs in CK_SIZES
)

_TS_ROWS = " UNION ALL ".join(
    f"""SELECT {tt} AS temperature,
               ROUND(-AVG(y * ln(1.0 / (1.0 + exp(-z / {tt})))
                          + (1 - y) * ln(1.0 - 1.0
                                         / (1.0 + exp(-z / {tt})))), 6)
                   AS nll,
               (SELECT ROUND(SUM(nk * ABS(pk - yk)) / SUM(nk), 6)
                FROM (SELECT COUNT(*) AS nk,
                             AVG(1.0 / (1.0 + exp(-z / {tt}))) AS pk,
                             AVG(y) AS yk
                      FROM base
                      GROUP BY LEAST({TS_BINS - 1},
                          CAST(floor(1.0 / (1.0 + exp(-z / {tt}))
                                     * {TS_BINS}) AS INT)))) AS ece
        FROM base"""
    for tt in TS_GRID
)

_BU_ROWS = " UNION ALL ".join(
    f"""SELECT {n} AS ngram,
               CAST(SUM(c) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                     / SUM(c), 6) AS unicity
        FROM (
            SELECT md5(list_aggregate(
                       list_sort(list_distinct(list_transform(
                           range(1, len(s) - {n} + 2),
                           i -> s[i:i+{n - 1}]))), 'string_agg', '|'))
                       AS fp,
                   COUNT(*) AS c
            FROM seq WHERE len(s) >= {n}
            GROUP BY 1
        )"""
    for n in BU_NS
)

ORACLES = {
    "x362_dedup_waterfall": f"""
        WITH RECURSIVE {_X27_CLUSTERS_SQL}, toks2 AS MATERIALIZED (
            SELECT doc_id,
                   CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                       AS nt
            FROM documents
        ), tot AS (
            SELECT COUNT(*) AS n0, SUM(nt) AS t0 FROM toks2
        ), exact_keep AS MATERIALIZED (
            SELECT MIN(doc_id) AS doc_id
            FROM documents GROUP BY md5(lower(trim(text)))
        ), s1 AS (
            SELECT COUNT(*) AS n1, SUM(nt) AS t1
            FROM toks2 WHERE doc_id IN (SELECT doc_id FROM exact_keep)
        ), near_keep AS (
            SELECT MIN(c.doc_id) AS doc_id
            FROM clusters c
            WHERE c.doc_id IN (SELECT doc_id FROM exact_keep)
            GROUP BY c.cluster_id
        ), s2 AS (
            SELECT COUNT(*) AS n2, SUM(nt) AS t2
            FROM toks2 WHERE doc_id IN (SELECT doc_id FROM near_keep)
        )
        SELECT 1 AS stage, 'exact_dedup' AS rule,
               CAST(n0 - n1 AS BIGINT) AS docs_removed,
               CAST(t0 - t1 AS BIGINT) AS tokens_removed,
               CAST(n1 AS BIGINT) AS docs_surviving,
               ROUND(t1 * 1.0 / t0, 6) AS token_survival
        FROM tot, s1
        UNION ALL
        SELECT 2, 'neardup_canonical',
               CAST(n1 - n2 AS BIGINT), CAST(t1 - t2 AS BIGINT),
               CAST(n2 AS BIGINT), ROUND(t2 * 1.0 / t0, 6)
        FROM tot, s1, s2
        ORDER BY stage
    """,
    "x363_chunking_planner": f"""
        WITH lens AS (
            SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                       AS nt
            FROM documents
        )
        SELECT * FROM ({_CK_ROWS})
        ORDER BY chunk_size
    """,
    "x364_temperature_scaling": f"""
        WITH mm AS (
            SELECT MIN(CAST(n_chars AS DOUBLE)) AS lo,
                   MAX(CAST(n_chars AS DOUBLE)) AS hi
            FROM documents
        ), base AS MATERIALIZED (
            SELECT ln(pc / (1 - pc)) AS z, y
            FROM (
                SELECT LEAST(1 - 1e-6, GREATEST(1e-6,
                           (CAST(n_chars AS DOUBLE) - lo)
                           / (hi - lo))) AS pc,
                       CASE WHEN lang = '{TS_LANG}'
                            THEN 1.0 ELSE 0.0 END AS y
                FROM documents CROSS JOIN mm
            )
        ), grid AS ({_TS_ROWS}), best AS (
            SELECT MIN(nll) AS best_nll FROM grid
        )
        SELECT temperature, nll, ece, nll = best.best_nll AS is_best
        FROM grid CROSS JOIN best
        ORDER BY temperature
    """,
    "x365_behavioral_unicity": f"""
        WITH capped AS (
            -- per-user state cap, mirroring the Spark side's row_number
            -- pre-filter (BU_CAP={BU_CAP}; (ts, event_id) is total)
            SELECT user_id, ts, event_id, event_type
            FROM (
                SELECT user_id, ts, event_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events
            ) WHERE rn <= {BU_CAP}
        ), seq AS MATERIALIZED (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM capped GROUP BY user_id
        )
        SELECT * FROM ({_BU_ROWS})
        ORDER BY ngram
    """,
    "x366_winnowing_density": f"""
        WITH tk AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t
            FROM documents
            WHERE len(string_split(trim(text), ' ')) >= {2 + WIN_W}
        ), grams AS (
            SELECT doc_id, len(t) - 2 AS n_g, i,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
            FROM tk, UNNEST(range(1, len(t) - 1)) AS u(i)
        ), winmin AS (
            SELECT doc_id, i, n_g,
                   MIN(md5(g)) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING
                   ) AS fp
            FROM grams
        ), fps AS (
            SELECT doc_id, COUNT(DISTINCT fp) AS nfp, MAX(n_g) AS n_g
            FROM winmin WHERE i <= n_g - {WIN_W} + 1
            GROUP BY doc_id
        ), per AS (
            SELECT doc_id, nfp * 1.0 / n_g AS density FROM fps
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(density), 6) AS observed_density,
               {round(2.0 / (WIN_W + 1), 6)!r} AS theoretical_density,
               ROUND(AVG(density) / {2.0 / (WIN_W + 1)!r}, 6) AS ratio,
               ROUND(stddev_samp(density), 6) AS density_sd
        FROM per
    """,
}

QUERIES = {
    "x362_dedup_waterfall": x362_dedup_waterfall,
    "x363_chunking_planner": x363_chunking_planner,
    "x364_temperature_scaling": x364_temperature_scaling,
    "x365_behavioral_unicity": x365_behavioral_unicity,
    "x366_winnowing_density": x366_winnowing_density,
}
