"""x13 series — round-3 continuation: product-quantization ANN (x220+).

Product quantization (Jégou, Douze, Schmid — "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011) is the third ANN tier after
sign-LSH (x8) and IVF (x24): vectors are stored as m small codes (here
16 codes over 4-dim subspaces → 16× smaller than float32 at 1 byte per
code), candidate search runs against per-probe asymmetric-distance
lookup tables instead of raw vectors, and the final top-k is re-ranked
with exact distances over the ADC shortlist only.  At 100 TB of
embeddings this is the variant whose INDEX fits where the vectors do
not.

Like the IVF query, everything is made deterministic (seeded codebooks,
one Lloyd step, 6dp-rounded means and partial distances) so the whole
pipeline — fit, encode, ADC search, exact re-rank — is oracle-checkable
end to end; recall vs the exact scorer is tolerance-tested in
tests/test_approx.py (measured 0.92/0.84/0.84 at sf0.001/0.01/0.1).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from social_warner_spark.queries.common import T, r6

#: PQ geometry: 64-dim embeddings → 16 subspaces × 4 dims, 16 codewords
#: each; ADC keeps a 50-candidate shortlist that is re-ranked exactly.
PQ_M = 16
PQ_K = 16
PQ_SUBLEN = 4
PQ_ITERS = 1
PQ_RERANK = 50
PQ_TOPK = 5
PQ_DIM = 64


def x220_pq_ann(spark, sf_dir):
    """PQ/ADC approximate top-5 neighbors for probes vec_id < 10
    (operators/similarity.py: pq_codebooks / pq_encode / l2_topk_pq).

    100 TB: the codebook fit is `iters + 1` corpus passes with one tiny
    (m·k·sublen-row) shuffle each; encode is one map-side-combined
    shuffle; each probe's distance table is a broadcast m·k-slot map, so
    ADC-scoring the encoded corpus is a NARROW map (m lookups per pair)
    with no shuffle until the per-probe shortlist; the exact re-rank
    touches true vectors for only rerank/|corpus| of the candidates."""
    from social_warner_spark.operators.similarity import l2_topk_pq

    emb = T(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10)
    return l2_topk_pq(
        emb,
        probes,
        k=PQ_TOPK,
        m=PQ_M,
        ncode=PQ_K,
        sublen=PQ_SUBLEN,
        iters=PQ_ITERS,
        rerank=PQ_RERANK,
    )


_L2 = (
    "ROUND(list_sum(list_transform(range(1, {n} + 1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 6)"
)


def _pq_oracle() -> str:
    l2_seed = _L2.format(n=PQ_SUBLEN, a="c.sv", b="s.cw")
    l2_book = _L2.format(n=PQ_SUBLEN, a="c.sv", b="b.cw")
    l2_full = _L2.format(n=PQ_DIM, a="p.ev", b="c.ev")
    return f"""
        WITH subsp AS (
            SELECT CAST(s AS INT) AS sub, CAST(s * {PQ_SUBLEN} + 1 AS INT) AS lo
            FROM range(0, {PQ_M}) t(s)
        ), corp AS (
            SELECT e.vec_id, sp.sub,
                   (e.embedding[sp.lo : sp.lo + {PQ_SUBLEN} - 1])::DOUBLE[] AS sv
            FROM embeddings e CROSS JOIN subsp sp
        ), seeds AS (
            SELECT sub,
                   CAST(ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) - 1
                        AS INT) AS code,
                   sv AS cw
            FROM corp
            WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id
                             LIMIT {PQ_K})
        ), assign0 AS (
            SELECT vec_id, sub, code, sv FROM (
                SELECT c.vec_id, c.sub, s.code, c.sv,
                       ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.sub
                                          ORDER BY {l2_seed}, s.code) AS rk
                FROM corp c JOIN seeds s ON c.sub = s.sub
            ) WHERE rk = 1
        ), means AS (
            SELECT sub, code, i AS pos, ROUND(AVG(sv[i]), 6) AS mv
            FROM assign0, UNNEST(range(1, {PQ_SUBLEN} + 1)) u(i)
            GROUP BY sub, code, i
        ), book AS MATERIALIZED (
            SELECT sub, code, list(mv ORDER BY pos) AS cw
            FROM means GROUP BY sub, code
        ), enc AS (
            SELECT vec_id, sub, code FROM (
                SELECT c.vec_id, c.sub, b.code,
                       ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.sub
                                          ORDER BY {l2_book}, b.code) AS rk
                FROM corp c JOIN book b ON c.sub = b.sub
            ) WHERE rk = 1
        ), lut AS (
            SELECT c.vec_id AS probe_id, c.sub, b.code, {l2_book} AS pd
            FROM corp c JOIN book b ON c.sub = b.sub
            WHERE c.vec_id < 10
        ), adc AS (
            SELECT l.probe_id, e.vec_id AS neighbor_id, ROUND(SUM(l.pd), 6) AS adist
            FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
            WHERE l.probe_id != e.vec_id
            GROUP BY l.probe_id, e.vec_id
        ), shortlist AS (
            SELECT probe_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                             ORDER BY adist, neighbor_id) AS srk
                FROM adc
            ) WHERE srk <= {PQ_RERANK}
        ), ev AS (
            SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
        ), exact AS (
            SELECT s.probe_id, s.neighbor_id, {l2_full} AS edist
            FROM shortlist s
            JOIN ev c ON c.vec_id = s.neighbor_id
            JOIN ev p ON p.vec_id = s.probe_id
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                                              ORDER BY edist, neighbor_id)
                           AS INT) AS rk
            FROM exact
        )
        SELECT probe_id, neighbor_id, edist, rk FROM ranked WHERE rk <= {PQ_TOPK}
    """


#: k-center geometry: Gonzalez farthest-point selection of 8 coreset
#: representatives over the 64-dim embeddings under squared L2.
KC_K = 8


def x221_kcenter_coreset(spark, sf_dir):
    """Gonzalez farthest-point k-center coreset (k=8) over the embedding
    corpus — the classic 2-approximation for diversity-maximizing subset
    selection (Gonzalez, "Clustering to minimize the maximum intercluster
    distance", TCS 1985), the geometric dual of dedup: pick the examples
    that are LEAST like anything already kept.

    Seed = lowest vec_id; each round the next center is the point whose
    distance to the chosen set is largest (6dp-rounded squared L2, vec_id
    tie-break), and d_sel records that covering radius — a non-increasing
    curve that doubles as a "how much diversity is left" diagnostic.

    100 TB: per round ONE narrow corpus map (least(mind, d(v, new))) plus
    a top-1 TakeOrdered reduction; the chosen center travels back as a
    broadcast 1-row relation, and the running min-distance state is
    eagerly localCheckpoint-ed so k rounds never re-derive lineage — the
    x185/x203 iterative shuffle budget.  No pairwise join ever forms.
    """
    from social_warner_spark.operators.similarity import _l2sq

    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seed = emb.orderBy("vec_id").limit(1).localCheckpoint(eager=True)
    state = emb.crossJoin(F.broadcast(seed.select(F.col("v").alias("cv")))).select(
        "vec_id", "v", F.round(_l2sq(F.col("v"), F.col("cv")), 6).alias("mind")
    )
    picks = [
        seed.select(
            F.lit(0).alias("sel_order"), "vec_id", F.lit(0.0).alias("d_sel")
        )
    ]
    for r in range(1, KC_K):
        state = state.localCheckpoint(eager=True)
        nxt = (
            state.orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picks.append(
            nxt.select(
                F.lit(r).alias("sel_order"), "vec_id", F.col("mind").alias("d_sel")
            )
        )
        state = state.crossJoin(
            F.broadcast(nxt.select(F.col("v").alias("cv")))
        ).select(
            "vec_id",
            "v",
            F.least(
                F.col("mind"), F.round(_l2sq(F.col("v"), F.col("cv")), 6)
            ).alias("mind"),
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out


def _kcenter_oracle() -> str:
    def l2(a: str, b: str) -> str:
        return _L2.format(n=PQ_DIM, a=a, b=b)

    parts = [
        "WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT 1)",
        (
            "s0 AS MATERIALIZED (SELECT e.vec_id, e.v, "
            f"{l2('e.v', 'c.v')} AS mind FROM ev e CROSS JOIN c0 c)"
        ),
    ]
    for r in range(1, KC_K):
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT vec_id, v, mind FROM s{r - 1} "
            "ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if r < KC_K - 1:
            parts.append(
                f"s{r} AS MATERIALIZED (SELECT s.vec_id, s.v, "
                f"LEAST(s.mind, {l2('s.v', 'p.v')}) AS mind "
                f"FROM s{r - 1} s CROSS JOIN p{r} p)"
            )
    selects = [
        "SELECT 0 AS sel_order, vec_id, CAST(0.0 AS DOUBLE) AS d_sel FROM c0"
    ]
    for r in range(1, KC_K):
        selects.append(
            f"SELECT {r} AS sel_order, vec_id, mind AS d_sel FROM p{r}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def x222_label_noise_screen(spark, sf_dir):
    """Confident-learning label-noise screen (Northcutt, Jiang, Chuang —
    "Confident Learning: Estimating Uncertainty in Dataset Labels", JAIR
    2021, arXiv:1911.00068) over the documents table: the given `lang`
    column plays the noisy label, x3's marker-ratio scores play the
    per-class predicted probabilities.

    Per class j the confident threshold t_j is the mean self-confidence
    of docs GIVEN label j; a doc is counted into the off-diagonal of the
    confident joint when its argmax-over-threshold class differs from its
    given label.  Output: per (given_lang, flagged_as) suspect count,
    mean flagging confidence, and the lowest flagged doc_id as an
    auditable example.

    100 TB: scores are a zero-shuffle narrow map; the long form explodes
    to a bounded |langs|× stream; thresholds are a |langs|-row broadcast;
    the per-doc argmax is a map-side-combined min_by aggregate.
    """
    from social_warner_spark.functions.text import LANG_MARKERS, tokens

    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = tokens(F.col("text"))
    n = F.greatest(F.size(t), F.lit(1))
    langs = sorted(LANG_MARKERS)
    scored = d.select(
        "doc_id",
        F.col("lang").alias("given_lang"),
        *[
            # F.filter evaluates the lambda eagerly per iteration, so the
            # loop variable is bound correctly (same pattern as x3).
            r6(
                F.size(F.filter(t, lambda x: x.isin(*LANG_MARKERS[lg]))) / n
            ).alias(f"s_{lg}")
            for lg in langs
        ],
    )
    long = scored.select(
        "doc_id",
        "given_lang",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(lg).alias("j"), F.col(f"s_{lg}").alias("s"))
                    for lg in langs
                ]
            )
        ).alias("e"),
    ).select("doc_id", "given_lang", F.col("e.j").alias("j"), F.col("e.s").alias("s"))
    thr = (
        long.where(F.col("j") == F.col("given_lang"))
        .groupBy("j")
        .agg(r6(F.avg("s")).alias("t"))
    )
    # s > 0 mirrors CL's requirement of positive predicted probability:
    # a class whose markers never fire for its own docs has t_j = 0, and
    # without the guard every zero-score class would be "confident".
    pick = (
        long.join(F.broadcast(thr), "j")
        .where((F.col("s") >= F.col("t")) & (F.col("s") > 0))
        .groupBy("doc_id", "given_lang")
        .agg(
            F.min_by(
                F.struct(F.col("j").alias("j"), F.col("s").alias("s")),
                F.struct((-F.col("s")).alias("o1"), F.col("j").alias("o2")),
            ).alias("b")
        )
        .select(
            "doc_id",
            "given_lang",
            F.col("b.j").alias("flagged_as"),
            F.col("b.s").alias("s"),
        )
    )
    return (
        pick.where(F.col("flagged_as") != F.col("given_lang"))
        .groupBy("given_lang", "flagged_as")
        .agg(
            F.count("*").alias("n_docs"),
            r6(F.avg("s")).alias("mean_conf"),
            F.min("doc_id").alias("example_doc_id"),
        )
    )


def _label_noise_oracle() -> str:
    from social_warner_spark.queries.x_series import _LANGS, _lang_score_sql

    score_cols = ",\n                   ".join(
        f"ROUND({_lang_score_sql(lg)}, 6) AS s_{lg}" for lg in _LANGS
    )
    long_sql = "\n            UNION ALL\n".join(
        f"            SELECT doc_id, given_lang, '{lg}' AS j, s_{lg} AS s FROM sc"
        for lg in _LANGS
    )
    return f"""
        WITH sc AS MATERIALIZED (
            SELECT doc_id, lang AS given_lang,
                   {score_cols}
            FROM documents
        ), long AS MATERIALIZED (
{long_sql}
        ), thr AS (
            SELECT j, ROUND(AVG(s), 6) AS t FROM long
            WHERE j = given_lang GROUP BY j
        ), conf AS (
            SELECT l.doc_id, l.given_lang, l.j, l.s,
                   ROW_NUMBER() OVER (PARTITION BY l.doc_id
                                      ORDER BY l.s DESC, l.j) AS rk
            FROM long l JOIN thr t ON l.j = t.j
            WHERE l.s >= t.t AND l.s > 0
        )
        SELECT given_lang, j AS flagged_as, COUNT(*) AS n_docs,
               ROUND(AVG(s), 6) AS mean_conf, MIN(doc_id) AS example_doc_id
        FROM conf WHERE rk = 1 AND j != given_lang
        GROUP BY given_lang, j
    """


def x223_quantile_normalize(spark, sf_dir):
    """Cross-source quantile normalization of the x4 quality score: each
    doc's within-source rank position is mapped onto the GLOBAL score
    distribution by linear interpolation between the two nearest global
    order statistics — the microarray quantile-normalization recipe
    (Bolstad et al., Bioinformatics 2003) generalized to unequal group
    sizes, so heterogeneous sources become comparable before mixing.

    Rank position p = (rn−1)/(n_s−1) uses row_number over (q, doc_id) —
    a total order, so ties are deterministic; interpolation position
    p·(N−1)+1 hits exact integers at the endpoints.

    100 TB: the global order statistics come from operators/transforms.py
    global_index (range-partitioned ranks + broadcast offsets — NO
    single-partition window); the lookup is two integer equi-joins
    against that relation.  At real scale the exact ECDF would be
    replaced by a bounded quantile grid (e.g. 10k knots) broadcast to
    the mappers; the exact form here is what makes the query
    hash-checkable end to end.
    """
    from pyspark.sql import Window

    from social_warner_spark.functions.text import quality_score
    from social_warner_spark.operators.transforms import global_index

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    g = global_index(d, [F.col("q"), F.col("doc_id")], out_col="gidx")
    nrow = g.agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy("q", "doc_id")
    ranked = (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("ns", F.count("*").over(Window.partitionBy("source")))
        .crossJoin(F.broadcast(nrow))
    )
    p = (
        F.when(
            F.col("ns") > 1,
            (F.col("rn") - 1).cast("double") / (F.col("ns") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    pos = p * (F.col("n") - 1).cast("double") + F.lit(1.0)
    staged = ranked.select(
        "doc_id",
        "source",
        "q",
        F.floor(pos).cast("long").alias("lo"),
        F.ceil(pos).cast("long").alias("hi"),
        (pos - F.floor(pos)).alias("frac"),
    )
    glo = g.select(F.col("gidx").alias("lo"), F.col("q").alias("q_lo"))
    ghi = g.select(F.col("gidx").alias("hi"), F.col("q").alias("q_hi"))
    return (
        staged.join(glo, "lo")
        .join(ghi, "hi")
        .select(
            "doc_id",
            "source",
            F.col("q").alias("quality"),
            r6(
                F.col("q_lo") + F.col("frac") * (F.col("q_hi") - F.col("q_lo"))
            ).alias("quality_norm"),
        )
    )


def _quantile_normalize_oracle() -> str:
    from social_warner_spark.queries.x5_series import _QUALITY_SQL

    return f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, source, ROUND({_QUALITY_SQL}, 6) AS q FROM documents
        ), g AS MATERIALIZED (
            SELECT q, ROW_NUMBER() OVER (ORDER BY q, doc_id) AS gidx FROM d
        ), n AS (SELECT COUNT(*) AS n FROM d),
        s AS (
            SELECT r.doc_id, r.source, r.q,
                   (CASE WHEN r.ns > 1
                         THEN CAST(r.rn - 1 AS DOUBLE) / CAST(r.ns - 1 AS DOUBLE)
                         ELSE CAST(0.0 AS DOUBLE) END)
                     * CAST(n.n - 1 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS pos
            FROM (
                SELECT doc_id, source, q,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY q, doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY source) AS ns
                FROM d
            ) r CROSS JOIN n
        )
        SELECT s.doc_id, s.source, s.q AS quality,
               ROUND(glo.q + (s.pos - FLOOR(s.pos)) * (ghi.q - glo.q), 6)
                 AS quality_norm
        FROM s
        JOIN g glo ON glo.gidx = CAST(FLOOR(s.pos) AS BIGINT)
        JOIN g ghi ON ghi.gidx = CAST(CEIL(s.pos) AS BIGINT)
    """


QUERIES = {
    "x220_pq_ann": x220_pq_ann,
    "x221_kcenter_coreset": x221_kcenter_coreset,
    "x222_label_noise_screen": x222_label_noise_screen,
    "x223_quantile_normalize": x223_quantile_normalize,
}

ORACLES = {
    "x220_pq_ann": _pq_oracle(),
    "x221_kcenter_coreset": _kcenter_oracle(),
    "x222_label_noise_screen": _label_noise_oracle(),
    "x223_quantile_normalize": _quantile_normalize_oracle(),
}
