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

from social_warner_spark.queries.common import T

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


QUERIES = {
    "x220_pq_ann": x220_pq_ann,
}

ORACLES = {
    "x220_pq_ann": _pq_oracle(),
}
