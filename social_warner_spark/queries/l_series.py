"""L-series — LLM-data extension queries, deterministic core (SURVEY.md §2.d).

Exact dedup, exact Jaccard near-dup, exact top-k cosine, text stats,
multimodal column stats — each the exact-correctness anchor for an
approximate scale-path variant (MinHash/LSH/bucketed ANN, x_series +
tolerance tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.vectors import l2_norm
from social_warner_spark.operators.dedup import exact_dedup, exact_jaccard_pairs
from social_warner_spark.operators.similarity import cosine_topk
from social_warner_spark.queries.common import T, r6

JACCARD_THRESHOLD = 0.8
N_PROBES = 10
TOP_K = 5


def l1_exact_dedup(spark, sf_dir):
    """Deterministic exact dedup survivors (min doc_id per content hash)."""
    return exact_dedup(T(spark, sf_dir, "documents")).select("content_hash", "doc_id")


def l2_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard pairs ≥ 0.8 (a < b)."""
    return exact_jaccard_pairs(T(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


def l3_topk_cosine(spark, sf_dir):
    """Exact top-5 cosine neighbors for probes vec_id < 10."""
    emb = T(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < N_PROBES)
    return cosine_topk(emb, probes, k=TOP_K)


def l4_text_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"), r6(F.avg("n_chars")).alias("avg_chars")
    )


def l4_top_tokens(spark, sf_dir):
    """Top-3 tokens per language (ties broken lexicographically)."""
    d = T(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("lang", "token", "cnt", "rk")
    )


def l5_multimodal_stats(spark, sf_dir):
    """Typed-array column stats: dimensionality, L2 norm, label distribution."""
    emb = T(spark, sf_dir, "embeddings")
    per_row = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        l2_norm(F.col("embedding")).alias("norm"),
    )
    return per_row.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        r6(F.avg("norm")).alias("avg_norm"),
    )


QUERIES = {
    "l1_exact_dedup": l1_exact_dedup,
    "l2_jaccard_pairs": l2_jaccard_pairs,
    "l3_topk_cosine": l3_topk_cosine,
    "l4_text_stats": l4_text_stats,
    "l4_top_tokens": l4_top_tokens,
    "l5_multimodal_stats": l5_multimodal_stats,
}

_SHINGLES_CTE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
    )
"""

ORACLES = {
    "l1_exact_dedup": """
        SELECT sha256(lower(trim(text))) AS content_hash, MIN(doc_id) AS doc_id
        FROM documents GROUP BY 1
    """,
    "l2_jaccard_pairs": _SHINGLES_CTE
    + f"""
        , sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
        , shared AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS shared
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_id_a, doc_id_b,
               ROUND(shared / (sa.sz + sb.sz - shared), 6) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
        WHERE ROUND(shared / (sa.sz + sb.sz - shared), 6) >= {JACCARD_THRESHOLD}
    """,
    "l3_topk_cosine": f"""
        WITH scored AS (
            SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                   ROUND(
                     list_dot_product(p.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(p.embedding::DOUBLE[], p.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                     6) AS cos
            FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
            WHERE p.vec_id < {N_PROBES}
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                                         ORDER BY cos DESC, neighbor_id) AS INT) AS rk
            FROM scored
        )
        SELECT probe_id, neighbor_id, cos, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    "l4_text_stats": """
        SELECT lang, COUNT(*) AS doc_cnt, ROUND(AVG(n_chars), 6) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "l4_top_tokens": """
        WITH counts AS (
            SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents
        ), agg AS (
            SELECT lang, token, COUNT(*) AS cnt FROM counts GROUP BY lang, token
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY cnt DESC, token) AS INT) AS rk
            FROM agg
        )
        SELECT lang, token, cnt, rk FROM ranked WHERE rk <= 3
    """,
    "l5_multimodal_stats": """
        WITH per_row AS (
            SELECT label, CAST(len(embedding) AS INT) AS dim,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
            FROM embeddings
        )
        SELECT label, COUNT(*) AS cnt, MIN(dim) AS min_dim, MAX(dim) AS max_dim,
               ROUND(AVG(norm), 6) AS avg_norm
        FROM per_row GROUP BY label
    """,
}
