"""End-to-end training-corpus preparation — the composite LLM-data pipeline
(north-star: dedup + quality + text analysis as one coherent flow).

Stages (all deterministic, each individually oracle-checked elsewhere):
1. quality gate   — keep docs with quality_score ≥ min_quality (x4 formula)
2. exact dedup    — keep min-doc_id survivor per normalized content hash (l1)
3. near-dup prune — drop the HIGHER doc_id of every exact-Jaccard pair
                    ≥ jaccard_threshold among survivors (l2 pairs); the
                    lower id always survives, so the rule needs no
                    transitive closure to be deterministic
4. stats          — token count + quality per surviving doc

Scale shape: stage 1 is a pure map; stage 2 one shuffle; stage 3 reuses the
shingle machinery (shuffle ∝ candidate pairs); stage 4 a map.  Nothing
driver-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from social_warner_spark.functions.text import quality_score, token_count_ws
from social_warner_spark.operators.dedup import content_hash, exact_jaccard_pairs


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """documents(doc_id, text, lang, …) → deduplicated, quality-filtered
    corpus with per-doc stats: (doc_id, lang, n_tokens, quality)."""
    scored = docs.withColumn("quality", quality_score(F.col("text")))
    gated = scored.where(F.col("quality") >= min_quality)

    # exact dedup survivors (min doc_id per content hash)
    survivors = (
        gated.select(content_hash(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # kept feeds two consumers (the shingle pipeline and the final
    # anti-join output); persisting cuts the quality-score/regex lineage
    # from being recomputed per consumer.  Registered for host-controlled
    # release (caching.py) since the lineage is baked into the lazy result.
    from social_warner_spark.caching import register_persisted

    kept = register_persisted(gated.join(survivors, "doc_id", "left_semi").persist())

    # near-dup prune: drop the b side of every (a < b) pair
    dropped = (
        exact_jaccard_pairs(kept, jaccard_threshold)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    pruned = kept.join(dropped, "doc_id", "left_anti")

    return pruned.select(
        "doc_id",
        "lang",
        token_count_ws(F.col("text")).alias("n_tokens"),
        "quality",
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Per-group document cap (the RefinedWeb-style per-domain cap): keep
    at most ``cap`` rows per group, best-first by (order_col DESC, id ASC).
    ``order_col`` must be pre-rounded to the shared grid so rank ties are
    engine-independent.

    One shuffle on the group key; the rank ≤ cap filter is pushed into the
    sort as WindowGroupLimit, so each partition materializes only ``cap``
    rows per group instead of sorting and then discarding — the difference
    between a per-domain cap that works at 100 TB and one that top-sorts
    every domain's full contents.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(id_col))
    return df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= cap)
