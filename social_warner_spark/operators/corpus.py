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
    decon_shingle_n: int | None = None,
):
    """documents(doc_id, text, lang, …) → deduplicated, quality-filtered
    corpus with per-doc stats: (doc_id, lang, n_tokens, quality).

    With ``decon_shingle_n`` (r11, the x31 flagship device), returns the
    pair ``(prepared, decon_shingles)`` where ``decon_shingles`` is the
    per-doc-distinct (doc_id, shingle) relation at that width over the
    EXACT-DEDUP SURVIVOR set — generated in the SAME tokenize+explode
    pass as the near-dup prune's 3-gram shingles (one shared persisted
    multi-width relation instead of two full text-splitting passes over
    the corpus).  The survivor set is a superset of ``prepared``'s docs;
    callers that anti-join ``prepared`` by doc_id against a predicate of
    ``decon_shingles`` get identical results (extra doc_ids are inert in
    the anti-join) without re-scanning and re-splitting the corpus."""
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

    decon_sh = None
    if decon_shingle_n is not None:
        from social_warner_spark.operators.dedup import doc_shingles

        # One narrow explode over the ALREADY-PERSISTED survivor set —
        # replaces the caller's corpus re-scan + survivor semi-join +
        # re-tokenize.  Deliberately NOT a combined (3, 4)-width shingle
        # relation shared with the prune below: that variant was built
        # and measured 0.5-0.7 s SLOWER at sf0.1 (OPTIMIZATION_r11.md,
        # x31 section) — persisting the 4-gram rows next to the
        # 3-gram ones doubles the cached relation that the prune's
        # self-join + sizes re-read, and at 100 TB materializing a
        # single-consumer n-gram relation costs more than streaming it
        # into its one broadcast join.
        decon_sh = doc_shingles(kept, n=decon_shingle_n)

    # near-dup prune: drop the b side of every (a < b) pair
    dropped = (
        exact_jaccard_pairs(kept, jaccard_threshold)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    pruned = kept.join(dropped, "doc_id", "left_anti")

    prepared = pruned.select(
        "doc_id",
        "lang",
        token_count_ws(F.col("text")).alias("n_tokens"),
        "quality",
    )
    if decon_shingle_n is None:
        return prepared
    return prepared, decon_sh


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


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_select: int = 50,
    buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by the mean
    log-importance-ratio of its tokens under hashed-unigram language
    models of the target domain vs the raw corpus, then keep the top
    ``n_select``.  Returns (id, n_tokens, logratio, rk).

    Hashing (md5 mod ``buckets``, the audit.py idiom) bounds BOTH feature
    tables at ``buckets`` rows regardless of vocabulary size — that is
    DSIR's trick, and it is exactly what makes the 100 TB plan work: the
    two smoothed distributions collapse to ≤``buckets``-row broadcasts,
    so the corpus token stream is joined map-side and shuffles only once,
    partially aggregated, for the per-doc mean.  Add-1 smoothing keeps
    unseen buckets finite; 6dp rounding keeps the ranking cross-engine
    stable.
    """
    from social_warner_spark.caching import register_persisted
    from social_warner_spark.functions.text import tokens

    def bucketed(df: DataFrame) -> DataFrame:
        # explode is a generator — it must sit at the select's top level;
        # the md5 bucketing is applied to the materialized token attribute
        tok = df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        return tok.select(
            id_col,
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast(
                    "long"
                )
                % buckets
            ).cast("int").alias("bk"),
        )

    raw_tok = register_persisted(bucketed(raw).persist())
    tgt_tok = bucketed(target)

    def smoothed(tok: DataFrame, p_name: str) -> DataFrame:
        cnt = tok.groupBy("bk").agg(F.count("*").alias("c"))
        tot = cnt.agg(F.sum("c").alias("total"))
        return (
            cnt.crossJoin(F.broadcast(tot))
            .select(
                "bk",
                ((F.col("c") + 1) / (F.col("total") + buckets)).alias(p_name),
            )
        )

    # unseen-bucket floor: each distribution falls back to 1/(total+B)
    p_tgt = smoothed(tgt_tok, "p_t")
    p_raw = smoothed(raw_tok, "p_r")
    scored = (
        raw_tok.join(F.broadcast(p_tgt), "bk", "left")
        .join(F.broadcast(p_raw), "bk", "left")
    )
    tgt_floor = tgt_tok.groupBy().agg(
        (F.lit(1.0) / (F.count("*") + buckets)).alias("floor_t")
    )
    per_doc = (
        scored.crossJoin(F.broadcast(tgt_floor))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(
                    F.log(F.coalesce(F.col("p_t"), F.col("floor_t")))
                    - F.log(F.col("p_r"))
                ),
                6,
            ).alias("logratio"),
        )
    )
    from pyspark.sql import Window

    top = per_doc.orderBy(F.desc("logratio"), id_col).limit(n_select)
    w = Window.orderBy(F.desc("logratio"), id_col)
    return top.select(
        id_col, "n_tokens", "logratio", F.row_number().over(w).cast("int").alias("rk")
    )
