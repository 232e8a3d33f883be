"""Semantic invariants for the x13-series (round-3 continuation)
operators — properties stronger than oracle equality on one
configuration."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_kcenter_radii_match_independent_recomputation(spark, sf_smoke):
    """Gonzalez soundness: the reported d_sel at every step r must equal
    the TRUE farthest min-distance to the first r centers, recomputed
    independently in one pass (array of center vectors, no iteration),
    and the covering-radius curve must be non-increasing."""
    from social_warner_spark.operators.similarity import _l2sq
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x13_series import KC_K, x221_kcenter_coreset

    picks = sorted(
        x221_kcenter_coreset(spark, sf_smoke).collect(),
        key=lambda r: r.sel_order,
    )
    assert [p.sel_order for p in picks] == list(range(KC_K))
    assert len({p.vec_id for p in picks}) == KC_K

    emb = T(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assert picks[0].vec_id == emb.agg(F.min("vec_id")).first()[0]
    assert picks[0].d_sel == 0.0

    center_rows = {
        r.vec_id: r.v
        for r in emb.where(
            F.col("vec_id").isin([p.vec_id for p in picks])
        ).collect()
    }
    radii = [p.d_sel for p in picks[1:]]
    assert radii == sorted(radii, reverse=True), "covering radius must shrink"
    for r in range(1, KC_K):
        prefix = [picks[i].vec_id for i in range(r)]
        mind = F.array_min(
            F.array(
                *[
                    F.round(
                        _l2sq(
                            F.col("v"),
                            F.array(*[F.lit(x) for x in center_rows[c]]),
                        ),
                        6,
                    )
                    for c in prefix
                ]
            )
        )
        true_max = emb.agg(F.max(mind)).first()[0]
        assert picks[r].d_sel == true_max, (r, picks[r].d_sel, true_max)


def test_label_noise_flags_are_marker_backed(spark, sf_correct):
    """A confident flag can only arise from marker evidence: every
    example doc flagged as language j must actually contain at least one
    of j's marker tokens, and no row may flag a doc into its own given
    label."""
    from social_warner_spark.functions.text import LANG_MARKERS, tokens
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x13_series import x222_label_noise_screen

    rows = x222_label_noise_screen(spark, sf_correct).collect()
    assert rows, "synthetic corpus should contain confident label noise"
    for r in rows:
        assert r.flagged_as != r.given_lang
        assert r.n_docs >= 1
        assert r.mean_conf > 0

    docs = {
        r.doc_id: r.text
        for r in T(spark, sf_correct, "documents")
        .where(F.col("doc_id").isin([r.example_doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        toks = set(docs[r.example_doc_id].split())
        assert toks & set(LANG_MARKERS[r.flagged_as]), (
            f"doc {r.example_doc_id} flagged as {r.flagged_as} without markers"
        )
    # sanity: the marker sets the test relies on match the engine tokenizer
    assert tokens is not None


def test_quantile_normalize_endpoints_and_monotonicity(spark, sf_correct):
    """Exact invariants of rank interpolation: every source with >= 2
    docs maps its extremes onto the GLOBAL min/max, and within a source
    the normalized ordering preserves the raw (quality, doc_id) order."""
    from social_warner_spark.queries.x13_series import x223_quantile_normalize

    out = x223_quantile_normalize(spark, sf_correct)
    gmin, gmax = out.agg(F.min("quality"), F.max("quality")).first()

    per_source = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("ns"),
            F.min("quality_norm").alias("lo"),
            F.max("quality_norm").alias("hi"),
        )
        .collect()
    )
    for r in per_source:
        if r.ns >= 2:
            assert r.lo == gmin, (r.source, r.lo, gmin)
            assert r.hi == gmax, (r.source, r.hi, gmax)

    rows = out.orderBy("source", "quality", "doc_id").collect()
    prev = {}
    for r in rows:
        if r.source in prev:
            assert r.quality_norm >= prev[r.source], r.source
        prev[r.source] = r.quality_norm
