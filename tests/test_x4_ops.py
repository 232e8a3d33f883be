"""Unit + plan tests for the fourth extension batch (x32–x39 operators).

The oracle harness (test_correctness.py) hash-checks full results; these
tests pin the edge-case semantics and the plan shapes the oracles can't
see.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from social_warner_spark.operators.graph import pagerank_fixed
from social_warner_spark.operators.search import bm25_scores
from social_warner_spark.operators.sketch import bloom_filter_table, bloom_prune
from social_warner_spark.operators.timeseries import gapfill_interpolate, sessionize


def test_bloom_prune_supersets_true_matches_and_prunes(spark, sf_correct):
    orders = spark.read.parquet(f"{sf_correct}/orders.parquet")
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    dim = orders.where(F.col("o_totalprice") > 494000).select("o_orderkey")
    positions = bloom_filter_table(dim, "o_orderkey", k=3)
    pruned = bloom_prune(li, "l_orderkey", positions, k=3)

    n_fact, n_pruned = li.count(), pruned.count()
    assert n_pruned < n_fact * 0.2, "bloom should prune the vast majority"
    # no false negatives: every true-matching fact row survives
    true_matches = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi")
    missed = true_matches.join(pruned, ["l_orderkey", "l_linenumber"], "left_anti")
    assert missed.count() == 0


def test_bloom_prune_plan_is_broadcast_only(spark, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_correct}/orders.parquet")
    dim = orders.where(F.col("o_totalprice") > 494000).select("o_orderkey")
    positions = bloom_filter_table(dim, "o_orderkey", k=3)
    pruned = bloom_prune(li, "l_orderkey", positions, k=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_sessionize_gap_semantics(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 100),
        (1, base + dt.timedelta(minutes=30), 101),  # exactly 30 min: same session
        (1, base + dt.timedelta(minutes=61), 102),  # 31 min gap: new session
        (2, base, 200),  # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, event_id INT")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {100: 0, 101: 0, 102: 1, 200: 0}


def test_gapfill_linear_interpolation(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (t0, 1.0),
        (t0 + dt.timedelta(minutes=3), 4.0),  # minutes 1, 2 are gaps
    ]
    df = spark.createDataFrame(rows, "minute TIMESTAMP, v DOUBLE")
    out = {
        r["minute"].minute: (r["v_filled"], r["is_gap"])
        for r in gapfill_interpolate(df).collect()
    }
    assert out[0] == (1.0, 0)
    assert out[1] == (2.0, 1)
    assert out[2] == (3.0, 1)
    assert out[3] == (4.0, 0)


def test_pagerank_isolated_node_and_sink(spark):
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node STRING")
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src STRING, dst STRING")
    ranks = {r["node"]: r["pr"] for r in pagerank_fixed(nodes, edges, iters=3).collect()}
    # isolated node keeps only the teleport mass
    assert ranks["c"] == 0.15
    # the symmetric a<->b pair is a fixpoint at 1.0 each
    assert ranks["a"] == 1.0 and ranks["b"] == 1.0


def test_bm25_ranks_matching_doc_and_drops_nonmatching(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark runs fast"),
            (2, "spark is here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id INT, text STRING",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(got) == {1, 2}, "zero-score docs must be dropped"
    assert got[1] > got[2], "higher tf must outscore"


def test_chunking_geometry(spark, tmp_path):
    """100 tokens with chunk 64 / stride 48 → starts 0, 48, 96; the last
    chunks clamp to the doc end (overlap = 16 tokens between chunks)."""
    from social_warner_spark.queries.x5_series import x41_chunking

    doc = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))], "doc_id INT, text STRING"
    )
    doc.write.parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        (r["chunk_id"], r["start_tok"], r["end_tok"], len(r["chunk_text"].split(" ")))
        for r in x41_chunking(spark, str(tmp_path)).collect()
    )
    assert rows == [(0, 0, 64, 64), (1, 48, 100, 52), (2, 96, 100, 4)]


def test_shared_span_coverage_handcrafted(spark, tmp_path):
    """Doc 2 repeats doc 1's first 8 tokens: exactly one shared 8-gram,
    covering positions 0..7 of a 10-token doc (frac 0.8); the earlier doc
    is never penalized for grams it introduced."""
    import pyspark.sql.functions as F

    from social_warner_spark.queries.x8_series import x73_shared_span_coverage

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "en", "s", 19),
            (2, "a b c d e f g h x y", "en", "s", 19),
            (3, "p q r s t u v", "en", "s", 13),  # < 8 tokens: no grams
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r for r in x73_shared_span_coverage(spark, str(tmp_path)).collect()
    }
    assert out[1].n_covered == 0 and out[1].covered_frac == 0.0
    assert out[2].n_covered == 8 and abs(out[2].covered_frac - 0.8) < 1e-9
    assert out[3].n_covered == 0 and out[3].n_tokens == 7


def test_ewma_matches_naive_recurrence(spark):
    """Closed-form window EWMA must equal the literal s_t = x + d*s_{t-1}
    recurrence."""
    from social_warner_spark.operators.timeseries import ewma

    rows = [(i, f"2024-01-01 00:0{i}:00", 7, float(v)) for i, v in
            enumerate([5.0, 1.0, 3.0, 0.0, 10.0])]
    e = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "user_id", "value")
    got = {
        r.event_id: r.ewma
        for r in ewma(e, decay=0.5).collect()
    }
    s, d = 0.0, 0.5
    for i, v in enumerate([5.0, 1.0, 3.0, 0.0, 10.0]):
        s = v + d * s
        assert abs(got[i] - s) < 1e-9, (i, got[i], s)
