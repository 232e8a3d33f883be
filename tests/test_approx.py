"""Tolerance checks for approximate aggregates against exact anchors
(SURVEY.md §2.d: approximate ops are tolerance-checked, not hash-matched)."""

from __future__ import annotations

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table


def test_approx_count_distinct_tolerance(spark, sf_correct):
    o = load_table(spark, sf_correct, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd


def test_approx_percentile_tolerance(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem")
    row = li.select(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_asof_join_no_earlier_right_rows_is_null(spark):
    from social_warner_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:05"), (2, 10, "2024-01-01 00:00:01")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:03", 99.0)],
        "user_id long, ts_s string, v double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    out = {r.event_id: r.v_asof for r in asof_join(left, right, "user_id").collect()}
    assert out[1] == 99.0  # right row at 00:03 <= left 00:05
    assert out[2] is None  # no right row at/before 00:01


def test_asof_join_equal_ts_matches(spark):
    from social_warner_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "2024-01-01 00:00:03")],
        "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([(5, "2024-01-01 00:00:03", 7.5)],
        "user_id long, ts_s string, v double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    assert asof_join(left, right, "user_id").first().v_asof == 7.5


def test_asof_join_carries_one_whole_row(spark):
    """Row atomicity (ADVICE r9, fixed r10): the carried values must come
    from ONE right row.  Two duplicates at the same (key, ts) with
    complementary NULL columns used to bridge per-column into a mixed
    tuple (a=1, b=20) that exists in neither row; the struct carry must
    return exactly the greatest whole tuple — (1, NULL), since the
    struct comparison orders NULL fields first within equal prefixes."""
    from social_warner_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 00:00:09")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(5, "2024-01-01 00:00:03", 1.0, None),
         (5, "2024-01-01 00:00:03", None, 20.0)],
        "user_id long, ts_s string, a double, b double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "a", "b")
    row = asof_join(left, right, "user_id").first()
    assert (row.a_asof, row.b_asof) == (1.0, None)


def test_asof_join_matched_row_nulls_stay_null(spark):
    """DuckDB/kdb ASOF row semantics: the join picks the LATEST eligible
    row and you get that row's values, NULLs included — a NULL in the
    matched row must not be bridged from an older non-null row."""
    from social_warner_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 00:00:09")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(5, "2024-01-01 00:00:01", 7.5), (5, "2024-01-01 00:00:03", None)],
        "user_id long, ts_s string, v double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    assert asof_join(left, right, "user_id").first().v_asof is None


def test_log_histogram_quantiles_within_design_bound(spark, sf_smoke):
    """DDSketch-style bound: in-bucket interpolation keeps every estimate
    within the e^(1/k)-1 relative bucket width of the exact rank-based
    percentile (x68's contract)."""
    import math

    from social_warner_spark.queries.x8_series import x68_quantile_sketch

    rows = x68_quantile_sketch(spark, sf_smoke).collect()
    assert len(rows) == 9  # 3 return flags x 3 quantiles
    bound = math.exp(1 / 20) - 1
    for r in rows:
        assert abs(r.est - r.exact) / r.exact <= bound, (r.l_returnflag, r.q)


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_smoke):
    """The corpus-minimum doc_id can never have seen any shingle before."""
    import pyspark.sql.functions as F

    from social_warner_spark.queries.x8_series import x67_ngram_novelty

    out = x67_ngram_novelty(spark, sf_smoke)
    first = out.orderBy("doc_id").first()
    assert first.n_seen == 0 and first.novelty == 1.0
    # novelty is a proper fraction everywhere
    bad = out.where((F.col("novelty") < 0) | (F.col("novelty") > 1)).count()
    assert bad == 0
