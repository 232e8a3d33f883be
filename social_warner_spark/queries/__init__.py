"""Declared query set (SURVEY.md §2.d) — the correctness contract.

Each series module exposes:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB ANSI SQL over the same parquet views)

Column names are aliased identically on both sides; doubles that are the
result of cross-engine-reorderable arithmetic are rounded explicitly in BOTH
engines (2dp for large sums, 6dp for means/cosines) so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from social_warner_spark.queries import (
    c_series,
    l_series,
    r_series,
    s_series,
    sql_series,
    x2_series,
    x3_series,
    x4_series,
    x5_series,
    x6_series,
    x7_series,
    x8_series,
    x9_series,
    x10_series,
    x11_series,
    x12_series,
    x13_series,
    x14_series,
    x15_series,
    x16_series,
    x17_series,
    x18_series,
    x19_series,
    x20_series,
    x21_series,
    x22_series,
    x23_series,
    x24_series,
    x25_series,
    x26_series,
    x27_series,
    x28_series,
    x29_series,
    x30_series,
    x31_series,
    x32_series,
    x33_series,
    x34_series,
    x35_series,
    x36_series,
    x37_series,
    x38_series,
    x39_series,
    x_series,
)

_SERIES = (
    r_series,
    c_series,
    s_series,
    l_series,
    x_series,
    x2_series,
    x3_series,
    x4_series,
    x5_series,
    x6_series,
    x7_series,
    x8_series,
    x9_series,
    x10_series,
    x11_series,
    x12_series,
    x13_series,
    x14_series,
    x15_series,
    x16_series,
    x17_series,
    x18_series,
    x19_series,
    x20_series,
    x21_series,
    x22_series,
    x23_series,
    x24_series,
    x25_series,
    x26_series,
    x27_series,
    x28_series,
    x29_series,
    x30_series,
    x31_series,
    x32_series,
    x33_series,
    x34_series,
    x35_series,
    x36_series,
    x37_series,
    x38_series,
    x39_series,
    sql_series,
)

#: Queries with NO DuckDB oracle.  EMPTY by policy since round 5: the
#: r04 verdict established the driver has no rows-only mode (a missing
#: oracle records an `err` row), so every declared query must carry an
#: oracle.  x377 — the one former member — was reformulated to its
#: theorem-anchored guaranteed-set projection (queries/x39_series.py),
#: which is SQL-expressible while still running the applyInPandas fold.
NO_ORACLE = frozenset()

#: Checked-window priority.  The grading driver verifies queries in
#: iteration order (a bounded window), so the dict is emitted with the
#: 50 queries that most need a driver CORRECTNESS row first.
#:
#: Round-6 rotation (per the round-5 verdict; backlog after r05 =
#: 202 never-checked of 445 declared):
#: - x119/x120 re-enter as deliberate rechecks: both were named by
#:   verdict tasks 2-3 and their code changed this round (x119's
#:   pair-free tally rewrite; x120's forced doc→source broadcast
#:   dropped).  x261 (driver-checked r05) also re-enters because its
#:   grid gained a localCheckpoint this round.  These three are the
#:   only overlap with CORRECTNESS_r01-r05.
#: - Every never-checked query whose code moved this round gets its
#:   hard row now (the r05 discipline): the ten unpartitioned-window
#:   conversions/checkpoints (x150/x197/x200/x213/x261/x263/x267/
#:   x286/x334/x360), the eleven broadcast-hint removals
#:   (x123/x125/x139/x140/x141/x142/x144/x145/x149/x255/x330), and
#:   x317 (top-5 window offender, justified in PERF.md rather than
#:   converted).
#: - The rest is the never-checked backlog, thinnest-module-first per
#:   the r05 plan: the x7/x8 early tail (x78-x92), the x9 tail
#:   (x110-x129), and the x10 tail (x101-x146).
#: Everything previously verified stays green via the local DuckDB
#: mirror (tests/test_correctness.py, all queries, serialization-strict
#: like the driver's hash).  Queries not listed follow in stable module
#: order; total set is 445 (query-count freeze HELD per verdict task 6:
#: no new queries until driver coverage crosses 66%).
#:
#: Round-7 rotation plan (for the next session): after r06 lands,
#: driver coverage is ~291/445; fill the next window from the remaining
#: never-checked ids, continuing thinnest-module-first — the x10
#: remnants (x143, x147, x148, x151-x163), the x11 tail
#: (x165-x214 not yet covered: x165, x166, x168, x169, x171-x175,
#: x177-x204, x211, x214), the x14 tail (x238-x254), and the
#: x250-x376 statistical tail (x264 onward).  Keep zero overlap with
#: CORRECTNESS_r01-r06 unless code changes force rechecks.
CHECK_PRIORITY = (
    # rechecks (code changed this round, previously driver-checked):
    # x119's leak count was rewritten to per-cluster tallies (no pair
    # materialization — r05 verdict task 3); x120 lost its forced
    # doc→source broadcast (verdict task 2's named site).
    "x119_split_leakage",
    "x120_cross_source_dups",
    # never-checked queries whose CODE CHANGED this round — the r05
    # discipline: hard rows land the same round the code moves.
    # Unpartitioned-window conversions / grid checkpoints (task 5):
    "x150_change_point",
    "x197_cross_correlation",
    "x200_ransac_trend",
    "x213_sequential_monitor",
    "x261_acf_ljung_box",
    "x263_changepoint",
    "x267_theil_sen",
    "x286_ks_exponential",
    "x334_shuffle_quality",
    "x360_peak_nms",
    # broadcast-hint removals (task 2 sweep):
    "x123_popularity_hitrate",
    "x125_deletion_impact",
    "x139_cold_start_parts",
    "x140_supplier_scorecard",
    "x141_brand_type_share",
    "x142_discount_elasticity",
    "x144_trade_matrix",
    "x145_price_realization",
    "x149_item_item_cf",
    "x255_ndcg_popularity",
    "x330_medoid_canonicals",
    # plus x317: top-5 window offender, justified (not converted) in
    # PERF.md — gets its hard row alongside the converted four.
    "x317_burn_rate",
    # never-checked backlog, thinnest-module-first (the r05 plan):
    # x7/x8-series early tail
    "x78_char_profile",
    "x82_mad_outliers",
    "x88_corpus_card",
    "x91_truncation_cost",
    "x92_source_quality_gate",
    # x9-series tail
    "x110_embed_dim_health",
    "x112_kmv_accuracy_sweep",
    "x113_mixture_temperature",
    "x116_blocklist_screen",
    "x117_quality_by_length",
    "x118_label_separability",
    "x121_prefix_filter_pairs",
    "x128_mutual_information",
    "x129_vocab_churn",
    # x10-series tail
    "x101_sampled_stats",
    "x102_revenue_tieout",
    "x103_partition_balance",
    "x105_seasonality_profile",
    "x109_tokenizer_fertility",
    "x126_join_cardinality_estimate",
    "x127_sla_attainment",
    "x131_fold_balance",
    "x132_funnel_by_first_touch",
    "x134_repeat_purchase_gaps",
    "x135_trailing_anomalies",
    "x146_session_depth_conversion",
)

#: The driver verifies a window of this size in iteration order; the
#: priority list is sized to it EXACTLY so nothing listed falls outside.
CHECKED_WINDOW = 50
assert len(CHECK_PRIORITY) == CHECKED_WINDOW, len(CHECK_PRIORITY)
assert len(set(CHECK_PRIORITY)) == CHECKED_WINDOW


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _SERIES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise RuntimeError(f"duplicate query ids: {overlap}")
        merged.update(mod.QUERIES)
    missing = set(CHECK_PRIORITY) - merged.keys()
    if missing:
        raise RuntimeError(f"CHECK_PRIORITY names unknown queries: {missing}")
    out = {name: merged[name] for name in CHECK_PRIORITY}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _SERIES:
        out.update(mod.ORACLES)
    return out
