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
#: Round-8 rotation (per the round-7 verdict; backlog after r07 =
#: 116 never-checked of 445 declared):
#: - Ten rechecks, every one forced by a code move this round (the r05
#:   discipline — hard rows land the same round the code moves):
#:   x27/x77/x119/x138/x155/x256/x330/x362 — the eight
#:   neardup_clusters consumers (verdict task 1: the propagation
#:   changed-check labels⋈labels shuffle join is replaced by a _chg
#:   flag derived in the update select; verified by call-site scan —
#:   x31's prepare_corpus does NOT flow through neardup_clusters, so
#:   it is not re-listed); x119 additionally carries the decimal(38,0)
#:   leak-count fix (task 3); x267 (task 4: unique rank tiebreaker);
#:   x377 (ADVICE: Misra–Gries merge keeps counter ids int64 via
#:   nullable Int64 instead of float64-coercing NULL sentinels).
#: - The remaining 40 are the never-checked backlog in the documented
#:   r08 order (task 2): x191, then the x11/x12 remainder
#:   (x193–x245 gaps), then the statistical tail from x248 onward.
#:   Cumulative driver coverage after this window: 369/445 (83%).
#: Everything previously verified stays green via the local DuckDB
#: mirror (tests/test_correctness.py, all queries, serialization-strict
#: like the driver's hash).  Queries not listed follow in stable module
#: order; total set is 445 (query-count freeze HELD per verdict task 6:
#: the freeze lifts only for queries that pin an uncovered operator
#: class, not for count).
#:
#: Round-9 rotation plan (for the next session): after r08 lands,
#: driver coverage is ~369/445 (83%); fill the next window from the
#: remaining never-checked ids in x-number order — x276, x277, x278,
#: x280, x281, x283, x284, x285, x288–x299 gaps, x301–x376 gaps
#: (x276–x345 first, then the x348+ tail; ~76 remain, so two more
#: windows finish the corpus).  Keep zero overlap with
#: CORRECTNESS_r01–r08 unless code changes force rechecks.
CHECK_PRIORITY = (
    # rechecks (code changed this round, previously driver-checked):
    # the eight neardup_clusters consumers (propagation _chg flag):
    "x27_neardup_clusters",
    "x77_cluster_survivors",
    "x119_split_leakage",
    "x138_cluster_size_histogram",
    "x155_effective_tokens",
    "x256_bcubed_dedup_eval",
    "x330_medoid_canonicals",
    "x362_dedup_waterfall",
    # rechecks forced by this round's ADVICE fixes:
    "x267_theil_sen",
    "x377_misra_gries_twin",
    # never-checked backlog: x11/x12 remainder in x-number order
    "x191_good_turing",
    "x193_adjusted_rand",
    "x195_forecast_backtest",
    "x198_priority_sample",
    "x199_capture_recapture",
    "x201_fdr_correction",
    "x202_cuped",
    "x203_kcore",
    "x204_span_corruption",
    "x211_dedup_lm_impact",
    "x214_crossfit_oof",
    "x222_label_noise_screen",
    "x224_hard_negative_mining",
    "x225_doremi_weights",
    "x227_dsir_selection",
    "x228_padding_efficiency",
    "x230_vocab_budget_sweep",
    "x231_hits_scores",
    "x233_scaling_curve",
    "x234_uncertainty_sampling",
    "x238_holt_smoothing",
    "x239_label_propagation",
    "x240_l_diversity",
    "x242_mcnemar",
    "x244_naive_bayes",
    "x245_chi2_tokens",
    # never-checked backlog: statistical tail
    "x248_welch_ttest",
    "x249_cusum_drift",
    "x251_propensity_matching",
    "x252_dirichlet_ql",
    "x254_gini_sources",
    "x264_permutation_test",
    "x265_powerlaw_degree",
    "x266_matryoshka_recall",
    "x268_mann_kendall",
    "x269_cluster_quality",
    "x271_harmonic_regression",
    "x273_item_item_cf",
    "x274_kruskal_wallis",
    "x275_brown_forsythe",
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
