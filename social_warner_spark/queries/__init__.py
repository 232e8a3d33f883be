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
#: Round-9 rotation (per the round-8 verdict task 1; backlog after
#: r08 = 76 never-checked of 445 declared):
#: - Three rechecks, all forced by this round's code moves (the r05
#:   discipline — hard rows land the same round the code moves):
#:   x249 (the oracle's cal-CTE mu now carries the same +1e-9 tie-nudge
#:   as the Spark side — the r8 sweep nudged the fold but missed mu),
#:   x377 (the Misra-Gries merge's int64 dtype tripwire is an explicit
#:   TypeError instead of an assert), and x10_asof_join (asof_join's
#:   window sort gained a value-tuple tiebreaker: duplicate right rows
#:   at one (key, ts) made the sort non-total, so the carried value
#:   depended on partitioning — found by a property probe, pinned by a
#:   hypothesis brute-force sweep in tests/test_property.py).  All
#:   mirror-verified at sf0.001/sf0.01/sf0.1 before listing.
#: - The remaining 47 are the never-checked backlog in x-number order
#:   from x276 (the documented r9 window): x276-x338.  Cumulative
#:   driver coverage after this window: 416/445 (93.5%).
#: Everything previously verified stays green via the local DuckDB
#: mirror (tests/test_correctness.py, all queries, serialization-strict
#: like the driver's hash).  Queries not listed follow in stable module
#: order; total set is 445 (query-count freeze HELD per verdict task 7:
#: the freeze lifts only for queries that pin an uncovered operator
#: class, not for count).
#:
#: Round-10 rotation plan (for the next session): after r09 lands,
#: driver coverage is ~416/445 (93.5%); the remaining 29 never-checked
#: ids in x-number order finish the corpus — x339_positivity_check,
#: x340_subsequence_mining,
#: x342_rank_aggregation, x343_term_burstiness, x344_histogram_design,
#: x345_session_gap_planner, x348_design_effect, x349_fpc_ci,
#: x350_knn_ood, x351_quantile_effects, x353_salt_planner,
#: x354_ivm_merge, x355_join_order_advisor, x356_bloom_planner,
#: x357_randomized_response, x358_weighted_jaccard, x361_churn_sweep,
#: x363_chunking_planner, x364_temperature_scaling,
#: x365_behavioral_unicity, x366_winnowing_density, x367_rank_movers,
#: x369_doc_typicality, x370_stopword_discovery, x371_label_budget_curve,
#: x372_lww_vs_arrival, x373_ratio_bridge, x374_birthday_audit,
#: x376_raking; the other 22 slots go to rechecks forced by r10 code
#: moves, else to re-confirming the oldest r01-era rows.  Keep zero
#: overlap with CORRECTNESS_r01-r09 otherwise.
CHECK_PRIORITY = (
    # rechecks (oracle/code changed this round, previously driver-checked):
    "x249_cusum_drift",
    "x377_misra_gries_twin",
    "x10_asof_join",
    # never-checked backlog, x-number order from x276:
    "x276_friedman",
    "x277_rouge_pairs",
    "x278_logrank_test",
    "x280_gains_table",
    "x281_cochran_armitage",
    "x283_daily_correlation",
    "x284_diff_in_diffs",
    "x285_nelson_aalen",
    "x288_rm3_expansion",
    "x289_alignment_uniformity",
    "x290_chi2_homogeneity",
    "x291_jsd_source_matrix",
    "x292_readability",
    "x294_fano_burstiness",
    "x295_weibull_fit",
    "x296_powerlaw_gof",
    "x297_circular_hours",
    "x298_decision_stump",
    "x299_brier_decomposition",
    "x301_stl_strengths",
    "x303_wasserstein_sources",
    "x304_lexical_diversity",
    "x305_block_bootstrap",
    "x306_roc_youden",
    "x308_rich_club",
    "x309_psi",
    "x310_g_test",
    "x311_eigen_gap",
    "x313_temporal_motifs",
    "x314_granger_precedence",
    "x315_rec_coverage",
    "x316_burst_detection",
    "x319_simhash_audit",
    "x320_feature_mi",
    "x321_bitemporal_asof",
    "x323_power_planner",
    "x324_chao1_richness",
    "x325_merkle_root",
    "x326_quantile_ci",
    "x327_forecast_reconcile",
    "x328_shesd_anomalies",
    "x329_target_encoding",
    "x332_join_advisor",
    "x333_wilson_ci",
    "x336_crosssource_dups",
    "x337_anisotropy",
    "x338_hubness",
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
