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
#: Round-7 rotation (per the round-6 verdict; backlog after r06 =
#: 155 never-checked of 445 declared):
#: - Eleven rechecks, every one forced by a code move this round (the
#:   r05 discipline — hard rows land the same round the code moves):
#:   x15 (verdict task 1: LSH verification rewritten to candidate-only
#:   rescore), x29/x31/x42 (task 2: per-lang packing/budget windows
#:   converted to grouped distributed cumsum), x17/x18/x68/x208 (task 3
#:   follow-through: the remaining corpus-scale windows keyed by
#:   3-5-value columns became grouped distributed ranks / the
#:   value-halo range frame), x119
#:   (ADVICE: Σ ct·ch now decimal-exact behind a bounds guard), x267
#:   (ADVICE: rank keys gained deterministic tiebreakers), x377 (the
#:   Misra–Gries fold moved to the mergeable-summaries layout:
#:   per-scan-partition mapInPandas partials + bounded PODS'12 merge —
#:   same declared projection by theorem, no corpus-sized pandas
#:   group; pinned by the new LowCardGroupedPandas ratchet metric).
#: - x223 and x166 are never-checked AND named by verdict task 2:
#:   x223's per-source rank/count windows became grouped distributed
#:   ranks; x166 stays (its plan already IS the two-phase grouped
#:   top-k — WindowGroupLimit Partial before the shuffle — pinned by a
#:   plan test this round) and gets its first hard row.
#: - The remaining 37 are the never-checked backlog in the r06 plan's
#:   order: the x10 remnants (x143/x147/x148/x151-x163), then the x11
#:   tail (x165-x190; x191 moved to the r08 window when the x377
#:   recheck took its slot).
#: Everything previously verified stays green via the local DuckDB
#: mirror (tests/test_correctness.py, all queries, serialization-strict
#: like the driver's hash).  Queries not listed follow in stable module
#: order; total set is 445 (query-count freeze HELD per verdict task 6:
#: no new queries until driver coverage crosses 75%).
#:
#: Round-8 rotation plan (for the next session): after r07 lands,
#: driver coverage is ~331/445 (74%); fill the next window from the
#: remaining never-checked ids — x191, then the x11/x12 remainder
#: (x195-x204, x211, x214, x222-x245), then the statistical tail (x264 onward:
#: x264, x265, x266, x268, x269, x271, x273-x278, x280, x281,
#: x283-x285, x288-x299, x301-x376 gaps).  Keep zero overlap with
#: CORRECTNESS_r01-r07 unless code changes force rechecks.
CHECK_PRIORITY = (
    # rechecks (code changed this round, previously driver-checked):
    "x15_minhash_lsh_pairs",
    "x29_sequence_packing",
    "x31_full_pipeline",
    "x42_budget_selection",
    "x119_split_leakage",
    "x267_theil_sen",
    # rechecks forced by the LowCardPartitionWindow conversions (task
    # 2/3 follow-through: the remaining full-rank corpus windows keyed
    # by 3-5-value columns became grouped distributed ranks):
    "x17_range_frame",
    "x18_distribution_windows",
    "x68_quantile_sketch",
    "x208_conformal",
    "x377_misra_gries_twin",
    # never-checked, named by verdict task 2 (code moved / plan pinned):
    "x223_quantile_normalize",
    "x166_stratified_weighted_sample",
    # never-checked backlog: x10-series remnants
    "x143_basket_economics",
    "x147_activation_lag",
    "x148_acctbal_risk",
    "x151_triplet_mining",
    "x152_curriculum_deciles",
    "x153_multi_benchmark_decontamination",
    "x154_consistent_hash_rebalance",
    "x155_effective_tokens",
    "x156_source_epochs",
    "x157_burstiness",
    "x158_session_type_lift",
    "x159_signal_agreement",
    "x160_k_anonymity",
    "x161_pair_budget_forecast",
    "x162_ann_bucket_budget",
    "x163_error_budget",
    # never-checked backlog: x11-series tail
    "x165_mixed_language",
    "x168_jackknife_sources",
    "x169_effective_sample_size",
    "x171_bpe_encode",
    "x172_ks_drift",
    "x173_jl_distortion",
    "x174_user_typicality",
    "x175_benford_audit",
    "x177_langid_eval",
    "x178_twopass_median",
    "x179_subtree_rollup",
    "x180_sorted_neighborhood",
    "x181_budget_waterfill",
    "x182_eb_shrinkage",
    "x183_kaplan_meier",
    "x184_rank_auc",
    "x186_dp_noisy_counts",
    "x187_heaps_law",
    "x188_logreg_gd",
    "x189_cohens_kappa",
    "x190_skyline",
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
