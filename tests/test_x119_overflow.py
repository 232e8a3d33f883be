"""Overflow-regression tests for x119's leak-count fold (r07 ADVICE /
r07 verdict task 3): Σ ct·ch over per-cluster train/heldout tallies must
stay EXACT past int64 products (decimal(38,0) internally) and must fail
LOUDLY — not wrap — when the total itself exceeds the declared long
output type.  Synthetic mega-cluster rows stand in for the boilerplate
clusters the query is designed to catch at 100 TB."""

from __future__ import annotations

import pytest

from social_warner_spark.queries.x9_series import _leakage_stats


def _per_cluster(spark, rows):
    return spark.createDataFrame(rows, "cluster_id long, ct long, ch long")


def test_exact_sum_beyond_int32_products(spark):
    # Two clusters whose products each exceed int32 and whose sum is
    # checked against exact Python int arithmetic.
    rows = [(1, 3_000_000, 2_000_000), (2, 70_000, 50_000)]
    out = _leakage_stats(_per_cluster(spark, rows)).collect()[0]
    assert out.n_leaking_pairs == 3_000_000 * 2_000_000 + 70_000 * 50_000
    assert out.n_compromised_heldout == 2_000_000 + 50_000


def test_exact_near_int64_max(spark):
    # A single mega-cluster product of 9e18 sits just under the int64
    # ceiling (9.22e18): long arithmetic would be fine here, but the
    # point is the decimal path returns it bit-exactly.
    rows = [(1, 3_000_000_000, 3_000_000_000)]
    out = _leakage_stats(_per_cluster(spark, rows)).collect()[0]
    assert out.n_leaking_pairs == 9_000_000_000_000_000_000


def test_overflow_raises_not_wraps(spark):
    # 4e9 · 4e9 = 1.6e19 > int64 max: non-ANSI long math would silently
    # wrap negative; the guard must raise instead.
    rows = [(1, 4_000_000_000, 4_000_000_000)]
    with pytest.raises(Exception, match="exceeds int64"):
        _leakage_stats(_per_cluster(spark, rows)).collect()


def test_empty_input_is_zero(spark):
    out = _leakage_stats(_per_cluster(spark, [])).collect()[0]
    assert out.n_leaking_pairs == 0
    assert out.n_compromised_heldout == 0
