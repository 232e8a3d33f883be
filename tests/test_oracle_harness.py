"""Self-tests for the strict oracle mirror (tests/oracle_harness.py).

The round-3 verdict's root cause for the only red driver row (x272):
the driver hashes SERIALIZED values, so a DuckDB HUGEINT column
(pandas float64, renders "331.0") never matches a Spark long ("331")
even when every value is numerically identical — and the old tolerant
mirror could not catch it.  These tests pin the strict behavior so the
mirror stays driver-faithful.
"""

from __future__ import annotations

import pandas as pd

from tests.oracle_harness import compare


def _sdf(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf)


def test_identical_frames_pass(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "n": [1, 2], "x": [0.5, 1.25]})
    ok, msg = compare(_sdf(spark, pdf), pdf.copy())
    assert ok, msg


def test_int_vs_float_split_fails(spark):
    """The x272 class: Spark emits long, the oracle's HUGEINT lands in
    pandas as float64 — values equal, serialization differs, the driver
    hash would mismatch, so the mirror MUST fail."""
    spark_side = pd.DataFrame({"k": ["a", "b"], "n": [331, 7]})
    duck_side = pd.DataFrame({"k": ["a", "b"], "n": [331.0, 7.0]})
    ok, msg = compare(_sdf(spark, spark_side), duck_side)
    assert not ok
    assert "serialization class differs" in msg


def test_rendering_flip_within_tolerance_fails(spark):
    """A 6dp rounding-boundary flip (1e-6 apart) passes the numeric
    tolerance but changes the rendered value — the driver hash would
    differ, so the mirror MUST fail."""
    spark_side = pd.DataFrame({"k": ["a"], "x": [2.090523]})
    duck_side = pd.DataFrame({"k": ["a"], "x": [2.090522]})
    ok, msg = compare(_sdf(spark, spark_side), duck_side)
    assert not ok
    assert "rendering differs" in msg


def test_value_difference_beyond_tolerance_fails_first(spark):
    spark_side = pd.DataFrame({"k": ["a"], "x": [1.0]})
    duck_side = pd.DataFrame({"k": ["a"], "x": [2.0]})
    ok, msg = compare(_sdf(spark, spark_side), duck_side)
    assert not ok
    assert "differs at canonical row" in msg


def test_nulls_match_across_classes(spark):
    """NaN/None both render NULL; equal-null frames pass."""
    spark_side = pd.DataFrame({"k": ["a", "b"], "x": [1.5, None]})
    duck_side = pd.DataFrame({"k": ["a", "b"], "x": [1.5, float("nan")]})
    ok, msg = compare(_sdf(spark, spark_side), duck_side)
    assert ok, msg


def test_extreme_magnitude_rendering_pinned():
    """Pin the positional rendering of magnitudes where repr() would go
    scientific (ADVICE r05): >= 1e16 and <= 1e-4.  The mirror's renderer
    is applied to BOTH sides of every compare, so only EQUALITY semantics
    must match the driver — but the forms themselves are pinned here so a
    renderer change is a conscious decision, not a silent drift."""
    from tests.oracle_harness import _render_float

    assert _render_float(1.5e16) == "15000000000000000.0"
    assert _render_float(-1.5e16) == "-15000000000000000.0"
    assert _render_float(1e-05) == "0.00001"
    assert _render_float(1e-06) == "0.000001"
    # below the 6dp quantum: rounds to zero, renders as plain zero
    assert _render_float(4.9e-07) == "0.0"
    assert _render_float(float("inf")) == "inf"


def test_equal_extreme_magnitudes_pass(spark):
    spark_side = pd.DataFrame({"k": ["a", "b"], "x": [1.5e16, 1e-05]})
    duck_side = pd.DataFrame({"k": ["a", "b"], "x": [1.5e16, 1e-05]})
    ok, msg = compare(_sdf(spark, spark_side), duck_side)
    assert ok, msg
