"""Plan-shape ratchet: no declared query may grow new shuffles or
degrade an equi-join into a nested loop without a conscious baseline
update (python -m social_warner_spark.planaudit regenerates)."""

from __future__ import annotations

import json
import os

from social_warner_spark.planaudit import SHAPE_KEYS, plan_shape_counts
from social_warner_spark.queries import all_queries

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "plan_shapes_baseline.json")


def test_plan_shapes_do_not_regress(spark, sf_smoke):
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)

    missing = sorted(set(all_queries()) - set(baseline))
    assert not missing, (
        f"queries without a plan-shape baseline: {missing} — audit their "
        "plans and regenerate (python -m social_warner_spark.planaudit)"
    )

    counts = plan_shape_counts(spark, sf_smoke)
    regressions = []
    for name, got in counts.items():
        base = baseline.get(name)
        if base is None:
            continue  # guarded by `missing` above
        for key in SHAPE_KEYS:
            if got[key] > base[key]:
                regressions.append(f"{name}: {key} {base[key]} -> {got[key]}")
    assert not regressions, (
        "plan-shape regressions (new shuffles / nested loops):\n"
        + "\n".join(regressions)
    )


def test_unpartitioned_window_classifier():
    """ADVICE r05: the old regex missed expression-valued order args
    (parens/commas in the first windowspecdefinition argument).  The
    balanced-paren classifier counts those, still skips partitioned
    specs, and raises on a spec it cannot delimit."""
    from social_warner_spark.planaudit import _count_unpartitioned_windows

    bare = (
        "windowspecdefinition(x#3L ASC NULLS FIRST, specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    expr = (
        "windowspecdefinition(cast(round(x#3, 2) as string) ASC NULLS "
        "FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    partitioned = (
        "windowspecdefinition(g#1, x#3L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    part_expr = (
        "windowspecdefinition(coalesce(g#1, 0), x#3L DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    frame_only = (
        "windowspecdefinition(specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), unboundedfollowing$()))"
    )
    assert _count_unpartitioned_windows(bare) == 1
    assert _count_unpartitioned_windows(expr) == 1
    assert _count_unpartitioned_windows(partitioned) == 0
    assert _count_unpartitioned_windows(part_expr) == 0
    assert _count_unpartitioned_windows(frame_only) == 1
    assert _count_unpartitioned_windows("\n".join([bare, expr, partitioned])) == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unclassifiable"):
        _count_unpartitioned_windows("windowspecdefinition(x#3L ASC NULLS")
