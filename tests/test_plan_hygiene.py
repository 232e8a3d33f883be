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
