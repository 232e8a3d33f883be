"""Tiny-scale guard for the tie-nudge-sensitive class (round 9).

The r08 sf0.001 sweep proved this scale exposes a divergence family the
sf0.01/sf0.1 gates never see: tiny groups make exact decimal rationals
land ON the rounding grid's midpoints (x144/x249/x323 were all found
there).  The FULL corpus is mirrored at sf0.001 by the pre-close
`python -m tests.run_strict_mirror mirror3` gate; this file pins just
the nudged-query ledger (COVERAGE.md round 9) in the per-run suite so a
regression in the class is caught by any pytest run.
"""

from __future__ import annotations

import pytest

from social_warner_spark.queries import all_oracles, all_queries

from tests.oracle_harness import compare, duck_connection

SF0001 = "/root/testdata/sf0.001"

#: The COVERAGE.md round-9 tie-nudge ledger, verbatim.  A query joins
#: this list when it gains a mirrored rounding nudge; keep the two in
#: sync (test_ledger_matches_nudge_sites below greps the sources).
NUDGED = [
    "x33_gapfill_interpolate",
    "x75_ewma",
    "x130_user_trends",
    "x144_trade_matrix",
    "x148_acctbal_risk",
    "x212_neyman_allocation",
    "x229_margin_bitext_mining",
    "x249_cusum_drift",
    "x288_rm3_expansion",
    "x302_ccnet_buckets",
    "x321_bitemporal_asof",
    "x323_power_planner",
    "x344_histogram_design",
    "x372_lww_vs_arrival",
]

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", NUDGED)
def test_nudged_query_matches_oracle_at_sf0001(spark, name):
    sdf = QUERIES[name](spark, SF0001)
    con = duck_connection(SF0001)
    try:
        ddf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_ledger_matches_nudge_sites():
    """Every query module whose Spark side or oracle carries a rounding
    tie-nudge (r6t/r2t helpers or a literal `+ 1e-9`/`+ 1e-6` inside a
    ROUND) must have its queries in NUDGED — a new nudge without a
    ledger entry fails here until COVERAGE.md and this list are
    updated.  x219's GREATEST(..., 1e-9) strength floor and x12's
    MATERIALIZED floor are numeric clamps, not rounding nudges."""
    import os
    import re

    qdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "social_warner_spark",
        "queries",
    )
    # modules known to contain ONLY non-nudge 1e-9/1e-6 uses (floors):
    floors_only = {"x12_series.py"}
    # nudge site: r6t(/r2t( call, or +1e-9 / + 1e-9 adjacent to a round
    nudge = re.compile(r"\br[26]t\(|\+ 1e-[69]\b|\+ F\.lit\(1e-[69]\)")
    hits = set()
    for fn in sorted(os.listdir(qdir)):
        if not fn.endswith(".py") or fn in ("__init__.py", "common.py"):
            continue
        if fn in floors_only:
            continue
        src = open(os.path.join(qdir, fn)).read()
        if nudge.search(src):
            hits.add(fn)
    expected_modules = {
        "x4_series.py",    # x33 (spark side in operators/timeseries.py)
        "x8_series.py",    # x75
        "x10_series.py",   # x130, x144, x148
        "x11_series.py",   # x212
        "x13_series.py",   # x229
        "x14_series.py",   # x249
        "x21_series.py",   # x288
        "x24_series.py",   # x302
        "x27_series.py",   # x321
        "x28_series.py",   # x323
        "x32_series.py",   # x344
        "x38_series.py",   # x372
    }
    assert hits == expected_modules, (
        f"nudge sites moved: new={sorted(hits - expected_modules)} "
        f"gone={sorted(expected_modules - hits)} — update the NUDGED "
        f"ledger here AND in COVERAGE.md round 9"
    )
