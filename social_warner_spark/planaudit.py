"""Plan-shape audit: count scale-critical physical operators per query.

The counts feed a RATCHET test (tests/test_plan_hygiene.py): a frozen
baseline records, for every declared query, how many Exchanges
(shuffles/broadcasts), BroadcastNestedLoopJoins, and CartesianProducts
its plan contains.  A refactor that silently adds a shuffle or degrades
an equi-join into a nested loop fails the suite even if results stay
correct — the 100 TB regression that correctness tests cannot see.

BNLJ/Cartesian are not forbidden outright: a crossJoin against a
broadcast 1-row relation (argmax rules in x170/x176, corpus-stat rows
everywhere) legitimately compiles to a BroadcastNestedLoopJoin.  The
ratchet pins each query at its audited count instead.

UnpartitionedWindow (r05 addition) counts window specs with NO
PARTITION BY — each one is a single-partition sort, the other silent
100 TB killer.  107 of 445 queries legitimately carry one over a
provably bounded relation (corpus-stat rows, calendar grids, top-k
shortlists, |sources|-sized aggregates); the ratchet pins those counts
so a refactor that pushes a CORPUS-sized relation through a global
window (what gapfill_interpolate did before r05) fails the suite.

BroadcastHint (r06 addition) counts ResolvedHint nodes in the ANALYZED
logical plan — every explicit ``F.broadcast()`` surviving to the final
query (hints inside eagerly-checkpointed sub-relations are gone with
their lineage).  r06 stripped every hint from SF-scaling relations (an
explicit hint bypasses autoBroadcastJoinThreshold, so it would force a
corpus-sized broadcast at 100 TB where AQE would demote to a shuffle
join); the surviving hints sit on provably bounded relations only
(constant dims, 1-row stats, value-domain grids, top-k shortlists,
probe sets, P-row offsets).  The pin makes re-adding a hint a
conscious baseline edit, not a silent drift.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import SparkSession

#: Substrings counted in the formatted physical plan (plus one regex
#: metric, see _UNPARTITIONED_WINDOW).
SHAPE_KEYS = (
    "Exchange",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "UnpartitionedWindow",
    "BroadcastHint",
)

#: Sort-order marker inside a windowspecdefinition argument.
_ORDER_MARK = re.compile(r" (?:ASC|DESC) NULLS")


def _count_unpartitioned_windows(plan: str) -> int:
    """Count windowspecdefinition specs with NO partition columns.

    A spec is unpartitioned iff its FIRST top-level argument is already
    an ordering expression (``... ASC/DESC NULLS ...``) or — degenerate
    global frame with no ordering either — the ``specifiedwindowframe``
    itself.  The old regex only matched bare-attribute order columns
    (``col#N ASC``); an expression-valued order argument (a cast or
    function call, which renders with parens/commas) slipped through
    uncounted (ADVICE r05).  This parser splits the first top-level
    argument with balanced parens and classifies EVERY spec; a spec it
    cannot delimit (e.g. a truncated plan line) raises instead of
    silently undercounting.
    """
    n = 0
    idx = 0
    token = "windowspecdefinition("
    while True:
        i = plan.find(token, idx)
        if i < 0:
            return n
        j = i + len(token)
        line_end = plan.find("\n", j)
        if line_end < 0:
            line_end = len(plan)
        depth = 1
        first_arg_end = None
        k = j
        while k < line_end and depth > 0:
            ch = plan[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and first_arg_end is None:
                    first_arg_end = k
            elif ch == "," and depth == 1 and first_arg_end is None:
                first_arg_end = k
            k += 1
        if depth > 0 or first_arg_end is None:
            raise ValueError(
                "unclassifiable windowspecdefinition (truncated plan line?): "
                + plan[i:line_end][:200]
            )
        first_arg = plan[j:first_arg_end]
        if _ORDER_MARK.search(first_arg) or first_arg.startswith(
            "specifiedwindowframe("
        ):
            n += 1
        idx = j


def plan_shape_counts(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, dict[str, int]]:
    """Formatted-explain every declared query; count SHAPE_KEYS each."""
    from social_warner_spark.caching import release_persisted_intermediates
    from social_warner_spark.queries import all_queries

    queries = all_queries()
    out: dict[str, dict[str, int]] = {}
    derived = ("UnpartitionedWindow", "BroadcastHint")
    for name in names if names is not None else sorted(queries):
        release_persisted_intermediates()
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        # Analysis only — no execution; ResolvedHint nodes are erased by
        # the optimizer, so the analyzed plan is where hints are visible.
        analyzed = df._jdf.queryExecution().analyzed().toString()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        counts = {k: plan.count(k) for k in SHAPE_KEYS if k not in derived}
        counts["UnpartitionedWindow"] = _count_unpartitioned_windows(plan)
        counts["BroadcastHint"] = analyzed.count("ResolvedHint")
        out[name] = counts
    return out


def _regenerate() -> None:
    """Regenerate tests/plan_shapes_baseline.json (run after consciously
    accepting a plan-shape change): python -m social_warner_spark.planaudit"""
    import json
    import os

    from social_warner_spark.session import get_spark

    spark = get_spark(app_name="planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    counts = plan_shape_counts(spark, sf)
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "plan_shapes_baseline.json")
    with open(path, "w") as f:
        json.dump(counts, f, indent=0, sort_keys=True)
    print(f"wrote {len(counts)} baselines to {path}")


if __name__ == "__main__":
    _regenerate()
