"""Graph operators expressed as iterated DataFrame joins.

PageRank with a FIXED iteration count, on the scaled recursion
R_{k+1}(n) = (1-d) + d * Σ_{(m,n)∈E} R_k(m) / outdeg(m)   (R_0 = 1),
i.e. ranks are N·PageRank, so values are O(1) and the 6dp per-iteration
rounding (applied identically by the SQL oracle) keeps both engines on
the same float grid.  A fixed iteration count — rather than
iterate-to-convergence — is what makes the operator oracle-checkable:
the DuckDB oracle unrolls the same three iterations as chained CTEs.

Companion to operators/dedup.py:neardup_clusters (min-label propagation,
the other iterative-join operator); see PERF.md for the shared scale
notes: edges+outdeg are persisted once and reused by every iteration,
each iteration is one shuffle (groupBy dst), and the rank table — one
row per node — is orders of magnitude smaller than the edge table, which
never re-shuffles after its first partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from social_warner_spark.caching import register_persisted


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """nodes: (node) — one row per vertex.  edges: (src, dst) directed,
    pre-deduplicated.  Returns (node, pr) after ``iters`` iterations.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # deg is attached to edges once; the (src, dst, deg) relation is the
    # loop invariant every iteration re-reads.
    ed = register_persisted(edges.join(outdeg, "src").persist())
    base = F.lit(round(1.0 - damping, 6))

    rank = nodes.select("node", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contrib = (
            ed.join(rank, ed["src"] == rank["node"])
            .select(ed["dst"], (rank["pr"] / ed["deg"]).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            nodes["node"],
            F.round(
                base + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)), 6
            ).alias("pr"),
        )
    return rank
