"""Sketch-based join pruning: an engine-portable relational bloom filter.

Spark's own runtime bloom filters (``bloom_filter_agg`` /
``might_contain``) are Catalyst-internal — not user-callable SQL — and
their bit layout is engine-specific, so a query built on them could never
be oracle-checked.  This module implements the same semi-join-reduction
idea purely relationally, with md5-derived hash positions, so the
construction is deterministic and reproducible by ANY engine:

- The filter over the build side's keys is a DISTINCT table of tagged hex
  positions ``"{seed}|{3 hex chars of md5(seed|key)}"`` — k seeds give k
  independent 4096-slot sub-filters (a partitioned bloom).  Size is
  bounded by ``k * 4096`` rows regardless of build-side cardinality.
- Probing is k chained **broadcast left-semi joins**: a fact row survives
  iff all k of its positions appear.  No shuffle touches the fact table;
  the only data movement is broadcasting the (tiny, bounded) position
  table.  False positives are possible by design and are removed by the
  real join that follows — the final result is exactly the plain join's.

At 100 TB this is the classic semi-join reduction: ship a bounded sketch
of the selective dimension to every executor and drop the vast majority
of fact rows before they reach the join shuffle.  Reference parity: the
reference filters in pandas after materializing everything in driver RAM
(data_transform.py:17); pruning-before-shuffle is the distributed
re-expression of that filter step.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: 3 hex chars = 4096 slots per sub-filter.
_NIBBLES = 3


def bloom_position(key: Column, seed: int, nibbles: int = _NIBBLES) -> Column:
    """Tagged hash position of ``key`` under hash function ``seed``.

    The seed participates in the md5 input AND the output tag, so the k
    sub-filters occupy disjoint position namespaces in one table.
    """
    h = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    return F.concat(F.lit(f"{seed}|"), F.substring(h, 1, nibbles))


def bloom_filter_table(build: DataFrame, key_col: str, k: int = 3) -> DataFrame:
    """DISTINCT position table (column ``pos``) for the build side's keys."""
    pos = None
    for seed in range(k):
        part = build.select(bloom_position(F.col(key_col), seed).alias("pos"))
        pos = part if pos is None else pos.unionAll(part)
    return pos.distinct()


def bloom_prune(
    fact: DataFrame, fact_key: str, positions: DataFrame, k: int = 3
) -> DataFrame:
    """Keep fact rows whose key is (probably) in the filter.

    k chained broadcast left-semi joins — the AND of the k membership
    tests.  Each is a map-side hash probe: the fact side is never
    shuffled or exploded.
    """
    out = fact
    for seed in range(k):
        out = out.join(
            F.broadcast(positions),
            bloom_position(F.col(fact_key), seed) == positions["pos"],
            "left_semi",
        )
    return out
