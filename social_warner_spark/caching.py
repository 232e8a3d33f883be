"""Registry for persisted intermediate DataFrames.

Operators that persist multi-consumer intermediates (shingle relations,
corpus survivor sets) register them here because the persisted lineage is
baked into a lazily-returned DataFrame — the operator itself can never know
when it is safe to unpersist.  Hosts with session lifecycle knowledge
(bench between queries, services between batches) call
``release_persisted_intermediates()`` once results are materialized.

Unreleased entries are bounded by the session lifetime (Spark drops caches
with the session), so forgetting to release degrades memory headroom, not
correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register_persisted(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df


def release_persisted_intermediates() -> int:
    """Unpersist every registered intermediate; returns how many."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
