"""CDC / warehouse-maintenance operators: MERGE-style upsert and
snapshot diff, as plain full-outer-join programs.

The reference only ever appends (data_load.py WRITE_APPEND /
WRITE_TRUNCATE dispositions); these operators add the third disposition
real warehouses need — key-based upsert — and its inverse, diffing two
snapshots into a change feed.  Both are single co-partitioned
full-outer joins on the key: at 100 TB they SMJ on the (bucketable)
key and never materialize anything beyond the joined row pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_upsert(
    existing: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE: update rows whose key matches, insert the rest.

    Column-generic: every non-key column resolves as
    ``coalesce(updates.col, existing.col)`` — updates win, unmatched
    existing rows pass through, unmatched update rows are inserts.
    Both inputs must share a schema.
    """
    value_cols = [c for c in existing.columns if c not in keys]
    e = existing.alias("e")
    u = updates.alias("u")
    return e.join(u, keys, "full_outer").select(
        *[F.coalesce(F.col(f"u.{k}"), F.col(f"e.{k}")).alias(k) for k in keys],
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"e.{c}")).alias(c)
            for c in value_cols
        ],
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Change feed between two snapshots: one row per inserted ('I'),
    deleted ('D'), or updated ('U') key; unchanged keys are dropped.

    Emits the key columns, ``op``, and old_/new_ prefixed compare
    columns (NULL on the absent side).
    """
    # prefix-rename each side: alias() qualification is not enough when
    # old and new share lineage (e.g. diffing a snapshot against its own
    # merge result is a self-join on the same attribute ids)
    cols = keys + compare_cols
    o = old.select([F.col(c).alias(f"_o_{c}") for c in cols])
    n = new.select([F.col(c).alias(f"_n_{c}") for c in cols])
    cond = None
    for k in keys:
        c = F.col(f"_o_{k}") == F.col(f"_n_{k}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        changed = neq if changed is None else (changed | neq)
    op = (
        F.when(F.col(f"_o_{keys[0]}").isNull(), "I")
        .when(F.col(f"_n_{keys[0]}").isNull(), "D")
        .when(changed, "U")
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
                for k in keys
            ],
            op.alias("op"),
            *[F.col(f"_o_{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"_n_{c}").alias(f"new_{c}") for c in compare_cols],
        )
        .where(F.col("op").isNotNull())
    )
