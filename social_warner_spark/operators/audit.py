"""Reconciliation / audit operators — prove two copies of a table are the
same without moving either (the check a user runs when migrating a corpus
between engines or validating a 100 TB snapshot copy).

The checksum is ORDER-INDEPENDENT (bit_xor of per-row hashes), so it can
be computed by any engine, over any partitioning, in one partial-agg
reduce — no sort, no shuffle beyond |groups| rows.  XOR cancels paired
duplicate rows, so the row count rides along; (count, xor) collisions
require adversarial input, not plausible drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def row_hash60(*cols: Column) -> Column:
    """60-bit integer hash of a row: first 15 hex chars of md5 over the
    '|'-joined column values.  15 hex digits fit a signed 64-bit int, and
    both Spark (conv) and ANSI engines (CAST '0x…') can parse them."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("long")


def table_checksum(
    df: DataFrame, cols: list[str], group_col: str | None = None
) -> DataFrame:
    """(group, n_rows, xor60) per group plus the grand-total row (ROLLUP;
    group = NULL on the total).  Pass columns whose string rendering is
    engine-stable (strings/ints — avoid raw doubles; round or format them
    first).

    One pass, map-side partial aggregation; the shuffle carries |groups|
    pre-reduced rows regardless of table size.
    """
    h = row_hash60(*[F.col(c) for c in cols]).alias("_h")
    keyed = df.select(*([group_col] if group_col else []), h)
    grouped = keyed.rollup(group_col) if group_col else keyed.groupBy()
    return grouped.agg(
        F.count("*").alias("n_rows"), F.bit_xor("_h").alias("xor60")
    )
