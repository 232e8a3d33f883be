"""Declared query set (SURVEY.md §2.d) — the correctness contract.

Each series module exposes:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB ANSI SQL over the same parquet views)

Column names are aliased identically on both sides; doubles that are the
result of cross-engine-reorderable arithmetic are rounded explicitly in BOTH
engines (2dp for large sums, 6dp for means/cosines) so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from social_warner_spark.queries import (
    c_series,
    l_series,
    r_series,
    s_series,
    sql_series,
    x2_series,
    x3_series,
    x4_series,
    x5_series,
    x6_series,
    x_series,
)

_SERIES = (
    r_series,
    c_series,
    s_series,
    l_series,
    x_series,
    x2_series,
    x3_series,
    x4_series,
    x5_series,
    x6_series,
    sql_series,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _SERIES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise RuntimeError(f"duplicate query ids: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _SERIES:
        out.update(mod.ORACLES)
    return out
