"""Shared helpers for the declared query set."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from social_warner_spark.catalog import load_table

#: Fixed anchor date replacing current_date() in macro queries — max
#: o_orderdate in the testdata; determinism per SURVEY.md §2.d R5.
ANCHOR_DATE = "2001-08-01"

#: Timestamp render formats (Spark ↔ DuckDB strftime equivalents).
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_FMT_MICRO_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_MICRO_DUCK = "%Y-%m-%d %H:%M:%S.%f"
ISO_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss"
ISO_FMT_DUCK = "%Y-%m-%dT%H:%M:%S"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r2(c) -> F.Column:
    """Round a large (reorderable) double sum to 2dp — see queries/__init__."""
    return F.round(c, 2)


def r6(c) -> F.Column:
    """Round a small-magnitude computed double to 6dp."""
    return F.round(c, 6)
