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


def r2t(c) -> F.Column:
    """Tie-nudged 2dp round, the r6t discipline one grid coarser: for
    2dp outputs whose exact value is a FINER decimal rational (e.g.
    revenue Σ price(2dp)·(1−disc(2dp)) — exact 4dp terms — landing on
    xxx.xx5), where the two engines' float summation order decides the
    rounding direction (found by the r08 sf0.001 sweep: x144's revenue
    753930.795 rendered .79 in Spark and .8 in DuckDB).  The 1e-6 nudge
    is ≫ big-sum float noise (~1e-8 at 1e6-scale sums) and ≪ the 5e-3
    half-grid; the oracle applies the identical ROUND(x + 1e-6, 2)."""
    return F.round(c + F.lit(1e-6), 2)


def r6t(c) -> F.Column:
    """Tie-nudged 6dp round for outputs that are EXACT DECIMAL RATIONALS
    finer than 6dp (e.g. sums of 6dp-rounded terms scaled by a 1-decimal
    weight → exact 7dp values; linear interpolation of 2dp values with
    small-denominator fractions).  Such values sit EXACTLY on the 6dp
    rounding boundary, where the two engines disagree: Spark rounds the
    double's exact binary expansion via BigDecimal HALF_UP while DuckDB
    rounds through a float multiply — and DuckDB's own summation-order
    noise (±1 ulp) even flips the SAME query run-to-run.  Adding 1e-9
    (≫ cross-engine float noise ~1e-12, ≪ the 5e-7 half-grid) moves
    every decimal tie strictly above the boundary so BOTH engines round
    it up deterministically.  The oracle applies the identical nudge:
    ROUND(x + 1e-9, 6).  Round-3 mirror hardening — see
    tests/oracle_harness.py:compare (strict serialization pass)."""
    return F.round(c + F.lit(1e-9), 6)
